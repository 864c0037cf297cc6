"""Hand-checkable property tests for the round-6 operators, plus the
live oracle gate at fixture scale (the sf0.01 differential runs in
selfcheck/driver)."""

import os
import tempfile

from pyspark.sql import functions as F

from mit_mapreduce_spark import operators
from mit_mapreduce_spark.catalog import load_table
from mit_mapreduce_spark.testing import compare

operators.load_all()

_ROUND6 = ["group_aware_kfold", "pack_efficiency_report",
           "url_domain_stats", "vocab_growth_by_source"]


def _stage_docs(spark, rows, td):
    (spark.createDataFrame(rows, "doc_id long, text string, source string")
     .withColumn("lang", F.lit("en"))
     .withColumn("n_chars", F.length("text"))
     .write.parquet(os.path.join(td, "documents.parquet")))


def test_round6_oracle_gate(spark, sf_dir):
    for name in _ROUND6:
        ok, msg = compare(operators.QUERIES[name](spark, sf_dir),
                          operators.ORACLES[name], sf_dir)
        assert ok, f"{name}: {msg}"


def test_kfold_groups_never_straddle_folds(spark):
    """The leakage guard itself: exact duplicates (including
    whitespace/case variants, which share a normalized fingerprint)
    must land in ONE fold — so the groups total equals the distinct
    fingerprints, not the doc count."""
    from mit_mapreduce_spark.operators.curation import KFOLD_K

    rows = [(0, "alpha beta gamma", "s"),
            (1, "alpha beta gamma", "s"),      # exact dup of 0
            (2, "  Alpha   beta GAMMA ", "s"),  # normalized dup of 0
            (3, "something else entirely", "s"),
            (4, "third unique document", "s")]
    with tempfile.TemporaryDirectory() as td:
        _stage_docs(spark, rows, td)
        out = operators.QUERIES["group_aware_kfold"](spark, td).collect()
    assert sum(r.n_docs for r in out) == 5
    assert sum(r.n_groups for r in out) == 3  # dups share one group
    assert all(0 <= r.fold < KFOLD_K for r in out)


def test_pack_efficiency_hand_computed(spark):
    """One source, docs of 1000/1500/600 tokens in doc_id order:
    cum_excl 0/1000/2500 → doc1 straddles (offset 1000 + 1500 > 2048);
    3100 total tokens → 2 packs, waste 996."""
    rows = [(0, " ".join(["w"] * 1000), "s"),
            (1, " ".join(["w"] * 1500), "s"),
            (2, " ".join(["w"] * 600), "s")]
    with tempfile.TemporaryDirectory() as td:
        _stage_docs(spark, rows, td)
        out = operators.QUERIES["pack_efficiency_report"](spark, td).collect()
    assert len(out) == 1
    r = out[0]
    assert (r.n_docs, r.n_tokens, r.n_packs) == (3, 3100, 2)
    assert r.tail_waste == 2 * 2048 - 3100
    assert r.n_straddlers == 1
    assert r.max_doc_tokens == 1500


def test_url_extraction_sees_in_text_urls(spark):
    """A URL already present in the text must be extracted alongside
    the synthesized ones, with scheme and domain parsed."""
    rows = [(0, "visit https://real.example.com/x?q=1 today", "s"),
            (1, "no urls here", "s")]
    with tempfile.TemporaryDirectory() as td:
        _stage_docs(spark, rows, td)
        out = operators.QUERIES["url_domain_stats"](spark, td).collect()
    by_dom = {(r.domain, r.scheme): r for r in out}
    assert ("real.example.com", "https") in by_dom
    assert by_dom[("real.example.com", "https")].n_urls == 1
    # synthesized payload URLs: every doc carries the per-source one
    assert by_dom[("www.src-s.example.org", "https")].n_docs == 2
    # doc_id % 3 == 0 docs also carry the cdn URL
    assert ("cdn0.example.net", "http") in by_dom


def test_vocab_growth_hand_computed(spark):
    """'a a b' → 3 tokens, vocab 2, hapax 1 (b); ttr 2/3."""
    rows = [(0, "a a b", "s")]
    with tempfile.TemporaryDirectory() as td:
        _stage_docs(spark, rows, td)
        out = operators.QUERIES["vocab_growth_by_source"](spark, td).collect()
    r = out[0]
    assert (r.n_tokens, r.vocab, r.hapax) == (3, 2, 1)
    assert abs(r.ttr - 2 / 3) < 1e-12
    assert abs(r.hapax_ratio - 0.5) < 1e-12
