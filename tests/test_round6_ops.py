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
           "url_domain_stats", "vocab_growth_by_source",
           "sketch_quantile_bins", "decayed_engagement",
           "rag_chunk_retrieval", "bm25_topk"]


def _stage_docs(spark, rows, td):
    # single-file parquet (pyarrow): the DuckDB oracle globs
    # {dir}/documents.parquet and cannot descend into a Spark
    # directory write
    import pyarrow as pa
    import pyarrow.parquet as pq

    tab = pa.table({
        "doc_id": pa.array([r[0] for r in rows], pa.int64()),
        "text": pa.array([r[1] for r in rows], pa.string()),
        "source": pa.array([r[2] for r in rows], pa.string()),
        "lang": pa.array(["en"] * len(rows), pa.string()),
        "n_chars": pa.array([len(r[1]) for r in rows], pa.int64()),
    })
    pq.write_table(tab, os.path.join(td, "documents.parquet"))
    for t in ["region", "nation", "customer", "supplier", "part",
              "orders", "lineitem", "events", "embeddings"]:
        os.symlink(f"/root/testdata/sf0.001/{t}.parquet",
                   os.path.join(td, f"{t}.parquet"))


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


def test_quantile_bins_error_bound_vs_exact(spark, sf_dir):
    """The sketch's contract: each reported quantile's bin lower bound
    is within one bin width of the exact percentile, and the bins
    MERGE — splitting the table in two and adding counters reproduces
    the full-table sketch exactly."""
    from mit_mapreduce_spark.operators.sketches import QB_WIDTH_CENTS

    import math

    ev = load_table(spark, sf_dir, "events")
    out = {r.event_type: r for r in
           operators.QUERIES["sketch_quantile_bins"](spark, sf_dir).collect()}
    vals = {}
    for r in ev.select("event_type", "value").collect():
        vals.setdefault(r.event_type, []).append(round(r.value * 100))
    for et, r in out.items():
        xs = sorted(vals[et])
        assert r.n_events == len(xs)
        for q, got in ((0.50, r.p50_cents), (0.90, r.p90_cents),
                       (0.99, r.p99_cents)):
            # the reported value is the bin lower bound of the
            # ceil(q*n)-th order statistic — exact rank semantics
            x = xs[math.ceil(q * len(xs)) - 1]
            assert got == (x // QB_WIDTH_CENTS) * QB_WIDTH_CENTS, (et, q)
            # and therefore within one bin width of that order stat
            assert 0 <= x - got < QB_WIDTH_CENTS
        assert r.p50_cents <= r.p90_cents <= r.p99_cents
    # mergeability: per-half bin counts added == full-table bin counts
    bins = lambda df: {(r.event_type, r.bin): r.cnt for r in (  # noqa: E731
        df.select("event_type",
                  F.expr("CAST(round(value * 100) AS BIGINT)"
                         f" div {QB_WIDTH_CENTS}").alias("bin"))
        .groupBy("event_type", "bin").agg(F.count("*").alias("cnt"))
        .collect())}
    full = bins(ev)
    h1 = bins(ev.where(F.col("event_id") % 2 == 0))
    h2 = bins(ev.where(F.col("event_id") % 2 == 1))
    merged = dict(h1)
    for k, v in h2.items():
        merged[k] = merged.get(k, 0) + v
    assert merged == full


def test_decayed_engagement_hand_computed(spark, tmp_path):
    """Three events for one user at the anchor, 1 day old, and 2 days
    old → score = (1 + 0.5 + 0.25) * 1e6 micro-units exactly."""
    import pyarrow as pa
    import pyarrow.parquet as pq
    from datetime import datetime

    td = str(tmp_path / "ev")
    os.makedirs(td)
    ts = [datetime(2025, 1, 3, 12), datetime(2025, 1, 2, 12),
          datetime(2025, 1, 1, 12)]
    tab = pa.table({
        "event_id": pa.array([0, 1, 2], pa.int64()),
        "ts": pa.array(ts, pa.timestamp("us")),
        "user_id": pa.array([7, 7, 7], pa.int64()),
        "event_type": pa.array(["a", "a", "b"]),
        "value": pa.array([1.0, 2.0, 3.0], pa.float64()),
        "props": pa.array(["{}", "{}", "{}"]),
    })
    pq.write_table(tab, os.path.join(td, "events.parquet"))
    for t in ["region", "nation", "customer", "supplier", "part",
              "orders", "lineitem", "documents", "embeddings"]:
        os.symlink(f"/root/testdata/sf0.001/{t}.parquet",
                   os.path.join(td, f"{t}.parquet"))
    out = operators.QUERIES["decayed_engagement"](spark, td).collect()
    assert len(out) == 1
    assert out[0].user_id == 7 and out[0].n_events == 3
    assert out[0].score_micro == 1_750_000
    ok, msg = compare(operators.QUERIES["decayed_engagement"](spark, td),
                      operators.ORACLES["decayed_engagement"], td)
    assert ok, msg


def test_rag_retrieval_duplicate_chunk_is_top_hit(spark):
    """A query doc that verbatim-contains another doc's chunk must
    retrieve that chunk at rank 1 with cosine 1.0 (the chunk's tokens
    are exactly the query's tokens here), and never retrieve chunks of
    the query doc itself."""
    from mit_mapreduce_spark.operators.curation import RAG_QUERY_MOD

    base = "alpha beta gamma delta epsilon zeta eta theta"
    rows = [(0, base, "s"),                       # query (doc_id % MOD == 0)
            (1, base, "s"),                       # duplicate -> its chunk
            (2, "totally different words here about other things", "s")]
    with tempfile.TemporaryDirectory() as td:
        _stage_docs(spark, rows, td)
        hits = {(r.qid, r.rnk): r for r in
                operators.QUERIES["rag_chunk_retrieval"](spark, td).collect()}
        ok, msg = compare(
            operators.QUERIES["rag_chunk_retrieval"](spark, td),
            operators.ORACLES["rag_chunk_retrieval"], td)
    assert ok, msg
    top = hits[(0, 1)]
    assert top.cdoc == 1 and abs(top.cosine - 1.0) < 1e-12
    assert all(r.cdoc != 0 for r in hits.values())
    assert RAG_QUERY_MOD == 100


def test_bm25_exact_duplicate_ranks_first(spark):
    """A verbatim duplicate of the query doc shares every term with
    the query's tf profile — it must be the rank-1 hit; a doc sharing
    no terms must not appear at all."""
    base = "retrieval with ranked lexical scoring of shared terms"
    rows = [(0, base, "s"),
            (100, base, "s"),                   # also a query; dup of 0
            (1, base + " plus extra words diluting length", "s"),
            (2, "completely disjoint vocabulary document", "s")]
    with tempfile.TemporaryDirectory() as td:
        _stage_docs(spark, rows, td)
        hits = {(r.qid, r.rnk): r for r in
                operators.QUERIES["bm25_topk"](spark, td).collect()}
        ok, msg = compare(operators.QUERIES["bm25_topk"](spark, td),
                          operators.ORACLES["bm25_topk"], td)
    assert ok, msg
    assert hits[(0, 1)].did == 100   # exact dup outranks the diluted doc
    assert hits[(100, 1)].did == 0
    assert all(r.did != 2 for r in hits.values())
    assert all(r.did != r.qid for r in hits.values())
