"""Curation-operator unit tests: edge cases the sf fixtures can't
exercise (short/empty/repetitive docs, chunk boundary arithmetic,
contamination self-exclusion, PII redaction on hostile inputs)."""

import pytest

from mit_mapreduce_spark.operators import curation
from mit_mapreduce_spark.operators.registry import QUERIES


def _run_on(spark, docs, name):
    """Run a registered curation query against a synthetic documents
    table by staging it as the catalog would load it."""
    import tempfile

    tmp = tempfile.mkdtemp(prefix="curation_docs_")
    docs.withColumn("lang", docs.doc_id.cast("string")) \
        .withColumn("source", docs.doc_id.cast("string")) \
        .withColumn("n_chars", docs.doc_id * 0) \
        .write.mode("overwrite").parquet(f"{tmp}/documents.parquet")
    return QUERIES[name](spark, tmp)


def test_repetition_flags_degenerate_doc(spark):
    docs = spark.createDataFrame(
        [(1, "spam spam spam spam spam spam"),
         (2, "every single word here is fully distinct text"),
         (3, ""), (4, "one")],
        "doc_id long, text string")
    rows = {r.doc_id: r for r in
            _run_on(spark, docs, "quality_repetition").collect()}
    # all-one-word doc: ttr 1/6, dup_bigram_frac 4/5 → fails
    assert rows[1].n_distinct == 1
    assert rows[1].dup_bigram_frac == pytest.approx(4 / 5)
    assert not rows[1].passes
    # fully distinct doc passes
    assert rows[2].ttr == 1.0 and rows[2].dup_bigram_frac == 0.0
    assert rows[2].passes
    # empty / single-token docs: defined (0.0 fracs), no crash
    assert rows[3].n_tokens == 0 and rows[3].dup_bigram_frac == 0.0
    assert rows[4].n_tokens == 1 and rows[4].dup_trigram_frac == 0.0


def test_chunker_boundaries_and_overlap(spark):
    n = 100  # → starts at 1, 31, 61, 91 (stride 30, width 40)
    text = " ".join(f"w{i}" for i in range(n))
    docs = spark.createDataFrame([(1, text), (2, "tiny doc"), (3, "")],
                                 "doc_id long, text string")
    out = _run_on(spark, docs, "chunk_documents").collect()
    by_doc = {}
    for r in out:
        by_doc.setdefault(r.doc_id, []).append(r)
    c1 = sorted(by_doc[1], key=lambda r: r.chunk_id)
    assert [r.chunk_id for r in c1] == [0, 1, 2, 3]
    assert [r.n_chunk_tokens for r in c1] == [40, 40, 40, 10]
    # consecutive chunks overlap by width - stride = 10 tokens
    assert c1[0].chunk_text.split()[30:] == c1[1].chunk_text.split()[:10]
    assert c1[3].chunk_text == " ".join(f"w{i}" for i in range(90, 100))
    # short doc: exactly one (short) chunk; empty doc: NO chunks (the
    # round-5 fuzz fix — the phantom empty chunk is gone)
    assert [r.n_chunk_tokens for r in by_doc[2]] == [2]
    assert 3 not in by_doc


def test_contamination_excludes_eval_docs_and_counts_hits(spark):
    # doc_id % 97 == 0 → docs 0 and 97 are the "benchmark"
    docs = spark.createDataFrame(
        [(0, "alpha beta gamma delta"),        # eval
         (97, "foo bar baz qux"),              # eval
         (1, "alpha beta gamma unrelated"),    # shares 2 trigrams w/ doc 0? -> 1
         (2, "foo bar baz and alpha beta gamma"),  # hits both eval docs
         (3, "totally clean document here")],
        "doc_id long, text string")
    rows = {r.doc_id: r for r in
            _run_on(spark, docs, "contamination_ngrams").collect()}
    assert set(rows) == {1, 2}          # eval docs + clean doc excluded
    assert rows[1].n_shared_ngrams == 1 and rows[1].n_eval_docs == 1
    assert rows[2].n_shared_ngrams == 2 and rows[2].n_eval_docs == 2


def test_pii_redact_seeds_and_scrubs(spark):
    docs = spark.createDataFrame(
        [(7, "reach me at alice.smith@corp.example or 192.168.0.1 "
             "or +1-415-555-0134 or 078-05-1120 ok")],
        "doc_id long, text string")
    row = _run_on(spark, docs, "pii_redact").collect()[0]
    # 1 organic + 1 seeded of each kind (r13: four-pattern battery)
    assert row.n_emails == 2
    assert row.n_ips == 2
    assert row.n_phones == 2
    assert row.n_ids == 2
    assert row.n_chars_removed > 0


def test_pii_patterns_do_not_cross_match():
    import re

    assert re.fullmatch(curation.EMAIL_RE, "a.b_c@mail.example")
    assert re.fullmatch(curation.IP_RE, "10.0.0.1")
    assert not re.fullmatch(curation.IP_RE, "1.2.3")
    assert not re.search(curation.EMAIL_RE, "no at sign here")
    # r13 classes, and their mutual disjointness: the ID shape must
    # not fire inside a phone's digit runs (3-3-4 vs 3-2-4), the
    # phone needs its '+', and neither matches the dotted IP
    assert re.fullmatch(curation.PHONE_RE, "+1-415-555-0134")
    assert re.fullmatch(curation.ID_RE, "078-05-1120")
    assert not re.search(curation.ID_RE, "+1-415-555-0134")
    assert not re.search(curation.PHONE_RE, "078-05-1120")
    assert not re.search(curation.PHONE_RE, "10.0.0.1")
    assert not re.search(curation.ID_RE, "10.0.0.1")
    # and the full seeded payload carries exactly one of each
    payload = ("lorem ipsum contact user247@mail.example from 10.47.0.248"
               " call +1-347-555-1247 ref 347-57-1247")
    for pat in (curation.EMAIL_RE, curation.IP_RE, curation.PHONE_RE,
                curation.ID_RE):
        assert len(re.findall(pat, payload)) == 1, pat
