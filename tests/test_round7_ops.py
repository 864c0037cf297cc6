"""Hand-checkable property tests for the round-7 operators, plus the
live oracle gate at crafted-corpus scale (the sf0.01 differential runs
in selfcheck/driver)."""

import os
import tempfile

from mit_mapreduce_spark import operators
from mit_mapreduce_spark.testing import compare

operators.load_all()


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


def test_rrf_both_legs_agree_on_duplicate(spark):
    """A verbatim duplicate of the query doc is the rank-1 hit of BOTH
    legs (bm25: identical tf profile; kNN: cosine 1.0), so fusion must
    rank it first with n_legs = 2 and the maximum possible rrf score
    2 * GRID/(K+1). The disjoint-vocabulary doc shares no TERMS, so
    bm25 never retrieves it — but the dense leg's top-k may (hashed
    cosine is nonzero under bucket collisions), so it can appear only
    single-legged and never at rank 1."""
    from mit_mapreduce_spark.operators.textstats import RRF_GRID, RRF_K

    base = "retrieval with ranked lexical scoring of shared terms"
    rows = [(0, base, "s"),
            (1, base, "s"),                      # verbatim duplicate
            (2, base + " plus extra diluting words", "s"),
            (3, "completely disjoint vocabulary document", "s")]
    with tempfile.TemporaryDirectory() as td:
        _stage_docs(spark, rows, td)
        hits = {(r.qid, r.rnk): r for r in
                operators.QUERIES["hybrid_rrf_retrieval"](spark, td)
                .collect()}
        ok, msg = compare(
            operators.QUERIES["hybrid_rrf_retrieval"](spark, td),
            operators.ORACLES["hybrid_rrf_retrieval"], td)
    assert ok, msg
    top = hits[(0, 1)]
    assert top.did == 1
    assert top.n_legs == 2
    assert top.rrf_micro == 2 * (RRF_GRID // (RRF_K + 1))
    for r in hits.values():
        if r.did == 3:
            assert r.n_legs == 1 and r.rnk > 1, r
    assert all(r.did != r.qid for r in hits.values())


def test_rrf_single_leg_docs_still_fuse(spark):
    """Docs retrieved by only one leg carry n_legs = 1 and rank below
    any 2-leg doc with comparable per-leg ranks; the fusion never
    drops a doc that only one leg saw (union, not intersect)."""
    base = "alpha beta gamma delta epsilon zeta"
    rows = ([(0, base, "s"), (1, base, "s")]
            + [(i, base + f" filler{i} " * i, "s") for i in range(2, 8)])
    with tempfile.TemporaryDirectory() as td:
        _stage_docs(spark, rows, td)
        rrf_rows = operators.QUERIES["hybrid_rrf_retrieval"](
            spark, td).collect()
        ok, msg = compare(
            operators.QUERIES["hybrid_rrf_retrieval"](spark, td),
            operators.ORACLES["hybrid_rrf_retrieval"], td)
    assert ok, msg
    by_q = [r for r in rrf_rows if r.qid == 0]
    assert by_q, "query 0 retrieved nothing"
    legs = {r.did: r.n_legs for r in by_q}
    assert legs[1] == 2                     # duplicate seen by both
    assert set(legs.values()) <= {1, 2}


def test_containment_catches_what_jaccard_misses(spark):
    """The defining asymmetric case: a small doc whose vocabulary is
    fully absorbed by a much larger doc. Jaccard is tiny (small/large),
    containment is exactly 1.0 — and only the (small ⊆ large)
    direction fires, never the reverse."""
    from mit_mapreduce_spark.operators.dedup import CONT_MOD, CONT_T

    import string

    small = "quoted passage with distinctive vocabulary tokens"
    # letter-only filler words: the \\p{L} tokenizer drops digits, so
    # "filler0" and "filler1" would collapse into one word
    letters = string.ascii_lowercase
    big = small + " " + " ".join(
        "filler" + letters[i % 26] + letters[i // 26]
        for i in range(200))
    rows = [(0, small, "s"),            # suspect (doc_id % CONT_MOD == 0)
            (1, big, "s"),
            (CONT_MOD, "unrelated disjoint words entirely", "s")]
    with tempfile.TemporaryDirectory() as td:
        _stage_docs(spark, rows, td)
        out = operators.QUERIES["dedup_containment"](spark, td).collect()
        ok, msg = compare(operators.QUERIES["dedup_containment"](spark, td),
                          operators.ORACLES["dedup_containment"], td)
    assert ok, msg
    pairs = {(r.doc_a, r.doc_b): r for r in out}
    hit = pairs[(0, 1)]
    assert hit.containment == 1.0 and hit.n_inter == hit.n_a
    # Jaccard for the same pair is far below any near-dup threshold
    assert hit.n_inter / (hit.n_a + hit.n_b - hit.n_inter) < 0.05
    # asymmetry: big is NOT contained in small; the suspect sample is
    # doc_id % CONT_MOD so doc 1 is never a suspect anyway, and the
    # disjoint suspect produces nothing
    assert all(a % CONT_MOD == 0 for a, _ in pairs)
    assert all(a != CONT_MOD for a, _ in pairs), CONT_T
