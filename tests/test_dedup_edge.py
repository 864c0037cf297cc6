"""Dedup edge cases (ADVICE r2): documents shorter than the shingle
width k must yield zero shingles — not crash the pipeline. Before the
guard, ``sequence(1, greatest(size - 2, 0))`` produced the DESCENDING
array [1, 0] for sub-k docs and ``slice(_toks, 0, 3)`` threw
INVALID_PARAMETER_VALUE.START, killing dedup_minhash / dedup_clusters
on any real corpus containing a 1-2 token document.
"""

from mit_mapreduce_spark.operators import dedup


def _docs(spark):
    return spark.createDataFrame(
        [(1, ""), (2, "one"), (3, "two words"), (4, "exactly three words"),
         (5, "now four whole words"), (6, "  --- !!! 42 7 ---  ")],
        "doc_id long, text string")


def test_shingles_short_docs_yield_empty_not_crash(spark):
    rows = dedup.shingles_df(_docs(spark)).collect()
    by_doc: dict[int, list[str]] = {}
    for r in rows:
        by_doc.setdefault(r.doc_id, []).append(r.shingle)
    # sub-k docs (empty, 1 tok, 2 tok, letters-free) produce no rows
    for short in (1, 2, 3, 6):
        assert short not in by_doc
    assert by_doc[4] == ["exactly three words"]
    assert sorted(by_doc[5]) == ["four whole words", "now four whole"]


def test_minhash_signatures_tolerate_short_docs(spark):
    """End-to-end signature build over a corpus containing sub-k docs:
    runs clean, emits one signature per shingle-bearing doc."""
    sigs = dedup._minhash_sigs(dedup.shingles_df(_docs(spark)))
    got = {r.doc_id: r.n for r in sigs.collect()}
    assert got == {4: 1, 5: 2}
