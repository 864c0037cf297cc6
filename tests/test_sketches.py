"""Sketch guarantees the oracle can't express: CMS never undercounts
and total mass is conserved; HLL union error is bounded and the merged
sketch equals a direct full-scan sketch (mergeability)."""

from pyspark.sql import functions as F

from mit_mapreduce_spark.catalog import load_table
from mit_mapreduce_spark.operators.registry import QUERIES
from mit_mapreduce_spark.operators.sketches import _tokens


def test_cms_never_undercounts_and_conserves_mass(spark, sf_dir):
    rows = QUERIES["sketch_heavy_hitters"](spark, sf_dir).collect()
    assert rows
    assert all(r.overcount >= 0 for r in rows)
    assert all(r.cms_n == r.exact_n + r.overcount for r in rows)
    # width < vocab ⇒ at least one collision must be visible
    assert any(r.overcount > 0 for r in rows)


def test_hll_union_matches_direct_sketch(spark, sf_dir):
    out = {r.scope: r for r in
           QUERIES["sketch_hll_mergeable"](spark, sf_dir).collect()}
    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select(F.explode(_tokens()).alias("word"))
    direct = toks.agg(
        F.hll_sketch_estimate(F.hll_sketch_agg("word")).alias("e"),
        F.countDistinct("word").alias("nd")).collect()[0]
    # mergeability: union of per-source sketches == one-pass sketch
    assert out["__all__"].approx_nd == int(direct.e)
    # error bound: default lgConfigK=12 keeps rel. error ≪ 10%
    assert abs(out["__all__"].approx_nd - direct.nd) <= max(1, 0.1 * direct.nd)
    for scope, r in out.items():
        if scope != "__all__":
            assert abs(r.approx_nd - r.exact_nd) <= max(1, 0.1 * r.exact_nd)
