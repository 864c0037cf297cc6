"""Sketch-aggregate sanity: approx_count_distinct is rows-only for
the driver (HLL sketches are engine-specific), so its accuracy gate
lives here."""

from mit_mapreduce_spark import operators
from mit_mapreduce_spark.operators.registry import QUERIES

operators.load_all()


def test_approx_distinct_within_rsd(spark, sf_dir):
    rows = QUERIES["agg_approx_distinct"](spark, sf_dir).collect()
    assert rows
    for r in rows:
        if r.exact_custs >= 50:
            rel_err = abs(r.approx_custs - r.exact_custs) / r.exact_custs
            assert rel_err < 0.10, (r.o_orderstatus, r.approx_custs, r.exact_custs)
        else:
            # tiny cardinalities: HLL++ is near-exact
            assert abs(r.approx_custs - r.exact_custs) <= 5, r
