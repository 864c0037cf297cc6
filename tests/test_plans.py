"""Physical-plan assertions: the scale posture claims in docstrings
are checked here, not just asserted in prose (VERDICT r1 requirement:
no all-pairs CartesianProduct may back the LSH operators).
"""

import pytest

from mit_mapreduce_spark import operators
from mit_mapreduce_spark.operators.registry import QUERIES

operators.load_all()


def plan_of(spark, sf_dir, name: str) -> str:
    """Formatted physical plan (untruncated, includes ReadSchema)."""
    df = QUERIES[name](spark, sf_dir)
    mode = spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
        "formatted")
    return df._jdf.queryExecution().explainString(mode)


@pytest.mark.parametrize("name", ["dedup_minhash", "ann_lsh_pairs", "dedup_simhash"])
def test_no_cartesian_product(spark, sf_dir, name):
    """LSH/banded candidate generation must be equi-join based."""
    plan = plan_of(spark, sf_dir, name)
    assert "CartesianProduct" not in plan, plan


def test_bruteforce_broadcasts_queries(spark, sf_dir):
    """Exact kNN scans candidates once with the query set broadcast —
    a BroadcastNestedLoopJoin, not a shuffled cartesian."""
    plan = plan_of(spark, sf_dir, "ann_bruteforce_topk")
    assert "BroadcastNestedLoopJoin" in plan, plan
    assert "CartesianProduct" not in plan, plan


def test_broadcast_join_on_small_dim(spark, sf_dir):
    """nation (25 rows) must join broadcast, leaving one shuffle."""
    plan = plan_of(spark, sf_dir, "join_broadcast_revenue")
    assert "BroadcastHashJoin" in plan, plan


def test_filter_and_projection_pushdown(spark, sf_dir):
    """Predicate + column pruning must reach the parquet scan."""
    plan = plan_of(spark, sf_dir, "filter_pushdown")
    assert "PushedFilters: [" in plan, plan
    assert "GreaterThan(l_discount" in plan, plan
    schema = plan[plan.index("ReadSchema"):].splitlines()[0]
    # pruned: filter + projected columns only, untouched columns absent
    assert "l_shipdate" in schema and "l_discount" in schema, schema
    for absent in ("l_returnflag", "l_partkey", "l_tax"):
        assert absent not in schema, schema


def test_topk_is_take_ordered(spark, sf_dir):
    """ORDER BY + LIMIT must compile to TakeOrderedAndProject (per-
    partition top-k), not a global Sort."""
    plan = plan_of(spark, sf_dir, "topk_orders")
    assert "TakeOrderedAndProject" in plan, plan
