"""Physical-plan assertions for the second decision-support tranche
(operators/decision.py): pushdown reaches the fact scans, dimension
joins broadcast, and the Q21-style non-equi semi/anti joins extract
their equi-key (never degrading to a nested-loop over lineitem).
Value correctness is covered by the parametrized oracle gate in
test_parity.py; these tests pin the SCALE posture.
"""

import pytest

from mit_mapreduce_spark import operators, plans
from mit_mapreduce_spark.operators.registry import QUERIES

operators.load_all()


def plan_of(spark, sf_dir, name: str) -> str:
    return plans.formatted_plan(QUERIES[name](spark, sf_dir))


def test_forecast_revenue_is_scan_agg_only(spark, sf_dir):
    """Q6 shape: every predicate pushed, no join of any kind — the
    plan is scan → partial agg → 1-row final agg."""
    plan = plan_of(spark, sf_dir, "forecast_revenue")
    assert "PushedFilters: [IsNotNull(l_shipdate)" in plan, plan
    assert "GreaterThanOrEqual(l_shipdate" in plan, plan
    assert "LessThan(l_quantity,24.0)" in plan, plan
    assert "Join" not in plan, plan


@pytest.mark.parametrize("name", [
    "returned_item_customers", "promo_revenue_share", "small_qty_revenue",
    "disjunctive_revenue", "min_cost_supplier", "sole_return_suppliers",
    "top_supplier_revenue",
])
def test_decision_queries_never_cartesian(spark, sf_dir, name):
    plan = plan_of(spark, sf_dir, name)
    assert "CartesianProduct" not in plan, plan
    assert "BroadcastNestedLoopJoin" not in plan, plan


def test_sole_return_suppliers_joins_extract_equikey(spark, sf_dir):
    """The EXISTS / NOT EXISTS pair carries `suppkey <> suppkey` as a
    non-equi term; Spark must still key both joins on l_orderkey (hash
    join with a residual condition). A planner regression to a
    nested-loop here would be quadratic in lineitem at 100 TB."""
    plan = plan_of(spark, sf_dir, "sole_return_suppliers")
    assert "LeftSemi" in plan, plan
    assert "LeftAnti" in plan, plan
    assert "NestedLoop" not in plan, plan


def test_promo_revenue_broadcasts_part_dimension(spark, sf_dir):
    """part is the dimension side: the join must be a broadcast hash
    join, and the month filter must reach the lineitem scan."""
    plan = plan_of(spark, sf_dir, "promo_revenue_share")
    assert "BroadcastHashJoin" in plan, plan
    assert "GreaterThanOrEqual(l_shipdate" in plan, plan


def test_min_cost_supplier_windowgrouplimit(spark, sf_dir):
    """The rn=1 min-per-group must run as Spark's WindowGroupLimit
    (top-1 pushed below the sort) over the (part,supplier) aggregate —
    not a full rank materialization."""
    plan = plan_of(spark, sf_dir, "min_cost_supplier")
    assert "WindowGroupLimit" in plan, plan
    # the size filter prunes the broadcast part scan
    assert "LessThanOrEqual(p_size,5)" in plan, plan
