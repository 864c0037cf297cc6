"""Observation-based pipeline counters: metrics must ride the SAME
job (no extra scan) and agree exactly with independently computed
values."""

from pyspark.sql import functions as F

from mit_mapreduce_spark.catalog import load_table
from mit_mapreduce_spark.metrics import collect_metrics, instrument


def test_observe_counters_match_ground_truth(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    gated = docs.where(F.length("text") >= 200)
    inst, obs = instrument(
        gated, "quality_gate",
        rows_kept=F.count(F.lit(1)),
        chars_kept=F.sum(F.length("text")),
        shortest=F.min(F.length("text")),
    )
    n_action = inst.count()          # the ONE action; metrics ride it
    m = collect_metrics(obs)
    assert m["rows_kept"] == n_action
    truth = gated.agg(
        F.sum(F.length("text")).alias("c"),
        F.min(F.length("text")).alias("s")).collect()[0]
    assert m["chars_kept"] == truth.c
    assert m["shortest"] == truth.s >= 200


def test_observe_is_free_no_extra_exchange(spark, sf_dir):
    """The instrumented plan must not add an Exchange or a second
    scan — CollectMetrics is a streaming side-observer."""
    docs = load_table(spark, sf_dir, "documents")
    plain = docs.where(F.length("text") >= 200)
    inst, _obs = instrument(plain, "g", rows=F.count(F.lit(1)))
    p_plain = plain._jdf.queryExecution().executedPlan().toString()
    p_inst = inst._jdf.queryExecution().executedPlan().toString()
    assert p_inst.count("Exchange") == p_plain.count("Exchange")
    assert p_inst.count("Scan parquet") == p_plain.count("Scan parquet") == 1
    assert "CollectMetrics" in p_inst
