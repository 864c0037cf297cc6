"""Streaming twins of the batch event queries (oracle-exempt: the
driver records rows-only checks for streaming, __spark_entry__
contract; exact parity with the batch results is asserted in
tests/test_streaming.py instead).

Both queries run a real Structured Streaming job (file source →
watermark → stateful aggregation → memory sink, one availableNow
micro-batch) and return the drained result as a batch DataFrame.
At 100 TB-scale deployments the identical plan runs continuously
against Kafka with the same watermark/window semantics; the
availableNow drain is the test-harness shape.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from mit_mapreduce_spark.functions.numeric import dsum
from mit_mapreduce_spark.operators.registry import query
from mit_mapreduce_spark.session import tune
from mit_mapreduce_spark.streaming import events_stream, run_stream_to_table

SESSION_GAP = "4 hours"   # matches operators.events.SESSION_GAP_US


@query("stream_tumbling_hourly")
def stream_tumbling_hourly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming hourly tumbling rollup: watermark + window + count/
    exact-decimal sum, complete-mode drain. Matches the batch
    `tumbling_hourly` aggregates (asserted in tests)."""
    tune(spark)
    ev = events_stream(spark, sf_dir).withWatermark("ts", "1 hour")
    agg = (
        ev.groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(F.count("*").alias("n_events"), dsum("value", "sum_value"))
        .select(F.col("w.start").alias("window_start"), "event_type",
                "n_events", "sum_value")
    )
    return spark.table(run_stream_to_table(agg, "complete"))


@query("stream_sessionize")
def stream_sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming gap-based sessionization via session_window: the
    stateful native operator whose merge semantics equal the batch
    lag/cumsum construction in operators/events.py (asserted in
    tests). Complete-mode drain emits every session's final state."""
    tune(spark)
    ev = events_stream(spark, sf_dir).withWatermark("ts", "1 hour")
    agg = (
        ev.groupBy(F.session_window("ts", SESSION_GAP).alias("sw"), "user_id")
        .agg(
            F.count("*").alias("n_events"),
            F.min("ts").alias("session_start"),
            F.max("ts").alias("session_end"),
            dsum("value", "sum_value"),
        )
        .select("user_id", "n_events", "session_start", "session_end",
                "sum_value")
    )
    return spark.table(run_stream_to_table(agg, "complete"))
