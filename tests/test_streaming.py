"""Streaming↔batch parity: the streaming queries are oracle-exempt in
the driver contract, so their correctness gate lives here — the
streaming result must equal the corresponding batch query exactly.
"""

from pyspark.sql import functions as F

from mit_mapreduce_spark import operators
from mit_mapreduce_spark.operators.registry import QUERIES

operators.load_all()


def _rows(df, cols):
    return sorted(tuple(r) for r in df.select(*cols).collect())


def test_stream_tumbling_equals_batch(spark, sf_dir):
    stream = QUERIES["stream_tumbling_hourly"](spark, sf_dir)
    batch = QUERIES["tumbling_hourly"](spark, sf_dir)
    cols = ["window_start", "event_type", "n_events", "sum_value"]
    assert _rows(stream, cols) == _rows(batch, cols)


def test_stream_sessionize_equals_batch(spark, sf_dir):
    stream = QUERIES["stream_sessionize"](spark, sf_dir)
    batch = QUERIES["sessionize"](spark, sf_dir)
    cols = ["user_id", "n_events", "session_start", "session_end", "sum_value"]
    assert _rows(stream, cols) == _rows(batch, cols)


def test_stream_user_stats_equals_batch_groupby(spark, sf_dir):
    """applyInPandasWithState accumulators must equal a batch groupBy."""
    from mit_mapreduce_spark.catalog import load_table
    from mit_mapreduce_spark.functions.numeric import dsum

    stream = QUERIES["stream_user_stats"](spark, sf_dir)
    ev = load_table(spark, sf_dir, "events")
    batch = ev.groupBy("user_id").agg(
        F.count("*").alias("n_events"),
        dsum("value", "sum_value"),
        F.max("ts").alias("last_ts"),
    )
    cols = ["user_id", "n_events", "sum_value", "last_ts"]
    assert _rows(stream, cols) == _rows(batch, cols)


def test_stream_interval_join_equals_batch(spark, sf_dir):
    """Stream-stream interval join must equal the batch self-join."""
    from mit_mapreduce_spark.catalog import load_table

    stream = QUERIES["stream_interval_join"](spark, sf_dir)
    ev = load_table(spark, sf_dir, "events")
    clicks = ev.where(F.col("event_type") == "click").select(
        F.col("event_id").alias("click_id"), F.col("user_id"),
        F.col("ts").alias("click_ts"))
    errors = ev.where(F.col("event_type") == "error").select(
        F.col("user_id").alias("e_user"), F.col("ts").alias("err_ts"),
        F.col("value").alias("err_value"))
    batch = clicks.join(
        errors,
        (F.col("user_id") == F.col("e_user"))
        & (F.col("err_ts") >= F.col("click_ts") - F.expr("INTERVAL 1 HOUR"))
        & (F.col("err_ts") <= F.col("click_ts")),
    ).select("click_id", "user_id", "click_ts", "err_ts", "err_value")
    cols = ["click_id", "user_id", "click_ts", "err_ts", "err_value"]
    assert _rows(stream, cols) == _rows(batch, cols)
