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
