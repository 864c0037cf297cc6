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


def test_ohlc_open_close_deterministic_on_ts_ties(spark):
    """Two events in the same bar with the SAME timestamp: open/close
    must resolve by the (epoch_us, event_id) selector key, not by
    partition luck — the property that makes ohlc_hourly oracle-exact."""
    from pyspark.sql import functions as F

    rows = [
        # (event_id, ts, event_type, value) — all in one hour bucket
        (2, "2024-01-01 10:00:00", "x", 20.0),
        (1, "2024-01-01 10:00:00", "x", 10.0),  # same ts, lower id
        (3, "2024-01-01 10:59:59", "x", 30.0),
        (4, "2024-01-01 10:59:59", "x", 40.0),  # same ts, higher id
    ]
    ev = (spark.createDataFrame(
            rows, "event_id bigint, ts string, event_type string, value double")
          .withColumn("ts", F.col("ts").cast("timestamp"))
          .repartition(4))  # spread rows so order can't come from layout
    key = F.concat(
        F.lpad(F.unix_micros("ts").cast("string"), 20, "0"),
        F.lpad(F.col("event_id").cast("string"), 12, "0"))
    got = (
        ev.groupBy(F.date_trunc("hour", "ts").alias("bar_ts"), "event_type")
        .agg(F.min_by("value", key).alias("open"),
             F.max_by("value", key).alias("close"))
        .collect()[0]
    )
    assert got.open == 10.0, got   # event_id 1 wins the tie at open
    assert got.close == 40.0, got  # event_id 4 wins the tie at close
