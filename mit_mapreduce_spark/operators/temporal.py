"""Temporal join/rollup operators Spark has no native primitive for:
as-of join, range join, multi-granularity (hypertable-style) rollup.

Each is expressed as a composition of existing DataFrame operators
(the (a)-tier strategy for custom operators: no UDF, no state store),
and each is fully oracle-checked — the as-of join against DuckDB's
NATIVE ``ASOF JOIN``, proving the composition implements the real
semantics, not an approximation.

Scale notes:
- as-of: union + per-key ordered window (one user_id exchange) —
  the merge-join formulation; never builds the O(n·m) inequality
  join a naive ``ts_b <= ts_a`` join condition would.
- range join: the band dimension is tiny and broadcast; the non-equi
  condition runs as BroadcastNestedLoopJoin over it (rows × bands,
  linear in the fact side).
- multigrain rollup: one Expand + one shuffle produces hour/day/month
  aggregates simultaneously (the continuous-aggregate backfill shape).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from mit_mapreduce_spark.catalog import load_table, register_views
from mit_mapreduce_spark.functions.numeric import dsum, sql_dsum
from mit_mapreduce_spark.operators.registry import query


@query(
    "join_asof",
    oracle="""
    WITH clicks AS (SELECT event_id, user_id, ts FROM events
                    WHERE event_type = 'click'),
    errs AS (SELECT user_id, ts, value FROM events
             WHERE event_type = 'error')
    SELECT c.event_id, c.user_id, c.ts,
           e.ts AS asof_error_ts, e.value AS asof_error_value
    FROM clicks c
    ASOF LEFT JOIN errs e
      ON c.user_id = e.user_id AND e.ts <= c.ts
    """,
)
def join_asof(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join: each click gets the same user's most recent error
    at-or-before it (NULL if none yet).

    Implementation: tag both sides, union, and take a running
    last-non-null over (user, ts) — the single-pass merge formulation.
    Error rows sort before click rows at equal ts so the inclusive
    ``e.ts <= c.ts`` bound holds. The oracle is DuckDB's native ASOF
    JOIN, so the composition is checked against real as-of semantics."""
    ev = load_table(spark, sf_dir, "events")
    clicks = ev.where(F.col("event_type") == "click").select(
        "event_id", "user_id", "ts",
        F.lit(1).alias("_is_click"),
        F.lit(None).cast("timestamp").alias("_err_ts"),
        F.lit(None).cast("double").alias("_err_val"),
    )
    errs = ev.where(F.col("event_type") == "error").select(
        F.lit(None).cast("bigint").alias("event_id"),
        "user_id", "ts",
        F.lit(0).alias("_is_click"),
        F.col("ts").alias("_err_ts"),
        F.col("value").alias("_err_val"),
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "_is_click")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    merged = clicks.unionByName(errs).select(
        "event_id", "user_id", "ts", "_is_click",
        F.last("_err_ts", ignorenulls=True).over(w).alias("asof_error_ts"),
        F.last("_err_val", ignorenulls=True).over(w).alias("asof_error_value"),
    )
    return (
        merged.where(F.col("_is_click") == 1)
        .select("event_id", "user_id", "ts", "asof_error_ts", "asof_error_value")
    )


_BANDS = [(0, 500), (500, 1000), (1000, 1500), (1500, 2500)]


@query(
    "join_range_bands",
    oracle=f"""
    WITH bands(band_lo, band_hi) AS (
      VALUES {', '.join(f'({lo}, {hi})' for lo, hi in _BANDS)})
    SELECT b.band_lo, b.band_hi,
           COUNT(*) AS n_parts,
           {sql_dsum('p.p_retailprice', 'sum_price')}
    FROM part p
    JOIN bands b
      ON p.p_retailprice >= b.band_lo AND p.p_retailprice < b.band_hi
    GROUP BY b.band_lo, b.band_hi
    """,
)
def join_range_bands(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Range (interval) join: facts matched to price bands by a
    non-equi condition. The band dimension is broadcast, so the
    inequality join is a per-row scan over 4 bands — the correct plan
    when the interval side is small. (For two large interval sets,
    pre-bucket both sides to turn it into an equi-join.)"""
    p = load_table(spark, sf_dir, "part")
    bands = spark.createDataFrame(_BANDS, ["band_lo", "band_hi"])
    return (
        p.join(F.broadcast(bands),
               (p.p_retailprice >= bands.band_lo)
               & (p.p_retailprice < bands.band_hi))
        .groupBy("band_lo", "band_hi")
        .agg(F.count("*").alias("n_parts"), dsum("p_retailprice", "sum_price"))
    )


@query(
    "rollup_multigrain",
    oracle=f"""
    SELECT CAST(date_trunc('hour', ts) AS TIMESTAMP) AS g_hour,
           CAST(date_trunc('day', ts) AS TIMESTAMP) AS g_day,
           CAST(date_trunc('month', ts) AS TIMESTAMP) AS g_month,
           COUNT(*) AS n_events,
           {sql_dsum('value', 'sum_value')}
    FROM events
    GROUP BY GROUPING SETS ((date_trunc('hour', ts)),
                            (date_trunc('day', ts)),
                            (date_trunc('month', ts)))
    """,
)
def rollup_multigrain(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hypertable-style continuous-aggregate backfill: hour, day, and
    month rollups of the event stream in ONE pass (grouping sets →
    one Expand, one shuffle) instead of three scans. The online
    (incremental) counterpart is stream_tumbling_hourly; coarser
    grains aggregate from the hourly tier."""
    register_views(spark, sf_dir, ("events",))
    return spark.sql(f"""
        SELECT date_trunc('hour', ts) AS g_hour,
               date_trunc('day', ts) AS g_day,
               date_trunc('month', ts) AS g_month,
               COUNT(*) AS n_events,
               {sql_dsum('value', 'sum_value')}
        FROM events
        GROUP BY GROUPING SETS ((date_trunc('hour', ts)),
                                (date_trunc('day', ts)),
                                (date_trunc('month', ts)))
    """)


@query(
    "scd2_user_state",
    oracle="""
    WITH src AS (
      SELECT user_id, event_type AS state, ts, event_id FROM events),
    flagged AS (
      SELECT user_id, state, ts, event_id,
             lag(state) OVER w AS prev_state
      FROM src
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
    changes AS (
      SELECT user_id, state, ts AS valid_from, event_id
      FROM flagged
      WHERE prev_state IS NULL OR state <> prev_state)
    SELECT user_id, state, valid_from,
           lead(valid_from) OVER w AS valid_to,
           lead(valid_from) OVER w IS NULL AS is_current,
           CAST(row_number() OVER w AS INT) AS version
    FROM changes
    WINDOW w AS (PARTITION BY user_id ORDER BY valid_from, event_id)
    """,
)
def scd2_user_state(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SCD Type-2 history derivation (the CDC/warehouse surface): the
    event stream per user collapsed into validity intervals of its
    tracked state — consecutive repeats merged, [valid_from, valid_to)
    intervals closed by the next change, open interval flagged
    current, monotone version numbers.

    Two ordered windows over one user_id exchange (change detection,
    then interval closing — Catalyst reuses the partitioning, so ONE
    shuffle total). Ties on ts are broken by event_id so the history
    is deterministic on any engine and any partitioning. At 100 TB
    this is the standard log→dimension compaction; the same plan
    incrementalizes per partition-of-users."""
    ev = load_table(spark, sf_dir, "events").select(
        "user_id", F.col("event_type").alias("state"), "ts", "event_id")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    changes = (
        ev.withColumn("prev_state", F.lag("state").over(w))
        .where(F.col("prev_state").isNull()
               | (F.col("state") != F.col("prev_state")))
        .select("user_id", "state", F.col("ts").alias("valid_from"), "event_id")
    )
    w2 = Window.partitionBy("user_id").orderBy("valid_from", "event_id")
    return changes.select(
        "user_id", "state", "valid_from",
        F.lead("valid_from").over(w2).alias("valid_to"),
        F.lead("valid_from").over(w2).isNull().alias("is_current"),
        F.row_number().over(w2).cast("int").alias("version"),
    )
