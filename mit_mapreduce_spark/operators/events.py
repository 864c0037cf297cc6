"""Batch event analytics over the `events` fixture: sessionization,
time-bucketed windows, JSON property extraction.

The reference is strictly batch text MapReduce (SURVEY.md §2.3 marks
streaming/windows ABSENT); these are the batch halves of the
north-star event surface. The streaming twins (Structured Streaming
with watermarks / session_window state) live in
operators/streaming_queries.py; since r8 the deterministic drains are
oracle-checked like any batch query (they reuse these ops' oracle SQL
verbatim) — only the order-dependent `stream_heavy_hitters` sketch
stays rows-only.

Scale notes: sessionization partitions by user_id (high cardinality —
the window shuffle distributes evenly; a single user's history is the
only per-task working set, the realistic bound for session logic).
Tumbling windows reduce to a date_trunc group key — plain partial
aggregation, one shuffle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from mit_mapreduce_spark.catalog import load_table
from mit_mapreduce_spark.functions.numeric import dsum, sql_dsum
from mit_mapreduce_spark.operators.registry import query

SESSION_GAP_US = 4 * 3600 * 1_000_000  # 4h inactivity closes a session


@query(
    "sessionize",
    oracle=f"""
    WITH flagged AS (
      SELECT user_id, event_id, ts, value,
             CASE WHEN epoch_us(ts) - lag(epoch_us(ts)) OVER
                       (PARTITION BY user_id ORDER BY ts, event_id)
                       > {SESSION_GAP_US}
                  OR lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
                       IS NULL
                  THEN 1 ELSE 0 END AS new_session
      FROM events),
    numbered AS (
      SELECT *, SUM(new_session) OVER
                (PARTITION BY user_id ORDER BY ts, event_id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_no
      FROM flagged)
    SELECT user_id,
           CAST(session_no AS BIGINT) AS session_no,
           COUNT(*) AS n_events,
           MIN(ts) AS session_start,
           MAX(ts) AS session_end,
           CAST(epoch_us(MAX(ts)) - epoch_us(MIN(ts)) AS BIGINT) AS duration_us,
           {sql_dsum('value', 'sum_value')}
    FROM numbered
    GROUP BY user_id, session_no
    """,
)
def sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gap-based sessionization (batch): a 4-hour silence starts a new
    session. Classic lag → flag → running-count-of-flags → group; all
    three window steps share the single user_id exchange."""
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    wrun = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    us = F.unix_micros("ts")
    flagged = ev.select(
        "user_id", "event_id", "ts", "value",
        F.when(
            (us - F.lag(us).over(w) > SESSION_GAP_US)
            | F.lag("ts").over(w).isNull(),
            1,
        ).otherwise(0).alias("new_session"),
    )
    numbered = flagged.withColumn(
        "session_no", F.sum("new_session").over(wrun).cast("bigint"))
    return (
        numbered.groupBy("user_id", "session_no")
        .agg(
            F.count("*").alias("n_events"),
            F.min("ts").alias("session_start"),
            F.max("ts").alias("session_end"),
            (F.unix_micros(F.max("ts")) - F.unix_micros(F.min("ts")))
            .cast("bigint").alias("duration_us"),
            dsum("value", "sum_value"),
        )
    )


@query(
    "tumbling_hourly",
    oracle=f"""
    SELECT date_trunc('hour', ts) AS window_start,
           event_type,
           COUNT(*) AS n_events,
           COUNT(DISTINCT user_id) AS nd_users,
           {sql_dsum('value', 'sum_value')}
    FROM events
    GROUP BY 1, 2
    """,
)
def tumbling_hourly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hourly tumbling-window rollup per event type. Batch form uses
    the window() helper (same semantics Structured Streaming applies
    incrementally); a 1-hour tumble aligns with date_trunc('hour')."""
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(
            F.count("*").alias("n_events"),
            F.countDistinct("user_id").alias("nd_users"),
            dsum("value", "sum_value"),
        )
        .select(F.col("w.start").alias("window_start"), "event_type",
                "n_events", "nd_users", "sum_value")
    )


@query(
    "json_props",
    oracle=f"""
    WITH x AS (
      SELECT event_type,
             CASE WHEN props IS NOT NULL AND json_valid(props)
                  THEN TRY_CAST(json_extract_string(props, '$.k') AS DOUBLE)
                  END AS kd,
             CASE WHEN props IS NOT NULL AND json_valid(props)
                  THEN TRY_CAST(json_extract_string(props, '$.k') AS BIGINT)
                  END AS kb
      FROM events)
    SELECT event_type,
           COUNT(*) AS n_events,
           {sql_dsum("kd", 'sum_k')},
           MIN(kb) AS min_k,
           MAX(kb) AS max_k
    FROM x
    GROUP BY event_type
    """,
)
def json_props(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSON scalar surface: extract props.k from the JSON string column
    and aggregate it per event type. get_json_object stays JVM-side
    (no Python UDF) and prunes to the single referenced path."""
    ev = load_table(spark, sf_dir, "events")
    # get_json_object is NULL on malformed JSON; the CASTS must be
    # try_cast so a non-numeric value degrades to NULL the same way
    # (fuzz find: ANSI CAST crashed on '{"k": "string-not-int"}')
    kd = F.expr("try_cast(get_json_object(props, '$.k') AS double)")
    kb = F.expr("try_cast(get_json_object(props, '$.k') AS bigint)")
    return (
        ev.groupBy("event_type")
        .agg(
            F.count("*").alias("n_events"),
            dsum(kd, "sum_k"),
            F.min(kb).alias("min_k"),
            F.max(kb).alias("max_k"),
        )
    )


@query(
    "retention_cohorts",
    oracle="""
    WITH firsts AS (
      SELECT user_id, CAST(date_trunc('week', MIN(ts)) AS TIMESTAMP)
             AS cohort_week
      FROM events GROUP BY user_id)
    SELECT f.cohort_week,
           CAST(date_trunc('week', e.ts) AS TIMESTAMP) AS activity_week,
           CAST(COUNT(DISTINCT e.user_id) AS BIGINT) AS n_users,
           COUNT(*) AS n_events
    FROM events e JOIN firsts f ON f.user_id = e.user_id
    GROUP BY 1, 2
    """,
)
def retention_cohorts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohort retention matrix: users grouped by first-seen week,
    activity counted per subsequent week — the standard growth/
    retention triangle. Two aggregations, both keyed on user_id /
    (cohort, week): the firsts aggregate and the join shuffle on
    user_id, then one narrow rollup. At 100 TB `firsts` is a
    per-user row — orders of magnitude smaller than events — and
    AQE picks a broadcast for the join when it fits."""
    ev = load_table(spark, sf_dir, "events")
    firsts = (
        ev.groupBy("user_id")
        .agg(F.date_trunc("week", F.min("ts")).alias("cohort_week"))
    )
    return (
        ev.join(firsts, "user_id")
        .groupBy("cohort_week",
                 F.date_trunc("week", F.col("ts")).alias("activity_week"))
        .agg(F.countDistinct("user_id").cast("bigint").alias("n_users"),
             F.count("*").alias("n_events"))
    )


@query(
    "funnel_conversion",
    oracle="""
    WITH s1 AS (
      SELECT user_id, ts, event_type,
             MIN(CASE WHEN event_type = 'signup' THEN ts END)
               OVER (PARTITION BY user_id) AS ms
      FROM events),
    s2 AS (
      SELECT *, MIN(CASE WHEN event_type = 'click' AND ts >= ms
                      AND ts < ms + INTERVAL 24 HOUR THEN ts END)
                  OVER (PARTITION BY user_id) AS mc
      FROM s1),
    s3 AS (
      SELECT *, MIN(CASE WHEN event_type = 'purchase' AND ts >= mc
                      AND ts < mc + INTERVAL 24 HOUR THEN ts END)
                  OVER (PARTITION BY user_id) AS mp
      FROM s2)
    SELECT CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users,
           CAST(COUNT(DISTINCT CASE WHEN ms IS NOT NULL THEN user_id END)
                AS BIGINT) AS n_signup,
           CAST(COUNT(DISTINCT CASE WHEN mc IS NOT NULL THEN user_id END)
                AS BIGINT) AS n_click_after,
           CAST(COUNT(DISTINCT CASE WHEN mp IS NOT NULL THEN user_id END)
                AS BIGINT) AS n_purchase_after
    FROM s3
    """,
)
def funnel_conversion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered funnel: signup → first click at-or-after it → first
    purchase at-or-after that — each within 24 hours of the prior
    stage — counted as users reaching each stage.
    Three chained min-over-user windows SHARE one user_id exchange
    (same partitioning, consecutive stages — one shuffle total), then
    a global distinct-count rollup. The event-sequence pattern
    (attribution, abandonment, CEP precursor) composed from
    conditional window minima instead of per-user UDF loops."""
    ev = load_table(spark, sf_dir, "events")
    wu = Window.partitionBy("user_id")
    s1 = ev.select(
        "user_id", "ts", "event_type",
        F.min(F.when(F.col("event_type") == "signup", F.col("ts"))).over(wu)
        .alias("ms"))
    s2 = s1.withColumn(
        "mc",
        F.min(F.when((F.col("event_type") == "click")
                     & (F.col("ts") >= F.col("ms"))
                     & (F.col("ts") < F.col("ms") + F.expr("INTERVAL 24 HOUR")),
                     F.col("ts"))).over(wu))
    s3 = s2.withColumn(
        "mp",
        F.min(F.when((F.col("event_type") == "purchase")
                     & (F.col("ts") >= F.col("mc"))
                     & (F.col("ts") < F.col("mc") + F.expr("INTERVAL 24 HOUR")),
                     F.col("ts"))).over(wu))
    return s3.agg(
        F.countDistinct("user_id").cast("bigint").alias("n_users"),
        F.countDistinct(F.when(F.col("ms").isNotNull(), F.col("user_id")))
        .cast("bigint").alias("n_signup"),
        F.countDistinct(F.when(F.col("mc").isNotNull(), F.col("user_id")))
        .cast("bigint").alias("n_click_after"),
        F.countDistinct(F.when(F.col("mp").isNotNull(), F.col("user_id")))
        .cast("bigint").alias("n_purchase_after"),
    )


@query(
    "snapshot_latest",
    oracle="""
    SELECT user_id, event_id, ts, event_type, value
    FROM (SELECT user_id, event_id, ts, event_type, value,
                 row_number() OVER (PARTITION BY user_id
                      ORDER BY ts DESC, event_id DESC) AS rn
          FROM events)
    WHERE rn = 1
    """,
)
def snapshot_latest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CDC-style latest-record snapshot: collapse an append-only event
    log to one current row per key (the upsert/compaction primitive a
    training-data pipeline uses to materialize "state as of now").

    row_number over (user_id, ts desc) with event_id as a total-order
    tie-break; one user_id exchange, and each task keeps only its
    running best row per key. At 100 TB the win over groupBy(max) +
    self-join is that the whole payload rides the single window pass —
    no second join to fetch the non-key columns."""
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy(
        F.col("ts").desc(), F.col("event_id").desc())
    return (
        ev.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") == 1)
        .select("user_id", "event_id", "ts", "event_type", "value")
    )


# --- calendar gap-fill ----------------------------------------------------

@query(
    "gapfill_hourly",
    oracle="""
    WITH bounds AS (
      SELECT date_trunc('hour', MIN(ts)) AS lo,
             date_trunc('hour', MAX(ts)) AS hi
      FROM events),
    spine AS (
      SELECT t.h AS window_start, e.event_type
      FROM (SELECT unnest(generate_series(lo, hi, INTERVAL 1 HOUR)) AS h
            FROM bounds) t
      CROSS JOIN (SELECT DISTINCT event_type FROM events) e),
    actual AS (
      SELECT date_trunc('hour', ts) AS window_start, event_type,
             COUNT(*) AS n_events
      FROM events GROUP BY 1, 2)
    SELECT s.window_start, s.event_type,
           CAST(COALESCE(a.n_events, 0) AS BIGINT) AS n_events
    FROM spine s
    LEFT JOIN actual a ON a.window_start = s.window_start
                      AND a.event_type = s.event_type
    """,
)
def gapfill_hourly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-series gap-fill: emit EVERY (hour, event_type) cell of the
    observed range with an explicit zero where no events landed —
    downstream anomaly detection and charting must distinguish "no
    data" from "not computed". The hour spine is generated with
    sequence() from a 1-row min/max aggregate (broadcast), crossed
    with the distinct type dimension, then left-joined to the actual
    rollup. At 100 TB the spine is |hours|x|types| rows — trivially
    small next to the events — and the only real shuffle is the
    rollup's own aggregation."""
    ev = load_table(spark, sf_dir, "events")
    bounds = F.broadcast(ev.agg(
        F.date_trunc("hour", F.min("ts")).alias("lo"),
        F.date_trunc("hour", F.max("ts")).alias("hi")))
    hours = bounds.select(F.explode(F.sequence(
        "lo", "hi", F.expr("INTERVAL 1 HOUR"))).alias("window_start"))
    types = ev.select("event_type").distinct()
    spine = hours.crossJoin(F.broadcast(types))
    actual = (
        ev.groupBy(F.date_trunc("hour", "ts").alias("window_start"),
                   "event_type")
        .agg(F.count("*").alias("_n"))
    )
    return (
        spine.join(actual, ["window_start", "event_type"], "left")
        .select("window_start", "event_type",
                F.coalesce(F.col("_n"), F.lit(0)).cast("bigint")
                .alias("n_events"))
    )


# --- z-score anomaly flagging ---------------------------------------------

Z_SCALE = 100          # event values carry 2 decimals: exact int grid
Z_THRESHOLD = 3.0


@query(
    "anomaly_events",
    oracle=f"""
    WITH stats AS (
      SELECT event_type,
             CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(CAST(ROUND(value * {Z_SCALE}) AS BIGINT)) AS BIGINT) AS s1,
             CAST(SUM(CAST(ROUND(value * {Z_SCALE}) AS BIGINT)
                      * CAST(ROUND(value * {Z_SCALE}) AS BIGINT)) AS BIGINT) AS s2
      FROM events GROUP BY event_type),
    m AS (
      SELECT event_type, n,
             CAST(s1 AS DOUBLE) / {Z_SCALE}.0 / CAST(n AS DOUBLE) AS mean,
             sqrt((CAST(s2 AS DOUBLE) / ({Z_SCALE}.0 * {Z_SCALE}.0)
                   / CAST(n AS DOUBLE))
                  - (CAST(s1 AS DOUBLE) / {Z_SCALE}.0 / CAST(n AS DOUBLE))
                    * (CAST(s1 AS DOUBLE) / {Z_SCALE}.0 / CAST(n AS DOUBLE)))
               AS sd
      FROM stats)
    SELECT e.event_id, e.event_type, e.value, m.mean, m.sd
    FROM events e JOIN m ON m.event_type = e.event_type
    WHERE abs(e.value - m.mean) > {Z_THRESHOLD} * m.sd
    """,
)
def anomaly_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Z-score outlier flagging per event type: events whose value sits
    more than {Z_THRESHOLD}σ from the type mean. Mean and population
    σ come from exact integer moments (values lifted to a 1e-2 grid,
    s1/s2 summed as BIGINT — order-independent), then one pinned IEEE
    expression per statistic, so the flag set is hash-exact across
    engines. Plan: one moments aggregation ({Z_SCALE}-scaled, map-side
    combined) broadcast back onto a second streaming pass — two scans,
    no window, the standard shape when the stats must see ALL rows
    before any row can be judged."""
    ev = load_table(spark, sf_dir, "events")
    v = F.round(F.col("value") * Z_SCALE).cast("bigint")
    stats = (
        ev.groupBy("event_type")
        .agg(F.count("*").cast("bigint").alias("n"),
             F.sum(v).cast("bigint").alias("s1"),
             F.sum(v * v).cast("bigint").alias("s2"))
    )
    mean = F.col("s1").cast("double") / float(Z_SCALE) / F.col("n").cast("double")
    sd = F.sqrt(
        (F.col("s2").cast("double") / float(Z_SCALE * Z_SCALE)
         / F.col("n").cast("double")) - mean * mean)
    m = F.broadcast(stats.select("event_type", mean.alias("mean"), sd.alias("sd")))
    return (
        ev.join(m, "event_type")
        .where(F.abs(F.col("value") - F.col("mean"))
               > Z_THRESHOLD * F.col("sd"))
        .select("event_id", "event_type", "value", "mean", "sd")
    )


# --- OHLC bar resample (min_by/max_by aggregates) -------------------------

@query(
    "ohlc_hourly",
    oracle="""
    SELECT date_trunc('hour', ts) AS bar_ts, event_type,
           arg_min(value, CAST(epoch_us(ts) AS HUGEINT)
                          * 1000000000000000000 + event_id) AS open,
           MAX(value) AS high,
           MIN(value) AS low,
           arg_max(value, CAST(epoch_us(ts) AS HUGEINT)
                          * 1000000000000000000 + event_id) AS close,
           CAST(COUNT(*) AS BIGINT) AS volume
    FROM events
    GROUP BY bar_ts, event_type
    """,
)
def ohlc_hourly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-series downsample to hourly OHLC bars per event type —
    the canonical financial/metrics resample, expressed with
    min_by/max_by selector aggregates so open/close come from the SAME
    single aggregation pass as high/low/volume (no window, no
    self-join, no per-bar sort).

    Open/close ties are impossible by construction: the selector key
    is the exact integer epoch_µs·10¹⁸ + event_id (HUGEINT in DuckDB,
    decimal(38,0) in Spark — max |key| ≈ 9.2·10³⁶ < 10³⁸, exact in
    both), a total order both engines compare identically
    (arg_min/arg_max vs min_by/max_by) — first/last is deterministic
    even when two events share a timestamp, for ANY epoch sign
    (pre-1970 included) and event_id < 10¹⁸ (ADVICE r4: the previous
    lpad-string key silently mis-ordered negative epochs and
    13+-digit ids).

    100 TB posture: one hash aggregation keyed (hour, type), map-side
    combined — each partial keeps 4 doubles + 2 (key,value) selector
    pairs per open bar, so a year of nanosecond ticks reduces to
    8760·|types| rows in a single shuffle."""
    ev = load_table(spark, sf_dir, "events")
    key = (F.unix_micros("ts").cast("decimal(38,0)")
           * F.lit(10 ** 18).cast("decimal(38,0)")
           + F.col("event_id").cast("decimal(38,0)"))
    return (
        ev.groupBy(F.date_trunc("hour", "ts").alias("bar_ts"), "event_type")
        .agg(F.min_by("value", key).alias("open"),
             F.max("value").alias("high"),
             F.min("value").alias("low"),
             F.max_by("value", key).alias("close"),
             F.count("*").cast("bigint").alias("volume"))
    )


# --- LOCF: last observation carried forward -------------------------------

@query(
    "locf_fill",
    oracle="""
    WITH sparse AS (
      SELECT event_id, user_id, ts,
             CASE WHEN event_type IN ('view', 'click') THEN NULL
                  ELSE value END AS v
      FROM events),
    filled AS (
      SELECT event_id, user_id, ts, v,
             last_value(v IGNORE NULLS) OVER (
               PARTITION BY user_id
               ORDER BY ts, event_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS v_filled
      FROM sparse)
    SELECT event_id, user_id, v_filled
    FROM filled
    WHERE v IS NULL AND v_filled IS NOT NULL
    """,
)
def locf_fill(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Last-observation-carried-forward: fill gaps in a per-user
    metric with the latest preceding non-null reading — the standard
    sensor/price-series repair (the fixture has no nulls, so sparsity
    is seeded deterministically by nulling two event types; rows
    emitted are exactly the repaired gaps).

    `last_value(..., ignorenulls=True)` over a running frame is the
    whole algorithm — one window, one exchange on user_id, ordered by
    the (ts, event_id) total order so engines agree under timestamp
    ties. The naive alternative (self-join each null row to its
    latest predecessor) is a range join per gap; the window form is
    what survives 100 TB."""
    ev = load_table(spark, sf_dir, "events")
    sparse = ev.select(
        "event_id", "user_id", "ts",
        F.when(F.col("event_type").isin("view", "click"), F.lit(None))
        .otherwise(F.col("value")).alias("v"))
    w = (Window.partitionBy("user_id").orderBy("ts", "event_id")
         .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    return (
        sparse.withColumn(
            "v_filled", F.last("v", ignorenulls=True).over(w))
        .where(F.col("v").isNull() & F.col("v_filled").isNotNull())
        .select("event_id", "user_id", "v_filled")
    )


# --- VARIANT semi-structured surface --------------------------------------

@query(
    "variant_props",
    oracle="""
    WITH x AS (
      SELECT event_type,
             CASE WHEN props IS NOT NULL AND json_valid(props)
                  THEN TRY_CAST(json_extract_string(props, '$.k') AS BIGINT)
                  END AS kb,
             CASE WHEN props IS NOT NULL AND json_valid(props)
                  THEN json_extract_string(props, '$.missing') END AS miss
      FROM events)
    SELECT event_type,
           CAST(SUM(kb) AS BIGINT) AS sum_k,
           CAST(COUNT(CASE WHEN miss IS NULL THEN NULL ELSE 1 END)
                AS BIGINT) AS n_with_missing
    FROM x
    GROUP BY event_type
    """,
)
def variant_props(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semi-structured surface v2: VARIANT (Spark 4's binary-encoded
    JSON type) — ``parse_json`` once, ``variant_get`` per path. Unlike
    get_json_object (json_props), which re-parses the JSON string for
    every extraction, a VARIANT column parses once and every probe is
    a binary traversal — at 100 TB with many probed paths, that's the
    difference between P parses and one. Absent paths return NULL
    (counted here to pin that semantic against the oracle).

    Malformed documents are VARIANT NULL (try_parse_json — fuzz find:
    parse_json failed the whole scan on one bad record). Duplicate-key
    objects are the one semi-structured input deliberately OUTSIDE the
    oracle contract: RFC 8259 leaves them undefined, Spark's VARIANT
    spec rejects them (→ NULL) while DuckDB keeps the first key — the
    fuzz suite pins the defined cases only."""
    ev = load_table(spark, sf_dir, "events")
    # try_parse_json: malformed documents become VARIANT NULL instead
    # of failing the scan (fuzz find), matching the oracle's
    # json_valid guard; try_variant_get degrades bad types to NULL
    v = F.try_parse_json("props")
    return (
        ev.select("event_type", v.alias("v"))
        .groupBy("event_type")
        .agg(F.sum(F.expr("try_variant_get(v, '$.k', 'bigint')"))
             .cast("bigint").alias("sum_k"),
             F.count(F.expr("try_variant_get(v, '$.missing', 'string')"))
             .cast("bigint").alias("n_with_missing"))
    )


# --- time-decayed engagement score ------------------------------------------

DECAY_HALF_LIFE_DAYS = 1   # score halves per day of age
DECAY_GRID = 1_000_000     # micro-unit integer grid for exact summation


@query(
    "decayed_engagement",
    oracle=f"""
    WITH anchor AS (SELECT MAX(ts) AS a FROM events),
    aged AS (
      SELECT user_id,
             CAST(date_diff('day', ts, a) AS BIGINT) AS age_days
      FROM events, anchor)
    SELECT user_id,
           CAST(COUNT(*) AS BIGINT) AS n_events,
           CAST(SUM(CAST(round(power(0.5, age_days) * {DECAY_GRID})
                         AS BIGINT)) AS BIGINT) AS score_micro
    FROM aged GROUP BY user_id
    """,
)
def decayed_engagement(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exponentially time-decayed engagement score per user: each
    event contributes pow(1/2, age_in_days) relative to the corpus
    anchor (its newest event) — the recency-weighted activity signal
    feature stores serve for ranking/churn models, where yesterday's
    click matters half as much as today's.

    Determinism contract: the per-event decay is quantized to a
    {DECAY_GRID} integer grid BEFORE summation (pow(0.5, k) is an
    exact binary double for integer k, and rounding it is engine-
    stable), so the aggregation is an integer sum — order-independent
    under any partitioning, unlike a raw double sum whose rounding
    drifts with shuffle order (the dsum lesson applied to decay
    weights). Plan: 1-row anchor aggregate broadcast into the scan,
    then one user_id aggregation — a single pass at any scale; the
    decayed score also MERGES across shards/days by integer addition,
    which is how a feature store maintains it incrementally."""
    ev = load_table(spark, sf_dir, "events")
    anchor = ev.agg(F.max("ts").alias("a"))
    aged = (
        ev.crossJoin(F.broadcast(anchor))
        .select("user_id",
                F.datediff(F.col("a"), F.col("ts")).cast("bigint")
                .alias("age_days"))
    )
    return (
        aged.groupBy("user_id")
        .agg(F.count("*").cast("bigint").alias("n_events"),
             F.sum(F.round(F.pow(F.lit(0.5), F.col("age_days"))
                           * DECAY_GRID).cast("bigint"))
             .cast("bigint").alias("score_micro"))
    )


# --- Markov transition matrix over per-user event sequences ----------------

_SQL_TRANSITIONS = """
    WITH seq AS (
      SELECT user_id, event_type,
             LAG(event_type) OVER (PARTITION BY user_id
                                   ORDER BY ts, event_id) AS prev_type
      FROM events WHERE ts IS NOT NULL
    ),
    cnt AS (
      SELECT prev_type, event_type,
             CAST(COUNT(*) AS BIGINT) AS n_transitions
      FROM seq WHERE prev_type IS NOT NULL
      GROUP BY prev_type, event_type
    )
    SELECT prev_type, event_type, n_transitions,
           CAST(n_transitions AS DOUBLE)
             / CAST(SUM(n_transitions) OVER (PARTITION BY prev_type)
                    AS DOUBLE) AS p_next
    FROM cnt
"""


@query("event_transitions", oracle=_SQL_TRANSITIONS)
def event_transitions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-order Markov transition matrix of user behavior: for each
    ordered pair of event types, how often a user's NEXT event is that
    type, and the conditional probability P(next | prev). The sequence
    step is a per-user LAG window ordered (ts, event_id) — event_id
    breaks timestamp ties so the sequence (and the hash gate) is
    deterministic in both engines. Counts are exact integers;
    p_next is one IEEE division of two exact integer counts (the
    per-prev total is a window SUM over the |types|² count table).

    100 TB posture: the LAG shuffle partitions by user_id (the same
    key sessionize/retention already shuffle on — a production
    pipeline shares that sort); everything after runs on a |event
    types|² table, constant-size regardless of corpus. No driver
    loops, no collect."""
    # An event without an event time cannot be sequenced: excluded in
    # BOTH engines (r8 review #6 — NULL ts sorts nulls-first in Spark
    # windows, nulls-last in DuckDB, and crashes the streaming twin).
    ev = load_table(spark, sf_dir, "events").where(F.col("ts").isNotNull())
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seq = ev.select("user_id", "event_type",
                    F.lag("event_type").over(w).alias("prev_type"))
    cnt = (
        seq.where(F.col("prev_type").isNotNull())
        .groupBy("prev_type", "event_type")
        .agg(F.count("*").cast("bigint").alias("n_transitions"))
    )
    tot = Window.partitionBy("prev_type")
    return cnt.select(
        "prev_type", "event_type", "n_transitions",
        (F.col("n_transitions").cast("double")
         / F.sum("n_transitions").over(tot).cast("double")).alias("p_next"),
    )


# --- user journey paths (first-k event pivot) -------------------------------

_SQL_JOURNEYS = """
    WITH seq AS (
      SELECT user_id, CAST(ts AS DATE) AS day, event_type,
             row_number() OVER (PARTITION BY user_id, CAST(ts AS DATE)
                                ORDER BY ts, event_id) AS rn
      FROM events WHERE ts IS NOT NULL
    ),
    paths AS (
      SELECT user_id, day,
             MIN(CASE WHEN rn = 1 THEN event_type END) AS e1,
             MIN(CASE WHEN rn = 2 THEN event_type END) AS e2,
             MIN(CASE WHEN rn = 3 THEN event_type END) AS e3
      FROM seq WHERE rn <= 3
      GROUP BY user_id, day
    )
    SELECT e1, e2, e3, CAST(COUNT(*) AS BIGINT) AS n_journeys
    FROM paths GROUP BY e1, e2, e3
"""


@query("user_journey_paths", oracle=_SQL_JOURNEYS)
def user_journey_paths(spark: SparkSession, sf_dir: str) -> DataFrame:
    """User-journey analysis: the distribution of each (user, day)'s
    FIRST THREE event types in order — the "how do sessions start"
    report behind onboarding funnels. The sequence is a row_number
    window ordered (ts, event_id) (deterministic under timestamp
    ties), the path is a 3-way conditional-MIN pivot (no string
    concatenation, no collect_list ordering hazard — a day with fewer
    than 3 events keeps NULL tail slots, grouped identically by both
    engines), and the journey counts are exact integers.

    100 TB posture: one (user, day) window shuffle — shared with the
    rest of the event tier's user-keyed ops — then aggregates over at
    most |types|³ path rows. The rn <= 3 predicate lets Spark plan a
    WindowGroupLimit: each partition keeps 3 rows per key before the
    pivot, so the paths table never materializes full days."""
    # NULL-ts events excluded, same contract as event_transitions
    ev = load_table(spark, sf_dir, "events").where(F.col("ts").isNotNull())
    w = Window.partitionBy("user_id", F.to_date("ts")).orderBy(
        "ts", "event_id")
    seq = ev.select(
        "user_id", F.to_date("ts").alias("day"), "event_type",
        F.row_number().over(w).alias("rn")).where(F.col("rn") <= 3)
    paths = seq.groupBy("user_id", "day").agg(
        F.min(F.when(F.col("rn") == 1, F.col("event_type"))).alias("e1"),
        F.min(F.when(F.col("rn") == 2, F.col("event_type"))).alias("e2"),
        F.min(F.when(F.col("rn") == 3, F.col("event_type"))).alias("e3"))
    return paths.groupBy("e1", "e2", "e3").agg(
        F.count("*").cast("bigint").alias("n_journeys"))
