"""Relational operator sweep over the TPC-H-ish fixture tables.

The reference has no joins/aggregation-matrix/set-ops surface at all
(SURVEY.md §2.3 marks them ABSENT — its only aggregations are the
three app reducers, `mrapps/wc.go:41-44`, `mrapps/indexer.go:36-39`,
`mrapps/crash.go:45-55`); this module provides the full relational
breadth a user of a general engine expects, expressed declaratively
so Catalyst supplies pushdown, pruning, partial aggregation and join
selection.

Scale notes (100 TB posture):
- `nation`/`region` (25/5 rows — kilobytes at any SF) are explicitly
  `broadcast()` so the fact-side join never shuffles.
- Fact⋈fact joins (orders⋈lineitem, customer⋈orders) shuffle on the
  join key; AQE (session.tune) handles skew splitting + partition
  coalescing at runtime.
- All double SUM/AVG aggregates go through functions.numeric dsum/davg
  (exact decimal partial aggregation) so results are bit-identical
  under any parallelism — required by the driver's value-hash gate
  and free at scale (still map-side combined).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from mit_mapreduce_spark.catalog import load_table
from mit_mapreduce_spark.functions.numeric import davg, dsum, sql_davg, sql_dsum
from mit_mapreduce_spark.operators.registry import query


# --- scans: projection + predicate pushdown -------------------------------

@query(
    "filter_pushdown",
    oracle="""
    SELECT l_orderkey, l_linenumber, l_quantity, l_extendedprice, l_shipdate
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1998-01-01' AND l_discount > 0.05
    """,
)
def filter_pushdown(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Projection + filter. Both the predicate and the 5-column
    projection reach the parquet scan (PushedFilters/ReadSchema in
    explain()) — at 100 TB this reads a fraction of the table."""
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.where((F.col("l_shipdate") >= F.lit("1998-01-01").cast("timestamp"))
                 & (F.col("l_discount") > 0.05))
        .select("l_orderkey", "l_linenumber", "l_quantity",
                "l_extendedprice", "l_shipdate")
    )


# --- joins ----------------------------------------------------------------

@query(
    "join_broadcast_revenue",
    oracle=f"""
    SELECT n.n_name AS nation,
           COUNT(*) AS n_orders,
           {sql_dsum('o.o_totalprice', 'revenue')}
    FROM customer c
    JOIN orders o ON o.o_custkey = c.c_custkey
    JOIN nation n ON n.n_nationkey = c.c_nationkey
    GROUP BY n.n_name
    """,
)
def join_broadcast_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Inner join chain with a broadcast dimension: revenue per nation.
    `nation` is broadcast (25 rows at every SF) so only the
    customer⋈orders shuffle remains."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    n = load_table(spark, sf_dir, "nation")
    return (
        o.join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .groupBy(F.col("n_name").alias("nation"))
        .agg(F.count("*").alias("n_orders"), dsum("o_totalprice", "revenue"))
    )


@query(
    "join_shipping_priority",
    oracle=f"""
    SELECT o.o_orderkey,
           {sql_dsum('l.l_extendedprice * (1 - l.l_discount)', 'revenue')},
           o.o_orderdate
    FROM customer c
    JOIN orders o ON o.o_custkey = c.c_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    WHERE c.c_mktsegment = 'BUILDING'
      AND o.o_orderdate < TIMESTAMP '1998-01-01'
      AND l.l_shipdate > TIMESTAMP '1998-01-01'
    GROUP BY o.o_orderkey, o.o_orderdate
    ORDER BY revenue DESC, o_orderkey
    LIMIT 10
    """,
)
def join_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q3-shaped: selective filters on all three tables (pushed
    to the scans), two key-partitioned joins, aggregation, top-10.
    The LIMIT after ORDER BY is a TakeOrderedAndProject — no global
    sort materializes at scale."""
    c = load_table(spark, sf_dir, "customer").where(F.col("c_mktsegment") == "BUILDING")
    o = load_table(spark, sf_dir, "orders").where(
        F.col("o_orderdate") < F.lit("1998-01-01").cast("timestamp"))
    li = load_table(spark, sf_dir, "lineitem").where(
        F.col("l_shipdate") > F.lit("1998-01-01").cast("timestamp"))
    return (
        c.join(o, c.c_custkey == o.o_custkey)
        .join(li, o.o_orderkey == li.l_orderkey)
        .groupBy("o_orderkey", "o_orderdate")
        .agg(dsum(F.col("l_extendedprice") * (1 - F.col("l_discount")), "revenue"))
        .select("o_orderkey", "revenue", "o_orderdate")
        .orderBy(F.col("revenue").desc(), F.col("o_orderkey"))
        .limit(10)
    )


@query(
    "join_left_order_counts",
    oracle="""
    SELECT c.c_custkey, COUNT(o.o_orderkey) AS n_orders
    FROM customer c
    LEFT JOIN orders o ON o.o_custkey = c.c_custkey
    GROUP BY c.c_custkey
    """,
)
def join_left_order_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left outer join: order count per customer including zero-order
    customers (COUNT of a nullable key skips the null-extended rows)."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    return (
        c.join(o, c.c_custkey == o.o_custkey, "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("n_orders"))
    )


@query(
    "join_semi_big_spenders",
    oracle="""
    SELECT c_custkey, c_name, c_acctbal
    FROM customer c
    WHERE EXISTS (SELECT 1 FROM orders o
                  WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 400000)
    """,
)
def join_semi_big_spenders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left-semi join: customers holding at least one >400k order. The
    semi join shuffles only the key column of the probe side and never
    duplicates matches."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders").where(F.col("o_totalprice") > 400000)
    return (
        c.join(o, c.c_custkey == o.o_custkey, "left_semi")
        .select("c_custkey", "c_name", "c_acctbal")
    )


@query(
    "join_anti_no_big_order",
    oracle="""
    SELECT c_custkey, c_name, c_acctbal
    FROM customer c
    WHERE NOT EXISTS (SELECT 1 FROM orders o
                      WHERE o.o_custkey = c.c_custkey
                        AND o.o_totalprice > 400000)
    """,
)
def join_anti_no_big_order(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left-anti join: customers who never placed a >400k order (the
    complement of the semi join above — every fixture customer has
    orders, so an unfiltered anti-join would be empty and the hash
    check trivially green)."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders").where(F.col("o_totalprice") > 400000)
    return (
        c.join(o, c.c_custkey == o.o_custkey, "left_anti")
        .select("c_custkey", "c_name", "c_acctbal")
    )


# --- aggregation matrix ---------------------------------------------------

@query(
    "agg_matrix",
    oracle=f"""
    SELECT l_returnflag, l_linestatus,
           {sql_dsum('l_quantity', 'sum_qty')},
           {sql_dsum('l_extendedprice', 'sum_price')},
           {sql_dsum('l_extendedprice * (1 - l_discount)', 'sum_disc_price')},
           {sql_davg('l_quantity', 'avg_qty')},
           MIN(l_extendedprice) AS min_price,
           MAX(l_extendedprice) AS max_price,
           COUNT(*) AS count_all,
           COUNT(DISTINCT l_orderkey) AS nd_orders
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '2001-09-01'
    GROUP BY l_returnflag, l_linestatus
    """,
)
def agg_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1-shaped aggregation matrix: SUM/AVG/MIN/MAX/COUNT/
    COUNT-DISTINCT in one grouped pass. Catalyst plans partial (map-
    side) aggregation for everything except the distinct, which
    becomes a two-phase expand — one extra shuffle, no row explosion.

    r14 (guide §2.5 input skew): fan_out before the aggregate — the
    single-row-group fixture scan pinned the partial aggregation +
    distinct expand to ONE task (measured ~2.4 s vs ~1.6 s with the
    spread); the gate removes the repartition on any multi-file
    table."""
    from mit_mapreduce_spark.catalog import fan_out

    li = fan_out(load_table(spark, sf_dir, "lineitem").where(
        F.col("l_shipdate") <= F.lit("2001-09-01").cast("timestamp")))
    return (
        li.groupBy("l_returnflag", "l_linestatus")
        .agg(
            dsum("l_quantity", "sum_qty"),
            dsum("l_extendedprice", "sum_price"),
            dsum(F.col("l_extendedprice") * (1 - F.col("l_discount")), "sum_disc_price"),
            davg("l_quantity", "avg_qty"),
            F.min("l_extendedprice").alias("min_price"),
            F.max("l_extendedprice").alias("max_price"),
            F.count("*").alias("count_all"),
            F.countDistinct("l_orderkey").alias("nd_orders"),
        )
    )


@query(
    "agg_rollup",
    oracle=f"""
    SELECT l_returnflag, l_linestatus,
           COUNT(*) AS n_rows, {sql_dsum('l_quantity', 'sum_qty')}
    FROM lineitem
    GROUP BY ROLLUP (l_returnflag, l_linestatus)
    """,
)
def agg_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROLLUP grouping sets: (flag,status), (flag), () — subtotal rows
    carry NULL group keys in both engines."""
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.rollup("l_returnflag", "l_linestatus")
        .agg(F.count("*").alias("n_rows"), dsum("l_quantity", "sum_qty"))
    )


@query(
    "agg_cube",
    oracle=f"""
    SELECT o_orderstatus, o_orderpriority,
           COUNT(*) AS n_orders, {sql_dsum('o_totalprice', 'sum_price')}
    FROM orders
    GROUP BY CUBE (o_orderstatus, o_orderpriority)
    """,
)
def agg_cube(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUBE grouping sets: all four subsets of the two group keys."""
    o = load_table(spark, sf_dir, "orders")
    return (
        o.cube("o_orderstatus", "o_orderpriority")
        .agg(F.count("*").alias("n_orders"), dsum("o_totalprice", "sum_price"))
    )


# --- sorts / limits / top-k ----------------------------------------------

@query(
    "topk_orders",
    oracle="""
    SELECT o_orderkey, o_custkey, o_totalprice, o_orderdate
    FROM orders
    ORDER BY o_totalprice DESC, o_orderkey
    LIMIT 10
    """,
)
def topk_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Global top-k. ORDER BY + LIMIT compiles to TakeOrderedAndProject:
    each partition keeps its local top-10 and only those reach the
    driver — no global sort, no full shuffle, at any scale. Tie-broken
    on o_orderkey so the result set is deterministic."""
    o = load_table(spark, sf_dir, "orders")
    return (
        o.select("o_orderkey", "o_custkey", "o_totalprice", "o_orderdate")
        .orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey"))
        .limit(10)
    )


# --- set operations -------------------------------------------------------

@query(
    "set_union_nations",
    oracle="""
    SELECT c_nationkey AS nationkey FROM customer
    UNION
    SELECT s_nationkey AS nationkey FROM supplier
    """,
)
def set_union_nations(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UNION (distinct): nations having customers or suppliers."""
    c = load_table(spark, sf_dir, "customer").select(F.col("c_nationkey").alias("nationkey"))
    s = load_table(spark, sf_dir, "supplier").select(F.col("s_nationkey").alias("nationkey"))
    return c.union(s).distinct()


@query(
    "set_intersect_nations",
    oracle="""
    SELECT c_nationkey AS nationkey FROM customer
    INTERSECT
    SELECT s_nationkey AS nationkey FROM supplier
    """,
)
def set_intersect_nations(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INTERSECT: nations having both customers and suppliers."""
    c = load_table(spark, sf_dir, "customer").select(F.col("c_nationkey").alias("nationkey"))
    s = load_table(spark, sf_dir, "supplier").select(F.col("s_nationkey").alias("nationkey"))
    return c.intersect(s)


@query(
    "set_except_nations",
    oracle="""
    SELECT c_nationkey AS nationkey FROM customer
    EXCEPT
    SELECT s_nationkey AS nationkey FROM supplier
    """,
)
def set_except_nations(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXCEPT: nations having customers but no suppliers."""
    c = load_table(spark, sf_dir, "customer").select(F.col("c_nationkey").alias("nationkey"))
    s = load_table(spark, sf_dir, "supplier").select(F.col("s_nationkey").alias("nationkey"))
    return c.subtract(s)


# --- scalar function surface ---------------------------------------------

@query(
    "scalars_date",
    oracle=f"""
    SELECT CAST(year(o_orderdate) AS INT) AS yr,
           CAST(quarter(o_orderdate) AS INT) AS qtr,
           CAST(month(o_orderdate) AS INT) AS mth,
           COUNT(*) AS n_orders,
           {sql_dsum('o_totalprice', 'sum_price')}
    FROM orders
    GROUP BY 1, 2, 3
    """,
)
def scalars_date(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Date-part scalars (year/quarter/month) as group keys."""
    o = load_table(spark, sf_dir, "orders")
    return (
        o.groupBy(
            F.year("o_orderdate").cast("int").alias("yr"),
            F.quarter("o_orderdate").cast("int").alias("qtr"),
            F.month("o_orderdate").cast("int").alias("mth"),
        )
        .agg(F.count("*").alias("n_orders"), dsum("o_totalprice", "sum_price"))
    )


@query(
    "scalars_mathstring",
    oracle="""
    SELECT p_partkey,
           upper(p_brand) AS brand_uc,
           substring(p_type, 1, 6) AS type_pfx,
           CAST(length(p_name) AS BIGINT) AS name_len,
           concat(p_brand, ':', p_type) AS brand_type,
           CAST(abs(p_size - 25) AS INT) AS size_dev,
           CAST(p_partkey % 7 AS BIGINT) AS key_mod,
           round(p_retailprice, 1) AS price_r1,
           CAST(floor(p_retailprice / 100) AS BIGINT) AS price_bucket
    FROM part
    """,
)
def scalars_mathstring(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Row-level string/math scalar surface: case-mapping, substring,
    length, concat, abs, modulo, round, floor-bucketing — all
    whole-stage-codegen JVM expressions, no Python in the loop."""
    p = load_table(spark, sf_dir, "part")
    return p.select(
        "p_partkey",
        F.upper("p_brand").alias("brand_uc"),
        F.substring("p_type", 1, 6).alias("type_pfx"),
        F.length("p_name").cast("bigint").alias("name_len"),
        F.concat(F.col("p_brand"), F.lit(":"), F.col("p_type")).alias("brand_type"),
        F.abs(F.col("p_size") - 25).cast("int").alias("size_dev"),
        (F.col("p_partkey") % 7).cast("bigint").alias("key_mod"),
        F.round("p_retailprice", 1).alias("price_r1"),
        F.floor(F.col("p_retailprice") / 100).cast("bigint").alias("price_bucket"),
    )


@query(
    "agg_percentiles",
    oracle="""
    SELECT l_returnflag,
           quantile_cont(l_quantity, 0.5) AS p50_qty,
           quantile_cont(l_quantity, 0.25) AS p25_qty,
           quantile_cont(l_quantity, 0.9) AS p90_qty,
           quantile_cont(l_extendedprice, 0.95) AS p95_price
    FROM lineitem GROUP BY l_returnflag
    """,
)
def agg_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact interpolated percentiles (Spark `percentile` ≡ DuckDB
    `quantile_cont`, both linear interpolation — verified identical).
    The multi-quantile array form shares one sort per group. At
    100 TB prefer approx_percentile for fixed-memory sketches; exact
    percentile is the oracle-comparable variant."""
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.groupBy("l_returnflag")
        .agg(
            F.expr("percentile(l_quantity, 0.5)").alias("p50_qty"),
            F.expr("percentile(l_quantity, array(0.25, 0.9))").alias("_pq"),
            F.expr("percentile(l_extendedprice, 0.95)").alias("p95_price"),
        )
        .select(
            "l_returnflag", "p50_qty",
            F.element_at("_pq", 1).alias("p25_qty"),
            F.element_at("_pq", 2).alias("p90_qty"),
            "p95_price",
        )
    )


@query(
    "agg_grouping_sets",
    oracle=f"""
    SELECT l_returnflag, l_linestatus,
           COUNT(*) AS n_rows, {sql_dsum('l_extendedprice', 'sum_price')}
    FROM lineitem
    GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus))
    """,
)
def agg_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit GROUPING SETS (disjoint single-key sets — neither a
    rollup nor a cube): one Expand over the scan, one shuffle."""
    from mit_mapreduce_spark.catalog import register_views
    register_views(spark, sf_dir, ("lineitem",))
    return spark.sql(f"""
        SELECT l_returnflag, l_linestatus,
               COUNT(*) AS n_rows, {sql_dsum('l_extendedprice', 'sum_price')}
        FROM lineitem
        GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus))
    """)


@query(
    "agg_exact_distinct",
    oracle="""
    SELECT o_orderstatus, COUNT(DISTINCT o_custkey) AS exact_custs
    FROM orders
    GROUP BY o_orderstatus
    """,
)
def agg_exact_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact COUNT(DISTINCT) per group — the oracle-checked exact leg
    of the distinct-counting pair (VERDICT r2 #4); agg_approx_distinct
    is the fixed-memory HLL swap-in at scale."""
    o = load_table(spark, sf_dir, "orders")
    return (
        o.groupBy("o_orderstatus")
        .agg(F.countDistinct("o_custkey").alias("exact_custs"))
    )


@query("agg_approx_distinct")  # rows-only: HLL sketches are engine-specific
def agg_approx_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """approx_count_distinct (HyperLogLog++): the fixed-memory sketch
    that replaces exact COUNT(DISTINCT) at 100 TB (no expand, pure
    partial aggregation). Engine sketches differ, so this is rows-only
    for the driver; tests/test_relational_extra.py bounds its error
    against the exact count."""
    o = load_table(spark, sf_dir, "orders")
    return (
        o.groupBy("o_orderstatus")
        .agg(
            F.approx_count_distinct("o_custkey", 0.02).alias("approx_custs"),
            F.countDistinct("o_custkey").alias("exact_custs"),
        )
    )


_SKEW_SALTS = 8


@query(
    "join_salted_skew",
    oracle=f"""
    SELECT o.o_orderstatus,
           COUNT(*) AS n_items,
           {sql_dsum('l.l_extendedprice', 'sum_price')}
    FROM lineitem l
    JOIN orders o ON o.o_orderkey = l.l_orderkey
    GROUP BY o.o_orderstatus
    """,
)
def join_salted_skew(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Manually salted join — the skew-mitigation pattern for when one
    join key dominates (a hot orderkey at 100 TB): the probe side gets
    a deterministic salt in [0, 8), the build side is replicated once
    per salt, and the join key becomes (key, salt), splitting a hot
    key's rows across 8 tasks. The oracle is the UNSALTED join — the
    rewrite must be result-identical. (AQE's skewJoin does this
    automatically for sort-merge joins; the manual form covers
    aggregation skew and engines/paths AQE doesn't reach.)"""
    li = load_table(spark, sf_dir, "lineitem").withColumn(
        "_salt", F.pmod(F.col("l_linenumber"), F.lit(_SKEW_SALTS)))
    o = load_table(spark, sf_dir, "orders").withColumn(
        "_salt", F.explode(F.array(*[F.lit(i) for i in range(_SKEW_SALTS)])))
    return (
        li.join(o, (o.o_orderkey == li.l_orderkey) & (o._salt == li._salt))
        .groupBy("o_orderstatus")
        .agg(F.count("*").alias("n_items"), dsum("l_extendedprice", "sum_price"))
    )


_EVENT_TYPES = ("click", "error", "purchase", "signup", "view")


@query(
    "pivot_event_counts",
    oracle=f"""
    SELECT user_id,
           {', '.join(f"COUNT(CASE WHEN event_type = '{t}' THEN 1 END) AS n_{t}"
                      for t in _EVENT_TYPES)}
    FROM events
    GROUP BY user_id
    """,
)
def pivot_event_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PIVOT: per-user event-type counts as columns. The value list is
    explicit, so the pivot is one pass (no extra distinct-values job)
    and compiles to plain conditional aggregation — exactly what the
    oracle spells out."""
    ev = load_table(spark, sf_dir, "events")
    pivoted = (
        ev.groupBy("user_id")
        .pivot("event_type", list(_EVENT_TYPES))
        .count()
    )
    # pivot yields NULL for absent combinations; the COUNT(CASE) oracle
    # yields 0 — normalize, and rename to oracle-matching names.
    return pivoted.select(
        "user_id",
        *[F.coalesce(F.col(t), F.lit(0)).alias(f"n_{t}") for t in _EVENT_TYPES],
    )


@query(
    "unpivot_part_measures",
    oracle="""
    SELECT p_partkey, 'p_size' AS measure, CAST(p_size AS DOUBLE) AS val
    FROM part
    UNION ALL
    SELECT p_partkey, 'p_retailprice', p_retailprice FROM part
    """,
)
def unpivot_part_measures(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UNPIVOT (melt): wide measure columns to (key, measure, value)
    rows — one narrow scan, no shuffle; the inverse of pivot."""
    p = load_table(spark, sf_dir, "part")
    return (
        p.select("p_partkey",
                 F.col("p_size").cast("double").alias("p_size"),
                 "p_retailprice")
        .unpivot("p_partkey", ["p_size", "p_retailprice"], "measure", "val")
    )


_SQL_AVG_PRICE = ("(SELECT CAST(SUM(CAST(ROUND(o_totalprice, 4) AS "
                  "DECIMAL(28,4))) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE) "
                  "FROM orders)")


@query(
    "scalar_subquery_above_avg",
    oracle=f"""
    SELECT o_orderstatus, COUNT(*) AS n_orders
    FROM orders
    WHERE o_totalprice > {_SQL_AVG_PRICE}
    GROUP BY o_orderstatus
    """,
)
def scalar_subquery_above_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Uncorrelated scalar subquery: orders above the global mean
    price. The subquery executes once and broadcasts as a literal;
    the mean uses the exact-decimal form so the filter threshold is
    bit-identical in both engines (a last-ulp difference could flip
    boundary rows)."""
    from mit_mapreduce_spark.catalog import register_views
    register_views(spark, sf_dir, ("orders",))
    return spark.sql(f"""
        SELECT o_orderstatus, COUNT(*) AS n_orders
        FROM orders
        WHERE o_totalprice > {_SQL_AVG_PRICE}
        GROUP BY o_orderstatus
    """)


@query(
    "scalars_datemath",
    oracle="""
    SELECT o_orderkey,
           CAST(o_orderdate + INTERVAL 30 DAY AS TIMESTAMP) AS due_ts,
           CAST(date_diff('day', TIMESTAMP '1995-01-01', o_orderdate)
                AS INT) AS days_since_epoch_start,
           CAST(last_day(o_orderdate) AS DATE) AS month_end,
           CAST(dayofweek(o_orderdate) + 1 AS INT) AS dow,
           CAST(dayofyear(o_orderdate) AS INT) AS doy,
           CAST(weekofyear(o_orderdate) AS INT) AS woy
    FROM orders
    """,
)
def scalars_datemath(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Date arithmetic surface: interval add, day difference, month
    boundary, day-of-week/year, ISO week — all JVM datetime exprs.
    (dayofweek: Spark is 1=Sunday, DuckDB 0=Sunday — oracle adds 1; weekofyear: both ISO.)"""
    o = load_table(spark, sf_dir, "orders")
    return o.select(
        "o_orderkey",
        (F.col("o_orderdate") + F.expr("INTERVAL 30 DAYS")).alias("due_ts"),
        F.datediff(F.col("o_orderdate"), F.lit("1995-01-01").cast("timestamp"))
        .cast("int").alias("days_since_epoch_start"),
        F.last_day("o_orderdate").alias("month_end"),
        F.dayofweek("o_orderdate").cast("int").alias("dow"),
        F.dayofyear("o_orderdate").cast("int").alias("doy"),
        F.weekofyear("o_orderdate").cast("int").alias("woy"),
    )


@query(
    "join_local_supplier_volume",
    oracle=f"""
    SELECT n.n_name AS nation,
           {sql_dsum('l.l_extendedprice * (1 - l.l_discount)', 'revenue')},
           COUNT(*) AS n_items
    FROM customer c
    JOIN orders o ON o.o_custkey = c.c_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    JOIN supplier s ON s.s_suppkey = l.l_suppkey
                   AND s.s_nationkey = c.c_nationkey
    JOIN nation n ON n.n_nationkey = c.c_nationkey
    JOIN region r ON r.r_regionkey = n.n_regionkey
    WHERE r.r_name = 'ASIA'
      AND o.o_orderdate >= TIMESTAMP '1996-01-01'
      AND o.o_orderdate < TIMESTAMP '1998-01-01'
    GROUP BY n.n_name
    """,
)
def join_local_supplier_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q5-shaped six-table join: revenue from orders where the
    supplier and customer share a nation, restricted to one region and
    a date range. The join-ordering showcase: Catalyst pushes the
    region filter through nation (broadcast both), prunes columns on
    every scan, and AQE picks broadcast vs shuffle per join from
    runtime sizes — exactly the plan a hand-tuned engine would pick
    at 100 TB, with no manual ordering."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders").where(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1998-01-01").cast("timestamp")))
    li = load_table(spark, sf_dir, "lineitem")
    su = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation")
    r = load_table(spark, sf_dir, "region").where(F.col("r_name") == "ASIA")
    return (
        c.join(o, c.c_custkey == o.o_custkey)
        .join(li, o.o_orderkey == li.l_orderkey)
        .join(su, (su.s_suppkey == li.l_suppkey)
              & (su.s_nationkey == c.c_nationkey))
        .join(F.broadcast(n), n.n_nationkey == c.c_nationkey)
        .join(F.broadcast(r), r.r_regionkey == n.n_regionkey)
        .groupBy(F.col("n_name").alias("nation"))
        .agg(
            dsum(F.col("l_extendedprice") * (1 - F.col("l_discount")), "revenue"),
            F.count("*").alias("n_items"),
        )
    )


@query(
    "scalars_string2",
    oracle="""
    SELECT p_partkey,
           regexp_extract(p_name, '([a-z]+)', 1) AS first_word,
           split_part(p_type, ' ', 1) AS type_head,
           replace(p_brand, 'Brand', 'B') AS brand_short,
           lpad(CAST(p_size AS VARCHAR), 4, '0') AS size_padded,
           reverse(p_brand) AS brand_rev,
           repeat('*', p_size % 5) AS stars,
           CAST(strpos(p_type, 'a') AS INT) AS first_a
    FROM part
    """,
)
def scalars_string2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Second string round: regex capture, split_part, replace, lpad,
    reverse, repeat, position — all codegen JVM expressions."""
    p = load_table(spark, sf_dir, "part")
    return p.select(
        "p_partkey",
        F.regexp_extract("p_name", r"([a-z]+)", 1).alias("first_word"),
        F.split_part(F.col("p_type"), F.lit(" "), F.lit(1)).alias("type_head"),
        F.replace(F.col("p_brand"), F.lit("Brand"), F.lit("B")).alias("brand_short"),
        F.lpad(F.col("p_size").cast("string"), 4, "0").alias("size_padded"),
        F.reverse("p_brand").alias("brand_rev"),
        F.repeat(F.lit("*"), (F.col("p_size") % 5)).alias("stars"),
        F.instr(F.col("p_type"), "a").cast("int").alias("first_a"),
    )


@query(
    "scalars_conditional",
    oracle="""
    SELECT o_orderkey,
           nullif(o_orderstatus, 'O') AS status_or_null,
           coalesce(nullif(o_orderpriority, '1-URGENT'), 'TOP') AS prio_norm,
           CASE WHEN o_totalprice > 300000 THEN 'big'
                WHEN o_totalprice > 100000 THEN 'mid'
                ELSE 'small' END AS bucket,
           greatest(o_totalprice, 150000.0) AS floor_price,
           least(o_totalprice, 150000.0) AS cap_price,
           CAST(o_totalprice IS NULL AS BOOLEAN) AS price_missing
    FROM orders
    """,
)
def scalars_conditional(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Conditional/NULL surface: nullif/coalesce/CASE/greatest/least
    and an IS NULL predicate — deliberately produces NULLs in the
    output to exercise NULL-safe hashing end to end."""
    o = load_table(spark, sf_dir, "orders")
    return o.select(
        "o_orderkey",
        F.nullif(F.col("o_orderstatus"), F.lit("O")).alias("status_or_null"),
        F.coalesce(F.nullif(F.col("o_orderpriority"), F.lit("1-URGENT")),
                   F.lit("TOP")).alias("prio_norm"),
        F.when(F.col("o_totalprice") > 300000, "big")
        .when(F.col("o_totalprice") > 100000, "mid")
        .otherwise("small").alias("bucket"),
        F.greatest(F.col("o_totalprice"), F.lit(150000.0)).alias("floor_price"),
        F.least(F.col("o_totalprice"), F.lit(150000.0)).alias("cap_price"),
        F.col("o_totalprice").isNull().alias("price_missing"),
    )


@query(
    "join_full_outer_daily",
    oracle=f"""
    SELECT COALESCE(b.day, u.day) AS day,
           b.n_big, b.big_price, u.n_urgent
    FROM (SELECT CAST(o_orderdate AS DATE) AS day, COUNT(*) AS n_big,
                 {sql_dsum('o_totalprice', 'big_price')}
          FROM orders WHERE o_totalprice > 450000 GROUP BY 1) b
    FULL JOIN (SELECT CAST(o_orderdate AS DATE) AS day,
                      COUNT(*) AS n_urgent
               FROM orders WHERE o_orderpriority = '1-URGENT'
               GROUP BY 1) u
      ON u.day = b.day
    """,
)
def join_full_outer_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full outer join of two per-day aggregates (rare >450k orders vs
    common urgent orders): the date sets genuinely differ in both
    directions, so null extension is exercised on each side. Both
    inputs are pre-aggregated before the join — at 100 TB the join
    operates on days, not orders, and the two aggregations share the
    single scan-shuffle pattern."""
    o = load_table(spark, sf_dir, "orders")
    big = (
        o.where(F.col("o_totalprice") > 450000)
        .groupBy(F.col("o_orderdate").cast("date").alias("day"))
        .agg(F.count("*").alias("n_big"), dsum("o_totalprice", "big_price"))
    )
    urgent = (
        o.where(F.col("o_orderpriority") == "1-URGENT")
        .groupBy(F.col("o_orderdate").cast("date").alias("day"))
        .agg(F.count("*").alias("n_urgent"))
    )
    return (
        big.join(urgent, big.day == urgent.day, "full")
        .select(F.coalesce(big.day, urgent.day).alias("day"),
                "n_big", "big_price", "n_urgent")
    )


@query(
    "join_right_big_orders",
    oracle="""
    SELECT c.c_custkey, o.o_orderkey, o.o_totalprice
    FROM (SELECT * FROM orders WHERE o_totalprice > 450000) o
    RIGHT JOIN customer c ON o.o_custkey = c.c_custkey
    """,
)
def join_right_big_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Right outer join: every customer, paired with each of their
    >450k orders or a single null-extended row. Physically the mirror
    of a left join (Spark swaps sides); listed so the full
    inner/left/right/full/semi/anti matrix is driver-checked."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders").where(F.col("o_totalprice") > 450000)
    return (
        o.join(c, o.o_custkey == c.c_custkey, "right")
        .select("c_custkey", "o_orderkey", "o_totalprice")
    )


@query(
    "cross_region_nation",
    oracle="""
    SELECT r.r_name, n.n_name,
           CAST(r.r_regionkey = n.n_regionkey AS BOOLEAN) AS is_home
    FROM region r CROSS JOIN nation n
    """,
)
def cross_region_nation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deliberate CROSS JOIN of the two constant-size dimensions
    (5 x 25 = 125 rows at every SF). This is the one place a cartesian
    product is correct: both sides are broadcast-tiny, so the plan is
    a BroadcastNestedLoopJoin with no shuffle. Data-dependent
    cartesians remain banned (tests/test_plans.py asserts the big
    operators never contain one)."""
    r = load_table(spark, sf_dir, "region")
    n = load_table(spark, sf_dir, "nation")
    return (
        r.crossJoin(F.broadcast(n))
        .select("r_name", "n_name",
                (F.col("r_regionkey") == F.col("n_regionkey")).alias("is_home"))
    )


_SQL_CORR_AVG = ("(SELECT CAST(SUM(CAST(ROUND(o2.o_totalprice, 4) AS "
                 "DECIMAL(28,4))) AS DOUBLE) / CAST(COUNT(o2.o_totalprice) "
                 "AS DOUBLE) FROM orders o2 WHERE o2.o_custkey = o.o_custkey)")


@query(
    "subquery_corr_above_cust_avg",
    oracle=f"""
    SELECT o_orderkey, o_custkey, o_totalprice
    FROM orders o
    WHERE o_totalprice > {_SQL_CORR_AVG}
    """,
)
def subquery_corr_above_cust_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated scalar subquery: each customer's orders above that
    customer's own mean price. Catalyst de-correlates this into an
    aggregate + self-join on o_custkey — one extra shuffle, never a
    per-row subquery execution. The mean uses the exact-decimal form
    so boundary rows can't flip between engines."""
    from mit_mapreduce_spark.catalog import register_views
    register_views(spark, sf_dir, ("orders",))
    return spark.sql(f"""
        SELECT o_orderkey, o_custkey, o_totalprice
        FROM orders o
        WHERE o_totalprice > {_SQL_CORR_AVG}
    """)


@query(
    "set_union_all_priorities",
    oracle="""
    SELECT prio, COUNT(*) AS n
    FROM (SELECT o_orderpriority AS prio FROM orders WHERE o_orderstatus = 'F'
          UNION ALL
          SELECT o_orderpriority FROM orders WHERE o_totalprice > 100000) u
    GROUP BY prio
    """,
)
def set_union_all_priorities(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UNION ALL (bag semantics): the two branches overlap, and the
    downstream counts double-count the overlap — which is exactly what
    distinguishes UNION ALL from the distinct UNION above. Physically
    free: union is plan concatenation, no shuffle until the count."""
    o = load_table(spark, sf_dir, "orders")
    f_branch = o.where(F.col("o_orderstatus") == "F").select(
        F.col("o_orderpriority").alias("prio"))
    big_branch = o.where(F.col("o_totalprice") > 100000).select(
        F.col("o_orderpriority").alias("prio"))
    return (
        f_branch.unionAll(big_branch)
        .groupBy("prio")
        .agg(F.count("*").alias("n"))
    )


@query(
    "map_event_profile",
    oracle=f"""
    SELECT user_id,
           COUNT(CASE WHEN event_type = 'click' THEN 1 END) AS n_click,
           COUNT(CASE WHEN event_type = 'error' THEN 1 END) AS n_error,
           CAST(COUNT(DISTINCT event_type) AS INT) AS n_types
    FROM events
    GROUP BY user_id
    """,
)
def map_event_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Map-function surface: build a per-user event_type→count map
    with map_from_entries, then read it back with element_at /
    map_keys. The oracle computes the same scalars relationally, so
    the map construction/access path is verified without comparing
    engine-specific map renderings."""
    ev = load_table(spark, sf_dir, "events")
    counts = (
        ev.groupBy("user_id", "event_type").agg(F.count("*").alias("c"))
        .groupBy("user_id")
        .agg(F.map_from_entries(
            F.collect_list(F.struct("event_type", "c"))).alias("m"))
    )
    return counts.select(
        "user_id",
        F.coalesce(F.element_at("m", "click"), F.lit(0)).alias("n_click"),
        F.coalesce(F.element_at("m", "error"), F.lit(0)).alias("n_error"),
        F.size(F.map_keys("m")).cast("int").alias("n_types"),
    )


@query(
    "join_profit_nation_year",
    oracle=f"""
    SELECT n.n_name AS nation,
           CAST(year(o.o_orderdate) AS INT) AS o_year,
           {sql_dsum('l.l_extendedprice * (1 - l.l_discount)', 'profit')},
           COUNT(*) AS n_items
    FROM part p
    JOIN lineitem l ON l.l_partkey = p.p_partkey
    JOIN supplier s ON s.s_suppkey = l.l_suppkey
    JOIN orders o ON o.o_orderkey = l.l_orderkey
    JOIN nation n ON n.n_nationkey = s.s_nationkey
    WHERE p.p_name LIKE '%bolt%'
    GROUP BY n.n_name, year(o.o_orderdate)
    """,
)
def join_profit_nation_year(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q9-shaped profit rollup: five-table star join (lineitem
    fact against part/supplier/orders/nation dims) with a LIKE filter
    on the part dimension, grouped by supplier nation and order year.

    Scale posture: the p_name predicate prunes part BEFORE the join
    (pushed to the scan), the filtered part set and nation broadcast,
    and lineitem — the 100 TB fact — is never shuffled except for the
    final (nation, year) aggregation, which partial-aggregates
    map-side. Catalyst + AQE order the remaining joins from runtime
    sizes, the same plan a hand-tuned engine would pick."""
    p = load_table(spark, sf_dir, "part").where(F.col("p_name").like("%bolt%"))
    li = load_table(spark, sf_dir, "lineitem")
    s = load_table(spark, sf_dir, "supplier")
    o = load_table(spark, sf_dir, "orders")
    n = load_table(spark, sf_dir, "nation")
    return (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .join(s, s.s_suppkey == li.l_suppkey)
        .join(o, o.o_orderkey == li.l_orderkey)
        .join(F.broadcast(n), n.n_nationkey == s.s_nationkey)
        .groupBy(
            F.col("n_name").alias("nation"),
            F.year("o_orderdate").cast("int").alias("o_year"))
        .agg(
            dsum(F.col("l_extendedprice") * (1 - F.col("l_discount")), "profit"),
            F.count("*").alias("n_items"),
        )
    )


# --- SQL front door -------------------------------------------------------

_SQL_FRONTDOOR = """
SELECT n_name AS nation,
       CAST(SUM(CAST(ROUND(l_extendedprice * (1 - l_discount), 4)
                AS DECIMAL(28,4))) AS DOUBLE) AS revenue,
       CAST(COUNT(*) AS BIGINT) AS n_lines
FROM lineitem
JOIN supplier ON s_suppkey = l_suppkey
JOIN nation ON n_nationkey = s_nationkey
GROUP BY n_name
"""


@query("sql_frontdoor_revenue", oracle=_SQL_FRONTDOOR)
def sql_frontdoor_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The SQL surface itself: ONE query string executed verbatim by
    both engines — ``spark.sql`` over the registered fixture views on
    the Spark side, DuckDB on the oracle side. Proves a reference user
    can bring plain ANSI SQL to this engine (no DataFrame code at all)
    and get hash-identical results; Catalyst plans it exactly like the
    DataFrame twin (broadcast nation, one agg shuffle, map-side
    combined exact-decimal sums)."""
    from mit_mapreduce_spark.catalog import register_views
    register_views(spark, sf_dir, ("lineitem", "supplier", "nation"))
    return spark.sql(_SQL_FRONTDOOR)
