"""Window-function operators (rank / lag / cumulative / sliding frames).

ABSENT from the reference (SURVEY.md §2.3 — its only ordering is the
per-partition reduce sort, `mr/worker.go:181`); provided here as
first-class engine surface over the TPC-H-ish fixtures.

Scale notes: every window partitions on a high-cardinality key
(c_nationkey×custkey or o_custkey — millions of groups at 100 TB), so
the single window-exchange shuffle distributes evenly; no global
(unpartitioned) windows anywhere. Frame sums over doubles use the
exact-decimal trick (functions.numeric) so sliding-frame accumulation
order can't perturb the hash-compared values.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from mit_mapreduce_spark.catalog import load_table
from mit_mapreduce_spark.operators.registry import query

_DEC = "decimal(28,4)"


@query(
    "window_rank_topn",
    oracle="""
    SELECT c_nationkey, c_custkey, c_acctbal, rnk
    FROM (SELECT c_nationkey, c_custkey, c_acctbal,
                 CAST(row_number() OVER (PARTITION BY c_nationkey
                      ORDER BY c_acctbal DESC, c_custkey) AS INT) AS rnk
          FROM customer)
    WHERE rnk <= 3
    """,
)
def window_rank_topn(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-group top-N via row_number: 3 richest customers per nation.
    Deterministic tie-break on c_custkey (row_number over a non-total
    order is engine-dependent otherwise)."""
    c = load_table(spark, sf_dir, "customer")
    w = Window.partitionBy("c_nationkey").orderBy(
        F.col("c_acctbal").desc(), F.col("c_custkey"))
    return (
        c.select("c_nationkey", "c_custkey", "c_acctbal",
                 F.row_number().over(w).cast("int").alias("rnk"))
        .where(F.col("rnk") <= 3)
    )


@query(
    "window_lag_delta",
    oracle="""
    SELECT o_custkey, o_orderkey, o_orderdate,
           round(o_totalprice - lag(o_totalprice) OVER
                 (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey),
                 4) AS price_delta
    FROM orders
    """,
)
def window_lag_delta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LAG: change in order value between a customer's consecutive
    orders (NULL for each customer's first order). The subtraction of
    two exact doubles is one deterministic IEEE op; rounded to the
    fixture's 4-digit money scale on both sides."""
    o = load_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    return o.select(
        "o_custkey", "o_orderkey", "o_orderdate",
        F.round(F.col("o_totalprice") - F.lag("o_totalprice").over(w), 4)
        .alias("price_delta"),
    )


@query(
    "window_cumsum",
    oracle=f"""
    SELECT o_custkey, o_orderkey, o_orderdate,
           CAST(SUM(CAST(ROUND(o_totalprice, 4) AS {_DEC.upper()})) OVER
                (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                AS DOUBLE) AS cum_spend
    FROM orders
    """,
)
def window_cumsum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Running total of a customer's spend (growing frame). Decimal
    accumulation makes the running sum independent of how the engine
    evaluates the frame."""
    o = load_table(spark, sf_dir, "orders")
    w = (Window.partitionBy("o_custkey")
         .orderBy("o_orderdate", "o_orderkey")
         .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    return o.select(
        "o_custkey", "o_orderkey", "o_orderdate",
        F.sum(F.round("o_totalprice", 4).cast(_DEC)).over(w)
        .cast("double").alias("cum_spend"),
    )


@query(
    "window_moving_avg",
    oracle=f"""
    SELECT o_custkey, o_orderkey, o_orderdate,
           CAST(
             CAST(SUM(CAST(ROUND(o_totalprice, 4) AS {_DEC.upper()})) OVER w
                  AS DOUBLE)
             / CAST(COUNT(o_totalprice) OVER w AS DOUBLE)
           AS DOUBLE) AS avg3
    FROM orders
    WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                 ROWS BETWEEN 2 PRECEDING AND CURRENT ROW)
    """,
)
def window_moving_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """3-row sliding mean of order value per customer: exact decimal
    frame sum divided by the frame count as one double division, so
    sliding-window add/remove order is irrelevant."""
    o = load_table(spark, sf_dir, "orders")
    w = (Window.partitionBy("o_custkey")
         .orderBy("o_orderdate", "o_orderkey")
         .rowsBetween(-2, Window.currentRow))
    num = F.sum(F.round("o_totalprice", 4).cast(_DEC)).over(w).cast("double")
    den = F.count("o_totalprice").over(w).cast("double")
    return o.select(
        "o_custkey", "o_orderkey", "o_orderdate",
        (num / den).cast("double").alias("avg3"),
    )


@query(
    "window_rank_variants",
    oracle="""
    SELECT c_nationkey, c_custkey,
           CAST(dense_rank() OVER w AS INT) AS drnk,
           CAST(ntile(4) OVER w AS INT) AS quartile,
           percent_rank() OVER w AS prnk,
           first_value(c_custkey) OVER w AS richest_cust,
           CAST(cume_dist() OVER w AS DOUBLE) AS cdist
    FROM customer
    WINDOW w AS (PARTITION BY c_nationkey
                 ORDER BY c_acctbal DESC, c_custkey)
    """,
)
def window_rank_variants(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The remaining ranking-function family over one shared window:
    dense_rank, ntile, percent_rank, first_value, cume_dist. A single
    partition exchange serves all five (checked in test_plans)."""
    c = load_table(spark, sf_dir, "customer")
    w = Window.partitionBy("c_nationkey").orderBy(
        F.col("c_acctbal").desc(), F.col("c_custkey"))
    return c.select(
        "c_nationkey", "c_custkey",
        F.dense_rank().over(w).cast("int").alias("drnk"),
        F.ntile(4).over(w).cast("int").alias("quartile"),
        F.percent_rank().over(w).alias("prnk"),
        F.first("c_custkey").over(w).alias("richest_cust"),
        F.cume_dist().over(w).cast("double").alias("cdist"),
    )


@query(
    "window_range_frame",
    oracle="""
    SELECT o_custkey, o_orderkey, o_orderdate,
           CAST(SUM(CAST(ROUND(o_totalprice, 4) AS DECIMAL(28,4))) OVER w
                AS DOUBLE) AS sum_30d,
           CAST(COUNT(*) OVER w AS BIGINT) AS n_30d
    FROM orders
    WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate
                 RANGE BETWEEN INTERVAL 30 DAYS PRECEDING AND CURRENT ROW)
    """,
)
def window_range_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-RANGE frame (vs the ROWS frames above): each order's
    trailing-30-day order value per customer. RANGE frames bound by
    event-time distance, not row count — same-timestamp peers always
    share a frame, so the result is deterministic without a row
    tie-break. Spark range frames take a numeric order key; epoch
    seconds with a ±30-day offset is exactly DuckDB's INTERVAL frame
    (both ends inclusive)."""
    o = load_table(spark, sf_dir, "orders")
    w = (Window.partitionBy("o_custkey")
         .orderBy(F.unix_timestamp("o_orderdate"))
         .rangeBetween(-30 * 86400, Window.currentRow))
    return o.select(
        "o_custkey", "o_orderkey", "o_orderdate",
        F.sum(F.round("o_totalprice", 4).cast(_DEC)).over(w)
        .cast("double").alias("sum_30d"),
        F.count("*").over(w).cast("bigint").alias("n_30d"),
    )
