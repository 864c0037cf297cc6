"""Skew stress tests (VERDICT r4 #6): the fixture tables are uniform,
so the skew machinery — the manual salted join and AQE's runtime
skew-join split — was never exercised against actual skew. These tests
build a deliberately skewed dataset (one hot order owning ~30% of all
lineitems, SURVEY §7.4's named top scale risk) and assert

1. the salted-join rewrite is result-identical to the plain join on
   skewed data (losslessness of the salting, not just on uniform keys);
2. the salt actually spreads the hot key's rows across tasks;
3. AQE's skew-join split FIRES on the skewed shuffle (`skew=true` in
   the final adaptive SortMergeJoin) and returns the same result.
"""

import pytest

from pyspark.sql import functions as F

from mit_mapreduce_spark import operators
from mit_mapreduce_spark.operators.registry import QUERIES

operators.load_all()

HOT_KEY = 7
N_ORDERS = 400
N_ITEMS_COLD = 20_000    # spread over N_ORDERS-1 cold orders
N_ITEMS_HOT = 10_000     # ~33% of all items on the one hot order


@pytest.fixture(scope="module")
def skew_dir(tmp_path_factory):
    """A minimal skewed sf_dir: orders + lineitem parquet where order
    HOT_KEY owns ~a third of all lineitems (uniform elsewhere), with
    just the columns join_salted_skew touches."""
    from mit_mapreduce_spark.session import get_spark

    spark = get_spark("tests", cpus=8, shuffle_partitions=8)
    out = tmp_path_factory.mktemp("skewdata")

    orders = spark.range(N_ORDERS).select(
        F.col("id").alias("o_orderkey"),
        (F.col("id") % 50).alias("o_custkey"),
        F.element_at(
            F.array(F.lit("O"), F.lit("F"), F.lit("P")),
            (F.col("id") % 3 + 1).cast("int")).alias("o_orderstatus"),
    )
    cold = spark.range(N_ITEMS_COLD).select(
        (F.col("id") % (N_ORDERS - 1) + (F.col("id") % (N_ORDERS - 1)
         >= HOT_KEY).cast("long")).alias("l_orderkey"),
        (F.col("id") % 7 + 1).cast("int").alias("l_linenumber"),
        (F.col("id") % 1000 + 1).cast("double").alias("l_extendedprice"),
    )
    hot = spark.range(N_ITEMS_HOT).select(
        F.lit(HOT_KEY).cast("long").alias("l_orderkey"),
        (F.col("id") % 7 + 1).cast("int").alias("l_linenumber"),
        (F.col("id") % 500 + 1).cast("double").alias("l_extendedprice"),
    )
    orders.write.mode("overwrite").parquet(str(out / "orders.parquet"))
    cold.unionAll(hot).write.mode("overwrite").parquet(
        str(out / "lineitem.parquet"))
    return str(out)


def test_salted_join_identical_on_skewed_keys(spark, skew_dir):
    """The salted rewrite must be result-identical to the plain join
    when a key is genuinely hot — counts AND sums, exact."""
    from mit_mapreduce_spark.catalog import load_table

    salted = {tuple(r) for r in
              QUERIES["join_salted_skew"](spark, skew_dir).collect()}
    li = load_table(spark, skew_dir, "lineitem")
    o = load_table(spark, skew_dir, "orders")
    plain = {tuple(r) for r in (
        li.join(o, o.o_orderkey == li.l_orderkey)
        .groupBy("o_orderstatus")
        .agg(F.count("*").alias("n_items"),
             F.sum(F.col("l_extendedprice").cast("decimal(38,2)"))
             .cast("double").alias("sum_price"))
        .collect())}
    assert salted == plain
    # sanity: the fixture is actually skewed
    hot_share = (li.where(F.col("l_orderkey") == HOT_KEY).count()
                 / li.count())
    assert hot_share > 0.3


def test_salt_spreads_hot_key(spark, skew_dir):
    """The point of the salt: the hot key's rows land in multiple
    (key, salt) groups, not one — the property that splits one hot
    task into _SKEW_SALTS tasks at 100 TB."""
    from mit_mapreduce_spark.catalog import load_table
    from mit_mapreduce_spark.operators.relational import _SKEW_SALTS

    li = load_table(spark, skew_dir, "lineitem").withColumn(
        "_salt", F.pmod(F.col("l_linenumber"), F.lit(_SKEW_SALTS)))
    groups = (li.where(F.col("l_orderkey") == HOT_KEY)
              .groupBy("_salt").count().collect())
    assert len(groups) > 1
    # no single salt group holds the whole hot key
    assert max(g["count"] for g in groups) < N_ITEMS_HOT


def test_aqe_skew_join_split_fires(spark, skew_dir):
    """AQE must detect the hot partition at runtime and split it:
    final adaptive plan shows a SortMergeJoin with skew=true, and the
    result matches the un-tuned join."""
    from mit_mapreduce_spark.catalog import load_table

    conf = spark.conf
    saved = {k: conf.get(k, None) for k in (
        "spark.sql.adaptive.enabled",
        "spark.sql.autoBroadcastJoinThreshold",
        "spark.sql.adaptive.skewJoin.enabled",
        "spark.sql.adaptive.skewJoin.skewedPartitionFactor",
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
        "spark.sql.adaptive.advisoryPartitionSizeInBytes",
        "spark.sql.adaptive.coalescePartitions.enabled",
    )}
    try:
        conf.set("spark.sql.adaptive.enabled", "true")
        # force sort-merge (broadcast would bypass the skew path)
        conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        conf.set("spark.sql.adaptive.skewJoin.enabled", "true")
        # thresholds scaled down so the tiny fixture's hot partition
        # counts as skewed: > factor×median AND > absolute threshold
        conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "2")
        conf.set("spark.sql.adaptive.skewJoin."
                 "skewedPartitionThresholdInBytes", "16KB")
        conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "8KB")
        conf.set("spark.sql.adaptive.coalescePartitions.enabled", "false")

        li = load_table(spark, skew_dir, "lineitem")
        o = load_table(spark, skew_dir, "orders")
        # terminal join (no downstream shuffle): OptimizeSkewedJoin is
        # conservative about splitting a partitioning a later stage
        # would have reused — the production pattern it targets is the
        # join-then-write / join-then-local-op shape
        joined = li.join(o, o.o_orderkey == li.l_orderkey)
        # execute THIS plan object (count() would plan a separate
        # aggregate query and leave joined's adaptive plan unfinalized)
        total = len(joined.collect())

        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "isFinalPlan=true" in plan, plan
        assert "skew=true" in plan, f"AQE skew split did not fire:\n{plan}"

        assert total == N_ITEMS_COLD + N_ITEMS_HOT
    finally:
        for k, v in saved.items():
            if v is None:
                conf.unset(k)
            else:
                conf.set(k, v)


def test_aqe_coalesces_small_shuffles(spark, sf_dir):
    """The static shuffle-partition count is a memory CAP, not a
    fragmentation sentence: a small post-shuffle dataset must be
    coalesced by AQE into far fewer partitions at runtime (the 100 TB
    posture in reverse — the same config serves huge and tiny stages
    because AQE right-sizes after seeing actual map output)."""
    from mit_mapreduce_spark.catalog import load_table
    from pyspark.sql import functions as F

    df = (load_table(spark, sf_dir, "nation")
          .groupBy("n_regionkey").agg(F.count("*").alias("n")))
    rows = df.collect()
    assert len(rows) == 5
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "AQEShuffleRead" in plan and "coalesced" in plan, plan
