"""Hive-style partition pruning: a filter on the partition column must
prune directories at planning time — at 100 TB this is the difference
between scanning one day and scanning the lake.
"""

from pyspark.sql import functions as F

from mit_mapreduce_spark import plans
from mit_mapreduce_spark.catalog import load_table


def test_partition_pruning_on_year(spark, sf_dir, tmp_path):
    out = str(tmp_path / "orders_by_year")
    o = load_table(spark, sf_dir, "orders").withColumn(
        "o_year", F.year("o_orderdate"))
    o.write.partitionBy("o_year").mode("overwrite").parquet(out)

    back = spark.read.parquet(out).where(F.col("o_year") == 1997)
    plan = plans.formatted_plan(back)
    assert "PartitionFilters" in plan and "o_year" in plan, plan

    # the pruned read only touches the 1997 directory
    files = back.select(F.input_file_name().alias("f")).distinct().collect()
    assert files and all("o_year=1997" in r.f for r in files), files

    expect = o.where(F.col("o_year") == 1997).count()
    assert back.count() == expect


def test_dynamic_partition_pruning_from_dim_filter(spark, sf_dir, tmp_path):
    """DPP: a filter on the DIMENSION side must prune the partitioned
    fact at RUNTIME — the fact's partition filter is a subquery over
    the dim, injected by Spark, visible as `dynamicpruningexpression`.
    At 100 TB this is what keeps `fact JOIN dim WHERE dim.attr = x`
    from scanning every fact partition when the partition key itself
    is never mentioned in the query."""
    out = str(tmp_path / "orders_by_year_dpp")
    o = load_table(spark, sf_dir, "orders").withColumn(
        "o_year", F.year("o_orderdate"))
    o.write.partitionBy("o_year").mode("overwrite").parquet(out)
    fact = spark.read.parquet(out)

    # year dimension with a DATA-dependent attribute: the filter is on
    # `tag`, so which years survive is unknowable at compile time —
    # only the runtime DPP subquery over the dim can prune the fact
    # (a filter expressible as a literal on o_year would be constant-
    # folded into a static PartitionFilter instead, bypassing DPP)
    years = sorted(r.o_year for r in o.select("o_year").distinct().collect())
    dim = spark.createDataFrame(
        [(y, "focus" if y == 1997 else "other") for y in years],
        "o_year int, tag string").where(F.col("tag") == "focus")
    # broadcast the dim explicitly: at fixture scale Spark would
    # otherwise broadcast the (tiny) fact, and DPP only fires when the
    # filtered dim is the build side probing a partitioned fact scan.
    # (No input_file_name() here — a non-deterministic projection
    # between scan and join blocks the injected partition filter.)
    joined = fact.join(F.broadcast(dim), "o_year").drop("tag")

    plan = joined._jdf.queryExecution().executedPlan().toString()
    assert "dynamicpruningexpression" in plan.lower(), plan
    assert joined.count() == o.where(F.col("o_year") == 1997).count()
