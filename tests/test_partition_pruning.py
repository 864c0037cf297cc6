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
