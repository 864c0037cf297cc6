"""Bucketed co-located join: pre-bucketing both join sides on the key
eliminates the join shuffle entirely — the storage-layout tool for
repeated fact⋈fact joins at 100 TB (pay one shuffle at write time,
join shuffle-free forever after).
"""

import pytest

from mit_mapreduce_spark import plans
from mit_mapreduce_spark.catalog import load_table

N_BUCKETS = 8


@pytest.fixture()
def no_broadcast(spark):
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    yield
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)


def test_bucketed_join_has_no_shuffle(spark, sf_dir, tmp_path, no_broadcast):
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    (c.write.bucketBy(N_BUCKETS, "c_custkey").sortBy("c_custkey")
     .mode("overwrite").saveAsTable("bkt_customer"))
    (o.write.bucketBy(N_BUCKETS, "o_custkey").sortBy("o_custkey")
     .mode("overwrite").saveAsTable("bkt_orders"))

    bc = spark.table("bkt_customer")
    bo = spark.table("bkt_orders")
    joined = bc.join(bo, bc.c_custkey == bo.o_custkey).select(
        "c_custkey", "o_orderkey", "o_totalprice")

    # Co-located: SortMergeJoin with ZERO exchanges.
    assert plans.shuffle_count(joined) == 0, plans.formatted_plan(joined)
    assert "SortMergeJoin" in plans.formatted_plan(joined)

    # And it still computes the right thing.
    plain = c.join(o, c.c_custkey == o.o_custkey)
    assert joined.count() == plain.count()

    spark.sql("DROP TABLE IF EXISTS bkt_customer")
    spark.sql("DROP TABLE IF EXISTS bkt_orders")
