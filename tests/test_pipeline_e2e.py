"""End-to-end curation run: the composed pipeline a user of this
engine actually executes — deterministic split, staged quality
filtering, keep-one dedup, sequence packing, Z-order-clustered
publish — wired across module boundaries with a real parquet write
and a manifest read-back.

The per-stage operators are each oracle-gated elsewhere; this test
proves they COMPOSE: the same doc_ids flow stage to stage, counts
reconcile at every hand-off, and the published artifact is readable
with the schema and row counts the manifest claims."""

import os

from pyspark.sql import functions as F

from mit_mapreduce_spark import sources
from mit_mapreduce_spark.catalog import load_table
from mit_mapreduce_spark.metrics import collect_metrics, instrument
from mit_mapreduce_spark.operators.curation import (
    SPLIT_SALT, SPLIT_TEST_BPS, SPLIT_VAL_BPS, gopher_quality_rules,
    quality_repetition,
)
from mit_mapreduce_spark.operators.dedup import dedup_clusters, hash60


def test_full_curation_pipeline(spark, sf_dir, tmp_path):
    docs = load_table(spark, sf_dir, "documents")
    n_docs = docs.count()

    # 1. deterministic split: keep the train slice
    bucket = F.pmod(
        hash60(F.concat(F.lit(SPLIT_SALT), F.col("doc_id").cast("string"))),
        F.lit(10_000))
    train = docs.where(bucket >= SPLIT_VAL_BPS + SPLIT_TEST_BPS)
    n_train = train.count()
    assert 0 < n_train <= n_docs

    # 2. quality gates (structural AND repetition verdicts)
    g = (gopher_quality_rules(spark, sf_dir)
         .select("doc_id", F.col("passes").alias("g")))
    r = (quality_repetition(spark, sf_dir)
         .select("doc_id", F.col("passes").alias("r")))
    passed = (train.join(g, "doc_id").join(r, "doc_id")
              .where(F.col("g") & F.col("r")).select("doc_id", "text",
                                                     "source", "lang"))
    n_passed = passed.count()
    assert n_passed <= n_train

    # 3. near-dup removal: keep each cluster's canonical doc
    clusters = dedup_clusters(spark, sf_dir)
    kept = (passed.join(clusters, "doc_id")
            .where(F.col("cluster_id") == F.col("doc_id"))
            .drop("cluster_id"))
    n_kept = kept.count()
    assert 0 < n_kept <= n_passed

    # 4. pack into fixed windows (per-source shard prefix sums), with
    #    observe-counters riding the same job
    toks = F.size(F.filter(F.split("text", r"\s+"), lambda x: x != ""))
    staged = kept.select("doc_id", "source", toks.alias("n_toks"))
    inst, obs = instrument(staged, "pack_stage",
                           rows=F.count(F.lit(1)),
                           tokens=F.sum("n_toks"))
    out_dir = str(tmp_path / "published")
    sources.zorder_write(inst, out_dir, "doc_id", "n_toks", n_files=4)
    m = collect_metrics(obs)
    assert m["rows"] == n_kept

    # 5. manifest read-back: the published artifact carries exactly
    #    the rows and token mass the counters observed
    back = spark.read.parquet(out_dir)
    assert back.count() == m["rows"]
    assert back.agg(F.sum("n_toks")).collect()[0][0] == m["tokens"]
    assert set(back.columns) == {"doc_id", "source", "n_toks"}
    files = [f for f in os.listdir(out_dir) if f.endswith(".parquet")]
    assert len(files) == 4
