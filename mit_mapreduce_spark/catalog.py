"""Fixture-table catalog.

The driver's synthetic tables (TESTDATA.md) are one parquet file per
table under ``/root/testdata/sf*/``. Loading is a plain columnar
parquet scan, so Catalyst gets predicate pushdown + column pruning for
free on every operator built on top.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

from mit_mapreduce_spark.session import tune

TABLES = (
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
)

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    if name not in TABLES:
        raise KeyError(f"unknown fixture table {name!r}; known: {TABLES}")
    return spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))


def register_views(spark: SparkSession, sf_dir: str,
                   tables: tuple[str, ...] = TABLES) -> SparkSession:
    """Register each fixture table as a temp view (idempotent) and apply
    runtime tuning (UTC session tz, AQE) — safe on driver-owned sessions."""
    tune(spark)
    for t in tables:
        load_table(spark, sf_dir, t).createOrReplaceTempView(t)
    return spark
