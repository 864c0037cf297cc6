"""Registry of (query, oracle) pairs.

Every operator the engine claims is registered here as a callable
``(spark, sf_dir) -> DataFrame`` plus (when SQL-expressible) a DuckDB
oracle SQL string computing the same result on the same parquet
tables. The driver hash-compares the two at sf0.01 (row count +
column names + order-insensitive value hash), so:

- computed/aggregate columns are aliased identically on both sides;
- double-typed aggregates go through the decimal-exact helpers in
  ``functions.numeric`` so the Spark value is bit-identical to the
  DuckDB value regardless of partial-aggregation order;
- timestamps are compared under a UTC session timezone (catalog.tune).
"""

from __future__ import annotations

from collections.abc import Callable
from typing import Optional

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]

QUERIES: dict[str, QueryFn] = {}
ORACLES: dict[str, str] = {}


def query(name: str, oracle: Optional[str] = None) -> Callable[[QueryFn], QueryFn]:
    """Register a query; ``oracle=None`` marks it rows-only (the driver
    records a weaker check for genuinely non-SQL-expressible ops)."""

    def deco(fn: QueryFn) -> QueryFn:
        if name in QUERIES:
            raise ValueError(f"duplicate query name {name!r}")
        QUERIES[name] = fn
        if oracle is not None:
            ORACLES[name] = oracle
        return fn

    return deco
