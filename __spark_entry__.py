"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash → CORRECTNESS_r{N}.json).

All real work lives in the ``mit_mapreduce_spark`` package; this file
only exposes the operator registry (`operators/registry.py`) to the
driver.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from mit_mapreduce_spark import operators  # noqa: E402

operators.load_all()

SMOKE_SF_DIR = "/root/testdata/sf0.001"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query (word count, reference app A1) on sf0.001."""
    return operators.QUERIES["wordcount"](spark, SMOKE_SF_DIR)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2.

    Each callable takes (spark, sf_dir) and returns a DataFrame.
    Computed/aggregate columns are aliased to match ``oracle_sql``.
    """
    return dict(operators.QUERIES)


def oracle_sql() -> dict[str, str]:
    """DuckDB twin SQL for each SQL-expressible query; queries absent
    here (stateful streaming, stubbed-codec multimodal kernels,
    rand()-based sampling demos, engine-specific HLL sketches) get the
    driver's weaker rows-only check by design — every deterministic
    operator, including the LSH/MinHash pipelines and all Python-UDF
    variants, is fully oracle-checked.
    """
    return dict(operators.ORACLES)
