"""Differential gate: every registered query with an oracle must match
DuckDB exactly at sf0.001 (the driver repeats this at sf0.01)."""

import pytest

from mit_mapreduce_spark import operators
from mit_mapreduce_spark.operators.registry import ORACLES, QUERIES
from mit_mapreduce_spark.testing import compare

operators.load_all()


@pytest.mark.parametrize("name", sorted(ORACLES))
def test_oracle_parity(spark, sf_dir, name):
    df = QUERIES[name](spark, sf_dir)
    ok, msg = compare(df, ORACLES[name], sf_dir)
    assert ok, f"{name}: {msg}"


def test_all_queries_return_rows(spark, sf_dir):
    """Rows-only smoke for oracle-exempt queries (streaming etc.)."""
    for name, fn in QUERIES.items():
        if name in ORACLES:
            continue
        df = fn(spark, sf_dir)
        assert df.count() >= 0, name
