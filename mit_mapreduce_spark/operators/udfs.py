"""The modern Python UDF taxonomy, each variant oracle-checked.

The reference's entire public API is a UDTF (Map: one input → many
pairs) plus a UDAF (Reduce: grouped values → one string), loaded from
a Go plugin (`mr/worker.go:57-58`, `main/mrworker.go:34-51`). The
facade (`mapreduce.run_job`) reproduces that contract verbatim; this
module covers the rest of Spark's Python-function surface the way a
pipeline should use it when JVM expressions genuinely run out:

- scalar ``pandas_udf`` — Arrow-vectorized, one batch in / one out;
- ``pandas_udf`` GROUPED_AGG — a custom aggregate over Arrow batches;
- native ``@udtf`` — the declarative table-function form of Map.

Every one is deterministic by construction (integer-scaled floats, no
RNG), so all three are hash-checked against DuckDB — UDFs don't get a
weaker gate just for being Python. Scale posture: these are the SLOW
path (each moves data JVM↔Arrow↔Python); the JVM twins used everywhere
else in this repo are the default. Keep UDFs for logic expressions
can't say (model scoring, codec calls), never for arithmetic.

UDF objects are built inside the query functions (not at module
scope): the decorators resolve their DDL return types against the
active session, and operator modules import before any session
exists.
"""

from __future__ import annotations

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf, udtf

from mit_mapreduce_spark.catalog import load_table
from mit_mapreduce_spark.operators.registry import query

_SCALE4 = 10_000  # 4-decimal integer scaling, matches functions.numeric


def _make_chars_per_token():
    @pandas_udf("double")
    def chars_per_token(text: pd.Series) -> pd.Series:
        """Vectorized chars-per-whitespace-token ratio (0.0 on empty)."""
        n_chars = text.str.len()
        n_toks = text.str.split().str.len()
        return (n_chars / n_toks).where(n_toks > 0, 0.0).astype("float64")

    return chars_per_token


@query(
    "udf_scalar_ratio",
    oracle="""
    SELECT doc_id,
           CASE WHEN length(list_filter(regexp_split_to_array(text, '\\s+'),
                                        x -> x <> '')) = 0 THEN 0.0
                ELSE CAST(length(text) AS DOUBLE)
                     / length(list_filter(regexp_split_to_array(text, '\\s+'),
                                          x -> x <> '')) END AS chars_per_token
    FROM documents
    """,
)
def udf_scalar_ratio(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scalar pandas UDF (Arrow batches, pandas str ops) computing the
    chars-per-token ratio. The division is one double op on two exact
    integers, so Python and DuckDB agree bit-for-bit. The JVM-native
    twin of this expression lives in textstats.doc_stats — this query
    exists to prove the vectorized-UDF path gets the same answer."""
    docs = load_table(spark, sf_dir, "documents")
    fn = _make_chars_per_token()
    return docs.select("doc_id", fn("text").alias("chars_per_token"))


def _make_sum_scaled4():
    @pandas_udf("bigint")
    def sum_scaled4(v: pd.Series) -> int:
        """Exact grouped sum: round-half-up each value at 4 decimals to
        int64, sum in integers (order-independent — the pandas twin of
        functions.numeric.dsum; np.round would be half-EVEN, hence the
        floor(x+0.5) form, valid for the non-negative fixture
        amounts)."""
        import numpy as np

        return int(np.floor(v.to_numpy() * _SCALE4 + 0.5).astype("int64").sum())

    return sum_scaled4


def _make_count_rows():
    @pandas_udf("bigint")
    def count_rows(v: pd.Series) -> int:
        return len(v)

    return count_rows


@query(
    "udf_grouped_agg_revenue",
    oracle=f"""
    SELECT o_orderpriority,
           CAST(SUM(CAST(ROUND(o_totalprice * {_SCALE4}) AS BIGINT))
                AS DOUBLE) / {_SCALE4} AS total_revenue,
           COUNT(*) AS n_orders
    FROM orders
    GROUP BY o_orderpriority
    """,
)
def udf_grouped_agg_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GROUPED_AGG pandas UDF: a custom Arrow-batched aggregate
    (integer-scaled exact revenue sum) plus a pandas count (Spark
    forbids mixing GROUPED_AGG UDFs with JVM aggregates in one agg, so
    both legs are pandas). Each Arrow batch reduces to one int64
    before the shuffle, keeping the map-side-combine shape at scale."""
    orders = load_table(spark, sf_dir, "orders")
    fn = _make_sum_scaled4()
    cnt = _make_count_rows()
    return (
        orders.groupBy("o_orderpriority")
        .agg((fn("o_totalprice").cast("double") / _SCALE4)
             .alias("total_revenue"),
             cnt("o_orderkey").alias("n_orders"))
    )


def _make_bigram_udtf():
    @udtf(returnType="pos: int, first: string, second: string")
    class BigramUDTF:
        """Native Python UDTF: one text in, (position, bigram) rows
        out — the declarative form of the reference's Map contract
        (`mr/worker.go:57`: one input → many pairs)."""

        def eval(self, text: str):
            # reference tokenizer: maximal letter runs (see mrparity)
            from mit_mapreduce_spark.operators.mrparity import letter_tokens

            words = letter_tokens(text or "")
            for i in range(len(words) - 1):
                yield i, words[i], words[i + 1]

    return BigramUDTF


@query(
    "udtf_bigrams",
    oracle="""
    WITH toks AS (
      SELECT doc_id,
             list_filter(regexp_split_to_array(text, '[^\\p{L}]+'),
                         x -> x <> '') AS arr
      FROM documents WHERE doc_id % 10 = 0)
    SELECT doc_id, CAST(i - 1 AS INT) AS pos,
           arr[i] AS first, arr[i + 1] AS second
    FROM (SELECT doc_id, generate_subscripts(arr, 1) AS i, arr FROM toks)
    WHERE i + 1 <= length(arr)
    """,
)
def udtf_bigrams(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Word bigrams via a registered Python UDTF in a LATERAL join —
    the SQL-native UDTF surface (Spark 4). Scoped to 10% of docs: the
    UDTF path serializes every row through Python (the point of the
    demo is API surface, not throughput — the JVM shingle pipeline in
    dedup.py is the scale path for exactly this computation)."""
    spark.udtf.register("bigrams", _make_bigram_udtf())
    load_table(spark, sf_dir, "documents").createOrReplaceTempView("_docs_udtf")
    return spark.sql("""
        SELECT d.doc_id, b.pos, b.first, b.second
        FROM _docs_udtf d, LATERAL bigrams(d.text) b
        WHERE d.doc_id % 10 = 0
    """)
