"""Reference-parity text queries (the reference's actual workloads).

Re-expresses the three real queries shipped as plugin apps in the
reference (SURVEY.md §2.2) as declarative DataFrame plans. The
reference executes each as scan → flatMap → hash-shuffle of EVERY
(word,"1") pair → full sort → run-group → reduce UDF
(`mr/worker.go:116-201`) with no partial aggregation; the Spark plans
below get map-side combine, hash aggregation, and whole-stage codegen
from Catalyst — the shuffle carries one partial count per (word,
partition) instead of one record per token occurrence, which is the
difference between shuffling ~100 TB and shuffling a few GB at scale.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from mit_mapreduce_spark.catalog import load_table
from mit_mapreduce_spark.functions.text import exploded_words
from mit_mapreduce_spark.operators.registry import query

_WORDS_SQL = ("SELECT doc_id, source, unnest(regexp_split_to_array(text,"
              " '[^\\p{L}]+')) AS word FROM documents")


@query(
    "wordcount",
    oracle=f"""
    SELECT word, COUNT(*) AS cnt
    FROM ({_WORDS_SQL})
    WHERE word <> ''
    GROUP BY word
    """,
)
def wordcount(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Word count (reference app A1, `mrapps/wc.go:21-44`): tokens are
    maximal Unicode-letter runs, case-sensitive; count per word."""
    docs = load_table(spark, sf_dir, "documents")
    return (
        exploded_words(docs.select("text"))
        .groupBy("word")
        .agg(F.count("*").alias("cnt"))
    )


@query(
    "inverted_index",
    oracle=f"""
    SELECT word,
           COUNT(*) AS doc_count,
           string_agg(source, ',' ORDER BY source) AS doc_list
    FROM (SELECT DISTINCT word, source
          FROM ({_WORDS_SQL}) WHERE word <> '')
    GROUP BY word
    """,
)
def inverted_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Inverted index (reference app A2, `mrapps/indexer.go:20-39`):
    word -> number of distinct containing documents + comma-joined
    sorted document list. The reference dedups per-document with a set
    and sorts inside the reduce UDF; here `collect_set` + `sort_array`
    keep the agg order-insensitive (SURVEY.md §2.4.3)."""
    docs = load_table(spark, sf_dir, "documents")
    return (
        exploded_words(docs.select("source", "text"))
        .select("word", "source")
        .groupBy("word")
        .agg(F.sort_array(F.collect_set("source")).alias("_docs"))
        .select(
            "word",
            F.size("_docs").cast("bigint").alias("doc_count"),
            F.array_join("_docs", ",").alias("doc_list"),
        )
    )


_CONCAT_CAP = 100


@query(
    "sorted_concat",
    oracle=f"""
    SELECT lang AS key,
           COUNT(*) AS n_docs,
           array_to_string((list_sort(list(source)))[1:{_CONCAT_CAP}], ' ')
             AS joined
    FROM documents
    GROUP BY lang
    """,
)
def sorted_concat(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sorted value-concat per key (reference apps A3 crash/nocrash,
    `mrapps/crash.go:45-55`): reduce = sort values, join with ' ' —
    capped at the {cap} smallest values per key.

    `lang` is low-cardinality, so an unbounded collect_list would
    buffer an entire language's rows in one aggregation state — the
    reference's own OOM flaw (`mr/worker.go:160-180`) that SURVEY §7.4
    says not to reproduce. Scale posture: two-level capped top-K — a
    salted partial pass keeps each (key, salt)'s {cap} smallest values,
    the final pass merges 16 bounded arrays per key. Aggregation state
    is O(cap), never O(group). The K-smallest-per-salt → K-smallest-of-
    union merge is exact for multisets, so the result equals the
    single-pass slice the oracle computes. The UNBOUNDED faithful
    semantics live in the facade (`mr_sorted_concat`,
    operators/mrparity.py), where the contract requires them."""
    docs = load_table(spark, sf_dir, "documents")
    partial = (
        docs.groupBy(F.col("lang"), F.pmod(F.col("doc_id"), F.lit(16)).alias("_salt"))
        .agg(
            F.count("*").alias("_n"),
            F.slice(F.sort_array(F.collect_list("source")), 1, _CONCAT_CAP)
            .alias("_vals"),
        )
    )
    return (
        partial.groupBy(F.col("lang").alias("key"))
        .agg(
            F.sum("_n").alias("n_docs"),
            F.concat_ws(" ", F.slice(
                F.sort_array(F.flatten(F.collect_list("_vals"))), 1, _CONCAT_CAP))
            .alias("joined"),
        )
    )


sorted_concat.__doc__ = sorted_concat.__doc__.format(cap=_CONCAT_CAP)
