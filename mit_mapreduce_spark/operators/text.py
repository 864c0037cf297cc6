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
        .distinct()
        .groupBy("word")
        .agg(
            F.count("*").alias("doc_count"),
            F.array_join(F.sort_array(F.collect_set("source")), ",").alias("doc_list"),
        )
    )


@query(
    "sorted_concat",
    oracle="""
    SELECT lang AS key,
           COUNT(*) AS n_docs,
           string_agg(source, ' ' ORDER BY source) AS joined
    FROM documents
    GROUP BY lang
    """,
)
def sorted_concat(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sorted value-concat per key (reference apps A3 crash/nocrash,
    `mrapps/crash.go:45-55`): reduce = sort values, join with ' '.
    Keyed on `lang` over the documents fixture; values are the doc
    sources. sort_array makes collect order irrelevant."""
    docs = load_table(spark, sf_dir, "documents")
    return (
        docs.groupBy(F.col("lang").alias("key"))
        .agg(
            F.count("*").alias("n_docs"),
            F.concat_ws(" ", F.sort_array(F.collect_list("source"))).alias("joined"),
        )
    )
