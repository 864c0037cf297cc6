"""Text column expressions shared by the text/dedup/analysis operators.

Tokenizer parity note (SURVEY.md §2.4.1): the reference defines words
as maximal runs of Unicode letters — digits/apostrophes/hyphens split,
case preserved (reference `mrapps/wc.go:21-34`, `mrapps/indexer.go:22`).
Java regex `[^\\p{L}]+` and DuckDB's RE2 `[^\\p{L}]+` both express
that class, and Spark's split() can emit empty edge tokens, so every
consumer filters `word != ''` (reference FieldsFunc never yields empty
tokens, §2.4.5).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

NON_LETTER = r"[^\p{L}]+"


def tokens(text_col: Column | str = "text") -> Column:
    """Array of reference-semantics word tokens (may contain '' at the
    edges — filter after explode)."""
    c = F.col(text_col) if isinstance(text_col, str) else text_col
    return F.split(c, NON_LETTER)


def exploded_words(df, text_col: str = "text"):
    """df -> df with one row per non-empty token in `word`."""
    return (
        df.select("*", F.explode(tokens(text_col)).alias("word"))
        .where(F.col("word") != "")
    )
