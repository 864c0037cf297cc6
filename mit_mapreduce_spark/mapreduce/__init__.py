"""MapReduce compatibility facade: the reference's entire public API
on Spark.

The reference's user surface is two Go closures loaded from a plugin
(`main/mrworker.go:34-51`):

    Map(filename, contents string) []KeyValue     // mr/worker.go:57
    Reduce(key string, values []string) string    // mr/worker.go:58

run through scan → map → hash-partition (FNV-32a % nReduce,
`mr/worker.go:38-42,132`) → sort → group → reduce → text sink
(`mr/worker.go:116-201`). ``run_job`` reproduces that contract so
every reference app is expressible verbatim (SURVEY.md §2.3 "must
keep"); the scheduling/fault-tolerance half of the reference
(F9-F19) is Spark's job and is not reimplemented.

This is the one deliberately RDD-based module: the API is
(filename, whole-file-string) → arbitrary Python pairs, which is
per-partition imperative by definition. Real queries should use the
DataFrame operators (operators/*); the facade exists for parity and
migration. Semantics preserved (SURVEY.md §2.4):

- whole-file inputs, one map task per file (F1/F9);
- hash partitioning by key with the reference's FNV-32a & 0x7fffffff
  (F3) so output *file assignment* matches the reference exactly;
- values are grouped per key with no cross-key order guarantee;
  apps needing in-group determinism sort inside Reduce, exactly as
  `mrapps/indexer.go:37` / `crash.go:49-51` do;
- exactly-once stage output (an upgrade over the reference's
  at-least-once intermediate dup-counting flaw, SURVEY.md §2.4.4 —
  intentionally NOT reproduced).
"""

from __future__ import annotations

import os
from collections.abc import Callable, Iterable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

MapFn = Callable[[str, str], Iterable[tuple[str, str]]]
ReduceFn = Callable[[str, list[str]], str]

_FNV_OFFSET = 0x811C9DC5
_FNV_PRIME = 0x01000193


def fnv32a(key: str) -> int:
    """FNV-32a masked to 31 bits — the reference's partitioner
    (`mr/worker.go:38-42`: fnv.New32a over the key bytes, & 0x7fffffff)."""
    h = _FNV_OFFSET
    for b in key.encode("utf-8"):
        h ^= b
        h = (h * _FNV_PRIME) & 0xFFFFFFFF
    return h & 0x7FFFFFFF


OUT_SCHEMA = T.StructType([
    T.StructField("key", T.StringType(), False),
    T.StructField("value", T.StringType(), True),
])


def run_job(
    spark: SparkSession,
    map_fn: MapFn,
    reduce_fn: ReduceFn,
    inputs: str | list[str],
    n_reduce: int = 10,
) -> DataFrame:
    """Execute a reference-style MapReduce job; returns the (key,
    value) result as a DataFrame (write it with
    ``sources.write_kv_text`` for the byte-faithful mr-out files).

    ``inputs`` is a glob or explicit file list; each file becomes one
    (basename, contents) Map input, mirroring `mr/worker.go:118-130`
    (the reference passes the path as given; we pass the basename so
    results don't depend on scratch-dir placement)."""
    if isinstance(inputs, (list, tuple)):
        inputs = ",".join(inputs)

    sc = spark.sparkContext
    files = sc.wholeTextFiles(inputs)

    def apply_map(pc: tuple[str, str]) -> Iterable[tuple[str, str]]:
        path, contents = pc
        return map_fn(os.path.basename(path), contents)

    reduced = (
        files.flatMap(apply_map)
        # One shuffle: hash-partition by key (F3) and group each key's
        # values (F6/F7). groupByKey is correct here — the facade's
        # Reduce contract requires the full materialized value list
        # per key (`mr/worker.go:195`), the same memory model as the
        # reference (SURVEY.md §7.4 documents the skewed-key bound).
        .groupByKey(numPartitions=n_reduce, partitionFunc=fnv32a)
        .map(lambda kv: (kv[0], reduce_fn(kv[0], list(kv[1]))))
    )
    return spark.createDataFrame(reduced, OUT_SCHEMA)
