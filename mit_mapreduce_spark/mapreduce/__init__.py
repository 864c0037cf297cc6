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

import glob as _pyglob
import os
import re
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


def _escape_hadoop_glob(path: str) -> str:
    """Backslash-escape Hadoop glob metacharacters so a LITERAL
    filename like ``data [v2].txt`` addresses that file instead of
    being parsed as a character class (fuzz find: such names matched
    0 files)."""
    return re.sub(r"([\[\]{}*?])", r"\\\1", path)


def _expand_braces(pattern: str) -> list[str]:
    """Hadoop-style ``{a,b}`` alternation for driver-side local glob
    expansion (Python's glob has no brace support)."""
    m = re.search(r"\{([^{}]*)\}", pattern)
    if not m:
        return [pattern]
    out: list[str] = []
    for alt in m.group(1).split(","):
        out.extend(_expand_braces(
            pattern[:m.start()] + alt + pattern[m.end():]))
    return out


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
    results don't depend on scratch-dir placement).

    Input resolution (fuzz finds, round 6): an explicit LIST is
    literal paths — reference semantics, `mrcoordinator` takes
    os.Args filenames — so Hadoop glob metacharacters in the names
    (``[] {} * ?``) are escaped and a missing file is an immediate
    FileNotFoundError (the reference's `log.Fatalf("cannot open")`,
    `mr/worker.go:121`). A STRING is a glob pattern; local patterns
    are expanded driver-side (with ``{a,b}`` brace support) so a
    zero-match pattern yields an EMPTY job — the reference would run
    zero map tasks — instead of Hadoop's InvalidInputException at
    first action."""
    if isinstance(inputs, (list, tuple)):
        missing = [p for p in inputs
                   if "://" not in p and not os.path.exists(p)]
        if missing:
            raise FileNotFoundError(f"cannot open {missing}")
        paths = [p if "://" in p else _escape_hadoop_glob(p)
                 for p in inputs]
    else:
        paths = []
        for piece in inputs.split(","):
            if "://" in piece:
                paths.append(piece)
            else:
                paths.extend(_escape_hadoop_glob(m) for pat in
                             _expand_braces(piece)
                             for m in sorted(_pyglob.glob(pat)))
    if not paths:
        return spark.createDataFrame([], OUT_SCHEMA)
    bad = [p for p in paths if "," in p]
    if bad:
        # Hadoop's path API is comma-separated; a comma filename is
        # unaddressable through it — fail with a clear message.
        raise ValueError(
            f"filenames containing ',' are not addressable: {bad}")

    sc = spark.sparkContext
    files = sc.wholeTextFiles(",".join(paths))

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
