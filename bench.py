"""Per-round benchmark: run every registered query at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and print ONE
JSON line {"metric": ..., "value": total_sec, "unit": "sec",
"queries": {name: sec}, "sf": ...}.

Each query is timed as plan-build + full materialization through the
``noop`` write sink: unlike ``count()`` (which Catalyst can collapse
to a metadata-only or aggregate-pruned plan), ``df.write.format
("noop")`` evaluates every row and column with zero driver-side
collection — the Spark-idiomatic bench sink.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from mit_mapreduce_spark import operators
from mit_mapreduce_spark.session import get_spark

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def _sf_from_dir(d: str) -> float:
    base = os.path.basename(d.rstrip("/"))
    try:
        return float(base.replace("sf", ""))
    except ValueError:
        return -1.0


def main() -> None:
    operators.load_all()
    spark = get_spark("bench")
    spark.sparkContext.setLogLevel("ERROR")

    # Warm the JVM + parquet footers once so per-query times measure the
    # query, not session startup.
    operators.QUERIES["wordcount"](spark, SF_DIR).write.format("noop").mode(
        "overwrite").save()
    # Warm the Arrow/pandas Python worker pool: the first pandas-UDF
    # query otherwise absorbs ~32 simultaneous `import pandas` worker
    # spawns (measured ~7 s attributed to whichever query runs first).
    # Workers are reused afterwards (spark.python.worker.reuse).
    spark.range(spark.sparkContext.defaultParallelism * 4) \
        .repartition(spark.sparkContext.defaultParallelism) \
        .mapInPandas(lambda it: it, "id long") \
        .write.format("noop").mode("overwrite").save()

    times: dict[str, float] = {}
    for name in sorted(operators.QUERIES):
        fn = operators.QUERIES[name]
        t0 = time.monotonic()
        try:
            df = fn(spark, SF_DIR)
            df.write.format("noop").mode("overwrite").save()
            times[name] = round(time.monotonic() - t0, 3)
        except Exception as e:  # noqa: BLE001 — a broken query must not kill the bench
            print(f"bench: {name} FAILED: {e}", file=sys.stderr)
            times[name] = -1.0

    total = round(sum(t for t in times.values() if t >= 0), 3)
    print(json.dumps({
        "metric": "total_query_wall_seconds",
        "value": total,
        "unit": "sec",
        "queries": times,
        "sf": _sf_from_dir(SF_DIR),
    }))


if __name__ == "__main__":
    main()
