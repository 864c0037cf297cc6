"""SparkSession factory.

Local tests/bench run on ``local[$SPARK_GRAFT_CPUS]`` (single JVM); the
configuration below is chosen so the same plans scale to a real
multi-executor cluster: AQE for runtime re-planning and skew joins,
shuffle partitions sized to the parallelism, Arrow for every
Python<->JVM boundary, and UTC session time so results are
cluster-timezone-independent (and comparable to the DuckDB oracle).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def _cpus() -> int:
    try:
        return max(1, int(os.environ.get("SPARK_GRAFT_CPUS", "32")))
    except ValueError:
        return 32


def tune(spark: SparkSession) -> SparkSession:
    """Apply runtime-settable tuning to an existing session.

    Used both by :func:`get_spark` and on driver-provided sessions we
    don't construct ourselves (the correctness harness hands us one).
    Only runtime-mutable confs belong here.

    Idempotent per session object (r15): ``load_table`` calls this on
    every table scan, so the ~10 conf.set py4j round-trips (~2 ms)
    ran hundreds of times per bench pass for no effect. The flag
    lives on the Python session object — a new/restarted session
    never carries it, and the test-suite conf mutations all restore
    their originals in ``finally`` blocks.
    """
    if getattr(spark, "_mit_tuned", False):
        return spark
    conf = spark.conf
    # Deterministic, oracle-comparable timestamps.
    conf.set("spark.sql.session.timeZone", "UTC")
    # events.parquet stores TIMESTAMP(NANOS), which the vectorized
    # reader rejects; read as long and convert in catalog.load_table.
    conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    # Newer fixtures store TIMESTAMP(MICROS) without the UTC-adjusted
    # flag; read as TIMESTAMP (LTZ, session tz = UTC) rather than NTZ
    # so event-time ops (watermarks require TIMESTAMP) work unchanged.
    conf.set("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
    # Runtime re-planning: partition coalescing, skew-join splitting.
    conf.set("spark.sql.adaptive.enabled", "true")
    conf.set("spark.sql.adaptive.coalescePartitions.enabled", "true")
    conf.set("spark.sql.adaptive.skewJoin.enabled", "true")
    # r14 (guide §2.2/§2.5): AQE's coalescing floor. With the default
    # 1 MB floor, every post-shuffle stage over a small intermediate
    # (a few MB compressed — e.g. the checkpointed term-frequency
    # table) coalesces to ONE partition, so every downstream join/
    # aggregate/window runs on one core — measured 52.2 s -> 32.8 s
    # over a 20-query slice at sf0.1 just from lowering the floor.
    # This is a SIZE floor, not a parallelism override: at production
    # shuffle volumes partitions are >= 64 MB (advisory size), so a
    # 64 KB floor never binds and plans are unchanged at scale — it
    # only stops the degenerate tiny-shuffle collapse on any cluster.
    # Parameterised for ops override.
    conf.set("spark.sql.adaptive.coalescePartitions.minPartitionSize",
             os.environ.get("SPARK_GRAFT_AQE_MIN_PARTITION", "64k"))
    # Arrow batches for pandas UDF / mapInPandas / toPandas paths.
    conf.set("spark.sql.execution.arrow.pyspark.enabled", "true")
    # Split scans at 32 MB so a single-file fixture table still fans
    # out across all cores; on a real cluster the same bound keeps
    # scan tasks uniform and AQE coalesces any excess afterwards.
    conf.set("spark.sql.files.maxPartitionBytes", str(32 * 1024 * 1024))
    spark._mit_tuned = True
    return spark


def get_spark(app_name: str = "mit_mapreduce_spark", cpus: int | None = None,
              shuffle_partitions: int | None = None) -> SparkSession:
    """Build (or reuse) a tuned local SparkSession.

    At cluster scale the same knobs apply with different values:
    shuffle partitions ~ 2-3x total cores, AQE coalesces the excess.
    """
    n = cpus or _cpus()
    builder = (
        SparkSession.builder.appName(app_name)
        .master(f"local[{n}]")
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions or n))
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "16g"))
        .config("spark.ui.enabled", "false")
        .config("spark.ui.showConsoleProgress", "false")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
    )
    return tune(builder.getOrCreate())
