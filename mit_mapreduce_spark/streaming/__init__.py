"""Structured Streaming harness over the `events` fixture.

The reference is strictly batch (hard map→reduce barrier, SURVEY.md
§2.3 streaming ABSENT); this package adds the Spark-native streaming
surface: file-source streams with explicit schemas, watermarks,
tumbling and session windows, memory-sink collection for tests.

At scale the same plans run unchanged against Kafka/object-store
sources — the file source here is the fixture-compatible stand-in.
"""

from __future__ import annotations

import os
import shutil
import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

_SCRATCH = os.path.join(os.path.dirname(os.path.dirname(
    os.path.dirname(os.path.abspath(__file__)))), ".scratch")

def events_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """readStream over the events parquet with the same ts
    normalization the batch catalog applies (catalog.load_table).

    The stream schema is taken from a batch scan of the staged file so
    the source works across fixture vintages (TIMESTAMP(NANOS)-as-long
    under nanosAsLong, or native TIMESTAMP(MICROS))."""
    # The file stream source requires a directory; stage the fixture
    # file into scratch once per scale factor (testdata is read-only).
    tag = os.path.basename(sf_dir.rstrip("/"))
    stage = os.path.join(_SCRATCH, f"stream_events_{tag}")
    dst = os.path.join(stage, "events.parquet")
    src = os.path.join(sf_dir, "events.parquet")
    if not os.path.exists(dst) or os.path.getmtime(dst) < os.path.getmtime(src):
        os.makedirs(stage, exist_ok=True)
        shutil.copy2(src, dst)
    from mit_mapreduce_spark.catalog import _cached_schema, _normalize_event_ts
    raw = spark.readStream.schema(_cached_schema(spark, dst)).parquet(stage)
    return _normalize_event_ts(raw)


def table_stream(spark: SparkSession, sf_dir: str,
                 table: str) -> DataFrame:
    """readStream over any timestamp-free fixture table (r12: the
    docs_stream staging shape generalized — the embedding-index
    ingest leg streams `embeddings` the same way the media legs
    stream `documents`)."""
    tag = os.path.basename(sf_dir.rstrip("/"))
    stage = os.path.join(_SCRATCH, f"stream_{table}_{tag}")
    dst = os.path.join(stage, f"{table}.parquet")
    src = os.path.join(sf_dir, f"{table}.parquet")
    if not os.path.exists(dst) or os.path.getmtime(dst) < os.path.getmtime(src):
        os.makedirs(stage, exist_ok=True)
        shutil.copy2(src, dst)
    from mit_mapreduce_spark.catalog import _cached_schema
    return spark.readStream.schema(_cached_schema(spark, dst)).parquet(stage)


def docs_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """readStream over the documents parquet — the ingest-manifest
    stream a multimodal pipeline consumes (r9). Documents carry no
    timestamp column so no normalization applies."""
    return table_stream(spark, sf_dir, "documents")


STATE_PARTITIONS = 8


def run_stream_to_table(stream_df: DataFrame, mode: str,
                        name: str | None = None,
                        state_partitions: int = STATE_PARTITIONS) -> str:
    """Drain the stream with a single availableNow micro-batch into an
    in-memory table; returns the table name. Used by tests and the
    rows-only streaming queries — production deployments swap the sink
    for kafka/delta/parquet with the identical plan.

    Stateful operators latch spark.sql.shuffle.partitions at query
    start as the state-store partition count — per-store open/commit
    is the dominant cost on small per-batch volumes (measured 5×: 32
    stores 7.6 s vs 8 stores 1.4 s for applyInPandasWithState at
    sf0.1). Size it to state volume, not core count; a real deployment
    at 100 TB raises it with the checkpoint. The session conf is
    restored after start so batch queries keep their parallelism."""
    name = name or f"stream_{uuid.uuid4().hex[:12]}"
    spark = stream_df.sparkSession
    before = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", str(state_partitions))
    try:
        q = (
            stream_df.writeStream.format("memory")
            .queryName(name)
            .outputMode(mode)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", before)
    return name


def _register_scratch_cleanup(path: str) -> None:
    """Best-effort removal of a session-scoped scratch dir at
    interpreter exit (ADVICE r14: drain sinks accumulated one uuid
    dir per invocation, growing .scratch without bound)."""
    import atexit

    if path in _CLEANUP_REGISTERED:
        return
    _CLEANUP_REGISTERED.add(path)
    atexit.register(shutil.rmtree, path, ignore_errors=True)


_CLEANUP_REGISTERED: set = set()


def drain_via_batch(stream_df: DataFrame, frame_fn,
                    name: str = "anon", tag: str = "") -> DataFrame:
    """Drain a stream through foreachBatch, applying the certified
    BATCH plan shape (``frame_fn``) to each micro-batch, into a
    per-invocation parquet sink; returns the drained table.

    Why not map the stream with the stateless expression form and a
    memory sink (the r12/r13 drain shape)? Measured at sf0.1 (r14,
    guide §1/§4): the expression drains ran their interpreted
    higher-order lambdas on ONE task — the fixture scan is a single
    row group and fan_out's ``inputFiles`` gate cannot inspect a
    streaming plan — costing 5-9 s per drain. Inside foreachBatch the
    micro-batch is a plain batch DataFrame, so the codegen batch shape
    (explode + partial aggregate, pytest-pinned row-identical to the
    expression form) runs with full scan fan-out and whole-stage
    codegen: the same drains measure 1.0-2.3 s warm.

    Correctness across batch boundaries is unchanged from the
    expression form: every source row arrives in exactly ONE
    micro-batch and ``frame_fn`` is a pure per-row/per-doc function
    (any aggregate inside it is per-doc over columns co-resident in
    that doc's row), so append-mode rows are emitted exactly once per
    doc regardless of batching.

    Sink discipline (ADVICE r14): each micro-batch OVERWRITES its own
    batch_id-keyed subdirectory, so a replayed batch — Spark's
    at-least-once foreachBatch contract after a failure — replaces
    its previous output instead of appending duplicate rows (the
    run_stream_foreach_batch idempotence pattern, keyed on batch_id
    instead of partition values). The sink path is deterministic per
    (name, sf tag, applicationId) — the applicationId keeps two
    sessions on one checkout from interleaving (the r13-ADVICE
    session-scoping rule), the per-invocation reset keeps serial
    reruns bounded on disk, and the whole dir is removed at
    interpreter exit. A seed subdirectory carries the output schema
    so a zero-row stream (hostile fuzz corpora) still drains to a
    readable empty table. Every invocation recomputes from the
    stream — nothing is reused across invocations. Production swaps
    the partition-overwrite sink (run_stream_foreach_batch) or Kafka
    with the identical per-batch plan."""
    spark = stream_df.sparkSession
    out = os.path.join(
        _SCRATCH,
        f"drain_{name}_{tag}_{spark.sparkContext.applicationId}")
    shutil.rmtree(out, ignore_errors=True)
    _register_scratch_cleanup(out)
    seed = frame_fn(spark.createDataFrame([], stream_df.schema))
    seed.write.mode("overwrite").parquet(os.path.join(out, "seed"))

    def _apply(batch_df: DataFrame, batch_id: int) -> None:
        frame_fn(batch_df).write.mode("overwrite").parquet(
            os.path.join(out, f"b{batch_id}"))

    q = (stream_df.writeStream.foreachBatch(_apply)
         .trigger(availableNow=True).start())
    q.awaitTermination()
    return (spark.read.option("recursiveFileLookup", "true")
            .schema(seed.schema).parquet(out))


def run_stream_foreach_batch(stream_df: DataFrame, out_dir: str,
                             partition_col: str) -> None:
    """Drain a stream through foreachBatch into partitioned parquet
    with dynamic partition overwrite — the idempotent file-lake sink.

    foreachBatch hands each micro-batch to arbitrary batch code; with
    dynamic overwrite keyed on (partition values present in the batch)
    a REPLAYED batch — Spark's at-least-once sink contract after a
    failure — overwrites its own previous output instead of appending
    duplicates. This is how exactly-once lands on plain parquet
    without a transaction log."""
    spark = stream_df.sparkSession

    def _write_batch(batch_df: DataFrame, batch_id: int) -> None:
        before = spark.conf.get("spark.sql.sources.partitionOverwriteMode")
        spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
        try:
            (batch_df.write.mode("overwrite")
             .partitionBy(partition_col).parquet(out_dir))
        finally:
            spark.conf.set("spark.sql.sources.partitionOverwriteMode", before)

    q = (
        stream_df.writeStream.foreachBatch(_write_batch)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
