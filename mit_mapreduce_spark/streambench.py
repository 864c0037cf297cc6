"""Streaming throughput capture at bench scale (SCALE.md §Streaming).

The pytest throughput gate (tests/test_streaming.py::
test_streaming_throughput_keeps_up) proves the engine keeps up at
test scale; this module records the BENCH-scale figures the round-5
verdict asked for (#7): the two heaviest stateful plans driven over
the sf0.1 events table as a REAL multi-micro-batch stream.

Protocol: stage events as N_SPLITS parquet files, stream them with
``maxFilesPerTrigger=1`` under an availableNow trigger — so the query
runs exactly N_SPLITS data micro-batches back-to-back, the same
cadence shape as a production Kafka drain — through:

- ``sessionize``: watermark + session_window + count/min/max/
  exact-decimal sum (the native stateful session operator), and
- ``heavy_hitters``: the applyInPandasWithState space-saving sketch
  (bounded O(capacity) state per event type).

Run: ``python -m mit_mapreduce_spark.streambench [sf_dir]``
Prints one JSON line per query: rows, micro-batches, wall seconds,
rows/sec, batches/sec. Figures are pasted into SCALE.md §Streaming.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time

from pyspark.sql import functions as F

from mit_mapreduce_spark.functions.numeric import dsum
from mit_mapreduce_spark.session import get_spark, tune
from mit_mapreduce_spark.streaming import _SCRATCH, STATE_PARTITIONS

N_SPLITS = 12
SESSION_GAP = "4 hours"


def _staged_table_splits(spark, sf_dir: str, table: str) -> str:
    """<table>.parquet re-staged as N_SPLITS files (one per trigger);
    one staging helper for every leg (events; documents since r9)."""
    tag = os.path.basename(sf_dir.rstrip("/"))
    stage = os.path.join(_SCRATCH, f"streambench_{table}_{tag}")
    marker = os.path.join(stage, "_STAGED")
    src = os.path.join(sf_dir, f"{table}.parquet")
    if (not os.path.exists(marker)
            or os.path.getmtime(marker) < os.path.getmtime(src)):
        shutil.rmtree(stage, ignore_errors=True)
        (spark.read.parquet(src).repartition(N_SPLITS)
         .write.mode("overwrite").parquet(stage))
        open(marker, "w").close()
    return stage


def _drive(stream_df, mode: str, name: str) -> dict:
    """availableNow drain with per-file triggers; returns the figures."""
    spark = stream_df.sparkSession
    before = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", str(STATE_PARTITIONS))
    t0 = time.monotonic()
    try:
        q = (stream_df.writeStream.format("memory").queryName(name)
             .outputMode(mode).trigger(availableNow=True).start())
        q.awaitTermination()
        wall = time.monotonic() - t0
        progress = [json.loads(p.json) for p in q.recentProgress]
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", before)
    data = [p for p in progress if p.get("numInputRows", 0) > 0]
    rows = sum(p["numInputRows"] for p in data)
    return {
        "rows": rows,
        "micro_batches": len(data),
        "wall_sec": round(wall, 2),
        "rows_per_sec": round(rows / wall),
        "batches_per_sec": round(len(data) / wall, 2),
        "out_rows": spark.table(name).count(),
    }


def main(sf_dir: str) -> dict:
    spark = get_spark("streambench")
    spark.sparkContext.setLogLevel("ERROR")
    tune(spark)
    stage = _staged_table_splits(spark, sf_dir, "events")
    from mit_mapreduce_spark.catalog import _normalize_event_ts

    schema = spark.read.parquet(stage).schema

    def source():
        raw = (spark.readStream.schema(schema)
               .option("maxFilesPerTrigger", 1).parquet(stage))
        return _normalize_event_ts(raw)

    results = {}

    ev = source().withWatermark("ts", "1 hour")
    sess = (
        ev.groupBy(F.session_window("ts", SESSION_GAP).alias("sw"),
                   "user_id")
        .agg(F.count("*").alias("n_events"),
             F.min("ts").alias("session_start"),
             F.max("ts").alias("session_end"),
             dsum("value", "sum_value"))
        .select("user_id", "n_events", "session_start", "session_end",
                "sum_value")
    )
    results["sessionize"] = _drive(sess, "complete", "sb_sessionize")

    from pyspark.sql.streaming.state import GroupStateTimeout

    from mit_mapreduce_spark.operators.streaming_queries import (
        _heavy_hitters_fn, _HH_OUT_SCHEMA, _HH_STATE_SCHEMA,
    )

    hh = (
        source().select("event_type", "user_id")
        .groupBy("event_type")
        .applyInPandasWithState(
            _heavy_hitters_fn,
            outputStructType=_HH_OUT_SCHEMA,
            stateStructType=_HH_STATE_SCHEMA,
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )
    results["heavy_hitters"] = _drive(hh, "update", "sb_heavy_hitters")

    dec = (
        source().select("user_id", F.to_date("ts").alias("day"))
        .groupBy("user_id", "day")
        .agg(F.count("*").cast("bigint").alias("cnt"))
    )
    results["decayed_counters"] = _drive(dec, "complete",
                                         "sb_decayed_counters")

    # multimodal ingest audit (r9): the documents manifest staged as
    # per-trigger splits, each micro-batch building all THREE
    # modalities' payloads (JVM chains + Arrow encode kernels),
    # corrupting every Nth asset, and probing the real parsers —
    # numInputRows counts each doc once per modality source, i.e.
    # ASSETS built, so rows_per_sec is assets/sec through the full
    # encode -> corrupt -> parse pipeline. The pipeline is the batch
    # op's own shared builders, not a third copy.
    from mit_mapreduce_spark.operators.multimodal import (
        quarantine_probes, quarantine_report_agg,
    )

    dstage = _staged_table_splits(spark, sf_dir, "documents")
    dschema = spark.read.parquet(dstage).schema
    doc_source = (spark.readStream.schema(dschema)
                  .option("maxFilesPerTrigger", 1).parquet(dstage))
    mm = quarantine_report_agg(quarantine_probes(doc_source))
    results["multimodal_ingest"] = {
        # the 3x convention travels IN the record (ADVICE r9 #2):
        # rows_per_sec counts assets (3 modality sources per doc),
        # so consumers can divide by assets_per_doc for docs/sec
        **_drive(mm, "complete", "sb_mm_ingest"),
        "assets_per_doc": 3,
    }

    # fingerprint-at-ingest (r10): per micro-batch WAV build + real
    # decode + energy-sign fingerprint, append-mode signature drain
    # (stream_audio_fingerprints' pipeline); rows_per_sec = docs/sec
    # through the full build -> decode -> fingerprint path.
    from mit_mapreduce_spark.operators.mmdedup import (
        _afp_batch, _fingerprint_audio_assets_from,
    )
    from mit_mapreduce_spark.operators.multimodal import _PHASH_SCHEMA

    fp_source = (spark.readStream.schema(dschema)
                 .option("maxFilesPerTrigger", 1).parquet(dstage))
    sigs = (_fingerprint_audio_assets_from(fp_source)
            .mapInPandas(_afp_batch, _PHASH_SCHEMA))
    results["audio_fingerprints"] = _drive(sigs, "append", "sb_audio_fp")

    # near-dup alert at ingest (r11): the stream_fingerprint_alerts
    # pipeline — per micro-batch fingerprint of the incoming shard,
    # stream-static band join against the batch-computed corpus
    # signature index, radius filter, per-pair dedup state. NOTE on
    # units (review find): numInputRows counts every staged manifest
    # doc READ (the shard filter runs after the file source), so
    # rows_per_sec is manifest-docs/s; the record carries shard_docs
    # so consumers can derive the per-SHARD-doc rate.
    from mit_mapreduce_spark.operators.banding import banded_match_scores
    from mit_mapreduce_spark.operators.mmdedup import (
        FP_BAND_BITS, FP_BANDS, FP_HAM_MAX, inc_shard_col,
    )

    from mit_mapreduce_spark.operators.mmdedup import (
        _fingerprint_video_assets_from, _vfp_batch,
    )
    from mit_mapreduce_spark.operators.multimodal import (
        PH_BAND_BITS, PH_BANDS, PH_HAM_MAX, _phash_batch,
        _phash_image_assets_from,
    )

    inc_pred = inc_shard_col("doc_id")
    shard_docs = spark.read.parquet(dstage).where(inc_pred).count()
    for leg, fixture_from, kernel, geom in (
            ("fingerprint_alerts", _fingerprint_audio_assets_from,
             _afp_batch, (FP_BANDS, FP_BAND_BITS, FP_HAM_MAX)),
            # r12: the image/video alert legs, registered as
            # stream_image_alerts / stream_video_alerts
            ("image_alerts", _phash_image_assets_from, _phash_batch,
             (PH_BANDS, PH_BAND_BITS, PH_HAM_MAX)),
            ("video_alerts", _fingerprint_video_assets_from, _vfp_batch,
             (FP_BANDS, FP_BAND_BITS, FP_HAM_MAX))):
        idx_sigs = (
            fixture_from(
                spark.read.parquet(dstage).select("doc_id").where(~inc_pred))
            .mapInPandas(kernel, _PHASH_SCHEMA)
            .localCheckpoint(eager=False)
        )
        al_source = (spark.readStream.schema(dschema)
                     .option("maxFilesPerTrigger", 1).parquet(dstage))
        inc_sigs = (fixture_from(al_source.where(inc_pred))
                    .mapInPandas(kernel, _PHASH_SCHEMA))
        alerts = banded_match_scores(
            inc_sigs, idx_sigs, *geom
        ).dropDuplicates(["asset_id", "matched_id"])
        fig = _drive(alerts, "append", f"sb_{leg}")
        results[leg] = {
            **fig,
            "shard_docs": shard_docs,
            # un-inflated rate (ADVICE r13): rows_per_sec counts every
            # staged manifest doc the file source READ; this is the
            # per-gated-doc rate.
            "shard_rows_per_sec": round(shard_docs / fig["wall_sec"])
            if fig["wall_sec"] else None,
        }

    # semantic-index maintenance (r12): per micro-batch banded
    # sign-LSH bucketing of the vector stream, append-mode index
    # drain (stream_embedding_index's pipeline); rows_per_sec =
    # vectors/sec through the stateless expression form.
    from mit_mapreduce_spark.operators.similarity import (
        embedding_index_frame,
    )

    estage = _staged_table_splits(spark, sf_dir, "embeddings")
    eschema = spark.read.parquet(estage).schema
    e_source = (spark.readStream.schema(eschema)
                .option("maxFilesPerTrigger", 1).parquet(estage))
    results["embedding_index"] = _drive(
        embedding_index_frame(e_source), "append", "sb_embed_idx")

    # quality-at-ingest (r11): per micro-batch WAV build + real
    # decode + integer-DSP screen, append-mode verdict drain
    # (stream_audio_quality's pipeline); rows_per_sec = docs/sec
    # through the full build -> decode -> screen path.
    from mit_mapreduce_spark.operators.mmquality import _audio_screen_from

    q_source = (spark.readStream.schema(dschema)
                .option("maxFilesPerTrigger", 1).parquet(dstage))
    results["audio_quality"] = _drive(
        _audio_screen_from(q_source), "append", "sb_audio_q")

    # streaming admission twin (r13): the composed seven-way gate per
    # micro-batch via foreachBatch — the number the capstone's 100 TB
    # posture rests on is PER-BATCH cost against warm static sides,
    # so the ctx (the persisted index tables a production deployment
    # maintains continuously) is materialized OUTSIDE the timed
    # window; NOTE numInputRows counts every staged manifest doc read
    # (the shard filter runs after the file source), so the record
    # carries shard_docs like the alert legs.
    from concurrent.futures import ThreadPoolExecutor

    from mit_mapreduce_spark.operators.mmdedup import (
        admission_batch_frame, admission_static_ctx, inc_shard_col,
    )

    from pyspark.sql import DataFrame as _DF

    ctx = admission_static_ctx(spark, sf_dir)
    with ThreadPoolExecutor(max_workers=10) as pool:
        frames = [v for v in ctx.values() if isinstance(v, _DF)]
        frames += [m[-1] for m in ctx["media"]]
        list(pool.map(lambda f: f.count(), frames))
    a_source = (spark.readStream.schema(dschema)
                .option("maxFilesPerTrigger", 1).parquet(dstage)
                .where(inc_shard_col("doc_id")))
    out = os.path.join(_SCRATCH, "sb_admit")
    shutil.rmtree(out, ignore_errors=True)

    def _admit(batch_df, batch_id):
        admission_batch_frame(spark, sf_dir, batch_df, ctx) \
            .write.mode("append").parquet(out)

    shard_docs = spark.read.parquet(dstage) \
        .where(inc_shard_col("doc_id")).count()
    before = spark.conf.get("spark.sql.shuffle.partitions")
    # match the registered twin's per-batch sizing (r14 surgery)
    spark.conf.set("spark.sql.shuffle.partitions", "2")
    t0 = time.monotonic()
    try:
        q = (a_source.writeStream.foreachBatch(_admit)
             .trigger(availableNow=True).start())
        q.awaitTermination()
        wall = time.monotonic() - t0
        progress = [json.loads(p.json) for p in q.recentProgress]
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", before)
    data = [p for p in progress if p.get("numInputRows", 0) > 0]
    results["ingest_admission"] = {
        "rows": sum(p["numInputRows"] for p in data),
        "micro_batches": len(data),
        "wall_sec": round(wall, 2),
        "rows_per_sec": round(sum(p["numInputRows"] for p in data) / wall),
        "batches_per_sec": round(len(data) / wall, 2),
        "out_rows": spark.read.parquet(out).count(),
        "shard_docs": shard_docs,
        # un-inflated headline (ADVICE r13): numInputRows counts every
        # staged manifest doc BEFORE the shard filter (~6.7x the rows
        # actually gated); this is the per-admitted-row rate.
        "shard_rows_per_sec": round(shard_docs / wall) if wall else None,
    }

    for name, fig in results.items():
        print(json.dumps({"query": name, "sf_dir": sf_dir, **fig}))
    return results


if __name__ == "__main__":
    main(sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1")
