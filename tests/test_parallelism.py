"""Parallelism assertions — the mtiming/rtiming analog (SURVEY.md §5.2).

The reference proves its map and reduce phases actually overlap by
having tasks drop pid marker files and probe their peers' liveness
(`mrapps/mtiming.go:19-62`, `mrapps/rtiming.go:17-60`), emitting the
observed concurrency AS DATA for the harness to assert on. The Spark
analog: an Arrow-batched kernel stamps each task's (pid, start, end)
wall-clock interval into its output rows; the assertion is that the
intervals genuinely overlap — i.e. the stage ran tasks concurrently,
not serially on one core.
"""

import time

import pandas as pd

N_TASKS = 8
HOLD_S = 0.4  # long enough that serial execution could never overlap


def test_stage_tasks_truly_overlap(spark):
    from pyspark.sql import types as T

    # defined in-function so cloudpickle ships it by value (the test
    # module itself is not importable on executor Python workers)
    def _stamped(batches):
        import os

        start = time.time()
        time.sleep(HOLD_S)
        end = time.time()
        for pdf in batches:
            yield pd.DataFrame({
                "part": pdf["part"],
                "pid": os.getpid(),
                "t_start": start,
                "t_end": end,
            })

    df = (
        spark.range(N_TASKS).toDF("part")
        .repartition(N_TASKS, "part")
        .mapInPandas(
            _stamped,
            T.StructType([
                T.StructField("part", T.LongType()),
                T.StructField("pid", T.IntegerType()),
                T.StructField("t_start", T.DoubleType()),
                T.StructField("t_end", T.DoubleType()),
            ]),
        )
    )
    rows = df.collect()
    assert len(rows) == N_TASKS

    # mtiming's assertion, reconstructed from the emitted intervals:
    # the maximum number of simultaneously-running tasks must be >= 2.
    events = sorted(
        [(r.t_start, 1) for r in rows] + [(r.t_end, -1) for r in rows])
    live = peak = 0
    for _, delta in events:
        live += delta
        peak = max(peak, live)
    assert peak >= 2, f"tasks ran serially: peak concurrency {peak}"

    # rtiming's second signal: concurrency came from separate OS
    # processes (Python workers), not one worker timesharing.
    assert len({r.pid for r in rows}) >= 2, rows
