"""Chaos/retry smoke (SURVEY.md §5.3.4, VERDICT r2 #5).

The reference's crash.go exists to prove a failed task is re-executed
and the job still completes with exact output (`mrapps/crash.go:20-32`
maybeCrash). On Spark, retry is the scheduler's job (F10-F13 are
"nothing to write" per SURVEY §2); this smoke injects a first-attempt
crash into an Arrow-batched kernel and asserts the job transparently
retries to an exact result.

Runs in a subprocess: task retries need a ``local[N, maxFailures]``
master, and the suite's singleton session is plain local[N] (one
SparkContext per JVM).
"""

import subprocess
import sys

_CODE = '''
from pyspark.sql import SparkSession

spark = (SparkSession.builder.master("local[4, 2]")   # 2 attempts/task
         .appName("chaos")
         .config("spark.sql.shuffle.partitions", "4")
         .config("spark.sql.execution.arrow.pyspark.enabled", "true")
         .getOrCreate())
spark.sparkContext.setLogLevel("ERROR")


def flaky(batches):
    """Crash the FIRST attempt of every task (crash.go's maybeCrash,
    made deterministic); later attempts run the real kernel."""
    from pyspark import TaskContext
    if TaskContext.get().attemptNumber() == 0:
        raise RuntimeError("chaos: injected first-attempt failure")
    for pdf in batches:
        yield pdf.assign(doubled=pdf["id"] * 2)


df = spark.range(0, 1000, 1, 4).mapInPandas(flaky, "id long, doubled long")
rows = df.collect()
assert len(rows) == 1000, len(rows)
assert sorted(r.id for r in rows) == list(range(1000))
assert all(r.doubled == 2 * r.id for r in rows)
print("CHAOS_OK")
'''


def test_flaky_arrow_kernel_is_retried_to_exact_result():
    out = subprocess.run([sys.executable, "-c", _CODE],
                         capture_output=True, text=True, timeout=300)
    assert "CHAOS_OK" in out.stdout, (out.stdout[-500:], out.stderr[-2000:])
