"""Ingest resilience: one corrupt object in a million-file lake must
cost one file's rows, never the job."""

import os

from pyspark.sql import functions as F

from mit_mapreduce_spark.catalog import load_table


def test_corrupt_file_quarantine(spark, sf_dir, tmp_path):
    out = str(tmp_path / "lake")
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    docs.repartition(4).write.mode("overwrite").parquet(out)
    n_good = docs.count()

    # a truncated/garbage object that globs like a data file
    with open(os.path.join(out, "part-99999-corrupt.snappy.parquet"),
              "wb") as f:
        f.write(b"PAR1 this is not a parquet file")

    old = spark.conf.get("spark.sql.files.ignoreCorruptFiles", "false")
    try:
        spark.conf.set("spark.sql.files.ignoreCorruptFiles", "true")
        survived = spark.read.parquet(out).count()
        assert survived == n_good
        # default posture: fail loudly, never silently drop
        spark.conf.set("spark.sql.files.ignoreCorruptFiles", "false")
        try:
            spark.read.parquet(out).count()
            raised = False
        except Exception:
            raised = True
        assert raised, "corrupt file must fail the job when quarantine is off"
    finally:
        spark.conf.set("spark.sql.files.ignoreCorruptFiles", old)
