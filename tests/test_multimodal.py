"""Multimodal mapInPandas stages: schema/batch contracts and the
stand-in kernels' determinism (the part that stays true when real
codecs replace the fakes)."""

from pyspark.sql import functions as F

from mit_mapreduce_spark import operators
from mit_mapreduce_spark.catalog import load_table
from mit_mapreduce_spark.operators.multimodal import (
    FRAMES_PER_ASSET, TARGET_EDGE, binary_assets, resize_assets,
)
from mit_mapreduce_spark.operators.registry import QUERIES

operators.load_all()


def test_resize_bounds_and_determinism(spark, sf_dir):
    resized = resize_assets(binary_assets(spark, sf_dir))
    row = resized.agg(
        F.max("new_w").alias("mw"), F.max("new_h").alias("mh"),
        F.min("new_w").alias("nw"), F.min("new_h").alias("nh"),
        F.count("*").alias("n"),
    ).collect()[0]
    assert row.mw <= TARGET_EDGE and row.mh <= TARGET_EDGE
    assert row.nw >= 1 and row.nh >= 1
    assert row.n == load_table(spark, sf_dir, "documents").count()
    # longest edge is exactly the target (aspect-fit semantics)
    longest = resized.select(
        F.greatest("new_w", "new_h").alias("e")).agg(F.max("e")).collect()[0][0]
    assert longest == TARGET_EDGE
    # deterministic kernel: two runs hash identically
    a = sorted(resized.select("asset_id", "resized_checksum").collect())
    b = sorted(resized.select("asset_id", "resized_checksum").collect())
    assert a == b


def test_framesample_fanout(spark, sf_dir):
    n_docs = load_table(spark, sf_dir, "documents").count()
    out = QUERIES["multimodal_framesample"](spark, sf_dir)
    rows = out.collect()
    assert sorted(r.frame_idx for r in rows) == list(range(FRAMES_PER_ASSET))
    assert all(r.n_frames == n_docs for r in rows)
