"""Video tier tests: the pure-stdlib Y4M codec (round trip, header
tolerance, truncation/garbage quarantine) and the two registered
queries against independent pure-Python recomputation (the DuckDB
twin repeats the same check cross-engine)."""

import hashlib

from mit_mapreduce_spark import operators
from mit_mapreduce_spark.functions.videocodec import (
    encode_y4m, iter_y4m_frames, parse_y4m_meta,
)
from mit_mapreduce_spark.operators.registry import QUERIES

operators.load_all()


def test_y4m_roundtrip():
    frames = [bytes((i + f) % 256 for i in range(3 * 4 * 2))
              for f in range(3)]
    data = encode_y4m(4, 2, frames, fps_num=24)
    assert parse_y4m_meta(data) == (4, 2, 24, 1, 3)
    assert list(iter_y4m_frames(data)) == frames


def test_y4m_header_tolerance_and_quarantine():
    # unknown tags tolerated, order-independent
    frames = [b"\x00" * 12]
    data = encode_y4m(2, 2, frames)
    extra = data.replace(b" C444\n", b" C444 Xweird\n")
    assert parse_y4m_meta(extra) == (2, 2, 25, 1, 1)
    # quarantine: garbage, missing newline, truncated frame, bad
    # marker, non-444 colorspace
    assert parse_y4m_meta(b"") is None
    assert parse_y4m_meta(b"not video") is None
    assert parse_y4m_meta(b"YUV4MPEG2 W2 H2 F25:1") is None
    assert parse_y4m_meta(data[:-3]) is None
    assert parse_y4m_meta(data.replace(b"FRAME\n", b"FRAMX\n")) is None
    assert parse_y4m_meta(data.replace(b"C444", b"C420")) is None


def test_video_queries_match_pure_python_reference(spark, sf_dir):
    from pyspark.sql import functions as F

    from mit_mapreduce_spark.catalog import load_table

    texts = {r.doc_id: r.text
             for r in load_table(spark, sf_dir, "documents")
             .select("doc_id", "text").where(F.col("doc_id") < 8).collect()}
    meta = {r.asset_id: r for r in
            QUERIES["multimodal_video_meta"](spark, sf_dir)
            .where(F.col("asset_id") < 8).collect()}
    frames = {}
    for r in (QUERIES["multimodal_video_frames"](spark, sf_dir)
              .where(F.col("asset_id") < 8).collect()):
        frames.setdefault(r.asset_id, {})[r.frame_idx] = r
    assert set(meta) == set(texts) == set(frames)
    for did, text in texts.items():
        w = 8 + (did % 3) * 4
        h = 6 + (did % 2) * 2
        nf = 3 + did % 4
        fps = 24 + did % 2
        m = meta[did]
        assert (m.width, m.height, m.fps_num, m.n_frames) == (w, h, fps, nf)
        assert m.duration_ms == nf * 1000 // fps
        need = nf * 3 * w * h
        chain = b"".join(
            hashlib.sha256(f"{text}|{i}".encode()).digest()
            for i in range((need + 31) // 32))[:need]
        assert set(frames[did]) == set(range(nf))
        for f in range(nf):
            fb = chain[f * 3 * w * h:(f + 1) * 3 * w * h]
            row = frames[did][f]
            assert row.frame_digest == hashlib.md5(
                fb.hex().encode()).hexdigest()
            assert row.y_sum == sum(fb[:w * h])
