"""Audio tier tests: the pure-stdlib WAV codec (round trip, chunk-walk
quarantine semantics, RIFF even-size padding) and the two registered
queries' Spark-side values against independent pure-Python
recomputation (the DuckDB twin does the same check cross-engine)."""

import struct

from mit_mapreduce_spark import operators
from mit_mapreduce_spark.functions.audiocodec import (
    decode_wav, encode_wav, parse_wav_meta,
)
from mit_mapreduce_spark.operators.registry import QUERIES

operators.load_all()


def test_wav_roundtrip_16bit_stereo():
    pcm = struct.pack("<8h", 0, 100, -100, 32767, -32768, 5, -5, 0)
    wav = encode_wav(22050, 2, pcm)
    assert parse_wav_meta(wav) == (22050, 2, 16, 4)  # 8 samples / 2 ch
    assert decode_wav(wav) == (22050, 2, 16, pcm)


def test_wav_odd_data_chunk_is_padded_and_still_parses():
    # 8-bit mono with an odd sample count: the data chunk gets the
    # RIFF pad byte; the walker must honor it and the frame count must
    # exclude it.
    pcm = bytes([1, 2, 3])
    wav = encode_wav(8000, 1, pcm, bits=8)
    assert len(wav) % 2 == 0
    assert parse_wav_meta(wav) == (8000, 1, 8, 3)
    assert decode_wav(wav)[3] == pcm


def test_wav_quarantine_semantics():
    good = encode_wav(8000, 1, b"\x00\x00")
    assert parse_wav_meta(b"") is None
    assert parse_wav_meta(b"RIFFxxxx") is None
    assert parse_wav_meta(b"not audio at all") is None
    assert parse_wav_meta(good[:20]) is None          # truncated
    # non-PCM format tag quarantines
    bad = bytearray(good)
    bad[20] = 3  # fmt tag -> IEEE float
    assert parse_wav_meta(bytes(bad)) is None
    # data size not a whole number of frames quarantines
    stereo = bytearray(encode_wav(8000, 2, b"\x00\x00\x00\x00"))
    (dpos,) = [i for i in range(len(stereo) - 4)
               if stereo[i:i + 4] == b"data"]
    stereo[dpos + 4:dpos + 8] = struct.pack("<I", 3)
    assert parse_wav_meta(bytes(stereo)) is None


def test_audio_queries_match_pure_python_reference(spark, sf_dir):
    """Spark-side meta + features equal an independent pure-Python
    recomputation from the documented construction (format params from
    doc_id, samples from the sha256 chain over the text)."""
    import hashlib

    from pyspark.sql import functions as F

    from mit_mapreduce_spark.catalog import load_table

    texts = {r.doc_id: r.text
             for r in load_table(spark, sf_dir, "documents")
             .select("doc_id", "text").where(F.col("doc_id") < 8).collect()}
    meta = {r.asset_id: r for r in
            QUERIES["multimodal_audio_meta"](spark, sf_dir)
            .where(F.col("asset_id") < 8).collect()}
    feats = {r.asset_id: r for r in
             QUERIES["multimodal_audio_features"](spark, sf_dir)
             .where(F.col("asset_id") < 8).collect()}
    assert set(meta) == set(texts) == set(feats)
    rates = (8000, 16000, 22050, 44100)
    for did, text in texts.items():
        rate = rates[did % 4]
        ch = 1 + did % 2
        nf = 400 + (did % 7) * 100
        m = meta[did]
        assert (m.sample_rate, m.channels, m.bits, m.n_frames) == (
            rate, ch, 16, nf)
        assert m.duration_ms == nf * 1000 // rate
        # reference PCM from the sha256 chain
        need = nf * ch * 2
        chain = b"".join(
            hashlib.sha256(f"{text}|{i}".encode()).digest()
            for i in range((need + 31) // 32))[:need]
        samples = list(struct.unpack(f"<{nf * ch}h", chain))
        ch0 = samples[::ch]
        zc = sum((a < 0) != (b < 0) for a, b in zip(ch0, ch0[1:]))
        f = feats[did]
        assert f.n_frames == nf
        assert f.sum_sq == sum(s * s for s in samples)
        assert f.peak == max(abs(s) for s in samples)
        assert f.zero_crossings == zc
