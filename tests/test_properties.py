"""Property-based tests (hypothesis) over the pure-Python kernels.

The reference has no tests at all (SURVEY.md §5); its de-facto test
strategy is differential (mrsequential golden outputs). These
properties cover the Python pieces the DuckDB differential harness
can't: the facade's partitioner and tokenizer, and the harness's own
row-ordering totality.
"""

import math
import unicodedata

from hypothesis import given, settings
from hypothesis import strategies as st

from mit_mapreduce_spark.mapreduce import fnv32a
from mit_mapreduce_spark.testing import _rows_to_key


# --- FNV-32a partitioner (mr/worker.go:38-42 semantics) -------------------

# Public FNV-32a vectors (Landon Curt Noll's reference tables), masked
# to 31 bits as the reference does.
_GOLDEN = {
    "": 0x811C9DC5 & 0x7FFFFFFF,
    "a": 0xE40C292C & 0x7FFFFFFF,
    "foobar": 0xBF9CF968 & 0x7FFFFFFF,
}


def test_fnv32a_golden_vectors():
    for k, want in _GOLDEN.items():
        assert fnv32a(k) == want


@given(st.text(max_size=200))
def test_fnv32a_range_and_determinism(key):
    h = fnv32a(key)
    assert 0 <= h < 2**31
    assert h == fnv32a(key)


@given(st.text(min_size=1, max_size=100), st.integers(1, 64))
def test_fnv32a_partition_stable(key, n):
    """The shard a key routes to is a pure function of (key, n) —
    the property the reference's reduce-file naming depends on."""
    assert fnv32a(key) % n == fnv32a(key) % n


# --- differential-harness row ordering ------------------------------------

_scalars = st.one_of(
    st.none(),
    st.integers(-2**40, 2**40),
    st.floats(allow_nan=True, allow_infinity=False),
    st.text(max_size=10),
    st.booleans(),
)


@settings(max_examples=200)
@given(st.lists(st.lists(_scalars, min_size=3, max_size=3), max_size=20),
       st.randoms())
def test_rows_to_key_total_order(rows, rnd):
    """Sorting mixed NULL/NaN/int/str/bool rows must never raise and
    must be permutation-invariant — the property that makes the
    order-insensitive hash compare reliable for any result schema."""
    cols = ["a", "b", "c"]
    rows = [tuple(r) for r in rows]
    base = _rows_to_key(cols, rows)
    shuffled = rows[:]
    rnd.shuffle(shuffled)
    again = _rows_to_key(cols, shuffled)
    # NaN != NaN breaks naive equality; compare via repr of the
    # normalized rows (NaN is normalized to a tagged tuple).
    assert repr(base) == repr(again)
    assert len(base) == len(rows)


# --- facade tokenizer ≡ reference unicode.IsLetter semantics --------------

from mit_mapreduce_spark.operators.mrparity import letter_tokens


def _reference_tokens(text: str) -> list[str]:
    """Character-by-character oracle: maximal runs of category-L runes
    (exactly Go's unicode.IsLetter over the decoded string,
    mrapps/wc.go:23-26)."""
    out, cur = [], []
    for ch in text:
        if unicodedata.category(ch).startswith("L"):
            cur.append(ch)
        elif cur:
            out.append("".join(cur))
            cur = []
    if cur:
        out.append("".join(cur))
    return out


@settings(max_examples=300)
@given(st.text(max_size=300))
def test_facade_tokenizer_matches_reference_semantics(text):
    assert letter_tokens(text) == _reference_tokens(text)


def test_nan_normalization_is_tagged():
    """NaN must normalize to a sortable tag, not a bare float/str that
    could collide with a real 'NaN' string value."""
    (row,) = _rows_to_key(["x"], [(float("nan"),)])
    (srow,) = _rows_to_key(["x"], [("NaN",)])
    assert row != srow
    assert not any(isinstance(v, float) and math.isnan(v) for v in row)


# --- media quality kernels (r11): arbitrary-signal differentials ----------

@given(st.lists(st.integers(-32768, 32767), min_size=1, max_size=400),
       st.integers(1, 2))
@settings(max_examples=40, deadline=None)
def test_audio_quality_stats_match_brute_force(samples, channels):
    """The Arrow audio-quality kernel's four stats equal a pure-Python
    brute force for ARBITRARY int16 PCM in 1-2 channels — the
    hypothesis extension of the crafted-payload differential (the
    planted fixture only exercises the classes it plants)."""
    import struct

    import pandas as pd

    from mit_mapreduce_spark.functions.audiocodec import encode_wav
    from mit_mapreduce_spark.operators.mmquality import (
        _aq_stats_batch, AQ_CLIP_T, AQ_SIL_T,
    )

    if len(samples) % channels:
        samples = samples[:len(samples) - len(samples) % channels]
    if not samples:
        samples = [0] * channels
    pcm = b"".join(struct.pack("<h", s) for s in samples)
    payload = encode_wav(8000, channels, pcm)
    out = pd.concat(list(_aq_stats_batch(
        iter([pd.DataFrame({"asset_id": [1], "payload": [payload]})]))))
    r = out.iloc[0]
    assert r["n_samples"] == len(samples)
    assert r["silence_count"] == sum(abs(s) <= AQ_SIL_T for s in samples)
    assert r["clip_count"] == sum(abs(s) >= AQ_CLIP_T for s in samples)
    assert r["dc_sum"] == sum(samples)


@given(st.lists(st.integers(0, 255), min_size=3, max_size=300))
@settings(max_examples=40, deadline=None)
def test_image_quality_stats_match_brute_force(rgb):
    """The image-quality kernel's byte stats equal a brute force for
    ARBITRARY RGB byte streams."""
    import pandas as pd

    from mit_mapreduce_spark.functions.imagecodec import encode_ppm
    from mit_mapreduce_spark.operators.mmquality import _iq_stats_batch

    n_px = len(rgb) // 3
    rgb = bytes(rgb[:n_px * 3])
    payload = encode_ppm(n_px, 1, rgb)
    out = pd.concat(list(_iq_stats_batch(
        iter([pd.DataFrame({"asset_id": [1], "payload": [payload]})]))))
    r = out.iloc[0]
    assert r["n_bytes"] == len(rgb)
    assert r["min_byte"] == min(rgb)
    assert r["max_byte"] == max(rgb)
    assert r["sum_bytes"] == sum(rgb)


@given(st.integers(1, 6), st.integers(1, 8), st.integers(1, 4),
       st.data())
@settings(max_examples=30, deadline=None)
def test_video_quality_stats_match_brute_force(nf, w, h, data):
    """The video-quality kernel's frame stats equal a brute force for
    ARBITRARY small Y4M streams, including generated black frames and
    frozen runs."""
    import pandas as pd

    from hypothesis import strategies as st_

    from mit_mapreduce_spark.functions.videocodec import encode_y4m
    from mit_mapreduce_spark.operators.mmquality import _vq_stats_batch

    fsz = 3 * w * h
    frames = []
    for _ in range(nf):
        kind = data.draw(st_.integers(0, 2))
        if kind == 0:
            frames.append(bytes(fsz))                 # black
        elif kind == 1 and frames:
            frames.append(frames[-1])                 # frozen repeat
        else:
            frames.append(bytes(data.draw(st_.lists(
                st_.integers(0, 255), min_size=fsz, max_size=fsz))))
    payload = encode_y4m(w, h, frames)
    out = pd.concat(list(_vq_stats_batch(
        iter([pd.DataFrame({"asset_id": [1], "payload": [payload]})]))))
    r = out.iloc[0]
    assert r["n_frames"] == len(frames)
    assert r["n_black"] == sum(1 for f in frames if sum(f[:w * h]) == 0)
    assert r["n_frozen_pairs"] == sum(
        1 for a, b in zip(frames, frames[1:]) if a == b)
    assert r["y_total"] == sum(sum(f[:w * h]) for f in frames)
