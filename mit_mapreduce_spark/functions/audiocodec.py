"""Pure-stdlib WAV (RIFF/PCM) codec for the multimodal audio path.

Same philosophy as ``imagecodec``: "no third-party codec" does not
mean "fake decode". A PCM WAV is a RIFF container — fixed-layout
chunk headers around raw little-endian samples — so honest encode,
header-only metadata, and full sample decode are all ~stdlib
``struct``. This backs the audio tier of operators/multimodal.py:

- ``encode_wav``   — RIFF/WAVE/fmt/data wrap around raw PCM bytes
- ``parse_wav_meta`` — header-only (sample rate, channels, bits,
  frame count): the manifest-scan primitive, no sample bytes touched
- ``decode_wav``   — full decode to interleaved int16 frames

All parsers return None for anything malformed (the quarantine
signal, as in imagecodec — a corrupt asset must never kill a
million-task job). RIFF chunks are padded to even sizes per the
spec; the walker honors the pad byte.

No reference equivalent (the reference — mr/*.go — is text-only);
public RIFF/WAVE layout (Microsoft/IBM 1991 multimedia spec).
"""

from __future__ import annotations

import struct

DecodedWav = tuple[int, int, int, bytes]  # (rate, channels, bits, pcm)


def encode_wav(sample_rate: int, channels: int, pcm: bytes,
               bits: int = 16) -> bytes:
    """Canonical 44-byte-header PCM WAV around raw little-endian
    sample bytes (len must be a whole number of frames)."""
    block_align = channels * (bits // 8)
    if block_align == 0 or len(pcm) % block_align:
        raise ValueError(
            f"pcm length {len(pcm)} not a multiple of frame size"
            f" {block_align}")
    byte_rate = sample_rate * block_align
    fmt = struct.pack("<HHIIHH", 1, channels, sample_rate, byte_rate,
                      block_align, bits)
    data_pad = b"\x00" if len(pcm) % 2 else b""
    riff_size = 4 + (8 + len(fmt)) + (8 + len(pcm) + len(data_pad))
    return (b"RIFF" + struct.pack("<I", riff_size) + b"WAVE"
            + b"fmt " + struct.pack("<I", len(fmt)) + fmt
            + b"data" + struct.pack("<I", len(pcm)) + pcm + data_pad)


def _walk_chunks(data: bytes):
    """Yield (chunk_id, payload) for each RIFF sub-chunk, honoring the
    even-size pad byte. Stops (silently) at truncation."""
    i, n = 12, len(data)
    while i + 8 <= n:
        cid = data[i:i + 4]
        (size,) = struct.unpack("<I", data[i + 4:i + 8])
        if i + 8 + size > n:
            return
        yield cid, data[i + 8:i + 8 + size]
        i += 8 + size + (size % 2)


def parse_wav_meta(data: bytes) -> tuple[int, int, int, int] | None:
    """(sample_rate, channels, bits, n_frames) from the fmt/data chunk
    HEADERS only — integer-PCM (format tag 1) WAVs; None otherwise."""
    if len(data) < 12 or data[:4] != b"RIFF" or data[8:12] != b"WAVE":
        return None
    rate = channels = bits = block_align = None
    n_data = None
    n_data_chunks = 0
    for cid, payload in _walk_chunks(data):
        if cid == b"fmt " and len(payload) >= 16:
            tag, channels, rate, _, block_align, bits = struct.unpack(
                "<HHIIHH", payload[:16])
            if tag != 1:        # PCM only
                return None
        elif cid == b"data":
            n_data = len(payload)
            n_data_chunks += 1
    # Exactly ONE data chunk (r8 review: meta validated the LAST chunk
    # while decode returned the FIRST — a multi-data-chunk file passed
    # validation but handed the DSP kernel a non-frame-aligned buffer.
    # Multi-data RIFFs are quarantined in BOTH paths instead).
    if n_data_chunks != 1:
        return None
    if not rate or not channels or not bits or n_data is None:
        return None
    if not block_align or block_align != channels * (bits // 8):
        return None
    if n_data % block_align:
        return None
    return rate, channels, bits, n_data // block_align


def decode_wav(data: bytes) -> DecodedWav | None:
    """Full decode: header validation via parse_wav_meta, then the raw
    interleaved little-endian sample bytes of the data chunk."""
    meta = parse_wav_meta(data)
    if meta is None:
        return None
    rate, channels, bits, n_frames = meta
    # parse_wav_meta guarantees exactly one data chunk, so first == the
    # validated one
    for cid, payload in _walk_chunks(data):
        if cid == b"data":
            return rate, channels, bits, payload
    return None
