"""Pure-stdlib Y4M (YUV4MPEG2) video codec for the multimodal path.

Completes the codec trio (imagecodec: PPM/BMP/PNG + JPEG headers;
audiocodec: RIFF/PCM WAV): YUV4MPEG2 is the uncompressed video
interchange format every ffmpeg/mjpegtools pipeline speaks — a
plain-text stream header (``YUV4MPEG2 W.. H.. F..:.. ...\\n``)
followed by ``FRAME\\n``-delimited raw YUV planes — so honest encode,
header-only metadata, and true frame extraction are all stdlib string
and slice operations. C444 (no chroma subsampling) keeps every frame
exactly 3·w·h bytes with no even-dimension constraints.

All parsers return None for malformed input (the quarantine signal,
as in imagecodec/audiocodec). Public format: the YUV4MPEG2 layout
shipped with mjpegtools and documented in ffmpeg.

No reference equivalent (the reference — mr/*.go — is text-only).
"""

from __future__ import annotations

Y4MMeta = tuple[int, int, int, int, int]  # (w, h, fps_num, fps_den, n_frames)

_MAGIC = b"YUV4MPEG2"


def encode_y4m(width: int, height: int, frames: list[bytes],
               fps_num: int = 25, fps_den: int = 1) -> bytes:
    """C444 Y4M stream: each frame must be exactly 3·w·h bytes
    (full-resolution Y, U, V planes)."""
    need = 3 * width * height
    for i, f in enumerate(frames):
        if len(f) != need:
            raise ValueError(f"frame {i}: need {need} bytes, got {len(f)}")
    header = (f"YUV4MPEG2 W{width} H{height} F{fps_num}:{fps_den}"
              f" Ip A1:1 C444\n").encode()
    return header + b"".join(b"FRAME\n" + f for f in frames)


def _parse_header(data: bytes) -> tuple[int, int, int, int, int] | None:
    """(w, h, fps_num, fps_den, header_end) from the stream header, or
    None. C444 only (the encoder's format); unknown tags tolerated."""
    if not data.startswith(_MAGIC + b" "):
        return None
    end = data.find(b"\n")
    if end < 0:
        return None
    w = h = fps_num = fps_den = None
    colorspace = "C444"  # Y4M default here; explicit tag overrides
    for tag in data[len(_MAGIC) + 1:end].decode("ascii", "replace").split():
        try:
            if tag[0] == "W":
                w = int(tag[1:])
            elif tag[0] == "H":
                h = int(tag[1:])
            elif tag[0] == "F":
                fps_num, fps_den = (int(x) for x in tag[1:].split(":"))
            elif tag[0] == "C":
                colorspace = tag
        except (ValueError, IndexError):
            return None
    # Strict positivity (r8 review: W-1 H2 made frame_size = -6 cancel
    # the +6 FRAME-marker advance exactly — an infinite loop in the
    # manifest walk instead of a quarantine).
    if w <= 0 or h <= 0 or fps_num <= 0 or fps_den <= 0:
        return None
    if not colorspace.startswith("C444"):
        return None
    return w, h, fps_num, fps_den, end + 1


def parse_y4m_meta(data: bytes) -> Y4MMeta | None:
    """(w, h, fps_num, fps_den, n_frames) by walking the FRAME markers
    — O(n_frames) slice arithmetic, no pixel bytes copied."""
    hdr = _parse_header(data)
    if hdr is None:
        return None
    w, h, fps_num, fps_den, pos = hdr
    frame_size = 3 * w * h
    n = 0
    while pos < len(data):
        if data[pos:pos + 6] != b"FRAME\n":
            return None
        pos += 6
        if pos + frame_size > len(data):
            return None  # truncated frame
        pos += frame_size
        n += 1
    return w, h, fps_num, fps_den, n


def iter_y4m_frames(data: bytes):
    """Yield raw 3·w·h-byte C444 frames; None-safe via prior
    parse_y4m_meta (callers check meta first — quarantine contract)."""
    hdr = _parse_header(data)
    if hdr is None:
        return
    w, h, _, _, pos = hdr
    frame_size = 3 * w * h
    while pos + 6 + frame_size <= len(data) \
            and data[pos:pos + 6] == b"FRAME\n":
        yield data[pos + 6:pos + 6 + frame_size]
        pos += 6 + frame_size
