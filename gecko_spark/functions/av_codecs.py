"""Pure-Python/NumPy audio + video codecs for the multimodal operators.

The sandbox has no ffmpeg/soundfile, but two UNCOMPRESSED container
formats are decodable with nothing beyond ``struct`` + NumPy, which
makes the audio and video-frame paths REAL (not stubbed) for them:

- **WAV** (``RIFF..WAVE`` magic): PCM (format tag 1) 8-bit unsigned /
  16-bit signed little-endian, any channel count and sample rate;
  chunk-walking parser, unknown chunks skipped.
- **Y4M / YUV4MPEG2** (``YUV4MPEG2`` magic): the raw-frame interchange
  format every ffmpeg build speaks — one ASCII header, then
  ``FRAME``-delimited planar YUV. 420/422/444/mono colorspaces; the
  decoder returns the luma (Y) planes, which is what frame-sampling and
  feature extraction consume.

Compressed codecs (MP3/AAC/H.264/VP9...) still raise — an honest
boundary, surfaced per-batch inside the executors; swapping in
ffmpeg-backed decode on a real cluster is a one-function change. All
functions are deterministic, so pipelines built on them stay
reproducible bit-for-bit.
"""

from __future__ import annotations

import struct

import numpy as np

__all__ = [
    "UnsupportedMediaError",
    "sniff_av_format",
    "decode_wav",
    "encode_wav",
    "decode_y4m",
    "encode_y4m",
]


class UnsupportedMediaError(NotImplementedError):
    """Payload is not one of the pure-Python-decodable A/V formats."""


def sniff_av_format(data: bytes) -> str:
    """'wav' | 'y4m' | 'unknown' from magic bytes."""
    if len(data) >= 12 and data[:4] == b"RIFF" and data[8:12] == b"WAVE":
        return "wav"
    if data[:9] == b"YUV4MPEG2":
        return "y4m"
    return "unknown"


# ---------------------------------------------------------------------------
# WAV (RIFF PCM)
# ---------------------------------------------------------------------------


def decode_wav(data: bytes) -> tuple[np.ndarray, int]:
    """Decode a PCM WAV payload to ``(samples, sample_rate)`` where
    ``samples`` is int16 of shape (n_frames, n_channels). 8-bit PCM
    (unsigned) is widened to int16 (``(x - 128) << 8``) so every caller
    sees one dtype. Walks RIFF chunks, skipping unknown ones (LIST,
    fact, ...); word-aligned per the RIFF spec (odd-sized chunks carry
    a pad byte)."""
    if sniff_av_format(data) != "wav":
        raise UnsupportedMediaError("not a RIFF/WAVE payload")
    pos, end = 12, len(data)
    fmt = None
    pcm = None
    while pos + 8 <= end:
        cid, size = data[pos : pos + 4], struct.unpack_from("<I", data, pos + 4)[0]
        body = data[pos + 8 : pos + 8 + size]
        if cid == b"fmt ":
            if size < 16:
                raise UnsupportedMediaError(f"fmt chunk too short ({size} bytes)")
            tag, n_ch, rate, _brate, _align, bits = struct.unpack_from(
                "<HHIIHH", body, 0
            )
            if tag != 1:  # 1 = PCM; 3 (float) / 0xFFFE (extensible) unsupported
                raise UnsupportedMediaError(
                    f"WAV format tag {tag} unsupported (PCM only)"
                )
            if bits not in (8, 16):
                raise UnsupportedMediaError(f"{bits}-bit PCM unsupported (8/16)")
            if n_ch == 0 or rate == 0:
                raise UnsupportedMediaError("zero channels or sample rate")
            fmt = (n_ch, rate, bits)
        elif cid == b"data":
            pcm = body
        pos += 8 + size + (size & 1)  # chunks are word-aligned
    if fmt is None or pcm is None:
        raise UnsupportedMediaError("missing fmt or data chunk")
    n_ch, rate, bits = fmt
    if bits == 8:
        raw = np.frombuffer(pcm, dtype=np.uint8)
        samples = ((raw.astype(np.int16) - 128) << 8).astype(np.int16)
    else:
        raw = pcm[: len(pcm) - (len(pcm) % 2)]
        samples = np.frombuffer(raw, dtype="<i2").astype(np.int16)
    n_frames = samples.size // n_ch
    return samples[: n_frames * n_ch].reshape(n_frames, n_ch), rate


def encode_wav(samples: np.ndarray, sample_rate: int) -> bytes:
    """Encode int16 samples of shape (n_frames,) or (n_frames, n_ch) as
    16-bit PCM WAV — the test-side counterpart of :func:`decode_wav`."""
    arr = np.asarray(samples, dtype=np.int16)
    if arr.ndim == 1:
        arr = arr[:, None]
    n_ch = arr.shape[1]
    pcm = arr.astype("<i2").tobytes()
    fmt = struct.pack(
        "<HHIIHH", 1, n_ch, sample_rate, sample_rate * n_ch * 2, n_ch * 2, 16
    )
    body = b"WAVE" + b"fmt " + struct.pack("<I", len(fmt)) + fmt
    body += b"data" + struct.pack("<I", len(pcm)) + pcm
    return b"RIFF" + struct.pack("<I", len(body)) + body


# ---------------------------------------------------------------------------
# Y4M (YUV4MPEG2)
# ---------------------------------------------------------------------------

# chroma-plane size as a fraction of the luma plane, per colorspace tag
_Y4M_CHROMA_DIV = {
    "420": 4,  # two quarter-size planes
    "422": 2,  # two half-size planes
    "444": 1,  # two full-size planes
    "mono": 0,  # no chroma planes
}


def _y4m_chroma_div(cs: str) -> int:
    for prefix, div in _Y4M_CHROMA_DIV.items():
        if cs.startswith(prefix):
            return div
    raise UnsupportedMediaError(f"unsupported Y4M colorspace C{cs}")


def decode_y4m(data: bytes) -> tuple[np.ndarray, dict]:
    """Decode a YUV4MPEG2 payload to ``(y_planes, header)`` where
    ``y_planes`` is uint8 of shape (n_frames, height, width) — the luma
    planes, which carry the structural content frame sampling and
    feature extraction need — and ``header`` has ``width``, ``height``,
    ``fps`` (float), ``colorspace``. Chroma planes are parsed (to
    advance correctly) but not returned."""
    if sniff_av_format(data) != "y4m":
        raise UnsupportedMediaError("not a YUV4MPEG2 payload")
    nl = data.find(b"\n")
    if nl < 0:
        raise UnsupportedMediaError("truncated Y4M header")
    width = height = 0
    fps = 0.0
    cs = "420jpeg"  # the spec default when no C tag is present
    for tok in data[9:nl].split(b" "):
        if not tok:
            continue
        k, v = tok[:1], tok[1:].decode("ascii", "replace")
        if k == b"W":
            width = int(v)
        elif k == b"H":
            height = int(v)
        elif k == b"F":
            num, den = v.split(":")
            fps = int(num) / int(den)
        elif k == b"C":
            cs = v
    if width <= 0 or height <= 0:
        raise UnsupportedMediaError(f"bad Y4M dimensions {width}x{height}")
    div = _y4m_chroma_div(cs)
    y_size = width * height
    chroma = 0 if div == 0 else 2 * (y_size // div)
    frames = []
    pos = nl + 1
    while pos < len(data):
        fnl = data.find(b"\n", pos)
        if fnl < 0 or data[pos : pos + 5] != b"FRAME":
            raise UnsupportedMediaError(f"bad FRAME marker at byte {pos}")
        pos = fnl + 1
        if pos + y_size > len(data):
            raise UnsupportedMediaError("truncated Y4M frame payload")
        frames.append(
            np.frombuffer(data, dtype=np.uint8, count=y_size, offset=pos).reshape(
                height, width
            )
        )
        pos += y_size + chroma
    return (
        np.stack(frames) if frames else np.empty((0, height, width), np.uint8),
        {"width": width, "height": height, "fps": fps, "colorspace": cs},
    )


def encode_y4m(
    y_planes: np.ndarray, fps_num: int = 30, fps_den: int = 1
) -> bytes:
    """Encode uint8 luma planes of shape (n, H, W) as YUV4MPEG2 C420jpeg
    with neutral (128) chroma — the test-side counterpart of
    :func:`decode_y4m`. H and W must be even (420 subsampling)."""
    arr = np.asarray(y_planes, dtype=np.uint8)
    if arr.ndim != 3:
        raise ValueError(f"need (n, H, W) uint8, got shape {arr.shape}")
    n, h, w = arr.shape
    if h % 2 or w % 2:
        raise ValueError(f"C420 needs even dimensions, got {w}x{h}")
    header = b"YUV4MPEG2 W%d H%d F%d:%d Ip A1:1 C420jpeg\n" % (w, h, fps_num, fps_den)
    chroma = bytes([128]) * ((w // 2) * (h // 2))
    out = [header]
    for i in range(n):
        out.append(b"FRAME\n")
        out.append(arr[i].tobytes())
        out.append(chroma)
        out.append(chroma)
    return b"".join(out)
