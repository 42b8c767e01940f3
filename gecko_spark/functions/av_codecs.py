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

Two COMPRESSED formats decode for real too (round 7):

- **IMA ADPCM WAV** (format tag 0x11): the classic 4-bit
  adaptive-delta audio codec — spec-fixed step/index tables, shift-add
  reconstruction, mono or interleaved multi-channel blocks.
- **Motion-JPEG AVI** (``RIFF..AVI `` magic, 'MJPG' vids stream): RIFF
  chunk walk to the '..dc' frame payloads, each a JPEG the pure-Python
  ``codecs.decode_jpeg`` (baseline + progressive) opens — samplers
  decode only the frames they keep.

Other compressed codecs (MP3/AAC/H.264/VP9...) still raise — an honest
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
    "encode_wav_ima_adpcm",
    "decode_y4m",
    "encode_y4m",
    "decode_avi_mjpeg",
    "encode_avi_mjpeg",
]


class UnsupportedMediaError(NotImplementedError):
    """Payload is not one of the pure-Python-decodable A/V formats."""


def _malformed_guard(fn):
    """Same contract as codecs._malformed_guard: malformed/truncated
    streams surface as :class:`UnsupportedMediaError` (quarantinable
    per payload), never as raw index/struct/value errors from garbage
    offsets."""
    import functools

    @functools.wraps(fn)
    def wrapped(data: bytes):
        try:
            return fn(data)
        except (UnsupportedMediaError, NotImplementedError):
            raise
        except (ValueError, IndexError, KeyError, OverflowError, struct.error) as ex:
            raise UnsupportedMediaError(
                f"malformed {fn.__name__.removeprefix('decode_')} stream: "
                f"{type(ex).__name__}: {ex}"
            ) from ex

    return wrapped


def sniff_av_format(data: bytes) -> str:
    """'wav' | 'y4m' | 'avi' | 'unknown' from magic bytes."""
    if len(data) >= 12 and data[:4] == b"RIFF" and data[8:12] == b"WAVE":
        return "wav"
    if len(data) >= 12 and data[:4] == b"RIFF" and data[8:12] == b"AVI ":
        return "avi"
    if data[:9] == b"YUV4MPEG2":
        return "y4m"
    return "unknown"


# ---------------------------------------------------------------------------
# WAV (RIFF PCM)
# ---------------------------------------------------------------------------


@_malformed_guard
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
            tag, n_ch, rate, _brate, align, bits = struct.unpack_from(
                "<HHIIHH", body, 0
            )
            if tag not in (1, 0x11):  # PCM / IMA ADPCM; float+ext unsupported
                raise UnsupportedMediaError(
                    f"WAV format tag {tag} unsupported (PCM or IMA ADPCM)"
                )
            if tag == 1 and bits not in (8, 16):
                raise UnsupportedMediaError(f"{bits}-bit PCM unsupported (8/16)")
            if tag == 0x11 and bits != 4:
                raise UnsupportedMediaError(
                    f"{bits}-bit IMA ADPCM unsupported (4-bit only)"
                )
            if n_ch == 0 or rate == 0:
                raise UnsupportedMediaError("zero channels or sample rate")
            fmt = (tag, n_ch, rate, bits, align)
        elif cid == b"data":
            pcm = body
        pos += 8 + size + (size & 1)  # chunks are word-aligned
    if fmt is None or pcm is None:
        raise UnsupportedMediaError("missing fmt or data chunk")
    tag, n_ch, rate, bits, align = fmt
    if tag == 0x11:
        return _decode_ima_adpcm(pcm, n_ch, align), rate
    if bits == 8:
        raw = np.frombuffer(pcm, dtype=np.uint8)
        samples = ((raw.astype(np.int16) - 128) << 8).astype(np.int16)
    else:
        raw = pcm[: len(pcm) - (len(pcm) % 2)]
        samples = np.frombuffer(raw, dtype="<i2").astype(np.int16)
    n_frames = samples.size // n_ch
    return samples[: n_frames * n_ch].reshape(n_frames, n_ch), rate


# IMA/DVI ADPCM tables (IMA ADPCM Reference Algorithm, 1992) — fixed by
# the spec; every implementation carries these same 8+89 constants
_IMA_INDEX_ADJUST = np.array([-1, -1, -1, -1, 2, 4, 6, 8], dtype=np.int64)
_IMA_STEPS = np.array(
    [
        7, 8, 9, 10, 11, 12, 13, 14, 16, 17, 19, 21, 23, 25, 28, 31, 34, 37,
        41, 45, 50, 55, 60, 66, 73, 80, 88, 97, 107, 118, 130, 143, 157, 173,
        190, 209, 230, 253, 279, 307, 337, 371, 408, 449, 494, 544, 598, 658,
        724, 796, 876, 963, 1060, 1166, 1282, 1411, 1552, 1707, 1878, 2066,
        2272, 2499, 2749, 3024, 3327, 3660, 4026, 4428, 4871, 5358, 5894,
        6484, 7132, 7845, 8630, 9493, 10442, 11487, 12635, 13899, 15289,
        16818, 18500, 20350, 22385, 24623, 27086, 29794, 32767,
    ],
    dtype=np.int64,
)


def _ima_step(pred: int, index: int, nibble: int) -> tuple[int, int]:
    """One IMA ADPCM decode step: (predictor, index) -> next state.
    The diff reconstruction uses the shift-add form from the spec
    (step>>3 + conditional step>>2/step>>1/step terms), NOT a float
    multiply — bit-exact with every conforming codec."""
    step = int(_IMA_STEPS[index])
    diff = step >> 3
    if nibble & 1:
        diff += step >> 2
    if nibble & 2:
        diff += step >> 1
    if nibble & 4:
        diff += step
    if nibble & 8:
        pred -= diff
    else:
        pred += diff
    pred = max(-32768, min(32767, pred))
    index = max(0, min(88, index + int(_IMA_INDEX_ADJUST[nibble & 7])))
    return pred, index


def _decode_ima_adpcm(pcm: bytes, n_ch: int, block_align: int) -> np.ndarray:
    """Decode IMA ADPCM WAV data blocks to int16 (n_frames, n_ch).
    Block layout (MS 'DVI/IMA' WAV mapping): per channel a 4-byte
    header (int16 predictor, uint8 step index, reserved), then the
    nibble data in interleaved 4-byte words per channel (8 nibbles for
    ch0, 8 for ch1, ...), low nibble first within each byte."""
    if block_align < 4 * n_ch:
        raise UnsupportedMediaError(f"IMA ADPCM block_align {block_align} too small")
    chans: list[list[int]] = [[] for _ in range(n_ch)]
    for base in range(0, len(pcm) - (len(pcm) % block_align), block_align):
        block = pcm[base : base + block_align]
        preds, idxs = [], []
        for c in range(n_ch):
            pred = struct.unpack_from("<h", block, c * 4)[0]
            index = block[c * 4 + 2]
            if index > 88:
                raise UnsupportedMediaError(f"IMA ADPCM step index {index}")
            preds.append(pred)
            idxs.append(index)
            chans[c].append(pred)  # header predictor IS the first sample
        data = block[4 * n_ch :]
        # interleaved 4-byte words per channel
        for w0 in range(0, len(data) - (len(data) % (4 * n_ch)), 4 * n_ch):
            for c in range(n_ch):
                word = data[w0 + c * 4 : w0 + c * 4 + 4]
                for byte in word:
                    for nib in (byte & 0xF, byte >> 4):
                        preds[c], idxs[c] = _ima_step(preds[c], idxs[c], nib)
                        chans[c].append(preds[c])
    n = min(len(ch) for ch in chans) if chans else 0
    out = np.empty((n, n_ch), dtype=np.int16)
    for c in range(n_ch):
        out[:, c] = np.asarray(chans[c][:n], dtype=np.int16)
    return out


def encode_wav_ima_adpcm(
    samples: np.ndarray, sample_rate: int, samples_per_block: int = 505
) -> bytes:
    """Encode int16 samples of shape (n,) or (n, n_ch) as an IMA ADPCM
    WAV (format tag 0x11) — the 4×-compressed counterpart of
    :func:`encode_wav` and the test-side pair of the ADPCM branch in
    :func:`decode_wav`. ``samples_per_block`` includes the header
    sample; (samples_per_block − 1) must be divisible by 8 so nibble
    words fill exactly (505 is the canonical value for 256-byte mono
    blocks)."""
    if (samples_per_block - 1) % 8:
        raise ValueError("samples_per_block - 1 must be divisible by 8")
    arr = np.asarray(samples, dtype=np.int16)
    if arr.ndim == 1:
        arr = arr[:, None]
    n, n_ch = arr.shape
    block_align = 4 * n_ch + (samples_per_block - 1) // 2 * n_ch
    out_blocks = []
    idxs = [0] * n_ch
    for base in range(0, n, samples_per_block):
        chunk = arr[base : base + samples_per_block]
        # pad the final partial block by repeating the last frame
        if len(chunk) < samples_per_block:
            pad = np.repeat(chunk[-1:], samples_per_block - len(chunk), axis=0)
            chunk = np.concatenate([chunk, pad])
        block = bytearray()
        preds = []
        for c in range(n_ch):
            pred = int(chunk[0, c])
            block += struct.pack("<hBB", pred, idxs[c], 0)
            preds.append(pred)
        nibbles: list[list[int]] = [[] for _ in range(n_ch)]
        for i in range(1, samples_per_block):
            for c in range(n_ch):
                target = int(chunk[i, c])
                step = int(_IMA_STEPS[idxs[c]])
                diff = target - preds[c]
                nib = 8 if diff < 0 else 0
                diff = abs(diff)
                if diff >= step:
                    nib |= 4
                    diff -= step
                if diff >= step >> 1:
                    nib |= 2
                    diff -= step >> 1
                if diff >= step >> 2:
                    nib |= 1
                preds[c], idxs[c] = _ima_step(preds[c], idxs[c], nib)
                nibbles[c].append(nib)
        for w0 in range(0, (samples_per_block - 1) // 8):
            for c in range(n_ch):
                for b in range(4):
                    lo = nibbles[c][w0 * 8 + b * 2]
                    hi = nibbles[c][w0 * 8 + b * 2 + 1]
                    block.append(lo | (hi << 4))
        out_blocks.append(bytes(block))
    pcm = b"".join(out_blocks)
    byte_rate = sample_rate * block_align // samples_per_block
    fmt = struct.pack(
        "<HHIIHHHH",
        0x11, n_ch, sample_rate, byte_rate, block_align, 4,
        2, samples_per_block,
    )
    body = b"WAVE" + b"fmt " + struct.pack("<I", len(fmt)) + fmt
    body += b"data" + struct.pack("<I", len(pcm)) + pcm
    return b"RIFF" + struct.pack("<I", len(body)) + body


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


@_malformed_guard
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


# ---------------------------------------------------------------------------
# AVI (RIFF) with Motion-JPEG video — COMPRESSED video, decoded for
# real: the container walk is ~100 lines of RIFF chunk arithmetic and
# every frame payload is a JPEG our own pure-Python decoder
# (functions/codecs.py::decode_jpeg, baseline + progressive) opens.
# ---------------------------------------------------------------------------


def _riff_chunks(data: bytes, pos: int, end: int):
    """Yield (fourcc, body_start, body_size) over a RIFF chunk span;
    word-aligned; LIST chunks are yielded as ('LIST:<type>', inner
    span) so callers can recurse without re-parsing."""
    while pos + 8 <= end:
        cid = data[pos : pos + 4]
        (size,) = struct.unpack_from("<I", data, pos + 4)
        body = pos + 8
        if body + size > len(data):
            raise UnsupportedMediaError(
                f"truncated RIFF chunk {cid!r} at byte {pos}"
            )
        yield cid, body, size
        pos = body + size + (size & 1)


@_malformed_guard
def decode_avi_mjpeg(data: bytes) -> tuple[list, dict]:
    """Parse a Motion-JPEG AVI payload into ``(jpeg_frames, header)``:
    ``jpeg_frames`` is a list of the raw JPEG bytes of each video
    frame ('..dc'/'..db' chunks inside 'movi', in stream order) and
    ``header`` has ``width``, ``height``, ``fps``, ``n_frames``.

    Frames are returned UNDECODED so samplers can decode only the
    frames they keep (``codecs.decode_jpeg`` per sampled frame) — the
    shape that matters when a clip has thousands of frames and the
    pipeline wants eight. Non-MJPEG video codecs raise."""
    if sniff_av_format(data) != "avi":
        raise UnsupportedMediaError("not a RIFF/AVI payload")
    width = height = 0
    fps = 0.0
    handler_ok = False
    frames: list = []
    for cid, body, size in _riff_chunks(data, 12, len(data)):
        if cid != b"LIST":
            continue
        ltype = data[body : body + 4]
        if ltype == b"hdrl":
            for c2, b2, s2 in _riff_chunks(data, body + 4, body + size):
                if c2 == b"avih" and s2 >= 40:
                    us_pf, _, _, _, _total = struct.unpack_from("<IIIII", data, b2)
                    if us_pf:
                        fps = 1e6 / us_pf
                    width, height = struct.unpack_from("<II", data, b2 + 32)
                elif c2 == b"LIST" and data[b2 : b2 + 4] == b"strl":
                    for c3, b3, s3 in _riff_chunks(data, b2 + 4, b2 + s2):
                        if c3 == b"strh" and s3 >= 8:
                            fcc_type = data[b3 : b3 + 4]
                            fcc_handler = data[b3 + 4 : b3 + 8]
                            if fcc_type == b"vids":
                                if fcc_handler not in (b"MJPG", b"mjpg", b"\x00\x00\x00\x00"):
                                    raise UnsupportedMediaError(
                                        f"AVI video codec {fcc_handler!r} "
                                        "unsupported (MJPG only)"
                                    )
                                handler_ok = True
        elif ltype == b"movi":
            for c2, b2, s2 in _riff_chunks(data, body + 4, body + size):
                if c2[2:4] in (b"dc", b"db") and s2 > 0:
                    frames.append(data[b2 : b2 + s2])
    if not handler_ok:
        raise UnsupportedMediaError("AVI has no MJPG video stream header")
    if width <= 0 or height <= 0:
        raise UnsupportedMediaError(f"bad AVI dimensions {width}x{height}")
    return frames, {
        "width": int(width),
        "height": int(height),
        "fps": fps,
        "n_frames": len(frames),
    }


def encode_avi_mjpeg(
    frames_rgb: np.ndarray, fps: int = 30, quality: int = 85
) -> bytes:
    """Encode uint8 RGB frames of shape (n, H, W, 3) as a minimal
    Motion-JPEG AVI (one 'vids'/'MJPG' stream, baseline-JPEG frame
    payloads via ``codecs.encode_jpeg_baseline``) — the test-side
    counterpart of :func:`decode_avi_mjpeg`."""
    from gecko_spark.functions.codecs import encode_jpeg_baseline

    arr = np.asarray(frames_rgb, dtype=np.uint8)
    if arr.ndim != 4 or arr.shape[3] != 3:
        raise ValueError(f"need (n, H, W, 3) uint8, got shape {arr.shape}")
    n, h, w = arr.shape[:3]

    def chunk(cid: bytes, body: bytes) -> bytes:
        return cid + struct.pack("<I", len(body)) + body + (b"\x00" if len(body) & 1 else b"")

    def lst(ltype: bytes, body: bytes) -> bytes:
        return chunk(b"LIST", ltype + body)

    avih = struct.pack(
        "<IIIIIIIIIIIIII",
        1_000_000 // fps, 0, 0, 0x10, n, 0, 1, 0, w, h, 0, 0, 0, 0,
    )
    # AVISTREAMHEADER: dwFlags, wPriority, wLanguage, dwInitialFrames,
    # dwScale, dwRate, dwStart, dwLength, dwSuggestedBufferSize,
    # dwQuality, dwSampleSize (9 dwords after the two words), then
    # rcFrame — 56 bytes total, the layout strict external parsers
    # expect (ADVICE r7: an extra trailing dword shifted rcFrame by 4)
    strh = (
        b"vids" + b"MJPG"
        + struct.pack("<IHHIIIIIIII", 0, 0, 0, 0, 1, fps, 0, n, 0, 0, 0)
        + struct.pack("<hhhh", 0, 0, w, h)
    )
    strf = struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0x47504A4D, w * h * 3, 0, 0, 0, 0)
    hdrl = lst(
        b"hdrl",
        chunk(b"avih", avih) + lst(b"strl", chunk(b"strh", strh) + chunk(b"strf", strf)),
    )
    movi_body = b"".join(
        chunk(b"00dc", encode_jpeg_baseline(arr[i], quality=quality))
        for i in range(n)
    )
    movi = lst(b"movi", movi_body)
    riff_body = b"AVI " + hdrl + movi
    return b"RIFF" + struct.pack("<I", len(riff_body)) + riff_body
