"""Pure-Python/NumPy image codecs for the multimodal operators.

The sandbox has no PIL/opencv/ffmpeg, but two uncompressed formats are
decodable with nothing beyond ``struct`` + NumPy, which makes the
multimodal path REAL (not stubbed) for them:

- **BMP** (Windows bitmap, ``BM`` magic): BITMAPINFOHEADER and larger
  DIB headers, 24/32-bit BI_RGB (uncompressed) — bottom-up or top-down,
  4-byte row padding, BGR(A) channel order.
- **PPM/PGM** (Netpbm ``P6``/``P5`` magic): binary RGB/grayscale,
  maxval ≤ 255, ``#`` comments.
- **PNG** (``\\x89PNG`` magic): non-interlaced 8-bit gray / gray+alpha /
  RGB / RGBA / palette — stdlib ``zlib`` inflate + per-scanline
  unfiltering (all five filter types), no external deps.

JPEG/video still raise :class:`UnsupportedImageError` — a honest
boundary, surfaced per-batch inside the executors. All functions are
deterministic, so pipelines built on them stay oracle-checkable.
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

__all__ = [
    "UnsupportedImageError",
    "sniff_format",
    "decode_image",
    "resize_nearest",
    "encode_ppm",
    "decode_bmp",
    "decode_ppm",
    "decode_png",
]


class UnsupportedImageError(NotImplementedError):
    """Payload is not one of the pure-Python-decodable formats."""


_PNG_SIG = b"\x89PNG\r\n\x1a\n"


def sniff_format(data: bytes) -> str:
    """'bmp' | 'ppm' | 'pgm' | 'png' | 'unknown' from magic bytes."""
    if data[:8] == _PNG_SIG:
        return "png"
    if len(data) >= 2:
        if data[:2] == b"BM":
            return "bmp"
        if data[:2] == b"P6":
            return "ppm"
        if data[:2] == b"P5":
            return "pgm"
    return "unknown"


def decode_bmp(data: bytes) -> np.ndarray:
    """Decode an uncompressed 24/32-bit BMP into (H, W, 3) uint8 RGB."""
    if len(data) < 54 or data[:2] != b"BM":
        raise UnsupportedImageError("not a BMP payload")
    pixel_offset = struct.unpack_from("<I", data, 10)[0]
    dib_size = struct.unpack_from("<I", data, 14)[0]
    if dib_size < 40:  # BITMAPCOREHEADER etc. not worth supporting
        raise UnsupportedImageError(f"unsupported DIB header size {dib_size}")
    width, height = struct.unpack_from("<ii", data, 18)
    bpp = struct.unpack_from("<H", data, 28)[0]
    compression = struct.unpack_from("<I", data, 30)[0]
    if compression != 0:  # BI_RGB only
        raise UnsupportedImageError(f"compressed BMP (method {compression})")
    if bpp not in (24, 32):
        raise UnsupportedImageError(f"{bpp}-bit BMP (24/32 only)")
    if width <= 0 or height == 0:
        raise UnsupportedImageError(f"bad dimensions {width}x{height}")
    bottom_up = height > 0
    height = abs(height)
    bytes_pp = bpp // 8
    row_stride = (width * bytes_pp + 3) & ~3  # rows pad to 4 bytes
    need = pixel_offset + row_stride * height
    if len(data) < need:
        raise UnsupportedImageError(
            f"truncated BMP: {len(data)} bytes, need {need}"
        )
    raw = np.frombuffer(
        data, dtype=np.uint8, count=row_stride * height, offset=pixel_offset
    ).reshape(height, row_stride)
    px = raw[:, : width * bytes_pp].reshape(height, width, bytes_pp)
    rgb = px[:, :, 2::-1]  # BGR(A) -> RGB, alpha dropped
    if bottom_up:
        rgb = rgb[::-1]
    return np.ascontiguousarray(rgb)


def _pnm_tokens(data: bytes, n: int, start: int) -> tuple[list[int], int]:
    """Read ``n`` whitespace-separated ASCII integers (skipping ``#``
    comments) from ``data`` beginning at ``start``; returns (values,
    offset just past the single whitespace byte ending the last one)."""
    vals: list[int] = []
    i = start
    while len(vals) < n:
        while i < len(data) and data[i : i + 1].isspace():
            i += 1
        if i < len(data) and data[i : i + 1] == b"#":
            while i < len(data) and data[i] != 0x0A:
                i += 1
            continue
        j = i
        while j < len(data) and not data[j : j + 1].isspace():
            j += 1
        if j == i:
            raise UnsupportedImageError("truncated PNM header")
        try:
            vals.append(int(data[i:j]))
        except ValueError as exc:
            raise UnsupportedImageError(f"bad PNM header token {data[i:j]!r}") from exc
        i = j
    return vals, i + 1  # exactly one whitespace after maxval per spec


def decode_ppm(data: bytes) -> np.ndarray:
    """Decode binary PPM (P6) / PGM (P5) into (H, W, 3) uint8 RGB."""
    magic = data[:2]
    if magic not in (b"P6", b"P5"):
        raise UnsupportedImageError("not a binary PPM/PGM payload")
    (width, height, maxval), off = _pnm_tokens(data, 3, 2)
    if maxval <= 0 or maxval > 255:
        raise UnsupportedImageError(f"PNM maxval {maxval} (8-bit only)")
    if width <= 0 or height <= 0:
        raise UnsupportedImageError(f"bad dimensions {width}x{height}")
    channels = 3 if magic == b"P6" else 1
    need = width * height * channels
    if len(data) - off < need:
        raise UnsupportedImageError(
            f"truncated PNM: {len(data) - off} payload bytes, need {need}"
        )
    px = np.frombuffer(data, dtype=np.uint8, count=need, offset=off).reshape(
        height, width, channels
    )
    if channels == 1:
        px = np.repeat(px, 3, axis=2)
    return np.ascontiguousarray(px)


# PNG color type -> samples per pixel (8-bit depth only)
_PNG_CHANNELS = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}


def _png_unfilter(raw: np.ndarray, height: int, stride: int, bpp: int) -> np.ndarray:
    """Reverse PNG scanline filtering. ``raw`` is the inflated IDAT
    stream: ``height`` rows of ``1 + stride`` bytes (filter tag + data).
    Returns (height, stride) uint8 of reconstructed bytes.

    None/Up rows are whole-row vectorized; Sub is a per-byte-lane
    cumulative sum (recon[i] = raw[i] + recon[i-bpp] telescopes to a
    running sum mod 256); Average/Paeth depend on the left *recon*
    byte so they run a per-pixel-column loop — still O(stride), and
    scanlines are short relative to Arrow batch sizes."""
    rows = raw.reshape(height, 1 + stride)
    tags, data = rows[:, 0], rows[:, 1:]
    out = np.zeros((height, stride), dtype=np.uint8)
    prev = np.zeros(stride, dtype=np.uint16)
    for y in range(height):
        t, line = int(tags[y]), data[y]
        if t == 0:  # None
            rec = line.copy()
        elif t == 1:  # Sub
            rec = line.copy()
            for k in range(bpp):
                rec[k::bpp] = np.cumsum(rec[k::bpp], dtype=np.uint64) & 0xFF
        elif t == 2:  # Up
            rec = ((line + prev) & 0xFF).astype(np.uint8)
        elif t == 3:  # Average
            rec = np.empty(stride, dtype=np.uint8)
            line16 = line.astype(np.uint16)
            for i in range(stride):
                left = rec[i - bpp] if i >= bpp else 0
                rec[i] = (line16[i] + ((int(left) + int(prev[i])) >> 1)) & 0xFF
        elif t == 4:  # Paeth
            rec = np.empty(stride, dtype=np.uint8)
            for i in range(stride):
                a = int(rec[i - bpp]) if i >= bpp else 0
                b = int(prev[i])
                c = int(prev[i - bpp]) if i >= bpp else 0
                p = a + b - c
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                pred = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
                rec[i] = (int(line[i]) + pred) & 0xFF
        else:
            raise UnsupportedImageError(f"bad PNG filter type {t} on row {y}")
        out[y] = rec
        prev = rec.astype(np.uint16)
    return out


def decode_png(data: bytes) -> np.ndarray:
    """Decode a non-interlaced 8-bit PNG (gray / gray+alpha / RGB /
    RGBA / palette) into (H, W, 3) uint8 RGB using only stdlib zlib.
    Alpha is dropped (matches :func:`decode_bmp`'s 32-bit handling)."""
    if data[:8] != _PNG_SIG:
        raise UnsupportedImageError("not a PNG payload")
    pos, width = 8, -1
    height = bit_depth = color_type = -1
    palette: bytes | None = None
    idat = bytearray()
    while pos + 8 <= len(data):
        (length,) = struct.unpack_from(">I", data, pos)
        ctype = data[pos + 4 : pos + 8]
        body = data[pos + 8 : pos + 8 + length]
        if len(body) < length:
            raise UnsupportedImageError("truncated PNG chunk")
        pos += 12 + length  # len + type + body + CRC (CRC not verified)
        if ctype == b"IHDR":
            width, height, bit_depth, color_type, comp, filt, interlace = (
                struct.unpack_from(">IIBBBBB", body, 0)
            )
            if comp != 0 or filt != 0:
                raise UnsupportedImageError("nonstandard PNG compression/filter method")
            if interlace != 0:
                raise UnsupportedImageError("interlaced (Adam7) PNG unsupported")
            if bit_depth != 8:
                raise UnsupportedImageError(f"{bit_depth}-bit PNG (8-bit only)")
            if color_type not in _PNG_CHANNELS:
                raise UnsupportedImageError(f"PNG color type {color_type}")
        elif ctype == b"PLTE":
            palette = bytes(body)
        elif ctype == b"IDAT":
            idat += body
        elif ctype == b"IEND":
            break
    if width <= 0 or height <= 0:
        raise UnsupportedImageError(f"bad PNG dimensions {width}x{height}")
    if not idat:
        raise UnsupportedImageError("PNG has no IDAT data")
    ch = _PNG_CHANNELS[color_type]
    stride = width * ch
    try:
        raw = np.frombuffer(zlib.decompress(bytes(idat)), dtype=np.uint8)
    except zlib.error as exc:
        raise UnsupportedImageError(f"corrupt PNG zlib stream: {exc}") from exc
    if raw.size != height * (1 + stride):
        raise UnsupportedImageError(
            f"PNG payload {raw.size} bytes, expected {height * (1 + stride)}"
        )
    px = _png_unfilter(raw, height, stride, ch).reshape(height, width, ch)
    if color_type == 2:  # RGB
        rgb = px
    elif color_type == 6:  # RGBA
        rgb = px[:, :, :3]
    elif color_type == 0:  # gray
        rgb = np.repeat(px, 3, axis=2)
    elif color_type == 4:  # gray + alpha
        rgb = np.repeat(px[:, :, :1], 3, axis=2)
    else:  # palette
        if palette is None:
            raise UnsupportedImageError("palette PNG missing PLTE chunk")
        lut = np.frombuffer(palette, dtype=np.uint8)
        if lut.size % 3:
            raise UnsupportedImageError("bad PLTE length")
        lut = lut.reshape(-1, 3)
        idx = px[:, :, 0]
        if int(idx.max(initial=0)) >= lut.shape[0]:
            raise UnsupportedImageError("palette index out of range")
        rgb = lut[idx]
    return np.ascontiguousarray(rgb)


def decode_image(data: bytes) -> np.ndarray:
    """Decode any supported payload into (H, W, 3) uint8 RGB."""
    fmt = sniff_format(data)
    if fmt == "bmp":
        return decode_bmp(data)
    if fmt in ("ppm", "pgm"):
        return decode_ppm(data)
    if fmt == "png":
        return decode_png(data)
    raise UnsupportedImageError(
        "unsupported image format (pure-Python codecs cover uncompressed "
        "BMP, binary PPM/PGM, and non-interlaced 8-bit PNG; JPEG/video "
        "need PIL/opencv on the executors)"
    )


def resize_nearest(img: np.ndarray, width: int, height: int) -> np.ndarray:
    """Nearest-neighbor resize of (H, W, C) to (height, width, C) — pure
    integer index math (``floor((i + 0.5) * src / dst)``), fully
    deterministic across platforms."""
    if width <= 0 or height <= 0:
        raise ValueError(f"bad target size {width}x{height}")
    src_h, src_w = img.shape[:2]
    rows = ((np.arange(height) * 2 + 1) * src_h) // (2 * height)
    cols = ((np.arange(width) * 2 + 1) * src_w) // (2 * width)
    return np.ascontiguousarray(img[rows[:, None], cols[None, :]])


def encode_ppm(img: np.ndarray) -> bytes:
    """Encode (H, W, 3) uint8 RGB as binary PPM (P6) — the
    deterministic output container for resized images."""
    if img.ndim != 3 or img.shape[2] != 3 or img.dtype != np.uint8:
        raise ValueError(f"need (H, W, 3) uint8, got {img.shape} {img.dtype}")
    h, w = img.shape[:2]
    return b"P6\n%d %d\n255\n" % (w, h) + img.tobytes()
