"""Pure-Python/NumPy image codecs for the multimodal operators.

The sandbox has no PIL/opencv/ffmpeg, but two uncompressed formats are
decodable with nothing beyond ``struct`` + NumPy, which makes the
multimodal path REAL (not stubbed) for them:

- **BMP** (Windows bitmap, ``BM`` magic): BITMAPINFOHEADER and larger
  DIB headers, 24/32-bit BI_RGB (uncompressed) — bottom-up or top-down,
  4-byte row padding, BGR(A) channel order.
- **PPM/PGM** (Netpbm ``P6``/``P5`` magic): binary RGB/grayscale,
  maxval ≤ 255, ``#`` comments.

Anything compressed (PNG/JPEG/...) still raises
:class:`UnsupportedImageError` — a honest boundary, surfaced per-batch
inside the executors. All functions are deterministic, so pipelines
built on them stay oracle-checkable.
"""

from __future__ import annotations

import struct

import numpy as np

__all__ = [
    "UnsupportedImageError",
    "sniff_format",
    "decode_image",
    "resize_nearest",
    "encode_ppm",
    "decode_bmp",
    "decode_ppm",
]


class UnsupportedImageError(NotImplementedError):
    """Payload is not one of the pure-Python-decodable formats."""


def sniff_format(data: bytes) -> str:
    """'bmp' | 'ppm' | 'pgm' | 'unknown' from magic bytes."""
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


def decode_image(data: bytes) -> np.ndarray:
    """Decode any supported payload into (H, W, 3) uint8 RGB."""
    fmt = sniff_format(data)
    if fmt == "bmp":
        return decode_bmp(data)
    if fmt in ("ppm", "pgm"):
        return decode_ppm(data)
    raise UnsupportedImageError(
        "unsupported image format (pure-Python codecs cover uncompressed "
        "BMP and binary PPM/PGM; compressed formats need PIL/opencv on "
        "the executors)"
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
