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
- **JPEG** (``\\xff\\xd8\\xff`` magic): BASELINE sequential DCT (SOF0)
  and PROGRESSIVE DCT (SOF2, round 7 — spectral selection, successive
  approximation, EOB runs per T.81 Annex G), 8-bit, 1- or 3-component,
  arbitrary chroma subsampling factors and restart markers — pure
  NumPy Huffman + matrix IDCT. Arithmetic-coded / hierarchical /
  12-bit JPEGs raise. Matching minimal encoders
  (:func:`encode_jpeg_baseline`, :func:`encode_jpeg_progressive`)
  exist so tests can build real JPEG bytes without PIL.

Video still raises — a honest boundary, surfaced per-batch inside the
executors. All functions are deterministic, so pipelines built on them
stay oracle-checkable.
"""

from __future__ import annotations

import math
import struct
import zlib

import numpy as np

__all__ = [
    "UnsupportedImageError",
    "sniff_format",
    "decode_image",
    "resize_nearest",
    "encode_bmp",
    "encode_png",
    "encode_ppm",
    "decode_bmp",
    "decode_ppm",
    "decode_png",
    "decode_jpeg",
    "encode_jpeg_baseline",
]


def _malformed_guard(fn):
    """Convert the raw exceptions a malformed/truncated stream provokes
    inside a decoder (index/struct/key/overflow errors from garbage
    lengths and offsets) into :class:`UnsupportedImageError`, the typed
    error the multimodal executors quarantine per payload — one corrupt
    image in a 100 TB scan should surface as an unsupported payload,
    not kill the task with an inscrutable ``IndexError``."""
    import functools
    import zlib

    @functools.wraps(fn)
    def wrapped(data: bytes):
        try:
            return fn(data)
        except UnsupportedImageError:
            raise
        except (
            ValueError,
            IndexError,
            KeyError,
            OverflowError,
            StopIteration,
            struct.error,
            zlib.error,
        ) as ex:
            raise UnsupportedImageError(
                f"malformed {fn.__name__.removeprefix('decode_')} stream: "
                f"{type(ex).__name__}: {ex}"
            ) from ex

    return wrapped


class UnsupportedImageError(NotImplementedError):
    """Payload is not one of the pure-Python-decodable formats."""


# Decoded-size sanity cap (ADVICE r7): corrupt header dimension fields
# (JPEG SOF height/width, PNG IHDR, BMP biWidth/biHeight) must be
# quarantined as UnsupportedImageError BEFORE they drive unbounded
# numpy allocations — a corrupt payload declaring 65535×65535 would
# otherwise OOM the executor task instead of being skipped. 64 MP
# covers any sane training-corpus image; callers with genuinely larger
# inputs can raise the module attribute.
MAX_DECODE_PIXELS = 64_000_000


def _check_dims(width: int, height: int, fmt: str) -> None:
    if width <= 0 or height <= 0:
        raise UnsupportedImageError(f"bad {fmt} dimensions {width}x{height}")
    if width * height > MAX_DECODE_PIXELS:
        raise UnsupportedImageError(
            f"{fmt} dimensions {width}x{height} exceed the decode cap of "
            f"{MAX_DECODE_PIXELS} pixels (codecs.MAX_DECODE_PIXELS)"
        )


_PNG_SIG = b"\x89PNG\r\n\x1a\n"


def sniff_format(data: bytes) -> str:
    """'bmp' | 'ppm' | 'pgm' | 'png' | 'jpeg' | 'unknown' from magic."""
    if data[:8] == _PNG_SIG:
        return "png"
    if data[:3] == b"\xff\xd8\xff":
        return "jpeg"
    if len(data) >= 2:
        if data[:2] == b"BM":
            return "bmp"
        if data[:2] == b"P6":
            return "ppm"
        if data[:2] == b"P5":
            return "pgm"
    return "unknown"


@_malformed_guard
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
    if height == 0:
        raise UnsupportedImageError(f"bad dimensions {width}x{height}")
    _check_dims(width, abs(height), "BMP")
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


@_malformed_guard
def decode_ppm(data: bytes) -> np.ndarray:
    """Decode binary PPM (P6) / PGM (P5) into (H, W, 3) uint8 RGB."""
    magic = data[:2]
    if magic not in (b"P6", b"P5"):
        raise UnsupportedImageError("not a binary PPM/PGM payload")
    (width, height, maxval), off = _pnm_tokens(data, 3, 2)
    if maxval <= 0 or maxval > 255:
        raise UnsupportedImageError(f"PNM maxval {maxval} (8-bit only)")
    _check_dims(width, height, "PNM")
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


@_malformed_guard
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
    # cap BEFORE the zlib decompress: corrupt IHDR dims must not drive
    # a multi-GB inflate + unfilter allocation
    _check_dims(width, height, "PNG")
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


# ---------------------------------------------------------------------------
# JPEG — baseline sequential DCT (ITU-T T.81), stdlib + NumPy only
# ---------------------------------------------------------------------------

# zigzag scan order: index i of the scan holds block position _ZIGZAG[i]
_ZIGZAG = np.array(
    [
        0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
        12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
        35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
        58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63,
    ],
    dtype=np.int64,
)

# Annex K.1 example quantization tables (the de-facto standard ones)
_Q_LUM = np.array(
    [
        16, 11, 10, 16, 24, 40, 51, 61, 12, 12, 14, 19, 26, 58, 60, 55,
        14, 13, 16, 24, 40, 57, 69, 56, 14, 17, 22, 29, 51, 87, 80, 62,
        18, 22, 37, 56, 68, 109, 103, 77, 24, 35, 55, 64, 81, 104, 113, 92,
        49, 64, 78, 87, 103, 121, 120, 101, 72, 92, 95, 98, 112, 100, 103, 99,
    ],
    dtype=np.int64,
).reshape(8, 8)
_Q_CHROM = np.array(
    [
        17, 18, 24, 47, 99, 99, 99, 99, 18, 21, 26, 66, 99, 99, 99, 99,
        24, 26, 56, 99, 99, 99, 99, 99, 47, 66, 99, 99, 99, 99, 99, 99,
        99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99,
        99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99,
    ],
    dtype=np.int64,
).reshape(8, 8)

# Annex K.3 typical Huffman tables: (bits[1..16] counts, symbol values)
_HUFF_DC_LUM = (
    [0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0],
    list(range(12)),
)
_HUFF_DC_CHROM = (
    [0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0],
    list(range(12)),
)
_HUFF_AC_LUM = (
    [0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D],
    [
        0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12, 0x21, 0x31, 0x41,
        0x06, 0x13, 0x51, 0x61, 0x07, 0x22, 0x71, 0x14, 0x32, 0x81, 0x91,
        0xA1, 0x08, 0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0, 0x24,
        0x33, 0x62, 0x72, 0x82, 0x09, 0x0A, 0x16, 0x17, 0x18, 0x19, 0x1A,
        0x25, 0x26, 0x27, 0x28, 0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38,
        0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49, 0x4A, 0x53,
        0x54, 0x55, 0x56, 0x57, 0x58, 0x59, 0x5A, 0x63, 0x64, 0x65, 0x66,
        0x67, 0x68, 0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78, 0x79,
        0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89, 0x8A, 0x92, 0x93,
        0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5,
        0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6, 0xB7,
        0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7, 0xC8, 0xC9,
        0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1,
        0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF1, 0xF2,
        0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA,
    ],
)
_HUFF_AC_CHROM = (
    [0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 0x77],
    [
        0x00, 0x01, 0x02, 0x03, 0x11, 0x04, 0x05, 0x21, 0x31, 0x06, 0x12,
        0x41, 0x51, 0x07, 0x61, 0x71, 0x13, 0x22, 0x32, 0x81, 0x08, 0x14,
        0x42, 0x91, 0xA1, 0xB1, 0xC1, 0x09, 0x23, 0x33, 0x52, 0xF0, 0x15,
        0x62, 0x72, 0xD1, 0x0A, 0x16, 0x24, 0x34, 0xE1, 0x25, 0xF1, 0x17,
        0x18, 0x19, 0x1A, 0x26, 0x27, 0x28, 0x29, 0x2A, 0x35, 0x36, 0x37,
        0x38, 0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49, 0x4A,
        0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59, 0x5A, 0x63, 0x64, 0x65,
        0x66, 0x67, 0x68, 0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78,
        0x79, 0x7A, 0x82, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89, 0x8A,
        0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3,
        0xA4, 0xA5, 0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5,
        0xB6, 0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7,
        0xC8, 0xC9, 0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9,
        0xDA, 0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF2,
        0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA,
    ],
)

# orthonormal 8-point DCT-II basis: forward F = T @ x @ T.T, inverse
# x = T.T @ F @ T (IEEE doubles everywhere -> bit-deterministic)
_DCT_T = np.zeros((8, 8))
for _k in range(8):
    _c = math.sqrt(1.0 / 8.0) if _k == 0 else math.sqrt(2.0 / 8.0)
    for _n in range(8):
        _DCT_T[_k, _n] = _c * math.cos((2 * _n + 1) * _k * math.pi / 16.0)


def _huff_decode_table(bits: list[int], values: list[int]) -> dict[tuple[int, int], int]:
    """Canonical Huffman: map (code_length, code) -> symbol."""
    table, code, idx = {}, 0, 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            table[(length, code)] = values[idx]
            code += 1
            idx += 1
        code <<= 1
    return table


def _huff_encode_table(bits: list[int], values: list[int]) -> dict[int, tuple[int, int]]:
    """Canonical Huffman: map symbol -> (code, code_length)."""
    out, code, idx = {}, 0, 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            out[values[idx]] = (code, length)
            code += 1
            idx += 1
        code <<= 1
    return out


class _BitReader:
    """MSB-first bit reader over the entropy-coded segment, handling
    0xFF00 byte stuffing; raises on an unexpected marker."""

    def __init__(self, data: bytes, pos: int):
        self.data, self.pos = data, pos
        self.buf, self.nbits = 0, 0

    def read_bit(self) -> int:
        if self.nbits == 0:
            if self.pos >= len(self.data):
                raise UnsupportedImageError("truncated JPEG entropy stream")
            b = self.data[self.pos]
            self.pos += 1
            if b == 0xFF:
                nxt = self.data[self.pos] if self.pos < len(self.data) else None
                if nxt == 0x00:
                    self.pos += 1
                else:
                    raise UnsupportedImageError(
                        f"unexpected marker 0xFF{nxt:02X} inside entropy data"
                    )
            self.buf, self.nbits = b, 8
        self.nbits -= 1
        return (self.buf >> self.nbits) & 1

    def read_bits(self, n: int) -> int:
        v = 0
        for _ in range(n):
            v = (v << 1) | self.read_bit()
        return v

    def receive_extend(self, s: int) -> int:
        if s == 0:
            return 0
        v = self.read_bits(s)
        return v if v >= (1 << (s - 1)) else v - (1 << s) + 1

    def align_to_marker(self) -> int:
        """Byte-align and consume one RSTn marker; returns n."""
        self.nbits = 0
        if (
            self.pos + 1 < len(self.data)
            and self.data[self.pos] == 0xFF
            and 0xD0 <= self.data[self.pos + 1] <= 0xD7
        ):
            n = self.data[self.pos + 1] - 0xD0
            self.pos += 2
            return n
        raise UnsupportedImageError("expected JPEG restart marker")

    def decode_symbol(self, table: dict[tuple[int, int], int]) -> int:
        code, length = 0, 0
        while length < 16:
            code = (code << 1) | self.read_bit()
            length += 1
            sym = table.get((length, code))
            if sym is not None:
                return sym
        raise UnsupportedImageError("invalid JPEG Huffman code")


@_malformed_guard
def decode_jpeg(data: bytes) -> np.ndarray:
    """Decode a BASELINE (SOF0) or PROGRESSIVE (SOF2) 8-bit Huffman
    JPEG into (H, W, 3) uint8 RGB — stdlib + NumPy only. Supports 1 or
    3 components, any h/v sampling factors (4:4:4 / 4:2:2 / 4:2:0 ...)
    with nearest upsampling, DRI/RSTn restart intervals, and for
    progressive streams the full T.81 Annex G Huffman feature set:
    spectral selection, successive approximation (DC and AC first +
    refinement passes), EOB runs, and interleaved or single-component
    DC scans. Arithmetic coding, hierarchical/lossless SOFs, and
    12-bit precision raise UnsupportedImageError."""
    if data[:3] != b"\xff\xd8\xff":
        raise UnsupportedImageError("not a JPEG payload")
    pos = 2
    qt: dict[int, np.ndarray] = {}
    huff_dc: dict[int, dict] = {}
    huff_ac: dict[int, dict] = {}
    comps: list[dict] = []
    width = height = 0
    restart_interval = 0
    progressive = False
    allocated = False
    while pos + 2 <= len(data):
        if data[pos] != 0xFF:
            raise UnsupportedImageError(f"bad JPEG marker alignment at {pos}")
        marker = data[pos + 1]
        pos += 2
        if marker in (0xD8, 0x01) or 0xD0 <= marker <= 0xD7:
            continue  # parameterless
        if marker == 0xD9:  # EOI
            break
        if pos + 2 > len(data):
            break
        (seglen,) = struct.unpack_from(">H", data, pos)
        body = data[pos + 2 : pos + seglen]
        if marker == 0xC4:  # DHT
            i = 0
            while i < len(body):
                tc_th = body[i]
                bits = list(body[i + 1 : i + 17])
                nvals = sum(bits)
                vals = list(body[i + 17 : i + 17 + nvals])
                table = _huff_decode_table(bits, vals)
                (huff_dc if tc_th >> 4 == 0 else huff_ac)[tc_th & 0xF] = table
                i += 17 + nvals
        elif marker == 0xDB:  # DQT
            i = 0
            while i < len(body):
                pq_tq = body[i]
                if pq_tq >> 4 != 0:
                    raise UnsupportedImageError("16-bit JPEG quant table")
                tbl = np.zeros(64, dtype=np.int64)
                tbl[_ZIGZAG] = np.frombuffer(body[i + 1 : i + 65], dtype=np.uint8)
                qt[pq_tq & 0xF] = tbl.reshape(8, 8)
                i += 65
        elif marker in (0xC0, 0xC2):  # SOF0 baseline / SOF2 progressive
            progressive = marker == 0xC2
            precision, height, width, ncomp = struct.unpack_from(">BHHB", body, 0)
            if precision != 8:
                raise UnsupportedImageError(f"{precision}-bit JPEG (8-bit only)")
            # cap BEFORE any coefficient-grid allocation: a corrupt SOF
            # declaring 65535x65535 would otherwise allocate multi-GB
            # int64 arrays per component and OOM the task
            _check_dims(width, height, "JPEG")
            for c in range(ncomp):
                cid, hv, tq = struct.unpack_from(">BBB", body, 6 + 3 * c)
                h, v = hv >> 4, hv & 0xF
                if not (1 <= h <= 4 and 1 <= v <= 4):
                    raise UnsupportedImageError(
                        f"JPEG sampling factors {h}x{v} out of the T.81 "
                        "1..4 range — corrupt SOF"
                    )
                comps.append({"id": cid, "h": h, "v": v, "tq": tq})
        elif marker in (0xC1, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB):
            raise UnsupportedImageError(
                f"unsupported JPEG SOF marker 0xFF{marker:02X} (baseline "
                "SOF0 and progressive SOF2 only)"
            )
        elif marker == 0xDD:  # DRI
            (restart_interval,) = struct.unpack_from(">H", body, 0)
        elif marker == 0xDA:  # SOS — entropy data follows
            ns = body[0]
            order = []
            for c in range(ns):
                cs, td_ta = struct.unpack_from(">BB", body, 1 + 2 * c)
                comp = next(x for x in comps if x["id"] == cs)
                comp["dc"] = huff_dc.get(td_ta >> 4)
                comp["ac"] = huff_ac.get(td_ta & 0xF)
                order.append(comp)
            if not progressive:
                for comp in order:
                    if comp["dc"] is None or comp["ac"] is None:
                        raise UnsupportedImageError("missing JPEG Huffman table")
                pos += seglen
                return _jpeg_scan(data, pos, order, qt, width, height, restart_interval)
            ss, se, ah_al = body[1 + 2 * ns], body[2 + 2 * ns], body[3 + 2 * ns]
            ah, al = ah_al >> 4, ah_al & 0xF
            if not allocated:
                if not comps or width <= 0 or height <= 0:
                    raise UnsupportedImageError("JPEG scan before a valid SOF")
                hmax = max(c["h"] for c in comps)
                vmax = max(c["v"] for c in comps)
                mcus_x = -(-width // (8 * hmax))
                mcus_y = -(-height // (8 * vmax))
                for c in comps:
                    c["coef"] = np.zeros(
                        (mcus_y * c["v"], mcus_x * c["h"], 64), dtype=np.int64
                    )
                    # non-interleaved block grid (T.81 A.2.2): covers
                    # the component's OWN ceil dimensions, which can be
                    # smaller than the MCU-padded grid above
                    cw_px = -(-(width * c["h"]) // hmax)
                    ch_px = -(-(height * c["v"]) // vmax)
                    c["bw"] = -(-cw_px // 8)
                    c["bh"] = -(-ch_px // 8)
                allocated = True
            pos = _jpeg_progressive_scan(
                data, pos + seglen, order, ss, se, ah, al,
                restart_interval, mcus_x, mcus_y,
            )
            continue
        pos += seglen
    if progressive and allocated:
        return _jpeg_reconstruct(comps, qt, width, height)
    raise UnsupportedImageError("JPEG has no SOS scan")


def _jpeg_progressive_scan(
    data, pos, scomps, ss, se, ah, al, restart_interval, mcus_x, mcus_y
):
    """Decode ONE progressive scan into the components' coefficient
    arrays (zigzag order); returns the byte offset of the next marker.
    Implements T.81 G.1.2: DC first/refine (interleaved or single-
    component), AC first/refine with EOB runs — all coefficient
    updates in the successive-approximation bit arithmetic (two's
    complement OR for DC bits, ±1<<Al magnitude growth for AC)."""
    r = _BitReader(data, pos)
    p1 = 1 << al

    def _refine_nonzero(coef, idx):
        # correction bit for a history-nonzero coefficient
        if r.read_bit() and (int(coef[idx]) & p1) == 0:
            coef[idx] += p1 if coef[idx] >= 0 else -p1

    if ss == 0:  # DC scan
        if se != 0:
            raise UnsupportedImageError("JPEG DC scan with Se != 0")
        for c in scomps:
            c["pred"] = 0
        if c_interleaved := len(scomps) > 1:
            total_units = mcus_x * mcus_y
        else:
            c0 = scomps[0]
            total_units = c0["bw"] * c0["bh"]
        n = 0
        for u in range(total_units):
            if restart_interval and n and n % restart_interval == 0:
                r.align_to_marker()
                for c in scomps:
                    c["pred"] = 0
            n += 1
            if c_interleaved:
                my, mx = divmod(u, mcus_x)
                blocks = [
                    (c, my * c["v"] + by, mx * c["h"] + bx)
                    for c in scomps
                    for by in range(c["v"])
                    for bx in range(c["h"])
                ]
            else:
                by, bx = divmod(u, scomps[0]["bw"])
                blocks = [(scomps[0], by, bx)]
            for c, by, bx in blocks:
                coef = c["coef"][by, bx]
                if ah == 0:
                    if c["dc"] is None:
                        raise UnsupportedImageError("missing JPEG DC table")
                    s = r.decode_symbol(c["dc"])
                    c["pred"] += r.receive_extend(s)
                    coef[0] = c["pred"] << al
                else:
                    if r.read_bit():
                        coef[0] = int(coef[0]) | p1
    else:  # AC scan: always a single component (T.81 B.2.3)
        if len(scomps) != 1:
            raise UnsupportedImageError("interleaved progressive AC scan")
        c = scomps[0]
        if c["ac"] is None:
            raise UnsupportedImageError("missing JPEG AC table")
        ac = c["ac"]
        eobrun = 0
        n = 0
        for u in range(c["bw"] * c["bh"]):
            if restart_interval and n and n % restart_interval == 0:
                r.align_to_marker()
                eobrun = 0
            n += 1
            by, bx = divmod(u, c["bw"])
            coef = c["coef"][by, bx]
            if ah == 0:  # first pass for these bits
                if eobrun > 0:
                    eobrun -= 1
                    continue
                k = ss
                while k <= se:
                    rs = r.decode_symbol(ac)
                    run, size = rs >> 4, rs & 0xF
                    if size == 0:
                        if run == 15:  # ZRL
                            k += 16
                            continue
                        eobrun = (1 << run) - 1
                        if run:
                            eobrun += r.read_bits(run)
                        break
                    k += run
                    if k > se:
                        raise UnsupportedImageError("JPEG AC index overflow")
                    coef[k] = r.receive_extend(size) << al
                    k += 1
            else:  # refinement pass (G.1.2.3)
                k = ss
                if eobrun == 0:
                    while k <= se:
                        rs = r.decode_symbol(ac)
                        run, size = rs >> 4, rs & 0xF
                        val = 0
                        if size == 0:
                            if run != 15:
                                eobrun = 1 << run
                                if run:
                                    eobrun += r.read_bits(run)
                                break
                            # ZRL: skip 16 zero-history positions
                        else:
                            if size != 1:
                                raise UnsupportedImageError(
                                    "JPEG AC refinement size != 1"
                                )
                            val = p1 if r.read_bit() else -p1
                        while k <= se:
                            if coef[k]:
                                _refine_nonzero(coef, k)
                            else:
                                if run == 0:
                                    break
                                run -= 1
                            k += 1
                        if val and k <= se:
                            coef[k] = val
                        k += 1
                if eobrun > 0:
                    while k <= se:
                        if coef[k]:
                            _refine_nonzero(coef, k)
                        k += 1
                    eobrun -= 1
    # locate the next marker (skip stuffed 0xFF00 and any stray fill)
    p = r.pos
    while p + 1 < len(data) and not (
        data[p] == 0xFF and data[p + 1] not in (0x00,) and not (0xD0 <= data[p + 1] <= 0xD7)
    ):
        p += 1
    return p


def _jpeg_reconstruct(comps, qt, width, height):
    """Dequantize + IDCT the accumulated progressive coefficients and
    assemble RGB — batched einsum over all blocks per component."""
    hmax = max(c["h"] for c in comps)
    vmax = max(c["v"] for c in comps)
    planes = []
    for c in comps:
        if c["tq"] not in qt:
            raise UnsupportedImageError(f"missing JPEG quant table {c['tq']}")
        q = qt[c["tq"]].astype(np.float64)
        ch, cw = c["coef"].shape[:2]
        full = np.zeros((ch, cw, 64))
        full[:, :, _ZIGZAG] = c["coef"]
        blocks = full.reshape(ch, cw, 8, 8) * q[None, None]
        px = np.einsum("ij,abjk,kl->abil", _DCT_T.T, blocks, _DCT_T) + 128.0
        plane = px.transpose(0, 2, 1, 3).reshape(ch * 8, cw * 8)
        plane = np.repeat(
            np.repeat(plane, vmax // c["v"], axis=0), hmax // c["h"], axis=1
        )
        planes.append(plane[:height, :width])
    if len(planes) == 1:
        y = np.clip(np.round(planes[0]), 0, 255).astype(np.uint8)
        return np.ascontiguousarray(np.repeat(y[:, :, None], 3, axis=2))
    if len(planes) != 3:
        raise UnsupportedImageError(f"{len(planes)}-component JPEG (1 or 3 only)")
    y, cb, cr = planes[0], planes[1] - 128.0, planes[2] - 128.0
    rgb = np.stack(
        [
            y + 1.402 * cr,
            y - 0.344136 * cb - 0.714136 * cr,
            y + 1.772 * cb,
        ],
        axis=2,
    )
    return np.ascontiguousarray(np.clip(np.round(rgb), 0, 255).astype(np.uint8))


def _jpeg_scan(data, pos, comps, qt, width, height, restart_interval):
    if not comps or width <= 0 or height <= 0:
        raise UnsupportedImageError("JPEG scan before a valid SOF0")
    hmax = max(c["h"] for c in comps)
    vmax = max(c["v"] for c in comps)
    mcu_w, mcu_h = 8 * hmax, 8 * vmax
    mcus_x = (width + mcu_w - 1) // mcu_w
    mcus_y = (height + mcu_h - 1) // mcu_h
    for c in comps:
        c["plane"] = np.zeros((mcus_y * 8 * c["v"], mcus_x * 8 * c["h"]))
        c["pred"] = 0
        if c["tq"] not in qt:
            raise UnsupportedImageError(f"missing JPEG quant table {c['tq']}")
    r = _BitReader(data, pos)
    Tt = _DCT_T.T
    mcu_count = 0
    for my in range(mcus_y):
        for mx in range(mcus_x):
            if restart_interval and mcu_count and mcu_count % restart_interval == 0:
                r.align_to_marker()
                for c in comps:
                    c["pred"] = 0
            mcu_count += 1
            for c in comps:
                q = qt[c["tq"]]
                for by in range(c["v"]):
                    for bx in range(c["h"]):
                        coef = np.zeros(64)
                        s = r.decode_symbol(c["dc"])
                        c["pred"] += r.receive_extend(s)
                        coef[0] = c["pred"]
                        k = 1
                        while k < 64:
                            rs = r.decode_symbol(c["ac"])
                            run, size = rs >> 4, rs & 0xF
                            if size == 0:
                                if run == 15:  # ZRL
                                    k += 16
                                    continue
                                break  # EOB
                            k += run
                            if k > 63:
                                raise UnsupportedImageError("JPEG AC index overflow")
                            coef[k] = r.receive_extend(size)
                            k += 1
                        block = np.zeros(64)
                        block[_ZIGZAG] = coef
                        block = block.reshape(8, 8) * q
                        px = Tt @ block @ _DCT_T + 128.0
                        y0 = (my * c["v"] + by) * 8
                        x0 = (mx * c["h"] + bx) * 8
                        c["plane"][y0 : y0 + 8, x0 : x0 + 8] = px
    planes = []
    for c in comps:
        p = c["plane"]
        p = np.repeat(np.repeat(p, vmax // c["v"], axis=0), hmax // c["h"], axis=1)
        planes.append(p[:height, :width])
    if len(planes) == 1:
        y = np.clip(np.round(planes[0]), 0, 255).astype(np.uint8)
        return np.ascontiguousarray(np.repeat(y[:, :, None], 3, axis=2))
    if len(planes) != 3:
        raise UnsupportedImageError(f"{len(planes)}-component JPEG (1 or 3 only)")
    y, cb, cr = planes[0], planes[1] - 128.0, planes[2] - 128.0
    rgb = np.stack(
        [
            y + 1.402 * cr,
            y - 0.344136 * cb - 0.714136 * cr,
            y + 1.772 * cb,
        ],
        axis=2,
    )
    return np.ascontiguousarray(np.clip(np.round(rgb), 0, 255).astype(np.uint8))


class _BitWriter:
    def __init__(self):
        self.out = bytearray()
        self.buf, self.nbits = 0, 0

    def write(self, code: int, length: int) -> None:
        for i in range(length - 1, -1, -1):
            self.buf = (self.buf << 1) | ((code >> i) & 1)
            self.nbits += 1
            if self.nbits == 8:
                self.out.append(self.buf)
                if self.buf == 0xFF:
                    self.out.append(0x00)  # byte stuffing
                self.buf, self.nbits = 0, 0

    def flush(self) -> None:
        while self.nbits:  # pad with 1s per spec
            self.write(1, 1)


def _jpeg_category(v: int) -> int:
    return int(v).bit_length() if v >= 0 else int(-v).bit_length()


def _write_coef_block(wtr, zz, pred, enc_dc, enc_ac):
    """Entropy-code one zigzagged quantized block; returns new DC pred."""
    diff = int(zz[0]) - pred
    s = _jpeg_category(diff)
    wtr.write(*enc_dc[s])
    if s:
        wtr.write(diff if diff >= 0 else diff + (1 << s) - 1, s)
    run = 0
    nz = np.nonzero(zz[1:])[0]
    last = nz[-1] + 1 if nz.size else 0
    for k in range(1, last + 1):
        v = int(zz[k])
        if v == 0:
            run += 1
            continue
        while run > 15:
            wtr.write(*enc_ac[0xF0])
            run -= 16
        s = _jpeg_category(v)
        wtr.write(*enc_ac[(run << 4) | s])
        wtr.write(v if v >= 0 else v + (1 << s) - 1, s)
        run = 0
    if last < 63:
        wtr.write(*enc_ac[0x00])
    return int(zz[0])


def _quantize_block(plane, y0, x0, q):
    block = plane[y0 : y0 + 8, x0 : x0 + 8] - 128.0
    coef = _DCT_T @ block @ _DCT_T.T
    # round half away from zero: platform-stable, matches libjpeg
    qz = np.sign(coef / q) * np.floor(np.abs(coef / q) + 0.5)
    return qz.reshape(-1)[_ZIGZAG].astype(np.int64)


def _jpeg_seg(marker: int, body: bytes) -> bytes:
    return bytes([0xFF, marker]) + struct.pack(">H", len(body) + 2) + body


def _jpeg_dqt(tid: int, q: np.ndarray) -> bytes:
    return _jpeg_seg(0xDB, bytes([tid]) + bytes(q.reshape(-1)[_ZIGZAG].astype(np.uint8)))


def _jpeg_dht(tc: int, th: int, tbl) -> bytes:
    bits, vals = tbl
    return _jpeg_seg(0xC4, bytes([(tc << 4) | th] + bits + vals))


def _encode_jpeg_gray(yp, h, w, q_lum, restart_interval):
    yp = np.pad(yp, ((0, -h % 8), (0, -w % 8)), mode="edge")
    enc_dc = _huff_encode_table(*_HUFF_DC_LUM)
    enc_ac = _huff_encode_table(*_HUFF_AC_LUM)
    wtr = _BitWriter()
    pred = 0
    n = 0
    for my in range(yp.shape[0] // 8):
        for mx in range(yp.shape[1] // 8):
            if restart_interval and n and n % restart_interval == 0:
                wtr.flush()
                wtr.out += bytes([0xFF, 0xD0 + (n // restart_interval - 1) % 8])
                pred = 0
            n += 1
            zz = _quantize_block(yp, my * 8, mx * 8, q_lum)
            pred = _write_coef_block(wtr, zz, pred, enc_dc, enc_ac)
    wtr.flush()
    sof = _jpeg_seg(0xC0, struct.pack(">BHHB", 8, h, w, 1) + bytes([1, 0x11, 0]))
    sos = _jpeg_seg(0xDA, bytes([1, 1, 0x00, 0, 63, 0]))
    dri = _jpeg_seg(0xDD, struct.pack(">H", restart_interval)) if restart_interval else b""
    return (
        b"\xff\xd8"
        + dri
        + _jpeg_dqt(0, q_lum)
        + _jpeg_dht(0, 0, _HUFF_DC_LUM)
        + _jpeg_dht(1, 0, _HUFF_AC_LUM)
        + sof
        + sos
        + bytes(wtr.out)
        + b"\xff\xd9"
    )


def encode_jpeg_baseline(
    img: np.ndarray,
    quality: int = 75,
    subsample: bool = False,
    restart_interval: int = 0,
    grayscale: bool = False,
) -> bytes:
    """Minimal BASELINE JPEG encoder ((H, W, 3) uint8 RGB -> bytes):
    Annex K quant tables scaled by ``quality`` (IJG formula), Annex K
    typical Huffman tables, 4:4:4 by default or 4:2:0 with
    ``subsample=True``; ``restart_interval`` > 0 emits DRI + RSTn
    markers every that many MCUs; ``grayscale=True`` writes a
    1-component (luma-only) JPEG. Exists so the multimodal tests can
    hand-build real JPEG payloads without PIL; pairs with
    :func:`decode_jpeg`."""
    if img.ndim != 3 or img.shape[2] != 3 or img.dtype != np.uint8:
        raise ValueError(f"need (H, W, 3) uint8, got {img.shape} {img.dtype}")
    if not 1 <= quality <= 100:
        raise ValueError(f"quality must be in [1, 100], got {quality}")
    h, w = img.shape[:2]
    scale = 5000 // quality if quality < 50 else 200 - 2 * quality
    q_lum = np.clip((_Q_LUM * scale + 50) // 100, 1, 255)
    q_chrom = np.clip((_Q_CHROM * scale + 50) // 100, 1, 255)

    f = img.astype(np.float64)
    yp = 0.299 * f[:, :, 0] + 0.587 * f[:, :, 1] + 0.114 * f[:, :, 2]
    cb = -0.168736 * f[:, :, 0] - 0.331264 * f[:, :, 1] + 0.5 * f[:, :, 2] + 128.0
    cr = 0.5 * f[:, :, 0] - 0.418688 * f[:, :, 1] - 0.081312 * f[:, :, 2] + 128.0

    if grayscale:
        if subsample:
            raise ValueError("subsample is meaningless for grayscale JPEG")
        return _encode_jpeg_gray(yp, h, w, q_lum, restart_interval)

    if subsample:
        hs, vs = 2, 2
        ph, pw = -h % 2, -w % 2
        cbp = np.pad(cb, ((0, ph), (0, pw)), mode="edge")
        crp = np.pad(cr, ((0, ph), (0, pw)), mode="edge")
        cb = (cbp[0::2, 0::2] + cbp[1::2, 0::2] + cbp[0::2, 1::2] + cbp[1::2, 1::2]) / 4.0
        cr = (crp[0::2, 0::2] + crp[1::2, 0::2] + crp[0::2, 1::2] + crp[1::2, 1::2]) / 4.0
    else:
        hs = vs = 1

    def pad_to(p, mult):
        return np.pad(
            p, ((0, -p.shape[0] % mult), (0, -p.shape[1] % mult)), mode="edge"
        )

    yp = pad_to(yp, 8 * vs)
    cb, cr = pad_to(cb, 8), pad_to(cr, 8)

    enc_dc = [_huff_encode_table(*_HUFF_DC_LUM), _huff_encode_table(*_HUFF_DC_CHROM)]
    enc_ac = [_huff_encode_table(*_HUFF_AC_LUM), _huff_encode_table(*_HUFF_AC_CHROM)]
    wtr = _BitWriter()
    pred = [0, 0, 0]

    def write_block(plane, y0, x0, q, ci):
        t = 0 if ci == 0 else 1
        zz = _quantize_block(plane, y0, x0, q)
        pred[ci] = _write_coef_block(wtr, zz, pred[ci], enc_dc[t], enc_ac[t])

    mcus_y, mcus_x = yp.shape[0] // (8 * vs), yp.shape[1] // (8 * hs)
    mcu_count = 0
    for my in range(mcus_y):
        for mx in range(mcus_x):
            if restart_interval and mcu_count and mcu_count % restart_interval == 0:
                wtr.flush()
                wtr.out += bytes([0xFF, 0xD0 + (mcu_count // restart_interval - 1) % 8])
                pred[0] = pred[1] = pred[2] = 0
            mcu_count += 1
            for by in range(vs):
                for bx in range(hs):
                    write_block(yp, (my * vs + by) * 8, (mx * hs + bx) * 8, q_lum, 0)
            write_block(cb, my * 8, mx * 8, q_chrom, 1)
            write_block(cr, my * 8, mx * 8, q_chrom, 2)
    wtr.flush()

    sof = _jpeg_seg(
        0xC0,
        struct.pack(">BHHB", 8, h, w, 3)
        + bytes([1, (hs << 4) | vs, 0, 2, 0x11, 1, 3, 0x11, 1]),
    )
    sos = _jpeg_seg(0xDA, bytes([3, 1, 0x00, 2, 0x11, 3, 0x11, 0, 63, 0]))
    dri = (
        _jpeg_seg(0xDD, struct.pack(">H", restart_interval))
        if restart_interval
        else b""
    )
    return (
        b"\xff\xd8"
        + dri
        + _jpeg_dqt(0, q_lum)
        + _jpeg_dqt(1, q_chrom)
        + _jpeg_dht(0, 0, _HUFF_DC_LUM)
        + _jpeg_dht(0, 1, _HUFF_DC_CHROM)
        + _jpeg_dht(1, 0, _HUFF_AC_LUM)
        + _jpeg_dht(1, 1, _HUFF_AC_CHROM)
        + sof
        + sos
        + bytes(wtr.out)
        + b"\xff\xd9"
    )


# flat AC Huffman table for progressive scans: every valid RRRRSSSS
# symbol (incl. the EOBn codes 0x10..0xE0 that Annex K's typical tables
# lack) at code length 9 — canonical, Kraft-satisfying, shared by
# encoder and decoder through the same DHT segment
_PROG_AC_SYMS = sorted(
    {(run << 4) | size for run in range(16) for size in range(11)}
)
_HUFF_AC_PROG = (
    [0, 0, 0, 0, 0, 0, 0, 0, len(_PROG_AC_SYMS), 0, 0, 0, 0, 0, 0, 0],
    _PROG_AC_SYMS,
)


def encode_jpeg_progressive(
    img: np.ndarray,
    quality: int = 75,
    subsample: bool = False,
    grayscale: bool = False,
    scan_script: str = "two_band",
) -> bytes:
    """Minimal PROGRESSIVE (SOF2) JPEG encoder — the test-fixture
    counterpart of :func:`decode_jpeg`'s progressive path, exercising
    every Annex G Huffman feature: an interleaved DC first scan at
    Al=1, AC first scans with EOB-run accumulation, AC refinement
    scans (correction bits + newly-nonzero coefficients), and a DC
    refinement scan (raw bits). Two scan scripts (ADVICE r7 — the
    single-stage script left the chained-refinement decode path
    without a fixture):

    - ``"two_band"``: per-component AC in two spectral bands (1–5,
      6–63) at Al=1, one refinement stage Ah=1 → Al=0.
    - ``"libjpeg"``: libjpeg's default script (jcparam.c) — luma AC
      descends Al=2 → (Ah=2, Al=1) → (Ah=1, Al=0), a chained
      TWO-stage successive approximation with the DC completion scan
      interleaved mid-sequence; the shape real-world progressive
      JPEGs overwhelmingly carry.

    Quantized coefficients are identical to
    :func:`encode_jpeg_baseline` at the same quality/sampling, so
    decoding both must give IDENTICAL pixels — the round-trip test's
    oracle for either script. No restart intervals (the RSTn logic is
    shared with, and covered by, the baseline path)."""
    if img.ndim != 3 or img.shape[2] != 3 or img.dtype != np.uint8:
        raise ValueError(f"need (H, W, 3) uint8, got {img.shape} {img.dtype}")
    if not 1 <= quality <= 100:
        raise ValueError(f"quality must be in [1, 100], got {quality}")
    h, w = img.shape[:2]
    scale = 5000 // quality if quality < 50 else 200 - 2 * quality
    q_lum = np.clip((_Q_LUM * scale + 50) // 100, 1, 255)
    q_chrom = np.clip((_Q_CHROM * scale + 50) // 100, 1, 255)

    f = img.astype(np.float64)
    yp = 0.299 * f[:, :, 0] + 0.587 * f[:, :, 1] + 0.114 * f[:, :, 2]
    cb = -0.168736 * f[:, :, 0] - 0.331264 * f[:, :, 1] + 0.5 * f[:, :, 2] + 128.0
    cr = 0.5 * f[:, :, 0] - 0.418688 * f[:, :, 1] - 0.081312 * f[:, :, 2] + 128.0

    if grayscale and subsample:
        raise ValueError("subsample is meaningless for grayscale JPEG")
    hs = vs = 2 if (subsample and not grayscale) else 1
    if subsample and not grayscale:
        ph, pw = -h % 2, -w % 2
        cbp = np.pad(cb, ((0, ph), (0, pw)), mode="edge")
        crp = np.pad(cr, ((0, ph), (0, pw)), mode="edge")
        cb = (cbp[0::2, 0::2] + cbp[1::2, 0::2] + cbp[0::2, 1::2] + cbp[1::2, 1::2]) / 4.0
        cr = (crp[0::2, 0::2] + crp[1::2, 0::2] + crp[0::2, 1::2] + crp[1::2, 1::2]) / 4.0

    def pad_to(p, mult):
        return np.pad(p, ((0, -p.shape[0] % mult), (0, -p.shape[1] % mult)), mode="edge")

    hmax, vmax = hs, vs
    if grayscale:
        planes = [(pad_to(yp, 8), q_lum, 1, 1)]
    else:
        planes = [
            (pad_to(yp, 8 * vs), q_lum, hs, vs),
            (pad_to(cb, 8), q_chrom, 1, 1),
            (pad_to(cr, 8), q_chrom, 1, 1),
        ]
    mcus_x = planes[0][0].shape[1] // (8 * hs)
    mcus_y = planes[0][0].shape[0] // (8 * vs)

    # quantized zigzag coefficients for every block (MCU-padded grid),
    # plus the smaller non-interleaved grid dims for the AC scans
    comps = []
    for ci, (plane, q, chh, cv) in enumerate(planes):
        gh, gw = plane.shape[0] // 8, plane.shape[1] // 8
        coef = np.zeros((gh, gw, 64), dtype=np.int64)
        for by in range(gh):
            for bx in range(gw):
                coef[by, bx] = _quantize_block(plane, by * 8, bx * 8, q)
        cw_px = -(-(w * chh) // hmax)
        ch_px = -(-(h * cv) // vmax)
        comps.append(
            {
                "coef": coef,
                "h": chh,
                "v": cv,
                "bw": -(-cw_px // 8),
                "bh": -(-ch_px // 8),
                "tq": 0 if ci == 0 else 1,
                "dc_tbl": 0 if ci == 0 else 1,
            }
        )

    enc_dc = [_huff_encode_table(*_HUFF_DC_LUM), _huff_encode_table(*_HUFF_DC_CHROM)]
    enc_ac = _huff_encode_table(*_HUFF_AC_PROG)

    def sos_header(comp_ids, tables, ss, se, ah, al):
        body = bytes([len(comp_ids)])
        for cid, t in zip(comp_ids, tables):
            body += bytes([cid, t])
        return _jpeg_seg(0xDA, body + bytes([ss, se, (ah << 4) | al]))

    def mcu_blocks():
        for my in range(mcus_y):
            for mx in range(mcus_x):
                for ci, c in enumerate(comps):
                    for by in range(c["v"]):
                        for bx in range(c["h"]):
                            yield ci, my * c["v"] + by, mx * c["h"] + bx

    scans = []

    # --- DC first scan (interleaved, Al=1) ------------------------------
    def dc_first():
        wtr = _BitWriter()
        pred = [0] * len(comps)
        for ci, by, bx in mcu_blocks():
            v = int(comps[ci]["coef"][by, bx, 0]) >> 1  # arithmetic point transform
            diff = v - pred[ci]
            pred[ci] = v
            s = _jpeg_category(diff)
            wtr.write(*enc_dc[comps[ci]["dc_tbl"]][s])
            if s:
                wtr.write(diff if diff >= 0 else diff + (1 << s) - 1, s)
        wtr.flush()
        return (
            sos_header(
                [ci + 1 for ci in range(len(comps))],
                [c["dc_tbl"] << 4 for c in comps],
                0, 0, 0, 1,
            ),
            bytes(wtr.out),
        )

    # --- AC first scans: two spectral bands per component, Al=1 ---------
    def ac_first(ci, ss, se, al):
        c = comps[ci]
        wtr = _BitWriter()
        eobrun = 0

        def flush_eob():
            nonlocal eobrun
            if eobrun:
                rr = eobrun.bit_length() - 1
                wtr.write(*enc_ac[rr << 4])
                if rr:
                    wtr.write(eobrun - (1 << rr), rr)
                eobrun = 0

        for u in range(c["bw"] * c["bh"]):
            by, bx = divmod(u, c["bw"])
            zz = c["coef"][by, bx]
            # truncate-toward-zero point transform (T.81 G.1.2.2)
            vals = [int(np.fix(zz[k] / (1 << al))) for k in range(ss, se + 1)]
            if not any(vals):
                eobrun += 1
                if eobrun == 32767:
                    flush_eob()
                continue
            flush_eob()
            run = 0
            last_nz = max(i for i, v in enumerate(vals) if v)
            for i, v in enumerate(vals[: last_nz + 1]):
                if v == 0:
                    run += 1
                    continue
                while run > 15:
                    wtr.write(*enc_ac[0xF0])
                    run -= 16
                s = _jpeg_category(v)
                wtr.write(*enc_ac[(run << 4) | s])
                wtr.write(v if v >= 0 else v + (1 << s) - 1, s)
                run = 0
            if last_nz < len(vals) - 1:
                eobrun += 1
                if eobrun == 32767:
                    flush_eob()
        flush_eob()
        wtr.flush()
        return (sos_header([ci + 1], [0], ss, se, 0, al), bytes(wtr.out))

    # --- AC refinement scans: Ah=1 -> Al=0 ------------------------------
    def ac_refine(ci, ss, se, ah, al):
        c = comps[ci]
        wtr = _BitWriter()
        eobrun = 0
        pending_bits: list = []

        def flush_eob():
            nonlocal eobrun
            if eobrun:
                rr = eobrun.bit_length() - 1
                wtr.write(*enc_ac[rr << 4])
                if rr:
                    wtr.write(eobrun - (1 << rr), rr)
                eobrun = 0
            for b in pending_bits:
                wtr.write(b, 1)
            pending_bits.clear()

        for u in range(c["bw"] * c["bh"]):
            by, bx = divmod(u, c["bw"])
            zz = c["coef"][by, bx]
            absv = [abs(int(zz[k])) for k in range(ss, se + 1)]
            t = [a >> al for a in absv]
            hist = [a >> ah for a in absv]
            run = 0
            br: list = []
            wrote = False
            for i in range(len(t)):
                if t[i] == 0:
                    run += 1
                    if run == 16:
                        # EAGER ZRL: emitted the moment 16 zero-history
                        # positions accumulate, so the correction bits
                        # in ``br`` are exactly the ones interleaved
                        # within this 16-zero span — the decoder reads
                        # them in position order during the ZRL skip.
                        # (A retroactive flush at the next nonzero can
                        # place corrections beyond the span after the
                        # ZRL, which the decoder would misread as the
                        # next Huffman symbol. Trailing ZRLs folded
                        # into no EOB are wasteful but valid.)
                        flush_eob()
                        wtr.write(*enc_ac[0xF0])
                        for b in br:
                            wtr.write(b, 1)
                        br.clear()
                        run = 0
                        wrote = True
                    continue
                if hist[i] != 0:
                    br.append(t[i] & 1)
                    continue
                # newly nonzero at this precision (t[i] == 1)
                flush_eob()
                wtr.write(*enc_ac[(run << 4) | 1])
                wtr.write(1 if zz[ss + i] > 0 else 0, 1)
                for b in br:
                    wtr.write(b, 1)
                br.clear()
                run = 0
                wrote = True
            if run or br or not wrote:
                eobrun += 1
                pending_bits.extend(br)
                if eobrun == 32767:
                    flush_eob()
        flush_eob()
        wtr.flush()
        return (sos_header([ci + 1], [0], ss, se, ah, al), bytes(wtr.out))

    # --- DC refinement scan (raw bits, no Huffman table) ----------------
    def dc_refine():
        wtr = _BitWriter()
        for ci, by, bx in mcu_blocks():
            wtr.write(int(comps[ci]["coef"][by, bx, 0]) & 1, 1)
        wtr.flush()
        return (
            sos_header(
                [ci + 1 for ci in range(len(comps))],
                [0] * len(comps),
                0, 0, 1, 0,
            ),
            bytes(wtr.out),
        )

    if scan_script == "two_band":
        scans.append(dc_first())
        for ci in range(len(comps)):
            scans.append(ac_first(ci, 1, 5, 1))
            scans.append(ac_first(ci, 6, 63, 1))
        for ci in range(len(comps)):
            scans.append(ac_refine(ci, 1, 63, 1, 0))
        scans.append(dc_refine())
    elif scan_script == "libjpeg":
        # libjpeg's default progressive script (jcparam.c): luma AC
        # descends Al=2 -> (Ah=2, Al=1) -> (Ah=1, Al=0) — a CHAINED
        # two-stage successive-approximation refinement — with the DC
        # completion scan interleaved mid-sequence. This is the scan
        # shape real-world progressive JPEGs overwhelmingly carry.
        scans.append(dc_first())
        scans.append(ac_first(0, 1, 5, 2))
        if len(comps) == 3:
            scans.append(ac_first(1, 1, 63, 1))
            scans.append(ac_first(2, 1, 63, 1))
        scans.append(ac_first(0, 6, 63, 2))
        scans.append(ac_refine(0, 1, 63, 2, 1))
        scans.append(dc_refine())
        if len(comps) == 3:
            scans.append(ac_refine(1, 1, 63, 1, 0))
            scans.append(ac_refine(2, 1, 63, 1, 0))
        scans.append(ac_refine(0, 1, 63, 1, 0))
    else:
        raise ValueError(
            f"unknown scan_script {scan_script!r} (two_band | libjpeg)"
        )

    ncomp = len(comps)
    sof_body = struct.pack(">BHHB", 8, h, w, ncomp)
    for ci, c in enumerate(comps):
        sof_body += bytes([ci + 1, (c["h"] << 4) | c["v"], c["tq"]])
    out = b"\xff\xd8" + _jpeg_dqt(0, q_lum)
    if not grayscale:
        out += _jpeg_dqt(1, q_chrom)
    out += _jpeg_dht(0, 0, _HUFF_DC_LUM)
    if not grayscale:
        out += _jpeg_dht(0, 1, _HUFF_DC_CHROM)
    out += _jpeg_dht(1, 0, _HUFF_AC_PROG)
    out += _jpeg_seg(0xC2, sof_body)
    for header, payload in scans:
        out += header + payload
    return out + b"\xff\xd9"


def decode_image(data: bytes) -> np.ndarray:
    """Decode any supported payload into (H, W, 3) uint8 RGB."""
    fmt = sniff_format(data)
    if fmt == "bmp":
        return decode_bmp(data)
    if fmt in ("ppm", "pgm"):
        return decode_ppm(data)
    if fmt == "png":
        return decode_png(data)
    if fmt == "jpeg":
        return decode_jpeg(data)
    raise UnsupportedImageError(
        "unsupported image format (pure-Python codecs cover uncompressed "
        "BMP, binary PPM/PGM, non-interlaced 8-bit PNG, and baseline + "
        "progressive Huffman JPEG; arithmetic-coded JPEG/video need "
        "PIL/opencv on the executors)"
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


def encode_bmp(img: np.ndarray) -> bytes:
    """Encode (H, W, 3) uint8 RGB as an uncompressed 24-bit bottom-up
    BMP (BI_RGB) — the exact layout :func:`decode_bmp` reads back.
    Deterministic byte-for-byte, so BMP fixtures can serve oracle-exact
    multimodal contract queries."""
    if img.ndim != 3 or img.shape[2] != 3 or img.dtype != np.uint8:
        raise ValueError(f"need (H, W, 3) uint8, got {img.shape} {img.dtype}")
    h, w = img.shape[:2]
    row_stride = (w * 3 + 3) & ~3
    pad = row_stride - w * 3
    # BGR channel order, bottom-up rows, 4-byte row padding
    bgr = img[::-1, :, ::-1]
    body = b"".join(bgr[y].tobytes() + b"\x00" * pad for y in range(h))
    pixel_offset = 14 + 40
    header = (
        b"BM"
        + struct.pack("<IHHI", pixel_offset + len(body), 0, 0, pixel_offset)
        + struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0, len(body), 2835, 2835, 0, 0)
    )
    return header + body


def _png_chunk(ctype: bytes, body: bytes) -> bytes:
    return (
        struct.pack(">I", len(body))
        + ctype
        + body
        + struct.pack(">I", zlib.crc32(ctype + body) & 0xFFFFFFFF)
    )


def encode_png(img: np.ndarray) -> bytes:
    """Encode (H, W, 3) uint8 RGB as an 8-bit truecolor non-interlaced
    PNG (filter 0 on every row, one IDAT) — losslessly read back by
    :func:`decode_png`, so PNG fixtures are oracle-exact too."""
    if img.ndim != 3 or img.shape[2] != 3 or img.dtype != np.uint8:
        raise ValueError(f"need (H, W, 3) uint8, got {img.shape} {img.dtype}")
    h, w = img.shape[:2]
    ihdr = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)
    raw = b"".join(b"\x00" + img[y].tobytes() for y in range(h))
    return (
        _PNG_SIG
        + _png_chunk(b"IHDR", ihdr)
        + _png_chunk(b"IDAT", zlib.compress(raw, 6))
        + _png_chunk(b"IEND", b"")
    )


def encode_ppm(img: np.ndarray) -> bytes:
    """Encode (H, W, 3) uint8 RGB as binary PPM (P6) — the
    deterministic output container for resized images."""
    if img.ndim != 3 or img.shape[2] != 3 or img.dtype != np.uint8:
        raise ValueError(f"need (H, W, 3) uint8, got {img.shape} {img.dtype}")
    h, w = img.shape[:2]
    return b"P6\n%d %d\n255\n" % (w, h) + img.tobytes()
