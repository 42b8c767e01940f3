"""Pure-Python image codecs (functions/codecs.py) + the real (non-fake)
multimodal decode/resize path built on them."""

from __future__ import annotations

import struct

import numpy as np
import pytest

from gecko_spark.functions.codecs import (
    UnsupportedImageError,
    decode_bmp,
    decode_image,
    decode_ppm,
    encode_ppm,
    resize_nearest,
    sniff_format,
)

# 2x2 image: row0 = red, green ; row1 = blue, white
RGB_2X2 = np.array(
    [[[255, 0, 0], [0, 255, 0]], [[0, 0, 255], [255, 255, 255]]], dtype=np.uint8
)


def make_bmp_2x2(top_down: bool = False) -> bytes:
    """Hand-built 24-bit BI_RGB BMP of RGB_2X2 (4-byte padded rows)."""
    rows = []
    order = range(2) if top_down else range(1, -1, -1)
    for r in order:
        row = b"".join(bytes([b, g, rr]) for rr, g, b in RGB_2X2[r])
        rows.append(row + b"\x00" * (-len(row) % 4))
    pixels = b"".join(rows)
    height = -2 if top_down else 2
    dib = struct.pack("<IiiHHIIiiII", 40, 2, height, 1, 24, 0, len(pixels), 2835, 2835, 0, 0)
    header = b"BM" + struct.pack("<IHHI", 54 + len(pixels), 0, 0, 54)
    return header + dib + pixels


def test_sniff():
    assert sniff_format(make_bmp_2x2()) == "bmp"
    assert sniff_format(b"P6\n1 1\n255\n\x00\x00\x00") == "ppm"
    assert sniff_format(b"P5\n1 1\n255\n\x00") == "pgm"
    assert sniff_format(b"\x89PNG\r\n") == "unknown"


def test_decode_bmp_bottom_up_and_top_down():
    for td in (False, True):
        out = decode_bmp(make_bmp_2x2(top_down=td))
        assert out.shape == (2, 2, 3)
        assert (out == RGB_2X2).all(), td


def test_decode_ppm_and_roundtrip():
    data = encode_ppm(RGB_2X2)
    assert data.startswith(b"P6\n2 2\n255\n")
    out = decode_ppm(data)
    assert (out == RGB_2X2).all()
    # comments + extra whitespace in header
    wonky = b"P6\n# a comment\n 2\t2 # again\n255\n" + RGB_2X2.tobytes()
    assert (decode_ppm(wonky) == RGB_2X2).all()


def test_decode_pgm_replicates_gray():
    data = b"P5\n2 2\n255\n" + bytes([0, 85, 170, 255])
    out = decode_ppm(data)
    assert out.shape == (2, 2, 3)
    assert (out[:, :, 0] == out[:, :, 1]).all() and (out[0, 1] == 85).all()


def test_decode_rejects_bad_payloads():
    with pytest.raises(UnsupportedImageError):
        decode_image(b"\x89PNG\r\n\x1a\n....")
    with pytest.raises(UnsupportedImageError):
        decode_bmp(make_bmp_2x2()[:40])  # truncated
    with pytest.raises(UnsupportedImageError):
        decode_ppm(b"P6\n2 2\n65535\n" + b"\x00" * 24)  # 16-bit maxval
    # compressed BMP (BI_RLE8 = 1)
    bad = bytearray(make_bmp_2x2())
    struct.pack_into("<I", bad, 30, 1)
    with pytest.raises(UnsupportedImageError):
        decode_bmp(bytes(bad))


def test_resize_nearest_exact():
    up = resize_nearest(RGB_2X2, 4, 4)
    assert up.shape == (4, 4, 3)
    # each source pixel becomes a 2x2 block
    assert (up[0:2, 0:2] == RGB_2X2[0, 0]).all()
    assert (up[2:4, 2:4] == RGB_2X2[1, 1]).all()
    down = resize_nearest(up, 2, 2)
    assert (down == RGB_2X2).all()
    one = resize_nearest(RGB_2X2, 1, 1)
    assert one.shape == (1, 1, 3)


def test_spark_real_decode_and_resize(spark):
    """End-to-end fake=False: BMP + PPM payloads through mapInPandas —
    real decode, real features, real resize re-encoded as P6."""
    from gecko_spark.operators import multimodal as MM

    rows = [
        (1, make_bmp_2x2(), "image/bmp"),
        (2, encode_ppm(RGB_2X2), "image/x-portable-pixmap"),
    ]
    df = spark.createDataFrame(rows, "media_id long, content binary, mime string")
    feats = {
        r["media_id"]: r["features"]
        for r in MM.decode_image_features(df, out_dim=4, fake=False).collect()
    }
    # identical pixels -> identical features, regardless of container
    assert feats[1] == feats[2]
    assert len(feats[1]) == 4
    assert all(0.0 <= v <= 1.0 for v in feats[1])

    resized = MM.resize_images(df, 4, 4, fake=False).collect()
    for r in resized:
        assert r["mime"] == "image/x-portable-pixmap"
        out = decode_ppm(bytes(r["content"]))
        assert (out == resize_nearest(RGB_2X2, 4, 4)).all()


# -- property tests -----------------------------------------------------------

from hypothesis import given, settings
from hypothesis import strategies as st


@st.composite
def _images(draw):
    h = draw(st.integers(1, 12))
    w = draw(st.integers(1, 12))
    data = draw(
        st.binary(min_size=h * w * 3, max_size=h * w * 3)
    )
    return np.frombuffer(data, dtype=np.uint8).reshape(h, w, 3)


@given(_images())
@settings(max_examples=40, deadline=None)
def test_ppm_roundtrip_any_image(img):
    assert (decode_ppm(encode_ppm(img)) == img).all()


@given(_images())
@settings(max_examples=40, deadline=None)
def test_resize_same_size_is_identity(img):
    h, w = img.shape[:2]
    assert (resize_nearest(img, w, h) == img).all()


@given(_images(), st.integers(1, 10), st.integers(1, 10))
@settings(max_examples=40, deadline=None)
def test_resize_output_pixels_come_from_source(img, w2, h2):
    out = resize_nearest(img, w2, h2)
    assert out.shape == (h2, w2, 3)
    src = {tuple(p) for row in img for p in row}
    assert all(tuple(p) in src for row in out for p in row)


def _encode_bmp(img: np.ndarray) -> bytes:
    """Minimal 24-bit bottom-up BMP encoder for the round-trip test."""
    h, w = img.shape[:2]
    rows = []
    for r in range(h - 1, -1, -1):
        row = img[r, :, ::-1].tobytes()
        rows.append(row + b"\x00" * (-len(row) % 4))
    pixels = b"".join(rows)
    dib = struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0, len(pixels), 2835, 2835, 0, 0)
    return b"BM" + struct.pack("<IHHI", 54 + len(pixels), 0, 0, 54) + dib + pixels


@given(_images())
@settings(max_examples=40, deadline=None)
def test_bmp_roundtrip_any_image(img):
    assert (decode_bmp(_encode_bmp(img)) == img).all()


# -- PNG ---------------------------------------------------------------------

import zlib

from gecko_spark.functions.codecs import decode_png


def _png_chunk(ctype: bytes, body: bytes) -> bytes:
    return (
        struct.pack(">I", len(body))
        + ctype
        + body
        + struct.pack(">I", zlib.crc32(ctype + body))
    )


def _filter_row(line, prev, bpp, t):
    """Forward PNG filter (spec RFC 2083 §6) for the encoder side."""
    line = line.astype(np.int16)
    prev = prev.astype(np.int16)
    left = np.concatenate([np.zeros(bpp, np.int16), line[:-bpp]]) if len(line) > bpp else np.zeros_like(line)
    upleft = np.concatenate([np.zeros(bpp, np.int16), prev[:-bpp]]) if len(prev) > bpp else np.zeros_like(prev)
    if t == 0:
        out = line
    elif t == 1:
        out = line - left
    elif t == 2:
        out = line - prev
    elif t == 3:
        out = line - ((left + prev) >> 1)
    else:
        p = left + prev - upleft
        pa, pb, pc = np.abs(p - left), np.abs(p - prev), np.abs(p - upleft)
        pred = np.where((pa <= pb) & (pa <= pc), left, np.where(pb <= pc, prev, upleft))
        out = line - pred
    return (out & 0xFF).astype(np.uint8)


def _encode_png(img: np.ndarray, color_type: int, filters) -> bytes:
    """Minimal PNG encoder emitting a chosen filter type per row."""
    h, w = img.shape[:2]
    ch = {0: 1, 2: 3, 4: 2, 6: 4}[color_type]
    px = img.reshape(h, w * ch)
    raw = bytearray()
    prev = np.zeros(w * ch, dtype=np.uint8)
    for y in range(h):
        t = filters[y % len(filters)]
        raw.append(t)
        raw += _filter_row(px[y], prev, ch, t).tobytes()
        prev = px[y]
    ihdr = struct.pack(">IIBBBBB", w, h, 8, color_type, 0, 0, 0)
    return (
        b"\x89PNG\r\n\x1a\n"
        + _png_chunk(b"IHDR", ihdr)
        + _png_chunk(b"IDAT", zlib.compress(bytes(raw)))
        + _png_chunk(b"IEND", b"")
    )


def test_png_rgb_all_filter_types():
    rng = np.random.default_rng(7)
    img = rng.integers(0, 256, (11, 9, 3), dtype=np.uint8)
    for filters in ([0], [1], [2], [3], [4], [0, 1, 2, 3, 4]):
        data = _encode_png(img, 2, filters)
        assert sniff_format(data) == "png"
        assert (decode_png(data) == img).all(), f"filters={filters}"


def test_png_rgba_drops_alpha():
    rng = np.random.default_rng(8)
    rgba = rng.integers(0, 256, (5, 7, 4), dtype=np.uint8)
    out = decode_png(_encode_png(rgba, 6, [0, 4]))
    assert (out == rgba[:, :, :3]).all()


def test_png_gray_and_gray_alpha():
    rng = np.random.default_rng(9)
    g = rng.integers(0, 256, (6, 4, 1), dtype=np.uint8)
    assert (decode_png(_encode_png(g, 0, [1, 2])) == np.repeat(g, 3, axis=2)).all()
    ga = np.concatenate([g, np.full_like(g, 128)], axis=2)
    assert (decode_png(_encode_png(ga, 4, [3])) == np.repeat(g, 3, axis=2)).all()


def test_png_palette():
    lut = np.array([[255, 0, 0], [0, 255, 0], [0, 0, 255], [7, 8, 9]], dtype=np.uint8)
    idx = np.array([[0, 1], [2, 3], [3, 0]], dtype=np.uint8)[..., None]
    data = _encode_png(idx, 3 if False else 0, [0])  # encode indices as gray stream
    # splice color type 3 + PLTE into the gray-encoded stream
    ihdr = struct.pack(">IIBBBBB", 2, 3, 8, 3, 0, 0, 0)
    body = data[8:]
    # rebuild: IHDR(type 3) + PLTE + rest after original IHDR chunk
    first_len = struct.unpack(">I", body[:4])[0]
    rest = body[12 + first_len:]
    data3 = (
        b"\x89PNG\r\n\x1a\n"
        + _png_chunk(b"IHDR", ihdr)
        + _png_chunk(b"PLTE", lut.tobytes())
        + rest
    )
    assert (decode_png(data3) == lut[idx[:, :, 0]]).all()


def test_png_rejects_unsupported():
    img = np.zeros((2, 2, 3), dtype=np.uint8)
    data = bytearray(_encode_png(img, 2, [0]))
    # flip interlace byte inside IHDR (offset: 8 sig + 8 hdr + 12th IHDR byte)
    data[8 + 8 + 12] = 1
    with pytest.raises(UnsupportedImageError, match="interlaced"):
        decode_png(bytes(data))
    with pytest.raises(UnsupportedImageError):
        decode_png(b"\x89PNG\r\n\x1a\njunk")
    with pytest.raises(UnsupportedImageError, match="not a PNG"):
        decode_png(b"BMnope")


@given(_images(), st.sampled_from([[0], [1], [2], [3], [4], [4, 3, 2, 1, 0]]))
@settings(max_examples=40, deadline=None)
def test_png_roundtrip_any_image(img, filters):
    assert (decode_png(_encode_png(img, 2, filters)) == img).all()


def test_decode_image_dispatches_png():
    img = np.zeros((3, 3, 3), dtype=np.uint8)
    assert (decode_image(_encode_png(img, 2, [0])) == img).all()


# ---------------------------------------------------------------------------
# JPEG (baseline sequential) — encoder/decoder pair, no PIL anywhere
# ---------------------------------------------------------------------------

from gecko_spark.functions.codecs import decode_jpeg, encode_jpeg_baseline  # noqa: E402


def _smooth_image(shape, seed=9):
    rng = np.random.default_rng(seed)
    img = rng.integers(0, 256, (*shape, 3), dtype=np.uint8)
    return (img.astype(float) * 0.2 + 110).astype(np.uint8)


def test_jpeg_sniff_and_dispatch():
    img = np.full((8, 8, 3), 77, dtype=np.uint8)
    data = encode_jpeg_baseline(img, quality=90)
    assert sniff_format(data) == "jpeg"
    assert data[:3] == b"\xff\xd8\xff" and data[-2:] == b"\xff\xd9"
    out = decode_image(data)  # dispatches through decode_jpeg
    assert out.shape == (8, 8, 3)


def test_jpeg_solid_color_exact():
    img = np.full((16, 16, 3), [200, 30, 90], dtype=np.uint8)
    out = decode_jpeg(encode_jpeg_baseline(img, quality=90))
    assert np.abs(out.astype(int) - img.astype(int)).max() == 0


def test_jpeg_gradient_non_multiple_of_8():
    x = np.linspace(0, 255, 21)
    y = np.linspace(0, 255, 13)
    gx, gy = np.meshgrid(x, y)
    grad = np.stack([gx, gy, np.full((13, 21), 128.0)], axis=2).astype(np.uint8)
    out = decode_jpeg(encode_jpeg_baseline(grad, quality=90))
    assert out.shape == grad.shape
    # lossy, but q90 on a smooth ramp stays within a few code values
    assert np.abs(out.astype(int) - grad.astype(int)).max() <= 6


def test_jpeg_420_subsampling_decodes():
    img = _smooth_image((13, 21))
    out = decode_jpeg(encode_jpeg_baseline(img, quality=90, subsample=True))
    assert out.shape == img.shape
    # luma carries most content; chroma averaged over 2x2 => wider bound
    assert np.abs(out.astype(int) - img.astype(int)).mean() < 16


def test_jpeg_restart_markers_identical_output():
    img = _smooth_image((40, 56))
    plain = decode_jpeg(encode_jpeg_baseline(img, quality=90))
    rst = decode_jpeg(encode_jpeg_baseline(img, quality=90, restart_interval=3))
    assert np.array_equal(plain, rst)
    rst420 = decode_jpeg(
        encode_jpeg_baseline(img, quality=90, subsample=True, restart_interval=2)
    )
    assert rst420.shape == img.shape


def test_jpeg_deterministic():
    img = _smooth_image((17, 19), seed=3)
    a = encode_jpeg_baseline(img, quality=80)
    b = encode_jpeg_baseline(img, quality=80)
    assert a == b
    assert np.array_equal(decode_jpeg(a), decode_jpeg(b))


def test_jpeg_rejects_unsupported():
    img = np.zeros((8, 8, 3), dtype=np.uint8)
    data = bytearray(encode_jpeg_baseline(img, quality=90))
    # flip SOF0 (0xC0) to lossless SOF3 (0xC3) — genuinely unsupported
    # (SOF2 progressive decodes natively since round 7)
    idx = bytes(data).find(b"\xff\xc0")
    data[idx + 1] = 0xC3
    with pytest.raises(UnsupportedImageError, match="SOF"):
        decode_jpeg(bytes(data))
    with pytest.raises(UnsupportedImageError, match="not a JPEG"):
        decode_jpeg(b"BMnope")
    with pytest.raises(UnsupportedImageError):
        decode_jpeg(b"\xff\xd8\xff\xe0junkjunkjunk")


def test_jpeg_progressive_matches_baseline_exactly():
    """Progressive (SOF2) decode must be PIXEL-IDENTICAL to baseline at
    the same quality/sampling: both encoders quantize to the same
    coefficients, so any mismatch is a bug in the successive-
    approximation or spectral-selection logic, not quant noise. Covers
    4:4:4, 4:2:0 with non-multiple-of-16 dims (non-interleaved AC
    grids smaller than the MCU-padded DC grid), and grayscale."""
    from gecko_spark.functions.codecs import encode_jpeg_progressive

    for shape, kw in [
        ((13, 21), {}),
        ((40, 56), {"subsample": True}),
        ((33, 41), {"subsample": True}),  # odd dims: bh < MCU grid rows
        ((16, 16), {"grayscale": True}),
    ]:
        img = _smooth_image(shape)
        base = decode_jpeg(encode_jpeg_baseline(img, quality=90, **kw))
        blob = encode_jpeg_progressive(img, quality=90, **kw)
        assert b"\xff\xc2" in blob and sniff_format(blob) == "jpeg"
        prog = decode_jpeg(blob)
        assert np.array_equal(prog, base), (shape, kw)


def test_jpeg_progressive_noise_image_exact():
    """High-entropy input: every band has coefficients, EOB runs stay
    short, refinement emits dense correction + newly-nonzero bits —
    the adversarial case for the Annex G bit plumbing."""
    from gecko_spark.functions.codecs import encode_jpeg_progressive

    rng = np.random.default_rng(5)
    img = rng.integers(0, 256, (24, 17, 3)).astype(np.uint8)
    base = decode_jpeg(encode_jpeg_baseline(img, quality=85))
    prog = decode_jpeg(encode_jpeg_progressive(img, quality=85))
    assert np.array_equal(prog, base)
    # flat/low-entropy input: long EOB runs across blocks (EOBn > 1
    # symbols from the flat progressive AC table)
    flat = np.full((48, 64, 3), 120, dtype=np.uint8)
    flat[0, 0] = [130, 110, 125]
    assert np.array_equal(
        decode_jpeg(encode_jpeg_progressive(flat, quality=50)),
        decode_jpeg(encode_jpeg_baseline(flat, quality=50)),
    )


def test_jpeg_progressive_through_decode_image():
    from gecko_spark.functions.codecs import encode_jpeg_progressive

    img = _smooth_image((12, 12))
    out = decode_image(encode_jpeg_progressive(img, quality=90))
    assert out.shape == img.shape


@given(_images())
@settings(max_examples=15, deadline=None)
def test_jpeg_roundtrip_any_image_bounded_error(img):
    out = decode_jpeg(encode_jpeg_baseline(img, quality=95))
    # q95 quantization error bound: generous but meaningful (identity
    # would fail only on a broken transform, not on quant noise)
    assert out.shape == img.shape
    assert np.abs(out.astype(int) - img.astype(int)).mean() <= 24


def test_jpeg_grayscale_single_component():
    x = np.linspace(0, 255, 20)
    g = np.repeat(x[None, :], 12, axis=0)
    img = np.stack([g, g, g], axis=2).astype(np.uint8)
    data = encode_jpeg_baseline(img, quality=90, grayscale=True)
    out = decode_jpeg(data)
    assert out.shape == (12, 20, 3)
    # all three channels replicate the luma plane
    assert np.array_equal(out[:, :, 0], out[:, :, 1])
    assert np.array_equal(out[:, :, 1], out[:, :, 2])
    assert np.abs(out[:, :, 0].astype(int) - img[:, :, 0].astype(int)).max() <= 6
    # smaller than the equivalent color stream (no chroma blocks)
    assert len(data) < len(encode_jpeg_baseline(img, quality=90))
    # restart markers work on the gray path too
    rst = decode_jpeg(encode_jpeg_baseline(img, quality=90, grayscale=True, restart_interval=2))
    assert np.array_equal(out, rst)
    with pytest.raises(ValueError, match="subsample"):
        encode_jpeg_baseline(img, grayscale=True, subsample=True)


def test_decoders_raise_typed_error_on_malformed_streams():
    """Truncated or byte-corrupted payloads must raise
    UnsupportedImageError (the typed error the multimodal executors
    quarantine per payload), never a raw IndexError/struct.error —
    fuzzed over every decoder with its own valid output as the seed."""
    from gecko_spark.functions.codecs import (
        decode_bmp,
        decode_image,
        encode_jpeg_progressive,
        encode_ppm,
    )

    rng = np.random.default_rng(7)
    img = rng.integers(0, 256, (24, 17, 3)).astype(np.uint8)
    blobs = [
        encode_jpeg_baseline(img, quality=85),
        encode_jpeg_progressive(img, quality=85),
        encode_ppm(img),
    ]
    for blob in blobs:
        for cut in range(2, len(blob), 41):
            try:
                decode_image(blob[:cut])
            except UnsupportedImageError:
                pass  # the only acceptable failure type
        for _ in range(120):
            b = bytearray(blob)
            b[int(rng.integers(2, len(b)))] = int(rng.integers(0, 256))
            try:
                decode_image(bytes(b))
            except UnsupportedImageError:
                pass
    # direct decoder entry (bypassing sniff) with garbage
    with pytest.raises(UnsupportedImageError):
        decode_bmp(b"BM" + b"\x01" * 10)


def test_corrupt_header_dimensions_capped_not_oom():
    """ADVICE r7 (codecs.py _check_dims): corrupt header DIMENSION
    fields — JPEG SOF height/width, PNG IHDR, BMP biWidth/biHeight —
    must raise UnsupportedImageError BEFORE driving unbounded numpy
    allocations (a declared 65535x65535 image would allocate multi-GB
    coefficient arrays and OOM the executor instead of quarantining
    the payload). Each corrupt blob must fail FAST and typed."""
    import struct
    import time

    from gecko_spark.functions import codecs as C

    rng = np.random.default_rng(3)
    img = rng.integers(0, 256, (16, 16, 3)).astype(np.uint8)

    # JPEG: patch the SOF0 height/width to 65535x65535
    jpg = bytearray(C.encode_jpeg_baseline(img, quality=85))
    i = jpg.find(b"\xff\xc0")
    struct.pack_into(">HH", jpg, i + 5, 65535, 65535)
    # PNG: patch IHDR width/height
    png = bytearray(C.encode_png(img)) if hasattr(C, "encode_png") else None
    # BMP: patch biWidth/biHeight
    bmp = bytearray(C.encode_bmp(img)) if hasattr(C, "encode_bmp") else None
    # PNM: declared huge dims in the header
    pnm = b"P6\n65535 65535\n255\n" + b"\x00" * 64

    blobs = [bytes(jpg), pnm]
    if png is not None:
        struct.pack_into(">II", png, 16, 2**24, 2**24)
        blobs.append(bytes(png))
    if bmp is not None:
        struct.pack_into("<ii", bmp, 18, 2**24, 2**24)
        blobs.append(bytes(bmp))

    for blob in blobs:
        t0 = time.time()
        with pytest.raises(UnsupportedImageError, match="cap|dimensions"):
            C.decode_image(blob)
        assert time.time() - t0 < 1.0  # failed before any big allocation

    # corrupt JPEG sampling factors (outside T.81's 1..4) are typed too
    jpg2 = bytearray(C.encode_jpeg_baseline(img, quality=85))
    i = jpg2.find(b"\xff\xc0")
    jpg2[i + 11] = 0x97  # h=9, v=7
    with pytest.raises(UnsupportedImageError, match="sampling"):
        C.decode_jpeg(bytes(jpg2))

    # the cap is advisory, not hardcoded: raising it restores decode
    old = C.MAX_DECODE_PIXELS
    try:
        C.MAX_DECODE_PIXELS = 16 * 16 - 1
        with pytest.raises(UnsupportedImageError, match="cap"):
            C.decode_jpeg(C.encode_jpeg_baseline(img))
    finally:
        C.MAX_DECODE_PIXELS = old
    assert C.decode_jpeg(C.encode_jpeg_baseline(img)).shape == (16, 16, 3)


def test_spark_decode_features_progressive_jpeg(spark):
    """End-to-end mapInPandas with a PROGRESSIVE JPEG payload: the
    executor path must produce the exact features of the baseline
    encoding of the same image (identical decoded pixels by the
    codec-level equality test)."""
    from gecko_spark.functions.codecs import (
        encode_jpeg_baseline,
        encode_jpeg_progressive,
    )
    from gecko_spark.operators import multimodal as MM

    img = _smooth_image((16, 16))
    rows = [
        (1, bytearray(encode_jpeg_baseline(img, quality=90)), "image/jpeg"),
        (2, bytearray(encode_jpeg_progressive(img, quality=90)), "image/jpeg"),
    ]
    df = spark.createDataFrame(rows, "media_id long, content binary, mime string")
    feats = {
        r["media_id"]: r["features"]
        for r in MM.decode_image_features(df, out_dim=4, fake=False).collect()
    }
    assert feats[1] == feats[2]


def test_jpeg_progressive_libjpeg_script_matches_baseline():
    """ADVICE r7: externally produced progressive JPEGs use libjpeg's
    default scan script — luma AC descending Al=2 -> (Ah=2, Al=1) ->
    (Ah=1, Al=0), a CHAINED two-stage successive approximation with
    the DC completion scan interleaved mid-sequence — which the old
    single-stage fixture never exercised. The decoder must produce
    pixels IDENTICAL to baseline for that script too, on smooth and
    high-entropy inputs, color and grayscale, 4:4:4 and 4:2:0."""
    from gecko_spark.functions.codecs import encode_jpeg_progressive

    rng = np.random.default_rng(23)
    cases = [
        (_smooth_image((13, 21)), {}),
        (_smooth_image((33, 41)), {"subsample": True}),
        (_smooth_image((16, 16)), {"grayscale": True}),
        (rng.integers(0, 256, (24, 17, 3), dtype=np.uint8), {"quality": 40}),
    ]
    for img, kw in cases:
        kw = dict(kw)
        q = kw.pop("quality", 90)
        base = decode_jpeg(encode_jpeg_baseline(img, quality=q, **kw))
        blob = encode_jpeg_progressive(
            img, quality=q, scan_script="libjpeg", **kw
        )
        assert b"\xff\xc2" in blob and sniff_format(blob) == "jpeg"
        # the chained script's scan count: color = DC + 4 AC-first +
        # 4 refinements + DC-refine = 10; grayscale = 6
        n_sos = blob.count(b"\xff\xda")
        assert n_sos == (6 if kw.get("grayscale") else 10), n_sos
        assert np.array_equal(decode_jpeg(blob), base), (img.shape, kw)
    with pytest.raises(ValueError):
        encode_jpeg_progressive(cases[0][0], scan_script="bogus")
