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
