"""Build the multimodal ORACLE fixtures (VERDICT r7 #3):
``tests/fixtures/media_images.parquet`` and ``media_audio.parquet``.

Design: every payload's DECODED content is known in closed form, so a
DuckDB oracle can replay the engine's deterministic feature reduction
without parsing a single codec byte —

* BMP / PNG images are LOSSLESS carriers of a formula image
  ``pixel(x, y) = (7x + 13y + 31·media_id) mod 256`` (all 3 channels
  equal, so the engine's (r+g+b)//3 grayscale is the formula value).
* JPEGs (baseline AND progressive) carry a CONSTANT-gray image; DCT of
  a constant block is DC-only, so the decode is constant too — the
  builder asserts constancy and records the decoded value in the
  ``cval`` meta column.
* WAV audio carries mono int16 samples
  ``k(i) = ((31·i² + 7·i + 1000003·media_id) mod 65536) − 32768``;
  the windowed-RMS feature math is exact integer arithmetic in float64
  (all addends are multiples of 2⁻³⁰ with sums < 2⁵³), so ANY
  summation order — numpy cumsum or SQL SUM — is bit-identical.

Meta columns (h, w, n, rate, kind, cval) ride IN the parquet: the
oracle reads the same file and computes features from the meta, while
the engine decodes the actual payload bytes. A feature mismatch means
the decode path broke. The builder cross-checks every payload against
the closed form before writing.
"""

from __future__ import annotations

import os
import sys

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from gecko_spark.functions.codecs import (  # noqa: E402
    decode_image,
    encode_bmp,
    encode_jpeg_baseline,
    encode_jpeg_progressive,
    encode_png,
)
from gecko_spark.functions.av_codecs import (  # noqa: E402
    decode_avi_mjpeg,
    decode_wav,
    decode_y4m,
    encode_avi_mjpeg,
    encode_wav,
    encode_y4m,
)
from gecko_spark.functions.codecs import decode_jpeg  # noqa: E402
from gecko_spark.operators.multimodal import (  # noqa: E402
    _real_audio_features,
    _real_features,
)

OUT_DIR = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                       "tests", "fixtures")
OUT_DIM = 16  # 4x4 grid for images; 16 RMS windows for audio


def formula_image(h: int, w: int, media_id: int) -> np.ndarray:
    x = np.arange(w)[None, :]
    y = np.arange(h)[:, None]
    g = ((7 * x + 13 * y + 31 * media_id) % 256).astype(np.uint8)
    return np.repeat(g[:, :, None], 3, axis=2)


def expected_grid(h: int, w: int, media_id: int) -> list[int]:
    """The engine's 4x4 nearest-resample of the formula image — computed
    from the FORMULA (resize_nearest index math inlined), not by
    decoding: rows[i] = ((2i+1)h) // 8, cols likewise."""
    d = 4
    out = []
    for i in range(d * d):
        gy, gx = i // d, i % d
        sy = ((2 * gy + 1) * h) // (2 * d)
        sx = ((2 * gx + 1) * w) // (2 * d)
        out.append((7 * sx + 13 * sy + 31 * media_id) % 256)
    return out


def build_images() -> None:
    rows = []
    # lossless formula carriers
    for mid, (h, w), enc, mime in [
        (1, (17, 24), encode_bmp, "image/bmp"),
        (2, (9, 11), encode_bmp, "image/bmp"),
        (3, (32, 32), encode_bmp, "image/bmp"),
        (4, (5, 40), encode_bmp, "image/bmp"),
        (5, (13, 19), encode_png, "image/png"),
        (6, (21, 8), encode_png, "image/png"),
        (7, (16, 16), encode_png, "image/png"),
        (8, (40, 3), encode_png, "image/png"),
    ]:
        img = formula_image(h, w, mid)
        blob = enc(img)
        assert np.array_equal(decode_image(blob), img), f"id {mid} not lossless"
        feats = _real_features(blob, OUT_DIM)
        grid = [int(round(f * 255)) for f in feats]
        assert grid == expected_grid(h, w, mid), f"id {mid} grid mismatch"
        rows.append((mid, mime, blob, h, w, "formula", 0))
    # constant-gray JPEGs: decode is constant; record the decoded gray
    for mid, (h, w), g, prog in [
        (9, (24, 24), 128, False),
        (10, (16, 40), 77, False),
        (11, (24, 16), 200, True),
        (12, (8, 8), 33, True),
    ]:
        img = np.full((h, w, 3), g, dtype=np.uint8)
        enc = encode_jpeg_progressive if prog else encode_jpeg_baseline
        blob = enc(img, quality=92)
        dec = decode_image(blob)
        gray = (
            dec[:, :, 0].astype(np.uint32)
            + dec[:, :, 1].astype(np.uint32)
            + dec[:, :, 2].astype(np.uint32)
        ) // 3
        vals = np.unique(gray)
        assert len(vals) == 1, f"jpeg id {mid} decode not constant: {vals}"
        cval = int(vals[0])
        feats = _real_features(blob, OUT_DIM)
        assert [int(round(f * 255)) for f in feats] == [cval] * OUT_DIM
        mime = "image/jpeg"
        rows.append((mid, mime, blob, h, w, "const", cval))
    # null payload: the per-payload quarantine path (null features row)
    rows.append((13, "image/unknown", None, 0, 0, "null", 0))

    schema = pa.schema(
        [
            ("media_id", pa.int64()),
            ("mime", pa.string()),
            ("content", pa.binary()),
            ("h", pa.int32()),
            ("w", pa.int32()),
            ("kind", pa.string()),
            ("cval", pa.int32()),
        ]
    )
    cols = list(zip(*rows))
    tbl = pa.table(
        {f.name: pa.array(c, type=f.type) for f, c in zip(schema, cols)},
        schema=schema,
    )
    os.makedirs(OUT_DIR, exist_ok=True)
    pq.write_table(tbl, os.path.join(OUT_DIR, "media_images.parquet"))
    print(f"media_images.parquet: {len(rows)} rows")


def audio_samples(n: int, media_id: int) -> np.ndarray:
    i = np.arange(n, dtype=np.int64)
    k = (31 * i * i + 7 * i + 1000003 * media_id) % 65536 - 32768
    return k.astype(np.int16)[:, None]  # mono


def build_audio() -> None:
    rows = []
    for mid, n, rate in [
        (1, 1000, 8000),
        (2, 4096, 16000),
        (3, 8000, 22050),
        (4, 12345, 8000),
        (5, 333, 16000),
    ]:
        samples = audio_samples(n, mid)
        blob = encode_wav(samples, rate)
        dec, r = decode_wav(blob)
        assert r == rate and np.array_equal(dec, samples), f"audio id {mid}"
        feats, r2, dur = _real_audio_features(blob, OUT_DIM)
        # cross-check the closed form the SQL oracle will replay:
        # rms_w = sqrt(sum(k²)/width) / 32768 over integer-exact window
        # bounds (w·n)//16
        bounds = (np.arange(OUT_DIM + 1) * n) // OUT_DIM
        k = samples[:, 0].astype(np.int64)
        for wi in range(OUT_DIM):
            lo, hi = int(bounds[wi]), int(bounds[wi + 1])
            s = int((k[lo:hi] ** 2).sum())
            exp = np.float32(np.sqrt(s / max(hi - lo, 1)) / 32768.0)
            assert feats[wi] == exp, (mid, wi, feats[wi], exp)
        assert dur == (n * 1000) // rate
        rows.append((mid, "audio/wav", blob, n, rate, "formula"))
    rows.append((6, "audio/unknown", None, 0, 0, "null"))

    schema = pa.schema(
        [
            ("media_id", pa.int64()),
            ("mime", pa.string()),
            ("content", pa.binary()),
            ("n", pa.int64()),
            ("rate", pa.int32()),
            ("kind", pa.string()),
        ]
    )
    cols = list(zip(*rows))
    tbl = pa.table(
        {f.name: pa.array(c, type=f.type) for f, c in zip(schema, cols)},
        schema=schema,
    )
    pq.write_table(tbl, os.path.join(OUT_DIR, "media_audio.parquet"))
    print(f"media_audio.parquet: {len(rows)} rows")


def frame_gray(media_id: int, fi: int) -> int:
    """Requested per-frame constant gray — the DECODED value may differ
    for MJPEG (quantized DC rounding); the builder records the decoded
    value in ``cvals``, asserting only constancy."""
    return (37 * fi + 53 * media_id + 40) % 200 + 20


def build_video() -> None:
    """media_video.parquet: Motion-JPEG AVI and Y4M clips whose frames
    are CONSTANT-gray (per-frame value varies). A constant block is
    DC-only under the DCT, so each MJPEG frame decodes to a constant
    too; the builder asserts constancy frame-by-frame through the SAME
    luma math ``sample_video_frames`` applies, and records the decoded
    constants in the ``cvals`` list column the SQL oracle replays. Y4M
    is raw luma — lossless by construction, asserted anyway."""
    rows = []
    for mid, n_frames, (h, w), kind in [
        (1, 10, (24, 32), "avi"),
        (2, 7, (16, 16), "avi"),
        (3, 12, (8, 24), "avi"),
        (4, 9, (18, 22), "y4m"),
        (5, 5, (32, 10), "y4m"),
    ]:
        greys = [frame_gray(mid, fi) for fi in range(n_frames)]
        if kind == "avi":
            frames = np.stack(
                [np.full((h, w, 3), g, dtype=np.uint8) for g in greys]
            )
            blob = encode_avi_mjpeg(frames, quality=92)
            jpegs, hdr = decode_avi_mjpeg(blob)
            assert len(jpegs) == n_frames and hdr["width"] == w
            cvals = []
            for jp in jpegs:
                rgb = decode_jpeg(jp).astype(np.float64)
                luma = np.clip(
                    np.round(
                        0.299 * rgb[:, :, 0]
                        + 0.587 * rgb[:, :, 1]
                        + 0.114 * rgb[:, :, 2]
                    ),
                    0,
                    255,
                ).astype(np.uint8)
                vals = np.unique(luma)
                assert len(vals) == 1, f"video id {mid} frame not constant: {vals}"
                cvals.append(int(vals[0]))
            mime = "video/x-msvideo"
        else:
            planes = np.stack(
                [np.full((h, w), g, dtype=np.uint8) for g in greys]
            )
            blob = encode_y4m(planes)
            dec, hdr = decode_y4m(blob)
            assert np.array_equal(dec, planes) and hdr["width"] == w
            cvals = greys
            mime = "video/x-yuv4mpeg"
        rows.append((mid, mime, blob, n_frames, h, w, "const", cvals))
    rows.append((6, "video/unknown", None, 0, 0, 0, "null", []))

    schema = pa.schema(
        [
            ("media_id", pa.int64()),
            ("mime", pa.string()),
            ("content", pa.binary()),
            ("n_frames", pa.int32()),
            ("fh", pa.int32()),
            ("fw", pa.int32()),
            ("kind", pa.string()),
            ("cvals", pa.list_(pa.int32())),
        ]
    )
    cols = list(zip(*rows))
    tbl = pa.table(
        {f.name: pa.array(c, type=f.type) for f, c in zip(schema, cols)},
        schema=schema,
    )
    pq.write_table(tbl, os.path.join(OUT_DIR, "media_video.parquet"))
    print(f"media_video.parquet: {len(rows)} rows")


if __name__ == "__main__":
    build_images()
    build_audio()
    build_video()
