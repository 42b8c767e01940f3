"""Pure-Python WAV/Y4M codecs (functions/av_codecs.py) + the Spark
multimodal audio/video-frame paths built on them."""

import math
import struct

import numpy as np
import pytest

from gecko_spark.functions.av_codecs import (
    UnsupportedMediaError,
    decode_wav,
    decode_y4m,
    encode_wav,
    encode_y4m,
    sniff_av_format,
)


def test_sniff():
    assert sniff_av_format(encode_wav(np.zeros(4, np.int16), 8000)) == "wav"
    assert sniff_av_format(encode_y4m(np.zeros((1, 2, 2), np.uint8))) == "y4m"
    assert sniff_av_format(b"\x89PNG....") == "unknown"
    assert sniff_av_format(b"") == "unknown"


class TestWav:
    def test_roundtrip_mono_and_stereo(self):
        rng = np.random.default_rng(5)
        mono = rng.integers(-32768, 32768, size=300, dtype=np.int16)
        got, rate = decode_wav(encode_wav(mono, 16000))
        assert rate == 16000
        np.testing.assert_array_equal(got[:, 0], mono)
        stereo = rng.integers(-32768, 32768, size=(200, 2), dtype=np.int16)
        got2, rate2 = decode_wav(encode_wav(stereo, 44100))
        assert rate2 == 44100 and got2.shape == (200, 2)
        np.testing.assert_array_equal(got2, stereo)

    def test_8bit_widened(self):
        # hand-build an 8-bit PCM file: fmt says bits=8, data unsigned
        pcm = bytes([0, 128, 255])
        fmt = struct.pack("<HHIIHH", 1, 1, 8000, 8000, 1, 8)
        body = b"WAVE" + b"fmt " + struct.pack("<I", len(fmt)) + fmt
        body += b"data" + struct.pack("<I", len(pcm)) + pcm + b"\x00"  # pad
        data = b"RIFF" + struct.pack("<I", len(body)) + body
        got, rate = decode_wav(data)
        assert got[:, 0].tolist() == [(-128) << 8, 0, 127 << 8]

    def test_unknown_chunks_skipped(self):
        base = encode_wav(np.arange(10, dtype=np.int16), 8000)
        # splice a LIST chunk between fmt and data
        fmt_end = 12 + 8 + 16
        spliced = (
            base[:fmt_end]
            + b"LIST" + struct.pack("<I", 4) + b"INFO"
            + base[fmt_end:]
        )
        got, _ = decode_wav(spliced)
        np.testing.assert_array_equal(got[:, 0], np.arange(10))

    def test_rejects_non_pcm_and_garbage(self):
        with pytest.raises(UnsupportedMediaError):
            decode_wav(b"not audio at all")
        bad_fmt = struct.pack("<HHIIHH", 3, 1, 8000, 32000, 4, 32)  # float
        body = b"WAVE" + b"fmt " + struct.pack("<I", 16) + bad_fmt
        body += b"data" + struct.pack("<I", 0)
        with pytest.raises(UnsupportedMediaError, match="format tag 3"):
            decode_wav(b"RIFF" + struct.pack("<I", len(body)) + body)


class TestY4m:
    def test_roundtrip(self):
        rng = np.random.default_rng(11)
        planes = rng.integers(0, 256, size=(5, 4, 6), dtype=np.uint8)
        got, hdr = decode_y4m(encode_y4m(planes, fps_num=25))
        np.testing.assert_array_equal(got, planes)
        assert hdr["width"] == 6 and hdr["height"] == 4
        assert hdr["fps"] == 25.0 and hdr["colorspace"] == "420jpeg"

    def test_colorspace_plane_sizes(self):
        # hand-build C444: full-size chroma planes must be skipped over
        y = np.arange(16, dtype=np.uint8).reshape(4, 4)
        data = b"YUV4MPEG2 W4 H4 F30:1 C444\n"
        for _ in range(2):
            data += b"FRAME\n" + y.tobytes() + bytes(16) + bytes(16)
        got, hdr = decode_y4m(data)
        assert got.shape == (2, 4, 4) and hdr["colorspace"] == "444"
        np.testing.assert_array_equal(got[1], y)
        # Cmono: no chroma at all
        mono = b"YUV4MPEG2 W4 H4 Cmono\n" + b"FRAME\n" + y.tobytes()
        gm, _ = decode_y4m(mono)
        np.testing.assert_array_equal(gm[0], y)

    def test_rejects_truncated_and_unknown_cs(self):
        good = encode_y4m(np.zeros((2, 2, 2), np.uint8))
        with pytest.raises(UnsupportedMediaError, match="truncated"):
            decode_y4m(good[:-3])
        with pytest.raises(UnsupportedMediaError, match="colorspace"):
            decode_y4m(b"YUV4MPEG2 W2 H2 C999weird\nFRAME\n\x00\x00\x00\x00")
        with pytest.raises(UnsupportedMediaError):
            decode_y4m(b"RIFF....WAVE")


class TestSparkAudioPath:
    def test_windowed_rms_features(self, spark):
        from gecko_spark.operators import multimodal as MM

        rate = 8000
        t = np.arange(rate, dtype=np.float64) / rate
        sine = (np.sin(2 * math.pi * 440 * t) * 30000).astype(np.int16)
        silence = np.zeros(rate, dtype=np.int16)
        loud_then_quiet = np.concatenate([sine, silence])
        rows = [
            (1, bytearray(encode_wav(sine, rate))),
            (2, bytearray(encode_wav(silence, rate))),
            (3, bytearray(encode_wav(loud_then_quiet, rate))),
            (4, None),
        ]
        df = spark.createDataFrame(rows, "media_id long, payload binary")
        media = MM.media_table(spark, df, "media_id", "payload", "audio/wav")
        got = {
            r["media_id"]: r
            for r in MM.decode_audio_features(media, out_dim=8, fake=False).collect()
        }
        # full-scale-ish sine: RMS ≈ 30000/32768/sqrt(2) ≈ 0.647 everywhere
        assert all(abs(v - 0.647) < 0.02 for v in got[1]["features"])
        assert got[1]["sample_rate"] == rate
        assert got[1]["duration_ms"] == 1000
        assert all(v == 0.0 for v in got[2]["features"])
        # first half loud, second half silent
        f3 = got[3]["features"]
        assert min(f3[:4]) > 0.6 and max(f3[4:]) < 0.01
        assert got[3]["duration_ms"] == 2000
        assert got[4]["features"] is None

    def test_fake_mode_any_payload(self, spark):
        from gecko_spark.operators import multimodal as MM

        df = spark.createDataFrame(
            [(1, bytearray(b"whatever bytes"))], "media_id long, payload binary"
        )
        media = MM.media_table(spark, df, "media_id", "payload", "audio/mpeg")
        out = MM.decode_audio_features(media, out_dim=4, fake=True).collect()[0]
        assert len(out["features"]) == 4 and out["sample_rate"] is None


class TestSparkVideoPath:
    def test_real_y4m_frame_sampling(self, spark):
        from gecko_spark.functions.codecs import decode_image
        from gecko_spark.operators import multimodal as MM

        # 12 frames, frame i filled with value 10*i
        planes = np.stack(
            [np.full((4, 6), 10 * i, np.uint8) for i in range(12)]
        )
        df = spark.createDataFrame(
            [(7, bytearray(encode_y4m(planes))), (8, None)],
            "media_id long, payload binary",
        )
        media = MM.media_table(spark, df, "media_id", "payload", "video/x-y4m")
        out = MM.sample_video_frames(
            media, every_n=5, max_frames=8, fake=False
        ).collect()
        by_idx = {r["frame_index"]: r for r in out}
        assert sorted(by_idx) == [0, 5, 10]  # null payload → no rows
        # each sampled frame is a decodable PGM of the right luma plane
        img = decode_image(bytes(by_idx[5]["frame"]))
        assert img.shape == (4, 6, 3)
        assert (img == 50).all()

    def test_non_y4m_raises(self, spark):
        from gecko_spark.operators import multimodal as MM

        df = spark.createDataFrame(
            [(1, bytearray(b"\x00\x00\x00\x18ftypmp42 fake mp4"))],
            "media_id long, payload binary",
        )
        media = MM.media_table(spark, df, "media_id", "payload", "video/mp4")
        with pytest.raises(Exception, match="YUV4MPEG2|UnsupportedMedia"):
            MM.sample_video_frames(media, fake=False).collect()

    def test_max_frames_cap(self, spark):
        from gecko_spark.operators import multimodal as MM

        planes = np.zeros((30, 2, 2), np.uint8)
        df = spark.createDataFrame(
            [(1, bytearray(encode_y4m(planes)))], "media_id long, payload binary"
        )
        media = MM.media_table(spark, df, "media_id", "payload", "video/x-y4m")
        out = MM.sample_video_frames(media, every_n=2, max_frames=5, fake=False)
        assert out.count() == 5


# -- IMA ADPCM (compressed audio, round 7) -----------------------------------


def test_ima_adpcm_hand_computed_block():
    """Decode a hand-built mono block against an in-test independent
    walk of the spec tables (predictor=100, index=4, nibbles
    0,1,...,7,8,...,15 twice over a 16-sample block)."""
    import struct

    from gecko_spark.functions.av_codecs import _IMA_STEPS, decode_wav

    nibbles = list(range(16))
    block = struct.pack("<hBB", 100, 4, 0) + bytes(
        nibbles[i] | (nibbles[i + 1] << 4) for i in range(0, 16, 2)
    )
    fmt = struct.pack("<HHIIHHHH", 0x11, 1, 8000, 4000, len(block), 4, 2, 17)
    body = (
        b"WAVE"
        + b"fmt " + struct.pack("<I", len(fmt)) + fmt
        + b"data" + struct.pack("<I", len(block)) + block
    )
    wav = b"RIFF" + struct.pack("<I", len(body)) + body
    samples, rate = decode_wav(wav)
    assert rate == 8000 and samples.shape == (17, 1)
    # independent reference walk (index table per spec)
    adjust = [-1, -1, -1, -1, 2, 4, 6, 8]
    pred, idx, want = 100, 4, [100]
    for nib in nibbles:
        step = int(_IMA_STEPS[idx])
        diff = step >> 3
        if nib & 1:
            diff += step >> 2
        if nib & 2:
            diff += step >> 1
        if nib & 4:
            diff += step
        pred = pred - diff if nib & 8 else pred + diff
        pred = max(-32768, min(32767, pred))
        idx = max(0, min(88, idx + adjust[nib & 7]))
        want.append(pred)
    assert samples[:, 0].tolist() == want


def test_ima_adpcm_roundtrip_sine_and_stereo():
    """encode -> decode round trip: ADPCM is lossy, but on a smooth
    signal the 4-bit adaptive delta tracks within a small fraction of
    full scale; stereo channels stay independent."""
    from gecko_spark.functions.av_codecs import (
        decode_wav,
        encode_wav_ima_adpcm,
        sniff_av_format,
    )

    t = np.arange(3000)
    sine = (8000 * np.sin(2 * np.pi * t / 200)).astype(np.int16)
    blob = encode_wav_ima_adpcm(sine, 16000)
    assert sniff_av_format(blob) == "wav"
    out, rate = decode_wav(blob)
    assert rate == 16000
    n = len(sine)
    err = np.abs(out[:n, 0].astype(np.int32) - sine.astype(np.int32))
    assert err.mean() < 300 and err.max() < 2500  # < ~1% / ~8% of range

    stereo = np.stack([sine, -sine], axis=1)
    out2, _ = decode_wav(encode_wav_ima_adpcm(stereo, 16000))
    e0 = np.abs(out2[:n, 0].astype(np.int32) - sine.astype(np.int32)).mean()
    e1 = np.abs(out2[:n, 1].astype(np.int32) + sine.astype(np.int32)).mean()
    assert e0 < 300 and e1 < 300


# -- Motion-JPEG AVI (compressed video, round 7) -----------------------------


def test_avi_mjpeg_roundtrip_and_codec_guard():
    from gecko_spark.functions.av_codecs import (
        UnsupportedMediaError,
        decode_avi_mjpeg,
        encode_avi_mjpeg,
        sniff_av_format,
    )
    from gecko_spark.functions.codecs import decode_jpeg, encode_jpeg_baseline

    rng = np.random.default_rng(3)
    frames = rng.integers(0, 256, (6, 16, 24, 3)).astype(np.uint8)
    blob = encode_avi_mjpeg(frames, fps=25)
    assert sniff_av_format(blob) == "avi"
    jpegs, hdr = decode_avi_mjpeg(blob)
    assert hdr == {"width": 24, "height": 16, "fps": 25.0, "n_frames": 6}
    for i, j in enumerate(jpegs):
        assert np.array_equal(
            decode_jpeg(j), decode_jpeg(encode_jpeg_baseline(frames[i], quality=85))
        )
    # a non-MJPG vids handler must raise, not mis-decode
    bad = blob.replace(b"vidsMJPG", b"vidsH264")
    import pytest as _pytest

    with _pytest.raises(UnsupportedMediaError, match="MJPG"):
        decode_avi_mjpeg(bad)
    with _pytest.raises(UnsupportedMediaError):
        decode_avi_mjpeg(b"RIFF\x04\x00\x00\x00AVI ")


def test_sample_video_frames_avi_matches_y4m_pipeline(spark):
    """The Spark frame sampler must treat an MJPEG AVI like a Y4M clip:
    every_n-th frame as PGM luma, decoding only sampled frames. Gray
    frames make luma recovery exact through JPEG (Cb=Cr=128 -> Y equals
    the gray value up to quantization of a CONSTANT block, which q90
    preserves exactly)."""
    from gecko_spark.functions.av_codecs import encode_avi_mjpeg
    from gecko_spark.operators import multimodal as MM

    levels = [40, 90, 140, 190, 240]
    frames = np.stack(
        [np.full((16, 16, 3), v, dtype=np.uint8) for v in levels]
    )
    blob = encode_avi_mjpeg(frames, fps=10, quality=90)
    df = spark.createDataFrame(
        [(1, bytearray(blob))], "media_id long, content binary"
    )
    got = (
        MM.sample_video_frames(df, every_n=2, max_frames=8, fake=False)
        .orderBy("frame_index")
        .collect()
    )
    assert [r["frame_index"] for r in got] == [0, 2, 4]
    for r, want in zip(got, [40, 140, 240]):
        payload = bytes(r["frame"])
        assert payload.startswith(b"P5\n16 16\n255\n")
        pix = np.frombuffer(payload.split(b"\n", 3)[3], dtype=np.uint8)
        assert np.abs(pix.astype(int) - want).max() <= 1


def test_av_decoders_raise_typed_error_on_malformed_streams():
    """Truncation + byte-corruption fuzz across all A/V decoders must
    only ever raise UnsupportedMediaError (same quarantine contract as
    the image decoders)."""
    from gecko_spark.functions.av_codecs import (
        UnsupportedMediaError,
        decode_avi_mjpeg,
        decode_wav,
        decode_y4m,
        encode_avi_mjpeg,
        encode_wav,
        encode_wav_ima_adpcm,
        encode_y4m,
    )

    rng = np.random.default_rng(4)
    sine = (5000 * np.sin(np.arange(900) / 40)).astype(np.int16)
    cases = [
        (encode_wav(sine, 8000), decode_wav),
        (encode_wav_ima_adpcm(sine, 8000), decode_wav),
        (encode_y4m(rng.integers(0, 256, (3, 16, 16)).astype(np.uint8)), decode_y4m),
        (
            encode_avi_mjpeg(rng.integers(0, 256, (3, 16, 16, 3)).astype(np.uint8)),
            decode_avi_mjpeg,
        ),
    ]
    for blob, dec in cases:
        for cut in range(1, len(blob), max(1, len(blob) // 40)):
            try:
                dec(blob[:cut])
            except UnsupportedMediaError:
                pass
        for _ in range(150):
            b = bytearray(blob)
            b[int(rng.integers(0, len(b)))] = int(rng.integers(0, 256))
            try:
                dec(bytes(b))
            except UnsupportedMediaError:
                pass
