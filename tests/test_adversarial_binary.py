"""Adversarial BINARY fixtures (round 13, VERDICT r12 #6): the
six-table pathology gate never pointed at the byte-level parsers. These
tests corrupt real WARC/JPEG/ADPCM streams mid-file and pin EXACT
recovery contracts — which records survive, byte-for-byte — not just
"doesn't crash":

* WARC mid-segment corruption (version line, Content-Length header,
  truncated payload, overshooting declared length) → one quarantine
  marker + resync recovers every later record byte-exactly, both at the
  iterator and through the Spark DataSource scan;
* truncated JPEG mid-entropy-stream → decoder raises the typed error;
  through the mapInPandas feature path the default still fails the job
  while ``on_error="null"`` quarantines ONLY the corrupt payload and
  its batch neighbors decode exactly as they do in a clean run;
* IMA-ADPCM block-boundary edges → round-trip sample counts pinned at
  exactly-k-blocks and k-blocks±1 (encoder pads the final block by
  repeating the last frame), and a mid-block truncated stream decodes
  the complete blocks only (documented drop-the-tail semantics).
"""

from __future__ import annotations

import io

import numpy as np
import pytest


# ---------------------------------------------------------------------------
# WARC corruption + resync (sources/warc.py:108)
# ---------------------------------------------------------------------------


def _mk_record(uri: str, payload: bytes) -> bytes:
    hdr = (
        f"WARC/1.1\r\n"
        f"WARC-Type: response\r\n"
        f"WARC-Record-ID: <urn:test:{uri}>\r\n"
        f"WARC-Target-URI: http://example.com/{uri}\r\n"
        f"Content-Length: {len(payload)}\r\n\r\n"
    ).encode()
    return hdr + payload + b"\r\n\r\n"


def _payloads(n: int) -> list[bytes]:
    # deterministic, "WARC/"-free binary-ish payloads of varied size
    return [
        (b"payload-%d-" % i) + bytes((i * 7 + j) % 256 for j in range(20 + 13 * i))
        for i in range(n)
    ]


def _good_and_malformed(data: bytes):
    from gecko_spark.sources.warc import iter_warc_records

    good, bad = [], []
    for rec in iter_warc_records(io.BytesIO(data)):
        (bad if "__malformed__" in rec else good).append(rec)
    return good, bad


def test_warc_resync_after_corrupt_version_line():
    pays = _payloads(7)
    recs = [_mk_record(f"doc{i}", p) for i, p in enumerate(pays)]
    recs[3] = b"XARC" + recs[3][4:]  # destroy record 3's version marker
    good, bad = _good_and_malformed(b"".join(recs))
    assert len(bad) == 1 and "version line" in bad[0]["__malformed__"]
    assert [r["payload"] for r in good] == [
        p for i, p in enumerate(pays) if i != 3
    ]


def test_warc_resync_after_corrupt_content_length():
    pays = _payloads(7)
    recs = [_mk_record(f"doc{i}", p) for i, p in enumerate(pays)]
    recs[3] = recs[3].replace(
        b"Content-Length: %d" % len(pays[3]), b"Content-Length: banana"
    )
    good, bad = _good_and_malformed(b"".join(recs))
    assert len(bad) == 1 and "Content-Length" in bad[0]["__malformed__"]
    # record 3's own payload is quarantined with it; 4..6 recover
    assert [r["payload"] for r in good] == [
        p for i, p in enumerate(pays) if i != 3
    ]


def test_warc_truncated_final_payload():
    pays = _payloads(5)
    recs = [_mk_record(f"doc{i}", p) for i, p in enumerate(pays)]
    # record 4 declares its full length but the file ends mid-payload
    recs[4] = recs[4][: len(recs[4]) - len(pays[4]) // 2 - 4]
    good, bad = _good_and_malformed(b"".join(recs))
    assert len(bad) == 1 and "shorter" in bad[0]["__malformed__"]
    assert [r["payload"] for r in good] == pays[:4]


def test_warc_overshooting_length_swallows_then_resyncs():
    """A declared Content-Length LARGER than the true payload is
    undetectable per se (the declared length is authoritative) — the
    read swallows the next record's header bytes, the parse fails
    THERE, and resync recovers from the record after. The contract is
    the blast radius: exactly the swallowed neighbor is lost."""
    pays = _payloads(7)
    recs = [_mk_record(f"doc{i}", p) for i, p in enumerate(pays)]
    bad_hdr = b"Content-Length: %d" % len(pays[2])
    # +10 bytes: past record 2's trailer (4) into record 3's version line
    recs[2] = recs[2].replace(bad_hdr, b"Content-Length: %d" % (len(pays[2]) + 10))
    good, bad = _good_and_malformed(b"".join(recs))
    assert len(bad) == 1
    got = [r["payload"] for r in good]
    # records 0,1 exact; record 2 carries 10 stolen bytes (authoritative
    # length); record 3's mangled header quarantines it; 4..6 recover
    assert got[0:2] == pays[0:2]
    assert got[2].startswith(pays[2]) and len(got[2]) == len(pays[2]) + 10
    assert got[3:] == pays[4:]


def test_warc_resync_through_spark_datasource(spark, tmp_path):
    """End-to-end through the Python DataSource scan: the corrupt
    member becomes one filterable __malformed__ row, every other
    record's body arrives byte-exact."""
    import hashlib

    from gecko_spark.sources.warc import read_warc

    pays = _payloads(9)
    recs = [_mk_record(f"doc{i}", p) for i, p in enumerate(pays)]
    recs[4] = b"XARC" + recs[4][4:]
    path = tmp_path / "corrupt.warc"
    path.write_bytes(b"".join(recs))
    df = read_warc(spark, str(path)).cache()
    try:
        marks = df.filter("warc_type = '__malformed__'").collect()
        assert len(marks) == 1
        assert b"version line" in bytes(marks[0]["payload"])
        good = {
            r["target_uri"]: bytes(r["payload"])
            for r in df.filter("warc_type = 'response'").collect()
        }
        want = {
            f"http://example.com/doc{i}": p
            for i, p in enumerate(pays)
            if i != 4
        }
        assert {
            k: hashlib.md5(v).hexdigest() for k, v in good.items()
        } == {k: hashlib.md5(v).hexdigest() for k, v in want.items()}
        # strict mode refuses instead of resyncing
        with pytest.raises(Exception, match="expected WARC version line"):
            read_warc(spark, str(path), strict=True).collect()
    finally:
        df.unpersist()


# ---------------------------------------------------------------------------
# Truncated JPEG mid-entropy-stream (functions/codecs.py)
# ---------------------------------------------------------------------------


def _mk_jpeg(seed: int) -> tuple[bytes, np.ndarray]:
    from gecko_spark.functions.codecs import decode_jpeg, encode_jpeg_baseline

    rng = np.random.default_rng(seed)
    img = rng.integers(0, 256, size=(24, 24, 3), dtype=np.uint8)
    enc = encode_jpeg_baseline(img)
    return enc, decode_jpeg(enc)


def _truncate_mid_scan(jpeg: bytes) -> bytes:
    # cut inside the entropy-coded scan: past the SOS header, before EOI
    sos = jpeg.find(b"\xff\xda")
    assert sos != -1
    cut = sos + (len(jpeg) - sos) // 2
    return jpeg[:cut]


def test_truncated_jpeg_raises_typed_error():
    from gecko_spark.functions.codecs import UnsupportedImageError, decode_jpeg

    enc, _ = _mk_jpeg(1)
    with pytest.raises(UnsupportedImageError):
        decode_jpeg(_truncate_mid_scan(enc))


def test_truncated_jpeg_quarantines_per_payload(spark):
    """One corrupt payload in a batch: default mode fails the job with
    the decoder's message; on_error='null' quarantines that row alone
    and the neighbors' features equal the clean run's bit-for-bit."""
    from gecko_spark.operators.multimodal import decode_image_features

    good = [_mk_jpeg(s)[0] for s in (1, 2, 3, 4)]
    corrupt = _truncate_mid_scan(good[2])
    rows = [
        (0, good[0], "image/jpeg"),
        (1, good[1], "image/jpeg"),
        (2, corrupt, "image/jpeg"),
        (3, good[3], "image/jpeg"),
    ]
    df = spark.createDataFrame(
        rows, "media_id long, content binary, mime string"
    ).repartition(1)  # one Arrow batch: the corrupt row has neighbors
    with pytest.raises(Exception, match="truncated JPEG"):
        decode_image_features(df, out_dim=16).collect()
    out = {
        r["media_id"]: r
        for r in decode_image_features(df, out_dim=16, on_error="null").collect()
    }
    assert out[2]["features"] is None
    assert "truncated JPEG" in out[2]["error"]
    clean = {
        r["media_id"]: r["features"]
        for r in decode_image_features(
            spark.createDataFrame(
                [(i, g, "image/jpeg") for i, g in enumerate(good)],
                "media_id long, content binary, mime string",
            ),
            out_dim=16,
        ).collect()
    }
    for i in (0, 1, 3):
        assert out[i]["error"] is None
        assert out[i]["features"] == clean[i]
    with pytest.raises(ValueError, match="on_error"):
        decode_image_features(df, on_error="banana")


# ---------------------------------------------------------------------------
# IMA-ADPCM block boundaries + truncation (functions/av_codecs.py)
# ---------------------------------------------------------------------------


def _tone(n: int) -> np.ndarray:
    t = np.arange(n, dtype=np.float64)
    return (3000 * np.sin(t / 9.0) + 800 * np.sin(t / 2.3)).astype(np.int16)


@pytest.mark.parametrize("delta", [-1, 0, 1])
def test_adpcm_block_boundary_roundtrip(delta):
    """n = k·spb + delta: decode length is ceil(n/spb)·spb — exact at
    the boundary, padded (last frame repeated) off it. The decoded
    prefix must track the signal (ADPCM is lossy; the contract is
    structural exactness + bounded error)."""
    from gecko_spark.functions.av_codecs import decode_wav, encode_wav_ima_adpcm

    spb = 505
    n = 3 * spb + delta
    sig = _tone(n)
    enc = encode_wav_ima_adpcm(sig, 8000, samples_per_block=spb)
    dec, rate = decode_wav(enc)
    assert rate == 8000
    blocks = -(-n // spb)  # ceil
    assert dec.shape == (blocks * spb, 1)
    # each block's header carries the exact first sample
    for b in range(blocks):
        assert dec[b * spb, 0] == sig[min(b * spb, n - 1)]
    err = np.abs(dec[:n, 0].astype(np.int32) - sig.astype(np.int32))
    assert float(np.mean(err)) < 2000  # tracks, not garbage
    if delta == 1:
        # padding encodes a REPEATED final frame: the quantizer keeps
        # stepping, so decoded padding oscillates toward that value —
        # pin that it stays in a tight band around it, not garbage
        assert np.all(
            np.abs(dec[n:, 0].astype(np.int32) - int(sig[n - 1])) < 300
        )


def test_adpcm_truncated_tail_drops_partial_block():
    """A mid-block truncated data chunk decodes the COMPLETE blocks
    only — the partial tail is dropped, never a crash or garbage
    samples (documented drop-the-tail semantics at dedup boundary)."""
    import struct

    from gecko_spark.functions.av_codecs import decode_wav, encode_wav_ima_adpcm

    spb = 505
    sig = _tone(3 * spb)
    enc = bytearray(encode_wav_ima_adpcm(sig, 8000, samples_per_block=spb))
    di = bytes(enc).find(b"data")
    size = struct.unpack_from("<I", enc, di + 4)[0]
    drop = 57  # not a multiple of block_align: mid-block cut
    enc[di + 4 : di + 8] = struct.pack("<I", size - drop)
    trunc = bytes(enc[: len(enc) - drop])
    full, _ = decode_wav(bytes(enc))
    dec, rate = decode_wav(trunc)
    assert dec.shape == (2 * spb, 1)  # 2 complete blocks survive
    assert np.array_equal(dec, full[: 2 * spb])


def test_adpcm_corrupt_step_index_quarantines_in_audio_path(spark):
    """A corrupt in-range→out-of-range step index is a typed decode
    error; through decode_audio_features the default fails the job and
    on_error='null' quarantines only that payload."""
    import struct

    from gecko_spark.functions.av_codecs import encode_wav, encode_wav_ima_adpcm
    from gecko_spark.operators.multimodal import decode_audio_features

    good_wav = encode_wav(_tone(2000), 8000)
    bad = bytearray(encode_wav_ima_adpcm(_tone(1010), 8000))
    di = bytes(bad).find(b"data")
    bad[di + 8 + 2] = 200  # first block's step index: 200 > 88
    rows = [(0, good_wav, "audio/wav"), (1, bytes(bad), "audio/wav")]
    df = spark.createDataFrame(
        rows, "media_id long, content binary, mime string"
    ).repartition(1)
    with pytest.raises(Exception, match="step index"):
        decode_audio_features(df, out_dim=8).collect()
    out = {
        r["media_id"]: r
        for r in decode_audio_features(df, out_dim=8, on_error="null").collect()
    }
    assert out[1]["features"] is None and "step index" in out[1]["error"]
    assert out[0]["error"] is None and out[0]["sample_rate"] == 8000
    assert len(out[0]["features"]) == 8


def test_corrupt_video_payload_emits_no_rows_with_on_error_null(spark):
    from gecko_spark.functions.av_codecs import encode_y4m
    from gecko_spark.operators.multimodal import sample_video_frames

    rng = np.random.default_rng(7)
    frames = rng.integers(0, 256, size=(6, 8, 8), dtype=np.uint8)
    clip = encode_y4m(frames, 25, 1)
    # a TRUNCATED y4m decodes tolerantly (drops the partial tail, like
    # ADPCM) — pin that first, then use a corrupt-header clip for the
    # typed-error quarantine contract
    from gecko_spark.functions.av_codecs import decode_y4m

    planes, _ = decode_y4m(clip[: len(clip) // 2])
    assert planes.shape[0] == 3  # 3 of 6 frames survive, no crash
    corrupt = b"YUV4MPEG2 Wx H8 F25:1\nFRAME\n" + clip[-96:]
    df = spark.createDataFrame(
        [(0, clip), (1, corrupt)], "media_id long, content binary"
    ).repartition(1)
    with pytest.raises(Exception, match="malformed y4m"):
        sample_video_frames(df, every_n=2).collect()
    rows = sample_video_frames(df, every_n=2, on_error="null").collect()
    ids = {r["media_id"] for r in rows}
    assert ids == {0}  # corrupt clip quarantined whole, good clip intact
    assert len(rows) == 3  # frames 0, 2, 4


def test_corrupt_mjpeg_avi_quarantined_per_clip(spark):
    """MJPEG twin of the y4m case (round 14, VERDICT r13 #4): an AVI
    truncated inside the movi chunk — container magic and stream
    headers intact, sampled frame's JPEG bytes cut — raises a typed
    error under the default and drops ONLY the corrupt clip under
    on_error='null', while the sibling AVI decodes in the same batch."""
    from gecko_spark.functions.av_codecs import encode_avi_mjpeg
    from gecko_spark.operators.multimodal import sample_video_frames

    frames = np.stack(
        [np.full((8, 8, 3), 40 * (i + 1), dtype=np.uint8) for i in range(5)]
    )
    clip = encode_avi_mjpeg(frames, fps=10)
    corrupt = clip[: int(len(clip) * 0.6)]  # cut mid-movi
    df = spark.createDataFrame(
        [(0, clip), (1, corrupt)], "media_id long, content binary"
    ).repartition(1)
    with pytest.raises(Exception):
        sample_video_frames(df, every_n=2, max_frames=3).collect()
    rows = sample_video_frames(
        df, every_n=2, max_frames=3, on_error="null"
    ).collect()
    assert {r["media_id"] for r in rows} == {0}
    assert len(rows) == 3  # frames 0, 2, 4 of the clean clip


# ---------------------------------------------------------------------------
# Gzip-member corruption + resync (round 13: _ResyncGzipRaw)
# ---------------------------------------------------------------------------
# Common Crawl frames one gzip MEMBER per record; gzip.GzipFile
# propagates the first corrupt member as BadGzipFile/EOFError and the
# whole ~1 GB file dies. The resync layer must skip member-wise.


import gzip as _gzip


def _gz_members(recs: list[bytes]) -> list[bytes]:
    return [_gzip.compress(r) for r in recs]


def _good_and_malformed_gz(data: bytes):
    from gecko_spark.sources.warc import iter_warc_records

    good, bad = [], []
    for rec in iter_warc_records(io.BytesIO(data), gzipped=True):
        (bad if "__malformed__" in rec else good).append(rec)
    return good, bad


def test_warc_gzip_member_resync_after_bitflip():
    pays = _payloads(7)
    members = _gz_members([_mk_record(f"doc{i}", p) for i, p in enumerate(pays)])
    m = bytearray(members[3])
    mid = len(m) // 2
    m[mid] ^= 0xFF  # flip a deflate byte mid-member
    m[mid + 1] ^= 0xFF
    members[3] = bytes(m)
    good, bad = _good_and_malformed_gz(b"".join(members))
    assert len(bad) >= 1 and any(
        "gzip" in b["__malformed__"] or "WARC" in b["__malformed__"] for b in bad
    )
    assert [r["payload"] for r in good] == [
        p for i, p in enumerate(pays) if i != 3
    ]
    # strict mode: gzip.GzipFile propagates the corruption
    from gecko_spark.sources.warc import iter_warc_records

    with pytest.raises(Exception):
        list(iter_warc_records(io.BytesIO(b"".join(members)),
                               gzipped=True, strict=True))


def test_warc_gzip_truncated_final_member():
    pays = _payloads(5)
    members = _gz_members([_mk_record(f"doc{i}", p) for i, p in enumerate(pays)])
    members[4] = members[4][: len(members[4]) // 2]
    good, bad = _good_and_malformed_gz(b"".join(members))
    assert [r["payload"] for r in good] == pays[:4]
    assert len(bad) == 1
    reason = bad[0]["__malformed__"]
    assert "gzip" in reason or "shorter" in reason


def test_warc_gzip_single_member_truncated_keeps_prefix():
    """Whole-file single-member gzip truncated mid-stream: the tail is
    gone (no later member magic to resync to) but the prefix records
    survive — the 64 KiB decompress sub-slicing means everything
    decoded before the break is already served, instead of the whole
    file dying the way gzip.GzipFile's EOFError would. Incompressible
    ~60 KB payloads make the compressed stream span many slices."""
    rng = np.random.default_rng(3)
    pays = [rng.integers(0, 256, size=60_000, dtype=np.uint8).tobytes()
            for _ in range(6)]
    blob = _gzip.compress(b"".join(_mk_record(f"doc{i}", p)
                                   for i, p in enumerate(pays)))
    good, bad = _good_and_malformed_gz(blob[: int(len(blob) * 0.7)])
    assert bad and any("gzip" in b["__malformed__"] for b in bad)
    got = [r["payload"] for r in good]
    # a clean prefix of the record sequence survives, the tail is lost
    assert 0 < len(got) < 6
    assert got == pays[: len(got)]


def test_warc_gzip_crc_corruption_flags_but_serves():
    """A bit-flip inside a STORED deflate block decompresses 'cleanly'
    (the flipped byte just changes value) and only the member CRC
    catches it — the documented outcome is: records served (one
    carrying the flipped byte), plus a corrupt-member marker at the
    member boundary. Incompressible payloads force stored blocks."""
    rng = np.random.default_rng(5)
    pays = [rng.integers(0, 256, size=60_000, dtype=np.uint8).tobytes()
            for _ in range(4)]
    blob = bytearray(_gzip.compress(b"".join(
        _mk_record(f"doc{i}", p) for i, p in enumerate(pays))))
    blob[int(len(blob) * 0.5)] ^= 0xFF
    good, bad = _good_and_malformed_gz(bytes(blob))
    assert any("incorrect data check" in b["__malformed__"] for b in bad)
    # every record framed correctly; exactly one differs by one byte
    got = [r["payload"] for r in good if len(r["payload"]) == 60_000]
    diffs = sum(1 for g, p in zip(got, pays) if g != p)
    assert len(got) >= 3 and diffs <= 1


def test_warc_gzip_member_resync_through_spark(spark, tmp_path):
    from gecko_spark.sources.warc import read_warc

    pays = _payloads(9)
    members = _gz_members([_mk_record(f"doc{i}", p) for i, p in enumerate(pays)])
    m = bytearray(members[4])
    m[len(m) // 2] ^= 0xFF
    members[4] = bytes(m)
    path = tmp_path / "corrupt.warc.gz"
    path.write_bytes(b"".join(members))
    df = read_warc(spark, str(path)).cache()
    try:
        assert df.filter("warc_type = '__malformed__'").count() >= 1
        good = {
            r["target_uri"]: bytes(r["payload"])
            for r in df.filter("warc_type = 'response'").collect()
        }
        assert good == {
            f"http://example.com/doc{i}": p
            for i, p in enumerate(pays) if i != 4
        }
        with pytest.raises(Exception):
            read_warc(spark, str(path), strict=True).collect()
    finally:
        df.unpersist()


def test_warc_gzip_bounded_output_per_feed():
    """ADVICE r13 (medium): deflate expands up to ~1030:1, so an
    unbounded feed of one 1 MiB raw chunk could buffer ~1 GiB of
    decompressed output. The resync reader must pass max_length so its
    internal out-buffer never exceeds _OUT_CAP, requeueing unconsumed
    input instead. A 64 MiB all-zeros member compresses to ~64 KiB —
    one raw chunk — which the old code decompressed in full."""
    from gecko_spark.sources.warc import _ResyncGzipRaw

    plain = b"\x00" * (64 << 20)
    blob = _gzip.compress(plain)
    assert len(blob) < (1 << 20)  # the whole member arrives in ONE feed
    r = _ResyncGzipRaw(io.BytesIO(blob))
    got = 0
    peak = 0
    buf = bytearray(256 * 1024)
    while True:
        n = r.readinto(buf)
        if n == 0:
            break
        assert bytes(buf[:n]) == b"\x00" * n
        got += n
        peak = max(peak, len(r._out))
    assert got == len(plain)
    assert peak <= _ResyncGzipRaw._OUT_CAP


def test_warc_gzip_false_magic_reserved_flg_skipped():
    """ADVICE r13 (low): after a corrupt member, the magic rescan used
    to accept any 1f 8b 08 triple; a false hit spawned a bogus
    decompressor that failed again, inflating the quarantine-marker
    count. The scan now also checks the FLG byte's RFC 1952 reserved
    bits, so a fake magic with FLG=0xFF between the corruption and the
    next real member is skipped without an extra marker."""
    pays = _payloads(5)
    members = _gz_members(
        [_mk_record(f"doc{i}", p) for i, p in enumerate(pays)]
    )
    m = bytearray(members[2])
    m[len(m) // 2] ^= 0xFF
    members[2] = bytes(m)
    # junk after the corrupt member carrying a reserved-FLG fake magic
    junk = b"XX" + b"\x1f\x8b\x08\xff" + b"ZZZZ" + b"\x1f\x8b\x08\xe1" + b"Q"
    blob = b"".join(members[:3]) + junk + b"".join(members[3:])
    good, bad = _good_and_malformed_gz(blob)
    # one corruption event -> markers for it, but the fake magics add
    # no decompressor-spawn-and-fail cycle beyond the real corruption
    assert [r["payload"] for r in good] == [
        p for i, p in enumerate(pays) if i != 2
    ]
    assert 1 <= len(bad) <= 2  # corrupt member (+ possibly junk span)
    # a fake-magic-spawned decompressor would add 'corrupt gzip member:
    # Error -3' markers per fake magic; assert none beyond the first
    gzip_markers = [b for b in bad if "gzip" in b["__malformed__"]]
    assert len(gzip_markers) <= 1


def test_warc_gzip_flg_straddles_chunk_seam():
    """A real member whose FLG byte lands exactly past a 1 MiB read
    boundary must still be accepted: the scan reads ahead before
    judging the candidate instead of dropping it."""
    from gecko_spark.sources.warc import _ResyncGzipRaw

    pays = _payloads(4)
    members = _gz_members(
        [_mk_record(f"doc{i}", p) for i, p in enumerate(pays)]
    )
    m = bytearray(members[1])
    m[len(m) // 2] ^= 0xFF
    members[1] = bytes(m)
    # pad the junk so the NEXT member's magic sits 3 bytes before a
    # 1 MiB boundary: magic in chunk k, FLG in chunk k+1
    prefix = b"".join(members[:2])
    pad_len = (1 << 20) - ((len(prefix)) % (1 << 20)) - 3
    blob = prefix + b"J" * pad_len + b"".join(members[2:])
    good, bad = _good_and_malformed_gz(blob)
    assert [r["payload"] for r in good] == [
        p for i, p in enumerate(pays) if i != 1
    ]
    assert len(bad) >= 1
