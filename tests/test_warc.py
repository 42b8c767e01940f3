"""WARC source: parser framing, Spark DataSource scan, corpus shape.

The format is public (ISO 28500 / WARC 1.1); fixtures are built by the
in-repo writer and parsed back byte-exactly — plus hand-framed bytes so
the parser is not only tested against its own writer.
"""

import gzip
import io
import os

import pytest
from pyspark.sql import functions as F

from gecko_spark.sources.warc import (
    MalformedWarcError,
    _split_http,
    iter_warc_records,
    read_warc,
    warc_to_corpus,
    write_warc,
)


def _records(n=6):
    out = []
    for i in range(n):
        body = f"<html><title>page {i}</title><body>{'ab' * (10 * i)}</body></html>".encode()
        status = b"200 OK" if i % 3 else b"404 Not Found"
        http = (
            b"HTTP/1.1 " + status + b"\r\n"
            b"Content-Type: text/html; charset=utf-8\r\n"
            b"Server: t\r\n\r\n" + body
        )
        out.append(
            dict(
                warc_type="response",
                record_id=f"<urn:uuid:{i}>",
                target_uri=f"https://example.com/p{i}",
                warc_date="2024-05-01T12:00:00Z",
                content_type="application/http; msgtype=response",
                payload=http,
            )
        )
    out.append(
        dict(warc_type="warcinfo", payload=b"software: gecko\r\n",
             content_type="application/warc-fields")
    )
    return out


@pytest.mark.parametrize(
    "name,member_per_record",
    [("plain.warc", None), ("cc.warc.gz", True), ("whole.warc.gz", False)],
)
def test_roundtrip_all_framings(tmp_path, name, member_per_record):
    """Plain, Common Crawl member-per-record gzip, and whole-file gzip
    all parse back to the same records in order."""
    p = str(tmp_path / name)
    recs = _records()
    write_warc(recs, p, member_per_record=member_per_record)
    with open(p, "rb") as f:
        got = list(iter_warc_records(f, gzipped=name.endswith(".gz")))
    assert [r["record_seq"] for r in got] == list(range(len(recs)))
    assert [r["warc-type"] for r in got] == [r["warc_type"] for r in recs]
    for g, r in zip(got, recs):
        assert g["payload"] == r["payload"]
        assert not g["truncated"]


def test_parses_foreign_framing():
    """Hand-framed bytes (LF-only header line endings, no trailer at
    EOF, WARC/1.0) — not produced by the in-repo writer — still parse."""
    blob = (
        b"WARC/1.0\r\n"
        b"WARC-Type: resource\r\n"
        b"WARC-Target-URI: https://x/y\r\n"
        b"Content-Length: 5\r\n"
        b"\r\n"
        b"hello\r\n\r\n"
        b"WARC/1.0\r\nWARC-Type: resource\r\nContent-Length: 2\r\n\r\nhi"
    )
    got = list(iter_warc_records(io.BytesIO(blob)))
    assert [r["payload"] for r in got] == [b"hello", b"hi"]
    assert got[0]["warc-target-uri"] == "https://x/y"
    assert got[0]["__version__"] == "WARC/1.0"


def test_truncation_cap(tmp_path):
    p = str(tmp_path / "t.warc")
    write_warc(_records(), p)
    with open(p, "rb") as f:
        got = list(iter_warc_records(f, max_payload_bytes=30))
    assert len(got) == 7  # truncation must not desync later records
    for r in got:
        assert len(r["payload"]) <= 30
        assert r["truncated"] == (r["payload_length"] > 30)


def test_malformed_quarantine_and_strict(tmp_path):
    p = str(tmp_path / "t.warc")
    write_warc(_records(3), p)
    blob = open(p, "rb").read()
    chopped = io.BytesIO(blob[:-60])  # cut into the final record
    got = list(iter_warc_records(chopped))
    assert "__malformed__" in got[-1]
    assert all("__malformed__" not in r for r in got[:-1])
    with pytest.raises(MalformedWarcError):
        list(iter_warc_records(io.BytesIO(blob[:-60]), strict=True))
    got = list(iter_warc_records(io.BytesIO(b"NOT A WARC\r\n")))
    assert "__malformed__" in got[0]
    # oversized header block trips the sanity cap instead of buffering it
    big = b"WARC/1.1\r\nX: " + b"a" * (70 * 1024) + b"\r\n\r\n"
    got = list(iter_warc_records(io.BytesIO(big)))
    assert "__malformed__" in got[0]


def test_malformed_resync_recovers_rest_of_file(tmp_path):
    """A framing error in the MIDDLE of a file quarantines that record
    and resynchronises at the next WARC/ version marker — the records
    after the corruption still parse (module contract: one corrupt
    member must not cost the rest of the segment)."""
    import re

    p = str(tmp_path / "t.warc")
    write_warc(_records(3), p)
    blob = open(p, "rb").read()
    occ = [m.start() for m in re.finditer(rb"WARC/", blob)]
    assert len(occ) == 4  # 3 responses + warcinfo
    broken = bytearray(blob)
    broken[occ[1]] = ord("X")  # record 2's version line no longer parses
    got = list(iter_warc_records(io.BytesIO(bytes(broken))))
    assert ["__malformed__" in r for r in got] == [False, True, False, False]
    assert [r["record_seq"] for r in got] == [0, 1, 2, 3]
    assert got[2]["warc-target-uri"] == "https://example.com/p2"


def test_resync_marker_at_stream_start():
    """ADVICE r10 boundary case: when the failed parse leaves the
    stream positioned EXACTLY at a record boundary (the preceding
    newline already consumed, next bytes are ``WARC/...``), the resync
    scan must still find that record — the synthetic ``\\n`` seed in
    _resync_to_record covers the marker-at-offset-0 case that an empty
    seed buffer would silently skip past."""
    from gecko_spark.sources.warc import _resync_to_record

    rec = b"WARC/1.0\r\nWARC-Type: resource\r\nContent-Length: 2\r\n\r\nhi"
    tail = _resync_to_record(io.BytesIO(rec))
    assert tail is not None and tail.startswith(b"WARC/1.0")
    # and the end-to-end shape: a corrupt record whose quarantine scan
    # stops right before the next record's version line
    blob = (
        b"GARBAGE NOT A RECORD\n"  # malformed head, newline-terminated
        + rec
    )
    got = list(iter_warc_records(io.BytesIO(blob)))
    assert "__malformed__" in got[0]
    assert got[-1]["payload"] == b"hi"


def test_split_http():
    st, ct, body = _split_http(b"HTTP/1.1 301 Moved\r\nLocation: /x\r\ncontent-type: a/b\r\n\r\nBODY")
    assert (st, ct, body) == (301, "a/b", b"BODY")
    st, ct, body = _split_http(b"not http at all")
    assert (st, ct) == (None, None) and body == b"not http at all"


def test_datasource_scan(spark, tmp_path):
    recs = _records()
    write_warc(recs[:4], str(tmp_path / "f1.warc.gz"))
    write_warc(recs[4:], str(tmp_path / "f2.warc"))
    df = read_warc(spark, str(tmp_path))
    # one input partition per file — the 100 TB parallelism unit
    assert df.rdd.getNumPartitions() == 2
    assert df.count() == 7
    resp = read_warc(spark, str(tmp_path), recordTypes="response")
    assert resp.count() == 6
    row = resp.filter(F.col("target_uri") == "https://example.com/p1").first()
    assert row.http_status == 200
    assert row.http_content_type == "text/html; charset=utf-8"
    assert bytes(row.payload).startswith(b"<html><title>page 1")
    # raw mode keeps the HTTP envelope in the payload
    raw = read_warc(spark, str(tmp_path), recordTypes="response", parseHttp=False)
    assert bytes(raw.filter(F.col("target_uri") == "https://example.com/p1")
                 .first().payload).startswith(b"HTTP/1.1 200")


def test_datasource_malformed_rows(spark, tmp_path):
    p = str(tmp_path / "bad.warc")
    write_warc(_records(3), p)
    blob = open(p, "rb").read()
    with open(p, "wb") as f:
        f.write(blob[:-60])
    df = read_warc(spark, p)
    rows = df.collect()
    bad = [r for r in rows if r.warc_type == "__malformed__"]
    assert len(bad) == 1 and bytes(bad[0].payload)  # reason rides in payload
    assert len(rows) == 4  # 3 responses + 1 quarantine (warcinfo chopped)
    assert read_warc(spark, p, keepMalformed=False).count() == 3


def test_warc_to_corpus(spark, tmp_path):
    write_warc(_records(), str(tmp_path / "c.warc.gz"))
    corpus = warc_to_corpus(read_warc(spark, str(tmp_path)))
    pdf = corpus.toPandas().sort_values("text", ignore_index=True)
    assert list(corpus.columns) == ["doc_id", "text", "meta"]
    assert len(pdf) == 6  # warcinfo filtered out
    assert pdf["doc_id"].is_unique
    assert pdf["text"].str.startswith("<html><title>page ").all()
    # content-addressed ids: re-reading yields identical ids
    pdf2 = (warc_to_corpus(read_warc(spark, str(tmp_path)))
            .toPandas().sort_values("text", ignore_index=True))
    assert pdf["doc_id"].tolist() == pdf2["doc_id"].tolist()


def test_fixture_file_committed(spark):
    """The committed oracle fixture parses and matches its meta parquet
    (the same contract `corpus_warc` grades driver-side)."""
    fixdir = os.path.join(os.path.dirname(__file__), "fixtures")
    warc = os.path.join(fixdir, "corpus.warc.gz")
    if not os.path.exists(warc):
        pytest.skip("fixture not built")
    df = read_warc(spark, warc, recordTypes="response").toPandas()
    exp = spark.read.parquet(os.path.join(fixdir, "warc_expected.parquet")).toPandas()
    assert len(df) == len(exp)
    merged = df.merge(exp, left_on="target_uri", right_on="uri")
    assert len(merged) == len(exp)
    assert (merged["http_status"] == merged["status"]).all()
    assert (merged["payload"].map(bytes) == merged["body"].map(bytes)).all()


# --- CDX index layer: selective reads ---------------------------------------

from gecko_spark.sources.warc import (  # noqa: E402
    fetch_warc_by_index,
    read_cdxj,
    surt_key,
    write_cdxj,
)


def test_surt_key():
    assert surt_key("https://www.Example.com:443/Path/X?q=1") == "com,example,www)/path/x?q=1"
    assert surt_key("http://a.b.c:80/") == "c,b,a)/"
    assert surt_key("https://user@host.org") == "org,host)/"


def _indexed_crawl(tmp_path, files=3, per_file=6):
    entries = []
    for fno in range(files):
        recs = []
        for i in range(per_file):
            rid = fno * per_file + i
            body = f"<html>doc {rid}</html>".encode()
            http = b"HTTP/1.1 200 OK\r\nContent-Type: text/html\r\n\r\n" + body
            recs.append(
                dict(warc_type="response", record_id=f"<urn:uuid:{rid}>",
                     target_uri=f"https://ex.com/d{rid:02d}",
                     warc_date="2024-05-01T12:00:00Z",
                     content_type="application/http; msgtype=response",
                     payload=http)
            )
        fname = f"part-{fno}.warc.gz"
        spans = write_warc(recs, str(tmp_path / fname))
        for rec, (off, ln) in zip(recs, spans):
            entries.append(dict(url=rec["target_uri"], filename=fname,
                                offset=off, length=ln, status=200,
                                mime="text/html", timestamp="20240501120000"))
    write_cdxj(entries, str(tmp_path / "index.cdxj.gz"))
    return entries


def test_write_warc_spans_are_standalone_members(tmp_path):
    """Each (offset, length) span from member-per-record framing is one
    complete gzip member: seek+read+parse yields exactly that record."""
    entries = _indexed_crawl(tmp_path, files=1)
    with open(tmp_path / "part-0.warc.gz", "rb") as f:
        for e in entries:
            f.seek(e["offset"])
            member = f.read(e["length"])
            got = list(iter_warc_records(io.BytesIO(member), gzipped=True,
                                         strict=True))
            assert len(got) == 1
            assert got[0]["warc-target-uri"] == e["url"]


def test_cdxj_roundtrip(spark, tmp_path):
    entries = _indexed_crawl(tmp_path)
    idx = read_cdxj(spark, str(tmp_path / "index.cdxj.gz"))
    pdf = idx.toPandas().sort_values("url", ignore_index=True)
    assert len(pdf) == len(entries)
    assert pdf["surt_key"].is_monotonic_increasing  # SURT sort contract
    exp = sorted(entries, key=lambda e: e["url"])
    assert pdf["offset"].tolist() == [e["offset"] for e in exp]
    assert pdf["length"].tolist() == [e["length"] for e in exp]
    assert (pdf["status"] == 200).all()


def test_indexed_fetch_matches_full_scan(spark, tmp_path):
    _indexed_crawl(tmp_path)
    idx = read_cdxj(spark, str(tmp_path / "index.cdxj.gz"))
    want = ["https://ex.com/d03", "https://ex.com/d07", "https://ex.com/d12",
            "https://ex.com/d17"]
    fetched = (fetch_warc_by_index(idx.filter(F.col("url").isin(want)),
                                   str(tmp_path))
               .toPandas().sort_values("target_uri", ignore_index=True))
    scanned = (read_warc(spark, str(tmp_path / "*.warc.gz"),
                         recordTypes="response")
               .filter(F.col("target_uri").isin(want))
               .toPandas().sort_values("target_uri", ignore_index=True))
    assert fetched["target_uri"].tolist() == sorted(want)
    assert scanned["target_uri"].tolist() == fetched["target_uri"].tolist()
    for a, b in zip(fetched["payload"], scanned["payload"]):
        assert bytes(a) == bytes(b)
    assert (fetched["http_status"] == scanned["http_status"]).all()


def test_indexed_fetch_quarantines_bad_span(spark, tmp_path):
    _indexed_crawl(tmp_path, files=1)
    bad = spark.createDataFrame(
        [("part-0.warc.gz", 3, 50), ("part-0.warc.gz", 0, 207)],
        "filename string, offset long, length long",
    )
    rows = fetch_warc_by_index(bad, str(tmp_path)).collect()
    kinds = sorted(r.warc_type for r in rows)
    assert kinds == ["__malformed__", "response"]


# --- streaming ingestion ----------------------------------------------------

from gecko_spark.sources.warc import read_warc_stream  # noqa: E402


def _mk_segment(land, fno, n=4):
    recs = [
        dict(warc_type="response", target_uri=f"https://s.com/{fno:02d}-{i}",
             record_id=f"<urn:{fno}-{i}>", warc_date="2024-06-01T00:00:00Z",
             content_type="application/http; msgtype=response",
             payload=b"HTTP/1.1 200 OK\r\n\r\n"
             + f"<p>doc {fno}-{i}</p>".encode())
        for i in range(n)
    ]
    # a request record per segment: the recordTypes filter must drop it
    # in the STREAMING path too (regression: a dict-splatted copy of
    # the case-insensitive options once lowercased `recordTypes` away)
    recs.append(dict(warc_type="request", target_uri=f"https://s.com/{fno:02d}-0",
                     payload=b"GET / HTTP/1.1\r\n\r\n"))
    write_warc(recs, os.path.join(land, f"seg-{fno}.warc.gz"))


def test_stream_ingests_only_new_files(spark, tmp_path):
    """Micro-batches over a landing directory: each run processes
    exactly the files that arrived since the committed offset."""
    land = str(tmp_path / "land")
    ckpt = str(tmp_path / "ckpt")
    os.makedirs(land)
    captured = []

    def run_once():
        q = (read_warc_stream(spark, land, recordTypes="response")
             .writeStream.foreachBatch(
                 lambda df, bid: captured.append(
                     sorted(r.target_uri for r in df.collect())))
             .option("checkpointLocation", ckpt)
             .trigger(availableNow=True).start())
        q.awaitTermination()

    _mk_segment(land, 0)
    _mk_segment(land, 1)
    run_once()
    assert len(captured) == 1 and len(captured[0]) == 8

    _mk_segment(land, 2)
    run_once()  # same checkpoint: only seg-2 arrives
    assert captured[-1] == [f"https://s.com/02-{i}" for i in range(4)]

    run_once()  # nothing new: no rows delivered
    assert sum(len(c) for c in captured) == 12


def test_stream_schema_matches_batch(spark, tmp_path):
    land = str(tmp_path / "land")
    os.makedirs(land)
    _mk_segment(land, 0)
    stream_df = read_warc_stream(spark, land)
    batch_df = read_warc(spark, land)
    assert stream_df.schema == batch_df.schema
    assert stream_df.isStreaming


# --- property fuzz + plan shape ---------------------------------------------

from hypothesis import given, settings  # noqa: E402
from hypothesis import strategies as st  # noqa: E402


@settings(max_examples=30, deadline=None)
@given(
    payloads=st.lists(st.binary(min_size=0, max_size=400), min_size=1,
                      max_size=8),
    member_gz=st.booleans(),
)
def test_fuzz_roundtrip_arbitrary_payloads(tmp_path_factory, payloads,
                                           member_gz):
    """ANY byte payload round-trips through write->parse, in order,
    under both framings — the Content-Length framing must be binary-safe
    (payloads containing CRLF CRLF, fake 'WARC/1.1' headers, NULs...)."""
    d = tmp_path_factory.mktemp("fuzz")
    p = str(d / ("f.warc.gz" if member_gz else "f.warc"))
    recs = [dict(warc_type="resource", target_uri=f"urn:x:{i}", payload=b)
            for i, b in enumerate(payloads)]
    write_warc(recs, p, member_per_record=member_gz or None)
    with open(p, "rb") as f:
        got = list(iter_warc_records(f, gzipped=member_gz, strict=True))
    assert [r["payload"] for r in got] == payloads
    assert [r["warc-target-uri"] for r in got] == [f"urn:x:{i}"
                                                  for i in range(len(payloads))]


def test_plan_shapes(spark, tmp_path):
    """Scan: no Exchange anywhere (pure per-file source). Indexed fetch:
    exactly the one repartition-by-filename exchange."""
    _indexed_crawl(tmp_path, files=2)
    scan = read_warc(spark, str(tmp_path / "*.warc.gz"))
    p = scan._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in p, p
    idx = read_cdxj(spark, str(tmp_path / "index.cdxj.gz"))
    fetch = fetch_warc_by_index(idx, str(tmp_path))
    p = fetch._jdf.queryExecution().executedPlan().toString()
    assert p.count("Exchange") == 1, p
