"""Build the WARC ORACLE fixture: ``tests/fixtures/corpus.warc.gz``
(Common Crawl member-per-record framing) plus
``tests/fixtures/warc_expected.parquet`` holding each response's
expected (uri, status, content_type, body, length).

Same design as the media fixtures: the DECODED content of every record
is known in closed form and rides in the companion parquet, so the
DuckDB oracle replays the projection from the parquet while Spark
parses the actual WARC bytes — a mismatch means the parser broke. The
builder re-parses what it wrote and asserts byte equality before
committing anything.

Pages are deterministic synthetic HTML; a few shapes are planted on
purpose: a 404, a non-HTML JSON body, a redirect with empty body, a
non-response (request) record the contract query must filter out, and
one UTF-8 multibyte body.
"""

from __future__ import annotations

import os
import sys

import pyarrow as pa
import pyarrow.parquet as pq

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from gecko_spark.sources.warc import iter_warc_records, write_warc  # noqa: E402

OUT_DIR = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "tests", "fixtures",
)


def build_records():
    recs, expected = [], []

    def page(i: int, status: int, reason: str, ctype: str, body: bytes):
        http = (
            f"HTTP/1.1 {status} {reason}\r\n"
            f"Content-Type: {ctype}\r\n"
            "Server: fixture\r\n\r\n"
        ).encode() + body
        uri = f"https://corpus.example/{i:03d}"
        recs.append(
            dict(
                warc_type="response",
                record_id=f"<urn:fixture:{i}>",
                target_uri=uri,
                warc_date=f"2024-06-{(i % 28) + 1:02d}T00:00:00Z",
                content_type="application/http; msgtype=response",
                payload=http,
            )
        )
        expected.append(
            dict(uri=uri, status=status, content_type=ctype, body=body,
                 length=len(body))
        )

    for i in range(12):
        words = " ".join(f"w{(7 * i + 3 * j) % 19}" for j in range(20 + 5 * i))
        page(i, 200, "OK", "text/html; charset=utf-8",
             f"<html><head><title>doc {i}</title></head><body><p>{words}</p></body></html>".encode())
    page(12, 404, "Not Found", "text/html", b"<html><body>missing</body></html>")
    page(13, 200, "OK", "application/json", b'{"k": [1, 2, 3], "name": "fixture"}')
    page(14, 301, "Moved Permanently", "text/html", b"")
    page(15, 200, "OK", "text/plain; charset=utf-8",
         "ünïcode — 文字 🙂 plain text body".encode())
    # a request record: NOT in expected — the contract filters to responses
    recs.insert(
        3,
        dict(warc_type="request", target_uri="https://corpus.example/000",
             content_type="application/http; msgtype=request",
             payload=b"GET /000 HTTP/1.1\r\nHost: corpus.example\r\n\r\n"),
    )
    return recs, expected


def main() -> None:
    recs, expected = build_records()
    warc_path = os.path.join(OUT_DIR, "corpus.warc.gz")
    write_warc(recs, warc_path)  # member-per-record (CC framing)

    # cross-check: re-parse the committed bytes, assert every response
    # round-trips to the expected body before writing the parquet
    with open(warc_path, "rb") as f:
        parsed = [
            r for r in iter_warc_records(f, gzipped=True)
            if r.get("warc-type") == "response"
        ]
    assert len(parsed) == len(expected)
    by_uri = {r["warc-target-uri"]: r for r in parsed}
    for e in expected:
        body = by_uri[e["uri"]]["payload"].split(b"\r\n\r\n", 1)[1]
        assert body == e["body"], e["uri"]

    table = pa.table(
        {
            "uri": pa.array([e["uri"] for e in expected]),
            "status": pa.array([e["status"] for e in expected], pa.int32()),
            "content_type": pa.array([e["content_type"] for e in expected]),
            "body": pa.array([e["body"] for e in expected], pa.binary()),
            "length": pa.array([e["length"] for e in expected], pa.int64()),
        }
    )
    pq.write_table(table, os.path.join(OUT_DIR, "warc_expected.parquet"))
    print(f"wrote {warc_path} ({len(recs)} records, {len(expected)} responses)")


if __name__ == "__main__":
    main()
