"""WARC source scale datapoint: full-scan throughput vs CDXJ-indexed
selective fetch on a synthetic member-per-record crawl.

Builds N_FILES Common-Crawl-framed .warc.gz files of N_PER records each
(deterministic HTML bodies, ~BODY_BYTES each), writes the CDXJ index
from the spans `write_warc` returns, then measures:

  1. full scan (one partition per file) + count + body-byte sum
  2. indexed fetch of FRACTION of the records (ranged member reads)
  3. the same selection answered by scan+filter (what the fetch avoids)

Prints SCALE.md rows. Usage: python tools/scale_warc.py [n_files] [n_per]
"""

from __future__ import annotations

import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, ".")

from pyspark.sql import functions as F

from gecko_spark import get_spark
from gecko_spark.sources.warc import (
    fetch_warc_by_index,
    read_cdxj,
    read_warc,
    write_cdxj,
    write_warc,
)

N_FILES = int(sys.argv[1]) if len(sys.argv) > 1 else 16
N_PER = int(sys.argv[2]) if len(sys.argv) > 2 else 4_000
BODY_BYTES = 6_000
FRACTION = 100  # fetch 1/FRACTION of the records


def build(d: str) -> int:
    """Write the crawl + index; returns total compressed bytes."""
    entries = []
    filler = ("lorem ipsum dolor sit amet " * 400)[: BODY_BYTES - 60]
    for fno in range(N_FILES):
        recs = []
        for i in range(N_PER):
            rid = fno * N_PER + i
            body = (
                f"<html><head><title>doc {rid}</title></head>"
                f"<body><p>{filler}</p></body></html>"
            ).encode()
            http = (
                b"HTTP/1.1 200 OK\r\nContent-Type: text/html\r\n\r\n" + body
            )
            recs.append(
                dict(
                    warc_type="response",
                    record_id=f"<urn:rec:{rid}>",
                    target_uri=f"https://crawl.example/{rid:08d}",
                    warc_date="2024-06-01T00:00:00Z",
                    content_type="application/http; msgtype=response",
                    payload=http,
                )
            )
        fname = f"part-{fno:04d}.warc.gz"
        spans = write_warc(recs, os.path.join(d, fname))
        entries.extend(
            dict(url=r["target_uri"], filename=fname, offset=o, length=ln,
                 status=200, timestamp="20240601000000")
            for r, (o, ln) in zip(recs, spans)
        )
    write_cdxj(entries, os.path.join(d, "index.cdxj.gz"))
    return sum(
        os.path.getsize(os.path.join(d, f))
        for f in os.listdir(d)
        if f.endswith(".warc.gz")
    )


def main() -> None:
    spark = get_spark(app_name="warc-scale", cpus=16, shuffle_partitions=16)
    d = tempfile.mkdtemp(prefix="warc_scale_")
    try:
        t0 = time.time()
        total_bytes = build(d)
        t_build = time.time() - t0
        n = N_FILES * N_PER
        print(
            f"built {n:,} records / {N_FILES} files / "
            f"{total_bytes / 1e6:.0f} MB gz in {t_build:.1f}s"
        )

        glob = os.path.join(d, "*.warc.gz")
        t0 = time.time()
        scan = (
            read_warc(spark, glob, recordTypes="response")
            .agg(F.count("*").alias("n"), F.sum(F.length("payload")).alias("b"))
            .collect()[0]
        )
        t_scan = time.time() - t0
        assert scan.n == n, scan
        print(
            f"full scan: {t_scan:.1f}s  ({total_bytes / 1e6 / t_scan:.0f} MB/s "
            f"compressed, {scan.b / 1e6 / t_scan:.0f} MB/s decoded bodies, "
            f"{N_FILES} partitions)"
        )

        idx = read_cdxj(spark, os.path.join(d, "index.cdxj.gz"))
        pick = idx.filter(F.xxhash64("url") % FRACTION == 0)
        k = pick.count()
        t0 = time.time()
        fetched = fetch_warc_by_index(pick, d).agg(
            F.count("*").alias("n"), F.sum(F.length("payload")).alias("b")
        ).collect()[0]
        t_fetch = time.time() - t0
        assert fetched.n == k, (fetched, k)

        t0 = time.time()
        filt = (
            read_warc(spark, glob, recordTypes="response")
            .filter(F.xxhash64("target_uri") % FRACTION == 0)
            .agg(F.count("*").alias("n"))
            .collect()[0]
        )
        t_filter = time.time() - t0
        assert filt.n == k, (filt, k)
        print(
            f"indexed fetch of {k:,}/{n:,} records: {t_fetch:.1f}s "
            f"vs scan+filter {t_filter:.1f}s ({t_filter / t_fetch:.1f}x)"
        )
        print("\nSCALE.md rows:")
        print(
            f"| WARC full scan ({n / 1e3:.0f}k records, "
            f"{total_bytes / 1e6:.0f} MB gz, {N_FILES} files) | "
            f"{t_scan:.1f} s | {total_bytes / 1e6 / t_scan:.0f} MB/s "
            f"compressed per node |"
        )
        print(
            f"| CDXJ-indexed fetch of {k:,} records (1/{FRACTION}) | "
            f"{t_fetch:.1f} s | vs {t_filter:.1f} s scan+filter — "
            f"{t_filter / t_fetch:.1f}x |"
        )
    finally:
        shutil.rmtree(d, ignore_errors=True)
        spark.stop()


if __name__ == "__main__":
    main()
