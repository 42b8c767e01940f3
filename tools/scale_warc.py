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
    # pseudo-random words: compresses ~2.5x like real HTML, not the
    # ~20x a repeated phrase would (which would flatter MB/s decoded)
    words = [f"w{(i * 2654435761) % 99991:x}" for i in range(4096)]
    filler = " ".join(words)[: BODY_BYTES - 60]
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


def run_at(spark, d: str, n_files: int, k_target: int):
    """Build (if absent) and measure one corpus size. Returns
    (n_records, total_bytes, t_scan, k, t_fetch, t_filter)."""
    existing = [f for f in os.listdir(d) if f.endswith(".warc.gz")] if os.path.isdir(d) else []
    global N_FILES
    N_FILES = n_files
    if len(existing) != n_files:
        t0 = time.time()
        total_bytes = build(d)
        print(f"built {n_files * N_PER:,} records / {n_files} files / "
              f"{total_bytes / 1e6:.0f} MB gz in {time.time() - t0:.1f}s")
    else:
        total_bytes = sum(os.path.getsize(os.path.join(d, f)) for f in existing)
    n = n_files * N_PER

    glob = os.path.join(d, "*.warc.gz")
    # warm the Python DataSource workers: the first Python-source job
    # pays worker fork + import; a production scan amortizes it over
    # TBs, so time steady state
    read_warc(spark, os.path.join(d, "part-0000.warc.gz")).agg(F.count("*")).collect()
    t0 = time.time()
    scan = (
        read_warc(spark, glob, recordTypes="response")
        .agg(F.count("*").alias("n"), F.sum(F.length("payload")).alias("b"))
        .collect()[0]
    )
    t_scan = time.time() - t0
    assert scan.n == n, scan

    idx = read_cdxj(spark, os.path.join(d, "index.cdxj.gz"))
    mod = max(1, n // k_target)
    pick = idx.filter(F.xxhash64("url") % mod == 0)
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
        .filter(F.xxhash64("target_uri") % mod == 0)
        .agg(F.count("*").alias("n"))
        .collect()[0]
    )
    t_filter = time.time() - t0
    assert filt.n == k, (filt, k)
    return n, total_bytes, t_scan, k, t_fetch, t_filter


def main() -> None:
    """Measure scan + fixed-size indexed fetch at TWO corpus sizes: the
    scan cost must grow with the corpus while the fetch cost stays flat
    — the property that makes the index the only sane way to pull 10^6
    of 10^10 records at 100 TB."""
    spark = get_spark(app_name="warc-scale", cpus=16, shuffle_partitions=16)
    results = []
    try:
        for scale in (1, 3):
            d = tempfile.mkdtemp(prefix=f"warc_scale_{scale}_")
            try:
                r = run_at(spark, d, N_FILES * scale, k_target=640)
                results.append(r)
                n, tb, t_scan, k, t_fetch, t_filter = r
                print(
                    f"[{scale}x] scan {t_scan:.1f}s ({tb / 1e6 / t_scan:.0f} MB/s gz), "
                    f"fetch {k} recs {t_fetch:.1f}s, scan+filter {t_filter:.1f}s"
                )
            finally:
                shutil.rmtree(d, ignore_errors=True)
        (n1, b1, s1, k1, f1, g1), (n3, b3, s3, k3, f3, g3) = results
        print("\nSCALE.md rows:")
        print(
            f"| WARC full scan | {n1 / 1e3:.0f}k recs / {b1 / 1e6:.0f} MB gz: "
            f"{s1:.1f} s ({b1 / 1e6 / s1:.0f} MB/s) | "
            f"{n3 / 1e3:.0f}k recs / {b3 / 1e6:.0f} MB gz: {s3:.1f} s "
            f"({b3 / 1e6 / s3:.0f} MB/s) | grows with corpus |"
        )
        print(
            f"| CDXJ-indexed fetch of ~{k1} records | {f1:.1f} s | {f3:.1f} s | "
            f"flat — O(k) member reads; scan+filter pays {g1:.1f} s -> {g3:.1f} s |"
        )
    finally:
        spark.stop()


if __name__ == "__main__":
    main()
