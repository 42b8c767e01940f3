"""End-to-end example: web-crawl ingestion — the front half of a
pretraining pipeline, from raw WARC bytes to a deduplicated corpus,
plus the selective re-fetch path a 100 TB deployment uses:

  0. synth crawl        (write a small member-per-record .warc.gz crawl
                         + its CDXJ index — stands in for a Common
                         Crawl segment; every stage downstream is
                         exactly what it would be against the real one)
  1. full scan          (spark.read.format("warc") — one input
                         partition per file, streaming bounded-memory
                         record parse, HTTP envelope split)
  2. corpus shape       (warc_to_corpus — content-addressed doc_id,
                         text, json meta)
  3. content extraction (text.extract_main_content — jusText-style
                         block scoring: nav/script/footer never reach
                         the corpus)
  4. quality + lang     (text.text_stats projection)
  5. exact dedup        (dedup.dedupe_exact — mirrored pages collapse)
  5b. published gates   (gopher_quality_flags / gopher_repetition_flags
                         / c4_clean as a pass-rate report)
  6. selective fetch    (read_cdxj + fetch_warc_by_index — ranged gzip-
                         member reads of an index selection: the
                         "re-pull these 10^6 of 10^10 records" path
                         that must never scan the crawl)

Run: python examples/warc_ingest.py [out_dir]  (the crawl is
synthesized — no testdata dependency)
"""

from __future__ import annotations

import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from gecko_spark import get_spark
from gecko_spark.operators.dedup import dedupe_exact
from gecko_spark.operators.text import (
    c4_clean,
    extract_main_content,
    gopher_quality_flags,
    gopher_repetition_flags,
    text_stats,
)
from gecko_spark.sources.warc import (
    fetch_warc_by_index,
    read_cdxj,
    read_warc,
    warc_to_corpus,
    write_cdxj,
    write_warc,
)


def synth_crawl(d: str, n_files: int = 4, per_file: int = 50) -> None:
    entries = []
    for fno in range(n_files):
        recs = []
        for i in range(per_file):
            rid = fno * per_file + i
            # every 10th page is a byte-identical mirror of page rid-1
            body_id = rid - 1 if rid % 10 == 9 else rid
            # 997 > 7·n_docs keeps every page's word sequence unique, so
            # dedup collapses exactly the planted mirrors and nothing else
            words = " ".join(f"tok{(body_id * 7 + j) % 997}" for j in range(80))
            body = (
                f"<html><head><title>page {body_id}</title></head>"
                f"<body><script>var x=1;</script><p>{words}</p></body></html>"
            ).encode()
            recs.append(
                dict(
                    warc_type="response",
                    record_id=f"<urn:rec:{rid}>",
                    target_uri=f"https://crawl.example/{rid:06d}",
                    warc_date="2024-06-01T00:00:00Z",
                    content_type="application/http; msgtype=response",
                    payload=b"HTTP/1.1 200 OK\r\nContent-Type: text/html\r\n\r\n"
                    + body,
                )
            )
        fname = f"part-{fno}.warc.gz"
        spans = write_warc(recs, os.path.join(d, fname))
        entries.extend(
            dict(url=r["target_uri"], filename=fname, offset=o, length=ln,
                 status=200, timestamp="20240601000000")
            for r, (o, ln) in zip(recs, spans)
        )
    write_cdxj(entries, os.path.join(d, "index.cdxj.gz"))


def main() -> None:
    # accepts [out_dir] or the test harness's (sf_dir, out_dir) shape
    # (no testdata needed here — the crawl is synthesized)
    out_dir = sys.argv[-1] if len(sys.argv) > 1 else tempfile.mkdtemp()
    spark = get_spark(app_name="warc-ingest-example", cpus=8,
                      shuffle_partitions=8)
    try:
        crawl = os.path.join(out_dir, "crawl")
        os.makedirs(crawl, exist_ok=True)
        synth_crawl(crawl)

        # 1–2: scan + corpus shape
        raw = read_warc(spark, os.path.join(crawl, "*.warc.gz"),
                        recordTypes="response")
        corpus = warc_to_corpus(raw)

        # 3–4: main-content extraction (the <script> and nav links
        # never reach the corpus), then quality/lang stats
        clean = corpus.withColumn(
            "text", extract_main_content(F.col("text"), min_block_chars=30)
        )
        enriched = text_stats(clean, "text")

        # 5: exact dedup — the planted mirrors collapse
        deduped = dedupe_exact(enriched, ["text"])
        n_raw, n_dedup = corpus.count(), deduped.count()
        print(f"corpus: {n_raw} docs -> {n_dedup} after exact dedup "
              f"({n_raw - n_dedup} mirrors dropped)")
        assert n_raw - n_dedup == 20, "expected 20 planted mirrors"

        # 5b: the published gates as a REPORT (synthetic token pages
        # naturally fail English-stopword rules — a real corpus gates
        # with .filter("passes") / .filter("kept"))
        gq = gopher_quality_flags(deduped, min_words=10).agg(
            F.avg(F.col("rule_word_count").cast("int")).alias("word_count"),
            F.avg(F.col("rule_alpha_words").cast("int")).alias("alpha"),
        ).collect()[0]
        gr = gopher_repetition_flags(deduped).agg(
            F.avg(F.col("passes").cast("int")).alias("p")
        ).collect()[0]
        c4 = c4_clean(deduped).agg(
            F.avg(F.col("kept").cast("int")).alias("p")
        ).collect()[0]
        print(f"gates: gopher word-count {gq.word_count:.2f}, "
              f"alpha {gq.alpha:.2f}; repetition pass {gr.p:.2f}; "
              f"c4 kept {c4.p:.2f}")

        # 6: selective re-fetch of an index slice (no crawl scan)
        idx = read_cdxj(spark, os.path.join(crawl, "index.cdxj.gz"))
        pick = idx.filter(F.col("surt_key").like("example,crawl)/0000%"))
        fetched = fetch_warc_by_index(pick, crawl)
        k = fetched.count()
        print(f"indexed fetch: {k} records pulled by ranged member reads")
        assert k == pick.count()

        deduped.select("doc_id", "text", "meta").write.mode("overwrite").parquet(
            os.path.join(out_dir, "corpus.parquet")
        )
        print(f"wrote {out_dir}/corpus.parquet")
    finally:
        spark.stop()


if __name__ == "__main__":
    main()
