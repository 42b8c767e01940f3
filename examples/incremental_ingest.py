"""End-to-end example: CONTINUOUS ingestion for a pretraining corpus —
what a daily/hourly increment pipeline runs at 100 TB, expressed with
the engine's incremental operators so the historical corpus is never
re-read:

  1. near-dup gate      (dedup.dedupe_against_index — the new batch is
                         signed once and band-joined against the
                         persisted MinHash index; history stays on disk)
  2. intra-batch dedup  (dedup.minhash_dedupe — survivors de-duped
                         against each other)
  3. decontamination    (decontam.decontaminate with a bloom prefilter
                         of the eval split's n-grams)
  4. sequence packing   (packing.pack_sequences — token-budget bins for
                         the trainer)
  5. index append       (dedup.write_minhash_index mode="append" — the
                         accepted batch joins the corpus)
  6. partitioned write  (sinks.write_partitioned — bounded files per
                         lang partition)

The increment lands as gzip JSONL and enters through
sources/corpus.py::read_corpus — the same (doc_id, text, meta) contract
whatever the feed format.

Run: python examples/incremental_ingest.py [sf_dir] [out_dir]
"""

from __future__ import annotations

import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from gecko_spark import get_spark
from gecko_spark.operators.decontam import decontaminate
from gecko_spark.operators.dedup import (
    dedupe_against_index,
    minhash_dedupe,
    write_minhash_index,
)
from gecko_spark.operators.packing import pack_manifest, pack_sequences
from gecko_spark.operators.text import word_token_count
from gecko_spark.sources.sinks import write_partitioned
from gecko_spark.sources.testdata import load_table


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    out_dir = sys.argv[2] if len(sys.argv) > 2 else tempfile.mkdtemp(prefix="ingest_")
    spark = get_spark(app_name="incremental-ingest-example")
    try:
        docs = load_table(spark, sf_dir, "documents")
        # bootstrap: first 60% of ids are the already-ingested corpus,
        # last 40% arrive as today's increment; 5% are the eval split
        corpus = docs.filter(F.col("doc_id") % 10 < 6)
        # today's increment arrives as gzip JSONL (the interchange
        # format real feeds deliver) and enters through the corpus
        # reader, which re-enforces the (doc_id, text, meta) contract
        from gecko_spark.sources.corpus import read_corpus, write_jsonl

        arrival = f"{out_dir}/arrival_jsonl"
        write_jsonl(docs.filter(F.col("doc_id") % 10 >= 6), arrival, partitions=2)
        increment = read_corpus(
            spark, arrival, fmt="jsonl", id_col="doc_id", keep_cols=["lang", "quality"]
        )
        evalset = docs.filter(F.col("doc_id") % 20 == 0).select("doc_id", "text")

        idx = f"{out_dir}/minhash_index"
        write_minhash_index(corpus, "doc_id", "text", idx)

        vs_corpus = dedupe_against_index(
            increment, spark.read.parquet(idx), "doc_id", "text", threshold=0.8
        )
        vs_self = minhash_dedupe(vs_corpus, "doc_id", "text", threshold=0.8)
        clean = decontaminate(
            vs_self, evalset, "doc_id", "text", n=6, bloom_bits_count=1 << 16
        )

        packed = pack_sequences(
            clean.withColumn("n_tokens", word_token_count(F.col("text"))),
            "doc_id",
            "n_tokens",
            budget=512,
            n_shards=8,
        )
        write_partitioned(packed, f"{out_dir}/accepted", ["lang"])
        # ORDER MATTERS: append to the index only after the accepted
        # batch is materialized on disk. `clean` lazily references
        # spark.read.parquet(idx); appending first and then re-evaluating
        # any plan built on `clean` would dedupe the increment against
        # ITSELF (now in the index) and silently produce zero rows.
        accepted = spark.read.parquet(f"{out_dir}/accepted")
        write_minhash_index(accepted, "doc_id", "text", idx, mode="append")

        n_in = increment.count()
        n_out = accepted.count()
        n_packs = pack_manifest(accepted).count()
        n_index = spark.read.parquet(idx).count()
        print(
            f"increment {n_in} docs -> accepted {n_out} "
            f"({n_packs} packs); index now {n_index} signatures -> {out_dir}"
        )
    finally:
        spark.stop()


if __name__ == "__main__":
    main()
