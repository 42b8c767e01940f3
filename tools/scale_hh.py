"""Scale datapoints for the round-5 frequency-sketch ops: explode the
self-generated scale corpus into its token stream and time
``heavy_hitters`` (φ = 1/10000 — exactly the 400 flat-vocab words
qualify; every high-entropy token sits ≥ 20× below the cut) and
``top_k_by_count`` (k = 100 with the runtime certificate REQUIRED to
pass). Appends nothing; prints the table to paste into SCALE.md."""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, ".")
sys.path.insert(0, "tools")

from pyspark.sql import functions as F

from gecko_spark import get_spark
from gecko_spark.operators.sketches import heavy_hitters, top_k_by_count
from scale_stress import SCRATCH, make_corpus


def main():
    sizes = [int(a) for a in sys.argv[1:]] or [50_000, 500_000]
    spark = get_spark(
        app_name="scale-hh", cpus=int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    )
    os.makedirs(SCRATCH, exist_ok=True)
    try:
        for n in sizes:
            d = os.path.join(SCRATCH, f"scale_{n}")
            if not os.path.exists(os.path.join(d, "documents.parquet")):
                t0 = time.time()
                total = make_corpus(spark, n, d)
                print(f"generated {d}: {total} docs in {time.time() - t0:.1f}s", flush=True)
            docs = spark.read.parquet(os.path.join(d, "documents.parquet"))
            toks = docs.select(
                F.explode(F.split(F.col("text"), " ")).alias("tok")
            )
            n_tok = toks.count()
            # warmup then timed
            heavy_hitters(toks, "tok", 1, 10_000).count()
            t0 = time.time()
            nhh = heavy_hitters(toks, "tok", 1, 10_000).count()
            t_hh = time.time() - t0
            t0 = time.time()
            topk = top_k_by_count(toks, "tok", k=100, capacity=8_000)
            nk = topk.count()  # verify=True already certified exactness
            t_tk = time.time() - t0
            print(
                f"docs={docs.count():,} tokens={n_tok:,} "
                f"heavy_hitters(1/10000)={nhh} rows in {t_hh:.2f}s  "
                f"top_k_by_count(100)={nk} rows in {t_tk:.2f}s",
                flush=True,
            )
    finally:
        spark.stop()


if __name__ == "__main__":
    main()
