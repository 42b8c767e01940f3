"""PQ scale datapoint: encode + search throughput at 1M synthetic
64-dim vectors (unit-norm-ish gaussians built from the engine's
Box-Muller Column generator — no driver-side data). Prints the table
for SCALE.md."""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, ".")

from pyspark.sql import functions as F

from gecko_spark import get_spark
from gecko_spark.operators.similarity import (
    pq_encode,
    pq_topk_adc,
    pq_topk_rerank,
    pq_train,
)


def make_vectors(spark, n: int, dim: int = 64, seed: int = 7):
    """(vec_id, embedding) — deterministic pseudo-gaussian vectors via
    xxhash64-seeded uniforms + Box-Muller, pure Column algebra."""
    df = spark.range(n).withColumnRenamed("id", "vec_id")
    cols = []
    for d in range(0, dim, 2):
        u1 = (F.pmod(F.xxhash64(F.col("vec_id"), F.lit(seed + d)), F.lit(1_000_003)) + 1) / 1_000_004.0
        u2 = F.pmod(F.xxhash64(F.col("vec_id"), F.lit(seed + d + 1)), F.lit(1_000_003)) / 1_000_003.0
        r = F.sqrt(-2.0 * F.log(u1))
        cols.append(r * F.cos(2.0 * 3.141592653589793 * u2))
        cols.append(r * F.sin(2.0 * 3.141592653589793 * u2))
    vec = F.array(*cols[:dim])
    norm = F.sqrt(F.aggregate(vec, F.lit(0.0), lambda a, x: a + x * x))
    unit = F.transform(vec, lambda x: x / norm)
    return df.select("vec_id", unit.alias("embedding"))


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
    spark = get_spark(
        app_name="scale-pq", cpus=int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    )
    try:
        vecs = make_vectors(spark, n).persist()
        vecs.count()  # materialize the float corpus once
        t0 = time.time()
        books = pq_train(vecs, m=8, k_codes=256, seed=0)
        t_train = time.time() - t0
        t0 = time.time()
        codes = pq_encode(vecs, books).persist()
        nc = codes.count()
        t_enc = time.time() - t0
        queries = vecs.filter(F.col("vec_id") < 100).select(
            F.col("vec_id").alias("query_id"), F.col("embedding").alias("query_vec")
        )
        pq_topk_adc(codes, books, queries, k=10).count()  # warm
        t0 = time.time()
        pq_topk_adc(codes, books, queries, k=10).count()
        t_adc = time.time() - t0
        t0 = time.time()
        pq_topk_rerank(codes, books, vecs, queries, k=10, shortlist=100).count()
        t_rr = time.time() - t0
        print(
            f"n={nc:,} dim=64 m=8 k_codes=256: train {t_train:.2f}s, "
            f"encode {t_enc:.2f}s, ADC top-10 ×100q {t_adc:.2f}s, "
            f"+exact-rerank {t_rr:.2f}s  "
            f"(code table ~{nc * 8 / 1e6:.0f} MB vs ~{nc * 64 * 4 / 1e6:.0f} MB float32)",
            flush=True,
        )
    finally:
        spark.stop()


if __name__ == "__main__":
    main()
