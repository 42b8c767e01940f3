"""Scale datapoints for DSIR importance resampling
(operators/selection.py): distribution fit + integer log-weight serving
+ selection over the self-generated scale corpus, with a planted
target-style marker so selection lift is measurable, not assumed.
Prints rows to paste into SCALE.md; writes nothing.

Usage: python tools/scale_dsir.py [n_docs] [n_buckets]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, ".")
sys.path.insert(0, "tools")

from pyspark.sql import functions as F

from gecko_spark import get_spark
from gecko_spark.core import LcgRandom
from gecko_spark.operators.selection import (
    dsir_log_weights,
    fit_log_ratio_micro,
    gumbel_select_frac,
    gumbel_topk,
    hashed_ngram_bucket_counts,
)
from scale_stress import SCRATCH, make_corpus


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
    n_buckets = int(sys.argv[2]) if len(sys.argv) > 2 else 1 << 16
    spark = get_spark(
        app_name="scale-dsir",
        cpus=int(os.environ.get("SPARK_GRAFT_CPUS", "32")),
    )
    d = os.path.join(SCRATCH, f"scale_{n}")
    if not os.path.exists(os.path.join(d, "documents.parquet")):
        make_corpus(spark, n, d)
    # plant a target-style marker on 10% of docs so the fit has real
    # signal and selection lift is checkable
    docs = (
        spark.read.parquet(os.path.join(d, "documents.parquet"))
        .select(
            "doc_id",
            F.when(
                F.col("doc_id") % 10 == 0,
                F.concat(F.col("text"), F.lit(" curated reference prose")),
            )
            .otherwise(F.col("text"))
            .alias("text"),
        )
        .persist()
    )
    n_docs = docs.count()
    target = docs.filter(F.col("doc_id") % 10 == 0)

    # --- fit: two bounded-aggregation scans ----------------------------
    t0 = time.time()
    lr = fit_log_ratio_micro(
        hashed_ngram_bucket_counts(target, n_buckets=n_buckets),
        hashed_ngram_bucket_counts(docs, n_buckets=n_buckets),
        n_buckets,
    )
    t_fit = time.time() - t0
    print(
        f"fit: {n_docs} docs, B={n_buckets} -> {t_fit:.2f}s "
        f"({n_docs / t_fit / 1e6:.2f} M docs/s over 2 scans)",
        flush=True,
    )

    # --- serve: one shuffle-free integer projection ---------------------
    # aggregate over the kernel outputs so Catalyst can't prune the UDF
    def _serve():
        return (
            dsir_log_weights(docs, lr)
            .agg(
                F.count("*").alias("n"),
                F.sum("lw_micro").alias("s"),
                F.sum("n_grams").alias("g"),
            )
            .collect()[0]
        )

    _serve()  # warm
    ts = []
    for _ in range(3):
        t0 = time.time()
        row = _serve()
        ts.append(time.time() - t0)
    t_serve = sorted(ts)[1]
    assert row["n"] == n_docs
    print(
        f"serve: {n_docs} docs -> {t_serve:.2f}s "
        f"({n_docs / t_serve / 1e6:.2f} M docs/s) "
        f"runs={['%.2f' % t for t in ts]}",
        flush=True,
    )

    lw = dsir_log_weights(docs, lr).persist()
    lw.count()

    # --- select: top-k (driver merge) vs threshold (scan-only) ----------
    rand = LcgRandom("doc_id", seed=11)
    k = max(n_docs // 20, 1)  # select 5%
    t0 = time.time()
    topk = gumbel_topk(lw, k, rand)
    picked = topk.agg(
        F.count("*").alias("n"),
        F.sum((F.col("doc_id") % 10 == 0).cast("long")).alias("tgt"),
    ).collect()[0]
    t_topk = time.time() - t0
    lift_topk = (picked["tgt"] / picked["n"]) / 0.1
    print(
        f"gumbel_topk: k={k} -> {t_topk:.2f}s, target lift "
        f"{lift_topk:.1f}x over base rate",
        flush=True,
    )

    t0 = time.time()
    sel = gumbel_select_frac(lw, 0.05, rand)
    got = sel.agg(
        F.count("*").alias("n"),
        F.sum((F.col("doc_id") % 10 == 0).cast("long")).alias("tgt"),
    ).collect()[0]
    t_thr = time.time() - t0
    err = abs(got["n"] - k) / n_docs
    lift_thr = (got["tgt"] / got["n"]) / 0.1
    print(
        f"gumbel_select_frac: frac=0.05 -> {t_thr:.2f}s, |n-k|/N = "
        f"{err:.5f} (rank-space bound 1e-4), target lift {lift_thr:.1f}x",
        flush=True,
    )
    assert err < 5e-4, err
    assert lift_thr > 2.0, lift_thr  # selection must actually steer

    docs.unpersist()
    lw.unpersist()
    spark.stop()


if __name__ == "__main__":
    main()
