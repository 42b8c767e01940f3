"""Hard-negative mining scale datapoint: 1M synthetic 64-dim vectors,
labels planted so each anchor's nearest same-label twin must be
excluded — proves the label filter really bites at scale, and measures
the IVF-pruned miner against the exact miner on a 1k-anchor sample.
Prints rows for SCALE.md; writes nothing.

Usage: python tools/scale_hardneg.py [n_vectors] [n_anchors]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, ".")
sys.path.insert(0, "tools")

from pyspark.sql import functions as F

from gecko_spark import get_spark
from gecko_spark.operators.similarity import (
    hard_negative_pairs,
    hard_negative_pairs_ivf,
    ivf_assign,
)
from scale_pq import make_vectors


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
    n_anchors = int(sys.argv[2]) if len(sys.argv) > 2 else 1_000
    spark = get_spark(
        app_name="scale-hardneg",
        cpus=int(os.environ.get("SPARK_GRAFT_CPUS", "32")),
    )
    try:
        # CLUSTERED corpus (real embedding geometry, not isotropic
        # noise): each vector = unit(center[cid] + 0.5·gaussian), 64
        # centers. Twin construction: consecutive ids (2m, 2m+1) share
        # a label AND a cluster, so every even anchor's near-twin is in
        # the probed list and MUST be excluded by the label filter.
        # Labels must be DECORRELATED from clusters (m % 16 would make
        # label a function of cid = m % 64 and exclude whole home
        # clusters): (m // 64) % 16 varies within every cluster while
        # twins still share it.
        centers = make_vectors(spark, 64, seed=99).select(
            F.col("vec_id").alias("cid"), F.col("embedding").alias("cvec")
        )
        base = make_vectors(spark, n).withColumn(
            "cid", (F.floor(F.col("vec_id") / 2) % 64).cast("long")
        )
        blended = base.join(F.broadcast(centers), "cid").withColumn(
            "raw",
            F.zip_with("embedding", "cvec", lambda x, y: x * 0.5 + y),
        )
        norm = F.sqrt(F.aggregate("raw", F.lit(0.0), lambda a, x: a + x * x))
        vecs = blended.select(
            "vec_id",
            F.transform("raw", lambda x: x / norm).alias("embedding"),
            (F.floor(F.floor(F.col("vec_id") / 2) / 64) % 16)
            .cast("int").alias("label"),
        ).persist()
        n_rows = vecs.count()
        anchors = vecs.filter(
            (F.col("vec_id") % 2 == 0) & (F.col("vec_id") < 2 * n_anchors)
        ).persist()
        na = anchors.count()

        # --- exact miner on a bounded anchor batch ----------------------
        t0 = time.time()
        exact = hard_negative_pairs(
            vecs, anchors, k=10, corpus_rows=n_rows, anchor_rows=na,
            max_scored_rows=None,
        ).persist()
        ne = exact.count()
        t_exact = time.time() - t0
        labels_ok = exact.join(
            vecs.select(F.col("vec_id"), F.col("label").alias("neg_label")),
            "vec_id",
        ).join(
            anchors.select(
                F.col("vec_id").alias("anchor_id"),
                F.col("label").alias("a_label"),
            ),
            "anchor_id",
        ).filter(F.col("neg_label") == F.col("a_label")).count()
        print(
            f"exact: {na} anchors x {n_rows} corpus -> {ne} pairs in "
            f"{t_exact:.1f}s ({na * n_rows / t_exact / 1e6:.0f} M pair-scores/s); "
            f"same-label leaks: {labels_ok} (must be 0)",
            flush=True,
        )
        assert labels_ok == 0

        # --- IVF-pruned miner: recall vs exact, wall-clock ---------------
        with_lists, cents = ivf_assign(vecs, n_centroids=64, seed=1)
        with_lists = with_lists.persist()
        with_lists.count()
        for nprobe in (8, 16):
            t0 = time.time()
            part = hard_negative_pairs_ivf(
                with_lists, cents, anchors, k=10, nprobe=nprobe
            ).persist()
            np_ = part.count()
            t_ivf = time.time() - t0
            hit = part.join(exact, ["anchor_id", "vec_id"], "left_semi").count()
            print(
                f"ivf nprobe={nprobe}/64: {np_} pairs in {t_ivf:.1f}s "
                f"({t_exact / t_ivf:.1f}x faster than exact), "
                f"recall@10 vs exact {hit / ne:.3f}",
                flush=True,
            )
            part.unpersist()
        exact.unpersist()
    finally:
        spark.stop()


if __name__ == "__main__":
    main()
