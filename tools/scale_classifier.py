"""Scale datapoints for the hashed linear quality classifier
(operators/classifier.py): serving throughput over the self-generated
1.24 M-doc scale corpus (scan-only plan — the number that matters at
100 TB), and a trainer run on a 100 k-doc labeled sample with planted
signal (the bounded regime training actually runs in). Prints rows to
paste into SCALE.md; writes nothing."""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, ".")
sys.path.insert(0, "tools")

import numpy as np
from pyspark.sql import functions as F

from gecko_spark import get_spark
from gecko_spark.operators.classifier import (
    hashed_linear_score,
    quantize_weights,
    seeded_weights,
    train_hashed_classifier,
)
from scale_stress import SCRATCH, make_corpus


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
    spark = get_spark(
        app_name="scale-classifier",
        cpus=int(os.environ.get("SPARK_GRAFT_CPUS", "32")),
    )
    d = os.path.join(SCRATCH, f"scale_{n}")
    if not os.path.exists(os.path.join(d, "documents.parquet")):
        make_corpus(spark, n, d)
    docs = spark.read.parquet(os.path.join(d, "documents.parquet"))
    n_docs = docs.count()

    # --- serving: D = 2^16 weights in the kernel closure ---------------
    # NB: aggregate over the kernel's outputs — a bare count() lets
    # Catalyst prune the unused ArrowEvalPython and times the scan only
    def _serve():
        return hashed_linear_score(docs, w).agg(
            F.count("*").alias("n"),
            F.sum("logit").alias("s"),
            F.sum(F.col("passes").cast("long")).alias("p"),
        ).collect()[0]

    w = seeded_weights(1 << 16)
    _serve()  # warm
    ts = []
    for _ in range(3):
        t0 = time.time()
        row = _serve()
        ts.append(time.time() - t0)
    t_serve = sorted(ts)[1]
    assert row["n"] == n_docs
    print(
        f"serve: {n_docs} docs, D=65536 -> {t_serve:.2f}s "
        f"({n_docs / t_serve / 1e6:.2f} M docs/s) runs={['%.2f' % t for t in ts]}",
        flush=True,
    )

    # --- training: 100k labeled sample, planted marker signal ----------
    sample = docs.limit(100_000).select(
        "doc_id",
        F.when(
            F.col("doc_id") % 2 == 0, F.concat(F.col("text"), F.lit(" qualmark good"))
        )
        .otherwise(F.concat(F.col("text"), F.lit(" junkmark bad")))
        .alias("text"),
        (F.col("doc_id") % 2 == 0).cast("int").alias("label"),
    )
    t0 = time.time()
    wt = train_hashed_classifier(
        sample, label_col="label", n_features=4096, iters=6, lr=1.0
    )
    t_train = time.time() - t0
    q = quantize_weights(wt)
    scored = hashed_linear_score(sample, q)
    acc = (
        scored.join(sample.select("doc_id", "label"), "doc_id")
        .select(
            F.avg(
                (F.col("passes") == (F.col("label") == 1)).cast("double")
            ).alias("a")
        )
        .collect()[0]["a"]
    )
    print(
        f"train: 100000 docs, D=4096, 6 iters -> {t_train:.1f}s "
        f"({t_train / 6:.1f}s/iter); quantized-serve accuracy={acc:.4f}",
        flush=True,
    )
    print(f"nonzero trained weights: {int(np.count_nonzero(wt))}/4096")
    spark.stop()


if __name__ == "__main__":
    main()
