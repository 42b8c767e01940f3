"""Exact substring-span dedup at scale (round 10): price the stride-1
detection cost and the winnowing knob on the planted-near-dup corpus
(tools/scale_stress.make_corpus — ~24% mutant copies, each sharing a
long prefix or suffix with its original), with a built-in correctness
certificate: every generation-1 mutant (id = original + n_base) shares
a >= ~55-char span with its original, so the fraction of mutants whose
doc appears in the spans output is an exact planted recall.

Usage: python tools/scale_substring.py [n_base]   (default 500_000)
Prints SCALE.md rows; corpus cached under scratch/.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, ".")
sys.path.insert(0, "tools")

from pyspark.sql import functions as F

from gecko_spark import get_spark
from gecko_spark.operators.dedup import (
    substring_dup_spans,
    substring_window_positions,
)
from scale_r6 import text_corpus


def main():
    n_base = int(sys.argv[1]) if len(sys.argv) > 1 else 500_000
    spark = get_spark(
        app_name="scale-substring",
        cpus=int(os.environ.get("SPARK_GRAFT_CPUS", "32")),
    )
    try:
        d = text_corpus(spark, n_base)
        docs = spark.read.parquet(os.path.join(d, "documents.parquet")).persist()
        n_docs = docs.count()
        n_chars = docs.agg(F.sum(F.length("text"))).first()[0]
        g1 = docs.filter(
            (F.col("doc_id") >= n_base) & (F.col("doc_id") < 2 * n_base)
        ).select("doc_id")
        n_mut = g1.count()
        print(f"corpus: {n_docs:,} docs, {n_chars:,} chars, {n_mut:,} g1 mutants", flush=True)

        for winnow in (1, 8):
            t0 = time.time()
            n_pos = substring_window_positions(
                docs, "doc_id", "text", window=40, winnow=winnow
            ).count()
            t_pos = time.time() - t0
            t0 = time.time()
            spans = substring_dup_spans(
                docs, "doc_id", "text", window=40, winnow=winnow
            ).persist()
            n_spans = spans.count()
            t_spans = time.time() - t0
            flagged_docs = spans.select("doc_id").distinct()
            recall = g1.join(flagged_docs, "doc_id", "left_semi").count() / n_mut
            spans.unpersist()
            print(
                f"winnow={winnow}: positions {n_pos:,} ({t_pos:.1f}s hash-only), "
                f"spans {n_spans:,} in {t_spans:.1f}s end-to-end, "
                f"planted-mutant recall {recall:.4f}",
                flush=True,
            )
            if winnow == 1:
                assert recall >= 0.99, f"stride-1 planted recall {recall:.4f} < 0.99"
            else:
                assert recall >= 0.95, f"winnowed planted recall {recall:.4f} < 0.95"
        print("PLANTED RECALL PASS", flush=True)
    finally:
        spark.stop()


if __name__ == "__main__":
    main()
