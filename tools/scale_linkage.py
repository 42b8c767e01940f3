"""Round-6 linkage scale datapoints.

Two measurements:

1. **Sorted-neighborhood candidates** over the self-generated scale
   corpora (62k / 1.24M docs), sort key ``n_chars`` (heavy ties — the
   adversarial case for rank logic). Pair count must be EXACTLY
   ``(window-1)·n − window·(window-1)/2``, which certifies the
   two-phase global rank produced a perfect permutation at scale.

2. **Corrupt-then-link at 1M rows** — the engine's reason to exist,
   end to end: generate 1M person records (name + uncorrupted zip),
   corrupt names with the engine's own mutators (10% delete + 10%
   substitute), then ``linkage_join`` the dirty copy back to the clean
   source blocked on zip. Reports wall, recall (zip blocking cannot
   miss: the block key is uncorrupted), and best-match pid accuracy
   (name collisions inside a zip block bound it slightly below 1).

Usage: python tools/scale_linkage.py  [n_base_docs n_link_rows]
Prints the SCALE.md addendum rows.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, ".")
sys.path.insert(0, "tools")

from pyspark.sql import functions as F

from gecko_spark import get_spark
from gecko_spark.operators import linkage as L
from scale_stress import SCRATCH, make_corpus


def snm_datapoint(spark, path: str, window: int = 4) -> tuple:
    docs = spark.read.parquet(path).select("doc_id", "n_chars")
    n = docs.count()

    def run():
        L.sorted_neighborhood_pairs(
            docs, "n_chars", "doc_id", window=window, buckets=64
        ).write.mode("overwrite").format("noop").save()

    run()
    t0 = time.time()
    run()
    wall = time.time() - t0
    cnt = L.sorted_neighborhood_pairs(
        docs, "n_chars", "doc_id", window=window, buckets=64
    ).count()
    expect = (window - 1) * n - window * (window - 1) // 2
    return n, round(wall, 2), cnt, expect


def corrupt_then_link(spark, n: int) -> dict:
    from gecko_spark.operators import generators as G
    from gecko_spark.operators import mutators as M
    from gecko_spark.plans.pipeline import mutate_data_frame, to_data_frame
    import pandas as pd

    colors = [f"name{i:02d}" for i in range(90)]
    freq = pd.DataFrame({"w": colors, "n": [1] * len(colors)})
    clean = (
        to_data_frame(
            spark,
            [
                ("first", G.from_frequency_table(freq, "w", "n")),
                ("last", G.from_frequency_table(freq, "w", "n")),
            ],
            n,
            seed=41,
            keep_index=True,
        )
        .select(
            F.col("__idx__").alias("pid"),
            F.concat_ws(" ", "first", "last").alias("name"),
            F.pmod(F.col("__idx__"), F.lit(100_000)).alias("zip"),
        )
    )
    dirty = mutate_data_frame(
        clean,
        [("name", (0.1, M.with_delete())), ("name", (0.1, M.with_substitute()))],
        seed=42,
        key_columns=["pid"],
    )
    clean = clean.persist()
    dirty = dirty.persist()
    clean.count(), dirty.count()

    def link():
        return L.linkage_join(
            dirty, clean, "pid", "pid", "name",
            block_a=[F.col("zip")], block_b=[F.col("zip")],
            max_dist=2, keep="best",
        )

    link().write.mode("overwrite").format("noop").save()
    t0 = time.time()
    link().write.mode("overwrite").format("noop").save()
    wall = time.time() - t0
    linked = link().persist()
    n_linked = linked.count()
    n_self = linked.filter("id_a = id_b").count()
    linked.unpersist()
    clean.unpersist()
    dirty.unpersist()
    return {
        "n": n,
        "wall": round(wall, 2),
        "recall": n_linked / n,
        "pid_accuracy": n_self / max(n_linked, 1),
    }


def main():
    args = [int(a) for a in sys.argv[1:]]
    doc_bases = [50_000, 1_000_000] if not args else [args[0]]
    n_link = args[1] if len(args) > 1 else 1_000_000
    spark = get_spark(
        app_name="scale-linkage", cpus=int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    )
    try:
        rows = []
        for nb in doc_bases:
            d = os.path.join(SCRATCH, f"scale_{nb}")
            p = os.path.join(d, "documents.parquet")
            if not os.path.exists(p):
                make_corpus(spark, nb, d)
            n, wall, cnt, expect = snm_datapoint(spark, p)
            assert cnt == expect, (cnt, expect)
            rows.append((n, wall, cnt))
            print(f"snm {n:,}: {wall}s pairs={cnt:,} (exact)", flush=True)

        link = corrupt_then_link(spark, n_link)
        assert link["recall"] == 1.0, link
        assert link["pid_accuracy"] > 0.97, link
        print(f"corrupt-then-link {link['n']:,}: {link['wall']}s "
              f"recall={link['recall']:.4f} pid_acc={link['pid_accuracy']:.4f}",
              flush=True)
    finally:
        spark.stop()

    print("\n--- SCALE.md addendum ---")
    print("| docs | snm window=4 | pairs (exact) |")
    print("|---:|---:|---:|")
    for n, wall, cnt in rows:
        print(f"| {n:,} | {wall} s | {cnt:,} |")
    print(f"\ncorrupt-then-link 1M: {link['wall']} s, recall {link['recall']:.4f}, "
          f"pid accuracy {link['pid_accuracy']:.4f}")


if __name__ == "__main__":
    main()
