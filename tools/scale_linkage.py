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


def em_fs_datapoint(spark, n: int) -> dict:
    """Round-7: Fellegi–Sunter with EM-fitted (m, u) at scale. Builds
    the same person corpus as corrupt_then_link plus a categorical
    field, fits estimate_mu_em (2 fields → the pattern aggregate the
    driver sees is ≤ 2² rows — asserted), then links with the fitted
    weights. Reports the EM wall, the FS-join wall, and entity
    accuracy."""
    import pandas as pd

    from gecko_spark.operators import generators as G
    from gecko_spark.operators import mutators as M
    from gecko_spark.plans.pipeline import mutate_data_frame, to_data_frame

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
            seed=61,
            keep_index=True,
        )
        .select(
            F.col("__idx__").alias("pid"),
            F.concat_ws(" ", "first", "last").alias("name"),
            F.concat(F.lit("m"), F.pmod(F.col("__idx__"), F.lit(8))).alias("mkt"),
            F.pmod(F.col("__idx__"), F.lit(n // 10)).alias("zip"),
        )
    )
    dirty = mutate_data_frame(
        clean,
        [
            ("name", (0.1, M.with_delete())),
            ("name", (0.1, M.with_substitute())),
            ("mkt", (0.2, M.with_substitute(charset="0123456789"))),
        ],
        seed=62,
        key_columns=["pid"],
    )
    clean = clean.persist()
    dirty = dirty.persist()
    clean.count(), dirty.count()
    fields = {"name": 1, "mkt": None}
    try:
        # the 2^k bound on the driver-side pattern aggregate (k=2)
        agrees = (
            L.blocked_candidates(
                dirty, clean, "pid", "pid",
                [F.col("zip")], [F.col("zip")],
                keep_a=list(fields), keep_b=list(fields),
            )
            .select(
                (F.levenshtein("a_name", "b_name") <= 1).cast("int").alias("gn"),
                F.col("a_mkt").eqNullSafe(F.col("b_mkt")).cast("int").alias("gm"),
            )
            .groupBy("gn", "gm")
            .count()
        )
        n_patterns = agrees.count()
        assert n_patterns <= 4, n_patterns

        t0 = time.time()
        est = L.estimate_mu_em(
            dirty, clean, "pid", "pid", fields,
            block_a=[F.col("zip")], block_b=[F.col("zip")],
        )
        em_wall = time.time() - t0

        def fs():
            return L.fellegi_sunter_join(
                dirty, clean, "pid", "pid", est,
                block_a=[F.col("zip")], block_b=[F.col("zip")],
                min_weight=0.0, keep="best",
            )

        fs().write.mode("overwrite").format("noop").save()
        t0 = time.time()
        fs().write.mode("overwrite").format("noop").save()
        fs_wall = time.time() - t0
        linked = fs().persist()
        n_linked = linked.count()
        n_self = linked.filter("id_a = id_b").count()
        linked.unpersist()
    finally:
        clean.unpersist()
        dirty.unpersist()
    return {
        "n": n,
        "em_wall": round(em_wall, 2),
        "fs_wall": round(fs_wall, 2),
        "n_patterns": n_patterns,
        "est": est,
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

        emfs = []
        for nn in (n_link // 10, n_link):
            r = em_fs_datapoint(spark, nn)
            assert r["pid_accuracy"] > 0.95, r
            emfs.append(r)
            print(
                f"em+fs {nn:,}: em={r['em_wall']}s fs={r['fs_wall']}s "
                f"patterns={r['n_patterns']} recall={r['recall']:.4f} "
                f"pid_acc={r['pid_accuracy']:.4f} est={r['est']}",
                flush=True,
            )
    finally:
        spark.stop()

    print("\n--- SCALE.md addendum ---")
    print("| docs | snm window=4 | pairs (exact) |")
    print("|---:|---:|---:|")
    for n, wall, cnt in rows:
        print(f"| {n:,} | {wall} s | {cnt:,} |")
    print(f"\ncorrupt-then-link 1M: {link['wall']} s, recall {link['recall']:.4f}, "
          f"pid accuracy {link['pid_accuracy']:.4f}")
    if len(emfs) == 2:
        import math

        a, b = emfs
        ratio = math.log(b["fs_wall"] / a["fs_wall"]) / math.log(b["n"] / a["n"])
        print("| rows | EM fit | FS join | patterns | pid acc |")
        print("|---:|---:|---:|---:|---:|")
        for r in emfs:
            print(
                f"| {r['n']:,} | {r['em_wall']} s | {r['fs_wall']} s "
                f"| {r['n_patterns']} | {r['pid_accuracy']:.4f} |"
            )
        print(f"FS-join scaling exponent over the 10x span: {ratio:.2f}")


if __name__ == "__main__":
    main()
