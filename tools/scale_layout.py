"""Z-order layout scale datapoint: does Morton clustering actually buy
min/max chunk skipping at data scale, and how much?

Builds a 10M-row (a, b) table, writes it in three physical layouts
(64 files each):

  unordered   — repartition(64), the layout a raw ingest leaves behind
  sorted-a    — repartitionByRange + sortWithinPartitions on a
  zorder      — cluster_by_zorder(a, b)  (operators/layout.py)

then measures, for window predicates on a, on b, and on both:

  1. the fraction of ROWS in row groups whose parquet min/max
     statistics survive the predicate (pyarrow metadata — exactly the
     pruning decision any parquet reader makes, engine-independent)
  2. Spark wall-clock for the filtered count on each layout

Usage: python tools/scale_layout.py [n_rows] (default 10_000_000)
Results feed SCALE.md (round-11 addendum).
"""

from __future__ import annotations

import glob
import shutil
import sys
import tempfile
import time

import pyarrow.parquet as pq

sys.path.insert(0, ".")

from pyspark.sql import functions as F  # noqa: E402

from gecko_spark import get_spark  # noqa: E402
from gecko_spark.operators.layout import cluster_by_zorder  # noqa: E402

DOMAIN = 1 << 20  # a, b uniform in [0, 2^20)


def surviving_fraction(path: str, col_ranges: dict) -> tuple[float, int, int]:
    """(fraction of rows in surviving row groups, surviving groups,
    total groups) for a conjunctive range predicate, decided purely on
    parquet row-group min/max statistics."""
    total = kept = 0
    groups = kept_groups = 0
    for f in sorted(glob.glob(f"{path}/*.parquet")):
        md = pq.ParquetFile(f).metadata
        idx = {md.schema.column(i).name: i for i in range(md.num_columns)}
        for g in range(md.num_row_groups):
            rg = md.row_group(g)
            total += rg.num_rows
            groups += 1
            alive = True
            for col, (lo, hi) in col_ranges.items():
                st = rg.column(idx[col]).statistics
                if st is None or st.min is None:
                    continue  # no stats -> cannot prune
                if st.max < lo or st.min > hi:
                    alive = False
                    break
            if alive:
                kept += rg.num_rows
                kept_groups += 1
    return kept / max(total, 1), kept_groups, groups


def main() -> int:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 10_000_000
    spark = get_spark(app_name="scale-layout", cpus=16, shuffle_partitions=64)
    base = tempfile.mkdtemp(prefix="scale_layout_")
    try:
        # two decorrelated pseudorandom dims from the row id
        src = spark.range(n).select(
            F.pmod(F.xxhash64(F.col("id"), F.lit(1)), F.lit(DOMAIN)).alias("a"),
            F.pmod(F.xxhash64(F.col("id"), F.lit(2)), F.lit(DOMAIN)).alias("b"),
        )
        layouts = {}
        t0 = time.time()
        src.repartition(64).write.mode("overwrite").parquet(f"{base}/unordered")
        layouts["unordered"] = time.time() - t0
        t0 = time.time()
        (
            src.repartitionByRange(64, "a")
            .sortWithinPartitions("a")
            .write.mode("overwrite")
            .parquet(f"{base}/sorted_a")
        )
        layouts["sorted_a"] = time.time() - t0
        t0 = time.time()
        (
            cluster_by_zorder(src, ["a", "b"], bits=16, num_partitions=64)
            .write.mode("overwrite")
            .parquet(f"{base}/zorder")
        )
        layouts["zorder"] = time.time() - t0
        print(f"n={n}, 64 files/layout; write seconds: "
              + ", ".join(f"{k}={v:.1f}" for k, v in layouts.items()))

        w = DOMAIN // 64  # ~1.6% selectivity per dim
        preds = {
            "a-window": {"a": (DOMAIN // 3, DOMAIN // 3 + w)},
            "b-window": {"b": (DOMAIN // 3, DOMAIN // 3 + w)},
            "a&b-window": {
                "a": (DOMAIN // 3, DOMAIN // 3 + w),
                "b": (DOMAIN // 3, DOMAIN // 3 + w),
            },
        }
        print(f"{'predicate':<12} {'layout':<10} {'rows-surviving':>14} "
              f"{'groups':>12} {'spark-s':>8}")
        for pname, ranges in preds.items():
            for lname in ("unordered", "sorted_a", "zorder"):
                frac, kg, g = surviving_fraction(f"{base}/{lname}", ranges)
                cond = " AND ".join(
                    f"{c} BETWEEN {lo} AND {hi}" for c, (lo, hi) in ranges.items()
                )
                df = spark.read.parquet(f"{base}/{lname}").filter(cond)
                t0 = time.time()
                cnt = df.count()
                dt = time.time() - t0
                print(f"{pname:<12} {lname:<10} {frac:>13.1%} "
                      f"{f'{kg}/{g}':>12} {dt:>8.2f}  (rows={cnt})")
        return 0
    finally:
        shutil.rmtree(base, ignore_errors=True)
        spark.stop()


if __name__ == "__main__":
    sys.exit(main())
