"""HLL scale datapoint: distinct-counting 50M rows four ways —
exact COUNT(DISTINCT), Spark's builtin approx_count_distinct (its own
HLL++, no cross-engine oracle), this engine's KMV (k=1024), and this
engine's oracle-exact HLL (m=256). Reports wall, estimate, relative
error. The structural claim being priced: the sketches shuffle a
CONSTANT number of rows (m or k) regardless of input size, where the
exact count shuffles every distinct value.

Usage: python tools/scale_hll.py [n_rows] (default 50_000_000)
"""

from __future__ import annotations

import sys
import time

sys.path.insert(0, ".")

from pyspark.sql import functions as F  # noqa: E402

from gecko_spark import get_spark  # noqa: E402
from gecko_spark.operators.sketches import hll_estimate, kmv_distinct_estimate  # noqa: E402

DISTINCT = 5_000_000


def main() -> int:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 50_000_000
    spark = get_spark(app_name="scale-hll", cpus=16, shuffle_partitions=32)
    try:
        src = spark.range(n).select(
            F.concat(
                F.lit("val_"), F.pmod(F.xxhash64("id"), F.lit(DISTINCT)).cast("string")
            ).alias("v")
        )
        # distinct values actually present (collisions make it < DISTINCT)
        t0 = time.time()
        true = src.select(F.countDistinct("v")).collect()[0][0]
        t_exact = time.time() - t0
        print(f"n={n}: exact countDistinct = {true} in {t_exact:.1f}s")

        t0 = time.time()
        acd = src.select(F.approx_count_distinct("v", 0.02)).collect()[0][0]
        t_acd = time.time() - t0
        print(f"builtin approx_count_distinct: {acd} "
              f"({acd / true - 1:+.3%}) in {t_acd:.1f}s [no oracle]")

        t0 = time.time()
        kmv = kmv_distinct_estimate(src, "v", k=1024).collect()[0]["estimate"]
        t_kmv = time.time() - t0
        print(f"kmv k=1024: {kmv:.0f} ({kmv / true - 1:+.3%}) in {t_kmv:.1f}s")

        t0 = time.time()
        row = hll_estimate(src, "v", m=256).collect()[0]
        t_hll = time.time() - t0
        print(f"hll m=256: {row['estimate']:.0f} "
              f"({row['estimate'] / true - 1:+.3%}) in {t_hll:.1f}s "
              f"(sigma 1.04/sqrt(256) = 6.5%)")
        row2 = hll_estimate(src, "v", m=4096).collect()[0]
        print(f"hll m=4096: {row2['estimate']:.0f} "
              f"({row2['estimate'] / true - 1:+.3%}) (sigma 1.6%)")
        return 0
    finally:
        spark.stop()


if __name__ == "__main__":
    sys.exit(main())
