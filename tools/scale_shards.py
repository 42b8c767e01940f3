"""Scale datapoint for global_token_shards: the distributed prefix sum
at tens of millions of rows — wall-clock plus stream-integrity checks
(no sorted collect of the corpus; the invariants are aggregates).
Prints rows for SCALE.md; writes nothing.

Usage: python tools/scale_shards.py [n_rows] [budget]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, ".")

from pyspark.sql import functions as F

from gecko_spark import get_spark
from gecko_spark.core import LcgRandom
from gecko_spark.operators.packing import global_token_shards


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 20_000_000
    budget = int(sys.argv[2]) if len(sys.argv) > 2 else 4096
    spark = get_spark(
        app_name="scale-shards",
        cpus=int(os.environ.get("SPARK_GRAFT_CPUS", "32")),
    )
    try:
        # synthetic doc lengths: 10..509 tokens, deterministic
        df = spark.range(n).select(
            F.col("id").alias("doc_id"),
            (F.pmod(F.xxhash64("id", F.lit(3)), F.lit(500)) + 10)
            .cast("int")
            .alias("n_tokens"),
        ).persist()
        total = df.agg(F.sum("n_tokens")).first()[0]
        rand = LcgRandom("doc_id", seed=41)

        t0 = time.time()
        out = global_token_shards(
            df, "doc_id", "n_tokens", budget=budget, rand=rand, buckets=256
        ).persist()
        stats = out.agg(
            F.count("*").alias("rows"),
            F.countDistinct("gstart").alias("starts"),
            F.min("gstart").alias("min_s"),
            F.max("gstart").alias("max_s"),
            F.max(F.col("gstart") + F.col("n_tokens")).alias("end"),
            F.countDistinct("gshard").alias("shards"),
            F.max("gshard").alias("max_shard"),
            F.max("n_tokens").alias("max_doc"),
        ).first()
        dt = time.time() - t0
        # stream integrity without a global sort: N distinct starts,
        # starting at 0, ending exactly at the token total. The shard
        # invariants follow a doc's FIRST token (a straddling last doc
        # means max_shard < (total-1)//budget — that is correct
        # behaviour, so assert against max(gstart), not the total;
        # full occupancy only holds when no doc exceeds the budget)
        assert stats["rows"] == n and stats["starts"] == n
        assert stats["min_s"] == 0 and stats["end"] == total
        assert stats["max_shard"] == stats["max_s"] // budget
        if stats["max_doc"] <= budget:
            assert stats["shards"] == stats["max_shard"] + 1
        occ = (
            "every shard id occupied"
            if stats["max_doc"] <= budget
            else "oversized docs straddle shards (budget < max doc)"
        )
        print(
            f"global_token_shards: {n} rows, {total} tokens -> "
            f"{stats['shards']} shards of ~{budget} tokens in {dt:.1f}s "
            f"({n / dt / 1e6:.1f} M rows/s); stream gap-free "
            f"(N distinct starts, 0..total), {occ}",
            flush=True,
        )
        out.unpersist()
        df.unpersist()
    finally:
        spark.stop()


if __name__ == "__main__":
    main()
