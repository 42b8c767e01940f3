"""Round-14 opt A/B: kmv_overlap_estimate input materialization and
vocab_divergence joined-frame persist.

Parity: exact row equality of the returned frames before/after (both
are deterministic). Timing: interleaved min-of-5 per arm at sf0.1 with
the noop sink. Run AFTER the code change with GS_ARM=new, and at the
pre-change commit with GS_ARM=old (cross-commit interleave not needed:
the win is structural — corpus passes — and asserted on the plan).
"""
import os
import sys
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F

from gecko_spark import get_spark
from gecko_spark.sources.testdata import load_table

SF = os.environ.get("GS_SF", "/root/testdata/sf0.1")
spark = get_spark(cpus=int(os.environ.get("SPARK_GRAFT_CPUS", "32")))


def _run(df):
    df.write.format("noop").mode("overwrite").save()


def kmv_overlap():
    from gecko_spark.operators.sketches import kmv_overlap_estimate, kmv_sketch

    li = load_table(spark, SF, "lineitem")
    a = li.filter(F.col("l_returnflag") == "R").select(
        F.col("l_partkey").cast("string").alias("v")
    )
    b = li.filter(F.col("l_returnflag") == "A").select(
        F.col("l_partkey").cast("string").alias("v")
    )
    return kmv_overlap_estimate(kmv_sketch(a, "v", 256), kmv_sketch(b, "v", 256), 256)


def vocab_div():
    from gecko_spark.operators.text import vocab_divergence

    docs = load_table(spark, SF, "documents")
    half_a = docs.filter(F.col("doc_id") % 2 == 0)
    half_b = docs.filter(F.col("doc_id") % 2 == 1)
    return vocab_divergence(half_a, half_b, "text", k=20)


# ---- parity snapshot (committed as sorted rows) -------------------------
for name, fn in [("kmv_overlap", kmv_overlap), ("vocab_div", vocab_div)]:
    rows = sorted(map(tuple, fn().collect()))
    print(f"PARITY {name}: n={len(rows)}")
    for r in rows[:25]:
        print("  ", r)

# ---- timing: interleaved min-of-5 ---------------------------------------
REPS = int(os.environ.get("GS_REPS", "5"))
for name, fn in [("kmv_overlap", kmv_overlap), ("vocab_div", vocab_div)]:
    ts = []
    for _ in range(REPS):
        spark.sparkContext.setJobDescription(f"ab:{name}")
        t0 = time.time()
        _run(fn())
        ts.append(round(time.time() - t0, 3))
    print(f"TIME {name}: min {min(ts)} med {sorted(ts)[len(ts)//2]} all {ts}")
spark.stop()
