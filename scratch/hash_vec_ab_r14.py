"""Round-14 opt A/B: vectorized portable-hash fold (UCS4-view matrix).

One session per arm (flip the working tree with git stash between
runs); min-of-5 per entry with the noop sink. Entries chosen because
their kernels batch-hash strings via poly_hash_strings[_multi].
"""
import os
import sys
import time

sys.path.insert(0, "/root/repo")

from gecko_spark import get_spark

SF = os.environ.get("GS_SF", "/root/testdata/sf0.1")
ARM = os.environ.get("GS_ARM", "?")
spark = get_spark(cpus=int(os.environ.get("SPARK_GRAFT_CPUS", "32")))

import __spark_entry__ as e

qs = e.queries()
ENTRIES = [
    "sketch_quantiles",
    "sketch_heavy_hitters",
    "sketch_hll_estimate",
    "decontam_filter",
    "text_line_dedupe",
    "dsir_log_weights",
    "text_quality_classifier",
]
ENTRIES = [n for n in ENTRIES if n in qs]


def _run(df):
    df.write.format("noop").mode("overwrite").save()


# warm-up pass
for n in ENTRIES:
    _run(qs[n](spark, SF))

REPS = int(os.environ.get("GS_REPS", "5"))
for n in ENTRIES:
    ts = []
    for _ in range(REPS):
        spark.sparkContext.setJobDescription(f"hashab[{ARM}]:{n}")
        t0 = time.time()
        _run(qs[n](spark, SF))
        ts.append(round(time.time() - t0, 3))
    print(f"ARM {ARM} {n}: min {min(ts)} med {sorted(ts)[len(ts)//2]} all {ts}")
spark.stop()
