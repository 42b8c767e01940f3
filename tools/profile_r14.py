"""Round-14 optimization profiler: time named bench workloads in ONE
session with the noop sink (guide §1.4) and job labels (§1.5).

Usage:
    python tools/profile_r14.py [--sf DIR] [--reps N] name [name ...]

Names: any catalogue entry from __spark_entry__.queries(), plus the
composite bench-only workloads replicated from bench.py:
  curation_e2e, curation_stages (per-stage timer mode),
  dsir_select_e2e

Protocol per entry: 1 warmup + median of N (default 3) timed reps —
deliberately lighter than bench.py's adaptive protocol; this tool is
for the inner optimization loop, the committed numbers come from the
full multi-session bench.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, ".")

from pyspark.sql import functions as F  # noqa: E402

import __spark_entry__ as e  # noqa: E402
from gecko_spark import get_spark  # noqa: E402
from gecko_spark.sources.testdata import load_table  # noqa: E402


def _run(df):
    df.write.mode("overwrite").format("noop").save()


def _dsir_thunk(spark, sf_dir):
    from gecko_spark.core import LcgRandom
    from gecko_spark.operators.selection import (
        dsir_log_weights,
        fit_log_ratio_micro,
        gumbel_topk,
        hashed_ngram_bucket_counts,
    )

    docs = load_table(spark, sf_dir, "documents")
    target = docs.filter(F.col("doc_id") % 7 == 0)
    lr = fit_log_ratio_micro(
        hashed_ngram_bucket_counts(target, n_buckets=4096),
        hashed_ngram_bucket_counts(docs, n_buckets=4096),
        4096,
    )
    _run(gumbel_topk(dsir_log_weights(docs, lr), 500, LcgRandom("doc_id", seed=11)))


def _curation_thunk(spark, sf_dir, timers=None):
    import examples.corpus_curation as cc

    seqs, cached = cc.curate_to_sequences(spark, sf_dir, timers=timers)
    try:
        t0 = time.time()
        _run(seqs)
        if timers is not None:
            timers["final_scan"] = round(time.time() - t0, 3)
    finally:
        for c in cached:
            c.unpersist()


def main():
    args = sys.argv[1:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    reps = 3
    names = []
    i = 0
    while i < len(args):
        if args[i] == "--sf":
            sf_dir = args[i + 1]
            i += 2
        elif args[i] == "--reps":
            reps = int(args[i + 1])
            i += 2
        else:
            names.append(args[i])
            i += 1

    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    spark = get_spark(app_name="profile-r14", cpus=cpus, shuffle_partitions=cpus)
    load_table(spark, sf_dir, "lineitem").count()  # session warm
    qs = e.queries()
    results = {}
    for name in names:
        spark.sparkContext.setJobDescription(f"profile:{name}")
        if name == "curation_stages":
            all_timers = []
            for _ in range(reps):
                timers: dict = {}
                _curation_thunk(spark, sf_dir, timers=timers)
                all_timers.append(timers)
            for t in all_timers:
                print(f"curation_stages: {json.dumps(t)}")
            results[name] = all_timers
            continue
        if name == "curation_e2e":
            thunk = lambda: _curation_thunk(spark, sf_dir)  # noqa: E731
        elif name == "dsir_select_e2e":
            thunk = lambda: _dsir_thunk(spark, sf_dir)  # noqa: E731
        elif name in qs:
            thunk = lambda n=name: _run(qs[n](spark, sf_dir))  # noqa: E731
        else:
            print(f"SKIP {name}: unknown")
            continue
        try:
            thunk()  # warmup
            runs = []
            for _ in range(reps):
                t0 = time.time()
                thunk()
                runs.append(round(time.time() - t0, 3))
            runs.sort()
            results[name] = runs
            print(f"{name}: med {runs[len(runs)//2]:.3f} runs={runs}")
        except Exception as ex:  # noqa: BLE001
            print(f"FAIL {name}: {type(ex).__name__}: {ex}")
        spark.sparkContext.setJobDescription(None)
    print("RESULT " + json.dumps(results))
    spark.stop()


if __name__ == "__main__":
    main()
