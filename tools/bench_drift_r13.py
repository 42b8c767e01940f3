"""Round-13 attribution runs (VERDICT r12 #2 and #4).

Phase 1 — the five band-disjoint drifts. Round 12 committed two
same-code full-bench sessions with disjoint bands on five entries
(`dedup_semantic_matrix`, `text_bm25_topk`, `topk_ivfpq_100q`,
`topk_pq_rerank_100q`, `warc_scan_128seg`):

    pre-drift  (commit b861d7e): loadavg_start 1.07, cpu_steal 0.1 %
    drifted    (commit f41d12d): loadavg_start 4.25, cpu_steal 0.0 %

Protocol, pre-registered: N fresh-JVM FULL bench sessions (identical
session shape to both compared runs — same entry list, same setup),
back-to-back on an otherwise idle machine, env fingerprint recorded
per session.  Interpretation:
  - new sessions' bands overlap the PRE-DRIFT bands → the f41d12d
    session was environment (its loadavg-4.25 fingerprint is the
    smoking gun); document in SCALE.md, no code action.
  - new sessions reproduce the DRIFTED bands → something persistent
    changed (data layout, JVM, kernel); bisect next.

Phase 2 — curation_e2e dispersion (lo 34.7 vs med 42.5 s, n_runs=3).
N fresh-JVM sessions run ONLY the curation chain with per-stage
driver-action timers (examples/corpus_curation.py::curate_to_sequences
``timers=``), 1 warmup + 3 timed reps each. The per-stage medians
across sessions show which stage owns the spread (suspects from the
VERDICT: the minhash shuffle inside train_fill, or the DSIR fit).

Writes scratch/bench_drift_r13.json and prints both tables.

Usage: python tools/bench_drift_r13.py [sessions=3]
"""

from __future__ import annotations

import json
import os
import statistics
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

DRIFTED_5 = [
    "dedup_semantic_matrix",
    "text_bm25_topk",
    "topk_ivfpq_100q",
    "topk_pq_rerank_100q",
    "warc_scan_128seg",
]

# committed bands being adjudicated (med/lo/hi at sf0.1)
PRE_DRIFT = {  # commit b861d7e (round-12 close-out)
    "dedup_semantic_matrix": (1.349, 1.277, 1.45),
    "text_bm25_topk": (1.832, 1.815, 1.913),
    "topk_ivfpq_100q": (0.787, 0.769, 0.843),
    "topk_pq_rerank_100q": (0.706, 0.64, 0.739),
    "warc_scan_128seg": (1.167, 1.133, 1.276),
}
DRIFTED = {  # commit f41d12d (driver, round-12 end)
    "dedup_semantic_matrix": (1.602, 1.524, 1.705),
    "text_bm25_topk": (2.15, 2.034, 2.195),
    "topk_ivfpq_100q": (1.093, 1.004, 1.204),
    "topk_pq_rerank_100q": (0.875, 0.76, 0.994),
    "warc_scan_128seg": (1.422, 1.406, 1.473),
}

_CURATION_RUNNER = r"""
import json, sys, time
sys.path.insert(0, {repo!r})
from gecko_spark import get_spark
from gecko_spark.sources.testdata import load_table
import examples.corpus_curation as cc

spark = get_spark(app_name="curation-timers", cpus=32, shuffle_partitions=32)
load_table(spark, {sf_dir!r}, "lineitem").count()  # session warm
reps = []
for rep in range(4):  # rep 0 = warmup (same protocol as timed_slow)
    timers = {{}}
    t0 = time.time()
    seqs, cached = cc.curate_to_sequences(spark, {sf_dir!r}, timers=timers)
    seqs.write.format("noop").mode("overwrite").save()
    timers["final_scan"] = round(time.time() - t0 - sum(timers.values()), 3)
    timers["total"] = round(time.time() - t0, 3)
    for c in cached:
        c.unpersist()
    if rep:
        reps.append(timers)
print("CURATION_JSON:" + json.dumps(reps))
spark.stop()
"""


def _run_full_bench(i: int) -> dict:
    t0 = time.time()
    proc = subprocess.run(
        [sys.executable, "bench.py"],
        cwd=REPO,
        capture_output=True,
        text=True,
        timeout=3600,
    )
    line = proc.stdout.strip().splitlines()[-1]
    doc = json.loads(line)
    with open(os.path.join(REPO, "BENCH_DISPERSION.json")) as f:
        disp = json.load(f)
    return {
        "session": i,
        "wall_s": round(time.time() - t0, 1),
        "rc": proc.returncode,
        "env": disp.get("env"),
        "headline25_total": disp.get("headline25_total"),
        "queries": {k: disp["queries"].get(k) for k in DRIFTED_5},
        "errors": doc.get("errors"),
    }


def _run_curation_session(i: int, sf_dir: str) -> dict:
    t0 = time.time()
    proc = subprocess.run(
        [sys.executable, "-c", _CURATION_RUNNER.format(repo=REPO, sf_dir=sf_dir)],
        cwd=REPO,
        capture_output=True,
        text=True,
        timeout=1800,
    )
    reps = None
    for ln in proc.stdout.splitlines():
        if ln.startswith("CURATION_JSON:"):
            reps = json.loads(ln[len("CURATION_JSON:"):])
    return {
        "session": i,
        "wall_s": round(time.time() - t0, 1),
        "rc": proc.returncode,
        "reps": reps,
        "stderr_tail": proc.stderr[-400:] if proc.returncode else None,
    }


def main() -> None:
    sessions = int(sys.argv[1]) if len(sys.argv) > 1 else 3
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    out = {"phase1_full_bench": [], "phase2_curation_timers": []}

    for i in range(sessions):
        r = _run_full_bench(i)
        out["phase1_full_bench"].append(r)
        print(f"[phase1 session {i}] rc={r['rc']} wall={r['wall_s']}s "
              f"loadavg={r['env'].get('loadavg_start')} "
              f"steal={r['env'].get('cpu_steal_pct')}%")
        for k in DRIFTED_5:
            print(f"    {k}: {r['queries'][k]}")

    for i in range(sessions):
        r = _run_curation_session(i, sf_dir)
        out["phase2_curation_timers"].append(r)
        print(f"[phase2 session {i}] rc={r['rc']} wall={r['wall_s']}s")
        if r["reps"]:
            for rep in r["reps"]:
                print(f"    {rep}")

    # ---- phase-1 verdict table ----
    print("\n== phase 1: five drifted entries (med per session vs bands) ==")
    verdicts = {}
    for k in DRIFTED_5:
        meds = [
            s["queries"][k]["med"]
            for s in out["phase1_full_bench"]
            if s["queries"].get(k)
        ]
        pre_med, pre_lo, pre_hi = PRE_DRIFT[k]
        dr_med, dr_lo, dr_hi = DRIFTED[k]
        med = statistics.median(meds) if meds else None
        verdict = (
            "pre-drift" if med is not None and med <= pre_hi * 1.05
            else "drifted" if med is not None and med >= dr_lo * 0.95
            else "between"
        )
        verdicts[k] = {"session_meds": meds, "median": med, "verdict": verdict}
        print(f"  {k}: sessions={meds} | pre[{pre_lo},{pre_hi}] "
              f"drift[{dr_lo},{dr_hi}] -> {verdict}")

    # ---- phase-2 stage-median table ----
    print("\n== phase 2: curation per-stage medians across sessions ==")
    stage_meds = {}
    all_reps = [
        rep
        for s in out["phase2_curation_timers"]
        if s["reps"]
        for rep in s["reps"]
    ]
    if all_reps:
        for stage in all_reps[0]:
            vals = sorted(r[stage] for r in all_reps if stage in r)
            stage_meds[stage] = {
                "med": vals[len(vals) // 2],
                "lo": vals[0],
                "hi": vals[-1],
            }
            print(f"  {stage}: {stage_meds[stage]}")

    out["phase1_verdicts"] = verdicts
    out["phase2_stage_bands"] = stage_meds
    os.makedirs(os.path.join(REPO, "scratch"), exist_ok=True)
    with open(os.path.join(REPO, "scratch", "bench_drift_r13.json"), "w") as f:
        json.dump(out, f, indent=1, sort_keys=True)
    print("\nwrote scratch/bench_drift_r13.json")


if __name__ == "__main__":
    main()
