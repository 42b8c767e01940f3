"""Fresh-JVM A/B attribution of the r9→r10 bench session shift
(VERDICT r10 #1).

Round 10's bench session ran uniformly slower than round 9's
(common-set ×1.11, worst `mut_1m_regex_table` ×2.10) on kernels whose
code did not change, with disjoint dispersion bands. Hypothesis: the
three heavy entries round 10 added to the SAME JVM session (k-means PQ
training, 128-segment WARC parse, stride-1 substring hash) pressure
the shared session (heap/GC/codegen cache), slowing unrelated kernels.

Design: two bench configurations, each a FRESH `python bench.py`
subprocess (own JVM), interleaved A B A B A B so slow environment
drift hits both arms equally:

  A — the round-9 entry list: $SPARK_GRAFT_BENCH_EXCLUDE drops the
      round-10 additions (topk_ivfpq_100q, warc_scan_128seg,
      dedup_substring_spans) and the round-11 additions; bench.py
      also skips their off-timer setup (ivfpq_build, WARC fixture
      replication), so the session shape replicates round 9.
  B — the round-10 entry list (round-11 additions excluded only).

Interpretation (pre-registered, from the VERDICT):
  - If A reproduces r9's medians while B reproduces r10's, the new
    heavy entries pressure the shared session → isolate them.
  - If A is as slow as B, the shift is environment → document the
    dual fingerprint in SCALE.md.

Writes scratch/bench_ab_r11.json and prints a per-entry table for the
entries the VERDICT named plus the worst regressors.

Usage: python tools/bench_ab.py [runs_per_arm=3]
"""

from __future__ import annotations

import json
import os
import shutil
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
DISP = os.path.join(REPO, "BENCH_DISPERSION.json")

R11_ADDITIONS = [
    "topk_ivfpq_indexed_100q",
    "dedup_substring_winnowed",
    "dedup_substring_excise",
]
R10_ADDITIONS = [
    "topk_ivfpq_100q",
    "warc_scan_128seg",
    "dedup_substring_spans",
]

ARMS = {
    "A_r9_list": ",".join(R10_ADDITIONS + R11_ADDITIONS),
    "B_r10_list": ",".join(R11_ADDITIONS),
}

# the entries the VERDICT called out, plus band context
FOCUS = [
    "mut_1m_regex_table",
    "mut_1m_3spec_e2e",
    "mut_1m_replacement_inline",
    "mut_1m_phonetic",
    "mut_1m_edit_chain",
    "gen_1m_4cols",
    "q1_pricing_summary",
    "q5_region_revenue",
    "dedup_minhash_pairs",
    "text_gopher_quality",
]


def _one_run(exclude: str) -> dict:
    env = dict(os.environ)
    env["SPARK_GRAFT_BENCH_EXCLUDE"] = exclude
    t0 = time.time()
    proc = subprocess.run(
        [sys.executable, os.path.join(REPO, "bench.py")],
        cwd=REPO, env=env, capture_output=True, text=True, timeout=3600,
    )
    wall = time.time() - t0
    if proc.returncode != 0:
        raise RuntimeError(
            f"bench.py rc={proc.returncode}: {proc.stderr[-2000:]}"
        )
    with open(DISP) as f:
        d = json.load(f)
    return {"queries": d["queries"], "env": d.get("env", {}), "wall": round(wall, 1)}


def main() -> None:
    runs_per_arm = int(sys.argv[1]) if len(sys.argv) > 1 else 3
    orig = open(DISP, "rb").read() if os.path.exists(DISP) else None
    results: dict[str, list] = {arm: [] for arm in ARMS}
    try:
        for i in range(runs_per_arm):
            for arm, exclude in ARMS.items():
                print(f"run {i + 1}/{runs_per_arm} arm {arm} ...", flush=True)
                r = _one_run(exclude)
                results[arm].append(r)
                print(
                    f"  wall {r['wall']}s loadavg "
                    f"{r['env'].get('loadavg_start')}", flush=True
                )
    finally:
        if orig is not None:
            with open(DISP, "wb") as f:
                f.write(orig)

    # aggregate: per entry per arm — median of per-run medians, band
    # = [min lo, max hi] across runs
    agg: dict[str, dict] = {}
    for arm, runs in results.items():
        names = set()
        for r in runs:
            names |= {
                q for q, v in r["queries"].items() if isinstance(v, dict)
            }
        for q in names:
            vs = [r["queries"][q] for r in runs if q in r["queries"]]
            meds = sorted(v["med"] for v in vs)
            agg.setdefault(q, {})[arm] = {
                "med": meds[len(meds) // 2],
                "lo": min(v["lo"] for v in vs),
                "hi": max(v["hi"] for v in vs),
            }

    committed = {}
    for rnd in ("r09", "r10"):
        try:
            with open(os.path.join(REPO, f"BENCH_{rnd}.json")) as f:
                committed[rnd] = json.load(f)["parsed"]["queries"]
        except (OSError, KeyError, TypeError, ValueError):
            committed[rnd] = {}

    out = {
        "design": "interleaved fresh-JVM A/B, " + json.dumps(ARMS),
        "runs_per_arm": runs_per_arm,
        "per_entry": agg,
        "committed_medians": committed,
    }
    os.makedirs(os.path.join(REPO, "scratch"), exist_ok=True)
    with open(os.path.join(REPO, "scratch", "bench_ab_r11.json"), "w") as f:
        json.dump(out, f, indent=1, sort_keys=True)

    hdr = (
        f"{'entry':28s} {'A med':>7s} {'A band':>13s} {'B med':>7s} "
        f"{'B band':>13s} {'r9':>6s} {'r10':>6s}"
    )
    print("\n" + hdr + "\n" + "-" * len(hdr))
    for q in FOCUS:
        a, b = agg.get(q, {}).get("A_r9_list"), agg.get(q, {}).get("B_r10_list")
        if not (a and b):
            continue
        print(
            f"{q:28s} {a['med']:7.3f} [{a['lo']:5.3f},{a['hi']:5.3f}] "
            f"{b['med']:7.3f} [{b['lo']:5.3f},{b['hi']:5.3f}] "
            f"{committed['r09'].get(q, float('nan')):6.3f} "
            f"{committed['r10'].get(q, float('nan')):6.3f}"
        )
    common = [
        q for q in agg
        if "A_r9_list" in agg[q] and "B_r10_list" in agg[q]
    ]
    ta = sum(agg[q]["A_r9_list"]["med"] for q in common)
    tb = sum(agg[q]["B_r10_list"]["med"] for q in common)
    t9 = sum(committed["r09"].get(q, 0) for q in common)
    t10 = sum(committed["r10"].get(q, 0) for q in common)
    print(
        f"\ncommon {len(common)} entries: A {ta:.1f}s  B {tb:.1f}s  "
        f"(committed r9 {t9:.1f}s  r10 {t10:.1f}s)"
    )
    print("A≈B → environment/session-independent; A<B → entry-induced pressure")


if __name__ == "__main__":
    main()
