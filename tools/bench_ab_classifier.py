"""Fresh-JVM A/B attribution of the r10→r11 `text_quality_classifier`
bench regression (VERDICT r11 #2).

Round 11's committed band ({lo 0.847, med 1.658, hi 2.372}) sits
band-disjoint ×2.25 above round 10's (hi 0.829). Twelve sibling
regressions that round were on untouched code — the proven-environment
signature — but this one has a code suspect: serving's `_TOKEN_RE`
went ASCII `[a-z0-9_]+` → Unicode `\\w+` (classifier.py:66, the
round-11 train/serve feature-parity fix).

Kernel-level pre-check (run before this harness was written): on the
actual sf0.1 corpus, `re.findall` with the Unicode class is NOT slower
than the ASCII class (×0.97, identical tokenization on all 5000 docs)
— CPython's regex engine takes the same fast path for both on ASCII
text. This harness settles it at the bench level with the same
methodology bench.py uses:

Design: interleaved A B A B A B, each rep a FRESH python subprocess
(own JVM), timing ONLY the text_quality_classifier entry with
bench.py's adaptive-warmup + median-of-5 protocol:

  A — stock serving path (`\\w+`, the round-11 code)
  B — serving `_TOKEN_RE` monkeypatched back to the round-10 ASCII
      class (serving only; nothing else differs)

Interpretation (pre-registered):
  - A ≈ B and both near r10's band → the regex change is free; the
    committed r11 number was the environment shift the other 12
    regressions showed. Document in SCALE.md, keep the Unicode class.
  - A band-disjoint above B → the regex IS the cost; rework serving
    tokenization (e.g. pre-extract via str.split + translate filter)
    without losing train/serve parity.

Writes scratch/bench_ab_classifier_r12.json.

Usage: python tools/bench_ab_classifier.py [reps_per_arm=3]
"""

from __future__ import annotations

import json
import os
import statistics
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

_CHILD = r"""
import json, os, sys, time
sys.path.insert(0, {repo!r})
arm = {arm!r}
if arm == "B_ascii":
    import re
    from gecko_spark.operators import classifier
    classifier._TOKEN_RE = re.compile(r"[a-z0-9_]+")
import __spark_entry__ as e
from gecko_spark import get_spark

sf = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
spark = get_spark(app_name="ab-classifier", cpus=cpus, shuffle_partitions=cpus)
qs = e.queries()

def run():
    qs["text_quality_classifier"](spark, sf).write.mode(
        "overwrite").format("noop").save()

# bench.py's protocol: adaptive warmup (<=8, stop when a run lands
# within +-15% of the best), then median of 5
best = None
for _ in range(8):
    t0 = time.time(); run(); dt = time.time() - t0
    if best is not None and 0.85 * best <= dt <= 1.15 * best:
        break
    best = dt if best is None else min(best, dt)
runs = []
for _ in range(5):
    t0 = time.time(); run(); runs.append(time.time() - t0)
runs.sort()
print("ABRESULT " + json.dumps(
    {{"arm": arm, "med": runs[2], "lo": runs[0], "hi": runs[-1]}}))
spark.stop()
"""


def one_rep(arm: str) -> dict:
    code = _CHILD.format(repo=REPO, arm=arm)
    p = subprocess.run(
        [sys.executable, "-c", code],
        capture_output=True, text=True, cwd=REPO, timeout=600,
    )
    for line in p.stdout.splitlines():
        if line.startswith("ABRESULT "):
            return json.loads(line[len("ABRESULT "):])
    raise RuntimeError(f"{arm}: no result\n{p.stdout[-2000:]}\n{p.stderr[-2000:]}")


def main():
    reps = int(sys.argv[1]) if len(sys.argv) > 1 else 3
    results: dict[str, list[dict]] = {"A_unicode": [], "B_ascii": []}
    for i in range(reps):
        for arm in ("A_unicode", "B_ascii"):
            r = one_rep(arm)
            results[arm].append(r)
            print(f"rep {i} {arm}: med={r['med']:.3f} "
                  f"[{r['lo']:.3f}, {r['hi']:.3f}]", flush=True)
    summary = {}
    for arm, rs in results.items():
        meds = [r["med"] for r in rs]
        summary[arm] = {
            "med_of_meds": statistics.median(meds),
            "lo": min(r["lo"] for r in rs),
            "hi": max(r["hi"] for r in rs),
            "meds": meds,
        }
    a, b = summary["A_unicode"], summary["B_ascii"]
    ratio = a["med_of_meds"] / b["med_of_meds"]
    disjoint = a["lo"] > b["hi"] or b["lo"] > a["hi"]
    verdict = (
        "REGEX IS THE COST (bands disjoint, unicode slower)"
        if disjoint and ratio > 1.15
        else "regex exonerated: arms statistically indistinguishable"
        if not disjoint
        else "bands disjoint but ratio small — inspect"
    )
    out = {"reps_per_arm": reps, "summary": summary,
           "ratio_unicode_over_ascii": ratio, "bands_disjoint": disjoint,
           "verdict": verdict}
    print(json.dumps(out, indent=2))
    dest = os.path.join(REPO, "scratch", "bench_ab_classifier_r12.json")
    os.makedirs(os.path.dirname(dest), exist_ok=True)
    with open(dest, "w") as f:
        json.dump(out, f, indent=2)
    print(f"wrote {dest}")


if __name__ == "__main__":
    main()
