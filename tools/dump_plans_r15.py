"""Dump .explain("formatted") for catalogue queries into plans/r15/.

Usage:
    python tools/dump_plans_r14.py before [sf_dir] [name ...]
    python tools/dump_plans_r14.py after  [sf_dir] [name ...]

Writes plans/r15/<name>_<tag>.txt — the optimization-round evidence the
judge checks plan claims against (guide §1: capture the plan shape —
Exchange count, join strategy, PushedFilters/ReadSchema, codegen spans,
BatchEvalPython/ArrowEvalPython nodes — before and after each change).
"""

from __future__ import annotations

import os
import sys
import time
import traceback

sys.path.insert(0, ".")

import __spark_entry__ as e  # noqa: E402
from gecko_spark import get_spark  # noqa: E402

OUT_DIR = os.path.join("plans", "r15")


def explain_formatted(df) -> str:
    jqe = df._jdf.queryExecution()
    mode = df.sparkSession._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
        "formatted"
    )
    return jqe.explainString(mode)


def main():
    tag = sys.argv[1] if len(sys.argv) > 1 else "before"
    args = sys.argv[2:]
    sf = args[0] if args and os.path.isdir(args[0]) else "/root/testdata/sf0.01"
    only = set(a for a in args if not os.path.isdir(a))
    os.makedirs(OUT_DIR, exist_ok=True)
    spark = get_spark(app_name=f"dump-plans-r15-{tag}", cpus=8, shuffle_partitions=8)
    qs = e.queries()
    n_ok = n_err = 0
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        path = os.path.join(OUT_DIR, f"{name}_{tag}.txt")
        try:
            df = fn(spark, sf)
            txt = explain_formatted(df)
        except Exception:
            txt = "ERROR during plan capture:\n" + traceback.format_exc()
            n_err += 1
        else:
            n_ok += 1
        with open(path, "w") as f:
            f.write(f"# {name} ({tag}, sf={sf})\n\n{txt}\n")
        print(f"{name}: {time.time()-t0:.1f}s -> {path}")
    print(f"done: {n_ok} ok, {n_err} errors")
    spark.stop()


if __name__ == "__main__":
    main()
