"""Local replica of the driver's t2 correctness gate: run every
``queries()`` entry on Spark and its ``oracle_sql()`` on DuckDB over the
same sf dir, compare row count + column names + order-insensitive
values. Usage:

    python tools/check_oracle.py [sf_dir] [name ...]
    python tools/check_oracle.py --json OUT.json [sf_dir]   # driver-style report
"""

from __future__ import annotations

import json
import sys
import time

import duckdb
import pandas as pd

sys.path.insert(0, ".")

import __spark_entry__ as e  # noqa: E402
from gecko_spark import get_spark  # noqa: E402
from gecko_spark.sources.testdata import TABLES  # noqa: E402


def canon(pdf: pd.DataFrame) -> pd.DataFrame:
    """Mirror the DRIVER's canonicalization: sort RAW column values.

    Round 8 lesson (CORRECTNESS_r08.json mm_image_features /
    mm_audio_features): this function used to ``astype(str)`` object
    columns before sorting, which silently made array-typed contract
    columns sortable locally while the driver's raw ``sort_values``
    crashed with ``TypeError: unhashable type: 'list'``. Local green
    must PREDICT driver green, so non-scalar cells are now rejected
    loudly before the sort instead of being papered over."""
    pdf = pdf[sorted(pdf.columns)].copy()
    for c in pdf.columns:
        if pdf[c].dtype == object:
            bad = pdf[c].map(
                lambda v: isinstance(v, (list, tuple, dict, set, bytearray))
                or type(v).__name__ == "ndarray"
            )
            if bad.any():
                raise TypeError(
                    f"non-scalar values in contract column {c!r} "
                    f"(e.g. {pdf[c][bad].iloc[0]!r:.60}): the driver's "
                    "canonicalizer sorts raw values and would crash — "
                    "explode or summarize to scalar columns"
                )
    return pdf.sort_values(list(pdf.columns), ignore_index=True)


def kind(dtype) -> str:
    """Dtype class as the driver's value-hash sees it: ints of any width
    hash identically, but int vs float differs (``2`` vs ``2.0``) — the
    exact failure mode of round 1's ten HUGEINT-widened oracles."""
    k = dtype.kind
    return "int" if k in "iu" else ("dt" if k == "M" else k)


def main():
    args = sys.argv[1:]
    json_out = None
    if args and args[0] == "--json":
        json_out = args[1]
        args = args[2:]
    sf = args[0] if args else "/root/testdata/sf0.01"
    only = set(args[1:])
    report: dict[str, dict] = {}
    spark = get_spark(app_name="oracle-check", cpus=8, shuffle_partitions=8)
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf}/{t}.parquet')"
        )

    qs, oracles = e.queries(), e.oracle_sql()
    n_pass = n_fail = n_rows_only = 0

    def record(name, *, rows_match, schema_match, hash_match, spark_rows, oracle_rows, err):
        report[name] = {
            "rows_match": rows_match,
            "schema_match": schema_match,
            "hash_match": hash_match,
            "spark_rows": spark_rows,
            "oracle_rows": oracle_rows,
            "err": err,
        }

    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            got = fn(spark, sf).toPandas()
        except Exception as ex:
            print(f"FAIL  {name}: spark error: {ex}")
            record(name, rows_match=False, schema_match=False, hash_match=False,
                   spark_rows=None, oracle_rows=None, err=f"spark: {ex}")
            n_fail += 1
            continue
        if name not in oracles:
            status = "ROWS" if len(got) >= 0 else "FAIL"
            print(f"{status}  {name}: rows={len(got)} ({time.time()-t0:.1f}s) [no oracle]")
            record(name, rows_match=True, schema_match=None, hash_match=None,
                   spark_rows=len(got), oracle_rows=None, err=None)
            n_rows_only += 1
            continue
        try:
            exp = con.execute(oracles[name]).fetchdf()
        except Exception as ex:
            print(f"FAIL  {name}: duckdb error: {ex}")
            record(name, rows_match=False, schema_match=False, hash_match=False,
                   spark_rows=len(got), oracle_rows=None, err=f"duckdb: {ex}")
            n_fail += 1
            continue
        try:
            g, x = canon(got), canon(exp)
        except TypeError as ex:
            # a non-scalar contract column is THIS entry's failure —
            # record it and keep grading the rest (ADVICE r9)
            print(f"FAIL  {name}: {ex}")
            record(name, rows_match=None, schema_match=False, hash_match=False,
                   spark_rows=len(got), oracle_rows=len(exp),
                   err=f"non-scalar column: {ex}")
            n_fail += 1
            continue
        if list(g.columns) != list(x.columns):
            print(f"FAIL  {name}: columns {list(g.columns)} vs {list(x.columns)}")
            record(name, rows_match=len(g) == len(x), schema_match=False,
                   hash_match=False, spark_rows=len(g), oracle_rows=len(x),
                   err="column mismatch")
            n_fail += 1
            continue
        if len(g) != len(x):
            print(f"FAIL  {name}: rows {len(g)} vs {len(x)}")
            record(name, rows_match=False, schema_match=True, hash_match=False,
                   spark_rows=len(g), oracle_rows=len(x), err="row count")
            n_fail += 1
            continue
        bad_kinds = [
            (c, str(g[c].dtype), str(x[c].dtype))
            for c in g.columns
            if kind(g[c].dtype) != kind(x[c].dtype)
        ]
        if bad_kinds:
            print(f"FAIL  {name}: dtype-class mismatch {bad_kinds}")
            record(name, rows_match=True, schema_match=False, hash_match=False,
                   spark_rows=len(g), oracle_rows=len(x),
                   err=f"dtype-class {bad_kinds}")
            n_fail += 1
            continue
        try:
            # exact dtype width too (int32 vs int64 fails): local
            # strictness strictly dominates the driver's hash compare
            pd.testing.assert_frame_equal(g, x, check_exact=True)
            ok = True
        except AssertionError as ex:
            ok = False
            msg = str(ex).splitlines()[0:4]
        record(name, rows_match=True, schema_match=True, hash_match=ok,
               spark_rows=len(g), oracle_rows=len(x),
               err=None if ok else "value mismatch")
        if ok:
            print(f"PASS  {name}: rows={len(g)} ({time.time()-t0:.1f}s)")
            n_pass += 1
        else:
            print(f"FAIL  {name}: value mismatch: {' | '.join(msg)}")
            # show first differing row for debugging
            neq = (g != x).any(axis=1)
            if neq.any():
                i = neq.idxmax()
                print(f"      spark : {g.loc[i].to_dict()}")
                print(f"      oracle: {x.loc[i].to_dict()}")
            n_fail += 1
    print(f"\n{n_pass} pass, {n_fail} fail, {n_rows_only} rows-only")
    if json_out:
        with open(json_out, "w") as f:
            json.dump(report, f, indent=2)
        print(f"wrote {json_out}")
    spark.stop()
    return 1 if n_fail else 0


if __name__ == "__main__":
    sys.exit(main())
