"""Interleaved same-session A/B of ensure_parallelism's spread flavor
(round-robin vs xxhash64 key) on the starved-input entries."""
import sys
import time

sys.path.insert(0, "/root/repo")
from pyspark.sql import functions as F  # noqa: E402

from gecko_spark import get_spark  # noqa: E402
from gecko_spark.operators import dedup as D  # noqa: E402

SF = "/root/testdata/sf0.1"
FLAVOR = {"mode": "rr"}

_orig = D.ensure_parallelism


def patched(df, min_ratio: float = 1.0):
    if df.isStreaming:
        return df
    sc = df.sparkSession.sparkContext
    target = max(1, int(sc.defaultParallelism * min_ratio))
    try:
        if len(df.inputFiles()) >= target:
            return df
    except Exception:
        pass
    try:
        if D._plan_has_shuffle(df):
            return df
    except Exception:
        pass
    if df.rdd.getNumPartitions() < target:
        n = sc.defaultParallelism
        if FLAVOR["mode"] == "hash":
            return df.repartition(
                n, F.xxhash64(F.struct(*[df[c] for c in df.columns]))
            )
        return df.repartition(n)
    return df


def main():
    D.ensure_parallelism = patched
    # re-bind in modules that imported the symbol directly
    import gecko_spark.operators.classifier as C
    import gecko_spark.operators.selection as S
    import gecko_spark.operators.sketches as K
    import gecko_spark.operators.text as X

    for m in (C, S, K, X):
        if hasattr(m, "ensure_parallelism"):
            m.ensure_parallelism = patched

    spark = get_spark(cpus=32)
    import __spark_entry__ as e

    qs = e.queries()
    entries = ["sketch_quantiles", "dedup_minhash_pairs"]
    results = {}
    for ent in entries:
        fn = qs[ent]

        def run():
            fn(spark, SF).write.format("noop").mode("overwrite").save()

        for mode in ("rr", "hash"):
            FLAVOR["mode"] = mode
            run()  # warm this variant's plan
        for rep in range(4):
            for mode in ("rr", "hash"):
                FLAVOR["mode"] = mode
                t0 = time.time()
                run()
                results.setdefault((ent, mode), []).append(time.time() - t0)
        for mode in ("rr", "hash"):
            rs = sorted(results[(ent, mode)])
            print(
                f"{ent:24s} {mode:5s} min={rs[0]:.3f} med={rs[len(rs)//2]:.3f} all={[round(r,3) for r in rs]}"
            )
        sys.stdout.flush()
    spark.stop()


if __name__ == "__main__":
    main()
