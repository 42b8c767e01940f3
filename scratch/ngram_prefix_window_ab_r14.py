"""Round-14 A/B: ngram_jaccard_pairs_prefix — per-shingle frequency via
partitionBy(shingle) window (new, single explode pass) vs the old
freq-aggregate + join + hot-shingle anti-join (three explode passes).

Parity: exact (id_a, id_b, round(jaccard, 6)) set equality at sf0.01 and
sf0.1 with the catalogue entry's config (n=4, threshold=0.35,
max_shingle_freq=500) plus an uncapped arm (max_shingle_freq=None) at
sf0.01. Timing: interleaved min-of-5 noop-sink runs at sf0.1 (only
meaningful on a quiet machine — see OPTIMIZATION_r14.md).

Usage: python scratch/ngram_prefix_window_ab_r14.py [--time]
"""

import sys
import time

sys.path.insert(0, ".")

from pyspark import StorageLevel
from pyspark.sql import Window
from pyspark.sql import functions as F

from gecko_spark import get_spark
from gecko_spark.core import persist_until_released
from gecko_spark.operators.dedup import char_shingles, ngram_jaccard_pairs_prefix
from gecko_spark.sources.testdata import load_table


def old_prefix(df, id_col, text_col, n=3, threshold=0.5, max_shingle_freq=None):
    """Pre-round-14 shape: freq aggregate + join, hot anti-join."""
    sh = df.select(
        F.col(id_col).alias("doc"),
        F.explode(char_shingles(F.col(text_col), n)).alias("shingle"),
    )
    if max_shingle_freq is not None:
        hot = (
            sh.groupBy("shingle")
            .agg(F.count("*").alias("f"))
            .filter(F.col("f") > max_shingle_freq)
            .select("shingle")
        )
        sh = sh.join(F.broadcast(hot), "shingle", "left_anti")
    freq = sh.groupBy("shingle").agg(F.count("*").alias("f"))
    ranked = sh.join(freq, "shingle")
    docs = (
        ranked.groupBy("doc")
        .agg(F.sort_array(F.collect_list(F.struct("f", "shingle"))).alias("tk"))
        .select("doc", F.col("tk.shingle").alias("toks"), F.size("tk").alias("sz"))
    )
    p = F.greatest(
        F.col("sz") - F.ceil(F.lit(float(threshold)) * F.col("sz")).cast("int") + F.lit(1),
        F.lit(1),
    )
    pref = docs.select("doc", "sz", "toks", F.slice("toks", F.lit(1), p).alias("prefix"))
    pref = pref.persist(StorageLevel.MEMORY_AND_DISK)
    idx = pref.select("doc", "sz", F.explode("prefix").alias("token"))
    a, b = idx.alias("a"), idx.alias("b")
    cand = (
        a.join(
            b,
            (F.col("a.token") == F.col("b.token"))
            & (F.col("a.doc") < F.col("b.doc"))
            & (
                F.greatest(F.col("a.sz"), F.col("b.sz")) * F.lit(float(threshold))
                <= F.least(F.col("a.sz"), F.col("b.sz"))
            ),
        )
        .select(F.col("a.doc").alias("id_a"), F.col("b.doc").alias("id_b"))
        .distinct()
    )
    fa = pref.select(F.col("doc").alias("id_a"), F.col("toks").alias("toks_a"), F.col("sz").alias("size_a"))
    fb = pref.select(F.col("doc").alias("id_b"), F.col("toks").alias("toks_b"), F.col("sz").alias("size_b"))
    inter = F.size(F.array_intersect("toks_a", "toks_b"))
    out = (
        cand.join(fa, "id_a")
        .join(fb, "id_b")
        .select(
            "id_a",
            "id_b",
            (
                inter.cast("double")
                / (F.col("size_a") + F.col("size_b") - inter).cast("double")
            ).alias("jaccard"),
        )
        .filter(F.col("jaccard") >= threshold)
    )
    return persist_until_released(pref, out)


def pairs_set(df):
    return {
        (r.id_a, r.id_b, r.j)
        for r in df.select("id_a", "id_b", F.round("jaccard", 6).alias("j")).collect()
    }


def main():
    do_time = "--time" in sys.argv
    spark = get_spark(app_name="ngram-ab", cpus=16, shuffle_partitions=16)
    try:
        for sf, arms in [
            ("/root/testdata/sf0.01", [500, None]),
            ("/root/testdata/sf0.1", [500]),
        ]:
            docs = load_table(spark, sf, "documents")
            for cap in arms:
                old = pairs_set(
                    old_prefix(docs, "doc_id", "text", n=4, threshold=0.35, max_shingle_freq=cap)
                )
                new = pairs_set(
                    ngram_jaccard_pairs_prefix(
                        docs, "doc_id", "text", n=4, threshold=0.35, max_shingle_freq=cap
                    )
                )
                tag = f"{sf.rsplit('/',1)[-1]} cap={cap}"
                if old == new:
                    print(f"PARITY OK   {tag}: {len(new)} pairs identical")
                else:
                    print(
                        f"PARITY FAIL {tag}: old={len(old)} new={len(new)} "
                        f"only_old={len(old-new)} only_new={len(new-old)}"
                    )
                    sys.exit(1)
        if do_time:
            docs = load_table(spark, "/root/testdata/sf0.1", "documents")

            def run_old():
                old_prefix(docs, "doc_id", "text", n=4, threshold=0.35,
                           max_shingle_freq=500).write.format("noop").mode("overwrite").save()

            def run_new():
                ngram_jaccard_pairs_prefix(docs, "doc_id", "text", n=4, threshold=0.35,
                                           max_shingle_freq=500).write.format("noop").mode("overwrite").save()

            for f in (run_old, run_new):  # warm both arms
                f()
            t = {"old": [], "new": []}
            for _ in range(5):  # interleaved min-of-5
                for name, f in (("old", run_old), ("new", run_new)):
                    t0 = time.time()
                    f()
                    t[name].append(time.time() - t0)
            for name, runs in t.items():
                runs.sort()
                print(f"{name}: min={runs[0]:.2f} med={runs[len(runs)//2]:.2f} runs={[round(x,2) for x in runs]}")
    finally:
        spark.stop()


if __name__ == "__main__":
    main()
