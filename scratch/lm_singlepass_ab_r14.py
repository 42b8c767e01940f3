"""Round-14 A/B: LM scoring family single-pass rewrites.

- bigram_logprob: GROUPING SETS ((tok),(prev,tok),(prev)) builds the
  whole model in ONE tokenize+lag pass materialized via lazy
  localCheckpoint (old: separate uni/big/ctx aggregates re-ran the
  tokenize+lag subtree per consumer — 5 Generate / 3 Window nodes).
- unigram_logprob: vocab table localCheckpointed (old: freq consumed by
  totals + scoring join = 3 tokenize passes).
- perplexity_buckets exact mode: count(score) windows over the single
  frame (old: scored/null filter split + union = upstream evaluated 2×).

Parity: exact row sets at sf0.01 and sf0.1. Timing: interleaved
min-of-5 noop-sink runs at sf0.1.

Usage: python scratch/lm_singlepass_ab_r14.py [--time]
"""

import sys
import time

sys.path.insert(0, ".")

from pyspark.sql import Window
from pyspark.sql import functions as F

from gecko_spark import get_spark
from gecko_spark.operators.text import (
    bigram_logprob,
    perplexity_buckets,
    tokens,
    unigram_logprob,
)
from gecko_spark.sources.testdata import load_table


def old_unigram(df, id_col="doc_id", text_col="text"):
    toks = df.select(
        F.col(id_col),
        F.explode(tokens(F.coalesce(F.col(text_col), F.lit("")))).alias("tok"),
    )
    freq = toks.groupBy("tok").agg(F.count("*").alias("cnt"))
    total = freq.agg(F.sum("cnt").alias("__total__"))
    logp = (
        toks.join(freq, "tok")
        .crossJoin(F.broadcast(total))
        .withColumn(
            "logp",
            F.round(
                F.log(F.col("cnt").cast("double") / F.col("__total__")), 6
            ).cast("decimal(28, 6)"),
        )
    )
    scored = logp.groupBy(id_col).agg(
        F.count("*").alias("n_tokens"),
        (F.sum("logp") * F.lit(1000000)).cast("long").alias("__s_mic__"),
    )
    sign = F.when(F.col("__s_mic__") < 0, F.lit(-1)).otherwise(F.lit(1))
    num = F.lit(2) * F.abs(F.col("__s_mic__")) + F.col("n_tokens")
    den = F.lit(2) * F.col("n_tokens")
    avg_mic = (num - num % den) / den
    return df.select(F.col(id_col)).join(scored, id_col, "left").select(
        id_col,
        F.coalesce(F.col("n_tokens"), F.lit(0)).cast("long").alias("n_tokens"),
        F.when(F.col("n_tokens") > 0, sign * avg_mic / F.lit(1000000.0)).alias(
            "avg_logprob"
        ),
    )


def old_bigram(df, id_col="doc_id", text_col="text", backoff=0.4):
    toks = df.select(
        F.col(id_col),
        F.posexplode(tokens(F.coalesce(F.col(text_col), F.lit("")))).alias(
            "pos", "tok"
        ),
    )
    w = Window.partitionBy(id_col).orderBy("pos")
    pairs = toks.withColumn("prev", F.lag("tok").over(w))
    uni = pairs.groupBy("tok").agg(F.count("*").alias("ucnt"))
    total = uni.agg(F.sum("ucnt").alias("__total__"))
    big = (
        pairs.filter(F.col("prev").isNotNull())
        .groupBy("prev", "tok")
        .agg(F.count("*").alias("bcnt"))
    )
    ctx = big.groupBy("prev").agg(F.sum("bcnt").alias("ccnt"))
    scored_toks = (
        pairs.join(uni, "tok")
        .join(big, ["prev", "tok"], "left")
        .join(ctx, "prev", "left")
        .crossJoin(F.broadcast(total))
        .withColumn(
            "logp",
            F.round(
                F.when(
                    F.col("prev").isNull(),
                    F.log(F.col("ucnt").cast("double") / F.col("__total__")),
                )
                .when(
                    F.col("bcnt").isNotNull(),
                    F.log(F.col("bcnt").cast("double") / F.col("ccnt")),
                )
                .otherwise(
                    F.log(
                        F.lit(float(backoff))
                        * F.col("ucnt").cast("double")
                        / F.col("__total__")
                    )
                ),
                6,
            ).cast("decimal(28, 6)"),
        )
    )
    scored = scored_toks.groupBy(id_col).agg(
        F.count("*").alias("n_tokens"),
        (F.sum("logp") * F.lit(1000000)).cast("long").alias("__s_mic__"),
    )
    sign = F.when(F.col("__s_mic__") < 0, F.lit(-1)).otherwise(F.lit(1))
    num = F.lit(2) * F.abs(F.col("__s_mic__")) + F.col("n_tokens")
    den = F.lit(2) * F.col("n_tokens")
    avg_mic = (num - num % den) / den
    return df.select(F.col(id_col)).join(scored, id_col, "left").select(
        id_col,
        F.coalesce(F.col("n_tokens"), F.lit(0)).cast("long").alias("n_tokens"),
        F.when(F.col("n_tokens") > 0, sign * avg_mic / F.lit(1000000.0)).alias(
            "avg_logprob"
        ),
    )


def old_ppl(df, score_col, group_cols):
    score = F.col(score_col)
    scored = df.filter(score.isNotNull())
    nulls = df.filter(score.isNull()).withColumn("ppl_bucket", F.lit("tail"))
    w_n = Window.partitionBy(*group_cols)
    w_c = (
        Window.partitionBy(*group_cols)
        .orderBy(score.desc())
        .rangeBetween(Window.unboundedPreceding, Window.currentRow)
    )
    n, c = F.count("*").over(w_n), F.count("*").over(w_c)
    bucket = (
        F.when(F.lit(3) * c <= n, F.lit("head"))
        .when(F.lit(3) * c <= F.lit(2) * n, F.lit("middle"))
        .otherwise(F.lit("tail"))
    )
    return scored.withColumn("ppl_bucket", bucket).unionByName(nulls)


def rows(df):
    return {tuple(r) for r in df.collect()}


def main():
    do_time = "--time" in sys.argv
    spark = get_spark(app_name="lm-ab", cpus=16, shuffle_partitions=16)
    try:
        for sf in ("/root/testdata/sf0.01", "/root/testdata/sf0.1"):
            docs = load_table(spark, sf, "documents")
            tag = sf.rsplit("/", 1)[-1]
            for name, old_df, new_df in [
                ("unigram", old_unigram(docs), unigram_logprob(docs)),
                ("bigram", old_bigram(docs), bigram_logprob(docs)),
            ]:
                o, n = rows(old_df), rows(new_df)
                print(
                    f"PARITY {'OK  ' if o == n else 'FAIL'} {tag} {name}: "
                    f"{len(n)} rows{'' if o == n else f' old={len(o)} diff={len(o ^ n)}'}"
                )
                if o != n:
                    sys.exit(1)
            lp = unigram_logprob(docs).join(docs.select("doc_id", "lang"), "doc_id")
            o = rows(old_ppl(lp, "avg_logprob", ("lang",)))
            n = rows(perplexity_buckets(lp, "avg_logprob", ("lang",)))
            print(
                f"PARITY {'OK  ' if o == n else 'FAIL'} {tag} ppl_buckets: {len(n)} rows"
            )
            if o != n:
                sys.exit(1)
        if do_time:
            docs = load_table(spark, "/root/testdata/sf0.1", "documents")
            arms = {
                "bigram_old": lambda: old_bigram(docs),
                "bigram_new": lambda: bigram_logprob(docs),
                "unigram_old": lambda: old_unigram(docs),
                "unigram_new": lambda: unigram_logprob(docs),
            }

            def run(mk):
                mk().write.format("noop").mode("overwrite").save()

            for mk in arms.values():
                run(mk)  # warm
            t = {k: [] for k in arms}
            for _ in range(5):
                for k, mk in arms.items():
                    t0 = time.time()
                    run(mk)
                    t[k].append(time.time() - t0)
            for k, runs in t.items():
                runs.sort()
                print(
                    f"{k}: min={runs[0]:.2f} med={runs[len(runs)//2]:.2f} "
                    f"runs={[round(x, 2) for x in runs]}"
                )
    finally:
        spark.stop()


if __name__ == "__main__":
    main()
