"""Round-15 core-count scaling spot-bench (VERDICT r14 #6).

At sf0.1 every bench entry runs 0.1-2 s and is dominated by
job-scheduling / Arrow / driver constants, so 8-vs-32-core ratios read
~1 and core scaling cannot be adjudicated. This harness inflates the
sf0.1 tables 10x IN MEMORY (deterministic copy tags keep the dedup
workloads' duplicate structure from degenerating: texts get a per-copy
prefix word, embeddings a per-copy deterministic perturbation, ids a
per-copy offset) and times the heaviest operator bodies solo, one
fresh JVM per (entry, cpus) cell.

Usage:
  python tools/scale_r15.py <entry> <cpus>     # one cell, prints secs
  python tools/scale_r15.py --all              # full matrix -> stdout table

This is a measurement harness only: nothing is persisted across runs,
and the inflated frames are rebuilt from the parquet inputs inside
every timed process.
"""
import json
import os
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF = "/root/testdata/sf0.1"
# Per-entry inflation factor, sized so the entry is genuinely
# CPU/shuffle-bound (a 10x probe round showed the 10x dedup/text
# corpora still dominated by fixed stage structure: ratios ~1.0).
ENTRIES = {
    "minhash_pairs": 10,
    "transitive": 10,
    "semantic_pairs": 10,
    "bm25_topk": 10,
    "quantiles": 50,
    "unigram_logprob": 50,
    "decontam": 10,
    "kmv_overlap": 50,
    "vocab_divergence": 10,
    "li_group_join": 10,
    "gen_10m": 1,
    "mut_10m_phonetic": 1,
}
COPIES = 10  # overridden per entry in run_cell


def _inflated_docs(spark, COPIES):
    from pyspark.sql import functions as F

    from gecko_spark.sources.testdata import load_table

    docs = load_table(spark, SF, "documents")
    rest = [c for c in docs.columns if c not in ("doc_id", "text")]
    parts = [
        docs.select(
            (F.col("doc_id") + F.lit(i * 10_000_000)).alias("doc_id"),
            F.concat(F.lit(f"c{i} "), F.col("text")).alias("text"),
            *rest,
        )
        for i in range(COPIES)
    ]
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


def _inflated_lineitem(spark, COPIES):
    from pyspark.sql import functions as F

    from gecko_spark.sources.testdata import load_table

    li = load_table(spark, SF, "lineitem")
    parts = [
        li.withColumn("l_orderkey", F.col("l_orderkey") + F.lit(i * 100_000_000))
        for i in range(COPIES)
    ]
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


def _inflated_embeddings(spark, COPIES):
    from pyspark.sql import functions as F

    from gecko_spark.sources.testdata import load_table

    emb = load_table(spark, SF, "embeddings")
    parts = []
    for i in range(COPIES):
        pert = F.transform(
            F.col("embedding"),
            lambda x, j: x + F.lit(float(i)) * (j.cast("double") % 7 - 3) * 1e-4,
        )
        parts.append(
            emb.select(
                (F.col("vec_id") + F.lit(i * 10_000_000)).alias("vec_id"),
                pert.alias("embedding"),
            )
        )
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


def build(spark, entry, COPIES):
    from pyspark.sql import functions as F

    from gecko_spark.sources.testdata import load_table

    if entry == "minhash_pairs":
        from gecko_spark.operators.dedup import minhash_candidate_pairs

        return lambda: minhash_candidate_pairs(
            _inflated_docs(spark, COPIES), "doc_id", "text"
        )
    if entry == "transitive":
        from gecko_spark.operators.dedup import minhash_dedupe_transitive

        return lambda: minhash_dedupe_transitive(
            _inflated_docs(spark, COPIES), "doc_id", "text", threshold=0.8
        )
    if entry == "semantic_pairs":
        from gecko_spark.operators.dedup import semantic_dedupe_pairs

        return lambda: semantic_dedupe_pairs(
            _inflated_embeddings(spark, COPIES), "vec_id", "embedding",
            threshold=0.1, n_clusters=45, init="first_k", method="fold",
        )
    if entry == "bm25_topk":
        from gecko_spark.operators.retrieval import bm25_topk

        def _bm25():
            docs = _inflated_docs(spark, COPIES)
            queries = (
                load_table(spark, SF, "documents")
                .limit(34)
                .select(
                    F.col("doc_id").alias("query_id"),
                    F.col("text").alias("query_text"),
                )
            )
            return bm25_topk(docs, queries, k=10)

        return _bm25
    if entry == "quantiles":
        from gecko_spark.operators.sketches import (
            quantile_estimate,
            quantile_sketch,
        )

        def _q():
            li = _inflated_lineitem(spark, COPIES).select(
                F.concat_ws(
                    "-",
                    F.col("l_orderkey").cast("string"),
                    F.col("l_linenumber").cast("string"),
                ).alias("id"),
                "l_extendedprice",
            )
            return quantile_estimate(
                quantile_sketch(li, "l_extendedprice", "id", k=256),
                [0.25, 0.5, 0.9, 0.99],
            )

        return _q
    if entry == "unigram_logprob":
        from gecko_spark.operators.text import unigram_logprob

        return lambda: unigram_logprob(_inflated_docs(spark, COPIES), "doc_id", "text")
    if entry == "decontam":
        from gecko_spark.operators.decontam import decontaminate

        def _d():
            docs = _inflated_docs(spark, COPIES)
            heldout = docs.filter(F.col("doc_id") % 97 == 0).select(
                "doc_id", "text"
            )
            train = docs.filter(F.col("doc_id") % 97 != 0)
            return decontaminate(train, heldout, "doc_id", "text", n=6)

        return _d
    if entry == "kmv_overlap":
        from gecko_spark.operators.sketches import kmv_overlap_estimate, kmv_sketch

        def _k():
            docs = _inflated_docs(spark, COPIES)
            sa = kmv_sketch(docs.filter("doc_id % 2 = 0"), "text", k=1024)
            sb = kmv_sketch(docs.filter("doc_id % 2 = 1"), "text", k=1024)
            return kmv_overlap_estimate(sa, sb, k=1024)

        return _k
    if entry == "vocab_divergence":
        from gecko_spark.operators.text import vocab_divergence

        def _v():
            docs = _inflated_docs(spark, COPIES)
            return vocab_divergence(
                docs.filter("doc_id % 2 = 0"),
                docs.filter("doc_id % 2 = 1"),
                "text",
                k=10,
            )

        return _v
    if entry in ("gen_10m", "mut_10m_phonetic"):
        # the bench's 1M-row generator/mutator workloads at 10M rows —
        # the genuinely CPU-bound per-row kernels (VERDICT r14's own
        # 8-core spot-check found its only >2x ratio on gen_1m_4cols)
        import bench as bm
        from gecko_spark.operators import mutators as M

        def _gen():
            return bm._gen_1m(spark)

        if entry == "gen_10m":
            bm.BENCH_N = 10_000_000
            return _gen

        def _mut():
            bm.BENCH_N = 10_000_000
            base = bm._gen_1m(spark)
            return M.with_phonetic_replacement_table(
                bm.PHON, "source", "target", "flags"
            ).apply(base, "fruit", 0.1, seed=15)

        return _mut
    if entry == "li_group_join":
        # q21-shaped shuffle workload over the columns the test
        # lineitem actually has: multi-supplier orders via a
        # countDistinct aggregation, joined back to the fact rows,
        # re-aggregated per supplier — two wide shuffles + one SMJ
        def _gj():
            li = _inflated_lineitem(spark, COPIES)
            multi = (
                li.groupBy("l_orderkey")
                .agg(F.countDistinct("l_suppkey").alias("nsup"))
                .filter(F.col("nsup") > 1)
            )
            return (
                li.join(multi, "l_orderkey")
                .groupBy("l_suppkey")
                .agg(
                    F.count("*").alias("n"),
                    F.sum(
                        F.col("l_extendedprice") * (1 - F.col("l_discount"))
                    ).alias("rev"),
                )
                .orderBy(F.desc("n"), "l_suppkey")
                .limit(100)
            )

        return _gj
    raise SystemExit(f"unknown entry {entry}")


def run_cell(entry, cpus):
    os.environ["SPARK_GRAFT_CPUS"] = str(cpus)
    from gecko_spark import get_spark

    # the 50x signature frame sits in the awkward middle where the
    # planner still picks a broadcast join (its compressed estimate is
    # small — signatures compress well) but the built relation is ~1 GB
    # and OOMs the driver. At real scale the estimate crosses the
    # threshold and the sig joins plan as SMJ; force that honest shape
    # for the two 50x minhash cells.
    conf = {"spark.driver.maxResultSize": "4g"}
    spark = get_spark(cpus=cpus, extra_conf=conf)
    thunk = build(spark, entry, ENTRIES[entry])
    thunk().write.format("noop").mode("overwrite").save()  # warm
    runs = []
    for _ in range(2):
        t0 = time.time()
        thunk().write.format("noop").mode("overwrite").save()
        runs.append(time.time() - t0)
    spark.stop()
    return min(runs)


def main():
    if sys.argv[1:2] == ["--all"]:
        results = {}
        for entry in ENTRIES:
            row = {}
            for cpus in (8, 32):
                out = subprocess.run(
                    [sys.executable, os.path.abspath(__file__), entry, str(cpus)],
                    capture_output=True,
                    text=True,
                    timeout=900,
                )
                line = [
                    ln for ln in out.stdout.splitlines() if ln.startswith("CELL")
                ]
                row[cpus] = float(line[-1].split()[-1]) if line else None
            results[entry] = row
            r = (
                round(row[8] / row[32], 2)
                if row.get(8) and row.get(32)
                else None
            )
            print(f"{entry:20s} c8={row.get(8)} c32={row.get(32)} ratio={r}")
            sys.stdout.flush()
        print(json.dumps(results))
        return
    entry, cpus = sys.argv[1], int(sys.argv[2])
    print(f"CELL {entry} {cpus} {run_cell(entry, cpus):.3f}")


if __name__ == "__main__":
    main()
