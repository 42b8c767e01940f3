"""Round-6 scale datapoints (VERDICT r5 'next' #8): extend the measured
scale evidence to the 1.24 M-doc corpus for the three round-5 ops the
round-5 sweep left short — ``dedup_fp_overlap`` (measured only to
620k), ``heavy_hitters`` on the token stream (to 620k), and
``dedup_semantic_pairs`` (never scale-measured; the contract query runs
at oracle shape, 16 first_k clusters on 500 vectors).

Semantic dedup gets its own planted-vector corpus: deterministic unit
gaussians (scale_pq.make_vectors) with 20% near-duplicate copies
(normalize(v + 0.01·g) — cosine ≈ 0.9968 to the original), clustered at
the 100 TB operating point the operator's docstring prescribes
(n_clusters ∝ n ⇒ fixed expected cluster size ⇒ Σ cluster² ∝ n).
Recall of the planted pairs is exact by id arithmetic (mutant of d is
d + n), so the speed numbers carry a correctness certificate.

Usage:
    python tools/scale_r6.py                 # 62k + 1.24M text, 62k + 1.24M vectors
    python tools/scale_r6.py 50000           # single custom base size

Prints the SCALE.md addendum block; corpora cached under scratch/.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, ".")
sys.path.insert(0, "tools")

from pyspark.sql import functions as F

import __spark_entry__ as e
from gecko_spark import get_spark
from gecko_spark.operators.dedup import semantic_dedupe_pairs
from gecko_spark.operators.sketches import heavy_hitters
from scale_pq import make_vectors
from scale_stress import SCRATCH, make_corpus, plan_shape


def _noop(df) -> None:
    df.write.mode("overwrite").format("noop").save()


def text_corpus(spark, n_base: int) -> str:
    d = os.path.join(SCRATCH, f"scale_{n_base}")
    if not os.path.exists(os.path.join(d, "documents.parquet")):
        t0 = time.time()
        total = make_corpus(spark, n_base, d)
        print(f"generated {d}: {total} docs in {time.time() - t0:.1f}s", flush=True)
    return d


def vec_corpus(spark, n_base: int, dim: int = 64, seed: int = 7) -> str:
    """Base vectors + 20% planted near-dup copies (mutant of d is
    d + n_base), written once to parquet."""
    path = os.path.join(SCRATCH, f"scale_vec_{n_base}", "embeddings.parquet")
    if not os.path.exists(path):
        base = make_vectors(spark, n_base, dim=dim, seed=seed)
        noise = (
            make_vectors(spark, n_base, dim=dim, seed=seed + 1000)
            .withColumnRenamed("embedding", "g")
        )
        mut = (
            base.filter(F.col("vec_id") % 5 == 1)
            .join(noise, "vec_id")
            .select(
                (F.col("vec_id") + n_base).alias("vec_id"),
                F.zip_with(
                    "embedding", "g", lambda v, g: v + F.lit(0.01) * g
                ).alias("raw"),
            )
        )
        norm = F.sqrt(F.aggregate("raw", F.lit(0.0), lambda a, x: a + x * x))
        mut = mut.select(
            "vec_id", F.transform("raw", lambda x: x / norm).alias("embedding")
        )
        base.unionByName(mut).repartition(max(8, n_base // 50_000)).write.mode(
            "overwrite"
        ).parquet(path)
    return path


def run_fp_overlap(spark, d: str) -> tuple[float, int, tuple]:
    q = e.queries()["dedup_fp_overlap"]
    t0 = time.time()
    _noop(q(spark, d))
    wall = time.time() - t0
    pairs = q(spark, d).count()
    return round(wall, 2), pairs, plan_shape(spark, d, "dedup_fp_overlap")


def run_heavy_hitters(spark, d: str) -> tuple[float, int, int, bool]:
    docs = spark.read.parquet(os.path.join(d, "documents.parquet"))
    toks = docs.select(F.explode(F.split("text", " ")).alias("tok"))
    n_tokens = toks.count()
    t0 = time.time()
    rows = heavy_hitters(toks, "tok", 1, 10_000).collect()
    wall = time.time() - t0
    # exactness: the 400 flat-vocab words are the only values above the
    # phi cut by corpus construction (scale_stress.make_corpus)
    exact_400 = len(rows) == 400
    return round(wall, 2), n_tokens, len(rows), exact_400


def run_semantic(spark, path: str, n_base: int) -> dict:
    emb = spark.read.parquet(path)
    n = emb.count()
    n_clusters = max(16, n // 128)
    kwargs = dict(
        threshold=0.99,
        n_clusters=n_clusters,
        seed=3,
        init="kmeans",
        max_cluster_size=4096,
    )
    t0 = time.time()
    _noop(semantic_dedupe_pairs(emb, "vec_id", "embedding", **kwargs))
    wall = time.time() - t0
    pairs = semantic_dedupe_pairs(emb, "vec_id", "embedding", **kwargs)
    from pyspark import StorageLevel

    pairs = pairs.persist(StorageLevel.MEMORY_AND_DISK)
    n_pairs = pairs.count()
    planted = emb.filter(F.col("vec_id") >= n_base).select(
        (F.col("vec_id") - n_base).alias("id_a"), F.col("vec_id").alias("id_b")
    )
    n_planted = planted.count()
    n_hit = planted.join(pairs, ["id_a", "id_b"], "left_semi").count()
    plan = (
        semantic_dedupe_pairs(emb, "vec_id", "embedding", **kwargs)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    pairs.unpersist()
    return {
        "n": n,
        "clusters": n_clusters,
        "wall": round(wall, 2),
        "pairs": n_pairs,
        "planted": n_planted,
        "recall": n_hit / max(n_planted, 1),
        "shape": (plan.count("Exchange"), plan.count("ArrowEvalPython")),
    }


def main():
    sizes = [int(a) for a in sys.argv[1:]] or [50_000, 1_000_000]
    spark = get_spark(
        app_name="scale-r6", cpus=int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    )
    os.makedirs(SCRATCH, exist_ok=True)
    try:
        text_rows, hh_rows, sem_rows = [], [], []
        for n in sizes:
            d = text_corpus(spark, n)
            cnt = spark.read.parquet(os.path.join(d, "documents.parquet")).count()
            # warmup once per size, then the timed run
            run_fp_overlap(spark, d)
            wall, pairs, shape = run_fp_overlap(spark, d)
            text_rows.append((cnt, pairs, wall, shape))
            print(f"fp_overlap {cnt:,}: {wall}s {pairs:,} pairs shape={shape}", flush=True)

            run_heavy_hitters(spark, d)
            hwall, ntok, nheavy, exact = run_heavy_hitters(spark, d)
            hh_rows.append((cnt, ntok, hwall, nheavy, exact))
            print(
                f"heavy_hitters {cnt:,}: {hwall}s over {ntok:,} tokens -> "
                f"{nheavy} rows exact_400={exact}", flush=True,
            )
            assert exact, "heavy_hitters lost planted vocabulary words"

        for n in sizes:
            p = vec_corpus(spark, n)
            run_semantic(spark, p, n)  # warmup
            r = run_semantic(spark, p, n)
            sem_rows.append(r)
            print(
                f"semantic {r['n']:,} vecs ({r['clusters']} clusters): "
                f"{r['wall']}s {r['pairs']:,} pairs recall={r['recall']:.4f} "
                f"shape={r['shape']}", flush=True,
            )
            assert r["recall"] >= 0.99, "semantic dedup lost planted near-dups"
    finally:
        spark.stop()

    print("\n--- SCALE.md addendum ---\n")
    print("| docs | fp-overlap pairs | dedup_fp_overlap | plan (exch, arrow) |")
    print("|---:|---:|---:|---|")
    for cnt, pairs, wall, shape in text_rows:
        print(f"| {cnt:,} | {pairs:,} | {wall} s | {shape} |")
    print()
    print("| docs | tokens | heavy_hitters phi=1/10000 | exact-400 |")
    print("|---:|---:|---:|---|")
    for cnt, ntok, hwall, nheavy, exact in hh_rows:
        print(f"| {cnt:,} | {ntok:,} | {hwall} s ({nheavy} rows) | {exact} |")
    print()
    print("| vectors | clusters | semantic_dedupe_pairs | pairs | planted recall | plan |")
    print("|---:|---:|---:|---:|---:|---|")
    for r in sem_rows:
        print(
            f"| {r['n']:,} | {r['clusters']:,} | {r['wall']} s | {r['pairs']:,} "
            f"| {r['recall']:.4f} | {r['shape']} |"
        )


if __name__ == "__main__":
    main()
