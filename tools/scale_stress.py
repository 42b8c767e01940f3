"""Scale-stress harness: measure how the headline LLM-pipeline operators
scale BEYOND the driver's sf0.1 (5k docs) — the one claim PLANS.md alone
can't prove.

The corpora are built by the ENGINE'S OWN generators + mutators
(to_data_frame word sampling -> mutate_data_frame near-dup planting), so
the dup structure the dedup operators hunt is real and controlled:
~20% of docs get a 1-char-deleted near-duplicate (Jaccard >> 0.8 at
shingle size 5) and a fifth of those get a second-generation mutation —
A~B~C chains that only the transitive path collapses.

Usage:
    python tools/scale_stress.py                 # 50k / 150k / 500k docs
    python tools/scale_stress.py 20000 60000     # custom base sizes

Writes corpora under scratch/scale_<n>/documents.parquet (gitignored),
appends measured wall-times + fitted scaling exponents to SCALE.md.
"""

from __future__ import annotations

import math
import os
import shutil
import sys
import time

sys.path.insert(0, ".")

import pandas as pd  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402

import __spark_entry__ as e  # noqa: E402
from gecko_spark import get_spark  # noqa: E402
from gecko_spark.operators import generators as G  # noqa: E402
from gecko_spark.operators import mutators as M  # noqa: E402
from gecko_spark.plans.pipeline import mutate_data_frame, to_data_frame  # noqa: E402

SCRATCH = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "scratch")

# the four ops the round-4 verdict named as the unmeasured 100 TB claims,
# plus the round-5 dedup additions (winnowing-fingerprint pairs and
# quality-aware cluster representatives) so their scale claims are
# measured too, not just plan-shaped
OPS = [
    "dedup_minhash_pairs",
    "dedup_transitive",
    "decontam_filter_bloom",
    "pack_sequences",
    "dedup_fp_overlap",
    "dedup_cluster_reps",
]

_BASE_WORDS = (
    "spark query column batch line order part scan fast agg sort small "
    "vector join filter shuffle stage task page block cache disk memory "
    "read write merge split hash range index token stream state window "
    "group count plan tree node edge list map set key value row table"
).split()


def _vocab(n: int = 400) -> list[str]:
    out = list(_BASE_WORDS)
    i = 0
    while len(out) < n:
        out.append(f"{_BASE_WORDS[i % len(_BASE_WORDS)]}{i}")
        i += 1
    return out[:n]


def make_corpus(spark, n_base: int, out_dir: str, seed: int = 97) -> int:
    """Generate a documents table with planted near-dup structure; returns
    total row count. Schema matches testdata documents exactly.

    Entropy calibration (learned the hard way — two aborted sweeps):
    with 16 small-Zipf-vocab word slots per doc, every random doc pair
    shares ~40 5-char shingles (J ≈ 0.1), and with 16 four-row LSH bands
    that is a ~4e-4 per-pair collision rate — an O(n²) candidate term
    that spilled >70 GB at 620k docs. Real *deduplicated* web corpora
    have near-zero random-pair Jaccard; the candidate load there comes
    from actual near-duplicates. So the base text is high-entropy
    uniform-int tokens with only 3 of 48 slots drawn from a FLAT
    400-word vocab (P(pair shares a word) ≈ 2%, J ≈ 0.007, per-pair
    collision ~1e-9 — the n² term is dead to any realistic n), and the
    candidate load is the planted ~24% mutant copies (1-char deletion,
    J > 0.9 to their originals; a fifth mutated twice for A~B~C chains).

    Token encoding matters as much as token identity: ``u<digits>``
    tokens put every boundary shingle in a ~10³-value space (digit
    alphabet + fixed ``u`` separator), which alone holds random-pair J
    near 0.1. Tokens are therefore base-26 encodings of a
    multiply-shuffled draw — random letters, no shared prefix — putting
    5-char shingles in a ~26⁵ space."""
    words = _vocab()
    freq = pd.DataFrame({"word": words, "count": ["1"] * len(words)})
    n_words = 48
    spec = []
    for i in range(n_words):
        if i % 16 == 1:  # the three common-vocab slots
            spec.append((f"w{i}", G.from_frequency_table(freq, "word", "count")))
        else:  # high-entropy slots
            spec.append((f"w{i}", G.from_uniform_distribution(0, 200_000, raw=True)))
    spec.append(("doclen", G.from_uniform_distribution(16, n_words + 1, raw=True)))
    df = to_data_frame(
        spark, spec, n_base, seed=seed, keep_index=True,
        num_partitions=max(8, n_base // 250_000),
    )
    def _tok(c):
        # multiply-shuffle into [0, 26^6), then base-26 (alphabet 0-9a-p):
        # ~6 high-entropy chars, no fixed prefix or digit bias
        mixed = (c.cast("long") * F.lit(2654435761)) % F.lit(26**6)
        return F.lower(F.conv(mixed.cast("string"), 10, 26))

    word_cols = [
        F.col(f"w{i}") if i % 16 == 1 else _tok(F.col(f"w{i}"))
        for i in range(n_words)
    ]
    text = F.array_join(
        F.slice(F.array(*word_cols), F.lit(1), F.col("doclen").cast("int")),
        " ",
    )
    base = df.select(F.col("__idx__").alias("doc_id"), text.alias("text"))

    # generation 1: 20% of docs near-duplicated (single char deletion)
    g1 = mutate_data_frame(
        base.filter(F.col("doc_id") % 5 == 1),
        [("text", (1.0, M.with_delete()))],
        seed=seed + 1,
        key_columns=["doc_id"],
    ).select((F.col("doc_id") + n_base).alias("doc_id"), "text")
    # generation 2: a fifth of g1 mutated again -> A~B~C transitive chains
    g2 = mutate_data_frame(
        g1.filter(F.col("doc_id") % 25 == (1 + n_base) % 25),
        [("text", (1.0, M.with_delete()))],
        seed=seed + 2,
        key_columns=["doc_id"],
    ).select((F.col("doc_id") + n_base).alias("doc_id"), "text")

    corpus = base.unionByName(g1).unionByName(g2).select(
        "doc_id",
        "text",
        F.lit("en").alias("lang"),
        F.concat(F.lit("src"), F.pmod(F.col("doc_id"), F.lit(10))).alias("source"),
        F.length("text").alias("n_chars"),
    )
    path = os.path.join(out_dir, "documents.parquet")
    corpus.repartition(max(8, n_base // 50_000)).write.mode("overwrite").parquet(path)
    return spark.read.parquet(path).count()


def _noop(df) -> None:
    df.write.mode("overwrite").format("noop").save()


def measure(spark, sf_dir: str) -> dict[str, float]:
    qs = e.queries()
    out = {}
    for name in OPS:
        t0 = time.time()
        _noop(qs[name](spark, sf_dir))
        out[name] = round(time.time() - t0, 2)
        print(f"  {sf_dir.rsplit('/', 1)[-1]} {name}: {out[name]}s", flush=True)
    return out


def candidate_pairs(spark, sf_dir: str) -> int:
    """Untimed evidence query: LSH candidate-pair count must grow
    ~linearly with docs — superlinear growth is the quadratic-blowup
    signature that wrecks wall-time at scale."""
    from gecko_spark.operators.dedup import minhash_candidate_pairs
    from gecko_spark.sources.testdata import load_table

    docs = load_table(spark, sf_dir, "documents")
    return minhash_candidate_pairs(
        docs, "doc_id", "text", num_hashes=64, bands=16
    ).count()


def planted_recall(spark, sf_dir: str, n_base: int) -> dict[str, float]:
    """Correctness-at-scale, not just speed: the corpus construction
    makes every planted pair identifiable by id arithmetic (mutant of
    doc d is d + n_base per generation), so recall is measurable
    exactly. Reports (1) candidate recall — fraction of planted
    (original, mutant) pairs surfaced by the LSH candidate join — and
    (2) chain recall — fraction of A~C second-generation endpoints
    (never a candidate pair themselves when B drifted both ways)
    united by the transitive closure."""
    from gecko_spark.operators.dedup import (
        connected_components,
        minhash_candidate_pairs,
    )

    docs = spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))
    pairs = minhash_candidate_pairs(
        docs, "doc_id", "text", num_hashes=64, bands=16
    ).select("id_a", "id_b")
    from pyspark import StorageLevel

    pairs = pairs.persist(StorageLevel.MEMORY_AND_DISK)
    g1 = docs.filter(
        (F.col("doc_id") >= n_base) & (F.col("doc_id") < 2 * n_base)
    ).select((F.col("doc_id") - n_base).alias("id_a"), F.col("doc_id").alias("id_b"))
    g2 = docs.filter(F.col("doc_id") >= 2 * n_base).select(
        (F.col("doc_id") - n_base).alias("id_a"), F.col("doc_id").alias("id_b")
    )
    planted = g1.unionByName(g2)
    n_planted = planted.count()
    n_hit = planted.join(pairs, ["id_a", "id_b"], "left_semi").count()

    comp = connected_components(pairs, "id_a", "id_b")
    ac = docs.filter(F.col("doc_id") >= 2 * n_base).select(
        (F.col("doc_id") - 2 * n_base).alias("a"), F.col("doc_id").alias("c")
    )
    n_ac = ac.count()
    la = comp.select(F.col("node").alias("a"), F.col("component").alias("comp_a"))
    lc = comp.select(F.col("node").alias("c"), F.col("component").alias("comp_c"))
    n_ac_hit = (
        ac.join(la, "a")
        .join(lc, "c")
        .filter(F.col("comp_a") == F.col("comp_c"))
        .count()
    )
    pairs.unpersist()
    return {
        "n_planted": n_planted,
        "pair_recall": n_hit / max(n_planted, 1),
        "n_chains": n_ac,
        "chain_recall": n_ac_hit / max(n_ac, 1),
    }


def plan_shape(spark, sf_dir: str, name: str) -> tuple[int, int]:
    """(n_exchanges, n_arrow_kernels) in the executed plan — the shape
    fingerprint that must NOT grow with data size."""
    plan = e.queries()[name](spark, sf_dir)._jdf.queryExecution().executedPlan().toString()
    return plan.count("Exchange"), plan.count("ArrowEvalPython")


def main():
    sizes = [int(a) for a in sys.argv[1:]] or [50_000, 150_000, 500_000]
    spark = get_spark(app_name="scale-stress", cpus=int(os.environ.get("SPARK_GRAFT_CPUS", "32")))
    os.makedirs(SCRATCH, exist_ok=True)
    dirs, counts = [], []
    try:
        for n in sizes:
            d = os.path.join(SCRATCH, f"scale_{n}")
            if not os.path.exists(os.path.join(d, "documents.parquet")):
                t0 = time.time()
                total = make_corpus(spark, n, d)
                print(f"generated {d}: {total} docs in {time.time() - t0:.1f}s", flush=True)
            dirs.append(d)
            counts.append(
                spark.read.parquet(os.path.join(d, "documents.parquet")).count()
            )

        # pair-count evidence FIRST (cheap, and catches a quadratic
        # corpus before the timed sweep burns an hour of spill)
        npairs = [candidate_pairs(spark, d) for d in dirs]
        print("candidate pairs:", dict(zip(counts, npairs)), flush=True)
        for (c1, p1), (c2, p2) in zip(zip(counts, npairs), zip(counts[1:], npairs[1:])):
            growth = math.log(max(p2, 1) / max(p1, 1)) / math.log(c2 / c1)
            if growth > 1.5:
                raise SystemExit(
                    f"candidate pairs grow n^{growth:.2f} between {c1} and "
                    f"{c2} docs — corpus too self-similar, fix the generator"
                )

        # warm FS cache + JIT once on the smallest corpus
        measure(spark, dirs[0])
        rows = [measure(spark, d) for d in dirs]

        shapes = {
            name: [plan_shape(spark, d, name) for d in (dirs[0], dirs[-1])]
            for name in OPS
        }

        recalls = {
            cnt: planted_recall(spark, d, sz)
            for cnt, d, sz in (
                (counts[0], dirs[0], sizes[0]),
                (counts[-1], dirs[-1], sizes[-1]),
            )
        }
        print("planted recall:", recalls, flush=True)
    finally:
        spark.stop()

    lines = [
        "# SCALE — measured scaling of the headline LLM-pipeline operators",
        "",
        "Corpora self-generated by the engine (tools/scale_stress.py): high-"
        "entropy token documents (realistic ~0 random-pair Jaccard — see the "
        "make_corpus docstring for the two corpus-entropy failure modes this "
        "harness caught) with ~24% planted near-duplicates (1-char-deletion "
        "mutants, Jaccard > 0.9) and second-generation A~B~C chains. Wall-clock "
        f"on local[{os.environ.get('SPARK_GRAFT_CPUS', '32')}], one run per cell "
        "after a full warmup sweep (generation time excluded).",
        "",
        "| docs | LSH candidate pairs | " + " | ".join(OPS) + " |",
        "|---:|---:|" + "---:|" * len(OPS),
    ]
    for cnt, np_, r in zip(counts, npairs, rows):
        lines.append(
            f"| {cnt:,} | {np_:,} | "
            + " | ".join(f"{r[o]:.2f} s" for o in OPS)
            + " |"
        )
    lines += [
        "",
        "## Fitted scaling exponent (t ∝ n^α, log-log least squares)",
        "",
        "| op | α | verdict |",
        "|---|---:|---|",
    ]
    logn = [math.log(c) for c in counts]
    for op in OPS:
        logt = [math.log(max(r[op], 1e-3)) for r in rows]
        npts = len(logn)
        mx, my = sum(logn) / npts, sum(logt) / npts
        alpha = sum((x - mx) * (y - my) for x, y in zip(logn, logt)) / sum(
            (x - mx) ** 2 for x in logn
        )
        verdict = "near-linear" if alpha <= 1.2 else ("n log n-ish" if alpha <= 1.45 else "SUPERLINEAR — investigate")
        lines.append(f"| {op} | {alpha:.2f} | {verdict} |")
    lines += [
        "",
        "## Plan-shape invariance (smallest vs largest corpus)",
        "",
        "| op | exchanges | Arrow kernels |",
        "|---|---|---|",
    ]
    for op, (small, big) in shapes.items():
        same = "unchanged" if small == big else f"CHANGED {small} -> {big}"
        lines.append(f"| {op} | {small[0]} vs {big[0]} ({same}) | {small[1]} vs {big[1]} |")
    lines += [
        "",
        "## Planted-duplicate recall (correctness at scale, smallest vs largest)",
        "",
        "| docs | planted pairs | candidate recall | A~C chains | closure recall |",
        "|---:|---:|---:|---:|---:|",
    ]
    for cnt, r in recalls.items():
        lines.append(
            f"| {cnt:,} | {r['n_planted']:,} | {r['pair_recall']:.4f} "
            f"| {r['n_chains']:,} | {r['chain_recall']:.4f} |"
        )
    lines += [
        "",
        "α is measured against total wall-clock including fixed per-job overhead "
        "(scheduling, Arrow batch setup), which deflates α at small sizes — the "
        "top two sizes dominate the fit. Exponents ≤ ~1.2 + unchanged plan "
        "shapes are the two properties the 100 TB design claims rest on: every "
        "candidate-pair path stays bucketed (no quadratic blowup with corpus "
        "size) and no operator's plan grows with data volume.",
        "",
    ]
    with open("SCALE.md", "w") as f:
        f.write("\n".join(lines))
    print("wrote SCALE.md")


if __name__ == "__main__":
    main()
