"""Fine-grained eager-step profile of examples.corpus_curation.curate
at sf0.1 (round 15 §1): replicates curate() with a timer around every
driver-blocking step. Attribution only — the real curate() is the
source of truth.
"""
import os
import sys
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F  # noqa: E402

from gecko_spark import get_spark  # noqa: E402

SF = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def run(spark):
    from gecko_spark.operators.classifier import hashed_linear_score, seeded_weights
    from gecko_spark.operators.decontam import decontaminate
    from gecko_spark.operators.dedup import (
        dedupe_exact,
        minhash_dedupe_transitive,
        semantic_dedupe,
        substring_dedupe,
    )
    from gecko_spark.operators.joins import asof_join
    from gecko_spark.operators.text import (
        compression_ratio,
        filter_documents,
        normalize_unicode,
        repetition_profile,
        strip_html,
        text_stats,
    )
    from gecko_spark.sources.testdata import load_table

    t = {}
    t0 = time.time()

    def mark(stage):
        nonlocal t0
        t[stage] = round(time.time() - t0, 3)
        t0 = time.time()

    docs = load_table(spark, SF, "documents").withColumn(
        "text", normalize_unicode(strip_html(F.col("text")), "NFC")
    )
    gated = filter_documents(docs, min_chars=40, min_quality=0.3)
    exact = dedupe_exact(gated, "text", id_col="doc_id")
    exact = exact.localCheckpoint()
    mark("ckpt1_exact")
    neardup = minhash_dedupe_transitive(
        exact, "doc_id", "text", threshold=0.8, num_hashes=64, bands=16
    )
    mark("minhash_cc")  # eager: pairs checkpoint + count + union-find
    emb = load_table(spark, SF, "embeddings").select(
        F.col("vec_id").alias("doc_id"), "embedding"
    )
    neardup = neardup.localCheckpoint()
    mark("ckpt2_neardup")
    with_vec = neardup.join(emb, "doc_id", "left")
    has_vec = with_vec.filter(F.col("embedding").isNotNull())
    no_vec = with_vec.filter(F.col("embedding").isNull()).drop("embedding")
    sem = semantic_dedupe(
        has_vec, "doc_id", "embedding", threshold=0.995, n_clusters=8, seed=11
    ).drop("embedding")
    mark("semantic_build")  # eager: kmeans count + sample toPandas
    neardup = sem.unionByName(no_vec)
    neardup = neardup.localCheckpoint()
    mark("ckpt3_semantic")
    excised = substring_dedupe(neardup, "doc_id", "text", window=40)
    neardup = (
        excised.withColumn("text", F.col("text_clean"))
        .drop("text_clean")
        .filter(F.length("text") >= 40)
    )
    mark("substring_build")
    heldout = docs.filter(F.col("doc_id") % 97 == 0).select("doc_id", "text")
    train = neardup.filter(F.col("doc_id") % 97 != 0)
    clean = decontaminate(train, heldout, "doc_id", "text", n=6)
    rep = repetition_profile(clean, "doc_id", "text", ns=(2,))
    keep = rep.filter(
        F.col("top_2gram_n") * 4 <= F.greatest(F.col("n_tokens") - 1, F.lit(1))
    ).select("doc_id")
    gated2 = clean.join(keep, "doc_id", "left_semi")
    gated2 = gated2.filter(compression_ratio(F.col("text")) > 0.05)
    clf = hashed_linear_score(
        gated2, seeded_weights(4096), id_col="doc_id", threshold=-(10**9)
    )
    gated2 = gated2.join(clf.filter("passes").select("doc_id"), "doc_id", "left_semi")
    enriched = text_stats(gated2)
    ev = load_table(spark, SF, "events").select(
        F.col("event_id").alias("on_id"), "event_type"
    )
    ctx = asof_join(
        enriched.withColumn("on_id", F.col("doc_id")),
        ev,
        on="on_id",
    ).drop("on_id")
    mark("tail_build")  # lazy construction only
    return ctx, t


def main():
    spark = get_spark(cpus=int(os.environ.get("SPARK_GRAFT_CPUS", "32")))
    try:
        for i in range(3):
            ctx, t = run(spark)
            total = sum(t.values())
            print(
                f"RUN {i}: eager_total={total:.3f}  "
                + "  ".join(f"{k}={v}" for k, v in t.items())
            )
            sys.stdout.flush()
    finally:
        spark.stop()


if __name__ == "__main__":
    main()
