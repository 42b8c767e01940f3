"""A/B + parity for the round-14 semantic fold rewrite: per-pair
cosine_fold_udf self-join (old) vs grouped per-cluster fold kernel
(new, dedup.semantic_dedupe_pairs method="fold").

Old arm is reconstructed inline (the exact pre-rewrite plan shape:
persist → cluster-keyed self-join → per-pair Arrow fold). Interleaved
min-of-5 at sf0.1; parity = exact equality of (id_a, id_b,
round(cos*1e9)) sets — the contract entry's own canonicalization.

Usage: python scratch/semantic_fold_ab_r14.py
"""
import sys
import time

sys.path.insert(0, ".")
import pyspark.sql.functions as F  # noqa: E402
from pyspark import StorageLevel  # noqa: E402

from gecko_spark import get_spark  # noqa: E402
from gecko_spark.operators.dedup import semantic_dedupe_pairs  # noqa: E402
from gecko_spark.operators.similarity import cosine_fold_udf, ivf_assign  # noqa: E402

SF = "/root/testdata/sf0.1"


def old_fold_pairs(df, threshold=0.1, n_clusters=16):
    assigned, _ = ivf_assign(
        df.select("vec_id", "embedding"), "embedding",
        n_centroids=n_clusters, seed=0, init="first_k", id_col="vec_id",
    )
    base = assigned.select(
        F.col("vec_id").alias("doc"),
        F.col("embedding").alias("vec"),
        F.col("__ivf_list__").alias("cluster"),
    ).persist(StorageLevel.MEMORY_AND_DISK)
    _cos = cosine_fold_udf()
    l, r = base.alias("l"), base.alias("r")
    out = (
        l.join(
            r,
            (F.col("l.cluster") == F.col("r.cluster"))
            & (F.col("l.doc") < F.col("r.doc")),
        )
        .select(
            F.col("l.doc").alias("id_a"),
            F.col("r.doc").alias("id_b"),
            _cos(F.col("l.vec"), F.col("r.vec")).alias("cosine"),
        )
        .filter(F.col("cosine") >= threshold)
    )
    return out, base


def main():
    spark = get_spark(cpus=32)
    emb = spark.read.parquet(f"{SF}/embeddings.parquet")

    def canon(df):
        return df.select(
            "id_a", "id_b",
            F.round(F.col("cosine") * 1e9).cast("long").alias("c9"),
        )

    old_out, old_cache = old_fold_pairs(emb)
    new_out = semantic_dedupe_pairs(
        emb, "vec_id", "embedding", threshold=0.1, n_clusters=16,
        init="first_k", method="fold",
    )
    diff = canon(old_out).exceptAll(canon(new_out)).count() + canon(
        new_out
    ).exceptAll(canon(old_out)).count()
    n = new_out.count()
    print(f"parity: diff={diff} n_pairs={n}", flush=True)
    old_cache.unpersist()
    assert diff == 0

    def run(tag, fn):
        spark.sparkContext.setJobDescription(f"semfold_ab:{tag}")
        t0 = time.time()
        fn().write.format("noop").mode("overwrite").save()
        return round(time.time() - t0, 2)

    olds, news = [], []
    for i in range(5):
        out, cache = old_fold_pairs(emb)
        olds.append(run(f"old{i}", lambda: out))
        cache.unpersist()
        news.append(
            run(
                f"new{i}",
                lambda: semantic_dedupe_pairs(
                    emb, "vec_id", "embedding", threshold=0.1,
                    n_clusters=16, init="first_k", method="fold",
                ),
            )
        )
    med = lambda xs: sorted(xs)[len(xs) // 2]  # noqa: E731
    print(f"fold[old]: min {min(olds)} med {med(olds)} all {olds}")
    print(f"fold[new]: min {min(news)} med {med(news)} all {news}")
    spark.stop()


if __name__ == "__main__":
    main()
    print("EXIT:0")
