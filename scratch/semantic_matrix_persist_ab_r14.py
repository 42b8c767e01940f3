"""A/B: matrix-path unconditional persist (old) vs no-persist single-
consumer plan (new, round 14). Bench-entry config (n_clusters=16, no
cap). Parity: exact (id_a,id_b,round(cos*1e9)) set equality."""
import sys, time
sys.path.insert(0, ".")
import pyspark.sql.functions as F
from pyspark import StorageLevel
from gecko_spark import get_spark
from gecko_spark.core import persist_until_released
from gecko_spark.operators.dedup import semantic_dedupe_pairs
from gecko_spark.operators.similarity import ivf_assign
import pandas as pd
import numpy as np

SF = "/root/testdata/sf0.1"

def old_matrix(emb, threshold=0.1, n_clusters=16):
    assigned, _ = ivf_assign(
        emb.select("vec_id", "embedding"), "embedding",
        n_centroids=n_clusters, seed=0, init="first_k", id_col="vec_id")
    base = assigned.select(
        F.col("vec_id").alias("doc"), F.col("embedding").alias("vec"),
        F.col("__ivf_list__").alias("cluster"))
    base = cached = base.persist(StorageLevel.MEMORY_AND_DISK)
    thr = float(threshold)
    def _empty(pdf):
        return pd.DataFrame({"id_a": pdf["doc"].iloc[:0],
                             "id_b": pdf["doc"].iloc[:0],
                             "cosine": pd.Series(dtype="float64")})
    def _cluster_pairs(pdf):
        m = len(pdf)
        if m < 2: return _empty(pdf)
        pdf = pdf.sort_values("doc", ignore_index=True)
        x = np.array(pdf["vec"].tolist(), dtype=np.float64)
        norms = np.linalg.norm(x, axis=1); norms[norms == 0] = 1.0
        xn = x / norms[:, None]; sims = xn @ xn.T
        ia, ib = np.triu_indices(m, k=1)
        keep = sims[ia, ib] >= thr
        if not keep.any(): return _empty(pdf)
        ids = pdf["doc"].to_numpy()
        return pd.DataFrame({"id_a": ids[ia[keep]], "id_b": ids[ib[keep]],
                             "cosine": sims[ia[keep], ib[keep]]})
    out = base.groupBy("cluster").applyInPandas(
        _cluster_pairs, "id_a bigint, id_b bigint, cosine double")
    return persist_until_released(cached, out)

def main():
    spark = get_spark(cpus=32)
    emb = spark.read.parquet(f"{SF}/embeddings.parquet")
    canon = lambda df: df.select("id_a", "id_b",
        F.round(F.col("cosine") * 1e9).cast("long").alias("c9"))
    new = lambda: semantic_dedupe_pairs(emb, "vec_id", "embedding",
        threshold=0.1, n_clusters=16, init="first_k", method="matrix")
    o, n = old_matrix(emb), new()
    diff = canon(o).exceptAll(canon(n)).count() + canon(n).exceptAll(canon(o)).count()
    print(f"parity: diff={diff} n={n.count()}", flush=True)
    assert diff == 0
    def run(tag, fn):
        spark.sparkContext.setJobDescription(f"semmat_ab:{tag}")
        t0 = time.time()
        fn().write.format("noop").mode("overwrite").save()
        return round(time.time() - t0, 2)
    olds, news = [], []
    for i in range(5):
        olds.append(run(f"old{i}", lambda: old_matrix(emb)))
        news.append(run(f"new{i}", new))
    med = lambda xs: sorted(xs)[len(xs) // 2]
    print(f"matrix[old persist]: min {min(olds)} med {med(olds)} all {olds}")
    print(f"matrix[new nopersist]: min {min(news)} med {med(news)} all {news}")
    spark.stop()

if __name__ == "__main__":
    main()
    print("EXIT:0")
