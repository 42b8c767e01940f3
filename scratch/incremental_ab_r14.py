"""A/B: dedupe_against_index old shape (count-agg hot-bucket anti-join
+ row-level equi-join; two passes over the exploded index) vs new
grouped shape (one groupBy over the index side, size filter = cap,
explode after the join). Parity: exact survivor doc_id set equality.
Index built once outside the timed loop."""
import os, shutil, sys, time, uuid
sys.path.insert(0, ".")
import numpy as np
import pandas as pd
import pyspark.sql.functions as F
import pyspark.sql.types as T
from pyspark import StorageLevel
from gecko_spark import get_spark
from gecko_spark.core import persist_until_released
from gecko_spark.operators.dedup import (
    dedupe_against_index, write_minhash_index, minhash_signature)

SF = "/root/testdata/sf0.1"

def old_dedupe(new_df, index, id_col, text_col, threshold=0.8,
               num_hashes=64, bands=16, shingle_size=5, seed=0,
               max_bucket_size=5000):
    rpb = num_hashes // bands
    sig = minhash_signature(F.col(text_col), num_hashes, shingle_size, seed)
    new_sig = new_df.select(F.col(id_col).alias("doc"), sig.alias("sig")).persist(
        StorageLevel.MEMORY_AND_DISK)
    def band_frame(s):
        return s.select(
            "doc",
            F.explode(F.array(*[
                F.struct(F.lit(b).alias("band"),
                         F.slice(F.col("sig"), b * rpb + 1, rpb).alias("bucket"))
                for b in range(bands)])).alias("bb"),
        ).select("doc", F.col("bb.band").alias("band"), F.col("bb.bucket").alias("bucket"))
    new_banded = band_frame(new_sig)
    idx_banded = band_frame(index)
    oversized = (idx_banded.groupBy("band", "bucket")
                 .agg(F.count("*").alias("__n__"))
                 .filter(F.col("__n__") > max_bucket_size)
                 .select("band", "bucket"))
    idx_banded = idx_banded.join(F.broadcast(oversized), ["band", "bucket"], "left_anti")
    cand = (new_banded.alias("n")
            .join(idx_banded.alias("i"),
                  (F.col("n.band") == F.col("i.band")) & (F.col("n.bucket") == F.col("i.bucket")))
            .select(F.col("n.doc").alias("new_doc"), F.col("i.doc").alias("idx_doc"))
            .distinct())
    @F.pandas_udf(T.DoubleType())
    def _sig_sim(sa: pd.Series, sb: pd.Series) -> pd.Series:
        if not len(sa):
            return pd.Series(np.empty(0, dtype=np.float64))
        a = np.stack(sa.to_numpy()); b = np.stack(sb.to_numpy())
        return pd.Series((a == b).sum(axis=1) / float(a.shape[1]))
    ns = new_sig.select(F.col("doc").alias("new_doc"), F.col("sig").alias("__sa__"))
    isg = index.select(F.col("doc").alias("idx_doc"), F.col("sig").alias("__sb__"))
    dupes = (cand.join(ns, "new_doc").join(isg, "idx_doc")
             .filter(_sig_sim(F.col("__sa__"), F.col("__sb__")) >= threshold)
             .select(F.col("new_doc").alias(id_col)).distinct())
    return persist_until_released(new_sig, new_df.join(dupes, id_col, "left_anti"))

def main():
    spark = get_spark(cpus=32)
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    old_half = docs.filter(F.col("doc_id") % 2 == 0)
    new_half = docs.filter(F.col("doc_id") % 2 == 1)
    path = f"scratch/mh_index_ab_{uuid.uuid4().hex[:8]}"
    try:
        write_minhash_index(old_half, "doc_id", "text", path)
        index = spark.read.parquet(path)
        o = old_dedupe(new_half, index, "doc_id", "text").select("doc_id")
        n = dedupe_against_index(new_half, index, "doc_id", "text",
                                 threshold=0.8).select("doc_id")
        diff = o.exceptAll(n).count() + n.exceptAll(o).count()
        print(f"parity: diff={diff} n_survivors={n.count()}", flush=True)
        assert diff == 0
        def run(tag, fn):
            spark.sparkContext.setJobDescription(f"incidx_ab:{tag}")
            t0 = time.time()
            fn().write.format("noop").mode("overwrite").save()
            return round(time.time() - t0, 2)
        olds, news = [], []
        for i in range(5):
            olds.append(run(f"old{i}", lambda: old_dedupe(new_half, index, "doc_id", "text")))
            news.append(run(f"new{i}", lambda: dedupe_against_index(
                new_half, index, "doc_id", "text", threshold=0.8)))
        med = lambda xs: sorted(xs)[len(xs) // 2]
        print(f"incidx[old]: min {min(olds)} med {med(olds)} all {olds}")
        print(f"incidx[new]: min {min(news)} med {med(news)} all {news}")
    finally:
        shutil.rmtree(path, ignore_errors=True)
    spark.stop()

if __name__ == "__main__":
    main()
    print("EXIT:0")
