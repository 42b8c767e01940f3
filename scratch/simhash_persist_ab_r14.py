"""A/B: simhash grouped pairing WITH the now-single-consumer persist
(old, as committed in 342e631) vs persist dropped (new). Parity: exact
(id_a,id_b,hamming) set equality."""
import sys, time
sys.path.insert(0, ".")
import pyspark.sql.functions as F
from pyspark import StorageLevel
from gecko_spark import get_spark
from gecko_spark.core import persist_until_released
from gecko_spark.operators.dedup import (
    simhash_candidate_pairs, simhash, ensure_parallelism)

SF = "/root/testdata/sf0.1"

def old_pairs(docs, max_hamming=8, bits=64, chunks=4, max_bucket_size=5000):
    w = bits // chunks
    mask = (1 << w) - 1
    base = ensure_parallelism(docs).select(
        F.col("doc_id").alias("doc"), simhash(F.col("text"), bits).alias("sh"))
    blocked = base.select(
        "doc", "sh",
        F.explode(F.array(*[
            F.struct(F.lit(c).alias("chunk"),
                     F.shiftright(F.col("sh"), c * w).bitwiseAND(F.lit(mask)).alias("key"))
            for c in range(chunks)])).alias("ck"),
    ).select("doc", "sh", F.col("ck.chunk").alias("chunk"), F.col("ck.key").alias("key"))
    cached = blocked.persist(StorageLevel.MEMORY_AND_DISK)
    grouped = cached.groupBy("chunk", "key").agg(
        F.collect_list(F.struct("doc", "sh")).alias("__ds__"))
    size_pred = (F.size("__ds__") >= 2) & (F.size("__ds__") <= max_bucket_size)
    out = (
        grouped.filter(size_pred)
        .select(F.explode("__ds__").alias("a"), "__ds__")
        .select("a", F.explode("__ds__").alias("b"))
        .filter(F.col("a.doc") < F.col("b.doc"))
        .select(F.col("a.doc").alias("id_a"), F.col("b.doc").alias("id_b"),
                F.bit_count(F.col("a.sh").bitwiseXOR(F.col("b.sh"))).alias("hamming"))
        .filter(F.col("hamming") <= max_hamming)
        .groupBy("id_a", "id_b").agg(F.min("hamming").alias("hamming"))
    )
    return persist_until_released(cached, out)

def main():
    spark = get_spark(cpus=32)
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    new = lambda: simhash_candidate_pairs(docs, "doc_id", "text", max_hamming=8)
    o, n = old_pairs(docs), new()
    diff = o.exceptAll(n).count() + n.exceptAll(o).count()
    print(f"parity: diff={diff} n={n.count()}", flush=True)
    assert diff == 0
    def run(tag, fn):
        spark.sparkContext.setJobDescription(f"simhash_ab:{tag}")
        t0 = time.time()
        fn().write.format("noop").mode("overwrite").save()
        return round(time.time() - t0, 2)
    olds, news = [], []
    for i in range(5):
        olds.append(run(f"old{i}", lambda: old_pairs(docs)))
        news.append(run(f"new{i}", new))
    med = lambda xs: sorted(xs)[len(xs) // 2]
    print(f"simhash[old persist]: min {min(olds)} med {med(olds)} all {olds}")
    print(f"simhash[new nopersist]: min {min(news)} med {med(news)} all {news}")
    spark.stop()

if __name__ == "__main__":
    main()
    print("EXIT:0")
