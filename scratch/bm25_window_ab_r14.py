"""A/B: BM25 direct path old shape (unpersisted doclen + separate df
aggregate re-consuming the postings; 4 corpus tokenize passes per
action) vs new shape (persisted doclen filled by the eager stats
collect + per-term window df; 2 passes). Parity: exact
(query_id, doc_id, n_hit_terms, score_micro, rank) set equality."""
import sys, time
sys.path.insert(0, ".")
import pyspark.sql.functions as F
from pyspark.sql import Window
from gecko_spark import get_spark
from gecko_spark.operators.text import tokens
from gecko_spark.operators.retrieval import bm25_topk

SF = "/root/testdata/sf0.1"
K, K1, B = 10, 1.2, 0.75

def old_topk(docs, queries, k=K, k1=K1, b=B):
    toked = docs.select(F.col("doc_id").alias("__doc__"),
                        tokens(F.col("text")).alias("__tk__"))
    doclen = toked.select("__doc__", F.size("__tk__").alias("__len__"))
    postings = (toked.select("__doc__", F.explode("__tk__").alias("__term__"))
                .groupBy("__doc__", "__term__")
                .agg(F.count(F.lit(1)).alias("__tf__")))
    row = doclen.agg(F.count(F.lit(1)).alias("n"), F.sum("__len__").alias("s")).collect()[0]
    n_docs, sum_len = int(row["n"]), int(row["s"] or 0)
    avgdl = sum_len / n_docs
    qterms = F.broadcast(queries.select(
        F.col("query_id").alias("__q__"),
        F.explode(tokens(F.col("query_text"))).alias("__term__")).distinct())
    hit = postings.join(qterms.select("__term__").distinct(), "__term__", "left_semi")
    df_ = hit.groupBy("__term__").agg(F.count(F.lit(1)).alias("__df__"))
    idf = F.log(F.lit(1.0) + (F.lit(float(n_docs)) - F.col("__df__") + F.lit(0.5))
                / (F.col("__df__") + F.lit(0.5)))
    scored = (hit.join(F.broadcast(df_), "__term__")
              .join(qterms, "__term__").join(doclen, "__doc__"))
    tf = F.col("__tf__").cast("double")
    norm = tf * F.lit(k1 + 1.0) / (
        tf + F.lit(float(k1)) * (F.lit(1.0 - b)
        + F.lit(float(b)) * F.col("__len__").cast("double") / F.lit(avgdl)))
    contrib = idf * norm * F.lit(1_000_000.0)
    micro = (F.signum(contrib) * F.floor(F.abs(contrib) + F.lit(0.5))).cast("long")
    pairs = (scored.withColumn("__c__", micro)
             .groupBy(F.col("__q__").alias("query_id"), F.col("__doc__").alias("doc_id"))
             .agg(F.count(F.lit(1)).alias("n_hit_terms"), F.sum("__c__").alias("score_micro")))
    w = Window.partitionBy("query_id").orderBy(F.col("score_micro").desc(), F.col("doc_id").asc())
    return (pairs.withColumn("rank", F.row_number().over(w).cast("int"))
            .filter(F.col("rank") <= k))

def main():
    spark = get_spark(cpus=32)
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    queries = docs.filter(F.col("doc_id") % 151 == 3).select(
        F.col("doc_id").alias("query_id"),
        F.substring(F.col("text"), 1, 80).alias("query_text"))
    sel = ["query_id", "doc_id", "n_hit_terms", "score_micro", "rank"]
    o = old_topk(docs, queries).select(*sel)
    n = bm25_topk(docs, queries, k=K, k1=K1, b=B).select(*sel)
    diff = o.exceptAll(n).count() + n.exceptAll(o).count()
    print(f"parity: diff={diff} n={n.count()}", flush=True)
    assert diff == 0
    def run(tag, fn):
        spark.sparkContext.setJobDescription(f"bm25_ab:{tag}")
        t0 = time.time()
        fn().write.format("noop").mode("overwrite").save()
        return round(time.time() - t0, 2)
    olds, news = [], []
    for i in range(5):
        olds.append(run(f"old{i}", lambda: old_topk(docs, queries)))
        news.append(run(f"new{i}", lambda: bm25_topk(docs, queries, k=K, k1=K1, b=B)))
    med = lambda xs: sorted(xs)[len(xs) // 2]
    print(f"bm25[old]: min {min(olds)} med {med(olds)} all {olds}")
    print(f"bm25[new]: min {min(news)} med {med(news)} all {news}")
    spark.stop()

if __name__ == "__main__":
    main()
    print("EXIT:0")
