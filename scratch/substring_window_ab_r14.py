"""A/B: substring_dup_spans old shape (persist + hash-agg + flag join;
two exchanges of the positions frame) vs new window shape (one
partitionBy(h) exchange, no persist). Parity: exact span-set equality
for spans (winnow=1), winnowed (winnow=8) and excise output."""
import sys, time
sys.path.insert(0, ".")
import pyspark.sql.functions as F
from gecko_spark import get_spark
from gecko_spark.core import persist_until_released, adopt_cache_owner
from gecko_spark.operators.dedup import (
    substring_dup_spans, substring_dedupe, substring_window_positions,
    _merged_spans, _clamped_spans, _excise_spans)

SF = "/root/testdata/sf0.1"

def old_spans(df, id_col="doc_id", text_col="text", window=40, winnow=1,
              cross_doc_only=True, keep="none"):
    wh = substring_window_positions(df, id_col, text_col, window, winnow).persist()
    agg = wh.groupBy("h").agg(
        F.count("*").alias("__n__"), F.min(id_col).alias("__mn__"),
        F.max(id_col).alias("__mx__"),
        F.min(F.struct(id_col, "pos")).alias("__first__"))
    cond = ((F.col("__mn__") != F.col("__mx__")) if cross_doc_only
            else (F.col("__n__") > 1))
    dup = agg.filter(cond).select("h", "__first__")
    flagged = wh.join(dup, "h")
    if keep == "first":
        flagged = flagged.filter(
            ~((F.col(id_col) == F.col(f"__first__.{id_col}"))
              & (F.col("pos") == F.col("__first__.pos"))))
    flagged = flagged.select(id_col, "pos")
    merged = _merged_spans(flagged, id_col, window)
    return persist_until_released(wh, _clamped_spans(df, merged, id_col, text_col))

def old_excise(df, window=40):
    spans = old_spans(df, keep="first")
    return adopt_cache_owner(
        _excise_spans(df, spans, "doc_id", "text", "text_clean"), spans)

def main():
    spark = get_spark(cpus=32)
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    for tag, old_fn, new_fn in [
        ("spans_w1", lambda: old_spans(docs),
         lambda: substring_dup_spans(docs, "doc_id", "text", window=40)),
        ("spans_w8", lambda: old_spans(docs, winnow=8),
         lambda: substring_dup_spans(docs, "doc_id", "text", window=40, winnow=8)),
        ("excise", lambda: old_excise(docs).select("doc_id", F.md5("text_clean").alias("m")),
         lambda: substring_dedupe(docs, "doc_id", "text", window=40).select(
             "doc_id", F.md5("text_clean").alias("m"))),
    ]:
        o, n = old_fn(), new_fn()
        diff = o.exceptAll(n).count() + n.exceptAll(o).count()
        print(f"parity[{tag}]: diff={diff} n={n.count()}", flush=True)
        assert diff == 0
    def run(tag, fn):
        spark.sparkContext.setJobDescription(f"substr_ab:{tag}")
        t0 = time.time()
        fn().write.format("noop").mode("overwrite").save()
        return round(time.time() - t0, 2)
    for tag, old_fn, new_fn in [
        ("spans_w1", lambda: old_spans(docs),
         lambda: substring_dup_spans(docs, "doc_id", "text", window=40)),
        ("excise", lambda: old_excise(docs),
         lambda: substring_dedupe(docs, "doc_id", "text", window=40)),
    ]:
        olds, news = [], []
        for i in range(5):
            olds.append(run(f"{tag}_old{i}", old_fn))
            news.append(run(f"{tag}_new{i}", new_fn))
        med = lambda xs: sorted(xs)[len(xs) // 2]
        print(f"{tag}[old]: min {min(olds)} med {med(olds)} all {olds}")
        print(f"{tag}[new]: min {min(news)} med {med(news)} all {news}")
    spark.stop()

if __name__ == "__main__":
    main()
    print("EXIT:0")
