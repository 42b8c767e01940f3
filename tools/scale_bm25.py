"""Scale datapoint for BM25 retrieval (operators/retrieval.py): the
broadcast-pruned posting path at a million documents — wall-clock for
the pruned operator vs the same scoring WITHOUT query-vocabulary
pruning (every posting joins), plus the pruning ratio itself, which IS
the 100 TB cost model: the pruned shuffle carries only postings whose
term appears in some query.

Synthetic corpus with a Zipf-ish vocabulary (term ids drawn as
floor(V / (1 + h % V)) so low ids are frequent — queries mixing one
frequent and several rare terms exercise both df regimes). Prints rows
for SCALE.md; writes nothing.

Usage: python tools/scale_bm25.py [n_docs] [n_queries]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, ".")

from pyspark.sql import functions as F

from gecko_spark import get_spark
from gecko_spark.operators.retrieval import bm25_score_pairs, bm25_topk


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
    n_q = int(sys.argv[2]) if len(sys.argv) > 2 else 32
    spark = get_spark(
        app_name="scale-bm25",
        cpus=int(os.environ.get("SPARK_GRAFT_CPUS", "32")),
    )
    try:
        # each doc: 30 terms from a head/tail mixture — half the draws
        # come from 100 hot "head" terms (the stopword-ish regime),
        # half uniform over a 200k "tail" vocabulary (the contentful
        # regime). A plain floor-Zipf transform collapsed to <1k
        # distinct terms and made the pruning demo meaningless.
        V = 200_000
        HEAD = 100

        def term(i):
            h = F.xxhash64(F.col("doc_id"), i, F.lit(7))
            is_head = F.pmod(h, F.lit(2)) == 0
            head_id = F.pmod(F.xxhash64(h, F.lit(11)), F.lit(HEAD))
            tail_id = F.pmod(F.xxhash64(h, F.lit(13)), F.lit(V)) + HEAD
            return F.concat(
                F.lit("t"),
                F.when(is_head, head_id).otherwise(tail_id).cast("string"),
            )

        words = F.transform(F.sequence(F.lit(0), F.lit(29)), term)
        docs = (
            spark.range(n)
            .select(F.col("id").alias("doc_id"))
            .select("doc_id", F.array_join(words, " ").alias("text"))
            .persist()
        )
        docs.count()
        # queries: one frequent head term + three tail terms each
        queries = spark.range(n_q).select(
            F.col("id").alias("query_id"),
            F.concat(
                F.lit("t"), (F.col("id") % 12 + 1).cast("string"),
                F.lit(" t"), (F.col("id") * 977 % V + HEAD).cast("string"),
                F.lit(" t"), (F.col("id") * 7919 % V + HEAD).cast("string"),
                F.lit(" t"), (F.col("id") * 104729 % V + HEAD).cast("string"),
            ).alias("query_text"),
        )

        t0 = time.time()
        top = bm25_topk(docs, queries, k=10).persist()
        got = top.count()
        t_pruned = time.time() - t0
        print(f"bm25_topk exact: {n} docs x {n_q} queries -> {got} rows "
              f"in {t_pruned:.1f} s")

        t0 = time.time()
        top_e = bm25_topk(
            docs, queries, k=10, max_df_ratio=0.01
        ).persist()
        got_e = top_e.count()
        t_elide = time.time() - t0
        print(f"bm25_topk max_df 1%: -> {got_e} rows in {t_elide:.1f} s "
              f"(head query terms elided)")

        scored_pairs = bm25_score_pairs(docs, queries).count()
        scored_elided = bm25_score_pairs(
            docs, queries, max_df_ratio=0.01
        ).count()
        n_terms = (
            docs.select(F.explode(F.split(F.col("text"), " ")).alias("t"))
            .select("t").distinct().count()
        )
        print(f"scored (query,doc) pairs: exact {scored_pairs} vs elided "
              f"{scored_elided}; distinct corpus terms: {n_terms}")

        # the unpruned strawman: score every posting against every
        # query term via a plain join on term with NO broadcast hint
        # (what a naive implementation shuffles) — measured as the
        # posting rows that WOULD flow, not run to completion at full
        # size (it is the thing the design avoids)
        from gecko_spark.operators.text import tokens

        posts = (
            docs.select(
                "doc_id", F.explode(tokens(F.col("text"))).alias("term")
            )
            .groupBy("doc_id", "term")
            .agg(F.count(F.lit(1)).alias("tf"))
        )
        n_posts = posts.count()
        hit = posts.join(
            queries.select(
                F.explode(tokens(F.col("query_text"))).alias("term")
            ).distinct(),
            "term",
            "left_semi",
        ).count()
        print(f"posting rows total {n_posts}, surviving the query-vocab "
              f"semi-join {hit} ({100.0 * hit / n_posts:.2f}% — the pruned "
              f"shuffle fraction)")
        top.unpersist()
        docs.unpersist()
    finally:
        spark.stop()


if __name__ == "__main__":
    main()
