"""BM25 keyword retrieval over a document corpus — the lexical
retrieval primitive an LLM-data pipeline reaches for when embeddings
are too expensive or the query is exact-term (Robertson & Zaragoza
2009; the IDF is Lucene's non-negative variant):

* **hard-negative mining for retrieval training** — BM25 top-k are the
  classic "hard" lexical negatives (DPR, Karpukhin et al. 2020 mine
  them exactly this way) complementing the embedding-space miner in
  ``similarity.hard_negative_pairs``;
* **targeted decontamination / eval-set audits** — "which training
  documents score suspiciously high against this benchmark question";
* **corpus exploration** at 100 TB where an inverted-index service
  doesn't exist yet.

Shape, Spark-first: the QUERY SET is small by definition (it is the
thing a human or a training config supplies), so the only corpus-sized
work is one tokenize→explode→count aggregation; query terms broadcast
into a semi-join that prunes the posting lists BEFORE the per-(query,
doc) scoring join, so the shuffle carries only postings whose term
appears in some query — at 100 TB that pruning is the difference
between "one bounded shuffle" and "re-shuffling the corpus vocabulary".

Oracle-exactness: per-term score contributions are micro-quantized to
int64 (half-away-from-zero × 10^6 — the DSIR device, selection.py::
fit_log_ratio_micro) and summed as INTEGERS, so the per-(query, doc)
score is associative and partition-proof, and a DuckDB oracle replays
the whole chain bit-for-bit (``text_bm25_topk`` contract). Every
floating intermediate (idf, length norm) is a pure function of integer
statistics, evaluated identically by both engines; only the final SUM
would have been order-sensitive, and it is integer.
"""

from __future__ import annotations

from typing import Union

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from gecko_spark.operators.text import tokens

__all__ = [
    "bm25_score_pairs",
    "bm25_topk",
    "bm25_hard_negatives",
    "write_bm25_index",
    "bm25_topk_indexed",
]


def _doc_stats(docs: DataFrame, id_col: str, text_col: str):
    """(postings, doclen, n_docs, sum_len): term frequencies per doc,
    doc lengths, and the corpus constants. One tokenize, one explode,
    one (doc, term) aggregation — the only corpus-wide shuffle.

    ``doclen`` comes back PERSISTED (round 14 opt, guide §5): the
    corpus constants are an EAGER aggregate over it, so without the
    persist every later action re-ran the corpus regex tokenize once
    for the stats and once for doclen's scoring join — the cache fills
    as a free by-product of the stats collect and holds two longs per
    doc. Callers own the release: tie it to the returned plan
    (``persist_until_released``) or unpersist after writing."""
    from pyspark import StorageLevel

    toked = docs.select(
        F.col(id_col).alias("__doc__"), tokens(F.col(text_col)).alias("__tk__")
    )
    doclen = toked.select("__doc__", F.size("__tk__").alias("__len__")).persist(
        StorageLevel.MEMORY_AND_DISK
    )
    postings = (
        toked.select("__doc__", F.explode("__tk__").alias("__term__"))
        .groupBy("__doc__", "__term__")
        .agg(F.count(F.lit(1)).alias("__tf__"))
    )
    row = doclen.agg(
        F.count(F.lit(1)).alias("n"), F.sum("__len__").alias("s")
    ).collect()[0]
    return postings, doclen, int(row["n"]), int(row["s"] or 0)


def bm25_score_pairs(
    docs: DataFrame,
    queries: DataFrame,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    query_id_col: str = "query_id",
    query_text_col: str = "query_text",
    k1: float = 1.2,
    b: float = 0.75,
    max_df_ratio: Union[float, None] = None,
) -> DataFrame:
    """Score every (query, matching document) pair:
    ``score = Σ_t idf(t) · tf·(k1+1) / (tf + k1·(1−b+b·|d|/avgdl))``
    over the query's DISTINCT terms, with Lucene's non-negative IDF
    ``ln(1 + (N − df + 0.5)/(df + 0.5))``. Returns
    ``(query_id, doc_id, n_hit_terms, score_micro)`` where
    ``score_micro`` is the exact int64 sum of per-term contributions
    micro-quantized at 10^6 — associative, so partitioning cannot
    change it, and an external SQL engine replays it exactly.

    Documents sharing no term with the query do not appear (BM25 gives
    them 0; emitting corpus-sized zero rows would defeat the pruning).

    Plan: query terms (distinct, tiny) BROADCAST into a semi-join that
    prunes postings before anything wide happens; df/idf is computed
    on the pruned postings only; one final aggregation keyed
    (query, doc). ``queries`` must be driver-small (it broadcasts) —
    that is the operator's contract, not a limitation: a billion-query
    workload is a join-reordering problem, not a retrieval call.

    ``max_df_ratio``: optionally ELIDE query terms whose document
    frequency exceeds ``ratio · N`` — standard stopword elision. A term
    in half the corpus has idf ≈ ln(1 + ~1) ≈ 0.7 but drags its ENTIRE
    posting list through scoring (measured: one df≈0.5 query term cost
    more rows than thirty rare terms combined — tools/scale_bm25.py);
    eliding it changes each affected score by that near-floor constant
    while cutting the scored-pair volume by orders of magnitude. Off by
    default (exact BM25, what the oracle contract replays)."""
    if k1 < 0 or not (0.0 <= b <= 1.0):
        raise ValueError(f"need k1 >= 0 and 0 <= b <= 1, got {k1=} {b=}")
    if max_df_ratio is not None and not (0.0 < max_df_ratio <= 1.0):
        raise ValueError(f"max_df_ratio must be in (0, 1], got {max_df_ratio}")
    postings, doclen, n_docs, sum_len = _doc_stats(docs, id_col, text_col)
    out = _score_from_stats(
        docs.sparkSession, postings, doclen, n_docs, sum_len, queries,
        id_col=id_col, query_id_col=query_id_col,
        query_text_col=query_text_col, k1=k1, b=b,
        max_df_ratio=max_df_ratio,
    )
    if n_docs == 0:
        # empty-corpus early return references nothing — release now
        doclen.unpersist()
        return out
    from gecko_spark.core import persist_until_released

    return persist_until_released(doclen, out)


def _score_from_stats(
    spark,
    postings: DataFrame,
    doclen: DataFrame,
    n_docs: int,
    sum_len: int,
    queries: DataFrame,
    *,
    id_col: str,
    query_id_col: str,
    query_text_col: str,
    k1: float,
    b: float,
    max_df_ratio,
    df_via: str = "window",
) -> DataFrame:
    """The scoring tail shared by the direct path and the persisted-
    index path (:func:`bm25_topk_indexed`). ``postings`` =
    (__doc__, __term__, __tf__), ``doclen`` = (__doc__, __len__).

    ``df_via`` picks how the per-term document frequency is attached —
    both produce identical rows, the choice is purely physical:

    - ``"window"`` (default, the direct path): df rides a
      partitionBy(term) window over the pruned postings, keeping the
      chain SINGLE-PASS — right when ``postings`` is expensive to
      produce (the corpus-wide tokenize+aggregate), because the
      alternative re-executes it per consumer.
    - ``"reaggregate"`` (the persisted-index path): a separate tiny
      groupBy(term) count broadcast-joined back. ``postings`` is then
      consumed twice, but there it is a cheap bucket-pruned parquet
      scan, and the window's exchange+sort sat on the critical path
      instead — measured +0.4 s (+30%) on the 34-query indexed bench
      entry when the window shape was (wrongly) used for both paths
      (round 14, cross-commit interleaved A/B)."""
    if df_via not in ("window", "reaggregate"):
        raise ValueError(f"df_via must be 'window' or 'reaggregate', got {df_via!r}")
    if n_docs == 0:
        # derive id types from the input schemas so the empty result
        # unions cleanly with non-empty-path results under string (or
        # any other) id columns (ADVICE r12 — 'long' was hardcoded)
        from pyspark.sql.types import LongType, StructField, StructType

        return spark.createDataFrame(
            [],
            StructType(
                [
                    StructField(
                        query_id_col,
                        queries.schema[query_id_col].dataType,
                    ),
                    StructField(id_col, postings.schema["__doc__"].dataType),
                    # count() is non-nullable, sum() nullable — mirror
                    # the non-empty aggregation exactly
                    StructField("n_hit_terms", LongType(), nullable=False),
                    StructField("score_micro", LongType()),
                ]
            ),
        )
    avgdl = sum_len / n_docs  # exact int ratio → identical double everywhere

    qterms = F.broadcast(
        queries.select(
            F.col(query_id_col).alias("__q__"),
            F.explode(tokens(F.col(query_text_col))).alias("__term__"),
        ).distinct()
    )
    # prune postings to query vocabulary FIRST (broadcast semi-join),
    # then df over the pruned set — df counts DOCS per term, which is
    # invariant to the pruning (a term's posting list survives whole).
    # The per-term df rides a partitionBy(term) WINDOW over the pruned
    # postings (round 14 opt, guide §2.2): the previous separate
    # count aggregate + broadcast-join-back made `hit` a two-consumer
    # frame, so the corpus tokenize → (doc, term) aggregation (or the
    # indexed path's bucket-pruned scan) executed once per consumer.
    # The window costs one exchange of the PRUNED postings — query-
    # vocabulary-sized, not corpus-sized — and leaves the whole chain
    # single-pass.
    hit = postings.join(qterms.select("__term__").distinct(), "__term__", "left_semi")
    if df_via == "window":
        w_term = Window.partitionBy("__term__")
        hit = hit.withColumn("__df__", F.count(F.lit(1)).over(w_term))
        if max_df_ratio is not None:
            # elide stopword-frequent query terms BEFORE the wide joins
            # — a per-row filter on the window-attached df, same rows
            # dropped as the reaggregate shape's term-list filter
            hit = hit.filter(
                F.col("__df__")
                <= F.lit(float(max_df_ratio)) * F.lit(float(n_docs))
            )
    else:
        df_ = hit.groupBy("__term__").agg(F.count(F.lit(1)).alias("__df__"))
        if max_df_ratio is not None:
            df_ = df_.filter(
                F.col("__df__")
                <= F.lit(float(max_df_ratio)) * F.lit(float(n_docs))
            )
        hit = hit.join(F.broadcast(df_), "__term__")
    idf = F.log(
        F.lit(1.0)
        + (F.lit(float(n_docs)) - F.col("__df__") + F.lit(0.5))
        / (F.col("__df__") + F.lit(0.5))
    )
    scored = hit.join(qterms, "__term__").join(doclen, "__doc__")
    tf = F.col("__tf__").cast("double")
    norm = tf * F.lit(k1 + 1.0) / (
        tf
        + F.lit(float(k1))
        * (
            F.lit(1.0 - b)
            + F.lit(float(b)) * F.col("__len__").cast("double") / F.lit(avgdl)
        )
    )
    # micro-quantize each term's contribution half-away-from-zero, then
    # sum INTEGERS: associative → partition-proof → oracle-exact
    contrib = idf * norm * F.lit(1_000_000.0)
    micro = (
        F.signum(contrib) * F.floor(F.abs(contrib) + F.lit(0.5))
    ).cast("long")
    return (
        scored.withColumn("__c__", micro)
        .groupBy(
            F.col("__q__").alias(query_id_col), F.col("__doc__").alias(id_col)
        )
        .agg(
            F.count(F.lit(1)).alias("n_hit_terms"),
            F.sum("__c__").alias("score_micro"),
        )
    )


def bm25_topk(
    docs: DataFrame,
    queries: DataFrame,
    k: int,
    **kwargs,
) -> DataFrame:
    """Per-query BM25 top-``k``: :func:`bm25_score_pairs` + one rank
    window partitioned by query (Q·matched-docs rows — already pruned
    to the query vocabulary, never corpus-wide). Total order
    (score desc, doc_id asc) → unique, replayable result. Adds
    ``rank``."""
    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    id_col = kwargs.get("id_col", "doc_id")
    query_id_col = kwargs.get("query_id_col", "query_id")
    pairs = bm25_score_pairs(docs, queries, **kwargs)
    w = Window.partitionBy(query_id_col).orderBy(
        F.col("score_micro").desc(), F.col(id_col).asc()
    )
    from gecko_spark.core import adopt_cache_owner

    return adopt_cache_owner(
        pairs.withColumn("rank", F.row_number().over(w).cast("int"))
        .filter(F.col("rank") <= k),
        pairs,  # keeps the doclen cache alive for the derived plan
    )


def write_bm25_index(
    docs: DataFrame,
    path: str,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    n_buckets: int = 64,
) -> None:
    """Persist the BM25 inverted index so repeated query batches skip
    the corpus tokenize/aggregate pass entirely (the ``write_ivf_index``
    pattern): ``postings/`` parquet PARTITIONED by
    ``pmod(xxhash64(term), n_buckets)`` — a query's terms hash to a few
    buckets, so the search scan is partition-pruned to
    ~|query vocab| / n_buckets of the index; ``doclen/`` per-doc
    lengths; ``stats/`` one row (n_docs, sum_len). One repartition on
    the bucket before the write keeps file counts at O(n_buckets), not
    O(n_buckets × input partitions) — the IVF compaction lesson."""
    if n_buckets < 1:
        raise ValueError(f"n_buckets must be >= 1, got {n_buckets}")
    postings, doclen, n_docs, sum_len = _doc_stats(docs, id_col, text_col)
    bkt = F.pmod(F.xxhash64("__term__"), F.lit(n_buckets)).cast("int")
    (
        postings.withColumn("__bkt__", bkt)
        .repartition("__bkt__")
        .write.mode("overwrite")
        .partitionBy("__bkt__")
        .parquet(f"{path}/postings")
    )
    doclen.write.mode("overwrite").parquet(f"{path}/doclen")
    doclen.unpersist()  # both eager consumers (stats, write) are done
    spark = docs.sparkSession
    spark.createDataFrame(
        [(int(n_docs), int(sum_len), int(n_buckets))],
        "n_docs long, sum_len long, n_buckets int",
    ).write.mode("overwrite").parquet(f"{path}/stats")


def bm25_topk_indexed(
    spark,
    path: str,
    queries: DataFrame,
    k: int,
    *,
    id_col: str = "doc_id",
    query_id_col: str = "query_id",
    query_text_col: str = "query_text",
    k1: float = 1.2,
    b: float = 0.75,
    max_df_ratio: Union[float, None] = None,
) -> DataFrame:
    """BM25 top-k over a PERSISTED index (:func:`write_bm25_index`):
    identical results to :func:`bm25_topk` on the source corpus (unit-
    asserted parity), but the corpus-sized tokenize/aggregate is gone
    and the postings scan is PARTITION-PRUNED — query terms' buckets
    are computed driver-side from the (driver-small) query set and
    pushed as a partition filter, so only ~|query vocab|/n_buckets of
    the index is read. The 100 TB serving shape: build once, search
    many."""
    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    stats = spark.read.parquet(f"{path}/stats").collect()[0]
    n_docs, sum_len, n_buckets = (
        int(stats["n_docs"]), int(stats["sum_len"]), int(stats["n_buckets"])
    )
    postings = spark.read.parquet(f"{path}/postings")
    doclen = spark.read.parquet(f"{path}/doclen")
    # query-term buckets, driver-side (queries are driver-small by the
    # operator's contract) → a partition filter the scan prunes on
    qt = queries.select(
        F.explode(tokens(F.col(query_text_col))).alias("__term__")
    ).distinct()
    buckets = sorted(
        r[0]
        for r in qt.select(
            F.pmod(F.xxhash64("__term__"), F.lit(n_buckets)).cast("int")
        ).distinct().collect()
    )
    if buckets:
        postings = postings.filter(F.col("__bkt__").isin(buckets))
    # df_via="reaggregate": here postings is a cheap bucket-pruned scan,
    # so scanning it twice (tiny df aggregate + scoring) beats putting
    # the window's exchange+sort on the critical path — see
    # _score_from_stats for the measured asymmetry between the paths
    pairs = _score_from_stats(
        spark, postings.drop("__bkt__"), doclen, n_docs, sum_len, queries,
        id_col=id_col, query_id_col=query_id_col,
        query_text_col=query_text_col, k1=k1, b=b,
        max_df_ratio=max_df_ratio, df_via="reaggregate",
    )
    w = Window.partitionBy(query_id_col).orderBy(
        F.col("score_micro").desc(), F.col(id_col).asc()
    )
    return (
        pairs.withColumn("rank", F.row_number().over(w).cast("int"))
        .filter(F.col("rank") <= k)
    )


def bm25_hard_negatives(
    docs: DataFrame,
    anchors: DataFrame,
    k: int,
    *,
    label_col: str = "label",
    id_col: str = "doc_id",
    text_col: str = "text",
    query_id_col: str = "query_id",
    query_text_col: str = "query_text",
    anchor_label_col: str = "label",
    **kwargs,
) -> DataFrame:
    """LEXICAL hard negatives — the BM25 half of the DPR recipe
    (Karpukhin et al. 2020 mine negatives as "top BM25 passages that
    don't contain the answer"; the embedding-space half is
    ``similarity.hard_negative_pairs``): per anchor, the ``k``
    highest-BM25 documents whose label DIFFERS from the anchor's
    (NULL-safe ``IS DISTINCT FROM`` — a NULL-labeled doc is a valid
    negative for a labeled anchor and vice versa, same policy as the
    embedding miner).

    ``anchors`` = (query_id, query_text, label). The label filter sits
    UNDER the rank window, so every anchor gets ``k`` true negatives —
    post-filtering a top-k list would silently waste the positives'
    slots. Same plan as :func:`bm25_topk` plus one broadcast label
    join; scoring cost is unchanged."""
    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    pairs = bm25_score_pairs(
        docs,
        anchors,
        id_col=id_col,
        text_col=text_col,
        query_id_col=query_id_col,
        query_text_col=query_text_col,
        **kwargs,
    )
    doc_labels = docs.select(
        F.col(id_col), F.col(label_col).alias("__dlab__")
    )
    anchor_labels = F.broadcast(
        anchors.select(
            F.col(query_id_col), F.col(anchor_label_col).alias("__alab__")
        )
    )
    negatives = (
        pairs.join(doc_labels, id_col)
        .join(anchor_labels, query_id_col)
        .filter(
            ~F.col("__dlab__").eqNullSafe(F.col("__alab__"))
        )
    )
    w = Window.partitionBy(query_id_col).orderBy(
        F.col("score_micro").desc(), F.col(id_col).asc()
    )
    from gecko_spark.core import adopt_cache_owner

    return adopt_cache_owner(
        negatives.withColumn("rank", F.row_number().over(w).cast("int"))
        .filter(F.col("rank") <= k)
        .drop("__dlab__", "__alab__"),
        pairs,  # keeps the doclen cache alive for the derived plan
    )
