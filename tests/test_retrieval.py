"""BM25 retrieval (operators/retrieval.py): scoring model parity with
a brute-force reference, pruning/plan shape, determinism, guards."""

from __future__ import annotations

import math
import re

import pytest
from pyspark.sql import functions as F

from gecko_spark.operators.retrieval import bm25_score_pairs, bm25_topk

DOCS = [
    (0, "the quick brown fox jumps over the lazy dog"),
    (1, "a quick brown cat sleeps"),
    (2, "the dog barks at the other dog"),
    (3, "entirely unrelated words about spaceships"),
    (4, None),
    (5, ""),
    (6, "fox fox fox fox fox"),
]
QUERIES = [(100, "quick fox"), (101, "dog"), (102, "zzz_absent_term")]


def _brute_bm25(k1=1.2, b=0.75):
    tok = lambda t: re.findall(r"\w+", (t or "").lower())
    dtoks = {i: tok(t) for i, t in DOCS}
    n = len(DOCS)
    avgdl = sum(len(v) for v in dtoks.values()) / n
    out = {}
    for qid, qt in QUERIES:
        for did, toks in dtoks.items():
            s, hits = 0, 0
            for term in sorted(set(tok(qt))):
                tf = toks.count(term)
                if tf == 0:
                    continue
                df = sum(1 for v in dtoks.values() if term in v)
                idf = math.log(1.0 + (n - df + 0.5) / (df + 0.5))
                norm = tf * (k1 + 1.0) / (
                    tf + k1 * ((1.0 - b) + b * len(toks) / avgdl)
                )
                c = idf * norm * 1e6
                s += int(math.copysign(math.floor(abs(c) + 0.5), c))
                hits += 1
            if hits:
                out[(qid, did)] = (hits, s)
    return out


@pytest.fixture(scope="module")
def corpus(spark):
    return spark.createDataFrame(DOCS, "doc_id long, text string").repartition(3)


@pytest.fixture(scope="module")
def queries(spark):
    return spark.createDataFrame(QUERIES, "query_id long, query_text string")


def test_bm25_matches_brute_force(spark, corpus, queries):
    got = {
        (r["query_id"], r["doc_id"]): (r["n_hit_terms"], r["score_micro"])
        for r in bm25_score_pairs(corpus, queries).collect()
    }
    assert got == _brute_bm25()


def test_bm25_topk_rank_and_intuition(spark, corpus, queries):
    top = bm25_topk(corpus, queries, k=2)
    rows = {
        (r["query_id"], r["rank"]): r["doc_id"] for r in top.collect()
    }
    # 'quick fox': doc 0 matches both terms; doc 6 is tf-saturated fox
    assert rows[(100, 1)] in (0, 6)
    # 'dog': doc 2 (tf=2, shorter) outranks doc 0 (tf=1)
    assert rows[(101, 1)] == 2
    # absent term: no rows for query 102
    assert not any(q == 102 for q, _ in rows)
    # zero-score never beats positive; ranks are 1..k contiguous
    for q in (100, 101):
        ranks = sorted(r for (qq, r) in rows if qq == q)
        assert ranks == list(range(1, len(ranks) + 1))


def test_bm25_partitioning_invariant(spark, corpus, queries):
    a = sorted(map(tuple, bm25_score_pairs(corpus, queries).collect()))
    b = sorted(
        map(tuple, bm25_score_pairs(corpus.repartition(7), queries).collect())
    )
    assert a == b  # integer micro-sum: associativity-proof


def test_bm25_plan_broadcasts_queries(spark, corpus, queries):
    plan = bm25_score_pairs(corpus, queries)._jdf.queryExecution(
    ).executedPlan().toString()
    assert "Broadcast" in plan  # query vocabulary never shuffles the corpus


def test_bm25_max_df_elision(spark, corpus, queries):
    """max_df_ratio elides stopword-frequent query terms: 'the' is in
    2/7 docs (df ratio ≈ 0.29); at max_df 0.2 any pair that only
    matched via an elided term disappears, others lose exactly that
    term's contribution."""
    q = spark.createDataFrame([(200, "the fox")], "query_id long, query_text string")
    exact = {
        (r["query_id"], r["doc_id"]): r["score_micro"]
        for r in bm25_score_pairs(corpus, q).collect()
    }
    elided = {
        (r["query_id"], r["doc_id"]): r["score_micro"]
        for r in bm25_score_pairs(corpus, q, max_df_ratio=0.2).collect()
    }
    # doc 2 only matched 'the' -> gone; fox docs remain, scores shrink
    assert (200, 2) in exact and (200, 2) not in elided
    for key in elided:
        assert key in exact and elided[key] <= exact[key]
    with pytest.raises(ValueError, match="max_df_ratio"):
        bm25_score_pairs(corpus, q, max_df_ratio=0.0)


def test_bm25_hard_negatives_label_under_window(spark):
    """The DPR device: the highest-scoring doc shares the anchor's
    label and MUST be excluded BEFORE the top-k window, so its slot
    goes to the best true negative instead of being wasted."""
    from gecko_spark.operators.retrieval import bm25_hard_negatives

    docs = spark.createDataFrame(
        [
            (0, "alpha beta gamma", "en"),   # same label as anchor, best hit
            (1, "alpha beta", "de"),          # true negative
            (2, "alpha", "de"),               # weaker true negative
            (3, "unrelated text", "fr"),
            (4, "alpha beta gamma delta", None),  # NULL label = negative
        ],
        "doc_id long, text string, lang string",
    )
    anchors = spark.createDataFrame(
        [(9, "alpha beta gamma", "en")],
        "query_id long, query_text string, label string",
    )
    out = bm25_hard_negatives(
        docs, anchors, k=2, label_col="lang"
    ).collect()
    got = {(r["query_id"], r["rank"]): r["doc_id"] for r in out}
    assert 0 not in {r["doc_id"] for r in out}  # same-label excluded
    # ranks 1..2 filled by true negatives (NULL label counts)
    assert set(got) == {(9, 1), (9, 2)}
    with pytest.raises(ValueError, match="k must be"):
        bm25_hard_negatives(docs, anchors, k=0, label_col="lang")


def test_bm25_index_roundtrip_parity_and_pruning(spark, corpus, queries, tmp_path):
    """The persisted index must answer EXACTLY what the direct path
    answers, and its postings scan must be partition-pruned to the
    query terms' hash buckets."""
    from gecko_spark.operators.retrieval import (
        bm25_topk,
        bm25_topk_indexed,
        write_bm25_index,
    )

    path = str(tmp_path / "bm25_idx")
    write_bm25_index(corpus, path, n_buckets=8)
    direct = sorted(map(tuple, bm25_topk(corpus, queries, k=3).collect()))
    indexed = sorted(
        map(tuple, bm25_topk_indexed(spark, path, queries, k=3).collect())
    )
    assert direct == indexed
    # pruning: the scan carries a __bkt__ partition filter
    plan = bm25_topk_indexed(spark, path, queries, k=3)._jdf.queryExecution(
    ).executedPlan().toString()
    assert "__bkt__" in plan and "PartitionFilters: [" in plan
    assert "__bkt__#" in plan.split("PartitionFilters", 1)[1][:200]
    # index stats round-trip exactly
    stats = spark.read.parquet(f"{path}/stats").collect()[0]
    assert stats["n_docs"] == corpus.count()


def test_bm25_guards_and_empty(spark, corpus, queries):
    with pytest.raises(ValueError, match="k1"):
        bm25_score_pairs(corpus, queries, k1=-1.0)
    with pytest.raises(ValueError, match="k must be"):
        bm25_topk(corpus, queries, k=0)
    empty = spark.createDataFrame([], "doc_id long, text string")
    assert bm25_score_pairs(empty, queries).count() == 0


def test_bm25_empty_corpus_schema_follows_id_types(spark):
    """ADVICE r12: the empty-corpus short-circuit hardcoded long ids;
    string-id inputs must produce a schema that unions with the
    non-empty path."""
    empty_docs = spark.createDataFrame([], "doc_id string, text string")
    str_queries = spark.createDataFrame(
        [("qa", "cat mat")], "query_id string, query_text string"
    )
    out = bm25_score_pairs(empty_docs, str_queries)
    assert out.count() == 0
    nonempty = bm25_score_pairs(
        spark.createDataFrame([("d1", "cat on mat")], "doc_id string, text string"),
        str_queries,
    )
    assert out.schema == nonempty.schema
    out.unionByName(nonempty)  # must not raise
