"""Hashed n-gram linear quality classifier (operators/classifier.py).

Beyond-reference surface (the reference has no classifier); covers the
exact-integer serving path against a pure-Python replay, the seeded
weight formula, and trainer determinism + separation on planted labels.
"""

from __future__ import annotations

import re

import numpy as np
import pytest

from gecko_spark.functions.portable_hash import P1, P2, poly_hash_strings
from gecko_spark.operators.classifier import (
    hashed_linear_score,
    quantize_weights,
    seeded_weights,
    train_hashed_classifier,
)

D = 64


def _py_score(text: str, w: np.ndarray) -> tuple[int, int]:
    toks = re.findall(r"\w+", (text or "").lower())
    logit = 0
    for t in toks:
        logit += int(w[int(poly_hash_strings([t], P1)[0]) % len(w)])
    return len(toks), logit


def test_seeded_weights_formula_and_range():
    w = seeded_weights(16, span=1000)
    assert w.dtype == np.int64 and len(w) == 16
    assert w.min() >= -1000 and w.max() <= 1000
    # formula replay for one index
    h = int(poly_hash_strings(["7"], P2)[0])
    assert w[7] == h % 2001 - 1000
    # deterministic
    assert (seeded_weights(16, span=1000) == w).all()


def test_quantize_weights_half_away_from_zero():
    q = quantize_weights(np.array([0.0015, -0.0015, 0.25, -1.0]), scale=1000)
    assert q.tolist() == [2, -2, 250, -1000]


def test_score_matches_python_replay(spark):
    rows = [
        (1, "the quick brown fox jumps over the lazy dog"),
        (2, "lorem ipsum dolor sit amet"),
        (3, ""),
        (4, None),
        (5, "Fox! fox? FOX_fox 123 123"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    w = seeded_weights(D)
    got = {
        r["doc_id"]: (r["n_tokens"], r["logit"], r["passes"])
        for r in hashed_linear_score(df, w, bias=3, threshold=5).collect()
    }
    for doc_id, text in rows:
        n, logit = _py_score(text or "", w)
        assert got[doc_id] == (n, logit + 3, logit + 3 >= 5), doc_id


def test_serve_plan_is_one_arrow_projection(spark):
    df = spark.createDataFrame([(1, "a b c")], "doc_id long, text string")
    out = hashed_linear_score(df, seeded_weights(D))
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "ArrowEvalPython" in plan  # the kernel runs (not pruned away)
    assert "Exchange" not in plan and "Join" not in plan  # scan-shaped


def test_empty_doc_scores_bias(spark):
    df = spark.createDataFrame([(1, "")], "doc_id long, text string")
    row = hashed_linear_score(df, seeded_weights(D), bias=-7).collect()[0]
    assert (row["n_tokens"], row["logit"], row["passes"]) == (0, -7, False)


@pytest.fixture(scope="module")
def labeled_docs(spark):
    # planted signal: positive docs share a marker vocabulary, negative
    # docs draw from a disjoint junk vocabulary
    good = ["fluent prose with common readable words number %d" % i for i in range(40)]
    bad = ["zxqv jkpw qqgg %d vvkk zzz" % i for i in range(40)]
    rows = [(i, t, 1) for i, t in enumerate(good)] + [
        (100 + i, t, 0) for i, t in enumerate(bad)
    ]
    return spark.createDataFrame(rows, "doc_id long, text string, label int")


def test_trainer_separates_and_is_deterministic(labeled_docs):
    kw = dict(label_col="label", n_features=256, iters=12, lr=1.0)
    w1 = train_hashed_classifier(labeled_docs, **kw)
    w2 = train_hashed_classifier(labeled_docs, **kw)
    assert (w1 == w2).all(), "retraining must be bit-identical"
    q = quantize_weights(w1, scale=1000)
    scored = hashed_linear_score(labeled_docs, q).collect()
    acc = sum(
        1 for r in scored if r["passes"] == (r["doc_id"] < 100)
    ) / len(scored)
    assert acc >= 0.95, acc
