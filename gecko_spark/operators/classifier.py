"""Hashed n-gram linear quality classifier (fastText / CCNet style).

Web-scale corpus pipelines (CCNet, LLaMA, RefinedWeb, FineWeb) gate
documents with a cheap linear classifier over hashed bag-of-words
features — "does this look like reference text?" — trained once on a
small labeled sample and then applied to the full corpus. The reference
(ul-mds/gecko) has no classifier; this module is part of the
beyond-reference LLM-data surface, alongside the Gopher/C4 rule gates
in :mod:`gecko_spark.operators.text`.

Design, in the order a 100 TB deployment cares:

* **Hashing trick.** Feature index = ``polyhash(token, P1) % D`` using
  the engine-portable polynomial hash
  (:mod:`gecko_spark.functions.portable_hash`), so a DuckDB oracle
  reproduces every index bit-for-bit (Unicode word tokens — ``\\w+``
  runs of the lowered
  text).
* **Integer serving.** Served weights are int64
  (:func:`quantize_weights` / :func:`seeded_weights`); a document's
  logit is the exact int64 sum of its token weights. Integer addition
  is associative, so the score is independent of partition/batch order
  and value-hash-identical on any engine — a float dot product would
  drift in the last ulp and break oracle parity. (Serving quantized
  linear models is standard practice, not a test convenience.)
* **Plan shape.** Scoring is ONE narrow Arrow projection — zero
  shuffles, zero joins, tokens never explode. The weight vector rides
  in the kernel closure (D = 2^20 int64 is 8 MB, well inside task
  serialization; beyond that, move to an explicit broadcast variable).
  At 100 TB this is embarrassingly parallel scan work.
* **Training** (:func:`train_hashed_classifier`) is full-batch logistic
  regression by gradient descent. The (doc, feature, count) design
  matrix is built once (one shuffle) and cached; each iteration is a
  broadcast join against the D-row weight table plus two aggregations,
  with the weight update on the driver over a length-D vector.
  Determinism: per-document error and per-feature gradient terms are
  rounded to 6 decimals and summed as ``decimal(28,6)`` — decimal
  addition is associative (same device as ``unigram_logprob``), so
  retraining reproduces bit-identical weights run-to-run. The trainer
  targets the standard regime — a bounded labeled sample (≤ a few
  million rows, D ≤ ~10^5); the resulting weights then serve at any
  corpus size through the scan-only scoring path.
"""

from __future__ import annotations

import re

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from gecko_spark.functions.portable_hash import P1, P2, poly_hash_strings

__all__ = [
    "seeded_weights",
    "quantize_weights",
    "hashed_linear_score",
    "train_hashed_classifier",
]

# \w (Unicode) == the trainer's text.py::tokens class — serving on
# an ASCII class while training on Unicode tokens gave non-ASCII
# docs a train/serve FEATURE MISMATCH (adversarial gate, round 11)
_TOKEN_RE = re.compile(r"\w+")


def seeded_weights(n_features: int, span: int = 1000) -> np.ndarray:
    """Deterministic pseudo-random int64 weights in ``[-span, span]``:
    ``w[i] = polyhash(str(i), P2) % (2·span+1) − span``. Both engines
    can derive the same vector from the same formula, which makes the
    serving path oracle-checkable without shipping a weights file;
    production callers pass trained weights
    (:func:`train_hashed_classifier` → :func:`quantize_weights`)
    through the identical code path."""
    h = poly_hash_strings([str(i) for i in range(n_features)], P2)
    return (h % (2 * span + 1)) - span


def quantize_weights(weights: np.ndarray, scale: int = 1000) -> np.ndarray:
    """Float weights → int64 serving weights (``round(w · scale)``).
    Half-way cases round half-away-from-zero (np.round's banker
    rounding would make the serving weights depend on float
    representation subtleties; away-from-zero matches what a SQL
    ``ROUND`` does)."""
    w = np.asarray(weights, dtype=np.float64) * scale
    return np.sign(w).astype(np.int64) * np.floor(np.abs(w) + 0.5).astype(np.int64)


def hashed_linear_score(
    df: DataFrame,
    weights: np.ndarray,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    bias: int = 0,
    threshold: int = 0,
) -> DataFrame:
    """Score every document with an integer hashed-BoW linear model.

    Returns ``(id_col, n_tokens, logit, passes)`` where
    ``logit = bias + Σ_tokens weights[polyhash(tok, P1) % D]`` (exact
    int64) and ``passes = logit ≥ threshold``. A document with no
    tokens scores ``bias``. One Arrow projection, no shuffle."""
    # split-starvation guard (round 14 opt): the scoring kernel is the
    # whole operator — a single-file/single-row-group scan would run it
    # in ONE task (no-op on many-split inputs; per-row output)
    from gecko_spark.operators.dedup import ensure_parallelism

    df = ensure_parallelism(df)
    w_arr = np.ascontiguousarray(np.asarray(weights, dtype=np.int64))
    n_features = len(w_arr)
    max_abs_w = int(np.abs(w_arr).max()) if n_features else 0

    @F.pandas_udf("n_tokens long, logit long")
    def _score(texts: pd.Series) -> pd.DataFrame:
        toks_per = [_TOKEN_RE.findall((t or "").lower()) for t in texts]
        counts = np.array([len(ts) for ts in toks_per], dtype=np.int64)
        flat = [tk for ts in toks_per for tk in ts]
        if flat:
            idx = poly_hash_strings(flat, P1) % n_features
            tok_w = w_arr[idx]
            doc_of = np.repeat(np.arange(len(texts)), counts)
            # float64 bincount is exact while every partial sum stays an
            # integer < 2^53 (|w| ≤ scale, tokens/doc « 2^20); GUARDED
            # (ADVICE r8): outsized weights or degenerate megadocs fall
            # back to exact int64 accumulation instead of silently
            # rounding the logit
            if int(counts.max()) * max_abs_w < 2**53:
                logits = np.bincount(
                    doc_of, weights=tok_w.astype(np.float64),
                    minlength=len(texts),
                ).astype(np.int64)
            else:
                if int(counts.max()) * max_abs_w >= 2**62:
                    raise ValueError(
                        "logit bound exceeds int64: weight span "
                        f"{max_abs_w} x {int(counts.max())} tokens/doc"
                    )
                logits = np.zeros(len(texts), dtype=np.int64)
                np.add.at(logits, doc_of, tok_w)
        else:
            logits = np.zeros(len(texts), dtype=np.int64)
        return pd.DataFrame({"n_tokens": counts, "logit": logits})

    s = _score(F.col(text_col)).alias("__clf__")
    out = df.select(F.col(id_col), s)
    logit = (out["__clf__.logit"] + F.lit(int(bias))).cast("long")
    return out.select(
        id_col,
        out["__clf__.n_tokens"].alias("n_tokens"),
        logit.alias("logit"),
        (logit >= F.lit(int(threshold))).alias("passes"),
    )


def _hash_idx_udf(n_features: int):
    @F.pandas_udf("long")
    def _idx(toks: pd.Series) -> pd.Series:
        if len(toks) == 0:
            return pd.Series([], dtype="int64")
        return pd.Series(poly_hash_strings(list(toks), P1) % n_features)

    return _idx


def train_hashed_classifier(
    df: DataFrame,
    *,
    label_col: str,
    id_col: str = "doc_id",
    text_col: str = "text",
    n_features: int = 1024,
    iters: int = 20,
    lr: float = 0.5,
    l2: float = 0.0,
) -> np.ndarray:
    """Full-batch logistic regression over hashed-BoW counts; returns
    float64 weights (length ``n_features``, rounded to 6 decimals).
    ``label_col`` must be 0/1. Deterministic run-to-run: every
    cross-row sum is decimal(28,6) (associative), the sigmoid/update
    arithmetic is per-row or driver-side. Quantize the result with
    :func:`quantize_weights` for the exact-integer serving path."""
    from gecko_spark.operators.text import tokens

    spark = df.sparkSession
    toks = df.select(
        F.col(id_col).alias("__id__"),
        F.explode(tokens(F.coalesce(F.col(text_col), F.lit("")))).alias("__tok__"),
    )
    design = (
        toks.select("__id__", _hash_idx_udf(n_features)(F.col("__tok__")).alias("i"))
        .groupBy("__id__", "i")
        .agg(F.count("*").alias("cnt"))
        .persist()
    )
    labels = df.select(
        F.col(id_col).alias("__id__"),
        F.col(label_col).cast("double").alias("y"),
    ).persist()
    n_docs = labels.count()  # also materializes the caches

    w = np.zeros(n_features, dtype=np.float64)
    try:
        for _ in range(iters):
            wdf = F.broadcast(
                spark.createDataFrame(
                    [(int(i), float(w[i])) for i in range(n_features)],
                    "i long, w double",
                )
            )
            margins = (
                design.join(wdf, "i")
                .withColumn(
                    "mterm",
                    F.round(F.col("cnt") * F.col("w"), 6).cast("decimal(28,6)"),
                )
                .groupBy("__id__")
                .agg(F.sum("mterm").cast("double").alias("m"))
            )
            err = (
                labels.join(margins, "__id__", "left")
                .select(
                    "__id__",
                    F.round(
                        F.lit(1.0) / (F.lit(1.0) + F.exp(-F.coalesce("m", F.lit(0.0))))
                        - F.col("y"),
                        6,
                    ).alias("e"),
                )
            )
            grad_rows = (
                design.join(err, "__id__")
                .withColumn(
                    "gterm",
                    F.round(F.col("cnt") * F.col("e"), 6).cast("decimal(28,6)"),
                )
                .groupBy("i")
                .agg(F.sum("gterm").cast("double").alias("g"))
                .collect()
            )
            grad = np.zeros(n_features, dtype=np.float64)
            for row in grad_rows:
                grad[row["i"]] = row["g"]
            w = np.round(w - lr * (grad / n_docs + l2 * w), 6)
    finally:
        design.unpersist()
        labels.unpersist()
    return w
