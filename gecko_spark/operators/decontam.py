"""Benchmark decontamination: remove training documents that overlap an
evaluation/test set.

The standard large-LM hygiene step (beyond the reference's surface,
like dedup.py): a training document is *contaminated* when it shares at
least ``min_shared`` distinct word n-grams with any test document. The
whole pipeline is exact and engine-portable — token n-grams are joined
as plain strings, so a DuckDB oracle replays it bit-for-bit.

Scale shape (100 TB training side, small-by-comparison test side):

* n-gram extraction is pure JVM column algebra (``slice`` +
  ``array_join`` over the tokenizer's output) inside whole-stage
  codegen — no Python anywhere;
* the overlap is an inverted-index equi-join keyed on the n-gram —
  ONE shuffle of (gram, id) pairs, never an all-pairs product;
* ubiquitous n-grams (boilerplate shared by half the corpus) would
  explode the co-occurrence join quadratically, so grams hitting more
  than ``max_test_df`` test documents are dropped via a broadcast
  anti-join BEFORE the big join — the same hot-key guard as
  ``dedup.ngram_jaccard_pairs``. Dropping an everywhere-gram only
  removes evidence that was never discriminative; the cap is
  documented behavior, not silent truncation.
"""

from __future__ import annotations

from typing import Optional

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from gecko_spark.operators.text import tokens

__all__ = [
    "token_ngrams",
    "ngrams_of_tokens",
    "bloom_bits",
    "ngram_overlap_pairs",
    "decontaminate",
    "contamination_report",
]


def ngrams_of_tokens(tk: Column, n: int, distinct: bool = True) -> Column:
    """Word ``n``-grams ("w1 w2 … wn") of an ALREADY-MATERIALIZED token
    array column. ``tk`` must be a plain column reference (not the
    tokenizer expression inline): higher-order functions are
    interpreted and Catalyst re-inlines their argument into the lambda,
    so an inline ``tokens(text)`` would re-tokenize once PER ELEMENT —
    O(tokens²) per document (measured 8 s → 1 s at sf0.1). Inputs
    shorter than ``n`` tokens yield an empty array."""
    if n < 1:
        raise ValueError(f"n must be >= 1, is {n}")
    # explicit short-doc guard: sequence(1, 0) would run DESCENDING in
    # Spark ([1, 0]) and slice(tk, 0, n) throws under ANSI mode
    grams = F.when(
        F.size(tk) >= n,
        F.transform(
            F.sequence(F.lit(1), F.size(tk) - F.lit(n - 1)),
            lambda i: F.array_join(F.slice(tk, i, n), " "),
        ),
    ).otherwise(F.array().cast("array<string>"))
    return F.array_distinct(grams) if distinct else grams


def token_ngrams(text: Column, n: int) -> Column:
    """Distinct word ``n``-grams of ``text`` (tokenized with the shared
    text.py::tokens). Convenience for single-expression use; the
    dataframe paths below materialize the token array first — see
    :func:`ngrams_of_tokens` for why."""
    return ngrams_of_tokens(tokens(text), n)


def _gram_index(df: DataFrame, id_col: str, text_col: str, n: int, out_id: str) -> DataFrame:
    # two-step projection: tokenize ONCE per row, then gram the stored
    # array — keeps the tokenizer out of the interpreted lambda
    toked = df.select(
        F.col(id_col).alias(out_id), tokens(F.col(text_col)).alias("__tk__")
    )
    return toked.select(
        out_id, F.explode(ngrams_of_tokens(F.col("__tk__"), n)).alias("gram")
    )


# bloom parameters: k independent affine position hashes over P1
_BLOOM_K = 6
_BLOOM_PARAMS = [
    (1103515245, 12345),
    (69069, 362437),
    (1664525, 1013904223),
    (22695477, 1),
    (134775813, 1),
    (214013, 2531011),
]


def bloom_bits(grams: DataFrame, num_bits: int) -> "np.ndarray":
    """int64 bitset (little-endian words) with every gram's ``_BLOOM_K``
    portable-hash positions set — a Bloom filter of the ``gram``
    column.

    Built distributedly: gram → k (word, mask) rows → ``bit_or`` per
    word; only ``num_bits/64`` words reach the driver (a 1-billion-bit
    filter is 125 MB — broadcastable, where the raw gram strings of a
    100 TB-scale reference would not be)."""
    if num_bits < 64 or num_bits % 64:
        raise ValueError(f"num_bits must be a positive multiple of 64, is {num_bits}")
    h = _gram_hash_col()
    # F.shiftleft only takes a literal shift amount, so the per-row
    # (word, mask) pairs are SQL expressions
    structs = ", ".join(
        f"struct(CAST(((h * {a} + {b}) % {_P1} % {num_bits}) DIV 64 AS INT) AS word, "
        f"shiftleft(CAST(1 AS BIGINT), "
        f"CAST((h * {a} + {b}) % {_P1} % {num_bits} % 64 AS INT)) AS mask)"
        for a, b in _BLOOM_PARAMS[:_BLOOM_K]
    )
    rows = (
        grams.select(h.alias("h"))
        .select(F.explode(F.expr(f"array({structs})")).alias("wb"))
        .select(F.col("wb.word").alias("word"), F.col("wb.mask").alias("mask"))
    )
    agg = rows.groupBy("word").agg(F.bit_or("mask").alias("bits")).collect()
    out = np.zeros(num_bits // 64, dtype=np.int64)
    for r in agg:
        out[r["word"]] = r["bits"]
    return out


def _gram_hash_col():
    """Portable polynomial hash (mod P1) of the ``gram`` column as an
    Arrow kernel — the same h the DuckDB-replayable bucketing uses."""
    from gecko_spark.functions.portable_hash import P1, poly_hash_strings

    @F.pandas_udf(T.LongType())
    def _h(vals: pd.Series) -> pd.Series:
        return pd.Series(poly_hash_strings(["" if v is None else v for v in vals], P1))

    return _h(F.col("gram"))


from gecko_spark.functions.portable_hash import P1 as _P1  # noqa: E402


def _bloom_filter_grams(gram_df: DataFrame, bits: "np.ndarray") -> DataFrame:
    """Keep only rows whose ``gram`` MIGHT be in the bloom ``bits`` —
    false positives pass (pruned later by the exact join), negatives
    are definitively absent."""
    from gecko_spark.functions.portable_hash import P1, poly_hash_strings

    spark = gram_df.sparkSession
    bc = spark.sparkContext.broadcast(bits)
    num_bits = int(bits.shape[0]) * 64

    @F.pandas_udf(T.BooleanType())
    def _might(vals: pd.Series) -> pd.Series:
        arr = bc.value
        h = poly_hash_strings(["" if v is None else v for v in vals], P1)
        ok = np.ones(len(h), dtype=bool)
        for a, b in _BLOOM_PARAMS[:_BLOOM_K]:
            pos = (h * a + b) % P1 % num_bits
            ok &= ((arr[pos // 64] >> (pos % 64)) & 1).astype(bool)
        return pd.Series(ok)

    return gram_df.filter(_might(F.col("gram")))


def ngram_overlap_pairs(
    train: DataFrame,
    test: DataFrame,
    id_col: str,
    text_col: str,
    n: int = 5,
    max_test_df: Optional[int] = None,
    bloom_bits_count: Optional[int] = None,
) -> DataFrame:
    """(train_id, test_id, n_shared): distinct shared word n-grams per
    contaminated (train, test) document pair.

    ``max_test_df``: drop n-grams occurring in more than this many TEST
    documents before joining (hot-gram guard, see module docstring).
    None disables the cap — exact but quadratic in a hot gram's
    document frequency.

    ``bloom_bits_count``: when set, a Bloom filter of the TEST grams
    (that many bits) prunes the TRAIN gram index BEFORE the shuffle —
    at 100 TB almost no train gram appears in the eval split, so the
    shuffled index shrinks from corpus-sized to
    near-contaminated-only (+ the bloom's false positives). The final
    join is still exact, so the result is IDENTICAL with or without
    the prefilter; size at ~10 bits per distinct test gram for ~1% FP.
    """
    train_g = _gram_index(train, id_col, text_col, n, "train_id")
    test_g = _gram_index(test, id_col, text_col, n, "test_id")
    if max_test_df is not None:
        hot = (
            test_g.groupBy("gram")
            .agg(F.count("*").alias("df"))
            .filter(F.col("df") > max_test_df)
            .select("gram")
        )
        test_g = test_g.join(F.broadcast(hot), "gram", "left_anti")
    if bloom_bits_count is not None:
        bits = bloom_bits(test_g.select("gram"), bloom_bits_count)
        train_g = _bloom_filter_grams(train_g, bits)
    return (
        train_g.join(test_g, "gram")
        .groupBy("train_id", "test_id")
        .agg(F.count("*").alias("n_shared"))
    )


def decontaminate(
    train: DataFrame,
    test: DataFrame,
    id_col: str,
    text_col: str,
    n: int = 5,
    min_shared: int = 1,
    max_test_df: Optional[int] = None,
    bloom_bits_count: Optional[int] = None,
) -> DataFrame:
    """Training rows with NO test contamination: drops every train doc
    sharing ≥ ``min_shared`` distinct n-grams with any test doc. One
    gram-join + one left-anti join; ``bloom_bits_count`` enables the
    exact-result bloom prefilter (see :func:`ngram_overlap_pairs`)."""
    bad = (
        ngram_overlap_pairs(
            train, test, id_col, text_col, n, max_test_df, bloom_bits_count
        )
        .filter(F.col("n_shared") >= min_shared)
        .select(F.col("train_id").alias(id_col))
        .distinct()
    )
    return train.join(bad, id_col, "left_anti")


def contamination_report(
    train: DataFrame,
    test: DataFrame,
    id_col: str,
    text_col: str,
    n: int = 5,
    min_shared: int = 1,
    max_test_df: Optional[int] = None,
) -> DataFrame:
    """Per TEST document: how much of the training set touches it —
    (test_id, n_contaminated_train_docs, max_shared, total_shared).
    The eval-integrity view of the same overlap join."""
    pairs = ngram_overlap_pairs(train, test, id_col, text_col, n, max_test_df).filter(
        F.col("n_shared") >= min_shared
    )
    return pairs.groupBy("test_id").agg(
        F.count("*").alias("n_contaminated_train_docs"),
        F.max("n_shared").alias("max_shared"),
        F.sum("n_shared").alias("total_shared"),
    )
