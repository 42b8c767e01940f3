"""DSIR-style data selection: hashed n-gram importance resampling.

Implements the selection method of Xie et al. 2023 ("Data Selection for
Language Models via Importance Resampling", NeurIPS 2023): score every
raw document by how much more likely its hashed n-gram bag is under a
*target* distribution (e.g. a curated reference corpus) than under the
*raw* distribution, then sample the training subset with probability
proportional to that importance weight (Gumbel top-k — equivalent to
sampling without replacement proportional to ``exp(log_weight)``).
The reference (ul-mds/gecko) has no selection surface; this module is
part of the beyond-reference LLM-data-pipeline layer, alongside the
quality classifier (:mod:`gecko_spark.operators.classifier`) and the
rule gates in :mod:`gecko_spark.operators.text`.

Design, in the order a 100 TB deployment cares:

* **Hashing trick, engine-portable.** Feature index =
  ``polyhash(gram, P1) % n_buckets`` over lowered Unicode word tokens
  (unigrams + space-joined bigrams by default — the DSIR paper's
  feature set), using the same portable polynomial hash as the
  classifier, so a DuckDB oracle reproduces every bucket bit-for-bit.
* **Fitting is two bounded aggregations.** Each distribution fit is a
  map-side pre-aggregated scan (each Arrow batch emits at most
  ``n_buckets`` partial rows — ``np.bincount`` inside the kernel) plus
  one small groupBy; the fitted model is a length-``n_buckets`` int64
  vector of micro-log-ratios, collected on the driver (bounded by
  construction: 10^4–10^5 buckets, KBs–MBs).
* **Integer scoring.** The served log-ratio is quantized to int64
  micro-units (×10^6, half-away-from-zero — the same device as
  :func:`gecko_spark.operators.classifier.quantize_weights`); a
  document's log-weight is the exact int64 sum of its grams'
  micro-ratios. Integer addition is associative, so the score is
  independent of partition/batch order and value-hash-identical on any
  engine. Scoring is ONE narrow Arrow projection — zero shuffles,
  zero joins, grams never explode; the model vector rides in the
  kernel closure (8 MB at 2^20 buckets).
* **Selection is top-n, not a global sort.** Gumbel top-k keys
  (``log_weight − ln(−ln(u))`` with a portable per-row uniform) go
  through ``orderBy(...).limit(n)`` — Spark plans that as
  TakeOrderedAndProject (per-partition top-n, driver merge of
  ``n × partitions`` candidates), never a single-partition window.
  For selection targets beyond driver memory, use the documented
  two-pass threshold variant (count-above-threshold, then filter).

Determinism contract: every step is a pure function of (row key, seed,
fitted counts); the ``dsir_log_weights`` / ``dsir_select`` contract
queries replay the full chain — tokenize, gram, bucket, smoothed
log-ratio, micro-quantize, Gumbel key — in DuckDB.
"""

from __future__ import annotations

import math
import re
from typing import Iterable, Iterator, Sequence, Union

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from gecko_spark.core import RandomSource
from gecko_spark.functions.portable_hash import P1, poly_hash_strings

__all__ = [
    "hashed_ngram_bucket_counts",
    "fit_log_ratio_micro",
    "dsir_log_weights",
    "gumbel_topk",
    "gumbel_select_frac",
]

# Unicode word class — identical to classifier serving and
# text.py::tokens (the round-11 adversarial gate unified all three)
_TOKEN_RE = re.compile(r"\w+")

_SALT_GUMBEL = 17


def _grams(text: str, ns: Sequence[int]) -> list[str]:
    """Lowered word n-grams of one document (space-joined for n > 1).
    NULL/empty text → no grams, matching the tokenize-empty convention
    everywhere else in the package."""
    toks = _TOKEN_RE.findall((text or "").lower())
    out: list[str] = []
    for n in ns:
        if n == 1:
            out.extend(toks)
        else:
            out.extend(
                " ".join(toks[i:i + n]) for i in range(len(toks) - n + 1)
            )
    return out


def _validate_ns(ns: Sequence[int]) -> tuple[int, ...]:
    ns = tuple(int(n) for n in ns)
    if not ns or any(n < 1 for n in ns) or len(set(ns)) != len(ns):
        raise ValueError(f"ns must be distinct integers >= 1, got {ns!r}")
    return ns


def hashed_ngram_bucket_counts(
    df: DataFrame,
    *,
    text_col: str = "text",
    n_buckets: int = 4096,
    ns: Sequence[int] = (1, 2),
) -> DataFrame:
    """Corpus-level hashed n-gram bucket counts: ``(bucket, cnt)`` with
    ``bucket = polyhash(gram, P1) % n_buckets`` over every document's
    unigrams/bigrams (``ns`` selects the gram orders).

    Plan shape: one Arrow scan where each batch pre-aggregates its
    grams into at most ``n_buckets`` partial rows (map-side combine by
    construction), then a single small groupBy — the shuffle moves
    ``partitions × nonzero-buckets`` rows, never gram-sized data.
    Only nonzero buckets appear (smoothing handles the rest).
    """
    if n_buckets < 2:
        raise ValueError(f"n_buckets must be >= 2, got {n_buckets}")
    ns = _validate_ns(ns)
    # split-starvation guard (round 14 opt): the per-batch bincount
    # kernel IS the fit's map side — a single-file scan serializes it
    # into one task (no-op on many-split or shuffle-fed inputs; the
    # groupBy sum is partition-order-free, so counts are unchanged)
    from gecko_spark.operators.dedup import ensure_parallelism

    df = ensure_parallelism(df)

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            flat: list[str] = []
            for t in pdf[text_col]:
                flat.extend(_grams(t, ns))
            if not flat:
                continue
            idx = poly_hash_strings(flat, P1) % n_buckets
            c = np.bincount(idx, minlength=n_buckets)
            nz = np.nonzero(c)[0]
            yield pd.DataFrame(
                {"bucket": nz.astype(np.int64), "cnt": c[nz].astype(np.int64)}
            )

    return (
        df.select(text_col)
        .mapInPandas(gen, "bucket long, cnt long")
        .groupBy("bucket")
        .agg(F.sum("cnt").alias("cnt"))
    )


def fit_log_ratio_micro(
    target_counts: DataFrame,
    raw_counts: DataFrame,
    n_buckets: int,
    alpha: float = 1.0,
) -> np.ndarray:
    """Fitted DSIR model: per-bucket importance log-ratio in int64
    micro-units (×10^6, half-away-from-zero).

    ``lr[b] = ln((ct_b + α) / (Tt + α·B)) − ln((cr_b + α) / (Tr + α·B))``

    with Laplace smoothing ``α`` over ``B = n_buckets`` buckets —
    the hashed-multinomial estimate of the DSIR paper. Both inputs are
    outputs of :func:`hashed_ngram_bucket_counts`; the collects are
    bounded at ``n_buckets`` rows each.
    """
    if alpha <= 0:
        raise ValueError(f"alpha must be > 0, got {alpha}")

    def dense(cdf: DataFrame) -> np.ndarray:
        arr = np.zeros(n_buckets, dtype=np.int64)
        for row in cdf.collect():
            b = int(row["bucket"])
            if not (0 <= b < n_buckets):
                raise ValueError(f"bucket {b} outside [0, {n_buckets})")
            arr[b] = int(row["cnt"])
        return arr

    # Overlap the two independent fit aggregations (guide §2.6: actions
    # are only sequential because driver code calls them sequentially).
    # Each job is a map-side pre-aggregated scan whose tail leaves most
    # cores idle; submitting both lets the second job's tasks back-fill
    # the first's stragglers. Round-14 interleaved A/B (min-of-5,
    # sf0.1, scratch/ab_r14b.log): fit min 2.37 s -> 1.55 s, med
    # 2.40 -> 2.18, inside dsir_select_e2e (entry min 3.30 -> 2.57).
    # Result-identical: dense() fills by bucket index, order-free.
    from concurrent.futures import ThreadPoolExecutor

    with ThreadPoolExecutor(max_workers=2) as pool:
        fut_t = pool.submit(dense, target_counts)
        fut_r = pool.submit(dense, raw_counts)
        ct = fut_t.result()
        cr = fut_r.result()
    lt = np.log((ct + alpha) / (ct.sum() + alpha * n_buckets))
    lr = np.log((cr + alpha) / (cr.sum() + alpha * n_buckets))
    d = (lt - lr) * 1e6
    # half-away-from-zero matching SQL/std::round EXACTLY: compare the
    # fractional part, never add 0.5 — floor(|x| + 0.5) rounds UP on
    # doubles just below a half boundary (0.49999999999999994 + 0.5
    # == 1.0 in IEEE), where DuckDB ROUND correctly returns 0. |x|−
    # floor(|x|) is exact for |x| < 2^52, so the comparison is safe.
    a = np.abs(d)
    fl = np.floor(a)
    out = fl + (a - fl >= 0.5)
    return (np.sign(d) * out).astype(np.int64)


def dsir_log_weights(
    df: DataFrame,
    log_ratio_micro: np.ndarray,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    ns: Sequence[int] = (1, 2),
) -> DataFrame:
    """Per-document importance log-weight under a fitted model.

    Returns ``(id_col, n_grams, lw_micro, log_weight)`` where
    ``lw_micro = Σ_grams log_ratio_micro[bucket(gram)]`` (exact int64 —
    associative, partition-order-proof) and
    ``log_weight = lw_micro / 10^6`` as a double. A document with no
    grams scores 0. One Arrow projection, no shuffle, no explode.
    """
    ns = _validate_ns(ns)
    # split-starvation guard (round 14 opt): scoring is one Arrow
    # projection — the whole operator — and a single-file scan would
    # run it in ONE task; no-op on many-split or shuffle-fed inputs
    from gecko_spark.operators.dedup import ensure_parallelism

    df = ensure_parallelism(df)
    lr = np.ascontiguousarray(np.asarray(log_ratio_micro, dtype=np.int64))
    n_buckets = len(lr)
    if n_buckets < 2:
        raise ValueError("log_ratio_micro must have >= 2 buckets")
    max_abs = int(np.abs(lr).max()) if n_buckets else 0

    @F.pandas_udf("n_grams long, lw_micro long")
    def _score(texts: pd.Series) -> pd.DataFrame:
        grams_per = [_grams(t, ns) for t in texts]
        counts = np.array([len(g) for g in grams_per], dtype=np.int64)
        flat = [g for gs in grams_per for g in gs]
        if flat:
            idx = poly_hash_strings(flat, P1) % n_buckets
            gram_w = lr[idx]
            doc_of = np.repeat(np.arange(len(texts)), counts)
            # same exactness device as the classifier: float64 bincount
            # is integer-exact while every partial sum < 2^53; guarded
            # fallback to int64 accumulation beyond that
            if int(counts.max()) * max_abs < 2**53:
                lw = np.bincount(
                    doc_of, weights=gram_w.astype(np.float64),
                    minlength=len(texts),
                ).astype(np.int64)
            else:
                if int(counts.max()) * max_abs >= 2**62:
                    raise ValueError(
                        "log-weight bound exceeds int64: "
                        f"|ratio| {max_abs} x {int(counts.max())} grams/doc"
                    )
                lw = np.zeros(len(texts), dtype=np.int64)
                np.add.at(lw, doc_of, gram_w)
        else:
            lw = np.zeros(len(texts), dtype=np.int64)
        return pd.DataFrame({"n_grams": counts, "lw_micro": lw})

    s = _score(F.col(text_col)).alias("__dsir__")
    out = df.select(F.col(id_col), s)
    lw_micro = out["__dsir__.lw_micro"]
    return out.select(
        id_col,
        out["__dsir__.n_grams"].alias("n_grams"),
        lw_micro.alias("lw_micro"),
        (lw_micro.cast("double") / F.lit(1e6)).alias("log_weight"),
    )


def gumbel_topk(
    df: DataFrame,
    n: int,
    rand: RandomSource,
    *,
    weight_col: Union[str, Column] = "log_weight",
    tiebreak: Union[str, Column] = "doc_id",
    key_col: str = "gumbel_key",
) -> DataFrame:
    """Sample ``n`` rows without replacement with probability
    proportional to ``exp(weight_col)`` — the Gumbel top-k trick: each
    row's key is ``weight + Gumbel(0,1)`` with the Gumbel drawn as
    ``−ln(−ln(u))`` from the row's portable uniform, and the n largest
    keys win. Working in the log domain sidesteps the overflow/underflow
    an ``exp(log_weight)`` weight column would hit under
    :func:`~gecko_spark.operators.sampling.weighted_sample_n`.

    The key is rounded to 6 decimals (engine-parity for the ``ln``
    calls, as everywhere else in the package) with ``tiebreak``
    breaking rounded-key ties, so selection is a pure function of
    (row key, seed) and a DuckDB oracle replays it exactly.

    Plan shape: ``orderBy(key desc, tiebreak).limit(n)`` —
    TakeOrderedAndProject (per-partition top-n + driver merge), NOT a
    single-partition window; scale-safe for any ``n`` that fits on the
    driver. For larger selection targets, run the two-pass threshold
    form: histogram the keys, pick the n-th-largest bucket boundary,
    then filter — the keys are deterministic, so both passes agree.
    """
    if n < 1:
        raise ValueError(f"n must be >= 1, got {n}")
    w = F.col(weight_col) if isinstance(weight_col, str) else weight_col
    tb = F.col(tiebreak) if isinstance(tiebreak, str) else tiebreak
    key = _gumbel_key(w, rand)
    return (
        df.withColumn(key_col, key)
        .orderBy(F.col(key_col).desc(), tb.asc())
        .limit(n)
    )


def _gumbel_key(w: Column, rand: RandomSource) -> Column:
    # Clamp BOTH tails to the LCG's granularity 2^-31: the zero draw
    # (same device as weighted_sample_n), and the u = 1.0 draw a
    # HashRandom source can produce (h/2^64 + 0.5 rounds to exactly 1.0
    # for longs within ~512 of 2^63), where log(-log(1.0)) = log(0)
    # would NULL the key and silently sort the row last. LCG draws are
    # k/2^31 ≤ 1 − 2^-31, so the upper clamp never alters them and the
    # DuckDB oracle replay stays bit-identical.
    u = rand.uniform(_SALT_GUMBEL)
    safe_u = F.least(
        F.greatest(u, F.lit(2.0 ** -31)), F.lit(1.0 - 2.0 ** -31)
    )
    return F.round(w.cast("double") - F.log(-F.log(safe_u)), 6)


def gumbel_select_frac(
    df: DataFrame,
    frac: float,
    rand: RandomSource,
    *,
    weight_col: Union[str, Column] = "log_weight",
    key_col: str = "gumbel_key",
    accuracy: int = 10_000,
    threshold_mode: str = "approx",
    max_driver_rows: int = 1_000_000,
) -> DataFrame:
    """The at-scale form of :func:`gumbel_topk` for selection targets
    too large for a driver merge (``n`` in the billions): keep
    approximately ``frac`` of the rows, chosen with probability
    proportional to ``exp(weight_col)``.

    ``threshold_mode="approx"`` (default): two passes over
    deterministic keys — (1) one aggregation estimates the
    ``(1 − frac)`` key quantile (``percentile_approx``, mergeable
    sketch — error ≤ 1/accuracy in RANK space, so the selected count is
    within ``±N/accuracy`` of the target); (2) a scan keeps rows whose
    key clears the threshold. No global sort, no driver-sized collect,
    no single-partition stage — both passes are embarrassingly
    parallel. The KEYS are a pure function of (row key, seed), but the
    percentile_approx sketch merges in physical-partition order, so the
    THRESHOLD — and with it boundary-row membership — is only
    reproducible for the same data AND layout; a repartitioned input
    can shift the cutoff by up to the rank error.

    ``threshold_mode="exact"``: the threshold is the exact
    ``⌈frac·N⌉``-th largest key — an ORDER STATISTIC of the key
    multiset, independent of physical layout, so membership is a pure
    function of (data, seed) and a DuckDB oracle replays it row-exactly
    (``dsir_select_frac`` contract). Computed scale-safely in three
    bounded passes, never a global sort: (1) ``percentile_approx``
    brackets the target rank in VALUE space (rank error ≤ N/accuracy
    per Greenwald–Khanna, so a ±2/accuracy quantile margin provably
    contains the target); (2) one count below the bracket; (3) the
    bracket's keys — O(N/accuracy) rows by construction — come to the
    driver once and the exact order statistic is read off. Driver
    traffic is ~4·N/accuracy key doubles; ``accuracy`` is AUTO-RAISED
    so that estimate never exceeds ``max_driver_rows`` (round 13,
    VERDICT r12 #3 — a sf0.1 call lifted unchanged to N = 10¹² now
    collects ≤ 1 M keys instead of 4×10⁸), and the call raises up
    front if even the capped sketch accuracy (10⁸) cannot bound the
    bracket under the budget. Rows EQUAL to the threshold key are all
    kept, so the selected count can exceed the target by the tie count
    (keys are 6-dp-rounded doubles; ties are rare and deterministic).
    The threshold is an order statistic — a pure function of the key
    multiset — so the auto-raise never changes WHICH rows are
    selected, only how the bracket is found.

    Rows whose ``weight_col`` is NULL get a NULL key and are NEVER
    selected, in either mode; ``frac`` is relative to the non-NULL
    rows (both the percentile sketch and the exact rank count ignore
    NULL keys — ADVICE r12).

    Exact-``n`` contracts should use :func:`gumbel_topk`.
    """
    if not (0.0 < frac < 1.0):
        raise ValueError(f"frac must be in (0, 1), got {frac}")
    if accuracy < 100:
        raise ValueError(f"accuracy must be >= 100, got {accuracy}")
    if threshold_mode not in ("approx", "exact"):
        raise ValueError(
            f"threshold_mode must be 'approx' or 'exact', got {threshold_mode!r}"
        )
    w = F.col(weight_col) if isinstance(weight_col, str) else weight_col
    keyed = df.withColumn(key_col, _gumbel_key(w, rand))
    if threshold_mode == "exact":
        thresh = _exact_rank_threshold(
            keyed, key_col, frac, accuracy, max_driver_rows
        )
    else:
        thresh = keyed.agg(
            F.percentile_approx(key_col, 1.0 - frac, accuracy).alias("t")
        ).collect()[0]["t"]
    if thresh is None:  # empty input
        return keyed.filter(F.lit(False))
    return keyed.filter(F.col(key_col) >= F.lit(float(thresh)))


# percentile_approx's GK sketch holds O(accuracy) samples per partition
# — beyond ~10^8 entries (800 MB of doubles) the sketch itself becomes
# the memory hazard the row budget was protecting against
_MAX_SKETCH_ACCURACY = 100_000_000


def _bracket_accuracy(
    n_total: int, accuracy: int, max_driver_rows: int
) -> int:
    """Effective percentile_approx accuracy so the exact-rank bracket
    (~4·N/accuracy rows) stays under ``max_driver_rows``. Pure
    function, unit-tested directly (VERDICT r12 #3) — a real 10¹²-row
    call never runs in tests. Raising accuracy tightens the bracket;
    the returned order statistic is unchanged (it is a property of the
    key multiset, not of how it was bracketed)."""
    if max_driver_rows < 1000:
        raise ValueError(
            f"max_driver_rows must be >= 1000, got {max_driver_rows}"
        )
    needed = math.ceil(4 * n_total / max_driver_rows)
    if needed > _MAX_SKETCH_ACCURACY:
        raise ValueError(
            f"exact-rank threshold over n={n_total} rows cannot bound "
            f"driver traffic under max_driver_rows={max_driver_rows} "
            f"(would need percentile accuracy {needed} > "
            f"{_MAX_SKETCH_ACCURACY}); raise max_driver_rows or use "
            "threshold_mode='approx'"
        )
    return max(accuracy, needed)


def _exact_rank_threshold(
    keyed: DataFrame,
    key_col: str,
    frac: float,
    accuracy: int,
    max_driver_rows: int = 1_000_000,
):
    """Exact ``⌈frac·N⌉``-th LARGEST value of ``key_col`` with bounded
    driver traffic: bracket the target rank via percentile_approx
    (rank error ≤ N/accuracy), count below the bracket, then collect
    only the bracket's ~4·N/accuracy rows and index into them. The
    margin doubles on a bracket miss (can't happen within the GK
    guarantee — pure belt-and-braces) before giving up.

    NULL keys (NULL weights) are excluded up front — percentile_approx,
    the below-count and the bracket collect all ignore NULLs, so
    counting them in ``n_total`` would shift the rank target (ADVICE
    r12). ``keyed`` is persisted for the duration: the helper runs 4+
    actions over the same keyed projection, and without the pin each
    one re-executes the full weight scan + key computation (ADVICE
    r12; the curation chain's own persist-boundary lesson)."""
    key = F.col(key_col)
    keyed = keyed.filter(key.isNotNull()).select(key_col)
    keyed.persist()
    try:
        n_total = keyed.count()
        if n_total == 0:
            return None
        accuracy = _bracket_accuracy(n_total, accuracy, max_driver_rows)
        n_keep = math.ceil(frac * n_total)
        target = n_total - n_keep + 1  # ascending rank of the threshold
        q = target / n_total
        margin = 2.0 / accuracy
        for _ in range(3):
            q_lo, q_hi = max(0.0, q - margin), min(1.0, q + margin)
            v_lo, v_hi = keyed.agg(
                F.percentile_approx(key_col, [q_lo, q_hi], accuracy).alias("b")
            ).collect()[0]["b"]
            if q_lo == 0.0:
                v_lo = float("-inf")
            if q_hi == 1.0:
                v_hi = float("inf")
            c_below = keyed.filter(key < F.lit(v_lo)).count()
            bracket = sorted(
                r[0]
                for r in keyed.filter(
                    (key >= F.lit(v_lo)) & (key <= F.lit(v_hi))
                ).collect()
            )
            idx = target - c_below - 1
            if 0 <= idx < len(bracket):
                return bracket[idx]
            margin *= 2.0
        raise RuntimeError(
            "exact-rank bracket failed to converge — percentile_approx "
            "returned values outside its documented rank-error bound"
        )
    finally:
        keyed.unpersist()
