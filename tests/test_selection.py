"""DSIR-style importance resampling (operators/selection.py): hashed
n-gram distribution fit, integer log-weight scoring, Gumbel top-k
selection — brute-force-model parity, determinism, guards, plan shape.
"""

from __future__ import annotations

import re

import numpy as np
import pytest

from gecko_spark.core import LcgRandom
from gecko_spark.functions.portable_hash import P1, poly_hash_strings
from gecko_spark.operators.selection import (
    dsir_log_weights,
    fit_log_ratio_micro,
    gumbel_select_frac,
    gumbel_topk,
    hashed_ngram_bucket_counts,
)

B = 64  # tiny bucket space so collisions are exercised


def _brute_grams(text, ns=(1, 2)):
    toks = re.findall(r"\w+", (text or "").lower())
    out = list(toks) if 1 in ns else []
    if 2 in ns:
        out += [" ".join(toks[i:i + 2]) for i in range(len(toks) - 1)]
    return out


def _brute_counts(texts, ns=(1, 2)):
    c = np.zeros(B, dtype=np.int64)
    for t in texts:
        g = _brute_grams(t, ns)
        if g:
            idx = poly_hash_strings(g, P1) % B
            c += np.bincount(idx, minlength=B)
    return c


DOCS = [
    (0, "the cat sat on the mat"),
    (1, "quantum flux capacitors destabilize rapidly"),
    (2, "the dog sat on the log"),
    (3, None),
    (4, ""),
    (5, "cat cat cat cat"),
    (6, "Ünïcode tökens für alle"),
]


@pytest.fixture(scope="module")
def docs_df(spark):
    return spark.createDataFrame(DOCS, "doc_id long, text string").repartition(3)


def test_bucket_counts_match_brute_force(spark, docs_df):
    got = {
        r["bucket"]: r["cnt"]
        for r in hashed_ngram_bucket_counts(docs_df, n_buckets=B).collect()
    }
    want = _brute_counts([t for _, t in DOCS])
    assert got == {int(b): int(want[b]) for b in np.nonzero(want)[0]}
    # only nonzero buckets are emitted
    assert all(v > 0 for v in got.values())


def test_bucket_counts_unigram_only(spark, docs_df):
    got = {
        r["bucket"]: r["cnt"]
        for r in hashed_ngram_bucket_counts(docs_df, n_buckets=B, ns=(1,)).collect()
    }
    want = _brute_counts([t for _, t in DOCS], ns=(1,))
    assert got == {int(b): int(want[b]) for b in np.nonzero(want)[0]}


def test_fit_log_ratio_matches_formula(spark, docs_df):
    target = docs_df.filter("doc_id in (0, 2)")  # "the ... sat on the ..." style
    tc = hashed_ngram_bucket_counts(target, n_buckets=B)
    rc = hashed_ngram_bucket_counts(docs_df, n_buckets=B)
    lr = fit_log_ratio_micro(tc, rc, B, alpha=1.0)
    ct = _brute_counts([DOCS[0][1], DOCS[2][1]])
    cr = _brute_counts([t for _, t in DOCS])
    want = (
        np.log((ct + 1.0) / (ct.sum() + B))
        - np.log((cr + 1.0) / (cr.sum() + B))
    ) * 1e6
    aw = np.abs(want)
    flw = np.floor(aw)
    want = (np.sign(want) * (flw + (aw - flw >= 0.5))).astype(np.int64)
    assert lr.dtype == np.int64
    np.testing.assert_array_equal(lr, want)


def test_log_weights_exact_and_favor_target_style(spark, docs_df):
    target = docs_df.filter("doc_id in (0, 2)")
    lr = fit_log_ratio_micro(
        hashed_ngram_bucket_counts(target, n_buckets=B),
        hashed_ngram_bucket_counts(docs_df, n_buckets=B),
        B,
    )
    rows = {
        r["doc_id"]: r
        for r in dsir_log_weights(docs_df, lr, id_col="doc_id").collect()
    }
    # exact integer parity with the brute-force model
    for did, text in DOCS:
        g = _brute_grams(text)
        want = int(lr[poly_hash_strings(g, P1) % B].sum()) if g else 0
        assert rows[did]["lw_micro"] == want, did
        assert rows[did]["n_grams"] == len(g)
        assert rows[did]["log_weight"] == pytest.approx(want / 1e6)
    # target-style docs outscore the off-distribution doc (per gram)
    per_gram = lambda r: r["lw_micro"] / max(r["n_grams"], 1)
    assert per_gram(rows[0]) > per_gram(rows[1])
    assert per_gram(rows[2]) > per_gram(rows[1])
    # empty/NULL text scores zero
    assert rows[3]["lw_micro"] == 0 and rows[3]["n_grams"] == 0
    assert rows[4]["lw_micro"] == 0


def test_log_weights_partitioning_invariant(spark, docs_df):
    lr = fit_log_ratio_micro(
        hashed_ngram_bucket_counts(docs_df.limit(2), n_buckets=B),
        hashed_ngram_bucket_counts(docs_df, n_buckets=B),
        B,
    )
    a = sorted(
        dsir_log_weights(docs_df.repartition(1), lr).collect(),
        key=lambda r: r["doc_id"],
    )
    b = sorted(
        dsir_log_weights(docs_df.repartition(7), lr).collect(),
        key=lambda r: r["doc_id"],
    )
    assert [tuple(r) for r in a] == [tuple(r) for r in b]


def test_log_weights_plan_is_single_projection(spark):
    lr = np.zeros(B, dtype=np.int64)
    df = spark.createDataFrame(DOCS, "doc_id long, text string")
    plan = dsir_log_weights(df, lr)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan  # zero shuffles: scan + Arrow projection


def test_log_weight_guard_raises(spark):
    # |ratio| big enough that one megadoc would overflow int64
    lr = np.full(B, 2**52, dtype=np.int64)
    df = spark.createDataFrame(
        [(0, "x " * 2048)], "doc_id long, text string"
    )
    with pytest.raises(Exception, match="exceeds int64"):
        dsir_log_weights(df, lr).collect()


def test_validation_errors(spark, docs_df):
    with pytest.raises(ValueError, match="n_buckets"):
        hashed_ngram_bucket_counts(docs_df, n_buckets=1)
    with pytest.raises(ValueError, match="ns must be"):
        hashed_ngram_bucket_counts(docs_df, ns=())
    with pytest.raises(ValueError, match="alpha"):
        fit_log_ratio_micro(
            hashed_ngram_bucket_counts(docs_df, n_buckets=B),
            hashed_ngram_bucket_counts(docs_df, n_buckets=B),
            B,
            alpha=0.0,
        )
    with pytest.raises(ValueError, match="n must be"):
        gumbel_topk(docs_df, 0, LcgRandom("doc_id", seed=1), weight_col="doc_id")


def test_gumbel_topk_deterministic_and_sized(spark):
    n_rows = 400
    df = spark.createDataFrame(
        [(i, 3.0 if i % 4 == 0 else 0.0) for i in range(n_rows)],
        "doc_id long, log_weight double",
    ).repartition(5)
    rand = LcgRandom("doc_id", seed=42)
    a = sorted(r["doc_id"] for r in gumbel_topk(df, 50, rand).collect())
    b = sorted(r["doc_id"] for r in gumbel_topk(df, 50, rand).collect())
    assert a == b and len(a) == 50
    # exp(3) ≈ 20x preference: the 100 heavy rows should dominate the pick
    heavy = sum(1 for d in a if d % 4 == 0)
    assert heavy > 35, heavy


def test_gumbel_topk_matches_weighted_intuition_uniform(spark):
    # all-equal weights: selection is pure noise but still exactly n,
    # deterministic, and a function of the seed
    df = spark.createDataFrame(
        [(i, 1.0) for i in range(100)], "doc_id long, log_weight double"
    )
    s1 = set(r["doc_id"] for r in gumbel_topk(df, 10, LcgRandom("doc_id", 1)).collect())
    s2 = set(r["doc_id"] for r in gumbel_topk(df, 10, LcgRandom("doc_id", 2)).collect())
    assert len(s1) == len(s2) == 10
    assert s1 != s2  # different seeds pick different sets


def test_gumbel_select_frac_scale_path(spark):
    n_rows = 2000
    df = spark.createDataFrame(
        [(i, 2.0 if i % 5 == 0 else 0.0) for i in range(n_rows)],
        "doc_id long, log_weight double",
    ).repartition(4)
    rand = LcgRandom("doc_id", seed=9)
    out = gumbel_select_frac(df, 0.2, rand)
    a = sorted(r["doc_id"] for r in out.collect())
    b = sorted(r["doc_id"] for r in gumbel_select_frac(df, 0.2, rand).collect())
    assert a == b  # deterministic: same data + seed -> same rows
    # approx sizing: rank-space error <= N/accuracy plus key ties
    assert abs(len(a) - 400) <= 25, len(a)
    # exp(2) ~ 7.4x preference: heavy rows overrepresented vs 20% base
    heavy = sum(1 for d in a if d % 5 == 0)
    assert heavy / len(a) > 0.4, heavy
    # no single-partition exchange: the filter pass is scan-parallel
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "SinglePartition" not in plan


def test_gumbel_select_frac_validation_and_empty(spark):
    df = spark.createDataFrame([], "doc_id long, log_weight double")
    rand = LcgRandom("doc_id", seed=1)
    with pytest.raises(ValueError, match="frac"):
        gumbel_select_frac(df, 1.0, rand)
    with pytest.raises(ValueError, match="accuracy"):
        gumbel_select_frac(df, 0.5, rand, accuracy=10)
    assert gumbel_select_frac(df, 0.5, rand).count() == 0


def test_gumbel_select_frac_exact_matches_sequential(spark):
    from pyspark.sql import functions as F

    from gecko_spark.operators.selection import _gumbel_key

    n_rows = 1000
    df = spark.createDataFrame(
        [(i, float(i % 13)) for i in range(n_rows)],
        "doc_id long, log_weight double",
    ).repartition(4)
    rand = LcgRandom("doc_id", seed=42)
    out = gumbel_select_frac(
        df, 0.25, rand, threshold_mode="exact", accuracy=100
    )
    got = sorted(r["doc_id"] for r in out.collect())
    # sequential model: the exact ceil(frac*N)-th largest key
    keyed = df.withColumn("k", _gumbel_key(F.col("log_weight"), rand))
    keys = sorted((r["k"] for r in keyed.collect()), reverse=True)
    thr = keys[249]
    want = sorted(
        r["doc_id"] for r in keyed.filter(F.col("k") >= thr).collect()
    )
    assert got == want
    assert len(got) >= 250  # target plus any threshold ties


def test_gumbel_select_frac_exact_layout_independent(spark):
    """The ADVICE r11 point: the approx threshold depends on the
    percentile_approx merge order (physical layout); exact mode must
    not — repartitioned input selects the identical rows."""
    df = spark.createDataFrame(
        [(i, float((i * 7) % 11)) for i in range(500)],
        "doc_id long, log_weight double",
    )
    rand = LcgRandom("doc_id", seed=3)
    a = {
        r["doc_id"]
        for r in gumbel_select_frac(
            df.repartition(2), 0.3, rand, threshold_mode="exact", accuracy=100
        ).collect()
    }
    b = {
        r["doc_id"]
        for r in gumbel_select_frac(
            df.repartition(17), 0.3, rand, threshold_mode="exact", accuracy=100
        ).collect()
    }
    assert a == b


def test_gumbel_select_frac_exact_empty_and_validation(spark):
    df = spark.createDataFrame([], "doc_id long, log_weight double")
    rand = LcgRandom("doc_id", seed=1)
    assert (
        gumbel_select_frac(df, 0.5, rand, threshold_mode="exact").count() == 0
    )
    with pytest.raises(ValueError, match="threshold_mode"):
        gumbel_select_frac(df, 0.5, rand, threshold_mode="banana")


def test_gumbel_key_upper_clamp_no_null_keys(spark):
    """HashRandom's uniform can round to exactly 1.0 (ADVICE r11):
    log(-log(1.0)) would NULL the key and silently sort the row last.
    The two-sided clamp keeps every key finite for any uniform in
    [0, 1] — exercised here by scanning many HashRandom draws."""
    from pyspark.sql import functions as F

    from gecko_spark.core import HashRandom
    from gecko_spark.operators.selection import _gumbel_key

    df = spark.range(0, 20000).select(F.col("id").alias("doc_id"))
    rand = HashRandom(seed=5, key_cols=["doc_id"])
    keyed = df.withColumn(
        "k", _gumbel_key(F.lit(0.0), rand)
    )
    assert keyed.filter(F.col("k").isNull()).count() == 0
    # and the clamp itself: u = 1.0 must produce a finite key
    one = spark.createDataFrame([(1,)], "doc_id long").select(
        F.round(
            F.lit(0.0)
            - F.log(-F.log(F.least(F.greatest(F.lit(1.0), F.lit(2.0 ** -31)),
                                   F.lit(1.0 - 2.0 ** -31)))), 6
        ).alias("k")
    )
    assert one.collect()[0]["k"] is not None


def test_gumbel_topk_plan_is_take_ordered(spark):
    df = spark.createDataFrame(
        [(i, 0.0) for i in range(50)], "doc_id long, log_weight double"
    )
    out = gumbel_topk(df, 5, LcgRandom("doc_id", 7))
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "TakeOrderedAndProject" in plan  # per-partition top-n, no window


def test_bracket_accuracy_auto_scale_and_cap():
    """VERDICT r12 #3: exact-mode driver traffic (~4N/accuracy rows)
    must stay bounded regardless of N. Pure-function unit test — a
    real 10^12-row call never runs here."""
    from gecko_spark.operators.selection import (
        _MAX_SKETCH_ACCURACY,
        _bracket_accuracy,
    )

    # small N: the user's accuracy wins (bit-compatible with r12 runs)
    assert _bracket_accuracy(10_000, 10_000, 1_000_000) == 10_000
    # huge N: auto-raised so 4N/accuracy <= max_driver_rows
    acc = _bracket_accuracy(10 ** 12, 10_000, 1_000_000)
    assert acc == 4_000_000
    assert 4 * 10 ** 12 / acc <= 1_000_000
    # beyond the sketch-memory ceiling: refuse loudly, name the fix
    with pytest.raises(ValueError, match="threshold_mode='approx'"):
        _bracket_accuracy(10 ** 15, 10_000, 1_000)
    assert _bracket_accuracy(
        _MAX_SKETCH_ACCURACY // 4 * 1_000, 100, 1_000
    ) == _MAX_SKETCH_ACCURACY
    with pytest.raises(ValueError, match="max_driver_rows"):
        _bracket_accuracy(10_000, 10_000, 999)


def test_gumbel_select_frac_null_weights_excluded(spark):
    """ADVICE r12: NULL weights -> NULL keys. The exact rank target
    must count only non-NULL keys (percentile/bracket already ignore
    them), and NULL-weight rows are never selected in either mode."""
    from pyspark.sql import functions as F

    from gecko_spark.operators.selection import _gumbel_key

    rows = [(i, float(i % 7)) for i in range(400)]
    rows += [(1000 + i, None) for i in range(200)]  # NULL weights
    df = spark.createDataFrame(
        rows, "doc_id long, log_weight double"
    ).repartition(5)
    rand = LcgRandom("doc_id", seed=11)
    out = gumbel_select_frac(
        df, 0.25, rand, threshold_mode="exact", accuracy=100
    )
    got = sorted(r["doc_id"] for r in out.collect())
    assert all(d < 1000 for d in got)  # no NULL-weight row selected
    # sequential model over the NON-NULL keys only: ceil(0.25*400)=100
    keyed = df.filter(F.col("log_weight").isNotNull()).withColumn(
        "k", _gumbel_key(F.col("log_weight"), rand)
    )
    keys = sorted((r["k"] for r in keyed.collect()), reverse=True)
    thr = keys[99]
    want = sorted(
        r["doc_id"] for r in keyed.filter(F.col("k") >= thr).collect()
    )
    assert got == want
    # approx mode: same exclusion semantics (milder skew otherwise)
    approx = gumbel_select_frac(df, 0.25, rand)
    assert approx.filter(F.col("log_weight").isNull()).count() == 0
