"""KMV distinct-count sketch: accuracy, exact-mode, mergeability,
partition independence."""

from __future__ import annotations

from pyspark.sql import functions as F

import pytest

from gecko_spark.operators.sketches import (
    kmv_distinct_estimate,
    kmv_merge_estimate,
    kmv_overlap_estimate,
    kmv_sketch,
)


def _ids(spark, lo, hi, dupes=3):
    return (
        spark.range(lo, hi)
        .withColumn("v", F.concat(F.lit("user_"), (F.col("id") % ((hi - lo) // dupes)) + lo))
        .select("v")
    )


def test_kmv_estimate_within_tolerance(spark):
    n_distinct = 20_000
    df = spark.range(0, 60_000).select(
        F.concat(F.lit("u"), (F.col("id") % n_distinct)).alias("v")
    )
    row = kmv_distinct_estimate(df, "v", k=1024).first()
    # KMV relative error ~ 1/sqrt(k-1) ≈ 3.1%; allow 3 sigma
    assert abs(row["estimate"] - n_distinct) / n_distinct < 0.1
    assert row["n_seen"] == 1024


def test_kmv_exact_below_k(spark):
    df = spark.range(0, 500).select(F.concat(F.lit("x"), "id").alias("v"))
    row = kmv_distinct_estimate(df, "v", k=1024).first()
    assert row["n_seen"] == 500
    assert row["estimate"] == 500.0


def test_kmv_partitioning_independent(spark):
    df = spark.range(0, 30_000).select(F.concat(F.lit("p"), F.col("id") % 7_000).alias("v"))
    a = kmv_distinct_estimate(df.repartition(2), "v", k=256).first()
    b = kmv_distinct_estimate(df.repartition(17), "v", k=256).first()
    assert a["estimate"] == b["estimate"]


def test_kmv_merge_equals_union_sketch(spark):
    k = 256
    left = spark.range(0, 10_000).select(F.concat(F.lit("m"), "id").alias("v"))
    right = spark.range(5_000, 15_000).select(F.concat(F.lit("m"), "id").alias("v"))
    merged = kmv_merge_estimate(
        kmv_sketch(left, "v", k), kmv_sketch(right, "v", k), k
    ).first()
    direct = kmv_distinct_estimate(left.unionByName(right), "v", k).first()
    assert merged["estimate"] == direct["estimate"]
    # true union distinct = 15_000
    assert abs(merged["estimate"] - 15_000) / 15_000 < 0.25


def test_kmv_overlap_estimates_jaccard_and_intersection(spark):
    # |A| = 10k, |B| = 10k, |A∩B| = 5k -> union 15k, Jaccard 1/3
    k = 1024
    left = spark.range(0, 10_000).select(F.concat(F.lit("m"), "id").alias("v"))
    right = spark.range(5_000, 15_000).select(F.concat(F.lit("m"), "id").alias("v"))
    row = kmv_overlap_estimate(
        kmv_sketch(left, "v", k), kmv_sketch(right, "v", k), k
    ).first()
    assert row["n_seen"] == k
    # sigma(jaccard) ~ sqrt(J(1-J)/k) ≈ 0.015; allow ~4 sigma
    assert abs(row["jaccard"] - 1 / 3) < 0.06, row["jaccard"]
    assert abs(row["union_est"] - 15_000) / 15_000 < 0.15
    assert abs(row["intersect_est"] - 5_000) / 5_000 < 0.25
    # identity is invariant: intersect_est == jaccard * union_est exactly
    assert row["intersect_est"] == row["jaccard"] * row["union_est"]
    # per-side estimates and containment (|A∩B|/|A| = 0.5 truth)
    assert abs(row["est_a"] - 10_000) / 10_000 < 0.15
    assert abs(row["est_b"] - 10_000) / 10_000 < 0.15
    assert abs(row["containment_a"] - 0.5) < 0.15, row["containment_a"]
    assert row["containment_a"] == row["intersect_est"] / row["est_a"]


def test_kmv_overlap_disjoint_and_identical(spark):
    k = 256
    a = spark.range(0, 3_000).select(F.concat(F.lit("a"), "id").alias("v"))
    b = spark.range(0, 3_000).select(F.concat(F.lit("b"), "id").alias("v"))
    row = kmv_overlap_estimate(kmv_sketch(a, "v", k), kmv_sketch(b, "v", k), k).first()
    assert row["n_common"] == 0 and row["jaccard"] == 0.0
    assert row["intersect_est"] == 0.0
    same = kmv_overlap_estimate(kmv_sketch(a, "v", k), kmv_sketch(a, "v", k), k).first()
    assert same["jaccard"] == 1.0
    # below-k regime is EXACT: 3000 distinct but only k merged hashes
    assert same["n_seen"] == k
    with pytest.raises(ValueError, match="k must be"):
        kmv_overlap_estimate(kmv_sketch(a, "v", k), kmv_sketch(a, "v", k), 1)


def test_kmv_overlap_oversized_sketch_consistent(spark):
    """ADVICE r11: an oversized caller sketch used to feed UNtruncated
    hash sets into merged/in_both while side estimates truncated —
    internally inconsistent. Both inputs now truncate to their k
    smallest once up front, so a 4k-row sketch at k must give the
    identical row a well-formed k-row sketch gives."""
    k = 256
    a = spark.range(0, 3_000).select(F.concat(F.lit("o"), "id").alias("v"))
    b = spark.range(1_500, 4_500).select(F.concat(F.lit("o"), "id").alias("v"))
    well = kmv_overlap_estimate(
        kmv_sketch(a, "v", k), kmv_sketch(b, "v", k), k
    ).first()
    over = kmv_overlap_estimate(
        kmv_sketch(a, "v", 4 * k), kmv_sketch(b, "v", 4 * k), k
    ).first()
    assert well.asDict() == over.asDict()
    # and the internal identities hold on the defensive path too
    assert over["intersect_est"] == over["jaccard"] * over["union_est"]


def test_kmv_overlap_exact_below_k(spark):
    k = 1024
    a = spark.range(0, 300).select(F.concat(F.lit("e"), "id").alias("v"))
    b = spark.range(150, 450).select(F.concat(F.lit("e"), "id").alias("v"))
    row = kmv_overlap_estimate(kmv_sketch(a, "v", k), kmv_sketch(b, "v", k), k).first()
    # union 450 < k: everything is exact
    assert row["n_seen"] == 450 and row["union_est"] == 450.0
    assert row["n_common"] == 150
    assert row["intersect_est"] == pytest.approx(150.0)
    assert row["est_a"] == 300.0 and row["est_b"] == 300.0
    assert row["containment_a"] == pytest.approx(0.5)
    assert row["containment_b"] == pytest.approx(0.5)


# -- count-min sketch --------------------------------------------------------


def test_cm_sketch_bounds_and_estimates(spark):
    from gecko_spark.operators.sketches import cm_estimate, cm_sketch

    df = spark.createDataFrame(
        [(v,) for v in ["a"] * 100 + ["b"] * 40 + ["c"] * 7], "v string"
    )
    sk = cm_sketch(df, "v", depth=4, width=256)
    pdf = sk.toPandas()
    assert len(pdf) <= 4 * 256
    # every hash row's counters sum to the row count
    assert (pdf.groupby("row")["cnt"].sum() == 147).all()
    est = {
        r["value"]: r["estimate"]
        for r in cm_estimate(sk, ["a", "b", "c", "zzz"], depth=4, width=256).collect()
    }
    # CM never undercounts; with 3 values in 256 buckets there are no
    # collisions, so estimates are exact and the absent value reads 0
    assert est == {"a": 100, "b": 40, "c": 7, "zzz": 0}


def test_cm_merge_equals_union_sketch(spark):
    from gecko_spark.operators.sketches import cm_merge, cm_sketch

    a = spark.createDataFrame([(v,) for v in ["x"] * 10 + ["y"] * 3], "v string")
    b = spark.createDataFrame([(v,) for v in ["x"] * 5 + ["z"] * 8], "v string")
    merged = cm_merge(
        cm_sketch(a, "v", depth=3, width=64), cm_sketch(b, "v", depth=3, width=64)
    )
    direct = cm_sketch(a.unionByName(b), "v", depth=3, width=64)
    m = merged.orderBy("row", "bucket").toPandas()
    d = direct.orderBy("row", "bucket").toPandas()
    assert m.astype("int64").equals(d.astype("int64"))


def test_kmv_group_estimate_accuracy_and_exact_small_groups(spark):
    from gecko_spark.operators.sketches import kmv_group_estimate

    rows = [("big", f"v{i}") for i in range(5000)] + [
        ("small", f"s{i}") for i in range(40)
    ]
    df = spark.createDataFrame(rows, "g string, v string")
    est = {r["g"]: r for r in kmv_group_estimate(df, "g", "v", k=256).collect()}
    # small group under k: the sketch IS the distinct set -> exact
    assert est["small"]["n_seen"] == 40 and est["small"]["estimate"] == 40.0
    # big group: k-truncated estimate within ~15% at k=256
    assert est["big"]["n_seen"] == 256
    assert abs(est["big"]["estimate"] - 5000) / 5000 < 0.15


# -- bottom-k quantile sketch ------------------------------------------------


def _val_frame(spark, n, seed=5):
    # deterministic pseudo-random doubles keyed on id
    return spark.range(n).select(
        F.col("id").cast("string").alias("rid"),
        ((F.xxhash64(F.col("id"), F.lit(seed)) % 100000) / 100.0).alias("v"),
    )


def test_quantile_exact_when_input_fits(spark):
    from gecko_spark.operators.sketches import quantile_estimate, quantile_sketch

    df = _val_frame(spark, 100)
    vals = sorted(r["v"] for r in df.collect())
    sk = quantile_sketch(df, "v", "rid", k=256)
    got = {r["q"]: (r["n_sample"], r["estimate"]) for r in quantile_estimate(
        sk, [0.1, 0.5, 0.9]
    ).collect()}
    import math

    for q, (m, est) in got.items():
        assert m == 100
        assert est == vals[max(1, math.ceil(q * 100)) - 1]  # type-1 rank quantile


def test_quantile_sampling_accuracy_rank_space(spark):
    from gecko_spark.operators.sketches import quantile_estimate, quantile_sketch

    df = _val_frame(spark, 20000)
    sk = quantile_sketch(df, "v", "rid", k=512)
    got = {r["q"]: r["estimate"] for r in quantile_estimate(sk, [0.25, 0.5, 0.9]).collect()}
    vals = sorted(r["v"] for r in df.collect())
    import bisect

    for q, est in got.items():
        # the estimate's TRUE rank must sit within ~3/sqrt(k) of q
        true_rank = bisect.bisect_right(vals, est) / len(vals)
        assert abs(true_rank - q) < 0.14, (q, est, true_rank)


def test_quantile_merge_equals_whole_sketch(spark):
    from gecko_spark.operators.sketches import quantile_merge, quantile_sketch

    df = _val_frame(spark, 5000)
    a = df.filter(F.col("rid").cast("long") % 2 == 0)
    b = df.filter(F.col("rid").cast("long") % 2 == 1)
    k = 128
    whole = [(r["h"], r["v"]) for r in quantile_sketch(df, "v", "rid", k).collect()]
    merged = [
        (r["h"], r["v"])
        for r in quantile_merge(
            quantile_sketch(a, "v", "rid", k), quantile_sketch(b, "v", "rid", k), k
        ).collect()
    ]
    assert merged == whole


def test_quantile_group_estimate_exact_small_groups(spark):
    from gecko_spark.operators.sketches import quantile_group_estimate

    df = _val_frame(spark, 300).withColumn(
        "grp", (F.col("rid").cast("long") % 3).cast("string")
    )
    got = quantile_group_estimate(df, "grp", "v", "rid", [0.5], k=256).collect()
    import math

    by_grp = {}
    for r in df.collect():
        by_grp.setdefault(str(int(r["rid"]) % 3), []).append(r["v"])
    assert len(got) == 3
    for r in got:
        vals = sorted(by_grp[r["grp"]])
        assert r["n_sample"] == len(vals)
        assert r["estimate"] == vals[max(1, math.ceil(0.5 * len(vals))) - 1]


def test_heavy_hitters_exact_vs_naive(spark):
    # Zipf-ish: value v appears v times, v = 1..60 → n = 1830
    rows = [(str(v),) for v in range(1, 61) for _ in range(v)]
    df = spark.createDataFrame(rows, "x string").repartition(7)
    from gecko_spark.operators.sketches import heavy_hitters

    # φ = 1/50 → threshold 36.6 → exactly values 37..60
    got = {
        (r["value"], r["cnt"])
        for r in heavy_hitters(df, "x", 1, 50).collect()
    }
    want = {(str(v), v) for v in range(37, 61)}
    assert got == want


def test_heavy_hitters_partition_independent(spark):
    rows = [(str(v % 97),) for v in range(5000)] + [("hot",)] * 800
    df = spark.createDataFrame(rows, "x string")
    from gecko_spark.operators.sketches import heavy_hitters

    naive = {
        (r["x"], r["cnt"])
        for r in df.groupBy("x")
        .agg(F.count("*").alias("cnt"))
        .where(F.col("cnt") * 20 > 1 * df.count())
        .collect()
    }
    for parts in (1, 3, 16):
        got = {
            (r["value"], r["cnt"])
            for r in heavy_hitters(df.repartition(parts), "x", 1, 20).collect()
        }
        assert got == naive, parts


def test_heavy_hitter_candidates_superset_and_bounded(spark):
    rows = [(str(v),) for v in range(1, 41) for _ in range(v)]
    df = spark.createDataFrame(rows, "x string").repartition(5)
    from gecko_spark.operators.sketches import heavy_hitter_candidates

    cap = 10
    # exact_factor=1 pins the strict capacity-counter bound (40 distinct
    # values > capacity 10 forces MG truncation in every partition)
    cands = heavy_hitter_candidates(df, "x", cap, exact_factor=1).collect()
    vals = {r["value"] for r in cands if r["value"] is not None}
    n = sum(r["cnt"] for r in cands if r["value"] is None)
    assert n == 820  # exact total from the sentinel rows
    # ≤ capacity counters per partition
    assert len(vals) <= 5 * cap
    # truncation happened, so sentinels must say so
    assert all(r["exact"] is False for r in cands if r["value"] is None)
    # guarantee: every value with count > n/(cap+1) is a candidate
    must = {str(v) for v in range(1, 41) if v > n / (cap + 1)}
    assert must <= vals


def test_heavy_hitter_candidates_exact_mode(spark):
    # 40 distinct values fit within exact_cap = 8·10 = 80: every
    # partition keeps exact counts, sentinels flag exact=True, and
    # summing the summaries reproduces the exact global counts
    rows = [(str(v),) for v in range(1, 41) for _ in range(v)]
    df = spark.createDataFrame(rows, "x string").repartition(5)
    from gecko_spark.operators.sketches import heavy_hitter_candidates

    cands = heavy_hitter_candidates(df, "x", 10, exact_factor=8).collect()
    assert all(r["exact"] is True for r in cands if r["value"] is None)
    agg: dict = {}
    for r in cands:
        if r["value"] is not None:
            agg[r["value"]] = agg.get(r["value"], 0) + r["cnt"]
    assert agg == {str(v): v for v in range(1, 41)}


def test_heavy_hitters_exact_path_matches_recount_path(spark):
    # same corpus, both paths (one-scan exact vs MG+recount) must give
    # the identical naive GROUP BY + HAVING answer
    rows = [(str(v % 37),) for v in range(4000)] + [("hot",)] * 700
    df = spark.createDataFrame(rows, "x string").repartition(6)
    from gecko_spark.operators.sketches import heavy_hitters

    naive = {
        (r["x"], r["cnt"])
        for r in df.groupBy("x")
        .agg(F.count("*").alias("cnt"))
        .where(F.col("cnt") * 15 > 4700)
        .collect()
    }
    via_exact = {
        (r["value"], r["cnt"])
        for r in heavy_hitters(df, "x", 1, 15, exact_factor=8).collect()
    }
    via_recount = {
        (r["value"], r["cnt"])
        for r in heavy_hitters(df, "x", 1, 15, exact_factor=1).collect()
    }
    assert via_exact == naive
    assert via_recount == naive


def test_heavy_hitters_validates_phi(spark):
    import pytest as _pytest
    from gecko_spark.operators.sketches import heavy_hitters

    df = spark.createDataFrame([("a",)], "x string")
    with _pytest.raises(ValueError):
        heavy_hitters(df, "x", 1, 1)
    with _pytest.raises(ValueError):
        heavy_hitters(df, "x", 0, 5)


def test_top_k_by_count_exact_and_certified(spark):
    rows = [(str(v),) for v in range(1, 61) for _ in range(v)]
    df = spark.createDataFrame(rows, "x string").repartition(7)
    from gecko_spark.operators.sketches import top_k_by_count

    got = top_k_by_count(df, "x", 5, capacity=40).collect()
    # exact: values 60..56, rank by cnt desc
    assert [(r["value"], r["cnt"], r["rank"]) for r in got] == [
        (str(v), v, i + 1) for i, v in enumerate(range(60, 55, -1))
    ]


def test_top_k_by_count_tie_break_is_total_order(spark):
    rows = [("b",)] * 3 + [("a",)] * 3 + [("c",)] * 2
    df = spark.createDataFrame(rows, "x string")
    from gecko_spark.operators.sketches import top_k_by_count

    got = [(r["value"], r["rank"]) for r in top_k_by_count(df, "x", 2).collect()]
    assert got == [("a", 1), ("b", 2)]  # tie at 3 broken by value asc


def test_top_k_by_count_uncertifiable_raises(spark):
    # near-uniform: 200 values × 5 occurrences; capacity 8 cannot
    # certify a top-3 (3rd count 5 ≤ 1000/9)
    rows = [(str(v),) for v in range(200) for _ in range(5)]
    df = spark.createDataFrame(rows, "x string").repartition(6)
    from gecko_spark.operators.sketches import top_k_by_count

    import pytest as _pytest

    with _pytest.raises(ValueError, match="capacity"):
        top_k_by_count(df, "x", 3, capacity=8)
    # but a capacity covering the whole support is exact (complete
    # recount certificate), even though counts are uniform
    got = top_k_by_count(df, "x", 3, capacity=200).collect()
    assert [(r["value"], r["cnt"]) for r in got] == [("0", 5), ("1", 5), ("10", 5)]


# ---------------------------------------------------------------------------
# HyperLogLog
# ---------------------------------------------------------------------------


def test_mix64_pinned_values():
    """splitmix64 finalizer stability pin — these exact values are also
    asserted by the DuckDB oracle replay (sql_mix64_ctes), so a change
    here breaks every HLL oracle."""
    import numpy as np

    from gecko_spark.functions.portable_hash import mix64

    got = mix64(np.array([0, 12345, 2147483646, 4611686018427387903]))
    assert got.tolist() == [
        0,
        17540659726606785873,
        14064607685697484962,
        12480624099278909278,
    ]


def test_hll_estimate_within_tolerance(spark):
    from gecko_spark.operators.sketches import hll_estimate

    df = _ids(spark, 0, 30000, dupes=3)  # 10k distinct
    row = hll_estimate(df, "v", m=256).collect()[0]
    # sigma ~= 1.04/sqrt(256) = 6.5%; allow 3 sigma
    assert abs(row["estimate"] / 10000 - 1) < 0.2
    assert abs(row["estimate_raw"] / 10000 - 1) < 0.2
    assert 0 <= row["n_zero"] < 256 and row["s_int"] > 0


def test_hll_structured_keys_unbiased(spark):
    """Consecutive numeric strings — the lattice-structured input that
    biased the unmixed affine hash by -67% — stay within 3 sigma."""
    from gecko_spark.operators.sketches import hll_estimate

    df = spark.range(7919).select(F.col("id").cast("string").alias("v"))
    row = hll_estimate(df, "v", m=256).collect()[0]
    assert abs(row["estimate"] / 7919 - 1) < 0.2


def test_hll_merge_equals_whole(spark):
    from gecko_spark.operators.sketches import (
        hll_estimate,
        hll_merge_estimate,
        hll_registers,
    )

    df = _ids(spark, 0, 12000, dupes=2)
    a = df.limit(8000)
    b = df.subtract(a.limit(2000))  # overlapping halves
    whole = hll_estimate(a.unionByName(b), "v", m=64).collect()[0]
    merged = hll_merge_estimate(
        hll_registers(a, "v", m=64), hll_registers(b, "v", m=64), m=64
    ).collect()[0]
    assert whole == merged  # mergeability is EXACT, not approximate


def test_hll_partitioning_independent(spark):
    from gecko_spark.operators.sketches import hll_estimate

    df = _ids(spark, 0, 9000, dupes=3)
    one = hll_estimate(df.repartition(1), "v", m=128).collect()[0]
    many = hll_estimate(df.repartition(13), "v", m=128).collect()[0]
    assert one == many


def test_hll_nulls_hash_like_empty_string(spark):
    from gecko_spark.operators.sketches import hll_registers

    withnull = spark.createDataFrame([("a",), (None,), ("b",)], "v string")
    withempty = spark.createDataFrame([("a",), ("",), ("b",)], "v string")
    rn = sorted(map(tuple, hll_registers(withnull, "v", m=64).collect()))
    re_ = sorted(map(tuple, hll_registers(withempty, "v", m=64).collect()))
    assert rn == re_


def test_hll_empty_input(spark):
    from gecko_spark.operators.sketches import hll_estimate

    df = spark.createDataFrame([], "v string")
    row = hll_estimate(df, "v", m=64).collect()[0]
    assert row["n_zero"] == 64 and row["s_int"] == 0
    assert row["estimate_raw"] == 0.0 and row["estimate"] == 0.0


def test_hll_group_matches_per_group_single(spark):
    from gecko_spark.operators.sketches import hll_estimate, hll_group_estimate

    df = spark.range(6000).select(
        (F.col("id") % 3).cast("string").alias("g"),
        (F.col("id") % 700).cast("string").alias("v"),
    )
    grouped = {
        r["g"]: (r["n_zero"], r["s_int"], r["estimate_raw"])
        for r in hll_group_estimate(df, "g", "v", m=64).collect()
    }
    assert set(grouped) == {"0", "1", "2"}
    for g in ("0", "1", "2"):
        single = hll_estimate(df.filter(F.col("g") == g), "v", m=64).collect()[0]
        assert grouped[g] == (
            single["n_zero"],
            single["s_int"],
            single["estimate_raw"],
        )


def test_hll_validates_m():
    import pytest

    from gecko_spark.operators.sketches import _hll_geometry

    for bad in (0, 8, 100, 131072):
        with pytest.raises(ValueError):
            _hll_geometry(bad)


def test_hll_group_multi_key(spark):
    from gecko_spark.operators.sketches import hll_estimate, hll_group_estimate

    df = spark.range(4000).select(
        (F.col("id") % 2).cast("string").alias("g1"),
        (F.col("id") % 3).alias("g2"),
        (F.col("id") % 250).cast("string").alias("v"),
    )
    out = hll_group_estimate(df, ["g1", "g2"], "v", m=64)
    rows = {(r["g1"], r["g2"]): r for r in out.collect()}
    assert len(rows) == 6
    for (g1, g2), r in rows.items():
        single = hll_estimate(
            df.filter((F.col("g1") == g1) & (F.col("g2") == g2)), "v", m=64
        ).collect()[0]
        assert (r["n_zero"], r["s_int"], r["estimate_raw"]) == (
            single["n_zero"],
            single["s_int"],
            single["estimate_raw"],
        )
