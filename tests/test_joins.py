"""asof_join / band_join — validated against pandas.merge_asof, which
implements the same semantics the operator documents (backward/forward,
allow-exact-matches, inclusive tolerance, left-join survival)."""

from __future__ import annotations

import pandas as pd
import pytest

from pyspark.sql import functions as F

from gecko_spark.operators.joins import asof_join, band_join


def _mk(spark, rows, schema):
    return spark.createDataFrame(rows, schema)


@pytest.fixture(scope="module")
def quotes(spark):
    rows = [
        ("A", 1, 100.0),
        ("A", 5, 101.0),
        ("A", 10, 102.0),
        ("B", 3, 200.0),
        ("B", 7, 201.0),
    ]
    return _mk(spark, rows, "sym string, ts long, px double")


@pytest.fixture(scope="module")
def trades(spark):
    rows = [
        ("A", 0, 10),   # before any quote -> null
        ("A", 5, 20),   # exact match allowed
        ("A", 6, 30),
        ("A", 11, 40),
        ("B", 3, 50),
        ("B", 6, 60),
        ("C", 9, 70),   # key with no quotes -> null
    ]
    return _mk(spark, rows, "sym string, ts long, qty int")


def _pandas_asof(trades_pd, quotes_pd, direction, tolerance=None):
    return pd.merge_asof(
        trades_pd.sort_values("ts"),
        quotes_pd.sort_values("ts"),
        on="ts",
        by="sym",
        direction=direction,
        tolerance=tolerance,
    ).sort_values(["sym", "ts"]).reset_index(drop=True)


@pytest.mark.parametrize("direction", ["backward", "forward"])
def test_asof_matches_pandas(spark, trades, quotes, direction):
    got = (
        asof_join(trades, quotes, on="ts", by="sym", direction=direction)
        .orderBy("sym", "ts")
        .toPandas()
    )
    want = _pandas_asof(trades.toPandas(), quotes.toPandas(), direction)
    assert list(got["qty"]) == list(want["qty"])
    assert got["px"].fillna(-1).tolist() == want["px"].fillna(-1).tolist()


def test_asof_tolerance(spark, trades, quotes):
    got = (
        asof_join(trades, quotes, on="ts", by="sym", direction="backward", tolerance=1)
        .orderBy("sym", "ts")
        .toPandas()
    )
    want = _pandas_asof(trades.toPandas(), quotes.toPandas(), "backward", tolerance=1)
    assert got["px"].fillna(-1).tolist() == want["px"].fillna(-1).tolist()


def test_asof_duplicate_right_ts_deterministic(spark, trades):
    """Duplicate (key, ts) right rows are ambiguous under as-of
    semantics; the operator's documented rule is largest-payload-wins
    for backward (smallest for forward), independent of partitioning."""
    dup = _mk(
        spark,
        [("A", 5, 101.0), ("A", 5, 101.5)],
        "sym string, ts long, px double",
    )
    back = asof_join(trades, dup, on="ts", by="sym").filter(F.col("ts") == 6)
    assert back.collect()[0]["px"] == 101.5
    fwd = asof_join(trades, dup, on="ts", by="sym", direction="forward").filter(
        F.col("ts") == 0
    )
    assert fwd.collect()[0]["px"] == 101.0


def test_asof_all_left_rows_survive(spark, trades, quotes):
    out = asof_join(trades, quotes, on="ts", by="sym")
    assert out.count() == trades.count()
    # key with no right rows yields nulls
    c_row = out.filter(F.col("sym") == "C").collect()
    assert len(c_row) == 1 and c_row[0]["px"] is None


def test_asof_name_collision_suffix(spark, trades, quotes):
    out = asof_join(trades, quotes.withColumnRenamed("px", "qty"), on="ts", by="sym")
    assert "qty_r" in out.columns and "qty" in out.columns


def test_asof_timestamp_tolerance(spark):
    lt = spark.createDataFrame(
        [(1, "2024-01-01 00:00:10")], "id long, ts string"
    ).withColumn("ts", F.to_timestamp("ts"))
    rt = spark.createDataFrame(
        [(7, "2024-01-01 00:00:03")], "val long, ts string"
    ).withColumn("ts", F.to_timestamp("ts"))
    hit = asof_join(lt, rt, on="ts", tolerance=10.0).collect()[0]
    assert hit["val"] == 7
    miss = asof_join(lt, rt, on="ts", tolerance=5.0).collect()[0]
    assert miss["val"] is None


def test_band_join(spark):
    facts = spark.range(0, 100).withColumn("v", F.col("id").cast("double"))
    bands = spark.createDataFrame(
        [("low", 0.0, 30.0), ("mid", 30.0, 60.0), ("high", 60.0, 100.0)],
        "band string, lo double, hi double",
    )
    out = band_join(facts, bands, "v").groupBy("band").count().orderBy("band")
    got = {r["band"]: r["count"] for r in out.collect()}
    assert got == {"low": 30, "mid": 30, "high": 40}
    plan = band_join(facts, bands, "v")._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastNestedLoopJoin" in plan


def test_asof_randomized_vs_pandas(spark):
    """Seeded fuzz: random key/ts tables (unique (key, ts) on the right)
    must match pandas.merge_asof in both directions and with tolerance."""
    import numpy as np

    rng = np.random.default_rng(727)
    for trial in range(5):
        n_l, n_r = int(rng.integers(5, 60)), int(rng.integers(5, 60))
        keys = ["a", "b", "c"]
        lt = pd.DataFrame(
            {
                "k": rng.choice(keys, n_l),
                "ts": rng.integers(0, 100, n_l),
                "lv": np.arange(n_l),
            }
        )
        rt = (
            pd.DataFrame(
                {
                    "k": rng.choice(keys, n_r),
                    "ts": rng.integers(0, 100, n_r),
                    "rv": rng.integers(0, 1000, n_r),
                }
            )
            .drop_duplicates(["k", "ts"])
            .reset_index(drop=True)
        )
        ldf = spark.createDataFrame(lt)
        rdf = spark.createDataFrame(rt)
        for direction in ["backward", "forward"]:
            for tol in [None, 10]:
                got = (
                    asof_join(ldf, rdf, on="ts", by="k", direction=direction, tolerance=tol)
                    .orderBy("k", "ts", "lv")
                    .toPandas()
                )
                want = pd.merge_asof(
                    lt.sort_values(["ts", "lv"], kind="stable"),
                    rt.sort_values("ts", kind="stable"),
                    on="ts",
                    by="k",
                    direction=direction,
                    tolerance=tol,
                ).sort_values(["k", "ts", "lv"], kind="stable")
                assert got["rv"].fillna(-1).tolist() == want["rv"].fillna(-1).tolist(), (
                    f"trial={trial} direction={direction} tol={tol}"
                )


def test_salted_join_vs_aqe_skew_split(spark):
    """README claims AQE's skew-join split is the first line of defense
    and salted_join covers what it can't — make both halves measured
    facts (VERDICT r5 'next' #9). On a 50%-hot sort-merge join shape
    (one key owns half a 4M-row probe side with a 64-char payload):

    1. plan: with the skew thresholds in range, AQE actually splits the
       hot partition (final adaptive plan carries SortMergeJoin(skew=true));
    2. timing: the salted plan and the AQE-split plan each beat the
       unprotected single-reducer baseline, and land within 2.5x of
       each other — AQE alone suffices when it fires; the salt is the
       deterministic fallback for the cases it can't see.
    """
    import time

    from gecko_spark.operators.skew import salted_join

    n, keys = 4_000_000, 20_000
    left = spark.range(0, n).select(
        F.when(F.col("id") % 2 == 0, F.lit(7))
        .otherwise(F.pmod(F.col("id"), F.lit(keys)))
        .alias("k"),
        F.col("id").alias("pk"),
        F.sha2(F.col("id").cast("string"), 256).alias("payload"),
    )
    right = spark.range(0, keys).select(
        F.col("id").alias("k"), (F.col("id") * 2).alias("rv")
    )

    conf = spark.conf
    keys_conf = (
        "spark.sql.autoBroadcastJoinThreshold",
        "spark.sql.adaptive.skewJoin.enabled",
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
        "spark.sql.adaptive.advisoryPartitionSizeInBytes",
        "spark.sql.adaptive.skewJoin.skewedPartitionFactor",
    )
    saved = {k: conf.get(k) for k in keys_conf}

    def run(skew_enabled, salted=False):
        conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        conf.set("spark.sql.adaptive.skewJoin.enabled", str(skew_enabled).lower())
        # the test-scale hot partition (~200 MB of payload) must clear
        # the split thresholds (default threshold is 256 MB)
        conf.set("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "8MB")
        conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "8MB")
        conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "2")
        try:
            joined = (
                salted_join(left, right, ["k"], buckets=16, salt_on=["pk"])
                if salted
                else left.join(right, "k")
            )
            # the aggregate keeps the fat payload flowing through the
            # join shuffle (a slim projection would be column-pruned
            # below the skew threshold) and makes the action a 1-row
            # collect on the SAME Dataset, so the final adaptive plan
            # (with its skew markers) is observable afterwards
            j = joined.agg(
                F.sum(F.length("payload")).alias("s"), F.sum("rv").alias("r")
            )
            jdf = j._jdf
            t0 = time.time()
            jdf.collect()
            return time.time() - t0, jdf.queryExecution().executedPlan().toString()
        finally:
            for k, v in saved.items():
                if v is None:
                    conf.unset(k)
                else:
                    conf.set(k, v)

    # warmup (codegen/JIT) once
    run(False, salted=True)

    t_plain, plan_plain = run(False)
    t_aqe, plan_aqe = run(True)
    t_salt, plan_salt = run(False, salted=True)

    assert "skew=true" in plan_aqe, "AQE did not split the hot partition"
    assert "skew=true" not in plan_plain
    # the salted plan needs no skew split: the salt spread the hot key
    assert "skew=true" not in plan_salt

    # both defenses beat the unprotected single-reducer plan
    assert t_aqe < t_plain, (t_aqe, t_plain)
    assert t_salt < t_plain, (t_salt, t_plain)
    # and are comparable to each other (generous band: session noise)
    assert t_salt < 2.5 * t_aqe and t_aqe < 2.5 * t_salt, (t_salt, t_aqe)
