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
