"""Loader contract: every timestamp column arrives as plain TIMESTAMP
regardless of how the driver wrote the parquet (TIMESTAMP(NANOS) in
early rounds, timestamp[us] isAdjustedToUTC=false — i.e. Spark
TIMESTAMP_NTZ — since round 4). unix_millis() and friends reject NTZ,
so a loader that leaks it breaks every event/time query downstream.
"""

import pandas as pd
import pytest
from pyspark.sql import functions as F

from gecko_spark.sources.testdata import TABLES, load_table, load_tables

SF = "/root/testdata/sf0.001"


def test_no_ntz_leaks_from_any_table(spark):
    for name in TABLES:
        df = load_table(spark, SF, name)
        ntz = [(c, t) for c, t in df.dtypes if t == "timestamp_ntz"]
        assert not ntz, f"{name} leaks TIMESTAMP_NTZ columns: {ntz}"


def test_events_ts_supports_unix_millis(spark):
    ev = load_table(spark, SF, "events")
    row = ev.select(F.expr("unix_millis(ts)").alias("ms")).first()
    assert row["ms"] > 0


def test_events_ts_wall_clock_matches_parquet(spark):
    # The NTZ→TIMESTAMP normalization must preserve wall-clock (session
    # tz pinned UTC), i.e. agree with pandas' naive read of the file.
    ev = load_table(spark, SF, "events")
    got = (
        ev.orderBy("event_id")
        .limit(5)
        .select("event_id", F.date_format("ts", "yyyy-MM-dd HH:mm:ss").alias("s"))
        .toPandas()
    )
    raw = (
        pd.read_parquet(f"{SF}/events.parquet", columns=["event_id", "ts"])
        .sort_values("event_id")
        .head(5)
    )
    exp = raw["ts"].dt.strftime("%Y-%m-%d %H:%M:%S").tolist()
    assert got["s"].tolist() == exp


def test_load_tables_returns_all(spark):
    dfs = load_tables(spark, SF)
    assert set(dfs) == set(TABLES)
    with pytest.raises(Exception):
        load_table(spark, SF, "nope_no_such_table").collect()
