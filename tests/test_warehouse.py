"""Bucketed tables: the write-time shuffle eliminates join/agg
exchanges — asserted against the executed plan."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from gecko_spark.sources.testdata import load_table
from gecko_spark.sources.warehouse import read_table, write_bucketed

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def bucketed(spark, tmp_path_factory):
    base = tmp_path_factory.mktemp("warehouse")
    orders = load_table(spark, SF, "orders")
    lineitem = load_table(spark, SF, "lineitem").withColumnRenamed(
        "l_orderkey", "o_orderkey"
    )
    write_bucketed(orders, "b_orders", ["o_orderkey"], 8, path=str(base / "o"))
    write_bucketed(lineitem, "b_lineitem", ["o_orderkey"], 8, path=str(base / "l"))
    yield
    spark.sql("DROP TABLE IF EXISTS b_orders")
    spark.sql("DROP TABLE IF EXISTS b_lineitem")


def test_bucketed_join_has_no_exchange(spark, bucketed):
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined = read_table(spark, "b_orders").join(
            read_table(spark, "b_lineitem"), "o_orderkey"
        )
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan, "same-bucketed join must not shuffle"
        # sanity: it actually joins
        assert joined.count() > 0
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)


def test_bucketed_agg_has_no_exchange(spark, bucketed):
    agg = (
        read_table(spark, "b_lineitem")
        .groupBy("o_orderkey")
        .agg(F.count("*").alias("n"))
    )
    plan = agg._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan, "aggregation on the bucket key must not shuffle"
    assert agg.count() > 0
