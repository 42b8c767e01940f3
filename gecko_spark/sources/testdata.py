"""Loaders for the driver's TPC-H-ish parquet tables (TESTDATA.md).

One wrinkle: ``events.parquet`` stores ``ts`` as parquet
``TIMESTAMP(NANOS)``, which Spark rejects by default
(PARQUET_TYPE_ILLEGAL). The loader flips
``spark.sql.legacy.parquet.nanosAsLong`` so the column arrives as an
int64 nanosecond count, then converts it to a proper ``timestamp``
column JVM-side (``timestamp_micros(ns div 1000)``) — no Python in the
path, pushdown on every other column unaffected.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

__all__ = ["TABLES", "load_table", "load_tables", "events_schema_hint"]

TABLES = [
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
]

_NANOS_CONF = "spark.sql.legacy.parquet.nanosAsLong"


def _read_events(spark: SparkSession, path: str) -> DataFrame:
    prev = spark.conf.get(_NANOS_CONF, "false")
    spark.conf.set(_NANOS_CONF, "true")
    try:
        df = spark.read.parquet(path)
        # Force analysis so the schema is resolved while the conf is set.
        cols = df.columns
    finally:
        spark.conf.set(_NANOS_CONF, prev)
    if dict(df.dtypes).get("ts") == "bigint":
        # integer DIV — double division loses microsecond precision on
        # ~1.7e18 nanosecond epoch values (53-bit mantissa)
        df = df.withColumn("ts", F.timestamp_micros(F.expr("ts DIV 1000")))
    return df.select(*cols)


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Load one testdata table as a DataFrame (lazy scan).

    Pins the session timezone to UTC: the correctness oracle (DuckDB)
    compares timestamps naively, so timestamp literals and date_format
    output must not depend on whoever built the SparkSession."""
    if spark.conf.get("spark.sql.session.timeZone") != "UTC":
        spark.conf.set("spark.sql.session.timeZone", "UTC")
    path = os.path.join(sf_dir, f"{name}.parquet")
    if name == "events":
        return _read_events(spark, path)
    return spark.read.parquet(path)


def load_tables(
    spark: SparkSession, sf_dir: str, names: list[str] | None = None
) -> dict[str, DataFrame]:
    return {n: load_table(spark, sf_dir, n) for n in names or TABLES}
