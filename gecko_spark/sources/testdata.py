"""Loaders for the driver's TPC-H-ish parquet tables (TESTDATA.md).

Two wrinkles, both around parquet timestamp physical types (the driver
has shipped both shapes across rounds, so the loader handles either):

- ``TIMESTAMP(NANOS)``: Spark rejects it by default
  (PARQUET_TYPE_ILLEGAL). The loader flips
  ``spark.sql.legacy.parquet.nanosAsLong`` so the column arrives as an
  int64 nanosecond count, then converts it to a proper ``timestamp``
  column JVM-side (``timestamp_micros(ns div 1000)``).
- ``timestamp[us]`` with ``isAdjustedToUTC=false``: Spark 3.4+ infers
  ``TIMESTAMP_NTZ`` (``spark.sql.parquet.inferTimestampNTZ.enabled``
  defaults to true), which breaks ``unix_millis``/``to_utc_timestamp``
  consumers. The loader disables that inference so scans produce plain
  ``TIMESTAMP`` (session tz pinned to UTC ⇒ identical wall-clock to the
  DuckDB oracle's naive timestamps) — keeping the column a native
  TIMESTAMP at the scan means date/ts predicate pushdown stays intact,
  rather than hiding behind an NTZ→LTZ cast.

No Python in either path; pushdown on every other column unaffected.
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
_NTZ_CONF = "spark.sql.parquet.inferTimestampNTZ.enabled"


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


def _normalize_ntz(df: DataFrame) -> DataFrame:
    # Defensive backstop for builds where the NTZ-inference conf does not
    # exist: session tz is pinned UTC, so the cast preserves wall-clock.
    ntz = [c for c, t in df.dtypes if t == "timestamp_ntz"]
    if not ntz:
        return df
    return df.select(
        *[
            F.col(c).cast("timestamp").alias(c) if c in ntz else F.col(c)
            for c in df.columns
        ]
    )


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Load one testdata table as a DataFrame (lazy scan).

    Pins the session timezone to UTC: the correctness oracle (DuckDB)
    compares timestamps naively, so timestamp literals and date_format
    output must not depend on whoever built the SparkSession."""
    if spark.conf.get("spark.sql.session.timeZone") != "UTC":
        spark.conf.set("spark.sql.session.timeZone", "UTC")
    try:
        if spark.conf.get(_NTZ_CONF, "true") != "false":
            spark.conf.set(_NTZ_CONF, "false")
    except Exception:
        pass  # conf absent on this build — _normalize_ntz covers it
    path = os.path.join(sf_dir, f"{name}.parquet")
    if name == "events":
        return _normalize_ntz(_read_events(spark, path))
    return _normalize_ntz(spark.read.parquet(path))


def load_tables(
    spark: SparkSession, sf_dir: str, names: list[str] | None = None
) -> dict[str, DataFrame]:
    return {n: load_table(spark, sf_dir, n) for n in names or TABLES}
