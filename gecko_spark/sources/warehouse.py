"""Bucketed warehouse helpers: pre-shuffle once at write time so every
later join/aggregation on the bucket keys runs shuffle-free.

At 100 TB the dominant cost of a repeated equi-join is re-shuffling the
fact table every query. Bucketing pays that shuffle ONCE at write time:
``bucketBy(n, keys)`` hash-partitions files on disk, the catalog
records the layout, and Spark plans joins between same-bucketed tables
(and aggregations on the bucket keys) with no Exchange at all —
verified by plan assertion in tests/test_warehouse.py.
"""

from __future__ import annotations

from typing import Optional, Sequence

from pyspark.sql import DataFrame, SparkSession

__all__ = ["write_bucketed", "read_table"]


def write_bucketed(
    df: DataFrame,
    table: str,
    keys: Sequence[str],
    buckets: int,
    sort_by: Optional[Sequence[str]] = None,
    path: Optional[str] = None,
    fmt: str = "parquet",
) -> None:
    """Persist ``df`` as a bucketed catalog table.

    ``sort_by`` additionally sorts within buckets (lets sort-merge
    joins skip their sort too). ``path`` makes it an external table —
    pass one in tests to keep the warehouse out of the repo. Bucket
    count is a real tuning knob: aim for bucket files in the
    100 MB–1 GB range at production scale; too many buckets → small
    files, too few → giant per-task inputs."""
    if isinstance(keys, str):
        keys = [keys]
    w = df.write.mode("overwrite").format(fmt).bucketBy(int(buckets), *keys)
    if sort_by:
        w = w.sortBy(*list(sort_by))
    if path is not None:
        w = w.option("path", path)
    w.saveAsTable(table)


def read_table(spark: SparkSession, table: str) -> DataFrame:
    """Catalog read — bucketing metadata rides along, which is what
    lets Catalyst elide the Exchange."""
    return spark.table(table)
