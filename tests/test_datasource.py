"""GeckoDataSource: generation as a registered Spark data source.

Parity contract: for uniform/freq/datetime/index columns the source
must reproduce to_data_frame's values bit-for-bit (same LCG over the
absolute row index); output must be independent of numPartitions; and
the source must be usable from SQL."""

from __future__ import annotations

import json

import pytest
from pyspark.sql import functions as F

from gecko_spark.core import LcgRandom
from gecko_spark.operators import generators as G
from gecko_spark.plans.pipeline import to_data_frame
from gecko_spark.sources.datasource import GeckoDataSource

N = 20_000
SEED = 77

SPEC = [
    {"name": "u", "type": "uniform", "low": 10.0, "high": 20.0, "precision": 4},
    {
        "name": "fruit",
        "type": "freq",
        "values": ["apple", "banana", "orange"],
        "weights": [100, 50, 80],
    },
    {
        "name": "d",
        "type": "datetime",
        "start": "2020-01-01",
        "end": "2023-12-31",
        "format": "%Y-%m-%d",
        "unit": "d",
    },
]


@pytest.fixture(scope="module", autouse=True)
def _register(spark):
    spark.dataSource.register(GeckoDataSource)


def _read(spark, n_parts):
    return (
        spark.read.format("gecko")
        .option("rows", N)
        .option("seed", SEED)
        .option("numPartitions", n_parts)
        .option("spec", json.dumps(SPEC))
        .load()
    )


def test_source_matches_to_data_frame(spark, fruit_freq):
    src = _read(spark, 8).orderBy("__idx__").toPandas()

    ref = to_data_frame(
        spark,
        [
            ("u", G.from_uniform_distribution(10.0, 20.0, precision=4)),
            ("fruit", G.from_frequency_table(fruit_freq, "fruit", "count")),
            ("d", G.from_datetime_range("2020-01-01", "2023-12-31", "%Y-%m-%d", "d")),
        ],
        N,
        keep_index=True,
        rand_for=lambda i: LcgRandom("__idx__", SEED + i),
    ).orderBy("__idx__").toPandas()

    for c in ["u", "fruit", "d"]:
        assert src[c].tolist() == ref[c].tolist(), c


def test_source_partitioning_independent(spark):
    a = _read(spark, 3).orderBy("__idx__").toPandas()
    b = _read(spark, 16).orderBy("__idx__").toPandas()
    assert a.equals(b)
    assert len(a) == N


def test_source_usable_from_sql(spark):
    _read(spark, 4).createOrReplaceTempView("gecko_gen")
    row = spark.sql(
        "SELECT fruit, count(*) AS n FROM gecko_gen GROUP BY fruit ORDER BY fruit"
    ).collect()
    got = {r["fruit"]: r["n"] for r in row}
    assert set(got) == {"apple", "banana", "orange"}
    # 100/230, 50/230, 80/230 within 2%
    assert abs(got["apple"] / N - 100 / 230) < 0.02


def test_source_pushes_idx_range(spark):
    """__idx__ comparison filters shrink the generated interval: the
    pruned read returns exactly the filtered rows, and its values equal
    the unpruned read's (draws are keyed on absolute index, so pruning
    cannot shift them)."""
    full = (
        spark.read.format("gecko")
        .option("rows", N)
        .option("seed", SEED)
        .option("numPartitions", 8)
        .option("filterPushdown", "true")
        .option("spec", json.dumps(SPEC))
        .load()
        .filter("__idx__ >= 500 AND __idx__ < 600")
        .orderBy("__idx__")
        .toPandas()
    )
    assert len(full) == 100
    assert full["__idx__"].tolist() == list(range(500, 600))
    baseline = _read(spark, 8).orderBy("__idx__").toPandas().iloc[500:600]
    assert full["u"].tolist() == baseline["u"].tolist()
    assert full["fruit"].tolist() == baseline["fruit"].tolist()
