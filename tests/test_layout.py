"""Z-order layout clustering: interleave parity vs a Python reference,
exact integer scaling past 2^53, the locality property that justifies
the operator, and clustering invariants."""

from __future__ import annotations

import random

import pytest
from pyspark.sql import functions as F

from gecko_spark.operators.layout import (
    cluster_by_zorder,
    minmax_scale_int,
    zorder_key,
)


def _py_zorder(vals: tuple, bits: int) -> int:
    z, n = 0, len(vals)
    for i, v in enumerate(vals):
        for b in range(bits):
            z |= ((v >> b) & 1) << (b * n + i)
    return z


def test_zorder_key_matches_python_reference(spark):
    df = spark.createDataFrame(
        [(x, y) for x in range(8) for y in range(8)], "x long, y long"
    )
    got = {
        (r["x"], r["y"]): r["z"]
        for r in df.withColumn("z", zorder_key(["x", "y"], bits=3)).collect()
    }
    for x in range(8):
        for y in range(8):
            assert got[(x, y)] == _py_zorder((x, y), 3)


def test_zorder_key_three_columns(spark):
    df = spark.createDataFrame(
        [(x, y, w) for x in range(4) for y in range(4) for w in range(4)],
        "x long, y long, w long",
    )
    got = df.withColumn("z", zorder_key(["x", "y", "w"], bits=2)).collect()
    for r in got:
        assert r["z"] == _py_zorder((r["x"], r["y"], r["w"]), 2)


def test_zorder_validates_geometry(spark):
    with pytest.raises(ValueError):
        zorder_key(["x"], bits=16)  # < 2 columns
    with pytest.raises(ValueError):
        zorder_key(["x", "y"], bits=32)  # 64 key bits > 62
    with pytest.raises(ValueError):
        minmax_scale_int(None, ["x"], bits=0)


def test_minmax_scale_exact_past_double_precision(spark):
    """Microsecond-timestamp-sized values: a float quotient would round
    above 2^53 and scramble low key bits; the divide-first DIV path
    stays exact."""
    lo, hi = 10**15, 10**15 + 3 * 10**13
    mid = 10**15 + 10**13
    df = spark.createDataFrame([(lo,), (hi,), (mid,)], "t long")
    got = sorted(r["__z0__"] for r in minmax_scale_int(df, ["t"], bits=16).collect())
    step = (hi - lo) // 65536 + 1
    exp = sorted((v - lo) // step for v in (lo, hi, mid))
    assert got == exp
    assert 0 <= got[0] and got[-1] < 65536


def test_minmax_scale_full_int64_span(spark):
    """One corrupt epoch-0 row next to a far-future outlier must not
    abort the layout job (the old multiply-first form overflowed here;
    the adversarial fixture caught it): divide-first handles the full
    int64 span exactly."""
    lo, hi = 0, (1 << 62)
    df = spark.createDataFrame([(lo,), (hi,), (hi // 3,)], "t long")
    got = {r["t"]: r["__z0__"] for r in
           minmax_scale_int(df, ["t"], bits=16).collect()}
    step = (hi - lo) // 65536 + 1
    for v in (lo, hi, hi // 3):
        assert got[v] == (v - lo) // step
        assert 0 <= got[v] < 65536


def test_cluster_locality_beats_single_column_sort(spark):
    """The reason this operator exists: a filter on the SECOND column
    touches ~sqrt(chunks) z-ordered partitions but ALL single-column-
    sorted ones."""
    random.seed(7)
    rows = [(random.randrange(1024), random.randrange(1024)) for _ in range(20000)]
    df = spark.createDataFrame(rows, "a long, b long")
    zc = cluster_by_zorder(
        df, ["a", "b"], bits=10, num_partitions=16, keep_key=True, key_col="zk"
    )
    zp = zc.select("b", F.spark_partition_id().alias("pid")).toPandas()
    z_touched = zp[(zp.b >= 100) & (zp.b < 164)].pid.nunique()
    naive = df.repartitionByRange(16, "a").sortWithinPartitions("a")
    np_ = naive.select("b", F.spark_partition_id().alias("pid")).toPandas()
    n_touched = np_[(np_.b >= 100) & (np_.b < 164)].pid.nunique()
    assert z_touched <= n_touched // 2, (z_touched, n_touched)


def test_cluster_preserves_rows_and_sorts_within_partitions(spark):
    random.seed(11)
    rows = [(random.randrange(100), random.randrange(100)) for _ in range(5000)]
    df = spark.createDataFrame(rows, "a long, b long")
    zc = cluster_by_zorder(
        df, ["a", "b"], bits=7, num_partitions=8, keep_key=True, key_col="zk"
    )
    pdf = zc.select("a", "b", "zk", F.spark_partition_id().alias("pid")).toPandas()
    assert len(pdf) == 5000
    assert sorted(zip(pdf.a, pdf.b)) == sorted(rows)
    for _, part in pdf.groupby("pid"):
        assert part.zk.is_monotonic_increasing
    # key dropped by default
    assert "__zorder__" not in cluster_by_zorder(df, ["a", "b"], bits=7).columns


def test_zorder_null_keys_stay_null(spark):
    df = spark.createDataFrame([(1, 2), (None, 5), (3, None)], "a long, b long")
    out = (
        minmax_scale_int(df, ["a", "b"], bits=4)
        .withColumn("z", zorder_key(["__z0__", "__z1__"], bits=4))
        .collect()
    )
    by_a = {r["a"]: r["z"] for r in out}
    assert by_a[1] is not None
    assert by_a[None] is None and by_a[3] is None
