"""Skew-handling utilities: salted two-phase aggregation and salted
replicate joins.

AQE (`spark.sql.adaptive.skewJoin`) already splits skewed SHUFFLE
partitions at runtime; these helpers cover the cases AQE can't —
a single hot GROUP BY key that overwhelms one reducer, and a hot join
key on a non-broadcastable build side. Both follow the standard salt
pattern: spread the hot key over ``buckets`` sub-keys, then recombine.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = ["salted_groupby_agg", "salted_join"]

# aggregate -> (partial fn, merge fn) — must be re-aggregable
_REAGG = {
    "sum": (F.sum, F.sum),
    "count": (F.count, F.sum),
    "min": (F.min, F.min),
    "max": (F.max, F.max),
}


def _salt(
    df: DataFrame,
    keys: Sequence[str],
    salt_on: Sequence[str] | None,
    buckets: int,
) -> Column:
    """Deterministic (retry-safe) salt in [0, buckets).

    The salt must be a pure function of the row — under partial stage
    recomputation after a fetch failure, ``F.rand()`` re-rolls and
    routes replayed rows to different (key, salt) groups than the
    already-finished reducers consumed, double-counting or losing rows
    (core.py randomness policy) — AND it must vary WITHIN a key group
    (hashing the key alone would map a hot key to one bucket, salting
    nothing).

    ``salt_on`` names the disambiguator column(s) that vary within a
    group — typically the table's primary key; the hash covers
    (keys + salt_on) only, so a 100-column table salts at 2-column
    hash cost. When None, falls back to hashing every column, which is
    always correct but hashes the full row width."""
    cols = [*keys, *salt_on] if salt_on else df.columns
    return F.pmod(
        F.xxhash64(*[F.col(c) for c in cols]), F.lit(buckets)
    ).cast("int")


def salted_groupby_agg(
    df: DataFrame,
    keys: Sequence[str],
    aggs: dict[str, tuple[str, str]],
    buckets: int = 32,
    salt_on: Sequence[str] | None = None,
) -> DataFrame:
    """Two-phase aggregation immune to hot grouping keys.

    ``aggs`` maps output column → (agg_name, input column), with
    agg_name ∈ {sum, count, min, max} (the re-aggregable set). Phase 1
    groups by (keys, deterministic salt) — the hot key's rows spread
    over ``buckets`` reducers; phase 2 merges the ≤ buckets partials per
    key. Shuffle volume: phase 2 moves at most ``buckets ×
    distinct-keys`` rows, independent of skew.

    ``salt_on``: column(s) that vary within a group (e.g. the primary
    key) — keeps the salt hash at (keys + salt_on) width instead of the
    full row; see :func:`_salt`.
    """
    if buckets < 1:
        raise ValueError(f"buckets must be >= 1, is {buckets}")
    for name, (fn, _) in aggs.items():
        if fn not in _REAGG:
            raise ValueError(
                f"agg `{fn}` for `{name}` is not re-aggregable; use one of {sorted(_REAGG)}"
            )
    salted = df.withColumn("__salt__", _salt(df, keys, salt_on, buckets))
    partial = salted.groupBy(*keys, "__salt__").agg(
        *[
            _REAGG[fn][0](col).alias(f"__p_{name}")
            for name, (fn, col) in aggs.items()
        ]
    )
    return partial.groupBy(*keys).agg(
        *[
            _REAGG[fn][1](f"__p_{name}").alias(name)
            for name, (fn, _) in aggs.items()
        ]
    )


def salted_join(
    skewed: DataFrame,
    other: DataFrame,
    on: Sequence[str],
    buckets: int = 16,
    how: str = "inner",
    salt_on: Sequence[str] | None = None,
) -> DataFrame:
    """Equi-join tolerant of hot keys on the ``skewed`` side.

    The skewed side gets a deterministic salt in [0, buckets);
    ``other`` is replicated ``buckets`` times (explode over a literal
    range — so its shuffle volume grows ×buckets: keep it the smaller
    input). The join key becomes (on..., salt), spreading each hot key
    over ``buckets`` reducers.

    ``salt_on``: column(s) that vary within a join-key group — keeps
    the salt hash at (on + salt_on) width; see :func:`_salt`.

    Only ``inner``/``left``(outer)/``left_semi`` are supported: in
    right/full-outer modes the unmatched replicas of ``other`` would
    each surface as a spurious null-extended row."""
    if buckets < 1:
        raise ValueError(f"buckets must be >= 1, is {buckets}")
    if how.replace("outer", "").rstrip("_") not in ("inner", "left", "left_semi", "leftsemi"):
        raise ValueError(
            f"salted_join supports inner/left/left_semi joins, not `{how}`"
        )
    on = list(on)
    salted = skewed.withColumn("__salt__", _salt(skewed, on, salt_on, buckets))
    replicated = other.withColumn(
        "__salt__", F.explode(F.array(*[F.lit(i) for i in range(buckets)]))
    )
    out = salted.join(replicated, on + ["__salt__"], how)
    return out.drop("__salt__")
