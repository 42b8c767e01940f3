"""Data-layout clustering: Z-order (Morton) interleaved sort keys.

At 100 TB the scan is the bottleneck, and the scan is only as good as
the layout lets it be: parquet row-group and file skipping prune on
per-chunk min/max, which a single-column sort optimizes for ONE
predicate column and destroys for every other. Interleaving the bits
of several scaled dimensions into one Morton key (Morton 1966; the
same layout Delta Lake's OPTIMIZE ZORDER BY and ClickHouse's
mortonEncode build on) gives every participating column locality ~
n-th root of the chunk count, so a filter on ANY of the clustered
columns skips most chunks.

Everything here is pure Column algebra — integer min-max scaling and
shift/mask interleaving, no UDF, no shuffle beyond the final
repartitionByRange — and deterministic, so the key itself is graded
against a DuckDB oracle (layout_zorder_key in __spark_entry__.py).

The reference engine has no layout operators (its data fits one node);
this module exists for the 100 TB target where the reference's answer
(full scans) stops being an answer.
"""

from __future__ import annotations

from functools import reduce
from typing import Optional, Sequence, Union

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = [
    "zorder_key",
    "minmax_scale_int",
    "cluster_by_zorder",
]

#: bits per dimension × dimensions must fit a signed 64-bit key
_MAX_KEY_BITS = 62


def zorder_key(cols: Sequence[Union[str, Column]], bits: int = 16) -> Column:
    """Morton key of already-scaled integer columns: bit b of column i
    lands at key bit ``b·n + i``. Inputs MUST lie in [0, 2^bits) —
    use :func:`minmax_scale_int` for raw columns. Pure shift/mask
    Column algebra: stays inside whole-stage codegen, no UDF.

    ``bits × len(cols)`` is capped at 62 so the key fits BIGINT with
    the sign bit and one carry bit spare."""
    n = len(cols)
    if n < 2:
        raise ValueError("zorder_key needs at least 2 columns")
    if bits < 1 or bits * n > _MAX_KEY_BITS:
        raise ValueError(
            f"bits * len(cols) must be in [1, {_MAX_KEY_BITS}]; "
            f"got {bits} * {n}"
        )
    cs = [F.col(c).cast("long") if isinstance(c, str) else c.cast("long") for c in cols]
    terms = []
    for i, c in enumerate(cs):
        for b in range(bits):
            # ((c >> b) & 1) << (b*n + i), as multiply to stay in
            # plain integer arithmetic (same form the oracle replays)
            terms.append(
                F.shiftright(c, b).bitwiseAND(F.lit(1))
                * F.lit(1 << (b * n + i)).cast("long")
            )
    return reduce(lambda a, b: a + b, terms).cast("long")


def minmax_scale_int(
    df: DataFrame,
    cols: Sequence[str],
    bits: int = 16,
    out_prefix: str = "__z",
) -> DataFrame:
    """Scale integer columns to [0, 2^bits) with exact integer
    arithmetic — DIVIDE-FIRST: ``(x - min) // step`` with
    ``step = (max - min) // 2^bits + 1``. The multiply-first form
    ``(x - min) * 2^bits // span`` is finer-grained but overflows
    int64 past a ~1.4e14 span at bits=16, and the adversarial fixture
    showed exactly that: ONE corrupt epoch-0 timestamp next to a 2100
    outlier stretched the span to 4e18 and (under the earlier guard)
    aborted the whole layout job. Divide-first can never overflow —
    ``x - min ≤ span < 2^63`` — at the cost of slight non-uniformity
    when the span is not a multiple of 2^bits (outlier rows land in
    edge cells; clustering quality, not correctness). The global
    min/max pair is one 1-row aggregate broadcast back onto the scan
    (a crossJoin with a 1-row frame — no shuffle of the data side).
    NULLs scale to NULL (and sort first in the clustered layout).

    Integer DIV throughout, never float division: above 2^53 a double
    quotient would round and shuffle low key bits between engines."""
    if bits < 1 or bits > 32:
        raise ValueError("bits must be in [1, 32]")
    scale = 1 << bits
    aggs = []
    for c in cols:
        aggs.append(F.min(F.col(c).cast("long")).alias(f"__min_{c}"))
        aggs.append(F.max(F.col(c).cast("long")).alias(f"__max_{c}"))
    mm = df.agg(*aggs)
    out = df.crossJoin(F.broadcast(mm))
    for i, c in enumerate(cols):
        scaled = F.expr(
            f"(CAST(`{c}` AS BIGINT) - `__min_{c}`) DIV "
            f"((`__max_{c}` - `__min_{c}`) DIV {scale} + 1)"
        )
        out = out.withColumn(f"{out_prefix}{i}__", scaled.cast("long"))
    return out.drop(*[f"__min_{c}" for c in cols], *[f"__max_{c}" for c in cols])


def cluster_by_zorder(
    df: DataFrame,
    cols: Sequence[str],
    bits: int = 16,
    num_partitions: Optional[int] = None,
    key_col: str = "__zorder__",
    keep_key: bool = False,
) -> DataFrame:
    """Physically cluster ``df`` for multi-column min/max skipping:
    scale each column, build the Morton key, range-partition on it and
    sort within partitions — then write. Each output chunk covers a
    ~square region of the value space, so every clustered column's
    per-chunk min/max range shrinks to ~chunk_count^(-1/n) of its
    domain (asserted as a bounding-box test in tests/test_layout.py).

    One shuffle (the range partitioner's sample + exchange) — the same
    cost as any global sort; the skipping payoff at read time is what
    a 100 TB table buys with it."""
    scaled = minmax_scale_int(df, cols, bits)
    zcols = [f"__z{i}__" for i in range(len(cols))]
    keyed = scaled.withColumn(key_col, zorder_key(zcols, bits)).drop(*zcols)
    parts = num_partitions or keyed.sparkSession.sparkContext.defaultParallelism
    out = keyed.repartitionByRange(parts, key_col).sortWithinPartitions(key_col)
    return out if keep_key else out.drop(key_col)
