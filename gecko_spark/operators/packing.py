"""Sequence packing: assign documents to fixed token-budget bins for
pretraining batch construction.

The operator every LM data pipeline runs last: documents become
(shard, pack) coordinates such that each pack holds roughly ``budget``
tokens. True first-fit bin packing is inherently sequential (each
decision depends on every earlier one), so it cannot scale out; this
module implements the standard parallel compromise — **offset packing**
within hash shards:

* each document lands in a shard (``xxhash64(id) % n_shards``) — the
  unit of parallelism; packing is sequential only WITHIN a shard;
* inside a shard, documents are ordered by id and packed by global
  token offset: a document whose tokens span offsets
  ``[c - n, c)`` goes to pack ``(c - n) DIV budget`` — one window
  cumulative sum, no iteration;
* a document longer than ``budget`` still gets a pack (the one its
  first token falls in) — callers split oversized docs upstream.

Every step is deterministic integer arithmetic over a deterministic
order, so a DuckDB oracle replays the exact assignment
(``pack_sequences`` contract query). Packs are ~budget-sized rather
than exactly-budget-sized (a doc may straddle a boundary); that slack
is the price of a single-pass, shuffle-once plan — the same trade
streaming packers make.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

__all__ = ["pack_sequences", "pack_manifest"]


def pack_sequences(
    df: DataFrame,
    id_col: str,
    n_tokens_col: str,
    budget: int,
    n_shards: int = 64,
    shard_col=None,
) -> DataFrame:
    """Input rows + ``(shard, pack)`` assignment columns.

    One shuffle (the per-shard window sort). ``n_shards`` bounds
    parallelism AND pack locality: more shards → more parallel sorts,
    slightly more boundary slack. Deterministic for a given
    (ids, n_shards, budget). ``shard_col`` overrides the default
    xxhash64 sharding with an explicit int Column — pass an
    engine-portable expression (e.g. ``pmod(id, n_shards)``) when an
    external system must replay the assignment."""
    if budget < 1:
        raise ValueError(f"budget must be >= 1, is {budget}")
    if n_shards < 1:
        raise ValueError(f"n_shards must be >= 1, is {n_shards}")
    if shard_col is None:
        shard_col = F.pmod(F.xxhash64(F.col(id_col)), F.lit(n_shards)).cast("int")
    out = df.withColumn("shard", shard_col)
    # explicit ROWS frame: Spark's default for an ordered window is
    # RANGE, which sums PEER rows (equal ids) together and would give
    # duplicate ids the same start offset instead of stacking them
    w = (
        Window.partitionBy("shard")
        .orderBy(id_col)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cum = F.sum(F.col(n_tokens_col).cast("long")).over(w)
    start = cum - F.col(n_tokens_col).cast("long")
    # start/budget is exact in double up to 2^53 tokens per shard —
    # far beyond any real shard; truncation == floor since start >= 0
    return out.withColumn("pack", (start / F.lit(budget)).cast("int"))


def pack_manifest(
    packed: DataFrame, n_tokens_col: str = "n_tokens"
) -> DataFrame:
    """Per-(shard, pack) manifest: document count + token fill — the
    table a downstream batch loader reads to schedule work."""
    return packed.groupBy("shard", "pack").agg(
        F.count("*").alias("n_docs"),
        F.sum(F.col(n_tokens_col).cast("long")).alias("n_tokens_total"),
    )
