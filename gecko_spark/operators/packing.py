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

__all__ = [
    "pack_sequences",
    "pack_manifest",
    "pack_texts",
    "global_token_shards",
]

_SALT_GSHARD = 19


def _safe_tokens(n_tokens_col: str) -> F.Column:
    """Token counts, defensively clamped: NULL → 0 (the
    tokens()-empty convention) and negative → 0. A negative count
    would make every cumulative sum in this module non-monotone, so
    greedy-prefix filters could readmit rows after a cap is crossed
    and shard/pack invariants would silently break — clamp once here
    instead of trusting every caller."""
    return F.greatest(
        F.coalesce(F.col(n_tokens_col).cast("long"), F.lit(0)), F.lit(0)
    )


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
    n = _safe_tokens(n_tokens_col)
    cum = F.sum(n).over(w)
    start = cum - n
    # start/budget is exact in double up to 2^53 tokens per shard —
    # far beyond any real shard; truncation == floor since start >= 0
    return out.withColumn("pack", (start / F.lit(budget)).cast("int"))


def global_token_shards(
    df: DataFrame,
    id_col: str,
    n_tokens_col: str,
    budget: int,
    rand,
    buckets: int = 256,
    shard_col: str = "gshard",
    start_col: str = "gstart",
) -> DataFrame:
    """GLOBALLY-contiguous token-budget shards over a deterministic
    random order — the "write N training files of ~budget tokens each,
    in one seeded global shuffle order" step. Unlike
    :func:`pack_sequences` (independent per-shard packing — pack ids
    are only meaningful within a shard), here shard boundaries cut ONE
    global document sequence, so shard ``i`` is exactly the documents
    whose first token falls in ``[i·budget, (i+1)·budget)`` of the
    concatenated stream.

    The global running total is a DISTRIBUTED PREFIX SUM — no
    single-partition window anywhere:

    1. each row draws a portable uniform ``u`` (its global sort key)
       and lands in bucket ``⌊u·buckets⌋`` — bucket order IS u-order,
       so bucket-major + u-minor equals the global order;
    2. a per-bucket window (``buckets`` parallel sorts) computes the
       local running total;
    3. bucket token totals (≤ ``buckets`` rows) come to the driver
       once, turn into prefix offsets, and broadcast-join back;
    4. ``gstart = offset[bucket] + local_before``,
       ``gshard = ⌊gstart / budget⌋``.

    Every step is integer arithmetic over a deterministic order (ties
    in ``u`` break by ``id_col``), so a DuckDB oracle replays the
    assignment with one global window — which also certifies that the
    two-phase sum equals the sequential one. A doc longer than
    ``budget`` still gets the shard its first token falls in (split
    oversized docs upstream, as with :func:`pack_sequences`).
    """
    if budget < 1:
        raise ValueError(f"budget must be >= 1, is {budget}")
    if buckets < 1:
        raise ValueError(f"buckets must be >= 1, is {buckets}")
    u = rand.uniform(_SALT_GSHARD)
    keyed = df.withColumn("__u__", u).withColumn(
        "__b__", F.floor(F.col("__u__") * buckets).cast("long")
    )
    w = (
        Window.partitionBy("__b__")
        .orderBy(F.col("__u__").asc(), F.col(id_col).asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    # NULL token counts stream as 0-length docs (the tokens()-empty
    # convention; a NULL here once minted a phantom NULL pack in
    # pack_sequences — adversarial gate, round 11); negatives clamp to
    # 0 so the prefix sum stays monotone (shard ids never regress)
    n = _safe_tokens(n_tokens_col)
    local_before = F.sum(n).over(w) - n
    keyed = keyed.withColumn("__lb__", local_before)

    totals = {
        r["__b__"]: r["t"]
        for r in keyed.groupBy("__b__").agg(F.sum(n).alias("t")).collect()
    }
    acc = 0
    offs = []
    for b in sorted(totals):
        offs.append((int(b), int(acc)))
        acc += int(totals[b])
    spark = df.sparkSession
    odf = F.broadcast(
        spark.createDataFrame(offs or [(0, 0)], "__b__ long, __off__ long")
    )
    out = keyed.join(odf, "__b__", "left")
    gstart = F.coalesce(F.col("__off__"), F.lit(0)) + F.col("__lb__")
    # long integer division, not a double floor + int cast: a 32-bit
    # shard id overflows at 2^31 shards (~16 TB of text at budget 2048)
    # and a double quotient loses exactness past 2^53 tokens — both
    # inside the intended operating range
    return (
        out.withColumn(start_col, gstart.cast("long"))
        .withColumn(
            shard_col,
            F.expr(f"{start_col} div {int(budget)}").cast("long"),
        )
        .drop("__u__", "__b__", "__lb__", "__off__")
    )


def pack_texts(
    packed: DataFrame,
    id_col: str,
    text_col: str,
    sep: str = "\n",
    shard_col: str = "shard",
    pack_col: str = "pack",
) -> DataFrame:
    """MATERIALIZE packed training sequences: one row per
    ``(shard, pack)`` with the member documents concatenated in id
    order — the step that turns :func:`pack_sequences` /
    :func:`global_token_shards` assignments into the text a trainer
    actually reads. Returns ``(shard, pack, n_docs, text)``.

    Pure DataFrame algebra, one shuffle (the groupBy):
    ``array_sort(collect_list(struct(id, text)))`` orders each pack's
    members deterministically (struct comparison is field-by-field, id
    first), then a transform+array_join stitches them — no Python, no
    window. Safe by construction: a pack holds ~budget tokens, so the
    collected list is budget-bounded regardless of corpus size. NULL
    text concatenates as the empty string (the tokenize-empty
    convention)."""
    sid = F.col(shard_col)
    pid = F.col(pack_col)
    members = F.array_sort(
        F.collect_list(
            F.struct(
                F.col(id_col).alias("__id__"),
                F.coalesce(F.col(text_col), F.lit("")).alias("__t__"),
            )
        )
    )
    return (
        packed.groupBy(sid, pid)
        .agg(members.alias("__m__"))
        .select(
            shard_col,
            pack_col,
            F.size("__m__").alias("n_docs"),
            F.array_join(
                F.transform("__m__", lambda s: s["__t__"]), sep
            ).alias("text"),
        )
    )


def pack_manifest(
    packed: DataFrame, n_tokens_col: str = "n_tokens"
) -> DataFrame:
    """Per-(shard, pack) manifest: document count + token fill — the
    table a downstream batch loader reads to schedule work."""
    return packed.groupBy("shard", "pack").agg(
        F.count("*").alias("n_docs"),
        F.sum(F.col(n_tokens_col).cast("long")).alias("n_tokens_total"),
    )
