"""Structured Streaming operators.

The reference has no streaming surface (SURVEY.md §2.4) — Spark's
Structured Streaming provides it natively. This module wires the
engine's mutators into streams (mutators are pure column
transformations, so they apply unchanged to streaming DataFrames) and
offers the standard event-analytics shapes: watermarked windowed
aggregation and gap-based sessionization.
"""

from __future__ import annotations

from typing import Optional, Sequence

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

__all__ = [
    "EVENTS_SCHEMA",
    "stream_events",
    "windowed_event_counts",
    "sessionize",
    "running_user_stats",
    "interval_join_streams",
    "neardup_dedupe_stream",
    "mutate_stream",
    "dedupe_stream",
    "decontaminate_stream",
    "link_stream",
    "pack_stream",
    "heavy_hitters_stream",
    "heavy_hitters_from_shards",
    "kmv_distinct_stream",
    "kmv_estimate_from_shards",
    "hll_registers_stream",
    "hll_estimate_from_shards",
]

EVENTS_SCHEMA = T.StructType(
    [
        T.StructField("event_id", T.LongType()),
        T.StructField("ts", T.TimestampType()),
        T.StructField("user_id", T.LongType()),
        T.StructField("event_type", T.StringType()),
        T.StructField("value", T.DoubleType()),
        T.StructField("props", T.StringType()),
    ]
)

# The driver's events.parquet stores ts as TIMESTAMP(NANOS), which Spark
# only reads as int64 (spark.sql.legacy.parquet.nanosAsLong) — the
# stream declares ts_ns and converts to a real timestamp JVM-side.
_EVENTS_NANOS_SCHEMA = T.StructType(
    [
        T.StructField("event_id", T.LongType()),
        T.StructField("ts", T.LongType()),
        T.StructField("user_id", T.LongType()),
        T.StructField("event_type", T.StringType()),
        T.StructField("value", T.DoubleType()),
        T.StructField("props", T.StringType()),
    ]
)


def _sniff_ts_unit(path: str) -> Optional[str]:
    """Parquet-footer timestamp unit of the ``ts`` column ('ns', 'us',
    …) or None when it is not a timestamp — one driver-side metadata
    read of the first matching file."""
    import glob
    import os

    import pyarrow.parquet as pq

    f = path
    if os.path.isdir(path):
        cands = sorted(glob.glob(os.path.join(path, "*.parquet")))
        if not cands:
            return None
        f = cands[0]
    try:
        return getattr(pq.read_schema(f).field("ts").type, "unit", None)
    except Exception:
        return None


def stream_events(
    spark: SparkSession,
    path: str,
    max_files_per_trigger: int = 1,
    nanos_ts="auto",
) -> DataFrame:
    """File-source stream over the events table layout (one parquet per
    micro-batch by default — deterministic for tests; swap for
    kafka/socket in production).

    Accepts a directory or a single parquet file. FileStreamSource
    force-sets ``basePath`` to the source path whenever the path is not
    a glob, and a file-valued basePath is rejected at batch-planning
    time — so a bare file path is rewritten into an equivalent
    single-match glob (``events.parquet`` → ``[e]vents.parquet``).

    ``nanos_ts="auto"`` (default) sniffs the parquet footer: a
    TIMESTAMP(NANOS) ``ts`` is read as int64
    (legacy.parquet.nanosAsLong) and converted JVM-side; anything else
    streams through the plain timestamp schema. The sniff exists
    because the two cases are NOT distinguishable from inside the
    stream (the explicit schema pre-empts inference) and dividing a
    microsecond epoch by 1000 silently relocates every event to 1970 —
    caught by the interval-join batch-parity test, invisible to
    count-only assertions. Pass True/False to pin the round-4 driver
    layout (nanos) / a plain-timestamp layout explicitly. NOTE: in
    nanos mode the conf is intentionally NOT restored — micro-batches
    resolve the relation while the query runs, so flipping it back
    would break the live stream. Batch reads of ns files should go
    through sources/testdata.py::load_table, which save/restores the
    conf and is unaffected."""
    import os

    if nanos_ts == "auto":
        nanos_ts = _sniff_ts_unit(path) == "ns"
    schema = _EVENTS_NANOS_SCHEMA if nanos_ts else EVENTS_SCHEMA
    if nanos_ts:
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    reader = spark.readStream.schema(schema).option(
        "maxFilesPerTrigger", max_files_per_trigger
    )
    if os.path.isfile(path):
        d, name = os.path.split(path)
        path = os.path.join(d, "[" + name[0] + "]" + name[1:])
    df = reader.parquet(path)
    if nanos_ts:
        df = df.withColumn("ts", F.timestamp_micros(F.expr("ts DIV 1000")))
    return df


def windowed_event_counts(
    events: DataFrame,
    window_duration: str = "5 minutes",
    slide: Optional[str] = None,
    watermark: Optional[str] = "10 minutes",
) -> DataFrame:
    """Watermarked tumbling/sliding window counts + value sums per
    event_type — the canonical late-data-tolerant streaming aggregate.

    Pass ``watermark=None`` when the input already carries one (e.g.
    downstream of ``dedupe_stream``): Spark disallows REDEFINING a
    stream's watermark after a stateful operator, even to the same
    value."""
    w = (
        F.window("ts", window_duration, slide)
        if slide
        else F.window("ts", window_duration)
    )
    return (
        (events.withWatermark("ts", watermark) if watermark is not None else events)
        .groupBy(w.alias("win"), "event_type")
        .agg(
            F.count("*").alias("n_events"),
            F.sum("value").alias("sum_value"),
        )
        .select(
            F.col("win.start").alias("window_start"),
            F.col("win.end").alias("window_end"),
            "event_type",
            "n_events",
            "sum_value",
        )
    )


def sessionize(
    events: DataFrame, gap: str = "30 minutes", watermark: str = "1 hour"
) -> DataFrame:
    """Session windows per user: events within ``gap`` of each other
    merge into one session (native ``session_window`` state store —
    scales with open sessions, not history)."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.session_window("ts", gap).alias("sess"), "user_id")
        .agg(
            F.count("*").alias("n_events"),
            F.sum("value").alias("sum_value"),
        )
        .select(
            F.col("sess.start").alias("session_start"),
            F.col("sess.end").alias("session_end"),
            "user_id",
            "n_events",
            "sum_value",
        )
    )


def running_user_stats(
    events: DataFrame,
    watermark: str = "1 hour",
    idle_timeout_ms: int = 24 * 3600 * 1000,
) -> DataFrame:
    """Custom stateful operator: per-user running (count, sum, max of
    ``value``) maintained across micro-batches with
    ``applyInPandasWithState`` — the escape hatch for aggregations the
    built-in windowed/sessionized operators can't express.

    State is one tiny tuple per live user (scales with distinct active
    keys, not history); idle users are evicted via event-time timeout
    so the state store is bounded under churn."""
    import pandas as pd
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    out_schema = T.StructType(
        [
            T.StructField("user_id", T.LongType()),
            T.StructField("n_events", T.LongType()),
            T.StructField("sum_value", T.DoubleType()),
            T.StructField("max_value", T.DoubleType()),
        ]
    )
    state_schema = T.StructType(
        [
            T.StructField("n", T.LongType()),
            T.StructField("s", T.DoubleType()),
            T.StructField("m", T.DoubleType()),
        ]
    )

    def update(key, pdfs, state: GroupState):
        (user_id,) = key
        if state.hasTimedOut:
            state.remove()
            return
        n, s, m = state.get if state.exists else (0, 0.0, float("-inf"))
        for pdf in pdfs:
            v = pdf["value"].astype(float)
            n += len(v)
            s += float(v.sum())
            if len(v):
                m = max(m, float(v.max()))
        state.update((n, s, m))
        state.setTimeoutTimestamp(state.getCurrentWatermarkMs() + idle_timeout_ms)
        yield pd.DataFrame(
            {"user_id": [user_id], "n_events": [n], "sum_value": [s], "max_value": [m]}
        )

    return (
        events.withWatermark("ts", watermark)
        .groupBy("user_id")
        .applyInPandasWithState(
            update,
            outputStructType=out_schema,
            stateStructType=state_schema,
            outputMode="update",
            timeoutConf=GroupStateTimeout.EventTimeTimeout,
        )
    )


def dedupe_stream(
    events: DataFrame,
    cols: Sequence[str],
    ts_col: str = "ts",
    watermark: str = "10 minutes",
) -> DataFrame:
    """Streaming exact deduplication: drop rows whose ``cols`` content
    already appeared within the watermark horizon.

    Uses ``dropDuplicatesWithinWatermark`` so the dedup state store is
    BOUNDED by the watermark — a plain ``dropDuplicates`` on a stream
    keeps every key forever and OOMs on an unbounded source. Rows
    arriving later than ``watermark`` after a duplicate's event time
    may be emitted again: that is the documented trade of bounded
    state; size the horizon to the source's real duplication window."""
    if isinstance(cols, str):
        cols = [cols]
    return events.withWatermark(ts_col, watermark).dropDuplicatesWithinWatermark(
        list(cols)
    )


def neardup_dedupe_stream(
    docs: DataFrame,
    text_col: str = "text",
    ts_col: str = "ts",
    watermark: str = "10 minutes",
    bits: int = 64,
    seed: int = 1,
) -> DataFrame:
    """Streaming near-duplicate suppression: drop a document whose
    ``bits``-bit SimHash fingerprint was already seen within the
    watermark horizon — the continuous-ingestion companion to the batch
    ``simhash_candidate_pairs`` pipeline.

    This is FINGERPRINT-identity dedup (state = one fingerprint per
    surviving doc, bounded by the watermark via
    ``dropDuplicatesWithinWatermark``), so it suppresses exact and
    ultra-near duplicates that collide on all ``bits`` bits — i.e. the
    boilerplate/re-crawl flood. It is NOT a Hamming-radius search:
    pairwise near-dup mining across a stream needs the batch pipeline
    over a window of the stream (or `dedupe_against_index` on
    micro-batches via ``foreachBatch``)."""
    from gecko_spark.operators.dedup import simhash

    fp = simhash(F.col(text_col), bits=bits, seed=seed)
    return (
        docs.withColumn("__fp__", fp)
        .withWatermark(ts_col, watermark)
        .dropDuplicatesWithinWatermark(["__fp__"])
        .drop("__fp__")
    )


def interval_join_streams(
    left: DataFrame,
    right: DataFrame,
    key: str,
    left_ts: str = "ts",
    right_ts: str = "ts",
    lower: str = "0 seconds",
    upper: str = "10 minutes",
    watermark: str = "30 minutes",
    how: str = "inner",
    right_prefix: str = "r_",
) -> DataFrame:
    """Stream-stream interval join: pair each left row with right rows
    sharing ``key`` whose event time falls in
    ``[left_ts + lower, left_ts + upper]`` — the canonical correlation
    shape (click → purchase within 10 minutes, request → response, …).

    Both sides are watermarked and the join condition carries an
    explicit two-sided event-time bound, which is what lets Spark
    EVICT state: a buffered left row can stop waiting once the right
    watermark passes ``left_ts + upper``, so the state store is bounded
    by ``watermark + (upper − lower)`` of data per key — without the
    time bound a stream-stream join must buffer both sides forever.
    ``how`` may be ``inner``, ``leftOuter``, ``rightOuter`` or
    ``fullOuter`` (outer rows emit only after the watermark seals
    their wait window — expect them late, that is the semantics).

    Right-side columns that collide with left names are renamed with
    ``right_prefix`` so the output schema is unambiguous; the join key
    keeps its left name.
    """
    l = left.withWatermark(left_ts, watermark)
    r = right.withWatermark(right_ts, watermark)
    clash = {c for c in right.columns if c in set(left.columns)}
    renames = {c: (right_prefix + c) for c in clash}
    for old, new in renames.items():
        r = r.withColumnRenamed(old, new)
    r_key = renames.get(key, key)
    r_ts = renames.get(right_ts, right_ts)
    # frame-qualified references (l[...] / r[...]), NOT F.col(name):
    # when both sides derive from the SAME streaming source (the
    # common correlate-a-stream-with-itself case), the two plans carry
    # identical attribute ids underneath the renames and name-based
    # resolution can silently bind both time operands to one side —
    # making the interval bound a tautology and the join an unbounded
    # equi-join. df[col] pins each operand to its own plan.
    cond = (
        (l[key] == r[r_key])
        & (r[r_ts] >= l[left_ts] + F.expr(f"INTERVAL {lower}"))
        & (r[r_ts] <= l[left_ts] + F.expr(f"INTERVAL {upper}"))
    )
    return l.join(r, cond, how).drop(r[r_key])


def mutate_stream(events: DataFrame, mutator_lst, seed: int = 0) -> DataFrame:
    """Apply a gecko_spark mutation spec to a streaming DataFrame.

    Mutators are stateless per-row column expressions (randomness is
    hash-derived from row content — core.py), so the same spec that
    corrupts a batch table corrupts a stream, exactly-once per row,
    with no state store."""
    from gecko_spark.plans.pipeline import mutate_data_frame

    return mutate_data_frame(events, mutator_lst, seed=seed)


def decontaminate_stream(
    docs: DataFrame,
    reference: DataFrame,
    id_col: str,
    text_col: str,
    n: int = 5,
    bloom_bits_count: Optional[int] = None,
) -> DataFrame:
    """Streaming decontamination: drop stream documents sharing any word
    ``n``-gram with a STATIC reference set (an eval split, a blocklist
    corpus).

    Shape: the decision must stay ROW-LOCAL — the batch formulation
    (explode grams → join → anti-join the ids back) needs a second join
    against the stream, and stream-stream anti joins are unsupported.
    Instead the reference's distinct grams are computed ONCE (one batch
    job) and each stream row runs a set-membership test in an Arrow
    kernel: stateless, exactly-once per row, no watermark.

    Two membership carriers:

    * ``bloom_bits_count=None`` (default): the grams themselves are
      collected and broadcast as a frozenset — EXACT, right-sized for
      eval-split references (the decontamination contract), but
      driver-hostile when the reference has hundreds of millions of
      grams.
    * ``bloom_bits_count=<bits>``: the grams are folded distributedly
      into a fixed-size Bloom bitset (``operators/decontam.bloom_bits``
      — only ``bits/64`` int64 words ever reach the driver; a
      1-billion-bit filter is 125 MB and broadcastable where the raw
      gram strings would not be). One-sided error: a false-positive
      gram drops a CLEAN document (rate ≈ (1−e^{−k·g/bits})^k, k=6;
      size ≥ ~16 bits/gram for <0.1%). No contaminated document ever
      survives. For exact results at corpus-scale references run the
      batch ``decontaminate`` inside ``foreachBatch`` instead.
    """
    from gecko_spark.operators.decontam import (
        _BLOOM_K,
        _BLOOM_PARAMS,
        bloom_bits,
        ngrams_of_tokens,
    )
    from gecko_spark.operators.text import tokens

    spark = reference.sparkSession
    ref_gram_df = (
        reference.select(tokens(F.col(text_col)).alias("__tk__"))
        .select(F.explode(ngrams_of_tokens(F.col("__tk__"), n)).alias("gram"))
        .distinct()
    )

    if bloom_bits_count is not None:
        from gecko_spark.functions.portable_hash import P1, poly_hash_strings

        bits = bloom_bits(ref_gram_df, bloom_bits_count)
        bc_bits = spark.sparkContext.broadcast(bits)
        num_bits = int(bits.shape[0]) * 64

        @F.pandas_udf(T.BooleanType())
        def _contaminated(tk: pd.Series) -> pd.Series:
            arr = bc_bits.value
            # flatten every row's grams into one hash batch, then fold
            # per-row membership back with the row offsets
            grams: list[str] = []
            offsets = [0]
            for a in tk:
                if a is not None and len(a) >= n:
                    grams.extend(
                        " ".join(a[i : i + n]) for i in range(len(a) - n + 1)
                    )
                offsets.append(len(grams))
            if not grams:
                return pd.Series([False] * len(tk))
            h = poly_hash_strings(grams, P1)
            might = np.ones(len(h), dtype=bool)
            for a_, b_ in _BLOOM_PARAMS[:_BLOOM_K]:
                pos = (h * a_ + b_) % P1 % num_bits
                might &= ((arr[pos // 64] >> (pos % 64)) & 1).astype(bool)
            return pd.Series(
                [might[offsets[i] : offsets[i + 1]].any() for i in range(len(tk))]
            )

    else:
        ref_grams = frozenset(r["gram"] for r in ref_gram_df.collect())
        bc = spark.sparkContext.broadcast(ref_grams)

        @F.pandas_udf(T.BooleanType())
        def _contaminated(tk: pd.Series) -> pd.Series:
            grams = bc.value
            out = []
            for a in tk:
                if a is None or len(a) < n:
                    out.append(False)
                    continue
                out.append(
                    any(" ".join(a[i : i + n]) in grams for i in range(len(a) - n + 1))
                )
            return pd.Series(out)

    return (
        docs.withColumn("__tk__", tokens(F.col(text_col)))
        .filter(~_contaminated(F.col("__tk__")))
        .drop("__tk__")
    )


def pack_stream(
    docs: DataFrame,
    id_col: str,
    n_tokens_col: str,
    budget: int,
    n_shards: int = 64,
    watermark_col: Optional[str] = None,
    watermark: str = "1 hour",
    shard_col=None,
) -> DataFrame:
    """Streaming sequence packing: assign arriving documents to
    ~``budget``-token bins, continuing pack numbering across
    micro-batches.

    The batch operator (operators/packing.py) re-derives offsets from a
    window over the whole corpus; a stream cannot, so each shard keeps
    ONE state tuple — the running token offset — in
    ``applyInPandasWithState`` and extends it per batch: state size is
    O(n_shards), not O(history). Within a micro-batch documents pack in
    ``id_col`` order; ACROSS batches assignment depends on arrival
    order, which is the inherent streaming trade (the batch operator is
    the deterministic replay — and when batches arrive in id order the
    stream reproduces it exactly, which is what the
    ``stream_pack_parity`` contract certifies). ``shard_col`` overrides
    the default xxhash64 sharding with an explicit int Column — same
    portability escape hatch as the batch operator."""
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    out_schema = T.StructType(
        [
            T.StructField("shard", T.IntegerType()),
            T.StructField(id_col, T.LongType()),
            T.StructField(n_tokens_col, T.LongType()),
            T.StructField("pack", T.IntegerType()),
        ]
    )
    state_schema = T.StructType([T.StructField("offset", T.LongType())])

    def assign(key, pdfs, state: GroupState):
        (shard,) = key
        if state.hasTimedOut:  # pragma: no cover - no timeout configured
            state.remove()
            return
        (offset,) = state.get if state.exists else (0,)
        for pdf in pdfs:
            pdf = pdf.sort_values(id_col)
            toks = pdf[n_tokens_col].astype("int64")
            starts = offset + toks.cumsum() - toks
            offset = int(offset + toks.sum())
            yield pd.DataFrame(
                {
                    "shard": shard,
                    id_col: pdf[id_col].astype("int64"),
                    n_tokens_col: toks,
                    "pack": (starts // budget).astype("int32"),
                }
            )
        state.update((offset,))

    if shard_col is None:
        shard_col = F.pmod(F.xxhash64(F.col(id_col)), F.lit(n_shards)).cast("int")
    out = docs.withColumn("shard", shard_col)
    if watermark_col is not None:
        out = out.withWatermark(watermark_col, watermark)
    return (
        out.groupBy("shard")
        .applyInPandasWithState(
            assign,
            outputStructType=out_schema,
            stateStructType=state_schema,
            outputMode="append",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )


def heavy_hitters_stream(
    events: DataFrame,
    col: str,
    capacity: int = 64,
    n_shards: int = 16,
    ts_col: str = "ts",
    watermark: str = "1 hour",
    output_mode: str = "update",
) -> DataFrame:
    """Streaming heavy-hitter candidates: a per-shard Misra–Gries
    summary maintained across micro-batches (the streaming face of
    ``operators/sketches.py::heavy_hitters``).

    Values shard by ``xxhash64 mod n_shards`` — a value's WHOLE count
    lives in exactly one shard, so any value whose running count
    exceeds ``n_shard/(capacity+1)`` (≤ total/(capacity+1)) is
    guaranteed present in its shard's summary: the same superset
    guarantee the batch operator gets from per-partition summaries.
    State is two fixed arrays (values, counts) + the shard's row count
    — O(n_shards × capacity) total regardless of history, the
    mergeable-summary contract applied to unbounded input.

    Each micro-batch re-emits the shard's current summary in update
    mode; downstream takes the LAST emission per shard and — exactly as
    in the batch path — an exact recount of the candidates over the
    stored data turns candidates into exact heavy hitters.

    Every row carries ``emit``, the shard's monotone emission ordinal
    (restored from state across checkpoint restarts), because appended
    file-sink rows are otherwise unordered: the shard's CURRENT summary
    is exactly its rows where ``emit = max(emit) over shard`` — which
    also makes MG evictions recoverable (a value missing from the
    latest emission was truncated; its stale lower-cnt rows from
    earlier emissions must not be resurrected by a naive
    max-cnt-per-(shard,value) read — ADVICE r5).
    :func:`heavy_hitters_from_shards` applies this filter itself.

    ``output_mode`` must match the sink's: "update" for memory/console
    sinks, "append" for file sinks (the emissions are identical — each
    batch re-emits the running summary).

    Checkpoint compatibility: adding ``emit`` grew the per-shard state
    row from 3 to 4 fields (round 6). ``applyInPandasWithState`` state
    is positional, so a stream restarted from a PRE-change checkpoint
    misreads or fails on the old rows — restart from a fresh
    checkpoint (the sketch re-warms; counts are lower bounds either
    way). See MIGRATION.md's streaming section.
    """
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    from gecko_spark.operators.sketches import _mg_absorb

    if capacity < 1:
        raise ValueError(f"capacity must be ≥ 1, got {capacity}")
    out_schema = T.StructType(
        [
            T.StructField("shard", T.IntegerType()),
            T.StructField("value", T.StringType()),
            T.StructField("cnt", T.LongType()),
            T.StructField("n_shard", T.LongType()),
            T.StructField("emit", T.LongType()),
        ]
    )
    state_schema = T.StructType(
        [
            T.StructField("values", T.ArrayType(T.StringType())),
            T.StructField("cnts", T.ArrayType(T.LongType())),
            T.StructField("n", T.LongType()),
            T.StructField("emit", T.LongType()),
        ]
    )

    def update(key, pdfs, state: GroupState):
        (shard,) = key
        if state.hasTimedOut:  # pragma: no cover - no timeout configured
            state.remove()
            return
        if state.exists:
            values, cnts, n, emit = state.get
            counters = dict(zip(values, cnts))
        else:
            counters, n, emit = {}, 0, 0
        for pdf in pdfs:
            s = pdf["value"].dropna()
            n += len(s)
            counters = _mg_absorb(counters, s.value_counts().to_dict(), capacity)
        emit += 1
        state.update(
            (list(counters.keys()), [int(c) for c in counters.values()], n, emit)
        )
        yield pd.DataFrame(
            {
                "shard": shard,
                "value": list(counters.keys()),
                "cnt": [int(c) for c in counters.values()],
                "n_shard": n,
                "emit": emit,
            }
        )

    shard = F.pmod(F.xxhash64(F.col(col).cast("string")), F.lit(n_shards)).cast("int")
    src = (
        events.withWatermark(ts_col, watermark)
        .select(
            F.col(ts_col),
            F.col(col).cast("string").alias("value"),
            shard.alias("shard"),
        )
    )
    return src.groupBy("shard").applyInPandasWithState(
        update,
        outputStructType=out_schema,
        stateStructType=state_schema,
        outputMode=output_mode,
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def kmv_distinct_stream(
    events: DataFrame,
    col: str,
    k: int = 1024,
    n_shards: int = 16,
    ts_col: str = "ts",
    watermark: str = "1 hour",
) -> DataFrame:
    """Streaming distinct-count sketch: each shard keeps the k smallest
    portable KMV hashes of its (disjoint, hash-partitioned) slice of
    the value space across micro-batches — the streaming face of
    ``operators/sketches.py::kmv_sketch``.

    Sharding by ``hash mod n_shards`` splits the HASH space, so the
    union of the per-shard bottom-k sets contains the global bottom-k:
    :func:`kmv_estimate_from_shards` on the latest emission per shard
    gives exactly the estimate the batch sketch would — and the EXACT
    distinct count whenever the union holds fewer than k hashes. State
    is ≤ n_shards × k longs regardless of history."""
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    from gecko_spark.operators.sketches import kmv_hash

    if k < 2:
        raise ValueError("k must be ≥ 2")
    import numpy as np

    out_schema = T.StructType(
        [
            T.StructField("shard", T.IntegerType()),
            T.StructField("hs", T.ArrayType(T.LongType())),
        ]
    )
    state_schema = T.StructType(
        [T.StructField("hs", T.ArrayType(T.LongType()))]
    )

    def update(key, pdfs, state: GroupState):
        (shard,) = key
        if state.hasTimedOut:  # pragma: no cover - no timeout configured
            state.remove()
            return
        (hs,) = state.get if state.exists else ([],)
        acc = np.asarray(hs, dtype=np.int64)
        for pdf in pdfs:
            batch = pdf["h"].to_numpy(np.int64)
            acc = np.unique(np.concatenate([acc, batch]))[:k]
        out = [int(x) for x in acc]
        state.update((out,))
        yield pd.DataFrame({"shard": [shard], "hs": [out]})

    h = kmv_hash(F.col(col))
    src = (
        events.withWatermark(ts_col, watermark)
        .select(
            F.col(ts_col),
            h.alias("h"),
            F.pmod(h, F.lit(n_shards)).cast("int").alias("shard"),
        )
    )
    return src.groupBy("shard").applyInPandasWithState(
        update,
        outputStructType=out_schema,
        stateStructType=state_schema,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def kmv_estimate_from_shards(shard_sketches: DataFrame, k: int) -> DataFrame:
    """One-row ``(n_seen, estimate)`` from the latest per-shard KMV
    emissions: union the hash sets, keep the global k smallest, apply
    the standard estimator — identical arithmetic to the batch
    ``kmv_distinct_estimate``, so stream and batch agree exactly on the
    same data. Input is ≤ n_shards rows (config-sized)."""
    from gecko_spark.operators.sketches import _M

    merged = (
        shard_sketches.select(F.explode("hs").alias("h"))
        .distinct()
        .orderBy("h")
        .limit(k)
    )
    return merged.agg(
        F.count("*").alias("n_seen"), F.max("h").alias("h_k")
    ).select(
        F.col("n_seen").cast("long").alias("n_seen"),
        F.when(F.col("n_seen") < k, F.col("n_seen").cast("double"))
        .otherwise(
            F.lit(float(k - 1)) * F.lit(float(_M)) / F.col("h_k").cast("double")
        )
        .alias("estimate"),
    )


def heavy_hitters_from_shards(
    shard_summaries: DataFrame, phi_num: int, phi_den: int
) -> DataFrame:
    """Batch finalizer for :func:`heavy_hitters_stream`: from the
    LATEST summary rows per shard, return every surviving candidate as
    ``(value, cnt_lb, n_total, confirmed)``.

    When the input carries the stream's ``emit`` ordinal (any unordered
    sink dump does), each shard is first reduced to its
    ``emit = max(emit)`` rows — the shard's current summary — so stale
    rows from earlier emissions, including values since EVICTED by MG
    truncation, are discarded rather than resurrected. Without ``emit``
    the caller must pass latest-only rows.

    ``cnt_lb`` is the Misra–Gries estimate — a LOWER bound on the true
    count (undercount ≤ n_shard/(capacity+1)). ``confirmed`` marks
    values whose lower bound ALREADY clears the φ = phi_num/phi_den
    threshold: certainly heavy, no recount needed. Unconfirmed
    candidates are the maybe-set a recount over stored data resolves
    exactly (the batch ``heavy_hitters`` path). Input is
    ≤ n_shards × capacity rows per emission — config-sized."""
    if phi_num < 1 or phi_den < 1 or phi_num >= phi_den:
        raise ValueError(f"need 0 < phi_num/phi_den < 1, got {phi_num}/{phi_den}")
    if "emit" in shard_summaries.columns:
        latest = shard_summaries.groupBy("shard").agg(F.max("emit").alias("emit"))
        shard_summaries = shard_summaries.join(
            F.broadcast(latest), ["shard", "emit"]
        ).drop("emit")
    totals = (
        shard_summaries.groupBy("shard")
        .agg(F.max("n_shard").alias("n_shard"))
        .agg(F.sum("n_shard").alias("n_total"))
    )
    return (
        shard_summaries.select("value", F.col("cnt").alias("cnt_lb"))
        .join(F.broadcast(totals))
        .select(
            "value",
            "cnt_lb",
            "n_total",
            (F.col("cnt_lb") * phi_den > phi_num * F.col("n_total")).alias(
                "confirmed"
            ),
        )
    )


def link_stream(
    records: DataFrame,
    clean: DataFrame,
    id_col: str,
    clean_id_col: str,
    on: str,
    block_stream,
    block_static,
    score: str = "levenshtein",
    max_dist: int = 2,
    min_sim: float = 0.9,
    max_block_size: Optional[int] = 10_000,
) -> DataFrame:
    """Streaming record linkage: resolve each ARRIVING record to its
    best match in a STATIC clean table (operators/linkage.py's
    ``linkage_join(keep="best")``, re-shaped for streams).

    ``max_block_size`` drops blocks with more candidates than the cap
    BEFORE the collect_list (same hot-key-guard philosophy as
    ``minhash_candidate_pairs``/``semantic_dedupe_pairs``): one
    degenerate block key — an empty-string name prefix, a default zip —
    would otherwise fold into a single multi-megabyte array row carried
    by EVERY matching stream record. Records hitting a dropped block
    resolve to null (conservative no-match); None disables the guard.

    Shape: the batch best-match window (partition by left id) is not
    available on streams, and a streaming groupBy would hold one state
    entry per record forever. Instead the decision is made ROW-LOCAL:
    the static side folds each block's candidates into ONE array row
    (``collect_list`` per block key — bounded by block size, computed
    once), the stream row equi-joins to its block's array (stream-static
    join, stateless, exactly-once per record), and one Arrow kernel
    scores every candidate and emits the argmax. Same scorers and the
    same deterministic tie-breaks as the batch operator (levenshtein:
    lowest distance then lowest id; jaro_winkler: highest similarity
    then lowest id), which is what the batch-parity test pins.

    Returns the stream's rows plus ``(match_id, match_score)`` —
    null when no candidate passes the threshold (or the block is
    unseen). ``match_id`` has the SAME type as ``clean``'s
    ``clean_id_col`` (like the batch ``linkage_join``); clean rows
    with a null id are skipped as candidates. ``block_stream``/
    ``block_static`` are Column expressions over each side (e.g.
    ``linkage.block_prefix(...)``)."""
    from gecko_spark.operators.linkage import jaro_winkler_py

    if score not in ("levenshtein", "jaro_winkler"):
        raise ValueError(
            f"score must be 'levenshtein' or 'jaro_winkler', got {score!r}"
        )

    # preserve the clean id's type end-to-end: the old cast("long")
    # silently nulled every string id (match_id always null, and null
    # cids then crashed the tie-break inside the Arrow kernel)
    id_type = clean.schema[clean_id_col].dataType

    cands = clean.groupBy(block_static.alias("__bk__")).agg(
        F.collect_list(
            F.struct(
                F.col(clean_id_col).alias("cid"),
                F.col(on).alias("cval"),
            )
        ).alias("__cands__")
    )
    if max_block_size is not None:
        cands = cands.filter(F.size("__cands__") <= max_block_size)

    def _lev(a: str, b: str) -> int:
        # classic DP — same distance Spark's levenshtein computes
        if a == b:
            return 0
        la, lb = len(a), len(b)
        if la == 0 or lb == 0:
            return la or lb
        prev = list(range(lb + 1))
        for i in range(1, la + 1):
            cur = [i] + [0] * lb
            ca = a[i - 1]
            for j in range(1, lb + 1):
                cur[j] = min(
                    prev[j] + 1,
                    cur[j - 1] + 1,
                    prev[j - 1] + (ca != b[j - 1]),
                )
            prev = cur
        return prev[lb]

    use_jw = score == "jaro_winkler"
    thresh_sim = float(min_sim)
    thresh_dist = int(max_dist)

    @F.pandas_udf(
        T.StructType(
            [
                T.StructField("match_id", id_type),
                T.StructField("match_score", T.DoubleType()),
            ]
        )
    )
    def _best(vals: pd.Series, cand: pd.Series) -> pd.DataFrame:
        ids, scores = [], []
        for v, cl in zip(vals, cand):
            best_id, best_s = None, None
            if v is not None and cl is not None:
                for c in cl:
                    cid, cval = c["cid"], c["cval"]
                    if cval is None or cid is None:
                        continue
                    if use_jw:
                        sc = jaro_winkler_py(v, cval)
                        if sc < thresh_sim:
                            continue
                        better = (
                            best_s is None
                            or sc > best_s
                            or (sc == best_s and cid < best_id)
                        )
                    else:
                        sc = float(_lev(v, cval))
                        if sc > thresh_dist:
                            continue
                        better = (
                            best_s is None
                            or sc < best_s
                            or (sc == best_s and cid < best_id)
                        )
                    if better:
                        best_id, best_s = cid, sc
            ids.append(best_id)
            scores.append(best_s)
        return pd.DataFrame({"match_id": ids, "match_score": scores})

    joined = records.withColumn("__bk__", block_stream).join(
        cands, "__bk__", "left"
    )
    out = joined.withColumn("__m__", _best(F.col(on), F.col("__cands__")))
    return (
        out.select(
            *[F.col(c) for c in records.columns],
            F.col("__m__.match_id").alias("match_id"),
            F.col("__m__.match_score").alias("match_score"),
        )
    )


def hll_registers_stream(
    events: DataFrame,
    col: str,
    m: int = 256,
    n_shards: int = 16,
    ts_col: str = "ts",
    watermark: str = "1 hour",
    output_mode: str = "update",
) -> DataFrame:
    """Streaming HyperLogLog: each shard owns the registers with
    ``reg % n_shards == shard`` and keeps their max rank across
    micro-batches — the streaming face of
    ``operators/sketches.py::hll_registers``, and the most natural
    streaming sketch there is: register max is idempotent AND
    commutative, so replays, reorderings, and duplicate deliveries
    cannot corrupt it. State is ≤ m ints TOTAL across all shards
    regardless of history; each emission carries the shard's full
    register slice (latest-summary semantics, like the KMV stream).
    Register ownership is disjoint across shards, so the union of the
    latest per-shard emissions IS the batch register table —
    :func:`hll_estimate_from_shards` reproduces
    ``hll_estimate`` bit-for-bit (asserted in tests)."""
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    from gecko_spark.operators.sketches import _hll_geometry, _hll_reg_rho_np

    _hll_geometry(m)  # validate m
    import numpy as np

    @F.pandas_udf("reg int, rho int")
    def _reg_rho(vals: pd.Series) -> pd.DataFrame:
        # tolist() keeps None as None (the kernel hashes it like '');
        # .astype(str) would mint the literal string 'None'
        reg, rho = _hll_reg_rho_np(vals.tolist(), m)
        return pd.DataFrame({"reg": reg, "rho": rho})

    out_schema = T.StructType(
        [
            T.StructField("shard", T.IntegerType()),
            T.StructField("regs", T.ArrayType(T.IntegerType())),
            T.StructField("rhos", T.ArrayType(T.IntegerType())),
        ]
    )
    state_schema = T.StructType(
        [
            T.StructField("regs", T.ArrayType(T.IntegerType())),
            T.StructField("rhos", T.ArrayType(T.IntegerType())),
        ]
    )

    def update(key, pdfs, state: GroupState):
        (shard,) = key
        if state.hasTimedOut:  # pragma: no cover - no timeout configured
            state.remove()
            return
        regs, rhos = state.get if state.exists else ([], [])
        acc = dict(zip(regs, rhos))
        for pdf in pdfs:
            part = pdf.groupby("reg")["rho"].max()
            for r, rho in part.items():
                if acc.get(r, 0) < rho:
                    acc[int(r)] = int(rho)
        regs = sorted(acc)
        rhos = [acc[r] for r in regs]
        state.update((regs, rhos))
        yield pd.DataFrame({"shard": [shard], "regs": [regs], "rhos": [rhos]})

    src = (
        events.withWatermark(ts_col, watermark)
        .select(F.col(ts_col), _reg_rho(F.col(col).cast("string")).alias("rr"))
        .select(
            F.col("rr.reg").alias("reg"),
            F.col("rr.rho").alias("rho"),
            F.pmod(F.col("rr.reg"), F.lit(n_shards)).cast("int").alias("shard"),
        )
    )
    # output_mode="append" lets the emissions land in fault-tolerant
    # append-only sinks (parquet) for restart tests / audit trails;
    # register maxima only grow, so merging ALL emissions is safe
    return src.groupBy("shard").applyInPandasWithState(
        update,
        outputStructType=out_schema,
        stateStructType=state_schema,
        outputMode=output_mode,
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def hll_estimate_from_shards(shard_rows: DataFrame, m: int = 256) -> DataFrame:
    """One-row ``(n_zero, s_int, estimate_raw, estimate)`` from the
    latest per-shard register emissions: register ownership is disjoint
    across shards, so one explode + per-register max (a no-op across
    shards, a real max across stale re-emissions of the SAME shard)
    rebuilds the batch register table exactly. Input is ≤ n_shards
    rows; the result equals batch ``hll_estimate`` bit-for-bit."""
    from gecko_spark.operators.sketches import _hll_estimate_from_registers

    regs = (
        shard_rows.select(
            F.explode(F.arrays_zip("regs", "rhos")).alias("zr")
        )
        .select(
            F.col("zr.regs").alias("reg"), F.col("zr.rhos").alias("rho")
        )
        .groupBy("reg")
        .agg(F.max("rho").alias("rho"))
    )
    return _hll_estimate_from_registers(regs, m)
