"""Plan-shape regression tests: the scale claims in README/PLANS.md,
asserted against the executed plan so refactors can't silently
reintroduce shuffles, lose pushdown, or drop broadcasts."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

import __spark_entry__ as entry

SF = "/root/testdata/sf0.001"


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_generator_spec_is_one_narrow_stage(spark, fruit_freq):
    from gecko_spark.operators import generators as G
    from gecko_spark.plans.pipeline import to_data_frame

    df = to_data_frame(
        spark,
        [
            ("fruit", G.from_frequency_table(fruit_freq, "fruit", "count")),
            ("u", G.from_uniform_distribution(0, 1)),
            ("d", G.from_datetime_range("2020-01-01", "2021-01-01", "%Y-%m-%d", "d")),
        ],
        1000,
        seed=1,
    )
    p = _plan(df)
    assert "Exchange" not in p, "generation must not shuffle"
    assert "Join" not in p, "independent columns must not join"


def test_mutator_chain_adds_no_exchange(spark, fruit_freq):
    from gecko_spark.operators import generators as G
    from gecko_spark.operators import mutators as M
    from gecko_spark.plans.pipeline import mutate_data_frame, to_data_frame

    base = to_data_frame(
        spark,
        [("fruit", G.from_frequency_table(fruit_freq, "fruit", "count"))],
        1000,
        seed=1,
        keep_index=True,
    )
    out = mutate_data_frame(
        base,
        [
            ("fruit", (0.2, M.with_delete())),
            ("fruit", (0.2, M.with_uppercase())),
            ("fruit", (0.2, M.with_repeat())),
        ],
        seed=2,
        key_columns=["__idx__"],
    )
    assert "Exchange" not in _plan(out), "pure-Column mutator chains must stay narrow"


def test_q6_filters_and_projection_reach_the_scan(spark):
    p = _plan(entry.queries()["q6_revenue_filter"](spark, SF))
    assert "PushedFilters: [IsNotNull(l_shipdate)" in p
    assert "GreaterThanOrEqual(l_shipda" in p
    # projection pruned to the 4 referenced columns
    assert "ReadSchema: struct<l_quantity:double,l_extendedprice:double,l_discount:double,l_shipdate" in p


def test_q5_dimensions_broadcast(spark):
    p = _plan(entry.queries()["q5_region_revenue"](spark, SF))
    assert "BroadcastHashJoin" in p
    assert "SortMergeJoin" not in p, "dimension joins must broadcast at this scale"


def test_asof_join_single_exchange_single_window(spark):
    p = _plan(entry.queries()["q_asof_join"](spark, SF))
    assert p.count("Window") >= 1
    # one hash exchange for the window (AQE may add nothing else)
    assert p.count("Exchange hashpartitioning") == 1
    assert "BroadcastNestedLoopJoin" not in p
    assert "CartesianProduct" not in p


def test_repetition_profile_no_keyed_shuffle(spark):
    from gecko_spark.operators.text import repetition_profile

    docs = spark.read.parquet(f"{SF}/documents.parquet")
    p = _plan(repetition_profile(docs, "doc_id", "text"))
    # The split-starvation guard may spread a single-file scan so the
    # Arrow kernel is not serialized into one task; since round 15 the
    # spread key is xxhash64(struct(*cols)) — a value-derived SPREAD,
    # not a semantic grouping. The scale invariant is that no DATA-KEY
    # (hash/range) shuffle ever appears — the profile is per-row — so
    # any hash exchange present must be the guard's xxhash64 spread.
    for frag in p.split("Exchange hashpartitioning")[1:]:
        assert frag.lstrip().startswith("(xxhash64("), (
            "profile must not hash-shuffle on a data key:\n" + p
        )
    assert "Exchange rangepartitioning" not in p, "profile must not sort-shuffle"
    assert "ArrowEvalPython" in p


def test_repetition_profile_guard_noop_on_shuffled_input(spark):
    """The starvation guard must be a no-op when the input is already
    wide (shuffle-fed): no RoundRobin repartition stacked on top."""
    from gecko_spark.operators.text import repetition_profile

    docs = (
        spark.read.parquet(f"{SF}/documents.parquet")
        .repartition(8, "doc_id")
    )
    p = _plan(repetition_profile(docs, "doc_id", "text"))
    assert "roundrobin" not in p.lower(), p


def test_pack_sequences_single_window_exchange(spark):
    from gecko_spark.operators.packing import pack_sequences

    docs = spark.read.parquet(f"{SF}/documents.parquet").select(
        "doc_id", F.length("text").alias("n_tokens")
    )
    packed = pack_sequences(docs, "doc_id", "n_tokens", budget=512, n_shards=4)
    p = _plan(packed)
    assert p.count("Exchange hashpartitioning") == 1, p
    # ROWS frame, not the peer-summing RANGE default
    assert "RowFrame" in p and "RangeFrame" not in p


def test_salted_agg_two_level_plan(spark):
    from gecko_spark.operators.skew import salted_groupby_agg

    o = spark.read.parquet(f"{SF}/orders.parquet")
    out = salted_groupby_agg(
        o, ["o_orderpriority"], {"n": ("count", "o_orderkey")}, buckets=8
    )
    p = _plan(out)
    # two aggregation exchanges: (key, salt) partial then key merge
    assert p.count("Exchange hashpartitioning") == 2, p
    assert "__salt__" in p


def test_cm_estimate_broadcasts_sketch(spark):
    from gecko_spark.operators.sketches import cm_estimate, cm_sketch

    o = spark.read.parquet(f"{SF}/orders.parquet")
    sk = cm_sketch(o, "o_orderpriority", depth=3, width=64)
    est = cm_estimate(sk, ["1-URGENT"], depth=3, width=64)
    p = _plan(est)
    assert "BroadcastHashJoin" in p and "BuildRight" in p, p


def test_kmv_overlap_materializes_sketches_once(spark):
    """Round 14 opt: kmv_overlap_estimate references each truncated
    sketch 3× and the merged set 2× — without the localCheckpoint
    boundary the caller's corpus-sized sketch pipeline re-executed per
    reference (8 parquet scans, 16 kernel runs in the executed plan).
    The final plan must read only checkpointed RDDs."""
    from gecko_spark.operators.sketches import kmv_overlap_estimate, kmv_sketch

    o = spark.read.parquet(f"{SF}/orders.parquet")
    a = o.filter(F.col("o_orderkey") % 2 == 0).select(
        F.col("o_custkey").cast("string").alias("v")
    )
    b = o.filter(F.col("o_orderkey") % 2 == 1).select(
        F.col("o_custkey").cast("string").alias("v")
    )
    est = kmv_overlap_estimate(kmv_sketch(a, "v", 64), kmv_sketch(b, "v", 64), 64)
    # round 15: the boundary is a persist (lazy build — an eager OR
    # lazy localCheckpoint runs the corpus pipeline at construction
    # time under AQE), so parquet scans legitimately appear BENEATH the
    # InMemoryRelation definitions. A genuine re-scan would be a
    # parquet LEAF of the optimized plan, outside any cached subtree.
    leaves = est._jdf.queryExecution().optimizedPlan().collectLeaves()
    kinds = [leaves.apply(i).nodeName() for i in range(leaves.size())]
    parquet_leaves = [k for k in kinds if "Relation" in k and "InMemory" not in k]
    assert not parquet_leaves, (
        "overlap estimate must run on the persisted ≤k-row sketches, "
        f"not re-execute the corpus pipeline per reference: {kinds}"
    )
    assert kinds.count("InMemoryRelation") >= 4, (
        f"expected every sketch reference to read a cache: {kinds}"
    )


def test_vocab_divergence_caches_vocab_join(spark):
    """Round 14 opt: the (term, cnt_a, cnt_b) union-vocab frame feeds
    both the totals broadcast and the scored main pass; unpersisted,
    both corpus tokenize+aggregate passes re-executed per consumer."""
    from gecko_spark.operators.text import vocab_divergence

    d = spark.read.parquet(f"{SF}/documents.parquet")
    out = vocab_divergence(
        d.filter(F.col("doc_id") % 2 == 0),
        d.filter(F.col("doc_id") % 2 == 1),
        "text",
        k=5,
    )
    p = _plan(out)
    assert p.count("InMemoryTableScan") >= 2, (
        "both consumers of the vocab join must read the cache:\n" + p
    )


def test_query_catalogue_invariants():
    """VERDICT r7 #5: queries() is BUILT from WINDOW_50 + the catalogue
    pair list, so the driver window cannot silently diverge — duplicate
    names in a dict literal would have collapsed silently; the pair
    list makes them detectable and this test pins it."""
    names = [n for n, _ in entry._CATALOGUE_PAIRS]
    dupes = sorted({n for n in names if names.count(n) > 1})
    assert not dupes, f"duplicate catalogue keys: {dupes}"

    assert len(entry.WINDOW_50) == 50
    assert len(set(entry.WINDOW_50)) == 50
    q = entry.queries()
    assert list(q)[:50] == entry.WINDOW_50  # window leads, in order
    assert len(q) == len(names)  # every catalogue entry surfaces
    # every oracle key has a query; callables are callable
    o = entry.oracle_sql()
    assert set(o) <= set(q)
    assert all(callable(f) for f in q.values())


def test_contract_schemas_are_scalar_only(spark):
    """VERDICT r8 #1 guard: the driver's canonicalizer pandas-sorts RAW
    column values, so an array/map/struct-typed column in ANY contract
    query crashes the hard gate (``TypeError: unhashable type: 'list'``
    — exactly how mm_image_features/mm_audio_features errored in
    CORRECTNESS_r08.json despite being oracle-correct). Pin every
    catalogue entry to scalar-only top-level columns. Streaming parity
    entries execute real micro-batch runs inside their builders, so
    they are exercised in test_streaming / check_oracle instead; their
    non-stream siblings cover the schema shapes here."""
    from pyspark.sql import types as T

    skip = {  # builders that RUN streams/writes; schema covered elsewhere
        "stream_dedupe_parity",
        "stream_user_stats_parity",
        "stream_warc_parity",
        "dedup_incremental_index",
    }
    bad = {}
    for name, fn in entry._CATALOGUE_PAIRS:
        if name in skip:
            continue
        df = fn(spark, SF)
        nested = [
            f"{f.name}: {f.dataType.simpleString()}"
            for f in df.schema.fields
            if isinstance(f.dataType, (T.ArrayType, T.MapType, T.StructType))
        ]
        if nested:
            bad[name] = nested
    assert not bad, f"non-scalar contract columns (driver-sort crash): {bad}"
