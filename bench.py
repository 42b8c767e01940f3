"""Benchmark harness: headline queries at $SPARK_GRAFT_SF_DIR (default
sf0.1) plus the BASELINE.md workload shapes (generate + mutate 1M rows)
on local[$SPARK_GRAFT_CPUS].

Prints ONE JSON line:
  {"metric": ..., "value": total_sec, "unit": "sec",
   "queries": {name: sec, ...}, "sf": ...}

Comparison points (BASELINE.md §B, reference @ 1M rows, single core):
  gen from_frequency_table 23ms · from_multicolumn 1.12s · uniform 0.75s
  · datetime 0.77s · with_delete 0.64s · with_missing 0.10s ·
  replacement(inline, 5 rules) 5.29s · phonetic(4+ rules) 16.88s ·
  3-spec mutate_data_frame 7.10s
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import pandas as pd  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402

from gecko_spark import get_spark  # noqa: E402
from gecko_spark.operators import generators as G  # noqa: E402
from gecko_spark.operators import mutators as M  # noqa: E402
from gecko_spark.plans.pipeline import mutate_data_frame, to_data_frame  # noqa: E402
from gecko_spark.sources.testdata import load_table  # noqa: E402

import __spark_entry__ as entrymod  # noqa: E402

BENCH_N = 1_000_000

# A/B attribution support (VERDICT r10 #1): a comma-separated entry
# list in $SPARK_GRAFT_BENCH_EXCLUDE skips those entries AND their
# off-timer setup work (index builds, fixture replication) — so a run
# excluding the round-10 additions reproduces the round-9 session
# shape exactly, in a fresh JVM, for band-vs-band comparison. Normal
# driver runs leave it unset.
EXCLUDE = frozenset(
    filter(None, os.environ.get("SPARK_GRAFT_BENCH_EXCLUDE", "").split(","))
)

# Stable cross-round comparison set (VERDICT r6 #10): these 25 entries
# have existed unchanged since round 5, so their sum is comparable
# round-over-round even as the full suite grows ~5 entries per round.
# The driver JSON reports BOTH totals; do not add to or reorder this
# list when adding bench entries — new entries only affect the full
# total.
HEADLINE_25 = [
    "gen_1m_4cols",
    "mut_1m_edit_chain",
    "mut_1m_replacement_inline",
    "mut_1m_phonetic",
    "mut_1m_regex_table",
    "mut_1m_3spec_e2e",
    "q1_pricing_summary",
    "q3_shipping_priority",
    "q5_region_revenue",
    "q_window_topk_orders",
    "q_events_hourly",
    "q_events_sessions",
    "dedup_exact",
    "dedup_minhash_pairs",
    "dedup_transitive",
    "text_stats",
    "text_line_dedupe",
    "text_unigram_logprob",
    "text_chunks",
    "sketch_quantiles",
    "sketch_heavy_hitters",
    "topk_cosine_bruteforce",
    "decontam_filter",
    "q_skew_join",
    "q21_waiting_supplier",
]

OCR = pd.DataFrame(
    {"source": ["l", "rn", "O", "5", "cl"], "target": ["1", "m", "0", "S", "d"]}
)
PHON = pd.DataFrame(
    {
        "source": ["ph", "th", "Cust", "er", "an", "on"],
        "target": ["f", "t", "Kust", "a", "en", "un"],
        "flags": ["", "", "^", "$", "", ""],
    }
)


def _run(df):
    """Force full evaluation of every column (noop sink — no I/O cost)."""
    df.write.mode("overwrite").format("noop").save()


def _gen_1m(spark, seed=11):
    return to_data_frame(
        spark,
        [
            ("fruit", G.from_frequency_table(entrymod.FRUITS, "fruit", "count")),
            (
                ("f2", "t2"),
                G.from_multicolumn_frequency_table(
                    entrymod.FRUIT_TYPES, ["fruit", "type"], "count"
                ),
            ),
            ("u", G.from_uniform_distribution(0, 1, precision=6)),
            ("d", G.from_datetime_range("2020-01-01", "2023-12-31", "%Y-%m-%d", "d")),
        ],
        BENCH_N,
        seed=seed,
        keep_index=True,
    )


def bench_queries(spark, sf_dir):
    out = {}
    errors = {}
    # LIGHT protocol (round 14): under the multi-session parent each
    # child halves its in-session reps — the cross-session median over
    # N fresh JVMs carries the statistical weight, so paying 13 reps
    # per entry per session triples wall time for variance the session
    # combine already absorbs. Set by the parent; a solo run
    # (SPARK_GRAFT_BENCH_SESSIONS=1) keeps the full protocol.
    light = os.environ.get("SPARK_GRAFT_BENCH_LIGHT") == "1"
    max_warm, n_timed = (4, 3) if light else (8, 5)
    n_timed_slow = 2 if light else 3

    def timed(name, thunk):
        # Adaptive warmup, then median of 3 timed runs. Round-6 profiling
        # (30-run solo loop, GC log attached) showed the first ~8
        # executions of a fresh query decay 1.3 s → 0.58 s as C2 compiles
        # the generated stage code + Arrow paths — no Full GC, max pause
        # 57 ms, python workers stable — so a single fixed warmup can
        # leave the median sitting on the JIT decay slope (that slope,
        # sampled at different depths per session, was the whole
        # r4→r5 "mut_1m_replacement_inline regression": 0.835 vs 1.533 s
        # committed, 0.55–0.7 s steady in every solo profile). Warm until
        # a run lands within ±15% of the BEST run seen so far (≤8
        # warmups): on the decay slope new minima keep appearing and
        # non-minimum runs sit far above the best, so the band is only
        # entered once the series flattens — a consecutive-pair test
        # would break early mid-slope (successive decaying runs agree
        # within 20% while still 2× steady state). Each entry is
        # isolated: a failing query records an error entry instead of
        # killing the whole bench (round 3 lost its entire bench line
        # to one AnalysisException).
        if name in EXCLUDE:
            return
        try:
            best = None
            for _ in range(max_warm):
                t0 = time.time()
                thunk()
                dt = time.time() - t0
                if best is not None and 0.85 * best <= dt <= 1.15 * best:
                    break
                best = dt if best is None else min(best, dt)
            runs = []
            for _ in range(n_timed):
                t0 = time.time()
                thunk()
                runs.append(time.time() - t0)
            runs.sort()
            _record(name, runs, n_runs=n_timed)
        except Exception as ex:  # noqa: BLE001 — keep the bench alive
            errors[name] = f"{type(ex).__name__}: {str(ex).splitlines()[0][:200]}"

    def timed_slow(name, thunk):
        # Reduced protocol for MINUTE-scale composite entries
        # (curation_e2e ~65 s/rep at sf0.1): one fixed warmup + 3 timed
        # runs. The adaptive-warmup rationale doesn't transfer — a
        # composite chain spends its time in dozens of distinct stages
        # plus driver-side fit/CC work, so there is no single JIT decay
        # slope to wait out, and 13 reps of a minute-long chain would
        # double the whole bench. The dispersion band is med/lo/hi of
        # the 3 timed runs, marked n_runs=3 in the artifact so
        # band-vs-band comparisons know the sample size.
        if name in EXCLUDE:
            return
        try:
            thunk()
            runs = []
            for _ in range(n_timed_slow):
                t0 = time.time()
                thunk()
                runs.append(time.time() - t0)
            runs.sort()
            _record(name, runs, n_runs=n_timed_slow)
        except Exception as ex:  # noqa: BLE001 — keep the bench alive
            errors[name] = f"{type(ex).__name__}: {str(ex).splitlines()[0][:200]}"

    def _record(name, runs, n_runs=None):
        # per-entry dispersion (VERDICT r7 #2): med + min/max over the
        # timed runs, so a committed regression separates from machine
        # drift without archaeology — the round-8 profiling showed
        # identical code varying 1.4× across sessions on
        # shuffle-task-dense entries
        entry = {
            "med": round(runs[len(runs) // 2], 3),
            "lo": round(runs[0], 3),
            "hi": round(runs[-1], 3),
        }
        if n_runs is not None:
            entry["n_runs"] = n_runs
        out[name] = entry

    # --- generation + mutation at the reference's 1M-row scale ----------
    timed("gen_1m_4cols", lambda: _run(_gen_1m(spark)))

    base = _gen_1m(spark).persist()
    base.count()
    try:
        timed(
            "mut_1m_edit_chain",
            lambda: _run(
                mutate_data_frame(
                    base,
                    [
                        ("fruit", (0.1, M.with_delete())),
                        ("fruit", (0.1, M.with_insert())),
                        ("f2", (0.1, M.with_substitute())),
                        ("t2", (0.1, M.with_transpose())),
                        ("u", (0.1, M.with_missing_value())),
                        ("d", (0.1, M.with_uppercase())),
                    ],
                    seed=13,
                    key_columns=["__idx__"],
                )
            ),
        )
        timed(
            "mut_1m_replacement_inline",
            lambda: _run(
                M.with_replacement_table(OCR, "source", "target", inline=True).apply(
                    base, "fruit", 0.1, seed=14
                )
            ),
        )
        timed(
            "mut_1m_phonetic",
            lambda: _run(
                M.with_phonetic_replacement_table(
                    PHON, "source", "target", "flags"
                ).apply(base, "fruit", 0.1, seed=15)
            ),
        )
        regex_tbl = pd.DataFrame(
            {
                "pattern": [r"(?P<y>\d{4})-(?P<m>\d{2})-(?P<d>\d{2})"],
                "y": ["(?P<y>)"],
                "m": ["(?P<d>)"],
                "d": ["(?P<m>)"],
            }
        )
        timed(
            "mut_1m_regex_table",
            lambda: _run(
                M.with_regex_replacement_table(
                    regex_tbl, pattern_column="pattern"
                ).apply(base, "d", 0.1, seed=17)
            ),
        )
        timed(
            "mut_1m_3spec_e2e",
            lambda: _run(
                mutate_data_frame(
                    base,
                    [
                        (
                            "fruit",
                            (0.1, M.with_replacement_table(OCR, "source", "target", inline=True)),
                        ),
                        (("f2", "t2"), (0.1, M.with_permute())),
                        ("d", (0.1, M.with_transpose())),
                    ],
                    seed=16,
                    key_columns=["__idx__"],
                )
            ),
        )
    finally:
        base.unpersist()

    # --- relational headline queries at sf ------------------------------
    qs = entrymod.queries()
    for name in [
        "q1_pricing_summary",
        "q3_shipping_priority",
        "q5_region_revenue",
        "q_window_topk_orders",
        "q_events_hourly",
        "q_events_sessions",
    ]:
        timed(name, lambda n=name: _run(qs[n](spark, sf_dir)))

    # --- training-data ops at sf ----------------------------------------
    for name in [
        "dedup_exact",
        "dedup_minhash_pairs",
        "dedup_incremental_index",  # round 8: batch-vs-persisted-index dedupe
        "dedup_transitive",  # round 5: CC edge-checkpoint fix made it benchable
        "dedup_semantic_pairs",  # round 5: SemDeDup-style clustered near-dup
        "text_stats",
        "text_line_dedupe",
        "text_unigram_logprob",
        "text_chunks",
        "text_strip_html",  # round 5: HTML boilerplate strip (planted markup)
        "text_url_normalize",  # round 5: URL canonicalization (planted URLs)
        "sample_split",  # round 5: deterministic train/val/test assignment
        "dedup_cluster_reps",  # round 5: quality-aware cluster survivorship
        "dedup_fp_overlap",  # round 5: winnowing-fingerprint near-dup pairs
        "sketch_quantiles",
        "sketch_heavy_hitters",  # round 5: MG candidates + exact recount
        "topk_cosine_bruteforce",
        "decontam_filter",
        "text_repetition",
        "q_skew_join",
        "q21_waiting_supplier",
        "q_linkage_blocked",  # round 6: blocked levenshtein linkage join
        "q_linkage_snm",  # round 6: two-phase-rank sorted neighborhood
        "q_linkage_jw",  # round 6: Jaro-Winkler Arrow kernel (honest per-pair python cost)
        "q_linkage_fs",  # round 6: Fellegi-Sunter literal-odds scoring, pure codegen
        "text_bigram_logprob",  # round 8: stupid-backoff bigram LM score
        "text_gopher_quality",  # round 8: Gopher A1.1.1 rule gate (pure HOF)
        "text_gopher_repetition",  # round 8: Gopher A1.1.2, one Arrow kernel
        "text_c4_clean",  # round 8: C4 line-rewriting gate, pure HOF
        "text_quality_classifier",  # round 8: hashed-BoW linear gate, one Arrow projection
        "text_bm25_topk",  # round 12: BM25 retrieval, broadcast-pruned postings
    ]:
        timed(name, lambda n=name: _run(qs[n](spark, sf_dir)))

    # main-content extraction over the documents table wrapped in
    # planted HTML (nav + article + footer per doc) — the contract
    # entry runs on a tiny fixture, so the bench times the kernel at
    # corpus scale instead
    def _main_content():
        from gecko_spark.operators.text import extract_main_content

        docs = load_table(spark, sf_dir, "documents")
        html = F.concat(
            F.lit('<html><body><nav><a href="/">Home</a> '
                  '<a href="/a">About</a> <a href="/c">Contact</a></nav>'
                  "<article><p>"),
            F.col("text"),
            F.lit('</p></article><footer>(c) <a href="/p">Privacy</a>'
                  "</footer></body></html>"),
        )
        _run(docs.select("doc_id", extract_main_content(html).alias("main")))

    timed("text_main_content_corpus", _main_content)

    # matrix-scoring top-k at a 100-query load (the HOF path is ~5×
    # slower here and the gap grows with queries × dim)
    def _matrix_topk():
        from gecko_spark.operators.similarity import cosine_topk_matrix

        emb = load_table(spark, sf_dir, "embeddings")
        queries = emb.filter(F.col("vec_id") < 100).select(
            F.col("vec_id").alias("query_id"), F.col("embedding").alias("query_vec")
        )
        _run(cosine_topk_matrix(emb, queries, k=10))

    timed("topk_cosine_matrix_100q", _matrix_topk)

    # semantic dedup, production mode (round 6): per-cluster BLAS gram
    # scoring — the contract entry above pins method="fold" for oracle
    # parity; this entry tracks the path a 100 TB run would use
    def _semantic_matrix():
        from gecko_spark.operators.dedup import semantic_dedupe_pairs

        emb = load_table(spark, sf_dir, "embeddings")
        _run(
            semantic_dedupe_pairs(
                emb, "vec_id", "embedding", threshold=0.1, n_clusters=16,
                init="first_k", method="matrix",
            )
        )

    timed("dedup_semantic_matrix", _semantic_matrix)

    # PQ search at a 100-query load: ADC over 8-byte codes + exact
    # re-rank of the shortlist (codes built once outside the timer — at
    # scale the compressed index is persisted, search is the hot path)
    from gecko_spark.operators.similarity import (
        pq_encode,
        pq_topk_rerank,
        pq_train,
    )

    emb = load_table(spark, sf_dir, "embeddings")
    pq_queries = emb.filter(F.col("vec_id") < 100).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("query_vec")
    )
    if "topk_pq_rerank_100q" not in EXCLUDE:
        books = pq_train(emb, m=8, k_codes=16, seed=0)
        codes = pq_encode(emb, books).persist()
        codes.count()
        try:
            timed(
                "topk_pq_rerank_100q",
                lambda: _run(
                    pq_topk_rerank(codes, books, emb, pq_queries, k=10, shortlist=100)
                ),
            )
        finally:
            codes.unpersist()

    # residual IVFADC at the same 100-query load (round 10): index
    # built once outside the timer (persisted at scale); search scans
    # only the probed lists' codes vs pq_rerank's full-corpus ADC
    from gecko_spark.operators.similarity import cosine_topk_ivfpq, ivfpq_build

    if {"topk_ivfpq_100q", "topk_ivfpq_indexed_100q"} - EXCLUDE:
        ivfpq_codes, ivfpq_cents, ivfpq_books = ivfpq_build(
            emb, n_centroids=16, m=8, seed=0
        )
        ivfpq_codes = ivfpq_codes.persist()
        ivfpq_codes.count()
        import shutil
        import tempfile

        _ivfpq_dir = tempfile.mkdtemp(prefix="bench_ivfpq_")
        try:
            timed(
                "topk_ivfpq_100q",
                lambda: _run(
                    cosine_topk_ivfpq(
                        ivfpq_codes, ivfpq_cents, ivfpq_books, emb, pq_queries,
                        k=10, nprobe=4, shortlist=100,
                    )
                ),
            )
            # IVFADC through the PERSISTED index (VERDICT r10 #5): the
            # deployment path — build+write happen once per corpus
            # lifetime (outside the timer); every search session pays
            # read sidecars + a partition-pruned probe of
            # ~nprobe/n_lists of the code files.
            from gecko_spark.operators.similarity import (
                read_ivfpq_index,
                write_ivfpq_index,
            )

            if "topk_ivfpq_indexed_100q" not in EXCLUDE:
                write_ivfpq_index(ivfpq_codes, ivfpq_cents, ivfpq_books, _ivfpq_dir)
                rcodes, _rc, _rb = read_ivfpq_index(spark, _ivfpq_dir)
                # plan guard (reuses
                # test_ivfpq_index_roundtrip_partition_pruned's check):
                # the probed scan must reach the source with the list
                # filter — recorded as an error entry, never an abort
                probe_plan = (
                    rcodes.filter(F.col("__ivf_list__").isin([0, 1]))
                    ._jdf.queryExecution().executedPlan().toString()
                )
                if "__ivf_list__" not in probe_plan:
                    errors["topk_ivfpq_indexed_100q__planshape"] = (
                        "probed read not partition-pruned: __ivf_list__ "
                        "filter missing from executed plan"
                    )

                def _ivfpq_indexed():
                    codes2, cents2, books2 = read_ivfpq_index(spark, _ivfpq_dir)
                    _run(
                        cosine_topk_ivfpq(
                            codes2, cents2, books2, emb, pq_queries,
                            k=10, nprobe=4, shortlist=100,
                        )
                    )

                timed("topk_ivfpq_indexed_100q", _ivfpq_indexed)
        finally:
            ivfpq_codes.unpersist()
            shutil.rmtree(_ivfpq_dir, ignore_errors=True)

    # WARC ingestion scan (round 10): the committed fixture crawl
    # replicated 128× into per-file partitions — times the Python
    # DataSource parse path (header scan + HTTP split per record),
    # which is the per-byte cost a 100 TB crawl ingest pays
    import shutil
    import tempfile

    from gecko_spark.sources.warc import read_warc, warc_to_corpus

    if "warc_scan_128seg" not in EXCLUDE:
        _warc_fix = os.path.join(
            os.path.dirname(os.path.abspath(__file__)),
            "tests", "fixtures", "corpus.warc.gz",
        )
        _warc_dir = tempfile.mkdtemp(prefix="bench_warc_")
        for i in range(128):
            shutil.copy(_warc_fix, os.path.join(_warc_dir, f"seg-{i:03d}.warc.gz"))
        try:
            timed(
                "warc_scan_128seg",
                lambda: _run(
                    warc_to_corpus(
                        read_warc(spark, os.path.join(_warc_dir, "*.warc.gz"))
                    ).select("doc_id", F.length("text").alias("n"), "meta")
                ),
            )
        finally:
            shutil.rmtree(_warc_dir, ignore_errors=True)

    # exact substring-span dedup (round 10, Lee et al. ExactSubstr): the
    # stride-1 window-hash pipeline over the full documents table —
    # prices the honest ~1-row-per-char detection cost (winnowing is the
    # documented scale knob)
    def _substring_spans(winnow=1):
        from gecko_spark.operators.dedup import substring_dup_spans

        docs = load_table(spark, sf_dir, "documents")
        _run(substring_dup_spans(docs, "doc_id", "text", window=40, winnow=winnow))

    timed("dedup_substring_spans", _substring_spans)
    # winnow=8 is the documented at-scale default (SCALE.md addendum 2:
    # 0.218× rows kept) — tracked separately so a regression in the
    # RECOMMENDED configuration is visible in dispersion, not just the
    # stride-1 audit mode (VERDICT r10 #4)
    timed("dedup_substring_winnowed", lambda: _substring_spans(winnow=8))

    # the excision path: spans → keep-first filter → pure-Column stitch
    # of text_clean — what a pretraining pipeline actually materializes
    def _substring_excise():
        from gecko_spark.operators.dedup import substring_dedupe

        docs = load_table(spark, sf_dir, "documents")
        _run(
            substring_dedupe(docs, "doc_id", "text", window=40).select(
                "doc_id", F.length("text_clean").alias("n")
            )
        )

    timed("dedup_substring_excise", _substring_excise)

    # --- skew datapoint: salted vs plain agg+join under one hot key -----
    # One user owns ~20% of all events; quantifies when the salt pays.
    def _skew_workload(salted):
        from gecko_spark.operators.skew import salted_groupby_agg

        ev = load_table(spark, sf_dir, "events")
        hot = ev.withColumn(
            "user_id",
            F.when(F.expr("event_id % 5 = 0"), F.lit(7)).otherwise(F.col("user_id")),
        )
        if salted:
            agg = salted_groupby_agg(
                hot,
                ["user_id"],
                {"n": ("count", "user_id"), "sv": ("sum", "value")},
                buckets=32,
            )
        else:
            agg = hot.groupBy("user_id").agg(
                F.count("*").alias("n"), F.sum("value").alias("sv")
            )
        _run(agg)

    timed("skew_hotkey_salted", lambda: _skew_workload(True))
    timed("skew_hotkey_plain", lambda: _skew_workload(False))

    # --- skew datapoint 2: the JOIN case the salt exists for ------------
    # One hot key owns 50% of a 10M-row probe side with a 64-char
    # payload; SMJ forced (broadcast off) and AQE's skew-split disabled
    # to isolate the salt: plain SMJ sorts the whole hot key (5M rows,
    # ~300 MB) in ONE reducer, salted_join (skew.py:73) spreads it over
    # 16. Measured crossover at this shape: salted ~3.0 s vs plain
    # ~4.0 s; at a 20%-hot/no-payload shape plain wins (README's
    # "when salting pays" note) — per-reducer hot-key work must dominate
    # the ×buckets replication of the build side. AQE skew-join is the
    # first line of defense in production; the salt covers what it can't
    # (deterministic retry semantics, skewed GROUP BY state).
    def _hotjoin_workload(salted):
        from gecko_spark.operators.skew import salted_join

        n, keys = 10_000_000, 50_000
        left = spark.range(0, n).select(
            F.when(F.col("id") % 2 == 0, F.lit(7))
            .otherwise(F.pmod(F.col("id"), F.lit(keys)))
            .alias("k"),
            F.col("id").alias("pk"),
            F.sha2(F.col("id").cast("string"), 256).alias("payload"),
        )
        right = spark.range(0, keys).select(
            F.col("id").alias("k"), (F.col("id") * 2).alias("rv")
        )
        conf = spark.conf
        old_bc = conf.get("spark.sql.autoBroadcastJoinThreshold")
        old_skew = conf.get("spark.sql.adaptive.skewJoin.enabled")
        conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        conf.set("spark.sql.adaptive.skewJoin.enabled", "false")
        try:
            if salted:
                j = salted_join(left, right, ["k"], buckets=16, salt_on=["pk"])
            else:
                j = left.join(right, "k")
            _run(j)
        finally:
            conf.set("spark.sql.autoBroadcastJoinThreshold", old_bc)
            conf.set("spark.sql.adaptive.skewJoin.enabled", old_skew)

    timed("skew_hotjoin_salted", lambda: _hotjoin_workload(True))
    timed("skew_hotjoin_plain", lambda: _hotjoin_workload(False))

    # --- round-11 additions (appended LAST: the r10 bench-shift
    # attribution showed new entries pressure the shared session, so
    # they run after every pre-existing dispersion-tracked entry) -----
    def _hll(m=256):
        from gecko_spark.operators.sketches import hll_estimate

        li = load_table(spark, sf_dir, "lineitem").select(
            F.col("l_partkey").cast("string").alias("v")
        )
        _run(hll_estimate(li, "v", m=m))

    timed("sketch_hll_600k", _hll)

    def _zorder():
        from gecko_spark.operators.layout import cluster_by_zorder

        ev = load_table(spark, sf_dir, "events").select(
            "event_id", "user_id", F.unix_micros("ts").alias("tus")
        )
        _run(
            cluster_by_zorder(
                ev, ["user_id", "tus"], bits=16, num_partitions=32
            )
        )

    timed("layout_zorder_cluster", _zorder)

    def _bpe():
        from gecko_spark.operators.text import bpe_train

        docs = load_table(spark, sf_dir, "documents")
        merges = bpe_train(docs, "text", n_merges=32, sample_rows=None)
        assert len(merges) > 0

    timed("text_bpe_train32", _bpe)

    def _dsir():
        from gecko_spark.core import LcgRandom
        from gecko_spark.operators.selection import (
            dsir_log_weights,
            fit_log_ratio_micro,
            gumbel_topk,
            hashed_ngram_bucket_counts,
        )

        docs = load_table(spark, sf_dir, "documents")
        target = docs.filter(F.col("doc_id") % 7 == 0)
        lr = fit_log_ratio_micro(
            hashed_ngram_bucket_counts(target, n_buckets=4096),
            hashed_ngram_bucket_counts(docs, n_buckets=4096),
            4096,
        )
        _run(
            gumbel_topk(
                dsir_log_weights(docs, lr), 500, LcgRandom("doc_id", seed=11)
            )
        )

    # full DSIR chain: two fit scans + integer serve + Gumbel top-k
    timed("dsir_select_e2e", _dsir)

    def _opq():
        from gecko_spark.operators.similarity import (
            opq_train,
            pq_encode,
            pq_topk_adc,
            rotate_vectors,
        )

        emb = load_table(spark, sf_dir, "embeddings")
        R, books = opq_train(emb, m=8, k_codes=16, seed=0, opq_iters=3)
        rotated = rotate_vectors(emb, R)
        codes = pq_encode(rotated, books)
        qs = rotated.filter(F.col("vec_id") < 100).select(
            F.col("vec_id").alias("query_id"),
            F.col("embedding").alias("query_vec"),
        )
        _run(pq_topk_adc(codes, books, qs, k=10))

    # OPQ end-to-end: rotation train + rotate + encode + 100-query ADC
    timed("opq_train_encode_adc", _opq)

    def _bm25_indexed():
        # search ONLY — the index is built off-timer below, the serving
        # shape (build once, search many); partition-pruned postings
        # scan + the shared integer-exact scoring tail
        from gecko_spark.operators.retrieval import bm25_topk_indexed

        docs = load_table(spark, sf_dir, "documents")
        queries = docs.filter(F.col("doc_id") % 151 == 3).select(
            F.col("doc_id").alias("query_id"),
            F.substring(F.col("text"), 1, 80).alias("query_text"),
        )
        _run(bm25_topk_indexed(spark, _bm25_idx_path, queries, k=10))

    if "bm25_topk_indexed_34q" not in EXCLUDE:
        import shutil as _shutil
        import tempfile as _tempfile

        from gecko_spark.operators.retrieval import write_bm25_index

        _bm25_idx_path = _tempfile.mkdtemp(prefix="bm25_idx_")
        try:
            write_bm25_index(
                load_table(spark, sf_dir, "documents"), _bm25_idx_path,
                n_buckets=64,
            )
            timed("bm25_topk_indexed_34q", _bm25_indexed)
        finally:
            _shutil.rmtree(_bm25_idx_path, ignore_errors=True)

    def _curation():
        # full 12-stage curation chain (examples/corpus_curation.py::
        # curate_to_sequences): strip → gates → exact/minhash/semantic/
        # substring dedup → decontam → classifier → enrich → as-of →
        # split → DSIR select → global shards → pack_texts. The
        # components are benched individually above; this entry times
        # their COMPOSITION, where the failure mode is a missing
        # persist boundary (the post-curation stages are multi-pass —
        # without the persist each of their four actions re-executes
        # the whole dedup gauntlet). The plan assertion pins the
        # bound: the final sequences plan must NOT re-scan
        # documents.parquet at all — every document byte it reads
        # flows from the persisted train split (documents scans
        # appear only beneath the InMemoryRelation's cached plan).
        import examples.corpus_curation as cc

        seqs, cached = cc.curate_to_sequences(spark, sf_dir)
        try:
            _run(seqs)
            # leaves of the OPTIMIZED plan: cached subtrees collapse to
            # InMemoryRelation leaves, so any documents.parquet leaf
            # here is a genuine re-scan of the corpus (measured shape:
            # exactly 3 leaves — train cache ×2 + broadcast offsets)
            leaves = seqs._jdf.queryExecution().optimizedPlan().collectLeaves()
            doc_scans = sum(
                1
                for i in range(leaves.size())
                if "documents.parquet"
                in leaves.apply(i).toString().splitlines()[0]
            )
            assert doc_scans == 0, (
                f"curation_e2e: final plan re-scans documents.parquet "
                f"{doc_scans}x — the persist boundary is not holding"
            )
        finally:
            for c in cached:
                c.unpersist()

    timed_slow("curation_e2e", _curation)

    return out, errors


def _env_fingerprint(cpus):
    """One-line environment fingerprint recorded with every bench run:
    separates machine drift from code regressions when comparing
    rounds (VERDICT r7 #2)."""
    import platform

    fp = {"cpus": cpus, "platform": platform.platform()}
    try:
        with open("/proc/loadavg") as f:
            fp["loadavg_start"] = float(f.read().split()[0])
        with open("/proc/meminfo") as f:
            mem = dict(
                line.split(":")[:2] for line in f.read().splitlines() if ":" in line
            )
        fp["mem_available_gb"] = round(
            int(mem.get("MemAvailable", "0 kB").split()[0]) / 1024**2, 1
        )
        with open("/proc/stat") as f:
            v = list(map(int, f.readline().split()[1:]))
        t0 = sum(v)
        time.sleep(0.5)
        with open("/proc/stat") as f:
            w = list(map(int, f.readline().split()[1:]))
        d = [b - a for a, b in zip(v, w)]
        tot = sum(d) or 1
        fp["cpu_busy_pct"] = round(100 * (1 - d[3] / tot), 1)  # non-idle
        fp["cpu_steal_pct"] = round(100 * d[7] / tot, 1) if len(d) > 7 else 0.0
    except OSError:
        pass
    return fp


# The driver ingests only a bounded tail of stdout: round 8's line —
# with full per-entry {med,lo,hi} dispersion dicts — outgrew it and
# BENCH_r08.json recorded rc=0 but parsed=null, losing the round's
# official perf record (VERDICT r8 #2). The stdout line is therefore a
# compact med-only summary under a hard size cap, and the full
# dispersion goes to a committed artifact file instead.
DISPERSION_FILE = "BENCH_DISPERSION.json"
STDOUT_LINE_CAP = 1900  # r8's artifact kept a 2000-char tail; stay under


def detect_regressions(new_queries: dict, prior: dict) -> dict:
    """Band-vs-band comparison against the PREVIOUS committed
    dispersion artifact (VERDICT r10 #8 — the r9→r10 session-level
    shift was found only by round-11 archaeology; this makes the bench
    artifact catch it itself). An entry regresses when its dispersion
    band is DISJOINT above the prior band — ``new lo > prior hi`` — the
    same criterion the round-10 judge applied: overlapping bands are
    run-to-run drift, disjoint bands are a real shift (code or
    session). Entries without {med,lo,hi} dicts on either side are
    skipped (old med-only artifacts, error entries)."""
    out = {}
    for q, v in new_queries.items():
        p = prior.get(q)
        if not (isinstance(v, dict) and isinstance(p, dict)):
            continue
        if not {"med", "lo", "hi"} <= (set(v) & set(p)):
            continue
        if v["lo"] > p["hi"]:
            out[q] = {
                "lo": v["lo"],
                "prior_hi": p["hi"],
                "ratio": round(v["med"] / p["med"], 2) if p["med"] else None,
            }
    return out


def compact_stdout_line(result: dict, cap: int = STDOUT_LINE_CAP) -> str:
    """Render the driver-facing JSON line: per-entry MEDIANS only
    (floats, the pre-r8 shape that parsed fine), compact separators, a
    trimmed env fingerprint, and a pointer to the dispersion artifact.
    If the line still exceeds ``cap`` (suite growth), non-headline
    entries are dropped before the headline set — the totals summarize
    the rest and the dispersion file always has everything."""
    slim = dict(result)
    # per-session detail (env fingerprints, session meds) and the
    # protocol caveat live in the dispersion artifact only — the stdout
    # line keeps sessions_n
    slim.pop("sessions", None)
    slim.pop("protocol_note", None)
    slim["queries"] = {
        q: (v["med"] if isinstance(v, dict) else v)
        for q, v in result["queries"].items()
    }
    env = result.get("env", {})
    slim["env"] = {
        k: env[k]
        for k in ("cpus", "loadavg_start", "cpu_busy_pct", "cpu_steal_pct")
        if k in env
    }
    slim["dispersion_file"] = DISPERSION_FILE
    if "regressions" in slim:
        # names only on the line (full {lo, prior_hi, ratio} detail
        # lives in the dispersion file), capped like errors
        slim["regressions"] = sorted(slim["regressions"])[:5]
        slim["regressions_n"] = len(result["regressions"])
    if "errors" in slim:
        # full tracebacks live in the dispersion file; the line only
        # needs the failing names so `partial` is explainable at a glance
        slim["errors"] = sorted(slim["errors"])[:5]
        slim["errors_n"] = len(result["errors"])
    line = json.dumps(slim, separators=(",", ":"))
    if len(line) > cap:
        keep = [q for q in HEADLINE_25 if q in slim["queries"]]
        dropped = len(slim["queries"]) - len(keep)
        slim["queries"] = {q: slim["queries"][q] for q in keep}
        slim["queries_dropped"] = dropped
        line = json.dumps(slim, separators=(",", ":"))
    if len(line) > cap:
        # last-resort degradation (ADVICE r9): a truncated-but-parseable
        # line strictly beats no line at all (a bare assert here — or
        # any uncaught raise — would lose the whole bench artifact, and
        # under `python -O` an assert silently vanishes)
        slim["queries"] = {}
        slim["queries_dropped"] = len(result["queries"])
        line = json.dumps(slim, separators=(",", ":"))
    if "\n" in line or len(line) > cap:
        raise RuntimeError(
            f"bench stdout line unprintable even after degradation: {len(line)}"
        )
    return line


def _session_result():
    """One fresh-session measurement pass (the pre-round-14 whole
    bench): run every entry once through the adaptive-warmup/median
    protocol in THIS process's SparkSession and return the result
    dict. Does not touch BENCH_DISPERSION.json."""
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    env = _env_fingerprint(cpus)
    t_start = time.time()
    spark = get_spark(app_name="gecko-spark-bench", cpus=cpus, shuffle_partitions=cpus)
    try:
        # warm the JVM/session so timings measure the queries, not startup
        load_table(spark, sf_dir, "lineitem").count()
        queries, errors = bench_queries(spark, sf_dir)
    finally:
        spark.stop()
    sf = float(sf_dir.rstrip("/").rsplit("sf", 1)[-1]) if "sf" in sf_dir else None
    meds = {q: v["med"] for q, v in queries.items()}
    headline = [q for q in HEADLINE_25 if q in queries]
    result = {
        "metric": "gecko_spark bench: gen+mutate @1M rows + headline queries",
        "value": round(sum(meds.values()), 3),
        "unit": "sec",
        "queries": queries,
        "sf": sf,
        # fixed 25-entry subset, unchanged since round 5 — the
        # round-over-round comparable number (the full total grows as
        # entries are added)
        "headline25_total": round(sum(meds[q] for q in headline), 3),
        "headline25_n": len(headline),
        "env": env,
        "wall_s": round(time.time() - t_start, 1),
    }
    if errors:
        # A failing query would otherwise shrink the headline total and
        # masquerade as a cross-round speedup; flag the total as partial
        # so round-over-round comparisons skip it.
        result["errors"] = errors
        result["partial"] = True
    return result


def _combine_sessions(session_results: list) -> dict:
    """Cross-session aggregation (VERDICT r13 #1): five same-code
    sessions spanned headline25 20.5–29.5 s with per-entry medians
    swinging 3× independently, so a SINGLE session's bands cannot
    adjudicate regressions. Per entry: med = median of the session
    medians, band = [min session-lo, max session-hi] — the criterion
    'new lo > prior hi' then means disjoint ACROSS ≥N fresh JVMs,
    exactly SCALE.md's operational rule. An entry missing from a
    session (error there) still aggregates over the sessions that
    have it; an entry failing everywhere lands in errors."""
    import statistics

    names: list = []
    for r in session_results:
        for q in r["queries"]:
            if q not in names:
                names.append(q)
    combined_q = {}
    for q in names:
        per = [r["queries"][q] for r in session_results if q in r["queries"]]
        s_meds = [v["med"] for v in per]
        combined_q[q] = {
            "med": round(statistics.median(s_meds), 3),
            "lo": min(v["lo"] for v in per),
            "hi": max(v["hi"] for v in per),
            "n_runs": sum(v.get("n_runs", 5) for v in per),
            "n_sessions": len(per),
            "session_meds": s_meds,
        }
    meds = {q: v["med"] for q, v in combined_q.items()}
    headline = [q for q in HEADLINE_25 if q in combined_q]
    errors: dict = {}
    for r in session_results:
        for q, e in r.get("errors", {}).items():
            if q not in combined_q:
                errors[q] = e
    result = {
        "metric": session_results[0]["metric"],
        "value": round(sum(meds.values()), 3),
        "unit": "sec",
        "queries": combined_q,
        "sf": session_results[0]["sf"],
        "headline25_total": round(sum(meds[q] for q in headline), 3),
        "headline25_n": len(headline),
        "protocol": "cross-session median of %d fresh-JVM sessions"
        % len(session_results),
        # measurement-method caveat (VERDICT r14 #4): children run the
        # LIGHT in-session protocol (3 timed runs after ≤4 warmups vs 5
        # after ≤8 pre-r14), so sub-second entry medians read ~5-10%
        # higher than pre-r14 single-session artifacts — cross-ROUND
        # comparisons against r13-or-earlier numbers must not read that
        # as a code regression.
        "protocol_note": "light in-session reps since r14 (3 timed/≤4 warm "
        "per child session); sub-second medians read ~5-10% above pre-r14 "
        "full-protocol artifacts",
        "sessions_n": len(session_results),
        "sessions": [
            {
                "headline25_total": r.get("headline25_total"),
                "value": r.get("value"),
                "wall_s": r.get("wall_s"),
                "env": r.get("env"),
                "partial": r.get("partial", False),
            }
            for r in session_results
        ],
        "env": session_results[0].get("env", {}),
    }
    if errors:
        result["errors"] = errors
        result["partial"] = True
    return result


def _load_prior(sf, cross_session: bool = False, cpus=None) -> dict:
    """The prior committed artifact's bands — loaded BEFORE the first
    overwrite (VERDICT r10 #8). Bands are only comparable at the SAME
    scale factor: a quick sf0.01 iteration run must not flag (or
    silently rebase) the sf0.1 round artifact's bands. The same applies
    to the CORE COUNT (VERDICT r14 #2): the driver also benches at a
    lower $SPARK_GRAFT_CPUS, and comparing an 8-core run's medians
    against committed 32-core bands flagged 6 false regressions in
    round 14 — a prior recorded at a different ``env.cpus`` is
    rejected. With ``cross_session=True`` a prior WITHOUT cross-session
    bands is also rejected: a multi-session band spans fresh-JVM
    session variance (measured 20.5–29.5 s on same code), a
    single-session band does not, so 'new lo > prior hi' across that
    protocol change flags session placement, not code — the r14
    transition run produced 13 such spurious flags before this guard."""
    disp = os.path.join(os.path.dirname(os.path.abspath(__file__)), DISPERSION_FILE)
    try:
        with open(disp) as f:
            prior_doc = json.load(f)
        if prior_doc.get("sf") != sf:
            return {}
        prior_cpus = (prior_doc.get("env") or {}).get("cpus")
        if cpus is not None and prior_cpus is not None and prior_cpus != cpus:
            return {}
        if cross_session and "sessions_n" not in prior_doc:
            return {}
        return prior_doc.get("queries", {})
    except (OSError, ValueError):
        return {}


def _finalize(result: dict, prior: dict = None) -> None:
    """Compare against the prior committed artifact, write the
    dispersion artifact, print the driver-facing line."""
    sf = result.get("sf")
    cpus = (result.get("env") or {}).get("cpus")
    disp = os.path.join(os.path.dirname(os.path.abspath(__file__)), DISPERSION_FILE)
    if prior is None:
        prior = _load_prior(sf, cpus=cpus)
    reg = detect_regressions(result["queries"], prior)
    if reg:
        result["regressions"] = reg
    # full {med,lo,hi} dispersion → committed artifact, compact line →
    # stdout. Off-default scale factors write a SUFFIXED file: a quick
    # sf0.01 iteration run must never clobber the committed sf0.1 round
    # artifact (that exact accident cost a git-restore in round 11).
    if sf is not None and sf != 0.1:
        disp = disp.replace(".json", f".sf{sf}.json")
    # Off-core-count runs likewise (VERDICT r14 #2): the driver's
    # scaling pass at a lower $SPARK_GRAFT_CPUS must not overwrite the
    # main artifact's bands. Whatever core count the committed artifact
    # records is authoritative for its path; a run at any OTHER count
    # writes `<name>.c<cpus>.json`.
    try:
        with open(disp) as f:
            committed_cpus = (json.load(f).get("env") or {}).get("cpus")
    except (OSError, ValueError):
        committed_cpus = None
    if (
        committed_cpus is not None
        and cpus is not None
        and committed_cpus != cpus
    ):
        disp = disp.replace(".json", f".c{cpus}.json")
    with open(disp, "w") as f:
        json.dump(result, f, indent=1, sort_keys=True)
    print(compact_stdout_line(result))


def main():
    """Driver entry. Default protocol (round 14, VERDICT r13 #1):
    N fresh-JVM sessions — subprocess per session so JIT state, Arrow
    buffers, and Python workers never carry over — combined into
    cross-session medians; the dispersion artifact records every
    session's meds and env fingerprint. Modes:

    - ``SPARK_GRAFT_BENCH_SESSION`` set → CHILD: run one session, dump
      the full result to $SPARK_GRAFT_BENCH_SESSION_FILE, print
      nothing on stdout, never touch the shared artifact.
    - ``SPARK_GRAFT_BENCH_SESSIONS=1`` → iteration mode: one in-process
      session; the artifact still goes through _finalize (suffixed at
      off-default sf, so the committed sf0.1 artifact survives quick
      iteration only when run at another sf — full-protocol runs are
      what should land on BENCH_DISPERSION.json).
    - otherwise → PARENT: spawn up to ``SPARK_GRAFT_BENCH_SESSIONS``
      (default 3) children under a wall budget
      ``SPARK_GRAFT_BENCH_BUDGET_S`` (default 2700 s): after each
      session, stop early if the next one would overrun — at least one
      session always completes, so a tight budget degrades to the old
      single-session bench instead of losing the round's artifact."""
    session_tag = os.environ.get("SPARK_GRAFT_BENCH_SESSION")
    if session_tag is not None:
        result = _session_result()
        out_path = os.environ.get(
            "SPARK_GRAFT_BENCH_SESSION_FILE",
            os.path.join("scratch", f"bench_session_{session_tag}.json"),
        )
        with open(out_path, "w") as f:
            json.dump(result, f, indent=1, sort_keys=True)
        return

    n_sessions = int(os.environ.get("SPARK_GRAFT_BENCH_SESSIONS", "3"))
    if n_sessions <= 1:
        _finalize(_session_result())
        return

    import subprocess

    here = os.path.dirname(os.path.abspath(__file__))
    scratch = os.path.join(here, "scratch")
    os.makedirs(scratch, exist_ok=True)
    budget = float(os.environ.get("SPARK_GRAFT_BENCH_BUDGET_S", "2700"))
    t0 = time.time()
    stamp = int(t0)
    session_results = []
    last_wall = None
    prior = None
    for i in range(n_sessions):
        if i > 0 and last_wall is not None:
            # stop early when the next fresh-JVM session would overrun
            # the budget (15% headroom for startup jitter)
            if time.time() - t0 + 1.15 * last_wall > budget:
                break
        tag = f"{stamp}_{i}"
        sfile = os.path.join(scratch, f"bench_session_{tag}.json")
        t_sess = time.time()
        proc = subprocess.run(
            [sys.executable, os.path.abspath(__file__)],
            env={
                **os.environ,
                "SPARK_GRAFT_BENCH_SESSION": tag,
                "SPARK_GRAFT_BENCH_SESSION_FILE": sfile,
                # children run the halved in-session protocol unless
                # the caller pinned it explicitly
                "SPARK_GRAFT_BENCH_LIGHT": os.environ.get(
                    "SPARK_GRAFT_BENCH_LIGHT", "1"
                ),
            },
            stdout=subprocess.DEVNULL,
            stderr=sys.stderr,
            cwd=here,
        )
        last_wall = time.time() - t_sess
        if proc.returncode == 0 and os.path.exists(sfile):
            with open(sfile) as f:
                session_results.append(json.load(f))
            # finalize INCREMENTALLY after every completed session: if
            # an outer timeout kills this parent mid-protocol, the
            # artifact + the last stdout line still describe every
            # session that finished (sessions_n says how many), instead
            # of the whole round losing its bench record
            if session_results:
                combined = _combine_sessions(session_results)
                if prior is None:
                    prior = _load_prior(
                        combined.get("sf"),
                        cross_session=True,
                        cpus=(combined.get("env") or {}).get("cpus"),
                    )
                _finalize(combined, prior)
                sys.stdout.flush()
    if not session_results:
        # every child died: fall back to one in-process session so the
        # round still gets a bench line (and the failure is visible in
        # sessions_n=1 + whatever error killed the children)
        _finalize(_session_result())


if __name__ == "__main__":
    main()
