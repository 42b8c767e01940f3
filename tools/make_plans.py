"""Regenerate PLANS.md: executed-plan evidence for the scale claims."""

from __future__ import annotations

import sys

sys.path.insert(0, ".")

import __spark_entry__ as e  # noqa: E402
from gecko_spark import get_spark  # noqa: E402


def main():
    spark = get_spark(app_name="make-plans", cpus=8)
    sf = "/root/testdata/sf0.01"
    qs = e.queries()

    sections = []

    def cap(title, df, note):
        plan = df._jdf.queryExecution().executedPlan().toString()
        lines = [
            line.rstrip() if len(line.rstrip()) <= 400
            else line.rstrip()[:400] + " ... (line truncated)"
            for line in plan.splitlines()
        ]
        if len(lines) > 60:
            lines = lines[:60] + ["... (truncated)"]
        sections.append(f"## {title}\n\n{note}\n\n```\n" + "\n".join(lines) + "\n```\n")

    cap(
        "Generator: one projection over Range (no joins, no exchange)",
        qs["gen_freq_multi"](spark, sf),
        "A whole `to_data_frame` spec — multicolumn weighted sampling included — "
        "compiles to a single narrow stage.",
    )
    cap(
        "Mutator chain: when/otherwise fold collapses, zero exchanges",
        qs["mut_chain"](spark, sf),
        "Two sequential mutators (uppercase then delete) on one column: Catalyst "
        "merges the fold into one projection over the scan.",
    )
    cap(
        "q5: six-table join planned as broadcast-hash chain",
        qs["q5_region_revenue"](spark, sf),
        "All dimension joins broadcast; the only exchanges are the aggregate's "
        "partial/final split.",
    )
    cap(
        "as-of join: ONE hash exchange + sort + single window pass",
        qs["q_asof_join"](spark, sf),
        "The union+ordered-window as-of join: no per-row laterals, no "
        "broadcast requirement — the same plan shape a native sort-merge "
        "as-of executes, linear in input size.",
    )
    cap(
        "q6: filters and projection pushed into the parquet scan",
        qs["q6_revenue_filter"](spark, sf),
        "PushedFilters carries the shipdate/discount/quantity predicates; "
        "ReadSchema is the 4-column projection — the scan, not Spark, "
        "drops the rest.",
    )

    old_thresh = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        cap(
            "skew join: salted join + two-phase aggregation",
            qs["q_skew_join"](spark, sf),
            "salted_join spreads each (possibly hot) join key over 8 salt "
            "buckets — the orders side is the exploded/replicated build — and "
            "salted_groupby_agg splits the 5-value (all-hot) group key into "
            "partial (key, salt) aggregates before the final merge: no single "
            "reducer ever sees a whole hot key. The salt hash is NARROW "
            "(`xxhash64` over join/group key + one within-group "
            "disambiguator via `salt_on`, skew.py::_salt) — not the full "
            "row — so a 100-column table salts at 2-column hash cost; the "
            "capture below shows `xxhash64(l_orderkey, l_linenumber)` "
            "only. Broadcast disabled for this "
            "capture to show the shuffle path the salt exists for (at toy "
            "scale AQE would broadcast the replicated side and hide it). "
            "Oracle-exact vs the unsalted plain join (q_skew_join).",
        )
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old_thresh)

    cap(
        "IVF probe: partition-pruned candidate scan",
        qs["topk_cosine_ivf"](spark, sf),
        "The corpus is pre-assigned to centroid lists; each query probes "
        "only its nprobe nearest lists, so the scored candidate set is a "
        "filtered fraction of the corpus (filter on list id ahead of the "
        "scoring join) instead of a full cross join — the brute-force "
        "baseline's crossJoin shrinks to per-list joins.",
    )

    # connected components: per-round plan stays flat thanks to
    # localCheckpoint truncation
    from gecko_spark.operators.dedup import connected_components

    pairs = spark.createDataFrame(
        [(i, i + 1) for i in range(0, 40, 2)] + [(1, 2), (5, 6)],
        "id_a long, id_b long",
    )
    # force the DISTRIBUTED loop: the round-14 driver union-find fast
    # path (edge count <= max_driver_edges) would otherwise answer this
    # toy graph with one bounded collect and no propagation plan at all
    cap(
        "connected_components: round output truncated at a checkpoint",
        connected_components(pairs, max_iterations=3, max_driver_edges=None),
        "After 3 label-propagation + pointer-jump rounds the plan root is a "
        "`Scan ExistingRDD` — each round's `localCheckpoint()` cuts the "
        "lineage, so round N's plan is ONE join+agg+jump over a "
        "materialized RDD, not an N-deep tree. Without the checkpoint the "
        "plan (and task serialization time) would grow per round — the "
        "thing that kills iterative jobs at cluster scale.",
    )

    cap(
        "decontam bloom prefilter: train grams pruned BEFORE the shuffle",
        qs["decontam_filter_bloom"](spark, sf),
        "The test-gram Bloom bitset (built distributedly via per-word "
        "`bit_or`, only num_bits/64 rows reach the driver) is broadcast "
        "and applied as an ArrowEvalPython filter on the TRAIN gram index "
        "**below** the join's Exchange — at 100 TB almost no train gram "
        "survives it, so the shuffled index shrinks from corpus-sized to "
        "near-contaminated-only. False positives pass and are rejected by "
        "the exact join that follows, so the result is identical to the "
        "plain path (same oracle as `decontam_filter`).",
    )

    cap(
        "repetition profile: zero exchanges (stateless Arrow kernel)",
        qs["text_repetition"](spark, sf),
        "Every repetition signal is a function of the document alone, so "
        "the whole profile is one ArrowEvalPython over the scan — no "
        "Exchange anywhere in the plan, at any scale.",
    )

    cap(
        "line dedup: anti-join against the FILTERED duplicate-line set",
        qs["text_line_dedupe"](spark, sf),
        "The dup-line build side is post-threshold (lines in >N docs only) "
        "— at 100 TB the exploded corpus anti-joins against a small, "
        "usually-broadcastable set rather than the full line index; the "
        "per-doc reassembly is the only corpus-sized aggregation.",
    )

    cap(
        "unigram logprob: vocab joined back as the reduced index",
        qs["text_unigram_logprob"](spark, sf),
        "Token frequencies aggregate once (map-side combined); the corpus "
        "total derives from that reduced table as a 1-row broadcast, and "
        "the per-token score join targets the vocab (AQE broadcasts it "
        "when it fits) — the raw corpus is scanned, never re-aggregated.",
    )

    cap(
        "semantic dedup: broadcast centroid assignment, one cluster-key join",
        qs["dedup_semantic_pairs"](spark, sf),
        "Cluster assignment is pure Column algebra over broadcast centroid "
        "literals (no shuffle, no collect of the corpus); the persisted "
        "assignment frame feeds both sides of the within-cluster self-join, "
        "and the exact-cosine threshold sits in the join condition so "
        "sub-threshold pairs never materialize. At scale the cluster-key "
        "equi-join is the single shuffle; n_clusters ~ n/1000 keeps "
        "within-cluster expansion ~1000n.",
    )

    def _semantic_matrix():
        from gecko_spark.operators.dedup import semantic_dedupe_pairs
        from gecko_spark.sources.testdata import load_table

        emb = load_table(spark, sf, "embeddings")
        return semantic_dedupe_pairs(
            emb, "vec_id", "embedding", threshold=0.1, n_clusters=16,
            init="first_k", method="matrix",
        )

    cap(
        "semantic dedup, matrix mode (round 6): one grouped Arrow pass",
        _semantic_matrix(),
        "The production path: groupBy(cluster) + FlatMapGroupsInPandas — each "
        "cluster crosses Arrow ONCE and its pair triangle is one BLAS gram "
        "matrix in the kernel. The per-pair self-join (and its "
        "Sum cluster^2 x 2xdim Arrow transfer) is gone; the only shuffle is "
        "the cluster-key exchange feeding the grouped kernel.",
    )

    def _guard_dispatch():
        from gecko_spark.operators.similarity import cosine_topk_bruteforce
        from gecko_spark.sources.testdata import load_table

        emb = load_table(spark, sf, "embeddings")
        q = emb.filter("vec_id < 3").selectExpr(
            "vec_id AS query_id", "embedding AS query_vec"
        )
        return cosine_topk_bruteforce(emb, q, k=5, max_scored_rows=100)

    cap(
        "linkage: blocked candidates + levenshtein, one block-key shuffle",
        qs["q_linkage_blocked"](spark, sf),
        "Record linkage as a plain hash equi-join on derived block keys "
        "(folded into the scan projection) with JVM-side levenshtein in the "
        "filter — never an all-pairs product; the best-match variant adds one "
        "window partitioned by the left id (per-block bounded).",
    )

    cap(
        "linkage: sorted-neighborhood two-phase rank, no global window",
        qs["q_linkage_snm"](spark, sf),
        "The global sort rank comes from content-derived buckets + per-bucket "
        "windows + broadcast offsets; pairing is explode + equi-join on rank. "
        "No ROW_NUMBER over a global ORDER BY anywhere in the plan — the "
        "oracle proves the result identical to that single-reducer form.",
    )

    cap(
        "brute-force top-k size guard: auto-dispatch to map-side top-k",
        _guard_dispatch(),
        "Past max_scored_rows pair scores (forced low here), "
        "cosine_topk_bruteforce swaps its per-query single-reducer window "
        "for the MapInPandas matrix path: per-batch top-k in the kernel, so "
        "only batches x Q x k candidate rows reach the final window.",
    )

    cap(
        "quantile sketch: map-side bottom-k, config-sized tail",
        qs["sketch_quantiles"](spark, sf),
        "Each Arrow batch forwards at most k (hash, value) rows, so the "
        "global sort sees partitions x k rows; everything after the "
        "truncation (window ranks, quantile join) is k-sized, not "
        "data-sized — the mergeable-sketch contract, same as KMV/CM.",
    )

    cap(
        "HLL sketch: map-side register combine, m-row shuffle",
        qs["sketch_hll_estimate"](spark, sf),
        "The Arrow kernel emits at most m=256 (register, rank) rows per "
        "batch (per-batch max inside the kernel), so the groupBy "
        "aggregates partitions x m rows and the final agg reads at most "
        "m - shuffle volume is CONSTANT in input size, the defining "
        "property of a register sketch. Identical structure per-key in "
        "hll_group_estimate (groups x m).",
    )

    cap(
        "Z-order clustering key: scan + 1-row min/max broadcast, no UDF",
        qs["layout_zorder_key"](spark, sf),
        "Key construction is pure integer Column algebra (DIV scaling, "
        "shift/mask interleave): zero Python nodes; the only exchange "
        "feeds the 1-row global min/max aggregate back as a broadcast - "
        "the data side never shuffles until the final "
        "repartitionByRange a writer asks for (cluster_by_zorder).",
    )

    cap(
        "web cleanup (strip_html / normalize_url / split): one codegen Project",
        qs["text_strip_html"](spark, sf),
        "The whole HTML-strip chain (comments, script/style bodies, tags, "
        "entities, whitespace) is a single WholeStageCodegen Project over "
        "a 2-column pruned scan — zero exchanges, zero Python. "
        "text_url_normalize and sample_split compile to the same shape: "
        "per-row regex/arithmetic cost only, so these stages run at "
        "parquet-scan speed on any cluster size.",
    )

    cap(
        "cluster representatives: labels join + duplicate-group-sized window",
        qs["dedup_cluster_reps"](spark, sf),
        "After connected components, the (node, component) labels — far "
        "smaller than the corpus, only near-dup members — join the quality "
        "column and feed ONE window partitioned by cluster; window "
        "partitions are duplicate-group-sized (bounded), so the "
        "quality-aware pick adds one small join + one small shuffle on top "
        "of the closure, never a corpus-wide sort.",
    )

    cap(
        "sequence packing: one shuffle (the per-shard window sort)",
        qs["pack_sequences"](spark, sf),
        "Offset packing = a single windowed cumulative sum partitioned by "
        "shard; the only exchanges are the window's hash partitioning and "
        "the manifest aggregation. No iteration, no driver loop.",
    )

    cap(
        "heavy hitters: one-scan exact path (round 7)",
        qs["sketch_heavy_hitters"](spark, sf),
        "When no partition truncated (bounded-adaptive kernel, sentinel "
        "`exact` flags), the collected summaries ARE exact partial counts: "
        "the returned plan is a LocalTableScan of the driver-summed, "
        "already-filtered result — the recount scan is gone. "
        "High-cardinality keys (cardinality > exact_factor×capacity per "
        "partition) fall back to the r5 shape: mapInPandas MG summary + "
        "BROADCAST left-semi candidate-pruned recount, groupBy key space "
        "bounded by the candidate set, never the column's cardinality.",
    )

    cap(
        "hashed linear classifier: scan-shaped serve, zero exchanges (round 8)",
        qs["text_quality_classifier"](spark, sf),
        "The fastText/CCNet-style gate is one ArrowEvalPython projection over "
        "the pruned 2-column parquet scan — the weight vector ships in the "
        "kernel closure, so scoring never joins, never shuffles, and "
        "parallelism is purely the scan's.",
    )

    cap(
        "vocab divergence: top-k as TakeOrderedAndProject, no global window",
        qs["text_vocab_divergence"](spark, sf),
        "The KL-contribution ranking over the union vocabulary compiles to "
        "TakeOrderedAndProject (per-partition partial top-k merged on the "
        "driver); the single-partition row_number window only ever sees the "
        "k surviving rows — the vocabulary never funnels through one "
        "reducer.",
    )

    cap(
        "exact substring-span dedup: broadcast flag/clamp joins, bounded merge (round 10/11)",
        qs["dedup_substring_spans"](spark, sf),
        "The ExactSubstr pipeline: mapInPandas window-hash kernel (persisted, "
        "referenced by both the hash agg and the flag join), map-side partial "
        "hash aggregate, BROADCAST flag join back onto the positions (never a "
        "sort-merge of the position side), the r11 TWO-LEVEL merge (positions "
        "chunked by pos÷2²² then span structs per doc — no aggregation row is "
        "O(doc length)), and a broadcast span-clamp join so the corpus scan "
        "never shuffles.",
    )

    def _ivfpq_plan():
        from gecko_spark.operators.similarity import cosine_topk_ivfpq, ivfpq_build
        from gecko_spark.sources.testdata import load_table

        emb = load_table(spark, sf, "embeddings")
        q = emb.filter("vec_id < 5").selectExpr(
            "vec_id AS query_id", "embedding AS query_vec"
        )
        codes, cents, books = ivfpq_build(emb, n_centroids=8, m=8, seed=0)
        return cosine_topk_ivfpq(
            codes, cents, books, emb, q, k=5, nprobe=2, shortlist=20
        )

    cap(
        "IVFADC search: pruned probe + two-step broadcast re-rank (round 10/11)",
        _ivfpq_plan(),
        "The probed codes scan carries the __ivf_list__ isin filter (a "
        "partition-pruned read against read_ivfpq_index's layout); ADC "
        "scoring is one mapInPandas over the pruned codes; the re-rank "
        "fetch broadcasts the Q×shortlist (query_id, vec_id) pairs against "
        "the corpus scan and then broadcasts the Q-row query-vector frame "
        "SEPARATELY (r11 — pre-joining vectors onto candidates would put "
        "Q×shortlist vector copies in one broadcast), so the float corpus "
        "never shuffles.",
    )

    cap(
        "DSIR log-weight serving: one Arrow projection, zero exchanges (r11 ext)",
        qs["dsir_log_weights"](spark, sf),
        "The fitted micro-log-ratio vector rides in the kernel closure; "
        "scoring is scan → ArrowEvalPython → project — no join, no "
        "shuffle, no explode. The fit itself (not shown) is two map-side "
        "pre-aggregated scans shuffling ≤ n_buckets rows per partition.",
    )
    cap(
        "DSIR Gumbel selection: TakeOrderedAndProject, never a global sort (r11 ext)",
        qs["dsir_select"](spark, sf),
        "Top-n by the Gumbel key runs as per-partition top-n with a "
        "driver merge of n×partitions candidates; the "
        "cluster-sized-target variant (gumbel_select_frac) replaces even "
        "that with a percentile_approx threshold + filter.",
    )
    cap(
        "hard-negative mining: broadcast anchors, label filter before the rank window (r11 ext)",
        qs["ann_hard_negatives"](spark, sf),
        "One corpus scan against broadcast anchors; the IS-DISTINCT-FROM "
        "label exclusion sits under the window, so the per-anchor top-k "
        "ranks only true negatives. The corpus-scale variant "
        "(hard_negative_pairs_ivf) prunes the scan to nprobe IVF lists.",
    )

    cap(
        "BM25 retrieval: broadcast query vocabulary prunes postings before scoring (r12)",
        qs["text_bm25_topk"](spark, sf),
        "The query-term set broadcasts into a LEFT SEMI join over the "
        "(doc, term, tf) postings, so only postings whose term appears "
        "in some query reach the df/idf joins and the per-(query, doc) "
        "integer sum (measured 5.8% survivor fraction at 1 M docs — "
        "SCALE.md round-12 addendum 3); df and the query map join back "
        "as broadcasts; the top-k window ranks only pruned pairs.",
    )

    # BM25 persisted index: partition-pruned postings scan
    import shutil as _shutil
    import tempfile as _tmp

    from gecko_spark.operators.retrieval import (
        bm25_topk_indexed,
        write_bm25_index,
    )
    from gecko_spark.sources.testdata import load_table as _lt
    from pyspark.sql import functions as _F

    _idx = _tmp.mkdtemp(prefix="plans_bm25_")
    try:
        _docs = _lt(spark, sf, "documents")
        write_bm25_index(_docs, _idx, n_buckets=64)
        _qs = _docs.filter(_F.col("doc_id") % 151 == 3).select(
            _F.col("doc_id").alias("query_id"),
            _F.substring("text", 1, 80).alias("query_text"),
        )
        cap(
            "BM25 persisted index: query-term buckets pushed as PartitionFilters (r12)",
            bm25_topk_indexed(spark, _idx, _qs, k=10),
            "Build once, search many: the postings parquet is partitioned "
            "by pmod(xxhash64(term), 64); the search computes the query "
            "terms' buckets driver-side and the scan's PartitionFilters "
            "skips every other bucket — the corpus tokenize/aggregate "
            "pass is gone entirely.",
        )
    finally:
        _shutil.rmtree(_idx, ignore_errors=True)

    # bucketed warehouse: write once, join forever without exchanges
    import tempfile

    from gecko_spark.sources.testdata import load_table
    from gecko_spark.sources.warehouse import read_table, write_bucketed

    base = tempfile.mkdtemp(prefix="plans_wh_")
    orders = load_table(spark, sf, "orders")
    lineitem = load_table(spark, sf, "lineitem").withColumnRenamed(
        "l_orderkey", "o_orderkey"
    )
    write_bucketed(orders, "plans_b_orders", ["o_orderkey"], 8, path=f"{base}/o")
    write_bucketed(lineitem, "plans_b_li", ["o_orderkey"], 8, path=f"{base}/l")
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        cap(
            "bucketed join: zero Exchange — the shuffle was paid at write time",
            read_table(spark, "plans_b_orders").join(
                read_table(spark, "plans_b_li"), "o_orderkey"
            ),
            "Both tables bucketed by o_orderkey into 8 buckets; the sort-merge "
            "join reads co-located buckets directly (broadcast disabled here to "
            "show the no-shuffle path — at this SF the dim would broadcast).",
        )
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)
        spark.sql("DROP TABLE IF EXISTS plans_b_orders")
        spark.sql("DROP TABLE IF EXISTS plans_b_li")

    with open("PLANS.md", "w") as f:
        f.write(
            "# PLANS — executed-plan evidence for the scale claims\n\n"
            "Captured from `local[8]` at sf0.01 (plans are shape-identical at any "
            "SF; AQE re-plans only exchange coalescing). Regenerate with "
            "`python tools/make_plans.py`.\n\n" + "\n".join(sections)
        )
    spark.stop()


if __name__ == "__main__":
    main()
