"""End-to-end example: a training-data curation pipeline over the
documents corpus — the beyond-reference operator families composed the
way a 100 TB pretraining-data job would chain them:

  0. markup strip       (text.strip_html — pure-regexp boilerplate
                         removal; a no-op on already-clean text)
  1. quality gate       (text.filter_documents — pushed-down predicates)
  2. exact dedup        (dedup.dedupe_exact — one hash aggregate)
  3. near-dup removal   (dedup.minhash_dedupe_transitive — MinHash+LSH
                         candidate pairs, connected components, keep
                         the minimum id per duplicate cluster)
  3b. semantic dedup    (dedup.semantic_dedupe — SemDeDup-style: cluster
                         the doc embeddings, drop higher-id docs whose
                         in-cluster cosine clears the threshold)
  3c. substring excision (dedup.substring_dedupe — Lee et al. 2022 run
                         BOTH doc-level AND substring-level dedup:
                         duplicated ≥window-char spans are cut from
                         every copy but the first, the survivors
                         stitched by a pure-Column fold; docs excised
                         below the window length drop out)
  4. decontamination    (decontam.decontaminate — drop train docs that
                         share word n-grams with a held-out eval split)
  5. repetition gate    (text.repetition_profile — drop docs whose top
                         bigram dominates the token stream)
  5b. redundancy gate   (text.compression_ratio — drop docs whose zlib
                         ratio flags long-range template repetition)
  5c. learned gate      (classifier.hashed_linear_score — fastText/
                         CCNet-style hashed-BoW linear model, exact-int64
                         serving in one Arrow projection)
  6. enrichment         (text.text_stats + fingerprints, one projection)
  7. as-of context join (joins.asof_join — attach each doc's nearest
                         preceding event by ingest order, single shuffle)
  8. partitioned write  (sinks.write_partitioned — one file per lang
                         partition, no small-files litter)
  9. corpus report      (sketches.quantile_sketch — mergeable bottom-k
                         sample; length percentiles without a full sort)
 10. train/val/test     (sampling.split_dataset — append-stable bucket
                         assignment; near-dups were already collapsed
                         upstream, so the row-key split cannot leak)
 11. DSIR selection     (selection.dsir_log_weights + gumbel_select_frac
                         — fit target-vs-raw hashed n-gram multinomials
                         against the held-out reference split, score
                         every train doc in one shuffle-free projection,
                         keep a weighted fraction ∝ exp(log_weight):
                         the data-SELECTION stage after cleaning, as in
                         Xie et al. 2023)
 12. shard + materialize (packing.global_token_shards — seeded global
                         shuffle order cut into token-budget shards via
                         the distributed prefix sum — then
                         packing.pack_texts: the concatenated sequences
                         a trainer actually reads)

Every stage is a lazy DataFrame transform; nothing collects to the
driver. Run: python examples/corpus_curation.py [sf_dir] [out_dir]
"""

from __future__ import annotations

import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from gecko_spark import get_spark
from gecko_spark.operators.decontam import decontaminate
from gecko_spark.operators.dedup import (
    dedupe_exact,
    minhash_dedupe_transitive,
    semantic_dedupe,
    substring_dedupe,
)
from gecko_spark.operators.classifier import hashed_linear_score, seeded_weights
from gecko_spark.operators.joins import asof_join
from gecko_spark.operators.text import (
    normalize_unicode,
    compression_ratio,
    filter_documents,
    repetition_profile,
    strip_html,
    text_stats,
)
from gecko_spark.sources.sinks import write_partitioned
from gecko_spark.sources.testdata import load_table


def curate(spark: SparkSession, sf_dir: str) -> DataFrame:
    # NFC-normalize BEFORE any hashing: composed and decomposed forms of
    # the same text would otherwise fingerprint differently through
    # every dedup stage below (round 11)
    docs = load_table(spark, sf_dir, "documents").withColumn(
        "text", normalize_unicode(strip_html(F.col("text")), "NFC")
    )

    gated = filter_documents(docs, min_chars=40, min_quality=0.3)
    exact = dedupe_exact(gated, "text", id_col="doc_id")
    # LINEAGE boundary #1 (round 14 opt — interleaved min-of-5 A/B at
    # sf0.1, /tmp scratch logged to scratch/curation_ab3_r14.log): the
    # exact-deduped frame feeds the minhash signature cache, the LSH
    # band frames, AND the CC survivor join — without a cut each of
    # those re-plans (and the eager LSH/CC actions re-execute) the
    # strip/normalize/filter/dedupe-exact prefix. Boundary after
    # `exact` measured min 24.93 s → 20.51 s for the full chain; with
    # boundary #2 below as well, 18.88 s (−24%) and deterministic
    # structure metrics drop too (79→76 jobs, 1452→1416 tasks).
    exact = exact.localCheckpoint()
    neardup = minhash_dedupe_transitive(
        exact, "doc_id", "text", threshold=0.8, num_hashes=64, bands=16
    )

    # semantic pass: drop docs whose EMBEDDING is a near-copy of a
    # lower-id doc in the same k-means cluster — catches paraphrase-level
    # duplicates the lexical MinHash pass cannot see
    emb = load_table(spark, sf_dir, "embeddings").select(
        F.col("vec_id").alias("doc_id"), "embedding"
    )
    # LINEAGE boundary #2 (same A/B): the doc-level survivor set is
    # consumed twice immediately below (has_vec/no_vec split) and the
    # semantic pass's k-means fit collects eagerly — cutting here keeps
    # the minhash/CC subtree out of every downstream plan.
    neardup = neardup.localCheckpoint()
    with_vec = neardup.join(emb, "doc_id", "left")
    # Persist the embedding-bearing survivor join (round 15): the
    # semantic pass consumes it three times while curate() is still
    # running — the k-means fit's count job, the centroid-sample
    # toPandas, and checkpoint #3's materialization below — and each
    # consumption re-ran the survivor⋈embeddings join. The cache is
    # dead once checkpoint #3 cuts the lineage, so it is released
    # before this function returns (no caller-side ownership needed).
    from pyspark.storagelevel import StorageLevel

    has_vec = (
        with_vec.filter(F.col("embedding").isNotNull())
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    no_vec = with_vec.filter(F.col("embedding").isNull()).drop("embedding")
    sem = semantic_dedupe(
        has_vec, "doc_id", "embedding", threshold=0.995, n_clusters=8, seed=11
    ).drop("embedding")
    neardup = sem.unionByName(no_vec)

    # LINEAGE boundary, not a cache (round 14 — interleaved same-session
    # A/B at sf0.1, scratch/curation_ab*_r14.log): the doc-level-deduped
    # corpus is consumed by the substring pass's eager flag/clamp
    # collects, the train fill, and every post-curation action. Without
    # a cut, each of those pays Catalyst re-ANALYSIS of the whole
    # composed lineage plus a full recompute of the gauntlet — measured
    # chain total 37.6 s median. localCheckpoint → 20.6 s (−45%): every
    # downstream stage (dsir_fit, select_threshold, token_shards)
    # collapses because it now plans over one `Scan ExistingRDD` leaf.
    # A persist() boundary at the same joint measured WORSE than no
    # boundary at all (48 s vs 40 s): caching keeps the logical lineage,
    # so it pays cache reads on top of the same re-analysis. At 100 TB
    # this boundary is a reliable checkpoint to object storage; blocks
    # live in executor MEMORY_AND_DISK and are GC-reclaimed.
    neardup = neardup.localCheckpoint()
    # checkpoint #3 just materialized eagerly: nothing downstream can
    # reference has_vec anymore — release its cache now
    has_vec.unpersist(False)

    # substring-span excision AFTER doc-level dedup (the Lee et al.
    # order: whole-doc copies are gone, so the span pass only pays for
    # partial overlaps): every duplicated ≥40-char span keeps its
    # lowest-(id, pos) copy, the rest are cut and the text stitched;
    # docs excised below one window of content carry no signal and drop
    excised = substring_dedupe(neardup, "doc_id", "text", window=40)
    neardup = (
        excised.withColumn("text", F.col("text_clean"))
        .drop("text_clean")
        .filter(F.length("text") >= 40)
    )

    # decontaminate against a held-out split (stand-in for a real eval
    # set): any train doc sharing a 6-gram with it is dropped
    heldout = docs.filter(F.col("doc_id") % 97 == 0).select("doc_id", "text")
    train = neardup.filter(F.col("doc_id") % 97 != 0)
    clean = decontaminate(train, heldout, "doc_id", "text", n=6)

    # repetition gate: top bigram must not dominate the token stream
    rep = repetition_profile(clean, "doc_id", "text", ns=(2,))
    keep = rep.filter(
        F.col("top_2gram_n") * 4 <= F.greatest(F.col("n_tokens") - 1, F.lit(1))
    ).select("doc_id")
    gated2 = clean.join(keep, "doc_id", "left_semi")

    # redundancy gate: template/stuffed docs compress far below prose;
    # the synthetic corpus is word-sampled so a loose floor suffices
    gated2 = gated2.filter(compression_ratio(F.col("text")) > 0.05)

    # learned quality gate (classifier.hashed_linear_score): the
    # fastText/CCNet-style hashed-BoW linear model, served as exact
    # int64 in one Arrow projection. Weights here are the seeded
    # demo vector with a permissive threshold so the synthetic corpus
    # passes; a real pipeline trains on labeled reference-vs-junk docs
    # (train_hashed_classifier -> quantize_weights) and serves through
    # this same call
    clf = hashed_linear_score(
        gated2, seeded_weights(4096), id_col="doc_id", threshold=-(10**9)
    )
    gated2 = gated2.join(clf.filter("passes").select("doc_id"), "doc_id", "left_semi")

    enriched = text_stats(gated2)

    # context: latest event at-or-before the doc id treated as an
    # ingest sequence number (synthetic corpus has no timestamps; on a
    # real corpus this would be ingest_ts vs event ts)
    ev = load_table(spark, sf_dir, "events").select(
        F.col("event_id").alias("on_id"), "event_type"
    )
    ctx = asof_join(
        enriched.withColumn("on_id", F.col("doc_id")),
        ev,
        on="on_id",
    ).drop("on_id")
    return ctx


def curate_to_sequences(spark: SparkSession, sf_dir: str, timers=None):
    """The FULL 12-stage chain as one composable unit — stages 0-8 via
    :func:`curate`, then split → DSIR selection → global token shards →
    materialized pack texts. Returns ``(sequences_df, cached)`` where
    ``cached`` are the frames this function persisted (callers
    unpersist when done — the bench does, so timed reps don't reuse a
    warm cache).

    THE cross-stage plan point (benched as ``curation_e2e``): the
    stages after curation are MULTI-PASS — the DSIR fit collects bucket
    counts over the cleaned train split, gumbel_select_frac aggregates
    a threshold, global_token_shards collects bucket totals, and the
    final write scans once more. Without a persist boundary each of
    those four actions RE-EXECUTES the whole 12-stage dedup gauntlet
    (4× the most expensive plan in the repo); persisting the cleaned
    train split collapses them to one execution + four cheap cached
    scans. At 100 TB the same boundary is a checkpoint to object
    storage rather than executor memory, but it sits in the same place.

    ``timers`` (round 13, VERDICT r12 #4 — dispersion attribution): a
    dict to receive per-stage wall seconds at each DRIVER-ACTION
    boundary. Timer mode inserts ONE extra action (a count() that
    fills the train-split cache under its own timer, so the dedup
    gauntlet's cost lands in ``train_fill`` instead of inside the DSIR
    fit) — a diagnostic variant, not the benched shape; pass None
    (default) for the production path.
    """
    import time as _time

    from pyspark.storagelevel import StorageLevel

    _t0 = _time.time()

    def _mark(stage: str) -> None:
        nonlocal _t0
        if timers is not None:
            timers[stage] = round(_time.time() - _t0, 3)
        _t0 = _time.time()

    from gecko_spark.core import LcgRandom
    from gecko_spark.operators.packing import global_token_shards, pack_texts
    from gecko_spark.operators.sampling import split_dataset
    from gecko_spark.operators.selection import (
        dsir_log_weights,
        fit_log_ratio_micro,
        gumbel_select_frac,
        hashed_ngram_bucket_counts,
    )
    from gecko_spark.operators.text import word_token_count

    ctx = curate(spark, sf_dir)
    split = split_dataset(
        ctx,
        [("train", 0.98), ("val", 0.01), ("test", 0.01)],
        rand=LcgRandom("doc_id", 23),
    )
    # persist boundary: everything below makes multiple passes
    train_docs = (
        split.filter("split = 'train'")
        .select("doc_id", "text")
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    _mark("curate_build")  # plan construction + curate()'s EAGER work:
    # minhash → LSH pairs → connected-components rounds run here (the
    # CC edge list and each round's labels are localCheckpointed)
    if timers is not None:
        train_docs.count()  # fill the cache under its own timer
        _mark("train_fill")
    raw = load_table(spark, sf_dir, "documents")
    reference = raw.filter(F.col("doc_id") % 97 == 0).select("doc_id", "text")
    lr = fit_log_ratio_micro(
        hashed_ngram_bucket_counts(reference, n_buckets=4096),
        hashed_ngram_bucket_counts(train_docs, n_buckets=4096),
        4096,
    )
    _mark("dsir_fit")  # two fit aggregations + driver model collect
    # Persist the NARROW weights frame (round 15, guide §8: decide with
    # small rows): three downstream actions — the gumbel threshold
    # aggregation, the shard-bucket totals collect, and the final
    # sequence scan — each re-executed the DSIR scoring kernel over the
    # full train text without it. 16 bytes/row of cache turns that into
    # one kernel pass + two cached scans; the text stays in the train
    # cache and is never duplicated.
    dsir_w = (
        dsir_log_weights(train_docs, lr)
        .select("doc_id", "log_weight")
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    weighted = train_docs.join(dsir_w, "doc_id")
    selected = gumbel_select_frac(weighted, 0.6, LcgRandom("doc_id", 29))
    _mark("select_threshold")  # percentile_approx threshold aggregation
    sharded = global_token_shards(
        selected.withColumn("n_tokens", word_token_count(F.col("text"))),
        "doc_id", "n_tokens", budget=2048,
        rand=LcgRandom("doc_id", 37), buckets=16,
    )
    _mark("token_shards")  # bucket-total collect + broadcast-back
    seqs = pack_texts(
        sharded.withColumnRenamed("gshard", "shard")
        .withColumn("pack", F.lit(0)),
        "doc_id", "text",
    )
    _mark("pack_build")  # lazy; the caller's final action is the scan
    return seqs, [train_docs, dsir_w]


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    out_dir = sys.argv[2] if len(sys.argv) > 2 else tempfile.mkdtemp(prefix="corpus_")
    spark = get_spark(app_name="corpus-curation-example")
    try:
        result = curate(spark, sf_dir)
        write_partitioned(result, f"{out_dir}/curated", ["lang"])
        curated = spark.read.parquet(f"{out_dir}/curated")
        n = curated.count()
        print(f"curated corpus: {n} docs -> {out_dir}/curated (one file per lang)")

        # row/byte audit: the dedup+gate gauntlet (incl. the substring
        # excision) must have REMOVED content — a pipeline bug that
        # turns a gate into a no-op fails loudly here
        raw = load_table(spark, sf_dir, "documents")
        in_rows = raw.count()
        in_chars = raw.agg(
            F.sum(F.length(F.coalesce(F.col("text"), F.lit("")))).alias("c")
        ).first()["c"]
        out_chars = curated.agg(F.sum(F.length("text")).alias("c")).first()["c"]
        assert 0 < n < in_rows, (n, in_rows)
        assert 0 < out_chars < in_chars, (out_chars, in_chars)
        print(
            f"  delta: rows {in_rows} -> {n} "
            f"({100 * (in_rows - n) / in_rows:.1f}% dropped), "
            f"chars {in_chars} -> {out_chars} "
            f"({100 * (in_chars - out_chars) / in_chars:.1f}% removed)"
        )

        # corpus report: length percentiles from a mergeable bottom-k
        # sample — no full sort of the corpus, k rows of driver traffic
        from gecko_spark.operators.sketches import quantile_estimate, quantile_sketch

        sk = quantile_sketch(result, "n_chars", "doc_id", k=1024)
        for r in quantile_estimate(sk, [0.5, 0.9, 0.99]).collect():
            print(f"  n_chars p{int(r['q'] * 100)}: {r['estimate']:.0f}")

        # boilerplate audit: tokens claiming >2% of the whole stream —
        # exact counts at Misra-Gries memory, never a full-vocab shuffle
        from gecko_spark.operators.sketches import heavy_hitters
        from gecko_spark.operators.text import tokens

        toks = result.select(F.explode(tokens(F.col("text"))).alias("tok"))
        for r in heavy_hitters(toks, "tok", 1, 50).orderBy(F.desc("cnt")).collect():
            print(f"  heavy token {r['value']!r}: {r['cnt']}")

        # final assignment: deterministic, append-stable 98/1/1 split
        from gecko_spark.core import LcgRandom
        from gecko_spark.operators.sampling import split_dataset

        split = split_dataset(
            result,
            [("train", 0.98), ("val", 0.01), ("test", 0.01)],
            rand=LcgRandom("doc_id", 23),
        )
        for r in split.groupBy("split").count().orderBy("split").collect():
            print(f"  split {r['split']}: {r['count']} docs")

        # data selection LAST (Xie et al. 2023 run DSIR over the cleaned
        # pool): fit target (the held-out reference split) vs raw
        # (the cleaned train split) hashed-n-gram multinomials, score
        # in one shuffle-free projection, keep the best-weighted ~60%
        from gecko_spark.operators.selection import (
            dsir_log_weights,
            fit_log_ratio_micro,
            gumbel_select_frac,
            hashed_ngram_bucket_counts,
        )

        train_docs = split.filter("split = 'train'").select("doc_id", "text")
        reference = raw.filter(F.col("doc_id") % 97 == 0).select("doc_id", "text")
        lr = fit_log_ratio_micro(
            hashed_ngram_bucket_counts(reference, n_buckets=4096),
            hashed_ngram_bucket_counts(train_docs, n_buckets=4096),
            4096,
        )
        weighted = train_docs.join(
            dsir_log_weights(train_docs, lr).select("doc_id", "log_weight"),
            "doc_id",
        )
        selected = gumbel_select_frac(weighted, 0.6, LcgRandom("doc_id", 29))
        n_sel = selected.count()
        n_train = train_docs.count()
        assert 0 < n_sel < n_train, (n_sel, n_train)
        print(
            f"  DSIR-selected: {n_sel}/{n_train} train docs "
            f"({100 * n_sel / n_train:.1f}% kept, weighted toward the "
            "reference style)"
        )

        # last mile: one seeded global shuffle order, cut into
        # ~2048-token shards (distributed prefix sum — no
        # single-partition stage), then materialize the concatenated
        # training sequences
        from gecko_spark.operators.packing import (
            global_token_shards,
            pack_texts,
        )
        from gecko_spark.operators.text import word_token_count

        sharded = global_token_shards(
            selected.withColumn(
                "n_tokens", word_token_count(F.col("text"))
            ),
            "doc_id", "n_tokens", budget=2048,
            rand=LcgRandom("doc_id", 37), buckets=16,
        )
        seqs = pack_texts(
            sharded.withColumnRenamed("gshard", "shard")
            .withColumn("pack", F.lit(0)),
            "doc_id", "text",
        )
        fills = seqs.select(
            "shard", F.length("text").alias("chars"), "n_docs"
        ).orderBy("shard").collect()
        assert len(fills) > 0
        total_docs = sum(r["n_docs"] for r in fills)
        assert total_docs == n_sel, (total_docs, n_sel)
        print(
            f"  materialized {len(fills)} training shards "
            f"(~2048 tokens each; first shard {fills[0]['n_docs']} docs, "
            f"{fills[0]['chars']} chars)"
        )
    finally:
        spark.stop()


if __name__ == "__main__":
    main()
