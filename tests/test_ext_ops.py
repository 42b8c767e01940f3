"""Tests for the beyond-reference operators: dedup, similarity search,
text analysis, multimodal plumbing — run against the driver-provided
documents/embeddings tables at sf0.001."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from gecko_spark.operators import dedup as D
from gecko_spark.operators import multimodal as MM
from gecko_spark.operators import similarity as S
from gecko_spark.operators import text as TX

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def docs(spark):
    return spark.read.parquet(f"{SF}/documents.parquet").cache()


@pytest.fixture(scope="module")
def embeddings(spark):
    return spark.read.parquet(f"{SF}/embeddings.parquet").cache()


@pytest.fixture(scope="module")
def dup_docs(spark):
    """Documents plus planted exact and near duplicates."""
    base = pd.DataFrame(
        {
            "doc_id": range(8),
            "text": [
                "the quick brown fox jumps over the lazy dog near the river bank",
                "the quick brown fox jumps over the lazy dog near the river bank",  # exact dup of 0
                "the quick brown fox jumps over the lazy dog near the river banks",  # near dup of 0
                "completely different content about machine learning pipelines",
                "völlig anderer inhalt über maschinelles lernen und daten",
                "a short one",
                "numbers 12345 and symbols !!! only here",
                "the quick brown fox jumps over the lazy cat near the river bank",  # near dup of 0
            ],
        }
    )
    from pyspark.sql import SparkSession

    return SparkSession.getActiveSession().createDataFrame(base)


# -- exact dedup -------------------------------------------------------------


def test_exact_duplicate_groups(spark, dup_docs):
    groups = D.exact_duplicate_groups(dup_docs, "text", "doc_id").toPandas()
    assert len(groups) == 1
    assert groups.iloc[0]["n_dupes"] == 2
    assert groups.iloc[0]["keep_id"] == 0


def test_dedupe_exact_keeps_min_id(spark, dup_docs):
    out = D.dedupe_exact(dup_docs, "text", "doc_id").toPandas()
    assert len(out) == 7
    assert 0 in set(out["doc_id"]) and 1 not in set(out["doc_id"])


# -- minhash -----------------------------------------------------------------


def test_minhash_detects_near_dups(spark, dup_docs):
    pairs = D.minhash_candidate_pairs(
        dup_docs, "doc_id", "text", num_hashes=64, bands=16
    ).toPandas()
    found = set(map(tuple, pairs[["id_a", "id_b"]].values))
    assert (0, 1) in found  # exact dup always collides
    est = dict(zip(map(tuple, pairs[["id_a", "id_b"]].values), pairs["est_jaccard"]))
    assert est[(0, 1)] == 1.0
    # near dups land well above unrelated docs
    near = [s for (a, b), s in est.items() if (a, b) in {(0, 2), (0, 7), (1, 2), (1, 7), (2, 7)}]
    assert near and min(near) > 0.5
    assert (3, 4) not in found


def test_minhash_dedupe_removes_losers(spark, dup_docs):
    out = D.minhash_dedupe(dup_docs, "doc_id", "text", threshold=0.9).toPandas()
    assert 0 in set(out["doc_id"])
    assert 1 not in set(out["doc_id"])  # exact dup dropped
    assert 3 in set(out["doc_id"]) and 4 in set(out["doc_id"])


def test_minhash_validates_bands(spark, dup_docs):
    with pytest.raises(ValueError, match="must divide"):
        D.minhash_candidate_pairs(dup_docs, "doc_id", "text", num_hashes=64, bands=7)


# -- simhash -----------------------------------------------------------------


def test_simhash_near_dup_pairs(spark, dup_docs):
    pairs = D.simhash_candidate_pairs(
        dup_docs, "doc_id", "text", max_hamming=10
    ).toPandas()
    found = set(map(tuple, pairs[["id_a", "id_b"]].values))
    assert (0, 1) in found
    ham = dict(zip(map(tuple, pairs[["id_a", "id_b"]].values), pairs["hamming"]))
    assert ham[(0, 1)] == 0


# -- ngram jaccard -----------------------------------------------------------


def test_ngram_jaccard_exact_values(spark, dup_docs):
    pairs = D.ngram_jaccard_pairs(dup_docs, "doc_id", "text", n=3, threshold=0.5).toPandas()
    est = dict(zip(map(tuple, pairs[["id_a", "id_b"]].values), pairs["jaccard"]))
    assert est[(0, 1)] == 1.0
    assert est[(0, 2)] > 0.8


def test_ngram_jaccard_prefix_matches_naive(spark, docs):
    """Prefix filtering (AllPairs) is exact: byte-identical pair set and
    similarities vs the naive inverted-index join, at several thresholds."""
    sample = docs.limit(120)
    for t in (0.3, 0.5, 0.8):
        naive = D.ngram_jaccard_pairs(sample, "doc_id", "text", n=4, threshold=t).toPandas()
        pref = D.ngram_jaccard_pairs_prefix(
            sample, "doc_id", "text", n=4, threshold=t
        ).toPandas()
        key = lambda d: d.sort_values(["id_a", "id_b"], ignore_index=True)
        pd.testing.assert_frame_equal(key(naive), key(pref), check_exact=False, rtol=1e-9)


def test_ngram_jaccard_prefix_capped_matches_naive_capped(spark, docs):
    """With a document-frequency cap both modes define the same capped
    shingle universe — outputs must still agree."""
    sample = docs.limit(120)
    naive = D.ngram_jaccard_pairs(
        sample, "doc_id", "text", n=4, threshold=0.35, max_shingle_freq=40
    ).toPandas()
    pref = D.ngram_jaccard_pairs_prefix(
        sample, "doc_id", "text", n=4, threshold=0.35, max_shingle_freq=40
    ).toPandas()
    key = lambda d: d.sort_values(["id_a", "id_b"], ignore_index=True)
    pd.testing.assert_frame_equal(key(naive), key(pref), check_exact=False, rtol=1e-9)


# -- documents table sanity --------------------------------------------------


def test_dedup_on_real_documents(spark, docs):
    n = docs.count()
    deduped = D.dedupe_exact(docs, "text", "doc_id")
    assert deduped.count() <= n


# -- similarity search -------------------------------------------------------


def test_cosine_sim_matches_numpy(spark, embeddings):
    pdf = embeddings.limit(5).toPandas()
    sdf = embeddings.limit(5)
    got = (
        sdf.alias("a")
        .crossJoin(sdf.alias("b"))
        .select(
            F.col("a.vec_id").alias("ia"),
            F.col("b.vec_id").alias("ib"),
            S.cosine_sim(F.col("a.embedding"), F.col("b.embedding")).alias("c"),
        )
        .toPandas()
    )
    vecs = {r["vec_id"]: np.array(r["embedding"], dtype=np.float64) for _, r in pdf.iterrows()}
    for _, r in got.iterrows():
        a, b = vecs[r["ia"]], vecs[r["ib"]]
        expected = float(a @ b / (np.linalg.norm(a) * np.linalg.norm(b)))
        assert abs(r["c"] - expected) < 1e-9


def test_bruteforce_topk_self_is_rank_one(spark, embeddings):
    queries = embeddings.limit(3).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("query_vec")
    )
    topk = S.cosine_topk_bruteforce(embeddings, queries, k=5).toPandas()
    rank1 = topk[topk["rank"] == 1]
    assert (rank1["query_id"] == rank1["vec_id"]).all()
    assert np.allclose(rank1["cosine"], 1.0)
    assert (topk.groupby("query_id").size() == 5).all()


def test_opq_beats_pq_on_anisotropic_data(spark):
    from gecko_spark.operators.similarity import (
        _pq_reconstruct_sample,
        opq_train,
        pq_train,
        rotate_vectors,
    )

    # anisotropic corpus: all the energy sits in dims 0..3, the rest is
    # small noise — axis-aligned PQ gives 4 subspaces nothing to encode
    rng = np.random.default_rng(5)
    n, dim = 2048, 16
    x = rng.normal(size=(n, dim)) * 0.05
    x[:, :4] += rng.normal(size=(n, 4)) * 2.0
    # mix so the heavy directions STRADDLE subspace boundaries
    q, _ = np.linalg.qr(rng.normal(size=(dim, dim)))
    x = x @ q
    df = spark.createDataFrame(
        [(i, [float(v) for v in row]) for i, row in enumerate(x)],
        "vec_id long, embedding array<double>",
    )
    books_pq = pq_train(df, m=8, k_codes=16, seed=0)
    R, books_opq = opq_train(df, m=8, k_codes=16, seed=0, opq_iters=5)
    # R is orthogonal
    np.testing.assert_allclose(R @ R.T, np.eye(dim), atol=1e-9)
    # quantization error: OPQ in rotated space must beat PQ materially
    err_pq = ((x - _pq_reconstruct_sample(x, books_pq)) ** 2).mean()
    xr = x @ R
    err_opq = ((xr - _pq_reconstruct_sample(xr, books_opq)) ** 2).mean()
    assert err_opq < 0.8 * err_pq, (err_opq, err_pq)
    # the serving kernel rotates exactly like numpy
    got = (
        rotate_vectors(df.limit(50), R)
        .orderBy("vec_id")
        .toPandas()["embedding"]
        .tolist()
    )
    np.testing.assert_allclose(np.array(got), x[:50] @ R, atol=1e-12)
    # determinism: retraining reproduces (R, books) bit-identically
    R2, books2 = opq_train(df, m=8, k_codes=16, seed=0, opq_iters=5)
    np.testing.assert_array_equal(R, R2)
    np.testing.assert_array_equal(books_opq, books2)


def test_opq_validation_and_identity_regime(spark):
    from gecko_spark.operators.similarity import opq_train, rotate_vectors

    df = spark.createDataFrame(
        [(i, [float(i), 0.0, 1.0, 2.0]) for i in range(64)],
        "vec_id long, embedding array<double>",
    )
    with pytest.raises(ValueError, match="not divisible"):
        opq_train(df, m=3)
    with pytest.raises(ValueError, match="rotation must be square"):
        rotate_vectors(df, np.zeros((4, 3)))
    with pytest.raises(Exception, match="dim"):
        rotate_vectors(df, np.eye(5)).collect()


def test_hard_negative_pairs_excludes_same_label(spark, embeddings):
    anchors = embeddings.filter(F.col("vec_id") < 4)
    out = S.hard_negative_pairs(embeddings, anchors, k=5).toPandas()
    # exactly 5 per anchor, ranks 1..5, every negative a different label
    assert (out.groupby("anchor_id").size() == 5).all()
    labels = {
        r["vec_id"]: r["label"]
        for r in embeddings.select("vec_id", "label").collect()
    }
    for _, r in out.iterrows():
        assert labels[r["anchor_id"]] != labels[r["vec_id"]]
    # brute-force model: the rank-1 negative really is the nearest
    # other-label vector
    pdf = embeddings.toPandas()
    vecs = np.array(pdf["embedding"].tolist(), dtype=np.float64)
    vecs = vecs / np.linalg.norm(vecs, axis=1, keepdims=True)
    ids = pdf["vec_id"].to_numpy()
    labs = pdf["label"].to_numpy()
    for aid in range(4):
        av = vecs[ids == aid][0]
        mask = labs != labs[ids == aid][0]
        sims = vecs[mask] @ av
        cand = ids[mask]
        order = np.lexsort((cand, -sims))
        want = cand[order][0]
        got = out[(out.anchor_id == aid) & (out["rank"] == 1)]["vec_id"].iloc[0]
        assert got == want, (aid, got, want)


def test_hard_negative_pairs_ivf_recall(spark, embeddings):
    anchors = embeddings.filter(F.col("vec_id") < 6)
    exact = S.hard_negative_pairs(embeddings, anchors, k=5).toPandas()
    with_lists, cents = S.ivf_assign(embeddings, n_centroids=8, seed=1)
    with_lists = with_lists.cache()
    # full probe == exact: every list is scanned, same ranking contract
    full = S.hard_negative_pairs_ivf(
        with_lists, cents, anchors, k=5, nprobe=8
    ).toPandas()
    key = lambda d: set(zip(d.anchor_id, d.vec_id, d["rank"]))
    assert key(full) == key(exact)
    # pruned probe: recall against exact must stay high on this corpus
    part = S.hard_negative_pairs_ivf(
        with_lists, cents, anchors, k=5, nprobe=4
    ).toPandas()
    pairs = lambda d: set(zip(d.anchor_id, d.vec_id))
    recall = len(pairs(part) & pairs(exact)) / len(pairs(exact))
    # this fixture's embeddings are near-isotropic, the IVF worst case:
    # the unrestricted topk test above bounds half-probe recall at 0.6
    # and the label exclusion can only shrink the candidate pool —
    # measured 0.60 here; the contract is the FULL-probe exactness
    assert recall >= 0.5, recall
    with_lists.unpersist()


def test_hard_negative_pairs_ivf_nullable_int_labels(spark):
    # int label column WITH NULLs: toPandas coerces to float64/NaN —
    # the round-trip must restore None/int, matching the exact miner
    rows = [(i, [float(i % 7), 1.0], None if i % 5 == 0 else i % 3)
            for i in range(40)]
    df = spark.createDataFrame(
        rows, "vec_id long, embedding array<float>, label int"
    )
    with_lists, cents = S.ivf_assign(df, n_centroids=2, seed=3)
    anchors = df.filter("vec_id < 6")
    full = S.hard_negative_pairs_ivf(
        with_lists, cents, anchors, k=4, nprobe=2
    ).toPandas()
    exact = S.hard_negative_pairs(
        df, anchors, k=4, corpus_rows=40, anchor_rows=6
    ).toPandas()
    key = lambda d: set(zip(d.anchor_id, d.vec_id, d["rank"]))
    assert key(full) == key(exact)  # full probe == exact, NULLs included


def test_hard_negative_pairs_null_label_and_guard(spark):
    rows = [
        (0, [1.0, 0.0], "a"),
        (1, [0.9, 0.1], "a"),
        (2, [0.8, 0.2], "b"),
        (3, [0.0, 1.0], None),
        (4, [0.1, 1.0], None),
    ]
    df = spark.createDataFrame(
        rows, "vec_id long, embedding array<float>, label string"
    )
    out = S.hard_negative_pairs(df, k=10, corpus_rows=5, anchor_rows=5).toPandas()
    # NULL anchor: labeled rows are negatives, the other NULL row is not
    neg3 = set(out[out.anchor_id == 3]["vec_id"])
    assert neg3 == {0, 1, 2}
    # labeled anchor: NULL rows count as different-label negatives
    neg0 = set(out[out.anchor_id == 0]["vec_id"])
    assert neg0 == {2, 3, 4}
    # guard raises instead of scoring a quadratic blowup
    with pytest.raises(ValueError, match="batch the"):
        S.hard_negative_pairs(df, k=2, max_scored_rows=10)
    with pytest.raises(ValueError, match="k must be"):
        S.hard_negative_pairs(df, k=0)


def test_ivf_topk_recall_against_bruteforce(spark, embeddings):
    corpus = embeddings
    queries = embeddings.limit(5).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("query_vec")
    )
    exact = S.cosine_topk_bruteforce(corpus, queries, k=5).toPandas()
    with_lists, centroids = S.ivf_assign(corpus, n_centroids=8, seed=1)
    approx = S.cosine_topk_ivf(
        with_lists.cache(), centroids, queries, k=5, nprobe=4
    ).toPandas()
    # recall@5 of IVF with half the lists probed should be decent
    recall = 0.0
    for qid in exact["query_id"].unique():
        e = set(exact[exact["query_id"] == qid]["vec_id"])
        a = set(approx[approx["query_id"] == qid]["vec_id"])
        recall += len(e & a) / len(e)
    recall /= exact["query_id"].nunique()
    assert recall >= 0.6


def test_hyperplane_sketch_collides_for_identical(spark, embeddings):
    df = embeddings.limit(10).select(
        "vec_id", S.random_hyperplane_sketch(F.col("embedding"), 16, seed=3).alias("sk")
    )
    pdf = df.toPandas()
    assert pdf["sk"].notna().all()


# -- text analysis -----------------------------------------------------------


def test_language_id(spark):
    from pyspark.sql import SparkSession

    data = pd.DataFrame(
        {
            "t": [
                "the cat sat on the mat and it was happy with the day",
                "der hund ist nicht mit der katze im haus für immer",
                "le chat est dans la maison avec le chien pour le moment",
                "el perro es un animal que vive en la casa con su familia",
                "zzz qqq xxx",
            ]
        }
    )
    sdf = SparkSession.getActiveSession().createDataFrame(data)
    out = sdf.select(TX.language_id(F.col("t")).alias("lang")).toPandas()["lang"].tolist()
    assert out[:4] == ["en", "de", "fr", "es"]
    assert out[4] == "und"


def test_token_counts(spark):
    from pyspark.sql import SparkSession

    sdf = SparkSession.getActiveSession().createDataFrame(
        pd.DataFrame({"t": ["hello world, it's 2024!"]})
    )
    row = sdf.select(
        TX.token_count(F.col("t"), "whitespace").alias("ws"),
        TX.token_count(F.col("t"), "bpe_ish").alias("bpe"),
    ).first()
    assert row["ws"] == 4
    # hello | world | , | it | ' | s | 2024 | !
    assert row["bpe"] == 8


def test_quality_features_and_score(spark, docs):
    out = docs.limit(50).select(
        "doc_id", *TX.quality_features(F.col("text")), TX.quality_score(F.col("text")).alias("q")
    ).toPandas()
    assert out["n_chars"].gt(0).all()
    assert out["alpha_ratio"].between(0, 1).all()
    assert out["q"].between(0, 1).all()


def test_fingerprint_bag_of_words_invariance(spark):
    from pyspark.sql import SparkSession

    sdf = SparkSession.getActiveSession().createDataFrame(
        pd.DataFrame({"a": ["The cat sat"], "b": ["sat the CAT"], "c": ["the dog sat"]})
    )
    row = sdf.select(
        TX.fingerprint(F.col("a")).alias("fa"),
        TX.fingerprint(F.col("b")).alias("fb"),
        TX.fingerprint(F.col("c")).alias("fc"),
    ).first()
    assert row["fa"] == row["fb"]
    assert row["fa"] != row["fc"]


def test_rolling_hash_fingerprint_overlap(spark):
    from pyspark.sql import SparkSession

    sdf = SparkSession.getActiveSession().createDataFrame(
        pd.DataFrame({"a": ["abcdefghijklmnop"], "b": ["abcdefghijklmnoX"]})
    )
    row = sdf.select(
        TX.rolling_hash_fingerprint(F.col("a"), 4, 6).alias("fa"),
        TX.rolling_hash_fingerprint(F.col("b"), 4, 6).alias("fb"),
    ).first()
    assert len(set(row["fa"]) & set(row["fb"])) >= 3  # local edit keeps most mins


# -- multimodal --------------------------------------------------------------


def test_media_table_schema(spark, docs):
    media = MM.media_table(spark, docs.limit(10), "doc_id", "text", "text/plain")
    assert [f.name for f in media.schema.fields] == ["media_id", "content", "mime", "meta"]
    assert media.schema["content"].dataType.typeName() == "binary"
    assert media.count() == 10


def test_decode_image_features_fake(spark, docs):
    media = MM.media_table(spark, docs.limit(20), "doc_id", "text", "image/png")
    feats = MM.decode_image_features(media, out_dim=16, fake=True)
    pdf = feats.toPandas()
    assert len(pdf) == 20
    assert all(len(v) == 16 for v in pdf["features"])
    # deterministic: same content → same features
    feats2 = MM.decode_image_features(media, out_dim=16, fake=True).toPandas()
    a = [list(v) for v in pdf.sort_values("media_id")["features"]]
    b = [list(v) for v in feats2.sort_values("media_id")["features"]]
    assert a == b


def test_decode_unsupported_format_raises(spark, docs):
    # text payloads are neither BMP nor PPM — the real path must surface
    # the honest unsupported-format boundary, not fabricate features
    media = MM.media_table(spark, docs.limit(2), "doc_id", "text", "image/png")
    with pytest.raises(Exception, match="unsupported image format"):
        MM.decode_image_features(media, fake=False).collect()


def test_resize_and_frame_sample_fake(spark, docs):
    media = MM.media_table(spark, docs.limit(5), "doc_id", "text", "video/mp4")
    resized = MM.resize_images(media, 8, 4, fake=True).toPandas()
    assert (resized["content"].str.len() == 32).all()
    frames = MM.sample_video_frames(media, every_n=2, max_frames=3, fake=True).toPandas()
    assert (frames.groupby("media_id").size() <= 3).all()
    assert (frames["frame"].str.len() <= 64).all()


# ---------------------------------------------------------------------------
# connected components / transitive dedupe / skew utilities
# ---------------------------------------------------------------------------


def test_connected_components_chain(spark):
    from gecko_spark.operators.dedup import connected_components

    # chain 1-2-3-4, pair 10-11, singleton edge 20-21
    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (10, 11), (20, 21)], "id_a long, id_b long"
    )
    comps = {r["node"]: r["component"] for r in connected_components(pairs).collect()}
    assert comps == {1: 1, 2: 1, 3: 1, 4: 1, 10: 10, 11: 10, 20: 20, 21: 20}


def test_connected_components_nonconvergence_modes(spark):
    import pytest

    from gecko_spark.core import GeckoWarning
    from gecko_spark.operators.dedup import connected_components

    # a 6-node chain cannot converge in 1 iteration — force the
    # DISTRIBUTED path (the round-14 driver union-find fast path is
    # exact and never non-converges, so the cap must be disabled to
    # exercise the iteration limit)
    pairs = spark.createDataFrame(
        [(i, i + 1) for i in range(1, 6)], "id_a long, id_b long"
    )
    with pytest.warns(GeckoWarning, match="did not converge"):
        connected_components(pairs, max_iterations=1, max_driver_edges=None)
    with pytest.raises(RuntimeError, match="did not converge"):
        connected_components(
            pairs, max_iterations=1, on_nonconvergence="raise",
            max_driver_edges=None,
        )
    with pytest.raises(ValueError, match="on_nonconvergence"):
        connected_components(pairs, on_nonconvergence="explode")
    # the DEFAULT path on the same graph: bounded driver union-find,
    # exact closure regardless of max_iterations
    got = {
        (r["node"], r["component"])
        for r in connected_components(pairs, max_iterations=1).collect()
    }
    assert got == {(i, 1) for i in range(1, 7)}


def test_connected_components_driver_matches_distributed(spark):
    """The two physical strategies must be observationally identical:
    random multi-component graphs (chains, stars, dup edges, isolated
    pairs) labeled by BOTH paths yield the same (node, component) set."""
    import random

    from gecko_spark.operators.dedup import connected_components

    rnd = random.Random(1411)
    edges = []
    # 8 chains/stars over disjoint id ranges + duplicate + reversed edges
    for c in range(8):
        base = c * 100
        n = rnd.randint(2, 12)
        ids = [base + i for i in range(n)]
        if c % 2:  # chain
            edges += [(ids[i], ids[i + 1]) for i in range(n - 1)]
        else:  # star with shuffled spokes
            edges += [(rnd.choice([ids[0], ids[-1]]), x) for x in ids[1:-1]]
            edges.append((ids[0], ids[-1]))
    edges += [(e[1], e[0]) for e in edges[::3]]  # reversed dups
    pairs = spark.createDataFrame(edges, "id_a long, id_b long")
    via_driver = {
        (r["node"], r["component"])
        for r in connected_components(pairs).collect()
    }
    via_dist = {
        (r["node"], r["component"])
        for r in connected_components(pairs, max_driver_edges=None).collect()
    }
    assert via_driver == via_dist
    # every component label is the min id of its member set
    comp_members: dict = {}
    for node, comp in via_dist:
        comp_members.setdefault(comp, []).append(node)
    for comp, members in comp_members.items():
        assert comp == min(members)


def test_minhash_dedupe_transitive(spark, docs):
    from gecko_spark.operators.dedup import minhash_dedupe, minhash_dedupe_transitive

    out = minhash_dedupe_transitive(docs, "doc_id", "text", threshold=0.5)
    n_multi = out.count()
    assert 0 < n_multi <= docs.count()
    # transitive closure can only remove MORE rows than one-shot min-id
    one_shot = minhash_dedupe(docs, "doc_id", "text", threshold=0.5).count()
    assert n_multi <= one_shot


def test_salted_groupby_agg_matches_plain(spark):
    from gecko_spark.operators.skew import salted_groupby_agg

    df = spark.range(0, 10_000).select(
        (F.col("id") % 7).alias("k"), (F.col("id") * 3 % 101).alias("v")
    )
    got = salted_groupby_agg(
        df, ["k"],
        {"n": ("count", "v"), "s": ("sum", "v"), "lo": ("min", "v"), "hi": ("max", "v")},
        buckets=8,
    ).toPandas().sort_values("k").reset_index(drop=True)
    exp = (
        df.groupBy("k")
        .agg(F.count("v").alias("n"), F.sum("v").alias("s"),
             F.min("v").alias("lo"), F.max("v").alias("hi"))
        .toPandas().sort_values("k").reset_index(drop=True)
    )
    assert got.equals(exp)


def test_salted_join_matches_plain(spark):
    from gecko_spark.operators.skew import salted_join

    # heavily skewed left side: 90% of rows share k=0
    left = spark.range(0, 5_000).select(
        F.when(F.col("id") % 10 < 9, 0).otherwise(F.col("id") % 5).alias("k"),
        F.col("id").alias("lv"),
    )
    right = spark.createDataFrame([(i, f"r{i}") for i in range(5)], "k long, rv string")
    got = salted_join(left, right, ["k"], buckets=4).orderBy("lv").toPandas()
    exp = left.join(right, "k").orderBy("lv").toPandas()
    assert got[["k", "lv", "rv"]].equals(exp[["k", "lv", "rv"]])


def test_salt_on_narrow_hash_parity_and_spread(spark):
    """salt_on=(key + disambiguator) must (a) produce identical results,
    (b) hash only the named columns, and (c) still spread a hot key
    across buckets (hashing the key alone would not)."""
    from gecko_spark.operators.skew import _salt, salted_groupby_agg, salted_join

    wide = spark.range(0, 10_000).select(
        (F.col("id") % 7).alias("k"),
        F.col("id").alias("pk"),
        (F.col("id") * 3 % 101).alias("v"),
        *[(F.col("id") + i).alias(f"pad{i}") for i in range(8)],
    )
    got = (
        salted_groupby_agg(
            wide, ["k"], {"n": ("count", "v"), "s": ("sum", "v")},
            buckets=8, salt_on=["pk"],
        )
        .toPandas().sort_values("k").reset_index(drop=True)
    )
    exp = (
        wide.groupBy("k")
        .agg(F.count("v").alias("n"), F.sum("v").alias("s"))
        .toPandas().sort_values("k").reset_index(drop=True)
    )
    assert got[["k", "n", "s"]].equals(exp[["k", "n", "s"]])

    # (b) the hash expression covers exactly (keys + salt_on)
    salted = wide.withColumn("__salt__", _salt(wide, ["k"], ["pk"], 8))
    plan = salted._jdf.queryExecution().analyzed().toString()
    import re

    args = re.search(r"xxhash64\(([^)]*)\)", plan).group(1)
    assert "pad" not in args and "k" in args and "pk" in args

    # (c) a 100%-hot key still lands in every bucket
    hot = spark.range(0, 1000).select(F.lit(0).alias("k"), F.col("id").alias("pk"))
    n_buckets = (
        hot.withColumn("__salt__", _salt(hot, ["k"], ["pk"], 8))
        .select("__salt__").distinct().count()
    )
    assert n_buckets == 8

    right = spark.createDataFrame([(i, f"r{i}") for i in range(7)], "k long, rv string")
    gj = salted_join(wide, right, ["k"], buckets=4, salt_on=["pk"]).orderBy("pk").toPandas()
    ej = wide.join(right, "k").orderBy("pk").toPandas()
    assert gj[["k", "pk", "rv"]].equals(ej[["k", "pk", "rv"]])


def test_ivf_index_roundtrip_and_pruned_search(spark, embeddings, tmp_path):
    from gecko_spark.operators.similarity import (
        cosine_topk_ivf,
        ivf_assign,
        read_ivf_index,
        write_ivf_index,
    )

    corpus, centroids = ivf_assign(embeddings, n_centroids=8, seed=3)
    path = str(tmp_path / "ivf")
    write_ivf_index(corpus, path, centroids)
    lists, cent2 = read_ivf_index(spark, path)
    assert np.allclose(centroids, cent2)
    assert lists.count() == embeddings.count()

    qs = embeddings.limit(2).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("query_vec")
    )
    hits = cosine_topk_ivf(lists, cent2, qs, k=3, nprobe=3)
    pdf = hits.toPandas()
    assert (pdf.groupby("query_id").size() == 3).all()
    # self-vector must be its own top hit
    top1 = pdf[pdf["rank"] == 1]
    assert (top1["query_id"].to_numpy() == top1["vec_id"].to_numpy()).all()
    # pruning: the probed-list filter reaches the scan as a partition filter
    plan = hits._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan


def test_dedupe_exact_null_columns_not_conflated(spark):
    # ('x', NULL) and (NULL, 'x') are DIFFERENT content — a bare
    # xxhash64(*cols) would conflate them (hash skips null children)
    df = spark.createDataFrame(
        [(1, "x", None), (2, None, "x"), (3, "x", None)],
        "id long, a string, b string",
    )
    out = D.dedupe_exact(df, ["a", "b"], id_col="id")
    assert sorted(r["id"] for r in out.collect()) == [1, 2]
    groups = D.exact_duplicate_groups(df, ["a", "b"], id_col="id").collect()
    assert len(groups) == 1 and groups[0]["keep_id"] == 1 and groups[0]["n_dupes"] == 2


def test_minhash_bucket_cap_prevents_degenerate_blowup(spark):
    # 200 empty docs share one signature; the cap drops that bucket
    df = spark.createDataFrame(
        [(i, "") for i in range(200)] + [(900, "abcdefgh"), (901, "abcdefgh")],
        "doc_id long, text string",
    )
    pairs = D.minhash_candidate_pairs(
        df, "doc_id", "text", num_hashes=16, bands=4, max_bucket_size=50
    ).collect()
    ids = {(r["id_a"], r["id_b"]) for r in pairs}
    assert (900, 901) in ids
    assert all(a >= 900 for a, _ in ids)  # empty-doc bucket dropped


def test_uncapped_pairing_streams_instead_of_buffering(spark, docs):
    # max_bucket_size=None means a degenerate bucket's fan-out is
    # unbounded: the pairing must take the streaming self-join shape
    # (SMJ spills) rather than buffering whole buckets in a
    # collect_list aggregation buffer — while producing the identical
    # pair set (VERDICT r14 "what's wrong" #1).
    def _plan(df):
        return df._jdf.queryExecution().executedPlan().toString()

    def _rows(df):
        return sorted(tuple(r) for r in df.collect())

    mh_u = D.minhash_candidate_pairs(docs, "doc_id", "text", max_bucket_size=None)
    mh_c = D.minhash_candidate_pairs(docs, "doc_id", "text", max_bucket_size=10**9)
    assert "collect_list" not in _plan(mh_u), "uncapped minhash must not buffer buckets"
    assert "collect_list" in _plan(mh_c), "capped minhash keeps the grouped shape"
    assert _rows(mh_u) == _rows(mh_c)

    sh_u = D.simhash_candidate_pairs(docs, "doc_id", "text", max_bucket_size=None)
    sh_c = D.simhash_candidate_pairs(docs, "doc_id", "text", max_bucket_size=10**9)
    assert "collect_list" not in _plan(sh_u), "uncapped simhash must not buffer blocks"
    assert "collect_list" in _plan(sh_c), "capped simhash keeps the grouped shape"
    assert _rows(sh_u) == _rows(sh_c)


def test_salted_join_rejects_outer_modes(spark):
    from gecko_spark.operators.skew import salted_join

    left = spark.range(3).select(F.col("id").alias("k"))
    with pytest.raises(ValueError, match="salted_join supports"):
        salted_join(left, left, ["k"], how="full")


def test_filter_documents_and_normalize(spark, docs):
    from gecko_spark.operators.text import filter_documents, normalize_text

    total = docs.count()
    kept = filter_documents(docs, min_chars=10, min_quality=0.3, languages=["en", "de"])
    n_kept = kept.count()
    assert 0 < n_kept < total
    # normalization: idempotent, lowercase, single-spaced
    norm = docs.select(normalize_text(F.col("text"), strip_punct=True).alias("n"))
    pdf = norm.toPandas()
    assert (pdf["n"] == pdf["n"].str.lower()).all()
    assert not pdf["n"].str.contains("  ").any()
    renorm = norm.select(normalize_text(F.col("n"), strip_punct=True).alias("n")).toPandas()
    assert (pdf["n"] == renorm["n"]).all()


def test_cosine_topk_matrix_matches_bruteforce(spark):
    from gecko_spark.operators.similarity import (
        cosine_topk_bruteforce,
        cosine_topk_matrix,
    )
    from gecko_spark.sources.testdata import load_table

    emb = load_table(spark, "/root/testdata/sf0.001", "embeddings")
    qs = emb.filter(F.col("vec_id") < 10).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("query_vec")
    )
    bf = cosine_topk_bruteforce(emb, qs, k=5).select("query_id", "vec_id").toPandas()
    mx = cosine_topk_matrix(emb, qs, k=5).select("query_id", "vec_id").toPandas()
    key = lambda pdf: set(map(tuple, pdf.values))
    assert key(bf) == key(mx)
    # ranks agree wherever cosines are distinct (random vectors: everywhere)
    bf2 = cosine_topk_bruteforce(emb, qs, k=5).select("query_id", "vec_id", "rank").toPandas()
    mx2 = cosine_topk_matrix(emb, qs, k=5).select("query_id", "vec_id", "rank").toPandas()
    m = bf2.merge(mx2, on=["query_id", "vec_id"])
    assert (m["rank_x"] == m["rank_y"]).all()


# -- sampling ----------------------------------------------------------------


def test_stratified_sample_rates_and_determinism(spark):
    from gecko_spark.core import LcgRandom
    from gecko_spark.operators.sampling import stratified_sample

    df = spark.range(0, 30_000).select(
        "id", (F.col("id") % 3).cast("string").alias("s")
    )
    out = stratified_sample(
        df, "s", {"0": 0.5, "1": 0.1}, rand=LcgRandom("id", 9), default_fraction=0.0
    )
    got = {r["s"]: r["count"] for r in out.groupBy("s").count().collect()}
    assert "2" not in got  # default 0 drops unlisted strata
    assert abs(got["0"] / 10_000 - 0.5) < 0.03
    assert abs(got["1"] / 10_000 - 0.1) < 0.02
    # identical membership on a different layout
    a = out.orderBy("id").toPandas()
    b = (
        stratified_sample(
            df.repartition(13), "s", {"0": 0.5, "1": 0.1},
            rand=LcgRandom("id", 9), default_fraction=0.0,
        )
        .orderBy("id").toPandas()
    )
    assert a["id"].tolist() == b["id"].tolist()


def test_hash_sample_n_exact_group_sizes(spark):
    from gecko_spark.core import LcgRandom
    from gecko_spark.operators.sampling import hash_sample_n

    df = spark.range(0, 10_000).select(
        "id", (F.col("id") % 5).cast("string").alias("g")
    )
    out = hash_sample_n(df, 7, rand=LcgRandom("id", 10), by="g", tiebreak="id")
    sizes = {r["g"]: r["count"] for r in out.groupBy("g").count().collect()}
    assert all(v == 7 for v in sizes.values()) and len(sizes) == 5
    # small groups keep everything
    tiny = hash_sample_n(
        df.filter("id < 3"), 7, rand=LcgRandom("id", 10), tiebreak="id"
    )
    assert tiny.count() == 3


def test_weighted_sample_favors_heavy_rows(spark):
    from gecko_spark.core import LcgRandom
    from gecko_spark.operators.sampling import weighted_sample_n

    # 1000 rows, 10 of them 100x heavier; sample 100 repeatedly via
    # different seeds and check the heavy rows are strongly enriched
    df = spark.range(0, 1000).select(
        "id", F.when(F.col("id") < 10, 100.0).otherwise(1.0).alias("w")
    )
    heavy_hits = 0
    for seed in range(5):
        out = weighted_sample_n(
            df, 100, "w", rand=LcgRandom("id", 400 + seed), tiebreak="id"
        )
        heavy_hits += out.filter("id < 10").count()
    # heavy rows: weight share 1000/1990 ≈ 50% of early picks; with
    # n=100 of 1000 they should almost all be selected (~10/10 per draw)
    assert heavy_hits >= 40  # ≥ 8 of 10 per seed on average
    assert weighted_sample_n(df, 100, "w", rand=LcgRandom("id", 1), tiebreak="id").count() == 100


def test_mix_corpus_exact_mixture(spark):
    from gecko_spark.core import LcgRandom
    from gecko_spark.operators.sampling import mix_corpus

    # skewed corpus: a=6000, b=3000, c=1000, d=500 → target 1:1:2 over
    # a/b/c. Binding stratum is c (cap 2000 wanted, only 1000 there):
    # T = min(6000*4//1, 3000*4//1, 1000*4//2) = 2000 → caps 500/500/1000
    df = spark.range(0, 10_500).select(
        "id",
        F.when(F.col("id") < 6000, "a")
        .when(F.col("id") < 9000, "b")
        .when(F.col("id") < 10_000, "c")
        .otherwise("d")
        .alias("g"),
    )
    out = mix_corpus(
        df, "g", {"a": 1, "b": 1, "c": 2}, rand=LcgRandom("id", 77), tiebreak="id"
    )
    sizes = {r["g"]: r["count"] for r in out.groupBy("g").count().collect()}
    assert sizes == {"a": 500, "b": 500, "c": 1000}  # exact, 'd' dropped
    # membership is layout-independent
    a1 = out.orderBy("id").toPandas()["id"].tolist()
    a2 = (
        mix_corpus(
            df.repartition(17), "g", {"a": 1, "b": 1, "c": 2},
            rand=LcgRandom("id", 77), tiebreak="id",
        )
        .orderBy("id").toPandas()["id"].tolist()
    )
    assert a1 == a2


def test_mix_corpus_bernoulli_and_errors(spark):
    import pytest as _pytest

    from gecko_spark.core import LcgRandom
    from gecko_spark.operators.sampling import mix_corpus

    df = spark.range(0, 20_000).select(
        "id", F.when(F.col("id") % 4 < 3, "big").otherwise("small").alias("g")
    )
    # big=15000, small=5000, target 1:1 → T=10000, caps 5000/5000
    out = mix_corpus(
        df, "g", {"big": 1, "small": 1}, rand=LcgRandom("id", 78),
        method="bernoulli",
    )
    sizes = {r["g"]: r["count"] for r in out.groupBy("g").count().collect()}
    # bernoulli: ±√n wobble around the caps; small keeps ~everything
    assert abs(sizes["big"] - 5000) < 300
    assert abs(sizes["small"] - 5000) < 300
    with _pytest.raises(ValueError, match="absent from the corpus"):
        mix_corpus(df, "g", {"big": 1, "nope": 1}, rand=LcgRandom("id", 79))
    with _pytest.raises(ValueError, match="positive int"):
        mix_corpus(df, "g", {"big": 0.5}, rand=LcgRandom("id", 79))


def test_text_and_dedup_kernels_null_safe(spark):
    """Null/empty documents must flow through every text/dedup kernel."""
    from gecko_spark.operators.text import text_stats
    import gecko_spark.operators.dedup as D

    df = spark.createDataFrame(
        [(0, None), (1, ""), (2, "a"), (3, "hello world hello"), (4, None)],
        "doc_id long, text string",
    )
    st = text_stats(df).toPandas()
    assert len(st) == 5
    assert st.loc[st["doc_id"] == 0, "n_chars"].iloc[0] == 0
    assert st.loc[st["doc_id"] == 0, "lang_pred"].iloc[0] == "und"

    sigs = df.select(D.minhash_signature(F.col("text")).alias("s")).toPandas()
    assert all(len(s) == 64 for s in sigs["s"])
    sh = df.select(D.simhash(F.col("text")).alias("h")).toPandas()
    assert sh["h"].iloc[0] == 0 and sh["h"].iloc[1] == 0

    pairs = D.minhash_candidate_pairs(df, "doc_id", "text")
    # the two null and one empty doc share the empty signature -> pairs
    assert pairs.filter("id_a = 0 AND id_b = 4").count() == 1


def test_minhash_signature_matches_reference_model(spark):
    """The Arrow signature kernel must agree BIT-FOR-BIT with an
    independent per-row model of the documented hash (window polynomial
    mod P → k universal hashes → min). Pins the round-14 distinct-
    before-grid optimization (np.unique cannot change a minimum) and
    any future kernel rewrite — the DuckDB oracles replay this exact
    arithmetic, so a one-ULP drift here fails 8 contract entries."""
    import numpy as np

    import gecko_spark.operators.dedup as D
    from gecko_spark.functions.portable_hash import code_points, powers

    import random
    import string

    rnd = random.Random(1414)
    texts = ["", None, "ab", "abcd", "abcde", "hello world",
             "日本語テキストの長さ試験\U0001F600"]
    for _ in range(40):
        L = rnd.choice([1, 4, 5, 6, 37, 200, 1500])
        texts.append("".join(
            rnd.choice(string.ascii_letters + " .,!日本") for _ in range(L)
        ))
    n, k = 5, 64
    params = np.asarray(D._perm_params(k, 0), dtype=np.int64)
    a_col = params[:, 0][:, None]
    b_col = params[:, 1][:, None]
    pows = powers(n, D._P)

    def model(t):
        c = code_points(t.lower()) if t else np.empty(0, np.uint32)
        if len(c) == 0:
            return [D._P] * k
        if len(c) < n:
            h = np.array([int(c @ pows[-len(c):]) % D._P], dtype=np.int64)
        else:
            win = np.lib.stride_tricks.sliding_window_view(c, n)
            h = (win.astype(np.int64) @ pows) % D._P
        x = (a_col * h[None, :] + b_col) % D._P
        return [int(v) for v in x.min(axis=1)]

    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "i long, t string"
    )
    got = {
        r["i"]: list(r["s"])
        for r in df.select(
            "i", D.minhash_signature(F.col("t"), k, n, 0).alias("s")
        ).collect()
    }
    for i, t in enumerate(texts):
        assert got[i] == model(t), f"signature drift at row {i}: {t!r}"


def test_kmeans_fit_distributed(spark):
    """Distributed Lloyd's: k unit centroids, assignments cover ≥ most
    clusters, and inertia does not increase across refits."""
    import numpy as np

    from gecko_spark.operators.similarity import dot, infer_dim, kmeans_fit
    from gecko_spark.sources.testdata import load_table

    emb = load_table(spark, "/root/testdata/sf0.001", "embeddings")
    c1 = kmeans_fit(emb, k=8, iters=1, id_col="vec_id")
    c5 = kmeans_fit(emb, k=8, iters=5, id_col="vec_id")
    assert c5.shape == (8, infer_dim(emb, "embedding"))
    assert np.allclose(np.linalg.norm(c5, axis=1), 1.0)

    def mean_best_cos(cents):
        scores = F.array(
            *[dot(F.col("embedding"), F.lit([float(x) for x in c])) for c in cents]
        )
        vnorm = F.sqrt(
            F.aggregate(
                F.col("embedding"), F.lit(0.0),
                lambda a, v: a + v.cast("double") * v.cast("double"),
            )
        )
        return emb.select(
            (F.array_max(scores) / vnorm).alias("s")
        ).agg(F.avg("s")).first()[0]

    # more Lloyd iterations must not make the fit worse
    assert mean_best_cos(c5) >= mean_best_cos(c1) - 1e-9


# -- decontamination + repetition profile ------------------------------------


def test_token_ngrams_edges(spark):
    from gecko_spark.operators.decontam import token_ngrams

    df = spark.createDataFrame(
        [(1, "a b c d"), (2, "a b"), (3, ""), (4, None), (5, "x y x y x")],
        "doc_id long, text string",
    )
    got = {
        r["doc_id"]: sorted(r["g"])
        for r in df.select("doc_id", token_ngrams(F.col("text"), 3).alias("g")).collect()
    }
    assert got[1] == ["a b c", "b c d"]
    assert got[2] == []  # shorter than n
    assert got[3] == []
    assert got[4] == []  # null text -> no grams
    assert got[5] == ["x y x", "y x y"]  # distinct


def test_decontaminate_membership(spark):
    from gecko_spark.operators.decontam import (
        contamination_report,
        decontaminate,
        ngram_overlap_pairs,
    )

    train = spark.createDataFrame(
        [
            (1, "the quick brown fox jumps over the dog"),
            (2, "completely unrelated words here nothing shared"),
            (3, "quick brown fox appears again in this doc"),
        ],
        "doc_id long, text string",
    )
    test = spark.createDataFrame(
        [(100, "we saw the quick brown fox yesterday")], "doc_id long, text string"
    )
    pairs = {
        (r["train_id"], r["test_id"]): r["n_shared"]
        for r in ngram_overlap_pairs(train, test, "doc_id", "text", n=3).collect()
    }
    # 'quick brown fox' shared by docs 1 and 3; doc 1 also shares 'the quick brown'
    assert pairs[(1, 100)] == 2 and pairs[(3, 100)] == 1
    assert (2, 100) not in pairs

    kept = sorted(
        r["doc_id"]
        for r in decontaminate(train, test, "doc_id", "text", n=3).collect()
    )
    assert kept == [2]
    # min_shared=2 keeps the single-gram overlap
    kept2 = sorted(
        r["doc_id"]
        for r in decontaminate(train, test, "doc_id", "text", n=3, min_shared=2).collect()
    )
    assert kept2 == [2, 3]

    rep = contamination_report(train, test, "doc_id", "text", n=3).collect()[0]
    assert rep["test_id"] == 100
    assert rep["n_contaminated_train_docs"] == 2
    assert rep["max_shared"] == 2 and rep["total_shared"] == 3


def test_decontam_hot_gram_guard(spark):
    from gecko_spark.operators.decontam import ngram_overlap_pairs

    # gram 'a b c' occurs in BOTH test docs -> dropped at max_test_df=1
    train = spark.createDataFrame([(1, "a b c")], "doc_id long, text string")
    test = spark.createDataFrame(
        [(10, "a b c x"), (11, "z a b c")], "doc_id long, text string"
    )
    full = ngram_overlap_pairs(train, test, "doc_id", "text", n=3).count()
    capped = ngram_overlap_pairs(
        train, test, "doc_id", "text", n=3, max_test_df=1
    ).count()
    assert full == 2 and capped == 0


def test_repetition_profile(spark):
    from gecko_spark.operators.text import repetition_profile

    df = spark.createDataFrame(
        [
            (1, "spam spam spam spam"),       # top bigram 'spam spam' x3
            (2, "all words are different"),
            (3, "ab"),                         # shorter than 3 -> trigram 0
            (4, None),
        ],
        "doc_id long, text string",
    )
    got = {r["doc_id"]: r.asDict() for r in repetition_profile(df, "doc_id", "text").collect()}
    assert got[1]["n_tokens"] == 4 and got[1]["n_distinct_tokens"] == 1
    assert got[1]["top_2gram_n"] == 3 and got[1]["top_3gram_n"] == 2
    assert got[2]["top_2gram_n"] == 1 and got[2]["top_3gram_n"] == 1
    assert got[3]["n_tokens"] == 1 and got[3]["top_2gram_n"] == 0
    assert got[4]["n_tokens"] == 0 and got[4]["top_3gram_n"] == 0


def test_repetition_profile_engines_agree(spark, docs):
    from gecko_spark.operators.text import repetition_profile

    a = repetition_profile(docs, "doc_id", "text", engine="arrow").orderBy("doc_id").toPandas()
    r = (
        repetition_profile(docs, "doc_id", "text", engine="relational")
        .orderBy("doc_id")
        .toPandas()
    )
    assert a.astype("int64").equals(r[a.columns].astype("int64"))


def test_decontam_bloom_prefilter_exact(spark, docs):
    """The bloom prefilter must be result-invisible: identical overlap
    pairs with and without it, at any filter size (FPs pruned by the
    exact join, no false negatives by construction)."""
    from gecko_spark.operators.decontam import ngram_overlap_pairs

    train = docs.filter(F.col("doc_id") % 5 != 0)
    test = docs.filter(F.col("doc_id") % 5 == 0)
    plain = ngram_overlap_pairs(train, test, "doc_id", "text", n=4).toPandas()
    for bits in (1 << 10, 1 << 16):
        bloomed = ngram_overlap_pairs(
            train, test, "doc_id", "text", n=4, bloom_bits_count=bits
        ).toPandas()
        key = ["train_id", "test_id"]
        a = plain.sort_values(key, ignore_index=True)
        b = bloomed.sort_values(key, ignore_index=True)
        assert a.equals(b), bits


def test_bloom_bits_membership(spark):
    import numpy as np

    from gecko_spark.functions.portable_hash import P1, poly_hash_strings
    from gecko_spark.operators.decontam import _BLOOM_K, _BLOOM_PARAMS, bloom_bits

    grams = spark.createDataFrame([("alpha beta",), ("gamma delta",)], "gram string")
    bits = bloom_bits(grams, 1 << 12)

    def might(v):
        h = poly_hash_strings([v], P1)[0]
        for a, b in _BLOOM_PARAMS[:_BLOOM_K]:
            pos = (h * a + b) % P1 % (1 << 12)
            if not (int(bits[pos // 64]) >> (pos % 64)) & 1:
                return False
        return True

    assert might("alpha beta") and might("gamma delta")
    # overwhelmingly likely negative at 4096 bits with 2 entries
    assert not might("zzz unseen gram qqq")


# -- sequence packing --------------------------------------------------------


def test_pack_sequences_invariants(spark):
    from gecko_spark.operators.packing import pack_manifest, pack_sequences

    rows = [(i, 10 + (i * 37) % 90) for i in range(200)]
    df = spark.createDataFrame(rows, "doc_id long, n_tokens int")
    packed = pack_sequences(df, "doc_id", "n_tokens", budget=100, n_shards=4).toPandas()
    assert len(packed) == 200  # every doc assigned exactly once
    assert packed["pack"].ge(0).all()
    # within a shard, pack ids are non-decreasing in doc order and the
    # pack index equals the doc's starting token offset DIV budget
    for _, g in packed.sort_values("doc_id").groupby("shard"):
        starts = g["n_tokens"].cumsum() - g["n_tokens"]
        assert (g["pack"] == starts // 100).all()
        assert g["pack"].is_monotonic_increasing
    m = pack_manifest(
        pack_sequences(df, "doc_id", "n_tokens", budget=100, n_shards=4), "n_tokens"
    ).toPandas()
    assert m["n_tokens_total"].sum() == sum(n for _, n in rows)
    # pack index range is bounded by the shard's token total: the last
    # start offset is < total, so pack <= (total - 1) // budget
    bounds = m.groupby("shard")["n_tokens_total"].sum()
    for shard, g in m.groupby("shard"):
        assert g["pack"].max() <= (bounds[shard] - 1) // 100


def test_global_token_shards_equals_sequential_model(spark):
    from gecko_spark.core import LcgRandom
    from gecko_spark.operators.packing import global_token_shards

    rows = [(i, 10 + (i * 37) % 90) for i in range(500)]
    df = spark.createDataFrame(rows, "doc_id long, n_tokens int").repartition(7)
    rand = LcgRandom("doc_id", seed=31)
    out = global_token_shards(
        df, "doc_id", "n_tokens", budget=1000, rand=rand, buckets=16
    ).toPandas()
    assert len(out) == 500
    # gstart is a bijection onto the concatenated stream, so sorting by
    # gstart IS the global order; verify the prefix-sum invariants
    # against the sequential model in that order
    s = out.sort_values("gstart")
    n = s["n_tokens"].to_numpy()
    starts = n.cumsum() - n
    assert (s["gstart"].to_numpy() == starts).all()  # contiguous, gap-free
    assert (s["gshard"].to_numpy() == starts // 1000).all()
    # shard totals: every shard except the last holds >= budget - max_doc
    totals = s.groupby("gshard")["n_tokens"].sum()
    assert totals.iloc[:-1].min() >= 1000 - 99
    # determinism + partitioning invariance
    out2 = global_token_shards(
        df.repartition(2), "doc_id", "n_tokens", budget=1000, rand=rand, buckets=16
    ).toPandas()
    merged = out.merge(out2, on="doc_id", suffixes=("", "_2"))
    assert (merged["gstart"] == merged["gstart_2"]).all()
    assert (merged["gshard"] == merged["gshard_2"]).all()
    # a different seed produces a different order
    out3 = global_token_shards(
        df, "doc_id", "n_tokens", budget=1000, rand=LcgRandom("doc_id", 32),
        buckets=16,
    ).toPandas()
    m3 = out.merge(out3, on="doc_id", suffixes=("", "_3"))
    assert (m3["gstart"] != m3["gstart_3"]).any()


def test_global_token_shards_validation(spark):
    from gecko_spark.core import LcgRandom
    from gecko_spark.operators.packing import global_token_shards

    df = spark.createDataFrame([(1, 5)], "doc_id long, n_tokens int")
    with pytest.raises(ValueError, match="budget"):
        global_token_shards(df, "doc_id", "n_tokens", 0, LcgRandom("doc_id", 1))
    with pytest.raises(ValueError, match="buckets"):
        global_token_shards(
            df, "doc_id", "n_tokens", 10, LcgRandom("doc_id", 1), buckets=0
        )
    # single row: shard 0, start 0
    row = global_token_shards(
        df, "doc_id", "n_tokens", 10, LcgRandom("doc_id", 1)
    ).first()
    assert row["gshard"] == 0 and row["gstart"] == 0


def test_pack_texts_materializes_in_id_order(spark):
    from gecko_spark.operators.packing import pack_sequences, pack_texts

    rows = [(i, f"doc{i}" if i % 7 else None, 5) for i in range(60)]
    df = spark.createDataFrame(rows, "doc_id long, text string, n_tokens int")
    packed = pack_sequences(
        df, "doc_id", "n_tokens", budget=20, n_shards=3,
        shard_col=F.pmod(F.col("doc_id"), F.lit(3)).cast("int"),
    )
    out = pack_texts(packed.repartition(5), "doc_id", "text", sep="|").toPandas()
    model = packed.select("shard", "pack", "doc_id", "text").toPandas()
    for (s, p), g in model.groupby(["shard", "pack"]):
        g = g.sort_values("doc_id")
        want = "|".join("" if t is None else t for t in g["text"])
        row = out[(out["shard"] == s) & (out["pack"] == p)]
        assert len(row) == 1
        assert row["text"].iloc[0] == want, (s, p)
        assert row["n_docs"].iloc[0] == len(g)
    # every (shard, pack) materialized exactly once
    assert len(out) == model.groupby(["shard", "pack"]).ngroups


def test_mix_corpus_tokens_balances_tokens_not_rows(spark):
    from gecko_spark.core import LcgRandom
    from gecko_spark.operators.sampling import mix_corpus_tokens

    # stratum 'web': 600 short docs (10 tokens); 'books': 60 long docs
    # (100 tokens) — equal TOKEN totals (6000 each), wildly unequal rows
    rows = [(i, "web", 10) for i in range(600)]
    rows += [(1000 + i, "books", 100) for i in range(60)]
    df = spark.createDataFrame(rows, "doc_id long, source string, n_tokens int")
    rand = LcgRandom("doc_id", seed=13)
    out = mix_corpus_tokens(
        df, "source", "n_tokens", {"web": 1, "books": 1}, rand,
        tiebreak="doc_id",
    ).toPandas()
    tok = out.groupby("source")["n_tokens"].sum()
    # equal-weight TOKEN mixture: each stratum lands within one doc of
    # its 6000-token cap
    assert 6000 - 100 < tok["books"] <= 6000, tok["books"]
    assert 6000 - 10 < tok["web"] <= 6000, tok["web"]
    # determinism + partitioning invariance
    out2 = mix_corpus_tokens(
        df.repartition(7), "source", "n_tokens", {"web": 1, "books": 1},
        rand, tiebreak="doc_id",
    ).toPandas()
    assert sorted(out["doc_id"]) == sorted(out2["doc_id"])
    # bernoulli path: expected token mixture, no window
    b = mix_corpus_tokens(
        df, "source", "n_tokens", {"web": 1, "books": 1}, rand,
        method="bernoulli",
    ).toPandas()
    bt = b.groupby("source")["n_tokens"].sum()
    assert abs(bt["web"] - 6000) < 1500 and abs(bt["books"] - 6000) < 1500
    # weight skew actually skews: 3:1 gives books ~a third of web tokens
    skew = mix_corpus_tokens(
        df, "source", "n_tokens", {"web": 3, "books": 1}, rand,
        tiebreak="doc_id",
    ).toPandas()
    st = skew.groupby("source")["n_tokens"].sum()
    assert st["web"] > 2.5 * st["books"], st.to_dict()


def test_mix_corpus_temperature_flattens_toward_uniform(spark):
    """Temperature weights ∝ S^alpha: at alpha=0.5 a 100:1 token
    imbalance mixes at sqrt ratio 10:1 — the small stratum's SHARE
    rises vs natural proportions; alpha→1 approaches natural."""
    import math

    from gecko_spark.core import LcgRandom
    from gecko_spark.operators.sampling import (
        mix_corpus_temperature,
        temperature_weights,
    )

    # 'big': 1000 docs x 100 tokens (100k); 'small': 100 docs x 10 (1k)
    rows = [(i, "big", 100) for i in range(1000)]
    rows += [(10_000 + i, "small", 10) for i in range(100)]
    df = spark.createDataFrame(rows, "doc_id long, lang string, n_tokens int")
    rand = LcgRandom("doc_id", seed=17)
    out = mix_corpus_temperature(
        df, "lang", "n_tokens", rand, alpha=0.5, tiebreak="doc_id"
    ).toPandas()
    tok = out.groupby("lang")["n_tokens"].sum()
    # caps follow w ∝ sqrt(S): T = min_g S_g*W/w_g is set by the SMALL
    # stratum (it exhausts first), so small keeps ~everything (within
    # one cap-floor rounding + one boundary doc) and big keeps
    # ~sqrt(100k/1k)=10x small's tokens, not 100x
    assert 1000 - 20 <= tok["small"] <= 1000
    ratio = tok["big"] / tok["small"]
    assert 9.0 <= ratio <= 10.5, ratio
    # the weight helper itself: exact half-away micro-quantized sqrt
    w = temperature_weights({"big": 100_000, "small": 1_000})
    assert w["big"] == int(math.floor(math.sqrt(100_000.0) * 1e6 + 0.5))
    assert w["small"] == int(math.floor(math.sqrt(1_000.0) * 1e6 + 0.5))
    # zero-sum strata drop; validation guards
    assert "dead" not in temperature_weights({"dead": 0, "big": 4})
    import pytest as _pytest

    with _pytest.raises(ValueError, match="alpha"):
        temperature_weights({"a": 1}, alpha=0.0)
    # NULL strata excluded; empty result when nothing has tokens
    null_df = spark.createDataFrame(
        [(1, None, 5)], "doc_id long, lang string, n_tokens int"
    )
    assert mix_corpus_temperature(
        null_df, "lang", "n_tokens", rand
    ).count() == 0


def test_mix_corpus_tokens_validation(spark):
    from gecko_spark.core import LcgRandom
    from gecko_spark.operators.sampling import mix_corpus_tokens

    df = spark.createDataFrame(
        [(1, "a", 5)], "doc_id long, source string, n_tokens int"
    )
    rand = LcgRandom("doc_id", 1)
    with pytest.raises(ValueError, match="method"):
        mix_corpus_tokens(df, "source", "n_tokens", {"a": 1}, rand, method="x")
    with pytest.raises(ValueError, match="non-empty"):
        mix_corpus_tokens(df, "source", "n_tokens", {}, rand)
    with pytest.raises(ValueError, match="positive int"):
        mix_corpus_tokens(df, "source", "n_tokens", {"a": 0}, rand)
    with pytest.raises(ValueError, match="token-empty"):
        mix_corpus_tokens(df, "source", "n_tokens", {"a": 1, "zz": 1}, rand)


def test_pack_sequences_custom_shard_portable(spark):
    from gecko_spark.operators.packing import pack_sequences

    df = spark.createDataFrame([(i, 5) for i in range(40)], "doc_id long, n_tokens int")
    packed = pack_sequences(
        df, "doc_id", "n_tokens", budget=20, n_shards=4,
        shard_col=F.pmod(F.col("doc_id"), F.lit(4)).cast("int"),
    ).toPandas()
    assert set(packed["shard"]) == {0, 1, 2, 3}
    # 10 docs x 5 tokens per shard, budget 20 -> packs 0,0,0,0,1,1,1,1,2,2
    one = packed[packed["shard"] == 1].sort_values("doc_id")
    assert list(one["pack"]) == [0, 0, 0, 0, 1, 1, 1, 1, 2, 2]


def test_pack_sequences_duplicate_ids_rows_frame(spark):
    """Duplicate ids must STACK (ROWS frame), not share a start offset
    (Spark's default RANGE frame sums peer rows together)."""
    from gecko_spark.operators.packing import pack_sequences

    df = spark.createDataFrame(
        [(1, 10), (1, 10), (1, 10), (2, 10)], "doc_id long, n_tokens int"
    )
    packed = pack_sequences(
        df, "doc_id", "n_tokens", budget=15, n_shards=1,
        shard_col=F.lit(0),
    ).toPandas()
    # starts 0,10,20,30 -> packs 0,0,1,2 (RANGE would give 20,20,20,30)
    assert sorted(packed["pack"]) == [0, 0, 1, 2]


def test_multimodal_null_content_yields_null_not_error(spark):
    from gecko_spark.operators import multimodal as MM

    df = spark.createDataFrame(
        [(1, None, "image/bmp")], "media_id long, content binary, mime string"
    )
    feats = MM.decode_image_features(df, out_dim=4, fake=False).collect()
    assert feats[0]["features"] is None
    resized = MM.resize_images(df, 2, 2, fake=False).collect()
    assert resized[0]["content"] is None


def test_compact_recovers_from_crash_debris(spark, tmp_path):
    import os
    import shutil

    from gecko_spark.sources.sinks import compact

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    out = str(tmp_path / "d")
    docs.repartition(4).write.partitionBy("lang").parquet(out)
    n = docs.count()
    # simulate a crash between the two renames: path gone, __old__ present
    os.rename(out, out + "__old__")
    before, after = compact(spark, out, ["lang"])
    assert spark.read.parquet(out).count() == n
    assert not os.path.exists(out + "__old__")


def test_incremental_dedupe_against_index(spark, tmp_path):
    """Continuous-ingestion flow: index a corpus once, dedupe a new
    batch against it without re-reading corpus text, append survivors."""
    from gecko_spark.operators.dedup import (
        dedupe_against_index,
        write_minhash_index,
    )

    corpus = spark.createDataFrame(
        [
            (1, "the quick brown fox jumps over the lazy dog near the river"),
            (2, "completely unrelated text about distributed query engines"),
        ],
        "doc_id long, text string",
    )
    idx_path = str(tmp_path / "mh_index")
    write_minhash_index(corpus, "doc_id", "text", idx_path)

    batch = spark.createDataFrame(
        [
            (10, "the quick brown fox jumps over the lazy dog near the river"),   # exact dup of 1
            (11, "the quick brown fox jumps over the lazy cat near the river"),   # near dup of 1
            (12, "fresh document with entirely new content and no overlap"),
        ],
        "doc_id long, text string",
    )
    index = spark.read.parquet(idx_path)
    kept = dedupe_against_index(batch, index, "doc_id", "text", threshold=0.5)
    ids = sorted(r["doc_id"] for r in kept.collect())
    assert ids == [12]

    # append the accepted batch; a re-send of doc 12 now dedupes too
    write_minhash_index(kept, "doc_id", "text", idx_path, mode="append")
    resend = batch.filter(F.col("doc_id") == 12).withColumn(
        "doc_id", F.lit(99).cast("long")
    )
    again = dedupe_against_index(
        resend, spark.read.parquet(idx_path), "doc_id", "text", threshold=0.5
    )
    assert again.count() == 0


def test_round2_ops_partitioning_independent(spark, docs):
    """Decontam overlap, repetition profile, and packing must produce
    identical results regardless of input partitioning — the engine's
    core determinism contract."""
    from gecko_spark.operators.decontam import ngram_overlap_pairs
    from gecko_spark.operators.packing import pack_sequences
    from gecko_spark.operators.text import repetition_profile

    def norm(df, keys):
        return df.orderBy(*keys).toPandas().reset_index(drop=True)

    for parts in (2, 11):
        d = docs.repartition(parts)
        train = d.filter(F.col("doc_id") % 5 != 0)
        test = d.filter(F.col("doc_id") % 5 == 0)
        ov = norm(
            ngram_overlap_pairs(train, test, "doc_id", "text", n=4),
            ["train_id", "test_id"],
        )
        rep = norm(repetition_profile(d, "doc_id", "text"), ["doc_id"])
        pk = norm(
            pack_sequences(
                d.select("doc_id", F.length("text").alias("n_tokens")),
                "doc_id", "n_tokens", budget=512, n_shards=4,
            ),
            ["doc_id"],
        )
        if parts == 2:
            ov0, rep0, pk0 = ov, rep, pk
        else:
            assert ov.equals(ov0)
            assert rep.equals(rep0)
            assert pk.equals(pk0)


# -- semantic dedup (SemDeDup-style) ----------------------------------------


def test_semantic_pairs_match_numpy_within_cluster(spark, embeddings):
    """first_k clustering is deterministic: the pair set must equal a
    numpy brute-force restricted to same-argmax-cluster vectors."""
    got = {
        (r["id_a"], r["id_b"])
        for r in D.semantic_dedupe_pairs(
            embeddings, "vec_id", "embedding", threshold=0.1,
            n_clusters=8, init="first_k",
        ).collect()
    }
    pdf = embeddings.toPandas().sort_values("vec_id")
    ids = pdf["vec_id"].to_numpy()
    vecs = np.stack(pdf["embedding"].to_numpy()).astype(np.float64)
    cents = vecs[np.argsort(ids)[:8]]
    assign = (vecs @ cents.T).argmax(axis=1)
    norms = np.linalg.norm(vecs, axis=1)
    cos = (vecs @ vecs.T) / np.outer(norms, norms)
    expected = set()
    for i in range(len(ids)):
        for j in range(i + 1, len(ids)):
            if assign[i] == assign[j] and cos[i, j] >= 0.1:
                a, b = int(ids[i]), int(ids[j])
                expected.add((min(a, b), max(a, b)))
    assert got == expected
    assert expected  # non-vacuous: clusters do contain similar pairs


def test_semantic_dedupe_drops_planted_near_dup(spark, embeddings):
    # plant a near-identical copy of vector 7 under a fresh high id
    base = embeddings.select("vec_id", "embedding")
    v7 = base.filter(F.col("vec_id") == 7).first()["embedding"]
    twin = [float(x) + 1e-6 for x in v7]
    planted = base.unionByName(
        spark.createDataFrame([(100000, twin)], "vec_id long, embedding array<double>")
    )
    pairs = D.semantic_dedupe_pairs(
        planted, "vec_id", "embedding", threshold=0.999,
        n_clusters=8, init="kmeans", seed=3,
    ).collect()
    assert any(
        {r["id_a"], r["id_b"]} == {7, 100000} and r["cosine"] > 0.999 for r in pairs
    )
    kept = D.semantic_dedupe(
        planted, "vec_id", "embedding", threshold=0.999,
        n_clusters=8, init="kmeans", seed=3,
    )
    kept_ids = {r["vec_id"] for r in kept.select("vec_id").collect()}
    assert 7 in kept_ids and 100000 not in kept_ids  # min-id survives


def test_semantic_cluster_cap_drops_degenerate_cluster(spark):
    # 99 copies of one direction collapse into a single cluster; the
    # cap drops it before the O(f^2) pair expansion. first_k centroids
    # are vec 0 (x-axis) and vec 1 (z-axis); 900/901 lean z-ward so
    # they land in cluster 1 without being near-dups of vec 1 itself.
    rows = [(0, [1.0, 0.0, 0.0, 0.0]), (1, [0.0, 0.0, 1.0, 0.0])]
    rows += [(i, [1.0, 0.0, 0.0, 0.0]) for i in range(2, 100)]
    rows += [(900, [0.0, 0.6, 0.8, 0.0]), (901, [0.0, 0.6, 0.8, 1e-7])]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    pairs = D.semantic_dedupe_pairs(
        df, "vec_id", "embedding", threshold=0.9,
        n_clusters=2, init="first_k", max_cluster_size=50,
    ).collect()
    ids = {(r["id_a"], r["id_b"]) for r in pairs}
    assert (900, 901) in ids
    assert all(a >= 900 for a, _ in ids)  # degenerate cluster dropped


def test_semantic_fold_grouped_matches_pair_kernel(spark):
    """The round-14 grouped fold kernel must be BIT-identical to the
    per-pair cosine_fold_udf arithmetic it replaced (per-dimension
    float64 accumulation, sqrt(na)*sqrt(nb) denominator, zero-norm →
    0.0): the oracle replays the sequential fold exactly, so a last-ulp
    drift here is a contract break, not noise."""
    rng = np.random.default_rng(42)
    vecs = rng.standard_normal((60, 16))
    vecs[13] = 0.0  # zero-norm row exercises the 0.0 convention
    rows = [(i, [float(x) for x in vecs[i]]) for i in range(60)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    got = (
        D.semantic_dedupe_pairs(
            df, "vec_id", "embedding", threshold=-2.0,
            n_clusters=4, init="first_k", method="fold",
        )
        .toPandas()
        .sort_values(["id_a", "id_b"], ignore_index=True)
    )
    # reference: first_k assignment + the ORIGINAL per-pair fold
    x = vecs.astype(np.float64)
    cents = x[:4]
    # sequential-fold assignment dots, first-max tie-break (ivf_assign)
    dots = np.zeros((60, 4))
    for j in range(x.shape[1]):
        dots += x[:, j][:, None] * cents[:, j][None, :]
    assign = dots.argmax(axis=1)
    exp = []
    for a in range(60):
        for b in range(a + 1, 60):
            if assign[a] != assign[b]:
                continue
            dot_ = na = nb = 0.0
            for j in range(x.shape[1]):
                dot_ += x[a, j] * x[b, j]
                na += x[a, j] * x[a, j]
                nb += x[b, j] * x[b, j]
            denom = np.sqrt(na) * np.sqrt(nb)
            exp.append((a, b, dot_ / denom if denom > 0 else 0.0))
    exp_pdf = pd.DataFrame(exp, columns=["id_a", "id_b", "cosine"])
    assert len(got) == len(exp_pdf) and len(got) > 0
    assert (got["id_a"].to_numpy() == exp_pdf["id_a"].to_numpy()).all()
    assert (got["id_b"].to_numpy() == exp_pdf["id_b"].to_numpy()).all()
    # BIT equality, not approx: the whole point of the fold contract
    assert (got["cosine"].to_numpy() == exp_pdf["cosine"].to_numpy()).all()


# -- product quantization ----------------------------------------------------


def test_pq_encode_shape_and_determinism(spark, embeddings):
    books = S.pq_train(embeddings, m=8, k_codes=16, seed=3)
    dim = S.infer_dim(embeddings, "embedding")
    assert books.shape == (8, 16, dim // 8)
    codes = S.pq_encode(embeddings, books).toPandas()
    assert len(codes) == embeddings.count()
    arr = np.array(codes["codes"].tolist())
    assert arr.shape[1] == 8
    assert arr.min() >= 0 and arr.max() < 16
    # deterministic: retrain + re-encode is identical
    books2 = S.pq_train(embeddings, m=8, k_codes=16, seed=3)
    assert np.array_equal(books, books2)
    codes2 = S.pq_encode(embeddings, books2).toPandas()
    m1 = codes.sort_values("vec_id")["codes"].tolist()
    m2 = codes2.sort_values("vec_id")["codes"].tolist()
    assert all(np.array_equal(a, b) for a, b in zip(m1, m2))
    # ...and by CONTENT, not physical layout: a re-ingest with a
    # different partitioning/row order trains the same codebooks
    # (ADVICE r5 — DataFrame.sample would not)
    reingested = embeddings.repartition(7, "vec_id").sortWithinPartitions(
        F.col("vec_id").desc()
    )
    books3 = S.pq_train(reingested, m=8, k_codes=16, seed=3)
    assert np.array_equal(books, books3)


def test_pq_adc_recall_against_bruteforce(spark, embeddings):
    queries = embeddings.limit(5).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("query_vec")
    )
    exact = S.cosine_topk_bruteforce(embeddings, queries, k=5).toPandas()
    books = S.pq_train(embeddings, m=16, k_codes=32, seed=0)
    codes = S.pq_encode(embeddings, books).cache()
    approx = S.pq_topk_adc(codes, books, queries, k=5).toPandas()
    assert (approx.groupby("query_id").size() == 5).all()
    # embeddings are ~unit-norm, so squared-L2 ADC ranks ≈ cosine ranks.
    # Random near-orthogonal vectors are PQ's worst case (top-5 gaps sit
    # inside the quantization noise), so plain ADC only has to beat the
    # ~1% random-guess floor convincingly...
    def _recall(approx_pdf):
        r = 0.0
        for qid in exact["query_id"].unique():
            e = set(exact[exact["query_id"] == qid]["vec_id"])
            a = set(approx_pdf[approx_pdf["query_id"] == qid]["vec_id"])
            r += len(e & a) / len(e)
        return r / exact["query_id"].nunique()

    assert _recall(approx) >= 0.3
    # self-query must be its own nearest code sequence
    r1 = approx[approx["rank"] == 1]
    assert (r1["query_id"] == r1["vec_id"]).all()
    # ...while the production shape — ADC shortlist + exact re-rank —
    # recovers high recall at Q×shortlist re-rank cost
    rer = S.pq_topk_rerank(
        codes, books, embeddings, queries, k=5, shortlist=100
    ).toPandas()
    assert (rer.groupby("query_id").size() == 5).all()
    assert _recall(rer) >= 0.9
    with pytest.raises(ValueError):
        S.pq_topk_rerank(codes, books, embeddings, queries, k=50, shortlist=10)


def test_pq_rerank_fused_kernel_plan(spark, embeddings):
    """ADVICE r10 plan guard, round-11 form: the rerank fetch
    broadcasts ONLY the (query_id, vec_id) candidate pairs — one
    BroadcastHashJoin, no SortMergeJoin — and the query vectors ride
    the scoring kernel's closure (MapInPandas in the plan), so the
    broadcast payload is id pairs, there is no second join at all, and
    the corpus side never shuffles. (The r10 two-broadcast form paid a
    per-row hash join + interpreted HOF cosine — a measured 1.2x
    band-edge regression.)"""
    queries = embeddings.limit(3).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("query_vec")
    )
    books = S.pq_train(embeddings, m=8, k_codes=16, seed=3)
    codes = S.pq_encode(embeddings, books)
    rer = S.pq_topk_rerank(codes, books, embeddings, queries, k=3, shortlist=20)
    rer.count()  # materialize for the AQE-final plan
    plan = rer._jdf.queryExecution().executedPlan().toString()
    assert "SortMergeJoin" not in plan, plan
    assert "BroadcastHashJoin" in plan, plan
    assert "MapInPandas" in plan, plan


def test_pq_validates_inputs(spark, embeddings):
    with pytest.raises(ValueError):
        S.pq_train(embeddings, m=7)  # dim not divisible
    with pytest.raises(ValueError):
        S.pq_train(embeddings, m=8, k_codes=1)


def test_pq_index_roundtrip(spark, embeddings, tmp_path):
    books = S.pq_train(embeddings, m=8, k_codes=16, seed=5)
    codes = S.pq_encode(embeddings, books)
    S.write_pq_index(codes, books, str(tmp_path / "pq"))
    codes2, books2 = S.read_pq_index(spark, str(tmp_path / "pq"))
    assert np.array_equal(books, books2)
    a = codes.toPandas().sort_values("vec_id")["codes"].tolist()
    b = codes2.toPandas().sort_values("vec_id")["codes"].tolist()
    assert all(np.array_equal(x, y) for x, y in zip(a, b))
    # search on the loaded index matches search on the in-memory one
    queries = embeddings.limit(3).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("query_vec")
    )
    r1 = S.pq_topk_adc(codes, books, queries, k=5).toPandas()
    r2 = S.pq_topk_adc(codes2, books2, queries, k=5).toPandas()
    key = ["query_id", "vec_id", "rank"]
    assert r1.sort_values(key).reset_index(drop=True).equals(
        r2.sort_values(key).reset_index(drop=True)
    )


def test_bruteforce_size_guard_dispatches_and_raises(spark):
    """Above max_scored_rows the window path must not run: dispatch swaps
    in the map-side-top-k matrix plan (same ranking contract), and
    on_overflow='raise' refuses with a hint (VERDICT r5 §wrong: nothing
    stopped a corpus-scale call from hitting the per-query single-reducer
    window)."""
    import pytest

    from gecko_spark.operators.similarity import cosine_topk_bruteforce
    from gecko_spark.sources.testdata import load_table

    emb = load_table(spark, "/root/testdata/sf0.001", "embeddings")
    qs = emb.filter(F.col("vec_id") < 10).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("query_vec")
    )
    unguarded = cosine_topk_bruteforce(emb, qs, k=5, max_scored_rows=None)
    assert "mapinpandas" not in unguarded._jdf.queryExecution().executedPlan().toString().lower()

    # 500 corpus rows x 10 queries = 5000 pairs > 100 -> must dispatch
    dispatched = cosine_topk_bruteforce(emb, qs, k=5, max_scored_rows=100)
    assert "mapinpandas" in dispatched._jdf.queryExecution().executedPlan().toString().lower()
    a = unguarded.select("query_id", "vec_id", "rank").toPandas()
    b = dispatched.select("query_id", "vec_id", "rank").toPandas()
    key = lambda pdf: set(map(tuple, pdf.values))
    assert key(a) == key(b)

    with pytest.raises(ValueError, match="cosine_topk_matrix"):
        cosine_topk_bruteforce(emb, qs, k=5, max_scored_rows=100, on_overflow="raise")

    # under the threshold the exact fold-based window path is kept as-is
    small = cosine_topk_bruteforce(emb, qs, k=5, max_scored_rows=10_000_000)
    assert "mapinpandas" not in small._jdf.queryExecution().executedPlan().toString().lower()
    assert key(small.select("query_id", "vec_id", "rank").toPandas()) == key(a)


def test_bruteforce_size_guard_honors_row_hints(spark):
    """corpus_rows/query_rows hints replace the guard's eager count()
    jobs (VERDICT r6 §wrong: the guard cost two Spark jobs per call even
    when the caller knew both sizes). The hints are trusted: an inflated
    hint must force dispatch, matching sizes must keep the fold path —
    and the guard decision is observable in the executed plan."""
    import warnings as _warnings

    from gecko_spark.operators.similarity import cosine_topk_bruteforce
    from gecko_spark.sources.testdata import load_table

    emb = load_table(spark, "/root/testdata/sf0.001", "embeddings")
    qs = emb.filter(F.col("vec_id") < 10).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("query_vec")
    )
    # truthful hints under the threshold: fold path, no dispatch warning
    with _warnings.catch_warnings():
        _warnings.simplefilter("error")
        kept = cosine_topk_bruteforce(
            emb, qs, k=5, corpus_rows=500, query_rows=10
        )
    assert "mapinpandas" not in kept._jdf.queryExecution().executedPlan().toString().lower()
    # an over-threshold hint product dispatches (and warns) without
    # touching the real cardinalities
    with _warnings.catch_warnings(record=True) as caught:
        _warnings.simplefilter("always")
        dispatched = cosine_topk_bruteforce(
            emb, qs, k=5, corpus_rows=5_000_000, query_rows=1000
        )
    assert any("dispatching" in str(w.message) for w in caught)
    assert "mapinpandas" in dispatched._jdf.queryExecution().executedPlan().toString().lower()


def test_semantic_matrix_matches_fold(spark, embeddings):
    """The per-cluster BLAS path (default, each vector crosses Arrow
    once) and the per-pair fold path (oracle-replayable) must agree on
    the pair set and on cosines to float tolerance."""
    from gecko_spark.operators.dedup import semantic_dedupe_pairs

    kw = dict(threshold=0.2, n_clusters=8, seed=5, init="kmeans")
    mx = semantic_dedupe_pairs(embeddings, "vec_id", "embedding", method="matrix", **kw).toPandas()
    fd = semantic_dedupe_pairs(embeddings, "vec_id", "embedding", method="fold", **kw).toPandas()
    assert len(mx) == len(fd) > 0
    key = ["id_a", "id_b"]
    m = mx.sort_values(key, ignore_index=True).merge(
        fd.sort_values(key, ignore_index=True), on=key
    )
    assert len(m) == len(mx)
    assert (abs(m["cosine_x"] - m["cosine_y"]) < 1e-9).all()

    with __import__("pytest").raises(ValueError, match="method"):
        semantic_dedupe_pairs(embeddings, "vec_id", "embedding", method="nope", **kw)


def test_ivf_assign_fold_kernel_matches_hof_path(spark, embeddings):
    """Round 15: small-k assignment runs as one fold-exact Arrow kernel.
    It must assign identically to the old interpreted shape — k ``dot``
    HOFs in an array + array_position(array_max) — whose sequential-
    fold association is what the DuckDB oracles replay: same dots (the
    kernel folds over dimensions), same first-max tie break, NULL/
    wrong-length vectors assign NULL."""
    from pyspark.sql import functions as F

    from gecko_spark.operators.similarity import dot, ivf_assign

    assigned, cents = ivf_assign(
        embeddings, "embedding", n_centroids=16, init="first_k", id_col="vec_id"
    )
    vec = F.col("embedding")
    scores = F.array(
        *[dot(vec, F.lit([float(x) for x in cents[c]])) for c in range(len(cents))]
    )
    hof = (F.array_position(scores, F.array_max(scores)) - F.lit(1)).cast("int")
    both = assigned.withColumn("__hof__", hof).select(
        "vec_id", "__ivf_list__", "__hof__"
    )
    bad = both.filter(~F.col("__ivf_list__").eqNullSafe(F.col("__hof__")))
    assert bad.count() == 0, bad.limit(5).collect()

    # ties break to the FIRST max (duplicate centroids), and degenerate
    # vectors (NULL / wrong length) assign NULL in both shapes
    df = spark.createDataFrame(
        [(0, [1.0, 0.0]), (1, [1.0, 0.0]), (2, [0.7, 0.7]),
         (3, None), (4, [1.0, 0.0, 0.0])],
        "vec_id long, embedding array<double>",
    )
    a2, c2 = ivf_assign(df, "embedding", n_centroids=2, init="first_k",
                        id_col="vec_id")
    got = {r["vec_id"]: r["__ivf_list__"] for r in a2.collect()}
    assert got[0] == 0 and got[1] == 0  # identical centroids -> first
    assert got[3] is None and got[4] is None


def test_ivf_assign_large_k_kernel_matches_literal_path(spark, embeddings):
    """Above k=64 assignment switches to the Arrow BLAS argmax kernel;
    at the same centroids both paths must assign identically (first-max
    tie convention). Exercised by comparing k=64 (literal) and the
    kernel forced via a 65-centroid first_k run sharing 64 centroids'
    geometry is awkward — instead assert the kernel path at k=80 is
    internally consistent with a driver-side argmax replay."""
    import numpy as np

    from gecko_spark.operators.similarity import ivf_assign

    assigned, cents = ivf_assign(
        embeddings, "embedding", n_centroids=80, seed=9, init="kmeans"
    )
    pdf = assigned.select("vec_id", "embedding", "__ivf_list__").toPandas()
    x = np.array(pdf["embedding"].tolist(), dtype=np.float64)
    expect = (x @ cents.T).argmax(axis=1)
    assert (pdf["__ivf_list__"].to_numpy() == expect).all()


def test_semantic_auto_clusters(spark, embeddings):
    """n_clusters='auto' picks k = sqrt(n) (the balanced operating
    point, SCALE.md round-6 addendum) and must agree with the explicit
    value."""
    from gecko_spark.operators.dedup import semantic_dedupe_pairs

    n = embeddings.count()
    k = max(16, int(n ** 0.5))
    kw = dict(threshold=0.2, seed=5, init="kmeans")
    auto = semantic_dedupe_pairs(
        embeddings, "vec_id", "embedding", n_clusters="auto", **kw
    ).toPandas()
    explicit = semantic_dedupe_pairs(
        embeddings, "vec_id", "embedding", n_clusters=k, **kw
    ).toPandas()
    cols = ["id_a", "id_b"]
    assert sorted(map(tuple, auto[cols].values)) == sorted(map(tuple, explicit[cols].values))

    with pytest.raises(ValueError, match="auto"):
        semantic_dedupe_pairs(embeddings, "vec_id", "embedding", n_clusters="bad", **kw)


def test_operator_caches_released_when_results_dropped(spark, docs):
    """Unified cache ownership (core.persist_until_released): every
    operator that persists an internal frame referenced by its RETURNED
    plan must release that cache when the caller drops the result — two
    back-to-back sweep calls leave the session's CacheManager empty
    (ADVICE r6: fingerprint_overlap_pairs leaked one MEMORY_AND_DISK
    entry per distinct input for the session lifetime)."""
    import gc

    spark.catalog.clearCache()
    cm = spark._jsparkSession.sharedState().cacheManager()
    assert cm.isEmpty()
    sweeps = [
        lambda: D.minhash_candidate_pairs(docs, "doc_id", "text"),
        lambda: D.fingerprint_overlap_pairs(
            docs, "doc_id", "text", window=8, keep=16, min_shared=1
        ),
    ]
    for fn in sweeps:
        for _ in range(2):  # back-to-back calls on the same input
            out = fn()
            out.count()  # materialize: the internal cache fills
            assert not cm.isEmpty()  # cache is alive while result is
            del out
            gc.collect()
            assert cm.isEmpty()  # dropped result released its cache
    # round 14: the grouped pairing left simhash_candidate_pairs with a
    # single-consumer plan, so it no longer persists ANYTHING — the
    # stronger property is that the CacheManager stays empty throughout
    for _ in range(2):
        out = D.simhash_candidate_pairs(docs, "doc_id", "text")
        out.count()
        assert cm.isEmpty()  # cache-free operator: nothing to own
        del out
        gc.collect()
        assert cm.isEmpty()


def test_derived_results_keep_cache_alive(spark, docs):
    """ADVICE r7 (core.py adopt_cache_owner): operators that CONSUME a
    persist-owning frame internally (minhash_dedupe chains .filter off
    minhash_candidate_pairs) must not release the signature cache the
    moment the intermediate owner object is garbage-collected — the
    returned result holds the owner alive, so evaluation hits the warm
    cache; dropping the result still releases everything."""
    import gc

    spark.catalog.clearCache()
    cm = spark._jsparkSession.sharedState().cacheManager()
    assert cm.isEmpty()

    out = D.minhash_dedupe(docs, "doc_id", "text", threshold=0.5)
    gc.collect()  # the intermediate owner local is long gone...
    assert out._gecko_cache_owners  # ...but the result holds it
    assert not cm.isEmpty()  # persist registered, NOT yet released
    n = out.count()
    assert n > 0
    assert not cm.isEmpty()  # still warm for a second evaluation
    del out
    gc.collect()
    assert cm.isEmpty()  # transitive release on result drop


def test_shared_cache_release_edge(spark, docs):
    """VERDICT r7 #6: two live results over the SAME input share one
    cached-plan entry (Spark canonicalized-plan matching). Dropping one
    result releases the shared entry EARLY for the other — the survivor
    must still evaluate correctly (recompute path), and no cache may
    survive once both are dropped."""
    import gc

    spark.catalog.clearCache()
    cm = spark._jsparkSession.sharedState().cacheManager()
    assert cm.isEmpty()

    a = D.minhash_candidate_pairs(docs, "doc_id", "text")
    b = D.minhash_candidate_pairs(docs, "doc_id", "text")
    na = a.count()
    assert not cm.isEmpty()
    del a
    gc.collect()
    # the shared entry was released by a's finalizer; b must still be
    # fully evaluable (recompute) and give identical results
    nb = b.count()
    assert nb == na
    del b
    gc.collect()
    assert cm.isEmpty()  # nothing survives both drops


def test_index_roundtrip_recall_bounds(spark, tmp_path):
    """VERDICT r7 #8 (suite-side twin of tools/scale_ivfpq.py): the full
    production chain build -> write -> read -> query must hold a recall
    bound THROUGH the parquet index artifacts, for both the IVF and the
    PQ+rerank path, on a clustered corpus (real embedding corpora are
    clustered; pure-random unit vectors noise-rank the true top-k and
    recall would measure nothing)."""
    import sys

    sys.path.insert(0, ".")
    from tools.scale_ivfpq import make_clustered_vectors, recall_at_k

    vecs = make_clustered_vectors(spark, 4000, n_clusters=16).persist()
    vecs.count()
    queries = vecs.filter(F.col("vec_id") < 20).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("query_vec")
    )
    exact = S.cosine_topk_bruteforce(
        vecs, queries, k=10, max_scored_rows=100_000
    ).toPandas()

    with_lists, cents = S.ivf_assign(vecs, n_centroids=16, seed=1)
    S.write_ivf_index(with_lists, str(tmp_path / "ivf"), cents)
    lists, cents2 = S.read_ivf_index(spark, str(tmp_path / "ivf"))
    # nprobe=8 of 16: at 4k rows the sample-trained centroids split the
    # latent clusters more than at scale (tools/scale_ivfpq.py holds
    # >=0.9 at nprobe=8 of 256 on 1M rows); the bound tests the chain,
    # not small-sample centroid quality
    ivf = S.cosine_topk_ivf(lists, cents2, queries, k=10, nprobe=8).toPandas()
    assert recall_at_k(exact, ivf) >= 0.9

    books = S.pq_train(vecs, m=8, k_codes=64, seed=0)
    S.write_pq_index(S.pq_encode(vecs, books), books, str(tmp_path / "pq"))
    codes2, books2 = S.read_pq_index(spark, str(tmp_path / "pq"))
    # shortlist must exceed the ~250-vector latent cluster size: ADC
    # distortion noise-ranks WITHIN a tight cluster, so a shortlist
    # smaller than the cluster drops true neighbors before the exact
    # re-rank can recover them (recall 0.73 at shortlist=100)
    rer = S.pq_topk_rerank(codes2, books2, vecs, queries, k=10, shortlist=400).toPandas()
    assert recall_at_k(exact, rer) >= 0.9
    vecs.unpersist()


# ---------------------------------------------------------------------------
# IVF×PQ (round 9, VERDICT r8 #4): residual-encoded IVFADC must hold
# recall at a shortlist ≪ cluster size — the exact regime where raw-
# vector PQ collapsed (SCALE.md r8 addendum 2: recall 1.000 → 0.172).
# ---------------------------------------------------------------------------


@pytest.fixture(scope="module")
def clustered_vecs(spark):
    """2 000 unit vectors in 16 tight clusters (dim 32, spread 0.3):
    the corpus shape where ANN recall is measurable — random vectors
    noise-rank their true top-k and recall measures nothing."""
    rng = np.random.default_rng(11)
    n, dim, n_clusters, spread = 2000, 32, 16, 0.3
    centers = rng.standard_normal((n_clusters, dim))
    centers /= np.linalg.norm(centers, axis=1, keepdims=True)
    cl = rng.integers(0, n_clusters, n)
    x = centers[cl] + spread * rng.standard_normal((n, dim))
    x /= np.linalg.norm(x, axis=1, keepdims=True)
    pdf = pd.DataFrame(
        {"vec_id": range(n), "embedding": [list(map(float, v)) for v in x]}
    )
    return spark.createDataFrame(pdf).cache()


def _recall(exact_pdf, approx_pdf) -> float:
    r, qids = 0.0, exact_pdf["query_id"].unique()
    for qid in qids:
        e = set(exact_pdf[exact_pdf["query_id"] == qid]["vec_id"])
        a = set(approx_pdf[approx_pdf["query_id"] == qid]["vec_id"])
        r += len(e & a) / len(e)
    return r / len(qids)


def test_ivfpq_recall_at_shortlist_far_below_cluster_size(spark, clustered_vecs):
    """Cluster size ≈ 125; shortlist 20 ≪ that. Residual IVFADC at the
    real-IVFADC config (k_codes=256, Jégou 2011 §V) must hold recall
    there; coarse raw-vector PQ at the same shortlist is the documented
    cliff (SCALE.md r8 addendum 2).

    Round-10 note: recall decomposes into probe loss + ADC loss. On
    this fixture (spread 0.3, renormalized → noise norm ≈ 1.7 × center
    norm, so true neighbors straddle lists) the nprobe=4 probe CEILING
    is 0.825 with exact distances — the round-9 version of this test
    asserted ≥ 0.9 at nprobe=4, which no quantizer can reach. nprobe=8
    raises the ceiling to 0.975; the quantizer assert below therefore
    pins the ADC leg against the pure-IVF ceiling at the SAME nprobe,
    which is the property residual encoding actually claims."""
    queries = clustered_vecs.limit(8).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("query_vec")
    )
    exact = S.cosine_topk_bruteforce(clustered_vecs, queries, k=10).toPandas()
    codes, cents, books = S.ivfpq_build(
        clustered_vecs, n_centroids=16, m=16, k_codes=256, seed=5
    )
    approx = S.cosine_topk_ivfpq(
        codes.cache(), cents, books, clustered_vecs, queries,
        k=10, nprobe=8, shortlist=20,
    ).toPandas()
    rec = _recall(exact, approx)
    assert rec >= 0.9, f"IVFADC recall@10 {rec:.3f} < 0.9 at shortlist=20"
    # decomposition assert: ADC loss ≈ 0 — the quantized search matches
    # exact-distance IVF at the same nprobe (measured equal, 0.975)
    with_lists, ivf_cents = S.ivf_assign(clustered_vecs, n_centroids=16, seed=5)
    ivf = S.cosine_topk_ivf(
        with_lists, ivf_cents, queries, k=10, nprobe=8
    ).toPandas()
    ivf_rec = _recall(exact, ivf)
    assert rec >= ivf_rec - 0.05, (rec, ivf_rec)
    # contrast: coarse raw-vector PQ at the SAME shortlist is the
    # documented cliff — if this ever climbs near the IVFADC number the
    # fixture stopped exercising the regime and the asserts above prove
    # nothing (measured 0.588)
    raw_books = S.pq_train(clustered_vecs, m=8, k_codes=16, seed=5)
    raw_codes = S.pq_encode(clustered_vecs, raw_books)
    raw = S.pq_topk_rerank(
        raw_codes, raw_books, clustered_vecs, queries, k=10, shortlist=20
    ).toPandas()
    raw_rec = _recall(exact, raw)
    assert raw_rec < rec - 0.1, (raw_rec, rec)


def test_ivfpq_index_roundtrip_partition_pruned(spark, clustered_vecs, tmp_path):
    import os as _os

    codes, cents, books = S.ivfpq_build(
        clustered_vecs, n_centroids=16, m=8, k_codes=16, seed=5
    )
    path = str(tmp_path / "ivfpq")
    S.write_ivfpq_index(codes, cents, books, path)
    # list-partitioned layout on disk → nprobe search is partition-pruned
    dirs = [d for d in _os.listdir(f"{path}/codes") if d.startswith("__ivf_list__=")]
    assert len(dirs) == 16
    codes2, cents2, books2 = S.read_ivfpq_index(spark, path)
    assert np.allclose(cents2, cents) and np.allclose(books2, books)
    queries = clustered_vecs.limit(4).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("query_vec")
    )
    a = S.cosine_topk_ivfpq(
        codes, cents, books, clustered_vecs, queries, k=5, nprobe=4, shortlist=20
    ).toPandas()
    b = S.cosine_topk_ivfpq(
        codes2, cents2, books2, clustered_vecs, queries, k=5, nprobe=4, shortlist=20
    ).toPandas()
    key = ["query_id", "vec_id", "rank"]
    pd.testing.assert_frame_equal(
        a[key].sort_values(key, ignore_index=True),
        b[key].sort_values(key, ignore_index=True),
    )
    # the probed scan's plan reaches the source with the list filter
    pruned = codes2.filter(F.col("__ivf_list__").isin([0, 1]))
    plan = pruned._jdf.queryExecution().executedPlan().toString()
    assert "__ivf_list__" in plan


def test_pq_encode_carry_cols(spark, clustered_vecs):
    with_lists, cents = S.ivf_assign(clustered_vecs, n_centroids=8, seed=2)
    books = S.pq_train(clustered_vecs, m=8, k_codes=16, seed=2)
    out = S.pq_encode(with_lists, books, carry_cols=["__ivf_list__"])
    assert set(out.columns) == {"vec_id", "codes", "__ivf_list__"}
    pdf = out.limit(5).toPandas()
    assert len(pdf) == 5 and pdf["__ivf_list__"].between(0, 7).all()


# ---------------------------------------------------------------------------
# Exact substring-span dedup (round 10; Lee et al. 2022 ExactSubstr)
# ---------------------------------------------------------------------------


class TestSubstringDedupe:
    BLOCK = (
        "The quick brown fox jumps over the lazy dog while the band "
        "plays exactly this same licence boilerplate text again."
    )  # 116 chars, no internal repeat at window=40

    def _docs(self, spark):
        import pandas as pd

        return spark.createDataFrame(pd.DataFrame({
            "doc_id": [1, 2, 3, 4],
            "text": [
                "XX unique prefix oneoneone/// " + self.BLOCK + " @@tail-one",
                "a totally different document about fish, chips and the "
                "weather with nothing shared across the corpus at all....",
                "YY other prefix 22222&&& " + self.BLOCK + " ##tail-two",
                "short unique",
            ],
        }))

    def test_spans_exact_block_boundaries(self, spark):
        """winnow=1 detects EXACTLY the maximal shared substring: the
        planted block with zero shared context chars on either side."""
        from gecko_spark.operators.dedup import substring_dup_spans

        df = self._docs(spark)
        spans = (
            substring_dup_spans(df, window=40)
            .toPandas().sort_values("doc_id", ignore_index=True)
        )
        # only the two docs containing the block are flagged
        assert spans["doc_id"].tolist() == [1, 3]
        blk = len(self.BLOCK)
        # doc 1: block starts at 30 (prefix is 30 chars, " " included in span?
        # the single space before/after the block differs on both sides
        # (/// vs &&&, @@ vs ##), but ' ' + BLOCK + ' ' IS shared: expect
        # the maximal span [29, 30+blk+1)
        assert spans.loc[0, "span_start"] == 29 and spans.loc[0, "span_end"] == 30 + blk + 1
        assert spans.loc[1, "span_start"] == 24 and spans.loc[1, "span_end"] == 25 + blk + 1

    def test_unique_corpus_no_spans(self, spark):
        import pandas as pd
        from gecko_spark.operators.dedup import substring_dup_spans

        df = spark.createDataFrame(pd.DataFrame({
            "doc_id": [1, 2],
            "text": ["all original text here, number one of a kind......."
                     "padding padding padding",
                     "and a second fully distinct document with its own words"
                     " entirely, no overlap"],
        }))
        assert substring_dup_spans(df, window=40).count() == 0

    def test_within_doc_repeat_gated_by_cross_doc_only(self, spark):
        import pandas as pd
        from gecko_spark.operators.dedup import substring_dup_spans

        rep = "this exact sentence repeats inside one single document! "
        df = spark.createDataFrame(pd.DataFrame({
            "doc_id": [1, 2],
            "text": [rep * 3, "unrelated second doc with nothing shared at"
                     " all, long enough to window over......."],
        }))
        assert substring_dup_spans(df, window=40, cross_doc_only=True).count() == 0
        within = substring_dup_spans(df, window=40, cross_doc_only=False).toPandas()
        assert within["doc_id"].tolist() == [1]

    def test_dedupe_keeps_first_occurrence(self, spark):
        """keep-first semantics: the lowest (id, pos) copy of every
        duplicated window survives — doc 1 keeps the block, doc 3 loses
        it; untouched docs pass through byte-identical."""
        from gecko_spark.operators.dedup import substring_dedupe

        df = self._docs(spark)
        out = {r["doc_id"]: r for r in substring_dedupe(df, window=40).collect()}
        assert self.BLOCK in out[1]["text_clean"]
        assert self.BLOCK not in out[3]["text_clean"]
        # doc 3 keeps its unique prefix and tail around the excised span
        assert out[3]["text_clean"].startswith("YY other prefix 22222&&&")
        assert out[3]["text_clean"].endswith("##tail-two")
        for did in (2, 4):
            assert out[did]["text_clean"] == out[did]["text"]

    def test_winnow_guarantee_and_volume(self, spark):
        """winnow=w still detects the shared block (length >= window +
        w - 1), with span edges quantized by < w; and the position
        volume drops vs stride-1."""
        from gecko_spark.operators.dedup import (
            substring_dup_spans,
            substring_window_positions,
        )

        df = self._docs(spark)
        w = 8
        spans = (
            substring_dup_spans(df, window=40, winnow=w)
            .toPandas().sort_values("doc_id", ignore_index=True)
        )
        assert spans["doc_id"].tolist() == [1, 3]
        blk = len(self.BLOCK)
        # detected span must cover most of the block and stay within
        # winnow chars of the exact boundaries
        s1, e1 = spans.loc[0, "span_start"], spans.loc[0, "span_end"]
        assert 29 <= s1 <= 29 + w and 30 + blk + 1 - w <= e1 <= 30 + blk + 1
        n_full = substring_window_positions(df, window=40).count()
        n_win = substring_window_positions(df, window=40, winnow=w).count()
        assert n_win < n_full / 2

    def test_chunked_merge_matches_single_level(self, spark):
        """VERDICT r10 #6: the two-level merge (positions chunked by
        pos÷chunk, then span structs merged per doc) must produce
        byte-identical spans to an effectively single-level merge —
        including spans that STRADDLE a chunk boundary (pos 62..70 with
        chunk=64) and spans that merely TOUCH across one (prev end ==
        next start)."""
        import pandas as pd
        from gecko_spark.operators.dedup import _merged_spans

        window = 5
        # doc 1: runs [0..10], [60..72] (straddles 64), isolated 100,
        # touching pair (120, 125: 120+5 == 125 -> one span)
        pos1 = list(range(0, 11)) + list(range(60, 73)) + [100, 120, 125]
        flagged = spark.createDataFrame(pd.DataFrame({
            "doc_id": [1] * len(pos1) + [2, 2],
            "pos": pos1 + [63, 64],
        }))
        small = (
            _merged_spans(flagged, "doc_id", window, chunk=64)
            .toPandas().sort_values(["doc_id", "span_start"], ignore_index=True)
        )
        big = (
            _merged_spans(flagged, "doc_id", window, chunk=1 << 40)
            .toPandas().sort_values(["doc_id", "span_start"], ignore_index=True)
        )
        pd.testing.assert_frame_equal(small, big)
        assert [tuple(r) for r in small.itertuples(index=False)] == [
            (1, 0, 15), (1, 60, 77), (1, 100, 105), (1, 120, 130),
            (2, 63, 69),
        ]

    def test_doc_is_one_repeated_window(self, spark):
        """A doc consisting ENTIRELY of one repeated window (VERDICT
        r10 #6 adversarial case): every window hash is identical, the
        merged span must cover the whole doc, and keep-first excision
        leaves exactly the un-flagged prefix of the first copy."""
        import pandas as pd
        from gecko_spark.operators.dedup import substring_dedupe, substring_dup_spans

        unit = "0123456789" * 4  # exactly window chars
        df = spark.createDataFrame(pd.DataFrame({
            "doc_id": [1, 2],
            "text": [unit * 6, unit * 6],
        }))
        spans = (
            substring_dup_spans(df, window=40)
            .toPandas().sort_values("doc_id", ignore_index=True)
        )
        L = 240
        # doc 2 is duplicate end-to-end; doc 1's pos 0 window is ALSO
        # cross-doc duplicated (keep="none" audit view flags every copy)
        assert [tuple(r) for r in spans.itertuples(index=False)] == [
            (1, 0, L), (2, 0, L),
        ]
        out = {
            r["doc_id"]: r["text_clean"]
            for r in substring_dedupe(df, window=40).collect()
        }
        # the text is periodic with period 10 ("0123456789"), so there
        # are exactly 10 DISTINCT windows, first occurrences at doc 1
        # pos 0..9; keep-first exempts those, the flagged run [10, L)
        # is excised, and doc 2 is excised to empty
        assert out[1] == "0123456789"
        assert out[2] == ""

    def test_multibyte_span_edges(self, spark):
        """Span indices and excision are CHARACTER-based on both
        engines: multibyte text (2- and 3-byte UTF-8 code points)
        surrounding and inside the shared block must yield exact char
        boundaries, and the stitched text_clean must equal the Python
        str-slice reconstruction."""
        import pandas as pd
        from gecko_spark.operators.dedup import substring_dedupe, substring_dup_spans

        block = "héllo wörld 漢字テキスト shared licence €§µ boilerplate run!!"
        assert len(block) >= 40
        # boundaries fully distinct on BOTH sides (no shared space) so
        # the maximal shared substring is exactly the block
        pre1, suf1 = "Ωpfx¹·", "-ταιλ-Α"
        pre2, suf2 = "漢prefix²→", "~suffix-Бэ"
        df = spark.createDataFrame(pd.DataFrame({
            "doc_id": [1, 2],
            "text": [pre1 + block + suf1, pre2 + block + suf2],
        }))
        spans = (
            substring_dup_spans(df, window=40)
            .toPandas().sort_values("doc_id", ignore_index=True)
        )
        assert [tuple(r) for r in spans.itertuples(index=False)] == [
            (1, len(pre1), len(pre1) + len(block)),
            (2, len(pre2), len(pre2) + len(block)),
        ]
        out = {
            r["doc_id"]: r["text_clean"]
            for r in substring_dedupe(df, window=40).collect()
        }
        assert out[1] == pre1 + block + suf1  # first copy survives
        assert out[2] == pre2 + suf2          # char-exact excision

    def test_multi_mb_single_doc(self, spark):
        """Smoke the stride-1 path on a multi-MB single document with a
        large shared region: completes, flags exactly the planted span,
        and the chunked merge keeps every aggregation row bounded (the
        2M-char doc exceeds nothing but would have been one 2M-element
        collect_list row before VERDICT r10 #6)."""
        import pandas as pd
        from gecko_spark.operators.dedup import substring_dup_spans

        rng = np.random.default_rng(7)
        alpha = np.array(list("abcdefghijklmnopqrstuvwxyz "))
        big = "".join(rng.choice(alpha, size=2_000_000))
        shared = "".join(rng.choice(alpha, size=100_000))
        doc1 = big[:1_000_000] + shared + big[1_000_000:]
        df = spark.createDataFrame(pd.DataFrame({
            "doc_id": [1, 2],
            "text": [doc1, "other doc shell " + shared + " trailing bit"],
        }))
        spans = (
            substring_dup_spans(df, window=40)
            .toPandas().sort_values("doc_id", ignore_index=True)
        )
        # random 27-ary text of this size has no accidental 40-char
        # repeat; the planted region is the only cross-doc span
        assert len(spans) == 2
        s1 = spans[spans["doc_id"] == 1].iloc[0]
        assert s1["span_start"] == 1_000_000
        assert s1["span_end"] == 1_000_000 + 100_000

    def test_incremental_index_probe(self, spark, tmp_path):
        """Against-index semantics: a new-batch span duplicating the
        INDEXED history is flagged; a span duplicated only WITHIN the
        new batch is not (that's the batch op's job before appending);
        history is probed via the persisted hash set only."""
        import pandas as pd
        from gecko_spark.operators.dedup import (
            substring_spans_against_index,
            write_substring_index,
        )

        newblock = "an entirely new-batch-only repeated chunk of text!! " * 2
        hist = spark.createDataFrame(pd.DataFrame({
            "doc_id": [1, 2],
            "text": ["historic doc. " + self.BLOCK + " done.",
                     "another old doc with its own words only, long enough"
                     " to produce windows........."],
        }))
        new = spark.createDataFrame(pd.DataFrame({
            "doc_id": [10, 11, 12],
            "text": ["fresh A " + self.BLOCK + " trailing",
                     "fresh B " + newblock + " x",
                     "fresh C " + newblock + " y"],
        }))
        path = str(tmp_path / "substr_idx")
        write_substring_index(hist, "doc_id", "text", path, window=40)
        idx = spark.read.parquet(path)
        spans = (
            substring_spans_against_index(new, idx, window=40)
            .toPandas().sort_values("doc_id", ignore_index=True)
        )
        # only doc 10 (history dup) flagged; 11/12 share only intra-batch
        assert spans["doc_id"].tolist() == [10]
        blk = len(self.BLOCK)
        assert spans.loc[0, "span_start"] == 7  # ' ' before BLOCK shared
        assert spans.loc[0, "span_end"] == 8 + blk + 1  # ' ' after shared

    def test_incremental_excision(self, spark, tmp_path):
        """r11: substring_dedupe_against_index cuts against-history
        spans UNCONDITIONALLY (no keep-first — the index IS the
        surviving copy) and passes intra-batch-only duplicates through
        untouched; the stitch is the same shared Column fold as the
        batch excision, so the reconstruction is char-exact."""
        import pandas as pd
        from gecko_spark.operators.dedup import (
            substring_dedupe_against_index,
            write_substring_index,
        )

        newblock = "an entirely new-batch-only repeated chunk of text!! " * 2
        hist = spark.createDataFrame(pd.DataFrame({
            "doc_id": [1],
            "text": ["historic doc. " + self.BLOCK + " done."],
        }))
        new = spark.createDataFrame(pd.DataFrame({
            "doc_id": [10, 11, 12],
            "text": ["fresh A " + self.BLOCK + " trailing",
                     "fresh B " + newblock + " x",
                     "fresh C " + newblock + " y"],
        }))
        path = str(tmp_path / "substr_idx2")
        write_substring_index(hist, "doc_id", "text", path, window=40)
        idx = spark.read.parquet(path)
        out = {
            r["doc_id"]: r["text_clean"]
            for r in substring_dedupe_against_index(new, idx, window=40).collect()
        }
        # doc 10: span [7, 8+len(BLOCK)+1) cut (shared ' ' on both
        # sides of the block) — python-slice reconstruction
        t10 = "fresh A " + self.BLOCK + " trailing"
        assert out[10] == t10[:7] + t10[8 + len(self.BLOCK) + 1:]
        assert self.BLOCK not in out[10]
        # intra-batch-only duplicates untouched
        assert out[11] == "fresh B " + newblock + " x"
        assert out[12] == "fresh C " + newblock + " y"

    def test_plan_shape_no_corpus_shuffle_join(self, spark):
        """Plan regression guard for the two round-10 perf findings: the
        flag and clamp joins must broadcast (never sort-merge the
        position/corpus side), and the hash kernel must not run
        split-starved — a single-partition input fans out to the
        session's parallelism before the mapInPandas."""
        from gecko_spark.operators.dedup import (
            substring_dup_spans,
            substring_window_positions,
        )

        df = self._docs(spark).coalesce(1)
        res = substring_dup_spans(df, window=40)
        res.count()  # materialize so the AQE-final plan is inspectable
        plan = res._jdf.queryExecution().executedPlan().toString()
        assert "SortMergeJoin" not in plan, plan
        assert "BroadcastHashJoin" in plan, plan
        pos = substring_window_positions(df, window=40)
        assert pos.rdd.getNumPartitions() >= min(
            8, spark.sparkContext.defaultParallelism
        )
