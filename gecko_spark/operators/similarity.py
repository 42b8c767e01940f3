"""Similarity search over embedding columns (array<float>).

Brute-force cosine top-k as the exact baseline, plus two scale paths:
random-hyperplane LSH bucketing and IVF (inverted file) with
driver-sampled centroids. Dot products run JVM-side via
``zip_with`` + ``aggregate`` higher-order functions — no Python UDF in
the scoring loop.
"""

from __future__ import annotations

import math
from typing import Optional, Sequence

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T

__all__ = [
    "dot",
    "l2_norm",
    "cosine_sim",
    "cosine_fold_udf",
    "random_hyperplane_sketch",
    "cosine_topk_bruteforce",
    "cosine_topk_matrix",
    "cosine_topk_ivf",
    "infer_dim",
    "ivf_assign",
    "kmeans_fit",
    "write_ivf_index",
    "read_ivf_index",
    "quantize_int8",
    "dequantize_int8",
    "pq_train",
    "opq_train",
    "rotate_vectors",
    "pq_encode",
    "pq_topk_adc",
    "pq_topk_rerank",
    "write_pq_index",
    "read_pq_index",
    "ivfpq_build",
    "cosine_topk_ivfpq",
    "write_ivfpq_index",
    "read_ivfpq_index",
    "hard_negative_pairs",
    "hard_negative_pairs_ivf",
]


def dot(a: Column, b: Column) -> Column:
    """Dot product of two array<float/double> columns (JVM-side)."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def l2_norm(a: Column) -> Column:
    return F.sqrt(
        F.aggregate(
            a, F.lit(0.0), lambda acc, v: acc + v.cast("double") * v.cast("double")
        )
    )


def cosine_sim(a: Column, b: Column) -> Column:
    """Cosine similarity; a zero-norm side scores 0.0 — the convention
    the matrix/BLAS path always used (its kernels clamp zero norms to
    1, giving dot 0 / 1 = 0). ANSI mode made the unguarded division
    a JOB-KILLER on the first all-zeros embedding in the corpus
    (adversarial fixture gate, round 11); one dead row must not take
    down a 100 TB scan. Note 0.0 outranks negative-cosine candidates —
    filter zero vectors upstream when that matters."""
    d = l2_norm(a) * l2_norm(b)
    return F.when(d > 0, dot(a, b) / d).otherwise(F.lit(0.0))


def cosine_fold_udf():
    """Arrow kernel computing pairwise cosine with STRICT LEFT-FOLD
    float association: the accumulation loops over dimensions
    (vectorized across rows), so each row's dot/norm folds
    ``(((0+x0)+x1)+…)`` — bit-identical to :func:`cosine_sim`'s JVM
    ``aggregate`` HOF and to a SQL ``list_reduce``, while running far
    faster per candidate pair than the interpreted HOF (the oracle
    contract queries rely on this equivalence). Returns a pandas_udf;
    call it on two array columns."""

    @F.pandas_udf(T.DoubleType())
    def _cos_fold(va: pd.Series, vb: pd.Series) -> pd.Series:
        if not len(va):
            return pd.Series(np.empty(0, dtype=np.float64))
        a = np.stack(va.to_numpy()).astype(np.float64)
        b = np.stack(vb.to_numpy()).astype(np.float64)
        n = len(a)
        dot_ = np.zeros(n)
        na = np.zeros(n)
        nb = np.zeros(n)
        for d in range(a.shape[1]):
            dot_ += a[:, d] * b[:, d]
            na += a[:, d] * a[:, d]
            nb += b[:, d] * b[:, d]
        # zero-norm convention matches cosine_sim: score 0.0, not NaN
        denom = np.sqrt(na) * np.sqrt(nb)
        with np.errstate(divide="ignore", invalid="ignore"):
            out = np.where(denom > 0, dot_ / denom, 0.0)
        return pd.Series(out)

    return _cos_fold


def quantize_int8(
    df: DataFrame, vec_col: str = "embedding", strict: bool = False
) -> DataFrame:
    """Symmetric per-vector int8 quantization: replaces ``vec_col``
    with ``{vec_col}_q8`` (array<int> in [-127, 127]) plus a
    ``{vec_col}_scale`` (double) such that ``x ≈ q * scale``.

    4× (fp32) / 8× (fp64) storage and shuffle-volume reduction for an
    ANN candidate index — the shape every large-scale embedding store
    uses. Pure JVM column algebra (transform / array_max / floor), so
    it quantizes at scan speed with zero Python and zero shuffles.

    Determinism contract: ``q = floor(x / maxabs * 127 + 0.5)``
    (explicit half-up in exact IEEE ops, elements cast to double
    first) rather than an engine's ``round`` — ROUND on doubles is
    half-even in some engines and half-away in others, which would
    break bit-exact cross-engine parity. All-zero vectors quantize to
    all-zero with scale 0.

    Malformed inputs are explicit, not garbage: empty vectors quantize
    to an empty array with scale 0.0; a NULL vector stays NULL; a
    vector containing NaN yields NULL ``_q8``/``_scale`` (default) or
    raises at execution time when ``strict=True`` — previously NaN fell
    into the non-zero branch and produced arrays of nulls with a NaN
    scale, which propagated silently into downstream indexes.
    """
    v = F.transform(F.col(vec_col), lambda x: x.cast("double"))
    maxabs = F.array_max(F.transform(v, F.abs))
    has_nan = F.exists(v, F.isnan)
    # coalesce: empty arrays give a NULL array_max — route them through
    # the zero branch (empty q8, scale 0.0) instead of the divide.
    is_zero = F.coalesce(maxabs, F.lit(0.0)) == 0.0
    q = F.when(is_zero, F.transform(v, lambda x: F.lit(0))).otherwise(
        F.transform(
            v,
            lambda x: F.floor(x / maxabs * F.lit(127.0) + F.lit(0.5)).cast("int"),
        )
    )
    scale = F.when(is_zero, F.lit(0.0)).otherwise(maxabs / F.lit(127.0))
    if strict:
        bad = F.raise_error(
            F.lit(f"quantize_int8: NaN element in `{vec_col}`")
        )
        q = F.when(has_nan, bad).otherwise(q)
    else:
        q = F.when(has_nan, F.lit(None)).otherwise(q)
        scale = F.when(has_nan, F.lit(None).cast("double")).otherwise(scale)
    others = [c for c in df.columns if c != vec_col]
    return df.select(
        *others, q.alias(f"{vec_col}_q8"), scale.alias(f"{vec_col}_scale")
    )


def dequantize_int8(
    df: DataFrame, q_col: str = "embedding_q8", scale_col: str = "embedding_scale"
) -> DataFrame:
    """Inverse of :func:`quantize_int8` (lossy): ``x̂ = q * scale`` as
    array<double>, named ``{q_col}_deq``."""
    deq = F.transform(
        F.col(q_col), lambda q: q.cast("double") * F.col(scale_col)
    )
    return df.select(*df.columns, deq.alias(f"{q_col}_deq"))


def _unit_planes(dim: int, n_planes: int, seed: int) -> np.ndarray:
    rng = np.random.default_rng(seed)
    planes = rng.standard_normal((n_planes, dim))
    return planes / np.linalg.norm(planes, axis=1, keepdims=True)


def infer_dim(df: DataFrame, vec_col: str) -> int:
    """Embedding dimensionality from the first row (one tiny job)."""
    row = df.select(F.size(F.col(vec_col)).alias("d")).first()
    if row is None or not row["d"] or row["d"] <= 0:
        raise ValueError(f"cannot infer embedding dim from `{vec_col}`")
    return int(row["d"])


def random_hyperplane_sketch(vec: Column, n_planes: int, seed: int, dim: int = 64) -> Column:
    """Sign-bit sketch: bit i = sign(vec · plane_i), packed into a bigint.

    Cosine-similar vectors collide with probability (1 − θ/π)^n_planes.
    Planes are driver-generated literals — no data movement.

    ``dim`` MUST equal the vector dimensionality: ``zip_with`` null-pads
    the shorter side, which would null the whole sketch (use
    :func:`infer_dim` when unknown).
    """
    if n_planes > 63:
        raise ValueError("n_planes must be ≤ 63 to pack into a bigint")
    planes = _unit_planes(dim, n_planes, seed)
    out = F.lit(0).cast("long")
    for i in range(n_planes):
        plane = F.lit([float(x) for x in planes[i]])
        proj = F.aggregate(
            F.zip_with(vec, plane, lambda x, y: x.cast("double") * y),
            F.lit(0.0),
            lambda acc, v: acc + v,
        )
        out = out + F.shiftleft((proj > 0).cast("long"), i)
    return out


def cosine_topk_bruteforce(
    corpus: DataFrame,
    queries: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
    query_vec_col: str = "query_vec",
    k: int = 10,
    max_scored_rows: int | None = 10_000_000,
    on_overflow: str = "dispatch",
    corpus_rows: int | None = None,
    query_rows: int | None = None,
) -> DataFrame:
    """Exact top-k by cosine: broadcast the (small) query set against the
    corpus, score every pair JVM-side, keep k per query with a window.

    Returns ``(query_id, vec_id, cosine, rank)``. The corpus is
    scanned ONCE regardless of the number of queries, but the final
    ``row_number`` window funnels each query's FULL scored corpus
    through a single reducer — fine at sample scale, a straggler
    factory at corpus scale. To keep that trap un-hittable by
    accident, the function counts both sides first and, when
    ``corpus_rows × query_rows > max_scored_rows`` (default 10M pair
    scores), either dispatches to :func:`cosine_topk_matrix` (same
    ranking contract, map-side per-batch top-k, only ``batches×Q×k``
    candidate rows ever shuffle — ``on_overflow="dispatch"``, the
    default) or raises with that hint (``on_overflow="raise"``).
    ``max_scored_rows=None`` disables the guard (exact fold-based
    scoring regardless of size, e.g. for oracle comparison where the
    matrix path's BLAS summation could differ in the last ulp on ties).
    Use ``cosine_topk_ivf`` when even one full corpus scan per query
    batch is too much.

    The guard needs both cardinalities. By default it runs two eager
    ``count()`` jobs at CALL time (a plain parquet-backed count is
    metadata-only, but a filtered/derived side is a real scan — the
    r6 bench paid +28% for exactly that). Callers that already know
    the sizes pass ``corpus_rows``/``query_rows`` and the guard costs
    nothing; the hints are TRUSTED (an undercount can re-open the
    single-reducer trap the guard exists to close — prefer an upper
    bound when unsure). When the guard dispatches to the matrix path
    it emits a ``UserWarning``, because BLAS summation can reorder the
    last-ulp ties an oracle comparison would notice.
    """
    if max_scored_rows is not None:
        cr = corpus_rows if corpus_rows is not None else corpus.count()
        qr = query_rows if query_rows is not None else queries.count()
        n_pairs = cr * qr
        if n_pairs > max_scored_rows:
            if on_overflow == "raise":
                raise ValueError(
                    f"cosine_topk_bruteforce would score {n_pairs} pairs "
                    f"(> max_scored_rows={max_scored_rows}); use "
                    "cosine_topk_matrix (exact, map-side top-k) or "
                    "cosine_topk_ivf (approximate), or pass "
                    "max_scored_rows=None to force the window path"
                )
            import warnings

            warnings.warn(
                f"cosine_topk_bruteforce: {n_pairs} pair scores exceed "
                f"max_scored_rows={max_scored_rows}; dispatching to "
                "cosine_topk_matrix (same ranking contract; BLAS "
                "summation may order last-ulp cosine ties differently "
                "than the fold path)",
                UserWarning,
                stacklevel=2,
            )
            return cosine_topk_matrix(
                corpus, queries, id_col, vec_col, query_id_col, query_vec_col, k
            )
    q = F.broadcast(
        queries.select(
            F.col(query_id_col).alias("query_id"), F.col(query_vec_col).alias("qv")
        )
    )
    scored = corpus.select(
        F.col(id_col).alias("vec_id"), F.col(vec_col).alias("cv")
    ).crossJoin(q).select(
        "query_id",
        "vec_id",
        cosine_sim(F.col("cv"), F.col("qv")).alias("cosine"),
    )
    w = Window.partitionBy("query_id").orderBy(F.col("cosine").desc(), F.col("vec_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
    )


def cosine_topk_matrix(
    corpus: DataFrame,
    queries: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
    query_vec_col: str = "query_vec",
    k: int = 10,
) -> DataFrame:
    """Exact top-k by cosine for LARGE query sets: one BLAS matmul per
    Arrow batch.

    The query matrix is collected once (queries are small by
    definition) and closed over into a ``mapInPandas`` kernel: each
    corpus batch scores against ALL queries in a single ``B×D @ D×Q``
    float64 matmul, keeps only the per-batch top-k rows per query
    (argpartition), and the global winner set is resolved with one
    window over ``batches × Q × k`` candidate rows — the corpus is
    scanned once, shuffles only the tiny candidate set, and nothing
    interpreted runs per element.

    Same semantics as :func:`cosine_topk_bruteforce` (rank by cosine
    desc, id asc); use this path when ``queries × dim`` makes the
    per-element HOF arithmetic the bottleneck. Ties at the last ulp
    may order differently than the fold-based path — float summation
    association differs between BLAS and a sequential fold.
    """
    import pandas as pd

    qpdf = queries.select(query_id_col, query_vec_col).toPandas()
    if len(qpdf) == 0:
        raise ValueError("queries is empty")
    qm = np.array(qpdf[query_vec_col].tolist(), dtype=np.float64)
    qn = np.linalg.norm(qm, axis=1)
    qn[qn == 0] = 1.0
    qids = qpdf[query_id_col].tolist()
    nq = len(qids)
    qid_type = queries.schema[query_id_col].dataType.simpleString()
    id_type = corpus.schema[id_col].dataType.simpleString()

    def _score(batches):
        for pdf in batches:
            if len(pdf) == 0:
                continue
            cm = np.array(pdf[vec_col].tolist(), dtype=np.float64)
            cn = np.linalg.norm(cm, axis=1)
            cn[cn == 0] = 1.0
            sims = (cm @ qm.T) / cn[:, None] / qn[None, :]  # B×Q
            kk = min(k, sims.shape[0])
            # per-query partial top-k inside the batch
            top = np.argpartition(-sims, kk - 1, axis=0)[:kk]  # kk×Q
            ids = pdf[id_col].to_numpy()
            out = {
                "query_id": [qids[q] for q in range(nq) for _ in range(kk)],
                "vec_id": [ids[top[i, q]] for q in range(nq) for i in range(kk)],
                "cosine": [sims[top[i, q], q] for q in range(nq) for i in range(kk)],
            }
            yield pd.DataFrame(out)

    scored = corpus.select(id_col, vec_col).mapInPandas(
        _score, f"query_id {qid_type}, vec_id {id_type}, cosine double"
    )
    w = Window.partitionBy("query_id").orderBy(F.col("cosine").desc(), F.col("vec_id"))
    return scored.withColumn("rank", F.row_number().over(w)).filter(F.col("rank") <= k)


def _seq_dot(a, b) -> float:
    """Strict left-fold dot product in IEEE double — the association
    order of Spark's ``aggregate`` fold and of a SQL ``list_reduce``,
    so all three agree bit-for-bit (numpy's matmul/sum pairwise
    summation does not)."""
    acc = 0.0
    for x, y in zip(a, b):
        acc += float(x) * float(y)
    return acc


def _sample_centroids(
    corpus: DataFrame, vec_col: str, n_centroids: int, seed: int, iters: int = 5
) -> np.ndarray:
    """Mini k-means on a driver-side sample (the standard IVF training
    shortcut: centroid quality barely affects recall at modest nprobe).

    Sample size is 256 per centroid but hard-capped at 512k rows, and
    the assignment matmul runs in 64k-row chunks: at large k the naive
    ``sample @ centroids.T`` is a (256·k)×k float64 matrix — 190 GB at
    k≈10000 — while the chunked form peaks at 64k × k (≈5 GB at
    k=10000) regardless of sample size."""
    want = min(n_centroids * 256, 512 * 1024)
    frac = min(1.0, want / max(corpus.count(), 1))
    sample = np.array(
        corpus.select(vec_col).sample(frac, seed=seed).toPandas()[vec_col].tolist(),
        dtype=np.float64,
    )
    if len(sample) < n_centroids:
        raise ValueError("not enough rows to sample centroids")
    rng = np.random.default_rng(seed)
    centroids = sample[rng.choice(len(sample), n_centroids, replace=False)]
    chunk = 65536
    for _ in range(iters):
        assign = np.concatenate(
            [
                (sample[i : i + chunk] @ centroids.T).argmax(axis=1)
                for i in range(0, len(sample), chunk)
            ]
        )
        # vectorized per-cluster mean: bincount of member sums
        counts = np.bincount(assign, minlength=n_centroids).astype(np.float64)
        sums = np.zeros_like(centroids)
        np.add.at(sums, assign, sample)
        nonempty = counts > 0
        centroids[nonempty] = sums[nonempty] / counts[nonempty, None]
        norms = np.linalg.norm(centroids, axis=1, keepdims=True)
        centroids = centroids / np.maximum(norms, 1e-12)
    return centroids


def kmeans_fit(
    corpus: DataFrame,
    vec_col: str = "embedding",
    k: int = 16,
    iters: int = 5,
    seed: int = 0,
    id_col: Optional[str] = None,
) -> np.ndarray:
    """Distributed Lloyd's k-means over the FULL corpus (normalized
    centroids, cosine assignment) — the scale path when a driver
    sample (``_sample_centroids``) would under-represent the data.

    Each iteration is exactly two jobs: (1) assignment — an argmax over
    broadcast centroid dot products, pure Column algebra; (2) update —
    per-cluster vector means via ``posexplode`` to (cluster, dim) and
    one hash aggregation with map-side partial sums; only k×dim
    aggregated rows ever reach the driver. Initialization takes the k
    lowest-id vectors when ``id_col`` is given (deterministic), else a
    seeded sample. Empty clusters keep their previous centroid, like
    the sample-based trainer."""
    dim = infer_dim(corpus, vec_col)
    if id_col is not None:
        rows = corpus.orderBy(id_col).limit(k).select(vec_col).toPandas()
        if len(rows) < k:
            raise ValueError("not enough rows for k centroids")
        centroids = np.array(rows[vec_col].tolist(), dtype=np.float64)
    else:
        frac = min(1.0, (k * 16) / max(corpus.count(), 1))
        sample = np.array(
            corpus.select(vec_col).sample(frac, seed=seed).limit(k * 16).toPandas()[vec_col].tolist(),
            dtype=np.float64,
        )
        if len(sample) < k:
            raise ValueError("not enough rows to seed centroids")
        rng = np.random.default_rng(seed)
        centroids = sample[rng.choice(len(sample), k, replace=False)]
    norms = np.linalg.norm(centroids, axis=1, keepdims=True)
    centroids = centroids / np.maximum(norms, 1e-12)

    vec = F.col(vec_col)
    for _ in range(iters):
        scores = F.array(
            *[dot(vec, F.lit([float(x) for x in centroids[c]])) for c in range(k)]
        )
        assign = (F.array_position(scores, F.array_max(scores)) - F.lit(1)).cast("int")
        sums = (
            corpus.select(assign.alias("c"), F.posexplode(vec).alias("d", "x"))
            .groupBy("c", "d")
            .agg(F.sum(F.col("x").cast("double")).alias("s"), F.count("*").alias("n"))
            .collect()
        )
        new_c = centroids.copy()
        acc = np.zeros((k, dim), dtype=np.float64)
        cnt = np.zeros(k, dtype=np.int64)
        for r in sums:
            acc[r["c"], r["d"]] = r["s"]
            cnt[r["c"]] = r["n"]
        nonempty = cnt > 0
        new_c[nonempty] = acc[nonempty] / cnt[nonempty, None]
        norms = np.linalg.norm(new_c, axis=1, keepdims=True)
        centroids = new_c / np.maximum(norms, 1e-12)
    return centroids


def ivf_assign(
    corpus: DataFrame,
    vec_col: str = "embedding",
    n_centroids: int = 16,
    seed: int = 0,
    init: str = "kmeans",
    id_col: Optional[str] = None,
) -> tuple[DataFrame, np.ndarray]:
    """Assign each vector to its nearest centroid (IVF list).

    ``init="kmeans"`` (default) trains centroids with mini k-means on a
    driver sample — best recall. ``init="first_k"`` (requires
    ``id_col``) takes the raw vectors of the ``n_centroids`` lowest ids
    as centroids: no sampling, no float reductions outside sequential
    folds, so the entire IVF pipeline is reproducible bit-for-bit by an
    independent engine (the ``topk_cosine_ivf`` DuckDB oracle) — the
    determinism-over-recall trade.

    Centroids are broadcast as literals for small k; assignment is an
    argmax over JVM dot products — the corpus is never collected. Past
    ``k = 64`` the literal expression tree (k·dim literals) stops being
    free — Catalyst planning time and the task binary grow linearly
    with k (1 MB at k≈190) — so large-k assignment switches to one
    Arrow kernel doing a ``B×D @ D×k`` BLAS argmax per batch (the
    SemDeDup operating point ``n_clusters ≈ n/1000`` needs k in the
    thousands at any real corpus size). The literal path is kept for
    small k because its sequential-fold dots are what the first_k
    DuckDB oracle replays bit-for-bit. Returns
    (corpus + ``__ivf_list__``, centroids)."""
    if init == "first_k":
        if id_col is None:
            raise ValueError("init='first_k' requires id_col")
        rows = (
            corpus.orderBy(id_col).limit(n_centroids).select(vec_col).toPandas()
        )
        if len(rows) < n_centroids:
            raise ValueError("not enough rows for first_k centroids")
        centroids = np.array(rows[vec_col].tolist(), dtype=np.float64)
    elif init == "kmeans":
        centroids = _sample_centroids(corpus, vec_col, n_centroids, seed)
    else:
        raise ValueError(f"unknown init {init!r}")
    vec = F.col(vec_col)
    if n_centroids <= 64:
        # Small-k assignment as ONE Arrow kernel with STRICT LEFT-FOLD
        # association (round 15 — the previous shape was k interpreted
        # ``dot`` HOFs inside an array + array_position(array_max):
        # 2 M interpreted lambda steps at 2 k vectors × 16 centroids,
        # measured as the dominant job of dedup_semantic_pairs, plus a
        # k×dim literal expression tree Catalyst re-analyzes per call).
        # Bit-exactness is the cosine_fold_udf device: the accumulation
        # loops over DIMENSIONS (vectorized across rows), so each row's
        # dot folds (((0+x0·c0)+x1·c1)+…) — identical to the JVM
        # ``aggregate`` HOF and to the DuckDB oracle's sequential dot —
        # and np.argmax's first-max tie break matches
        # array_position(array_max). Rows whose vector is NULL or not
        # exactly ``dim`` long assign NULL, exactly like the HOF (a
        # zip_with length mismatch nulls the fold). Pinned by
        # test_ivf_assign_fold_kernel_matches_hof_path.
        cents = centroids  # k×D float64, closed over the kernel
        dim_k = cents.shape[1]

        @F.pandas_udf(T.IntegerType())
        def _assign_fold(vals: pd.Series) -> pd.Series:
            n = len(vals)
            if n == 0:
                return pd.Series(np.empty(0, dtype=object))
            ok = np.fromiter(
                (
                    v is not None and len(v) == dim_k
                    and not any(x is None for x in v)
                    for v in vals
                ),
                dtype=bool,
                count=n,
            )
            out = np.full(n, None, dtype=object)
            if ok.any():
                x = np.array(
                    [list(v) for v, good in zip(vals, ok) if good],
                    dtype=np.float64,
                )
                scores = np.zeros((len(cents), len(x)))
                for c in range(len(cents)):
                    acc = np.zeros(len(x))
                    for d in range(dim_k):
                        acc = acc + x[:, d] * cents[c, d]
                    scores[c] = acc
                best = scores.argmax(axis=0).astype(np.int32)
                out[ok] = list(best)
            return pd.Series(out)

        return corpus.withColumn("__ivf_list__", _assign_fold(vec)), centroids

    cent_t = centroids.T.copy()  # D×k, closed over the Arrow kernel

    @F.pandas_udf(T.IntegerType())
    def _assign(vals: pd.Series) -> pd.Series:
        x = np.array(vals.tolist(), dtype=np.float64)
        # ties broken by first max — same convention as array_position
        return pd.Series((x @ cent_t).argmax(axis=1).astype(np.int32))

    return corpus.withColumn("__ivf_list__", _assign(vec)), centroids


def write_ivf_index(
    corpus_with_lists: DataFrame,
    path: str,
    centroids: np.ndarray,
    compact: bool = True,
) -> None:
    """Persist an IVF index as parquet PARTITIONED BY the list id, plus
    the centroid matrix as a sidecar parquet.

    The partitioned layout is what makes ``nprobe`` search a genuine
    partition-pruning scan at 100 TB: probing 4 of 256 lists reads
    ~1.6% of the files, enforced by the source, not a filter.

    ``compact=True`` (default) repartitions by the list id before the
    write — ONE shuffle buys ~1 file per list instead of up to
    ``tasks × lists`` small files (a 1M/256-list write produces 8 192
    tiny files uncompacted; at 100 TB that small-files shape is what
    kills the namenode and the probe-scan's open() budget). Pass
    ``compact=False`` to keep the write shuffle-free when the input is
    already clustered by list."""
    import pandas as pd

    lists_df = corpus_with_lists
    if compact:
        lists_df = lists_df.repartition(F.col("__ivf_list__"))
    (
        lists_df.write.mode("overwrite")
        .partitionBy("__ivf_list__")
        .parquet(f"{path}/lists")
    )
    cent_pdf = pd.DataFrame(
        {
            "list_id": range(len(centroids)),
            "centroid": [[float(x) for x in c] for c in centroids],
        }
    )
    spark = corpus_with_lists.sparkSession
    spark.createDataFrame(cent_pdf).coalesce(1).write.mode("overwrite").parquet(
        f"{path}/centroids"
    )


def read_ivf_index(spark, path: str) -> tuple[DataFrame, np.ndarray]:
    """Load an IVF index written by :func:`write_ivf_index`."""
    lists = spark.read.parquet(f"{path}/lists")
    cent_pdf = (
        spark.read.parquet(f"{path}/centroids").toPandas().sort_values("list_id")
    )
    centroids = np.array(cent_pdf["centroid"].tolist(), dtype=np.float64)
    return lists, centroids


def _probe_lists_for(
    vecs: np.ndarray, centroids: np.ndarray, nprobe: int
) -> np.ndarray:
    """Driver-side probe selection, ONE convention for every IVF
    consumer (query top-k AND hard-negative mining): sequential-fold
    dots — not a matmul, numpy's pairwise summation associates
    differently from a SQL left fold and probe selection must be
    reproducible by the oracle bit-for-bit — then a stable argsort.
    The loop is rows × centroids, driver-side tiny by definition."""
    sims = np.array([[_seq_dot(v, c) for c in centroids] for v in vecs])
    return np.argsort(-sims, axis=1, kind="stable")[:, :nprobe]


def cosine_topk_ivf(
    corpus_with_lists: DataFrame,
    centroids: np.ndarray,
    queries: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
    query_vec_col: str = "query_vec",
    k: int = 10,
    nprobe: int = 4,
) -> DataFrame:
    """Approximate top-k: each query only scores vectors in its
    ``nprobe`` nearest IVF lists — the scan prunes to
    ``nprobe/n_centroids`` of the corpus (a partition-pruning-shaped
    win when the corpus is written partitioned by ``__ivf_list__``).

    ``corpus_with_lists`` must carry ``__ivf_list__`` from
    :func:`ivf_assign`; queries are assigned to probe lists on the
    driver (queries are small by definition)."""
    qpdf = queries.select(query_id_col, query_vec_col).toPandas()
    qvecs = np.array(qpdf[query_vec_col].tolist(), dtype=np.float64)
    probe_lists = _probe_lists_for(qvecs, centroids, nprobe)

    rows = []
    for qid, qvec, probes in zip(qpdf[query_id_col], qpdf[query_vec_col], probe_lists):
        for p in probes:
            rows.append((qid, [float(x) for x in qvec], int(p)))
    spark = corpus_with_lists.sparkSession
    # query-id type follows the input schema (ids need not be integers)
    qid_type = queries.schema[query_id_col].dataType.simpleString()
    q = F.broadcast(
        spark.createDataFrame(
            rows, f"query_id {qid_type}, qv array<double>, probe int"
        )
    )
    scored = corpus_with_lists.join(
        q, corpus_with_lists["__ivf_list__"] == q["probe"]
    ).select(
        "query_id",
        F.col(id_col).alias("vec_id"),
        cosine_sim(F.col(vec_col), F.col("qv")).alias("cosine"),
    )
    w = Window.partitionBy("query_id").orderBy(F.col("cosine").desc(), F.col("vec_id"))
    return scored.withColumn("rank", F.row_number().over(w)).filter(F.col("rank") <= k)


def hard_negative_pairs(
    corpus: DataFrame,
    anchors: Optional[DataFrame] = None,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    label_col: str = "label",
    k: int = 5,
    max_scored_rows: int | None = 10_000_000,
    corpus_rows: int | None = None,
    anchor_rows: int | None = None,
) -> DataFrame:
    """Hard-negative mining for contrastive embedding training (the
    DPR / SimCSE data-prep step): for each anchor, the ``k``
    most-similar corpus vectors carrying a DIFFERENT label — the
    negatives that are actually hard, not random.

    Returns ``(anchor_id, vec_id, cosine, rank)``. ``anchors``
    defaults to the corpus itself (mine negatives for every row);
    pass a sample for the usual regime. Both frames must carry
    ``(id_col, vec_col, label_col)``. Label exclusion uses
    ``IS DISTINCT FROM`` semantics: an unlabeled (NULL) anchor treats
    every LABELED row as a valid negative and other NULL rows as
    same-group (the anchor row itself is always excluded this way).

    Plan shape: broadcast the anchor set against ONE corpus scan,
    JVM-side fold cosine (no Python), the label filter BEFORE the
    per-anchor top-k window — so every anchor is guaranteed k true
    negatives when they exist. The same ``max_scored_rows`` guard as
    :func:`cosine_topk_bruteforce` (here it always raises — there is
    no label-aware matrix path): at corpus scale, batch the anchor set
    (the window partitions by anchor, so batches are embarrassingly
    independent), or pre-shortlist with :func:`cosine_topk_ivf` at
    ``k' ≫ k`` and anti-join same-label pairs out of the shortlist —
    approximate, but scan-pruned.
    """
    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    self_mining = anchors is None
    if self_mining:
        anchors = corpus
        if anchor_rows is None:
            anchor_rows = corpus_rows
    if max_scored_rows is not None:
        cr = corpus_rows if corpus_rows is not None else corpus.count()
        # anchors IS the corpus in self-mining: one count job, not two
        if anchor_rows is not None:
            ar = anchor_rows
        elif self_mining:
            ar = cr
        else:
            ar = anchors.count()
        if cr * ar > max_scored_rows:
            raise ValueError(
                f"hard_negative_pairs would score {cr * ar} pairs "
                f"(> max_scored_rows={max_scored_rows}); batch the "
                "anchor set, or shortlist via cosine_topk_ivf and "
                "filter same-label pairs from the shortlist"
            )
    a = F.broadcast(
        anchors.select(
            F.col(id_col).alias("anchor_id"),
            F.col(vec_col).alias("av"),
            F.col(label_col).alias("a_label"),
        )
    )
    scored = (
        corpus.select(
            F.col(id_col).alias("vec_id"),
            F.col(vec_col).alias("cv"),
            F.col(label_col).alias("c_label"),
        )
        .crossJoin(a)
        .filter(~F.col("c_label").eqNullSafe(F.col("a_label")))
        .select(
            "anchor_id",
            "vec_id",
            cosine_sim(F.col("cv"), F.col("av")).alias("cosine"),
        )
    )
    w = Window.partitionBy("anchor_id").orderBy(
        F.col("cosine").desc(), F.col("vec_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
    )


def hard_negative_pairs_ivf(
    corpus_with_lists: DataFrame,
    centroids: np.ndarray,
    anchors: DataFrame,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    label_col: str = "label",
    k: int = 5,
    nprobe: int = 4,
) -> DataFrame:
    """The corpus-scale form of :func:`hard_negative_pairs`: each
    anchor only scores vectors in its ``nprobe`` nearest IVF lists
    (same pruning contract as :func:`cosine_topk_ivf` — the scan reads
    ``nprobe/n_centroids`` of the corpus, partition-pruned when the
    corpus is written partitioned by ``__ivf_list__``), with the
    same-label exclusion applied before the per-anchor top-k window.

    Approximate: a hard negative living outside the probed lists is
    missed — the identical recall trade every IVF query makes, and the
    mining use-case is tolerant by construction (any sufficiently-hard
    negative trains; rank-exactness doesn't matter). ``anchors``
    carries ``(id_col, vec_col, label_col)`` and is driver-collected
    (anchor sets are samples by definition).
    """
    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    apdf = anchors.select(id_col, vec_col, label_col).toPandas()
    avecs = np.array(apdf[vec_col].tolist(), dtype=np.float64)
    probe_lists = _probe_lists_for(avecs, centroids, nprobe)

    # NULL-tolerant label round-trip: toPandas coerces an int column
    # with NULLs to float64 (NaN), which createDataFrame would reject
    # against the integral schema — restore None / python ints so the
    # IS-DISTINCT-FROM semantics match the exact miner's
    lbl_is_integral = anchors.schema[label_col].dataType.simpleString() in (
        "tinyint", "smallint", "int", "bigint"
    )

    def _lbl(v):
        if v is None or (isinstance(v, float) and np.isnan(v)):
            return None
        return int(v) if lbl_is_integral else v

    rows = []
    for aid, avec, albl, probes in zip(
        apdf[id_col], apdf[vec_col], apdf[label_col], probe_lists
    ):
        for p in probes:
            rows.append((aid, [float(x) for x in avec], _lbl(albl), int(p)))
    spark = corpus_with_lists.sparkSession
    aid_type = anchors.schema[id_col].dataType.simpleString()
    albl_type = anchors.schema[label_col].dataType.simpleString()
    a = F.broadcast(
        spark.createDataFrame(
            rows,
            f"anchor_id {aid_type}, av array<double>, "
            f"a_label {albl_type}, probe int",
        )
    )
    scored = (
        corpus_with_lists.join(
            a, corpus_with_lists["__ivf_list__"] == a["probe"]
        )
        .filter(~F.col(label_col).eqNullSafe(F.col("a_label")))
        .select(
            "anchor_id",
            F.col(id_col).alias("vec_id"),
            cosine_sim(F.col(vec_col), F.col("av")).alias("cosine"),
        )
    )
    w = Window.partitionBy("anchor_id").orderBy(
        F.col("cosine").desc(), F.col("vec_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
    )


# ---------------------------------------------------------------------------
# Product quantization (PQ): the third leg of the scale-ANN triad next
# to IVF (list pruning) and int8 (scalar quantization). A D-dim float32
# vector becomes m sub-codes (one byte each at k_codes ≤ 256): 64-dim
# float32 → 8 bytes is a 32× memory cut, which at 100 TB is the
# difference between an index that fits executor memory and one that
# doesn't. Search uses asymmetric distance computation (ADC): per query
# ONE m×k_codes lookup table, then each corpus code scores with m table
# lookups — no float vector is ever touched at scan time.
# ---------------------------------------------------------------------------


def pq_train(
    corpus: DataFrame,
    vec_col: str = "embedding",
    m: int = 8,
    k_codes: int = 16,
    seed: int = 0,
    iters: int = 10,
    sample_per_code: int = 256,
) -> np.ndarray:
    """Codebooks of shape ``(m, k_codes, dim/m)``: per-subspace L2
    k-means trained on a driver-side sample (the standard PQ practice —
    codebook quality saturates at a few hundred samples per code, so
    even a billion-vector corpus trains on ``k_codes·sample_per_code``
    rows). Deterministic BY CONTENT: the sample is the ``want`` rows
    with the smallest seeded xxhash64 of the vector itself (a
    TakeOrdered, not a full sort), so re-ingesting the same data under
    any partitioning or row order trains byte-identical codebooks —
    ``DataFrame.sample(frac, seed)`` does not have that property (its
    draw changes with the physical partitioning — ADVICE r5). Seeded
    init, fixed iteration count; empty codes keep their previous
    centroid."""
    sample = _pq_sample(corpus, vec_col, m, k_codes, seed, sample_per_code)
    rng = np.random.default_rng(seed)
    return _pq_fit_sample(sample, m, k_codes, iters, rng)


def _pq_sample(
    corpus: DataFrame,
    vec_col: str,
    m: int,
    k_codes: int,
    seed: int,
    sample_per_code: int,
) -> np.ndarray:
    """The content-hash-deterministic training sample, in ONE place
    (shared by :func:`pq_train` and :func:`opq_train`, extracted
    verbatim so both train on byte-identical samples): the
    ``k_codes·sample_per_code`` rows with the smallest seeded xxhash64
    of the vector itself — stable under any partitioning/row order,
    unlike ``DataFrame.sample``. Validates dim/m and k_codes."""
    dim = infer_dim(corpus, vec_col)
    if dim % m != 0:
        raise ValueError(f"dim {dim} not divisible by m={m} subspaces")
    if not 2 <= k_codes <= 256:
        raise ValueError(f"k_codes must be in [2, 256], got {k_codes}")
    want = k_codes * sample_per_code
    sample = np.array(
        corpus.select(
            F.col(vec_col).alias("__v"),
            F.xxhash64(F.col(vec_col), F.lit(int(seed))).alias("__h"),
        )
        .orderBy("__h", "__v")
        .limit(want)
        .toPandas()["__v"]
        .tolist(),
        dtype=np.float64,
    )
    if len(sample) < k_codes:
        raise ValueError("not enough rows to train codebooks")
    return sample


def _pq_fit_sample(
    sample: np.ndarray, m: int, k_codes: int, iters: int, rng
) -> np.ndarray:
    """Per-subspace L2 k-means on an in-memory sample — the shared
    training core of :func:`pq_train` and :func:`opq_train` (extracted
    verbatim so pq_train's codebooks stay bit-identical)."""
    dsub = sample.shape[1] // m
    books = np.empty((m, k_codes, dsub), dtype=np.float64)
    for j in range(m):
        sub = sample[:, j * dsub : (j + 1) * dsub]
        cents = sub[rng.choice(len(sub), k_codes, replace=False)]
        for _ in range(iters):
            # squared L2 to each centroid: ||x||² − 2x·c + ||c||²
            d2 = (
                (sub * sub).sum(axis=1, keepdims=True)
                - 2.0 * (sub @ cents.T)
                + (cents * cents).sum(axis=1)[None, :]
            )
            assign = d2.argmin(axis=1)
            for c in range(k_codes):
                members = sub[assign == c]
                if len(members):
                    cents[c] = members.mean(axis=0)
        books[j] = cents
    return books


def _pq_reconstruct_sample(
    sample: np.ndarray, books: np.ndarray
) -> np.ndarray:
    """Decode each sample row to its nearest-code reconstruction —
    driver-side, used only inside OPQ training."""
    m, k_codes, dsub = books.shape
    out = np.empty_like(sample)
    for j in range(m):
        sub = sample[:, j * dsub : (j + 1) * dsub]
        cents = books[j]
        d2 = (
            (sub * sub).sum(axis=1, keepdims=True)
            - 2.0 * (sub @ cents.T)
            + (cents * cents).sum(axis=1)[None, :]
        )
        out[:, j * dsub : (j + 1) * dsub] = cents[d2.argmin(axis=1)]
    return out


def opq_train(
    corpus: DataFrame,
    vec_col: str = "embedding",
    m: int = 8,
    k_codes: int = 16,
    seed: int = 0,
    opq_iters: int = 10,
    pq_iters: int = 10,
    sample_per_code: int = 256,
) -> tuple[np.ndarray, np.ndarray]:
    """Optimized Product Quantization (Ge et al. 2013, OPQ-NP): learn
    an ORTHOGONAL rotation ``R`` that redistributes variance across the
    m subspaces before PQ carves them up, then codebooks in the rotated
    space. Returns ``(R, codebooks)`` with ``R`` of shape (dim, dim).

    Plain PQ quantizes axis-aligned blocks of the raw dimension order;
    when energy is concentrated in a few dimensions (every real
    embedding model), some subspaces carry all the signal and others
    noise — rotation equalizes them, cutting quantization error at the
    SAME code budget. The alternating optimization is the paper's
    non-parametric recipe: fix R → train PQ on ``X·R``; fix codebooks →
    decode to X̂ and solve the Procrustes problem
    ``min_R ‖X·R − X̂‖`` via SVD of ``Xᵀ·X̂`` (R = U·Vᵀ).

    Training runs on the SAME deterministic driver sample device as
    :func:`pq_train` (content-hash TakeOrdered), so retraining on
    re-ingested data is byte-identical. Serving: rotate vectors with
    :func:`rotate_vectors` (one Arrow matmul per batch, no shuffle),
    then every existing PQ/ADC path works unchanged in rotated space —
    and because R is orthogonal, cosine is invariant, so exact rerank
    against ORIGINAL vectors stays valid.
    """
    sample = _pq_sample(corpus, vec_col, m, k_codes, seed, sample_per_code)
    dim = sample.shape[1]
    R = np.eye(dim)
    books = None
    for it in range(opq_iters):
        rot = sample @ R
        rng = np.random.default_rng(seed)  # same init each round: the
        # alternation converges on (R, books) jointly, and a fixed rng
        # makes the whole trajectory a pure function of (data, seed)
        books = _pq_fit_sample(rot, m, k_codes, pq_iters, rng)
        recon = _pq_reconstruct_sample(rot, books)
        u, _, vt = np.linalg.svd(sample.T @ recon)
        R = u @ vt
    # final codebooks for the final R (the loop's books belong to the
    # PREVIOUS rotation)
    rng = np.random.default_rng(seed)
    books = _pq_fit_sample(sample @ R, m, k_codes, pq_iters, rng)
    return R, books


def rotate_vectors(
    df: DataFrame,
    rotation: np.ndarray,
    vec_col: str = "embedding",
    out_col: Optional[str] = None,
) -> DataFrame:
    """Apply an orthogonal rotation to a vector column: ONE Arrow
    matmul per batch (the rotation rides in the closure — dim² doubles,
    32 KB at 64-dim), no shuffle, embarrassingly parallel. The OPQ
    serving prelude: rotate, then encode/search with the existing PQ
    kernels."""
    R = np.ascontiguousarray(np.asarray(rotation, dtype=np.float64))
    if R.ndim != 2 or R.shape[0] != R.shape[1]:
        raise ValueError(f"rotation must be square, got {R.shape}")
    out = out_col or vec_col

    @F.pandas_udf(T.ArrayType(T.DoubleType()))
    def _rot(vs: pd.Series) -> pd.Series:
        if len(vs) == 0:
            return pd.Series([], dtype=object)
        x = np.array(vs.tolist(), dtype=np.float64)
        if x.shape[1] != R.shape[0]:
            raise ValueError(
                f"vector dim {x.shape[1]} != rotation dim {R.shape[0]}"
            )
        y = x @ R
        return pd.Series(list(y))

    return df.withColumn(out, _rot(F.col(vec_col)))


def pq_encode(
    corpus: DataFrame,
    codebooks: np.ndarray,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    carry_cols: Sequence[str] = (),
) -> DataFrame:
    """(id, codes array<int>[, carry…]) — each vector's nearest code per
    subspace. One Arrow kernel per batch (three BLAS-shaped ops per
    subspace), no shuffle: encoding is embarrassingly parallel and the
    output is the compressed index you persist (codes are ≤ 256 so a
    parquet sink stores them as bytes after dictionary encoding).
    ``carry_cols`` ride along unchanged — the IVF-PQ build uses it for
    ``__ivf_list__`` so the codes never need a data-sized join back to
    their list assignment."""
    m, k_codes, dsub = codebooks.shape
    books = codebooks  # closed over; broadcast by Spark with the task
    id_type = corpus.schema[id_col].dataType.simpleString()
    carry = list(carry_cols)
    carry_schema = "".join(
        f", {c} {corpus.schema[c].dataType.simpleString()}" for c in carry
    )

    def _enc(batches):
        for pdf in batches:
            if len(pdf) == 0:
                continue
            x = np.array(pdf[vec_col].tolist(), dtype=np.float64)
            n = x.shape[0]
            codes = np.empty((n, m), dtype=np.int32)
            for j in range(m):
                sub = x[:, j * dsub : (j + 1) * dsub]
                cents = books[j]
                d2 = (
                    (sub * sub).sum(axis=1, keepdims=True)
                    - 2.0 * (sub @ cents.T)
                    + (cents * cents).sum(axis=1)[None, :]
                )
                codes[:, j] = d2.argmin(axis=1)
            out = {"vec_id": pdf[id_col].to_numpy(), "codes": list(codes)}
            for c in carry:
                out[c] = pdf[c].to_numpy()
            yield pd.DataFrame(out)

    return corpus.select(id_col, vec_col, *carry).mapInPandas(
        _enc, f"vec_id {id_type}, codes array<int>{carry_schema}"
    )


def pq_topk_adc(
    codes_df: DataFrame,
    codebooks: np.ndarray,
    queries: DataFrame,
    query_id_col: str = "query_id",
    query_vec_col: str = "query_vec",
    k: int = 10,
) -> DataFrame:
    """Approximate top-k nearest (squared-L2) via asymmetric distance:
    per query one ``m×k_codes`` lookup table of subvector→code
    distances, then every corpus code's distance is m table lookups —
    computed here as one fancy-indexing gather + sum per Arrow batch,
    for ALL queries at once.

    Scale shape mirrors :func:`cosine_topk_matrix`: the query LUTs are
    driver-built (queries are small by definition) and closed over; each
    batch keeps only its per-query top-k (argpartition), so the one
    window shuffle sees ``batches × Q × k`` candidate rows, never the
    corpus. Pair with IVF lists for the classic IVF-PQ layout: probe
    pruning cuts the scan, PQ cuts the bytes scanned."""
    m, k_codes, dsub = codebooks.shape
    qpdf = queries.select(query_id_col, query_vec_col).toPandas()
    if len(qpdf) == 0:
        raise ValueError("queries is empty")
    qm = np.array(qpdf[query_vec_col].tolist(), dtype=np.float64)
    if qm.shape[1] != m * dsub:
        raise ValueError(f"query dim {qm.shape[1]} != codebook dim {m * dsub}")
    nq = len(qpdf)
    # LUT[q, j, c] = ||query_q[sub j] − codebook[j, c]||²
    luts = np.empty((nq, m, k_codes), dtype=np.float64)
    for j in range(m):
        qs = qm[:, j * dsub : (j + 1) * dsub]
        cents = codebooks[j]
        luts[:, j, :] = (
            (qs * qs).sum(axis=1, keepdims=True)
            - 2.0 * (qs @ cents.T)
            + (cents * cents).sum(axis=1)[None, :]
        )
    qids = qpdf[query_id_col].tolist()
    qid_type = queries.schema[query_id_col].dataType.simpleString()
    id_type = codes_df.schema["vec_id"].dataType.simpleString()

    def _score(batches):
        for pdf in batches:
            if len(pdf) == 0:
                continue
            codes = np.array(pdf["codes"].tolist(), dtype=np.int64)  # B×m
            # gather: dists[b, q] = Σ_j LUT[q, j, codes[b, j]]
            # (one advanced-index per subspace keeps peak memory B×Q)
            dists = np.zeros((codes.shape[0], nq), dtype=np.float64)
            for j in range(m):
                dists += luts[:, j, :][:, codes[:, j]].T  # B×Q
            kk = min(k, dists.shape[0])
            # tie-inclusive boundary: keep EVERY row at or below the
            # kk-th distance so the per-batch candidate set never
            # depends on argpartition's arbitrary order among ties —
            # the global window then resolves ties by (dist, vec_id)
            # over a batch-layout-independent candidate set (ADVICE r9)
            thr = np.partition(dists, kk - 1, axis=0)[kk - 1]  # per-query
            ids = pdf["vec_id"].to_numpy()
            # one vectorized candidate gather over the B×Q threshold
            # mask — no per-query Python loop or list boxing (r11);
            # row order within the batch is irrelevant, the global
            # window re-sorts
            rid, qix = np.nonzero(dists <= thr[None, :])
            yield pd.DataFrame(
                {
                    "query_id": np.array(qids, dtype=object)[qix],
                    "vec_id": ids[rid],
                    "adc_dist": dists[rid, qix],
                }
            )

    scored = codes_df.select("vec_id", "codes").mapInPandas(
        _score, f"query_id {qid_type}, vec_id {id_type}, adc_dist double"
    )
    w = Window.partitionBy("query_id").orderBy(F.col("adc_dist").asc(), F.col("vec_id"))
    return scored.withColumn("rank", F.row_number().over(w)).filter(F.col("rank") <= k)


def pq_topk_rerank(
    codes_df: DataFrame,
    codebooks: np.ndarray,
    corpus: DataFrame,
    queries: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
    query_vec_col: str = "query_vec",
    k: int = 10,
    shortlist: int = 100,
) -> DataFrame:
    """PQ shortlist + exact re-rank — the production IVF-PQ search
    shape: ADC over the compressed codes selects ``shortlist``
    candidates per query (the full-corpus scan touches only m-byte
    codes), then ONLY those ``Q × shortlist`` rows fetch their float
    vectors for an exact cosine re-rank. Quantization distortion then
    costs recall only when a true neighbor falls outside the shortlist
    — recall is tunable by ``shortlist`` at re-rank cost ``Q·shortlist``
    instead of scan cost ``Q·N``."""
    if shortlist < k:
        raise ValueError(f"shortlist {shortlist} must be ≥ k {k}")
    # ONE materialization of the query set shared by probe and rerank
    # (ADVICE r9: a non-deterministic source must not probe one set of
    # codes and rerank against different vectors)
    qpdf = queries.select(query_id_col, query_vec_col).toPandas()
    qid_type = queries.schema[query_id_col].dataType.simpleString()
    qlocal = codes_df.sparkSession.createDataFrame(
        qpdf, schema=f"{query_id_col} {qid_type}, {query_vec_col} array<double>"
    )
    cand = pq_topk_adc(
        codes_df,
        codebooks,
        qlocal,
        query_id_col=query_id_col,
        query_vec_col=query_vec_col,
        k=shortlist,
    ).select("query_id", "vec_id")
    scored = _rerank_fused(corpus, cand, qpdf, id_col, vec_col,
                           query_id_col, query_vec_col, qid_type)
    w = Window.partitionBy("query_id").orderBy(F.col("cosine").desc(), F.col("vec_id"))
    return scored.withColumn("rank", F.row_number().over(w)).filter(F.col("rank") <= k)


def _rerank_fused(
    corpus: DataFrame,
    cand: DataFrame,
    qpdf,
    id_col: str,
    vec_col: str,
    query_id_col: str,
    query_vec_col: str,
    qid_type: str,
) -> DataFrame:
    """Exact-cosine re-rank of (query_id, vec_id) candidates: the fetch
    broadcasts ONLY the id pairs against the corpus scan (the corpus
    never shuffles — round 10), and the query VECTORS ride the Arrow
    kernel's closure (Q×dim — queries are small by definition), so no
    second join exists at all. History: round 10 pre-joined the
    vectors into the broadcast (≈60 GB payload at 10k×1000×768 — the
    ADVICE r10 finding); the first fix joined a Q-row vector frame as
    a second broadcast, which re-ranked correctly but paid a per-row
    hash join + interpreted HOF cosine (a measured 1.2× band-edge
    regression, BENCH r11); the closure kernel removes both. The
    accumulation is the strict left-fold d-loop (bit-identical to
    cosine_sim / cosine_fold_udf and the SQL oracles), with the shared
    zero-norm-scores-0.0 convention."""
    qmap = {
        q: np.asarray(v, dtype=np.float64)
        for q, v in zip(qpdf[query_id_col], qpdf[query_vec_col])
    }

    def _score_iter(batches):
        import pandas as pd

        for pdf in batches:
            if not len(pdf):
                continue
            a = np.stack(pdf["__cv__"].to_numpy()).astype(np.float64)
            b = np.stack([qmap[q] for q in pdf["query_id"]])
            n = len(a)
            dot_ = np.zeros(n)
            na = np.zeros(n)
            nb = np.zeros(n)
            for d in range(a.shape[1]):
                dot_ += a[:, d] * b[:, d]
                na += a[:, d] * a[:, d]
                nb += b[:, d] * b[:, d]
            denom = np.sqrt(na) * np.sqrt(nb)
            with np.errstate(divide="ignore", invalid="ignore"):
                cos = np.where(denom > 0, dot_ / denom, 0.0)
            yield pd.DataFrame(
                {
                    "query_id": pdf["query_id"],
                    "vec_id": pdf["vec_id"],
                    "cosine": cos,
                }
            )

    id_type = corpus.schema[id_col].dataType.simpleString()
    fetched = corpus.select(
        F.col(id_col).alias("vec_id"), F.col(vec_col).alias("__cv__")
    ).join(F.broadcast(cand), "vec_id")
    return fetched.mapInPandas(
        _score_iter, f"query_id {qid_type}, vec_id {id_type}, cosine double"
    )


def write_pq_index(
    codes_df: DataFrame, codebooks: np.ndarray, path: str
) -> None:
    """Persist a PQ index: the m-byte code table as parquet plus the
    codebooks as a sidecar parquet of (subspace, code, centroid) rows
    — m×k_codes rows, trivially small. The code table is the ONLY
    data-sized artifact and it is ~dim·4/m× smaller than the raw
    vectors; search jobs read it plus the sidecar and never touch the
    float corpus until re-rank."""
    import pandas as pd

    codes_df.write.mode("overwrite").parquet(f"{path}/codes")
    m, k_codes, _ = codebooks.shape
    book_pdf = pd.DataFrame(
        {
            "subspace": [j for j in range(m) for _ in range(k_codes)],
            "code": [c for _ in range(m) for c in range(k_codes)],
            "centroid": [
                [float(x) for x in codebooks[j, c]]
                for j in range(m)
                for c in range(k_codes)
            ],
        }
    )
    spark = codes_df.sparkSession
    spark.createDataFrame(book_pdf).coalesce(1).write.mode("overwrite").parquet(
        f"{path}/codebooks"
    )


def read_pq_index(spark, path: str) -> tuple[DataFrame, np.ndarray]:
    """Load a PQ index written by :func:`write_pq_index`."""
    codes = spark.read.parquet(f"{path}/codes")
    pdf = (
        spark.read.parquet(f"{path}/codebooks")
        .toPandas()
        .sort_values(["subspace", "code"])
    )
    m = int(pdf["subspace"].max()) + 1
    k_codes = int(pdf["code"].max()) + 1
    dsub = len(pdf["centroid"].iloc[0])
    books = np.array(pdf["centroid"].tolist(), dtype=np.float64).reshape(
        m, k_codes, dsub
    )
    return codes, books


# ---------------------------------------------------------------------------
# IVF×PQ (IVFADC, Jégou et al. 2011 "Product Quantization for Nearest
# Neighbor Search"): the composition of the two legs above, and the fix
# for standalone PQ's shortlist cliff (SCALE.md round-8 addendum 2
# finding 1: raw-vector PQ noise-ranks WITHIN a tight cluster, so the
# rerank shortlist had to scale with the n/n_lists cluster size —
# recall@10 fell 1.000 → 0.172 when it didn't). Two composed ideas:
#   1. IVF pruning: a query only scans its nprobe nearest lists —
#      nprobe/n_lists of the codes, a partition-pruned read when the
#      index is stored partitioned by list.
#   2. RESIDUAL encoding: PQ quantizes (vector − list centroid), not
#      the raw vector. Residuals span the intra-cluster spread instead
#      of the unit sphere, so the same code budget resolves distances
#      INSIDE a cluster — which is exactly where the true neighbors
#      live and exactly what raw-vector PQ could not rank. ADC then
#      scores ||​(q − c_list) − residual̂||² per probed list with a
#      per-(query, list) lookup table.
# Net: the shortlist needs to cover only ADC noise among true
# near-neighbors, not the whole cluster — it stops scaling with
# n/n_lists.
#
# Recall decomposes into two independent losses (measured round 10 on
# the 16-cluster/spread-0.3 test fixture):
#   probe loss — true neighbors living OUTSIDE the nprobe probed lists.
#     Set by nprobe alone; no quantizer can recover it (fixture probe
#     ceiling: 0.825 @ nprobe=4, 0.975 @ nprobe=8, exact distances).
#   ADC loss  — quantization noise pushing a probed true neighbor out
#     of the shortlist. Set by (m, k_codes): 0.325 at the toy
#     k_codes=16, measurably ZERO at m=16/k_codes=256 on dim-32
#     (IVFADC recall == pure-IVF recall at every nprobe).
# Hence the real-IVFADC default k_codes=256 (Jégou 2011 §V uses k*=256
# per subquantizer); tune recall with nprobe, not shortlist.
# ---------------------------------------------------------------------------


def ivfpq_build(
    corpus: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_centroids: int = 16,
    m: int = 8,
    k_codes: int = 256,
    seed: int = 0,
    init: str = "kmeans",
    ivf_id_col: Optional[str] = None,
    pq_init: str = "kmeans",
) -> tuple[DataFrame, np.ndarray, np.ndarray]:
    """Build the IVFADC index: IVF-assign, subtract each vector's list
    centroid JVM-side (``zip_with`` over a broadcast n_lists-row join —
    no Python in the residual path), train PQ codebooks ON THE
    RESIDUALS, and encode. Returns ``(codes_df, centroids, codebooks)``
    where ``codes_df`` is (id, codes, __ivf_list__) — the only
    data-sized artifact, ~dim·4/m× smaller than the float corpus.

    ``pq_init="first_k"`` (requires ``ivf_id_col``) skips k-means and
    takes the RESIDUALS of the ``k_codes`` lowest ids as the codebook
    entries of every subspace — the same determinism-for-recall trade
    as ``init="first_k"``: with ``dsub == 2`` every float reduction in
    the encode/ADC path is a single two-term sum, so an independent
    engine (the ``topk_cosine_ivfpq`` DuckDB oracle) replays the whole
    search bit-for-bit."""
    with_lists, centroids = ivf_assign(
        corpus, vec_col, n_centroids, seed=seed, init=init, id_col=ivf_id_col
    )
    spark = corpus.sparkSession
    cent_pdf = pd.DataFrame(
        {
            "__ivf_list__": range(len(centroids)),
            "__cent__": [[float(x) for x in c] for c in centroids],
        }
    )
    cent_df = spark.createDataFrame(cent_pdf)
    resid = with_lists.join(F.broadcast(cent_df), "__ivf_list__").withColumn(
        "__residual__",
        F.zip_with(F.col(vec_col), F.col("__cent__"), lambda a, b: a - b),
    )
    if pq_init == "first_k":
        if ivf_id_col is None:
            raise ValueError('pq_init="first_k" requires ivf_id_col')
        rows = (
            resid.filter(F.col(ivf_id_col) < k_codes)
            .select(ivf_id_col, "__residual__")
            .orderBy(ivf_id_col)
            .collect()
        )
        if len(rows) < k_codes:
            raise ValueError(
                f"first_k pq_init needs ids 0..{k_codes - 1} present, got {len(rows)}"
            )
        rmat = np.array([r["__residual__"] for r in rows], dtype=np.float64)
        dim = rmat.shape[1]
        if dim % m != 0:
            raise ValueError(f"dim {dim} not divisible by m={m} subspaces")
        dsub = dim // m
        books = np.stack(
            [rmat[:, j * dsub : (j + 1) * dsub] for j in range(m)]
        )
    elif pq_init == "kmeans":
        books = pq_train(resid, "__residual__", m=m, k_codes=k_codes, seed=seed)
    else:
        raise ValueError(f"unknown pq_init {pq_init!r}")
    codes = pq_encode(
        resid, books, id_col=id_col, vec_col="__residual__",
        carry_cols=["__ivf_list__"],
    )
    return codes, centroids, books


def cosine_topk_ivfpq(
    codes_with_lists: DataFrame,
    centroids: np.ndarray,
    codebooks: np.ndarray,
    corpus: DataFrame,
    queries: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
    query_vec_col: str = "query_vec",
    k: int = 10,
    nprobe: int = 4,
    shortlist: int = 100,
) -> DataFrame:
    """IVFADC search: per query, ADC over the PQ codes of its
    ``nprobe`` nearest lists (residual LUT per (query, probed list)),
    keep ``shortlist`` candidates, then exact-cosine re-rank on the
    float vectors of only those ``Q × shortlist`` rows.

    Scale shape: the codes scan prunes to ``nprobe/n_lists`` of the
    index (a partition-pruned read via :func:`read_ivfpq_index`'s
    layout), each Arrow batch does one LUT gather per probed list
    present and keeps per-query top-``shortlist`` (argpartition), the
    one window shuffle sees ``batches × Q × shortlist`` candidate rows,
    and the re-rank fetch is id-keyed over Q·shortlist rows. Queries
    and LUTs (Q × nprobe × m × k_codes floats) are driver-built —
    queries are small by definition."""
    if shortlist < k:
        raise ValueError(f"shortlist {shortlist} must be ≥ k {k}")
    m, k_codes, dsub = codebooks.shape
    qpdf = queries.select(query_id_col, query_vec_col).toPandas()
    if len(qpdf) == 0:
        raise ValueError("queries is empty")
    lens = {len(v) for v in qpdf[query_vec_col]}
    if len(lens) != 1:
        raise ValueError(f"ragged query vectors: lengths {sorted(lens)}")
    qm = np.array(qpdf[query_vec_col].tolist(), dtype=np.float64)
    if qm.shape[1] != m * dsub:
        raise ValueError(f"query dim {qm.shape[1]} != codebook dim {m * dsub}")
    nq = len(qpdf)
    # probe selection: same sequential-fold dots as cosine_topk_ivf so
    # the two paths probe identically on identical inputs
    sims = np.array([[_seq_dot(q, c) for c in centroids] for q in qm])
    probe_lists = np.argsort(-sims, axis=1, kind="stable")[:, :nprobe]

    # per-(query, probed list) residual LUTs, grouped by list id:
    # lut_by_list[l] = (query_row_indices, LUT[len(idx), m, k_codes])
    lut_by_list: dict[int, tuple[np.ndarray, np.ndarray]] = {}
    for l in np.unique(probe_lists):
        qidx = np.nonzero((probe_lists == l).any(axis=1))[0]
        qres = qm[qidx] - centroids[l][None, :]  # query residuals vs c_l
        luts = np.empty((len(qidx), m, k_codes), dtype=np.float64)
        for j in range(m):
            qs = qres[:, j * dsub : (j + 1) * dsub]
            cents = codebooks[j]
            luts[:, j, :] = (
                (qs * qs).sum(axis=1, keepdims=True)
                - 2.0 * (qs @ cents.T)
                + (cents * cents).sum(axis=1)[None, :]
            )
        lut_by_list[int(l)] = (qidx, luts)

    qids = qpdf[query_id_col].tolist()
    qid_type = queries.schema[query_id_col].dataType.simpleString()
    cid_type = codes_with_lists.schema["vec_id"].dataType.simpleString()
    probed = sorted(lut_by_list)
    sl = shortlist

    qid_arr = np.empty(nq, dtype=object)
    qid_arr[:] = qids

    def _score(batches):
        for pdf in batches:
            if len(pdf) == 0:
                continue
            parts = []
            for l, grp in pdf.groupby("__ivf_list__", sort=False):
                ent = lut_by_list.get(int(l))
                if ent is None:
                    continue
                qidx, luts = ent
                codes = np.array(grp["codes"].tolist(), dtype=np.int64)
                dists = np.zeros((codes.shape[0], len(qidx)), dtype=np.float64)
                for j in range(m):
                    dists += luts[:, j, :][:, codes[:, j]].T  # B×Ql
                kk = min(sl, dists.shape[0])
                # tie-inclusive boundary (ADVICE r9): keep all rows at
                # or below the kk-th distance so the candidate set is
                # independent of Arrow batch/partition boundaries; the
                # global window resolves ties by (dist, vec_id)
                thr = np.partition(dists, kk - 1, axis=0)[kk - 1]
                ids = grp["vec_id"].to_numpy()
                # vectorized candidate gather (r11): one nonzero over
                # the B×Ql mask instead of a per-query boxing loop
                rid, qi = np.nonzero(dists <= thr[None, :])
                parts.append(
                    (qid_arr[qidx[qi]], ids[rid], dists[rid, qi])
                )
            if parts:
                yield pd.DataFrame(
                    {
                        "query_id": np.concatenate([p[0] for p in parts]),
                        "vec_id": np.concatenate([p[1] for p in parts]),
                        "adc_dist": np.concatenate([p[2] for p in parts]),
                    }
                )

    # the isin filter is what partition-prunes the probed read when the
    # codes come from read_ivfpq_index's list-partitioned layout
    cand = (
        codes_with_lists.filter(F.col("__ivf_list__").isin(probed))
        .select("vec_id", "codes", "__ivf_list__")
        .mapInPandas(
            _score, f"query_id {qid_type}, vec_id {cid_type}, adc_dist double"
        )
    )
    wsl = Window.partitionBy("query_id").orderBy(
        F.col("adc_dist").asc(), F.col("vec_id")
    )
    cand = (
        cand.withColumn("__r__", F.row_number().over(wsl))
        .filter(F.col("__r__") <= sl)
        .select("query_id", "vec_id")
    )
    # rerank from the ALREADY-collected qpdf so both uses of the
    # queries share one materialization — a non-deterministic query
    # source can't probe one set of lists and rerank against different
    # vectors (ADVICE r9). The fetch broadcasts only the id pairs and
    # the query vectors ride the kernel closure (see _rerank_fused).
    scored = _rerank_fused(
        corpus, cand, qpdf, id_col, vec_col, query_id_col, query_vec_col,
        qid_type,
    )
    w = Window.partitionBy("query_id").orderBy(F.col("cosine").desc(), F.col("vec_id"))
    return scored.withColumn("rank", F.row_number().over(w)).filter(F.col("rank") <= k)


def write_ivfpq_index(
    codes_with_lists: DataFrame,
    centroids: np.ndarray,
    codebooks: np.ndarray,
    path: str,
    compact: bool = True,
) -> None:
    """Persist an IVFADC index: the code table parquet PARTITIONED BY
    list id (so ``nprobe`` search is a partition-pruned read of
    ~nprobe/n_lists of the files), plus centroid and codebook sidecars.
    ``compact`` repartitions by list before the write — one shuffle
    buys ~1 file per list instead of tasks×lists small files, the same
    trade :func:`write_ivf_index` measured (964 → 61 files at 1M)."""
    df = codes_with_lists
    if compact:
        df = df.repartition(F.col("__ivf_list__"))
    df.write.mode("overwrite").partitionBy("__ivf_list__").parquet(f"{path}/codes")
    spark = codes_with_lists.sparkSession
    cent_pdf = pd.DataFrame(
        {
            "list_id": range(len(centroids)),
            "centroid": [[float(x) for x in c] for c in centroids],
        }
    )
    spark.createDataFrame(cent_pdf).coalesce(1).write.mode("overwrite").parquet(
        f"{path}/centroids"
    )
    m, k_codes, _ = codebooks.shape
    book_pdf = pd.DataFrame(
        {
            "subspace": [j for j in range(m) for _ in range(k_codes)],
            "code": [c for _ in range(m) for c in range(k_codes)],
            "centroid": [
                [float(x) for x in codebooks[j, c]]
                for j in range(m)
                for c in range(k_codes)
            ],
        }
    )
    spark.createDataFrame(book_pdf).coalesce(1).write.mode("overwrite").parquet(
        f"{path}/codebooks"
    )


def read_ivfpq_index(spark, path: str) -> tuple[DataFrame, np.ndarray, np.ndarray]:
    """Load an IVFADC index written by :func:`write_ivfpq_index`."""
    codes = spark.read.parquet(f"{path}/codes")
    cent_pdf = (
        spark.read.parquet(f"{path}/centroids").toPandas().sort_values("list_id")
    )
    centroids = np.array(cent_pdf["centroid"].tolist(), dtype=np.float64)
    pdf = (
        spark.read.parquet(f"{path}/codebooks")
        .toPandas()
        .sort_values(["subspace", "code"])
    )
    m = int(pdf["subspace"].max()) + 1
    k_codes = int(pdf["code"].max()) + 1
    dsub = len(pdf["centroid"].iloc[0])
    books = np.array(pdf["centroid"].tolist(), dtype=np.float64).reshape(
        m, k_codes, dsub
    )
    return codes, centroids, books
