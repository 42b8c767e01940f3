"""Record-linkage operators: the evaluation-side companion to the
generator/mutator surface.

The reference library exists to fabricate test data FOR record linkage
(gecko README / paper: "generating shareable synthetic datasets ...
for record linkage"); its own scope ends at data generation. This
module closes the loop at Spark scale: block, pair, and score records
so a corrupted copy can be linked back to its clean source — the
evaluation every gecko-generated dataset is built to drive.

Design (100 TB shapes):

* **Blocking** is an equi-join on cheap derived keys (prefix, length
  bucket, metaphone-free first token) — one shuffle on the block key,
  never an all-pairs product. Helpers return plain Columns so Catalyst
  folds them into the scan projection.
* **Sorted-neighborhood** candidate generation ranks the corpus by the
  sort key with a two-phase global rank (order-respecting range
  buckets + per-bucket windows + broadcast offsets — the
  ``shuffle_ranked`` technique, sampling.py), NOT a single-reducer
  ``ROW_NUMBER() OVER (ORDER BY ...)``; each row then pairs with the
  next ``window-1`` ranks via explode + equi-join on rank. The
  ``q_linkage_snm`` contract query proves the two-phase rank
  bit-identical to the naive global window (the DuckDB oracle runs the
  naive form).
* **Scoring**: Spark's JVM-side ``levenshtein`` (the same classic edit
  distance DuckDB implements) or an Arrow Jaro-Winkler kernel
  (bit-identical to DuckDB's ``jaro_winkler_similarity`` — fuzz-tested
  over 400 random pairs), so linkage scores are oracle-exact either
  way. ``keep="best"`` resolves each left record to its single best
  match with a window partitioned BY LEFT ID (bounded by per-block
  candidate counts — never a global window).
"""

from __future__ import annotations

from typing import Optional, Sequence, Union

import pandas as pd
from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T

__all__ = [
    "block_prefix",
    "block_length_bucket",
    "block_first_token",
    "block_soundex",
    "blocked_candidates",
    "sorted_neighborhood_pairs",
    "linkage_join",
    "fellegi_sunter_join",
    "estimate_mu_em",
    "jaro_winkler_py",
    "jaro_winkler_udf",
]


def jaro_winkler_py(s1: str, s2: str) -> float:
    """Textbook Jaro-Winkler similarity (Winkler prefix ≤ 4, p = 0.1,
    boost threshold 0.7) — verified BIT-IDENTICAL to DuckDB's
    ``jaro_winkler_similarity`` across adversarial pairs (including the
    threshold boundary and transposition cases), which is what lets
    ``q_linkage_jw`` hash-match an independent oracle on double-typed
    scores."""
    # empty-before-equal: DuckDB scores ('','') as 0.0, not 1.0
    if not s1 or not s2:
        return 0.0
    if s1 == s2:
        return 1.0
    l1, l2 = len(s1), len(s2)
    md = max(l1, l2) // 2 - 1
    m1 = [False] * l1
    m2 = [False] * l2
    m = 0
    for i, c in enumerate(s1):
        lo = 0 if i - md < 0 else i - md
        hi = l2 if i + md + 1 > l2 else i + md + 1
        for j in range(lo, hi):
            if not m2[j] and s2[j] == c:
                m1[i] = m2[j] = True
                m += 1
                break
    if m == 0:
        return 0.0
    t = 0
    k = 0
    for i in range(l1):
        if m1[i]:
            while not m2[k]:
                k += 1
            if s1[i] != s2[k]:
                t += 1
            k += 1
    t //= 2
    j = (m / l1 + m / l2 + (m - t) / m) / 3
    if j > 0.7:
        pl = 0
        for a, b in zip(s1[:4], s2[:4]):
            if a != b:
                break
            pl += 1
        return j + pl * 0.1 * (1 - j)
    return j


_JW_VEC_MAX_LEN = 64  # beyond this the N×L1×L2 batch matrices stop paying


def jaro_winkler_batch(s1: "list[str]", s2: "list[str]") -> "np.ndarray":
    """Vectorized Jaro-Winkler over parallel string lists — BIT-IDENTICAL
    to :func:`jaro_winkler_py` (same greedy match, same float-op order),
    which the fuzz test asserts pair-by-pair.

    Shape: strings become UCS4 char matrices (``np.array(dtype='U')``
    view — C-speed, zero-padded); the greedy matching loop runs
    sequentially over character POSITIONS of s1 (≤ max-length
    iterations) but vectorized ACROSS all pairs in the batch, so the
    per-element Python interpreter cost of the scalar kernel (~the
    whole operator cost on blocked-candidate scoring, VERDICT r6) is
    replaced by ``O(L)`` numpy passes of ``N×L`` boolean work.
    Transposition counting gathers each side's matched characters in
    order with one stable argsort; the Winkler prefix boost is a
    cumprod over the first four columns. Pairs with a side longer than
    ``_JW_VEC_MAX_LEN`` fall back to the scalar kernel (names/keys are
    short; document-length inputs would make the dense matrices the
    wrong trade)."""
    import numpy as np

    n = len(s1)
    out = np.zeros(n, dtype=np.float64)
    if n == 0:
        return out
    l1 = np.fromiter((len(s) for s in s1), dtype=np.int64, count=n)
    l2 = np.fromiter((len(s) for s in s2), dtype=np.int64, count=n)
    eqs = np.fromiter((x == y for x, y in zip(s1, s2)), dtype=bool, count=n)
    # empty-before-equal, exactly like the scalar kernel / DuckDB
    out[eqs & (l1 > 0)] = 1.0
    todo = ~eqs & (l1 > 0) & (l2 > 0)
    long_mask = todo & ((l1 > _JW_VEC_MAX_LEN) | (l2 > _JW_VEC_MAX_LEN))
    for i in np.nonzero(long_mask)[0]:
        out[i] = jaro_winkler_py(s1[i], s2[i])
    todo &= ~long_mask
    idx = np.nonzero(todo)[0]
    if len(idx) == 0:
        return out
    a_strs = [s1[i] for i in idx]
    b_strs = [s2[i] for i in idx]
    la, lb = l1[idx], l2[idx]
    L1 = max(4, int(la.max()))
    L2 = max(4, int(lb.max()))
    m = len(idx)
    # UCS4 view: N×L uint32 codepoint matrices, zero-padded
    am = np.array(a_strs, dtype=f"U{L1}").view(np.uint32).reshape(m, L1)
    bm = np.array(b_strs, dtype=f"U{L2}").view(np.uint32).reshape(m, L2)
    md = np.maximum(la, lb) // 2 - 1  # may be negative, like the scalar
    jidx = np.arange(L2)[None, :]
    m1 = np.zeros((m, L1), dtype=bool)
    m2 = np.zeros((m, L2), dtype=bool)
    rows = np.arange(m)
    for i in range(L1):
        lo = np.maximum(0, i - md)[:, None]
        # i ≥ la rows get an empty window (hi clipped to 0) instead of
        # a separate active-row mask — one fewer N×L temporary
        hi = np.where(i < la, np.minimum(lb, i + md + 1), 0)[:, None]
        eq = (bm == am[:, i : i + 1]) & ~m2 & (jidx >= lo) & (jidx < hi)
        first = eq.argmax(axis=1)
        has = eq[rows, first]
        m2[rows[has], first[has]] = True
        m1[has, i] = True
    mm = m1.sum(axis=1)
    # ordered matched chars per side, gathered by SCATTER on the
    # cumulative match rank (measured ~3× cheaper than the stable
    # argsort form at N=500k)
    mmax = int(mm.max()) if len(mm) else 0
    t = np.zeros(m, dtype=np.int64)
    if mmax > 0:
        ka = np.cumsum(m1, axis=1, dtype=np.int32) - 1
        kb = np.cumsum(m2, axis=1, dtype=np.int32) - 1
        ach = np.zeros((m, mmax), dtype=np.uint32)
        bch = np.zeros((m, mmax), dtype=np.uint32)
        r1, c1 = np.nonzero(m1)
        ach[r1, ka[r1, c1]] = am[r1, c1]
        r2, c2 = np.nonzero(m2)
        bch[r2, kb[r2, c2]] = bm[r2, c2]
        neq = (ach != bch) & (np.arange(mmax)[None, :] < mm[:, None])
        t = neq.sum(axis=1) // 2
    res = np.zeros(m, dtype=np.float64)
    pos = mm > 0
    if pos.any():
        mmf = mm[pos].astype(np.float64)
        # identical float-op order to the scalar kernel:
        # (m/l1 + m/l2 + (m-t)/m) / 3
        j = (
            mmf / la[pos] + mmf / lb[pos] + (mm[pos] - t[pos]) / mmf
        ) / 3
        pre = (am[pos, :4] == bm[pos, :4]) & (
            np.arange(4)[None, :] < np.minimum(la[pos], lb[pos])[:, None]
        )
        pl = np.cumprod(pre, axis=1).sum(axis=1)
        boosted = j + pl * 0.1 * (1 - j)
        res[pos] = np.where(j > 0.7, boosted, j)
    out[idx] = res
    return out


def jaro_winkler_udf():
    """Pairwise Jaro-Winkler as an Arrow kernel (DoubleType; null if
    either side is null), backed by :func:`jaro_winkler_batch` — the
    numpy-vectorized form of :func:`jaro_winkler_py` (bit-identical;
    the ``q_linkage_jw`` oracle hash is the regression test). Repeated
    pairs inside a batch (common on blocked candidates — hot names
    recur) are scored once via factorization. Still only for BLOCKED
    candidate pairs: the work is O(|a|·|b|) per pair regardless of
    kernel form; never apply it to an unblocked product."""
    import numpy as np

    @F.pandas_udf(T.DoubleType())
    def _jw(a: pd.Series, b: pd.Series) -> pd.Series:
        valid = a.notna() & b.notna()
        out = np.full(len(a), np.nan, dtype=np.float64)
        if valid.any():
            av = a[valid].to_numpy()
            bv = b[valid].to_numpy()
            # score each distinct (a, b) pair once
            codes, uniq = pd.factorize(
                pd.Series(list(zip(av, bv))), use_na_sentinel=False
            )
            u1 = [p[0] for p in uniq]
            u2 = [p[1] for p in uniq]
            out[valid.to_numpy()] = jaro_winkler_batch(u1, u2)[codes]
        return pd.Series(out, dtype="float64").where(
            pd.Series(valid.to_numpy()), None
        )

    return _jw


def block_prefix(col: Union[str, Column], n: int = 3) -> Column:
    """Case-folded first ``n`` characters — the classic cheap block key."""
    c = F.col(col) if isinstance(col, str) else col
    return F.substring(F.lower(c), 1, n)


def block_length_bucket(col: Union[str, Column], width: int = 4) -> Column:
    """``floor(length/width)`` — pairs only strings of similar length
    (edit distance ≥ length difference, so distance-bounded matches
    never cross distant buckets when ``width > max_dist``)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.floor(F.length(c) / F.lit(width)).cast("int")


def block_first_token(col: Union[str, Column], delimiter: str = " ") -> Column:
    """Case-folded first delimiter-separated token."""
    c = F.col(col) if isinstance(col, str) else col
    return F.lower(F.split(c, delimiter).getItem(0))


def block_soundex(col: Union[str, Column]) -> Column:
    """Soundex phonetic code (Spark's JVM builtin) — the classic
    linkage block key for misspelled surnames: 'miller'/'mueller'/
    'miler' all code M460, so phonetically-close corruptions stay in
    one block where a prefix key would scatter them. No DuckDB
    counterpart, so soundex-blocked queries are unit-tested rather than
    oracle'd (the downstream scorer still is)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.soundex(c)


def blocked_candidates(
    a: DataFrame,
    b: DataFrame,
    id_a: str,
    id_b: str,
    block_a: Sequence[Column],
    block_b: Sequence[Column],
    keep_a: Sequence[str] = (),
    keep_b: Sequence[str] = (),
) -> DataFrame:
    """Candidate pairs via equi-join on block keys: ``(id_a, id_b,
    keep_a..., keep_b...)``.

    ``block_a``/``block_b`` are parallel lists of Column expressions
    (one per block key) evaluated on each side. The join is a plain
    hash equi-join on the key tuple — ONE shuffle keyed on the block
    key, partial-aggregation-free, broadcastable when one side is
    small. Self-linkage: pass the same frame twice and filter
    ``id_a < id_b`` downstream (or use :func:`linkage_join`)."""
    if len(block_a) != len(block_b) or not block_a:
        raise ValueError("block_a and block_b must be equal-length, non-empty")
    from gecko_spark.operators.dedup import ensure_parallelism

    keys = [f"__bk{i}__" for i in range(len(block_a))]
    # the probe side must be parallel: when `b` broadcasts (the common
    # small-clean-table case) the per-pair scorer runs on `a`'s SCAN
    # partitions, and a single-file input collapses the whole candidate
    # expansion into one task (measured: 30 s single-threaded vs ~2 s
    # spread, sf0.1 FS query). ensure_parallelism is a no-op on real
    # multi-split inputs.
    left = ensure_parallelism(a).select(
        F.col(id_a).alias("id_a"),
        *[F.col(c).alias(f"a_{c}") for c in keep_a],
        *[k.alias(n) for k, n in zip(block_a, keys)],
    )
    right = b.select(
        F.col(id_b).alias("id_b"),
        *[F.col(c).alias(f"b_{c}") for c in keep_b],
        *[k.alias(n) for k, n in zip(block_b, keys)],
    )
    return left.join(right, keys).drop(*keys)


def _two_phase_rank(
    df: DataFrame, key: str, id_col: str, buckets: int, out_col: str
) -> DataFrame:
    """Global 1-based rank over ``(key, id)`` without a single-reducer
    window: order-respecting buckets from DETERMINISTIC content-derived
    boundaries, per-bucket window ranks, plus broadcast cumulative
    offsets from one config-sized count job.

    Boundaries must NOT come from ``repartitionByRange``: its sampled
    range boundaries are recomputed per job execution, and the counts
    job and the final join job executing the same lineage can bucket
    rows DIFFERENTLY — offsets then mismatch and ranks duplicate
    (caught by the sf0.1 oracle run on a multi-partition input; sf0.01's
    single partition masked it). Instead the boundary sample is the
    ``buckets·128`` rows with the lowest ``xxhash64(key, id)`` (a
    TakeOrdered — content-pure, layout-independent), sorted driver-side
    into quantile edges; each row's bucket is then "number of edges ≤
    (key, id)" — a pure function of row content, identical in every job
    that evaluates it. The boundary sample ships ``buckets·128`` key
    VALUES to the driver — keep the sort key compact (an id, a name, a
    length), not a document body."""
    n_sample = buckets * 128
    samp = (
        df.select(
            F.col(key).alias("k"),
            F.col(id_col).alias("i"),
            F.xxhash64(F.col(key), F.col(id_col)).alias("__h__"),
        )
        .orderBy("__h__", "k", "i")
        .limit(n_sample)
        .select("k", "i")
        .collect()
    )
    rows = sorted((r["k"], r["i"]) for r in samp if r["k"] is not None)
    edges = []
    if buckets > 1 and rows:
        step = len(rows) / buckets
        seen = set()
        for j in range(1, buckets):
            e = rows[min(int(j * step), len(rows) - 1)]
            if e not in seen:
                seen.add(e)
                edges.append(e)
    bucket = F.lit(0)
    for ek, ei in edges:
        ge = (F.col(key) > F.lit(ek)) | (
            (F.col(key) == F.lit(ek)) & (F.col(id_col) >= F.lit(ei))
        )
        # null keys sort first (Spark asc default) -> stay in bucket 0
        bucket = bucket + F.coalesce(ge.cast("int"), F.lit(0))
    tagged = df.withColumn("__b__", bucket)
    counts = {
        r["__b__"]: r["__c__"]
        for r in tagged.groupBy("__b__").agg(F.count(F.lit(1)).alias("__c__")).collect()
    }
    if not counts:
        return df.withColumn(out_col, F.lit(None).cast("long"))
    offsets, acc = {}, 0
    for bkt in sorted(counts):
        offsets[bkt] = acc
        acc += counts[bkt]
    off_map = F.create_map(
        *[F.lit(x) for bkt in sorted(counts) for x in (bkt, offsets[bkt])]
    )
    w = Window.partitionBy("__b__").orderBy(F.col(key).asc(), F.col(id_col).asc())
    return tagged.withColumn(
        out_col, (off_map[F.col("__b__")] + F.row_number().over(w)).cast("long")
    ).drop("__b__")


def sorted_neighborhood_pairs(
    df: DataFrame,
    key: str,
    id_col: str,
    window: int = 5,
    keep_cols: Sequence[str] = (),
    buckets: int = 64,
) -> DataFrame:
    """Sorted-neighborhood blocking (Hernández & Stolfo): sort by
    ``key`` (ties: ``id_col``), pair each record with the next
    ``window − 1`` records of the sorted order. Returns ``(id_a, id_b,
    a_<col>..., b_<col>...)`` with ``id_a`` the earlier-ranked record.

    The rank is the two-phase global rank (see module docstring) and
    the pairing is explode(1..window−1) + equi-join on rank — both
    shuffles are data-spread, nothing funnels through one reducer.
    Output is a pure function of (data, window): bucket boundaries
    cannot affect it (proven against a naive global-window oracle by
    the ``q_linkage_snm`` contract query)."""
    if window < 2:
        raise ValueError(f"window must be >= 2, got {window}")
    # no persist: an unowned cache leaks across calls (the heavy_hitters
    # ADVICE-r5 lesson); both join sides share the same range-exchange
    # subplan, which Spark dedupes via ReusedExchange
    ranked = _two_phase_rank(
        df.select(id_col, key, *keep_cols), key, id_col, buckets, "__rank__"
    )
    left = ranked.select(
        F.col(id_col).alias("id_a"),
        *[F.col(c).alias(f"a_{c}") for c in keep_cols],
        F.explode(
            F.array(*[F.col("__rank__") + F.lit(i) for i in range(1, window)])
        ).alias("__rank__"),
    )
    right = ranked.select(
        F.col(id_col).alias("id_b"),
        *[F.col(c).alias(f"b_{c}") for c in keep_cols],
        "__rank__",
    )
    return left.join(right, "__rank__").drop("__rank__")


def linkage_join(
    a: DataFrame,
    b: DataFrame,
    id_a: str,
    id_b: str,
    on: Union[str, Sequence[str]],
    block_a: Sequence[Column],
    block_b: Sequence[Column],
    max_dist: int = 2,
    keep: str = "best",
    score: str = "levenshtein",
    min_sim: float = 0.9,
) -> DataFrame:
    """Link records of ``a`` to records of ``b``: blocked candidates,
    scored over the ``on`` column(s), thresholded, and (``keep="best"``)
    one best match per left record (deterministic tie-break on
    ``id_b``). ``keep="all"`` returns every pair passing the threshold.

    ``score="levenshtein"`` (default): summed edit distance, keep
    ``dist <= max_dist``, best = lowest distance. Spark's built-in —
    identical to DuckDB's, which is what makes ``q_linkage_blocked`` an
    exact value-level oracle, and JVM-side (the cheap first-pass
    scorer). Returns ``(id_a, id_b, dist)``.

    ``score="jaro_winkler"``: mean Jaro-Winkler similarity over the
    ``on`` columns, keep ``sim >= min_sim``, best = highest similarity
    (the standard name-matching scorer — prefix-weighted, transposition
    -tolerant, length-normalized where raw edit distance over-penalizes
    long strings). Arrow kernel, bit-identical to DuckDB's
    ``jaro_winkler_similarity`` (``q_linkage_jw`` hash-matches it).
    Returns ``(id_a, id_b, sim)``.

    The best-match window partitions by ``id_a`` (per-block bounded),
    not globally."""
    if keep not in ("best", "all"):
        raise ValueError(f"keep must be 'best' or 'all', got {keep!r}")
    if score not in ("levenshtein", "jaro_winkler"):
        raise ValueError(
            f"score must be 'levenshtein' or 'jaro_winkler', got {score!r}"
        )
    on = [on] if isinstance(on, str) else list(on)
    cands = blocked_candidates(
        a, b, id_a, id_b, block_a, block_b, keep_a=on, keep_b=on
    )
    if score == "levenshtein":
        # bounded levenshtein (round 14 opt, guide §4 "heavyweight work
        # per row"): the threshold overload runs the banded O(d·n) DP
        # with early abort instead of the full O(n²) table, returning
        # -1 past the bound. Per-field bound = the TOTAL cap: any
        # single field beyond it already fails the summed filter, so
        # requiring every field ≥ 0 drops exactly the same pairs, and
        # kept pairs carry exact distances (the bounded form is exact
        # within the bound). NULL inputs still yield NULL → dropped,
        # as before.
        dist = None
        in_bound = None
        for c in on:
            d = F.levenshtein(F.col(f"a_{c}"), F.col(f"b_{c}"), int(max_dist))
            ok = d >= 0
            in_bound = ok if in_bound is None else in_bound & ok
            dist = d if dist is None else dist + d
        scored = (
            cands.withColumn("dist", dist.cast("int"))
            .filter(in_bound & (F.col("dist") <= max_dist))
            .select("id_a", "id_b", "dist")
        )
        order = [F.col("dist").asc(), F.col("id_b").asc()]
    else:
        jw = jaro_winkler_udf()
        sim = None
        for c in on:
            s = jw(F.col(f"a_{c}"), F.col(f"b_{c}"))
            sim = s if sim is None else sim + s
        if len(on) > 1:
            sim = sim / F.lit(float(len(on)))
        scored = (
            cands.withColumn("sim", sim)
            .filter(F.col("sim") >= F.lit(float(min_sim)))
            .select("id_a", "id_b", "sim")
        )
        order = [F.col("sim").desc(), F.col("id_b").asc()]
    if keep == "all":
        return scored
    w = Window.partitionBy("id_a").orderBy(*order)
    return (
        scored.withColumn("__rn__", F.row_number().over(w))
        .filter(F.col("__rn__") == 1)
        .drop("__rn__")
    )


def fellegi_sunter_join(
    a: DataFrame,
    b: DataFrame,
    id_a: str,
    id_b: str,
    fields: "dict[str, tuple]",
    block_a: Sequence[Column],
    block_b: Sequence[Column],
    min_weight: float = 0.0,
    keep: str = "best",
) -> DataFrame:
    """Probabilistic record linkage à la Fellegi–Sunter (JASA 1969) —
    the canonical model the record-linkage literature (and the
    reference's own evaluation setting) scores with: each compared
    field contributes ``log2(m/u)`` when it agrees and
    ``log2((1-m)/(1-u))`` when it disagrees, where ``m``/``u`` are the
    field's agreement probabilities among true matches / true
    non-matches; the pair's match weight is the sum.

    ``fields`` maps a column name to ``(m, u)`` for exact agreement, or
    ``(m, u, max_dist)`` to call levenshtein-within-``max_dist``
    agreement (typo tolerance on name fields). All weights are
    PRECOMPUTED driver-side and emitted as double literals, and
    agreement tests are plain Column predicates (equality /
    ``levenshtein``) — the whole score is JVM codegen, zero Python, and
    replayable by an independent SQL engine with the same literals
    (``q_linkage_fs`` hash-matches DuckDB on 1e9-rounded weights).

    ``keep="best"``: highest weight per left record (tie: lowest
    ``id_b``), window partitioned by left id. ``keep="all"``: every
    pair at or above ``min_weight``. Returns ``(id_a, id_b, weight)``.
    """
    import math

    if keep not in ("best", "all"):
        raise ValueError(f"keep must be 'best' or 'all', got {keep!r}")
    if not fields:
        raise ValueError("fields must map at least one column to (m, u[, max_dist])")
    cols = list(fields)
    cands = blocked_candidates(
        a, b, id_a, id_b, block_a, block_b, keep_a=cols, keep_b=cols
    )
    weight = None
    for c, spec in fields.items():
        if len(spec) == 2:
            m, u = spec
            max_dist = None
        else:
            m, u, max_dist = spec
        if not (0.0 < u < m < 1.0):
            raise ValueError(
                f"field {c!r}: need 0 < u < m < 1 (agreement must be more "
                f"likely among matches), got m={m}, u={u}"
            )
        agree_w = math.log2(m / u)
        disagree_w = math.log2((1.0 - m) / (1.0 - u))
        la, lb = F.col(f"a_{c}"), F.col(f"b_{c}")
        if max_dist is None:
            agree = la.eqNullSafe(lb)
        else:
            # bounded levenshtein (round 14 opt): O(max_dist·n) banded
            # DP with early abort; ≥ 0 ⟺ distance ≤ max_dist (the
            # overload returns -1 past the bound). NULL → NULL → the
            # when() falls to the disagree branch, as before.
            agree = F.levenshtein(la, lb, int(max_dist)) >= 0
        w = F.when(agree, F.lit(agree_w)).otherwise(F.lit(disagree_w))
        weight = w if weight is None else weight + w
    scored = (
        cands.withColumn("weight", weight)
        .filter(F.col("weight") >= F.lit(float(min_weight)))
        .select("id_a", "id_b", "weight")
    )
    if keep == "all":
        return scored
    w_win = Window.partitionBy("id_a").orderBy(
        F.col("weight").desc(), F.col("id_b").asc()
    )
    return (
        scored.withColumn("__rn__", F.row_number().over(w_win))
        .filter(F.col("__rn__") == 1)
        .drop("__rn__")
    )


def estimate_mu_em(
    a: DataFrame,
    b: DataFrame,
    id_a: str,
    id_b: str,
    fields: "dict[str, Optional[int]]",
    block_a: Sequence[Column],
    block_b: Sequence[Column],
    iters: int = 50,
    init_p: float = 0.1,
    init_m: float = 0.9,
    init_u: float = 0.1,
    tol: float = 1e-10,
) -> "dict[str, tuple]":
    """Estimate Fellegi–Sunter ``(m, u)`` per field with EM over
    agreement-pattern counts (Winkler 1988, the standard unsupervised
    fit) — shaped for Spark: the ONLY data-sized work is one
    aggregation of blocked candidate pairs into their 2^k agreement
    patterns (``k = len(fields)`` — the aggregate output is ≤ 2^k
    rows), and EM iterates driver-side on those counts alone. No pair
    ever leaves the cluster; a billion candidates compress to the same
    ≤ 2^k rows.

    ``fields`` maps column → ``None`` (exact agreement) or an int
    (levenshtein-within-k agreement), mirroring
    :func:`fellegi_sunter_join`'s field spec. Returns
    ``{col: (m, u)}`` / ``{col: (m, u, max_dist)}`` ready to pass as
    that function's ``fields`` — GUARANTEED valid (0 < u < m < 1):
    after global class orientation, any individual field EM left
    inverted is swapped and exact m=u ties are nudged apart by 1e-6,
    so an uninformative field contributes ~zero log-odds weight
    instead of making the round-trip into ``fellegi_sunter_join``
    raise.

    Standard EM caveats apply: it fits a two-class conditional-
    independence mixture, so fields should not be near-duplicates of
    each other, and the blocked candidate set must contain BOTH true
    matches and non-matches (an over-tight blocking that only yields
    matches leaves the u-class unidentifiable). **Use at least three
    fields**: with k comparison fields the pattern distribution has
    2^k − 1 degrees of freedom against 2k + 1 parameters, so k = 2 is
    over-parameterized and EM converges to an arbitrary valid solution
    (k = 3 gives 7 ≥ 7 — the classic Fellegi–Sunter identifiability
    bound). Estimates are clamped to (1e-6, 1−1e-6) to keep the
    log-odds finite."""
    if not fields:
        raise ValueError("fields must name at least one comparison column")
    cols = list(fields)
    cands = blocked_candidates(
        a, b, id_a, id_b, block_a, block_b, keep_a=cols, keep_b=cols
    )
    agrees = []
    for c in cols:
        la, lb = F.col(f"a_{c}"), F.col(f"b_{c}")
        k = fields[c]
        agree = la.eqNullSafe(lb) if k is None else F.levenshtein(la, lb) <= F.lit(int(k))
        agrees.append(agree.cast("int").alias(f"g_{c}"))
    patterns = (
        cands.select(*agrees)
        .groupBy(*[f"g_{c}" for c in cols])
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    )
    pats = [([int(r[f"g_{c}"]) for c in cols], int(r["n"])) for r in patterns]
    total = sum(n for _, n in pats)
    if total == 0:
        raise ValueError("no candidate pairs — blocking produced an empty set")

    k = len(cols)
    p = float(init_p)
    m = [float(init_m)] * k
    u = [float(init_u)] * k
    lo, hi = 1e-6, 1.0 - 1e-6
    import math as _math

    prev_ll = None
    for _ in range(iters):
        # E-step on pattern counts
        sum_w = 0.0
        sum_wg = [0.0] * k
        sum_vg = [0.0] * k
        ll = 0.0
        for g, n in pats:
            pm = p
            pu = 1.0 - p
            for i in range(k):
                pm *= m[i] if g[i] else (1.0 - m[i])
                pu *= u[i] if g[i] else (1.0 - u[i])
            denom = pm + pu
            w = pm / denom if denom > 0 else 0.0
            ll += n * _math.log(max(denom, 1e-300))
            sum_w += n * w
            for i in range(k):
                if g[i]:
                    sum_wg[i] += n * w
                    sum_vg[i] += n * (1.0 - w)
        # M-step
        p = min(max(sum_w / total, lo), hi)
        n_match = max(sum_w, 1e-12)
        n_non = max(total - sum_w, 1e-12)
        for i in range(k):
            m[i] = min(max(sum_wg[i] / n_match, lo), hi)
            u[i] = min(max(sum_vg[i] / n_non, lo), hi)
        if prev_ll is not None and abs(ll - prev_ll) < tol * max(abs(prev_ll), 1.0):
            break
        prev_ll = ll
    # orient the classes: the "match" class must be the one with HIGHER
    # agreement probabilities (EM is label-symmetric)
    if sum(m) < sum(u):
        m, u = u, m
    # per-field repair (ADVICE r6): the aggregate orientation can leave
    # an individual UNINFORMATIVE field with m[i] <= u[i], which
    # fellegi_sunter_join rejects (needs 0 < u < m < 1) — contradicting
    # the "ready to pass" contract. Swap any inverted field (its
    # evidence direction was simply flipped) and nudge exact ties apart
    # by eps: the field then contributes ~zero log-odds weight, which
    # is the honest score for a field EM could not separate.
    eps = 1e-6
    for i in range(k):
        if m[i] < u[i]:
            m[i], u[i] = u[i], m[i]
        if m[i] <= u[i]:  # tie after swap
            m[i] = min(u[i] + eps, hi)
            u[i] = min(u[i], m[i] - eps)
    out = {}
    for i, c in enumerate(cols):
        spec = (m[i], u[i]) if fields[c] is None else (m[i], u[i], fields[c])
        out[c] = spec
    return out
