"""Core plumbing: Spark session, randomness policy, row selection.

Randomness policy (SURVEY.md §7.4): the reference threads one sequential
NumPy RNG through every operator, which makes output depend on call
order — impossible and undesirable on a cluster.  Here every random
decision is a *pure function of row identity and an operator seed*, so
results are partitioning-independent and reproducible under any
parallelism:

* :class:`HashRandom` — production path; ``xxhash64(key cols, seed,
  salt)`` mapped to [0, 1).  Same seed ⇒ same output, row-for-row,
  regardless of cluster layout.
* :class:`LcgRandom` — a small LCG over an integer key column whose
  formula is emitted as portable SQL text, so an external oracle
  (DuckDB) can reproduce the exact same doubles.  Used by the
  correctness harness; also a valid production source when rows carry a
  unique integer key.

Both expose ``uniform(salt) -> Column`` in [0, 1); independent draws use
distinct salts.
"""

from __future__ import annotations

import os
from typing import Iterable, Sequence, Union

from pyspark.sql import Column, SparkSession
from pyspark.sql import functions as F


class GeckoWarning(UserWarning):
    """Warning category for unreachable mutation probabilities.

    Mirrors the reference's warning contract (reference
    gecko/_typedefs.py:11-16, gecko/mutator.py:68-73): when the fraction
    of rows eligible for a mutation is below the requested ``p``, the
    engine warns instead of failing.
    """


ColumnOrName = Union[Column, str]


def _to_col(c: ColumnOrName) -> Column:
    return F.col(c) if isinstance(c, str) else c


def get_spark(
    app_name: str = "gecko-spark",
    cpus: int | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build a local SparkSession tuned for this workload.

    On a real cluster users bring their own session; every operator in
    this package only needs a plain ``SparkSession`` and sets no global
    state.
    """
    if cpus is None:
        cpus = int(os.environ.get("SPARK_GRAFT_CPUS", os.cpu_count() or 4))
    if shuffle_partitions is None:
        shuffle_partitions = cpus

    builder = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        # lets GeckoDataSource's opt-in __idx__ range pruning work
        # (sources/datasource.py); harmless when no python source reads
        .config("spark.sql.python.filterPushdown.enabled", "true")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", os.environ.get("GECKO_SPARK_DRIVER_MEM", "16g"))
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark


# ---------------------------------------------------------------------------
# Random sources
# ---------------------------------------------------------------------------

# LCG constants (glibc-style multiplier; modulus 2^31 so m / 2^31 is an
# exact binary double — identical across engines).
LCG_M = 2**31
LCG_A = 1103515245
LCG_C = 12345


def lcg_state_sql(key_sql: str, seed: int, salt: int, stream: int = 0) -> str:
    """SQL text for the mixed LCG state in [0, 2^31) derived from an
    integer key expression, a seed, a stream, and a per-draw salt.

    The same text is valid Spark SQL and DuckDB SQL, which is what makes
    engine-vs-oracle value comparison exact: both engines evaluate the
    identical integer recurrence, and the final division by 2^31 is an
    exact power-of-two float operation.
    """
    c1 = (seed * 7919 + stream * 15485863 + salt * 104729 + LCG_C) % LCG_M
    step1 = f"((ABS(CAST({key_sql} AS BIGINT)) % {LCG_M}) * {LCG_A} + {c1}) % {LCG_M}"
    return f"((({step1}) * {LCG_A} + {LCG_C}) % {LCG_M})"


def lcg_uniform_sql(key_sql: str, seed: int, salt: int, stream: int = 0) -> str:
    """SQL text for a uniform double in [0, 1) — portable Spark/DuckDB."""
    return (
        f"(CAST({lcg_state_sql(key_sql, seed, salt, stream)} AS DOUBLE)"
        f" / {float(LCG_M)!r})"
    )


class RandomSource:
    """Provider of per-row uniform [0, 1) columns.

    ``uniform(salt)`` must return independent-looking draws for distinct
    salts and be deterministic given (row identity, seed, stream, salt).
    ``fork(i)`` derives a decorrelated child source (used by composite
    operators like grouped generators / mutator multiplexers).
    """

    stream: int = 0

    def uniform(self, salt: int) -> Column:
        raise NotImplementedError

    def fork(self, i: int) -> "RandomSource":
        raise NotImplementedError

    def uniform_int(self, salt: int, n: Column | int) -> Column:
        """Uniform integer in [0, n) as a LongType column."""
        n_col = F.lit(n) if isinstance(n, int) else n
        return F.floor(self.uniform(salt) * n_col.cast("double")).cast("long")

    def choice(self, salt: int, values: Sequence[str]) -> Column:
        """Uniformly choose one of ``values`` (a small driver-side list)."""
        arr = F.array(*[F.lit(v) for v in values])
        return F.element_at(arr, (self.uniform_int(salt, len(values)) + 1).cast("int"))


class HashRandom(RandomSource):
    """Partitioning-independent randomness: xxhash64 over key columns.

    ``key_cols`` should identify a row (a primary key, or all payload
    columns).  xxhash64 runs JVM-side inside whole-stage codegen — no
    Python involved.
    """

    def __init__(self, seed: int, key_cols: Iterable[ColumnOrName], stream: int = 0):
        self.seed = int(seed)
        self.stream = int(stream)
        self.key_cols = [_to_col(c) for c in key_cols]
        if not self.key_cols:
            raise ValueError("HashRandom requires at least one key column")

    def uniform(self, salt: int) -> Column:
        h = F.xxhash64(
            *self.key_cols, F.lit(self.seed), F.lit(self.stream), F.lit(int(salt))
        )
        # int64 → [0, 1): shift to unsigned range then scale.
        return h.cast("double") / F.lit(float(2**64)) + F.lit(0.5)

    def fork(self, i: int) -> "HashRandom":
        return HashRandom(self.seed, self.key_cols, self.stream * 1000003 + i + 1)


class LcgRandom(RandomSource):
    """Oracle-reproducible randomness: LCG over an integer key column.

    The underlying formula is plain integer SQL (see
    :func:`lcg_uniform_sql`) so a DuckDB oracle evaluating the same text
    over the same keys produces bit-identical doubles.
    """

    def __init__(self, key_sql: str, seed: int, stream: int = 0):
        self.key_sql = key_sql
        self.seed = int(seed)
        self.stream = int(stream)

    def uniform(self, salt: int) -> Column:
        return F.expr(
            lcg_uniform_sql(self.key_sql, self.seed, salt, stream=self.stream)
        )

    def fork(self, i: int) -> "LcgRandom":
        return LcgRandom(self.key_sql, self.seed, self.stream * 1000003 + i + 1)


# ---------------------------------------------------------------------------
# Row selection (the shared mutator contract)
# ---------------------------------------------------------------------------


def bernoulli_select(
    rand: RandomSource, salt: int, p: float, eligible: Column | None = None
) -> Column:
    """Boolean selection column: eligible rows pass with probability p.

    This is the engine's default ("lazy") selection mode: a conditional
    Bernoulli draw among eligible rows, matching the reference's
    behavior whenever its measured eligibility ratio is ≥ p (reference
    gecko/mutator.py:688-691 rescales by the eligible fraction; the
    strict mode that reproduces the rescaling + GeckoWarning needs a
    count and lives in plans/pipeline.py::mutate_data_frame(strict_p=True)).
    """
    check_probability(p)
    sel = rand.uniform(salt) < F.lit(float(p))
    if eligible is not None:
        sel = eligible & sel
    return sel


def check_probability(p: float) -> None:
    if p < 0 or p > 1:
        raise ValueError("probability is out of range, must be between 0 and 1")


def persist_until_released(cached, owner):
    """Unified cache-ownership policy for operators whose RETURNED lazy
    plan references an internally persisted frame (the self-join /
    multi-reference sites in dedup.py, sketches.py): tie the cache's
    lifetime to the caller's result.

    ``cached`` must already be ``.persist(...)``-ed; when the caller's
    last reference to ``owner`` (the returned DataFrame) is
    garbage-collected, the cache is unpersisted (non-blocking, errors
    swallowed — the session may already be stopped). Sweep loops that
    drop each result before the next call therefore leave NO persisted
    blocks behind (the round-6 leak mode: every call on a distinct
    input added an unowned MEMORY_AND_DISK entry for the session's
    lifetime), while the cache stays live for as long as the result
    can still be evaluated. Spark matches cached plans by canonicalized
    logical plan, so two results over the SAME input share one entry;
    releasing one result then releases the shared entry early for the
    other — correctness is unaffected (the plan recomputes), only the
    reuse is lost, and only in that interleaved-handles edge.

    CALLER CONTRACT: the cache lives exactly as long as the returned
    ``owner`` OBJECT. Chaining (``pairs(df).filter(...)``) creates a
    NEW DataFrame and drops the owner immediately (CPython refcount),
    releasing the cache before any job runs — correct but the persist
    becomes dead weight. Hold the owner in a variable while evaluating
    derived frames, or tie a derived result's lifetime to it with
    :func:`adopt_cache_owner` (what the in-package consumers like
    ``minhash_dedupe`` do).

    Returns ``owner`` for chaining."""
    import weakref

    jdf = cached._jdf

    def _release(jdf=jdf):
        try:
            jdf.unpersist(False)
        except Exception:
            pass

    weakref.finalize(owner, _release)
    return owner


def adopt_cache_owner(derived, *owners):
    """Keep ``owners``' internal caches (tied to their object lifetime
    by :func:`persist_until_released`) alive for as long as ``derived``
    is — a strong reference chain, so a caller holding only the derived
    result still evaluates against the warm cache, and dropping the
    result releases everything transitively (ADVICE r7: the common
    ``pairs(df).filter(...)`` chain was silently releasing the
    signature cache before the first job).

    Returns ``derived`` for chaining."""
    existing = getattr(derived, "_gecko_cache_owners", ())
    derived._gecko_cache_owners = tuple(existing) + tuple(owners)
    return derived
