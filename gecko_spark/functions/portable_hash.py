"""Engine-portable string hashing for dedup/fingerprint operators.

The reference has no hashing at all; this engine's near-dup and
fingerprint operators need one, and they deliberately use *portable
integer arithmetic* instead of an engine hash (xxhash64, blake2b):

    h(s) = Σ cp[j] · 256^(len-1-j)   (mod p),   p a 31-bit prime,

over the Unicode code points of the string (equivalently Horner:
``h = (h·256 + cp) mod p``). Two independent primes give a 62-bit
combined hash ``h1·P2 + h2`` where one 31-bit stream is too narrow.

Why portable: any engine with 64-bit integers — DuckDB, Trino, plain
SQL, a NumPy oracle — reproduces every signature bit-for-bit, so the
*whole* MinHash/SimHash/winnowing pipeline is checkable against an
independent implementation (see the oracle SQL builders in
``__spark_entry__.py``), and results survive engine migrations. The
cost vs xxhash64 is negligible inside the Arrow kernels: hashing is a
padded int64 matrix product per batch, one BLAS call.

All arithmetic stays inside int64: code points < 2^21, powers < 2^31,
so each dot-product term is < 2^52 and a row-sum of up to 2048 terms
stays < 2^63. ``poly_hash_strings`` folds longer strings in
2048-column chunks with a mod-p reduction between chunks (Horner over
chunks: ``h = h·BASE^w + chunk_hash mod p``), so hashes stay exact —
and bit-identical to the DuckDB Horner oracle — for unbounded input
lengths.
"""

from __future__ import annotations

from functools import lru_cache

import numpy as np

__all__ = [
    "P1",
    "P2",
    "BASE",
    "code_points",
    "powers",
    "poly_hash_strings",
    "poly_hash_strings_multi",
    "window_hashes",
    "batch_window_hashes",
    "sql_horner",
    "sql_window_hashes",
    "sql_window_hashes_combined",
    "mix64",
    "sql_mix64_ctes",
]

P1 = 2_147_483_647  # 2^31 - 1 (Mersenne)
P2 = 2_147_483_629  # largest prime below it
BASE = 256


def code_points(s: str) -> np.ndarray:
    """Code points of ``s`` as uint32 — a zero-copy utf-32 view, not a
    Python-level ord() loop."""
    return np.frombuffer(s.encode("utf-32-le"), dtype=np.uint32)


# Memoization width cap: tables are keyed on the EXACT length, and
# batch-dependent lengths (max string width of a batch) would otherwise
# let a few pathological multi-MB documents pin hundreds of MB of
# cached tables. Above the cap the table is built on the fly.
_MEMO_MAX_N = 65536


def powers(n: int, prime: int = P1) -> np.ndarray:
    """``[BASE^(n-1) % prime, ..., BASE, 1]`` as int64.

    Memoized (read-only array) below ``_MEMO_MAX_N``: the table was
    rebuilt on every batch of every hash kernel otherwise — measurable
    pure-Python cost on hot Arrow paths. Callers must not mutate the
    result."""
    if n <= _MEMO_MAX_N:
        return _powers_cached(n, prime)
    return _powers_build(n, prime)


@lru_cache(maxsize=256)
def _powers_cached(n: int, prime: int) -> np.ndarray:
    return _powers_build(n, prime)


def _powers_build(n: int, prime: int) -> np.ndarray:
    out = np.empty(n, dtype=np.int64)
    acc = 1
    for i in range(n - 1, -1, -1):
        out[i] = acc
        acc = (acc * BASE) % prime
    out.flags.writeable = False
    return out


# Safe dot-product width: each term is cp·power < 2^21·2^31 = 2^52, so a
# 2048-term row-sum stays below 2^63 (int64) with headroom.
_CHUNK = 2048


def _codepoint_matrix(strings: list[str]):
    """RIGHT-padded int64 code-point matrix + per-row lengths.

    Round 14 opt (guide §4): this replaces the per-string Python loop
    (``code_points(s)`` + row assignment) that dominated every hash
    kernel's batch cost. ``np.asarray(..., dtype="U")`` materializes
    the batch as a fixed-width UCS4 array in one C pass; viewing it as
    uint32 IS the code-point matrix, zero-padded on the RIGHT (numpy's
    convention). Measured 0.88 s → 0.19 s matrix build on 600k short
    ids. The fold corrects for the pad direction afterwards (see
    ``_fold_mod``). Returns ``(None, None)`` for an all-empty batch.
    """
    arr = np.asarray(strings, dtype="U")
    width = arr.dtype.itemsize // 4
    if width == 0:
        return None, None
    # lengths via Python len, NOT np.strings.str_len: numpy cannot
    # distinguish a TRAILING NUL code point from its own zero padding
    # (both store as 0), but len(s) counts it — and the true hash
    # treats it as a zero coefficient, so only the length matters
    lens = np.fromiter(map(len, strings), dtype=np.int64, count=len(strings))
    mat = np.ascontiguousarray(arr).view(np.uint32).reshape(len(strings), width)
    return mat.astype(np.int64), lens


def _inv_base_powers(n: int, prime: int) -> np.ndarray:
    """``[BASE^0, BASE^-1, …, BASE^-n] mod prime`` as int64 — the
    right-pad correction table, indexed by pad length. ``prime`` is
    prime, so the inverse is ``BASE^(prime-2)`` (Fermat). Memoized
    (read-only) below ``_MEMO_MAX_N``: rebuilt per ``_fold_mod`` call
    otherwise — a Python loop over the batch's max string width on the
    hot path."""
    if n <= _MEMO_MAX_N:
        return _inv_base_powers_cached(n, prime)
    return _inv_base_powers_build(n, prime)


@lru_cache(maxsize=256)
def _inv_base_powers_cached(n: int, prime: int) -> np.ndarray:
    return _inv_base_powers_build(n, prime)


def _inv_base_powers_build(n: int, prime: int) -> np.ndarray:
    inv_b = pow(BASE, prime - 2, prime)
    out = np.empty(n + 1, dtype=np.int64)
    acc = 1
    for j in range(n + 1):
        out[j] = acc
        acc = (acc * inv_b) % prime
    out.flags.writeable = False
    return out


def _fold_mod(mat: np.ndarray, lens: np.ndarray, prime: int) -> np.ndarray:
    """Chunked polynomial fold of the RIGHT-padded matrix, exact mod
    ``prime``: folding the padded row gives ``h·BASE^pad mod p`` (the
    pad appends zero coefficients), so one vectorized multiply by
    ``BASE^-pad`` recovers the true hash. All terms stay < 2^62 in
    int64: each dot-product term is cp·power < 2^52 with ≤ 2048 terms
    per chunk, and the correction multiplies two residues < 2^31."""
    n, width = mat.shape
    acc = np.zeros(n, dtype=np.int64)
    for start in range(0, width, _CHUNK):
        chunk = mat[:, start:start + _CHUNK]
        w = chunk.shape[1]
        acc = (acc * pow(BASE, w, prime) + (chunk @ powers(w, prime)) % prime) % prime
    inv = _inv_base_powers(width, prime)
    return (acc * inv[width - lens]) % prime


def poly_hash_strings(strings: list[str], prime: int = P1) -> np.ndarray:
    """Polynomial hash of every string via padded matrix products.

    The batch becomes one fixed-width UCS4 code-point matrix (C-level,
    no per-string Python loop — round 14 opt), folded in ``_CHUNK``
    -column chunks left→right with a mod-``prime`` reduction between
    chunks (``acc = acc·BASE^w + chunk_hash mod p``) — exact for any
    length, where a single unbounded matmul would silently wrap mod
    2^64 past ~2048 columns — then corrected for numpy's right-padding
    by ``BASE^-pad`` (see ``_fold_mod``; hash values are bit-identical
    to the historical left-padded fold). Empty strings (and the empty
    batch) hash to 0.
    """
    if not strings:
        return np.empty(0, dtype=np.int64)
    mat, lens = _codepoint_matrix(strings)
    if mat is None:
        return np.zeros(len(strings), dtype=np.int64)
    return _fold_mod(mat, lens, prime)


def poly_hash_strings_multi(
    strings: list[str], primes: tuple[int, ...] = (P1, P2)
) -> list[np.ndarray]:
    """:func:`poly_hash_strings` for several primes at once: the padded
    code-point matrix (the per-string batch cost) is built ONCE and
    folded per prime. Hash values are identical to per-prime calls;
    callers needing the packed two-prime hash over large batches
    should use this (measured ~2× on the 600k-row quantile-sketch
    scan)."""
    if not strings:
        return [np.empty(0, dtype=np.int64) for _ in primes]
    mat, lens = _codepoint_matrix(strings)
    if mat is None:
        return [np.zeros(len(strings), dtype=np.int64) for _ in primes]
    return [_fold_mod(mat, lens, prime) for prime in primes]


def window_hashes(s: str, n: int, prime: int = P1) -> np.ndarray:
    """Hashes of every length-``n`` window of ``s`` (one hash of the
    whole string if it is shorter), via sliding_window_view @ powers."""
    if n > _CHUNK:
        raise ValueError(
            f"window size {n} exceeds the int64-exact dot-product bound "
            f"({_CHUNK}); current operators use n ≤ 64 (winnowing 8/16, "
            f"substring dedup 40)"
        )
    cp = code_points(s)
    if len(cp) == 0:
        return np.empty(0, dtype=np.int64)
    pw = powers(n, prime)
    if len(cp) < n:
        return np.array([int(cp @ pw[-len(cp):]) % prime], dtype=np.int64)
    win = np.lib.stride_tricks.sliding_window_view(cp, n)
    return (win.astype(np.int64) @ pw) % prime


# --- batched window hashing (round 15, guide §4) ---------------------------
#
# The per-row kernels above re-enter numpy once per STRING (encode,
# sliding_window_view, matmul); for corpora of short documents that
# per-row dispatch dominates the batch. batch_window_hashes computes
# every row's window hashes in ONE vectorized pass over the
# concatenated batch via the prefix-sum identity
#
#   H(s..e) = Σ_{j=s}^{e-1} cp[j]·BASE^(e-1-j)
#           = BASE^(e-1) · (U(e) - U(s))            (mod p),
#   U(i)    = Σ_{j<i} cp[j]·BASE^(-j)               (mod-p residues,
#                                                    summed exactly in int64)
#
# so each window costs O(1) gathers + multiplies instead of O(n) — and
# the values are bit-identical to window_hashes (both reduce to the
# canonical residue in [0, p)). Safety: residues are < 2^31 and the
# raw cumsum of N of them stays inside int64 for N < 2^32 — far beyond
# any Arrow batch; guarded anyway.

# power-range tables [x^0 … x^(k-1)] mod p, grown geometrically and
# reused across batches (worker reuse keeps this warm for a whole task
# stream); values < 2^31 so the outer product below stays < 2^62.
_POW_RANGE_CACHE: dict = {}


def _pow_range(x: int, k: int, prime: int) -> np.ndarray:
    """``[x^0, x^1, …, x^(k-1)] mod prime`` as a read-only int64 array
    (a view of a cached, geometrically grown table)."""
    key = (x, prime)
    tbl = _POW_RANGE_CACHE.get(key)
    if tbl is None or len(tbl) < k:
        size = max(k, 4096, 0 if tbl is None else 2 * len(tbl))
        # i = 64·q + r decomposition: two short Python loops build the
        # factor vectors, one vectorized outer product mod p fills the
        # table — O(size/64) interpreter steps for O(size) entries.
        r = np.empty(64, dtype=np.int64)
        acc = 1
        for i in range(64):
            r[i] = acc
            acc = (acc * x) % prime
        x64 = pow(x, 64, prime)
        nq = (size + 63) // 64
        q = np.empty(nq, dtype=np.int64)
        acc = 1
        for i in range(nq):
            q[i] = acc
            acc = (acc * x64) % prime
        tbl = ((q[:, None] * r[None, :]) % prime).reshape(-1)[:size]
        tbl.flags.writeable = False
        _POW_RANGE_CACHE[key] = tbl
    return tbl[:k]


def batch_window_hashes(
    strings, n: int, primes: tuple[int, ...] = (P1,)
) -> tuple[list[np.ndarray], np.ndarray]:
    """Window hashes of every string of a batch in one vectorized pass.

    Returns ``(hs, counts)`` where ``counts[i]`` is the number of
    hashes emitted for ``strings[i]`` (``len==0``/``None`` → 0;
    ``0<len<n`` → 1 whole-string hash; else ``len-n+1``) and ``hs`` is
    one int64 array per prime holding the concatenated per-row hashes —
    bit-identical to
    ``np.concatenate([window_hashes(s, n, p) for s in strings])``.

    Unlike :func:`window_hashes`, the code-point encode, the window
    fold and the mod reduction all run once over the concatenated
    batch (guide §4: the per-row numpy dispatch was the dominant batch
    cost for short-document corpora), and short rows need no special
    casing — their single whole-string hash is the same prefix-sum
    difference with ``e - s = len`` instead of ``n``.
    """
    nrows = len(strings)
    counts = np.zeros(nrows, dtype=np.int64)
    if nrows == 0:
        return [np.empty(0, dtype=np.int64) for _ in primes], counts
    ss = [s if isinstance(s, str) else "" for s in strings]
    lens = np.fromiter(map(len, ss), dtype=np.int64, count=nrows)
    counts = np.where(lens == 0, 0, np.maximum(lens - n + 1, 1))
    total_out = int(counts.sum())
    if total_out == 0:
        return [np.empty(0, dtype=np.int64) for _ in primes], counts
    joined = "".join(ss)
    flat = code_points(joined).astype(np.int64)
    total = len(flat)
    if total >= 1 << 32:  # raw-residue cumsum would leave int64
        hs = [
            np.concatenate(
                [window_hashes(s, n, p) for s in ss if s]
                or [np.empty(0, dtype=np.int64)]
            )
            for p in primes
        ]
        return hs, counts
    offs = np.zeros(nrows + 1, dtype=np.int64)
    np.cumsum(lens, out=offs[1:])
    # emitted-window global [start, end) spans, in row-major order
    nz = counts > 0
    cum = np.zeros(nrows + 1, dtype=np.int64)
    np.cumsum(counts, out=cum[1:])
    reps = counts[nz]
    starts = np.repeat(offs[:-1][nz], reps) + (
        np.arange(total_out, dtype=np.int64) - np.repeat(cum[:-1][nz], reps)
    )
    ends = starts + np.repeat(np.minimum(lens, n)[nz], reps)
    hs = []
    for p in primes:
        inv_b = pow(BASE, p - 2, p)
        ipow = _pow_range(inv_b, total, p)
        t = (flat * ipow) % p
        upad = np.zeros(total + 1, dtype=np.int64)
        np.cumsum(t, out=upad[1:])
        diff = (upad[ends] - upad[starts]) % p
        bpow = _pow_range(BASE, total, p)
        hs.append((diff * bpow[ends - 1]) % p)
    return hs, counts


# ---------------------------------------------------------------------------
# DuckDB SQL builders — the same arithmetic as SQL text, used by the
# oracle queries. (Spark never executes these; the Spark side runs the
# NumPy kernels above.)
# ---------------------------------------------------------------------------


def sql_horner(expr: str, prime: int = P1) -> str:
    """Horner-fold polynomial hash of a VARCHAR expression in DuckDB."""
    return (
        f"list_reduce(list_prepend(CAST(0 AS BIGINT), "
        f"list_transform(string_split({expr}, ''), c -> CAST(unicode(c) AS BIGINT))), "
        f"(acc, x) -> (acc * {BASE} + x) % {prime})"
    )


def sql_window_hashes_combined(s_expr: str, n: int) -> str:
    """List of combined two-prime window hashes of ``s_expr`` in DuckDB
    — same values as ``window_hashes(s, n, P1) * P2 +
    window_hashes(s, n, P2)`` (the 62-bit form the substring-dedup
    operators key on). Empty/NULL input yields an empty list."""
    pw1, pw2 = powers(n, P1), powers(n, P2)
    t1 = " + ".join(
        f"CAST(unicode({s_expr}[i+{j}]) AS BIGINT) * {pw1[j]}" for j in range(n)
    )
    t2 = " + ".join(
        f"CAST(unicode({s_expr}[i+{j}]) AS BIGINT) * {pw2[j]}" for j in range(n)
    )
    pw1_lst = "[" + ",".join(str(p) for p in pw1) + "]"
    pw2_lst = "[" + ",".join(str(p) for p in pw2) + "]"
    return f"""CASE
      WHEN {s_expr} IS NULL OR length({s_expr}) = 0 THEN CAST([] AS BIGINT[])
      WHEN length({s_expr}) < {n} THEN
        [ (list_sum([CAST(unicode({s_expr}[j+1]) AS BIGINT) * {pw1_lst}[{n} - length({s_expr}) + j + 1]
                     for j in range(0, length({s_expr}))]) % {P1}) * {P2}
          + list_sum([CAST(unicode({s_expr}[j+1]) AS BIGINT) * {pw2_lst}[{n} - length({s_expr}) + j + 1]
                      for j in range(0, length({s_expr}))]) % {P2} ]
      ELSE
        [ (({t1}) % {P1}) * {P2} + (({t2}) % {P2})
          for i in range(1, length({s_expr}) - {n - 2}) ]
    END"""


def sql_window_hashes(s_expr: str, n: int, prime: int = P1) -> str:
    """List of all length-``n`` window hashes of ``s_expr`` in DuckDB —
    same values as :func:`window_hashes`. ``s_expr`` must be a simple
    (re-evaluatable) expression; empty/NULL input yields an empty list."""
    pw = powers(n, prime)
    win_terms = " + ".join(
        f"CAST(unicode({s_expr}[i+{j}]) AS BIGINT) * {pw[j]}" for j in range(n)
    )
    pw_lst = "[" + ",".join(str(p) for p in pw) + "]"
    return f"""CASE
      WHEN {s_expr} IS NULL OR length({s_expr}) = 0 THEN CAST([] AS BIGINT[])
      WHEN length({s_expr}) < {n} THEN
        [ list_sum([CAST(unicode({s_expr}[j+1]) AS BIGINT) * {pw_lst}[{n} - length({s_expr}) + j + 1]
                    for j in range(0, length({s_expr}))]) % {prime} ]
      ELSE
        [ ({win_terms}) % {prime} for i in range(1, length({s_expr}) - {n - 2}) ]
    END"""


# --- 64-bit avalanche finalizer (splitmix64, Steele et al. 2014; the
# public-domain mixing constants from Vigna's reference xoroshiro
# implementation). The polynomial/affine pipeline above is ideal for
# EQUALITY-based operators (MinHash bands, KMV order statistics,
# winnowing) but its outputs are affine images of the input value, and
# affine maps of structured keys (consecutive numeric strings) have
# lattice structure — fatal for HyperLogLog, whose register statistic
# reads *bit positions*. mix64 destroys that structure with two
# multiply-xorshift rounds; it is exactly replayable in SQL because
# the mod-2^64 multiply splits into 32-bit halves (sql_mix64). ---

_MIX_K1 = 0xBF58476D1CE4E5B9
_MIX_K2 = 0x94D049BB133111EB


def mix64(h: np.ndarray) -> np.ndarray:
    """splitmix64 finalizer over a non-negative int64/uint64 array →
    uint64, bit-identical to the DuckDB expression from
    :func:`sql_mix64`."""
    z = np.asarray(h).astype(np.uint64)
    with np.errstate(over="ignore"):
        z = (z ^ (z >> np.uint64(30))) * np.uint64(_MIX_K1)
        z = (z ^ (z >> np.uint64(27))) * np.uint64(_MIX_K2)
        z = z ^ (z >> np.uint64(31))
    return z


def sql_mix64_ctes(src_cte: str, in_col: str, out_col: str = "z") -> str:
    """CTE chain replaying :func:`mix64` in DuckDB over column
    ``in_col`` of CTE ``src_cte`` (carrying every other column along).
    Returns text to splice after the source CTE; the final stage is
    named ``__mix6`` with the mixed value in ``out_col``. UBIGINT
    xor/shift are native; the wrap-around multiply is exact via 32-bit
    half-products in HUGEINT (x·K mod 2^64 =
    (x_lo·K + ((x_hi·K) mod 2^32)·2^32) mod 2^64)."""
    two32, two64 = 1 << 32, 1 << 64

    def mul(z: str, k: int) -> str:
        return (
            f"CAST(((CAST(({z}) % {two32} AS HUGEINT) * {k}) + "
            f"(((CAST(({z}) // {two32} AS HUGEINT) * {k}) % {two32}) * {two32}))"
            f" % {two64} AS UBIGINT)"
        )

    return f"""
__mix1 AS (SELECT *, CAST({in_col} AS UBIGINT) AS __z1 FROM {src_cte}),
__mix2 AS (SELECT *, xor(__z1, __z1 >> 30) AS __z2 FROM __mix1),
__mix3 AS (SELECT *, {mul('__z2', _MIX_K1)} AS __z3 FROM __mix2),
__mix4 AS (SELECT *, xor(__z3, __z3 >> 27) AS __z4 FROM __mix3),
__mix5 AS (SELECT *, {mul('__z4', _MIX_K2)} AS __z5 FROM __mix4),
__mix6 AS (SELECT * EXCLUDE (__z1, __z2, __z3, __z4, __z5),
                  xor(__z5, __z5 >> 31) AS {out_col}
           FROM __mix5)"""
