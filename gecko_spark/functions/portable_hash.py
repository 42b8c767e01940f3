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


def powers(n: int, prime: int = P1) -> np.ndarray:
    """``[BASE^(n-1) % prime, ..., BASE, 1]`` as int64."""
    out = np.empty(n, dtype=np.int64)
    acc = 1
    for i in range(n - 1, -1, -1):
        out[i] = acc
        acc = (acc * BASE) % prime
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
    prime, so the inverse is ``BASE^(prime-2)`` (Fermat)."""
    inv_b = pow(BASE, prime - 2, prime)
    out = np.empty(n + 1, dtype=np.int64)
    acc = 1
    for j in range(n + 1):
        out[j] = acc
        acc = (acc * inv_b) % prime
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
