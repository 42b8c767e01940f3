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


def poly_hash_strings(strings: list[str], prime: int = P1) -> np.ndarray:
    """Polynomial hash of every string via padded matrix products.

    Left-pads with zeros to the batch max length (leading zeros do not
    change the polynomial value), then folds the int64 matrix in
    ``_CHUNK``-column chunks left→right with a mod-``prime`` reduction
    between chunks (``acc = acc·BASE^w + chunk_hash mod p``) — exact
    for any length, where a single unbounded matmul would silently
    wrap mod 2^64 past ~2048 columns. Empty strings (and the empty
    batch) hash to 0.
    """
    if not strings:
        return np.empty(0, dtype=np.int64)
    enc = [code_points(s) for s in strings]
    max_len = max((len(c) for c in enc), default=0)
    if max_len == 0:
        return np.zeros(len(strings), dtype=np.int64)
    mat = np.zeros((len(strings), max_len), dtype=np.int64)
    for r, c in enumerate(enc):
        if len(c):
            mat[r, max_len - len(c):] = c
    acc = np.zeros(len(strings), dtype=np.int64)
    for start in range(0, max_len, _CHUNK):
        chunk = mat[:, start:start + _CHUNK]
        w = chunk.shape[1]
        acc = (acc * pow(BASE, w, prime) + (chunk @ powers(w, prime)) % prime) % prime
    return acc


def poly_hash_strings_multi(
    strings: list[str], primes: tuple[int, ...] = (P1, P2)
) -> list[np.ndarray]:
    """:func:`poly_hash_strings` for several primes at once: the padded
    code-point matrix (the per-string Python cost — encode + row
    assignment) is built ONCE and folded per prime. Hash values are
    identical to per-prime calls; callers needing the packed two-prime
    hash over large batches should use this (measured ~2× on the
    600k-row quantile-sketch scan)."""
    if not strings:
        return [np.empty(0, dtype=np.int64) for _ in primes]
    enc = [code_points(s) for s in strings]
    max_len = max((len(c) for c in enc), default=0)
    if max_len == 0:
        return [np.zeros(len(strings), dtype=np.int64) for _ in primes]
    mat = np.zeros((len(strings), max_len), dtype=np.int64)
    for r, c in enumerate(enc):
        if len(c):
            mat[r, max_len - len(c):] = c
    out = []
    for prime in primes:
        acc = np.zeros(len(strings), dtype=np.int64)
        for start in range(0, max_len, _CHUNK):
            chunk = mat[:, start:start + _CHUNK]
            w = chunk.shape[1]
            acc = (acc * pow(BASE, w, prime) + (chunk @ powers(w, prime)) % prime) % prime
        out.append(acc)
    return out


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
