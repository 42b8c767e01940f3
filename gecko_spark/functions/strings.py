"""Pure-Column string edit kernels.

These implement the reference's single-character edit errors (insert /
delete / substitute / transpose — gecko/mutator.py:705-938) as substring
concatenation algebra over built-in functions, so they run JVM-side
inside whole-stage codegen. Positions are 0-based; Spark's substring is
1-based internally.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def _len(col: Column) -> Column:
    return F.length(col)


def _head(col: Column, n: Column) -> Column:
    """First n chars (n may be 0)."""
    return col.substr(F.lit(1), n)


def _tail_from(col: Column, start0: Column) -> Column:
    """Chars from 0-based position start0 to the end."""
    return col.substr(
        start0 + F.lit(1), F.greatest(F.lit(0), _len(col) - start0)
    )


def insert_char_at(col: Column, pos0: Column, ch: Column) -> Column:
    """s[:pos] + ch + s[pos:]  (pos in [0, len] — len appends)."""
    return F.concat(_head(col, pos0), ch, _tail_from(col, pos0))


def delete_char_at(col: Column, pos0: Column) -> Column:
    """s[:pos] + s[pos+1:]  (pos in [0, len-1])."""
    return F.concat(_head(col, pos0), _tail_from(col, pos0 + F.lit(1)))


def replace_char_at(col: Column, pos0: Column, ch: Column) -> Column:
    """s[:pos] + ch + s[pos+1:]."""
    return F.concat(_head(col, pos0), ch, _tail_from(col, pos0 + F.lit(1)))


def transpose_at(col: Column, pos0: Column) -> Column:
    """Swap chars at pos and pos+1 (pos in [0, len-2])."""
    char_a = col.substr(pos0 + F.lit(1), F.lit(1))
    char_b = col.substr(pos0 + F.lit(2), F.lit(1))
    return F.concat(_head(col, pos0), char_b, char_a, _tail_from(col, pos0 + F.lit(2)))


def replace_first(col: Column, find: Column, repl: Column) -> Column:
    """Replace the first (non-regex) occurrence of ``find`` with ``repl``.

    Rows without a match are returned unchanged (mirrors pandas
    ``str.replace(..., n=1)`` used throughout the reference, e.g.
    gecko/mutator.py:291-299, :641-647).
    """
    pos = F.instr(col, find)  # 1-based, 0 = not found
    replaced = F.concat(
        _head(col, pos - F.lit(1)),
        repl,
        _tail_from(col, pos - F.lit(1) + F.length(find)),
    )
    return F.when(pos > 0, replaced).otherwise(col)
