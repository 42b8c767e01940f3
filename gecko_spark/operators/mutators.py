"""Mutators: DataFrame transformations that corrupt a fraction of rows.

Reference parity: gecko/mutator.py (M1–M19 in SURVEY.md §2.2). The
shared contract (reference gecko/mutator.py:68-73 + §3.3 of SURVEY.md):

* an *eligibility* predicate marks rows the mutator could change;
* selection is Bernoulli among eligible rows — the default "lazy" mode
  draws ``u < p`` conditioned on eligibility (no extra Spark job); the
  ``strict_p`` mode of :func:`gecko_spark.plans.pipeline.mutate_data_frame`
  additionally measures the eligible fraction with one aggregation,
  rescales ``p`` and emits :class:`~gecko_spark.core.GeckoWarning` when
  the requested rate is unreachable, matching the reference exactly;
* only selected rows change; everything else passes through untouched.

Execution shape: every mutator contributes *column expressions* to one
projection — chained mutators collapse into a handful of stages under
Catalyst. Pure string/date algebra runs JVM-side in whole-stage
codegen; the four table-driven mutators (CLDR typos, phonetic /
inline-replacement / regex tables) each run ONE Arrow ``pandas_udf``
whose inputs are (value, selection flag, uniform draws) — kernels are
pure functions, all randomness is derived JVM-side (core.py policy), so
results are partitioning-independent.
"""

from __future__ import annotations

import re
import string as _string
from typing import Callable, Optional, Sequence, Union

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from gecko_spark.core import (
    HashRandom,
    RandomSource,
    bernoulli_select,
    check_probability,
)
from gecko_spark.functions.datetime_patterns import strftime_to_spark
from gecko_spark.functions.strings import (
    delete_char_at,
    insert_char_at,
    replace_char_at,
    transpose_at,
)
from gecko_spark.operators.generators import ColumnGenerator
from gecko_spark.sources.cldr import load_cldr_candidates
from gecko_spark.sources.tables import (
    TableSource,
    load_config_table,
    load_phonetic_table,
    load_regex_table,
    load_replacement_table,
)

__all__ = [
    "Mutator",
    "with_function",
    "with_cldr_keymap_file",
    "with_phonetic_replacement_table",
    "with_replacement_table",
    "with_missing_value",
    "with_insert",
    "with_delete",
    "with_transpose",
    "with_substitute",
    "with_noop",
    "with_categorical_values",
    "with_permute",
    "with_lowercase",
    "with_uppercase",
    "with_datetime_offset",
    "with_generator",
    "with_regex_replacement_table",
    "with_repeat",
    "with_group",
]

# salt layout: 0 = row selection, 1.. = mutation draws
_SALT_SELECT = 0


class Mutator:
    """Base mutator: produces mutated column expressions.

    Single-column mutators (the default) are mapped independently over
    each column they're assigned to, mirroring the reference's
    list-of-series semantics (e.g. gecko/mutator.py:699-701). Group
    mutators (``group_arity=True``) see all columns at once (permute,
    generator splice, weighted group).
    """

    name = "mutator"
    group_arity = False

    # -- single-column hooks ------------------------------------------------
    def _eligible(self, col: Column, rand: RandomSource) -> Optional[Column]:
        return None  # None = every row is eligible

    def _mutate(self, col: Column, rand: RandomSource) -> Column:
        raise NotImplementedError

    def _transform(self, col: Column, rand: RandomSource, selected: Column) -> Column:
        return F.when(selected, self._mutate(col, rand)).otherwise(col)

    def _transform_with_frame(
        self, df: DataFrame, col: Column, rand: RandomSource, selected: Column
    ) -> Column:
        """Hook for mutators that need a pre-pass over the input frame
        (e.g. global rule-match frequencies). Default: no pre-pass."""
        return self._transform(col, rand, selected)

    # -- group hooks ---------------------------------------------------------
    def _eligible_group(self, cols: list[Column], rand: RandomSource) -> Optional[Column]:
        return None

    def _transform_group(
        self, cols: list[Column], rand: RandomSource, selected: Column
    ) -> list[Column]:
        raise NotImplementedError

    def _validate_group(self, n_columns: int) -> None:
        pass

    # -- driver --------------------------------------------------------------
    def apply(
        self,
        df: DataFrame,
        columns: Union[str, Sequence[str]],
        p: float = 1.0,
        rand: Optional[RandomSource] = None,
        seed: int = 0,
        strict_p: bool = False,
    ) -> DataFrame:
        """Apply this mutator to ``columns`` of ``df`` with probability p."""
        check_probability(p)
        if isinstance(columns, str):
            columns = [columns]
        columns = list(columns)
        for c in columns:
            if c not in df.columns:
                raise ValueError(
                    f"column `{c}` does not exist, must be one of `{','.join(df.columns)}`"
                )
        if rand is None:
            # key draws on ALL input columns: mutated columns alone may
            # hold constant values, which would make every row share one
            # draw (all-or-nothing selection)
            rand = HashRandom(seed, [F.col(c) for c in df.columns])

        out: dict[str, Column] = {}
        if self.group_arity:
            self._validate_group(len(columns))
            cols = [F.col(c) for c in columns]
            eligible = self._eligible_group(cols, rand)
            p_eff = self._strict_rescale(df, eligible, p) if strict_p else p
            selected = bernoulli_select(rand, _SALT_SELECT, p_eff, eligible)
            for c, expr in zip(columns, self._transform_group(cols, rand, selected)):
                out[c] = expr
        else:
            for i, c in enumerate(columns):
                r = rand.fork(i)
                col = F.col(c)
                eligible = self._eligible(col, r)
                p_eff = self._strict_rescale(df, eligible, p) if strict_p else p
                selected = bernoulli_select(r, _SALT_SELECT, p_eff, eligible)
                out[c] = self._transform_with_frame(df, col, r, selected)

        return df.select(
            *[out[c].alias(c) if c in out else F.col(c) for c in df.columns]
        )

    def _strict_rescale(self, df: DataFrame, eligible: Optional[Column], p: float) -> float:
        """Measure the eligible fraction (one aggregation job), warn when
        p is unreachable, and rescale so the overall mutated fraction ≈ p
        — the reference's exact contract (gecko/mutator.py:68-73,
        :688-691)."""
        import warnings

        from gecko_spark.core import GeckoWarning

        if eligible is None:
            return p
        row = df.select(F.avg(eligible.cast("double")).alias("pa")).first()
        p_actual = row["pa"] or 0.0
        if p_actual < p:
            warnings.warn(
                f"{self.name}: desired probability of {p} cannot be met since "
                f"percentage of rows that could possibly be mutated is {p_actual}",
                GeckoWarning,
            )
        if p_actual <= 0:
            return 0.0
        return min(1.0, p / p_actual)

    # gecko calling convention: mutator(df, columns, p)
    def __call__(self, df: DataFrame, columns, p: float = 1.0, **kw) -> DataFrame:
        return self.apply(df, columns, p, **kw)


# ---------------------------------------------------------------------------
# Simple column mutators
# ---------------------------------------------------------------------------


class _MissingValue(Mutator):
    name = "with_missing_value"

    def __init__(self, value: str = "", nulls_eligible: bool = False):
        self.value = value
        self.nulls_eligible = nulls_eligible

    def _eligible(self, col, rand):
        # SQL three-valued logic: ``col != value`` is NULL for null rows,
        # so nulls are ineligible by default (nulls stay null, and don't
        # count in the strict_p rescale denominator). The reference's
        # pandas ``srs != value`` is True for NaN, so it DOES overwrite
        # missing rows (gecko/mutator.py:678) — pass
        # ``nulls_eligible=True`` for that reference-exact behavior.
        cmp = col != F.lit(self.value)
        if self.nulls_eligible:
            return cmp | col.isNull()
        return cmp

    def _mutate(self, col, rand):
        return F.lit(self.value)


def with_missing_value(value: str = "", nulls_eligible: bool = False) -> Mutator:
    """Overwrite selected rows with a sentinel (gecko/mutator.py:658-702).

    Null policy: by default null rows are left null and are NOT counted
    as mutable for p-rescaling — a documented divergence from the
    reference, whose ``srs != value`` comparison treats NaN as eligible
    and fills it with the sentinel. Set ``nulls_eligible=True`` to
    reproduce the reference exactly on null-bearing input.
    """
    return _MissingValue(value, nulls_eligible=nulls_eligible)


def _charset_list(charset: Union[str, Sequence[str]]) -> list[str]:
    chars = list(charset)
    if not chars:
        raise ValueError("charset must not be empty")
    return chars


class _Insert(Mutator):
    name = "with_insert"

    def __init__(self, charset: Union[str, Sequence[str]] = _string.ascii_letters):
        self.charset = _charset_list(charset)

    def _mutate(self, col, rand):
        pos = rand.uniform_int(1, F.length(col) + F.lit(1))
        ch = rand.choice(2, self.charset)
        return insert_char_at(col, pos, ch)


def with_insert(charset: Union[str, Sequence[str]] = _string.ascii_letters) -> Mutator:
    """Insert one random char at a uniform position, position len appends
    (gecko/mutator.py:705-759)."""
    return _Insert(charset)


class _Delete(Mutator):
    name = "with_delete"

    def _eligible(self, col, rand):
        return F.length(col) >= 1  # gecko/mutator.py:778-779

    def _mutate(self, col, rand):
        pos = rand.uniform_int(1, F.length(col))
        return delete_char_at(col, pos)


def with_delete() -> Mutator:
    """Delete one char at a uniform position (gecko/mutator.py:762-812)."""
    return _Delete()


class _Transpose(Mutator):
    name = "with_transpose"

    def _eligible(self, col, rand):
        return F.length(col) >= 2  # gecko/mutator.py:834-835

    def _mutate(self, col, rand):
        pos = rand.uniform_int(1, F.length(col) - F.lit(1))
        return transpose_at(col, pos)


def with_transpose() -> Mutator:
    """Swap two adjacent chars; identical neighbors may swap to a no-op,
    same as the reference (gecko/mutator.py:815-871)."""
    return _Transpose()


class _Substitute(Mutator):
    name = "with_substitute"

    def __init__(self, charset: Union[str, Sequence[str]] = _string.ascii_letters):
        self.charset = _charset_list(charset)

    def _eligible(self, col, rand):
        return F.length(col) >= 1

    def _mutate(self, col, rand):
        pos = rand.uniform_int(1, F.length(col))
        ch = rand.choice(2, self.charset)
        return replace_char_at(col, pos, ch)


def with_substitute(charset: Union[str, Sequence[str]] = _string.ascii_letters) -> Mutator:
    """Replace one char at a uniform position with a random charset char
    (self-replacement possible, gecko/mutator.py:874-938)."""
    return _Substitute(charset)


class _Noop(Mutator):
    name = "with_noop"

    def _transform(self, col, rand, selected):
        return col


def with_noop() -> Mutator:
    """Identity (gecko/mutator.py:941-955)."""
    return _Noop()


def _not_is_cased_kernel(method: str):
    """Arrow kernel for the reference's exact ``~str.islower()`` /
    ``~str.isupper()`` eligibility (gecko/mutator.py:1141, :1185).
    Python's ``islower``/``isupper`` are False for cased-character-free
    strings ("123", ""), which makes those rows ELIGIBLE in the
    reference; nulls stay ineligible (engine-wide null policy)."""

    @F.pandas_udf(T.BooleanType())
    def _kern(vals: pd.Series) -> pd.Series:
        return pd.Series(
            [False if v is None else not getattr(v, method)() for v in vals],
            dtype=bool,
        )

    return _kern


class _Lowercase(Mutator):
    name = "with_lowercase"

    def __init__(self, exact_eligibility: bool = False):
        self.exact = exact_eligibility

    def _eligible(self, col, rand):
        if self.exact:
            return _not_is_cased_kernel("islower")(col)
        # Column approximation of Python's ~str.islower() eligibility
        # (gecko/mutator.py:1141-1142): differs only for strings with no
        # cased characters, whose mutation is a no-op anyway — but under
        # strict_p those rows change the measured eligible fraction, so
        # the warning/rescale can deviate from the reference on
        # digit-heavy columns. exact_eligibility=True restores parity
        # at the cost of one Arrow kernel per row.
        return col != F.lower(col)

    def _mutate(self, col, rand):
        return F.lower(col)


def with_lowercase(exact_eligibility: bool = False) -> Mutator:
    """``exact_eligibility``: use the reference's exact ``~islower()``
    row eligibility (counts cased-character-free strings as eligible)
    instead of the JVM-side ``col != lower(col)`` approximation —
    mutation output is identical either way; only the ``strict_p``
    warning threshold/rescale on such rows differs."""
    return _Lowercase(exact_eligibility)


class _Uppercase(Mutator):
    name = "with_uppercase"

    def __init__(self, exact_eligibility: bool = False):
        self.exact = exact_eligibility

    def _eligible(self, col, rand):
        if self.exact:
            return _not_is_cased_kernel("isupper")(col)
        return col != F.upper(col)

    def _mutate(self, col, rand):
        return F.upper(col)


def with_uppercase(exact_eligibility: bool = False) -> Mutator:
    """See :func:`with_lowercase` — same ``exact_eligibility`` contract
    with ``~isupper()``."""
    return _Uppercase(exact_eligibility)


class _Repeat(Mutator):
    name = "with_repeat"

    def __init__(self, join_with: str = " "):
        self.join_with = join_with

    def _mutate(self, col, rand):
        return F.concat(col, F.lit(self.join_with), col)


def with_repeat(join_with: str = " ") -> Mutator:
    """Duplicate the value with a separator (gecko/mutator.py:1593-1620)."""
    return _Repeat(join_with)


class _CategoricalValues(Mutator):
    name = "with_categorical_values"

    def __init__(self, uniques: list[str]):
        if len(uniques) < 2:
            raise ValueError(
                "categorical values mutator requires at least two distinct values"
            )
        self.uniques = sorted(uniques)

    def _eligible(self, col, rand):
        return col.isin(self.uniques)  # gecko/mutator.py:1016-1018

    def _mutate(self, col, rand):
        arr = F.array(*[F.lit(v) for v in self.uniques])
        others = F.array_remove(arr, col)  # the k-1 different values
        pick = rand.uniform_int(1, F.size(others))
        return F.element_at(others, (pick + F.lit(1)).cast("int"))


def with_categorical_values(
    data_source: TableSource,
    value_column: Union[str, int] = 0,
    encoding: str = "utf-8",
    delimiter: str = ",",
) -> Mutator:
    """Replace a categorical value with a *different* one from the unique
    set of a config column (gecko/mutator.py:958-1056)."""
    tbl = load_config_table(data_source, [value_column], delimiter=delimiter, encoding=encoding)
    uniques = sorted(set(tbl.iloc[:, 0].tolist()))
    return _CategoricalValues(uniques)


# ---------------------------------------------------------------------------
# Datetime offset
# ---------------------------------------------------------------------------

_UNIT_ALIASES = {
    "d": "DAY", "days": "DAY",
    "h": "HOUR", "hours": "HOUR",
    "m": "MINUTE", "minutes": "MINUTE",
    "s": "SECOND", "seconds": "SECOND",
}
_WRAP_FIELD = {"DAY": F.month, "HOUR": F.dayofmonth, "MINUTE": F.hour, "SECOND": F.minute}


class _DatetimeOffset(Mutator):
    name = "with_datetime_offset"

    def __init__(self, max_delta: int, unit: str, dt_format: str, prevent_wraparound: bool):
        if max_delta <= 0:
            raise ValueError(f"delta must be positive, is {max_delta}")
        if unit not in _UNIT_ALIASES:
            raise ValueError(f"unrecognized unit: `{unit}`")
        self.max_delta = max_delta
        self.unit = _UNIT_ALIASES[unit]
        self.dt_format = dt_format
        self.spark_format = strftime_to_spark(dt_format)
        self.prevent_wraparound = prevent_wraparound

    def _ts(self, col):
        return F.try_to_timestamp(col, F.lit(self.spark_format))

    def _eligible(self, col, rand):
        return self._ts(col).isNotNull()

    def _mutate(self, col, rand):
        ts = self._ts(col)
        # uniform magnitude 1..max_delta, uniform sign (gecko/mutator.py:1252-1257)
        magnitude = rand.uniform_int(1, self.max_delta) + F.lit(1)
        sign = F.when(rand.uniform(2) < F.lit(0.5), F.lit(-1)).otherwise(F.lit(1))
        out_ts = F.timestamp_add(self.unit, (magnitude * sign).cast("int"), ts)
        if self.prevent_wraparound:
            field = _WRAP_FIELD[self.unit]
            out_ts = F.when(field(out_ts) != field(ts), ts).otherwise(out_ts)
        return F.date_format(out_ts, self.spark_format)


def with_datetime_offset(
    max_delta: int,
    unit: str,
    dt_format: str,
    prevent_wraparound: bool = False,
) -> Mutator:
    """Offset datetimes by a uniform nonzero signed delta in ±1..±max_delta
    units; optionally revert offsets that change the next-coarser field
    (gecko/mutator.py:1213-1297)."""
    return _DatetimeOffset(max_delta, unit, dt_format, prevent_wraparound)


# ---------------------------------------------------------------------------
# Permute (multi-column)
# ---------------------------------------------------------------------------


def _derangements(k: int) -> list[tuple[int, ...]]:
    """All permutations of range(k) with no fixed point
    (gecko/mutator.py:1074-1079; k is small — spec columns)."""
    import itertools

    return [
        perm
        for perm in itertools.permutations(range(k))
        if all(perm[i] != i for i in range(k))
    ]


class _Permute(Mutator):
    name = "with_permute"
    group_arity = True

    def _validate_group(self, n_columns: int) -> None:
        if n_columns < 2:
            raise ValueError("permute mutator requires at least two columns")

    def _transform_group(self, cols, rand, selected):
        ders = _derangements(len(cols))
        d = rand.uniform_int(1, len(ders))
        out = []
        for i in range(len(cols)):
            expr = cols[i]
            for j, perm in enumerate(ders):
                expr = F.when(selected & (d == F.lit(j)), cols[perm[i]]).otherwise(expr)
            out.append(expr)
        return out


def with_permute() -> Mutator:
    """Swap values between columns per selected row using a uniformly
    chosen derangement (no value stays in place —
    gecko/mutator.py:1059-1122). Pure Column ops, no shuffle."""
    return _Permute()


# ---------------------------------------------------------------------------
# Generator splice (multi-column)
# ---------------------------------------------------------------------------


class _WithGenerator(Mutator):
    name = "with_generator"
    group_arity = True

    def __init__(self, generator: ColumnGenerator, mode: str, join_with: str):
        if mode not in ("prepend", "append", "replace"):
            raise ValueError(f"invalid mode: `{mode}`")
        self.generator = generator
        self.mode = mode
        # `{}` marks where generated values go (gecko/mutator.py:1324-1337)
        parts = join_with.split("{}", maxsplit=1)
        if len(parts) == 1:
            if mode == "prepend":
                self.before, self.after = "", parts[0]
            else:
                self.before, self.after = parts[0], ""
        else:
            self.before, self.after = parts[0], parts[1]

    def _validate_group(self, n_columns: int) -> None:
        if self.generator.arity != n_columns:
            raise ValueError(
                f"generator must generate as many series as provided to the mutator: "
                f"got {self.generator.arity}, expected {n_columns}"
            )

    def _transform_group(self, cols, rand, selected):
        gen_cols = self.generator.columns(rand.fork(7))
        out = []
        for col, gen in zip(cols, gen_cols):
            piece = F.concat(F.lit(self.before), gen, F.lit(self.after))
            if self.mode == "replace":
                mutated = gen
            elif self.mode == "prepend":
                mutated = F.concat(piece, col)
            else:
                mutated = F.concat(col, piece)
            out.append(F.when(selected, mutated).otherwise(col))
        return out


def with_generator(
    generator: ColumnGenerator,
    mode: str,
    join_with: str = " ",
) -> Mutator:
    """Prepend/append/replace selected rows with generator output
    (gecko/mutator.py:1300-1389). Expression-style generators make this
    a pure projection — no joins, unlike the reference's
    reindex-alignment."""
    return _WithGenerator(generator, mode, join_with)


# ---------------------------------------------------------------------------
# Weighted group multiplexer (multi-column)
# ---------------------------------------------------------------------------


class _Group(Mutator):
    name = "with_group"
    group_arity = True

    def __init__(self, weighted: list[tuple[float, Mutator]]):
        p_sum = sum(w for w, _ in weighted)
        if p_sum > 1:
            raise ValueError(f"sum of weights must not be higher than 1, is {p_sum}")
        if p_sum <= 0:
            raise ValueError(f"sum of weights must be higher than 0, is {p_sum}")
        for i, (w, _) in enumerate(weighted):
            if w <= 0:
                raise ValueError(
                    f"weight of mutator at index {i} must be higher than zero, is {w}"
                )
        if p_sum != 1:
            weighted = weighted + [(1 - p_sum, with_noop())]
        self.weighted = weighted

    def _transform_group(self, cols, rand, selected):
        # per-row mutator index ~ weights (gecko/mutator.py:1700-1703)
        u = rand.uniform(1)
        cum = 0.0
        idx = F.lit(len(self.weighted) - 1)
        conds = []
        for j, (w, _) in enumerate(self.weighted[:-1]):
            cum += w
            conds.append((u < F.lit(cum), j))
        for cond, j in reversed(conds):
            idx = F.when(cond, F.lit(j)).otherwise(idx)

        outs = list(cols)
        for j, (_, mut) in enumerate(self.weighted):
            if isinstance(mut, _Noop):
                continue
            rj = rand.fork(j + 2)
            sel_j = selected & (idx == F.lit(j))
            if mut.group_arity:
                elig = mut._eligible_group(outs, rj)
                sel = sel_j if elig is None else (sel_j & elig)
                outs = mut._transform_group(outs, rj, sel)
            else:
                new_outs = []
                for k, col in enumerate(outs):
                    rk = rj.fork(k)
                    elig = mut._eligible(col, rk)
                    sel = sel_j if elig is None else (sel_j & elig)
                    new_outs.append(mut._transform(col, rk, sel))
                outs = new_outs
        return outs


def with_group(
    mutator_lst: Union[list[Mutator], list[tuple[float, Mutator]]],
) -> Mutator:
    """Mutually-exclusive multiplexer: each selected row draws ONE
    sub-mutator from the weight distribution; weights must sum to ≤ 1,
    shortfall padded with a no-op (gecko/mutator.py:1641-1717).

    All sub-mutators condition on the same drawn index column, so the
    whole group stays a single projection — no shuffle, no union.
    """
    if all(isinstance(m, Mutator) for m in mutator_lst):
        w = 1.0 / len(mutator_lst)
        weighted = [(w, m) for m in mutator_lst]
    else:
        weighted = list(mutator_lst)  # type: ignore[arg-type]
        for item in weighted:
            if not (
                isinstance(item, tuple)
                and len(item) == 2
                and isinstance(item[0], (int, float))
                and isinstance(item[1], Mutator)
            ):
                raise ValueError(
                    "invalid argument, must be a list of mutators or weighted mutators"
                )
    return _Group(weighted)


# ---------------------------------------------------------------------------
# UDF escape hatch
# ---------------------------------------------------------------------------


class _WithFunction(Mutator):
    name = "with_function"

    def __init__(self, func: Callable[..., str], args: tuple, kwargs: dict):
        self.func, self.args, self.kwargs = func, args, kwargs

    def _transform(self, col, rand, selected):
        func, args, kwargs = self.func, self.args, self.kwargs

        @F.pandas_udf(T.StringType())
        def _apply(vals: pd.Series, sel: pd.Series) -> pd.Series:
            out = vals.copy()
            mask = sel.fillna(False).to_numpy(dtype=bool)
            # a None return stays null — str() would turn it into the
            # literal string "None"
            out[mask] = [
                None if r is None else str(r)
                for r in (func(v, *args, **kwargs) for v in vals[mask])
            ]
            return out

        return _apply(col, selected)


def with_function(func: Callable[..., str], *args, **kwargs) -> Mutator:
    """Arbitrary scalar ``func(value) -> str`` on selected rows — the
    non-vectorized escape hatch (gecko/mutator.py:76-117). Selected
    null rows reach ``func`` as ``None`` (the reference passes NaN);
    handling them is the function's contract."""
    return _WithFunction(func, args, kwargs)


# ---------------------------------------------------------------------------
# Table-driven mutators (Arrow kernels)
# ---------------------------------------------------------------------------


def _expand_u(u: np.ndarray, salt: int) -> np.ndarray:
    """Derive a fresh uniform array from a base uniform array — a
    deterministic per-row LCG step so kernels needing many draws per row
    stay pure functions of their inputs."""
    m = (u * 2147483648.0).astype(np.int64)
    m = (m * 1103515245 + 12345 + salt * 104729) % 2147483648
    return m.astype(np.float64) / 2147483648.0


class _CldrKeymap(Mutator):
    name = "with_cldr_keymap_file"

    def __init__(self, candidates: dict[str, str]):
        if not candidates:
            raise ValueError("keymap produced no typo candidates")
        self.candidates = candidates
        # rows are eligible iff they contain at least one mapped char —
        # checked JVM-side with a regex char class so the Arrow kernel
        # only sees a cheap mask re-check
        cls = "".join(re.escape(c) for c in sorted(candidates))
        self._eligible_re = f"[{cls}]"

    def _eligible(self, col, rand):
        return col.rlike(self._eligible_re)

    def _transform(self, col, rand, selected):
        candidates = self.candidates

        @F.pandas_udf(T.StringType())
        def _typo(vals: pd.Series, sel: pd.Series, u1: pd.Series, u2: pd.Series) -> pd.Series:
            out = vals.copy()
            mask = sel.fillna(False).to_numpy(dtype=bool)
            if not mask.any():
                return out
            a1 = u1.to_numpy(np.float64)
            a2 = u2.to_numpy(np.float64)
            for i in np.flatnonzero(mask):
                val = vals.iat[i]
                if val is None:
                    continue
                # candidate chars present in the value, in sorted-map order
                # (gecko/mutator.py:236-242 accumulates per map key)
                pool = [c for c in candidates if c in val]
                if not pool:
                    continue
                src = pool[int(a1[i] * len(pool))]
                repl_opts = candidates[src]
                repl = repl_opts[int(a2[i] * len(repl_opts))]
                out.iat[i] = val.replace(src, repl, 1)
            return out

        return _typo(col, selected, rand.uniform(1), rand.uniform(2))


def with_cldr_keymap_file(
    cldr_path,
    charset: Union[str, Sequence[str], None] = None,
) -> Mutator:
    """Keyboard typos from a CLDR keymap: replace the first occurrence of
    a random mapped char with one of its keyboard neighbors
    (gecko/mutator.py:120-306). XML parsed once on the driver; the
    candidate map is captured by the Arrow kernel."""
    return _CldrKeymap(load_cldr_candidates(cldr_path, charset))


class _ReplacementTable(Mutator):
    name = "with_replacement_table"

    def __init__(
        self,
        table: pd.DataFrame,
        inline: bool,
        order: str = "global",
        rule_frequencies: Optional[dict] = None,
    ):
        if table.empty:
            raise ValueError("replacement table is empty")
        if order not in ("global", "batch"):
            raise ValueError("order must be 'global' or 'batch'")
        self.inline = inline
        self.order = order
        # source -> list of targets, preserving table order
        self.targets: dict[str, list[str]] = {}
        for src, tgt in zip(table["source"], table["target"]):
            self.targets.setdefault(src, []).append(tgt)
        self.sources = list(self.targets)
        if rule_frequencies is not None:
            unknown = set(rule_frequencies) - set(self.sources)
            if unknown:
                raise ValueError(
                    f"rule_frequencies keys not in the table's sources: {sorted(unknown)}"
                )
        self.rule_frequencies = rule_frequencies

    def measure_rule_frequencies(self, df: DataFrame, column: str) -> dict:
        """Measure per-source match counts over a static frame (one
        aggregation job) — the same counts the global-order pre-pass
        derives internally. Feed the result back via the
        ``rule_frequencies`` parameter to (a) skip the pre-pass job on
        repeated batch applications or (b) give a STREAM the reference's
        dataset-global favor-rare rule order, which a stream cannot
        measure itself (a static aggregate over an unbounded input is
        undefined — the stream otherwise falls back to batch-local
        ordering)."""
        col = F.col(column) if isinstance(column, str) else column
        aggs = [
            F.sum(F.when(col.contains(src), 1).otherwise(0)).alias(str(i))
            for i, src in enumerate(self.sources)
        ]
        row = df.select(*aggs).first()
        return {src: int(row[str(i)] or 0) for i, src in enumerate(self.sources)}

    def _global_order_from(self, freqs: dict) -> list[str]:
        pairs = sorted((int(freqs.get(src, 0)), src) for src in self.sources)
        return [src for f, src in pairs if f > 0]

    def _eligible(self, col, rand):
        if self.inline:
            alts = "|".join(re.escape(s) for s in self.sources)
            return col.rlike(f"(?:{alts})")
        return col.isin(self.sources)

    def _transform(self, col, rand, selected):
        if not self.inline:
            # whole-value mode is pure Column algebra: a broadcast map
            # lookup plus a uniform pick among the source's targets
            # (gecko/mutator.py:595-599 equality match)
            map_args = []
            for src, tgts in self.targets.items():
                map_args.append(F.lit(src))
                map_args.append(F.array(*[F.lit(t) for t in tgts]))
            m = F.create_map(*map_args)
            tgt_arr = F.element_at(m, col)
            pick = rand.uniform_int(1, F.size(tgt_arr))
            mutated = F.element_at(tgt_arr, (pick + F.lit(1)).cast("int"))
            return F.when(selected & tgt_arr.isNotNull(), mutated).otherwise(col)

        return self._inline_kernel(col, rand, selected, order=None)

    def _transform_with_frame(self, df, col, rand, selected):
        if not self.inline or self.order != "global":
            return self._transform(col, rand, selected)
        if self.rule_frequencies is not None:
            # caller supplied the dataset-global counts (typically from
            # measure_rule_frequencies over historical data) — no
            # pre-pass job, and the one path that gives a STREAM the
            # reference's global favor-rare order
            return self._inline_kernel(
                col, rand, selected, order=self._global_order_from(self.rule_frequencies)
            )
        if df.isStreaming:
            # a static aggregate over an unbounded stream is undefined;
            # streams keep the reference-faithful-but-batch-local order
            # unless rule_frequencies is supplied (see
            # measure_rule_frequencies / MIGRATION.md "Streaming")
            return self._transform(col, rand, selected)
        # ONE aggregation job measures global per-source match counts
        # over ALL rows — exactly the reference's bitmask counts
        # (gecko/mutator.py:592-599 marks every matching row before
        # the :618-624 frequency sort; SURVEY §3.3 steps 1+3). Not
        # filtering by the selection column keeps the pre-pass free of
        # per-row hash draws, and makes the output independent of
        # batch boundaries — which is what lets the driver's DuckDB
        # oracle replay it exactly.
        return self._inline_kernel(
            col,
            rand,
            selected,
            order=self._global_order_from(self.measure_rule_frequencies(df, col)),
        )

    def _inline_kernel(self, col, rand, selected, order: Optional[list[str]]):
        """Arrow kernel for inline (substring) replacement. ``order`` is
        the global ascending-frequency source order; None falls back to
        batch-local ordering (``order="batch"`` — one pass, no pre-job,
        but output depends on batch boundaries for rows matching
        several sources)."""
        targets = self.targets

        @F.pandas_udf(T.StringType())
        def _replace(vals: pd.Series, sel: pd.Series, u: pd.Series) -> pd.Series:
            out = vals.copy()
            mask = sel.fillna(False).to_numpy(dtype=bool)
            if not mask.any():
                return out
            filled = vals.fillna("")
            if order is None:
                # batch-local match frequencies, ascending — the
                # reference's favor-rare ordering at batch granularity
                freqs = []
                for src in targets:
                    m = filled.str.contains(src, regex=False).to_numpy(bool) & mask
                    if m.any():
                        freqs.append((int(m.sum()), src))
                freqs.sort()
                src_order = [src for _, src in freqs]
            else:
                src_order = order
            au = u.to_numpy(np.float64)
            mutated = np.zeros(len(filled), dtype=bool)
            for src in src_order:
                rows = (
                    filled.str.contains(src, regex=False).to_numpy(bool)
                    & mask
                    & ~mutated
                )
                if not rows.any():
                    continue
                tgts = targets[src]
                tgt_idx = (au * len(tgts)).astype(np.int64)
                for j in range(len(tgts)):
                    rows_j = rows & (tgt_idx == j)
                    if rows_j.any():
                        out[rows_j] = filled[rows_j].str.replace(
                            src, tgts[j], n=1, regex=False
                        )
                mutated |= rows
            return out

        return _replace(col, selected, rand.uniform(1))


def with_replacement_table(
    data_source: TableSource,
    source_column: Union[str, int] = 0,
    target_column: Union[str, int] = 1,
    inline: bool = False,
    reverse: bool = False,
    encoding: str = "utf-8",
    delimiter: str = ",",
    order: str = "global",
    rule_frequencies: Optional[dict] = None,
) -> Mutator:
    """Generic replacement table, whole-value or substring (inline)
    matching, optional bidirectional union (gecko/mutator.py:510-655).

    Whole-value mode never leaves the JVM (broadcast map literal +
    seeded pick). Inline mode reproduces the reference's
    ascending-match-frequency first-occurrence semantics
    (gecko/mutator.py:618-647): ``order="global"`` (default) measures
    source frequencies with one aggregation job so rule precedence is
    dataset-wide, deterministic under any partitioning, and exactly
    oracle-checkable; ``order="batch"`` skips the pre-job and orders
    within each Arrow batch. ``rule_frequencies`` (a ``{source: count}``
    mapping, typically from ``Mutator.measure_rule_frequencies`` over
    historical data) supplies those counts up front — skipping the
    pre-pass job, and giving a STREAMING frame the same dataset-global
    rule order as batch (without it, streams fall back to batch-local
    ordering)."""
    table = load_replacement_table(
        data_source, source_column, target_column, reverse=reverse,
        delimiter=delimiter, encoding=encoding,
    )
    return _ReplacementTable(table, inline, order, rule_frequencies)


class _PhoneticReplacement(Mutator):
    name = "with_phonetic_replacement_table"

    def __init__(
        self,
        rules: list[tuple[str, str, str]],
        rule_frequencies: Optional[Sequence[int]] = None,
    ):
        if not rules:
            raise ValueError("must provide at least one phonetic replacement rule")
        self.rules = rules
        if rule_frequencies is not None:
            rule_frequencies = [int(c) for c in rule_frequencies]
            if len(rule_frequencies) != len(rules):
                raise ValueError(
                    f"rule_frequencies must align with the {len(rules)} table rules "
                    f"(got {len(rule_frequencies)} counts)"
                )
        self.rule_frequencies = rule_frequencies

    def measure_rule_frequencies(self, df: DataFrame, column) -> list[int]:
        """Per-rule match counts over a static frame (one aggregation
        job), aligned with the table's rule order. Feed back via
        ``rule_frequencies`` to skip the batch pre-pass or to give a
        stream the dataset-global descending-frequency rule order (see
        MIGRATION.md \"Streaming\")."""
        col = F.col(column) if isinstance(column, str) else column
        aggs = [
            F.sum(
                F.when(self._rule_match_cond(col, r), 1).otherwise(0)
            ).alias(str(i))
            for i, r in enumerate(self.rules)
        ]
        row = df.select(*aggs).first()
        return [int(row[str(i)] or 0) for i in range(len(self.rules))]

    def _global_order_from(self, counts: Sequence[int]) -> list[int]:
        return sorted(
            (r for r in range(len(self.rules)) if counts[r] > 0),
            key=lambda r: (-counts[r], r),
        )

    def _eligible(self, col, rand):
        conds = None
        for rule in self.rules:
            c = self._rule_match_cond(col, rule)
            conds = c if conds is None else (conds | c)
        return conds

    def _rule_match_cond(self, col, rule) -> Column:
        """JVM-side exact replica of the kernel's per-rule match mask —
        literal string predicates, not regexes (a regex per rule per
        row made the global-order pre-pass the most expensive stage of
        the whole mutator at 1M rows)."""
        pattern, _, flag = rule
        if flag == "^":
            return col.startswith(pattern)
        if flag == "$":
            return col.endswith(pattern)
        # middle: contained in value[1:-1] (gecko/mutator.py:422)
        return col.substr(
            F.lit(2), F.greatest(F.length(col) - F.lit(2), F.lit(0))
        ).contains(pattern)

    def _transform_with_frame(self, df, col, rand, selected):
        if self.rule_frequencies is not None:
            # caller-supplied dataset-global counts: no pre-pass job,
            # and the one path that gives a STREAM the reference's
            # global descending-frequency rule order
            return self._kernel(
                col, rand, selected, self._global_order_from(self.rule_frequencies)
            )
        if df.isStreaming:
            # batch-local rule order (a static aggregate over an
            # unbounded stream is undefined) — supply rule_frequencies
            # for global-order parity (MIGRATION.md "Streaming")
            return self._transform(col, rand, selected)
        if len(self.rules) == 1:
            return self._kernel(col, rand, selected, [0])
        # ONE aggregation job: global per-rule match counts over ALL
        # rows (the reference's bitmask counts, gecko/mutator.py:
        # 411-424 + 443-449). The descending-frequency rule order (and
        # with it each row's accept/skip draw sequence) becomes a
        # property of the dataset, not of Arrow batch boundaries.
        counts = self.measure_rule_frequencies(df, col)
        return self._kernel(col, rand, selected, self._global_order_from(counts))

    def _transform(self, col, rand, selected):
        return self._kernel(col, rand, selected, None)

    def _kernel(self, col, rand, selected, global_order):
        rules = self.rules

        @F.pandas_udf(T.StringType())
        def _phonetic(vals: pd.Series, sel: pd.Series, u: pd.Series) -> pd.Series:
            mask = sel.fillna(False).to_numpy(dtype=bool)
            if not mask.any():
                return vals.copy()
            out_np = vals.to_numpy(dtype=object).copy()
            n = len(vals)

            # FACTORIZE the batch (round 15, guide §4): match masks and
            # replacement strings are pure functions of the VALUE, and
            # mutator columns are typically low-cardinality (generated
            # categories, names, dates), so the per-rule .str kernels
            # and regex replaces run over the batch's distinct values
            # and fan back out through one integer gather — measured
            # ~10× on the masks at 10 distinct values, and a no-op-cost
            # hash pass when every value is distinct. Row-level
            # accept/skip draws below are untouched, so outputs are
            # bit-identical.
            codes, uniques = pd.factorize(vals.fillna(""))
            uniq_np = np.asarray(uniques, dtype=object)
            su = pd.Series(uniq_np)

            # per-rule match masks over the DISTINCT values
            # (gecko/mutator.py:411-424)
            matchu = np.zeros((len(rules), len(su)), dtype=bool)
            for r, (pattern, _, flag) in enumerate(rules):
                if flag == "^":
                    matchu[r] = su.str.startswith(pattern).to_numpy(bool)
                elif flag == "$":
                    matchu[r] = su.str.endswith(pattern).to_numpy(bool)
                else:
                    matchu[r] = (
                        su.str.slice(1, -1).str.contains(pattern, regex=False)
                        .to_numpy(bool)
                    )
            match = matchu[:, codes]

            options = match.sum(axis=0).astype(np.float64)
            # rule order: descending frequency; rows keep an
            # inverse-options acceptance chance with decrementing
            # counters so rare rules win (gecko/mutator.py:443-478).
            # A global order (from the pre-pass) keeps every row's
            # draw sequence batch-invariant; the batch-local fallback
            # serves streams.
            if global_order is not None:
                freq_order = global_order
            else:
                freq_order = sorted(
                    (r for r in range(len(rules)) if match[r].any()),
                    key=lambda r: -int(match[r].sum()),
                )
            au = u.to_numpy(np.float64)
            done = np.zeros(n, dtype=bool)
            for step, r in enumerate(freq_order):
                pattern, replacement, flag = rules[r]
                au = _expand_u(au, step + 1)
                with np.errstate(divide="ignore"):
                    prob = np.where(options > 0, 1.0 / np.maximum(options, 1.0), 0.0)
                rows = mask & ~done & match[r] & (au < prob)
                options[match[r] & ~rows] -= 1
                if not rows.any():
                    continue
                # replacement per DISTINCT matching value, fanned out
                # through the factorize codes — same regexes, same
                # values, far fewer evaluations
                subu = su[matchu[r]]
                if flag == "^":
                    newu = subu.str.replace(
                        f"^{re.escape(pattern)}", replacement, n=1, regex=True
                    )
                elif flag == "$":
                    newu = subu.str.replace(
                        f"{re.escape(pattern)}$", replacement, n=1, regex=True
                    )
                else:
                    newu = subu.str.replace(
                        f"^(.+)(?:{re.escape(pattern)})(.+)$",
                        rf"\g<1>{replacement}\g<2>",
                        n=1,
                        regex=True,
                    )
                repl_u = uniq_np.copy()
                repl_u[matchu[r]] = newu.to_numpy(dtype=object)
                new = repl_u[codes[rows]]
                changed = new != uniq_np[codes[rows]]
                idx = np.flatnonzero(rows)[changed]
                out_np[idx] = new[changed]
                done[idx] = True
            return pd.Series(out_np, index=vals.index)

        return _phonetic(col, selected, rand.uniform(1))


def with_phonetic_replacement_table(
    data_source: TableSource,
    source_column: Union[str, int] = 0,
    target_column: Union[str, int] = 1,
    flags_column: Union[str, int] = 2,
    encoding: str = "utf-8",
    delimiter: str = ",",
    rule_frequencies: Optional[Sequence[int]] = None,
) -> Mutator:
    """Phonetic errors from a (source, target, flags) table; flags ^/_/$
    restrict match position (gecko/mutator.py:314-507). One Arrow kernel
    reproduces the descending-frequency inverse-option rule assignment
    per batch. ``rule_frequencies`` (per-rule match counts aligned with
    the table rows, typically from ``measure_rule_frequencies`` over
    historical data) supplies the global rule order up front — skipping
    the batch pre-pass job and giving STREAMS batch-identical global
    ordering."""
    rules = load_phonetic_table(
        data_source, source_column, target_column, flags_column,
        delimiter=delimiter, encoding=encoding,
    )
    return _PhoneticReplacement(rules, rule_frequencies)


class _RegexReplacement(Mutator):
    name = "with_regex_replacement_table"

    def __init__(
        self,
        rules: list[tuple[re.Pattern, dict[str, str]]],
        rule_frequencies: Optional[Sequence[int]] = None,
    ):
        if not rules:
            raise ValueError("must provide at least one regex replacement rule")
        self.rules = rules
        if rule_frequencies is not None:
            rule_frequencies = [int(c) for c in rule_frequencies]
            if len(rule_frequencies) != len(rules):
                raise ValueError(
                    f"rule_frequencies must align with the {len(rules)} table rules "
                    f"(got {len(rule_frequencies)} counts)"
                )
        self.rule_frequencies = rule_frequencies

    def measure_rule_frequencies(self, df: DataFrame, column) -> list[int]:
        """Per-rule match counts over a static frame, aligned with the
        table's rule order. Python regex semantics differ from Java's,
        so the count pass is an Arrow kernel (one scan). Feed back via
        ``rule_frequencies`` to skip this pre-pass or to give a stream
        the dataset-global rule order (MIGRATION.md \"Streaming\")."""
        col = F.col(column) if isinstance(column, str) else column
        rules = self.rules

        if len(rules) <= 62:
            # pack per-rule flags into ONE long per row (round 15): the
            # old per-row list-of-longs built len(rules) boxed ints per
            # row before Arrow even saw them; the bitmask is a single
            # int64 column, and the searches run once per DISTINCT
            # value (same factorize rationale as the kernel).
            @F.pandas_udf(T.LongType())
            def _match_bits(vals: pd.Series) -> pd.Series:
                codes, uniques = pd.factorize(vals.fillna(""))
                uniq_np = np.asarray(uniques, dtype=object)
                bits_u = np.zeros(len(uniq_np), dtype=np.int64)
                for r, (p, _) in enumerate(rules):
                    m = np.array(
                        [p.search(v) is not None for v in uniq_np], dtype=bool
                    )
                    bits_u |= m.astype(np.int64) << r
                return pd.Series(bits_u[codes])

            bits = df.select(_match_bits(col).alias("c"))
            row = bits.groupBy().agg(
                *[
                    F.sum(F.shiftright("c", i).bitwiseAND(F.lit(1))).alias(str(i))
                    for i in range(len(rules))
                ]
            ).first()
            return [int(row[str(i)] or 0) for i in range(len(rules))]

        @F.pandas_udf(T.ArrayType(T.LongType()))
        def _match_flags(vals: pd.Series) -> pd.Series:
            vals_np = vals.fillna("").to_numpy(dtype=object)
            out = [
                [1 if p.search(v) is not None else 0 for p, _ in rules]
                for v in vals_np
            ]
            return pd.Series(out)

        row = (
            df.select(_match_flags(col).alias("c"))
            .select(
                *[F.element_at("c", i + 1).alias(str(i)) for i in range(len(rules))]
            )
            .groupBy()
            .agg(*[F.sum(str(i)).alias(str(i)) for i in range(len(rules))])
            .first()
        )
        return [int(row[str(i)] or 0) for i in range(len(rules))]

    def _global_order_from(self, counts: Sequence[int]) -> list[int]:
        return sorted(
            (r for r in range(len(self.rules)) if counts[r] > 0),
            key=lambda r: (-counts[r], r),
        )

    def _transform_with_frame(self, df, col, rand, selected):
        if self.rule_frequencies is not None:
            return self._kernel(
                col, rand, selected, self._global_order_from(self.rule_frequencies)
            )
        if df.isStreaming or len(self.rules) == 1:
            # one rule: order is trivially global already; streams fall
            # back to batch-local order unless rule_frequencies is
            # supplied (MIGRATION.md "Streaming")
            return self._kernel(col, rand, selected, None if len(self.rules) > 1 else [0])
        # Global per-rule match counts over ALL rows (the reference's
        # bitmask counts) — one extra Arrow-kernel scan, the price of
        # the reference's two-phase favor-rare design (SURVEY §3.3).
        counts = self.measure_rule_frequencies(df, col)
        return self._kernel(col, rand, selected, self._global_order_from(counts))

    def _transform(self, col, rand, selected):
        return self._kernel(col, rand, selected, None)

    def _kernel(self, col, rand, selected, global_order):
        rules = self.rules

        def _apply_rule(value: str, pattern: re.Pattern, subs: dict[str, str]) -> str:
            m = pattern.search(value)
            if m is None:
                return value
            # splice group substitutions at their spans, preserving
            # non-group text; substitution text may cross-reference
            # other groups via (?P<name>) markers
            # (gecko/mutator.py:1392-1429)
            group_order: list[tuple[int, int, str]] = []
            labels = list(subs.keys())
            named = {v: k for k, v in (pattern.groupindex or {}).items()}
            for gi in range(1, (pattern.groups or 0) + 1):
                label = named.get(gi, str(gi))
                if label in subs and m.group(gi) is not None:
                    group_order.append((m.start(gi), m.end(gi), label))
            group_order.sort()
            out, cursor = [], m.start()
            prefix = value[: m.start()]
            for start, end, label in group_order:
                out.append(value[cursor:start])
                sub = subs[label]
                # resolve cross-references like (?P<other>)
                def _xref(xm: re.Match) -> str:
                    name = xm.group(1)
                    try:
                        return m.group(name) or ""
                    except (IndexError, re.error):
                        return ""
                sub = re.sub(r"\(\?P<([A-Za-z_][A-Za-z0-9_]*)>\)", _xref, sub)
                out.append(sub)
                cursor = end
            out.append(value[cursor : m.end()])
            suffix = value[m.end() :]
            return prefix + "".join(out) + suffix

        @F.pandas_udf(T.StringType())
        def _regex(vals: pd.Series, sel: pd.Series, u: pd.Series) -> pd.Series:
            mask = sel.fillna(False).to_numpy(dtype=bool)
            if not mask.any():
                return vals.copy()
            out_np = vals.to_numpy(dtype=object).copy()
            # FACTORIZE the batch (round 15, guide §4): pattern.search
            # and _apply_rule are pure functions of the VALUE — running
            # them once per distinct value and fanning out through the
            # codes gather turns the per-row Python regex loop into a
            # per-distinct one (dates/categories repeat massively; an
            # all-distinct batch pays only one extra hash pass). The
            # per-row accept/skip draws are untouched → bit-identical.
            codes, uniques = pd.factorize(vals.fillna(""))
            uniq_np = np.asarray(uniques, dtype=object)
            n = len(vals)
            matchu = np.zeros((len(rules), len(uniq_np)), dtype=bool)
            for r, (pattern, _) in enumerate(rules):
                matchu[r] = np.array(
                    [pattern.search(v) is not None for v in uniq_np]
                )
            match = matchu[:, codes]
            options = match.sum(axis=0).astype(np.float64)
            if global_order is not None:
                freq_order = global_order
            else:
                freq_order = sorted(
                    (r for r in range(len(rules)) if match[r].any()),
                    key=lambda r: -int(match[r].sum()),
                )
            au = u.to_numpy(np.float64)
            done = np.zeros(n, dtype=bool)
            for step, r in enumerate(freq_order):
                pattern, subs = rules[r]
                au = _expand_u(au, step + 1)
                prob = np.where(options > 0, 1.0 / np.maximum(options, 1.0), 0.0)
                rows = mask & ~done & match[r] & (au < prob)
                options[match[r] & ~rows] -= 1
                if not rows.any():
                    continue
                sel_codes = codes[rows]
                new_u = {
                    int(c): _apply_rule(uniq_np[c], pattern, subs)
                    for c in np.unique(sel_codes)
                }
                new = np.array([new_u[c] for c in sel_codes], dtype=object)
                changed = new != uniq_np[sel_codes]
                idx = np.flatnonzero(rows)[changed]
                out_np[idx] = new[changed]
                done[idx] = True
            return pd.Series(out_np, index=vals.index)

        return _regex(col, selected, rand.uniform(1))


def with_regex_replacement_table(
    data_source: TableSource,
    pattern_column: str = "pattern",
    flags_column: Optional[str] = None,
    encoding: str = "utf-8",
    delimiter: str = ",",
    rule_frequencies: Optional[Sequence[int]] = None,
) -> Mutator:
    """Regex substitutions from a table: pattern column + one column per
    capture group supplying replacement text, with cross-group
    references (gecko/mutator.py:1444-1590). Spark's regexp_replace
    cannot express table-driven group splicing, so this ships the
    replacement logic in one Arrow kernel. ``rule_frequencies``
    (per-rule match counts aligned with table rows, from
    ``measure_rule_frequencies`` over historical data) skips the count
    pre-pass and gives STREAMS the dataset-global rule order."""
    rules = load_regex_table(
        data_source, pattern_column, flags_column, delimiter=delimiter, encoding=encoding
    )
    return _RegexReplacement(rules, rule_frequencies)
