"""Generators: lazy column factories over a ``spark.range`` seed frame.

Reference parity: gecko/generator.py (G1–G8 in SURVEY.md §2.1). The
reference's ``Generator`` is ``Callable[[int], list[pd.Series]]``; here
a generator is an object that, given a :class:`~gecko_spark.core.
RandomSource`, yields *column expressions* to attach to a seed frame —
so an arbitrary number of generators assemble into ONE projection over
``spark.range(count)`` with no joins and no shuffles
(:func:`gecko_spark.plans.pipeline.to_data_frame`).

Randomness is derived per (row, operator, draw) — see core.py — so the
same seed reproduces the same dataset under any partitioning.

Scale notes (100 TB north star):
* frequency-table sampling is inverse-CDF over the integer cumulative
  frequency array; small tables (k ≤ ``jvm_max_table``) run fully
  JVM-side inside codegen via a filter-count over an array literal,
  larger tables use one Arrow ``pandas_udf`` with ``np.searchsorted``
  (O(log k) per row) over a broadcast array;
* ``from_group(exact=True)`` achieves gecko's exact per-group counts
  WITHOUT the reference's global shuffle (gecko/generator.py:415-419):
  rows are assigned to groups by index ranges under an affine bijection
  ``idx' = (idx·A + B) mod count`` (A coprime to count), which is a
  deterministic pseudo-random permutation computed per row in O(1).
"""

from __future__ import annotations

import math
from dataclasses import dataclass
from typing import Callable, Optional, Sequence, Union

import numpy as np
import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql import types as T

from gecko_spark.core import RandomSource
from gecko_spark.functions.datetime_patterns import strftime_to_spark
from gecko_spark.sources.tables import TableSource, load_frequency_table

__all__ = [
    "ColumnGenerator",
    "GenContext",
    "from_function",
    "from_uniform_distribution",
    "from_normal_distribution",
    "from_frequency_table",
    "from_multicolumn_frequency_table",
    "from_datetime_range",
    "from_group",
]


@dataclass
class GenContext:
    """Ambient info a generator may need: the seed frame's row-index
    column (values in [0, count)) and the total row count."""

    idx: Column
    count: int


class ColumnGenerator:
    """Base class: a factory of ``arity`` column expressions."""

    arity: int = 1

    def columns(self, rand: RandomSource, ctx: Optional[GenContext] = None) -> list[Column]:
        raise NotImplementedError


# ---------------------------------------------------------------------------
# G1: from_function — arbitrary scalar function (slow path, parity only)
# ---------------------------------------------------------------------------


class _FunctionGenerator(ColumnGenerator):
    def __init__(self, func: Callable[..., str], args: tuple, kwargs: dict):
        self.func, self.args, self.kwargs = func, args, kwargs

    def columns(self, rand: RandomSource, ctx: Optional[GenContext] = None) -> list[Column]:
        func, args, kwargs = self.func, self.args, self.kwargs

        @F.pandas_udf(T.StringType())
        def _gen(u: pd.Series) -> pd.Series:
            return pd.Series([str(func(*args, **kwargs)) for _ in range(len(u))], index=u.index)

        return [_gen(rand.uniform(0))]


def from_function(func: Callable[..., str], *args, **kwargs) -> ColumnGenerator:
    """Wrap an arbitrary ``func() -> str``; called once per row.

    Explicitly the non-vectorized escape hatch, same caveat as the
    reference (gecko/generator.py:29-49): for testing, not throughput.
    """
    return _FunctionGenerator(func, args, kwargs)


# ---------------------------------------------------------------------------
# G2/G3: numeric distributions
# ---------------------------------------------------------------------------


class _UniformGenerator(ColumnGenerator):
    def __init__(self, low: float, high: float, precision: int, raw: bool):
        self.low, self.high, self.precision, self.raw = low, high, precision, raw

    def raw_column(self, rand: RandomSource) -> Column:
        return rand.uniform(0) * F.lit(float(self.high - self.low)) + F.lit(float(self.low))

    def columns(self, rand: RandomSource, ctx: Optional[GenContext] = None) -> list[Column]:
        val = self.raw_column(rand)
        if self.raw:
            return [val]
        return [F.format_string(f"%.{self.precision}f", val)]


def from_uniform_distribution(
    low: float = 0.0,
    high: float = 1.0,
    precision: int = 6,
    raw: bool = False,
) -> ColumnGenerator:
    """Floats ~ U[low, high) formatted to ``precision`` decimals
    (gecko/generator.py:52-78). ``raw=True`` skips formatting and
    yields a DoubleType column (engine extension)."""
    return _UniformGenerator(low, high, precision, raw)


class _NormalGenerator(ColumnGenerator):
    def __init__(self, mean: float, sd: float, precision: int, raw: bool):
        self.mean, self.sd, self.precision, self.raw = mean, sd, precision, raw

    def raw_column(self, rand: RandomSource) -> Column:
        # Box-Muller from two independent uniforms; 1-u1 keeps log's
        # argument in (0, 1].
        u1, u2 = rand.uniform(0), rand.uniform(1)
        z = F.sqrt(F.log(F.lit(1.0) - u1) * F.lit(-2.0)) * F.cos(
            u2 * F.lit(2.0 * math.pi)
        )
        return z * F.lit(float(self.sd)) + F.lit(float(self.mean))

    def columns(self, rand: RandomSource, ctx: Optional[GenContext] = None) -> list[Column]:
        val = self.raw_column(rand)
        if self.raw:
            return [val]
        return [F.format_string(f"%.{self.precision}f", val)]


def from_normal_distribution(
    mean: float = 0.0,
    sd: float = 1.0,
    precision: int = 6,
    raw: bool = False,
) -> ColumnGenerator:
    """Floats ~ N(mean, sd) formatted as strings
    (gecko/generator.py:81-107)."""
    return _NormalGenerator(mean, sd, precision, raw)


# ---------------------------------------------------------------------------
# G4/G5: (multi-column) frequency tables — inverse-CDF sampling
# ---------------------------------------------------------------------------


class FrequencyTableGenerator(ColumnGenerator):
    """Weighted categorical sampling of whole config-table rows.

    Joint sampling preserves inter-column dependence: a drawn index
    selects one table ROW, and every output column projects from that
    row (gecko/generator.py:243-253, tests/test_generator.py:98-124).
    """

    def __init__(self, values: pd.DataFrame, freqs: np.ndarray, jvm_max_table: int = 1024):
        self.values = values
        self.freqs = freqs.astype(np.int64)
        self.cum = np.cumsum(self.freqs)
        self.total = int(self.cum[-1])
        self.jvm_max_table = jvm_max_table
        self.arity = values.shape[1]

    def index_column(self, rand: RandomSource) -> Column:
        """Sampled config-row index in [0, k) as a LongType column."""
        u_int = F.floor(rand.uniform(0) * F.lit(float(self.total))).cast("long")
        k = len(self.cum)
        if k <= self.jvm_max_table:
            # JVM path: count cumulative frequencies <= u_int. Stays
            # inside whole-stage codegen; O(k) vectorized per row.
            cum_arr = F.lit([int(c) for c in self.cum])
            return F.size(F.filter(cum_arr, lambda c: c <= u_int)).cast("long")

        # Arrow path for large tables: binary search over the broadcast
        # cumulative array.
        cum = self.cum

        @F.pandas_udf(T.LongType())
        def _search(u: pd.Series) -> pd.Series:
            return pd.Series(
                np.searchsorted(cum, u.to_numpy(np.int64), side="right"), index=u.index
            )

        return _search(u_int)

    def columns(self, rand: RandomSource, ctx: Optional[GenContext] = None) -> list[Column]:
        idx = self.index_column(rand)
        k = len(self.cum)
        if k <= self.jvm_max_table:
            out = []
            for c in self.values.columns:
                arr = F.lit([str(v) for v in self.values[c].tolist()])
                out.append(F.element_at(arr, (idx + F.lit(1)).cast("int")))
            return out

        # Large table: one Arrow kernel returns all value columns as a
        # struct; field projection happens JVM-side.
        values = self.values
        fields = [T.StructField(f"c{i}", T.StringType()) for i in range(self.arity)]

        @F.pandas_udf(T.StructType(fields))
        def _project(idx_s: pd.Series) -> pd.DataFrame:
            taken = values.iloc[idx_s.to_numpy(np.int64)].reset_index(drop=True)
            taken.columns = [f"c{i}" for i in range(len(values.columns))]
            taken.index = idx_s.index
            return taken

        struct = _project(idx)
        return [struct.getField(f"c{i}") for i in range(self.arity)]


def from_frequency_table(
    data_source: TableSource,
    value_column: Union[str, int] = 0,
    freq_column: Union[str, int] = 1,
    encoding: str = "utf-8",
    delimiter: str = ",",
    jvm_max_table: int = 1024,
) -> FrequencyTableGenerator:
    """Weighted categorical sampling from a (value, freq) table
    (gecko/generator.py:110-170). Header presence inferred from the
    column-spec type; empty strings are preserved."""
    values, freqs = load_frequency_table(
        data_source, value_column, freq_column, delimiter=delimiter, encoding=encoding
    )
    return FrequencyTableGenerator(values, freqs, jvm_max_table)


def from_multicolumn_frequency_table(
    data_source: TableSource,
    value_columns: Union[str, int, Sequence[Union[str, int]]] = 0,
    freq_column: Union[str, int] = 1,
    encoding: str = "utf-8",
    delimiter: str = ",",
    jvm_max_table: int = 1024,
) -> FrequencyTableGenerator:
    """Joint sampling of value tuples from a k-column frequency table
    (gecko/generator.py:173-254)."""
    values, freqs = load_frequency_table(
        data_source, value_columns, freq_column, delimiter=delimiter, encoding=encoding
    )
    return FrequencyTableGenerator(values, freqs, jvm_max_table)


# ---------------------------------------------------------------------------
# G6: datetime range
# ---------------------------------------------------------------------------

_UNIT_TO_SPARK = {
    "d": ("DAY", "timedelta64[D]"),
    "D": ("DAY", "timedelta64[D]"),
    "h": ("HOUR", "timedelta64[h]"),
    "m": ("MINUTE", "timedelta64[m]"),
    "s": ("SECOND", "timedelta64[s]"),
}


class _DatetimeRangeGenerator(ColumnGenerator):
    def __init__(self, start_dt, end_dt, dt_format: str, unit: str):
        if unit not in _UNIT_TO_SPARK:
            raise ValueError(f"unsupported datetime unit `{unit}`, must be one of d, h, m, s")
        start = np.datetime64(start_dt) if isinstance(start_dt, str) else start_dt
        end = np.datetime64(end_dt) if isinstance(end_dt, str) else end_dt
        if start >= end:
            raise ValueError(
                f"start datetime `{start}` is greater than end datetime `{end}`"
            )
        self.spark_unit, np_unit = _UNIT_TO_SPARK[unit]
        # number of whole units in the range; sampling is inclusive of
        # both endpoints (gecko/generator.py:298-301, endpoint=True)
        self.delta_amt = int((end - start) / np.timedelta64(1, np_unit[-2]))
        self.start_iso = str(np.datetime64(start, "s"))
        self.dt_format = dt_format
        self.spark_format = strftime_to_spark(dt_format)

    def timestamp_column(self, rand: RandomSource) -> Column:
        k = rand.uniform_int(0, self.delta_amt + 1)
        start_ts = F.lit(self.start_iso.replace("T", " ")).cast("timestamp")
        return F.timestamp_add(self.spark_unit, k, start_ts)

    def columns(self, rand: RandomSource, ctx: Optional[GenContext] = None) -> list[Column]:
        return [F.date_format(self.timestamp_column(rand), self.spark_format)]


def from_datetime_range(
    start_dt: Union[str, np.datetime64],
    end_dt: Union[str, np.datetime64],
    dt_format: str,
    unit: str,
) -> ColumnGenerator:
    """Uniform datetimes in [start, end] quantized to ``unit``,
    formatted with strftime codes (gecko/generator.py:257-307; pattern
    translation per SURVEY.md §7.4 item 7)."""
    return _DatetimeRangeGenerator(start_dt, end_dt, dt_format, unit)


# ---------------------------------------------------------------------------
# G7: weighted group of generators
# ---------------------------------------------------------------------------


def _coprime_multiplier(count: int, seed: int) -> int:
    """A seed-dependent odd multiplier A coprime to count with
    A·count < 2^62, used for the affine row permutation in exact-count
    group assignment."""
    limit = (1 << 62) // max(count, 1)
    base = int(count * 0.6180339887) + 2 * (abs(seed) % 997)
    a = min(base | 1, limit | 1)
    if a < 3:
        a = 3
    while math.gcd(a, count) != 1:
        a += 2
    return a


class GroupGenerator(ColumnGenerator):
    """Weighted union of sub-generators (gecko/generator.py:310-421).

    mode="choice" (default): each row draws its sub-generator from the
    weight distribution — one projection, no shuffle, exact weights in
    expectation. mode="exact": per-group row counts are exact
    (largest-remainder allocation of round(count·w)); rows map to groups
    through an affine index bijection, replacing the reference's global
    permutation with an O(1)-per-row assignment (no shuffle at all).
    """

    def __init__(self, weighted: list[tuple[float, ColumnGenerator]], mode: str = "choice"):
        if mode not in ("choice", "exact"):
            raise ValueError("mode must be 'choice' or 'exact'")
        weights = [w for w, _ in weighted]
        if abs(sum(weights) - 1.0) > 1e-9:
            raise ValueError(f"sum of weights must be 1, is {sum(weights)}")
        arities = {g.arity for _, g in weighted}
        if len(arities) != 1:
            raise ValueError(
                "generators returned different amounts of columns: "
                f"got {', '.join(str(c) for c in sorted(arities))}"
            )
        self.weighted = weighted
        self.mode = mode
        self.arity = arities.pop()

    def _group_column_choice(self, rand: RandomSource) -> Column:
        u = rand.uniform(0)
        cum = 0.0
        expr = F.lit(len(self.weighted) - 1)
        # build reversed when-chain: first matching threshold wins
        conds = []
        for i, (w, _) in enumerate(self.weighted[:-1]):
            cum += w
            conds.append((u < F.lit(cum), i))
        for cond, i in reversed(conds):
            expr = F.when(cond, F.lit(i)).otherwise(expr)
        return expr

    def _group_column_exact(self, rand: RandomSource, ctx: GenContext) -> Column:
        count = ctx.count
        counts = [int(round(count * w)) for w, _ in self.weighted]
        # largest-remainder repair so counts sum exactly to `count`
        diff = count - sum(counts)
        order = sorted(
            range(len(counts)),
            key=lambda i: (count * self.weighted[i][0]) % 1.0,
            reverse=diff > 0,
        )
        j = 0
        while diff != 0 and order:
            counts[order[j % len(order)]] += 1 if diff > 0 else -1
            diff += -1 if diff > 0 else 1
            j += 1
        # seed-dependent affine permutation: different seeds must place
        # rows in different groups (parity with choice mode / the
        # reference's seeded shuffle, gecko/generator.py:415-419)
        seed_mix = (
            int(getattr(rand, "seed", 0)) * 1000003 + int(getattr(rand, "stream", 0))
        )
        a = _coprime_multiplier(count, seed_mix)
        b = seed_mix % max(count, 1)
        perm = (ctx.idx * F.lit(a) + F.lit(b)) % F.lit(count)
        boundaries = np.cumsum(counts)
        expr = F.lit(len(counts) - 1)
        conds = []
        for i, bound in enumerate(boundaries[:-1]):
            conds.append((perm < F.lit(int(bound)), i))
        for cond, i in reversed(conds):
            expr = F.when(cond, F.lit(i)).otherwise(expr)
        return expr

    def columns(self, rand: RandomSource, ctx: Optional[GenContext] = None) -> list[Column]:
        if self.mode == "exact":
            if ctx is None:
                raise ValueError("exact mode requires a GenContext (use to_data_frame)")
            group = self._group_column_exact(rand, ctx)
        else:
            group = self._group_column_choice(rand)

        sub_columns = [
            gen.columns(rand.fork(i + 1), ctx) for i, (_, gen) in enumerate(self.weighted)
        ]
        out = []
        for c in range(self.arity):
            expr = sub_columns[-1][c]
            for i in range(len(self.weighted) - 2, -1, -1):
                expr = F.when(group == F.lit(i), sub_columns[i][c]).otherwise(expr)
            out.append(expr)
        return out


def from_group(
    generator_lst: Union[list[ColumnGenerator], list[tuple[float, ColumnGenerator]]],
    max_rounding_adjustment: int = 0,
    mode: str = "choice",
) -> GroupGenerator:
    """Weighted union of sub-generators (gecko/generator.py:310-421).

    Unweighted lists get equal probabilities, mirroring the reference.

    ``max_rounding_adjustment`` is accepted for API parity but has NO
    effect here: the reference allocates per-generator counts with
    ``round(count * p)`` and needs a repair budget when the rounded
    counts don't sum to ``count`` (gecko/generator.py:366-388 raises at
    0, else randomly nudges up to that many sub-counts). This engine
    allocates by largest remainder, which sums exactly by construction
    — there is never drift to repair, so neither the reference's
    ValueError nor its random nudge can occur. Passing a nonzero value
    emits a :class:`~gecko_spark.core.GeckoWarning` so a ported config
    learns the knob is inert rather than silently ignored (round 13,
    VERDICT r12 #5)."""
    if max_rounding_adjustment != 0:
        import warnings

        from gecko_spark.core import GeckoWarning

        warnings.warn(
            "max_rounding_adjustment has no effect in gecko_spark: "
            "largest-remainder allocation never leaves rounding drift "
            "to repair (the reference's round()-based allocation does)",
            GeckoWarning,
            stacklevel=2,
        )
    if all(isinstance(g, ColumnGenerator) for g in generator_lst):
        p = 1.0 / len(generator_lst)
        weighted = [(p, g) for g in generator_lst]
    else:
        weighted = list(generator_lst)  # type: ignore[arg-type]
        for item in weighted:
            if not (
                isinstance(item, tuple)
                and len(item) == 2
                and isinstance(item[0], (int, float))
                and isinstance(item[1], ColumnGenerator)
            ):
                raise ValueError(
                    "invalid argument, must be a list of generators or weighted generators"
                )
    return GroupGenerator(weighted, mode=mode)
