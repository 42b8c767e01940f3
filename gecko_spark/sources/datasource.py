"""``spark.read.format("gecko")`` — synthetic data generation as a
first-class Spark data source (Spark 4 Python DataSource API).

Generation becomes a genuine *scan*: partition-parallel (each input
partition emits its contiguous row-id range as Arrow batches), lazily
planned, usable anywhere a source is (including ``spark.sql`` over a
temp view), and **partitioning-independent** — every draw derives from
the absolute row index via the engine's portable LCG (core.py), so the
same (rows, seed, spec) produce identical values for any partition
count. For the ``uniform`` / ``freq`` / ``datetime`` / ``index`` column
types the values are bit-identical to the equivalent
``to_data_frame(..., rand_for=lambda i: LcgRandom("__idx__", seed+i))``
plan (same integer recurrence, same exact float steps); ``normal`` uses
libm transcendentals whose last ulp may differ across math libraries,
so its parity is distributional.

Options (all strings, per the DataSource API):
  rows           total row count (required)
  seed           master seed (default 0); column i draws with seed+i
  numPartitions  input partitions (default 8)
  spec           JSON array of column specs, each one of:
    {"name": n, "type": "index"}
    {"name": n, "type": "uniform", "low": f, "high": f, "precision": i}
    {"name": n, "type": "normal", "mean": f, "sd": f, "precision": i}
    {"name": n, "type": "freq", "values": [...], "weights": [...]}
    {"name": n, "type": "datetime", "start": iso, "end": iso,
     "format": strftime, "unit": "d|h|m|s"}

Everything user-visible is a string column (the engine's type
convention, SURVEY.md §1.2) plus a ``__idx__`` bigint.
"""

from __future__ import annotations

import json
from typing import Iterator

import numpy as np

from pyspark.sql.datasource import DataSource, DataSourceReader, InputPartition

from gecko_spark.core import LCG_A, LCG_C, LCG_M

_BATCH = 65_536


def _lcg_uniform_np(idx: np.ndarray, seed: int, salt: int, stream: int = 0) -> np.ndarray:
    """NumPy replica of core.lcg_uniform_sql — identical integers,
    identical exact division by 2^31."""
    c1 = (seed * 7919 + stream * 15485863 + salt * 104729 + LCG_C) % LCG_M
    s = ((np.abs(idx) % LCG_M) * LCG_A + c1) % LCG_M
    s = (s * LCG_A + LCG_C) % LCG_M
    return s.astype(np.float64) / float(LCG_M)


class _RangePartition(InputPartition):
    def __init__(self, start: int, end: int):
        self.start, self.end = start, end


class GeckoDataSource(DataSource):
    """See module docstring. Register with
    ``spark.dataSource.register(GeckoDataSource)``."""

    @classmethod
    def name(cls) -> str:
        return "gecko"

    def schema(self) -> str:
        spec = json.loads(self.options.get("spec", "[]"))
        if not spec:
            raise ValueError("gecko source requires a non-empty `spec` option")
        cols = ", ".join(
            f"`{c['name']}` " + ("bigint" if c["type"] == "index" else "string")
            for c in spec
        )
        return f"__idx__ bigint, {cols}"

    def reader(self, schema) -> "GeckoReader":
        # pushFilters is opt-in: Spark refuses ANY read from a reader
        # that defines pushFilters while
        # spark.sql.python.filterPushdown.enabled is false (get_spark
        # turns it on), so the plain reader stays the safe default for
        # foreign sessions.
        if str(self.options.get("filterPushdown", "false")).lower() == "true":
            return GeckoPushdownReader(self.options)
        return GeckoReader(self.options)


class GeckoReader(DataSourceReader):
    def __init__(self, options):
        self.rows = int(options["rows"])
        self.seed = int(options.get("seed", 0))
        self.n_parts = int(options.get("numPartitions", 8))
        self.spec = json.loads(options["spec"])

        self.lo_bound = 0
        self.hi_bound = self.rows

    def partitions(self):
        lo0, hi0 = self.lo_bound, max(self.lo_bound, self.hi_bound)
        span = hi0 - lo0
        if span <= 0:
            return [_RangePartition(0, 0)]
        step = max(1, -(-span // self.n_parts))
        return [
            _RangePartition(lo, min(lo + step, hi0))
            for lo in range(lo0, hi0, step)
        ]

    def read(self, partition: _RangePartition) -> Iterator:
        import pyarrow as pa

        for lo in range(partition.start, partition.end, _BATCH):
            hi = min(lo + _BATCH, partition.end)
            idx = np.arange(lo, hi, dtype=np.int64)
            arrays = [pa.array(idx)]
            names = ["__idx__"]
            for i, c in enumerate(self.spec):
                names.append(c["name"])
                arrays.append(self._column(c, idx, self.seed + i))
            yield pa.RecordBatch.from_arrays(arrays, names=names)

    def _column(self, c: dict, idx: np.ndarray, seed: int):
        import pyarrow as pa

        t = c["type"]
        if t == "index":
            return pa.array(idx)
        if t == "uniform":
            u = _lcg_uniform_np(idx, seed, 0)
            v = u * (float(c["high"]) - float(c["low"])) + float(c["low"])
            p = int(c.get("precision", 6))
            return pa.array([f"%.{p}f" % x for x in v])
        if t == "normal":
            u1 = _lcg_uniform_np(idx, seed, 0)
            u2 = _lcg_uniform_np(idx, seed, 1)
            z = np.sqrt(np.log(1.0 - u1) * -2.0) * np.cos(u2 * 2.0 * np.pi)
            v = z * float(c["sd"]) + float(c["mean"])
            p = int(c.get("precision", 6))
            return pa.array([f"%.{p}f" % x for x in v])
        if t == "freq":
            weights = np.asarray(c["weights"], dtype=np.int64)
            cum = np.cumsum(weights)
            total = float(int(cum[-1]))
            u_int = np.floor(_lcg_uniform_np(idx, seed, 0) * total).astype(np.int64)
            pick = np.searchsorted(cum, u_int, side="right")
            values = [str(v) for v in c["values"]]
            return pa.array([values[j] for j in pick])
        if t == "datetime":
            import pandas as pd

            start = np.datetime64(c["start"])
            end = np.datetime64(c["end"])
            np_unit = {"d": "D", "h": "h", "m": "m", "s": "s"}[c["unit"]]
            delta = int((end - start) / np.timedelta64(1, np_unit))
            k = np.floor(_lcg_uniform_np(idx, seed, 0) * float(delta + 1)).astype(
                np.int64
            )
            ts = pd.Series(start + k.astype(f"timedelta64[{np_unit}]"))
            return pa.array(ts.dt.strftime(c["format"]).tolist())
        raise ValueError(f"unknown column type {c['type']!r}")


class GeckoPushdownReader(GeckoReader):
    """GeckoReader + ``__idx__`` range pruning (opt-in via the
    ``filterPushdown`` option; needs
    ``spark.sql.python.filterPushdown.enabled=true`` — get_spark sets
    it)."""

    def pushFilters(self, filters):
        """Comparison predicates on ``__idx__`` shrink the generated
        row-id interval, so pruned partitions are never even emitted —
        the source-level analogue of partition pruning. Every filter is
        also returned as unsupported, keeping Spark's post-scan
        evaluation as the correctness backstop (pruning here is an
        optimization, never the filter's only evaluation)."""
        from pyspark.sql.datasource import (
            EqualTo,
            GreaterThan,
            GreaterThanOrEqual,
            LessThan,
            LessThanOrEqual,
        )

        for f in filters:
            if getattr(f, "attribute", None) != ("__idx__",):
                continue
            v = getattr(f, "value", None)
            if not isinstance(v, int):
                continue
            if isinstance(f, EqualTo):
                self.lo_bound = max(self.lo_bound, v)
                self.hi_bound = min(self.hi_bound, v + 1)
            elif isinstance(f, GreaterThan):
                self.lo_bound = max(self.lo_bound, v + 1)
            elif isinstance(f, GreaterThanOrEqual):
                self.lo_bound = max(self.lo_bound, v)
            elif isinstance(f, LessThan):
                self.hi_bound = min(self.hi_bound, v)
            elif isinstance(f, LessThanOrEqual):
                self.hi_bound = min(self.hi_bound, v + 1)
        return filters
