"""Engine entry points: dataset generation and dataset corruption.

``to_data_frame`` mirrors gecko's ``generator.to_data_frame``
(gecko/generator.py:427-474): a spec of ``(name(s), generator)`` pairs
plus a row count. Here it assembles ONE projection over
``spark.range(count)`` — every generator contributes lazy column
expressions, so the whole dataset is a single narrow stage with no
joins, no shuffles, and nothing materialized until the caller acts.

``mutate_data_frame`` mirrors gecko's ``mutator.mutate_data_frame``
(gecko/mutator.py:1724-1793): a spec of ``(column(s), mutator-spec)``
entries applied sequentially. Each step is a ``DataFrame -> DataFrame``
fold; Catalyst collapses the chained when/otherwise projections, so an
entire corruption pipeline typically executes as one stage plus one
Arrow-UDF stage per table-driven mutator.
"""

from __future__ import annotations

from typing import Callable, Optional, Sequence, Union

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from gecko_spark.core import HashRandom, RandomSource, check_probability
from gecko_spark.operators.generators import ColumnGenerator, GenContext
from gecko_spark.operators.mutators import Mutator

__all__ = ["to_data_frame", "mutate_data_frame", "IDX_COLUMN"]

IDX_COLUMN = "__idx__"

GeneratorSpec = Sequence[tuple[Union[str, tuple[str, ...]], ColumnGenerator]]


def to_data_frame(
    spark: SparkSession,
    spec: GeneratorSpec,
    count: int,
    seed: int = 0,
    rand_for: Optional[Callable[[int], RandomSource]] = None,
    keep_index: bool = False,
    num_partitions: Optional[int] = None,
) -> DataFrame:
    """Assemble a DataFrame from named generators.

    Args:
        spark: session.
        spec: list of ``(column name(s), generator)`` pairs; tuple names
            bind multi-column generators positionally
            (gecko/generator.py:424, 450-471).
        count: number of rows.
        seed: master seed; each spec entry gets a decorrelated stream.
        rand_for: optional override — ``rand_for(entry_index)`` returns
            the RandomSource for that entry (used by the oracle harness
            to substitute LCG randomness).
        keep_index: keep the ``__idx__`` row-id column.
        num_partitions: partitions for the seed range (defaults to
            Spark's parallelism; set ≈ count/10M on large clusters).
    """
    if len(spec) == 0:
        raise ValueError("generator spec must not be empty")
    if count <= 0:
        raise ValueError(f"amount of rows must be positive, is {count}")

    if num_partitions:
        df = spark.range(0, count, 1, num_partitions)
    else:
        df = spark.range(0, count)
    df = df.withColumnRenamed("id", IDX_COLUMN)

    idx = F.col(IDX_COLUMN)
    ctx = GenContext(idx=idx, count=count)
    base = HashRandom(seed, [idx])

    exprs = [idx] if keep_index else []
    seen: set[str] = set()
    for entry_idx, (names, gen) in enumerate(spec):
        if isinstance(names, str):
            names = (names,)
        rand = rand_for(entry_idx) if rand_for is not None else base.fork(entry_idx)
        cols = gen.columns(rand, ctx)
        if len(cols) != len(names):
            raise ValueError(
                f"generator at index {entry_idx} returned {len(cols)} column(s), "
                f"but {len(names)} name(s) were supplied"
            )
        for name, col in zip(names, cols):
            if name in seen:
                raise ValueError(f"duplicate column name `{name}` in generator spec")
            seen.add(name)
            exprs.append(col.alias(name))

    return df.select(*exprs)


MutatorSpec = Sequence[
    tuple[
        Union[str, tuple[str, ...]],
        Union[Mutator, tuple[float, Mutator], list],
    ]
]


def _normalize_mutator_spec(mutator_spec) -> list[tuple[float, Mutator]]:
    """Normalize a spec entry to ``[(p, mutator), ...]`` — same coercion
    ladder as the reference (gecko/mutator.py:1744-1777): a bare mutator
    gets p=1.0; a bare list of mutators applies each with p=1.0."""
    if isinstance(mutator_spec, Mutator):
        return [(1.0, mutator_spec)]
    if (
        isinstance(mutator_spec, tuple)
        and len(mutator_spec) == 2
        and isinstance(mutator_spec[1], Mutator)
    ):
        return [mutator_spec]
    if isinstance(mutator_spec, list):
        if all(isinstance(m, Mutator) for m in mutator_spec):
            return [(1.0, m) for m in mutator_spec]
        if all(
            isinstance(m, tuple) and len(m) == 2 and isinstance(m[1], Mutator)
            for m in mutator_spec
        ):
            return list(mutator_spec)
    raise ValueError(f"invalid type `{type(mutator_spec)}` for mutator definition")


def mutate_data_frame(
    df_in: DataFrame,
    mutator_lst: MutatorSpec,
    seed: int = 0,
    key_columns: Optional[Sequence[str]] = None,
    rand_for: Optional[Callable[[int], RandomSource]] = None,
    strict_p: bool = False,
) -> DataFrame:
    """Apply a mutation spec to a DataFrame — lazily.

    Spec entries run sequentially in list order (order is part of the
    reference contract — gecko docs/release-notes.md:125); multiple
    mutators on one column chain on the already-mutated output.

    Args:
        df_in: input (never modified — DataFrames are immutable, the
            reference's deep-copy discipline is free here).
        mutator_lst: ``[(column(s), mutator | (p, mutator) | [...]), ...]``.
        seed: master seed; step ``i`` uses stream ``i``.
        key_columns: columns whose values identify a row for randomness
            derivation; defaults to the columns being mutated at each
            step. Supply a primary key for row-unique draws even when
            payload values collide.
        rand_for: optional override — ``rand_for(step_index)`` returns
            the RandomSource for that sequential (entry, mutator) step.
        strict_p: reproduce the reference's eligibility measurement,
            p-rescaling and GeckoWarning (one aggregation job per step).
    """
    df_out = df_in
    step = 0
    for column_spec, mutator_spec in mutator_lst:
        if isinstance(column_spec, str):
            column_spec = (column_spec,)
        for c in column_spec:
            if c not in df_out.columns:
                raise ValueError(
                    f"column `{c}` does not exist, must be one of `{','.join(df_in.columns)}`"
                )
        weighted = _normalize_mutator_spec(mutator_spec)
        for p, mut in weighted:
            if p <= 0 or p > 1:
                raise ValueError("probability for mutator must be in range of (0, 1]")
            if rand_for is not None:
                rand = rand_for(step)
            else:
                keys = list(key_columns) if key_columns else list(df_out.columns)
                rand = HashRandom(seed, [F.col(k) for k in keys]).fork(step)
            df_out = mut.apply(
                df_out, list(column_spec), p, rand=rand, strict_p=strict_p
            )
            step += 1
    return df_out
