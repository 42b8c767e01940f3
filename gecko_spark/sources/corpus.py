"""Corpus ingestion/egress: the standard LLM-training-data formats
mapped onto Spark's native readers, with one enforced schema contract.

Training corpora arrive as JSONL (one JSON doc per line — the de-facto
interchange format), CSV, raw text (one doc per line or per file), or
parquet. All readers here return the same ``(doc_id, text, …meta)``
shape the rest of the engine operates on, assign deterministic doc_ids
when the source has none, and read compressed input for free (Spark's
text/json/csv sources decode .gz/.bz2/.zst per file — a .gz file is
one split, so prefer many medium files over one giant archive at
scale; parquet stays splittable under internal compression)."""

from __future__ import annotations

from typing import Optional, Sequence

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

__all__ = ["read_corpus", "write_jsonl", "stable_doc_id", "stable_doc_id_wide"]


def stable_doc_id(*cols: Column) -> Column:
    """Deterministic 63-bit doc id from content/provenance columns
    (xxhash64 with the sign bit cleared): reruns and re-ingests assign
    the same id to the same row — the property monotonically_increasing_id
    lacks (it changes with partitioning).

    Collision odds are the birthday bound n²/2 / 2⁶³: ~5.4e-8 at 1 M
    docs, ~5.4e-4 at 100 M, but ~5.4e-2 at 1 B — beyond ~1e8 docs a
    silent id collision (two distinct documents merged) becomes a real
    risk: use :func:`stable_doc_id_wide` (128-bit struct key) there."""
    return F.xxhash64(*cols).bitwiseAND(F.lit((1 << 63) - 1))


def stable_doc_id_wide(*cols: Column) -> Column:
    """128-bit deterministic doc identity for >1e8-doc corpora: a
    ``struct(hi, lo)`` of two independent xxhash64 draws over the same
    columns — ``hi`` is the plain draw, ``lo`` is DOMAIN-SEPARATED by a
    literal prefix column (Spark exposes no per-call xxhash64 seed; a
    distinct prefix through an avalanche-complete hash is the standard
    equivalent way to derive a second independent function).
    Structs group/join/compare natively, so the wide id drops into
    every ``(doc_id, …)`` operator unchanged; orderable, too (struct
    ordering is field-wise), which the min-id survivorship paths rely
    on.

    Birthday bound at 2¹²⁸: ~3e-21 at 1 B docs, ~3e-15 at 1 T — no
    realistic corpus reaches it. Cost: 16 bytes/key vs 8 in every
    shuffle keyed on the id; pay it when n²/2⁶⁴ ≥ your tolerance
    (~1e8 docs), not before."""
    # the second draw is domain-separated (distinct literal prefix) —
    # the standard way to derive an independent hash function from an
    # avalanche-complete keyed hash without Spark-internal seed access
    hi = F.xxhash64(*cols)
    lo = F.xxhash64(F.lit("gecko-wide-id-domain-2"), *cols)
    return F.struct(hi.alias("hi"), lo.alias("lo"))


def read_corpus(
    spark: SparkSession,
    path: str,
    fmt: str = "jsonl",
    text_col: str = "text",
    id_col: Optional[str] = None,
    keep_cols: Sequence[str] = (),
    csv_options: Optional[dict] = None,
) -> DataFrame:
    """Read a document corpus as ``(doc_id long, text string, *keep_cols)``.

    fmt: ``jsonl`` (spark.read.json over line-delimited records),
    ``csv`` (header by default; override via csv_options),
    ``text`` (one document per LINE, no metadata),
    ``parquet``. ``id_col`` names the source's id column when it has
    one; otherwise doc_id is :func:`stable_doc_id` of the text and (for
    ``text`` format) the source file path + line — content-addressed,
    so the assignment survives repartitioning and re-ingestion.

    Scale notes: json/csv schema inference scans the data once — for
    repeated production loads pass a DDL via csv_options["schema"] or
    pre-convert to parquet (format of record for everything
    downstream; see ``sinks.write_partitioned``)."""
    if fmt == "jsonl":
        df = spark.read.json(path)
    elif fmt == "csv":
        opts = {"header": "true", **(csv_options or {})}
        schema = opts.pop("schema", None)
        reader = spark.read.options(**opts)
        df = reader.csv(path, schema=schema)
    elif fmt == "text":
        df = (
            spark.read.text(path)
            .withColumnRenamed("value", text_col)
            .withColumn("__src__", F.input_file_name())
        )
    elif fmt == "parquet":
        df = spark.read.parquet(path)
    else:
        raise ValueError(f"unknown corpus format {fmt!r}")
    if text_col not in df.columns:
        raise ValueError(f"corpus at {path} has no {text_col!r} column")
    text = F.col(text_col).cast("string")
    if id_col is not None:
        if id_col not in df.columns:
            raise ValueError(f"corpus at {path} has no {id_col!r} column")
        did = F.col(id_col).cast("long")
    elif fmt == "text":
        # same line content may recur across files: salt with provenance
        did = stable_doc_id(F.col("__src__"), text)
    else:
        did = stable_doc_id(text)
    extra = [c for c in keep_cols if c in df.columns]
    return df.select(did.alias("doc_id"), text.alias("text"), *extra)


def write_jsonl(
    df: DataFrame,
    path: str,
    compression: Optional[str] = "gzip",
    partitions: Optional[int] = None,
) -> None:
    """Write a corpus back out as (optionally compressed) JSONL — the
    interchange format downstream tokenizer/training jobs expect. One
    file per partition: set ``partitions`` to control shard count/size
    (coalesce, no shuffle, when reducing)."""
    if partitions is not None:
        n = df.rdd.getNumPartitions()
        df = df.coalesce(partitions) if partitions < n else df.repartition(partitions)
    w = df.write.mode("overwrite")
    if compression:
        w = w.option("compression", compression)
    w.json(path)
