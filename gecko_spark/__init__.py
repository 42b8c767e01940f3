"""gecko_spark — a PySpark-native synthetic-data generation and mutation engine.

A from-scratch re-expression of the capabilities of ul-mds/gecko
(reference surveyed in SURVEY.md) on top of the Spark DataFrame API:

* generators build lazy DataFrames from a ``spark.range`` seed frame —
  weighted categorical sampling, numeric distributions, datetime ranges,
  weighted unions (``gecko_spark.operators.generators``);
* mutators are ``DataFrame -> DataFrame`` transformations that corrupt a
  configurable fraction of rows — keyboard typos, phonetic/OCR
  replacements, edit errors, case flips, datetime offsets
  (``gecko_spark.operators.mutators``);
* a pipeline layer mirrors the reference's two entry points,
  ``to_data_frame`` and ``mutate_data_frame``
  (``gecko_spark.plans.pipeline``);
* beyond the reference: large-scale training-data operators — dedup
  (exact / MinHash-LSH / SimHash), similarity search, text analysis,
  multimodal column plumbing (``gecko_spark.operators``).

Design rules (100 TB north star): config tables are the only driver-side
data; every operator is a single pass of lazy column expressions or one
Arrow-batched ``pandas_udf`` stage; randomness is hash-derived and
partitioning-independent; no ``collect()`` in any hot path.
"""

from gecko_spark.core import (
    GeckoWarning,
    HashRandom,
    LcgRandom,
    RandomSource,
    get_spark,
)

__all__ = [
    "GeckoWarning",
    "HashRandom",
    "LcgRandom",
    "RandomSource",
    "get_spark",
]

__version__ = "0.1.0"
