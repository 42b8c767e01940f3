"""Config-table sources: CSV frequency/replacement tables, CLDR keyboard XML.

These are the only driver-side data paths in the engine. Config tables
are small by construction (≤ a few 100k rows — reference
gecko/generator.py:110-170, gecko/mutator.py:510-569) and are loaded on
the driver, then captured by closures / broadcast into Arrow UDF kernels.
"""

from gecko_spark.sources.tables import (
    load_config_table,
    load_frequency_table,
    load_phonetic_table,
    load_regex_table,
    load_replacement_table,
)
from gecko_spark.sources.cldr import load_cldr_candidates
from gecko_spark.sources.sinks import compact, write_partitioned

__all__ = [
    "load_config_table",
    "load_frequency_table",
    "load_phonetic_table",
    "load_regex_table",
    "load_replacement_table",
    "load_cldr_candidates",
    "write_partitioned",
    "compact",
]
