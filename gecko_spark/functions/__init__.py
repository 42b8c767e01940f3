"""Column-level helper functions shared by operators."""

from gecko_spark.functions.datetime_patterns import strftime_to_spark
from gecko_spark.functions.strings import (
    delete_char_at,
    insert_char_at,
    replace_char_at,
    replace_first,
    transpose_at,
)

__all__ = [
    "strftime_to_spark",
    "delete_char_at",
    "insert_char_at",
    "replace_char_at",
    "replace_first",
    "transpose_at",
]
