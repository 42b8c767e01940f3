"""Translate Python ``strftime`` format codes to Spark datetime patterns.

The reference formats datetimes with Python ``strftime`` codes like
``%d.%m.%Y`` (gecko/generator.py:298-305, gecko/mutator.py:1246,1291);
Spark's ``date_format``/``to_timestamp`` use Java
DateTimeFormatter-style patterns (``dd.MM.yyyy``). Untranslatable codes
are rejected loudly (SURVEY.md §7.4 item 7).
"""

from __future__ import annotations

_STRFTIME_TO_SPARK = {
    "%Y": "yyyy",
    "%y": "yy",
    "%m": "MM",
    "%d": "dd",
    "%H": "HH",
    "%I": "hh",
    "%M": "mm",
    "%S": "ss",
    "%f": "SSSSSS",
    "%j": "DDD",
    "%a": "EEE",
    "%A": "EEEE",
    "%b": "MMM",
    "%B": "MMMM",
    "%p": "a",
    "%z": "Z",
    "%%": "%",
}

_NEEDS_QUOTING = set("abcdefghijklmnopqrstuvwxyzABCDEFGHIJKLMNOPQRSTUVWXYZ'")


def strftime_to_spark(fmt: str) -> str:
    """Translate a strftime format string to a Spark datetime pattern.

    Literal text containing letters is single-quoted so Java's formatter
    treats it verbatim. Raises ``ValueError`` on unsupported codes.
    """
    out: list[str] = []
    literal: list[str] = []

    def flush_literal() -> None:
        if not literal:
            return
        text = "".join(literal)
        if any(c in _NEEDS_QUOTING for c in text):
            out.append("'" + text.replace("'", "''") + "'")
        else:
            out.append(text)
        literal.clear()

    i = 0
    while i < len(fmt):
        if fmt[i] == "%":
            if i + 1 >= len(fmt):
                raise ValueError(f"dangling `%` at end of format string `{fmt}`")
            code = fmt[i : i + 2]
            if code not in _STRFTIME_TO_SPARK:
                raise ValueError(
                    f"unsupported strftime code `{code}` in `{fmt}`; "
                    f"supported: {sorted(_STRFTIME_TO_SPARK)}"
                )
            flush_literal()
            out.append(_STRFTIME_TO_SPARK[code])
            i += 2
        else:
            literal.append(fmt[i])
            i += 1
    flush_literal()
    return "".join(out)
