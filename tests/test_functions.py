"""Unit tests for column helpers and config-table loaders."""

from __future__ import annotations

import pandas as pd
import pytest
from pyspark.sql import functions as F

from gecko_spark.functions.datetime_patterns import strftime_to_spark
from gecko_spark.functions.strings import (
    delete_char_at,
    insert_char_at,
    replace_char_at,
    replace_first,
    transpose_at,
)
from gecko_spark.sources.cldr import decode_iso_kb_pos, unescape_kb_char
from gecko_spark.sources.tables import (
    load_config_table,
    load_frequency_table,
    load_phonetic_table,
    load_replacement_table,
)


def test_strftime_translation():
    assert strftime_to_spark("%Y-%m-%d") == "yyyy-MM-dd"
    assert strftime_to_spark("%d.%m.%Y %H:%M:%S") == "dd.MM.yyyy HH:mm:ss"
    assert strftime_to_spark("%d of %B") == "dd' of 'MMMM"
    with pytest.raises(ValueError, match="unsupported strftime code"):
        strftime_to_spark("%Q")
    with pytest.raises(ValueError, match="dangling"):
        strftime_to_spark("abc%")


def test_string_kernels(spark):
    df = spark.createDataFrame([("abcdef",)], ["s"])
    col = F.col("s")
    row = df.select(
        insert_char_at(col, F.lit(0), F.lit("X")).alias("ins0"),
        insert_char_at(col, F.lit(6), F.lit("X")).alias("ins_end"),
        delete_char_at(col, F.lit(2)).alias("del2"),
        replace_char_at(col, F.lit(5), F.lit("Z")).alias("rep5"),
        transpose_at(col, F.lit(0)).alias("tr0"),
        transpose_at(col, F.lit(4)).alias("tr4"),
        replace_first(col, F.lit("cd"), F.lit("#")).alias("rf"),
        replace_first(col, F.lit("zz"), F.lit("#")).alias("rf_miss"),
    ).first()
    assert row["ins0"] == "Xabcdef"
    assert row["ins_end"] == "abcdefX"
    assert row["del2"] == "abdef"
    assert row["rep5"] == "abcdeZ"
    assert row["tr0"] == "bacdef"
    assert row["tr4"] == "abcdfe"
    assert row["rf"] == "ab#ef"
    assert row["rf_miss"] == "abcdef"


def test_load_config_table_header_inference(tmp_path):
    p = tmp_path / "t.csv"
    p.write_text("name,freq\nx,1\ny,2\n")
    with_header = load_config_table(str(p), ["name", "freq"])
    assert with_header["name"].tolist() == ["x", "y"]
    positional = load_config_table(str(p), [0, 1])
    # positional spec = no header row: the header line becomes data
    assert positional["0"].tolist() == ["name", "x", "y"]
    with pytest.raises(ValueError, match="all strings .* or all ints"):
        load_config_table(str(p), ["name", 1])
    with pytest.raises(ValueError, match="not found"):
        load_config_table(str(p), ["nope", "freq"])


def test_load_config_table_tsv(tmp_path):
    p = tmp_path / "t.tsv"
    p.write_text("a\t5\nb\t7\n")
    df = load_config_table(str(p), [0, 1], delimiter="\t")
    assert df["0"].tolist() == ["a", "b"]


def test_load_config_table_encoding(tmp_path):
    """Reference parity: config CSVs in non-UTF-8 encodings
    (reference gecko/generator.py:153-161 exposes `encoding`)."""
    p = tmp_path / "latin.csv"
    p.write_bytes("name,freq\nMüller,3\nJürgen,1\n".encode("latin-1"))
    df = load_config_table(str(p), ["name", "freq"], encoding="latin-1")
    assert df["name"].tolist() == ["Müller", "Jürgen"]


def test_load_config_table_empty_strings_preserved(tmp_path):
    """keep_default_na parity (reference generator.py:158): empty CSV
    fields stay empty strings, never NaN."""
    p = tmp_path / "empty.csv"
    p.write_text("v,n\n,5\nx,2\n")
    df = load_config_table(str(p), ["v", "n"])
    assert df["v"].tolist() == ["", "x"]


def test_load_frequency_table_validation(tmp_path):
    p = tmp_path / "bad.csv"
    p.write_text("v,n\nx,-1\n")
    with pytest.raises(ValueError, match="non-negative"):
        load_frequency_table(str(p), "v", "n")
    p2 = tmp_path / "zero.csv"
    p2.write_text("v,n\nx,0\n")
    with pytest.raises(ValueError, match="positive value"):
        load_frequency_table(str(p2), "v", "n")


def test_load_replacement_table_reverse():
    tbl = pd.DataFrame({"s": ["a"], "t": ["b"]})
    out = load_replacement_table(tbl, "s", "t", reverse=True)
    assert set(map(tuple, out.values)) == {("a", "b"), ("b", "a")}


def test_load_phonetic_table_flag_expansion():
    tbl = pd.DataFrame({"s": ["sch", "ie"], "t": ["sh", "i"], "f": ["", "^$"]})
    rules = load_phonetic_table(tbl, "s", "t", "f")
    assert ("sch", "sh", "^") in rules and ("sch", "sh", "_") in rules and ("sch", "sh", "$") in rules
    assert ("ie", "i", "^") in rules and ("ie", "i", "$") in rules
    assert ("ie", "i", "_") not in rules
    with pytest.raises(ValueError, match="unknown phonetic flag"):
        load_phonetic_table(pd.DataFrame({"s": ["x"], "t": ["y"], "f": ["#"]}), "s", "t", "f")


def test_cldr_helpers():
    assert decode_iso_kb_pos("A00") == (0, 0)
    assert decode_iso_kb_pos("C05") == (2, 5)
    assert unescape_kb_char("&amp;") == "&"
    assert unescape_kb_char("\\u{22}") == '"'
    assert unescape_kb_char("a") == "a"


# -- portable hash: NumPy kernels vs their DuckDB SQL builders ---------------


def test_portable_hash_matches_duckdb_sql():
    """The same strings hashed by the NumPy kernels and by the generated
    DuckDB SQL must agree exactly — this is the property every
    signature/fingerprint oracle rests on."""
    import duckdb
    import numpy as np

    from gecko_spark.functions.portable_hash import (
        P1,
        P2,
        poly_hash_strings,
        sql_horner,
        sql_window_hashes,
        window_hashes,
    )

    rng = np.random.default_rng(99)
    alphabet = "abcdefghijklmnopqrstuvwxyz0123456789 _#"
    strings = [
        "".join(rng.choice(list(alphabet), rng.integers(0, 30)))
        for _ in range(200)
    ] + ["", "a", "ab", "abcd", "abcde", "exactly5!"]

    con = duckdb.connect()
    con.execute("CREATE TABLE t(s VARCHAR)")
    con.executemany("INSERT INTO t VALUES (?)", [(s,) for s in strings])

    for prime in (P1, P2):
        got = con.execute(
            f"SELECT CASE WHEN length(s) = 0 THEN 0 ELSE {sql_horner('s', prime)} END FROM t"
        ).fetchall()
        want = poly_hash_strings(strings, prime)
        assert [g[0] for g in got] == list(want)

    for n in (3, 5, 8):
        got = con.execute(f"SELECT {sql_window_hashes('s', n, P1)} FROM t").fetchall()
        for (g,), s in zip(got, strings):
            w = window_hashes(s, n, P1) if s else []
            assert list(g) == list(w), (s, n)


def test_poly_hash_long_strings_exact():
    """Chunked fold stays exact (vs a pure-Python Horner reference) far
    past the ~2048-column bound where a single int64 matmul would wrap
    mod 2^64 — the ADVICE round-1 finding (astral-plane/CJK long docs)."""
    from gecko_spark.functions.portable_hash import (
        BASE,
        P1,
        P2,
        poly_hash_strings,
    )

    def horner(s, p):
        h = 0
        for ch in s:
            h = (h * BASE + ord(ch)) % p
        return h

    longs = [
        "\U0001F600" * 60_000,           # astral plane, cp ~ 2^17
        "中文" * 150_000,        # CJK, 300k chars
        "a" * 2_047, "b" * 2_048, "c" * 2_049,  # chunk-boundary widths
        "xyz" * 40_000 + "tail",
        "short", "",
    ]
    for prime in (P1, P2):
        got = list(poly_hash_strings(longs, prime))
        want = [horner(s, prime) for s in longs]
        assert got == want
