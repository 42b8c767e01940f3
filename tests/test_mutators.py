"""Mutator tests: full-mutation (p=1), partial (p≈0.5), invariants, and
the favor-rare / exclusivity semantics — the reference's test shape
(reference tests/test_mutator.py)."""

from __future__ import annotations

import pandas as pd
import pytest

from gecko_spark import GeckoWarning
from gecko_spark.operators import generators as G
from gecko_spark.operators import mutators as M
from gecko_spark.plans.pipeline import mutate_data_frame, to_data_frame

N = 5000


@pytest.fixture(scope="module")
def names_df(spark):
    """Deterministic string column with a stable integer key."""
    gen = G.from_frequency_table(
        pd.DataFrame({"v": ["alpha", "bravado", "charlie", "Delta", "echo-echo"],
                      "n": [1, 1, 1, 1, 1]}), "v", "n")
    df = to_data_frame(spark, [("name", gen)], N, seed=11, keep_index=True)
    return df.cache()


def _mutate(df, spec, **kw):
    kw.setdefault("key_columns", ["__idx__"])
    kw.setdefault("seed", 99)
    return mutate_data_frame(df, spec, **kw)


def _changed_frac(df_in, df_out, col):
    joined = df_in.select("__idx__", col).withColumnRenamed(col, "before").join(
        df_out.select("__idx__", col), "__idx__")
    return joined.filter(f"`{col}` <> before").count() / df_in.count()


# -- simple mutators ---------------------------------------------------------


def test_missing_value_full_and_partial(spark, names_df):
    out = _mutate(names_df, [("name", M.with_missing_value("?"))])
    assert out.filter("name <> '?'").count() == 0

    out = _mutate(names_df, [("name", (0.5, M.with_missing_value("?")))])
    frac = out.filter("name = '?'").count() / N
    assert 0.45 < frac < 0.55


def test_insert_length_plus_one(spark, names_df):
    out = _mutate(names_df, [("name", M.with_insert("#"))])
    pdf = out.join(names_df.withColumnRenamed("name", "b"), "__idx__").toPandas()
    assert (pdf["name"].str.len() == pdf["b"].str.len() + 1).all()
    assert pdf["name"].str.contains("#", regex=False).all()


def test_delete_length_minus_one(spark, names_df):
    out = _mutate(names_df, [("name", M.with_delete())])
    pdf = out.join(names_df.withColumnRenamed("name", "b"), "__idx__").toPandas()
    assert (pdf["name"].str.len() == pdf["b"].str.len() - 1).all()


def test_transpose_preserves_multiset(spark, names_df):
    out = _mutate(names_df, [("name", M.with_transpose())])
    pdf = out.join(names_df.withColumnRenamed("name", "b"), "__idx__").toPandas()
    assert (pdf["name"].apply(sorted) == pdf["b"].apply(sorted)).all()
    assert (pdf["name"].str.len() == pdf["b"].str.len()).all()


def test_substitute_same_length_charset(spark, names_df):
    out = _mutate(names_df, [("name", M.with_substitute("0123456789"))])
    pdf = out.join(names_df.withColumnRenamed("name", "b"), "__idx__").toPandas()
    assert (pdf["name"].str.len() == pdf["b"].str.len()).all()
    assert pdf["name"].str.contains("[0-9]").all()


def test_noop(spark, names_df):
    out = _mutate(names_df, [("name", M.with_noop())])
    assert _changed_frac(names_df, out, "name") == 0


def test_case_mutators(spark, names_df):
    up = _mutate(names_df, [("name", M.with_uppercase())])
    assert up.filter("name <> upper(name)").count() == 0
    low = _mutate(names_df, [("name", M.with_lowercase())])
    assert low.filter("name <> lower(name)").count() == 0


def test_repeat(spark, names_df):
    out = _mutate(names_df, [("name", M.with_repeat("-"))])
    pdf = out.join(names_df.withColumnRenamed("name", "b"), "__idx__").toPandas()
    assert (pdf["name"] == pdf["b"] + "-" + pdf["b"]).all()


def test_categorical_values_always_different(spark):
    cats = pd.DataFrame({"gender": ["f", "m", "x", "d", "f", "m"]})
    gen = G.from_frequency_table(
        pd.DataFrame({"v": ["f", "m", "x"], "n": [1, 1, 1]}), "v", "n")
    df = to_data_frame(spark, [("g", gen)], N, seed=3, keep_index=True)
    out = _mutate(df, [("g", M.with_categorical_values(cats, "gender"))])
    joined = df.withColumnRenamed("g", "b").join(out, "__idx__")
    assert joined.filter("g = b").count() == 0
    assert out.filter("g not in ('f','m','x','d')").count() == 0


def test_categorical_requires_two_values(spark):
    with pytest.raises(ValueError, match="at least two"):
        M.with_categorical_values(pd.DataFrame({"g": ["only"]}), "g")


# -- datetime ----------------------------------------------------------------


def test_datetime_offset_within_delta(spark):
    gen = G.from_datetime_range("2020-03-05", "2020-03-20", "%Y-%m-%d", "d")
    df = to_data_frame(spark, [("d", gen)], N, seed=5, keep_index=True)
    out = _mutate(df, [("d", M.with_datetime_offset(5, "d", "%Y-%m-%d"))])
    joined = df.withColumnRenamed("d", "b").join(out, "__idx__").toPandas()
    delta = (pd.to_datetime(joined["d"]) - pd.to_datetime(joined["b"])).dt.days
    assert delta.abs().between(1, 5).all()


def test_datetime_offset_prevent_wraparound(spark):
    gen = G.from_datetime_range("2020-03-01", "2020-03-31", "%Y-%m-%d", "d")
    df = to_data_frame(spark, [("d", gen)], N, seed=6, keep_index=True)
    out = _mutate(df, [("d", M.with_datetime_offset(10, "d", "%Y-%m-%d", prevent_wraparound=True))])
    months = pd.to_datetime(out.toPandas()["d"]).dt.month
    assert (months == 3).all()


def test_datetime_offset_validates(spark):
    with pytest.raises(ValueError, match="must be positive"):
        M.with_datetime_offset(0, "d", "%Y-%m-%d")
    with pytest.raises(ValueError, match="unrecognized unit"):
        M.with_datetime_offset(1, "w", "%Y-%m-%d")


# -- multi-column ------------------------------------------------------------


def test_permute_two_columns_exact_swap(spark, names_df):
    df = names_df.withColumn("other", names_df["name"].substr(1, 3))
    out = _mutate(df, [(("name", "other"), M.with_permute())])
    joined = df.select("__idx__",
                       df["name"].alias("b1"), df["other"].alias("b2")).join(out, "__idx__")
    # p=1, two columns: every row exactly swapped (test_mutator.py:571-594)
    assert joined.filter("name <> b2 or other <> b1").count() == 0


def test_permute_partial(spark, names_df):
    df = names_df.withColumn("other", names_df["name"].substr(1, 3))
    out = _mutate(df, [(("name", "other"), (0.4, M.with_permute()))])
    joined = df.select("__idx__", df["name"].alias("b1")).join(out, "__idx__")
    frac = joined.filter("name <> b1").count() / N
    assert 0.35 < frac < 0.45


def test_permute_requires_two_columns(spark, names_df):
    with pytest.raises(ValueError, match="at least two"):
        _mutate(names_df, [("name", M.with_permute())])


def test_group_mutual_exclusivity(spark, names_df):
    out = _mutate(names_df, [("name", M.with_group([
        (0.5, M.with_missing_value("@MISS@")),
        (0.5, M.with_repeat("+")),
    ]))])
    pdf = out.toPandas()["name"]
    miss = (pdf == "@MISS@").mean()
    rep = pdf.str.contains("+", regex=False).mean()
    assert abs(miss - 0.5) < 0.05
    assert abs(rep - 0.5) < 0.05
    assert abs(miss + rep - 1.0) < 0.01


def test_group_weights_padded_with_noop(spark, names_df):
    out = _mutate(names_df, [("name", M.with_group([(0.3, M.with_missing_value("@"))]))])
    frac = out.filter("name = '@'").count() / N
    assert 0.25 < frac < 0.35


def test_group_validates_weights(spark):
    with pytest.raises(ValueError, match="not be higher than 1"):
        M.with_group([(0.8, M.with_noop()), (0.4, M.with_noop())])


def test_with_generator_modes(spark, names_df):
    gen = G.from_frequency_table(pd.DataFrame({"v": ["GEN"], "n": [1]}), "v", "n")
    rep = _mutate(names_df, [("name", M.with_generator(gen, "replace"))])
    assert rep.filter("name <> 'GEN'").count() == 0
    app = _mutate(names_df, [("name", M.with_generator(gen, "append", "_"))])
    assert app.filter("name not like '%_GEN'").count() == 0
    pre = _mutate(names_df, [("name", M.with_generator(gen, "prepend", "_"))])
    assert pre.filter("name not like 'GEN_%'").count() == 0
    tpl = _mutate(names_df, [("name", M.with_generator(gen, "append", " ({})"))])
    assert tpl.filter("name not like '% (GEN)'").count() == 0


def test_with_generator_arity_check(spark, names_df, fruit_type_freq):
    gen2 = G.from_multicolumn_frequency_table(fruit_type_freq, ["fruit", "type"], "count")
    with pytest.raises(ValueError, match="as many series"):
        _mutate(names_df, [("name", M.with_generator(gen2, "replace"))])


def test_with_function(spark, names_df):
    out = _mutate(names_df, [("name", (0.5, M.with_function(lambda v: v[::-1])))])
    pdf = out.join(names_df.withColumnRenamed("name", "b"), "__idx__").toPandas()
    changed = pdf["name"] != pdf["b"]
    assert (pdf.loc[changed, "name"] == pdf.loc[changed, "b"].str[::-1]).all()
    assert 0.4 < changed.mean() < 0.6


# -- table-driven ------------------------------------------------------------


def test_replacement_table_whole_value(spark, names_df):
    tbl = pd.DataFrame({"s": ["alpha", "echo-echo"], "t": ["ALPHA!", "ECHO!"]})
    out = _mutate(names_df, [("name", M.with_replacement_table(tbl, "s", "t"))])
    pdf = out.toPandas()["name"]
    assert not pdf.isin(["alpha", "echo-echo"]).any()
    assert pdf.isin(["ALPHA!", "ECHO!", "bravado", "charlie", "Delta"]).all()


def test_replacement_table_multiple_targets(spark, names_df):
    tbl = pd.DataFrame({"s": ["alpha", "alpha"], "t": ["a1", "a2"]})
    out = _mutate(names_df, [("name", M.with_replacement_table(tbl, "s", "t"))])
    vc = out.toPandas()["name"].value_counts()
    assert vc.get("a1", 0) > 100 and vc.get("a2", 0) > 100
    assert vc.get("alpha", 0) == 0


def test_replacement_table_reverse(spark, names_df):
    tbl = pd.DataFrame({"s": ["alpha"], "t": ["bravado"]})
    out = _mutate(names_df, [("name", M.with_replacement_table(tbl, "s", "t", reverse=True))])
    joined = names_df.withColumnRenamed("name", "b").join(out, "__idx__").toPandas()
    # both directions fire: alpha→bravado AND bravado→alpha
    assert (joined.loc[joined["b"] == "alpha", "name"] == "bravado").all()
    assert (joined.loc[joined["b"] == "bravado", "name"] == "alpha").all()


def test_replacement_table_inline_first_occurrence(spark, names_df):
    tbl = pd.DataFrame({"s": ["ch"], "t": ["kh"]})
    out = _mutate(names_df, [("name", M.with_replacement_table(tbl, "s", "t", inline=True))])
    pdf = out.toPandas()["name"]
    assert (pdf[pdf.str.startswith("kh")] == "kharlie").all()
    assert not pdf.str.startswith("ch").any()


def test_replacement_table_inline_favors_rare(spark):
    # 'zz' appears in few rows, 'aa' in many; rows containing both should
    # get the rare 'zz' replacement (gecko/mutator.py:618-624 ascending order)
    data = pd.DataFrame({"v": ["aazz"] * 10 + ["aa"] * 990})
    sdf = spark_from_pandas(data)
    tbl = pd.DataFrame({"s": ["aa", "zz"], "t": ["XX", "YY"]})
    out = M.with_replacement_table(tbl, "s", "t", inline=True).apply(sdf, ["v"], 1.0)
    pdf = out.toPandas()["v"]
    assert (pdf[pdf.str.contains("YY")] == "aaYY").all()
    assert pdf.str.contains("YY").sum() == 10


def test_phonetic_replacement_flags(spark):
    data = pd.DataFrame({"v": ["schade", "rasch", "xschx"] * 200})
    sdf = spark_from_pandas(data)
    tbl = pd.DataFrame({"s": ["sch"], "t": ["sh"], "f": ["^"]})
    out = M.with_phonetic_replacement_table(tbl, "s", "t", "f").apply(sdf, ["v"], 1.0)
    pdf = out.toPandas()["v"]
    assert (pdf[pdf.str.startswith("sh")] == "shade").all()
    assert set(pdf.unique()) == {"shade", "rasch", "xschx"}


def test_phonetic_replacement_end_and_middle(spark):
    data = pd.DataFrame({"v": ["rasch", "xschx"] * 200})
    sdf = spark_from_pandas(data)
    tbl = pd.DataFrame({"s": ["sch", "sch"], "t": ["sh", "sh"], "f": ["$", "_"]})
    out = M.with_phonetic_replacement_table(tbl, "s", "t", "f").apply(sdf, ["v"], 1.0)
    assert set(out.toPandas()["v"].unique()) == {"rash", "xshx"}


def test_regex_replacement_table(spark):
    data = pd.DataFrame({"v": ["1999-06-30", "2001-02-15"] * 100})
    sdf = spark_from_pandas(data)
    tbl = pd.DataFrame({"pattern": [r"\d{4}-\d{2}-(?P<value>30)"], "value": ["03"]})
    out = M.with_regex_replacement_table(tbl, "pattern").apply(sdf, ["v"], 1.0)
    vals = set(out.toPandas()["v"].unique())
    assert vals == {"1999-06-03", "2001-02-15"}


def test_regex_replacement_cross_reference(spark):
    data = pd.DataFrame({"v": ["1987-06-30"] * 50})
    sdf = spark_from_pandas(data)
    tbl = pd.DataFrame({
        "pattern": [r"\d{2}(?P<digit1>\d)(?P<digit2>\d)-\d{2}-\d{2}"],
        "digit1": ["(?P<digit2>)"],
        "digit2": ["(?P<digit1>)"],
    })
    out = M.with_regex_replacement_table(tbl, "pattern").apply(sdf, ["v"], 1.0)
    assert set(out.toPandas()["v"].unique()) == {"1978-06-30"}


def test_cldr_keymap(spark, cldr_file):
    data = pd.DataFrame({"v": ["sw"] * 500})
    sdf = spark_from_pandas(data)
    out = M.with_cldr_keymap_file(cldr_file).apply(sdf, ["v"], 1.0)
    pdf = out.toPandas()["v"]
    assert (pdf != "sw").all()
    assert (pdf.str.len() == 2).all()
    # neighbors of s: a,d,w,x,S; of w: q,e,s,W (grid defined in conftest)
    for v in pdf.unique():
        assert v[0] in "adwxSs" and v[1] in "qeswW"


def test_cldr_charset_restriction(spark, cldr_file):
    data = pd.DataFrame({"v": ["sw"] * 200})
    sdf = spark_from_pandas(data)
    mut = M.with_cldr_keymap_file(cldr_file, charset="sad")
    out = mut.apply(sdf, ["v"], 1.0)
    for v in out.toPandas()["v"].unique():
        assert v[1] == "w"  # 'w' not in charset: only 's' can mutate
        assert v[0] in "ad"


# -- driver ------------------------------------------------------------------


def test_mutate_data_frame_sequential_chaining(spark, names_df):
    out = _mutate(names_df, [
        ("name", [(1.0, M.with_uppercase()), (1.0, M.with_repeat("|"))]),
    ])
    pdf = out.toPandas()["name"]
    assert pdf.str.match(r"^[A-Z\-]+\|[A-Z\-]+$").all()


def test_mutate_data_frame_bare_list_is_p1(spark, names_df):
    out = _mutate(names_df, [("name", [M.with_uppercase()])])
    assert out.filter("name <> upper(name)").count() == 0


def test_mutate_data_frame_validates(spark, names_df):
    with pytest.raises(ValueError, match="does not exist"):
        _mutate(names_df, [("missing_col", M.with_noop())])
    with pytest.raises(ValueError, match="range of \\(0, 1\\]"):
        _mutate(names_df, [("name", (1.5, M.with_noop()))])
    with pytest.raises(ValueError, match="invalid type"):
        _mutate(names_df, [("name", "not a mutator")])


def test_strict_p_warns_when_unreachable(spark):
    data = pd.DataFrame({"v": ["x"] * 100 + [""] * 900})
    sdf = spark_from_pandas(data)
    with pytest.warns(GeckoWarning, match="desired probability"):
        out = M.with_missing_value("").apply(sdf, ["v"], 0.5, strict_p=True)
        out.collect()


def test_strict_p_rescales_to_overall_rate(spark):
    # half the rows are eligible; strict p=0.4 should mutate ≈40% of ALL rows
    data = pd.DataFrame({"v": ["x"] * 2500 + [""] * 2500})
    sdf = spark_from_pandas(data)
    out = M.with_missing_value("").apply(sdf, ["v"], 0.4, strict_p=True, seed=5)
    frac = out.filter("v = ''").count() / 5000 - 0.5
    assert 0.35 < frac < 0.45


def spark_from_pandas(pdf):
    """Create a Spark DF with a unique key column for randomness."""
    from pyspark.sql import SparkSession

    spark = SparkSession.getActiveSession()
    pdf = pdf.copy()
    pdf["__idx__"] = range(len(pdf))
    return spark.createDataFrame(pdf)


def test_phonetic_output_partitioning_independent(spark):
    """With competing rules (rows matching several), the rule order is
    computed dataset-wide, so output is identical under any partition
    layout — batch-local ordering would let batch boundaries change
    which rule claims a row."""
    import pandas as pd

    from gecko_spark.core import LcgRandom
    from gecko_spark.operators import mutators as M

    tbl = pd.DataFrame(
        {
            "source": ["an", "ana", "na"],
            "target": ["en", "eni", "no"],
            "flags": ["", "", ""],
        }
    )
    words = ["banana", "bandana", "cabana", "anagram", "manna", "savanna"] * 50
    df = spark.createDataFrame(
        [(i, w) for i, w in enumerate(words)], "id long, w string"
    )
    mut = M.with_phonetic_replacement_table(tbl, "source", "target", "flags")

    out1 = (
        mut.apply(df.repartition(1), "w", 0.8, rand=LcgRandom("id", 5))
        .orderBy("id").toPandas()
    )
    out8 = (
        mut.apply(df.repartition(8), "w", 0.8, rand=LcgRandom("id", 5))
        .orderBy("id").toPandas()
    )
    assert out1["w"].tolist() == out8["w"].tolist()
    assert (out1["w"] != pd.Series(words)).any()


def test_all_simple_mutators_null_and_empty_safe(spark):
    """Null and empty-string rows must never crash a mutator kernel and
    nulls must stay null (the reference's masked update can't resurrect
    a NaN; neither may we)."""
    import pandas as pd

    from gecko_spark.core import LcgRandom
    from gecko_spark.operators import mutators as M

    df = spark.createDataFrame(
        [(i, v) for i, v in enumerate([None, "", "a", "ab", "abc", None, ""] * 30)],
        "id long, v string",
    )
    muts = [
        M.with_missing_value("N/A"),
        M.with_insert(),
        M.with_delete(),
        M.with_transpose(),
        M.with_substitute(),
        M.with_lowercase(),
        M.with_uppercase(),
        M.with_repeat(),
        # func receives None for null rows (reference passes NaN —
        # handling is the function's contract)
        M.with_function(lambda s: s[::-1] if s else s),
        M.with_replacement_table(
            pd.DataFrame({"source": ["a"], "target": ["x"]}), "source", "target",
            inline=True,
        ),
        M.with_phonetic_replacement_table(
            pd.DataFrame({"source": ["ab"], "target": ["ba"], "flags": ["^"]}),
            "source", "target", "flags",
        ),
    ]
    for mut in muts:
        out = mut.apply(df, "v", 0.9, rand=LcgRandom("id", 3)).toPandas()
        orig = df.toPandas()
        nulls = orig["v"].isna()
        assert out["v"][nulls].isna().all(), f"{mut.name} resurrected a null"
        assert len(out) == len(orig), mut.name


def test_missing_value_nulls_eligible_opt_in(spark):
    """Default: nulls stay null (SQL three-valued eligibility); with
    nulls_eligible=True null rows are filled with the sentinel — the
    reference's NaN behavior (gecko/mutator.py:678)."""
    import gecko_spark.operators.mutators as M

    df = spark.createDataFrame(
        [(1, "a"), (2, None), (3, "b"), (4, None)], "id long, v string"
    )
    kept = M.with_missing_value("XX").apply(df, "v", p=1.0, seed=5)
    got = {r["id"]: r["v"] for r in kept.collect()}
    assert got[2] is None and got[4] is None
    assert got[1] == "XX" and got[3] == "XX"

    filled = M.with_missing_value("XX", nulls_eligible=True).apply(df, "v", p=1.0, seed=5)
    got2 = {r["id"]: r["v"] for r in filled.collect()}
    assert got2 == {1: "XX", 2: "XX", 3: "XX", 4: "XX"}


def test_rule_frequencies_supplied_matches_internal_prepass(spark):
    """Supplying measured rule frequencies must reproduce the internal
    global-order pre-pass bit-for-bit (it feeds the same sort), while
    skipping the aggregation job."""
    data = pd.DataFrame({"v": ["abc"] * 6 + ["abz"] * 5 + ["xbc"] * 10})
    sdf = spark_from_pandas(data)
    tbl = pd.DataFrame({"s": ["ab", "bc"], "t": ["X", "Y"]})

    auto = M.with_replacement_table(tbl, "s", "t", inline=True)
    freqs = auto.measure_rule_frequencies(sdf, "v")
    assert freqs == {"ab": 11, "bc": 16}

    supplied = M.with_replacement_table(tbl, "s", "t", inline=True, rule_frequencies=freqs)
    a = auto.apply(sdf, ["v"], 1.0, seed=3).toPandas()["v"]
    b = supplied.apply(sdf, ["v"], 1.0, seed=3).toPandas()["v"]
    assert (a == b).all()
    # ascending global order puts 'ab' (11) before 'bc' (16): every
    # 'abc' row takes the rarer 'ab' rule
    assert (a[: 6] == "Xc").all()


def test_rule_frequencies_reference_favor_rare_scenario(spark):
    """Reference scenario (reference tests/test_mutator.py:133-144):
    100x foobar + 50x foobaz, both rules fire on every matching row at
    p=1 — here run inline with supplied frequencies."""
    data = pd.DataFrame({"v": ["foobar"] * 100 + ["foobaz"] * 50})
    sdf = spark_from_pandas(data)
    tbl = pd.DataFrame({"s": ["foobar", "foobaz"], "t": ["0", "1"]})
    mut = M.with_replacement_table(
        tbl, "s", "t", inline=True,
        rule_frequencies={"foobar": 100, "foobaz": 50},
    )
    out = mut.apply(sdf, ["v"], 1.0, seed=1).toPandas()["v"]
    assert (out[:100] == "0").all()
    assert (out[100:] == "1").all()


def test_rule_frequencies_validation(spark):
    tbl = pd.DataFrame({"s": ["aa", "zz"], "t": ["X", "Y"]})
    with pytest.raises(ValueError, match="rule_frequencies"):
        M.with_replacement_table(tbl, "s", "t", inline=True, rule_frequencies={"nope": 1})
    ptbl = pd.DataFrame({"s": ["ph", "th"], "t": ["f", "t"], "f": ["", ""]})
    with pytest.raises(ValueError, match="align"):
        M.with_phonetic_replacement_table(ptbl, "s", "t", "f", rule_frequencies=[1])
    rtbl = pd.DataFrame({"pattern": [r"(?P<a>x)"], "a": ["y"]})
    with pytest.raises(ValueError, match="align"):
        M.with_regex_replacement_table(rtbl, pattern_column="pattern", rule_frequencies=[1, 2])


def test_phonetic_rule_frequencies_matches_internal_prepass(spark):
    # rule 1 (^sch): schade, schasx; rule 2 (middle 'as'): rasch, phase,
    # schasx — schasx matches BOTH, so global rule order is load-bearing
    data = pd.DataFrame({"v": ["schade", "rasch", "xschx", "phase", "schasx"] * 100})
    sdf = spark_from_pandas(data)
    tbl = pd.DataFrame({"s": ["sch", "as"], "t": ["sh", "az"], "f": ["^", ""]})
    auto = M.with_phonetic_replacement_table(tbl, "s", "t", "f")
    counts = auto.measure_rule_frequencies(sdf, "v")
    assert counts == [200, 0, 300, 0]  # empty flag expands to ^/_/$ rules
    supplied = M.with_phonetic_replacement_table(tbl, "s", "t", "f", rule_frequencies=counts)
    a = auto.apply(sdf, ["v"], 1.0, seed=7).toPandas()["v"]
    b = supplied.apply(sdf, ["v"], 1.0, seed=7).toPandas()["v"]
    assert (a == b).all()


def test_regex_rule_frequencies_matches_internal_prepass(spark):
    data = pd.DataFrame({"v": ["2020-01-02", "03/04/2021"] * 50})
    sdf = spark_from_pandas(data)
    rtbl = pd.DataFrame(
        {
            "pattern": [r"(?P<y>\d{4})-(?P<m>\d{2})", r"(?P<m>\d{2})/(?P<d>\d{2})"],
            "y": ["(?P<y>)", ""],
            "m": ["(?P<m>)", "(?P<d>)"],
            "d": ["", "(?P<m>)"],
        }
    )
    auto = M.with_regex_replacement_table(rtbl, pattern_column="pattern")
    counts = auto.measure_rule_frequencies(sdf, "v")
    assert counts == [50, 50]
    supplied = M.with_regex_replacement_table(
        rtbl, pattern_column="pattern", rule_frequencies=counts
    )
    a = auto.apply(sdf, ["v"], 1.0, seed=9).toPandas()["v"]
    b = supplied.apply(sdf, ["v"], 1.0, seed=9).toPandas()["v"]
    assert (a == b).all()


def test_case_mutators_exact_eligibility_strict_p(spark):
    """Reference parity on digit-heavy columns (gecko/mutator.py:1141,
    :1185): Python's ~islower()/~isupper() count cased-character-free
    strings as ELIGIBLE, so with 2/3 digit rows and p=0.5 the reference
    does NOT warn. The JVM approximation (col != lower(col)) counts them
    ineligible -> p_actual=0 -> GeckoWarning + rescale. exact_eligibility
    restores the reference's accounting; mutation output is identical."""
    import warnings

    data = pd.DataFrame({"v": ["abc", "123", "456"] * 100})
    sdf = spark_from_pandas(data)

    # approximation: everything ineligible -> must warn under strict_p
    with pytest.warns(GeckoWarning):
        _mutate(sdf, [("v", (0.5, M.with_lowercase()))], strict_p=True).collect()

    # exact: p_actual = 2/3 >= 0.5 -> silent, like the reference
    with warnings.catch_warnings():
        warnings.simplefilter("error", GeckoWarning)
        out = _mutate(
            sdf, [("v", (0.5, M.with_lowercase(exact_eligibility=True)))],
            strict_p=True,
        ).toPandas()["v"]
    # lowercasing a digit string or an already-lower string is a no-op
    assert (out == data["v"]).all()

    # uppercase mirror: "ABC" rows are ineligible for ~isupper(), digit
    # rows eligible -> p_actual = 2/3, no warning; approx warns
    data_u = pd.DataFrame({"v": ["ABC", "123", "456"] * 100})
    sdf_u = spark_from_pandas(data_u)
    with pytest.warns(GeckoWarning):
        _mutate(sdf_u, [("v", (0.5, M.with_uppercase()))], strict_p=True).collect()
    with warnings.catch_warnings():
        warnings.simplefilter("error", GeckoWarning)
        out_u = _mutate(
            sdf_u, [("v", (0.5, M.with_uppercase(exact_eligibility=True)))],
            strict_p=True,
        ).toPandas()["v"]
    assert (out_u == data_u["v"]).all()

    # on a cased column both eligibility modes select identically
    mixed = pd.DataFrame({"v": ["Alpha", "BRAVO", "charlie", "Delta"] * 50})
    smix = spark_from_pandas(mixed)
    a = _mutate(smix, [("v", (0.5, M.with_lowercase()))]).toPandas()["v"]
    b = _mutate(smix, [("v", (0.5, M.with_lowercase(exact_eligibility=True)))]).toPandas()["v"]
    assert (a == b).all()
