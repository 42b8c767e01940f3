"""Record-linkage operators: blocking, sorted-neighborhood candidates,
levenshtein linkage join — including the end-to-end loop the engine
exists for: corrupt a clean table with the mutator surface, then link
it back."""

from __future__ import annotations

import pandas as pd
import pytest
from pyspark.sql import functions as F

from gecko_spark.operators import linkage as L

SF = "/root/testdata/sf0.001"


def _people(spark):
    pdf = pd.DataFrame(
        {
            "pid": range(8),
            "name": [
                "charlie miller",
                "kharlie miller",   # 1 edit from 0
                "charly miller",    # 2 edits from 0
                "anna schmidt",
                "anna schmitd",     # transposed tail of 3
                "bob jones",
                "completely other",
                "charlie miler",    # 1 edit from 0
            ],
        }
    )
    return spark.createDataFrame(pdf)


def test_blocked_candidates_and_linkage_join_best(spark):
    df = _people(spark)
    got = L.linkage_join(
        df, df, "pid", "pid", "name",
        block_a=[L.block_prefix("name", 2)],
        block_b=[L.block_prefix("name", 2)],
        max_dist=2, keep="all",
    ).filter("id_a < id_b")
    rows = {(r["id_a"], r["id_b"]): r["dist"] for r in got.collect()}
    # kharlie blocks as 'kh' — prefix blocking misses it (that's what
    # blocking trades); the 'ch' and 'an' blocks keep their pairs
    assert rows == {(0, 2): 2, (0, 7): 1, (3, 4): 2}

    best = L.linkage_join(
        df, df.filter("pid != 0"), "pid", "pid", "name",
        block_a=[L.block_prefix("name", 2)],
        block_b=[L.block_prefix("name", 2)],
        max_dist=2, keep="best",
    ).filter("id_a = 0").collect()
    assert len(best) == 1 and best[0]["id_b"] == 7 and best[0]["dist"] == 1

    with pytest.raises(ValueError, match="keep"):
        L.linkage_join(df, df, "pid", "pid", "name",
                       block_a=[L.block_prefix("name", 2)],
                       block_b=[L.block_prefix("name", 2)], keep="nope")
    with pytest.raises(ValueError, match="block_a"):
        L.blocked_candidates(df, df, "pid", "pid", [], [])


def test_length_bucket_blocking_never_misses_within_width(spark):
    """With width > max_dist, a distance-bounded match can be at most
    one bucket away; pairing adjacent buckets too makes the block
    recall-complete for that distance."""
    df = _people(spark)
    naive = (
        df.alias("a").join(df.alias("b"), F.col("a.pid") < F.col("b.pid"))
        .select(
            F.col("a.pid").alias("id_a"), F.col("b.pid").alias("id_b"),
            F.levenshtein("a.name", "b.name").alias("dist"),
        )
        .filter("dist <= 2")
    )
    w = 4
    blocked = L.linkage_join(
        df, df, "pid", "pid", "name",
        block_a=[L.block_length_bucket("name", w)],
        block_b=[L.block_length_bucket("name", w)],
        max_dist=2, keep="all",
    ).filter("id_a < id_b")
    adj = L.linkage_join(
        df, df, "pid", "pid", "name",
        block_a=[L.block_length_bucket("name", w)],
        block_b=[L.block_length_bucket("name", w) + F.lit(1)],
        max_dist=2, keep="all",
    )
    adj = adj.select("id_a", "id_b", "dist").union(
        adj.select(F.col("id_b"), F.col("id_a"), "dist")
    ).filter("id_a < id_b")
    got = set(map(tuple, blocked.union(adj).distinct().select("id_a", "id_b").collect()))
    want = set(map(tuple, naive.select("id_a", "id_b").collect()))
    assert want <= got


def test_sorted_neighborhood_matches_naive_window(spark):
    """Two-phase rank + explode/join must equal the naive single-reducer
    formulation pair-for-pair, at several bucket counts (bucket
    boundaries cannot affect the output)."""
    docs = spark.read.parquet(f"{SF}/documents.parquet").select("doc_id", "lang", "source")
    from pyspark.sql import Window

    w_n = Window.orderBy(F.col("lang").asc(), F.col("doc_id").asc())
    ranked = docs.withColumn("rnk", F.row_number().over(w_n))
    naive = (
        ranked.alias("a")
        .join(
            ranked.alias("b"),
            (F.col("b.rnk") > F.col("a.rnk")) & (F.col("b.rnk") <= F.col("a.rnk") + 2),
        )
        .select(F.col("a.doc_id").alias("id_a"), F.col("b.doc_id").alias("id_b"))
    )
    want = set(map(tuple, naive.collect()))
    for buckets in (1, 7, 64):
        got = L.sorted_neighborhood_pairs(
            docs, "lang", "doc_id", window=3, buckets=buckets
        ).select("id_a", "id_b")
        assert set(map(tuple, got.collect())) == want, buckets


def test_sorted_neighborhood_keep_cols_and_validation(spark):
    df = _people(spark)
    out = L.sorted_neighborhood_pairs(df, "name", "pid", window=2, keep_cols=["name"])
    pdf = out.toPandas()
    assert set(pdf.columns) == {"id_a", "id_b", "a_name", "b_name"}
    assert len(pdf) == 7  # n-1 adjacent pairs at window=2
    with pytest.raises(ValueError, match="window"):
        L.sorted_neighborhood_pairs(df, "name", "pid", window=1)


def test_corrupt_then_link_roundtrip(spark):
    """The full gecko loop: mutate a clean name column with the engine's
    own mutators, then link the corrupted copy back to the source —
    every corrupted record must resolve to its own original as the best
    match (distances from one delete + one CLDR-free substitute stay
    within max_dist while inter-record distances are large)."""
    from gecko_spark.operators import generators as G
    from gecko_spark.operators import mutators as M
    from gecko_spark.plans.pipeline import mutate_data_frame, to_data_frame

    freq = pd.DataFrame(
        {
            "name": [
                "margaret thatcher", "winston churchill", "clement attlee",
                "harold wilson", "edward heath", "james callaghan",
                "alec douglas-home", "anthony eden",
            ],
            "n": [1] * 8,
        }
    )
    clean = to_data_frame(
        spark, [("name", G.from_frequency_table(freq, "name", "n"))],
        2000, seed=31, keep_index=True,
    ).withColumnRenamed("__idx__", "pid")
    dirty = mutate_data_frame(
        clean,
        [("name", (0.5, M.with_delete())), ("name", (0.3, M.with_substitute()))],
        seed=32, key_columns=["pid"],
    )
    linked = L.linkage_join(
        dirty, clean, "pid", "pid", "name",
        block_a=[L.block_prefix("name", 2)],
        block_b=[L.block_prefix("name", 2)],
        max_dist=2, keep="best",
    )
    # ground truth is the ENTITY (the clean name), not the row id:
    # hundreds of rows share each of the 8 clean names, so many ties at
    # equal distance are correct links to a different row of the same
    # entity. Cross-entity clean-name distances are >= 3 > max_dist, so
    # any link crossing entity classes would be a real bug.
    def entity_accuracy(link_df):
        truth = clean.select(
            F.col("pid").alias("id_a"), F.col("name").alias("true_name")
        )
        target = clean.select(
            F.col("pid").alias("id_b"), F.col("name").alias("linked_name")
        )
        j = link_df.join(truth, "id_a").join(target, "id_b").toPandas()
        return j, (j["true_name"] == j["linked_name"]).mean()

    pdf, acc = entity_accuracy(linked)
    # prefix blocking misses records whose mutation hit chars 1-2
    # (~10% at these rates — the real blocking-recall trade); every
    # record that DID link resolves to its own entity
    assert len(pdf) >= 1700
    assert acc == 1.0

    # multi-pass blocking (prefix OR suffix pass) recovers most of the
    # rest — standard linkage practice, expressed as a union of passes
    linked2 = L.linkage_join(
        dirty, clean, "pid", "pid", "name",
        block_a=[F.substring(F.col("name"), -2, 2)],
        block_b=[F.substring(F.col("name"), -2, 2)],
        max_dist=2, keep="best",
    )
    both = linked.union(linked2).distinct()
    w = __import__("pyspark").sql.Window.partitionBy("id_a").orderBy(
        F.col("dist").asc(), F.col("id_b").asc()
    )
    best = both.withColumn("rn", F.row_number().over(w)).filter("rn = 1").drop("rn")
    bpdf, bacc = entity_accuracy(best)
    assert len(bpdf) >= 1980
    assert bacc == 1.0


def test_jaro_winkler_matches_duckdb_on_random_pairs(spark):
    """The kernel claims bit-identity with DuckDB's
    jaro_winkler_similarity — fuzz it over several hundred random pairs
    (mixed lengths, shared prefixes, transpositions, empties)."""
    import random

    import duckdb

    import gecko_spark.operators.linkage as L2

    rnd = random.Random(7)
    alpha = "abcdefgh"
    pairs = []
    for _ in range(400):
        n1, n2 = rnd.randint(0, 12), rnd.randint(0, 12)
        s1 = "".join(rnd.choice(alpha) for _ in range(n1))
        s2 = "".join(rnd.choice(alpha) for _ in range(n2))
        if rnd.random() < 0.3:  # force shared prefixes / near-dups
            s2 = s1[: rnd.randint(0, len(s1))] + s2
        pairs.append((s1, s2))
    con = duckdb.connect()
    for s1, s2 in pairs:
        want = con.execute(
            "select jaro_winkler_similarity(?, ?)", [s1, s2]
        ).fetchone()[0]
        got = L2.jaro_winkler_py(s1, s2)
        assert got == want, (s1, s2, got, want)


def test_jaro_winkler_batch_bit_identical_to_scalar():
    """The vectorized batch kernel must agree with jaro_winkler_py
    BIT-FOR-BIT on adversarial + random pairs (the scalar kernel is the
    DuckDB-verified reference; q_linkage_jw's oracle hash rides on it)."""
    import random

    import numpy as np

    from gecko_spark.operators import linkage as L2

    rng = random.Random(421)
    alpha = "abcdefgABC éü#1 "
    pairs = [
        ("", ""), ("", "a"), ("a", ""), ("a", "a"), ("a", "b"),
        ("martha", "marhta"), ("dixon", "dicksonx"), ("duane", "dwayne"),
        ("abcd", "abcd" * 20), ("x" * 70, "x" * 70 + "y"),  # long fallback
        ("aaaa", "aaa"), ("ab", "ba"), ("jon", "john"),
    ]
    for _ in range(600):
        n1, n2 = rng.randint(0, 12), rng.randint(0, 12)
        pairs.append(
            (
                "".join(rng.choice(alpha) for _ in range(n1)),
                "".join(rng.choice(alpha) for _ in range(n2)),
            )
        )
    s1 = [p[0] for p in pairs]
    s2 = [p[1] for p in pairs]
    got = L2.jaro_winkler_batch(s1, s2)
    want = np.array([L2.jaro_winkler_py(a, b) for a, b in pairs])
    mism = [
        (pairs[i], got[i], want[i])
        for i in range(len(pairs))
        if got[i] != want[i]
    ]
    assert not mism, mism[:5]


def test_linkage_join_jaro_winkler_mode(spark):
    df = _people(spark)
    got = L.linkage_join(
        df, df, "pid", "pid", "name",
        block_a=[L.block_prefix("name", 1)],
        block_b=[L.block_prefix("name", 1)],
        score="jaro_winkler", min_sim=0.9, keep="all",
    ).filter("id_a < id_b")
    rows = {(r["id_a"], r["id_b"]): r["sim"] for r in got.collect()}
    assert (0, 2) in rows and (0, 7) in rows and (3, 4) in rows
    assert all(0.9 <= v <= 1.0 for v in rows.values())
    # jw(charlie miller, charlie miler): shared 4-prefix boost
    assert rows[(0, 7)] > 0.97

    best = L.linkage_join(
        df, df.filter("pid != 0"), "pid", "pid", "name",
        block_a=[L.block_prefix("name", 1)],
        block_b=[L.block_prefix("name", 1)],
        score="jaro_winkler", min_sim=0.9, keep="best",
    ).filter("id_a = 0").collect()
    assert len(best) == 1 and best[0]["id_b"] == 7

    with pytest.raises(ValueError, match="score"):
        L.linkage_join(df, df, "pid", "pid", "name",
                       block_a=[L.block_prefix("name", 1)],
                       block_b=[L.block_prefix("name", 1)], score="hamming")


def test_soundex_blocking_groups_phonetic_variants(spark):
    """Soundex blocking keeps phonetically-close corruptions in one
    block where prefix blocking scatters them — e.g. miller/miler, and
    a leading-sound-preserving typo like mueller."""
    pdf = pd.DataFrame(
        {
            "pid": range(5),
            "surname": ["miller", "miler", "mueller", "smith", "smyth"],
        }
    )
    df = spark.createDataFrame(pdf)
    got = (
        L.blocked_candidates(
            df, df, "pid", "pid",
            [L.block_soundex("surname")], [L.block_soundex("surname")],
        )
        .filter("id_a < id_b")
        .select("id_a", "id_b")
    )
    pairs = set(map(tuple, got.collect()))
    assert (0, 1) in pairs and (0, 2) in pairs and (1, 2) in pairs  # M460 block
    assert (3, 4) in pairs  # S530 block
    assert not any((a in (0, 1, 2)) != (b in (0, 1, 2)) for a, b in pairs)


def test_fellegi_sunter_weights_and_best(spark):
    """FS weights: agreement adds log2(m/u), disagreement adds
    log2((1-m)/(1-u)); best match maximizes the summed weight with a
    deterministic tie-break."""
    import math

    a = spark.createDataFrame(
        [(1, "anna schmidt", "berlin"), (2, "bob jones", "munich")],
        "pid long, name string, city string",
    )
    b = spark.createDataFrame(
        [
            (10, "anna schmitd", "berlin"),   # name within dist 2, city agree
            (11, "anna schmidt", "hamburg"),  # name exact, city disagree
            (12, "carol white", "berlin"),    # only city agrees
        ],
        "pid long, name string, city string",
    )
    fields = {"name": (0.9, 0.05, 2), "city": (0.8, 0.1)}
    one = F.lit(1)
    got = L.fellegi_sunter_join(
        a, b, "pid", "pid", fields,
        block_a=[one], block_b=[one],  # single block: score all pairs
        min_weight=-100.0, keep="all",
    ).toPandas().set_index(["id_a", "id_b"])["weight"]
    na = math.log2(0.9 / 0.05)
    nd = math.log2(0.1 / 0.95)
    ca = math.log2(0.8 / 0.1)
    cd = math.log2(0.2 / 0.9)
    assert abs(got[(1, 10)] - (na + ca)) < 1e-12
    assert abs(got[(1, 11)] - (na + cd)) < 1e-12
    assert abs(got[(1, 12)] - (nd + ca)) < 1e-12

    best = L.fellegi_sunter_join(
        a, b, "pid", "pid", fields,
        block_a=[one], block_b=[one], min_weight=0.0, keep="best",
    ).toPandas().set_index("id_a")
    assert best.loc[1, "id_b"] == 10  # both fields agree beats name-only

    with pytest.raises(ValueError, match="agreement must be more"):
        L.fellegi_sunter_join(a, b, "pid", "pid", {"name": (0.1, 0.9)},
                              block_a=[one], block_b=[one])
    with pytest.raises(ValueError, match="fields"):
        L.fellegi_sunter_join(a, b, "pid", "pid", {}, block_a=[one], block_b=[one])


def test_em_recovers_planted_mu_and_links(spark):
    """EM over agreement-pattern counts recovers the planted m/u to a
    few points, and the fitted weights drive an accurate end-to-end
    link — the fully-unsupervised Fellegi-Sunter loop on the engine's
    own corrupted data."""
    from gecko_spark.operators import generators as G
    from gecko_spark.operators import mutators as M
    from gecko_spark.plans.pipeline import mutate_data_frame, to_data_frame

    vocab = pd.DataFrame({"w": [f"w{i:02d}" for i in range(60)], "n": [1] * 60})
    clean = (
        to_data_frame(
            spark,
            [("first", G.from_frequency_table(vocab, "w", "n")),
             ("last", G.from_frequency_table(vocab, "w", "n")),
             ("city", G.from_frequency_table(vocab, "w", "n")),
             ("shop", G.from_frequency_table(vocab, "w", "n"))],
            20_000, seed=61, keep_index=True,
        )
        .select(
            F.col("__idx__").alias("pid"),
            F.concat_ws(" ", "first", "last").alias("name"),
            F.col("city"),
            F.col("shop"),
            F.pmod(F.col("__idx__"), F.lit(2000)).alias("zip"),
        )
    )
    # three independently-corrupted fields (k=3: the identifiability
    # minimum the docstring documents): name ~30%+30% substitutes,
    # city swapped on ~20%, shop swapped on ~35%
    dirty = mutate_data_frame(
        clean,
        [("name", (0.3, M.with_group([(1.0, M.with_substitute())]))),
         ("name", (0.3, M.with_substitute())),
         ("city", (0.2, M.with_categorical_values(vocab, "w"))),
         ("shop", (0.35, M.with_categorical_values(vocab, "w")))],
        seed=62, key_columns=["pid"],
    )
    # zip blocking: 10 candidates per record, exactly one true match
    fields = {"name": 1, "city": None, "shop": None}
    est = L.estimate_mu_em(
        dirty, clean, "pid", "pid", fields,
        block_a=[F.col("zip")], block_b=[F.col("zip")],
    )
    (nm, nu, nk) = est["name"]
    (cm, cu) = est["city"]
    (sm, su) = est["shop"]
    # planted truths: name agrees (lev<=1) among matches when at most one
    # substitute hit ~ 1 - 0.09 ~ 0.91; u_name ~ 0 (random two-word
    # names rarely within 1 edit); city m ~ 0.8 (+1/60 re-draw
    # collision), shop m ~ 0.65; u ~ 1/60 background for both
    assert 0.8 < nm < 1.0 and nu < 0.05, est
    assert 0.72 < cm < 0.88 and cu < 0.1, est
    assert 0.57 < sm < 0.73 and su < 0.1, est
    assert nk == 1

    linked = L.fellegi_sunter_join(
        dirty, clean, "pid", "pid", est,
        block_a=[F.col("zip")], block_b=[F.col("zip")],
        min_weight=0.0, keep="best",
    ).toPandas()
    acc = (linked["id_a"] == linked["id_b"]).mean()
    assert len(linked) >= 19_000 and acc > 0.99, (len(linked), acc)


def test_soundex_sql_oracle_matches_spark(spark):
    """The DuckDB-SQL soundex used by the q_linkage_soundex oracle must
    reproduce Spark's soundex builtin char-for-char (leading non-letter
    passthrough, H/W transparency, separator semantics) — this is what
    promotes block_soundex from unit-tested to hash-verified."""
    import random

    import duckdb

    from pyspark.sql import functions as F

    import __spark_entry__ as e

    rng = random.Random(11)
    alpha = "abcdefghijklmnopqrstuvwxyzAEIOUHW #12."
    cases = [
        "".join(rng.choice(alpha) for _ in range(rng.randint(0, 14)))
        for _ in range(800)
    ] + ["miller", "mueller", "Hbb", "lawn mower", "Customer#01", "", "123", "x"]
    df = spark.createDataFrame([(c,) for c in set(cases)], "s string")
    got_spark = {
        r["s"]: r["sx"] for r in df.select("s", F.soundex("s").alias("sx")).collect()
    }
    con = duckdb.connect()
    con.execute("CREATE TABLE t(s VARCHAR)")
    con.executemany("INSERT INTO t VALUES (?)", [(c,) for c in set(cases)])
    got_duck = dict(con.execute(f"SELECT s, {e._soundex_sql('s')} FROM t").fetchall())
    mism = {s: (got_spark[s], got_duck[s]) for s in got_duck if got_spark[s] != got_duck[s]}
    assert not mism, list(mism.items())[:5]


def test_estimate_mu_em_uninformative_field_roundtrip(spark):
    """An uninformative field (pure noise — same agreement rate in both
    classes) must not break the estimate_mu_em -> fellegi_sunter_join
    round-trip (ADVICE r6: per-field m<=u after global orientation made
    fellegi_sunter_join raise 'need 0 < u < m < 1')."""
    import random

    rng = random.Random(5)
    rows = []
    # 300 true pairs: name agrees for matches, noise is a coin flip on
    # BOTH sides — EM cannot separate it
    for i in range(300):
        nm = f"person{i:04d}"
        rows.append((i, nm, rng.choice("ab"), 0))
    clean = spark.createDataFrame(rows, "pid long, name string, noise string, zip int")
    dirty = spark.createDataFrame(
        [(i, nm, rng.choice("ab"), z) for i, nm, _, z in rows],
        "pid long, name string, noise string, zip int",
    )
    est = L.estimate_mu_em(
        dirty, clean, "pid", "pid", {"name": None, "noise": None},
        block_a=[F.col("zip")], block_b=[F.col("zip")],
    )
    for c, spec in est.items():
        m, u = spec[0], spec[1]
        assert 0 < u < m < 1, (c, spec)
    # must not raise
    linked = L.fellegi_sunter_join(
        dirty, clean, "pid", "pid", est,
        block_a=[F.col("zip")], block_b=[F.col("zip")],
        min_weight=0.0, keep="best",
    )
    assert linked.count() > 0
