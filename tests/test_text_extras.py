"""Round-4/5 training-pipeline ops: PII redaction, TF-IDF top terms,
int8 embedding quantization, corpus line dedup, unigram LM scoring."""

import math

import pytest
from pyspark.sql import functions as F

from gecko_spark.operators.similarity import dequantize_int8, quantize_int8
from gecko_spark.operators.text import (
    line_dedupe,
    redact_pii,
    tfidf_top_terms,
    unigram_logprob,
)


@pytest.fixture(scope="module")
def pii_docs(spark):
    return spark.createDataFrame(
        [
            (1, "write bob.smith+x@sub.example.co.uk or root@10.1.2.3"),
            (2, "call +1 555-867-5309 then 555-123-4567 after lunch"),
            (3, "server at 192.168.0.255 and 8.8.8.8, ports later"),
            (4, "nothing sensitive here"),
            (5, None),
        ],
        "doc_id long, text string",
    )


class TestRedactPii:
    def test_masks_and_counts(self, spark, pii_docs):
        got = {
            r["doc_id"]: r
            for r in redact_pii(pii_docs).collect()
        }
        # root@10.1.2.3 is NOT an email under the pattern (host must
        # end in an alphabetic TLD) — but its host IS an ipv4 match
        assert got[1]["n_email"] == 1
        assert got[1]["n_ipv4"] == 1
        assert "bob.smith+x@sub.example.co.uk" not in got[1]["text_redacted"]
        assert "<email>" in got[1]["text_redacted"]
        assert got[2]["n_phone"] == 2
        assert got[2]["text_redacted"] == "call <phone> then <phone> after lunch"
        assert got[3]["n_ipv4"] == 2
        assert got[3]["text_redacted"] == "server at <ipv4> and <ipv4>, ports later"
        assert got[4]["text_redacted"] == "nothing sensitive here"
        assert got[5]["text_redacted"] == ""
        assert got[5]["n_email"] == got[5]["n_ipv4"] == got[5]["n_phone"] == 0

    def test_counts_use_original_text(self, spark):
        # counts are measured on the ORIGINAL text, so earlier
        # redactions reshaping the string never change later counts
        df = spark.createDataFrame(
            [(1, "a@b.co 555-123-4567 a@b.co")], "doc_id long, text string"
        )
        r = redact_pii(df).collect()[0]
        assert r["n_email"] == 2
        assert r["n_phone"] == 1
        assert r["text_redacted"] == "<email> <phone> <email>"

    def test_no_python_in_plan(self, spark, pii_docs):
        plan = redact_pii(pii_docs)._jdf.queryExecution().executedPlan().toString()
        assert "ArrowEvalPython" not in plan and "BatchEvalPython" not in plan
        assert "Exchange" not in plan


class TestTfidfTopTerms:
    def test_small_corpus_exact(self, spark):
        docs = spark.createDataFrame(
            [
                (1, "apple apple banana"),
                (2, "banana cherry"),
                (3, "cherry cherry cherry date"),
            ],
            "doc_id long, text string",
        )
        out = tfidf_top_terms(docs, k=2)
        rows = {(r["doc_id"], r["rank"]): r for r in out.collect()}
        # doc 1: apple tf=2 df=1 -> 2*ln(3); banana tf=1 df=2 -> ln(1.5)
        r11 = rows[(1, 1)]
        assert r11["term"] == "apple" and r11["tf"] == 2 and r11["df"] == 1
        assert r11["tfidf"] == round(2 * math.log(3), 6)
        assert rows[(1, 2)]["term"] == "banana"
        # doc 3: cherry tf=3 df=2 vs date tf=1 df=1: 3*ln(1.5)=1.216>ln(3)=1.099
        assert rows[(3, 1)]["term"] == "cherry"
        assert rows[(3, 2)]["term"] == "date"

    def test_k_bounds_and_min_df(self, spark):
        docs = spark.createDataFrame(
            [(1, "a b c d e"), (2, "a b")], "doc_id long, text string"
        )
        assert tfidf_top_terms(docs, k=3).groupBy("doc_id").count().agg(
            F.max("count")
        ).collect()[0][0] <= 3
        only_shared = tfidf_top_terms(docs, k=10, min_df=2)
        assert {r["term"] for r in only_shared.collect()} == {"a", "b"}

    def test_rank_ties_break_by_term(self, spark):
        docs = spark.createDataFrame(
            [(1, "zebra yak zebra yak"), (2, "other words")],
            "doc_id long, text string",
        )
        rows = {r["rank"]: r["term"] for r in
                tfidf_top_terms(docs, k=2).filter(F.col("doc_id") == 1).collect()}
        # identical (tf, df) -> identical score -> alphabetical order
        assert rows == {1: "yak", 2: "zebra"}


class TestQuantizeInt8:
    def test_values_and_scale(self, spark):
        df = spark.createDataFrame(
            [(1, [1.0, -2.0, 0.5]), (2, [0.0, 0.0, 0.0])],
            "vec_id long, embedding array<float>",
        )
        got = {r["vec_id"]: r for r in quantize_int8(df).collect()}
        assert got[1]["embedding_q8"] == [64, -127, 32]
        assert got[1]["embedding_scale"] == pytest.approx(2.0 / 127.0)
        assert got[2]["embedding_q8"] == [0, 0, 0]
        assert got[2]["embedding_scale"] == 0.0

    def test_roundtrip_error_bound(self, spark):
        import numpy as np

        rng = np.random.default_rng(7)
        vecs = [(i, [float(x) for x in rng.normal(size=16)]) for i in range(50)]
        df = spark.createDataFrame(vecs, "vec_id long, embedding array<double>")
        q = quantize_int8(df)
        deq = dequantize_int8(q)
        joined = deq.join(df, "vec_id").select(
            F.aggregate(
                F.zip_with(
                    "embedding", "embedding_q8_deq", lambda a, b: F.abs(a - b)
                ),
                F.lit(0.0),
                lambda acc, v: F.greatest(acc, v),
            ).alias("max_err"),
            F.col("embedding_scale").alias("scale"),
        )
        for r in joined.collect():
            # half-up rounding: |x - q*scale| <= scale/2 (+ fp slack)
            assert r["max_err"] <= r["scale"] / 2 + 1e-12

    def test_q8_range_and_jvm_only(self, spark):
        import numpy as np

        rng = np.random.default_rng(3)
        df = spark.createDataFrame(
            [(i, [float(x) for x in rng.normal(size=8)]) for i in range(20)],
            "vec_id long, embedding array<double>",
        )
        q = quantize_int8(df)
        mm = q.select(
            F.array_min("embedding_q8").alias("lo"), F.array_max("embedding_q8").alias("hi")
        ).agg(F.min("lo"), F.max("hi")).collect()[0]
        assert mm[0] >= -127 and mm[1] <= 127
        plan = q._jdf.queryExecution().executedPlan().toString()
        assert "ArrowEvalPython" not in plan and "Exchange" not in plan

    def test_malformed_vectors_explicit(self, spark):
        df = spark.createDataFrame(
            [(1, [1.0, float("nan")]), (2, []), (3, None), (4, [2.0, -1.0])],
            "vec_id long, embedding array<double>",
        )
        got = {r["vec_id"]: r for r in quantize_int8(df).collect()}
        # NaN -> explicit NULL output, not an array of nulls + NaN scale
        assert got[1]["embedding_q8"] is None
        assert got[1]["embedding_scale"] is None
        # empty -> empty with scale 0, not a null scale
        assert got[2]["embedding_q8"] == []
        assert got[2]["embedding_scale"] == 0.0
        # NULL vector stays NULL
        assert got[3]["embedding_q8"] is None
        # well-formed row unaffected (half-up: -63.5 + 0.5 -> -63)
        assert got[4]["embedding_q8"] == [127, -63]

    def test_strict_raises_on_nan(self, spark):
        from py4j.protocol import Py4JJavaError

        df = spark.createDataFrame(
            [(1, [1.0, float("nan")])], "vec_id long, embedding array<double>"
        )
        with pytest.raises((Py4JJavaError, Exception), match="NaN element"):
            quantize_int8(df, strict=True).collect()


class TestLineDedupe:
    def test_multiline_semantics(self, spark):
        docs = spark.createDataFrame(
            [
                (1, "keep me\ncommon line\nunique a"),
                (2, "common line\nunique b"),
                (3, "solo doc"),
                (4, "common line"),
                (5, None),
            ],
            "doc_id long, text string",
        )
        got = {r["doc_id"]: r for r in line_dedupe(docs, max_docs=1).collect()}
        assert got[1]["text"] == "keep me\nunique a"
        assert got[1]["lines_removed"] == 1
        assert got[2]["text"] == "unique b"
        # untouched doc round-trips byte-for-byte
        assert got[3]["text"] == "solo doc" and got[3]["lines_removed"] == 0
        # fully-emptied doc survives with empty text, never disappears
        assert got[4]["text"] == "" and got[4]["lines_removed"] == 1
        assert got[5]["text"] == ""

    def test_order_preserved_and_threshold(self, spark):
        docs = spark.createDataFrame(
            [(i, "top\nmid{}\nbottom".format(i)) for i in range(1, 5)],
            "doc_id long, text string",
        )
        # threshold 3: 'top'/'bottom' occur in 4 docs -> dropped; mids stay
        got = {r["doc_id"]: r for r in line_dedupe(docs, max_docs=3).collect()}
        assert got[2]["text"] == "mid2" and got[2]["lines_removed"] == 2
        # threshold 4: nothing crosses, every doc intact incl. line order
        intact = {r["doc_id"]: r for r in line_dedupe(docs, max_docs=4).collect()}
        assert intact[2]["text"] == "top\nmid2\nbottom"
        assert intact[2]["lines_removed"] == 0

    def test_empty_segments_counted(self, spark):
        # interior/trailing empty lines are real lines: common across
        # docs -> removed like any other duplicate line
        docs = spark.createDataFrame(
            [(1, "a\n\nb"), (2, "c\n\nd")], "doc_id long, text string"
        )
        got = {r["doc_id"]: r for r in line_dedupe(docs, max_docs=1).collect()}
        assert got[1]["text"] == "a\nb" and got[1]["lines_removed"] == 1

    def test_custom_delimiter(self, spark):
        docs = spark.createDataFrame(
            [(1, "x y z"), (2, "x q z")], "doc_id long, text string"
        )
        got = {
            r["doc_id"]: r
            for r in line_dedupe(docs, delimiter=" ", max_docs=1).collect()
        }
        assert got[1]["text"] == "y" and got[1]["lines_removed"] == 2


class TestUnigramLogprob:
    def test_exact_small_corpus(self, spark):
        docs = spark.createDataFrame(
            [(1, "a a b"), (2, "b c"), (3, None)], "doc_id long, text string"
        )
        # corpus: a=2, b=2, c=1, total=5
        got = {r["doc_id"]: r for r in unigram_logprob(docs).collect()}
        lp = lambda c: round(math.log(c / 5), 6)  # noqa: E731
        assert got[1]["n_tokens"] == 3
        assert got[1]["avg_logprob"] == pytest.approx(
            round((2 * lp(2) + lp(2)) / 3, 6), abs=2e-6
        )
        assert got[2]["avg_logprob"] == pytest.approx(
            round((lp(2) + lp(1)) / 2, 6), abs=2e-6
        )
        # empty doc: zero tokens, NULL score — never dropped
        assert got[3]["n_tokens"] == 0 and got[3]["avg_logprob"] is None

    def test_common_beats_rare(self, spark):
        docs = spark.createDataFrame(
            [(1, "the the the the"), (2, "qzx vbn")], "doc_id long, text string"
        )
        got = {r["doc_id"]: r["avg_logprob"] for r in unigram_logprob(docs).collect()}
        assert got[1] > got[2]


# -- document chunking -------------------------------------------------------


def test_chunk_documents_reconstructs_and_overlaps(spark):
    from gecko_spark.operators.text import chunk_documents

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    chunks = chunk_documents(docs, max_chars=100, overlap=20)
    pdf = chunks.toPandas().sort_values(["doc_id", "chunk_id"])
    texts = {r["doc_id"]: r["text"] for r in docs.collect()}
    step = 80
    for doc_id, grp in pdf.groupby("doc_id"):
        full = texts[doc_id]
        ids = grp["chunk_id"].tolist()
        assert ids == list(range(len(ids)))  # contiguous 0-based
        # chunk i is exactly the substring window it claims to be
        for _, r in grp.iterrows():
            start = int(r["chunk_id"]) * step
            assert r["chunk"] == full[start : start + 100]
        # stripped-overlap concatenation reconstructs the document
        rebuilt = "".join(
            (c if i == 0 else c[20:]) for i, c in enumerate(grp["chunk"])
        )
        assert rebuilt == full
    # every doc is represented, even without long texts
    assert set(pdf["doc_id"]) == set(texts)


def test_sentence_chunks_matches_python_model(spark):
    import re as _re

    from gecko_spark.operators.text import _SENTENCE_RE, sentence_chunks

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    out = (
        sentence_chunks(docs, max_chars=120)
        .toPandas()
        .sort_values(["doc_id", "chunk_id"])
    )
    texts = {r["doc_id"]: r["text"] for r in docs.collect()}
    pat = _re.compile(_SENTENCE_RE.replace(r"\z", r"\Z"))  # Python \Z == Java \z

    def model(text):
        sents = pat.findall(text or "")
        chunks, pos = {}, 0
        for s in sents:
            chunks.setdefault(pos // 120, []).append(s)
            pos += len(s)
        return {cid: "".join(ss) for cid, ss in chunks.items()} or {0: ""}

    for doc_id, grp in out.groupby("doc_id"):
        want = model(texts[doc_id])
        got = dict(zip(grp["chunk_id"], grp["chunk"]))
        assert got == want, doc_id
        # boundaries are sentence boundaries: concatenation rebuilds
        assert "".join(grp.sort_values("chunk_id")["chunk"]) == (
            texts[doc_id] or ""
        ) or texts[doc_id] is None
    assert set(out["doc_id"]) == set(texts)


def test_sentence_chunks_edges(spark):
    from gecko_spark.operators.text import sentence_chunks

    rows = [
        (1, None),                      # NULL -> one empty chunk
        (2, ""),                        # empty -> one empty chunk
        (3, "No terminal punctuation"),  # tail-only
        (4, "Tiny. " + "x" * 500 + ". End."),  # giant sentence stays whole
        (5, "Ends with newline.\n"),    # \z vs $ divergence guard
        (6, "...Leading dots. Then text."),  # leading punct must survive
        (7, "!!!"),                     # punctuation-only doc
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = sentence_chunks(df, max_chars=50).toPandas()
    byid = {
        i: g.sort_values("chunk_id") for i, g in out.groupby("doc_id")
    }
    assert list(byid[1]["chunk"]) == [""] and list(byid[1]["n_sentences"]) == [0]
    assert list(byid[2]["chunk"]) == [""]
    assert list(byid[3]["chunk"]) == ["No terminal punctuation"]
    four = list(byid[4]["chunk"])
    assert "".join(four) == rows[3][1]
    assert any(len(c) > 50 for c in four)  # the giant sentence is whole
    assert "".join(byid[5]["chunk"]) == "Ends with newline.\n"
    # the regex's * first branch: leading punctuation is its own
    # sentence, not silently dropped (round-11 extension review find)
    assert "".join(byid[6]["chunk"]) == rows[5][1]
    assert "".join(byid[7]["chunk"]) == "!!!"
    import pytest as _pt

    with _pt.raises(ValueError, match="max_chars"):
        sentence_chunks(df, max_chars=0)


def test_chunk_documents_empty_and_validation(spark):
    from gecko_spark.operators.text import chunk_documents

    df = spark.createDataFrame([(1, "")], "doc_id long, text string")
    out = chunk_documents(df, max_chars=8, overlap=2).collect()
    assert len(out) == 1 and out[0]["chunk"] == "" and out[0]["chunk_id"] == 0
    with pytest.raises(ValueError, match="overlap"):
        chunk_documents(df, max_chars=8, overlap=8)
    with pytest.raises(ValueError, match="max_chars"):
        chunk_documents(df, max_chars=0, overlap=-1)


def test_chunk_documents_tokens_windows_and_reconstruction(spark):
    from gecko_spark.operators.text import chunk_documents_tokens

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    chunks = chunk_documents_tokens(docs, max_tokens=20, overlap=5)
    pdf = chunks.toPandas().sort_values(["doc_id", "chunk_id"])
    texts = {r["doc_id"]: r["text"] for r in docs.collect()}
    step = 15
    for doc_id, grp in pdf.groupby("doc_id"):
        toks = texts[doc_id].split(" ")
        assert grp["chunk_id"].tolist() == list(range(len(grp)))
        for _, r in grp.iterrows():
            start = int(r["chunk_id"]) * step
            assert r["chunk"] == " ".join(toks[start : start + 20])
        rebuilt = []
        for i, c in enumerate(grp["chunk"]):
            parts = c.split(" ")
            rebuilt.extend(parts if i == 0 else parts[5:])
        assert rebuilt == toks
    assert set(pdf["doc_id"]) == set(texts)


def test_chunk_documents_tokens_validation(spark):
    from gecko_spark.operators.text import chunk_documents_tokens

    df = spark.createDataFrame([(1, "a b")], "doc_id long, text string")
    with pytest.raises(ValueError, match="overlap"):
        chunk_documents_tokens(df, max_tokens=4, overlap=4)


# ---------------------------------------------------------------------------
# HTML stripping + URL normalization (round 5)
# ---------------------------------------------------------------------------


class TestStripHtml:
    def test_strips_markup_keeps_text(self, spark):
        from gecko_spark.operators.text import strip_html

        rows = [
            (1, '<html><head><style>p{color:red}</style>'
                '<script src=x>var a=1 && 2;</script></head>'
                '<body><p class="x">Hello &amp; welcome</p>'
                '<!-- note --><b>world</b></body></html>'),
            (2, "plain text, no markup"),
            (3, "a &amp;lt; b &#39;q&#39; &nbsp; c"),
            (4, None),
        ]
        df = spark.createDataFrame(rows, "doc_id long, text string")
        got = {
            r["doc_id"]: r["clean"]
            for r in df.select(
                "doc_id", strip_html(F.col("text")).alias("clean")
            ).collect()
        }
        assert got[1] == "Hello & welcome world"
        assert got[2] == "plain text, no markup"
        # double-escaped &amp;lt; decodes to the LITERAL &lt;, not <
        assert got[3] == "a &lt; b 'q' c"
        assert got[4] == ""

    def test_tag_boundary_becomes_space(self, spark):
        from gecko_spark.operators.text import strip_html

        df = spark.createDataFrame([("a</p><p>b",)], "text string")
        assert df.select(strip_html(F.col("text")).alias("c")).first()["c"] == "a b"


class TestUrlOps:
    def test_normalize_and_parts(self, spark):
        from gecko_spark.operators.text import (
            normalize_url,
            url_host,
            url_registered_domain,
            url_scheme,
        )

        rows = [
            (1, "HTTPS://WWW.Example.COM:443/Path/To?utm_source=x&id=3&utm_medium=y#frag"),
            (2, "http://user@host.example.org:80/a?utm_a=1&utm_b=2&c=3"),
            (3, "http://single:8080/x?a=1&utm_z=9"),
            (4, "not a url"),
            (5, None),
        ]
        df = spark.createDataFrame(rows, "i long, url string")
        u = F.col("url")
        got = {
            r["i"]: r
            for r in df.select(
                "i",
                normalize_url(u).alias("n"),
                url_host(u).alias("h"),
                url_registered_domain(u).alias("d"),
                url_scheme(u).alias("s"),
            ).collect()
        }
        # case, default port, fragment, and BOTH utm params (one of them
        # leading — the '?'-promotion fix-up) are gone; real param stays
        assert got[1]["n"] == "https://www.example.com/Path/To?id=3"
        assert got[1]["h"] == "www.example.com"
        assert got[1]["d"] == "example.com"
        assert got[1]["s"] == "https"
        # consecutive leading utm params, userinfo preserved in normalize
        assert got[2]["n"] == "http://user@host.example.org/a?c=3"
        assert got[2]["h"] == "host.example.org"
        # non-default port survives; trailing utm strip leaves no dangler
        assert got[3]["n"] == "http://single:8080/x?a=1"
        assert got[3]["d"] == "single"  # single-label fallback
        assert got[4]["n"] == "not a url" and got[4]["h"] == ""
        assert got[5]["n"] == ""


class TestSplitDataset:
    def test_fractions_and_determinism(self, spark):
        from gecko_spark.core import LcgRandom
        from gecko_spark.operators.sampling import split_dataset

        df = spark.range(0, 20_000).withColumnRenamed("id", "k")
        splits = [("train", 0.8), ("val", 0.1), ("test", 0.1)]
        out = split_dataset(df, splits, rand=LcgRandom("k", 7))
        counts = {r["split"]: r["n"] for r in
                  out.groupBy("split").agg(F.count("*").alias("n")).collect()}
        assert set(counts) == {"train", "val", "test"}
        assert abs(counts["train"] / 20_000 - 0.8) < 0.02
        assert abs(counts["val"] / 20_000 - 0.1) < 0.01
        # membership is a pure function of the key: repartitioning the
        # input cannot move a row across the train/test boundary
        again = split_dataset(df.repartition(13), splits, rand=LcgRandom("k", 7))
        assert out.join(again.withColumnRenamed("split", "s2"), "k").filter(
            F.col("split") != F.col("s2")
        ).count() == 0

    def test_append_stability(self, spark):
        from gecko_spark.core import LcgRandom
        from gecko_spark.operators.sampling import split_dataset

        splits = [("train", 0.9), ("test", 0.1)]
        small = spark.range(0, 1000).withColumnRenamed("id", "k")
        big = spark.range(0, 5000).withColumnRenamed("id", "k")
        a = split_dataset(small, splits, rand=LcgRandom("k", 3))
        b = split_dataset(big, splits, rand=LcgRandom("k", 3))
        assert a.join(b.withColumnRenamed("split", "s2"), "k").filter(
            F.col("split") != F.col("s2")
        ).count() == 0

    def test_validation(self, spark):
        from gecko_spark.core import LcgRandom
        from gecko_spark.operators.sampling import split_dataset

        df = spark.range(3).withColumnRenamed("id", "k")
        r = LcgRandom("k", 1)
        with pytest.raises(ValueError, match="sum to 1"):
            split_dataset(df, [("a", 0.5), ("b", 0.4)], rand=r)
        with pytest.raises(ValueError, match="duplicate"):
            split_dataset(df, [("a", 0.5), ("a", 0.5)], rand=r)
        with pytest.raises(ValueError, match="> 0"):
            split_dataset(df, [("a", 1.5), ("b", -0.5)], rand=r)


class TestClusterRepresentatives:
    def test_picks_best_quality_member(self, spark):
        from gecko_spark.operators.dedup import select_representatives

        labels = spark.createDataFrame(
            [(1, 1), (2, 1), (3, 1), (7, 7), (9, 7)], "node long, component long"
        )
        docs = spark.createDataFrame(
            [(1, 10), (2, 99), (3, 50), (7, 5), (9, 5)], "doc_id long, q long"
        )
        got = {
            r["cluster_id"]: r
            for r in select_representatives(
                labels, docs, "doc_id",
                [F.col("q").desc(), F.col("doc_id").asc()],
            ).collect()
        }
        assert got[1]["rep_id"] == 2 and got[1]["n_members"] == 3
        # quality tie inside cluster 7 → min doc_id wins
        assert got[7]["rep_id"] == 7 and got[7]["n_members"] == 2

    def test_minhash_cluster_representatives_e2e(self, spark):
        from gecko_spark.operators.dedup import (
            minhash_cluster_representatives,
            minhash_dedupe_transitive,
        )

        base = "the quick brown fox jumps over the lazy dog " * 6
        rows = [
            (1, base + "alpha"),
            (2, base + "alphq"),           # near-dup of 1, shorter quality
            (3, base + "alpha beta gamma"),  # near-dup of 1, LONGEST
            (4, "completely different content about spark plans " * 5),
        ]
        docs = spark.createDataFrame(rows, "doc_id long, text string").withColumn(
            "n_chars", F.length("text")
        )
        reps = minhash_cluster_representatives(
            docs, "doc_id", "text", "n_chars",
            threshold=0.5, on_nonconvergence="raise",
        ).collect()
        assert len(reps) == 1
        assert reps[0]["rep_id"] == 3 and reps[0]["n_members"] == 3
        # agreement with min-id transitive dedupe on CLUSTERING (not choice):
        # the same 3 docs form one cluster there too (survivor = min id 1)
        kept = {
            r["doc_id"]
            for r in minhash_dedupe_transitive(
                docs, "doc_id", "text", threshold=0.5
            ).collect()
        }
        assert kept == {1, 4}


class TestFingerprintOverlapPairs:
    def test_planted_near_dup_found(self, spark):
        from gecko_spark.operators.dedup import fingerprint_overlap_pairs

        base = "the quick brown fox jumps over the lazy dog again and again"
        rows = [
            (1, base),
            (2, base.replace("lazy", "hazy")),      # local edit — most windows survive
            (3, "entirely different material about catalyst optimizer rules"),
        ]
        docs = spark.createDataFrame(rows, "doc_id long, text string")
        pairs = fingerprint_overlap_pairs(
            docs, "doc_id", "text", window=8, keep=16, min_shared=4
        ).collect()
        assert {(r["id_a"], r["id_b"]) for r in pairs} == {(1, 2)}
        p = pairs[0]
        assert p["n_shared"] >= 4 and 0 < p["overlap"] <= 1.0

    def test_hot_fingerprint_guard_drops_boilerplate(self, spark):
        from gecko_spark.operators.dedup import fingerprint_overlap_pairs

        # every doc shares the same header; bodies are all distinct —
        # with the guard the boilerplate fps (shared by all 12 docs)
        # are dropped and no pair survives
        hdr = "standard corporate header boilerplate line v1.0 "
        rows = [(i, hdr + f"unique body {i} " + "x" * i + f" tail {i*7919}") for i in range(12)]
        docs = spark.createDataFrame(rows, "doc_id long, text string")
        guarded = fingerprint_overlap_pairs(
            docs, "doc_id", "text", window=8, keep=16, min_shared=4, max_df=6
        ).count()
        unguarded = fingerprint_overlap_pairs(
            docs, "doc_id", "text", window=8, keep=16, min_shared=4
        ).count()
        assert guarded == 0 and unguarded > 0

    def test_validation(self, spark):
        from gecko_spark.operators.dedup import fingerprint_overlap_pairs

        docs = spark.createDataFrame([(1, "abc")], "doc_id long, text string")
        with pytest.raises(ValueError, match="min_shared"):
            fingerprint_overlap_pairs(docs, "doc_id", "text", min_shared=0)
        with pytest.raises(ValueError, match="keep"):
            fingerprint_overlap_pairs(docs, "doc_id", "text", keep=2, min_shared=4)


class TestFilterByDomain:
    def test_block_and_allow(self, spark):
        from gecko_spark.operators.text import filter_by_domain

        rows = [
            (1, "https://www.spam.example/buy"),
            (2, "https://docs.good.org/page"),
            (3, "http://sub.a.spam.example/x"),  # caught via registered domain
            (4, "https://other.net/y"),
        ]
        df = spark.createDataFrame(rows, "i long, url string")
        blocked = {r["i"] for r in filter_by_domain(df, "url", blocklist=["spam.example"]).collect()}
        assert blocked == {2, 4}
        allowed = {r["i"] for r in filter_by_domain(df, "url", allowlist=["good.org"]).collect()}
        assert allowed == {2}
        # DataFrame-shaped list → broadcast anti-join path
        bl = spark.createDataFrame([("SPAM.example",)], "domain string")
        assert {r["i"] for r in filter_by_domain(df, "url", blocklist=bl).collect()} == {2, 4}
        with pytest.raises(ValueError, match="blocklist"):
            filter_by_domain(df, "url")


class TestVocabDivergence:
    def test_shifted_term_ranks_first(self, spark):
        from gecko_spark.operators.text import vocab_divergence

        a = spark.createDataFrame(
            [(i, "common words everywhere plus NOVEL token") for i in range(20)],
            "doc_id long, text string",
        )
        b = spark.createDataFrame(
            [(i, "common words everywhere plus boring filler") for i in range(20)],
            "doc_id long, text string",
        )
        out = vocab_divergence(a, b, k=3).collect()
        assert out[0]["term"] == "novel" and out[0]["rank"] == 1
        assert out[0]["cnt_a"] == 20 and out[0]["cnt_b"] == 0
        assert out[0]["contrib"] > 0
        # ranks are densely 1..k and descending by contrib
        assert [r["rank"] for r in out] == [1, 2, 3]
        assert all(out[i]["contrib"] >= out[i+1]["contrib"] for i in range(2))

    def test_identical_corpora_near_zero(self, spark):
        from gecko_spark.operators.text import vocab_divergence

        a = spark.createDataFrame(
            [(i, "same text every time") for i in range(10)],
            "doc_id long, text string",
        )
        out = vocab_divergence(a, a, k=10).collect()
        assert all(abs(r["contrib"]) < 1e-9 for r in out)
        with pytest.raises(ValueError, match="k must"):
            vocab_divergence(a, a, k=0)

    def test_tie_boundary_deterministic(self, spark):
        """Ties at the top-k limit boundary break on term ascending —
        the TakeOrderedAndProject cut and the rank window must agree,
        or the boundary row would be arbitrary across runs."""
        from gecko_spark.operators.text import vocab_divergence

        # four terms exclusive to A with identical counts -> identical
        # rounded contribs; k=2 slices the tie set mid-group
        a = spark.createDataFrame(
            [(0, "zeta yankee xray walt"), (1, "zeta yankee xray walt")],
            "doc_id long, text string",
        )
        b = spark.createDataFrame([(0, "base")], "doc_id long, text string")
        first = vocab_divergence(a, b, k=2).collect()
        second = vocab_divergence(a, b, k=2).collect()
        assert [tuple(r) for r in first] == [tuple(r) for r in second]
        assert [r["term"] for r in first] == ["walt", "xray"]  # term asc
        assert [r["rank"] for r in first] == [1, 2]

    def test_one_sided_corpus(self, spark):
        """Terms absent from one side still score via Laplace smoothing
        (empty-side corpus: every A term is maximally over-represented)."""
        from gecko_spark.operators.text import vocab_divergence

        a = spark.createDataFrame(
            [(0, "alpha alpha beta")], "doc_id long, text string"
        )
        b = spark.createDataFrame(
            [(0, "")], "doc_id long, text string"
        )
        out = vocab_divergence(a, b, k=5).collect()
        assert {r["term"] for r in out} == {"alpha", "beta"}
        assert all(r["cnt_b"] == 0 for r in out)
        # alpha (2 of 3 tokens) is over-represented vs the smoothed
        # uniform baseline -> positive contrib and rank 1; beta (1 of 3)
        # sits BELOW the smoothed q=1/2 -> legitimately negative contrib
        assert out[0]["term"] == "alpha" and out[0]["contrib"] > 0
        assert out[1]["term"] == "beta" and out[1]["contrib"] < 0


class TestGroupedSplitLeakage:
    def test_near_dups_share_split(self, spark):
        """The leakage property sample_split_grouped exists for: every
        member of a near-dup cluster lands in the SAME split."""
        from gecko_spark.core import LcgRandom
        from gecko_spark.operators.dedup import (
            connected_components,
            minhash_candidate_pairs,
        )
        from gecko_spark.operators.sampling import split_dataset

        base = "the quick brown fox jumps over the lazy dog once more " * 4
        rows = [(i, base + f"tail {i % 3}") for i in range(30)]  # 3 clusters of 10
        docs = spark.createDataFrame(rows, "doc_id long, text string")
        pairs = minhash_candidate_pairs(docs, "doc_id", "text").filter(
            F.col("est_jaccard") >= 0.8
        )
        labels = connected_components(pairs, on_nonconvergence="raise")
        grouped = (
            docs.select("doc_id")
            .join(labels.withColumnRenamed("node", "doc_id"), "doc_id", "left")
            .withColumn("grp", F.coalesce("component", "doc_id"))
        )
        out = split_dataset(
            grouped, [("train", 0.5), ("test", 0.5)], rand=LcgRandom("grp", 9)
        )
        # within every cluster the split is constant
        assert (
            out.groupBy("grp")
            .agg(F.countDistinct("split").alias("n"))
            .filter(F.col("n") > 1)
            .count()
            == 0
        )


class TestCompressionRatio:
    def test_redundant_text_compresses_more(self, spark):
        from gecko_spark.operators.text import compression_ratio

        rows = [
            (1, "spam spam spam spam " * 50),                      # highly redundant
            (2, "The committee reviewed seventeen distinct proposals regarding "
                "watershed management, each offering unique trade-offs between "
                "cost, ecological impact, and long-term maintenance burden."),
            (3, ""),
            (4, None),
        ]
        df = spark.createDataFrame(rows, "i long, text string")
        got = {
            r["i"]: r["cr"]
            for r in df.select(
                "i", compression_ratio(F.col("text")).alias("cr")
            ).collect()
        }
        assert got[1] < 0.1                      # template spam crushes
        assert 0.3 < got[2] < 1.1                # prose doesn't
        assert got[3] == 1.0 and got[4] is None
        # deterministic across evaluations
        again = {
            r["i"]: r["cr"]
            for r in df.repartition(3).select(
                "i", compression_ratio(F.col("text")).alias("cr")
            ).collect()
        }
        assert got == again


class TestShuffleRanked:
    def test_matches_global_window_and_is_permutation(self, spark):
        from pyspark.sql import Window
        from gecko_spark.core import LcgRandom
        from gecko_spark.operators.sampling import shuffle_ranked

        df = spark.range(0, 20_000).withColumnRenamed("id", "k")
        rand = LcgRandom("k", 5)
        out = shuffle_ranked(df, "k", rand, buckets=32)
        u = rand.uniform(11)
        ref = df.withColumn(
            "r", F.row_number().over(Window.orderBy(u.asc(), F.col("k").asc())) - 1
        )
        assert (
            out.join(ref, "k").filter(F.col("shuffle_rank") != F.col("r")).count()
            == 0
        )
        stats = out.agg(
            F.min("shuffle_rank").alias("lo"),
            F.max("shuffle_rank").alias("hi"),
            F.countDistinct("shuffle_rank").alias("d"),
        ).first()
        assert (stats["lo"], stats["hi"], stats["d"]) == (0, 19_999, 20_000)

    def test_partition_layout_independent(self, spark):
        from gecko_spark.core import LcgRandom
        from gecko_spark.operators.sampling import shuffle_ranked

        df = spark.range(0, 5_000).withColumnRenamed("id", "k")
        a = shuffle_ranked(df, "k", LcgRandom("k", 9), buckets=16)
        b = shuffle_ranked(df.repartition(11), "k", LcgRandom("k", 9), buckets=16)
        assert (
            a.join(b.withColumnRenamed("shuffle_rank", "r2"), "k")
            .filter(F.col("shuffle_rank") != F.col("r2"))
            .count()
            == 0
        )
        with pytest.raises(ValueError, match="buckets"):
            shuffle_ranked(df, "k", LcgRandom("k", 9), buckets=0)


# --- main-content extraction (boilerplate-block removal) --------------------

from gecko_spark.operators.text import (  # noqa: E402
    _extract_main_py,
    extract_main_content,
)


_PAGE = """
<html><head><title>My Site</title><style>p{color:red}</style>
<script>var x = "not content";</script></head><body>
<nav><ul><li><a href="/">Home</a></li><li><a href="/about">About</a></li>
<li><a href="/contact">Contact us right here</a></li></ul></nav>
<article>
<h2>The actual story</h2>
<p>This is the first real paragraph of the article body, long enough to
pass the minimum block length threshold with no links inside it.</p>
<p>A second paragraph with <a href="/r">one link</a> but mostly plain
prose that keeps the overall link density comfortably low.</p>
</article>
<aside><a href="/ad1">Sponsored</a> <a href="/ad2">More ads</a></aside>
<footer>(c) 2024 Site. <a href="/privacy">Privacy</a></footer>
</body></html>
"""


def test_extract_main_kernel_keeps_content_drops_boilerplate():
    out = _extract_main_py(_PAGE, 40, 0.35)
    assert "first real paragraph" in out and "second paragraph" in out
    assert "The actual story" in out  # heading promoted by next-good block
    for boiler in ("Home", "About", "Sponsored", "Privacy", "My Site",
                   "color:red", "not content"):
        assert boiler not in out
    # blocks arrive in document order, newline-joined
    assert out.index("actual story") < out.index("first real")


def test_extract_main_kernel_edges():
    assert _extract_main_py("", 40, 0.35) == ""
    assert _extract_main_py("<<<>>>&&& <p", 40, 0.35) == ""
    plain = ("word " * 30).strip()
    assert _extract_main_py(plain, 40, 0.35) == plain
    # all-link page -> nothing survives the density gate
    links = "<p>" + " ".join(f'<a href="/{i}">some linked text {i}</a>'
                             for i in range(20)) + "</p>"
    assert _extract_main_py(links, 40, 0.35) == ""
    # heading with NO following good block is dropped (no promotion)
    assert _extract_main_py("<h1>Lonely heading</h1><p>tiny</p>", 40, 0.35) == ""


def test_extract_main_thresholds():
    page = "<p>short but real text</p>"
    assert _extract_main_py(page, 40, 0.35) == ""          # under min length
    assert _extract_main_py(page, 10, 0.35) != ""          # relaxed keeps it
    linky = '<p>half of this block is <a href="/x">a pretty long link text here</a></p>'
    assert _extract_main_py(linky, 10, 0.35) == ""         # density gate
    assert _extract_main_py(linky, 10, 0.9) != ""          # relaxed keeps it


def test_extract_main_content_column(spark):
    df = spark.createDataFrame(
        [(1, _PAGE), (2, None), (3, "<p>" + "plain body text " * 10 + "</p>")],
        "id int, html string",
    )
    pdf = (df.select("id", extract_main_content(F.col("html")).alias("main"))
           .toPandas().set_index("id"))
    assert "first real paragraph" in pdf.loc[1, "main"]
    assert pdf.loc[2, "main"] == ""          # null -> ''
    assert pdf.loc[3, "main"].startswith("plain body text")
    plan = df.select(extract_main_content(F.col("html")))._jdf.queryExecution() \
             .executedPlan().toString()
    assert "ArrowEvalPython" in plan         # Arrow-batched, not row-by-row


def test_extract_main_fixture_parity(spark):
    """The committed fixture's planted expectations reproduce exactly —
    the same contract `text_main_content` grades driver-side."""
    import os as _os
    fix = _os.path.join(_os.path.dirname(__file__), "fixtures",
                        "html_pages.parquet")
    pdf = spark.read.parquet(fix).toPandas()
    got = pdf["html"].map(lambda h: _extract_main_py(h, 40, 0.35))
    assert (got == pdf["expected_main"]).all()


# --- bigram LM quality score ------------------------------------------------

from gecko_spark.operators.text import bigram_logprob, unigram_logprob  # noqa: E402


def test_bigram_logprob_ranks_word_order(spark):
    """Shuffled text with an IDENTICAL unigram profile must score far
    below natural prose under the bigram model — the signal unigram
    scoring cannot provide."""
    nat = "the cat sat on the mat and the dog lay on the rug"
    rows = [(i, nat) for i in range(1, 9)]
    rows.append((9, "mat the on dog sat the rug cat lay the and on the"))
    rows += [(10, ""), (11, "the"), (12, None)]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    bi = bigram_logprob(docs).toPandas().set_index("doc_id")
    un = unigram_logprob(docs).toPandas().set_index("doc_id")
    # unigram: indistinguishable; bigram: wide gap
    assert abs(un.loc[8, "avg_logprob"] - un.loc[9, "avg_logprob"]) < 0.05
    assert bi.loc[8, "avg_logprob"] > bi.loc[9, "avg_logprob"] + 0.5
    # edges: empty/null -> 0 tokens + NULL score; singleton -> unigram
    assert bi.loc[10, "n_tokens"] == 0 and bi.loc[12, "n_tokens"] == 0
    assert bi.loc[11, "n_tokens"] == 1


def test_bigram_logprob_matches_hand_model(spark):
    """Exact check on a corpus small enough to compute by hand."""
    import math

    docs = spark.createDataFrame(
        [(1, "a b a b"), (2, "a b x")], "doc_id long, text string"
    )
    out = bigram_logprob(docs).toPandas().set_index("doc_id")
    # counts: uni a=3 b=3 x=1, T=7; bigrams: ab=3, ba=1, bx=1; ctx a=3 b=2... 
    # wait: pairs per doc1: (a,b),(b,a),(a,b); doc2: (a,b),(b,x)
    # big: ab=3, ba=1, bx=1; ctx: a->3, b->2
    def lp(x):
        return round(math.log(x), 6)

    d1 = (lp(3 / 7) + lp(3 / 3) + lp(1 / 2) + lp(3 / 3)) / 4  # a | b|a | a|b | b|a
    d2 = (lp(3 / 7) + lp(3 / 3) + lp(1 / 2)) / 3
    assert abs(out.loc[1, "avg_logprob"] - round(d1, 6)) < 1e-9
    assert abs(out.loc[2, "avg_logprob"] - round(d2, 6)) < 1e-9


def test_bigram_logprob_partition_invariance(spark):
    docs = spark.createDataFrame(
        [(i, f"tok{i % 5} tok{(i + 1) % 5} tok{(i + 2) % 5} filler word")
         for i in range(200)],
        "doc_id long, text string",
    )
    a = bigram_logprob(docs.repartition(1)).toPandas().sort_values("doc_id",
                                                                   ignore_index=True)
    b = bigram_logprob(docs.repartition(13)).toPandas().sort_values("doc_id",
                                                                    ignore_index=True)
    assert (a["avg_logprob"] == b["avg_logprob"]).all()


# --- BPE tokenization -------------------------------------------------------

from gecko_spark.operators.text import (  # noqa: E402
    _bpe_encode_word,
    bpe_tokens,
    bpe_train,
    bpe_vocab,
)


def test_bpe_train_learns_frequent_pairs(spark):
    rows = [(i, "the cat then that the then the that lethe")
            for i in range(30)]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    merges = bpe_train(docs, n_merges=10, sample_rows=100)
    assert ("t", "h") in merges[:3]          # dominant pair merges early
    # determinism: identical merges under any partitioning
    assert bpe_train(docs.repartition(7), n_merges=10, sample_rows=100) == merges
    # encode round-trips losslessly (</w> marks word ends)
    out = (docs.limit(1)
           .select(bpe_tokens(F.col("text"), merges).alias("tk"))
           .collect()[0].tk)
    assert "".join(out).replace("</w>", " ").strip() == \
        "the cat then that the then the that lethe"
    v = bpe_vocab(merges, "abcdefghijklmnopqrstuvwxyz")
    assert all(t in v for t in out)
    assert len(set(v.values())) == len(v)    # ids are distinct


def test_bpe_encode_word_rank_priority():
    """Rank beats position: (ab,c</w>) rank 1 fires at the later site
    before (ab,c) rank 2 at the earlier one."""
    ranks = {("a", "b"): 0, ("ab", "c</w>"): 1, ("ab", "c"): 2}
    assert _bpe_encode_word("abcabc", ranks) == ("abc", "abc</w>")
    assert _bpe_encode_word("ab", ranks) == ("a", "b</w>")  # marker blocks r0
    assert _bpe_encode_word("zq", {}) == ("z", "q</w>")     # unseen chars


def test_bpe_fixture_hand_cases(spark):
    """The committed hand-derived fixture reproduces exactly — the same
    contract text_bpe_tokens grades driver-side."""
    import os as _os
    fix = _os.path.join(_os.path.dirname(__file__), "fixtures",
                        "bpe_expected.parquet")
    merges = [("a", "b"), ("ab", "c</w>"), ("ab", "c")]
    pdf = (spark.read.parquet(fix)
           .select("text_id", "expected",
                   F.array_join(bpe_tokens(F.col("text"), merges), " ")
                   .alias("got"))
           .toPandas())
    assert (pdf["got"] == pdf["expected"]).all()


# --- Gopher quality rules ---------------------------------------------------

from gecko_spark.operators.text import gopher_quality_flags  # noqa: E402


def test_gopher_rules_fire_individually(spark):
    good = ("The quick brown fox jumps over the lazy dog and runs off to be "
            "with the pack of hounds that have come from far away today. ") * 3
    rows = [
        (1, good),
        (2, "short text"),                                    # word count
        (3, good.replace(" ", " # ")),                        # symbol ratio
        (4, "\n".join("* bullet line item" for _ in range(20)) + "\nplain"),
        (5, " ".join("aaaaaaaaaaaaaaaaaaaaaaa" for _ in range(60))),
        (6, None),
        (7, " ".join("123 456" for _ in range(40)) + " the to of and that"),
        (8, good + "\n" + "\n".join(f"line {i} goes on..." for i in range(9))),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    out = gopher_quality_flags(docs).toPandas().set_index("doc_id")
    assert out.loc[1, "passes"]
    assert not out.loc[2, "rule_word_count"]
    assert not out.loc[3, "rule_symbol_ratio"]
    assert not out.loc[4, "rule_bullet_lines"]
    assert not out.loc[5, "rule_mean_word_length"]
    assert not out.loc[5, "rule_stopwords"]
    assert out.loc[6, "n_words"] == 0 and not out.loc[6, "passes"]
    assert not out.loc[7, "rule_alpha_words"]
    assert not out.loc[8, "rule_ellipsis_lines"]  # 9/10 lines end ...
    # the gate is one narrow JVM projection: no shuffle, no Python
    plan = (gopher_quality_flags(docs)._jdf.queryExecution().executedPlan()
            .toString())
    assert "Exchange" not in plan and "Python" not in plan


# --- Gopher repetition rules ------------------------------------------------

from gecko_spark.operators.text import (  # noqa: E402
    _gopher_repetition_metrics,
    gopher_repetition_flags,
)


def test_gopher_repetition_kernel_hand_values():
    m = _gopher_repetition_metrics("same line\nsame line\nsame line\nother")
    assert abs(m["dup_line_frac"] - 2 / 4) < 1e-12
    # duplicated occurrences: 2 * len("same line") = 18 chars of 35
    assert abs(m["dup_line_char_frac"] - 18 / 35) < 1e-12
    m = _gopher_repetition_metrics("x y x y x y")
    # top 2-gram "x y" count 3, len 3; text len 11
    assert abs(m["top_2gram_char_frac"] - 9 / 11) < 1e-12
    # a top gram occurring once is NOT repetition
    m = _gopher_repetition_metrics("alpha beta gamma delta")
    assert m["top_2gram_char_frac"] == 0.0
    assert _gopher_repetition_metrics("")["dup_line_frac"] == 0.0


def test_gopher_repetition_flags(spark):
    rows = [
        (1, "alpha beta gamma\ndelta epsilon zeta\neta theta iota"),
        (2, "same line\nsame line\nsame line\nother"),
        (3, "spam phrase spam phrase spam phrase spam phrase end of doc"),
        (4, None),
        (5, "para one here\n\npara one here\n\npara two here"),
        (6, "a b c d e f g h i j a b c d e f g h i j xx yy zz"),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    out = gopher_repetition_flags(docs).toPandas().set_index("doc_id")
    assert out.loc[1, "passes"] and out.loc[4, "passes"]
    assert not out.loc[2, "rule_dup_line"]
    assert not out.loc[3, "rule_top_2gram"]
    assert not out.loc[5, "rule_dup_para"]
    assert not out.loc[6, "rule_dup_10gram"]
    plan = (gopher_repetition_flags(docs)._jdf.queryExecution()
            .executedPlan().toString())
    assert "Exchange" not in plan and "ArrowEvalPython" in plan


# --- C4 cleaning rules ------------------------------------------------------

from gecko_spark.operators.text import c4_clean  # noqa: E402


def test_c4_clean_rules(spark):
    rows = [
        (1, "This is a good sentence. Here is another one!\n"
            "And a third one here.\nShort.\nno terminal punct here\n"
            "A final proper sentence to reach five. Plus one more for luck."),
        (2, "Uses javascript to render. This needs javascript on.\n"
            "A plain fine sentence here. And more of them. Even more now. "
            "Another. Final one."),
        (3, "function() { return 1; }\nA sentence. Another. Third. Fourth. "
            "Fifth one."),
        (4, "Lorem Ipsum dolor sit amet. More sentences. Three. Four. "
            "Five now."),
        (5, None),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    out = c4_clean(docs).toPandas().set_index("doc_id")
    assert out.loc[1, "kept"] and out.loc[1, "n_lines_dropped"] == 2
    assert "no terminal" not in out.loc[1, "text_clean"]
    assert "javascript" not in out.loc[2, "text_clean"].lower()
    assert out.loc[2, "kept"]
    assert not out.loc[3, "kept"]   # curly-brace code page
    assert not out.loc[4, "kept"]   # lorem ipsum
    assert not out.loc[5, "kept"] and out.loc[5, "text_clean"] == ""
    plan = c4_clean(docs)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan and "Python" not in plan


class TestPerplexityBuckets:
    """CCNet head/middle/tail split (text.py::perplexity_buckets)."""

    def _df(self, spark):
        # two groups; en scores 9..1 (9 docs -> 3/3/3), de scores with a
        # tie pair straddling the head cut; one null-score doc
        rows = (
            [(i, "en", float(10 - i)) for i in range(1, 10)]
            + [(20, "de", 5.0), (21, "de", 5.0), (22, "de", 3.0)]
            + [(30, "en", None)]
        )
        return spark.createDataFrame(rows, "doc_id long, lang string, s double")

    def test_exact_terciles_and_ties(self, spark):
        from gecko_spark.operators.text import perplexity_buckets

        out = {
            r["doc_id"]: r["ppl_bucket"]
            for r in perplexity_buckets(self._df(spark), "s", ("lang",)).collect()
        }
        # en: 9 docs, thirds by descending score
        assert [out[i] for i in range(1, 10)] == (
            ["head"] * 3 + ["middle"] * 3 + ["tail"] * 3
        )
        # de: tied 5.0 pair -> c=2 for both, n=3: 3c=6 > n=3 and <= 2n=6
        # -> both middle (ties NEVER split across buckets); 3.0 -> tail
        assert out[20] == out[21] == "middle" and out[22] == "tail"
        assert out[30] == "tail"  # null score

    def test_threshold_mode_is_projection(self, spark):
        from gecko_spark.operators.text import perplexity_buckets

        df = self._df(spark)
        out = {
            r["doc_id"]: r["ppl_bucket"]
            for r in perplexity_buckets(df, "s", thresholds=(7.0, 4.0)).collect()
        }
        assert out[1] == out[2] == out[3] == "head"   # scores 9,8,7
        assert out[20] == "middle" and out[22] == "tail" and out[30] == "tail"
        plan = (
            perplexity_buckets(df, "s", thresholds=(7.0, 4.0))
            ._jdf.queryExecution().executedPlan().toString()
        )
        assert "Exchange" not in plan and "Python" not in plan


def test_bpe_train_full_corpus_mode(spark):
    """sample_rows=None trains on every row with no sampling pass, and
    the result equals hand-computed BPE on the word histogram."""
    docs = spark.createDataFrame(
        [(0, "ab ab ab"), (1, "abc")], "doc_id long, text string"
    )
    # words: ab x3, abc x1 -> pairs (a,b</w>)=3, (a,b)=1, (b,c</w>)=1;
    # only (a,b</w>) reaches the >=2 gate, then nothing repeats
    assert bpe_train(docs, n_merges=5, sample_rows=None) == [("a", "b</w>")]
    # None mode equals a sampled run that covers all rows
    big = spark.createDataFrame(
        [(i, "the cat then that") for i in range(20)], "doc_id long, text string"
    )
    assert bpe_train(big, n_merges=6, sample_rows=None) == bpe_train(
        big, n_merges=6, sample_rows=20
    )
    # null/empty texts contribute no words
    nulls = spark.createDataFrame(
        [(0, "ab ab"), (1, None), (2, "")], "doc_id long, text string"
    )
    assert bpe_train(nulls, n_merges=3, sample_rows=None) == [("a", "b</w>")]


# --- Unicode normalization ---------------------------------------------------


def test_normalize_unicode_and_strip_accents(spark):
    """Kernel output equals Python unicodedata AND DuckDB utf8proc on a
    case table spanning decomposed/precomposed/compat/multibyte/NULL —
    the cross-engine contract the text_unicode_normalize oracle rides."""
    import duckdb
    import unicodedata

    from gecko_spark.operators.text import normalize_unicode, strip_accents

    cases = [
        "café entrée",   # decomposed
        "café déjà",  # precomposed
        "ﬁne ｆｕｌｌ",  # ligature + fullwidth
        "Å and Å",        # ring above, composed + decomposed
        "汉字 plain ascii",
        "",
        None,
    ]
    df = spark.createDataFrame([(c,) for c in cases], "t string")
    got = (
        df.select(
            "t",
            normalize_unicode(F.col("t"), "NFC").alias("nfc"),
            strip_accents(F.col("t")).alias("sa"),
        )
        .collect()
    )
    con = duckdb.connect()
    for r in got:
        t = r["t"]
        if t is None:
            assert r["nfc"] is None and r["sa"] is None
            continue
        assert r["nfc"] == unicodedata.normalize("NFC", t)
        assert r["nfc"] == con.execute("SELECT nfc_normalize(?)", [t]).fetchone()[0]
        assert r["sa"] == con.execute("SELECT strip_accents(?)", [t]).fetchone()[0]


def test_normalize_unicode_forms_and_validation(spark):
    import unicodedata

    import pytest

    from gecko_spark.operators.text import normalize_unicode

    df = spark.createDataFrame([("ﬁ café",)], "t string")
    for form in ("NFC", "NFD", "NFKC", "NFKD"):
        out = df.select(normalize_unicode(F.col("t"), form).alias("o")).collect()
        assert out[0]["o"] == unicodedata.normalize(form, "ﬁ café")
    with pytest.raises(ValueError):
        normalize_unicode(F.col("t"), "NFX")


def test_tokens_null_safe(spark):
    """tokens(NULL) == tokens('') == [] — the phantom-NULL-pack fix
    (adversarial gate, round 11)."""
    from gecko_spark.operators.text import tokens, word_token_count

    df = spark.createDataFrame([(None,), ("",), ("one two",)], "t string")
    rows = df.select(
        tokens(F.col("t")).alias("tk"),
        word_token_count(F.col("t")).alias("n"),
    ).collect()
    assert [r["tk"] for r in rows] == [[], [], ["one", "two"]]
    assert [r["n"] for r in rows] == [0, 0, 2]
