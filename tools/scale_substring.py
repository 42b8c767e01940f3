"""Exact substring-span dedup at scale (round 10): price the stride-1
detection cost and the winnowing knob on the planted-near-dup corpus
(tools/scale_stress.make_corpus — ~24% mutant copies, each sharing a
long prefix or suffix with its original), with a built-in correctness
certificate: every generation-1 mutant (id = original + n_base) shares
a >= ~55-char span with its original, so the fraction of mutants whose
doc appears in the spans output is an exact planted recall.

Usage: python tools/scale_substring.py [n_base]   (default 500_000)
Prints SCALE.md rows; corpus cached under scratch/.

Round 11 adds the PATHOLOGICAL-DOC mode exercising the chunked
two-level merge (VERDICT r10 #6):

    python tools/scale_substring.py --pathological [mb]   (default 16)

one ``mb``-megabyte document with a planted mb/2-MB region shared with
a second doc — at stride-1 that is ~mb·2²⁰ flagged positions in ONE
doc, i.e. ceil(positions/2²²) level-1 merge groups where the old
single-level merge would have built one collect_list row of
8·positions bytes. Asserts the exact planted span boundaries and the
char-exact excision length.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, ".")
sys.path.insert(0, "tools")

from pyspark.sql import functions as F

from gecko_spark import get_spark
from gecko_spark.operators.dedup import (
    substring_dup_spans,
    substring_window_positions,
)
from scale_r6 import text_corpus


def pathological(mb: int) -> None:
    import numpy as np
    import pandas as pd

    from gecko_spark.operators.dedup import (
        _MERGE_CHUNK_POSITIONS,
        substring_dedupe,
    )

    rng = np.random.default_rng(11)
    letters = np.array(list("abcdefghijklmnopqrstuvwxyz "))
    digits = np.array(list("0123456789"))
    n = mb << 20
    # doc 1: letter-alphabet shell around a planted shared middle;
    # doc 2: digit-alphabet shell around the same shared region — the
    # disjoint shell alphabets make the planted region the ONLY
    # possible cross-doc window, so the span bounds are exact
    shared = "".join(rng.choice(letters, size=n // 2))
    pre = "".join(rng.choice(letters, size=n // 4))
    suf = "".join(rng.choice(letters, size=n - len(shared) - len(pre)))
    # shells share no window with doc 1 (digits), and the chars
    # adjacent to the shared region differ between docs by alphabet
    shell_a = "".join(rng.choice(digits, size=1000))
    shell_b = "".join(rng.choice(digits, size=1000))
    doc1 = pre + shared + suf
    doc2 = shell_a + shared + shell_b

    spark = get_spark(
        app_name="scale-substring-pathological",
        cpus=int(os.environ.get("SPARK_GRAFT_CPUS", "32")),
    )
    try:
        df = spark.createDataFrame(
            pd.DataFrame({"doc_id": [1, 2], "text": [doc1, doc2]})
        )
        n_pos_doc1 = len(doc1) - 39
        n_chunks = -(-n_pos_doc1 // _MERGE_CHUNK_POSITIONS)
        print(
            f"pathological: doc1 {len(doc1):,} chars (~{n_pos_doc1:,} stride-1 "
            f"positions -> {n_chunks} level-1 merge groups of <= "
            f"{_MERGE_CHUNK_POSITIONS:,}; single-level would collect one "
            f"{8 * n_pos_doc1 / 1e6:.0f} MB row), doc2 {len(doc2):,} chars",
            flush=True,
        )
        t0 = time.time()
        spans = sorted(
            (r["doc_id"], r["span_start"], r["span_end"])
            for r in substring_dup_spans(df, window=40).collect()
        )
        t_spans = time.time() - t0
        want = [
            (1, len(pre), len(pre) + len(shared)),
            (2, len(shell_a), len(shell_a) + len(shared)),
        ]
        assert spans == want, (spans[:4], want)
        print(
            f"spans exact (both planted boundaries) in {t_spans:.1f}s",
            flush=True,
        )
        t0 = time.time()
        clean = {
            r["doc_id"]: r["n"]
            for r in substring_dedupe(df, window=40)
            .select("doc_id", F.length("text_clean").alias("n"))
            .collect()
        }
        t_clean = time.time() - t0
        # keep-first: doc 1 holds every first occurrence; doc 2 loses
        # exactly the shared region
        assert clean[1] == len(doc1), clean
        assert clean[2] == len(doc2) - len(shared), clean
        print(
            f"excision char-exact (doc2 cut {len(shared):,} chars) in "
            f"{t_clean:.1f}s\nPATHOLOGICAL-DOC PASS",
            flush=True,
        )
    finally:
        spark.stop()


def main():
    if len(sys.argv) > 1 and sys.argv[1] == "--pathological":
        pathological(int(sys.argv[2]) if len(sys.argv) > 2 else 16)
        return
    n_base = int(sys.argv[1]) if len(sys.argv) > 1 else 500_000
    spark = get_spark(
        app_name="scale-substring",
        cpus=int(os.environ.get("SPARK_GRAFT_CPUS", "32")),
    )
    try:
        d = text_corpus(spark, n_base)
        docs = spark.read.parquet(os.path.join(d, "documents.parquet")).persist()
        n_docs = docs.count()
        n_chars = docs.agg(F.sum(F.length("text"))).first()[0]
        g1 = docs.filter(
            (F.col("doc_id") >= n_base) & (F.col("doc_id") < 2 * n_base)
        ).select("doc_id")
        n_mut = g1.count()
        print(f"corpus: {n_docs:,} docs, {n_chars:,} chars, {n_mut:,} g1 mutants", flush=True)

        for winnow in (1, 8):
            t0 = time.time()
            n_pos = substring_window_positions(
                docs, "doc_id", "text", window=40, winnow=winnow
            ).count()
            t_pos = time.time() - t0
            t0 = time.time()
            spans = substring_dup_spans(
                docs, "doc_id", "text", window=40, winnow=winnow
            ).persist()
            n_spans = spans.count()
            t_spans = time.time() - t0
            flagged_docs = spans.select("doc_id").distinct()
            recall = g1.join(flagged_docs, "doc_id", "left_semi").count() / n_mut
            spans.unpersist()
            print(
                f"winnow={winnow}: positions {n_pos:,} ({t_pos:.1f}s hash-only), "
                f"spans {n_spans:,} in {t_spans:.1f}s end-to-end, "
                f"planted-mutant recall {recall:.4f}",
                flush=True,
            )
            if winnow == 1:
                assert recall >= 0.99, f"stride-1 planted recall {recall:.4f} < 0.99"
            else:
                assert recall >= 0.95, f"winnowed planted recall {recall:.4f} < 0.95"
        print("PLANTED RECALL PASS", flush=True)
    finally:
        spark.stop()


if __name__ == "__main__":
    main()
