"""End-to-end record-linkage evaluation — the workflow the reference's
synthetic data exists to drive, on one engine:

1. GENERATE a clean person table (generators),
2. CORRUPT it with realistic errors (mutators),
3. LINK the corrupted copy back to the source (operators/linkage.py),
   three ways: levenshtein best-match, Jaro-Winkler, and a fully
   unsupervised Fellegi-Sunter fit (EM over agreement patterns),
4. SCORE each linker against the known ground truth.

Usage: python examples/linkage_eval.py [n_rows]
"""

from __future__ import annotations

import sys

import pandas as pd
from pyspark.sql import functions as F

sys.path.insert(0, ".")

from gecko_spark import get_spark
from gecko_spark.operators import generators as G
from gecko_spark.operators import linkage as L
from gecko_spark.operators import mutators as M
from gecko_spark.plans.pipeline import mutate_data_frame, to_data_frame


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 100_000
    spark = get_spark(app_name="linkage-eval-example")
    try:
        vocab = pd.DataFrame({"w": [f"w{i:02d}" for i in range(80)], "n": [1] * 80})
        clean = (
            to_data_frame(
                spark,
                [
                    ("first", G.from_frequency_table(vocab, "w", "n")),
                    ("last", G.from_frequency_table(vocab, "w", "n")),
                    ("city", G.from_frequency_table(vocab, "w", "n")),
                    ("shop", G.from_frequency_table(vocab, "w", "n")),
                ],
                n,
                seed=71,
                keep_index=True,
            )
            .select(
                F.col("__idx__").alias("pid"),
                F.concat_ws(" ", "first", "last").alias("name"),
                F.col("city"),
                F.col("shop"),
                F.pmod(F.col("__idx__"), F.lit(n // 10)).alias("zip"),
            )
            .persist()
        )
        dirty = mutate_data_frame(
            clean,
            [
                ("name", (0.25, M.with_delete())),
                ("name", (0.25, M.with_substitute())),
                ("city", (0.15, M.with_categorical_values(vocab, "w"))),
                ("shop", (0.30, M.with_categorical_values(vocab, "w"))),
            ],
            seed=72,
            key_columns=["pid"],
        ).persist()
        print(f"generated {clean.count():,} clean records, corrupted copy ready")

        def report(tag, linked):
            pdf = linked.toPandas()
            acc = (pdf["id_a"] == pdf["id_b"]).mean() if len(pdf) else 0.0
            print(
                f"  {tag}: linked {len(pdf):,}/{n:,} "
                f"(recall {len(pdf)/n:.4f}), pid accuracy {acc:.4f}"
            )

        blocks = dict(block_a=[F.col("zip")], block_b=[F.col("zip")])
        report(
            "levenshtein best-match",
            L.linkage_join(dirty, clean, "pid", "pid", "name", max_dist=2, **blocks),
        )
        report(
            "jaro-winkler best-match",
            L.linkage_join(
                dirty, clean, "pid", "pid", "name",
                score="jaro_winkler", min_sim=0.85, **blocks,
            ),
        )
        # unsupervised: EM fits m/u from the candidate pairs themselves
        fields = {"name": 1, "city": None, "shop": None}
        est = L.estimate_mu_em(dirty, clean, "pid", "pid", fields, **blocks)
        for f, spec in est.items():
            print(f"  EM {f}: m={spec[0]:.3f} u={spec[1]:.3f}")
        report(
            "fellegi-sunter (EM-fitted)",
            L.fellegi_sunter_join(
                dirty, clean, "pid", "pid", est, min_weight=0.0, **blocks
            ),
        )
    finally:
        spark.stop()


if __name__ == "__main__":
    main()
