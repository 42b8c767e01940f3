"""End-to-end example: the reference's canonical workflow (generate a
realistic person dataset from frequency tables, corrupt a copy with
probabilistic errors, export both) re-expressed as two lazy Spark plans.

Mirrors the shape of the reference's docs example (reference
docs/examples/german.md): gender-dependent given names via a
multicolumn frequency table, weighted last names, birth dates, numeric
scores, then a chained corruption spec with keyboard typos, OCR
replacements, edit errors, case flips and column swaps.

Run: python examples/person_pipeline.py [n_rows] [out_dir]
"""

from __future__ import annotations

import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import pandas as pd

from gecko_spark import get_spark
from gecko_spark.operators import generators as G
from gecko_spark.operators import mutators as M
from gecko_spark.plans.pipeline import mutate_data_frame, to_data_frame

# config tables — tiny, driver-side by design (the only non-distributed data)
GENDER_GIVEN = pd.DataFrame(
    {
        "gender": ["f", "f", "f", "m", "m", "m"],
        "given": ["Anna", "Maria", "Lena", "Paul", "Max", "Jonas"],
        "freq": ["300", "250", "200", "280", "260", "210"],
    }
)
LAST = pd.DataFrame(
    {
        "last": ["Müller", "Schmidt", "Schneider", "Fischer", "Weber"],
        "freq": ["800", "700", "400", "300", "250"],
    }
)
OCR = pd.DataFrame({"source": ["ü", "ei", "ch", "nn"], "target": ["u", "ci", "sh", "m"]})

CLDR_MINI = """<?xml version="1.0" encoding="UTF-8"?>
<keyboard locale="zz-t-k0-test">
  <keyMap>
    <map iso="D01" to="q"/> <map iso="D02" to="w"/> <map iso="D03" to="e"/>
    <map iso="D04" to="r"/> <map iso="C01" to="a"/> <map iso="C02" to="s"/>
    <map iso="C03" to="d"/> <map iso="C04" to="f"/> <map iso="B01" to="y"/>
    <map iso="B02" to="x"/> <map iso="B03" to="c"/> <map iso="B04" to="v"/>
  </keyMap>
</keyboard>
"""


def build(spark, n_rows: int, seed: int = 42):
    """The generation plan: ONE projection over spark.range(n)."""
    return to_data_frame(
        spark,
        [
            (
                ("gender", "given_name"),
                G.from_multicolumn_frequency_table(
                    GENDER_GIVEN, ["gender", "given"], "freq"
                ),
            ),
            ("last_name", G.from_frequency_table(LAST, "last", "freq")),
            ("birthday", G.from_datetime_range("1950-01-01", "2005-12-31", "%d.%m.%Y", "d")),
            ("weight_kg", G.from_normal_distribution(75.0, 12.0, precision=1)),
            ("height_cm", G.from_uniform_distribution(150.0, 200.0, precision=0)),
        ],
        count=n_rows,
        seed=seed,
        keep_index=True,
    )


def corrupt(df, seed: int = 7):
    """The corruption plan: a fold of when/otherwise projections plus
    one Arrow stage for the table-driven mutators."""
    import os

    with tempfile.NamedTemporaryFile("w", suffix=".xml", delete=False) as f:
        f.write(CLDR_MINI)
        keymap = f.name
    try:
        cldr_mut = M.with_cldr_keymap_file(keymap)  # parses at factory time
    finally:
        os.unlink(keymap)
    return mutate_data_frame(
        df,
        [
            ("given_name", (0.05, cldr_mut)),
            ("last_name", (0.1, M.with_replacement_table(OCR, "source", "target", inline=True))),
            ("last_name", (0.02, M.with_missing_value(""))),
            (("given_name", "last_name"), (0.02, M.with_permute())),
            ("birthday", (0.05, M.with_datetime_offset(10, "d", "%d.%m.%Y", prevent_wraparound=True))),
            ("weight_kg", [(0.03, M.with_delete()), (0.03, M.with_transpose())]),
            ("gender", (0.05, M.with_categorical_values(GENDER_GIVEN, "gender"))),
        ],
        seed=seed,
        key_columns=["__idx__"],
    )


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 100_000
    out = sys.argv[2] if len(sys.argv) > 2 else None
    spark = get_spark(app_name="person-pipeline")
    clean = build(spark, n)
    dirty = corrupt(clean)
    if out:
        clean.write.mode("overwrite").option("header", True).csv(f"{out}/clean")
        dirty.write.mode("overwrite").option("header", True).csv(f"{out}/dirty")
        print(f"wrote {n} rows to {out}/clean and {out}/dirty")
    else:
        print("clean:")
        clean.show(5, truncate=False)
        print("corrupted:")
        dirty.show(5, truncate=False)
    spark.stop()


if __name__ == "__main__":
    main()
