"""The reference's German end-to-end example, reproduced structure-for-
structure (reference docs/examples/german.md:418-489): a person table
from three frequency tables — (given_name, gender) jointly sampled,
last_name weighted, (street_name, municipality, postcode) jointly
sampled — then the exact three-column corruption spec from the doc:

* ``given_name``: OCR replacement table, inline, p = 0.1
* ``gender``:     categorical flip p = 0.02, then missing value p = 0.05
* ``postcode``:   CLDR keyboard typos restricted to charset
                  "0123456789", p = 0.01

and both frames exported as CSV with an ``id`` index column, mirroring
``df.to_csv(..., index_label="id")``.

The reference reads its tables from the gecko-data repo
(``gecko-data/de_DE/*.csv``), which is a separate download; this
example inlines small stand-ins with the same column names so it runs
self-contained — swap the DataFrame literals for
``pd.read_csv("gecko-data/de_DE/...")`` to reproduce the doc verbatim
against the real data. Everything else — operator choice, spec
structure, probabilities, export shape — matches the doc.

Run: python examples/german_pipeline.py [n_rows] [out_dir]
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

# ---------------------------------------------------------------------------
# stand-ins for gecko-data/de_DE (same column names as the real CSVs)
# ---------------------------------------------------------------------------

GIVEN_NAME_GENDER = pd.DataFrame(
    {
        "given_name": ["Anna", "Maria", "Lena", "Sofia",
                       "Paul", "Max", "Jonas", "Felix"],
        "gender": ["f", "f", "f", "f", "m", "m", "m", "m"],
        "count": ["300", "250", "200", "150", "280", "260", "210", "140"],
    }
)
LAST_NAME = pd.DataFrame(
    {
        "last_name": ["Müller", "Schmidt", "Schneider", "Fischer", "Weber"],
        "count": ["800", "700", "400", "300", "250"],
    }
)
STREET_MUNICIPALITY_POSTCODE = pd.DataFrame(
    {
        "street_name": ["Hauptstraße", "Schulstraße", "Gartenweg",
                        "Bahnhofstraße", "Ringstraße", "Lindenallee"],
        "municipality": ["Berlin", "Berlin", "Hamburg",
                         "München", "Köln", "Dresden"],
        "postcode": ["10115", "10117", "20095", "80331", "50667", "01067"],
        "count": ["500", "350", "300", "280", "220", "150"],
    }
)
OCR = pd.DataFrame(
    {"source": ["ü", "ei", "ch", "nn", "rn"],
     "target": ["u", "ci", "sh", "m", "m"]}
)

# digit row of a German keyboard — enough neighbor structure for the
# charset="0123456789" postcode mutation (the doc uses the full
# de-t-k0-windows.xml from the CLDR distribution)
CLDR_DIGITS = """<?xml version="1.0" encoding="UTF-8"?>
<keyboard locale="de-t-k0-test">
  <keyMap>
    <map iso="E01" to="1"/> <map iso="E02" to="2"/> <map iso="E03" to="3"/>
    <map iso="E04" to="4"/> <map iso="E05" to="5"/> <map iso="E06" to="6"/>
    <map iso="E07" to="7"/> <map iso="E08" to="8"/> <map iso="E09" to="9"/>
    <map iso="E10" to="0"/>
    <map iso="D01" to="q"/> <map iso="D02" to="w"/> <map iso="D03" to="e"/>
  </keyMap>
</keyboard>
"""


def generate_data_frame(spark, count: int, seed: int = 727):
    """german.md::generate_data_frame — three frequency-table
    generators, two of them multicolumn, in one lazy projection."""
    return to_data_frame(
        spark,
        [
            (
                ("given_name", "gender"),
                G.from_multicolumn_frequency_table(
                    GIVEN_NAME_GENDER, ["given_name", "gender"], "count"
                ),
            ),
            ("last_name", G.from_frequency_table(LAST_NAME, "last_name", "count")),
            (
                ("street_name", "municipality", "postcode"),
                G.from_multicolumn_frequency_table(
                    STREET_MUNICIPALITY_POSTCODE,
                    ["street_name", "municipality", "postcode"],
                    "count",
                ),
            ),
        ],
        count=count,
        seed=seed,
        keep_index=True,  # the reference exports the pandas index as `id`
    )


def corrupt_data_frame(df, seed: int = 727):
    """german.md::mutate_data_frame — the same spec, same p values."""
    with tempfile.NamedTemporaryFile("w", suffix=".xml", delete=False) as f:
        f.write(CLDR_DIGITS)
        keymap = f.name
    try:
        postcode_typos = M.with_cldr_keymap_file(keymap, charset="0123456789")
    finally:
        os.unlink(keymap)
    return mutate_data_frame(
        df,
        [
            ("given_name", (0.1, M.with_replacement_table(
                OCR, "source", "target", inline=True))),
            ("gender", [
                (0.02, M.with_categorical_values(GIVEN_NAME_GENDER, "gender")),
                (0.05, M.with_missing_value("")),
            ]),
            ("postcode", (0.01, postcode_typos)),
        ],
        seed=seed,
        key_columns=["__idx__"],
    )


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 100_000
    out = sys.argv[2] if len(sys.argv) > 2 else tempfile.mkdtemp(prefix="german_")
    spark = get_spark(app_name="german-pipeline")
    original = generate_data_frame(spark, n)
    mutated = corrupt_data_frame(original)
    # to_csv(..., index_label="id") analogue: __idx__ renamed to id,
    # single-file CSV per frame via coalesce (example scale only — at
    # real scale keep the partitioned write)
    for name, frame in (("german-original", original), ("german-mutated", mutated)):
        (frame.withColumnRenamed("__idx__", "id")
              .coalesce(1)
              .write.mode("overwrite").option("header", True)
              .csv(f"{out}/{name}"))
    print(f"wrote {n} rows to {out}/german-original and {out}/german-mutated")
    # quick distribution check mirroring the doc's narrative
    original.groupBy("gender").count().show()
    mutated.filter("gender = ''").count() and None
    spark.stop()


if __name__ == "__main__":
    main()
