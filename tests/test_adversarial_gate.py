"""Fast pytest slice of tools/check_adversarial.py: a handful of cheap
contract entries, run against the pathological fixture (NULL/empty/
multibyte/NUL-byte docs, zero/extreme vectors) with full DuckDB value
parity — so the defect class the round-11 gate cleared (ASCII token
classes, NULL-text dtype drift, phantom NULL packs, zero-norm
divide-by-zero) stays pinned by the regular suite. The full 50+-entry
gate remains a tool run (`python tools/check_adversarial.py`)."""

from __future__ import annotations

import duckdb
import pandas as pd
import pytest

import sys

sys.path.insert(0, ".")

import __spark_entry__ as entry  # noqa: E402
from gecko_spark.sources.testdata import TABLES  # noqa: E402

# cheap, family-representative entries: text NULL/unicode handling,
# token-count packing, fingerprints, exact dedup, zero-norm cosine,
# HLL/KMV hashing of adversarial ids
FAST_ENTRIES = [
    "text_stats",
    "pack_sequences",
    "doc_fingerprints",
    "dedup_exact",
    "topk_cosine_bruteforce",
    "text_unicode_normalize",
    # events side: NULL keys/times, epoch-0 + far-future outliers,
    # exact-tie rows, malformed JSON
    "q_events_sessions",
    "q_json_props",
    "layout_zorder_key",
    # round-11 extension: DSIR tokenize/hash/quantize chain over
    # NULL/NUL/multibyte docs; label-excluded cosine over zero/extreme
    # vectors (the full 5-entry extension set passes the tool gate)
    "dsir_log_weights",
    "ann_hard_negatives",
]


@pytest.fixture(scope="module")
def adv_dir():
    from tools.check_adversarial import build_fixture

    return build_fixture()


@pytest.fixture(scope="module")
def con(adv_dir):
    c = duckdb.connect()
    for t in TABLES:
        c.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{adv_dir}/{t}.parquet')"
        )
    yield c
    c.close()


@pytest.mark.parametrize("name", FAST_ENTRIES)
def test_adversarial_parity(spark, adv_dir, con, name):
    qs, oracles = entry.queries(), entry.oracle_sql()
    got = qs[name](spark, adv_dir).toPandas()
    exp = con.execute(oracles[name]).fetchdf()
    g = got[sorted(got.columns)].sort_values(sorted(got.columns), ignore_index=True)
    x = exp[sorted(exp.columns)].sort_values(sorted(exp.columns), ignore_index=True)
    assert list(g.columns) == list(x.columns)
    assert len(g) == len(x), f"{name}: rows {len(g)} vs {len(x)}"
    pd.testing.assert_frame_equal(g, x, check_exact=True)
