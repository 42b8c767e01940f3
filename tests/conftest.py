"""Shared fixtures: one session-scoped SparkSession, small config tables.

Mirrors the reference's seed-fixed test approach
(reference tests/conftest.py:5-15) with fixed engine seeds.
"""

from __future__ import annotations

import pandas as pd
import pytest

from gecko_spark import get_spark


@pytest.fixture(scope="session")
def spark():
    s = get_spark(app_name="gecko-spark-tests", cpus=8, shuffle_partitions=8)
    yield s
    s.stop()


@pytest.fixture(scope="session")
def fruit_freq() -> pd.DataFrame:
    return pd.DataFrame(
        {"fruit": ["apple", "banana", "orange"], "count": [100, 50, 80]}
    )


@pytest.fixture(scope="session")
def fruit_type_freq() -> pd.DataFrame:
    return pd.DataFrame(
        {
            "fruit": ["apple", "apple", "banana", "banana", "orange", "orange"],
            "type": ["braeburn", "elstar", "cavendish", "plantain", "clementine", "mandarin"],
            "count": [30, 70, 40, 10, 55, 25],
        }
    )


CLDR_MINI_XML = """<?xml version="1.0" encoding="UTF-8"?>
<keyboard locale="zz-t-k0-test">
  <keyMap>
    <map iso="D01" to="q"/>
    <map iso="D02" to="w"/>
    <map iso="D03" to="e"/>
    <map iso="C01" to="a"/>
    <map iso="C02" to="s"/>
    <map iso="C03" to="d"/>
    <map iso="B01" to="y"/>
    <map iso="B02" to="x"/>
    <map iso="B03" to="c"/>
  </keyMap>
  <keyMap modifiers="shift">
    <map iso="D01" to="Q"/>
    <map iso="D02" to="W"/>
    <map iso="D03" to="E"/>
    <map iso="C01" to="A"/>
    <map iso="C02" to="S"/>
    <map iso="C03" to="D"/>
    <map iso="B01" to="Y"/>
    <map iso="B02" to="X"/>
    <map iso="B03" to="C"/>
  </keyMap>
</keyboard>
"""


@pytest.fixture(scope="session")
def cldr_file(tmp_path_factory) -> str:
    p = tmp_path_factory.mktemp("cldr") / "test-keyboard.xml"
    p.write_text(CLDR_MINI_XML, encoding="utf-8")
    return str(p)
