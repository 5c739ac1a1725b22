"""Oracle-parity tests: every registered query vs its DuckDB oracle,
mirroring the driver's comparison (SURVEY.md §5.1).

Runs at sf0.001 by default (fast); set CULVERT_TEST_SF=/root/testdata/sf0.01
to run at the driver's correctness scale.
"""

from __future__ import annotations

import os

import pytest

from tests.conftest import SF_SMALL, assert_query_matches_oracle

SF = os.environ.get("CULVERT_TEST_SF", SF_SMALL)


def _names():
    import __spark_entry__ as entrymod

    return sorted(entrymod.queries().keys())


@pytest.mark.parametrize("name", _names())
def test_query_matches_oracle(spark, duck, name):
    assert_query_matches_oracle(spark, duck, name, SF)


def test_entry_smoke(spark):
    import __spark_entry__ as entrymod

    df = entrymod.entry(spark)
    rows = df.collect()
    assert len(rows) >= 0
    assert len(df.columns) > 0
