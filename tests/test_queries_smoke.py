"""Every declared queries() entry — including the rows-only ones the
oracle-parity test can't cover — must run at sf0.001 with a stable
non-empty schema."""

from __future__ import annotations

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entrymod  # noqa: E402

SF = "/root/testdata/sf0.001"
QUERIES = entrymod.queries()
ROWS_ONLY = sorted(set(QUERIES) - set(entrymod.oracle_sql()))


@pytest.mark.parametrize("name", ROWS_ONLY)
def test_rows_only_query_runs(spark, name):
    df = QUERIES[name](spark, SF)
    assert len(df.columns) > 0
    assert df.count() >= 0  # forces full execution
