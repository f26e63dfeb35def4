"""Oracle output-type contract: no HUGEINT / DECIMAL columns.

DuckDB types a bare integer ``sum()`` as HUGEINT (int128). The driver
fetches oracle results through Arrow/pandas, where HUGEINT becomes
decimal128 -> float64 (``7949.0``) while Spark returns int64
(``7949``) — so the driver's canonicalizer hash-mismatches on equal
values. This bit 4 CORRECTNESS_r03 rows (source_capped_corpus,
media_sniff_formats, media_pipeline, props_variant_extract).

This test binds (does not execute) every oracle_sql() string against
the sf0.001 views and asserts no output column — including nested
list/struct element types — is HUGEINT, UHUGEINT, or DECIMAL. Every
integer aggregate in an oracle must be wrapped in
``CAST(... AS BIGINT)``.
"""

from __future__ import annotations

import os
import sys

import duckdb
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as em  # noqa: E402
from tests.oracle_utils import TABLES  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")

BANNED = ("HUGEINT", "UHUGEINT", "DECIMAL")


@pytest.fixture(scope="module")
def con():
    c = duckdb.connect()
    for t in TABLES:
        c.execute(f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'")
    yield c
    c.close()


def _oracle_items():
    return sorted(em.oracle_sql().items())


@pytest.mark.parametrize("name,sql", _oracle_items(),
                         ids=[n for n, _ in _oracle_items()])
def test_oracle_has_no_hugeint_or_decimal_columns(con, name, sql):
    rel = con.sql(sql)  # binds + plans; does not execute
    bad = [(c, str(t)) for c, t in zip(rel.columns, rel.types)
           if any(b in str(t).upper() for b in BANNED)]
    assert not bad, (
        f"oracle '{name}' has driver-unsafe output types {bad}; wrap the "
        f"integer aggregate in CAST(... AS BIGINT) (Arrow turns HUGEINT "
        f"into float64 and the driver hash-mismatches equal values)")


def _rows_only_window_items():
    """Driver-window queries() entries WITHOUT an oracle — the driver
    records the weaker rows-only check for these, which still runs the
    canonicalizer over the SPARK result."""
    oracles = em.oracle_sql()
    return [n for n in list(em.queries())[:50] if n not in oracles]


@pytest.mark.parametrize("name", _rows_only_window_items())
def test_rows_only_window_output_is_flat(spark, name):
    """The same driver-safety discipline for rows-only SPARK outputs:
    the driver's canonicalizer pandas-sorts the result, and a
    list/struct/map cell is unhashable there — approx_user_stats'
    array<double> quantiles column crashed it in round 9 and recorded
    NO evidence (CORRECTNESS_r09: 'unhashable type: list'). Every
    rows-only query inside the hash-checked window must emit only
    atomic columns."""
    from pyspark.sql.types import ArrayType, MapType, StructType
    df = em.queries()[name](spark, SF_DIR)
    bad = [(f.name, f.dataType.simpleString()) for f in df.schema.fields
           if isinstance(f.dataType, (ArrayType, MapType, StructType))]
    assert not bad, (
        f"rows-only window query '{name}' emits nested columns {bad}; "
        f"the driver canonicalizer cannot sort list/struct cells — "
        f"emit scalar columns (or serialize to strings)")
