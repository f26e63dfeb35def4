"""Cross-engine parity on adversarial inputs absent from the synthetic
testdata: negative ids (sign-preserving % vs pmod), huge ids (int64
overflow in multiplicative hashing), and malformed JSON props (DuckDB
json_extract throws where Spark's from_json nulls out). Each case here
is an input class that would silently (or loudly) split the engines on
a data refresh even though the sf0.01 sweep stays green."""

from __future__ import annotations

import datetime
import os
import sys

import duckdb
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from spark_ext_spark.plans import relational as rel  # noqa: E402
from tests.oracle_utils import compare_to_oracle  # noqa: E402


@pytest.fixture(scope="module")
def hostile_sf(spark, tmp_path_factory):
    """A minimal events.parquet with negative user ids, an event_id
    past the Knuth-hash int64 overflow point, and one malformed-JSON
    props row."""
    d = str(tmp_path_factory.mktemp("hostile"))
    rows = [
        # (event_id, ts, user_id, event_type, value, props)
        (1, datetime.datetime(2024, 1, 1, 10, 30), -5, "click", 1.5,
         '{"k": 60}'),
        (2, datetime.datetime(2024, 1, 1, 11, 0), -65536, "view", 2.0,
         '{"k": 10}'),
        (3_474_514_434, datetime.datetime(2024, 1, 1, 12, 15), 7,
         "purchase", 3.0, '{k: 1'),          # malformed JSON
        (9_223_372_036_854, datetime.datetime(2024, 1, 2, 0, 45), 65535,
         "click", 4.0, None),
        (5, datetime.datetime(2024, 1, 2, 3, 59), 0, "view", 5.0,
         '{"k": 99}'),
    ]
    df = spark.createDataFrame(
        rows, "event_id long, ts timestamp_ntz, user_id long, "
              "event_type string, value double, props string")
    df.coalesce(1).write.mode("overwrite").parquet(f"{d}/events.parquet")
    return d


@pytest.fixture(scope="module")
def hostile_duck(hostile_sf):
    con = duckdb.connect()
    # Spark writes a parquet DIRECTORY; the real testdata are single
    # files, so the glob only appears in this fixture
    con.execute(f"CREATE VIEW events AS "
                f"SELECT * FROM '{hostile_sf}/events.parquet/*.parquet'")
    yield con
    con.close()


@pytest.mark.parametrize("query,sql", [
    (rel.zorder_event_keys, rel.ZORDER_EVENT_KEYS_SQL),
    (rel.hilbert_event_keys, rel.HILBERT_EVENT_KEYS_SQL),
    (rel.stratified_sample_events, rel.STRATIFIED_SAMPLE_EVENTS_SQL),
    (rel.props_json_extract, rel.PROPS_JSON_EXTRACT_SQL),
    (rel.props_variant_extract, rel.PROPS_VARIANT_EXTRACT_SQL),
    (rel.value_statistics, rel.VALUE_STATISTICS_SQL),
], ids=["zorder_negative_ids", "hilbert_negative_ids",
        "stratified_huge_ids", "json_malformed_props",
        "variant_malformed_props", "stats_malformed_props"])
def test_hostile_inputs_stay_cross_engine_green(spark, hostile_sf,
                                                hostile_duck, query, sql):
    compare_to_oracle(query(spark, hostile_sf), hostile_duck, sql)


def test_zorder_keys_nonnegative_for_negative_ids(spark, hostile_sf):
    """pmod keeps the interleave inputs in [0, 65536) — a
    sign-preserving mod would emit garbage (negative-bit) keys."""
    keys = {r["event_id"]: r["zkey"] for r in
            rel.zorder_event_keys(spark, hostile_sf).collect()}
    assert all(k >= 0 for k in keys.values())
