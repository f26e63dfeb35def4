"""As-of join golden tests: inclusive match, carry-forward, no-prior
nulls, per-key isolation — checked against a hand-computed model."""

from __future__ import annotations

from pyspark.sql import functions as F

from spark_ext_spark.operators.asof import asof_join


def _ts(s):
    return F.to_timestamp(F.lit(s))


def test_asof_join_semantics(spark):
    left = spark.createDataFrame(
        [(1, "2024-01-01 10:00:00", "e1"),
         (1, "2024-01-01 12:00:00", "e2"),
         (1, "2024-01-01 09:00:00", "e0"),   # before any right row
         (2, "2024-01-01 11:00:00", "e3"),
         (3, "2024-01-01 11:00:00", "e4")],  # key with no right rows
        "k long, ts string, name string").withColumn("ts", F.to_timestamp("ts"))
    right = spark.createDataFrame(
        [(1, "2024-01-01 10:00:00", 100.0),  # ties with e1 -> inclusive
         (1, "2024-01-01 11:30:00", 200.0),
         (2, "2024-01-01 10:30:00", 300.0)],
        "k long, rts string, price double").withColumn("rts", F.to_timestamp("rts"))

    out = {r["name"]: r["price_asof"] for r in
           asof_join(left, right, on="k", left_ts="ts", right_ts="rts",
                     value_cols=["price"]).collect()}
    assert out["e0"] is None          # nothing at or before 09:00
    assert out["e1"] == 100.0         # inclusive: right row at same ts
    assert out["e2"] == 200.0         # latest prior wins
    assert out["e3"] == 300.0         # key isolation
    assert out["e4"] is None          # key with no right side


def test_asof_join_keeps_all_left_columns(spark):
    left = spark.createDataFrame([(1, "2024-01-01 10:00:00", 7)],
                                 "k long, ts string, extra int") \
        .withColumn("ts", F.to_timestamp("ts"))
    right = spark.createDataFrame([(1, "2024-01-01 09:00:00", 1.5)],
                                  "k long, rts string, v double") \
        .withColumn("rts", F.to_timestamp("rts"))
    out = asof_join(left, right, on="k", left_ts="ts", right_ts="rts")
    assert set(out.columns) == {"k", "ts", "extra", "v_asof"}
    assert out.first()["v_asof"] == 1.5


def test_asof_null_value_in_latest_row_stays_null(spark):
    """DuckDB/kdb ASOF semantics: the join picks a ROW, so a genuinely
    NULL value in the latest right row must come through as NULL — a
    per-column last(ignorenulls) would resurrect the stale prior value
    and could mix columns from different right rows."""
    left = spark.createDataFrame([("k", 3, "probe")],
                                 "k string, ts long, name string")
    right = spark.createDataFrame(
        [("k", 1, 5.0, 100.0), ("k", 2, None, 200.0)],
        "k string, rts long, price double, qty double")
    row = asof_join(left, right, on="k", left_ts="ts",
                    right_ts="rts").collect()[0]
    assert row["price_asof"] is None      # from the t=2 row, not t=1
    assert row["qty_asof"] == 200.0       # same row's other column


def test_asof_right_ties_are_deterministic(spark):
    """Right rows tied on (key, ts): greatest value-struct wins, every
    run — re-executions and task retries must reproduce the output."""
    left = spark.createDataFrame([("k", 10, "probe")],
                                 "k string, ts long, name string")
    right = spark.createDataFrame(
        [("k", 10, 1.0), ("k", 10, 2.0), ("k", 10, 3.0)],
        "k string, rts long, price double")
    for _ in range(3):
        row = asof_join(left, right, on="k", left_ts="ts",
                        right_ts="rts").collect()[0]
        assert row["price_asof"] == 3.0


def test_asof_map_typed_value_column(spark):
    """Non-orderable value columns (maps) must not make the join
    unplannable — the tie-break falls back to a stable content hash.
    Regression: ordering the window by the raw value struct raised
    EXPRESSION_TYPE_IS_NOT_ORDERABLE for any map-carrying right side."""
    left = spark.createDataFrame(
        [(1, 10), (1, 25)], "k long, ts long")
    right = spark.createDataFrame(
        [(1, 5, {"a": "x"}), (1, 20, {"b": "y"})],
        "k long, ts long, attrs map<string,string>")
    out = asof_join(left, right, on="k", left_ts="ts", right_ts="ts")
    got = {r["ts"]: r["attrs_asof"] for r in out.collect()}
    assert got[10] == {"a": "x"} and got[25] == {"b": "y"}
    # determinism across partitionings with a genuine (key, ts) tie
    right2 = spark.createDataFrame(
        [(1, 5, {"a": "x"}), (1, 5, {"z": "w"})],
        "k long, ts long, attrs map<string,string>")
    a = asof_join(left, right2, on="k", left_ts="ts",
                  right_ts="ts").collect()
    b = asof_join(left.repartition(7), right2.repartition(3), on="k",
                  left_ts="ts", right_ts="ts").collect()
    assert sorted(map(repr, a)) == sorted(map(repr, b))
