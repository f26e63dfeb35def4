"""profile_columns / check_expectations unit tests."""

from __future__ import annotations

from pyspark.sql import functions as F

from spark_ext_spark.operators.validation import (check_expectations,
                                                  profile_columns)


def test_profile_columns(spark):
    df = spark.createDataFrame(
        [(1, "a", 1.5), (2, "b", None), (3, "a", 2.5), (4, None, 0.5)],
        "id long, k string, v double")
    prof = {r["column"]: r for r in
            profile_columns(df, ["id", "k", "v"],
                            exact_distinct=True).collect()}
    assert prof["id"]["n_rows"] == 4 and prof["id"]["n_null"] == 0
    assert prof["id"]["n_distinct"] == 4
    assert prof["k"]["n_null"] == 1 and prof["k"]["n_distinct"] == 2
    assert prof["k"]["null_rate"] == 0.25
    assert prof["v"]["min_value"] == "0.5" and prof["v"]["max_value"] == "2.5"


def test_profile_single_scan(spark):
    df = spark.range(100).selectExpr("id", "id % 5 AS k")
    plan = profile_columns(df, ["id", "k"])._jdf.queryExecution() \
        .optimizedPlan().toString()
    # single source scan — no per-column union of jobs (multiple
    # count_distincts legitimately expand to a 2-level aggregate)
    assert plan.count("Range") == 1
    assert "Union" not in plan


def test_check_expectations(spark):
    df = spark.createDataFrame(
        [(1, "x", 10.0), (2, "y", 5.0), (2, "z", -1.0), (4, None, 3.0)],
        "id long, k string, v double")
    report = {(r["column"], r["rule"]): (r["ok"], r["observed"]) for r in
              check_expectations(df, {
                  "id": {"unique": True, "not_null": True},
                  "k": {"not_null": True},
                  "v": {"min": 0.0, "max": 100.0},
              }).collect()}
    assert report[("id", "not_null")][0] is True
    assert report[("id", "unique")] == (False, "1")   # one duplicate
    assert report[("k", "not_null")] == (False, "1")  # one null
    assert report[("v", "min")][0] is False           # -1.0 below bound
    assert report[("v", "max")][0] is True


def test_check_in_set(spark):
    df = spark.createDataFrame([("a",), ("b",), ("q",), (None,)],
                               "s string")
    rep = check_expectations(df, {"s": {"in_set": ["a", "b"]}}).first()
    assert rep["ok"] is False and rep["observed"] == "1"  # 'q' outside


def test_profile_approx_distinct_path(spark):
    df = spark.range(0, 5000).selectExpr("id", "id % 50 AS k")
    prof = {r["column"]: r for r in
            profile_columns(df, ["id", "k"],
                            exact_distinct=False).collect()}
    # HLL++ default rsd is 5%; allow 3 sigma
    assert abs(prof["id"]["n_distinct"] - 5000) <= 0.15 * 5000
    assert abs(prof["k"]["n_distinct"] - 50) <= 5


def test_validation_hostile_names_and_values(spark):
    """Column names with spaces/quotes and rule values with quotes must
    not break report construction (Column API, no SQL interpolation)."""
    df = spark.createDataFrame(
        [("O'Brien", 1.0), ("Smith", 2.0)],
        ["last name", "the-value"])
    prof = profile_columns(df, ["last name", "the-value"]).collect()
    assert {r["column"] for r in prof} == {"last name", "the-value"}
    rep = check_expectations(df, {
        "last name": {"in_set": ["O'Brien", "Smith"], "not_null": True},
        "the-value": {"min": 0.5},
    }).collect()
    assert all(r["ok"] for r in rep)
    import pytest as _pytest
    with _pytest.raises(ValueError, match="unknown rule"):
        check_expectations(df, {"the-value": {"nonnull": True}})
    with _pytest.raises(ValueError):
        profile_columns(df, [])


def test_profile_default_avoids_expand(spark):
    """The approx default must profile in ONE flat aggregate — no
    Expand. The exact path must not Expand either (r12 optimization):
    each distinct count is its own two-level single-column aggregate
    crossed into the one-row frame, so no plan ever pushes k+1
    replicas of every row through one wide hash-aggregate."""
    df = spark.range(1000).selectExpr("id", "id % 7 AS k", "id % 3 AS j")
    approx_plan = profile_columns(df, ["id", "k", "j"]) \
        ._jdf.queryExecution().executedPlan().toString()
    assert "Expand" not in approx_plan
    exact_plan = profile_columns(df, ["id", "k", "j"],
                                 exact_distinct=True) \
        ._jdf.queryExecution().executedPlan().toString()
    assert "Expand" not in exact_plan
    # one keyed (partial-aggregating) distinct subtree per column
    assert exact_plan.count("keys=[__v") >= 3


def test_expectation_ok_is_never_null(spark):
    """SQL tri-state must not leak into the gate: `~NULL` filters out,
    so an ok=NULL row would silently PASS `filter(~col('ok'))`. Bounds
    on a column with no observed values fail closed; count-based rules
    on an empty table pass vacuously (0 violations) — and in every
    case ok is a real boolean."""
    all_null = spark.createDataFrame([(None,), (None,)], "price double")
    rep = {r["rule"]: r for r in check_expectations(
        all_null, {"price": {"min": 0, "not_null": True}}).collect()}
    assert rep["min"]["ok"] is False          # fail closed, not NULL
    assert rep["min"]["observed"] is None
    assert rep["not_null"]["ok"] is False     # 2 genuine nulls
    empty = spark.createDataFrame([], "price double")
    rep = {r["rule"]: r for r in check_expectations(
        empty, {"price": {"min": 0, "not_null": True, "unique": True,
                          "in_set": [1.0]}}).collect()}
    for rule, row in rep.items():
        assert row["ok"] is not None, rule
    assert rep["min"]["ok"] is False          # no values → unverifiable
    assert rep["not_null"]["ok"] is True      # 0 violations
    assert rep["unique"]["ok"] is True
    assert rep[[k for k in rep if k.startswith("in_set")][0]]["ok"] is True
