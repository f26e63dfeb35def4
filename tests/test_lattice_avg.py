"""Tests for the integer-lattice 4dp group average
(`plans.relational._lattice_avg_4dp` / `_lattice_avg_4dp_sql`).

A bare ``round(avg(x), 4)`` over mostly-2-decimal inputs is hazardous
twice over: double summation is order-dependent (so Spark's partial
aggregation order — which varies with partitioning — perturbs the last
ULP), and the true mean of cent-lattice values lands EXACTLY on the
.00005 rounding half-grid, where a 1-ULP perturbation flips the 4dp
result. The lattice average removes both hazards: exact associative
integer sums (decimal(38,0) in Spark, HUGEINT in DuckDB — headroom to
~1e38), then one fixed floor-quantize chain of double ops that both
engines execute identically. These tests pin:

  * the half-grid case itself (a group whose true mean ends in 5 at
    the 5th decimal) — deterministic across partitionings and equal
    to the DuckDB twin;
  * order-independence under adversarial repartitioning;
  * agreement with the naive round(avg) away from the half-grid;
  * the empty-group NULL contract;
  * a hypothesis sweep of random cent-lattice groups vs DuckDB.
"""

from __future__ import annotations

import math

import duckdb
import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from spark_ext_spark.plans.relational import (_lattice_avg_4dp,
                                              _lattice_avg_4dp_sql)


def _duck_avg(values, groups=None):
    """Run the SQL twin over (g, v) rows; return {g: avg}."""
    con = duckdb.connect()
    groups = groups or [0] * len(values)
    rows = ", ".join(f"({g}, {v!r})" for g, v in zip(groups, values))
    out = con.execute(
        f"SELECT g, {_lattice_avg_4dp_sql('v')} AS avg_v "
        f"FROM (VALUES {rows}) t(g, v) GROUP BY g ORDER BY g").fetchall()
    con.close()
    return dict(out)


def _spark_avg(spark, values, groups=None, partitions=1):
    groups = groups or [0] * len(values)
    df = spark.createDataFrame(
        list(zip(groups, [float(v) for v in values])), "g int, v double")
    if partitions > 1:
        # adversarial partial-aggregation order: hash-scatter the rows
        # so each partition sums a different subset in a different order
        df = df.repartition(partitions, F.hash("v", "g"))
    out = df.groupBy("g").agg(_lattice_avg_4dp("v")).collect()
    return {r["g"]: r["avg_v"] for r in out}


def test_half_grid_group_is_deterministic(spark):
    # 8 cent-lattice values, odd cent sum -> true mean 9/800 = 0.011250
    # exactly on the .00005 half-grid. round(avg) is a coin flip here;
    # the lattice average must give floor(112.5 + .5)/1e4 = 0.0113
    # everywhere.
    values = [0.01] * 7 + [0.02]
    expect = 0.0113
    for parts in (1, 4, 16):
        assert _spark_avg(spark, values, partitions=parts) == {0: expect}
    assert _duck_avg(values) == {0: expect}


def test_partitioning_invariance_on_mixed_lattice(spark):
    # mix of 2-decimal and finer values; equality must hold bit-for-bit
    # across partition counts (associative integer sums).
    values = [round(((i * 37) % 1000) / 100 + ((i * 7) % 10) / 1e4, 6)
              for i in range(500)]
    groups = [i % 7 for i in range(500)]
    ref = _spark_avg(spark, values, groups, partitions=1)
    for parts in (3, 16):
        assert _spark_avg(spark, values, groups, partitions=parts) == ref
    assert _duck_avg(values, groups) == ref


def test_matches_round_avg_off_grid(spark):
    # away from the half-grid the lattice average equals round(avg, 4)
    values = [1.23, 4.56, 7.89, 0.12]  # mean 3.45 exactly on-grid
    [(got,)] = (spark.createDataFrame([(v,) for v in values], "v double")
                .agg(_lattice_avg_4dp("v")).collect())
    assert got == round(sum(values) / len(values), 4) == 3.45


def test_empty_group_is_null(spark):
    df = spark.createDataFrame([(1.0,)], "v double").filter("v < 0")
    [(got,)] = df.agg(_lattice_avg_4dp("v")).collect()
    assert got is None
    con = duckdb.connect()
    [(dgot,)] = con.execute(
        f"SELECT {_lattice_avg_4dp_sql('v')} FROM (VALUES (1.0)) t(v) "
        f"WHERE v < 0").fetchall()
    con.close()
    assert dgot is None


def test_perturbation_bound():
    # quantizing inputs to the 1e-6 lattice moves the mean < 5e-7 —
    # invisible at 4 decimals except exactly on the half-grid
    vals = [0.1234567, 9.9999994, 3.1415926]
    for v in vals:
        assert abs(math.floor(v * 1e6 + 0.5) / 1e6 - v) < 5e-7


cent_groups = st.lists(
    st.integers(min_value=0, max_value=99999),  # cents: 0 .. 999.99
    min_size=1, max_size=40)


@settings(max_examples=30, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(cents=cent_groups)
def test_random_cent_groups_match_duckdb(spark, cents):
    values = [c / 100 for c in cents]
    got = _spark_avg(spark, values, partitions=4)
    assert got == _duck_avg(values)


def test_lattice_avg_past_int64_sum(spark):
    """The decimal(38,0) accumulator must survive lattice totals past
    int64: two rows of 9.2e12 have lattice values 9.2e18 each (legal
    per-row BIGINT) whose SUM (1.84e19) overflows int64 — a BIGINT
    accumulator dies under ANSI mode right here. Both engines must
    return the exact mean (DuckDB's HUGEINT sum mirrors the decimal)."""
    v = 9.2e12
    got = _spark_avg(spark, [v, v], partitions=2)
    assert got[0] == pytest.approx(v, abs=1e-2)
    assert _duck_avg([v, v]) == got
