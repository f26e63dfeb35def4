"""Ported from BinningSpec.scala:13-111 (uniform ctr splits ±0.5;
exact bin membership for double and int inputs; type failure; nulls)."""

from __future__ import annotations

import random
import uuid

import pytest

from spark_ext_spark.operators.binning import Binning, OptimalBinning

N = 1000


@pytest.fixture(scope="module")
def users(spark):
    rng = random.Random(42)
    rows = [(str(uuid.uuid4()), i, rng.random(),
             10 * rng.random() if rng.random() > 0.5 else None)
            for i in range(1, N + 1)]
    return spark.createDataFrame(
        rows, "cookie_id string, num_days int, ctr double, actions double"
    ).cache()


def test_optimal_binning_uniform_ctr(users):
    binning = OptimalBinning(inputCol="ctr", outputCol="ctr_bin",
                             numBins=5).fit(users)
    splits = binning.splits
    assert len(splits) == 6
    # BinningSpec.scala:36-41 asserts ±0.5; uniform(0,1) quantiles land
    # much closer — assert a tighter ±0.1.
    for i, expected in enumerate([0.2, 0.4, 0.6, 0.8], start=1):
        assert splits[i] == pytest.approx(expected, abs=0.1)
    assert binning.transform(users).count() == N


def test_binning_double_column(users):
    binning = Binning(splits=[0.0, 0.25, 0.5, 0.75, 1.0])
    binning._set(inputCol="ctr", outputCol="ctr_bin")
    for row in binning.transform(users).collect():
        ctr, vec = row["ctr"], row["ctr_bin"]
        arr = list(vec.toArray())
        assert len(arr) == 4 and sum(arr) == 1.0
        idx = arr.index(1.0)
        assert idx == min(int(ctr / 0.25), 3)


def test_binning_integer_column(users):
    binning = Binning(splits=[0.0, 400.0, 800.0, 1000.0])
    binning._set(inputCol="num_days", outputCol="days_bin")
    for row in binning.transform(users).collect():
        days, arr = row["num_days"], list(row["days_bin"].toArray())
        idx = arr.index(1.0)
        if days < 400:
            assert idx == 0
        elif days < 800:
            assert idx == 1
        else:
            assert idx == 2  # 1000 == top split -> last bin (inclusive)


def test_binning_string_column_fails(users):
    binning = Binning(splits=[0.0, 400.0, 800.0, 1000.0])
    binning._set(inputCol="cookie_id", outputCol="bins")
    with pytest.raises(TypeError):
        binning.transform(users)


def test_binning_nulls_give_zero_vector(users):
    binning = Binning(splits=[0.0, 4.0, 8.0, 10.0])
    binning._set(inputCol="actions", outputCol="actions_bin")
    out = binning.transform(users).collect()
    for row in out:
        arr = list(row["actions_bin"].toArray())
        if row["actions"] is None:
            assert sum(arr) == 0.0
        else:
            assert sum(arr) == 1.0


def test_bin_labels_metadata(users):
    binning = Binning(splits=[float("-inf"), 0.5, float("inf")])
    binning._set(inputCol="ctr", outputCol="b")
    out = binning.transform(users)
    attrs = out.schema["b"].metadata["ml_attr"]["attrs"]["binary"]
    assert [a["name"] for a in attrs] == \
        ["[-Infinity, 0.5)", "[0.5, Infinity)"]


def test_splits_must_increase():
    with pytest.raises(ValueError):
        Binning(splits=[0.0, 0.0, 1.0])


def test_optimal_binning_skewed_lognormal(spark):
    # SplitOptimizerSpec.scala:28-45: equal-frequency splits on skewed
    # exp(N(0,1)) data — per-bin counts near ideal n/bins.
    rng = random.Random(13)
    import math
    vals = [math.exp(rng.gauss(0, 1)) for _ in range(1000)]
    df = spark.createDataFrame([(v,) for v in vals], "x double")
    model = OptimalBinning(inputCol="x", outputCol="b", numBins=5).fit(df)
    counts = [0] * 5
    splits = model.splits
    for v in vals:
        for i in range(5):
            hi = splits[i + 1]
            if v < hi or i == 4:
                counts[i] += 1
                break
    for c in counts:
        assert abs(c - 200) <= 10, (counts, splits)


def test_optimal_binning_too_few_points(spark):
    df = spark.createDataFrame([(float(i),) for i in range(20)], "x double")
    with pytest.raises(ValueError, match="too small"):
        OptimalBinning(inputCol="x", outputCol="b", numBins=5).fit(df)


# --- method='dp': exact constrained optimum -------------------------------

def _objective(spark_df, col, splits, num_bins):
    """Σ(count_b − n/numBins)² of a fitted split set."""
    from pyspark.sql import functions as F
    n = spark_df.filter(F.col(col).isNotNull()).count()
    target = n / num_bins
    model = Binning(splits=splits)
    model._set(inputCol=col, outputCol="__o")
    counts = {r["__b"]: r["count"] for r in
              spark_df.withColumn("__b", model.bin_index_col(col))
              .filter(F.col("__b").isNotNull())
              .groupBy("__b").count().collect()}
    return sum((counts.get(b, 0) - target) ** 2 for b in range(num_bins))


def test_dp_fit_beats_quantile_on_heavy_ties(spark):
    """90% of mass on one value: equal-frequency splits are
    unattainable, the DP fit must find the exact constrained optimum —
    never worse than the sketch fit, and equal to the hand-computed
    optimal objective."""
    rows = [(0.0,)] * 90 + [(float(i),) for i in range(1, 11)]
    df = spark.createDataFrame(rows, "x double")
    dp = OptimalBinning(inputCol="x", outputCol="v", numBins=3,
                        method="dp").fit(df)
    q = OptimalBinning(inputCol="x", outputCol="v", numBins=3,
                       method="quantile").fit(df)
    obj_dp = _objective(df, "x", dp.splits, 3)
    obj_q = _objective(df, "x", q.splits, 3)
    assert obj_dp <= obj_q + 1e-9
    # optimal by enumeration: {0}=90, then 10 tail values split 5/5
    target = 100 / 3
    best = (90 - target) ** 2 + 2 * (5 - target) ** 2
    assert obj_dp == pytest.approx(best)
    assert dp.splits[0] == float("-inf") and dp.splits[-1] == float("inf")
    assert all(a < b for a, b in zip(dp.splits, dp.splits[1:]))


def test_dp_fit_matches_equal_frequency_on_uniform(spark):
    """On a uniform distinct-valued column the constrained optimum IS
    equal frequency — DP and exact quantiles give zero objective."""
    df = spark.createDataFrame([(float(i),) for i in range(120)],
                               "x double")
    dp = OptimalBinning(inputCol="x", outputCol="v", numBins=4,
                        method="dp").fit(df)
    assert _objective(df, "x", dp.splits, 4) == pytest.approx(0.0)


def test_dp_falls_back_above_max_distinct(spark):
    df = spark.createDataFrame([(float(i),) for i in range(200)],
                               "x double")
    dp = OptimalBinning(inputCol="x", outputCol="v", numBins=4,
                        method="dp", maxDistinct=50).fit(df)
    q = OptimalBinning(inputCol="x", outputCol="v", numBins=4,
                       method="quantile").fit(df)
    assert dp.splits == q.splits  # sketch path taken


def test_dp_exhaustive_small_histograms(spark):
    """Brute-force cross-check: on random small histograms the DP
    objective equals the best over ALL split enumerations."""
    from itertools import combinations
    rng = random.Random(3)
    for _ in range(4):
        m = rng.randint(4, 7)
        counts = [rng.randint(1, 30) for _ in range(m)]
        rows = [(float(v),) for v, c in enumerate(counts)
                for _ in range(c)]
        if len(rows) <= 30:  # n > numBins*10 contract
            rows *= 2
            counts = [c * 2 for c in counts]
        df = spark.createDataFrame(rows, "x double")
        k = 3
        n = len(rows)
        target = n / k
        best = min(
            sum((sum(counts[a:b]) - target) ** 2
                for a, b in zip((0, *cut), (*cut, m)))
            for cut in combinations(range(1, m), k - 1))
        dp = OptimalBinning(inputCol="x", outputCol="v", numBins=k,
                            method="dp").fit(df)
        assert _objective(df, "x", dp.splits, k) == pytest.approx(best)


def test_nan_values_ignored_by_both_fit_methods(spark):
    """NaN is not null, but it is unbinnable (the transform maps it to
    the all-zero vector, like null) — both fit methods must drop it,
    or the DP histogram can emit a NaN split and fail the
    strictly-increasing check."""
    clean = [(float(i % 10),) for i in range(100)]
    df_clean = spark.createDataFrame(clean, "x double")
    df_nan = spark.createDataFrame(
        clean + [(float("nan"),)] * 50, "x double")
    for method in ("dp", "quantile"):
        m_clean = OptimalBinning(inputCol="x", outputCol="v", numBins=3,
                                 method=method).fit(df_clean)
        m_nan = OptimalBinning(inputCol="x", outputCol="v", numBins=3,
                               method=method).fit(df_nan)
        assert m_nan.splits == m_clean.splits, method
        assert all(a < b for a, b in
                   zip(m_nan.splits, m_nan.splits[1:]))
