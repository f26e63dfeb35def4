"""Ported from DownsamplingSpec.scala:15-83 (statistical ±10%
assertions on seeded data)."""

from __future__ import annotations

import uuid

import pytest

from spark_ext_spark.operators.downsampling import Downsampling


def _dataset(spark, positives, negatives):
    rows = ([(str(uuid.uuid4()), 1.0)] * positives
            + [(str(uuid.uuid4()), 0.0)] * negatives)
    return spark.createDataFrame(rows, "cookie_id string, label double")


def test_skip_sampling_below_threshold(spark):
    df = _dataset(spark, 100, 900)  # ratio 9 < default cap 30
    model = Downsampling(labelCol="label", outputCol="sample_weight",
                         primaryClass=1.0).fit(df)
    assert model.sampleFraction is None
    out = model.transform(df)
    assert dict(out.dtypes)["sample_weight"] == "double"
    weights = {r["sample_weight"] for r in out.collect()}
    assert weights == {1.0}


def test_sample_negatives_above_threshold(spark):
    df = _dataset(spark, 100, 9000)  # ratio 90
    model = Downsampling(labelCol="label", outputCol="sample_weight",
                         maxClassRatio=29.0, primaryClass=1.0).fit(df)
    expected_fraction = 2900.0 / 9000
    assert model.sampleFraction == pytest.approx(expected_fraction, rel=1e-9)

    out = model.transform(df)
    n = out.count()
    assert 2900 <= n <= 3100
    weights = {r["label"]: r["sample_weight"]
               for r in out.select("label", "sample_weight").distinct().collect()}
    assert weights[1.0] == 1.0
    assert weights[0.0] == pytest.approx(9000.0 / 2900, rel=1e-9)


def test_primary_class_must_exist(spark):
    df = _dataset(spark, 0, 100)
    with pytest.raises(ValueError, match="Primary class"):
        Downsampling(labelCol="label").fit(df)


def test_hash_mode_is_deterministic(spark):
    rows = [(i, 1.0 if i < 10 else 0.0) for i in range(1010)]
    df = spark.createDataFrame(rows, "key long, label double")
    model = Downsampling(labelCol="label", outputCol="w", maxClassRatio=10.0,
                         samplingMode="hash", hashKeyCol="key").fit(df)
    assert model.sampleFraction == pytest.approx(100.0 / 1000)
    a = sorted(r["key"] for r in model.transform(df).collect())
    b = sorted(r["key"] for r in model.transform(df).collect())
    assert a == b  # exactly reproducible
    n_secondary = sum(1 for k in a if k >= 10)
    assert 50 <= n_secondary <= 150  # ≈100 expected


def test_wrong_label_type_raises(spark):
    df = spark.createDataFrame([("a", 1)], "cookie string, label int")
    with pytest.raises(TypeError):
        Downsampling(labelCol="label").fit(df)


def test_hash_mode_survives_huge_keys_under_ansi(spark):
    """Snowflake-style ids overflow a naive key*2654435761 long
    multiply under Spark 4's default ANSI mode — the split-modular
    form must sample without error AND agree with naive math where it
    is computable (small keys)."""
    big = spark.createDataFrame(
        [(2**62 + i, 1.0 if i < 3 else 0.0) for i in range(100)],
        "k long, label double")
    model = Downsampling(labelCol="label", maxClassRatio=2.0,
                         samplingMode="hash", hashKeyCol="k").fit(big)
    out = model.transform(big)
    assert out.count() > 0                      # no ARITHMETIC_OVERFLOW
    # small keys: congruent to the naive (key*K) % 2^32 threshold test
    K, MOD = 2654435761, 1 << 32
    small = spark.createDataFrame(
        [(i, 1.0 if i < 5 else 0.0) for i in range(2000)],
        "k long, label double")
    m2 = Downsampling(labelCol="label", maxClassRatio=2.0,
                      samplingMode="hash", hashKeyCol="k").fit(small)
    frac = m2.sampleFraction
    got = {r["k"] for r in m2.transform(small).collect()}
    expect = {i for i in range(5)} | {
        i for i in range(5, 2000) if (i * K) % MOD < int(frac * MOD)}
    assert got == expect
