"""Ported from StringToShortIndexerSpec.scala:9-27."""

from __future__ import annotations

import pytest

from spark_ext_spark.operators.indexer import (StringToShortIndexer,
                                               StringToShortIndexerModel)


def _df(spark):
    return spark.createDataFrame(
        [(0, "a"), (1, "b"), (2, "c"), (3, "a"), (4, "a"), (5, "c")],
        "id int, label string")


def test_assigns_frequency_ordered_indices(spark):
    df = _df(spark)
    model = StringToShortIndexer(inputCol="label", outputCol="labelIndex").fit(df)
    # counts a=3, c=2, b=1 -> a->0, c->1, b->2
    assert model.labels == ["a", "c", "b"]
    out = model.transform(df)
    assert dict(out.dtypes)["labelIndex"] == "smallint"
    got = {(r["id"], r["labelIndex"]) for r in out.collect()}
    assert got == {(0, 0), (1, 2), (2, 1), (3, 0), (4, 0), (5, 1)}
    meta = out.schema["labelIndex"].metadata["ml_attr"]
    assert meta["vals"] == ["a", "c", "b"]


def test_unseen_label_raises(spark):
    model = StringToShortIndexerModel(labels=["a", "b"])
    model._set(inputCol="label", outputCol="idx")
    df = spark.createDataFrame([(1, "zz")], "id int, label string")
    with pytest.raises(Exception, match="Unseen label"):
        model.transform(df).collect()


def test_unseen_label_skip_and_keep(spark):
    df = spark.createDataFrame([(1, "a"), (2, "zz")], "id int, label string")
    model = StringToShortIndexerModel(labels=["a", "b"])
    model._set(inputCol="label", outputCol="idx", handleInvalid="skip")
    assert [r["id"] for r in model.transform(df).collect()] == [1]
    model._set(handleInvalid="keep")
    got = {r["id"]: r["idx"] for r in model.transform(df).collect()}
    assert got == {1: 0, 2: None}


def test_missing_input_column_is_noop(spark):
    model = StringToShortIndexerModel(labels=["a"])
    model._set(inputCol="nope", outputCol="idx")
    df = spark.createDataFrame([(1, "a")], "id int, label string")
    out = model.transform(df)
    assert out.columns == df.columns


def test_numeric_input_cast_to_string(spark):
    df = spark.createDataFrame([(1, 10), (2, 10), (3, 20)], "id int, label int")
    model = StringToShortIndexer(inputCol="label", outputCol="idx").fit(df)
    assert model.labels == ["10", "20"]
