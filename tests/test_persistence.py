"""Save/load round-trips for the five fitted models.

The reference (Spark 1.5) ships NO persistence at all — zero
Writable/save hits under sparkext-mllib — so this is modern pyspark.ml
table stakes rather than a parity item: every model is
DefaultParamsWritable with its fitted state held in JSON-serializable
Params, which also makes PipelineModel.save work out of the box.
"""

from __future__ import annotations

import pytest

from spark_ext_spark.operators.binning import Binning
from spark_ext_spark.operators.classification import (
    LocalLogisticRegressionModel)
from spark_ext_spark.operators.downsampling import DownsamplingModel
from spark_ext_spark.operators.gather_encoder import GatherEncoderModel
from spark_ext_spark.operators.indexer import StringToShortIndexerModel


def test_gather_encoder_model_roundtrip(spark, tmp_path):
    m = GatherEncoderModel(keys=["google.com", "bbc.com", "cnn.com"])
    m._set(inputCol="sites", outputCol="features", keyCol="site",
           valueCol="impressions", allOther=True)
    path = str(tmp_path / "gem")
    m.save(path)
    back = GatherEncoderModel.load(path)
    assert back.keys == m.keys
    assert back.uid == m.uid
    assert back.getOrDefault(back.inputCol) == "sites"
    assert back.getOrDefault(back.allOther) is True


def test_binning_model_roundtrip(spark, tmp_path):
    m = Binning(splits=[float("-inf"), 1.5, 3.0, float("inf")])
    m._set(inputCol="x", outputCol="bins")
    path = str(tmp_path / "binning")
    m.save(path)
    back = Binning.load(path)
    assert back.splits == m.splits  # ±inf survive the JSON round-trip
    assert back.getOrDefault(back.outputCol) == "bins"


def test_indexer_model_roundtrip(spark, tmp_path):
    m = StringToShortIndexerModel(labels=["a", "c", "b"])
    m._set(inputCol="raw", outputCol="idx", handleInvalid="keep")
    path = str(tmp_path / "indexer")
    m.save(path)
    back = StringToShortIndexerModel.load(path)
    assert back.labels == ["a", "c", "b"]
    assert back.getOrDefault(back.handleInvalid) == "keep"


@pytest.mark.parametrize("fraction", [None, 0.25])
def test_downsampling_model_roundtrip(spark, tmp_path, fraction):
    m = DownsamplingModel(sampleFraction=fraction)
    m._set(labelCol="label", outputCol="w")
    path = str(tmp_path / f"ds_{fraction}")
    m.save(path)
    back = DownsamplingModel.load(path)
    assert back.sampleFraction == fraction  # None = no-op model survives
    assert back.getOrDefault(back.outputCol) == "w"


def test_llr_model_roundtrip_and_same_predictions(spark, tmp_path):
    from pyspark.ml.linalg import Vectors
    m = LocalLogisticRegressionModel(coefficients=[0.5, -1.25],
                                     intercept=0.75)
    path = str(tmp_path / "llr")
    m.save(path)
    back = LocalLogisticRegressionModel.load(path)
    assert list(back.coefficients) == [0.5, -1.25]
    assert back.intercept == 0.75
    df = spark.createDataFrame(
        [(Vectors.dense([1.0, 2.0]),), (Vectors.dense([-3.0, 0.5]),)],
        ["features"])
    a = [r["prediction"] for r in m.transform(df).collect()]
    b = [r["prediction"] for r in back.transform(df).collect()]
    assert a == b


def test_pipeline_model_save_load(spark, tmp_path):
    """The actual user-facing gap from the verdict: PipelineModel.save
    over our stages must work end-to-end."""
    from pyspark.ml import Pipeline
    from spark_ext_spark.operators.gather import Gather
    from spark_ext_spark.operators.gather_encoder import GatherEncoder

    df = spark.createDataFrame(
        [("u1", "a", 1.0), ("u1", "b", 2.0), ("u2", "a", 3.0)],
        "user string, k string, v double")
    pipe = Pipeline(stages=[
        Gather(primaryKeyCols=["user"], keyCol="k", valueCol="v",
               outputCol="gathered"),
        GatherEncoder(inputCol="gathered", outputCol="features",
                      keyCol="k", valueCol="v", allOther=False),
    ])
    model = pipe.fit(df)
    path = str(tmp_path / "pipeline")
    model.save(path)
    from pyspark.ml import PipelineModel
    back = PipelineModel.load(path)
    orig = {r["user"]: r["features"] for r in
            model.transform(df).select("user", "features").collect()}
    rest = {r["user"]: r["features"] for r in
            back.transform(df).select("user", "features").collect()}
    assert orig == rest
