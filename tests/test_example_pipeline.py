"""End-to-end audience-modeling integration test — rebuild of the
reference's example app (sparkext-example/src/main/scala/com/collective/
sparkext/example/SparkMlExtExample.scala + DataGenerator.scala):

generated site-visitation + geo logs for a positive cohort (NY-area
geo, 'positive' sites) and negative cohort (LA-area geo, other sites)
→ Gather ×2 → S2CellTransformer → 3-way join → GatherEncoder ×2 (one
with cover) → VectorAssembler → CrossValidator(LogisticRegression) →
BinaryModelMetrics AUC. Proves every operator composes inside a
pyspark.ml Pipeline and that the learned model actually separates the
cohorts (AUC ≫ 0.5)."""

from __future__ import annotations

import random

import pytest
from pyspark.ml import Pipeline
from pyspark.ml.evaluation import BinaryClassificationEvaluator
from pyspark.ml.feature import VectorAssembler
from pyspark.ml.functions import vector_to_array
from pyspark.ml.tuning import CrossValidator, ParamGridBuilder
from pyspark.sql import functions as F

from spark_ext_spark.operators.classification import LocalLogisticRegression
from spark_ext_spark.operators.evaluation import BinaryModelMetrics
from spark_ext_spark.operators.gather import Gather
from spark_ext_spark.operators.gather_encoder import GatherEncoder
from spark_ext_spark.operators.s2cell import S2CellTransformer

POSITIVE_SITES = [f"pos{i}.example.com" for i in range(15)]
NEGATIVE_SITES = [f"neg{i}.example.com" for i in range(17)]
# NY-ish vs LA-ish coordinates (DataGenerator.scala cohort design)
POSITIVE_GEO = [(40.7 + i * 0.05, -74.0 + i * 0.05) for i in range(5)]
NEGATIVE_GEO = [(34.0 + i * 0.05, -118.2 + i * 0.05) for i in range(5)]


def _generate(rng, cookies, primary_sites, secondary_sites,
              primary_geo, secondary_geo, response):
    def imp(mean):
        return max(1, int(mean + mean * rng.gauss(0, 1)))
    sites, geo, resp = [], [], []
    for cookie in cookies:
        for s in rng.sample(primary_sites, 6):
            sites.append((cookie, s, imp(10)))
        for s in rng.sample(secondary_sites, 3):
            sites.append((cookie, s, imp(3)))
        for g in rng.sample(primary_geo, 2):
            geo.append((cookie, g[0], g[1], imp(10)))
        for g in rng.sample(secondary_geo, 1):
            geo.append((cookie, g[0], g[1], imp(3)))
        resp.append((cookie, float(response)))
    return sites, geo, resp


@pytest.fixture(scope="module")
def logs(spark):
    rng = random.Random(42)
    cookies = [f"cookie{i:04d}" for i in range(400)]
    pos, neg = cookies[:100], cookies[100:]
    ps, pg, pr = _generate(rng, pos, POSITIVE_SITES, NEGATIVE_SITES,
                           POSITIVE_GEO, NEGATIVE_GEO, 1)
    ns, ng, nr = _generate(rng, neg, NEGATIVE_SITES, POSITIVE_SITES,
                           NEGATIVE_GEO, POSITIVE_GEO, 0)
    sites = spark.createDataFrame(ps + ns,
                                  "cookie string, site string, impressions long")
    geo = spark.createDataFrame(pg + ng,
                                "cookie string, lat double, lon double, impressions long")
    resp = spark.createDataFrame(pr + nr, "cookie string, response double")
    return sites, geo, resp


def test_full_audience_modeling_pipeline(spark, logs):
    sites_df, geo_df, resp_df = logs

    gather_sites = Gather(primaryKeyCols=["cookie"], keyCol="site",
                          valueCol="impressions", outputCol="sites")
    s2 = S2CellTransformer(level=5, cellCol="s2_cell")
    gather_cells = Gather(primaryKeyCols=["cookie"], keyCol="s2_cell",
                          valueCol="impressions", outputCol="s2_cells")

    gathered_sites = gather_sites.transform(sites_df)
    gathered_cells = gather_cells.transform(s2.transform(geo_df))

    dataset = (resp_df
               .join(gathered_sites, "cookie")
               .join(gathered_cells, "cookie")
               .cache())
    assert dataset.count() == 400

    train, test = dataset.randomSplit([0.8, 0.2], seed=7)

    encode_sites = GatherEncoder(inputCol="sites", outputCol="sites_f",
                                 keyCol="site", valueCol="impressions")
    encode_cells = GatherEncoder(inputCol="s2_cells", outputCol="s2_cells_f",
                                 keyCol="s2_cell", valueCol="impressions",
                                 cover=95.0)
    assemble = VectorAssembler(inputCols=["sites_f", "s2_cells_f"],
                               outputCol="features")
    lr = LocalLogisticRegression(labelCol="response", featuresCol="features",
                                 regParam=0.01, elasticNetParam=0.5)

    pipeline = Pipeline(stages=[encode_sites, encode_cells, assemble, lr])
    evaluator = BinaryClassificationEvaluator(labelCol="response",
                                              rawPredictionCol="rawPrediction")
    grid = (ParamGridBuilder()
            .addGrid(lr.regParam, [0.01, 0.1])
            .build())
    cv = CrossValidator(estimator=pipeline, evaluator=evaluator,
                        estimatorParamMaps=grid, numFolds=2, seed=7)
    model = cv.fit(train)

    scored = model.transform(test)
    auc_eval = evaluator.evaluate(scored)
    assert auc_eval > 0.95, f"pipeline failed to separate cohorts: {auc_eval}"

    # Our own metrics implementation agrees with the built-in evaluator.
    sl = scored.select(
        F.element_at(vector_to_array("probability"), 2).alias("score"),
        F.col("response").alias("label"))
    ours = BinaryModelMetrics(sl).area_under_roc()
    assert ours == pytest.approx(auc_eval, abs=1e-6)

    # Gains curve sanity: monotone non-decreasing recall over reach.
    gains = BinaryModelMetrics(sl).gains().collect()
    recalls = [r["recall"] for r in
               sorted(gains, key=lambda r: (r["reach"], r["recall"]))]
    assert recalls == sorted(recalls)
