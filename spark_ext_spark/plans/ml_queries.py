"""ML-operator headline queries that are not SQL-expressible (S2 cell
math, iterative LR training) — declared without oracle SQL, so the
driver records rows-only checks; golden-value correctness lives in
tests/test_s2cell.py and tests/test_classification.py."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from spark_ext_spark.operators.classification import LocalLogisticRegression
from spark_ext_spark.operators.s2cell import S2CellTransformer
from spark_ext_spark.plans.relational import load


def s2_cells(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S2CellTransformer (A6) over synthetic-but-deterministic lat/lon
    derived from customer keys; groups customers per level-4 cell."""
    cust = load(spark, sf_dir, "customer")
    geo = cust.select(
        "c_custkey",
        ((F.col("c_custkey") % 160) - 80 + 0.5).cast("double").alias("lat"),
        (((F.col("c_custkey") * 7) % 360) - 180 + 0.5).cast("double").alias("lon"))
    cells = S2CellTransformer(level=4).transform(geo)
    return (cells.groupBy("cell")
            .agg(F.count(F.lit(1)).alias("n_customers"))
            .orderBy("cell"))


def local_lr_model(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LocalLogisticRegression (A12): per-user features from events
    (gathered value sums), label = 'did the user ever purchase';
    returns the fitted coefficients — deterministic FISTA training
    inside a single task."""
    from pyspark.ml.feature import VectorAssembler

    ev = load(spark, sf_dir, "events")
    feats = (ev.groupBy("user_id")
             .agg(F.sum(F.when(F.col("event_type") == "view", F.col("value"))
                        .otherwise(0.0)).alias("view_value"),
                  F.sum(F.when(F.col("event_type") == "click", F.col("value"))
                        .otherwise(0.0)).alias("click_value"),
                  F.count(F.lit(1)).cast("double").alias("n_events"),
                  F.max(F.when(F.col("event_type") == "purchase", 1.0)
                        .otherwise(0.0)).alias("label")))
    assembled = VectorAssembler(
        inputCols=["view_value", "click_value", "n_events"],
        outputCol="features").transform(feats).coalesce(1)
    model = LocalLogisticRegression(regParam=0.01, elasticNetParam=0.5,
                                    maxIter=200).fit(assembled)
    coefs = [float(c) for c in model.coefficients]
    return spark.createDataFrame(
        [(round(model.intercept, 3), *[round(c, 3) for c in coefs])],
        "intercept double, w_view double, w_click double, w_events double")
