"""End-to-end training-data quality pipeline: the reference's ML
operators (A12 LocalLogisticRegression, A13-A16 BinaryModelMetrics)
composed with the LLM text/split operators — the audience-modeling
example (SparkMlExtExample.scala) re-expressed for document quality.

documents → text_stats features → deterministic hash split →
LocalLogisticRegression fit on train → scored test → ROC AUC.
"""

from __future__ import annotations

from pyspark.ml.feature import VectorAssembler
from pyspark.sql import functions as F

from spark_ext_spark.llm.splits import hash_split
from spark_ext_spark.llm.text import text_stats
from spark_ext_spark.operators.classification import LocalLogisticRegression
from spark_ext_spark.operators.evaluation import BinaryModelMetrics
from spark_ext_spark.plans.relational import load


def test_quality_model_end_to_end(spark, sf_small):
    docs = load(spark, sf_small, "documents")
    feats = text_stats(docs, "doc_id", "text")
    # teacher label: document length above threshold — monotone in an
    # included feature, so a converged LR must rank near-perfectly
    labeled = feats.withColumn(
        "label", (F.col("n_tokens") > 40).cast("double"))
    split = hash_split(labeled, "doc_id", salt="qm")
    assembler = VectorAssembler(
        inputCols=["n_chars", "n_tokens", "distinct_ratio", "digit_ratio",
                   "punct_ratio", "space_ratio"],
        outputCol="features")
    train = assembler.transform(split.filter(F.col("split") == "train"))
    test = assembler.transform(split.filter(F.col("split") != "train"))
    assert train.count() > 0 and test.count() > 0

    model = LocalLogisticRegression(
        featuresCol="features", labelCol="label",
        regParam=0.001, maxIter=50).fit(train.repartition(4))

    from pyspark.ml.functions import vector_to_array
    scored = model.transform(test).select(
        F.element_at(vector_to_array("probability"), 2).alias("score"),
        "label")
    auc = BinaryModelMetrics(scored, score_col="score",
                             label_col="label").area_under_roc()
    assert auc > 0.9, auc
