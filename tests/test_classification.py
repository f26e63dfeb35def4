"""Ported from LocalLogisticRegressionSpec.scala:20-34,59-126,146-238 —
the exact Scala-seeded datasets regenerated via tests/java_random.py,
so the embedded R glmnet golden coefficients apply verbatim. The
abstract suite runs at partitions=1 (local in-task training) and
partitions=2 (distributed fallback); so do we."""

from __future__ import annotations

import math

import pytest
from pyspark.ml.linalg import Vectors

from spark_ext_spark.operators.classification import LocalLogisticRegression
from tests.java_random import JavaRandom


def generate_logistic_input(offset, scale, n_points, seed):
    """LocalLogisticRegressionSpec.scala:19-34."""
    rnd = JavaRandom(seed)
    x1 = [rnd.next_gaussian() for _ in range(n_points)]
    y = []
    for i in range(n_points):
        p = 1.0 / (1.0 + math.exp(-(offset + scale * x1[i])))
        y.append(1.0 if rnd.next_double() < p else 0.0)
    return [(y[i], Vectors.dense([x1[i]])) for i in range(n_points)]


def generate_multinomial_logistic_input(weights, x_mean, x_variance,
                                        add_intercept, n_points, seed):
    """LocalLogisticRegressionSpec.scala:59-126 (binary case)."""
    rnd = JavaRandom(seed)
    x_dim = len(x_mean)
    x_with_intercept = x_dim + 1 if add_intercept else x_dim
    n_classes = len(weights) // x_with_intercept + 1

    xs = [[rnd.next_gaussian() for _ in range(x_dim)]
          for _ in range(n_points)]
    for vec in xs:
        for i in range(x_dim):
            vec[i] = vec[i] * math.sqrt(x_variance[i]) + x_mean[i]

    ys = []
    for idx in range(n_points):
        margins = [0.0] * n_classes
        for i in range(n_classes - 1):
            for j in range(x_dim):
                margins[i + 1] += weights[i * x_with_intercept + j] * xs[idx][j]
            if add_intercept:
                margins[i + 1] += weights[(i + 1) * x_with_intercept - 1]
        max_margin = max(margins)
        if max_margin > 0:
            margins = [m - max_margin for m in margins]
        probs = [math.exp(m) for m in margins]
        norm = sum(probs)
        probs = [p / norm for p in probs]
        for i in range(1, n_classes):
            probs[i] += probs[i - 1]
        p = rnd.next_double()
        y = 0
        for i in range(n_classes):
            if p < probs[i]:
                y = i
                break
        ys.append(float(y))
    return [(ys[i], Vectors.dense(xs[i])) for i in range(n_points)]


@pytest.fixture(scope="module", params=[1, 2], ids=["local", "distributed"])
def partitions(request):
    return request.param


@pytest.fixture(scope="module")
def dataset(spark, partitions):
    rows = generate_logistic_input(1.0, 1.0, n_points=100, seed=42)
    return (spark.createDataFrame(rows, ["label", "features"])
            .repartition(partitions).cache())


@pytest.fixture(scope="module")
def binary_dataset(spark, partitions):
    rows = generate_multinomial_logistic_input(
        weights=[-0.57997, 0.912083, -0.371077, -0.819866, 2.688191],
        x_mean=[5.843, 3.057, 3.758, 1.199],
        x_variance=[0.6856, 0.1899, 3.116, 0.581],
        add_intercept=True, n_points=10000, seed=42)
    return (spark.createDataFrame(rows, ["label", "features"])
            .repartition(partitions).cache())


def test_predictor_classifier_methods(dataset):
    model = LocalLogisticRegression().fit(dataset)
    assert model.numClasses == 2
    results = model.transform(dataset).collect()
    eps = 1e-5
    for r in results:
        raw, prob = r["rawPrediction"], r["probability"]
        assert len(raw) == 2 and len(prob) == 2
        p1 = 1.0 / (1.0 + math.exp(-raw[1]))
        assert prob[1] == pytest.approx(p1, rel=eps)
        assert prob[0] == pytest.approx(1.0 - p1, rel=eps)
        pred_from_prob = 0 if prob[0] >= prob[1] else 1
        assert r["prediction"] == pred_from_prob
    # sanity: recovered direction of Y = logistic(1 + 1·x)
    assert model.coefficients[0] > 0 and model.intercept > 0


def test_l1_regularization_glmnet_goldens(binary_dataset):
    """LocalLogisticRegressionSpec.scala:181-238."""
    m1 = LocalLogisticRegression(fitIntercept=True, elasticNetParam=1.0,
                                 regParam=0.12, standardization=True
                                 ).fit(binary_dataset)
    # R: glmnet(..., alpha=1, lambda=0.12) goldens
    assert m1.intercept == pytest.approx(-0.05627428, rel=1e-2)
    expected1 = [0.0, 0.0, -0.04325749, -0.02481551]
    for got, exp in zip(m1.coefficients, expected1):
        assert got == pytest.approx(exp, abs=2e-2)

    m2 = LocalLogisticRegression(fitIntercept=True, elasticNetParam=1.0,
                                 regParam=0.12, standardization=False
                                 ).fit(binary_dataset)
    # R: glmnet(..., standardize=FALSE) goldens
    assert m2.intercept == pytest.approx(0.3722152, rel=1e-2)
    expected2 = [0.0, 0.0, -0.1665453, 0.0]
    for got, exp in zip(m2.coefficients, expected2):
        assert got == pytest.approx(exp, abs=1e-3)


def test_lr_newton_steps_matches_numpy_and_descends(spark):
    """The cross-engine-replayable 2-step Newton query
    (plans/ml_queries.py lr_newton_steps): a numpy replay of the SAME
    lattice algorithm must reproduce the coefficients to the 1e-6
    quantizer, and the fitted betas must beat beta=0 on log-loss."""
    import numpy as np

    from spark_ext_spark.plans.ml_queries import lr_newton_steps
    from spark_ext_spark.plans.relational import load
    from pyspark.sql import functions as F

    sf = "/root/testdata/sf0.001"
    got = lr_newton_steps(spark, sf).collect()[0]
    beta_sql = np.array([got["intercept"], got["w_view"],
                         got["w_click"], got["w_events"]])

    ev = load(spark, sf, "events")
    feats = (ev.groupBy("user_id")
             .agg(F.sum(F.when(F.col("event_type") == "view",
                               F.col("value")).otherwise(0.0)).alias("v"),
                  F.sum(F.when(F.col("event_type") == "click",
                               F.col("value")).otherwise(0.0)).alias("c"),
                  F.count(F.lit(1)).alias("n"),
                  F.max(F.when(F.col("event_type") == "purchase", 1)
                        .otherwise(0)).alias("y")).collect())
    q = np.array([[10000,
                   math.floor(r["v"] / 1000.0 * 10000.0 + 0.5),
                   math.floor(r["c"] / 1000.0 * 10000.0 + 0.5),
                   r["n"] * 100] for r in feats], dtype=np.int64)
    y = np.array([r["y"] for r in feats], dtype=np.int64)

    def quant(x):
        return np.floor(x * 1e6 + 0.5) / 1e6

    # iteration 1: exact integer moments, p = 0.5
    ig = (q * (2 * y - 1)[:, None]).sum(axis=0)
    ih = (q[:, :, None] * q[:, None, :]).sum(axis=0)
    g = ig.astype(np.float64) * 0.00005
    h = ih.astype(np.float64) * 0.0000000025
    beta = quant(np.linalg.solve(h, g))
    # iteration 2: quantized double moments
    x = q.astype(np.float64) * 0.0001
    x[:, 0] = 1.0
    p = 1.0 / (1.0 + np.exp(-(x @ beta)))
    g2 = quant((x * (y - p)[:, None]).sum(axis=0))
    w = p * (1 - p)
    h2 = quant((x[:, :, None] * x[:, None, :] * w[:, None, None]).sum(axis=0))
    beta2 = quant(beta + np.linalg.solve(h2, g2))

    # Cramer (SQL) vs LAPACK (numpy) agree to the 1e-6 quantizer
    assert np.allclose(beta_sql, beta2, atol=2e-6), (beta_sql, beta2)

    def loss(b):
        z = x @ b
        return float(np.mean(np.log1p(np.exp(-np.abs(z)))
                             + np.maximum(z, 0) - y * z))

    assert loss(beta_sql) < loss(np.zeros(4))


def test_no_intercept_local_matches_distributed(spark):
    """fitIntercept=False: the local solver must not center features
    (there is no intercept to fold the offset into) — its margins must
    match Spark's own LR on the same data, which scales but never
    centers in this mode."""
    import numpy as np
    from pyspark.ml.linalg import Vectors
    rng = np.random.default_rng(7)
    X = rng.normal(loc=3.0, scale=1.5, size=(500, 2))  # nonzero means
    w_true = np.array([1.2, -0.8])
    y = (X @ w_true + rng.logistic(size=500) > 0).astype(float)
    rows = [(float(lbl), Vectors.dense(x)) for lbl, x in zip(y, X)]
    df = spark.createDataFrame(rows, ["label", "features"])
    local = LocalLogisticRegression(fitIntercept=False, regParam=0.01) \
        .fit(df.coalesce(1))
    dist = LocalLogisticRegression(fitIntercept=False, regParam=0.01) \
        .fit(df.repartition(4))
    assert local.intercept == 0.0 and dist.intercept == 0.0
    np.testing.assert_allclose(local.coefficients, dist.coefficients,
                               rtol=0.05)
