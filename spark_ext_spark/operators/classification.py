"""LocalLogisticRegression — binary logistic regression that trains
inside a single executor task when the input has exactly one partition,
and falls back to distributed ``pyspark.ml`` otherwise.

Rebuild of the reference's ``org.apache.spark.ml.classification.
LocalLogisticRegression`` (/root/reference/sparkext-mllib/src/main/
scala/org/apache/spark/ml/classification/LocalLogisticRegression.scala:
21-216): partition-count dispatch at :183-190 (mapPartitions over the
single partition, breeze LBFGS/OWLQN elastic-net, standardization,
intercept init log(count1/count0)); reflection fallback to Spark's own
LogisticRegression at :199-212.

Objective (identical to glmnet / Spark ML, which the reference's tests
pin against R glmnet goldens, LocalLogisticRegressionSpec.scala:209-238):

    min  (1/N) Σ log(1+exp(-y'·m)) + λ[ α·Σ l1_j|β_j| + (1-α)/2·Σ l2_j β_j² ]

with the intercept unpenalized; standardization=True penalizes the
standardized coefficients, standardization=False penalizes the raw
ones (implemented as per-feature penalty factors 1/std and 1/std² on
the standardized problem — the same trick Spark's LogisticCostFun
uses). The local solver is FISTA (accelerated proximal gradient with
adaptive restart) on the standardized problem — numpy only, no scipy.

Scale note: at 100 TB you use the distributed path; the local path
exists for the many-small-models regime (per-segment models trained
concurrently, one task each) — exactly the reference's use case.
"""

from __future__ import annotations

import math

import numpy as np
from pyspark import keyword_only
from pyspark.ml import Estimator, Model
from pyspark.ml.classification import LogisticRegression
from pyspark.ml.functions import array_to_vector, vector_to_array
from pyspark.ml.param import Param, Params, TypeConverters
from pyspark.ml.util import DefaultParamsReadable, DefaultParamsWritable
from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _solve_logistic_elastic_net(X: np.ndarray, y: np.ndarray,
                                reg_param: float, elastic_net: float,
                                fit_intercept: bool, standardization: bool,
                                max_iter: int, tol: float
                                ) -> tuple[np.ndarray, float]:
    """FISTA elastic-net binary logistic solver. Returns
    (coefficients on the original feature scale, intercept)."""
    n, d = X.shape
    # Center only when an intercept absorbs the shift at the end
    # (coef·mean folds into it). Without an intercept there is nothing
    # to fold the centering offset into — the returned model would be
    # shifted by Σ coef_j·mean_j relative to the problem solved — so
    # scale-only, exactly like Spark's own LogisticRegression with
    # fitIntercept=False.
    mean = X.mean(axis=0) if fit_intercept else np.zeros(d)
    std = X.std(axis=0)
    std_safe = np.where(std > 0, std, 1.0)
    Xs = (X - mean) / std_safe

    lam = reg_param
    alpha = elastic_net
    if standardization:
        l1 = np.full(d, lam * alpha)
        l2 = np.full(d, lam * (1 - alpha))
    else:
        l1 = lam * alpha / std_safe
        l2 = lam * (1 - alpha) / (std_safe ** 2)
    l1 = np.where(std > 0, l1, 0.0)
    l2 = np.where(std > 0, l2, 0.0)

    # Lipschitz constant of the smooth part: 0.25·σmax(Xs'Xs)/N + max l2
    # (d is small: the dictionary-fit regime; eigh on d×d is cheap).
    gram = Xs.T @ Xs / n
    lip = 0.25 * float(np.linalg.eigvalsh(gram)[-1]) + float(l2.max(initial=0.0))
    lip = max(lip, 1e-12)
    step = 1.0 / lip

    pos = float(y.sum())
    neg = n - pos
    b = math.log(max(pos, 1e-12) / max(neg, 1e-12)) if fit_intercept else 0.0
    w = np.zeros(d)
    wz, bz = w.copy(), b  # FISTA momentum point
    t_mom = 1.0

    def grads(wv, bv):
        m = Xs @ wv + bv
        p = 1.0 / (1.0 + np.exp(-m))
        gw = Xs.T @ (p - y) / n + l2 * wv
        gb = float((p - y).mean()) if fit_intercept else 0.0
        return gw, gb

    max_inner = max(max_iter, 500)
    for _ in range(max_inner):
        gw, gb = grads(wz, bz)
        w_new = wz - step * gw
        # soft-threshold prox for the L1 term
        w_new = np.sign(w_new) * np.maximum(np.abs(w_new) - step * l1, 0.0)
        b_new = bz - step * gb if fit_intercept else 0.0

        dw = np.abs(w_new - w).max(initial=0.0)
        db = abs(b_new - b)
        t_next = (1 + math.sqrt(1 + 4 * t_mom * t_mom)) / 2
        mom = (t_mom - 1) / t_next
        # adaptive restart on non-descent direction
        if np.dot(wz - w_new, w_new - w) + (bz - b_new) * (b_new - b) > 0:
            t_next, mom = 1.0, 0.0
        wz = w_new + mom * (w_new - w)
        bz = b_new + mom * (b_new - b)
        w, b, t_mom = w_new, b_new, t_next
        if dw < tol and db < tol:
            break

    coef = np.where(std > 0, w / std_safe, 0.0)
    intercept = b - float((coef * mean).sum()) if fit_intercept else 0.0
    return coef, intercept


class _LLRParams(Params):
    featuresCol = Param(Params._dummy(), "featuresCol", "features vector",
                        typeConverter=TypeConverters.toString)
    labelCol = Param(Params._dummy(), "labelCol", "label column",
                     typeConverter=TypeConverters.toString)
    predictionCol = Param(Params._dummy(), "predictionCol", "prediction",
                          typeConverter=TypeConverters.toString)
    rawPredictionCol = Param(Params._dummy(), "rawPredictionCol",
                             "raw margins", typeConverter=TypeConverters.toString)
    probabilityCol = Param(Params._dummy(), "probabilityCol", "probability",
                           typeConverter=TypeConverters.toString)
    regParam = Param(Params._dummy(), "regParam", "λ",
                     typeConverter=TypeConverters.toFloat)
    elasticNetParam = Param(Params._dummy(), "elasticNetParam", "α in [0,1]",
                            typeConverter=TypeConverters.toFloat)
    maxIter = Param(Params._dummy(), "maxIter", "max iterations",
                    typeConverter=TypeConverters.toInt)
    tol = Param(Params._dummy(), "tol", "convergence tolerance",
                typeConverter=TypeConverters.toFloat)
    fitIntercept = Param(Params._dummy(), "fitIntercept", "fit intercept",
                         typeConverter=TypeConverters.toBoolean)
    standardization = Param(Params._dummy(), "standardization",
                            "penalize standardized coefficients",
                            typeConverter=TypeConverters.toBoolean)

    _DEFAULTS = dict(featuresCol="features", labelCol="label",
                     predictionCol="prediction",
                     rawPredictionCol="rawPrediction",
                     probabilityCol="probability",
                     regParam=0.0, elasticNetParam=0.0, maxIter=100,
                     tol=1e-6, fitIntercept=True, standardization=True)


class LocalLogisticRegression(Estimator, _LLRParams,
                              DefaultParamsReadable, DefaultParamsWritable):
    @keyword_only
    def __init__(self, **kwargs):
        super().__init__()
        self._setDefault(**self._DEFAULTS)
        self._set(**{k: v for k, v in self._input_kwargs.items()
                     if v is not None})

    def _fit(self, dataset: DataFrame) -> "LocalLogisticRegressionModel":
        p = {name: self.getOrDefault(getattr(self, name))
             for name in self._DEFAULTS}
        if dataset.rdd.getNumPartitions() == 1:
            coef, intercept = self._fit_local(dataset, p)
        else:
            coef, intercept = self._fit_distributed(dataset, p)
        model = LocalLogisticRegressionModel(coefficients=coef,
                                             intercept=intercept)
        model._resetUid(self.uid)
        self._copyValues(model)
        return model

    def _fit_local(self, dataset: DataFrame, p: dict):
        """Train inside the single partition's task (reference :183-190)."""
        rows = dataset.select(
            F.col(p["labelCol"]).cast("double").alias("label"),
            vector_to_array(F.col(p["featuresCol"])).alias("x"))

        def train(partition):
            data = list(partition)
            if not data:
                return iter([])
            y = np.array([r["label"] for r in data])
            X = np.array([r["x"] for r in data])
            coef, b = _solve_logistic_elastic_net(
                X, y, p["regParam"], p["elasticNetParam"],
                p["fitIntercept"], p["standardization"],
                p["maxIter"], p["tol"])
            return iter([(coef.tolist(), float(b))])

        coef, intercept = rows.rdd.mapPartitions(train).first()
        return np.asarray(coef), intercept

    def _fit_distributed(self, dataset: DataFrame, p: dict):
        """Fallback to Spark's own distributed LR (reference :199-212 —
        no reflection needed in PySpark)."""
        lr = LogisticRegression(
            featuresCol=p["featuresCol"], labelCol=p["labelCol"],
            regParam=p["regParam"], elasticNetParam=p["elasticNetParam"],
            maxIter=p["maxIter"], tol=p["tol"],
            fitIntercept=p["fitIntercept"],
            standardization=p["standardization"], family="binomial")
        m = lr.fit(dataset)
        return m.coefficients.toArray(), float(m.intercept)


class LocalLogisticRegressionModel(Model, _LLRParams,
                                   DefaultParamsReadable,
                                   DefaultParamsWritable):
    """Binary LR model; transform appends rawPrediction/probability/
    prediction entirely with JVM expressions (zip_with + aggregate dot
    product — no Python in the row path)."""

    modelCoefficients = Param(Params._dummy(), "modelCoefficients",
                              "fitted coefficient vector (persisted state "
                              "for DefaultParamsWritable save/load)")
    modelIntercept = Param(Params._dummy(), "modelIntercept",
                           "fitted intercept (persisted state)",
                           typeConverter=TypeConverters.toFloat)

    def __init__(self, coefficients=None, intercept: float = 0.0):
        super().__init__()
        self._setDefault(**self._DEFAULTS)
        self._setDefault(modelCoefficients=[], modelIntercept=0.0)
        if coefficients is not None:
            self._set(modelCoefficients=[float(c) for c in coefficients])
        self._set(modelIntercept=float(intercept))

    @property
    def coefficients(self) -> np.ndarray:
        return np.asarray(self.getOrDefault(self.modelCoefficients))

    @property
    def intercept(self) -> float:
        return float(self.getOrDefault(self.modelIntercept))

    @property
    def numClasses(self) -> int:
        return 2

    @property
    def weights(self) -> np.ndarray:
        return self.coefficients

    def _transform(self, dataset: DataFrame) -> DataFrame:
        features = self.getOrDefault(self.featuresCol)
        arr = vector_to_array(F.col(features))
        coefs = F.lit([float(c) for c in self.coefficients])
        margin = F.lit(self.intercept) + F.aggregate(
            F.zip_with(arr, coefs, lambda x, c: x * c),
            F.lit(0.0), lambda acc, v: acc + v)
        prob1 = F.lit(1.0) / (F.lit(1.0) + F.exp(-margin))
        raw = array_to_vector(F.array(-margin, margin))
        probability = array_to_vector(F.array(F.lit(1.0) - prob1, prob1))
        prediction = F.when(prob1 > 0.5, 1.0).otherwise(0.0)
        return dataset.select(
            "*",
            raw.alias(self.getOrDefault(self.rawPredictionCol)),
            probability.alias(self.getOrDefault(self.probabilityCol)),
            prediction.alias(self.getOrDefault(self.predictionCol)))
