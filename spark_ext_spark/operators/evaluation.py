"""BinaryModelMetrics — binary-classification curves (ROC/PR/gains/
lift/F-measure) plus trapezoid AUCs, DataFrame-native.

Rebuild of the reference's ``org.apache.spark.mllib.evaluation.
BinaryModelMetrics`` (/root/reference/sparkext-mllib/src/main/scala/org/
apache/spark/mllib/evaluation/BinaryModelMetrics.scala:46-238 — Spark
1.5's BinaryClassificationMetrics plus gains & lift,
BinaryModelMetricComputer.scala:6-21).

Pipeline (reference :156-221, re-expressed declaratively):

1. compact to one row per DISTINCT SCORE with pos/neg counts
   (the reference's combineByKey — here a hash groupBy with map-side
   partial aggregation, so the shuffle carries distinct scores only);
2. optional down-sampling to ~numBins points: consecutive
   (score-descending) points grouped in chunks of
   ``floor(distinct/numBins)``, each bin keyed by its first (highest)
   score with summed counts (reference :167-196; we group over the
   GLOBAL order, which equals the reference's per-partition grouping at
   its tested 1-partition layout and is deterministic at any layout);
3. cumulative pos/neg via a window ordered by score descending — the
   DataFrame equivalent of the reference's partition-prefix scanLeft
   round-trip (:198-216). The window runs over the COMPACTED table
   (cardinality = distinct scores, further bounded by numBins), so the
   single-partition window sort is bounded, not data-sized;
4. per-threshold confusion matrix columns: TP=cumPos, FP=cumNeg,
   FN=totPos-cumPos, TN=totNeg-cumNeg; totals joined in via a
   broadcast 1-row aggregate (no driver collect, stays lazy).

Metric definitions (Spark 1.5 binary package + reference computers):
precision = TP/(TP+FP) (1.0 when empty), recall/TPR = TP/P (0.0 when
P=0), FPR = FP/N (0.0 when N=0), Reach = (TP+FP)/total (1.0 when
total=0), Lift = Recall/Reach, F_beta standard (0.0 when P+R=0).
"""

from __future__ import annotations

from functools import cached_property

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


class BinaryModelMetrics:
    """Curves over a (score, label) DataFrame; label ∈ {0.0, 1.0}.

    Curve DataFrames are ordered by threshold descending (the
    reference's RDD order) and stay lazy until an action.
    """

    def __init__(self, score_and_labels: DataFrame, num_bins: int = 0,
                 score_col: str = "score", label_col: str = "label"):
        if num_bins < 0:
            raise ValueError("numBins must be nonnegative")
        self.df = score_and_labels.select(
            F.col(score_col).cast("double").alias("score"),
            F.col(label_col).cast("double").alias("label"))
        self.num_bins = num_bins

    # -- core cumulative table --------------------------------------------

    @cached_property
    def _counts(self) -> DataFrame:
        counts = (self.df
                  .groupBy("score")
                  .agg(F.sum("label").alias("pos"),
                       (F.count(F.lit(1)) - F.sum("label")).alias("neg")))
        if self.num_bins > 0:
            n = counts.count()
            grouping = n // self.num_bins
            if grouping >= 2:
                w = Window.orderBy(F.desc("score"))
                counts = (counts
                          .withColumn("__rn", F.row_number().over(w) - 1)
                          .withColumn("__grp",
                                      F.floor(F.col("__rn") / grouping))
                          .groupBy("__grp")
                          .agg(F.max("score").alias("score"),
                               F.sum("pos").alias("pos"),
                               F.sum("neg").alias("neg"))
                          .drop("__grp"))
        return counts

    @cached_property
    def confusions(self) -> DataFrame:
        """One row per threshold: score, tp, fp, fn, tn, tot_pos, tot_neg."""
        counts = self._counts
        w = (Window.orderBy(F.desc("score"))
             .rowsBetween(Window.unboundedPreceding, Window.currentRow))
        cum = (counts
               .withColumn("tp", F.sum("pos").over(w))
               .withColumn("fp", F.sum("neg").over(w)))
        from spark_ext_spark.functions import attach_scalar_agg
        # Cached like the reference persists cumulativeCounts
        # (BinaryModelMetrics.scala:216): every curve/AUC reuses it.
        return (attach_scalar_agg(cum,
                                  {"tot_pos": F.sum("pos"),
                                   "tot_neg": F.sum("neg")},
                                  source=counts)
                .select("score", "tp", "fp",
                        (F.col("tot_pos") - F.col("tp")).alias("fn"),
                        (F.col("tot_neg") - F.col("fp")).alias("tn"),
                        "tot_pos", "tot_neg")
                .cache())

    # -- metric expressions -------------------------------------------------

    @staticmethod
    def _recall():
        return F.when(F.col("tot_pos") == 0, 0.0) \
                .otherwise(F.col("tp") / F.col("tot_pos"))

    @staticmethod
    def _precision():
        denom = F.col("tp") + F.col("fp")
        return F.when(denom == 0, 1.0).otherwise(F.col("tp") / denom)

    @staticmethod
    def _fpr():
        return F.when(F.col("tot_neg") == 0, 0.0) \
                .otherwise(F.col("fp") / F.col("tot_neg"))

    @staticmethod
    def _reach():
        total = F.col("tot_pos") + F.col("tot_neg")
        return F.when(total == 0, 1.0) \
                .otherwise((F.col("tp") + F.col("fp")) / total)

    # -- curves --------------------------------------------------------------

    def _curve(self, x, y, x_name: str, y_name: str) -> DataFrame:
        return (self.confusions
                .orderBy(F.desc("score"))
                .select(x.alias(x_name), y.alias(y_name)))

    def _with_endpoints(self, curve: DataFrame, first: tuple | None,
                        last: tuple | None) -> DataFrame:
        spark = curve.sparkSession
        cols = curve.columns
        out = curve
        if first is not None:
            out = spark.createDataFrame([first], cols).unionAll(out)
        if last is not None:
            out = out.unionAll(spark.createDataFrame([last], cols))
        return out

    def unpersist(self) -> None:
        """Release the cached confusion table (reference
        BinaryModelMetrics.scala:70)."""
        if "confusions" in self.__dict__:
            self.confusions.unpersist()

    def thresholds(self) -> DataFrame:
        # over the compacted counts table, NOT confusions: thresholds
        # need no cumulative columns, so skip the totals attach+window
        return (self._counts.orderBy(F.desc("score"))
                .select(F.col("score").alias("threshold")))

    def gains(self) -> DataFrame:
        """(reach, recall) with (0,0) prepended and (1,1) appended
        (BinaryModelMetrics.scala:79-85)."""
        curve = self._curve(self._reach(), self._recall(), "reach", "recall")
        return self._with_endpoints(curve, (0.0, 0.0), (1.0, 1.0))

    def lift(self) -> DataFrame:
        """(reach, lift) where lift = recall / reach
        (BinaryModelMetricComputer.scala:17-21)."""
        return self._curve(self._reach(), self._recall() / self._reach(),
                           "reach", "lift")

    def roc(self) -> DataFrame:
        """(fpr, tpr) with (0,0) prepended and (1,1) appended."""
        curve = self._curve(self._fpr(), self._recall(), "fpr", "tpr")
        return self._with_endpoints(curve, (0.0, 0.0), (1.0, 1.0))

    def pr(self) -> DataFrame:
        """(recall, precision) with (0,1) prepended."""
        curve = self._curve(self._recall(), self._precision(),
                            "recall", "precision")
        return self._with_endpoints(curve, (0.0, 1.0), None)

    def precision_by_threshold(self) -> DataFrame:
        return self._curve(F.col("score"), self._precision(),
                           "threshold", "precision")

    def recall_by_threshold(self) -> DataFrame:
        return self._curve(F.col("score"), self._recall(),
                           "threshold", "recall")

    def f_measure_by_threshold(self, beta: float = 1.0) -> DataFrame:
        b2 = beta * beta
        p, r = self._precision(), self._recall()
        f = F.when((p + r) == 0, 0.0) \
             .otherwise((1 + b2) * p * r / (b2 * p + r))
        return self._curve(F.col("score"), f, "threshold", "f_measure")

    # -- areas ----------------------------------------------------------------

    @staticmethod
    def _auc(curve: DataFrame, order: list, x_name: str, y_name: str) -> float:
        """Trapezoid area with an explicit deterministic point order
        (equals the reference's threshold-descending RDD order, but
        robust to any physical partitioning)."""
        w = Window.orderBy(*order)
        area = (curve
                .select(((F.col(x_name) - F.lag(x_name).over(w))
                         * (F.col(y_name) + F.lag(y_name).over(w)) / 2.0
                         ).alias("trap"))
                .agg(F.sum("trap")).first()[0])
        return float(area or 0.0)

    def area_under_roc(self) -> float:
        # threshold desc ≡ (fpr asc, tpr asc) for cumulative curves
        return self._auc(self.roc(), [F.asc("fpr"), F.asc("tpr")],
                         "fpr", "tpr")

    def area_under_pr(self) -> float:
        # threshold desc ≡ (recall asc, precision desc)
        return self._auc(self.pr(), [F.asc("recall"), F.desc("precision")],
                         "recall", "precision")
