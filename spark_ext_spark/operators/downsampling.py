"""Downsampling — cap the negative:positive class ratio by sampling the
secondary class and attaching inverse-probability sample weights.

Rebuild of the reference's ``org.apache.spark.ml.sampling.Downsampling``
(/root/reference/sparkext-mllib/src/main/scala/org/apache/spark/ml/
sampling/Downsampling.scala:44-141). Contract:

- fit: count primary (label == primaryClass, default 1.0) vs secondary
  rows; ratio ≤ maxClassRatio (default 30, validator (0,1000]) → no-op
  model; else sampleFraction = primary·maxRatio / secondary
  (Downsampling.scala:67-88). Primary class must be present.
- transform: no-op model appends weight 1.0; sampling model keeps all
  primary rows (weight 1.0) and samples secondary rows with weight
  1/fraction, unioned (duplicates kept — Downsampling.scala:115-131).
  Labels must be 0.0/1.0 and non-null: a NULL label compares NULL to
  primaryClass, so the sampling branches drop such rows while the
  no-op branch keeps them — reference parity (its === / =!= filters
  behave identically, Downsampling.scala:115-131); validate labels
  upstream (check_expectations not_null) rather than relying on
  either branch's treatment of them.

Spark-first: the two count jobs collapse into ONE groupBy(label).count
(map-side combined). Sampling modes:

- ``random`` (reference parity): seeded ``df.sample`` — Bernoulli per
  row, no shuffle.
- ``hash``: deterministic filter ``(key·2654435761) mod 2^32 <
  fraction·2^32`` (Knuth multiplicative hash on a numeric key column).
  Exactly reproducible across runs/retries — at 100 TB a re-executed
  lost task resamples identically, so downstream joins stay consistent;
  also exactly replayable by a SQL oracle.
"""

from __future__ import annotations

from pyspark import keyword_only
from pyspark.ml import Estimator, Model
from pyspark.ml.param import Param, Params, TypeConverters
from pyspark.ml.util import DefaultParamsReadable, DefaultParamsWritable
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_KNUTH = 2654435761
_MOD = 1 << 32


class _DownsamplingParams(Params):
    labelCol = Param(Params._dummy(), "labelCol",
                     "double label column (0.0/1.0)",
                     typeConverter=TypeConverters.toString)
    outputCol = Param(Params._dummy(), "outputCol", "sample weight column",
                      typeConverter=TypeConverters.toString)
    primaryClass = Param(Params._dummy(), "primaryClass",
                         "class to keep in full (0.0 or 1.0)",
                         typeConverter=TypeConverters.toFloat)
    sampleWithReplacement = Param(Params._dummy(), "sampleWithReplacement",
                                  "sample secondary class with replacement",
                                  typeConverter=TypeConverters.toBoolean)
    samplingMode = Param(Params._dummy(), "samplingMode",
                         "random (Bernoulli, reference parity) | hash "
                         "(deterministic on hashKeyCol)",
                         typeConverter=TypeConverters.toString)
    hashKeyCol = Param(Params._dummy(), "hashKeyCol",
                       "numeric key column for hash sampling mode",
                       typeConverter=TypeConverters.toString)
    seed = Param(Params._dummy(), "seed", "seed for random sampling mode",
                 typeConverter=TypeConverters.toInt)

    def _validate(self, schema):
        label = self.getOrDefault(self.labelCol)
        if schema[label].dataType.typeName() != "double":
            raise TypeError(
                f"Label column data type "
                f"{schema[label].dataType.simpleString()} is not supported.")

    def _default_output_col(self):
        return f"{self.uid}_sample_weight"


class Downsampling(Estimator, _DownsamplingParams,
                   DefaultParamsReadable, DefaultParamsWritable):
    maxClassRatio = Param(Params._dummy(), "maxClassRatio",
                          "max secondary:primary ratio, in (0, 1000]",
                          typeConverter=TypeConverters.toFloat)

    @keyword_only
    def __init__(self, *, labelCol=None, outputCol=None, primaryClass=1.0,
                 maxClassRatio=30.0, sampleWithReplacement=False,
                 samplingMode="random", hashKeyCol=None, seed=42):
        super().__init__()
        self._setDefault(primaryClass=1.0, maxClassRatio=30.0,
                         sampleWithReplacement=False, samplingMode="random",
                         seed=42)
        kwargs = self._input_kwargs
        self._set(**{k: v for k, v in kwargs.items() if v is not None})

    def _fit(self, dataset: DataFrame) -> "DownsamplingModel":
        self._validate(dataset.schema)
        ratio_cap = self.getOrDefault(self.maxClassRatio)
        if not (0.0 < ratio_cap <= 1000.0):
            raise ValueError("maxClassRatio must be in (0, 1000]")
        label = self.getOrDefault(self.labelCol)
        primary_class = self.getOrDefault(self.primaryClass)

        # One distributed job instead of the reference's two count()s
        # (Downsampling.scala:70-71).
        counts = (dataset
                  .groupBy((F.col(label) == primary_class).alias("is_primary"))
                  .count().collect())
        by_class = {r["is_primary"]: r["count"] for r in counts}
        primary_cnt = by_class.get(True, 0)
        secondary_cnt = by_class.get(False, 0)
        if primary_cnt <= 0:
            raise ValueError(
                f"Primary class {primary_class} should be presented in dataset")

        fraction = None
        if secondary_cnt / primary_cnt > ratio_cap:
            fraction = (primary_cnt * ratio_cap) / secondary_cnt
        model = DownsamplingModel(sampleFraction=fraction)
        model._resetUid(self.uid)
        self._copyValues(model)
        return model


class DownsamplingModel(Model, _DownsamplingParams,
                        DefaultParamsReadable, DefaultParamsWritable):
    fittedFraction = Param(Params._dummy(), "fittedFraction",
                           "fitted secondary-class sample fraction; unset "
                           "(default None) = no-op model (persisted state "
                           "for DefaultParamsWritable save/load)")

    def __init__(self, sampleFraction: float | None = None):
        super().__init__()
        self._setDefault(primaryClass=1.0, sampleWithReplacement=False,
                         samplingMode="random", seed=42, fittedFraction=None)
        if sampleFraction is not None:
            self._set(fittedFraction=float(sampleFraction))

    @property
    def sampleFraction(self) -> float | None:
        return self.getOrDefault(self.fittedFraction)

    def _transform(self, dataset: DataFrame) -> DataFrame:
        self._validate(dataset.schema)
        out = (self.getOrDefault(self.outputCol)
               if self.isSet(self.outputCol) else self._default_output_col())
        if self.sampleFraction is None:
            return dataset.select("*", F.lit(1.0).alias(out))

        label = self.getOrDefault(self.labelCol)
        primary_class = self.getOrDefault(self.primaryClass)
        fraction = self.sampleFraction
        mode = self.getOrDefault(self.samplingMode)

        primary = (dataset.filter(F.col(label) == primary_class)
                   .select("*", F.lit(1.0).alias(out)))
        secondary = dataset.filter(F.col(label) != primary_class)
        if mode == "hash":
            key = self.getOrDefault(self.hashKeyCol)
            threshold = int(fraction * _MOD)
            # (key·K) mod 2^32 computed without ever exceeding ~2^48:
            # a naive key*K long-multiply raises ARITHMETIC_OVERFLOW
            # under Spark 4's default ANSI mode once |key| > ~3.4e9
            # (snowflake ids, epoch millis). Reduce mod 2^32 first,
            # split into 16-bit halves, and use
            # (K·(hi·2^16+lo)) mod 2^32 = ((K·hi mod 2^16)·2^16
            # + K·lo) mod 2^32 — congruent to the naive product for
            # every key, so sampled sets (and the SQL oracle, which
            # multiplies small test ids directly) are unchanged.
            k32 = F.pmod(F.col(key).cast("long"), F.lit(_MOD))
            hi, lo = F.shiftright(k32, 16), k32.bitwiseAND(F.lit(0xFFFF))
            h = F.pmod(
                F.shiftleft(F.pmod(hi * F.lit(_KNUTH), F.lit(1 << 16)), 16)
                + lo * F.lit(_KNUTH),
                F.lit(_MOD))
            secondary = secondary.filter(h < F.lit(threshold))
        elif mode == "random":
            secondary = secondary.sample(
                withReplacement=self.getOrDefault(self.sampleWithReplacement),
                fraction=fraction, seed=self.getOrDefault(self.seed))
        else:
            raise ValueError("samplingMode must be 'random' or 'hash'")
        secondary = secondary.select("*", F.lit(1.0 / fraction).alias(out))
        return primary.unionByName(secondary)
