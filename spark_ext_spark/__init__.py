"""spark_ext_spark — a PySpark-native analytics engine.

A from-scratch rebuild of the capabilities of collectivemedia/spark-ext
(reference read-only at /root/reference) re-expressed Spark-first:
declarative DataFrame plans that Catalyst/Tungsten optimize, plus the
LLM-data-pipeline operators (dedup, similarity search, text analysis,
multimodal columns) the reference predates — all designed for
1000-executor / 100 TB scale while testable on local mode.

Layout
------
- ``functions``  : SQL expression surface (collect_array & friends).
- ``operators``  : ml-style Transformers/Estimators (Gather,
  GatherEncoder, Binning, StringToShortIndexer, Downsampling,
  S2CellTransformer), evaluation (BinaryModelMetrics) and
  classification (LocalLogisticRegression).
- ``llm``        : dedup / similarity / text-analysis / multimodal ops.
- ``sources``    : readers/writers for the supported formats.
- ``plans``      : reusable logical-plan builders (flagship queries).
- ``streaming``  : Structured Streaming variants of the operators.
"""

__version__ = "0.1.0"

from spark_ext_spark.session import get_spark  # noqa: F401
