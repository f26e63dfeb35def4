"""SparkSession factory with scale-oriented defaults.

Defaults chosen for the 100 TB design target (AQE on, skew-join
handling, partial aggregation pushdown) while remaining correct on
``local[N]`` test runs. Every knob is overridable via ``extra_conf``.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

DEFAULT_CONF: dict[str, str] = {
    # Adaptive execution: runtime re-plan of shuffle partition counts,
    # skew-join splitting, and broadcast-join demotion/promotion.
    "spark.sql.adaptive.enabled": "true",
    "spark.sql.adaptive.coalescePartitions.enabled": "true",
    "spark.sql.adaptive.skewJoin.enabled": "true",
    # Arrow for every pandas_udf / mapInPandas boundary.
    "spark.sql.execution.arrow.pyspark.enabled": "true",
    # At 100 TB this is set per-cluster; local default keeps tests fast.
    "spark.sql.shuffle.partitions": "32",
    # Auto-broadcast small dimension tables (region/nation/... at any SF
    # below ~10; explicit broadcast() hints are still used in operators).
    "spark.sql.autoBroadcastJoinThreshold": "64MB",
    # Let the planner pick shuffled-hash over sort-merge when its size
    # conditions hold (one side per-partition small): skips both sort
    # passes on joins whose build side fits, at any scale — the
    # guide's recommended batch baseline. AQE additionally rewrites a
    # planned SMJ to shuffled-hash at runtime when every build-side
    # partition is under the local-map threshold (default 0 = off).
    # Both are planner hints gated on size checks, not local-core
    # tuning; sort-merge remains the fallback whenever the build side
    # is too big to hash.
    "spark.sql.join.preferSortMergeJoin": "false",
    "spark.sql.adaptive.maxShuffledHashJoinLocalMapThreshold": "64MB",
    "spark.sql.files.maxPartitionBytes": "128MB",
    # The testdata's events.ts is parquet TIMESTAMP(NANOS), which Spark
    # rejects by default; read as long and normalize in sources.load.
    "spark.sql.legacy.parquet.nanosAsLong": "true",
    "spark.driver.memory": os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"),
    "spark.ui.enabled": "false",
    "spark.sql.session.timeZone": "UTC",
}


def resolve_conf(extra_conf: dict[str, str] | None = None) -> dict[str, str]:
    """Merge DEFAULT_CONF ← SPARK_GRAFT_EXTRA_CONF (JSON env) ← extra_conf.

    The env override, e.g. ``'{"spark.sql.shuffle.partitions": "5"}'``,
    lets the verify tooling replay the whole suite under adversarial
    configs (odd parallelism, AQE off) to prove results are
    partitioning-invariant — the axis that actually changes between
    local[32] and a 1000-executor cluster. Caller-supplied
    ``extra_conf`` stays strongest so operator tests keep their pins.
    """
    conf = dict(DEFAULT_CONF)
    env_conf = os.environ.get("SPARK_GRAFT_EXTRA_CONF")
    if env_conf:
        import json
        conf.update(json.loads(env_conf))
    if extra_conf:
        conf.update(extra_conf)
    return conf


def get_spark(
    app_name: str = "spark_ext_spark",
    master: str | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or reuse) a SparkSession with the engine's defaults."""
    if master is None:
        cpus = os.environ.get("SPARK_GRAFT_CPUS", "*")
        master = f"local[{cpus}]"
    builder = SparkSession.builder.appName(app_name).master(master)
    for k, v in resolve_conf(extra_conf).items():
        builder = builder.config(k, v)
    return builder.getOrCreate()
