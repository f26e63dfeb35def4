"""Config resolution for the session factory.

Pure-dict tests (no SparkSession): resolve_conf is the seam the
adversarial-config sweeps (`SPARK_GRAFT_EXTRA_CONF`) go through, so
its precedence order — defaults < env JSON < caller extra_conf — is
pinned here without the cost or singleton-pollution of building a
second Spark context inside the suite.
"""

import pytest

from spark_ext_spark.session import DEFAULT_CONF, resolve_conf


def test_defaults_pass_through(monkeypatch):
    monkeypatch.delenv("SPARK_GRAFT_EXTRA_CONF", raising=False)
    assert resolve_conf() == DEFAULT_CONF
    # and it's a copy, not the module dict
    assert resolve_conf() is not DEFAULT_CONF


def test_env_overrides_defaults(monkeypatch):
    monkeypatch.setenv(
        "SPARK_GRAFT_EXTRA_CONF",
        '{"spark.sql.shuffle.partitions": "5",'
        ' "spark.sql.adaptive.enabled": "false"}')
    conf = resolve_conf()
    assert conf["spark.sql.shuffle.partitions"] == "5"
    assert conf["spark.sql.adaptive.enabled"] == "false"
    # untouched keys keep their defaults
    assert conf["spark.sql.session.timeZone"] == "UTC"


def test_caller_extra_conf_beats_env(monkeypatch):
    monkeypatch.setenv(
        "SPARK_GRAFT_EXTRA_CONF", '{"spark.sql.shuffle.partitions": "5"}')
    conf = resolve_conf({"spark.sql.shuffle.partitions": "7"})
    assert conf["spark.sql.shuffle.partitions"] == "7"


def test_malformed_env_json_fails_loudly(monkeypatch):
    monkeypatch.setenv("SPARK_GRAFT_EXTRA_CONF", "shuffle=5")
    with pytest.raises(ValueError):
        resolve_conf()


def test_shj_default_survives_skewed_build_side(spark):
    """Engineered-skew guard for the session's global
    ``preferSortMergeJoin=false`` (VERDICT r12 item #4): a join whose
    BUILD side concentrates 50k of its 50.1k rows on one key must
    (a) still complete and produce exactly the sort-merge result under
    the SHJ-preferring default, with AQE on (default cell) and off
    with 5 shuffle partitions (the adversarial sweep cell), and
    (b) actually EXECUTE as ShuffledHashJoin in the AQE final plan
    when broadcast is disabled — the runtime rewrite
    ``maxShuffledHashJoinLocalMapThreshold=64MB`` from session.py
    (with autoBroadcastJoinThreshold=-1 the STATIC planner can never
    pick SHJ: its size gate is threshold x numShufflePartitions, so
    only the AQE path is exercisable here). SHJ's documented risk is
    an OOM when a build-side partition's hash table doesn't fit
    (guide 3.1) — this pins the failure mode at a skew ratio
    (50 000:1) far past AQE's skewedPartitionFactor so a future conf
    change that breaks skewed builds fails here first."""
    from pyspark.sql import functions as F

    build = spark.range(50_100).select(
        F.when(F.col("id") < 50_000, F.lit(0))
         .otherwise(F.col("id") % 100).alias("k"),
        F.col("id").alias("payload"))
    probe = spark.range(10_000).select(
        (F.col("id") % 100).alias("k"), F.col("id").alias("pid"))

    def joined_count():
        return probe.join(build, "k").groupBy().count().collect()[0][0]

    confs = spark.conf
    saved = {k: confs.get(k) for k in
             ("spark.sql.join.preferSortMergeJoin",
              "spark.sql.autoBroadcastJoinThreshold",
              "spark.sql.adaptive.enabled",
              "spark.sql.shuffle.partitions")}
    try:
        confs.set("spark.sql.autoBroadcastJoinThreshold", "-1")

        confs.set("spark.sql.join.preferSortMergeJoin", "true")
        expected = joined_count()
        # hot key: (50 000 + 1) build rows x 100 probes; the other 99
        # keys: 1 build row x 100 probes each
        assert expected == 50_001 * 100 + 99 * 100

        confs.set("spark.sql.join.preferSortMergeJoin", "false")
        agg = probe.join(build, "k").groupBy().count()
        assert agg.collect()[0][0] == expected  # default cell (AQE on)
        plan = agg._jdf.queryExecution().executedPlan().toString()
        assert "isFinalPlan=true" in plan
        assert "ShuffledHashJoin" in plan

        confs.set("spark.sql.adaptive.enabled", "false")
        confs.set("spark.sql.shuffle.partitions", "5")
        assert joined_count() == expected  # adversarial cell
    finally:
        for k, v in saved.items():
            confs.set(k, v)
