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
