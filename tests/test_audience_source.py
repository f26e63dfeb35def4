"""audience_gen custom Python DataSource: schema, determinism,
partition-count invariance, cohort separation signal."""

import pytest
from pyspark.sql import functions as F

from spark_ext_spark.sources.audience_gen import register_audience_source


@pytest.fixture(scope="module", autouse=True)
def _register(spark):
    register_audience_source(spark)


def _read(spark, table, **opts):
    r = spark.read.format("audience_gen").option("table", table)
    for k, v in opts.items():
        r = r.option(k, v)
    return r.load()


def test_schemas_and_counts(spark):
    sites = _read(spark, "sites", cookies=200)
    geo = _read(spark, "geo", cookies=200)
    resp = _read(spark, "response", cookies=200)
    assert sites.columns == ["cookie", "site", "impressions"]
    assert geo.columns == ["cookie", "lat", "lon", "impressions"]
    assert resp.count() == 200
    # every cookie produces 2..9 site rows and 2..3 geo rows
    per = sites.groupBy("cookie").count().agg(
        F.min("count"), F.max("count")).first()
    assert per[0] >= 2 and per[1] <= 9
    assert resp.filter("response = 1.0").count() == 20


def test_deterministic_and_partition_invariant(spark):
    a = sorted(map(tuple, _read(spark, "sites", cookies=100,
                                numPartitions=2).collect()))
    b = sorted(map(tuple, _read(spark, "sites", cookies=100,
                                numPartitions=7).collect()))
    assert a == b
    c = sorted(map(tuple, _read(spark, "sites", cookies=100, seed=43,
                                numPartitions=2).collect()))
    assert a != c


def test_cohorts_separate(spark):
    sites = _read(spark, "sites", cookies=300)
    resp = _read(spark, "response", cookies=300)
    joined = sites.join(resp, "cookie")
    pos_share = (joined
                 .groupBy(F.col("site").startswith("pos").alias("pos_site"),
                          "response")
                 .agg(F.sum("impressions").alias("imp")))
    stats = {(r["pos_site"], r["response"]): r["imp"]
             for r in pos_share.collect()}
    # positive cohort concentrates on pos sites and vice versa
    assert stats[(True, 1.0)] > 2 * stats[(False, 1.0)]
    assert stats[(False, 0.0)] > 2 * stats[(True, 0.0)]


def test_unknown_table_raises_curated_error(spark):
    """schema() is called before reader(): an unknown table must hit
    the curated ValueError, not a bare KeyError from the schema dict."""
    with pytest.raises(Exception, match="unknown table.*expected one of"):
        _read(spark, "geoX").collect()
