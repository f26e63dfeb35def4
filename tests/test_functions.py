"""Golden-value tests for the SQL surface, ported from the reference's
ExtAggregatesSpec (sparkext-sql/src/test/.../ExtAggregatesSpec.scala:13-62):
7-row impression log, 3 cookies, one null value."""

from __future__ import annotations

from pyspark.sql import functions as F
from pyspark.sql.types import (LongType, StringType, StructField, StructType)

from spark_ext_spark.functions import (collect_array, collect_array_distinct,
                                       collect_array_sorted)

SCHEMA = StructType([
    StructField("cookie_id", StringType()),
    StructField("site", StringType()),
    StructField("impressions", LongType(), nullable=True),
])

# ExtAggregatesSpec.scala:19-31 fixture
ROWS = [
    ("cookie_1", "site_1", 10),
    ("cookie_2", "site_1", 5),
    ("cookie_3", "site_1", 1),
    ("cookie_1", "site_2", 2),
    ("cookie_2", "site_2", 1),
    ("cookie_1", "site_3", None),
    ("cookie_1", "site_1", 7),
]


def _df(spark):
    return spark.createDataFrame(ROWS, SCHEMA)


def test_collect_array_skips_nulls_keeps_duplicates(spark):
    # ExtAggregatesSpec.scala:23-38: cookie_1 has 4 rows, one null
    # impressions -> collected sites 4, collected impressions 3.
    out = (_df(spark).groupBy("cookie_id")
           .agg(collect_array("site").alias("sites"),
                collect_array("impressions").alias("imps"))
           ).collect()
    by_cookie = {r["cookie_id"]: r for r in out}
    assert sorted(by_cookie["cookie_1"]["sites"]) == \
        ["site_1", "site_1", "site_2", "site_3"]
    assert sorted(by_cookie["cookie_1"]["imps"]) == [2, 7, 10]
    assert sorted(by_cookie["cookie_3"]["imps"]) == [1]


def test_collect_array_empty_group_is_empty_array_not_null(spark):
    # aggregates.scala:38-39 contract: all-null group -> empty array.
    df = spark.createDataFrame(
        [("c1", None), ("c2", 3)],
        StructType([StructField("k", StringType()),
                    StructField("v", LongType(), True)]))
    out = {r["k"]: r["arr"] for r in
           df.groupBy("k").agg(collect_array("v").alias("arr")).collect()}
    assert out["c1"] == []
    assert out["c2"] == [3]


def test_collect_array_global_agg(spark):
    # ExtAggregatesSpec.scala:34-38: global aggregate without grouping.
    row = _df(spark).agg(collect_array("site").alias("sites")).first()
    assert len(row["sites"]) == 7


def test_collect_array_distinct(spark):
    # ExtAggregatesSpec.scala:41-47: distinct sites per cookie.
    row = (_df(spark).filter(F.col("cookie_id") == "cookie_1")
           .agg(collect_array_distinct("site").alias("sites"))).first()
    assert sorted(row["sites"]) == ["site_1", "site_2", "site_3"]


def test_collect_array_sorted_is_deterministic(spark):
    row = (_df(spark).filter(F.col("cookie_id") == "cookie_1")
           .agg(collect_array_sorted("site").alias("sites"))).first()
    assert row["sites"] == ["site_1", "site_1", "site_2", "site_3"]


def test_median_abs_deviation_golden(spark):
    from spark_ext_spark.functions import median_abs_deviation
    df = spark.createDataFrame(
        [("a", 1.0), ("a", 2.0), ("a", 4.0), ("a", 9.0),
         ("b", 5.0)],
        "g string, v double")
    mad = median_abs_deviation()
    got = {r["g"]: r["m"] for r in
           df.groupBy("g").agg(mad("v").alias("m")).collect()}
    # median([1,2,4,9]) = 3 -> |x-3| = [2,1,1,6] -> median = 1.5
    assert got["a"] == 1.5
    assert got["b"] == 0.0  # single element deviates from itself by 0


def test_median_abs_deviation_skips_nulls(spark):
    from spark_ext_spark.functions import median_abs_deviation
    df = spark.createDataFrame(
        [("a", 1.0), ("a", 2.0), ("a", None), ("a", 9.0)],
        "g string, v double")
    mad = median_abs_deviation()
    got = df.groupBy("g").agg(mad("v").alias("m")).first()["m"]
    # nulls skipped (SQL aggregate contract): median([1,2,9])=2,
    # |x-2| = [1,0,7] -> median = 1.0
    assert got == 1.0


def test_attach_scalar_agg(spark):
    from spark_ext_spark.functions import attach_scalar_agg
    df = spark.createDataFrame([(1, 10.0), (2, 30.0), (3, 20.0)],
                               "id long, v double")
    out = attach_scalar_agg(df, {"total": F.sum("v"), "mx": F.max("v")})
    rows = out.collect()
    assert len(rows) == 3
    assert all(r["total"] == 60.0 and r["mx"] == 30.0 for r in rows)
    # separate source DataFrame
    src = spark.createDataFrame([(100.0,)], "v double")
    out2 = attach_scalar_agg(df.select("id"), {"s": F.sum("v")}, source=src)
    assert all(r["s"] == 100.0 for r in out2.collect())
    # the scalar rides as a broadcast single-row join, not a driver job
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastExchange" in plan
