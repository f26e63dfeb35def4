"""Bucketed co-located joins — the SCALE.md claim, proven on a plan.

Writing both join sides bucketed+sorted on the join key lets Spark run
a SortMergeJoin with NO Exchange on either side: at 100 TB this is the
difference between re-shuffling the fact table per join and reading it
pre-placed. The test writes bucketed tables into a temp warehouse and
asserts the exchange-free plan, plus result parity with the plain join.
"""

import pytest
from pyspark.sql import functions as F


@pytest.fixture(scope="module")
def bucketed_tables(spark, sf_small):
    orders = spark.read.parquet(f"{sf_small}/orders.parquet")
    customer = spark.read.parquet(f"{sf_small}/customer.parquet")
    (orders.write.mode("overwrite")
     .bucketBy(8, "o_custkey").sortBy("o_custkey")
     .saveAsTable("orders_bkt"))
    (customer.write.mode("overwrite")
     .bucketBy(8, "c_custkey").sortBy("c_custkey")
     .saveAsTable("customer_bkt"))
    yield spark.table("orders_bkt"), spark.table("customer_bkt")
    spark.sql("DROP TABLE IF EXISTS orders_bkt")
    spark.sql("DROP TABLE IF EXISTS customer_bkt")


def test_bucketed_join_has_no_exchange(spark, bucketed_tables):
    orders_bkt, customer_bkt = bucketed_tables
    # disable auto-broadcast so the shuffle-elision is what's tested
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        j = (orders_bkt.join(customer_bkt,
                             F.col("o_custkey") == F.col("c_custkey"))
             .groupBy("c_mktsegment")
             .agg(F.count(F.lit(1)).alias("n")))
        plan = j._jdf.queryExecution().executedPlan().toString()
        before_agg = plan.split("HashAggregate")[-1]
        assert "SortMergeJoin" in plan
        # no shuffle below the join: both scans are bucket-placed
        assert "Exchange" not in before_agg
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", str(64 << 20))


def test_bucketed_join_matches_plain_join(spark, bucketed_tables, sf_small):
    orders_bkt, customer_bkt = bucketed_tables
    orders = spark.read.parquet(f"{sf_small}/orders.parquet")
    customer = spark.read.parquet(f"{sf_small}/customer.parquet")

    def summarize(o, c):
        return {r["c_mktsegment"]: r["n"] for r in
                (o.join(c, F.col("o_custkey") == F.col("c_custkey"))
                 .groupBy("c_mktsegment")
                 .agg(F.count(F.lit(1)).alias("n"))).collect()}

    assert summarize(orders_bkt, customer_bkt) == summarize(orders, customer)
