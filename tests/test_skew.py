"""Salted aggregation: identical results to plain groupBy on skewed
data, with the hot key spread over multiple phase-1 groups."""

from __future__ import annotations

from pyspark.sql import functions as F

from spark_ext_spark.plans.skew import salted_aggregate


def test_salted_aggregate_matches_plain(spark):
    # 1 hot key with 5000 rows + 50 cold keys
    rows = [("hot", float(i % 7)) for i in range(5000)] + \
           [(f"cold{i}", float(i)) for i in range(50)]
    df = spark.createDataFrame(rows, "k string, v double").repartition(8)

    got = {r["k"]: (r["total"], r["n"]) for r in salted_aggregate(
        df, ["k"],
        {"total": (F.sum("v"), F.sum("total")),
         "n": (F.count(F.lit(1)), F.sum("n"))},
        n_salts=8).collect()}
    want = {r["k"]: (r["total"], r["n"]) for r in
            df.groupBy("k").agg(F.sum("v").alias("total"),
                                F.count(F.lit(1)).alias("n")).collect()}
    assert set(got) == set(want)
    for k in want:
        assert got[k][1] == want[k][1]
        assert abs(got[k][0] - want[k][0]) < 1e-6


def test_aqe_splits_skewed_join_partition(spark):
    """AQE skew-join handling, forced observable at test scale: one
    hot key dominates the left side; with tiny skew thresholds the
    adaptive SortMergeJoin must mark and split the skewed partition
    (skew=true in the final plan) while returning exact results."""
    from pyspark.sql import functions as F
    conf = spark.conf
    saved = {k: conf.get(k) for k in (
        "spark.sql.autoBroadcastJoinThreshold",
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
        "spark.sql.adaptive.advisoryPartitionSizeInBytes",
        "spark.sql.adaptive.skewJoin.skewedPartitionFactor")}
    try:
        conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        conf.set("spark.sql.adaptive.skewJoin."
                 "skewedPartitionThresholdInBytes", "64KB")
        conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "64KB")
        conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "2")
        left = spark.range(200_000).select(
            F.when(F.col("id") % 10 == 0, F.lit(7))
            .otherwise((F.col("id") % 1000) + 1000).alias("k"),
            F.col("id").alias("payload"))
        right = spark.range(2001).select(F.col("id").alias("k"),
                                         (F.col("id") * 2).alias("w"))
        j = left.join(right, "k").groupBy().agg(
            F.count(F.lit(1)).alias("n"), F.sum("w").alias("sw"))
        # collect() executes THIS DataFrame's QueryExecution (first()
        # would run a separate limit-1 plan and leave this one unrun)
        row = j.collect()[0]
        # exact expected counts: 20k rows of k=7 + 180k matched longtail
        assert row["n"] == 200_000
        plan = j._jdf.queryExecution().executedPlan().toString()
        assert "skew=true" in plan
    finally:
        for k, v in saved.items():
            conf.set(k, v)
