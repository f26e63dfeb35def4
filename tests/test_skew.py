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
