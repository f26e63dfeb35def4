"""Distributed prefix sums (operators/prefix.py) and the
GatherEncoder fitPartitions path built on them: both must agree exactly
with the single-partition global-window implementation, including on
tied counts (the deterministic count-desc/key-asc ordering contract).
"""

import random

from pyspark.sql import functions as F
from pyspark.sql.window import Window

from spark_ext_spark.operators.gather_encoder import GatherEncoder
from spark_ext_spark.operators.prefix import partitioned_cumulative_sums


def test_prefix_sums_match_global_window(spark):
    rng = random.Random(7)
    rows = [(i, rng.randint(1, 9)) for i in range(2000)]
    df = spark.createDataFrame(rows, "k bigint, v bigint").repartition(8)
    order = [F.desc("v"), F.asc("k")]
    got = partitioned_cumulative_sums(
        df, order, {"cum": "v", "rnk": F.lit(1)},
        num_partitions=7, inclusive=False)
    w = Window.orderBy(*order).rowsBetween(Window.unboundedPreceding, -1)
    want = df.select(
        "k", "v",
        F.coalesce(F.sum("v").over(w), F.lit(0)).alias("cum"),
        F.coalesce(F.sum(F.lit(1)).over(w), F.lit(0)).alias("rnk"))
    a = {r["k"]: (r["cum"], r["rnk"]) for r in got.collect()}
    b = {r["k"]: (r["cum"], r["rnk"]) for r in want.collect()}
    assert a == b


def test_prefix_sums_inclusive(spark):
    df = spark.createDataFrame([(1, 10), (2, 20), (3, 30)], "k int, v int")
    out = {r["k"]: r["cum"] for r in
           partitioned_cumulative_sums(df, [F.asc("k")], {"cum": "v"},
                                       num_partitions=2).collect()}
    assert out == {1: 10, 2: 30, 3: 60}


def _gathered(spark):
    # heavy ties: many keys share counts, so ordering determinism shows
    rng = random.Random(13)
    rows = []
    for user in range(300):
        ks = rng.sample(range(40), rng.randint(1, 6))
        rows.append((user, [{"key": f"k{k:02d}", "value": float(k)}
                            for k in ks]))
    return spark.createDataFrame(
        rows, "user bigint, sites array<struct<key:string,value:double>>")


def test_encoder_distributed_fit_matches_default(spark):
    df = _gathered(spark)
    for kwargs in ({"transformation": "top", "cover": 70.0},
                   {"transformation": "top", "cover": 100.0},
                   {"transformation": "index", "support": 2.0},
                   {"transformation": "index", "support": 2.0,
                    "excludeKeys": ["k01", "k05"]}):
        base = GatherEncoder(inputCol="sites", outputCol="f", keyCol="key",
                             valueCol="value", **kwargs)
        dist = GatherEncoder(inputCol="sites", outputCol="f", keyCol="key",
                             valueCol="value", fitPartitions=5, **kwargs)
        assert dist.fit(df).keys == base.fit(df).keys, kwargs


def test_encoder_distributed_plan_uses_range_partitioning(spark):
    df = _gathered(spark)
    enc = GatherEncoder(inputCol="sites", outputCol="f", keyCol="key",
                        valueCol="value", cover=80.0, fitPartitions=5)
    plan = enc.selected_keys(df)._jdf.queryExecution().executedPlan().toString()
    assert "rangepartitioning" in plan
