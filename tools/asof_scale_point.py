"""One-decade-up as-of join scale point (round 9, VERDICT item 5).

SCALE.md's window/chunked crossover (6-23M hot rows) interpolated from
one measurement family; this adds a ~100M-hot-row point so the
`strategy="auto"` threshold interpolates instead of extrapolating.
Same construction as tools/skew_bench.py's as-of arms (sf0.1 events
amplified, 90% of rows re-keyed to one user), only the two as-of arms
timed — the other skew_bench sections are unchanged since round 6 and
re-running them at 100M rows would add ~20 min for no new signal.

    SKEW_AMPLIFY=1024 python tools/asof_scale_point.py

Prints one JSON line {"rows": N, "hot": H, "sec": {...}}.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from spark_ext_spark.session import get_spark  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
AMPLIFY = int(os.environ.get("SKEW_AMPLIFY", "1024"))
RUNS = int(os.environ.get("SKEW_RUNS", "2"))


def force(df) -> None:
    df.write.format("noop").mode("overwrite").save()


def main() -> None:
    spark = get_spark("asof-scale-point")
    spark.sparkContext.setLogLevel("ERROR")
    from spark_ext_spark.operators.asof import asof_join
    from spark_ext_spark.plans.relational import load

    ev = load(spark, SF_DIR, "events").select(
        "event_id", "user_id", "ts", "value")
    amp = ev.withColumn("__rep", F.explode(
        F.sequence(F.lit(1), F.lit(AMPLIFY)))).withColumn(
        "event_id", F.xxhash64("event_id", "__rep")).drop("__rep")
    coin = F.pmod(F.xxhash64("event_id", F.lit(1)), F.lit(10))
    skewed = amp.withColumn(
        "user_id", F.when(coin < 9, F.lit(0)).otherwise(F.col("user_id"))
    ).persist()
    n = skewed.count()
    hot = skewed.filter(F.col("user_id") == 0).count()

    right = skewed.select("user_id", F.col("ts").alias("rts"),
                          F.col("value").alias("price"))
    left = skewed.select("user_id", "ts", "event_id")
    kw = dict(on="user_id", left_ts="ts", right_ts="rts",
              value_cols=["price"])
    results: dict[str, float] = {}

    best = float("inf")
    for _ in range(RUNS):
        t0 = time.perf_counter()
        force(asof_join(left, right, **kw))
        best = min(best, time.perf_counter() - t0)
    results["asof_windowed_skewed"] = round(best, 3)

    held: list = []
    best = float("inf")
    for _ in range(RUNS):
        t0 = time.perf_counter()
        force(asof_join(left, right, strategy="chunked",
                        persisted_out=held, **kw))
        best = min(best, time.perf_counter() - t0)
        for fr in held:  # teardown outside the timed region
            fr.unpersist()
        held.clear()
    results["asof_chunked_skewed"] = round(best, 3)

    print(json.dumps({"rows": n, "hot": hot, "amplify": AMPLIFY,
                      "sec": results}))
    spark.stop()


if __name__ == "__main__":
    main()
