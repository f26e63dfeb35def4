"""Benchmark harness: run every declared query at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS], print ONE
JSON line {"metric", "value", "unit", "queries", "sf"}.

Each query is forced end-to-end with a noop-format write (full
execution, no driver collect cost), timed over 3 runs, median taken.
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import __spark_entry__ as entrymod  # noqa: E402
from spark_ext_spark.session import get_spark  # noqa: E402

RUNS = 3


def force(df) -> None:
    df.write.format("noop").mode("overwrite").save()


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    sf = float(sf_dir.rstrip("/").rsplit("sf", 1)[-1]) if "sf" in sf_dir else -1.0
    spark = get_spark("spark_ext_spark-bench", master=f"local[{cpus}]")
    spark.sparkContext.setLogLevel("ERROR")

    queries = entrymod.queries()
    timings: dict[str, float] = {}
    for name, fn in queries.items():
        samples = []
        for _ in range(RUNS):
            t0 = time.monotonic()
            force(fn(spark, sf_dir))
            samples.append(time.monotonic() - t0)
        # queries cache intermediates; drop them between queries so
        # copies don't accumulate across the whole bench
        spark.catalog.clearCache()
        timings[name] = round(statistics.median(samples), 4)

    total = round(sum(timings.values()), 4)
    print(json.dumps({
        "metric": "sum of per-query median wall-clock (3 runs) over all declared queries",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "sf": sf,
    }))
    spark.stop()


if __name__ == "__main__":
    main()
