"""Skew-handling utilities: two-phase salted aggregation.

AQE's skew-join splitting handles joins; skewed AGGREGATION keys (one
user with 10⁹ events) still funnel into one reducer. The classic fix is
salting: phase 1 aggregates on (key, salt) spreading the hot key over
``n_salts`` reducers, phase 2 merges the partials per key. Works for
any algebraic aggregate (sum/count/min/max); pass the merge expression
for each partial.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def salted_aggregate(df: DataFrame, keys: list[str],
                     aggs: dict[str, tuple[Column, Column]],
                     n_salts: int = 16) -> DataFrame:
    """Two-phase aggregation with salting.

    ``aggs`` maps output name → (phase1 aggregate over raw rows,
    phase2 aggregate over the phase-1 partial column of that name),
    e.g. ``{"total": (F.sum("value"), F.sum("total")),
    "n": (F.count(F.lit(1)), F.sum("n"))}``.

    Semantically identical to ``df.groupBy(keys).agg(...)``; physically
    the first shuffle spreads each key over ``n_salts`` partitions, so
    a hot key costs n_salts reducers instead of one.
    """
    salt = F.pmod(F.spark_partition_id() + F.monotonically_increasing_id(),
                  F.lit(n_salts)).alias("__salt")
    phase1 = (df
              .withColumn("__salt", salt)
              .groupBy(*keys, "__salt")
              .agg(*[expr.alias(name) for name, (expr, _) in aggs.items()]))
    return (phase1
            .groupBy(*keys)
            .agg(*[merge.alias(name) for name, (_, merge) in aggs.items()]))
