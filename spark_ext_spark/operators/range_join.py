"""Range join — pair left rows with right intervals containing them
(``right_start <= left_ts < right_end``), optionally key-scoped.

Spark has no range-join optimization in OSS: a raw inequality join
plans as BroadcastNestedLoopJoin (fine when one side broadcasts,
quadratic disaster big-big). The scalable plan here is BUCKETING:
quantize time into fixed-width buckets, explode each right interval
into the buckets it covers, equi-join on (key, bucket), then apply the
exact predicate. Join fan-out is |right| × avg(interval/bucket_width)
— tune ``bucket_width_seconds`` to the typical interval length.

Column-name contract: left and right must not share column names
(alias before joining) — keeps the output schema unambiguous.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def range_join(left: DataFrame, right: DataFrame,
               left_ts: str, right_start: str, right_end: str,
               on: str | None = None, right_on: str | None = None,
               bucket_width_seconds: int = 86400) -> DataFrame:
    """Inner join of left rows to the right intervals containing them;
    all columns from both sides are kept."""
    overlap = set(left.columns) & set(right.columns)
    if overlap:
        raise ValueError(
            f"left/right column names must be disjoint, overlap: {overlap}")

    w = F.lit(bucket_width_seconds)
    l = left.withColumn(
        "__lb", (F.unix_timestamp(F.col(left_ts)) / w).cast("long"))
    r = right.withColumn(
        "__rb",
        F.explode(F.sequence(
            (F.unix_timestamp(F.col(right_start)) / w).cast("long"),
            (F.unix_timestamp(F.col(right_end)) / w).cast("long"))))

    cond = l["__lb"] == r["__rb"]
    if on is not None:
        cond = cond & (l[on] == r[right_on or on])
    predicate = ((F.col(right_start) <= F.col(left_ts))
                 & (F.col(left_ts) < F.col(right_end)))
    return (l.join(r, cond, "inner")
            .filter(predicate)
            .drop("__lb", "__rb"))
