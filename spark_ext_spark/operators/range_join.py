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
               bucket_width_seconds: int = 86400,
               max_buckets_per_interval: int = 100_000) -> DataFrame:
    """Inner join of left rows to the right intervals containing them;
    all columns from both sides are kept.

    Fan-out guard (round 9, same discipline as the gap-fill grid): one
    corrupt interval — a year-9999 ``right_end`` in a 100 TB refresh —
    would explode into millions of bucket rows on a single task. The
    per-row bucket count is checked before the explode (a codegen
    branch, free next to the explode itself) and raises a NAMED error
    at ``max_buckets_per_interval`` or more buckets (the inclusive
    sequence emits n+1 elements, so the cap bounds the fan-out at
    exactly ``max_buckets_per_interval``); legitimate wide intervals
    can raise the cap or widen ``bucket_width_seconds`` (which is also
    the fan-out-correct response). Intervals with a NULL endpoint or an
    INVERTED span (``right_end < right_start`` — an empty interval)
    match nothing, exactly as the naive inequality join would: the
    predicate ``start <= ts < end`` is unsatisfiable there. The
    inverted case must be handled explicitly — ``sequence(lo, hi)``
    with hi < lo defaults to step -1 and would explode a corrupt
    year-0001 endpoint into millions of DESCENDING buckets that the
    ``n_buckets < cap`` comparison alone (negative n) never catches."""
    overlap = set(left.columns) & set(right.columns)
    if overlap:
        raise ValueError(
            f"left/right column names must be disjoint, overlap: {overlap}")

    w = F.lit(bucket_width_seconds)
    l = left.withColumn(
        "__lb", (F.unix_timestamp(F.col(left_ts)) / w).cast("long"))
    lo = (F.unix_timestamp(F.col(right_start)) / w).cast("long")
    hi = (F.unix_timestamp(F.col(right_end)) / w).cast("long")
    n_buckets = hi - lo
    # Branches (NULL conditions fall through to the next):
    #   n >= cap        -> named fan-out error
    #   0 <= n < cap    -> the covered buckets
    #   n < 0 or NULL   -> NULL array, which explode() drops — empty
    #                      (inverted) and NULL-endpoint intervals match
    #                      nothing, same as the naive predicate join
    r = right.withColumn(
        "__rb",
        F.explode(
            F.when(n_buckets >= F.lit(max_buckets_per_interval),
                   F.raise_error(F.lit(
                       "range_join interval spans "
                       "max_buckets_per_interval "
                       f"({max_buckets_per_interval}) or more buckets "
                       f"of {bucket_width_seconds}s — a corrupt "
                       "interval endpoint would explode the bucket "
                       "fan-out; repair the interval, widen "
                       "bucket_width_seconds, or raise "
                       "max_buckets_per_interval"))
                   .cast("array<long>"))
             .when(n_buckets >= 0, F.sequence(lo, hi))
             .otherwise(F.lit(None).cast("array<long>"))))

    cond = l["__lb"] == r["__rb"]
    if on is not None:
        cond = cond & (l[on] == r[right_on or on])
    predicate = ((F.col(right_start) <= F.col(left_ts))
                 & (F.col(left_ts) < F.col(right_end)))
    return (l.join(r, cond, "inner")
            .filter(predicate)
            .drop("__lb", "__rb"))
