"""Gather-family headline queries (flagship shape, SURVEY.md §7 Phase 0).

The flagship runs the reference's central reshape (Gather.scala:65-85)
over the ``events`` table: two-level hash aggregation ending in an
``array<struct<event_type, value:double>>`` per user.

For oracle comparison the gathered values are rounded to 4 decimals and
the arrays sorted on both engines (float sums differ in ULPs across
engines; collection order is unspecified in both).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from spark_ext_spark.operators.gather import Gather
from spark_ext_spark.plans.relational import load


def _gather_events(spark: SparkSession, sf_dir: str, value_agg: str) -> DataFrame:
    ev = load(spark, sf_dir, "events")
    g = Gather(primaryKeyCols=["user_id"], keyCol="event_type",
               valueCol="value", valueAgg=value_agg, outputCol="gathered")
    return g.transform(ev)


def gather_user_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Flagship gather, driver-hashable encoding: the operator still
    produces ``array<struct<event_type, value:double>>`` (Gather API
    unchanged); the query serializes each element to ``key:%.4f`` and
    '|'-joins the sorted list, because the driver's canonicalizer cannot
    hash list/struct cells (r1/r2 err rows). Decimal formatting is
    pinned to 4 places on BOTH engines so float ULP noise cancels.

    A key whose aggregate is NULL (every contributing value null)
    encodes as ``key:null`` EXPLICITLY on both engines: Spark's
    format_string renders Java's "null" string where DuckDB's printf
    null-propagates and the whole element silently vanishes from the
    join — the flat view keeps such groups, so the string encoding
    must too. NULL keys themselves drop out of the string identically
    on both engines (concat/|| null-propagate the element; the flat
    view is the lossless form).

    Non-finite sums serialize to Java's tokens (``NaN``, ``Infinity``,
    ``-Infinity``) on BOTH engines: format_string already emits them,
    while DuckDB's printf writes ``nan``/``inf`` — one NaN value in a
    refresh silently hash-split the engines until the oracle pinned
    the same tokens (NaN-probe, round 10)."""
    out = _gather_events(spark, sf_dir, "sum")
    strs = F.transform(
        "gathered",
        lambda x: F.concat(
            x["event_type"], F.lit(":"),
            F.when(x["value"].isNull(), F.lit("null"))
            .otherwise(F.format_string("%.4f", F.round(x["value"], 4)))))
    return out.select("user_id",
                      F.array_join(F.sort_array(strs), "|").alias("gathered"))


GATHER_USER_EVENTS_SQL = """
SELECT user_id,
       -- outer coalesce: a group whose EVERY element is a NULL key
       -- serializes to '' on Spark (array_join skips null elements)
       -- but NULL here (array_to_string of an all-NULL list)
       coalesce(array_to_string(
         list_sort(list(event_type || ':'
                        || coalesce(CASE
                             WHEN isnan(value) THEN 'NaN'
                             WHEN value = 'infinity'::DOUBLE
                               THEN 'Infinity'
                             WHEN value = '-infinity'::DOUBLE
                               THEN '-Infinity'
                             ELSE printf('%.4f', value) END, 'null'))),
         '|'), '') AS gathered
FROM (
  SELECT user_id, event_type, round(sum(value), 4) AS value
  FROM events GROUP BY user_id, event_type
)
GROUP BY user_id
"""


def gather_user_events_flat(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Flat (exploded) view of the flagship gather — same aggregation,
    scalar columns for the strictest oracle hash."""
    out = _gather_events(spark, sf_dir, "sum")
    return (out
            .select("user_id", F.explode("gathered").alias("kv"))
            .select("user_id",
                    F.col("kv.event_type").alias("event_type"),
                    F.round("kv.value", 4).alias("value")))


GATHER_USER_EVENTS_FLAT_SQL = """
SELECT user_id, event_type, round(sum(value), 4) AS value
FROM events GROUP BY user_id, event_type
"""


def gather_user_event_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gather with valueAgg=count (Gather.scala:72-75 count branch)."""
    out = _gather_events(spark, sf_dir, "count")
    return (out
            .select("user_id", F.explode("gathered").alias("kv"))
            .select("user_id",
                    F.col("kv.event_type").alias("event_type"),
                    F.col("kv.value").alias("value")))


GATHER_USER_EVENT_COUNTS_SQL = """
SELECT user_id, event_type, CAST(count(value) AS DOUBLE) AS value
FROM events GROUP BY user_id, event_type
"""
