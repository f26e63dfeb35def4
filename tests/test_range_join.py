"""Range-join tests: bucketed implementation vs a naive inequality
join on the same data (must be identical), boundary semantics."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from spark_ext_spark.operators.range_join import range_join


@pytest.fixture(scope="module")
def frames(spark):
    left = spark.createDataFrame(
        [(i, f"2024-01-{1 + (i % 20):02d} {i % 24:02d}:30:00") for i in range(200)],
        "event_id long, ets string").withColumn("ets", F.to_timestamp("ets"))
    right = spark.createDataFrame(
        [(j, f"2024-01-{1 + j:02d} 00:00:00", f"2024-01-{3 + j:02d} 12:00:00")
         for j in range(0, 15)],
        "win_id long, ws string, we string") \
        .withColumn("ws", F.to_timestamp("ws")) \
        .withColumn("we", F.to_timestamp("we"))
    return left.cache(), right.cache()


def test_range_join_matches_naive(spark, frames):
    left, right = frames
    got = {(r["event_id"], r["win_id"]) for r in
           range_join(left, right, "ets", "ws", "we",
                      bucket_width_seconds=86400).collect()}
    naive = {(r["event_id"], r["win_id"]) for r in
             left.join(right, (right.ws <= left.ets) & (left.ets < right.we))
             .collect()}
    assert got == naive and len(naive) > 0


def test_range_join_boundaries(spark):
    left = spark.createDataFrame(
        [(1, "2024-01-01 00:00:00"),   # == start -> included
         (2, "2024-01-02 00:00:00"),   # == end -> excluded
         (3, "2024-01-01 12:00:00")],
        "event_id long, ets string").withColumn("ets", F.to_timestamp("ets"))
    right = spark.createDataFrame(
        [(10, "2024-01-01 00:00:00", "2024-01-02 00:00:00")],
        "win_id long, ws string, we string") \
        .withColumn("ws", F.to_timestamp("ws")) \
        .withColumn("we", F.to_timestamp("we"))
    got = {r["event_id"] for r in
           range_join(left, right, "ets", "ws", "we").collect()}
    assert got == {1, 3}


def test_range_join_rejects_overlapping_columns(spark, frames):
    left, right = frames
    with pytest.raises(ValueError, match="disjoint"):
        range_join(left, right.withColumnRenamed("win_id", "event_id"),
                   "ets", "ws", "we")


def test_range_join_corrupt_interval_raises_named_error(spark):
    """A year-9999 interval endpoint must fail by name before it
    explodes into millions of bucket rows on one task (the gap-fill
    grid discipline); a NULL endpoint matches nothing instead of
    erroring."""
    left = spark.createDataFrame(
        [(1, "2024-01-01 00:00:00")],
        "event_id long, ets string").withColumn(
        "ets", F.to_timestamp("ets"))
    right = spark.createDataFrame(
        [(10, "2024-01-01 00:00:00", "9999-01-02 00:00:00")],
        "win_id long, ws string, we string") \
        .withColumn("ws", F.to_timestamp("ws")) \
        .withColumn("we", F.to_timestamp("we"))
    with pytest.raises(Exception, match="spans more than"):
        range_join(left, right, "ets", "ws", "we").collect()
    # raising the cap past the span must make the same join legal
    assert range_join(left, right, "ets", "ws", "we",
                      max_buckets_per_interval=5_000_000).count() == 1

    null_end = spark.createDataFrame(
        [(10, "2024-01-01 00:00:00", None)],
        "win_id long, ws string, we string") \
        .withColumn("ws", F.to_timestamp("ws")) \
        .withColumn("we", F.to_timestamp("we"))
    assert range_join(left, null_end, "ets", "ws", "we").count() == 0
