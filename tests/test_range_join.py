"""Range-join tests: bucketed implementation vs a naive inequality
join on the same data (must be identical), boundary semantics."""

from __future__ import annotations

import datetime

import pytest
from pyspark.sql import functions as F

from spark_ext_spark.operators.range_join import range_join
from tests.conftest import fuzz_seeds


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
    with pytest.raises(Exception, match="max_buckets_per_interval"):
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


def test_range_join_inverted_interval_matches_nothing(spark):
    """An inverted interval (end < start — e.g. a corrupt year-0001
    right_end) is an EMPTY interval: its predicate start <= ts < end is
    unsatisfiable, so it must match nothing like the naive join — and
    it must do so WITHOUT exploding. sequence(lo, hi) with hi < lo
    defaults to step -1, so before the explicit n<0 branch one such row
    fanned out into millions of descending buckets the negative-count
    guard never saw."""
    left = spark.createDataFrame(
        [(1, "2024-01-01 00:00:00")],
        "event_id long, ets string").withColumn(
        "ets", F.to_timestamp("ets"))
    inverted = spark.createDataFrame(
        # year-0001 end: ~739k days before start at the default
        # day-wide buckets — a descending sequence() would OOM-scale
        [(10, "2024-01-01 00:00:00", "0001-01-02 00:00:00"),
         # a sane interval alongside it must still match
         (11, "2023-12-31 00:00:00", "2024-01-02 00:00:00")],
        "win_id long, ws string, we string") \
        .withColumn("ws", F.to_timestamp("ws")) \
        .withColumn("we", F.to_timestamp("we"))
    got = range_join(left, inverted, "ets", "ws", "we",
                     max_buckets_per_interval=10).collect()
    assert {r["win_id"] for r in got} == {11}
    naive = left.join(
        inverted, (inverted.ws <= left.ets) & (left.ets < inverted.we))
    assert {r["win_id"] for r in naive.collect()} == {11}


@pytest.mark.parametrize("seed", fuzz_seeds(47, 59),
                         ids=lambda s: f"seed{s}")
def test_randomized_hostile_intervals_match_naive(spark, seed):
    """Seeded differential sweep of the bucketed join against the naive
    inequality join over a hostile interval mix — inverted spans (down
    to year 0001), zero-length, NULL endpoints, end-exactly-on-bucket
    boundaries, sub-bucket and multi-bucket widths — plus NULL and
    boundary-exact left timestamps. The guard branches must never
    change WHICH pairs match, only how corrupt fan-out fails."""
    import random
    rng = random.Random(seed)
    base = datetime.datetime(2024, 3, 1)
    hour = 3600

    def ts(h):  # hours offset, sub-hour jitter included
        return base + datetime.timedelta(
            hours=h, seconds=rng.choice([0, 1, 1799, 3599]))

    left = spark.createDataFrame(
        [(i, None if rng.random() < 0.05 else ts(rng.uniform(0, 96)))
         for i in range(150)],
        "event_id long, ets timestamp")
    rights = []
    for j in range(60):
        start_h = rng.uniform(0, 96)
        kind = rng.random()
        if kind < 0.15:      # inverted, mildly to absurdly
            end_h = start_h - rng.choice([1, 24, 2_000_000])
        elif kind < 0.25:    # zero-length (empty: ts < end == start)
            end_h = start_h
        else:                # legit spans: minutes to days
            end_h = start_h + rng.uniform(0.01, 72)
        ws = ts(start_h)
        we = (base + datetime.timedelta(hours=end_h)
              if end_h > -100_000 else datetime.datetime(1, 1, 2))
        if rng.random() < 0.08:
            ws = None
        if rng.random() < 0.08:
            we = None
        rights.append((j, ws, we))
    right = spark.createDataFrame(
        rights, "win_id long, ws timestamp, we timestamp")

    got = {(r["event_id"], r["win_id"]) for r in
           range_join(left, right, "ets", "ws", "we",
                      bucket_width_seconds=hour,
                      # legit spans cover <= 73h ≈ 74 buckets
                      max_buckets_per_interval=100).collect()}
    naive = {(r["event_id"], r["win_id"]) for r in
             left.join(right, (right.ws <= left.ets)
                       & (left.ets < right.we)).collect()}
    assert got == naive
    assert len(naive) > 0
