"""Physical-plan regression tests: lock in the scale properties that
SCALE.md claims (predicate pushdown, column pruning, broadcast joins,
TakeOrderedAndProject top-k). A refactor that silently loses one of
these would still be *correct* — these tests make it *fail*."""

from __future__ import annotations

import contextlib
import io

import pytest

from spark_ext_spark.plans import gather_queries as gq
from spark_ext_spark.plans import relational as rel


def plan_of(df) -> str:
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def test_pricing_summary_pushdown_and_pruning(spark, sf_small):
    p = plan_of(rel.pricing_summary(spark, sf_small))
    assert "PushedFilters: [IsNotNull(l_shipdate), LessThanOrEqual(l_shipdate" in p
    read = next(l for l in p.splitlines() if "ReadSchema" in l)
    # only the 5 needed columns reach the scan, not all 11
    assert "l_orderkey" not in read and "l_partkey" not in read
    assert "l_quantity" in read and "l_returnflag" in read


def test_dimension_joins_broadcast(spark, sf_small):
    p = plan_of(rel.revenue_by_nation(spark, sf_small))
    assert "BroadcastHashJoin" in p
    assert "SortMergeJoin" not in p


def test_topk_avoids_global_sort(spark, sf_small):
    p = plan_of(rel.top_users_by_value(spark, sf_small))
    assert "TakeOrderedAndProject" in p
    assert "GlobalSort" not in p


def test_gather_prunes_scan(spark, sf_small):
    p = plan_of(gq.gather_user_events(spark, sf_small))
    read = next(l for l in p.splitlines() if "ReadSchema" in l)
    assert "props" not in read and "event_id" not in read
    # two-level aggregation: partial + final pairs at both levels
    assert p.count("HashAggregate") >= 4


def test_indexer_transform_is_broadcast_join(spark, sf_small):
    from spark_ext_spark.plans.feature_queries import string_indexer
    p = plan_of(string_indexer(spark, sf_small))
    assert "BroadcastHashJoin" in p


def test_window_partitioned_by_user(spark, sf_small):
    p = plan_of(rel.cumulative_user_value(spark, sf_small))
    # the window's required distribution is hash on user_id — never a
    # single-partition global sort
    assert "hashpartitioning(user_id" in p.replace(" ", "").lower() or \
        "hashpartitioning" in p
