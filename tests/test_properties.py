"""Property-based tests (hypothesis): operator semantics vs plain-
Python models on arbitrary inputs — beyond the reference's fixed
golden fixtures (it had no property testing, SURVEY §5)."""

from __future__ import annotations

import math
from collections import Counter, defaultdict

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from spark_ext_spark.functions import collect_array
from spark_ext_spark.functions.s2 import cell_id_from_lat_lng, parent_id
from spark_ext_spark.operators.gather import Gather

KEYS = st.sampled_from(["k1", "k2", "k3"])
ROWS = st.lists(
    st.tuples(st.integers(0, 4), KEYS,
              st.one_of(st.none(), st.integers(-100, 100))),
    min_size=0, max_size=40)

SETTINGS = settings(max_examples=12, deadline=None,
                    suppress_health_check=list(HealthCheck))


@given(rows=ROWS)
@SETTINGS
def test_collect_array_multiset_model(spark, rows):
    df = spark.createDataFrame(rows, "pk int, k string, v long") \
        if rows else spark.createDataFrame([], "pk int, k string, v long")
    got = {r["pk"]: sorted(r["arr"]) for r in
           df.groupBy("pk").agg(collect_array("v").alias("arr")).collect()}
    model = defaultdict(list)
    for pk, _, v in rows:
        if v is not None:
            model[pk].append(v)
    pks = {pk for pk, _, _ in rows}
    assert set(got) == pks
    for pk in pks:
        assert got[pk] == sorted(model[pk])


@given(rows=ROWS)
@SETTINGS
def test_gather_sum_model(spark, rows):
    df = spark.createDataFrame(rows, "pk int, k string, v long") \
        if rows else spark.createDataFrame([], "pk int, k string, v long")
    g = Gather(primaryKeyCols=["pk"], keyCol="k", valueCol="v",
               valueAgg="sum", outputCol="out", sortKeys=True)
    got = {r["pk"]: [(s["k"], s["v"]) for s in r["out"]]
           for r in g.transform(df).collect()}
    sums: dict[tuple, float | None] = {}
    seen = defaultdict(set)
    for pk, k, v in rows:
        seen[pk].add(k)
        if v is not None:
            cur = sums.get((pk, k))
            sums[(pk, k)] = (0.0 if cur is None else cur) + v
    for pk, keys in seen.items():
        expected = sorted((k, sums.get((pk, k))) for k in keys)
        expected = [(k, float(v) if v is not None else None)
                    for k, v in expected]
        assert got[pk] == expected


@given(lat=st.floats(-89.99, 89.99), lon=st.floats(-179.99, 179.99),
       level=st.integers(0, 29))
@SETTINGS
def test_s2_parent_containment(lat, lon, level):
    leaf = cell_id_from_lat_lng(lat, lon)
    p = parent_id(leaf, level)
    child = parent_id(leaf, level + 1)
    # child's ancestor at `level` is p (containment / nesting)
    assert parent_id(child, level) == p
    # range invariant: leaf lies within [p - lsb + 1, p + lsb - 1]
    lsb = p & (~p + 1) & 0xFFFFFFFFFFFFFFFF
    assert p - lsb < leaf < p + lsb


@given(vals=st.lists(st.floats(-1e6, 1e6, allow_nan=False,
                               allow_infinity=False),
                     min_size=80, max_size=200),
       nbins=st.integers(3, 6))
@SETTINGS
def test_binning_partitions_all_values(spark, vals, nbins):
    from spark_ext_spark.operators.binning import Binning
    lo, hi = min(vals), max(vals)
    if not (hi > lo):
        vals = vals + [lo + 1.0]
        hi = lo + 1.0
    step = (hi - lo) / nbins
    splits = [lo + i * step for i in range(nbins)] + [hi]
    splits = [s for i, s in enumerate(splits)
              if i == 0 or s > splits[i - 1]]
    if len(splits) < 3:
        return
    df = spark.createDataFrame([(v,) for v in vals], "x double")
    model = Binning(splits=splits)
    model._set(inputCol="x", outputCol="b")
    for row in model.transform(df).collect():
        arr = list(row["b"].toArray())
        assert sum(arr) == 1.0  # every in-range value lands in one bin
        idx = arr.index(1.0)
        assert splits[idx] <= row["x"] <= splits[idx + 1]
