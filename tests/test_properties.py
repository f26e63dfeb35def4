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


def test_chunks_stitch_back_to_token_stream(spark):
    """Dropping each non-first chunk's overlap prefix and concatenating
    must reproduce the document's full token stream exactly."""
    import random as _r
    from spark_ext_spark.llm.text import chunk_documents, tokens
    from pyspark.sql import functions as F

    rng = _r.Random(99)
    rows = [(i, " ".join(f"t{rng.randrange(50)}"
                         for _ in range(rng.randrange(0, 130))))
            for i in range(30)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    chunk_tokens, overlap = 20, 5
    out = chunk_documents(df, "doc_id", "text",
                          chunk_tokens=chunk_tokens, overlap=overlap)
    by_doc = {}
    for r in out.collect():
        by_doc.setdefault(r["doc_id"], []).append(
            (r["chunk_idx"], r["chunk_text"].split()))
    want = {r["doc_id"]: r["tk"] for r in
            df.select("doc_id", tokens("text").alias("tk")).collect()}
    for doc_id, expect in want.items():
        chunks = [c for _, c in sorted(by_doc.get(doc_id, []))]
        stitched = []
        for i, c in enumerate(chunks):
            stitched.extend(c if i == 0 else c[overlap:])
        assert stitched == expect, doc_id


def test_connected_components_vs_union_find(spark):
    """Pointer-jumping CC agrees with a driver-side union-find on
    random graphs (several densities/seeds)."""
    import random as _r
    from spark_ext_spark.llm.clusters import connected_components

    for seed, n_nodes, n_edges in ((1, 30, 15), (2, 40, 60), (3, 25, 5)):
        rng = _r.Random(seed)
        edges = [(rng.randrange(n_nodes), rng.randrange(n_nodes))
                 for _ in range(n_edges)]
        edges = [(a, b) for a, b in edges if a != b]
        parent = list(range(n_nodes))

        def find(x):
            while parent[x] != x:
                parent[x] = parent[parent[x]]
                x = parent[x]
            return x

        for a, b in edges:
            ra, rb = find(a), find(b)
            if ra != rb:
                parent[max(ra, rb)] = min(ra, rb)
        want = {}
        for a, b in edges:
            for v in (a, b):
                want[v] = find(v)
        # canonical label = min node of component
        canon = {}
        for v, r in want.items():
            canon.setdefault(r, min(v2 for v2, r2 in want.items()
                                    if r2 == r))
        want = {v: canon[r] for v, r in want.items()}

        df = spark.createDataFrame(edges, "a bigint, b bigint")
        got = {r["node"]: r["comp"]
               for r in connected_components(df, "a", "b").collect()}
        assert got == want, (seed, got, want)
