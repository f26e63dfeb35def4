"""Similarity-search tests: exact brute-force top-k vs numpy oracle,
LSH recall against the exact result."""

from __future__ import annotations

import numpy as np
import pytest

from spark_ext_spark.llm.similarity import (cosine_topk,
                                            embedding_near_dups,
                                            lsh_buckets, lsh_topk)

N, DIM = 60, 8


@pytest.fixture(scope="module")
def vecs_np():
    rng = np.random.default_rng(7)
    # 3 clusters so top-k is meaningful
    centers = rng.standard_normal((3, DIM)) * 3
    v = np.vstack([centers[i % 3] + rng.standard_normal(DIM) * 0.5
                   for i in range(N)])
    return v


@pytest.fixture(scope="module")
def vecs(spark, vecs_np):
    rows = [(i, vecs_np[i].tolist()) for i in range(N)]
    return spark.createDataFrame(
        rows, "vec_id long, embedding array<double>").cache()


def _numpy_topk(v, k):
    sims = (v @ v.T) / (np.linalg.norm(v, axis=1)[:, None]
                        * np.linalg.norm(v, axis=1)[None, :])
    out = {}
    for i in range(len(v)):
        order = sorted((j for j in range(len(v)) if j != i),
                       key=lambda j: (-sims[i, j], j))
        out[i] = [(j, sims[i, j]) for j in order[:k]]
    return out


def test_cosine_topk_matches_numpy(vecs, vecs_np):
    got = {}
    for r in cosine_topk(vecs, vecs, k=5).collect():
        got.setdefault(r["query_id"], []).append(
            (r["rank"], r["neighbor_id"], r["sim"]))
    expected = _numpy_topk(vecs_np, 5)
    for q in range(N):
        mine = sorted(got[q])
        for (rank, nid, sim), (enid, esim) in zip(mine, expected[q]):
            assert nid == enid
            assert sim == pytest.approx(esim, abs=1e-9)


def test_lsh_buckets_deterministic(vecs):
    b1 = {r["vec_id"]: r["bucket"] for r in lsh_buckets(vecs).collect()}
    b2 = {r["vec_id"]: r["bucket"] for r in lsh_buckets(vecs).collect()}
    assert b1 == b2
    assert all(0 <= v < 256 for v in b1.values())  # 8 planes


def test_embedding_near_dups_exact_vs_numpy(vecs, vecs_np):
    got = {(r["id_a"], r["id_b"]) for r in
           embedding_near_dups(vecs, threshold=0.9, method="exact").collect()}
    v = vecs_np / np.linalg.norm(vecs_np, axis=1, keepdims=True)
    sims = np.round(v @ v.T, 4)
    want = {(i, j) for i in range(N) for j in range(i + 1, N)
            if sims[i, j] >= 0.9}
    assert got == want and len(want) > 0


def test_embedding_near_dups_lsh_recall(vecs, vecs_np):
    exact = {(r["id_a"], r["id_b"]) for r in
             embedding_near_dups(vecs, threshold=0.9, method="exact").collect()}
    lsh = {(r["id_a"], r["id_b"]) for r in
           embedding_near_dups(vecs, threshold=0.9, method="lsh",
                               n_planes=6).collect()}
    assert lsh <= exact                      # no false positives
    assert len(lsh & exact) / len(exact) >= 0.5


def test_lsh_topk_recall_against_exact(vecs, vecs_np):
    exact = _numpy_topk(vecs_np, 3)
    approx = {}
    for r in lsh_topk(vecs, k=3, n_planes=6).collect():
        approx.setdefault(r["query_id"], set()).add(r["neighbor_id"])
    hits = total = 0
    for q in range(N):
        want = {j for j, _ in exact[q]}
        got = approx.get(q, set())
        hits += len(want & got)
        total += len(want)
    recall = hits / total
    assert recall >= 0.6, f"LSH recall too low: {recall:.2f}"


def test_ivf_topk_recall_against_exact(vecs, vecs_np):
    from spark_ext_spark.llm.similarity import ivf_topk
    exact = _numpy_topk(vecs_np, 3)
    approx = {}
    for r in ivf_topk(vecs, k=3, n_centroids=8, n_probes=3).collect():
        approx.setdefault(r["query_id"], set()).add(r["neighbor_id"])
    hits = total = 0
    for q in range(N):
        want = {j for j, _ in exact[q]}
        got = approx.get(q, set())
        hits += len(want & got)
        total += len(want)
    recall = hits / total
    assert recall >= 0.7, f"IVF recall too low: {recall:.2f}"
    # trained cells + 3 probes should beat 1-probe blind hyperplanes
    # at a comparable bucket count (8 cells vs 2^6 buckets): sanity
    # only, not asserted against lsh directly (different budgets).


def test_ivf_probe_count_trades_recall(vecs, vecs_np):
    from spark_ext_spark.llm.similarity import ivf_topk
    exact = _numpy_topk(vecs_np, 3)

    def recall(n_probes):
        approx = {}
        for r in ivf_topk(vecs, k=3, n_centroids=8,
                          n_probes=n_probes).collect():
            approx.setdefault(r["query_id"], set()).add(r["neighbor_id"])
        hits = total = 0
        for q in range(N):
            want = {j for j, _ in exact[q]}
            hits += len(want & approx.get(q, set()))
            total += len(want)
        return hits / total

    assert recall(4) >= recall(1)
