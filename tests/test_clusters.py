"""Connected components / duplicate clustering (llm/clusters.py).

Exercises the pointer-jumping convergence on a long chain (the shape
plain min-propagation is slowest on), multiple components, and the
singleton handling of duplicate_clusters.
"""

import pytest
from pyspark.sql import functions as F

from spark_ext_spark.llm.clusters import connected_components, duplicate_clusters
from tests.conftest import fuzz_seeds


def _edges(spark, pairs):
    return spark.createDataFrame(pairs, "a bigint, b bigint")


def test_chain_and_triangle_components(spark):
    # chain 1-2-3-4-5-6 (diameter 5) + triangle 10-11-12 + pair 20-21
    edges = _edges(spark, [(1, 2), (2, 3), (3, 4), (4, 5), (5, 6),
                           (10, 11), (11, 12), (10, 12),
                           (20, 21)])
    got = {r["node"]: r["comp"]
           for r in connected_components(edges, "a", "b").collect()}
    assert got == {1: 1, 2: 1, 3: 1, 4: 1, 5: 1, 6: 1,
                   10: 10, 11: 10, 12: 10, 20: 20, 21: 20}


def test_long_chain_converges_in_log_rounds(spark):
    # 64-node chain: min-propagation alone needs 63 rounds; pointer
    # jumping must close it within the default max_iter=25 (≈ log2).
    edges = _edges(spark, [(i, i + 1) for i in range(64)])
    out = connected_components(edges, "a", "b")
    assert {r["comp"] for r in out.collect()} == {0}


def test_non_convergence_raises(spark):
    edges = _edges(spark, [(i, i + 1) for i in range(8)])
    with pytest.raises(RuntimeError, match="no convergence"):
        connected_components(edges, "a", "b", max_iter=1)


def test_duplicate_clusters_labels_singletons(spark):
    docs = spark.createDataFrame([(i,) for i in range(7)], "doc_id bigint")
    pairs = _edges(spark, [(1, 4), (4, 6)]).toDF("doc_a", "doc_b")
    rows = {r["doc_id"]: r for r in
            duplicate_clusters(docs, "doc_id", pairs).collect()}
    assert [rows[i]["cluster_id"] for i in range(7)] == [0, 1, 2, 3, 1, 5, 1]
    assert rows[4]["cluster_size"] == 3 and not rows[4]["is_canonical"]
    assert rows[1]["is_canonical"] and rows[0]["cluster_size"] == 1


def test_keep_canonical_drops_near_dups(spark):
    docs = spark.createDataFrame(
        [(i, f"text {i}") for i in range(5)], "doc_id bigint, text string")
    pairs = _edges(spark, [(0, 3), (1, 2)]).toDF("doc_a", "doc_b")
    lab = duplicate_clusters(docs, "doc_id", pairs)
    kept = (docs.join(lab.filter("is_canonical"), "doc_id")
            .select("doc_id").orderBy("doc_id"))
    assert [r["doc_id"] for r in kept.collect()] == [0, 1, 4]


def test_reliable_checkpoint_requires_directory(spark):
    # runs BEFORE the matches-local test: setCheckpointDir cannot be
    # unset on a live context, so the no-dir error path must be
    # exercised first in this module
    edges = _edges(spark, [(0, 1)])
    if spark.sparkContext.getCheckpointDir() is not None:
        pytest.skip("session already has a checkpoint dir")
    with pytest.raises(ValueError, match="checkpoint directory"):
        connected_components(edges, "a", "b", checkpoint="reliable")


def test_reliable_checkpoint_matches_local(spark, tmp_path):
    """checkpoint='reliable' (df.checkpoint to a configured directory —
    the executor-loss-safe mode a 100 TB run wants) must produce the
    exact labels of the localCheckpoint default."""
    edges = _edges(spark, [(0, 5), (5, 9), (2, 3), (7, 8), (8, 9)])
    local = {(r["node"], r["comp"]) for r in
             connected_components(edges, "a", "b").collect()}
    sc = spark.sparkContext
    sc.setCheckpointDir(str(tmp_path / "ckpt"))
    rel = {(r["node"], r["comp"]) for r in
           connected_components(edges, "a", "b",
                                checkpoint="reliable").collect()}
    assert rel == local


def test_unknown_checkpoint_mode_raises(spark):
    edges = _edges(spark, [(0, 1)])
    with pytest.raises(ValueError, match="local.*reliable"):
        connected_components(edges, "a", "b", checkpoint="hdfs")


def test_reliable_checkpoints_cleaned_per_round(spark, tmp_path):
    """Each round's reliable checkpoint is deleted once the next one
    materializes — an hours-long run must not grow the checkpoint
    volume by one label-table copy per round. Only the FINAL label
    checkpoint may remain (the returned lazy DataFrame reads it)."""
    import os

    sc = spark.sparkContext
    ckpt_dir = str(tmp_path / "ckpt_clean")
    sc.setCheckpointDir(ckpt_dir)
    # 16-node chain: several pointer-jumping rounds → several
    # checkpoints written and superseded
    edges = _edges(spark, [(i, i + 1) for i in range(16)])
    labels = connected_components(edges, "a", "b", checkpoint="reliable")
    remaining = []
    for root, dirs, _files in os.walk(ckpt_dir):
        remaining.extend(d for d in dirs if d.startswith("rdd-"))
    assert len(remaining) == 1, remaining
    # and the survivor is exactly what the result reads from
    got = {r["node"]: r["comp"] for r in labels.collect()}
    assert got == {i: 0 for i in range(17)}


@pytest.mark.parametrize("seed", fuzz_seeds(5, 31),
                         ids=lambda s: f"seed{s}")
def test_randomized_components_match_union_find(spark, seed):
    """Seeded random graphs (sparse and near-critical densities,
    self-loops, duplicate and reversed edges, a far-flung id range)
    differentially checked against a driver-side union-find. The
    engineered shapes (chain/triangle/pair) pin convergence behavior;
    random volume pins the labeling itself — every node must get the
    MINIMUM id of its component, whatever the pointer-jumping
    round count."""
    import random
    rng = random.Random(seed)
    for n_nodes, n_edges in [(40, 20), (60, 60), (30, 90)]:
        ids = rng.sample(range(1, 10_000_000), n_nodes)
        pairs = []
        for _ in range(n_edges):
            a, b = rng.choice(ids), rng.choice(ids)
            pairs.append((a, b))              # self-loops allowed
            if rng.random() < 0.2:
                pairs.append((b, a))          # reversed duplicate
        # reference union-find over the same edge list
        parent = {}

        def find(x):
            parent.setdefault(x, x)
            while parent[x] != x:
                parent[x] = parent[parent[x]]
                x = parent[x]
            return x

        for a, b in pairs:
            ra, rb = find(a), find(b)
            if ra != rb:
                parent[max(ra, rb)] = min(ra, rb)
        # canonical label = min node id per component
        comp_min = {}
        for x in list(parent):
            comp_min.setdefault(find(x), set()).add(x)
        expected = {}
        for root, members in comp_min.items():
            label = min(members)
            for m in members:
                expected[m] = label
        got = {r["node"]: r["comp"] for r in connected_components(
            _edges(spark, pairs), "a", "b").collect()}
        assert got == expected, (seed, n_nodes, n_edges)


def test_stepped_checkpoint_dispatch_is_label_identical(spark, monkeypatch):
    """The r13 measured-crossover dispatch (checkpoint the per-round
    stepped aggregate past STEPPED_CHECKPOINT_MIN_NODES labels) must be
    invisible in the labels: force the dispatch ON (threshold 0) and
    OFF (threshold 2^60) over the same multi-round graph and compare
    exact label maps. Also pins that the dispatch fires from round 2
    (node count is only known after round 1's convergence aggregate) —
    a graph needing several pointer-jump rounds exercises both arms."""
    import spark_ext_spark.llm.clusters as cl
    # chain of 40 → needs multiple rounds; plus a disjoint triangle
    pairs = [(i, i + 1) for i in range(40)] + [(100, 101), (101, 102)]
    edges = _edges(spark, pairs)
    monkeypatch.setattr(cl, "STEPPED_CHECKPOINT_MIN_NODES", 1 << 60)
    lazy = {r["node"]: r["comp"]
            for r in cl.connected_components(edges, "a", "b").collect()}
    monkeypatch.setattr(cl, "STEPPED_CHECKPOINT_MIN_NODES", 0)
    ckpt = {r["node"]: r["comp"]
            for r in cl.connected_components(edges, "a", "b").collect()}
    assert lazy == ckpt
    assert lazy[40] == 0 and lazy[102] == 100
