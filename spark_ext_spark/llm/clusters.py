"""Connected components over similarity-pair edges — the final step of
a near-dedup pipeline: pairs → clusters → one canonical doc per
cluster (everything else is droppable).

Spark-first design: iterative DataFrame joins with pointer jumping, no
driver-side graph state. Each round does (a) a neighbor-min propagation
(shuffle on the edge endpoint, then a min-aggregate on the node) and
(b) a pointer jump ``comp ← comp[comp]`` (self-join on the label
table), which halves chain lengths so convergence is O(log diameter)
rounds rather than O(diameter) — the Hash-to-Min idea (Rastogi et al.,
"Finding Connected Components in Map-Reduce in Logarithmic Rounds").
Lineage is truncated every round; ``checkpoint="local"`` (default)
uses ``localCheckpoint`` (fast, dies with an executor) and
``checkpoint="reliable"`` uses ``df.checkpoint()`` against the
session's checkpoint directory — the mode a multi-hour 100 TB run
wants, since it survives executor loss.

100 TB notes: per-round cost is one shuffle of E (edges, labeling the
neighbor proposals) + one E+V-row min-aggregate (map-side combined)
+ two V-sized shuffles for the pointer jump; V shrinks to
#nodes-in-pairs which for dedup workloads is a small fraction of the
corpus. Label table is (long, long) — compact.
The convergence count is a cheap action over the compacted label table,
not the edge set.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["connected_components", "duplicate_clusters"]

# Crossover for checkpointing the per-round stepped aggregate (see the
# loop below): the self-join reads `stepped` twice, and only the MAP
# side of its aggregation is shared between the two reads (via
# ReusedExchange) — the reduce-side final aggregation over E+V rows
# runs once per join input. Materializing `stepped` first trades one
# extra V-row checkpoint job per round for that second reduce pass.
# Measured crossover at r13 (synthetic 64-node-chain graphs,
# local[32], forced-mode interleaved A/B with warmup — SCALE.md "CC
# stepped checkpoint" row): ckpt/lazy median 0.95 at 100k edges, 0.98
# at 400k (flat — job latency cancels the saved pass), 0.93 at 1.6M,
# 0.88 at 4M and still improving — the saved work scales with E+V
# while the added work is a V-row materialization. On a cluster the
# lazy form additionally FETCHES the reused exchange twice over the
# network (both join inputs re-run the reduce pass), so the crossover
# there is lower, not higher. Bench graphs: V ≈ 300 → never fires.
# Node count rides the convergence action for free (one agg, same
# single job as the old where().count()), so dispatch costs nothing.
STEPPED_CHECKPOINT_MIN_NODES = 1_000_000


def _ckpt_file(df: DataFrame) -> str | None:
    """Checkpoint location of a reliably-checkpointed DataFrame (the
    LogicalRDD's underlying RDD), or None if unavailable."""
    try:
        opt = df._jdf.logicalPlan().rdd().getCheckpointFile()
        return opt.get() if opt.isDefined() else None
    except Exception:  # noqa: BLE001 — introspection is best-effort
        return None


def _delete_ckpt_file(df: DataFrame, file: str | None) -> None:
    """Best-effort delete of a no-longer-referenced checkpoint
    directory via the Hadoop FS API (works for HDFS/S3/local alike).
    Spark only auto-cleans reliable checkpoints under the non-default
    ``spark.cleaner.referenceTracking.cleanCheckpoints``, and then only
    on driver GC — without eager cleanup an hours-long iterative job
    accumulates one full label-table copy per round."""
    if not file:
        return
    try:
        sc = df.sparkSession.sparkContext
        path = sc._jvm.org.apache.hadoop.fs.Path(file)
        fs = path.getFileSystem(sc._jsc.hadoopConfiguration())
        fs.delete(path, True)
    except Exception:  # noqa: BLE001 — leaking a checkpoint beats failing
        pass


def connected_components(edges: DataFrame, src: str, dst: str,
                         max_iter: int = 25,
                         checkpoint: str = "local") -> DataFrame:
    """Label every node reachable through ``edges`` with the minimum
    node id of its component. Returns (node, comp); only nodes that
    appear in at least one edge are present (isolated nodes are their
    own singleton component — handle at the call site, as
    ``duplicate_clusters`` does).

    ``checkpoint`` picks the lineage-truncation mode:

    - ``"local"`` (default): ``localCheckpoint()`` — executor-local
      blocks, no extra I/O; right for single-box and short jobs, but
      data is LOST on executor failure and the job restarts from zero.
    - ``"reliable"``: ``df.checkpoint()`` to the session's configured
      checkpoint directory (``spark.sparkContext.setCheckpointDir`` —
      HDFS/S3 on a real cluster). An hours-long 100 TB CC run should
      use this: a lost executor recovers from the checkpoint instead
      of rerunning every round. Raises if no directory is configured.

    Raises RuntimeError if not converged within ``max_iter`` rounds —
    with pointer jumping that means a component of diameter > 2^25,
    which in a dedup graph signals pathological input, not a tuning
    problem.
    """
    if checkpoint not in ("local", "reliable"):
        raise ValueError(f"checkpoint must be 'local' or 'reliable', "
                         f"got {checkpoint!r}")
    if checkpoint == "reliable":
        sc = edges.sparkSession.sparkContext
        if sc.getCheckpointDir() is None:
            raise ValueError(
                "checkpoint='reliable' needs a checkpoint directory: "
                "call spark.sparkContext.setCheckpointDir(<fault-"
                "tolerant path>) first")

        def _ckpt(df: DataFrame) -> DataFrame:
            return df.checkpoint(eager=True)
    else:
        def _ckpt(df: DataFrame) -> DataFrame:
            return df.localCheckpoint()
    # assumes pairs are unique (a < b), as every *_pairs producer in
    # llm/ guarantees — duplicated edges would only cost, not corrupt.
    # Materialize the DIRECTED edge table first, then symmetrize from
    # the checkpointed data: symmetrizing the raw plan instead would
    # run the whole upstream pair-producing pipeline (e.g. the shingle
    # join) twice, once per union branch (measured 10.2 s vs 4.6 s at
    # sf0.1). The repartitions before the checkpoints let AQE size the
    # edge partitions by bytes — a few-hundred-edge graph collapses to
    # one partition, so the per-round joins don't fan out into dozens
    # of near-empty tasks (measured 3.2 s → 1.8 s for 4 rounds), while
    # a billion-edge graph still gets full parallelism.
    reliable = checkpoint == "reliable"
    e1 = _ckpt(edges.select(F.col(src).alias("u"), F.col(dst).alias("v"))
               .repartition("u"))
    e1_file = _ckpt_file(e1) if reliable else None
    # NOTE (r12 optimization round, measured dead end): checkpointing
    # the SYMMETRIZED table repartitioned by v — hoping the per-round
    # neighbor join would reuse that partitioning — buys nothing:
    # localCheckpoint/checkpoint scan back as ExistingRDD with
    # UnknownPartitioning, so EnsureRequirements re-shuffles anyway,
    # and at bench scale the label side broadcasts so the edge side is
    # never shuffled per round in the first place. Keep the single
    # directed checkpoint + lazy union.
    sym = e1.union(e1.select(F.col("v").alias("u"), F.col("u").alias("v")))
    # init = the first neighbor-min round, fused into one aggregate:
    # label(u) = min(u, min(neighbors)) — saves a full round's three
    # joins compared to starting from label(u) = u
    labels = _ckpt(sym.groupBy("u").agg(F.min("v").alias("__mv"))
                   .select(F.col("u").alias("node"),
                           F.least("u", "__mv").alias("comp")))
    label_file = _ckpt_file(labels) if reliable else None

    cached = labels
    n_nodes: int | None = None  # known after round 1's convergence agg
    for _ in range(max_iter):
        # (a) neighbor-min fused with the label merge (r12 optimization
        # round): the round-start labels ride the SAME min-aggregate as
        # the neighbor proposals — one union + one groupBy replaces the
        # previous [join labels onto edges → groupBy → left-join back
        # onto labels] pair, and since every node contributes exactly
        # one self row, the round-start label comes out of the same
        # aggregate (min over the self rows) instead of a third join.
        # stepped.comp = min(L(u), min over neighbor labels) — the
        # identical value the join formulation produced.
        props = (labels.select(
                     "node", F.col("comp").alias("cand"),
                     F.lit(True).alias("__self"))
                 .unionByName(
                     sym.join(labels.select(F.col("node").alias("v"),
                                            F.col("comp").alias("cand")),
                              "v")
                     .select(F.col("u").alias("node"), "cand",
                             F.lit(False).alias("__self"))))
        stepped = (props.groupBy("node")
                   .agg(F.min("cand").alias("comp"),
                        F.min(F.when(F.col("__self"), F.col("cand")))
                        .alias("old_comp")))
        # Measured-crossover dispatch (r13, VERDICT item 5): past
        # STEPPED_CHECKPOINT_MIN_NODES labels, materialize `stepped`
        # so the pointer-jump self-join below reads a checkpointed
        # table twice instead of re-running the reduce-side final
        # aggregation per join input. Below the crossover (every bench
        # graph) the extra per-round job is a pure latency loss — keep
        # the lazy form and let ReusedExchange share the map side.
        s_frame = s_file = None
        if n_nodes is not None and n_nodes >= STEPPED_CHECKPOINT_MIN_NODES:
            stepped = _ckpt(stepped)
            s_frame = stepped
            s_file = _ckpt_file(stepped) if reliable else None
        # (b) pointer jump: comp ← comp[comp] (chain halving)
        parent = stepped.select(F.col("node").alias("pnode"),
                                F.col("comp").alias("pcomp"))
        # the changed flag rides inside the one materialization job, so
        # the convergence test below is a scan of the cached table —
        # not a second join job per round
        jumped = F.least("comp", F.coalesce("pcomp", "comp"))
        nxt = (stepped.join(parent, stepped["comp"] == parent["pnode"],
                            "left")
               .select("node", jumped.alias("comp"),
                       (jumped != F.col("old_comp")).alias("changed")))
        # Re-measured dead end (r13): a LAZY per-round localCheckpoint
        # — sound here, since the convergence aggregate below is a
        # full single-consumer scan that would materialize every
        # partition before the next round's join reads it — saved one
        # job per round on paper but read 1.09× WORSE median (parity
        # at best) in a 4-round interleaved A/B over the three cluster
        # queries at sf0.1. Eager stays.
        nxt = _ckpt(nxt)
        # one action returns BOTH the convergence flag and the label
        # count (same single scan job as the old where().count()); the
        # count feeds the stepped-checkpoint dispatch above from the
        # next round on, so sizing costs no extra job
        stats = nxt.agg(
            F.count_if(F.col("changed")).alias("ch"),
            F.count(F.lit(1)).alias("n")).collect()[0]
        changed, n_nodes = int(stats["ch"]), int(stats["n"])
        if s_frame is not None:
            # nxt is eagerly materialized — the stepped checkpoint is
            # dead weight now
            s_frame.unpersist()
            _delete_ckpt_file(s_frame, s_file)
        cached.unpersist()
        if reliable:
            # nxt is eagerly materialized, so the previous round's
            # checkpoint is no longer referenced by anything — delete
            # it now or the checkpoint volume grows by one label-table
            # copy per round for the whole run
            _delete_ckpt_file(nxt, label_file)
            label_file = _ckpt_file(nxt)
        cached = nxt
        labels = nxt.select("node", "comp")
        if changed == 0:
            e1.unpersist()
            # the final label checkpoint stays — the returned (lazy)
            # DataFrame reads from it — but the edge table is only an
            # input to the (now materialized) labels
            _delete_ckpt_file(e1, e1_file)
            return labels
    e1.unpersist()
    cached.unpersist()
    _delete_ckpt_file(e1, e1_file)
    _delete_ckpt_file(cached, label_file)
    raise RuntimeError(f"connected_components: no convergence in "
                       f"{max_iter} rounds")


def duplicate_clusters(df: DataFrame, id_col: str,
                       pairs: DataFrame, pair_a: str = "doc_a",
                       pair_b: str = "doc_b",
                       checkpoint: str = "local") -> DataFrame:
    """Assign every row of ``df`` to a duplicate cluster given
    near-dup ``pairs``: cluster id = min doc id of the connected
    component, singletons are their own cluster. Output columns:
    (id_col, cluster_id, cluster_size, is_canonical) — keep the
    canonical row per cluster, drop the rest.

    The cluster_size window partitions by cluster_id (many tiny
    partitions — no skew concern; the largest partition is the largest
    dup cluster)."""
    from pyspark.sql.window import Window

    cc = connected_components(pairs, pair_a, pair_b,
                              checkpoint=checkpoint)
    lab = (df.select(id_col)
           .join(cc.withColumnRenamed("node", id_col), id_col, "left")
           .select(id_col,
                   F.coalesce("comp", F.col(id_col)).alias("cluster_id")))
    w = Window.partitionBy("cluster_id")
    return lab.select(
        id_col, "cluster_id",
        F.count(F.lit(1)).over(w).alias("cluster_size"),
        (F.col(id_col) == F.col("cluster_id")).alias("is_canonical"))
