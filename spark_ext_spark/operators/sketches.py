"""Deterministic distinct-count sketches: KMV and fixed-threshold theta.

The production sketch path is HLL++ (`approx_count_distinct`,
`hll_sketch_agg` — see plans/relational.approx_user_stats /
sketch_user_rollup): best accuracy per byte, but its binary registers
are engine-specific, so cross-engine checks can only be rows-only.
These two operators trade a constant factor of accuracy-per-byte for
**bit-for-bit replayability**: every intermediate is an md5-derived
60-bit integer (llm/splits.hash60) that DuckDB, Python, or any SQL
engine reproduces exactly, so the full estimate — not just the row
count — is oracle-checkable. Same role lr_newton_steps plays for the
converged-optimizer query (plans/ml_queries.py).

Both are classic mergeable summaries (Bar-Yossef et al. 2002 for KMV;
the theta sketch is the Apache DataSketches formulation with a fixed
rather than adaptive theta):

- **KMV** keeps the k smallest distinct hash values per group;
  with U(k) = kth smallest hash / 2^60, the unbiased estimate is
  (k-1) / U(k). Exact (= k_eff) whenever the group has fewer than k
  distinct keys. Relative error ~ 1/sqrt(k-2).
- **theta (fixed)** keeps every distinct hash below theta = p·2^60 —
  i.e. a deterministic p-fraction sample of the *key space* (not the
  row space, so duplicates never bias it). Estimate = n_kept / p.
  Mergeable by plain set-union of the kept hashes, which makes it the
  incremental-rollup shape: persist per-day kept-hash sets, answer
  month-level distincts by unioning them — never rescanning raw data.

Scale notes. Hashing + (for theta) the threshold filter happen
scan-side; the distinct is an ordinary partial+final hash aggregate,
so shuffle volume is bounded by the number of distinct keys (theta:
p × that) per partition, never the row count. KMV's per-group top-k
runs in two stages — k smallest within each of `n_shards` hash-mod
shards of a group, then k smallest of those ≤ n_shards·k candidates —
so no window task ever sorts a whole group's distinct set (the same
decomposition that keeps the metrics cumsums and the ANN block grid
off single-task cliffs). The shard stage is lossless: a group-global
top-k member is top-k within its shard a fortiori.

No reference counterpart (collectivemedia/spark-ext has no sketches);
this belongs to the beyond-reference training-pipeline suite.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from spark_ext_spark.llm.splits import hash60

__all__ = ["kmv_distinct", "theta_distinct", "theta_threshold",
           "theta_estimate"]

_TWO60 = float(1 << 60)


def theta_threshold(p: float) -> int:
    """Validated kept-hash threshold p·2^60 — THE sketch parameter.
    Shared by the batch operator, the rollup query, and the streaming
    estimator so the hash width / rounding can never drift between
    them (their oracles replay the same literal)."""
    if not 0.0 < p <= 1.0:
        raise ValueError(f"theta sketch needs 0 < p <= 1, got {p}")
    return int(p * (1 << 60))


def theta_estimate(n_kept: Column, p: float) -> Column:
    """Estimate distinct count from a kept-hash count: n/p, rounded to
    the repo-wide 4dp oracle contract."""
    return F.round(n_kept.cast("double") / F.lit(p), 4)


def _estimate(k_eff: Column, kth: Column, k: int) -> Column:
    # Exact below k distinct; otherwise (k-1)/U(k). The operand order
    # ((k-1)*2^60)/kth is fixed so both engines evaluate the identical
    # float expression; round 4dp to absorb nothing — it is already
    # deterministic — but match the repo-wide oracle contract.
    return F.round(
        F.when(k_eff < k, k_eff.cast("double"))
        .otherwise(F.lit(float(k - 1) * _TWO60) / kth.cast("double")),
        4)


def kmv_distinct(
    df: DataFrame,
    key: str,
    group_cols: list[str] | None = None,
    k: int = 256,
    salt: str = "",
    n_shards: int = 32,
) -> DataFrame:
    """K-minimum-values distinct count of ``key`` per ``group_cols``.

    Returns one row per group with ``k_eff`` (kept hash count, ≤ k),
    ``kth_hash`` (the largest kept hash — the sketch's theta), and
    ``distinct_est``. NULL keys are excluded (count-distinct
    semantics). Deterministic: independent of partitioning, task
    retries, and engine.
    """
    if k < 2:
        raise ValueError(f"kmv_distinct needs k >= 2, got {k}")
    group_cols = list(group_cols or [])
    d = (df.where(F.col(key).isNotNull())
         .select(*group_cols, hash60(key, salt).alias("__h"))
         .distinct())
    # Stage 1: top-k within (group, hash-mod shard). pmod of the hash
    # itself is uniform across shards and adds no extra column to the
    # shuffle key's entropy.
    shard = F.pmod(F.col("__h"), F.lit(n_shards))
    w_shard = Window.partitionBy(*group_cols, "__s").orderBy("__h")
    cand = (d.withColumn("__s", shard)
            .withColumn("__rn", F.row_number().over(w_shard))
            .where(F.col("__rn") <= k)
            .drop("__s", "__rn"))
    # Stage 2: top-k of ≤ n_shards·k candidates per group.
    w_group = Window.partitionBy(*group_cols).orderBy("__h")
    kept = (cand.withColumn("__rn", F.row_number().over(w_group))
            .where(F.col("__rn") <= k))
    k_eff, kth = F.count(F.lit(1)), F.max("__h")
    return (kept.groupBy(*group_cols)
            .agg(k_eff.alias("k_eff"),
                 kth.alias("kth_hash"),
                 _estimate(k_eff, kth, k).alias("distinct_est")))


def theta_distinct(
    df: DataFrame,
    key: str,
    group_cols: list[str] | None = None,
    p: float = 0.25,
    salt: str = "",
) -> DataFrame:
    """Fixed-threshold theta sketch: distinct count of ``key`` per
    ``group_cols`` from the deterministic p-fraction of the hash
    space below theta = p·2^60.

    Returns ``n_kept`` and ``distinct_est`` = n_kept / p — one row for
    EVERY group that has a non-null key, including groups whose kept
    set is empty (n_kept=0, distinct_est=0.0): a small group can
    legitimately sample to nothing, and that must stay distinguishable
    from the group being absent. The kept set is union-mergeable
    across groups/partitions/days, so rollups re-aggregate sketches
    instead of raw rows; ``theta_distinct`` of the union equals the
    union of sketches by construction (asserted in
    tests/test_sketches.py). Relative error ~ 1/sqrt(p·D) — choose
    p against the smallest distinct count you care about.
    """
    theta = theta_threshold(p)
    group_cols = list(group_cols or [])
    nn = df.where(F.col(key).isNotNull())
    kept = (nn.select(*group_cols, hash60(key, salt).alias("__h"))
            .where(F.col("__h") < theta)
            .distinct())
    n = F.count(F.lit(1))
    agg = (kept.groupBy(*group_cols)
           .agg(n.alias("n_kept"),
                theta_estimate(n, p).alias("distinct_est")))
    if not group_cols:
        # global aggregation always emits its one row, count()=0 incl.
        return agg
    groups = nn.select(*group_cols).distinct()
    # null-SAFE join keys: a NULL group is a legitimate group (groupBy
    # put its kept hashes in agg), but a plain equi-join would never
    # match it — the r12 hostile sweep caught the NULL group reporting
    # n_kept=0 while its true kept set was intact in agg. <=> keys
    # still plan as a hash join, so nothing changes at scale.
    cond = None
    for c in group_cols:
        eq = groups[c].eqNullSafe(agg[c])
        cond = eq if cond is None else cond & eq
    return (groups.join(agg, cond, "left")
            .select(*[groups[c] for c in group_cols],
                    F.coalesce("n_kept", F.lit(0)).alias("n_kept"),
                    F.coalesce("distinct_est", F.lit(0.0))
                    .alias("distinct_est")))
