"""Similarity search over embedding columns (``array<float>``).

- ``cosine_topk``: brute-force top-k, all-JVM (zip_with/aggregate dot
  product + window rank). The baseline: exact, one shuffle for the
  rank, broadcast of the (smaller) query side — right answer whenever
  one side fits in a broadcast.
- ``lsh_topk``: random-hyperplane LSH variant — the 100 TB path:
  vectors hash to sign-pattern buckets (seeded projection matrix,
  shipped as literal arrays so the whole plan stays declarative);
  candidates come from a bucket equi-join (optionally multiprobe over
  1-bit-flipped buckets), then exact cosine re-rank within candidates.
"""

from __future__ import annotations

import math

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

__all__ = ["cosine_similarity_col", "cosine_topk", "lsh_buckets",
           "lsh_topk", "fit_ivf_centroids", "ivf_topk",
           "fit_ivf_centroids_quantized", "ivf_topk_deterministic",
           "embedding_near_dups", "drop_artifact_table"]


def _materialize_artifact(df: DataFrame, storage: str,
                          table_name: str | None,
                          persisted_out: list | None = None) -> DataFrame:
    """Lifecycle seam for ANN intermediates that are read more than
    once per action (LSH bucket frames, IVF cell assignments).

    ``storage="cache"`` (default): session cache — right for a single
    query over a corpus that fits executor storage memory. The frame
    is appended to ``persisted_out`` (if given) so callers can
    ``.unpersist()`` it explicitly instead of waiting for eviction /
    ``spark.catalog.clearCache()``.

    ``storage="table"``: write-once-read-many — the frame is EAGERLY
    written to ``table_name`` in the session warehouse (parquet) and
    re-read from there, the right shape for a 100 TB curation run
    where one assignment feeds many queries and must not depend on
    executor cache residency. Re-invoking with the same name
    overwrites. Drop with :func:`drop_artifact_table` when the run is
    done.

    Mismatched arguments raise (same strict contract as
    ``embedding_near_dups``'s exact path): ``artifact_table`` with
    ``storage="cache"`` would silently produce no table, and
    ``persisted_out`` with ``storage="table"`` would silently never be
    filled — both are caller bugs, not preferences."""
    if storage == "cache":
        if table_name:
            raise ValueError(
                "artifact_table= is only meaningful with "
                "storage='table'; storage='cache' would silently "
                "create no table — drop the argument or switch storage")
        df = df.cache()
        if persisted_out is not None:
            persisted_out.append(df)
        return df
    if storage == "table":
        if persisted_out is not None:
            raise ValueError(
                "persisted_out= is only meaningful with "
                "storage='cache'; a storage='table' artifact is "
                "released with drop_artifact_table(), not unpersist()")
        if not table_name:
            raise ValueError("storage='table' requires artifact_table=")
        df.write.mode("overwrite").format("parquet").saveAsTable(table_name)
        return df.sparkSession.table(table_name)
    raise ValueError(f"unknown storage: {storage!r} "
                     "(expected 'cache' or 'table')")


def _assert_unique_ids(artifact: DataFrame, entry: str) -> None:
    """Upfront unique-non-null-id assertion for the APPROXIMATE paths
    (r8 advice): `_role_split_gemm`'s in-group duplicate check is
    globally complete for the exact sharded GEMMs (duplicates co-locate
    by id hash) but best-effort under LSH/IVF, where same-id rows with
    different vectors can land in disjoint buckets and silently corrupt
    self-exclusion, tie-break, and shard-merge dedup without ever
    sharing a pandas group. One scalar aggregate over the materialized
    bucket/cell artifact (Catalyst prunes it to the id column, and the
    scan doubles as the cache warm-up) gives those paths the same named
    failure. Nulls count as violations too: a null id defeats the
    id-keyed self-exclusion and merge on every engine. Callers that
    re-serve a corpus already verified once (the fit-once/query-many
    production shape) can skip the scan with
    ``check_unique_ids=False`` on any approximate entry point."""
    row = artifact.agg(
        F.count(F.lit(1)).alias("n"),
        F.count_distinct("vec_id").alias("d")).first()
    if row["n"] != row["d"]:
        raise ValueError(
            f"{entry}: embedding ids must be unique and non-null "
            f"({row['n']} rows, {row['d']} distinct non-null ids); "
            "approximate search keys self-exclusion and candidate "
            "merging on the id — dedupe the corpus upstream")


def drop_artifact_table(spark, table_name: str) -> None:
    """Explicitly end a ``storage="table"`` artifact's lifecycle."""
    escaped = table_name.replace("`", "``")
    spark.sql(f"DROP TABLE IF EXISTS `{escaped}`")


def cosine_similarity_col(a: Column, b: Column) -> Column:
    """cos(a,b) as a JVM expression over two array<double> columns.

    Zero-norm vectors yield similarity 0.0 — the same guard as the
    GEMM paths (`_role_split_gemm`). Without it, 0/0 = NaN, and Spark
    ranks NaN as the LARGEST double, so one zero (padding) embedding
    would top every descending-similarity ranking it appears in."""
    dot = F.aggregate(F.zip_with(a, b, lambda x, y: x * y),
                      F.lit(0.0), lambda acc, v: acc + v)
    na = F.sqrt(F.aggregate(F.transform(a, lambda x: x * x),
                            F.lit(0.0), lambda acc, v: acc + v))
    nb = F.sqrt(F.aggregate(F.transform(b, lambda x: x * x),
                            F.lit(0.0), lambda acc, v: acc + v))
    return F.when((na == 0.0) | (nb == 0.0), F.lit(0.0)) \
            .otherwise(dot / (na * nb))


def _finite_vec(vec: Column, entry: str,
                dim: int | None = None) -> Column:
    """Per-row non-finite guard for an ``array<double>`` vector column
    (round-10 NaN sweep): a single NaN/Inf component silently poisons
    every similarity score, LSH sign bucket, IVF cell distance, and
    quantization scale it touches — and since NaN comparisons and
    orderings differ subtly across engines, the corruption is a SILENT
    cross-engine divergence, not an error. Same contract as the
    duplicate-id scan: invalid corpus → NAMED error; but as an in-plan
    codegen branch it costs nothing and needs no opt-out. NULL vectors
    pass through (excluded by the callers' isNotNull contract); a NULL
    ELEMENT is rejected like NaN — three-valued logic would otherwise
    let it slip through the exists predicate and become NaN inside the
    GEMM (self-review finding, round 10)."""
    bad = F.exists(vec, lambda x: x.isNull() | F.isnan(x)
                   | (F.abs(x) == F.lit(float("inf"))))
    out = (F.when(bad, F.raise_error(F.lit(
               f"{entry}: non-finite or NULL embedding component "
               "(NaN, ±Infinity, or NULL element) — similarity "
               "scores, LSH buckets, and IVF cells would silently "
               "diverge on it; repair or filter the corpus "
               "upstream")).cast("array<double>"))
           .otherwise(vec))
    if dim is not None:
        # ragged-dim probe (round 10): a wrong-length vector NULL-pads
        # the zip_with folds, so LSH sign bits and IVF cell distances
        # come out as valid-looking wrong answers (the GEMM paths name
        # the defect only when the ragged rows happen to co-group).
        # Where a dim literal exists, reject per-row — cosine between
        # different-dim vectors is undefined.
        out = (F.when(F.size(vec) != F.lit(dim), F.raise_error(F.lit(
                   f"{entry}: embedding dimensionality differs from "
                   f"the corpus dimension ({dim}) — cosine between "
                   "different-dim vectors is undefined and bucket/"
                   "cell assignment would silently mis-place the row; "
                   "repair or split the corpus")).cast("array<double>"))
               .otherwise(out))
    return out


def _nn_vectors(df: DataFrame, id_col: str, vec_col: str,
                entry: str = "vector search",
                dim: int | None = None) -> DataFrame:
    """The one invariant every search entry point shares: null
    embeddings are excluded (they can match nothing, and a single null
    row reaching a GEMM group turns the batch ragged and kills the
    task — at 100 TB, one bad row fails the job), and non-finite
    components fail by name (_finite_vec). Returns the normalized
    (vec_id, vec) frame; the isNotNull predicate pushes down to the
    parquet scan."""
    return (df.filter(F.col(vec_col).isNotNull())
            .select(F.col(id_col).alias("vec_id"),
                    _finite_vec(F.col(vec_col).cast("array<double>"),
                                entry, dim=dim).alias("vec")))


def cosine_topk(queries: DataFrame, corpus: DataFrame, k: int,
                id_col: str = "vec_id", vec_col: str = "embedding",
                round_to: int | None = None,
                method: str = "gemm",
                shard_rows: int = 16384) -> DataFrame:
    """Exact top-k neighbors per query (excluding self-matches).
    Deterministic rank order: similarity desc, neighbor id asc.

    method="gemm" (default): distributed block-nested-loop — the
    corpus is hash-sharded into groups of ≤ ``shard_rows`` vectors,
    every query probes every shard (explode over shard ids), and each
    (shard) co-group does ONE numpy GEMM emitting per-shard top-k; a
    final groupBy(query_id) merges shard-local winners into the exact
    global top-k (a candidate dropped at shard rank >k is beaten by k
    shard-mates that also beat it globally, so the merge is lossless).
    NOTHING materializes on the driver — the only driver-side job is a
    count() to size the shard grid, so the plan survives corpora that
    would OOM a broadcast. Query replication is S× (S = #shards):
    inherent to exact search; use lsh_topk/ivf_topk when S gets large.

    method="expr": all-JVM crossJoin + zip_with/aggregate + window —
    kept as the declarative reference plan (good when M is tiny).
    NOTE: this path runs an EAGER one-row Spark job at plan-build
    time (``_infer_dim`` reads the corpus's first non-null vector to
    pin the ragged-dim guard's expected dimension) — so unlike the
    gemm path the returned DataFrame is not fully lazy, and if the
    corpus's FIRST row is itself ragged, every well-formed row will
    be the one reported as dimension-mismatched (the guard trusts the
    probed row; repair order matters).
    """
    if method == "expr":
        # dim probe: without it zip_with NULL-pads ragged vectors and
        # the expr plan silently ranks undefined similarities (the
        # GEMM path names this defect inside the group). An empty or
        # all-null corpus has no dim and nothing to mis-rank — keep
        # the old lazy empty-result behavior (gemm-path parity)
        # instead of raising at plan build (round-10 self-review)
        try:
            dim = _infer_dim(corpus, vec_col)
        except ValueError:
            dim = None
        q = (queries.filter(F.col(vec_col).isNotNull())
             .select(F.col(id_col).alias("query_id"),
                     _finite_vec(F.col(vec_col).cast("array<double>"),
                                 "cosine_topk", dim=dim).alias("qv")))
        c = (corpus.filter(F.col(vec_col).isNotNull())
             .select(F.col(id_col).alias("neighbor_id"),
                     _finite_vec(F.col(vec_col).cast("array<double>"),
                                 "cosine_topk", dim=dim).alias("cv")))
        sim = cosine_similarity_col(F.col("qv"), F.col("cv"))
        if round_to is not None:
            sim = F.round(sim, round_to)
        pairs = (F.broadcast(q).crossJoin(c)
                 .filter(F.col("query_id") != F.col("neighbor_id"))
                 .select("query_id", "neighbor_id", sim.alias("sim")))
        w = Window.partitionBy("query_id").orderBy(F.desc("sim"),
                                                   F.asc("neighbor_id"))
        return (pairs.withColumn("rank", F.row_number().over(w))
                .filter(F.col("rank") <= k)
                .select("query_id", "neighbor_id", "sim", "rank"))

    c, n_shards = _sharded(corpus, id_col, vec_col, shard_rows)
    c = c.withColumn("role", F.lit("c"))
    q = (_nn_vectors(queries, id_col, vec_col)
         .withColumn("shard",
                     F.explode(F.sequence(F.lit(0), F.lit(n_shards - 1))))
         .withColumn("role", F.lit("q")))
    # self-search over a ≤shard_rows corpus provably fits one GEMM
    # group (q side = corpus) — skip the block grid's sizing pass
    sub = None if (queries is corpus and n_shards == 1) else shard_rows
    return _grouped_candidate_topk(q.unionByName(c), "shard", k,
                                   round_to=round_to,
                                   shard_rows=sub)


def _id_type(df: DataFrame, col: str) -> str:
    """DDL type of an id column, for applyInPandas output schemas —
    hardcoding ``long`` would crash the GEMM paths at Arrow
    serialization for string/UUID ids (which the expr/lsh variants
    accept fine)."""
    return df.schema[col].dataType.simpleString()


def _role_split_gemm(pdf: pd.DataFrame, round_to: int | None):
    """Shared per-group GEMM preamble for the bucketed/sharded paths:
    split rows by role, L2-normalize, one queries × members matmul.
    Returns (qs, cs, sims) or None when either side is empty.
    Zero-norm vectors are guarded (norm 1 ⇒ sim 0 everywhere) instead
    of poisoning their row/column with NaN.

    Ids must be UNIQUE within each search side: self-exclusion, the
    rank tie-break, and the shard-merge dedup all key on the id, so a
    duplicated id (usually an upstream join fanout) silently corrupts
    rankings instead of erroring. Shards and sub-shards hash on the
    id, so duplicates always co-locate in one pandas group — this
    local check is globally complete for the exact GEMM paths; the
    LSH/IVF entry points (where same-id rows with different vectors
    can land in disjoint buckets) additionally assert global id
    uniqueness upfront via _assert_unique_ids. Named here, like the
    mixed-dimensionality check below, instead of surfacing as a
    row-count-dependent wrong answer."""
    qs = pdf[pdf["role"] == "q"]
    cs = pdf[pdf["role"] == "c"]
    if qs.empty or cs.empty:
        return None
    for side in (qs, cs):
        dup = side["vec_id"].duplicated()
        if dup.any():
            raise ValueError(
                f"duplicate embedding id {side['vec_id'][dup].iloc[0]!r} "
                "within one search side; similarity search requires "
                "unique ids per side — dedupe the corpus upstream")
    try:
        qm = np.array(qs["vec"].tolist(), dtype=np.float64)
        cm = np.array(cs["vec"].tolist(), dtype=np.float64)
    except ValueError as e:
        # ragged input: nulls are filtered at every entry point, so
        # this is mixed dimensionality — name the defect instead of
        # numpy's opaque inhomogeneous-shape error
        dims = sorted({len(v) for v in list(qs["vec"]) + list(cs["vec"])
                       if v is not None})
        raise ValueError(
            f"embeddings have mixed dimensionality {dims}; similarity "
            "search requires one fixed dim — repair or split the "
            "corpus") from e
    if qm.shape[1] != cm.shape[1]:
        # each side homogeneous but query dim != corpus dim: without
        # this check the defect escapes to numpy's raw matmul
        # core-dimension error
        raise ValueError(
            f"embeddings have mixed dimensionality "
            f"{sorted({qm.shape[1], cm.shape[1]})}; similarity search "
            "requires one fixed dim — repair or split the corpus")
    qn = np.linalg.norm(qm, axis=1, keepdims=True)
    cn = np.linalg.norm(cm, axis=1, keepdims=True)
    qn[qn == 0] = 1.0
    cn[cn == 0] = 1.0
    sims = (qm / qn) @ (cm / cn).T
    if round_to is not None:
        sims = np.round(sims, round_to)
    return qs, cs, sims


def _sharded(df: DataFrame, id_col: str, vec_col: str,
             shard_rows: int) -> tuple[DataFrame, int]:
    """((vec_id, vec, shard), S) with shard = pmod(xxhash64(id), S)
    where S sizes shards to ≤ shard_rows vectors. The count() is the
    only driver-side job in the exact-GEMM paths — a scalar aggregate,
    not a materialization, so it is scale-safe."""
    nn = _nn_vectors(df, id_col, vec_col)
    cnt = nn.count()
    n_shards = max(1, math.ceil(cnt / shard_rows))
    out = nn.withColumn(
        "shard", F.pmod(F.xxhash64(F.col("vec_id")), F.lit(n_shards))
                  .cast("int"))
    return out, n_shards


def embedding_near_dups(df: DataFrame, threshold: float = 0.95,
                        id_col: str = "vec_id", vec_col: str = "embedding",
                        method: str = "exact",
                        n_planes: int = 8, seed: int = 42,
                        round_to: int | None = 4,
                        shard_rows: int = 16384,
                        storage: str = "cache",
                        artifact_table: str | None = None,
                        persisted_out: list | None = None,
                        check_unique_ids: bool = True) -> DataFrame:
    """Embedding-cosine near-duplicate pairs (id_a < id_b, sim ≥ τ).

    method="exact": all-pairs via the sharded co-group GEMM — the
    corpus is hash-sharded (≤ shard_rows vectors per shard), every row
    probes every shard, and each shard group runs one numpy GEMM
    emitting pairs with q_id < c_id (each unordered pair surfaces in
    exactly one shard — the one owning its larger id — so no dedup
    pass). No driver materialization; quadratic probe replication is
    inherent to exactness, so prefer method="lsh" at large N.
    method="lsh": hyperplane-bucket blocking then exact cosine within
    buckets (+1-bit multiprobe) — the 100 TB path; recall follows the
    LSH S-curve, candidates come from equi-joins only.

    The storage/artifact_table/persisted_out lifecycle applies to the
    LSH bucket frame only; the exact path materializes no reusable
    artifact, so passing them with method="exact" raises instead of
    silently writing nothing."""
    import pandas as pd

    if storage not in ("cache", "table"):
        raise ValueError(f"unknown storage: {storage!r} "
                         "(expected 'cache' or 'table')")
    if method != "lsh" and (storage != "cache" or artifact_table
                            or persisted_out is not None):
        raise ValueError(
            "storage/artifact_table/persisted_out apply to method='lsh' "
            "only — the exact path has no reusable artifact to persist")
    if method == "lsh":
        # materialized because BOTH sides of the bucket self-join below
        # read it (a join, unlike the q/c unions elsewhere, genuinely
        # needs two inputs). storage="table" (+ artifact_table=) writes
        # it once to the warehouse instead — the multi-query / 100 TB
        # lifecycle; storage="cache" hands the frame to persisted_out
        # for explicit release.
        b = _materialize_artifact(
            lsh_buckets(df, n_planes, seed, id_col, vec_col),
            storage, artifact_table, persisted_out)
        if check_unique_ids:
            _assert_unique_ids(b, "embedding_near_dups[lsh]")
        probes = F.array(F.col("bucket"),
                         *[F.col("bucket").bitwiseXOR(F.lit(1 << p))
                           for p in range(n_planes)])
        # Norms are per-VECTOR quantities: compute them on the two
        # V-sized join inputs instead of per candidate PAIR (r12
        # optimization round). The pair expression previously ran five
        # interpreted array folds per candidate row (dot + the norm
        # pair, with each norm evaluated twice across the zero-guard
        # and the division); now only the dot fold remains pair-side.
        # Values are bit-identical: the norm sub-expression is
        # unchanged (same fold order), it just moves below the join —
        # measured 2.2 s → 0.9 s warm on the sf0.1 candidate set with
        # 0 bitwise diffs over the surviving pairs.
        nrm = F.sqrt(F.aggregate(
            F.transform(F.col("vec"), lambda x: x * x),
            F.lit(0.0), lambda acc, v: acc + v))
        a = (b.select(F.col("vec_id").alias("id_a"),
                      F.col("vec").alias("va"), nrm.alias("__na"),
                      F.explode(probes).alias("bucket")))
        c = b.select(F.col("vec_id").alias("id_b"),
                     F.col("vec").alias("vb"), nrm.alias("__nb"),
                     "bucket")
        dot = F.aggregate(
            F.zip_with(F.col("va"), F.col("vb"), lambda x, y: x * y),
            F.lit(0.0), lambda acc, v: acc + v)
        sim = (F.when((F.col("__na") == 0.0) | (F.col("__nb") == 0.0),
                      F.lit(0.0))
               .otherwise(dot / (F.col("__na") * F.col("__nb"))))
        if round_to is not None:
            sim = F.round(sim, round_to)
        return (a.join(c, "bucket")
                .filter(F.col("id_a") < F.col("id_b"))
                .select("id_a", "id_b", sim.alias("sim"))
                .groupBy("id_a", "id_b").agg(F.max("sim").alias("sim"))
                .filter(F.col("sim") >= threshold))

    c, n_shards = _sharded(df, id_col, vec_col, shard_rows)
    c = c.withColumn("role", F.lit("c"))
    q = (_nn_vectors(df, id_col, vec_col)
         .withColumn("shard",
                     F.explode(F.sequence(F.lit(0), F.lit(n_shards - 1))))
         .withColumn("role", F.lit("q")))

    def group_pairs(pdf: pd.DataFrame) -> pd.DataFrame:
        split = _role_split_gemm(pdf, round_to)
        if split is None:
            return pd.DataFrame({"id_a": [], "id_b": [], "sim": []})
        qs, cs, sims = split
        c_ids = cs["vec_id"].to_numpy()
        q_ids = qs["vec_id"].to_numpy()
        out_a, out_b, out_s = [], [], []
        for i, qid in enumerate(q_ids):
            mask = (c_ids > qid) & (sims[i] >= threshold)
            out_a.extend([qid] * int(mask.sum()))
            out_b.extend(c_ids[mask].tolist())
            out_s.extend(sims[i][mask].tolist())
        return pd.DataFrame({"id_a": out_a, "id_b": out_b, "sim": out_s})

    # block the per-shard GEMM: the probe side replicates the WHOLE
    # corpus into every shard group, so without sub-sharding each
    # pandas group holds N + shard_rows rows. Every unordered pair
    # still meets exactly once — in the single (shard, cs, qs) block
    # where cs = hash(c) and qs = hash(q) — so no dedup pass is needed.
    # A one-shard corpus (N ≤ shard_rows) provably fits one group:
    # skip the grid's sizing pass.
    both = q.unionByName(c)
    idt = _id_type(df, id_col)
    out_schema = f"id_a {idt}, id_b {idt}, sim double"
    if n_shards == 1:
        return both.groupBy("shard").applyInPandas(group_pairs,
                                                   schema=out_schema)
    blocked = _block_grid(both, "shard", shard_rows)
    return (blocked.groupBy("shard", "__cs", "__qs")
            .applyInPandas(group_pairs, schema=out_schema))


def _infer_dim(df: DataFrame, vec_col: str) -> int:
    """Embedding dimensionality from the first NON-NULL vector — the
    bare ``first()`` probe returned a NULL size when the first row's
    embedding happened to be null, which then crashed far away inside
    numpy with an opaque TypeError."""
    first = (df.filter(F.col(vec_col).isNotNull())
             .select(F.size(vec_col)).first())
    if first is None or first[0] is None:
        raise ValueError("no non-null embeddings and no dim given")
    return int(first[0])


def _projections(dim: int, n_planes: int, seed: int) -> np.ndarray:
    rng = np.random.default_rng(seed)
    return rng.standard_normal((n_planes, dim))


def _explode_roles(df: DataFrame, probe_groups: Column,
                   group_name: str) -> DataFrame:
    """(vec_id, vec, <group_name>, role) rows: each input row emits
    every ``probe_groups`` element tagged 'q' plus its own group —
    the array's FIRST element by contract — tagged 'c', all from ONE
    explode. Replaces the q/c union pattern, which read the input
    frame twice per action and therefore needed a .cache() that — in
    a lazy API with no action boundary — nothing could ever
    unpersist. ``probe_groups`` is referenced exactly once, which is
    load-bearing: CollapseProject inlines the (interpreted, per-
    centroid) distance fold into every reference, so a second
    reference re-evaluates the whole fold per row (measured 3× slower
    on the IVF query)."""
    pairs = F.flatten(F.transform(
        probe_groups,
        lambda g, i: F.when(
            i == F.lit(0),
            F.array(F.struct(g.alias("g"), F.lit("q").alias("role")),
                    F.struct(g.alias("g"), F.lit("c").alias("role"))))
        .otherwise(
            F.array(F.struct(g.alias("g"), F.lit("q").alias("role"))))))
    return (df.select("vec_id", "vec", F.explode(pairs).alias("__p"))
            .select("vec_id", "vec",
                    F.col("__p.g").alias(group_name),
                    F.col("__p.role").alias("role")))


def lsh_buckets(df: DataFrame, n_planes: int = 8, seed: int = 42,
                id_col: str = "vec_id", vec_col: str = "embedding",
                dim: int | None = None) -> DataFrame:
    """(id, vec, bucket) — bucket = sign-pattern integer of the vector
    against n_planes seeded random hyperplanes. The projection matrix
    ships as literal arrays inside the plan (no closure/broadcast
    state), so Catalyst sees one deterministic expression."""
    if dim is None:
        dim = _infer_dim(df, vec_col)
    planes = _projections(dim, n_planes, seed)
    # guarded ONCE and reused for both the sign fold and the output
    # vec, so a pruned projection (e.g. the id-only uniqueness scan)
    # cannot drop the non-finite check with the column
    v = _finite_vec(F.col(vec_col).cast("array<double>"),
                    "lsh_buckets", dim=dim)
    bucket = F.lit(0)
    for p in range(n_planes):
        row = F.lit([float(x) for x in planes[p]])
        dot = F.aggregate(F.zip_with(v, row, lambda x, y: x * y),
                          F.lit(0.0), lambda acc, z: acc + z)
        bucket = bucket + F.when(dot >= 0, F.lit(1 << p)).otherwise(F.lit(0))
    # null embeddings excluded (same contract as _sharded: they match
    # nothing, and a null vec row crashes the downstream GEMM group)
    return (df.filter(F.col(vec_col).isNotNull())
            .select(F.col(id_col).alias("vec_id"),
                    v.alias("vec"), bucket.alias("bucket")))


def lsh_topk(df: DataFrame, k: int, n_planes: int = 8, seed: int = 42,
             id_col: str = "vec_id", vec_col: str = "embedding",
             multiprobe: bool = True,
             round_to: int | None = None,
             shard_rows: int = 16384,
             storage: str = "cache",
             artifact_table: str | None = None,
             persisted_out: list | None = None,
             check_unique_ids: bool = True,
             dim: int | None = None) -> DataFrame:
    """Approximate top-k within LSH buckets; multiprobe also searches
    the n_planes 1-bit-adjacent buckets (recall boost without widening
    the join fan-out asymptotically).

    IVF-style execution: bucket members ('c' rows) plus probing
    queries ('q' rows) are co-grouped per bucket, and each group does
    ONE numpy GEMM (queries × members) emitting per-query bucket-local
    top-k; a final groupBy merges bucket-local candidates into global
    top-k. Vectors materialize once per probe, never per pair.

    ``dim`` pins the embedding dimensionality up front (the planes are
    dim-sized plan literals). When omitted it is probed with a one-row
    ``first()`` job per invocation — callers that know their corpus
    (every declared bench query: the embeddings table is dim-64 at all
    SFs, the same constant already baked into the DuckDB oracles)
    should pass it so candidate generation is fully lazy. Results are
    identical either way; a wrong ``dim`` fails loudly at the
    per-row _finite_vec guard instead of mis-projecting."""
    import pandas as pd

    # materialized: the candidate explode and the block grid's
    # bucket-sizing aggregate both read the bucket projection.
    # storage="table" persists it to the warehouse (the multi-query /
    # 100 TB lifecycle); storage="cache" + persisted_out gives the
    # caller an explicit unpersist handle.
    b = _materialize_artifact(
        lsh_buckets(df, n_planes, seed, id_col, vec_col, dim=dim),
        storage, artifact_table, persisted_out)
    if check_unique_ids:
        _assert_unique_ids(b, "lsh_topk")
    if multiprobe:
        probes = F.array(F.col("bucket"),
                         *[F.col("bucket").bitwiseXOR(F.lit(1 << p))
                           for p in range(n_planes)])
    else:
        probes = F.array(F.col("bucket"))
    both = _explode_roles(b, probes, "bucket")  # own bucket = probes[0]

    return _grouped_candidate_topk(both, "bucket", k, round_to=round_to,
                                   shard_rows=shard_rows)


def _block_grid(both: DataFrame, group_col: str,
                shard_rows: int) -> DataFrame:
    """Bound pandas-group sizes for the per-bucket GEMMs: within each
    group, members ('c' rows) hash-split into ceil(nc/shard_rows)
    sub-shards and queries ('q' rows) into ceil(nq/shard_rows); each
    row replicates across the OTHER role's axis, so every (q, c)
    combination meets in exactly one (group, __cs, __qs) block of
    ≈ ≤ 2·shard_rows rows — the block decomposition of the bucket
    GEMM. Without this, one hot LSH bucket / IVF cell (or the
    all-probes query side of an exact shard) lands an unbounded row
    count in a single pandas group → executor OOM at 100 TB. The
    per-group sizing table is one row per bucket (broadcast join), and
    its aggregation reads only (group, role) — Catalyst prunes the
    vector column out of the sizing pass, so the extra pass carries
    narrow rows, not embeddings. Results are unchanged because the
    downstream per-query merge is lossless over any partition of the
    candidate set."""
    sizes = (both.groupBy(group_col).agg(
        F.greatest(F.lit(1), F.ceil(
            F.sum(F.when(F.col("role") == "c", 1).otherwise(0))
            / F.lit(shard_rows))).cast("int").alias("__nc"),
        F.greatest(F.lit(1), F.ceil(
            F.sum(F.when(F.col("role") == "q", 1).otherwise(0))
            / F.lit(shard_rows))).cast("int").alias("__nq")))
    # Salted with a second hash input: the exact path's groups are
    # themselves pmod(xxhash64(vec_id), n_shards), so an UNsalted
    # sub-shard hash is fully correlated with the group whenever __nc
    # divides n_shards (every member of shard s has hash ≡ s, making
    # hash mod __nc a constant — one block takes the whole shard and
    # the size cap silently stops capping). Any distinct second column
    # decorrelates; results are unchanged (the merge is lossless over
    # any partition of the candidates).
    salt = F.lit(1)
    own_c = F.pmod(F.xxhash64(F.col("vec_id"), salt),
                   F.col("__nc")).cast("int")
    own_q = F.pmod(F.xxhash64(F.col("vec_id"), salt),
                   F.col("__nq")).cast("int")
    blocks = (F.when(F.col("role") == "c",
                     F.transform(F.sequence(F.lit(0), F.col("__nq") - 1),
                                 lambda q: F.struct(
                                     own_c.alias("cs"),
                                     q.cast("int").alias("qs"))))
              .otherwise(
                  F.transform(F.sequence(F.lit(0), F.col("__nc") - 1),
                              lambda c: F.struct(
                                  c.cast("int").alias("cs"),
                                  own_q.alias("qs")))))
    return (both.join(F.broadcast(sizes), group_col)
            .withColumn("__blk", F.explode(blocks))
            .select(group_col, "vec_id", "vec", "role",
                    F.col("__blk.cs").alias("__cs"),
                    F.col("__blk.qs").alias("__qs")))


def _grouped_candidate_topk(both: DataFrame, group_col: str, k: int,
                            round_to: int | None = None,
                            shard_rows: int | None = 16384) -> DataFrame:
    """Shared IVF-style execution for bucketed ANN: per group, ONE
    numpy GEMM of probing queries ('q' rows) × group members ('c'
    rows) emits per-query group-local top-k; a global groupBy then
    merges multi-probe hits and re-ranks. Vectors materialize once per
    probe, never per pair. round_to pins similarity decimals BEFORE
    ranking so tie-breaks are reproducible across engines.

    ``shard_rows`` caps pandas-group size via :func:`_block_grid`
    sub-sharding (None disables). The per-block top-k → global merge
    is lossless: a candidate dropped at block rank > k is beaten by k
    block-mates that also beat it in the merged bucket."""
    import pandas as pd

    def group_topk(pdf: pd.DataFrame) -> pd.DataFrame:
        split = _role_split_gemm(pdf, round_to)
        if split is None:
            return pd.DataFrame(columns=["query_id", "neighbor_id", "sim"])
        qs, cs, sims = split
        c_ids = cs["vec_id"].to_numpy()
        q_ids = qs["vec_id"].to_numpy()
        out_q, out_n, out_s = [], [], []
        for i, qid in enumerate(q_ids):
            s = sims[i]
            valid = c_ids != qid
            order = np.lexsort((c_ids[valid], -s[valid]))[:k]
            out_q.extend([qid] * len(order))
            out_n.extend(c_ids[valid][order].tolist())
            out_s.extend(s[valid][order].tolist())
        return pd.DataFrame({"query_id": out_q, "neighbor_id": out_n,
                             "sim": out_s})

    idt = _id_type(both, "vec_id")
    group_cols = [group_col]
    if shard_rows is not None:
        both = _block_grid(both, group_col, shard_rows)
        group_cols = [group_col, "__cs", "__qs"]
    local = both.groupBy(*group_cols).applyInPandas(
        group_topk, schema=f"query_id {idt}, neighbor_id {idt}, sim double")
    merged = (local.groupBy("query_id", "neighbor_id")
              .agg(F.max("sim").alias("sim")))  # dedup multiprobe hits
    w = Window.partitionBy("query_id").orderBy(F.desc("sim"),
                                               F.asc("neighbor_id"))
    return (merged.withColumn("rank", F.row_number().over(w))
            .filter(F.col("rank") <= k)
            .select("query_id", "neighbor_id", "sim", "rank"))


def fit_ivf_centroids(df: DataFrame, n_centroids: int = 16, seed: int = 42,
                      max_iter: int = 10,
                      vec_col: str = "embedding") -> list[list[float]]:
    """Train the IVF coarse quantizer (distributed MLlib KMeans) and
    return the centroid matrix as plain lists — the only driver-side
    artifact (n_centroids × dim floats). Fit ONCE per corpus and reuse
    across queries: at scale the quantizer is a stored model, not a
    per-query job."""
    from pyspark.ml.clustering import KMeans
    from pyspark.ml.functions import array_to_vector

    # null embeddings excluded here too (finding of the round-7
    # self-review: array_to_vector NPEs on a null array, so one bad
    # row killed the MLlib fit while every other entry point
    # filtered); non-finite/ragged corpora fail by the _finite_vec
    # name instead of an opaque MLlib/Arrow error (or silently fitting
    # NaN centroids) — round-10 self-review
    feat = (df.filter(F.col(vec_col).isNotNull())
            .select(_finite_vec(F.col(vec_col).cast("array<double>"),
                                "fit_ivf_centroids",
                                dim=_infer_dim(df, vec_col))
                    .alias("vec"))
            .withColumn("__fv", array_to_vector("vec")).cache())
    model = KMeans(k=n_centroids, seed=seed, maxIter=max_iter,
                   initMode="random", featuresCol="__fv").fit(feat)
    feat.unpersist()
    return [[float(x) for x in c] for c in model.clusterCenters()]


def ivf_topk(df: DataFrame, k: int, n_centroids: int = 16,
             n_probes: int = 3, seed: int = 42, max_iter: int = 10,
             id_col: str = "vec_id", vec_col: str = "embedding",
             centroids: list[list[float]] | None = None,
             shard_rows: int = 16384,
             storage: str = "cache",
             artifact_table: str | None = None,
             persisted_out: list | None = None,
             check_unique_ids: bool = True) -> DataFrame:
    """IVF ANN with a TRAINED coarse quantizer (vs lsh_topk's
    data-oblivious hyperplanes): distributed k-means learns
    ``n_centroids`` cells, the corpus becomes inverted lists (one cell
    per vector), and each query probes its ``n_probes`` nearest cells
    with an exact GEMM re-rank inside. Recall tracks how well cells
    capture the data distribution — better than random hyperplanes on
    clustered embeddings at the same candidate budget.

    Scale: training is pyspark.ml KMeans (distributed Lloyd) via
    :func:`fit_ivf_centroids` — pass ``centroids`` to reuse a fitted
    quantizer instead of re-fitting per query (the production shape).
    The centroid matrix (n_centroids × dim) is the only driver artifact
    and re-enters the plan as literal arrays, so BOTH cell assignment
    and probe selection are pure JVM expressions (array of (dist, cell)
    structs → array_sort → slice). Candidate generation is an equi-join
    on cell id; per-cell work is one GEMM. n_probes trades recall for
    candidate count."""
    if centroids is None:
        centroids = fit_ivf_centroids(df, n_centroids, seed, max_iter,
                                      vec_col)

    emb = _nn_vectors(df, id_col, vec_col, entry="ivf_topk",
                      dim=len(centroids[0]))
    dist_structs = []
    for i, c in enumerate(centroids):
        row = F.lit([float(x) for x in c])
        d2 = F.aggregate(F.zip_with("vec", row, lambda x, y: (x - y) * (x - y)),
                         F.lit(0.0), lambda acc, z: acc + z)
        dist_structs.append(F.struct(d2.alias("d"), F.lit(i).alias("cell")))
    cells_by_dist = F.array_sort(F.array(*dist_structs))
    # materialized because the interpreted n_centroids × dim distance
    # fold is read TWICE per action — once by the candidate explode,
    # once by the block grid's bucket-sizing aggregate — and
    # unmaterialized each reader re-evaluates it (measured 2-3×
    # slower). At 100 TB pass storage="table": the assignment is
    # written once to the warehouse and read from disk by both
    # branches, independent of executor cache residency; drop it with
    # drop_artifact_table when the run ends.
    assigned = _materialize_artifact(
        emb.withColumn("__cbd", cells_by_dist),
        storage, artifact_table, persisted_out)
    if check_unique_ids:
        _assert_unique_ids(assigned, "ivf_topk")
    # nearest cell (= the member cell) is probes[0] — _explode_roles'
    # first-element contract; __cbd referenced exactly once
    probes = F.transform(F.slice("__cbd", 1, n_probes),
                         lambda s: s["cell"])
    both = _explode_roles(assigned, probes, "cell")
    return _grouped_candidate_topk(both, "cell", k,
                                   shard_rows=shard_rows)


IVF_QUANT_SCALE = 1_000_000


def _ivf_quantize_expr(vec_col: str,
                       dim: int | None = None) -> Column:
    """floor(x * 1e6) as array<long> — the integer-lattice projection
    that makes Lloyd's algorithm bit-exact across engines (integer
    sums are associative; double sums are not). The _finite_vec guard
    rides here so the quantized FIT fails by name on a NaN corpus
    instead of an opaque ARITHMETIC_OVERFLOW three expressions later
    (or a silent Long-clamp under non-ANSI)."""
    return F.transform(
        _finite_vec(F.col(vec_col).cast("array<double>"),
                    "ivf quantizer", dim=dim),
        lambda x: F.floor(x * F.lit(float(IVF_QUANT_SCALE))).cast("long"))


def _ivf_cells_by_dist(cents: list[list[int]], qv_col: str = "qv") -> Column:
    """array of (squared-L2-distance, cell) structs sorted asc — all
    integer arithmetic over the quantized vector against literal
    centroids, so argmin and probe order are deterministic (ties break
    to the smaller cell id via struct comparison)."""
    structs = []
    for j, c in enumerate(cents):
        row = F.lit([int(x) for x in c])
        d2 = F.aggregate(
            F.zip_with(qv_col, row, lambda x, y: (x - y) * (x - y)),
            F.lit(0).cast("long"), lambda acc, z: acc + z)
        structs.append(F.struct(d2.alias("d"),
                                F.lit(j).cast("int").alias("cell")))
    return F.array_sort(F.array(*structs))


def fit_ivf_centroids_quantized(df: DataFrame, n_centroids: int = 16,
                                n_iter: int = 3, id_col: str = "vec_id",
                                vec_col: str = "embedding",
                                dim: int | None = None) -> list[list[int]]:
    """Deterministic distributed Lloyd on integer-quantized vectors.

    Unlike :func:`fit_ivf_centroids` (MLlib KMeans — the production
    fit when exact reproducibility across engines is not needed), this
    quantizer is cross-engine replayable: vectors land on an integer
    lattice (floor(x*1e6)), initial centroids are the ``n_centroids``
    smallest ids, and each Lloyd step is (integer argmin assignment,
    exact integer per-dim sums, floor-mean). Integer sums are
    order-independent, so Spark's partial aggregation and any SQL
    engine produce identical centroids — see ANN_IVF_TOPK_SQL, which
    re-derives them via unrolled CTEs.

    Scale shape: each iteration is ONE distributed aggregation
    (groupBy(cell) with dim+1 exact integer sums); the only driver
    artifact is the n_centroids × dim centroid matrix.
    """
    if dim is None:
        dim = _infer_dim(df, vec_col)
    # null embeddings excluded (same contract as every search entry
    # point) — a null row among the n_centroids smallest ids would
    # otherwise seed a null centroid and crash the fit
    q = (df.filter(F.col(vec_col).isNotNull())
         .select(F.col(id_col).alias("vec_id"),
                 _ivf_quantize_expr(vec_col, dim=dim).alias("qv"))
         .cache())
    init = q.orderBy("vec_id").limit(n_centroids).collect()
    cents = [[int(x) for x in r["qv"]] for r in init]
    if len(cents) < n_centroids:
        # fail loudly: silently clamping would desync the SQL oracle's
        # unrolled n_centroids CTEs from the fitted quantizer
        raise ValueError(
            f"fit_ivf_centroids_quantized: corpus has only "
            f"{len(cents)} row(s) but n_centroids={n_centroids}; "
            f"lower n_centroids to at most the corpus size")
    for _ in range(n_iter):
        cell = _ivf_cells_by_dist(cents)[0]["cell"]
        stats = (q.withColumn("cell", cell)
                 .groupBy("cell")
                 .agg(F.count(F.lit(1)).alias("n"),
                      *[F.sum(F.col("qv")[i]).alias(f"s{i}")
                        for i in range(dim)])
                 .collect())
        # floor(sum/n) in DOUBLE division — sums stay < 2^53 (1e6-scale
        # values), so the division is exact-operand IEEE and matches
        # the oracle's floor(CAST(sum AS DOUBLE) / n) bit-for-bit
        new = {r["cell"]: [math.floor(r[f"s{i}"] / r["n"])
                           for i in range(dim)] for r in stats}
        cents = [new.get(j, cents[j]) for j in range(n_centroids)]
    q.unpersist()
    return cents


def ivf_topk_deterministic(df: DataFrame, k: int, n_centroids: int = 16,
                           n_probes: int = 3, n_iter: int = 3,
                           id_col: str = "vec_id",
                           vec_col: str = "embedding",
                           round_to: int = 4,
                           centroids: list[list[int]] | None = None,
                           shard_rows: int = 16384,
                           storage: str = "cache",
                           artifact_table: str | None = None,
                           persisted_out: list | None = None,
                           check_unique_ids: bool = True) -> DataFrame:
    """IVF ANN over the quantized-Lloyd coarse quantizer — identical
    candidate generation to :func:`ivf_topk` (probe ``n_probes``
    nearest cells, exact GEMM re-rank inside), but every stage up to
    the final cosine is integer arithmetic, so a SQL oracle can replay
    assignment, probe selection, and the candidate set exactly.
    Similarities are rounded to ``round_to`` decimals BEFORE ranking
    (both engines) to pin tie-breaks."""
    if centroids is None:
        centroids = fit_ivf_centroids_quantized(
            df, n_centroids, n_iter, id_col, vec_col)
    gv = _finite_vec(F.col(vec_col).cast("array<double>"),
                     "ivf_topk_deterministic", dim=len(centroids[0]))
    emb = (df.filter(F.col(vec_col).isNotNull())  # nulls match nothing
           .select(F.col(id_col).alias("vec_id"), gv.alias("vec"),
                   F.transform(gv, lambda x: F.floor(
                       x * F.lit(float(IVF_QUANT_SCALE))).cast("long"))
                   .alias("qv")))
    cbd = _ivf_cells_by_dist(centroids)
    # materialized: the explode branch and the block grid's sizing
    # aggregate both read the interpreted distance fold (see
    # ivf_topk's lifecycle note; storage="table" for multi-query /
    # 100 TB runs, persisted_out for explicit cache release)
    emb = _materialize_artifact(
        emb.withColumn("__cbd", cbd).drop("qv"),
        storage, artifact_table, persisted_out)
    if check_unique_ids:
        _assert_unique_ids(emb, "ivf_topk_deterministic")
    probes = F.transform(F.slice("__cbd", 1, n_probes), lambda s: s["cell"])
    both = _explode_roles(emb, probes, "cell")  # member cell = probes[0]
    return _grouped_candidate_topk(both, "cell", k,
                                   round_to=round_to,
                                   shard_rows=shard_rows)


def quantize_embeddings(df: DataFrame, id_col: str = "vec_id",
                        vec_col: str = "embedding",
                        round_to: int = 4,
                        method: str = "arrow") -> DataFrame:
    """Symmetric int8 quantization per vector: scale = max|x|/127,
    q_i = round(x_i / scale) ∈ [-127, 127] — the 4× storage cut that
    makes a 100 TB embedding table a 25 TB one. No shuffle either way;
    returns (id, scale, max_abs_err, mean_abs_err) so callers can gate
    on reconstruction error before swapping the quantized column in.

    ``method="arrow"`` (default) does the per-element math in an
    Arrow-batched pandas_udf — measured 7× faster than the pure-JVM
    variant at sf0.1 (0.26 s vs 1.8 s) because Spark evaluates
    higher-order array lambdas interpreted, not codegen.
    ``method="expr"`` keeps the all-expression plan (zero Python) for
    callers who need the op to fuse into a larger codegen stage.

    The two methods are bit-identical to each other: the arrow path
    replicates ``F.round``'s JVM rule (HALF_UP on the SHORTEST-decimal
    repr, BigDecimal.valueOf) — vectorized binary rounding with an
    exact Decimal fixup for the rare elements within 1e-9 of a .5
    boundary, where binary +0.5 and shortest-repr rounding disagree
    (e.g. 0.49999999999999994 → 0, not 1). SQL oracles (DuckDB
    ``round`` = binary-value HALF_UP) agree everywhere EXCEPT exactly
    those boundary doubles, which real-valued embeddings don't
    produce.
    """
    if method == "expr":
        v = _finite_vec(F.col(vec_col).cast("array<double>"),
                        "quantize_embeddings")
        max_abs = F.aggregate(v, F.lit(0.0),
                              lambda acc, x: F.greatest(acc, F.abs(x)))
        scale = max_abs / F.lit(127.0)
        # zero vector → scale 0; divide by 1 instead so q=0/err=0
        # rather than a null-poisoned row (engines disagree on 0/0)
        safe = F.when(scale == 0, F.lit(1.0)).otherwise(scale)
        q = F.transform(v, lambda x: F.round(x / safe).cast("int"))
        err = F.zip_with(v, q, lambda x, qi: F.abs(x - qi * scale))
        n = F.size(v)
        return df.select(
            F.col(id_col),
            F.round(scale, 6).alias("scale"),
            F.round(F.aggregate(err, F.lit(0.0),
                                lambda acc, e: F.greatest(acc, e)),
                    round_to).alias("max_abs_err"),
            # try_divide: empty vector → NULL mean (a plain divide is a
            # DIVIDE_BY_ZERO error under ANSI mode), matching the arrow
            # path's pinned null/empty contract
            F.round(F.try_divide(
                F.aggregate(err, F.lit(0.0), lambda acc, e: acc + e), n),
                round_to).alias("mean_abs_err"))
    if method != "arrow":
        raise ValueError(f"unknown method: {method!r}")

    @F.pandas_udf("struct<scale:double,max_abs_err:double,"
                  "mean_abs_err:double>")
    def qstats(vs: pd.Series) -> pd.DataFrame:
        out = []
        for vec in vs:
            # null/empty contract pinned to the expr path's outputs
            # (test-asserted): null vector → all-null row; empty vector
            # → scale 0, max 0, mean null (0/0 is NULL in Spark SQL)
            if vec is None:
                out.append((None, None, None))
                continue
            x = np.asarray(vec, dtype=np.float64)
            if x.size == 0:
                out.append((0.0, 0.0, None))
                continue
            s = float(np.abs(x).max()) / 127.0
            safe = s if s > 0 else 1.0
            # half-away-from-zero to match F.round / SQL round()
            # (np.round is half-even)
            r = x / safe
            q = np.trunc(r + np.copysign(0.5, x))
            # F.round rounds the SHORTEST-decimal repr (BigDecimal.
            # valueOf), not the binary value: 0.49999999999999994 + 0.5
            # is 1.0 in binary but reads "0.4999..." decimal → 0.
            # Vectorized binary rounding above, exact Decimal fixup for
            # the (measure-zero) elements near a .5 boundary.
            sus = np.abs(np.abs(r - np.trunc(r)) - 0.5) < 1e-9
            if sus.any():
                from decimal import ROUND_HALF_UP, Decimal
                for bi in np.nonzero(sus)[0]:
                    q[bi] = float(Decimal(repr(float(r[bi]))).quantize(
                        Decimal(1), rounding=ROUND_HALF_UP))
            err = np.abs(x - q * s)
            # sequential sum matches the expr path / SQL list_reduce
            out.append((s, float(err.max(initial=0.0)),
                        float(sum(err.tolist())) / x.size))
        return pd.DataFrame(out, columns=["scale", "max_abs_err",
                                          "mean_abs_err"])

    return (df.select(F.col(id_col),
                      qstats(_finite_vec(
                          F.col(vec_col).cast("array<double>"),
                          "quantize_embeddings"))
                      .alias("__q"))
            .select(id_col,
                    F.round(F.col("__q.scale"), 6).alias("scale"),
                    F.round(F.col("__q.max_abs_err"), round_to)
                    .alias("max_abs_err"),
                    F.round(F.col("__q.mean_abs_err"), round_to)
                    .alias("mean_abs_err")))
