"""Streaming operator builders (see package docstring)."""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from spark_ext_spark.llm.dedup import normalize_text
from spark_ext_spark.llm.text import tokens


def streaming_event_counts(events: DataFrame, ts_col: str = "ts",
                           key_col: str = "event_type",
                           value_col: str = "value",
                           window: str = "10 minutes",
                           slide: str | None = None,
                           watermark: str = "20 minutes") -> DataFrame:
    """Watermarked (sliding) window rollup: count + sum per key per
    window. Late rows beyond the watermark are dropped; state is
    bounded by (windows in watermark horizon × keys)."""
    win = (F.window(ts_col, window, slide) if slide
           else F.window(ts_col, window))
    return (events
            .withWatermark(ts_col, watermark)
            .groupBy(win.alias("win"), F.col(key_col))
            .agg(F.count(F.lit(1)).alias("n_events"),
                 F.sum(value_col).alias("total_value"))
            .select(F.col("win.start").alias("window_start"),
                    F.col("win.end").alias("window_end"),
                    key_col, "n_events", "total_value"))


def streaming_gather(events: DataFrame, ts_col: str = "ts",
                     pk_col: str = "user_id", key_col: str = "event_type",
                     value_col: str = "value", window: str = "10 minutes",
                     watermark: str = "20 minutes") -> DataFrame:
    """Stream-native Gather: per (window, pk) the gathered
    array<struct<key,value>> — batch Gather's two groupBys fuse into
    one windowed aggregation (collect over pre-summed pairs via
    map_from_entries of a pivot-free map aggregate).

    Uses sum-by-key inside the aggregate (map_concat pattern is not
    associative-safe in agg), so: first level (window, pk, key) sums,
    second level collects — same shape as batch, both watermarked."""
    win = F.window(ts_col, window)
    level1 = (events
              .withWatermark(ts_col, watermark)
              .groupBy(win.alias("win"), F.col(pk_col), F.col(key_col))
              .agg(F.sum(value_col).cast("double").alias("__v")))
    # Second aggregation over the append-mode output of the first is
    # supported in Spark 4 (multiple stateful operators) as long as the
    # window column is carried through.
    struct_col = F.struct(F.col(key_col).alias(key_col),
                          F.col("__v").alias(value_col))
    return (level1
            .groupBy("win", pk_col)
            .agg(F.collect_list(struct_col).alias("gathered"))
            .select(F.col("win.start").alias("window_start"),
                    pk_col, "gathered"))


def streaming_dedup_exact(docs: DataFrame, ts_col: str, id_col: str,
                          text_col: str,
                          watermark: str = "1 hour") -> DataFrame:
    """Exact streaming dedup: keep the first document per normalized-
    text digest within the watermark horizon; state size is bounded by
    the horizon (dropDuplicatesWithinWatermark)."""
    digested = (docs
                .withColumn("digest", F.sha2(normalize_text(text_col), 256))
                .withWatermark(ts_col, watermark))
    return digested.dropDuplicatesWithinWatermark(["digest"])


def streaming_distinct_estimate(events: DataFrame, ts_col: str = "ts",
                                key_col: str = "user_id",
                                window: str = "10 minutes",
                                watermark: str = "20 minutes",
                                p: float = 0.25,
                                salt: str = "") -> DataFrame:
    """Approximate distinct-count per event-time window with bounded,
    tunable state — the streaming twin of the fixed-theta sketch
    (operators/sketches.theta_distinct, same md5-60 hash space, same
    estimate math).

    Streaming aggregation supports neither ``count(DISTINCT)`` nor
    sketch aggregates, and the exact alternative (dropDuplicates on
    the raw key) holds one state row per distinct key. Keeping only
    keys that hash below p·2^60 — a deterministic p-fraction sample
    of the KEY space, so duplicate arrivals can never bias it — cuts
    dedup state to p·D rows and makes the estimate ``n_kept / p``.
    Deterministic: micro-batch boundaries, retries, and replays
    cannot change which keys are kept, unlike arrival-order-fed
    sketches. Two chained stateful operators (dedup → windowed agg),
    legal in Spark 4 append mode; state for closed windows is evicted
    by the watermark.

    A window whose keys all hash above theta still emits a row
    (n_kept=0, distinct_est=0.0) — unsampled must stay
    distinguishable from no-traffic. Rows above the threshold map to
    a single sentinel hash (-1) before the dedup, which keeps such
    windows alive at a cost of at most ONE state row per window."""
    from spark_ext_spark.llm.splits import hash60
    from spark_ext_spark.operators.sketches import (theta_estimate,
                                                    theta_threshold)
    theta = theta_threshold(p)
    h = hash60(key_col, salt)
    kept = (events
            .withWatermark(ts_col, watermark)
            .where(F.col(key_col).isNotNull())
            .select(F.window(ts_col, window).alias("win"),
                    F.when(h < theta, h).otherwise(F.lit(-1))
                    .alias("__h"))
            .dropDuplicates(["win", "__h"]))
    n = F.count(F.when(F.col("__h") >= 0, F.lit(1)))
    return (kept.groupBy("win")
            .agg(n.alias("n_kept"),
                 theta_estimate(n, p).alias("distinct_est"))
            .select(F.col("win.start").alias("window_start"),
                    "n_kept", "distinct_est"))


def streaming_enrich(events: DataFrame, dim: DataFrame,
                     on: str, how: str = "left") -> DataFrame:
    """Stream-static join: enrich a stream against a batch dimension
    table. The static side re-plans per micro-batch (so a dimension
    refresh is picked up) and broadcasts under the auto-broadcast
    threshold — no streaming state at all, unlike stream-stream joins.
    At 100 TB-of-stream this is THE pattern for dictionary/dimension
    enrichment; only stream-stream correlation needs watermarked state."""
    return events.join(F.broadcast(dim), on, how)


def streaming_text_quality(docs: DataFrame, id_col: str,
                           text_col: str) -> DataFrame:
    """Stateless per-row text stats — identical expressions to the
    batch path, legal on any stream with no watermark needed."""
    c = F.col(text_col)
    toks = tokens(text_col)
    nz = F.greatest(F.length(c), F.lit(1))
    return docs.select(
        F.col(id_col),
        F.length(c).alias("n_chars"),
        F.size(toks).alias("n_tokens"),
        F.round(F.size(F.array_distinct(toks))
                / F.greatest(F.size(toks), F.lit(1)).cast("double"), 4)
         .alias("distinct_ratio"),
        F.round(F.length(F.regexp_replace(c, r"[^0-9]", "")) / nz, 4)
         .alias("digit_ratio"))


def foreach_batch_upsert(key_cols: list[str], order_col: str, path: str):
    """Build a foreachBatch sink that upserts each micro-batch into a
    parquet key-value store: union existing + batch, keep the latest
    row per key (greatest ``order_col``, batch wins ties). The classic
    streaming→serving merge when no ACID table format is available —
    the whole store rewrites per batch, so at scale prefer partitioning
    the store and rewriting only partitions the batch touches (or a
    format with MERGE support); the per-key window logic is identical.

    Returns a function suitable for ``.writeStream.foreachBatch(...)``.
    """
    from pyspark.sql import functions as F
    from pyspark.sql.window import Window

    def upsert(batch: DataFrame, batch_id: int) -> None:
        spark = batch.sparkSession
        new = batch.withColumn("__src", F.lit(1))
        # Only a genuinely ABSENT store may fall back to batch-only —
        # checked explicitly, not with a bare except around the read: a
        # transient read failure or a schema mismatch in the union must
        # fail the batch (the stream retries it) rather than silently
        # overwriting the whole store with this one micro-batch.
        sc = spark.sparkContext
        jpath = sc._jvm.org.apache.hadoop.fs.Path(path)
        fs = jpath.getFileSystem(sc._jsc.hadoopConfiguration())
        if fs.exists(jpath):
            try:
                cur = spark.read.parquet(path).withColumn("__src",
                                                          F.lit(0))
            except Exception as e:
                # an existing-but-unreadable store (half-written
                # overwrite, pre-created empty dir) must surface as an
                # actionable error — NOT fall back to batch-only,
                # which would replace the whole store with one
                # micro-batch of data
                raise RuntimeError(
                    f"upsert store at {path} exists but is not "
                    f"readable parquet ({type(e).__name__}); restore "
                    f"or delete it before resuming the stream") from e
            merged = cur.unionByName(new)
        else:
            merged = new
        w = Window.partitionBy(*key_cols).orderBy(
            F.desc(order_col), F.desc("__src"))
        latest = (merged.withColumn("__rn", F.row_number().over(w))
                  .filter(F.col("__rn") == 1).drop("__rn", "__src"))
        # rewrite must not lazily read the path it overwrites
        latest.localCheckpoint().write.mode("overwrite").parquet(path)

    return upsert


def streaming_interval_join(left: DataFrame, right: DataFrame, on: str,
                            left_ts: str, right_ts: str,
                            upper: str = "10 minutes",
                            watermark: str = "30 minutes",
                            how: str = "inner") -> DataFrame:
    """Stream-STREAM interval join: right-side rows match a left row
    with the same key whose timestamp falls in [left_ts, left_ts +
    upper]. Unlike stream-static enrichment this buffers BOTH sides in
    state; the watermarks plus the time-bound condition are what let
    Spark evict — without the interval bound the state would grow
    forever, so the bound is mandatory, not a tuning choice. State per
    key ≈ rows inside (watermark + upper) horizon.

    Column names must be disjoint apart from ``on`` (both sides are
    aliased; the join key is exposed once)."""
    l = left.withWatermark(left_ts, watermark).alias("l")
    r = right.withWatermark(right_ts, watermark).alias("r")
    cond = ((F.col(f"l.{on}") == F.col(f"r.{on}"))
            & (F.col(f"r.{right_ts}") >= F.col(f"l.{left_ts}"))
            & (F.col(f"r.{right_ts}")
               <= F.col(f"l.{left_ts}") + F.expr(f"INTERVAL {upper}")))
    return l.join(r, cond, how).drop(F.col(f"r.{on}"))
