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
# Round 12 executes the FRESHNESS rotation pinned in round 11 (with
# 135/135 cumulative coverage, re-check whatever has gone longest
# without driver contact): entries 1-35 are the thirty-five remaining
# rows whose last contact was the round-9 window, entries 36-50
# fifteen round-10 core re-checks covering the heavy/flagship
# families — including BOTH rows-only rotations (local_lr_model,
# approx_user_stats) and the two bench-suspect names (token_counts,
# theta_user_rollup) so their driver evidence renews alongside the
# quiet-box A/B adjudication. After this window no query's last
# driver contact is older than round 10.
DRIVER_WINDOW = [
    "language_id", "sequence_packing", "embedding_near_dups",
    "pricing_summary", "tpch_q6_forecast", "moving_avg_7d",
    "event_sessions", "hourly_gapfill", "source_temperature_mix",
    "pii_redaction", "embedding_norms", "score_thresholds",
    "doc_repetition", "top_orders_per_customer", "user_value_deltas",
    "acctbal_deciles", "above_class_avg", "tpch_q4_late_priority",
    "tpch_q10_returned_items", "tpch_q11_important_parts",
    "tpch_q12_priority_counts", "tpch_q14_promo",
    "tpch_q15_top_supplier", "tpch_q16_parts_suppliers",
    "tpch_q19_discounted", "tpch_q22_idle_rich",
    "cheapest_order_per_customer", "doc_sentences",
    "stratified_sample_events", "value_statistics",
    "corpus_dedup_stats", "length_batches", "lineitem_measure_stats",
    "hilbert_event_keys", "quality_top_fraction",
    "join_revenue_by_nation", "window_cumsum", "rollup_revenue",
    "cube_order_stats", "price_percentiles", "priority_pivot",
    "gather_flat", "gather_count", "token_counts", "local_lr_model",
    "approx_user_stats", "roc_curve", "ngram_jaccard",
    "theta_user_rollup", "cosine_topk",
]

# The two deliberately rows-only window rows — everything else in the
# window must carry a DuckDB oracle.
WINDOW_ROWS_ONLY = {"local_lr_model", "approx_user_stats"}


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
