"""Physical-plan regression tests: lock in the scale properties that
SCALE.md claims (predicate pushdown, column pruning, broadcast joins,
TakeOrderedAndProject top-k). A refactor that silently loses one of
these would still be *correct* — these tests make it *fail*."""

from __future__ import annotations

import contextlib
import io

import pytest

from spark_ext_spark.plans import gather_queries as gq
from spark_ext_spark.plans import relational as rel


def plan_of(df) -> str:
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def test_pricing_summary_pushdown_and_pruning(spark, sf_small):
    p = plan_of(rel.pricing_summary(spark, sf_small))
    assert "PushedFilters: [IsNotNull(l_shipdate), LessThanOrEqual(l_shipdate" in p
    read = next(l for l in p.splitlines() if "ReadSchema" in l)
    # only the 5 needed columns reach the scan, not all 11
    assert "l_orderkey" not in read and "l_partkey" not in read
    assert "l_quantity" in read and "l_returnflag" in read


def test_dimension_joins_broadcast(spark, sf_small):
    p = plan_of(rel.revenue_by_nation(spark, sf_small))
    assert "BroadcastHashJoin" in p
    assert "SortMergeJoin" not in p


def test_topk_avoids_global_sort(spark, sf_small):
    p = plan_of(rel.top_users_by_value(spark, sf_small))
    assert "TakeOrderedAndProject" in p
    assert "GlobalSort" not in p


def test_gather_prunes_scan(spark, sf_small):
    p = plan_of(gq.gather_user_events(spark, sf_small))
    read = next(l for l in p.splitlines() if "ReadSchema" in l)
    assert "props" not in read and "event_id" not in read
    # two-level aggregation: partial + final pairs at both levels
    assert p.count("HashAggregate") >= 4


def test_indexer_transform_is_broadcast_join(spark, sf_small):
    from spark_ext_spark.plans.feature_queries import string_indexer
    p = plan_of(string_indexer(spark, sf_small))
    assert "BroadcastHashJoin" in p


def test_window_partitioned_by_user(spark, sf_small):
    p = plan_of(rel.cumulative_user_value(spark, sf_small))
    # the window's required distribution is hash on user_id — never a
    # single-partition global sort
    assert "hashpartitioning(user_id" in p.replace(" ", "").lower() or \
        "hashpartitioning" in p


def test_q6_scan_only_filter_agg(spark, sf_small):
    from spark_ext_spark.plans import tpch
    p = plan_of(tpch.forecast_revenue_change(spark, sf_small))
    read = next(l for l in p.splitlines() if "ReadSchema" in l)
    # 4-column projection reaches the scan; no join, one agg exchange
    assert "l_orderkey" not in read and "l_returnflag" not in read
    assert "PushedFilters" in p and "GreaterThanOrEqual(l_shipdate" in p
    assert "Join" not in p


def test_q5_all_joins_broadcast_no_smj(spark, sf_small):
    from spark_ext_spark.plans import tpch
    p = plan_of(tpch.local_supplier_volume(spark, sf_small))
    # formatted explain prints each node in the tree AND detail section
    assert p.count("BroadcastHashJoin") >= 5
    assert "SortMergeJoin" not in p and "CartesianProduct" not in p


def test_pivot_single_shuffle(spark, sf_small):
    p = plan_of(rel.priority_pivot(spark, sf_small))
    # explicit value list: no extra distinct-values job. Spark pivots
    # in two phases — pre-agg on (status, priority), then pivotfirst on
    # status — i.e. exactly 2 shuffles (each node appears twice in
    # formatted output: tree + detail).
    assert p.count("Exchange (") <= 2


def test_salted_totals_two_aggregation_levels(spark, sf_small):
    p = plan_of(rel.salted_user_totals(spark, sf_small))
    # phase-1 (key, salt) agg + phase-2 key agg, each partial+final
    assert p.count("HashAggregate") >= 4


def test_approx_sketches_within_error_bounds(spark, sf_small):
    from pyspark.sql import functions as F
    got = {r["event_type"]: r for r in
           rel.approx_user_stats(spark, sf_small).collect()}
    ev = rel.load(spark, sf_small, "events")
    exact = {r["event_type"]: r["n"] for r in
             (ev.groupBy("event_type")
              .agg(F.countDistinct("user_id").alias("n"))).collect()}
    assert set(got) == set(exact)
    for et, n in exact.items():
        # HLL++ at rsd=1%: allow 5% on these small groups
        assert abs(got[et]["approx_users"] - n) <= max(3, 0.05 * n)
        # GK guarantee is on RANK, not value: the fraction of the
        # group's values <= the approx answer must be within eps of q
        # (exact interpolated percentiles are a different estimator and
        # can sit far away in value on heavy tails)
        vals = sorted(r["value"] for r in
                      ev.filter(F.col("event_type") == et)
                      .select("value").collect())
        for q, col in ((0.5, "value_q50"), (0.95, "value_q95"),
                       (0.99, "value_q99")):
            a = got[et][col]
            rank = sum(v <= a for v in vals) / len(vals)
            assert abs(rank - q) <= 0.01 + 1.0 / len(vals), (et, q, a, rank)


def test_doc_chunks_and_repetition_no_shuffle(spark, sf_small):
    from spark_ext_spark.plans import llm_queries as lq
    for fn in (lq.doc_chunks, lq.doc_repetition):
        p = plan_of(fn(spark, sf_small))
        assert "Exchange" not in p, fn.__name__


def test_benchmark_contamination_broadcasts(spark, sf_small):
    from spark_ext_spark.plans import llm_queries as lq
    p = plan_of(lq.benchmark_contamination(spark, sf_small))
    assert "BroadcastHashJoin" in p


def test_moving_avg_single_user_exchange(spark, sf_small):
    p = plan_of(rel.moving_avg_7d(spark, sf_small))
    # one hash exchange on user_id feeds the RANGE window
    assert "hashpartitioning(user_id" in p.replace(" ", "") or \
        "hashpartitioning" in p
    assert "rangepartitioning" not in p  # no global sort


def test_no_query_plans_cartesian(spark, sf_small):
    """Fleet-wide plan audit: no query may plan a CartesianProduct,
    and BroadcastNestedLoopJoin may appear only where it's a 1-row
    scalar-aggregate attach (curve totals, global averages, corpus
    size) — there it costs one comparison per row and is the intended
    plan. Planning only; fit-bearing queries do run their small fit
    jobs at sf0.001."""
    import __spark_entry__ as entrymod
    scalar_attach_ok = {"gains_curve", "roc_curve", "roc_curve_binned",
                        "lift_curve", "precision_by_threshold",
                        "recall_by_threshold", "f_measure",
                        "tpch_q22_idle_rich", "tfidf_top_terms",
                        "doc_lm_scores",
                        # 1-row bounds/normalizer attaches: the hourly
                        # grid (min/max × type table), the mixing-rate
                        # normalizer, the Q15 max-revenue scalar, and
                        # the encoder coverage total
                        "hourly_gapfill", "hourly_interpolate",
                        "source_temperature_mix", "tpch_q15_top_supplier",
                        "tpch_q11_important_parts", "mixture_report",
                        "gather_encoder_top", "gather_encoder_top_allother",
                        "gather_encoder_index", "gather_encoder_distfit",
                        # 1-row fitted-beta attach per Newton iteration
                        "lr_newton_steps",
                        # 1-row sketch-estimate × 1-row base-stats attach
                        "theta_user_rollup",
                        # 1-row exact-distinct aggregates crossed into
                        # the 1-row profile frame (r12: replaces Expand)
                        "table_profile"}
    offenders = {}
    for name, fn in entrymod.queries().items():
        p = plan_of(fn(spark, sf_small))
        if "CartesianProduct" in p:
            offenders[name] = "CartesianProduct"
        elif "BroadcastNestedLoopJoin" in p and name not in scalar_attach_ok:
            offenders[name] = "BroadcastNestedLoopJoin"
    assert not offenders, offenders


def test_hll_sketch_rollup_merge_lossless(spark, sf_small):
    """Union of per-day sketches must estimate exactly what one global
    sketch estimates (merge is lossless at equal lgk), and both must
    sit within HLL error of the exact distinct count."""
    from pyspark.sql import functions as F
    ev = rel.load(spark, sf_small, "events")
    merged = rel.sketch_user_rollup(spark, sf_small).first()
    direct = ev.agg(F.hll_sketch_estimate(
        F.hll_sketch_agg("user_id")).alias("n")).first()["n"]
    exact = ev.select("user_id").distinct().count()
    assert merged["distinct_users_est"] == direct
    assert abs(direct - exact) <= max(3, 0.05 * exact)


def test_sequence_packing_distributed_prefix(spark, sf_small):
    """Packing must use range-partitioned two-phase prefix sums, never
    a single-task global window (the 100 TB cliff)."""
    from spark_ext_spark.plans import llm_queries as lq
    p = plan_of(lq.sequence_packing(spark, sf_small))
    assert "rangepartitioning" in p.replace(" ", "").lower()
    # every Window in the plan is partitioned (by __pid), not global
    assert "Window" in p


def test_train_test_split_single_scan_no_join(spark, sf_small):
    """Split assignment is one md5 expression fused into the scan —
    the only exchange is the final groupBy on the 3 split labels."""
    from spark_ext_spark.plans import llm_queries as lq
    p = plan_of(lq.train_test_split(spark, sf_small))
    assert "Join" not in p
    # exactly one scan (formatted explain prints each node twice:
    # tree + detail section), and it reads only the key column
    assert p.count("Scan parquet") == 2
    read = next(l for l in p.splitlines() if "ReadSchema" in l)
    assert "text" not in read and "doc_id" in read


def test_ann_block_grid_sizes_join_broadcasts(spark, sf_small):
    """The block-grid sub-sharding joins a one-row-per-bucket sizing
    table into every ANN plan — it must stay a broadcast join (a
    sort-merge there would shuffle the full vector table to attach two
    small ints)."""
    from spark_ext_spark.plans import llm_queries as lq
    p = plan_of(lq.ann_lsh_topk(spark, sf_small))
    assert "BroadcastHashJoin" in p
    assert "SortMergeJoin" not in p


def test_r9_tpch_straggler_pushdown_and_joins(spark, sf_small):
    """The round-9 first-contact TPC-H shapes (q4 q10 q12 q14 q15 q16
    q19 q22), plan-pinned: date/flag/balance predicates reach the
    parquet scan as PushedFilters, every dim join stays broadcast
    (sort-merge would shuffle the fact table to attach a dim), and the
    q10 LIMIT plans as TakeOrderedAndProject (per-partition top-k,
    never a global sort). q19's disjunctive three-alternative predicate
    must keep BOTH per-side pushdowns: the OR-of-ranges on l_quantity
    at the lineitem scan and on (p_brand, p_size) at the part scan —
    losing either turns a pruned scan into a full read at 100 TB."""
    from spark_ext_spark.plans import tpch
    cases = {
        "q4": (tpch.late_order_priority,
               ["GreaterThanOrEqual(o_orderdate,1996-07-01",
                "LessThan(o_orderdate,1996-10-01"]),
        "q10": (tpch.returned_item_customers,
                ["EqualTo(l_returnflag,R)",
                 "GreaterThanOrEqual(o_orderdate,1996-10-01"]),
        "q12": (tpch.linestatus_priority_counts,
                ["GreaterThanOrEqual(l_shipdate,1997-01-01"]),
        "q14": (tpch.promo_revenue_share,
                ["GreaterThanOrEqual(l_shipdate,1997-03-01"]),
        "q15": (tpch.top_supplier,
                ["GreaterThanOrEqual(l_shipdate,1996-01-01"]),
        "q16": (tpch.parts_supplier_counts,
                ["Not(EqualTo(p_brand,Brand#1))", "In(p_size",
                 "LessThan(s_acctbal,0.0)"]),
        "q19": (tpch.discounted_revenue,
                ["GreaterThanOrEqual(p_size,1)"]),
        "q22": (tpch.idle_rich_customers,
                ["EqualTo(o_orderpriority,1-URGENT)",
                 "GreaterThan(c_acctbal,0.0)"]),
    }
    failures = {}
    for name, (fn, pushed) in cases.items():
        p = plan_of(fn(spark, sf_small))
        probs = [f"missing pushdown {s!r}" for s in pushed if s not in p]
        if "SortMergeJoin" in p:
            probs.append("SortMergeJoin")
        if "CartesianProduct" in p:
            probs.append("CartesianProduct")
        if probs:
            failures[name] = probs
    assert not failures, failures
    p10 = plan_of(tpch.returned_item_customers(spark, sf_small))
    assert "TakeOrderedAndProject" in p10
    # q19's OR-of-ranges reaches BOTH scans (one Or(...l_quantity...)
    # line for lineitem, one Or(...p_brand...) line for part)
    p19 = plan_of(tpch.discounted_revenue(spark, sf_small))
    pushed_lines = [l for l in p19.splitlines() if "PushedFilters: [" in l]
    assert any("Or(" in l and "l_quantity" in l for l in pushed_lines), \
        pushed_lines
    assert any("Or(" in l and "p_brand" in l for l in pushed_lines), \
        pushed_lines
