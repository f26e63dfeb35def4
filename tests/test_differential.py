"""Property-based cross-engine differential testing: hypothesis draws
random small query shapes (filter → groupBy → aggregates over events),
we run each on Spark AND DuckDB and require identical results.

This complements the hand-written oracle pairs: those pin 92 specific
queries; this sweeps the combinatorial neighborhood around the core
relational surface (predicate × grouping × aggregate choices) where
engine-semantics mismatches (null handling, overflow, float folding)
would hide.
"""

from __future__ import annotations

import math

import duckdb
import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from spark_ext_spark.plans.relational import load

SF = "/root/testdata/sf0.001"

GROUP_COLS = ["event_type", "user_id"]
AGGS = {
    "n": (lambda: F.count(F.lit(1)), "count(*)"),
    "sum_v": (lambda: F.round(F.sum("value"), 4), "round(sum(value), 4)"),
    "min_v": (lambda: F.min("value"), "min(value)"),
    "max_v": (lambda: F.max("value"), "max(value)"),
    "n_users": (lambda: F.count_distinct(F.col("user_id")),
                "count(DISTINCT user_id)"),
}


@pytest.fixture(scope="module")
def duck():
    con = duckdb.connect()
    con.execute(f"CREATE VIEW events AS "
                f"SELECT * FROM read_parquet('{SF}/events.parquet')")
    return con


@pytest.fixture(scope="module")
def duck_tpch():
    con = duckdb.connect()
    for t in ("customer", "orders"):
        con.execute(f"CREATE VIEW {t} AS "
                    f"SELECT * FROM read_parquet('{SF}/{t}.parquet')")
    return con


query_shapes = st.tuples(
    st.lists(st.sampled_from(GROUP_COLS), unique=True, max_size=2),
    st.lists(st.sampled_from(sorted(AGGS)), unique=True, min_size=1,
             max_size=3),
    st.one_of(st.none(), st.floats(min_value=0.0, max_value=500.0,
                                   allow_nan=False)),
    st.sampled_from([None, "view", "click", "purchase"]),
)


def _norm(v):
    if isinstance(v, float):
        return round(v, 6)
    return v


@settings(max_examples=25, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(shape=query_shapes)
def test_random_agg_query_matches_duckdb(spark, duck, shape):
    group_cols, agg_names, value_min, etype = shape

    ev = load(spark, SF, "events")
    conds_sql = []
    if value_min is not None:
        ev = ev.filter(F.col("value") >= value_min)
        conds_sql.append(f"value >= {value_min!r}")
    if etype is not None:
        ev = ev.filter(F.col("event_type") == etype)
        conds_sql.append(f"event_type = '{etype}'")

    aggs = [AGGS[a][0]().alias(a) for a in agg_names]
    if group_cols:
        out = ev.groupBy(*group_cols).agg(*aggs)
    else:
        out = ev.agg(*aggs)
    cols = group_cols + agg_names
    spark_rows = sorted(
        (tuple(_norm(r[c]) for c in cols) for r in out.collect()), key=repr)

    select = ", ".join(group_cols
                       + [f"{AGGS[a][1]} AS {a}" for a in agg_names])
    sql = f"SELECT {select} FROM events"
    if conds_sql:
        sql += " WHERE " + " AND ".join(conds_sql)
    if group_cols:
        sql += " GROUP BY " + ", ".join(group_cols)
    res = duck.execute(sql)
    names = [d[0] for d in res.description]
    duck_rows = sorted(
        (tuple(_norm(dict(zip(names, r))[c]) for c in cols)
         for r in res.fetchall()), key=repr)

    assert spark_rows == duck_rows


join_shapes = st.tuples(
    st.sampled_from(["inner", "left"]),
    st.lists(st.sampled_from(["n_orders", "total_price", "max_price"]),
             unique=True, min_size=1, max_size=3),
    st.one_of(st.none(), st.sampled_from(["BUILDING", "MACHINERY",
                                          "AUTOMOBILE"])),
)


@settings(max_examples=15, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(shape=join_shapes)
def test_random_join_agg_matches_duckdb(spark, duck_tpch, shape):
    how, agg_names, segment = shape
    JAGGS = {
        "n_orders": (F.count("o_orderkey"), "count(o_orderkey)"),
        "total_price": (F.round(F.sum("o_totalprice"), 4),
                        "round(sum(o_totalprice), 4)"),
        "max_price": (F.max("o_totalprice"), "max(o_totalprice)"),
    }
    cust = load(spark, SF, "customer")
    orders = load(spark, SF, "orders")
    if segment is not None:
        cust = cust.filter(F.col("c_mktsegment") == segment)
    joined = cust.join(orders, cust.c_custkey == orders.o_custkey, how)
    out = joined.groupBy("c_custkey").agg(
        *[JAGGS[a][0].alias(a) for a in agg_names])
    cols = ["c_custkey"] + agg_names
    spark_rows = sorted(
        (tuple(_norm(r[c]) for c in cols) for r in out.collect()), key=repr)

    seg_sql = (f"WHERE c_mktsegment = '{segment}'" if segment else "")
    sql = f"""
    SELECT c_custkey, {", ".join(f"{JAGGS[a][1]} AS {a}" for a in agg_names)}
    FROM (SELECT * FROM customer {seg_sql}) c
    {"LEFT " if how == "left" else ""}JOIN orders ON c_custkey = o_custkey
    GROUP BY c_custkey
    """
    res = duck_tpch.execute(sql)
    names = [d[0] for d in res.description]
    duck_rows = sorted(
        (tuple(_norm(dict(zip(names, r))[c]) for c in cols)
         for r in res.fetchall()), key=repr)
    assert spark_rows == duck_rows


window_shapes = st.tuples(
    st.sampled_from(["user_id", "event_type"]),       # partition col
    st.sampled_from(["value", "ts", "event_id"]),     # order col
    st.sampled_from(["row_number", "rank", "cumsum", "lag",
                     "percent_rank", "cume_dist", "ntile"]),
)


@settings(max_examples=15, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(shape=window_shapes)
def test_random_window_matches_duckdb(spark, duck, shape):
    from pyspark.sql.window import Window
    part, order, fn = shape

    ev = load(spark, SF, "events")
    # total order: tie-break on event_id so both engines agree
    w = Window.partitionBy(part).orderBy(F.col(order).asc(),
                                         F.col("event_id").asc())
    if fn == "row_number":
        expr, sql_fn = F.row_number().over(w), "row_number() OVER w"
    elif fn == "rank":
        expr, sql_fn = F.rank().over(w), "rank() OVER w"
    elif fn == "cumsum":
        wf = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        expr = F.round(F.sum("value").over(wf), 4)
        sql_fn = ("round(sum(value) OVER (PARTITION BY {p} ORDER BY {o}, "
                  "event_id ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT "
                  "ROW), 4)")
    elif fn == "lag":
        expr = F.lag("value", 1).over(w)
        sql_fn = "lag(value, 1) OVER w"
    elif fn == "percent_rank":
        expr = F.round(F.percent_rank().over(w), 6)
        sql_fn = "round(percent_rank() OVER w, 6)"
    elif fn == "cume_dist":
        expr = F.round(F.cume_dist().over(w), 6)
        sql_fn = "round(cume_dist() OVER w, 6)"
    else:
        # deterministic: the window's ORDER BY is a total order
        expr = F.ntile(7).over(w)
        sql_fn = "ntile(7) OVER w"

    out = ev.select("event_id", expr.alias("m"))
    spark_rows = sorted(((r["event_id"], _norm(r["m"]))
                         for r in out.collect()), key=repr)

    sql_fn = sql_fn.format(p=part, o=order)
    sql = (f"SELECT event_id, {sql_fn} AS m FROM events "
           f"WINDOW w AS (PARTITION BY {part} ORDER BY {order}, event_id)")
    duck_rows = sorted(((eid, _norm(m))
                        for eid, m in duck.execute(sql).fetchall()), key=repr)
    assert spark_rows == duck_rows


frame_shapes = st.tuples(
    st.sampled_from(["user_id", "event_type"]),          # partition col
    st.sampled_from(["sum", "avg", "min", "max", "count"]),
    st.integers(min_value=0, max_value=5),               # preceding
    st.integers(min_value=0, max_value=5),               # following
    st.booleans(),                                       # unbounded start
)


@settings(max_examples=20, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(shape=frame_shapes)
def test_random_window_frame_matches_duckdb(spark, duck, shape):
    """Randomized ROWS-frame window aggregates: sliding sum/avg/min/
    max/count with drawn PRECEDING/FOLLOWING bounds (and unbounded
    starts) — the moving-average / sessionization frame surface.

    Values are quantized to integer cents first: DuckDB evaluates
    window aggregates over a segment tree (pairwise association) while
    Spark keeps a running accumulation, so raw double frames differ in
    final-ULP and flip round() at boundaries. Integer frame sums are
    associative, so the comparison is exact; avg is expressed as
    sum/count with identical operand order on both engines."""
    from pyspark.sql.window import Window
    part, fn, prec, foll, unbounded = shape

    ev = (load(spark, SF, "events")
          .withColumn("vq", F.floor(F.col("value") * 100).cast("long")))
    start = Window.unboundedPreceding if unbounded else -prec
    w = (Window.partitionBy(part)
         .orderBy(F.col("vq").asc(), F.col("event_id").asc())
         .rowsBetween(start, foll))
    spark_fns = {"sum": F.sum("vq").over(w),
                 "avg": F.round(F.sum("vq").over(w).cast("double")
                                / F.count(F.lit(1)).over(w), 4),
                 "min": F.min("vq").over(w),
                 "max": F.max("vq").over(w),
                 "count": F.count(F.lit(1)).over(w)}
    out = ev.select("event_id", spark_fns[fn].alias("m"))
    spark_rows = sorted(((r["event_id"], _norm(r["m"]))
                         for r in out.collect()), key=repr)

    bound_start = ("UNBOUNDED PRECEDING" if unbounded
                   else f"{prec} PRECEDING" if prec else "CURRENT ROW")
    bound_end = f"{foll} FOLLOWING" if foll else "CURRENT ROW"
    duck_fns = {"sum": "sum(vq) OVER w",
                "avg": ("round(CAST(sum(vq) OVER w AS DOUBLE) "
                        "/ (count(*) OVER w), 4)"),
                "min": "min(vq) OVER w",
                "max": "max(vq) OVER w",
                "count": "count(*) OVER w"}
    sql = (f"SELECT event_id, {duck_fns[fn]} AS m FROM "
           f"(SELECT *, CAST(floor(value * 100) AS BIGINT) AS vq "
           f" FROM events) "
           f"WINDOW w AS (PARTITION BY {part} ORDER BY vq, event_id "
           f"ROWS BETWEEN {bound_start} AND {bound_end})")
    duck_rows = sorted(((eid, _norm(m))
                        for eid, m in duck.execute(sql).fetchall()), key=repr)
    assert spark_rows == duck_rows


grouping_shapes = st.tuples(
    st.sampled_from(["rollup", "cube"]),
    st.lists(st.sampled_from(["event_type", "user_id"]), unique=True,
             min_size=1, max_size=2),
    st.lists(st.sampled_from(["n", "sum_v", "min_v"]), unique=True,
             min_size=1, max_size=2),
)


@settings(max_examples=15, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(shape=grouping_shapes)
def test_random_rollup_cube_matches_duckdb(spark, duck, shape):
    """Randomized ROLLUP/CUBE multi-level aggregations: the subtotal
    NULL indicator rows and every grouping-set level must agree."""
    op, group_cols, agg_names = shape

    ev = load(spark, SF, "events")
    aggs = [AGGS[a][0]().alias(a) for a in agg_names]
    grouped = (ev.rollup(*group_cols) if op == "rollup"
               else ev.cube(*group_cols))
    out = grouped.agg(*aggs)
    cols = group_cols + agg_names
    spark_rows = sorted(
        (tuple(_norm(r[c]) for c in cols) for r in out.collect()), key=repr)

    select = ", ".join(group_cols
                       + [f"{AGGS[a][1]} AS {a}" for a in agg_names])
    sql = (f"SELECT {select} FROM events "
           f"GROUP BY {op.upper()} ({', '.join(group_cols)})")
    res = duck.execute(sql)
    names = [d[0] for d in res.description]
    duck_rows = sorted(
        (tuple(_norm(dict(zip(names, r))[c]) for c in cols)
         for r in res.fetchall()), key=repr)
    assert spark_rows == duck_rows


setop_shapes = st.tuples(
    st.sampled_from(["intersect", "except", "union_all", "union_distinct"]),
    st.sampled_from(["view", "click", "purchase"]),
    st.sampled_from(["view", "click", "signup"]),
    st.floats(min_value=0.0, max_value=300.0, allow_nan=False),
)


@settings(max_examples=15, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(shape=setop_shapes)
def test_random_setop_matches_duckdb(spark, duck, shape):
    op, et_a, et_b, vmin = shape

    ev = load(spark, SF, "events")
    a = ev.filter(F.col("event_type") == et_a).select("user_id")
    b = (ev.filter((F.col("event_type") == et_b)
                   & (F.col("value") >= vmin)).select("user_id"))
    if op == "intersect":
        out, sql_op = a.intersect(b), "INTERSECT"
    elif op == "except":
        # subtract = EXCEPT DISTINCT (exceptAll keeps multiplicity
        # survivors, which set-EXCEPT removes)
        out, sql_op = a.subtract(b), "EXCEPT"
    elif op == "union_all":
        out, sql_op = a.unionAll(b), "UNION ALL"
    else:
        out, sql_op = a.union(b).distinct(), "UNION"
    spark_rows = sorted(r["user_id"] for r in out.collect())

    sql = (f"SELECT user_id FROM events WHERE event_type = '{et_a}' "
           f"{sql_op} "
           f"SELECT user_id FROM events WHERE event_type = '{et_b}' "
           f"AND value >= {vmin!r}")
    duck_rows = sorted(r[0] for r in duck.execute(sql).fetchall())
    assert spark_rows == duck_rows


time_shapes = st.tuples(
    st.sampled_from(["hour", "day", "week", "month"]),     # trunc unit
    st.sampled_from([None, "hour", "dayofweek", "day"]),   # extract key
    st.lists(st.sampled_from(["n", "sum_v", "min_ts", "max_ts"]),
             unique=True, min_size=1, max_size=3),
    st.one_of(st.none(), st.sampled_from([5, 12, 20])),    # hour filter
)


@settings(max_examples=15, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(shape=time_shapes)
def test_random_time_bucket_matches_duckdb(spark, duck, shape):
    """Randomized date_trunc/extract aggregation shapes over events.ts.
    The time path is where the engines (and the driver's testdata
    encoding) have historically diverged — r2's TIMESTAMP_NTZ drift —
    so keep it under differential fire: trunc granularities, extract
    keys, min/max of timestamps, and hour-of-day filters must agree
    with DuckDB bit-for-bit under the UTC session timezone."""
    trunc_unit, extract_key, agg_names, hour_min = shape

    spark_extract = {"hour": F.hour("ts"),
                     "dayofweek": F.dayofweek("ts"),
                     "day": F.dayofmonth("ts")}
    duck_extract = {"hour": "extract(hour FROM ts)",
                    # DuckDB dow is 0=Sunday; Spark dayofweek 1=Sunday
                    "dayofweek": "(extract(dow FROM ts) + 1)",
                    "day": "extract(day FROM ts)"}
    spark_aggs = {"n": F.count(F.lit(1)),
                  "sum_v": F.round(F.sum("value"), 4),
                  "min_ts": F.min("ts"), "max_ts": F.max("ts")}
    duck_aggs = {"n": "count(*)", "sum_v": "round(sum(value), 4)",
                 "min_ts": "min(ts)", "max_ts": "max(ts)"}

    ev = load(spark, SF, "events")
    conds = []
    if hour_min is not None:
        ev = ev.filter(F.hour("ts") >= hour_min)
        conds.append(f"extract(hour FROM ts) >= {hour_min}")

    keys = [F.date_trunc(trunc_unit, "ts").alias("bucket")]
    key_names = ["bucket"]
    if extract_key is not None:
        keys.append(spark_extract[extract_key].cast("long").alias("k2"))
        key_names.append("k2")
    out = ev.groupBy(*keys).agg(
        *[spark_aggs[a].alias(a) for a in agg_names])
    cols = key_names + agg_names
    spark_rows = sorted(
        (tuple(_norm(r[c]) for c in cols) for r in out.collect()), key=repr)

    # DuckDB returns DATE for day/week/month truncs, Spark a TIMESTAMP
    # — align the oracle type explicitly
    sel = [f"CAST(date_trunc('{trunc_unit}', ts) AS TIMESTAMP) AS bucket"]
    if extract_key is not None:
        sel.append(f"CAST({duck_extract[extract_key]} AS BIGINT) AS k2")
    sel += [f"{duck_aggs[a]} AS {a}" for a in agg_names]
    sql = f"SELECT {', '.join(sel)} FROM events"
    if conds:
        sql += " WHERE " + " AND ".join(conds)
    sql += " GROUP BY " + ", ".join(key_names)
    res = duck.execute(sql)
    names = [d[0] for d in res.description]
    duck_rows = sorted(
        (tuple(_norm(dict(zip(names, r))[c]) for c in cols)
         for r in res.fetchall()), key=repr)

    assert spark_rows == duck_rows


string_shapes = st.tuples(
    st.sampled_from(["lower", "upper", "trim_sub", "reverse"]),
    st.integers(min_value=1, max_value=20),   # substring start
    st.integers(min_value=1, max_value=30),   # substring length
    st.sampled_from(["%table%", "%spark%", "a%", "%row"]),  # LIKE
    st.sampled_from(["n_chars", "n_match", "first_tok"]),
)


@pytest.fixture(scope="module")
def duck_docs():
    con = duckdb.connect()
    con.execute(f"CREATE VIEW documents AS "
                f"SELECT * FROM read_parquet('{SF}/documents.parquet')")
    return con


@settings(max_examples=15, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(shape=string_shapes)
def test_random_string_functions_match_duckdb(spark, duck_docs, shape):
    """Randomized string-expression shapes over documents.text: case
    mapping, substring windows, LIKE predicates, regexp counts and
    first-token extraction must agree with DuckDB byte-for-byte."""
    fn, start, length, pattern, agg = shape

    spark_fn = {
        "lower": F.lower(F.substring("text", start, length)),
        "upper": F.upper(F.substring("text", start, length)),
        "trim_sub": F.trim(F.substring("text", start, length)),
        "reverse": F.reverse(F.substring("text", start, length)),
    }[fn]
    duck_fn = {
        "lower": f"lower(substring(text, {start}, {length}))",
        "upper": f"upper(substring(text, {start}, {length}))",
        "trim_sub": f"trim(substring(text, {start}, {length}))",
        "reverse": f"reverse(substring(text, {start}, {length}))",
    }[fn]
    spark_agg = {
        "n_chars": F.sum(F.length("text")).alias("v"),
        "n_match": F.sum(F.col("text").like(pattern).cast("long")).alias("v"),
        "first_tok": F.min(F.split("text", " ")[0]).alias("v"),
    }[agg]
    duck_agg = {
        "n_chars": "sum(length(text))",
        # the extra IS NULL branch keeps all-NULL groups null-faithful
        # to Spark's sum over like().cast() (sum skips nulls)
        "n_match": (f"sum(CASE WHEN text LIKE '{pattern}' THEN 1 "
                    f"WHEN text IS NULL THEN NULL ELSE 0 END)"),
        "first_tok": "min(string_split(text, ' ')[1])",
    }[agg]

    docs = load(spark, SF, "documents")
    out = docs.groupBy(spark_fn.alias("k")).agg(spark_agg)
    spark_rows = sorted((tuple(_norm(r[c]) for c in ("k", "v"))
                         for r in out.collect()), key=repr)
    sql = (f"SELECT {duck_fn} AS k, {duck_agg} AS v "
           f"FROM documents GROUP BY 1")
    duck_rows = sorted((tuple(_norm(x) for x in r)
                        for r in duck_docs.execute(sql).fetchall()), key=repr)
    assert spark_rows == duck_rows


array_shapes = st.tuples(
    st.sampled_from(["sort_join", "distinct_count", "slice_join",
                     "reverse_first"]),
    st.integers(min_value=1, max_value=8),    # slice length
    st.integers(min_value=2, max_value=40),   # min token count filter
)


@settings(max_examples=15, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(shape=array_shapes)
def test_random_array_functions_match_duckdb(spark, duck_docs, shape):
    """Randomized array-expression shapes over tokenized documents —
    sort/distinct/slice/indexing on Spark arrays must agree with
    DuckDB lists (our shingle/chunk/gram operators are built on
    exactly these primitives)."""
    fn, k, min_toks = shape

    # identical tokenization on both engines (split on single spaces,
    # drop empties)
    toks = F.filter(F.split(F.col("text"), " "), lambda t: t != "")
    duck_toks = ("list_filter(string_split(text, ' '), t -> t <> '')")

    spark_expr = {
        "sort_join": F.array_join(F.array_sort(toks), "|"),
        "distinct_count": F.size(F.array_distinct(toks)).cast("long"),
        "slice_join": F.array_join(F.slice(toks, 1, k), "|"),
        "reverse_first": F.reverse(toks)[0],
    }[fn]
    duck_expr = {
        "sort_join": f"array_to_string(list_sort({duck_toks}), '|')",
        "distinct_count": f"CAST(len(list_distinct({duck_toks})) AS BIGINT)",
        "slice_join": f"array_to_string(list_slice({duck_toks}, 1, {k}), '|')",
        "reverse_first": f"list_reverse({duck_toks})[1]",
    }[fn]

    docs = load(spark, SF, "documents")
    out = (docs.filter(F.size(toks) >= min_toks)
           .select("doc_id", spark_expr.alias("m")))
    spark_rows = sorted(((r["doc_id"], _norm(r["m"]))
                         for r in out.collect()), key=repr)
    sql = (f"SELECT doc_id, {duck_expr} AS m FROM documents "
           f"WHERE len({duck_toks}) >= {min_toks}")
    duck_rows = sorted(((i, _norm(m)) for i, m in
                        duck_docs.execute(sql).fetchall()), key=repr)
    assert spark_rows == duck_rows


having_shapes = st.tuples(
    st.sampled_from(["user_id", "event_type"]),
    st.floats(min_value=0.0, max_value=3000.0, allow_nan=False),
    st.integers(min_value=1, max_value=30),
    st.sampled_from(["sum", "count", "both"]),
)


@settings(max_examples=15, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(shape=having_shapes)
def test_random_having_matches_duckdb(spark, duck, shape):
    """Randomized HAVING shapes: aggregate then filter on the
    aggregate(s) — the Q18/Q20 path."""
    key, sum_min, cnt_min, mode = shape

    ev = load(spark, SF, "events")
    agg = (ev.groupBy(key)
           .agg(F.round(F.sum("value"), 4).alias("sv"),
                F.count(F.lit(1)).alias("n")))
    conds, sql_conds = [], []
    if mode in ("sum", "both"):
        conds.append(F.col("sv") > sum_min)
        sql_conds.append(f"round(sum(value), 4) > {sum_min!r}")
    if mode in ("count", "both"):
        conds.append(F.col("n") >= cnt_min)
        sql_conds.append(f"count(*) >= {cnt_min}")
    out = agg
    for c in conds:
        out = out.filter(c)
    spark_rows = sorted(
        (tuple(_norm(r[c]) for c in (key, "sv", "n"))
         for r in out.collect()), key=repr)

    sql = (f"SELECT {key}, round(sum(value), 4) AS sv, count(*) AS n "
           f"FROM events GROUP BY {key} "
           f"HAVING {' AND '.join(sql_conds)}")
    res = duck.execute(sql)
    duck_rows = sorted((tuple(_norm(x) for x in r)
                        for r in res.fetchall()), key=repr)
    assert spark_rows == duck_rows


semianti_shapes = st.tuples(
    st.sampled_from(["semi", "anti"]),
    st.one_of(st.none(), st.sampled_from(["BUILDING", "MACHINERY",
                                          "HOUSEHOLD"])),
    st.one_of(st.none(), st.sampled_from(["1-URGENT", "5-LOW"])),
)


@settings(max_examples=15, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(shape=semianti_shapes)
def test_random_semi_anti_join_matches_duckdb(spark, duck_tpch, shape):
    """Randomized LEFT SEMI / LEFT ANTI joins (EXISTS / NOT EXISTS)
    with independent filters on both sides."""
    how, segment, priority = shape

    cust = load(spark, SF, "customer")
    orders = load(spark, SF, "orders")
    conds = []
    if segment is not None:
        cust = cust.filter(F.col("c_mktsegment") == segment)
        conds.append(f"c_mktsegment = '{segment}'")
    sub = "SELECT 1 FROM orders WHERE o_custkey = c_custkey"
    if priority is not None:
        orders = orders.filter(F.col("o_orderpriority") == priority)
        sub += f" AND o_orderpriority = '{priority}'"
    out = cust.join(orders, F.col("c_custkey") == F.col("o_custkey"),
                    "left_semi" if how == "semi" else "left_anti")
    spark_rows = sorted(r["c_custkey"] for r in out.collect())

    exists = "EXISTS" if how == "semi" else "NOT EXISTS"
    sql = f"SELECT c_custkey FROM customer WHERE {exists} ({sub})"
    if conds:
        sql += " AND " + " AND ".join(conds)
    duck_rows = sorted(r[0] for r in duck_tpch.execute(sql).fetchall())
    assert spark_rows == duck_rows
