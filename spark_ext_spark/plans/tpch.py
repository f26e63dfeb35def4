"""TPC-H-shaped analytical queries over the synthetic star schema.

These exercise the join-planning surface beyond the reference's own
usage: the reference is an ML extension library with no SQL query
corpus (see BASELINE.md), so the TPC-H shapes here are chosen by us to
prove the §2B dataflow surface (joins, filters, aggregates) end-to-end:
multi-way joins with selective dimension filters (Q5), scan-only
filter-aggregate with tight pushdown (Q6), conditional aggregation over
a fact-dimension join (Q14), and a having-filtered semi-aggregation
join (Q18). The testdata schema is TPC-H-ish but narrower (no
partsupp, no ship/commit/receipt trio), so each query keeps the
*shape* of its namesake rather than its literal spec.

Scale notes (100 TB): region/nation/supplier/part/customer are
broadcast-side dims — Catalyst broadcasts them under the default
threshold, so only the lineitem↔orders join shuffles. Q6 is a pure
scan: filters and a 3-column ReadSchema reach the parquet reader.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from spark_ext_spark.plans.relational import _lattice_avg_4dp_sql, load

def _revenue():
    # lazy: Column construction needs an active session in classic mode
    return F.col("l_extendedprice") * (F.lit(1.0) - F.col("l_discount"))


def local_supplier_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q5 shape: revenue per nation from orders where the customer and
    the line's supplier share that nation, within one region and one
    order-date year."""
    customer = load(spark, sf_dir, "customer")
    orders = load(spark, sf_dir, "orders")
    lineitem = load(spark, sf_dir, "lineitem")
    supplier = load(spark, sf_dir, "supplier")
    nation = load(spark, sf_dir, "nation")
    region = load(spark, sf_dir, "region")
    return (customer
            .join(orders, F.col("c_custkey") == F.col("o_custkey"))
            .join(lineitem, F.col("l_orderkey") == F.col("o_orderkey"))
            .join(supplier, (F.col("l_suppkey") == F.col("s_suppkey"))
                  & (F.col("c_nationkey") == F.col("s_nationkey")))
            .join(nation, F.col("s_nationkey") == F.col("n_nationkey"))
            .join(region, F.col("n_regionkey") == F.col("r_regionkey"))
            .filter((F.col("r_name") == "ASIA")
                    & (F.col("o_orderdate") >= F.lit("1996-01-01"))
                    & (F.col("o_orderdate") < F.lit("1997-01-01")))
            .groupBy("n_name")
            .agg(F.round(F.sum(_revenue()), 4).alias("revenue"),
                 F.count(F.lit(1)).alias("n_lines")))


LOCAL_SUPPLIER_VOLUME_SQL = """
SELECT n_name,
       round(sum(l_extendedprice * (1 - l_discount)), 4) AS revenue,
       count(*) AS n_lines
FROM customer
JOIN orders   ON c_custkey = o_custkey
JOIN lineitem ON l_orderkey = o_orderkey
JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
JOIN nation   ON s_nationkey = n_nationkey
JOIN region   ON n_regionkey = r_regionkey
WHERE r_name = 'ASIA'
  AND o_orderdate >= TIMESTAMP '1996-01-01'
  AND o_orderdate <  TIMESTAMP '1997-01-01'
GROUP BY n_name
"""


def forecast_revenue_change(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q6 shape: single-scan filter-aggregate. All three predicates and
    the two-column projection push into the parquet scan."""
    lineitem = load(spark, sf_dir, "lineitem")
    return (lineitem
            .filter((F.col("l_shipdate") >= F.lit("1996-01-01"))
                    & (F.col("l_shipdate") < F.lit("1997-01-01"))
                    & (F.col("l_discount") >= 0.03)
                    & (F.col("l_discount") <= 0.07)
                    & (F.col("l_quantity") < 24))
            .agg(F.round(F.sum(F.col("l_extendedprice")
                               * F.col("l_discount")), 4).alias("revenue"),
                 F.count(F.lit(1)).alias("n_lines")))


FORECAST_REVENUE_CHANGE_SQL = """
SELECT round(sum(l_extendedprice * l_discount), 4) AS revenue,
       count(*) AS n_lines
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '1996-01-01'
  AND l_shipdate <  TIMESTAMP '1997-01-01'
  AND l_discount BETWEEN 0.03 AND 0.07
  AND l_quantity < 24
"""


def promo_revenue_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q14 shape: conditional aggregation over the lineitem↔part join —
    the percent of one month's revenue from PROMO-typed parts. part is
    broadcast; one scan, no pre-aggregation shuffle."""
    lineitem = load(spark, sf_dir, "lineitem")
    part = load(spark, sf_dir, "part")
    promo = F.when(F.col("p_type") == "PROMO", _revenue()).otherwise(F.lit(0.0))
    return (lineitem
            .join(part, F.col("l_partkey") == F.col("p_partkey"))
            .filter((F.col("l_shipdate") >= F.lit("1997-03-01"))
                    & (F.col("l_shipdate") < F.lit("1997-04-01")))
            .agg(F.round(F.lit(100.0) * F.sum(promo) / F.sum(_revenue()), 4)
                 .alias("promo_pct"),
                 F.count(F.lit(1)).alias("n_lines")))


PROMO_REVENUE_SHARE_SQL = """
SELECT round(100.0 * sum(CASE WHEN p_type = 'PROMO'
                              THEN l_extendedprice * (1 - l_discount)
                              ELSE 0.0 END)
             / sum(l_extendedprice * (1 - l_discount)), 4) AS promo_pct,
       count(*) AS n_lines
FROM lineitem
JOIN part ON l_partkey = p_partkey
WHERE l_shipdate >= TIMESTAMP '1997-03-01'
  AND l_shipdate <  TIMESTAMP '1997-04-01'
"""


def large_volume_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q18 shape: orders whose total line quantity exceeds a threshold,
    joined back to the customer. The HAVING-filtered aggregate runs
    first (shuffle on l_orderkey), then the survivors — a tiny set —
    join orders/customer."""
    lineitem = load(spark, sf_dir, "lineitem")
    orders = load(spark, sf_dir, "orders")
    customer = load(spark, sf_dir, "customer")
    big = (lineitem.groupBy("l_orderkey")
           .agg(F.sum("l_quantity").alias("sum_qty"))
           .filter(F.col("sum_qty") > 150))
    return (big
            .join(orders, F.col("o_orderkey") == F.col("l_orderkey"))
            .join(customer, F.col("c_custkey") == F.col("o_custkey"))
            .select("c_name", "o_orderkey",
                    F.round("o_totalprice", 4).alias("totalprice"),
                    F.round("sum_qty", 4).alias("sum_qty")))


LARGE_VOLUME_ORDERS_SQL = """
SELECT c_name, o_orderkey,
       round(o_totalprice, 4) AS totalprice,
       round(sum_qty, 4) AS sum_qty
FROM (SELECT l_orderkey, sum(l_quantity) AS sum_qty
      FROM lineitem GROUP BY l_orderkey
      HAVING sum(l_quantity) > 150) big
JOIN orders   ON o_orderkey = big.l_orderkey
JOIN customer ON c_custkey = o_custkey
"""


def customer_order_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q13 shape: left outer join with an ON-clause filter (orders that
    aren't urgent), per-customer order counts including zeros, then a
    histogram of the counts. Two shuffles: the outer join on custkey
    and the tiny second agg on the count value."""
    customer = load(spark, sf_dir, "customer")
    orders = (load(spark, sf_dir, "orders")
              .filter(F.col("o_orderpriority") != "1-URGENT"))
    per_cust = (customer.join(
        orders, F.col("c_custkey") == F.col("o_custkey"), "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count")))
    return (per_cust.groupBy("c_count")
            .agg(F.count(F.lit(1)).alias("n_customers")))


CUSTOMER_ORDER_HISTOGRAM_SQL = """
SELECT c_count, count(*) AS n_customers
FROM (SELECT c_custkey, count(o_orderkey) AS c_count
      FROM customer
      LEFT JOIN orders ON c_custkey = o_custkey
                      AND o_orderpriority <> '1-URGENT'
      GROUP BY c_custkey) t
GROUP BY c_count
"""


def idle_rich_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q22 shape: customers with above-average (positive) balance and
    no URGENT orders — a scalar-aggregate broadcast plus a left-anti
    join, grouped by nation. The global average rides inside the plan
    as a broadcast single-row cross join (no driver collect); the anti
    join shuffles on custkey unless the filtered side broadcasts."""
    customer = load(spark, sf_dir, "customer")
    orders = (load(spark, sf_dir, "orders")
              .filter(F.col("o_orderpriority") == "1-URGENT"))
    from spark_ext_spark.functions import attach_scalar_agg
    # deterministic threshold: a bare avg() is an order-dependent
    # double sum, so a balance within 1 ULP of the mean could pass the
    # strict > on one engine/partitioning only. Exact 1e-6-lattice
    # BIGINT sum, then the same division chain on both engines
    # (relational._lattice_avg_4dp rationale, unquantized output).
    # non-finite/beyond-lattice guard, same as _lattice_avg_4dp: the
    # decimal cast silently NULLs NaN/±Inf (deflating the mean against
    # count) where the DuckDB BIGINT lattice raises (round-10 sweep)
    bad = (F.isnan("c_acctbal")
           | (F.abs("c_acctbal") > F.lit(9.2233e12)))
    lat = (F.when(bad, F.raise_error(F.lit(
               "idle_rich_customers: NaN or |c_acctbal| beyond the "
               "1e-6 integer lattice (~9.2233e12) — the exact "
               "threshold average cannot represent it (the DuckDB "
               "mirror raises on the same cast); pre-filter or "
               "repair"))
           .cast("decimal(38,0)"))
           .otherwise(F.floor(F.col("c_acctbal") * F.lit(1e6)
                              + F.lit(5e-1))
                      .cast("decimal(38,0)")))  # exact to 1e38
    avg_bal = (F.sum(lat).cast("double")
               / F.count("c_acctbal")) / F.lit(1e6)
    rich = (attach_scalar_agg(customer, {"avg_bal": avg_bal},
                              source=customer.filter(F.col("c_acctbal") > 0))
            .filter(F.col("c_acctbal") > F.col("avg_bal")))
    idle = rich.join(orders, F.col("c_custkey") == F.col("o_custkey"),
                     "left_anti")
    return (idle.groupBy("c_nationkey")
            .agg(F.count(F.lit(1)).alias("n_customers"),
                 F.round(F.sum("c_acctbal"), 4).alias("total_acctbal")))


IDLE_RICH_CUSTOMERS_SQL = """
SELECT c_nationkey, count(*) AS n_customers,
       round(sum(c_acctbal), 4) AS total_acctbal
FROM customer
WHERE c_acctbal > (SELECT (CAST(sum(CAST(floor(c_acctbal * 1e6 + 5e-1)
                                        AS BIGINT)) AS DOUBLE)
                           / count(c_acctbal)) / 1e6
                   FROM customer WHERE c_acctbal > 0)
  AND NOT EXISTS (SELECT 1 FROM orders
                  WHERE o_custkey = c_custkey
                    AND o_orderpriority = '1-URGENT')
GROUP BY c_nationkey
"""


def late_order_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q4 shape: order-priority checking — count orders in one quarter
    that have at least one line shipped >30 days after the order date.
    The EXISTS becomes a LEFT SEMI join: equi on orderkey plus the
    non-equi date predicate evaluated join-side, so no duplicate-order
    inflation and no DISTINCT. The quarter filter pushes into the
    orders scan before the join."""
    orders = (load(spark, sf_dir, "orders")
              .filter((F.col("o_orderdate") >= F.lit("1996-07-01"))
                      & (F.col("o_orderdate") < F.lit("1996-10-01"))))
    lineitem = load(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_shipdate")
    late = orders.join(
        lineitem,
        (F.col("l_orderkey") == F.col("o_orderkey"))
        & (F.col("l_shipdate")
           > F.col("o_orderdate") + F.expr("INTERVAL 30 DAYS")),
        "left_semi")
    return (late.groupBy("o_orderpriority")
            .agg(F.count(F.lit(1)).alias("order_count")))


LATE_ORDER_PRIORITY_SQL = """
SELECT o_orderpriority, count(*) AS order_count
FROM orders
WHERE o_orderdate >= TIMESTAMP '1996-07-01'
  AND o_orderdate <  TIMESTAMP '1996-10-01'
  AND EXISTS (SELECT 1 FROM lineitem
              WHERE l_orderkey = o_orderkey
                AND l_shipdate > o_orderdate + INTERVAL 30 DAY)
GROUP BY o_orderpriority
"""


def volume_shipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q7 shape: bilateral trade volume between two nations — the
    customer's nation and the line supplier's nation, either direction,
    per ship year. Two *aliased* copies of nation join the same plan
    (supplier side and customer side); both are broadcast, so lineitem
    shuffles only for the orders join and the final 2x2xyears agg."""
    lineitem = load(spark, sf_dir, "lineitem")
    orders = load(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    customer = load(spark, sf_dir, "customer").select(
        "c_custkey", "c_nationkey")
    supplier = load(spark, sf_dir, "supplier").select(
        "s_suppkey", "s_nationkey")
    nation = load(spark, sf_dir, "nation")
    n1 = nation.select(F.col("n_nationkey").alias("s_nk"),
                       F.col("n_name").alias("supp_nation"))
    n2 = nation.select(F.col("n_nationkey").alias("c_nk"),
                       F.col("n_name").alias("cust_nation"))
    pair = ((F.col("supp_nation") == "NATION_1")
            & (F.col("cust_nation") == "NATION_2")) | (
           (F.col("supp_nation") == "NATION_2")
           & (F.col("cust_nation") == "NATION_1"))
    return (lineitem
            .join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
            .join(customer, F.col("o_custkey") == F.col("c_custkey"))
            .join(supplier, F.col("l_suppkey") == F.col("s_suppkey"))
            .join(F.broadcast(n1), F.col("s_nationkey") == F.col("s_nk"))
            .join(F.broadcast(n2), F.col("c_nationkey") == F.col("c_nk"))
            .filter(pair)
            .groupBy("supp_nation", "cust_nation",
                     F.year("l_shipdate").alias("l_year"))
            .agg(F.round(F.sum(_revenue()), 4).alias("revenue"),
                 F.count(F.lit(1)).alias("n_lines")))


VOLUME_SHIPPING_SQL = """
SELECT supp_nation, cust_nation, l_year,
       round(sum(volume), 4) AS revenue,
       count(*) AS n_lines
FROM (SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
             CAST(year(l_shipdate) AS INTEGER) AS l_year,
             l_extendedprice * (1 - l_discount) AS volume
      FROM lineitem
      JOIN orders   ON l_orderkey = o_orderkey
      JOIN customer ON o_custkey = c_custkey
      JOIN supplier ON l_suppkey = s_suppkey
      JOIN nation n1 ON s_nationkey = n1.n_nationkey
      JOIN nation n2 ON c_nationkey = n2.n_nationkey
      WHERE (n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
         OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1')) shipping
GROUP BY supp_nation, cust_nation, l_year
"""


def market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q8 shape: one nation's share of PROMO-part revenue inside one
    region, per order year. Conditional aggregation (share numerator as
    a CASE) over a 6-way join where every non-fact side is a broadcast
    dim. The customer-nation restricts to the region; the supplier
    nation feeds the numerator."""
    lineitem = load(spark, sf_dir, "lineitem")
    orders = load(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_orderdate")
    customer = load(spark, sf_dir, "customer").select(
        "c_custkey", "c_nationkey")
    supplier = load(spark, sf_dir, "supplier").select(
        "s_suppkey", "s_nationkey")
    part = load(spark, sf_dir, "part").select("p_partkey", "p_type")
    nation = load(spark, sf_dir, "nation")
    region = load(spark, sf_dir, "region")
    cust_nation = (nation
                   .join(region, F.col("n_regionkey") == F.col("r_regionkey"))
                   .filter(F.col("r_name") == "AMERICA")
                   .select(F.col("n_nationkey").alias("c_nk")))
    supp_nation = nation.select(F.col("n_nationkey").alias("s_nk"),
                                F.col("n_name").alias("supp_nation"))
    vol = _revenue()
    target = F.when(F.col("supp_nation") == "NATION_6", vol).otherwise(
        F.lit(0.0))
    return (lineitem
            .join(F.broadcast(part.filter(F.col("p_type") == "PROMO")),
                  F.col("l_partkey") == F.col("p_partkey"))
            .join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
            .join(customer, F.col("o_custkey") == F.col("c_custkey"))
            .join(F.broadcast(cust_nation), F.col("c_nationkey") == F.col("c_nk"),
                  "left_semi")
            .join(supplier, F.col("l_suppkey") == F.col("s_suppkey"))
            .join(F.broadcast(supp_nation), F.col("s_nationkey") == F.col("s_nk"))
            .groupBy(F.year("o_orderdate").alias("o_year"))
            .agg(F.round(F.sum(target) / F.sum(vol), 6).alias("mkt_share"),
                 F.count(F.lit(1)).alias("n_lines")))


MARKET_SHARE_SQL = """
SELECT CAST(year(o_orderdate) AS INTEGER) AS o_year,
       round(sum(CASE WHEN n2.n_name = 'NATION_6'
                      THEN l_extendedprice * (1 - l_discount)
                      ELSE 0.0 END)
             / sum(l_extendedprice * (1 - l_discount)), 6) AS mkt_share,
       count(*) AS n_lines
FROM lineitem
JOIN part     ON l_partkey = p_partkey AND p_type = 'PROMO'
JOIN orders   ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN supplier ON l_suppkey = s_suppkey
JOIN nation n2 ON s_nationkey = n2.n_nationkey
WHERE c_nationkey IN (SELECT n_nationkey FROM nation
                      JOIN region ON n_regionkey = r_regionkey
                      WHERE r_name = 'AMERICA')
GROUP BY year(o_orderdate)
"""


def product_type_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q9 shape: profit by supplier nation and order year over ECONOMY
    parts, with cost modeled from p_retailprice (the schema has no
    partsupp/ps_supplycost). part and nation broadcast; lineitem
    shuffles once for the orders join, once for the final agg."""
    lineitem = load(spark, sf_dir, "lineitem")
    orders = load(spark, sf_dir, "orders").select("o_orderkey", "o_orderdate")
    supplier = load(spark, sf_dir, "supplier").select(
        "s_suppkey", "s_nationkey")
    part = load(spark, sf_dir, "part").select(
        "p_partkey", "p_type", "p_retailprice")
    nation = load(spark, sf_dir, "nation")
    profit = (_revenue()
              - F.lit(0.1) * F.col("p_retailprice") * F.col("l_quantity"))
    return (lineitem
            .join(F.broadcast(part.filter(F.col("p_type") == "ECONOMY")),
                  F.col("l_partkey") == F.col("p_partkey"))
            .join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
            .join(supplier, F.col("l_suppkey") == F.col("s_suppkey"))
            .join(F.broadcast(nation),
                  F.col("s_nationkey") == F.col("n_nationkey"))
            .groupBy(F.col("n_name").alias("nation"),
                     F.year("o_orderdate").alias("o_year"))
            .agg(F.round(F.sum(profit), 4).alias("sum_profit"),
                 F.count(F.lit(1)).alias("n_lines")))


PRODUCT_TYPE_PROFIT_SQL = """
SELECT n_name AS nation,
       CAST(year(o_orderdate) AS INTEGER) AS o_year,
       round(sum(l_extendedprice * (1 - l_discount)
                 - 0.1 * p_retailprice * l_quantity), 4) AS sum_profit,
       count(*) AS n_lines
FROM lineitem
JOIN part     ON l_partkey = p_partkey AND p_type = 'ECONOMY'
JOIN orders   ON l_orderkey = o_orderkey
JOIN supplier ON l_suppkey = s_suppkey
JOIN nation   ON s_nationkey = n_nationkey
GROUP BY n_name, year(o_orderdate)
"""


def returned_item_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q10 shape: top 20 customers by revenue lost to returns in one
    quarter. groupBy custkey then TakeOrderedAndProject — per-partition
    top-k merged on the driver, never a global sort. The LIMIT is made
    deterministic by the (revenue DESC, custkey) tie-break mirrored in
    the oracle."""
    lineitem = load(spark, sf_dir, "lineitem").filter(
        F.col("l_returnflag") == "R")
    orders = (load(spark, sf_dir, "orders")
              .filter((F.col("o_orderdate") >= F.lit("1996-10-01"))
                      & (F.col("o_orderdate") < F.lit("1997-01-01")))
              .select("o_orderkey", "o_custkey"))
    customer = load(spark, sf_dir, "customer")
    nation = load(spark, sf_dir, "nation")
    return (lineitem
            .join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
            .join(customer, F.col("o_custkey") == F.col("c_custkey"))
            .join(F.broadcast(nation),
                  F.col("c_nationkey") == F.col("n_nationkey"))
            .groupBy("c_custkey", "c_name", "n_name")
            .agg(F.round(F.sum(_revenue()), 4).alias("revenue"),
                 F.round(F.first("c_acctbal"), 4).alias("acctbal"))
            .orderBy(F.desc("revenue"), F.asc("c_custkey"))
            .limit(20))


RETURNED_ITEM_CUSTOMERS_SQL = """
SELECT c_custkey, c_name, n_name,
       round(sum(l_extendedprice * (1 - l_discount)), 4) AS revenue,
       round(any_value(c_acctbal), 4) AS acctbal
FROM lineitem
JOIN orders   ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN nation   ON c_nationkey = n_nationkey
WHERE l_returnflag = 'R'
  AND o_orderdate >= TIMESTAMP '1996-10-01'
  AND o_orderdate <  TIMESTAMP '1997-01-01'
GROUP BY c_custkey, c_name, n_name
ORDER BY revenue DESC, c_custkey ASC
LIMIT 20
"""


def linestatus_priority_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q12 shape: per line status (the schema's stand-in for shipmode),
    how many of the year's shipped lines belong to critical-priority
    orders vs not — conditional counts over the lineitem↔orders join."""
    lineitem = (load(spark, sf_dir, "lineitem")
                .filter((F.col("l_shipdate") >= F.lit("1997-01-01"))
                        & (F.col("l_shipdate") < F.lit("1998-01-01")))
                .select("l_orderkey", "l_linestatus"))
    orders = load(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderpriority")
    critical = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (lineitem
            .join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
            .groupBy("l_linestatus")
            .agg(F.sum(F.when(critical, 1).otherwise(0))
                 .alias("high_line_count"),
                 F.sum(F.when(critical, 0).otherwise(1))
                 .alias("low_line_count")))


LINESTATUS_PRIORITY_COUNTS_SQL = """
SELECT l_linestatus,
       CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
       CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                THEN 0 ELSE 1 END) AS BIGINT) AS low_line_count
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
WHERE l_shipdate >= TIMESTAMP '1997-01-01'
  AND l_shipdate <  TIMESTAMP '1998-01-01'
GROUP BY l_linestatus
"""


def top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q15 shape: the supplier(s) whose quarterly revenue equals the
    maximum. The scalar max rides as a broadcast single-row cross join
    (same pattern as Q22's average) — no driver collect, no global
    window. Revenue is rounded to 4 decimals on BOTH sides before the
    equality so float summation order can't flip the winner."""
    lineitem = (load(spark, sf_dir, "lineitem")
                .filter((F.col("l_shipdate") >= F.lit("1996-01-01"))
                        & (F.col("l_shipdate") < F.lit("1996-04-01"))))
    supplier = load(spark, sf_dir, "supplier").select("s_suppkey", "s_name")
    revenue = (lineitem.groupBy("l_suppkey")
               .agg(F.round(F.sum(_revenue()), 4).alias("total_revenue")))
    from spark_ext_spark.functions import attach_scalar_agg
    return (attach_scalar_agg(revenue,
                              {"max_revenue": F.max("total_revenue")})
            .filter(F.col("total_revenue") == F.col("max_revenue"))
            .join(F.broadcast(supplier),
                  F.col("l_suppkey") == F.col("s_suppkey"))
            .select(F.col("s_suppkey"), F.col("s_name"), "total_revenue"))


TOP_SUPPLIER_SQL = """
WITH revenue AS (
    SELECT l_suppkey,
           round(sum(l_extendedprice * (1 - l_discount)), 4)
               AS total_revenue
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1996-01-01'
      AND l_shipdate <  TIMESTAMP '1996-04-01'
    GROUP BY l_suppkey)
SELECT s_suppkey, s_name, total_revenue
FROM revenue
JOIN supplier ON s_suppkey = l_suppkey
WHERE total_revenue = (SELECT max(total_revenue) FROM revenue)
"""


def small_quantity_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q17 shape: yearly revenue that would vanish if sub-20%-of-average
    quantity orders were dropped, for one brand. The correlated AVG
    subquery becomes a per-part window average over the brand-filtered
    lines (r12: previously an aggregate-then-rejoin that re-scanned
    lineitem — the window shuffles only the brand subset once instead
    of reading the full fact table twice).

    The cutoff is an order-dependent double accumulation: compare
    against a ROUNDED threshold so a quantity within 1 ULP of
    0.2·avg can't flip membership on one engine only (same
    discipline as important_parts)."""
    part = (load(spark, sf_dir, "part")
            .filter(F.col("p_brand") == "Brand#4")
            .select("p_partkey"))
    lineitem = load(spark, sf_dir, "lineitem").select(
        "l_partkey", "l_quantity", "l_extendedprice")
    brand_lines = lineitem.join(F.broadcast(part),
                                F.col("l_partkey") == F.col("p_partkey"))
    w_part = Window.partitionBy("l_partkey")
    return (brand_lines
            .withColumn("qty_cut",
                        F.round(F.lit(0.2) * F.avg("l_quantity").over(w_part),
                                4))
            .filter(F.col("l_quantity") < F.col("qty_cut"))
            .agg(F.round(F.sum("l_extendedprice") / 7.0, 4)
                 .alias("avg_yearly"),
                 F.count(F.lit(1)).alias("n_lines")))


SMALL_QUANTITY_REVENUE_SQL = """
SELECT round(sum(l_extendedprice) / 7.0, 4) AS avg_yearly,
       count(*) AS n_lines
FROM lineitem
JOIN part ON p_partkey = l_partkey
WHERE p_brand = 'Brand#4'
  AND l_quantity < (SELECT round(0.2 * avg(l2.l_quantity), 4)
                    FROM lineitem l2
                    WHERE l2.l_partkey = p_partkey)
"""


def discounted_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q19 shape: disjunctive multi-clause predicates over the
    lineitem↔part join — three (brand, size-range, quantity-range)
    alternatives OR-ed together. Catalyst keeps the equi-join on
    partkey and evaluates the disjunction as a post-join filter with
    the per-side conjuncts (p_size ≥ 1, quantity bounds) pushed to the
    scans."""
    lineitem = load(spark, sf_dir, "lineitem")
    part = load(spark, sf_dir, "part").select(
        "p_partkey", "p_brand", "p_size")
    q = F.col("l_quantity")
    alt = (((F.col("p_brand") == "Brand#1") & F.col("p_size").between(1, 5)
            & q.between(1, 11))
           | ((F.col("p_brand") == "Brand#2")
              & F.col("p_size").between(1, 10) & q.between(10, 20))
           | ((F.col("p_brand") == "Brand#3")
              & F.col("p_size").between(1, 15) & q.between(20, 30)))
    return (lineitem
            .join(F.broadcast(part), F.col("l_partkey") == F.col("p_partkey"))
            .filter(alt)
            .agg(F.round(F.sum(_revenue()), 4).alias("revenue"),
                 F.count(F.lit(1)).alias("n_lines")))


DISCOUNTED_REVENUE_SQL = """
SELECT round(sum(l_extendedprice * (1 - l_discount)), 4) AS revenue,
       count(*) AS n_lines
FROM lineitem
JOIN part ON l_partkey = p_partkey
WHERE (p_brand = 'Brand#1' AND p_size BETWEEN 1 AND 5
       AND l_quantity BETWEEN 1 AND 11)
   OR (p_brand = 'Brand#2' AND p_size BETWEEN 1 AND 10
       AND l_quantity BETWEEN 10 AND 20)
   OR (p_brand = 'Brand#3' AND p_size BETWEEN 1 AND 15
       AND l_quantity BETWEEN 20 AND 30)
"""


def promotion_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q20 shape (adapted — no partsupp in the schema): suppliers whose
    1996 shipped quantity of PROMO parts exceeds a threshold. The IN
    (SELECT ... GROUP BY ... HAVING) subquery becomes an aggregate →
    filter → LEFT SEMI join onto supplier; the heavy side aggregates
    down to ≤ |supplier| rows before any join."""
    lineitem = (load(spark, sf_dir, "lineitem")
                .filter((F.col("l_shipdate") >= F.lit("1996-01-01"))
                        & (F.col("l_shipdate") < F.lit("1997-01-01"))))
    part = load(spark, sf_dir, "part").select("p_partkey", "p_type")
    supplier = load(spark, sf_dir, "supplier")
    heavy = (lineitem
             .join(F.broadcast(part.filter(F.col("p_type") == "PROMO")),
                   F.col("l_partkey") == F.col("p_partkey"))
             .groupBy("l_suppkey")
             .agg(F.sum("l_quantity").alias("promo_qty"))
             .filter(F.col("promo_qty") > 300))
    return (supplier
            .join(heavy, F.col("s_suppkey") == F.col("l_suppkey"),
                  "left_semi")
            .select("s_suppkey", "s_name",
                    F.round("s_acctbal", 4).alias("acctbal")))


PROMOTION_SUPPLIERS_SQL = """
SELECT s_suppkey, s_name, round(s_acctbal, 4) AS acctbal
FROM supplier
WHERE s_suppkey IN (
    SELECT l_suppkey
    FROM lineitem
    JOIN part ON l_partkey = p_partkey
    WHERE p_type = 'PROMO'
      AND l_shipdate >= TIMESTAMP '1996-01-01'
      AND l_shipdate <  TIMESTAMP '1997-01-01'
    GROUP BY l_suppkey
    HAVING sum(l_quantity) > 300)
"""


def waiting_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q21 shape: suppliers who were the SOLE late shipper on
    finished multi-supplier orders (late = shipped >60 days after the
    order date; the schema has no commit/receipt dates). The classic
    EXISTS / NOT-EXISTS pair is re-expressed as one per-order
    aggregation — distinct-supplier count and the set of late
    suppliers — then orders with exactly one late supplier and ≥2
    suppliers total credit that supplier's late lines. One lineitem
    shuffle on orderkey replaces two correlated self-joins; the oracle
    keeps the textbook EXISTS form, so the rewrite is verified
    equivalent.

    Null contract (hostile-TPC-H sweep, round 8): a late line with a
    NULL l_suppkey neither disqualifies the sole late supplier (NULL
    <> k is three-valued false in the oracle's NOT EXISTS) nor counts
    toward their numwait — the late-line count filters to non-null
    suppkeys, because with exactly one non-null late supplier every
    COUNTED late line must be theirs. The original sum(late) counted
    the unknown-supplier lines too and silently inflated numwait."""
    orders = (load(spark, sf_dir, "orders")
              .filter(F.col("o_orderstatus") == "F")
              .select("o_orderkey", "o_orderdate"))
    lineitem = load(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_suppkey", "l_shipdate")
    supplier = load(spark, sf_dir, "supplier").select("s_suppkey", "s_name")
    lo = (lineitem
          .join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
          .withColumn("late",
                      F.col("l_shipdate")
                      > F.col("o_orderdate") + F.expr("INTERVAL 60 DAYS")))
    # size(collect_set) instead of count_distinct (r12 optimization
    # round): a distinct aggregate mixed with non-distinct ones makes
    # Catalyst Expand every joined lineitem row ×2 through the
    # per-order hash-aggregate; collect_set computes the same value
    # (both ignore NULLs) in the single pass the late-supplier set
    # already pays, and per-order group sizes are bounded (≤ lines per
    # order), so the set buffer is as safe as late_supps below.
    per_order = (lo.groupBy("l_orderkey")
                 .agg(F.size(F.collect_set("l_suppkey")).alias("n_supp"),
                      F.collect_set(F.when(F.col("late"),
                                           F.col("l_suppkey")))
                      .alias("late_supps"),
                      # non-null suppkey only: an unknown-supplier late
                      # line must not credit the sole late supplier
                      F.sum(F.when(F.col("late")
                                   & F.col("l_suppkey").isNotNull(), 1)
                            .otherwise(0))
                      .alias("n_late_lines")))
    qual = (per_order
            .filter((F.size("late_supps") == 1) & (F.col("n_supp") >= 2))
            .select(F.col("late_supps")[0].alias("late_supp"),
                    "n_late_lines"))
    return (qual.groupBy("late_supp")
            .agg(F.sum("n_late_lines").alias("numwait"))
            .join(F.broadcast(supplier),
                  F.col("late_supp") == F.col("s_suppkey"))
            .select("s_name", "numwait")
            # suppkey tiebreak: grouping is per supplier KEY on both
            # engines (two suppliers sharing a name stay two rows), so
            # the LIMIT boundary must also break ties on the key
            .orderBy(F.desc("numwait"), F.asc("s_name"),
                     F.asc("late_supp"))
            .limit(20))


WAITING_SUPPLIERS_SQL = """
WITH per_supp AS (
  SELECT l1.l_suppkey AS k, count(*) AS numwait
  FROM lineitem l1
  JOIN orders ON o_orderkey = l1.l_orderkey
  WHERE o_orderstatus = 'F'
    AND l1.l_shipdate > o_orderdate + INTERVAL 60 DAY
    AND EXISTS (SELECT 1 FROM lineitem l2
                WHERE l2.l_orderkey = l1.l_orderkey
                  AND l2.l_suppkey <> l1.l_suppkey)
    AND NOT EXISTS (SELECT 1 FROM lineitem l3
                    WHERE l3.l_orderkey = l1.l_orderkey
                      AND l3.l_suppkey <> l1.l_suppkey
                      AND l3.l_shipdate > o_orderdate + INTERVAL 60 DAY)
  GROUP BY l1.l_suppkey
)
SELECT s_name, numwait
FROM per_supp JOIN supplier ON s_suppkey = k
ORDER BY numwait DESC, s_name ASC, k ASC
LIMIT 20
"""


def important_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q11 shape (adapted — shipped value per part standing in for
    partsupp stock value): parts whose total shipped value exceeds a
    fixed fraction of the corpus-wide total — a scalar subquery inside
    HAVING. The global total rides as attach_scalar_agg's broadcast
    single-row cross join over the per-part aggregate, so the fact
    table is scanned and aggregated once."""
    from spark_ext_spark.functions import attach_scalar_agg
    lineitem = load(spark, sf_dir, "lineitem")
    per_part = (lineitem
                .groupBy("l_partkey")
                .agg(F.sum(F.col("l_extendedprice")
                           * F.col("l_quantity")).alias("value")))
    return (attach_scalar_agg(per_part, {"total": F.sum("value")})
            # round BOTH comparison sides (Q15 discipline): the raw
            # sums are partition-order-dependent float accumulations,
            # so an unrounded > could flip membership cross-engine
            .filter(F.round(F.col("value"), 4)
                    > F.round(F.lit(0.0008) * F.col("total"), 4))
            .select("l_partkey", F.round("value", 4).alias("part_value")))


IMPORTANT_PARTS_SQL = """
SELECT l_partkey, round(value, 4) AS part_value
FROM (SELECT l_partkey, sum(l_extendedprice * l_quantity) AS value
      FROM lineitem GROUP BY l_partkey) p
WHERE round(value, 4) > (SELECT round(0.0008 * sum(l_extendedprice
                                                   * l_quantity), 4)
                         FROM lineitem)
"""


def min_cost_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q2 shape (adapted — observed lineitem unit price stands in for
    ps_supplycost): for each LARGE part, the EUROPE supplier(s) whose
    average unit price equals the per-part minimum among EUROPE
    suppliers. The correlated MIN subquery becomes a per-part window
    minimum filtered on equality of the ROUNDED cost (same float-order
    discipline as Q15). Dimension chain supplier→nation→region is
    broadcast; the (part, supplier) aggregate is the only data-sized
    shuffle."""
    lineitem = load(spark, sf_dir, "lineitem")
    part = (load(spark, sf_dir, "part")
            .filter(F.col("p_type") == "LARGE").select("p_partkey"))
    supplier = load(spark, sf_dir, "supplier").select(
        "s_suppkey", "s_name", "s_nationkey")
    nation = load(spark, sf_dir, "nation")
    region = load(spark, sf_dir, "region")
    euro_supp = (supplier
                 .join(F.broadcast(nation),
                       F.col("s_nationkey") == F.col("n_nationkey"))
                 .join(F.broadcast(region),
                       F.col("n_regionkey") == F.col("r_regionkey"))
                 .filter(F.col("r_name") == "EUROPE")
                 .select("s_suppkey", "s_name"))
    # 1e-6-lattice average (relational._lattice_avg_4dp rationale): a
    # bare round(avg(ratio), 4) is order-dependent double summation
    # and flips on .00005 half-grid averages at sf0.1 group sizes —
    # worse here than a value drift, since the min-cost equality join
    # then includes/excludes whole suppliers nondeterministically.
    from spark_ext_spark.plans.relational import _lattice_avg_4dp
    ratio = F.col("l_extendedprice") / F.col("l_quantity")
    ps = (lineitem.groupBy("l_partkey", "l_suppkey")
          .agg(_lattice_avg_4dp(ratio, alias="unit_cost")))
    cand = (ps
            .join(F.broadcast(part), F.col("l_partkey") == F.col("p_partkey"))
            .join(F.broadcast(euro_supp),
                  F.col("l_suppkey") == F.col("s_suppkey")))
    # per-part minimum as a window over the candidate rows instead of a
    # groupBy + equality self-join back (r12 optimization round): same
    # kept rows — a candidate survives iff its rounded unit_cost equals
    # its part's minimum — with one partition-keyed exchange where the
    # join-back plan paid the min-aggregate exchange PLUS a (partkey,
    # cost)-keyed shuffle of cand and a sort-merge join.
    w_part = Window.partitionBy("l_partkey")
    return (cand
            .withColumn("__min_cost", F.min("unit_cost").over(w_part))
            .filter(F.col("unit_cost") == F.col("__min_cost"))
            .select(F.col("l_partkey").alias("p_partkey"),
                    F.col("l_suppkey").alias("s_suppkey"),
                    "s_name", "unit_cost"))


MIN_COST_SUPPLIER_SQL = f"""
WITH ps AS (
  -- 1e-6-lattice average, the shared oracle builder mirroring the
  -- Spark side op-for-op (relational._lattice_avg_4dp)
  SELECT l_partkey, l_suppkey,
         {_lattice_avg_4dp_sql('l_extendedprice / l_quantity')}
           AS unit_cost
  FROM lineitem GROUP BY 1, 2
),
euro AS (
  SELECT s_suppkey, s_name
  FROM supplier
  JOIN nation ON s_nationkey = n_nationkey
  JOIN region ON n_regionkey = r_regionkey
  WHERE r_name = 'EUROPE'
),
cand AS (
  SELECT l_partkey, l_suppkey, s_name, unit_cost
  FROM ps
  JOIN part ON p_partkey = l_partkey AND p_type = 'LARGE'
  JOIN euro ON s_suppkey = l_suppkey
)
SELECT l_partkey AS p_partkey, l_suppkey AS s_suppkey, s_name, unit_cost
FROM cand c
WHERE unit_cost = (SELECT min(c2.unit_cost) FROM cand c2
                   WHERE c2.l_partkey = c.l_partkey)
"""


def parts_supplier_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q16 shape (adapted): distinct-supplier counts per (brand, type,
    size) part class, excluding one brand and suppliers with negative
    balances (the NOT IN subquery → a broadcast LEFT ANTI join on the
    tiny excluded-supplier set).

    NULL contract, pinned EXPLICITLY on both engines because LEFT ANTI
    and SQL ``NOT IN`` disagree on every null pattern: a NULL
    l_suppkey row passes an anti join (null matches nothing → kept,
    minting a phantom zero-count group) but fails ``NOT IN`` (NULL
    comparison → not true → filtered); and one NULL key in the
    exclusion subquery EMPTIES a ``NOT IN`` entirely while the anti
    join ignores it. Unknown-supplier lines can't be attributed, so
    both sides drop null l_suppkey rows and null exclusion keys —
    after which the two formulations are equivalent by construction
    (regression: tests/test_adversarial_inputs.py
    test_null_suppkey_not_in_contract)."""
    lineitem = (load(spark, sf_dir, "lineitem")
                .filter(F.col("l_suppkey").isNotNull())
                .select("l_partkey", "l_suppkey"))
    part = (load(spark, sf_dir, "part")
            .filter((F.col("p_brand") != "Brand#1")
                    & F.col("p_size").isin(1, 5, 9, 14, 20))
            .select("p_partkey", "p_brand", "p_type", "p_size"))
    bad = (load(spark, sf_dir, "supplier")
           .filter((F.col("s_acctbal") < 0)
                   & F.col("s_suppkey").isNotNull())
           .select("s_suppkey"))
    return (lineitem
            .join(F.broadcast(bad),
                  F.col("l_suppkey") == F.col("s_suppkey"), "left_anti")
            .join(F.broadcast(part),
                  F.col("l_partkey") == F.col("p_partkey"))
            .groupBy("p_brand", "p_type", "p_size")
            .agg(F.count_distinct("l_suppkey").alias("supplier_cnt")))


PARTS_SUPPLIER_COUNTS_SQL = """
SELECT p_brand, p_type, p_size,
       count(DISTINCT l_suppkey) AS supplier_cnt
FROM lineitem
JOIN part ON p_partkey = l_partkey
WHERE p_brand <> 'Brand#1'
  AND p_size IN (1, 5, 9, 14, 20)
  -- null contract pinned on both engines (see parts_supplier_counts):
  -- unattributable lines and null exclusion keys are dropped, which
  -- makes NOT IN and the Spark LEFT ANTI equivalent by construction
  AND l_suppkey IS NOT NULL
  AND l_suppkey NOT IN (SELECT s_suppkey FROM supplier
                        WHERE s_acctbal < 0
                          AND s_suppkey IS NOT NULL)
GROUP BY p_brand, p_type, p_size
"""
