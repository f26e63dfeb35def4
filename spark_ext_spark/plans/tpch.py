"""TPC-H-shaped analytical queries over the synthetic star schema.

These exercise the join-planning surface the reference covers with its
relational operators (reference: src/queries/*.sql test corpus shapes):
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

from spark_ext_spark.plans.relational import load

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
    avg_bal = (customer.filter(F.col("c_acctbal") > 0)
               .agg(F.avg("c_acctbal").alias("avg_bal")))
    rich = (customer.crossJoin(F.broadcast(avg_bal))
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
WHERE c_acctbal > (SELECT avg(c_acctbal) FROM customer WHERE c_acctbal > 0)
  AND NOT EXISTS (SELECT 1 FROM orders
                  WHERE o_custkey = c_custkey
                    AND o_orderpriority = '1-URGENT')
GROUP BY c_nationkey
"""
