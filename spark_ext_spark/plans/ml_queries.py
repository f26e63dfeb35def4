"""ML-operator headline queries (S2 cell math, iterative LR training).

s2_cells is oracle-checked: the full S2 pipeline — trig, face/UV/ST,
and the 8-round Hilbert lookup loop — replays in DuckDB (see
_s2_cells_oracle). local_lr_model stays rows-only (iterative
optimizer); its golden-value correctness lives in
tests/test_classification.py."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from spark_ext_spark.operators.classification import LocalLogisticRegression
from spark_ext_spark.operators.s2cell import S2CellTransformer
from spark_ext_spark.plans.relational import load


def s2_cells(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S2CellTransformer (A6) over synthetic-but-deterministic lat/lon
    derived from customer keys; groups customers per level-4 cell."""
    cust = load(spark, sf_dir, "customer")
    geo = cust.select(
        "c_custkey",
        ((F.col("c_custkey") % 160) - 80 + 0.5).cast("double").alias("lat"),
        (((F.col("c_custkey") * 7) % 360) - 180 + 0.5).cast("double").alias("lon"))
    cells = S2CellTransformer(level=4).transform(geo)
    return (cells.groupBy("cell")
            .agg(F.count(F.lit(1)).alias("n_customers"))
            .orderBy("cell"))


def _s2_cells_oracle(level: int = 4) -> str:
    """DuckDB replica of the FULL s2_cells pipeline — no golden
    pinning, the oracle computes tokens from scratch:

    lat/lon → XYZ (cos/sin; glibc libm on both engines, verified
    bit-identical) → argmax face (+3 when the dominant component is
    negative; ties break to the lower axis exactly like np.argmax) →
    per-face (u,v) → quadratic ST (same operand order as
    functions/s2.py, so sqrt rounding matches IEEE-exactly) → 30-bit
    (i,j) → 8 unrolled Hilbert lookup rounds against the canonical
    4096-entry traversal table (shipped as a list literal; the same
    _LOOKUP_POS the Spark UDF uses) → 64-bit id (UBIGINT; multiplies
    stand in for left shifts because DuckDB's << overflows above
    2^63) → parent(level) → hex token with trailing zeros stripped.

    Leaf-level trig ULP noise cannot flip a level-4 parent unless a
    point sits within ~2^-26 of a cell boundary; the half-degree
    synthetic grid never does, and the Hilbert/bit stages are exact
    integer ops. Verified 0 mismatches vs the scalar cell_token at
    sf0.001 and sf0.01."""
    from spark_ext_spark.functions.s2 import _LOOKUP_POS
    lut = ", ".join(str(v) for v in _LOOKUP_POS)
    new_lsb = 1 << (2 * (30 - level))
    iters = []
    prev = "h8"
    for k in range(7, -1, -1):
        cur = f"h{k}"
        iters.append(f"""{cur} AS (
  SELECT c_custkey, i, j,
         n | (CAST(t >> 2 AS UBIGINT)
              * CAST({1 << (k * 8)} AS UBIGINT)) AS n,
         t & 3 AS bits
  FROM (
    SELECT c_custkey, i, j, n,
           l[CAST(bits + (((i >> {k * 4}) & 15) << 6)
                       + (((j >> {k * 4}) & 15) << 2) AS BIGINT) + 1] AS t
    FROM {prev} CROSS JOIN lut)
)""")
        prev = cur
    return f"""
WITH lut AS (SELECT [{lut}] AS l),
geo AS (
  SELECT c_custkey,
         CAST((c_custkey % 160) - 80 + 0.5 AS DOUBLE) AS lat,
         CAST(((c_custkey * 7) % 360) - 180 + 0.5 AS DOUBLE) AS lon
  FROM customer
),
xyz AS (
  SELECT c_custkey,
         cos(radians(lat)) * cos(radians(lon)) AS x,
         cos(radians(lat)) * sin(radians(lon)) AS y,
         sin(radians(lat)) AS z
  FROM geo
),
fa AS (
  SELECT c_custkey, x, y, z,
         CASE WHEN abs(x) >= abs(y) AND abs(x) >= abs(z) THEN 0
              WHEN abs(y) >= abs(z) THEN 1 ELSE 2 END AS axis
  FROM xyz
),
fb AS (
  SELECT c_custkey, x, y, z,
         CASE WHEN (CASE axis WHEN 0 THEN x WHEN 1 THEN y ELSE z END) < 0
              THEN axis + 3 ELSE axis END AS face
  FROM fa
),
uv AS (
  SELECT c_custkey, face,
         CASE face WHEN 0 THEN y / x WHEN 1 THEN -x / y WHEN 2 THEN -x / z
                   WHEN 3 THEN z / x WHEN 4 THEN z / y ELSE -y / z END AS u,
         CASE face WHEN 0 THEN z / x WHEN 1 THEN z / y WHEN 2 THEN -y / z
                   WHEN 3 THEN y / x WHEN 4 THEN -x / y ELSE -x / z END AS v
  FROM fb
),
st AS (
  SELECT c_custkey, face,
         CASE WHEN u >= 0 THEN 0.5 * sqrt(1 + 3 * u)
              ELSE 1 - 0.5 * sqrt(1 - 3 * u) END AS s,
         CASE WHEN v >= 0 THEN 0.5 * sqrt(1 + 3 * v)
              ELSE 1 - 0.5 * sqrt(1 - 3 * v) END AS t
  FROM uv
),
ij AS (
  SELECT c_custkey, face,
         least(1073741823, greatest(0,
             CAST(floor(s * 1073741824) AS BIGINT))) AS i,
         least(1073741823, greatest(0,
             CAST(floor(t * 1073741824) AS BIGINT))) AS j
  FROM st
),
h8 AS (
  SELECT c_custkey, i, j,
         CAST(face AS UBIGINT) * CAST({1 << 60} AS UBIGINT) AS n,
         CAST(face & 1 AS BIGINT) AS bits
  FROM ij
),
{",".join(iters)},
ids AS (
  SELECT c_custkey, n * CAST(2 AS UBIGINT) + CAST(1 AS UBIGINT) AS id
  FROM h0
),
parents AS (
  SELECT c_custkey,
         (id & ~CAST({new_lsb - 1} AS UBIGINT))
           | CAST({new_lsb} AS UBIGINT) AS pid
  FROM ids
),
tokens AS (
  SELECT c_custkey,
         coalesce(nullif(rtrim(lower(lpad(hex(pid), 16, '0')), '0'), ''),
                  'X') AS cell
  FROM parents
)
SELECT cell, count(*) AS n_customers FROM tokens GROUP BY cell
"""


S2_CELLS_SQL = _s2_cells_oracle()


def local_lr_model(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LocalLogisticRegression (A12): per-user features from events
    (gathered value sums), label = 'did the user ever purchase';
    returns the fitted coefficients — deterministic FISTA training
    inside a single task."""
    from pyspark.ml.feature import VectorAssembler

    ev = load(spark, sf_dir, "events")
    feats = (ev.groupBy("user_id")
             .agg(F.sum(F.when(F.col("event_type") == "view", F.col("value"))
                        .otherwise(0.0)).alias("view_value"),
                  F.sum(F.when(F.col("event_type") == "click", F.col("value"))
                        .otherwise(0.0)).alias("click_value"),
                  F.count(F.lit(1)).cast("double").alias("n_events"),
                  F.max(F.when(F.col("event_type") == "purchase", 1.0)
                        .otherwise(0.0)).alias("label")))
    assembled = VectorAssembler(
        inputCols=["view_value", "click_value", "n_events"],
        outputCol="features").transform(feats).coalesce(1)
    model = LocalLogisticRegression(regParam=0.01, elasticNetParam=0.5,
                                    maxIter=200).fit(assembled)
    coefs = [float(c) for c in model.coefficients]
    return spark.createDataFrame(
        [(round(model.intercept, 3), *[round(c, 3) for c in coefs])],
        "intercept double, w_view double, w_click double, w_events double")
