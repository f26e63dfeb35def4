"""Local replica of the driver's DuckDB-oracle comparison.

Runs a queries()[name] DataFrame and the matching oracle_sql()[name]
through DuckDB on the same parquet tables, then compares row count,
column names, and (row-sorted, float-tolerant) values. This is our
pre-flight for CORRECTNESS_r{N}.json — every declared query must pass
here before it ships.
"""

from __future__ import annotations

import math
from decimal import Decimal

import duckdb

TABLES = ("region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings")


def duck_connection(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    return con


def _norm(v):
    """Normalize a cell for order-insensitive comparison."""
    if v is None:
        return ("none",)
    if isinstance(v, Decimal):
        v = float(v)
    if isinstance(v, float):
        if math.isnan(v):
            return ("nan",)
        return ("f", round(v, 6))
    if hasattr(v, "asDict"):  # pyspark Row (struct) — tuple subclass,
        return ("struct",     # so this must precede the list branch
                tuple((k, _norm(x)) for k, x in sorted(v.asDict().items())))
    if isinstance(v, (list, tuple)):
        return ("list", tuple(_norm(x) for x in v))
    if isinstance(v, dict):  # duckdb struct
        return ("struct", tuple((k, _norm(x)) for k, x in sorted(v.items())))
    if hasattr(v, "isoformat"):
        return ("ts", v.isoformat())
    return (type(v).__name__, v)


def compare_to_oracle(spark_df, con, sql: str) -> None:
    """Assert the Spark DataFrame and the DuckDB result agree."""
    cols = list(spark_df.columns)
    spark_rows = [tuple(_norm(row[c]) for c in sorted(cols))
                  for row in spark_df.collect()]
    res = con.execute(sql)
    duck_cols = [d[0] for d in res.description]
    assert sorted(cols) == sorted(duck_cols), (
        f"column mismatch: spark={sorted(cols)} duck={sorted(duck_cols)}")
    idx = [duck_cols.index(c) for c in sorted(duck_cols)]
    duck_rows = [tuple(_norm(row[i]) for i in idx) for row in res.fetchall()]
    assert len(spark_rows) == len(duck_rows), (
        f"row count mismatch: spark={len(spark_rows)} duck={len(duck_rows)}")
    assert sorted(spark_rows) == sorted(duck_rows), "value mismatch"
