"""As-of join — for each left row, the latest right row with
``right_ts <= left_ts`` per key (the time-series point-in-time join
Spark lacks as a built-in).

Spark-first implementation (no per-row subqueries, no range
cross-join): union the two sides tagged by origin, sort within each
key by (ts, right-before-left on ties), and carry the latest right
ROW forward as a single struct with ``last(..., ignorenulls=True)``
over an unbounded-preceding window. One shuffle on the key — the same
cost as a plain equi-join — and skew behaves like any keyed window.

Carrying one struct (not one window per value column) is load-bearing
for semantics, not just cost: all values come from the SAME right row,
and a genuinely NULL value in the latest right row stays NULL —
per-column ``last(ignorenulls)`` would skip it and resurrect a stale
older value (and could mix columns from different right rows). The
struct is non-null for every right row even when all its fields are
null, so ``ignorenulls`` only skips the left-row placeholders.

Matches DuckDB/kdb ASOF JOIN semantics (inclusive: a right row at
exactly left_ts matches). Right rows tied on (key, ts) are broken
deterministically — by the value struct's field order (greatest wins)
when the struct is orderable, else by a hash of its JSON form
(arbitrary but stable) so map-/variant-typed value columns don't make
the whole join unplannable — so task retries and re-runs reproduce
the same output; DuckDB itself leaves this case undefined.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import ArrayType, DataType, MapType, StructType
from pyspark.sql.window import Window


def _orderable(dt: DataType) -> bool:
    """Whether Spark can sort on this type (maps and variants cannot
    be ORDER BY keys; containers are orderable iff their elements
    are)."""
    if isinstance(dt, MapType) or type(dt).__name__ == "VariantType":
        return False
    if isinstance(dt, StructType):
        return all(_orderable(f.dataType) for f in dt.fields)
    if isinstance(dt, ArrayType):
        return _orderable(dt.elementType)
    return True


def _tiebreak(struct_col: Column, struct_t: DataType) -> Column:
    """Deterministic total order over right rows tied on (key, ts):
    the struct itself when orderable (meaningful: greatest value
    tuple wins), else a stable content hash (arbitrary but
    partition-/retry-independent). Left rows carry a NULL struct —
    their mutual order is irrelevant (they don't read each other)."""
    if _orderable(struct_t):
        return struct_col
    return F.xxhash64(F.to_json(struct_col))


def asof_join(left: DataFrame, right: DataFrame, on: str,
              left_ts: str, right_ts: str,
              value_cols: list[str] | None = None,
              right_on: str | None = None,
              suffix: str = "_asof") -> DataFrame:
    """Append, to every left row, ``value_cols`` (default: all non-key,
    non-ts right columns) from the latest right row at or before the
    left row's timestamp; nulls when no prior right row exists."""
    right_key = right_on or on
    if value_cols is None:
        value_cols = [c for c in right.columns
                      if c not in (right_key, right_ts)]

    r_struct_t = right.select(
        F.struct(*[F.col(c) for c in value_cols]).alias("__r")
    ).schema["__r"].dataType
    l_tagged = left.select(
        F.col(on).alias("__key"),
        F.col(left_ts).alias("__ts"),
        F.lit(1).alias("__side"),                      # left sorts AFTER
        F.struct(*[F.col(c) for c in left.columns]).alias("__l"),
        F.lit(None).cast(r_struct_t).alias("__r"))
    r_tagged = right.select(
        F.col(right_key).alias("__key"),
        F.col(right_ts).alias("__ts"),
        F.lit(0).alias("__side"),                      # right sorts FIRST
        F.lit(None).cast(
            l_tagged.schema["__l"].dataType).alias("__l"),
        F.struct(*[F.col(c) for c in value_cols]).alias("__r"))

    unioned = l_tagged.unionByName(r_tagged)
    # right rows at the same ts sort before left rows → inclusive
    # match; the trailing tiebreak orders right rows tied on
    # (key, ts) deterministically
    w = (Window.partitionBy("__key")
         .orderBy("__ts", "__side",
                  _tiebreak(F.col("__r"), r_struct_t))
         .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    carried = unioned.select(
        "__side", "__l",
        F.last("__r", ignorenulls=True).over(w).alias("__c"))
    out = carried.filter(F.col("__side") == 1)
    return out.select(
        *[F.col(f"__l.{c}").alias(c) for c in left.columns],
        *[F.col(f"__c.{c}").alias(f"{c}{suffix}") for c in value_cols])
