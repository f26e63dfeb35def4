"""Data-quality profiling and expectation checks — the validation gate
every large ingestion/training pipeline runs before accepting a batch
(the Deequ/Great-Expectations role, expressed as plain aggregates).

Everything is ONE pass over the table: all per-column statistics fold
into a single global aggregate row (count/sum/min/max/approx-distinct
all partial-aggregate), then unpivot to the (column, metric) report.
No per-column jobs, no driver loops — at 100 TB the profile costs one
scan regardless of how many columns are profiled.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["profile_columns", "check_expectations"]


def profile_columns(df: DataFrame, cols: list[str],
                    exact_distinct: bool = True) -> DataFrame:
    """Per-column profile: row count, null count/rate, distinct count,
    min/max (stringified so mixed types share one schema).

    One aggregate row carries every statistic (single scan, partial
    aggregation); the unpivot to (column, ...) rows is driver-free
    stack(). ``exact_distinct=False`` swaps count_distinct for the
    HLL++ approx — at 100 TB exact distinct on a high-cardinality
    column is its own shuffle per column, the sketch is one pass."""
    aggs = [F.count(F.lit(1)).alias("__n")]
    for c in cols:
        col = F.col(c)
        distinct = (F.count_distinct(col) if exact_distinct
                    else F.approx_count_distinct(col))
        aggs += [
            F.sum(col.isNull().cast("long")).alias(f"__null_{c}"),
            distinct.alias(f"__dist_{c}"),
            F.min(col).cast("string").alias(f"__min_{c}"),
            F.max(col).cast("string").alias(f"__max_{c}"),
        ]
    one = df.agg(*aggs)
    stack = ", ".join(
        f"'{c}', __null_{c}, __dist_{c}, __min_{c}, __max_{c}"
        for c in cols)
    return one.selectExpr(
        "__n AS n_rows",
        f"stack({len(cols)}, {stack}) AS "
        "(column, n_null, n_distinct, min_value, max_value)"
    ).select(
        "column", "n_rows", "n_null",
        F.round(F.col("n_null") / F.col("n_rows"), 6).alias("null_rate"),
        "n_distinct", "min_value", "max_value")


def check_expectations(df: DataFrame, rules: dict[str, dict]) -> DataFrame:
    """Evaluate expectation rules per column, one scan, returning the
    (column, rule, ok, observed) report. Supported rules:

    - ``not_null``: no null values;
    - ``unique``: distinct count == non-null count;
    - ``min`` / ``max``: numeric bounds on observed min/max;
    - ``in_set``: every non-null value within the given list.

    Callers gate the batch on ``report.filter(~col("ok")).count() == 0``
    — still a single job over the one-row aggregate."""
    aggs = [F.count(F.lit(1)).alias("__n")]
    checks: list[tuple[str, str, str, str]] = []  # col, rule, okcol, obscol
    for c, spec in rules.items():
        col = F.col(c)
        if spec.get("not_null"):
            aggs.append(F.sum(col.isNull().cast("long")).alias(f"__nn_{c}"))
            checks.append((c, "not_null", f"__nn_{c} = 0",
                           f"CAST(__nn_{c} AS STRING)"))
        if spec.get("unique"):
            aggs.append(F.count_distinct(col).alias(f"__ud_{c}"))
            aggs.append(F.count(col).alias(f"__uc_{c}"))
            checks.append((c, "unique", f"__ud_{c} = __uc_{c}",
                           f"CAST(__uc_{c} - __ud_{c} AS STRING)"))
        if "min" in spec:
            aggs.append(F.min(col).alias(f"__mn_{c}"))
            checks.append((c, "min", f"__mn_{c} >= {spec['min']!r}",
                           f"CAST(__mn_{c} AS STRING)"))
        if "max" in spec:
            aggs.append(F.max(col).alias(f"__mx_{c}"))
            checks.append((c, "max", f"__mx_{c} <= {spec['max']!r}",
                           f"CAST(__mx_{c} AS STRING)"))
        if "in_set" in spec:
            # rule label kept quote-free: it is embedded in stack()'s
            # SQL string literal below
            lits = "|".join(str(v) for v in spec["in_set"])
            aggs.append(F.sum((~col.isin(list(spec["in_set"]))
                               & col.isNotNull()).cast("long"))
                        .alias(f"__os_{c}"))
            checks.append((c, f"in_set[{lits}]", f"__os_{c} = 0",
                           f"CAST(__os_{c} AS STRING)"))
    one = df.agg(*aggs)
    stack = ", ".join(f"'{c}', '{rule}', {ok}, {obs}"
                      for c, rule, ok, obs in checks)
    return one.selectExpr(
        f"stack({len(checks)}, {stack}) AS (column, rule, ok, observed)")
