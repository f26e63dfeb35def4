"""Data-quality profiling and expectation checks — the validation gate
every large ingestion/training pipeline runs before accepting a batch
(the Deequ/Great-Expectations role, expressed as plain aggregates).

Everything is ONE pass over the table: all per-column statistics fold
into a single global aggregate row (count/sum/min/max/approx-distinct
all partial-aggregate), then explode to the (column, metric) report.
No per-column jobs, no driver loops — at 100 TB the profile costs one
scan regardless of how many columns are profiled.

Report rows are built with the Column API (array-of-struct explode),
never interpolated SQL strings — column names and rule values may
contain quotes, spaces, or any other character safely.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["profile_columns", "check_expectations"]

_RULE_KEYS = {"not_null", "unique", "min", "max", "in_set"}


def _report(one: DataFrame, rows: list) -> DataFrame:
    return (one.select(F.explode(F.array(*rows)).alias("r"))
            .select("r.*"))


def profile_columns(df: DataFrame, cols: list[str],
                    exact_distinct: bool = False) -> DataFrame:
    """Per-column profile: row count, null count/rate, distinct count,
    min/max (stringified so mixed types share one schema).

    One aggregate row carries every statistic (single scan, partial
    aggregation).

    Distinct counts are HLL++ approximations (±5% rsd) by default;
    pass ``exact_distinct=True`` for exact cardinalities.

    Why approximate by default: exact distinct counts cost one extra
    single-column pass per profiled column (a k-column profile
    processes k+1× the rows) — the wrong default for a 100 TB
    acceptance gate. Pass ``exact_distinct=True`` when the report
    feeds a reconciliation that needs exact cardinalities and the
    table is small enough to pay the extra passes."""
    if not cols:
        raise ValueError("profile_columns: cols must be non-empty")
    aggs = [F.count(F.lit(1)).alias("__n")]
    for i, c in enumerate(cols):
        col = F.col(c)
        aggs += [
            F.sum(col.isNull().cast("long")).alias(f"__null_{i}"),
            F.min(col).cast("string").alias(f"__min_{i}"),
            F.max(col).cast("string").alias(f"__max_{i}"),
        ]
        if not exact_distinct:
            aggs.append(F.approx_count_distinct(col).alias(f"__dist_{i}"))
    one = df.agg(*aggs)
    if exact_distinct:
        # Per-column two-level distinct (groupBy value → count rows)
        # crossed into the one-row frame, instead of k count_distinct
        # calls in one aggregate. The single-aggregate form makes
        # Catalyst Expand the scan k+1× and push every replica through
        # ONE wide hash-aggregate; the per-column subtrees each scan
        # only their own column (parquet prunes the rest), partial-
        # aggregate map-side to distinct values, and schedule as
        # independent stages of the same job. Same exact counts —
        # count_distinct ignores NULLs, so the NULL group is filtered
        # before counting. Total rows read stay k+1× the table (the
        # documented exact-mode price); bytes read DROP from k+1 full
        # stripes to one wide scan + k single columns.
        for i, c in enumerate(cols):
            d = (df.select(F.col(c).alias("__v"))
                 .where(F.col("__v").isNotNull())
                 .distinct()
                 .agg(F.count(F.lit(1)).alias(f"__dist_{i}")))
            one = one.crossJoin(F.broadcast(d))
    rows = [F.struct(
        F.lit(c).alias("column"),
        F.col("__n").alias("n_rows"),
        F.col(f"__null_{i}").alias("n_null"),
        F.round(F.col(f"__null_{i}") / F.col("__n"), 6).alias("null_rate"),
        F.col(f"__dist_{i}").alias("n_distinct"),
        F.col(f"__min_{i}").alias("min_value"),
        F.col(f"__max_{i}").alias("max_value"),
    ) for i, c in enumerate(cols)]
    return _report(one, rows)


def check_expectations(df: DataFrame, rules: dict[str, dict]) -> DataFrame:
    """Evaluate expectation rules per column, one scan, returning the
    (column, rule, ok, observed) report. Supported rules:

    - ``not_null``: no null values;
    - ``unique``: distinct count == non-null count;
    - ``min`` / ``max``: bounds on observed min/max;
    - ``in_set``: every non-null value within the given list.

    Unknown rule keys raise (a typo must fail loudly, not produce a
    silently-empty report). Callers gate the batch on
    ``report.filter(~col("ok")).count() == 0`` — one job over the
    one-row aggregate.

    ``ok`` is never NULL — SQL tri-state would slip through the gate
    (``~NULL`` filters out). Violation-count rules treat an empty
    table as 0 violations (vacuous pass); ``min``/``max`` on a column
    with NO observed values FAIL CLOSED (observed shows NULL): a bound
    you wrote about values that never arrived is a data problem the
    gate must surface, not silently wave past."""
    aggs = [F.count(F.lit(1)).alias("__n")]
    rows = []

    def add(col_name: str, rule: str, ok, observed) -> None:
        rows.append(F.struct(
            F.lit(col_name).alias("column"), F.lit(rule).alias("rule"),
            F.coalesce(ok, F.lit(False)).alias("ok"),
            observed.cast("string").alias("observed")))

    for i, (c, spec) in enumerate(rules.items()):
        unknown = set(spec) - _RULE_KEYS
        if unknown:
            raise ValueError(
                f"check_expectations: unknown rule(s) {sorted(unknown)} "
                f"for column {c!r}; supported: {sorted(_RULE_KEYS)}")
        col = F.col(c)
        if spec.get("not_null"):
            aggs.append(F.coalesce(F.sum(col.isNull().cast("long")),
                                   F.lit(0)).alias(f"__nn_{i}"))
            add(c, "not_null", F.col(f"__nn_{i}") == 0, F.col(f"__nn_{i}"))
        if spec.get("unique"):
            aggs.append(F.count_distinct(col).alias(f"__ud_{i}"))
            aggs.append(F.count(col).alias(f"__uc_{i}"))
            add(c, "unique", F.col(f"__ud_{i}") == F.col(f"__uc_{i}"),
                F.col(f"__uc_{i}") - F.col(f"__ud_{i}"))
        if "min" in spec:
            aggs.append(F.min(col).alias(f"__mn_{i}"))
            add(c, "min", F.col(f"__mn_{i}") >= F.lit(spec["min"]),
                F.col(f"__mn_{i}"))
        if "max" in spec:
            aggs.append(F.max(col).alias(f"__mx_{i}"))
            add(c, "max", F.col(f"__mx_{i}") <= F.lit(spec["max"]),
                F.col(f"__mx_{i}"))
        if "in_set" in spec:
            allowed = list(spec["in_set"])
            aggs.append(F.coalesce(
                F.sum((~col.isin(allowed) & col.isNotNull())
                      .cast("long")), F.lit(0)).alias(f"__os_{i}"))
            label = "in_set[" + "|".join(str(v) for v in allowed) + "]"
            add(c, label, F.col(f"__os_{i}") == 0, F.col(f"__os_{i}"))
    if not rows:
        raise ValueError("check_expectations: no supported rules given")
    one = df.agg(*aggs)
    return _report(one, rows)
