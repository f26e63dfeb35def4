"""Reusable logical-plan builders for the engine's headline queries.

Each builder takes ``(spark, sf_dir)``, loads driver-generated parquet
(TESTDATA.md tables) and returns a lazy DataFrame. These are the
queries wired into ``__spark_entry__.py:queries()`` and benched by
``bench.py`` — kept here so tests, bench, and the driver contract share
one definition.

Oracle-matching rules (driver compares vs DuckDB):
- every computed column is aliased identically in Spark and SQL;
- double aggregates are rounded to 4 decimals on BOTH sides (different
  summation orders make raw float sums differ in ULPs across engines);
- collected arrays are sorted on both sides (collection order is
  unspecified in both engines).
"""

from spark_ext_spark.plans import relational  # noqa: F401
