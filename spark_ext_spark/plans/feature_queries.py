"""Feature-operator headline queries with full-pipeline SQL oracles.

Each query runs gather → GatherEncoder fit → exploded encode over
``events``, and the oracle replays the IDENTICAL math in ANSI SQL
(counts → deterministic order count DESC/key ASC → threshold → slot
assignment → join-encode). Thresholds are computed from the data inside
the SQL, so the oracle holds at every scale factor.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from spark_ext_spark.operators.binning import Binning
from spark_ext_spark.operators.downsampling import Downsampling
from spark_ext_spark.operators.gather import Gather
from spark_ext_spark.operators.gather_encoder import GatherEncoder
from spark_ext_spark.operators.indexer import StringToShortIndexer
from spark_ext_spark.plans.relational import load


def _gathered(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events")
    return Gather(primaryKeyCols=["user_id"], keyCol="event_type",
                  valueCol="value", valueAgg="sum",
                  outputCol="gathered").transform(ev)


def _encode(spark, sf_dir, **encoder_kw) -> DataFrame:
    # fit (2 jobs) and transform both consume the gathered table —
    # cache it so the scan+two-level agg runs once, not three times.
    g = _gathered(spark, sf_dir).cache()
    enc = GatherEncoder(inputCol="gathered", outputCol="features",
                        keyCol="event_type", valueCol="value", **encoder_kw)
    model = enc.fit(g)
    out = model.transform_exploded(g, ["user_id"])
    return out.select("user_id", "slot", F.round("value", 4).alias("value"))


def gather_encoder_top(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-coverage 75% dictionary, no all-other slot."""
    return _encode(spark, sf_dir, transformation="top", cover=75.0,
                   allOther=False)


def gather_encoder_top_allother(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-coverage 75% dictionary with trailing all-other slot."""
    return _encode(spark, sf_dir, transformation="top", cover=75.0,
                   allOther=True)


def gather_encoder_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Min-support 15% dictionary."""
    return _encode(spark, sf_dir, transformation="index", support=15.0,
                   allOther=False)


_GATHER_CTE = """
WITH gathered AS (
  SELECT user_id, event_type, sum(value) AS value
  FROM events GROUP BY user_id, event_type
),
counts AS (
  -- NULL keys are not fittable features (operator contract: excluded
  -- from the dictionary, its slot order, and the coverage/support
  -- denominators — see GatherEncoder.key_counts)
  SELECT event_type AS key, count(*) AS cnt FROM gathered
  WHERE event_type IS NOT NULL GROUP BY 1
)
"""

GATHER_ENCODER_TOP_SQL = _GATHER_CTE + """
, selected AS (
  SELECT key,
         row_number() OVER (ORDER BY cnt DESC, key ASC) - 1 AS slot
  FROM (
    SELECT key, cnt,
           coalesce(sum(cnt) OVER (ORDER BY cnt DESC, key ASC
             ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS cum
    FROM counts
  )
  WHERE cum < 0.75 * (SELECT sum(cnt) FROM counts)
)
SELECT g.user_id, s.slot, round(g.value, 4) AS value
FROM gathered g JOIN selected s ON g.event_type = s.key
"""

GATHER_ENCODER_TOP_ALLOTHER_SQL = _GATHER_CTE + """
, selected AS (
  SELECT key,
         row_number() OVER (ORDER BY cnt DESC, key ASC) - 1 AS slot
  FROM (
    SELECT key, cnt,
           coalesce(sum(cnt) OVER (ORDER BY cnt DESC, key ASC
             ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS cum
    FROM counts
  )
  WHERE cum < 0.75 * (SELECT sum(cnt) FROM counts)
)
SELECT user_id, slot, round(sum(value), 4) AS value
FROM (
  SELECT g.user_id,
         coalesce(s.slot, (SELECT count(*) FROM selected)) AS slot,
         g.value
  FROM gathered g LEFT JOIN selected s ON g.event_type = s.key
)
GROUP BY user_id, slot
"""

GATHER_ENCODER_INDEX_SQL = _GATHER_CTE + """
, selected AS (
  SELECT key,
         row_number() OVER (ORDER BY cnt DESC, key ASC) - 1 AS slot
  FROM counts
  WHERE cnt >= 0.15 * (SELECT sum(cnt) FROM counts)
)
SELECT g.user_id, s.slot, round(g.value, 4) AS value
FROM gathered g JOIN selected s ON g.event_type = s.key
"""


def string_indexer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """StringToShortIndexer fit + transform over events.event_type
    (A9): every event row tagged with its frequency-ordered index.
    handleInvalid='skip' (drop null/unseen rows) — the oracle's inner
    join drops them too; the default 'error' would crash the Spark
    side on a refresh with one NULL event_type while DuckDB silently
    dropped it."""
    ev = load(spark, sf_dir, "events")
    model = StringToShortIndexer(inputCol="event_type",
                                 outputCol="label_idx",
                                 handleInvalid="skip").fit(ev)
    return (model.transform(ev)
            .select("event_id", "event_type",
                    F.col("label_idx").cast("int").alias("label_idx")))


STRING_INDEXER_SQL = """
WITH dict AS (
  SELECT event_type,
         CAST(row_number() OVER (ORDER BY count(*) DESC, event_type ASC) - 1
              AS INT) AS label_idx
  FROM events WHERE event_type IS NOT NULL GROUP BY event_type
)
SELECT e.event_id, e.event_type, d.label_idx
FROM events e JOIN dict d USING (event_type)
"""


def downsampling_hash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Downsampling (A10/A11) in deterministic hash mode: label
    purchase=1.0, cap secondary:primary at 2.0, sample keyed on
    event_id — exactly replayable in SQL."""
    ev = load(spark, sf_dir, "events")
    labeled = ev.select(
        "event_id",
        F.when(F.col("event_type") == "purchase", 1.0).otherwise(0.0)
         .alias("label"))
    model = Downsampling(labelCol="label", outputCol="w", maxClassRatio=2.0,
                         samplingMode="hash", hashKeyCol="event_id").fit(labeled)
    return (model.transform(labeled)
            .select("event_id", "label", F.round("w", 4).alias("w")))


# Mirrors the operator exactly (downsampling.py):
# - fraction is NULL (no-op model, everything w=1.0) when the class
#   ratio is already within maxClassRatio — the fit only samples when
#   secondary/primary > 2.0;
# - the Knuth hash uses the operator's overflow-free split-multiply
#   ((K·hi mod 2^16)·2^16 + K·lo) mod 2^32 over pmod(key, 2^32), which
#   is congruent to the naive product but neither overflows BIGINT for
#   snowflake-scale ids nor goes negative for negative ids.
DOWNSAMPLING_HASH_SQL = """
WITH labeled AS (
  SELECT event_id,
         CAST(CASE WHEN event_type = 'purchase' THEN 1.0 ELSE 0.0 END
              AS DOUBLE) AS label,
         ((event_id % 4294967296) + 4294967296) % 4294967296 AS k32
  FROM events
),
hashed AS (
  SELECT event_id, label,
         ((((k32 // 65536) * 2654435761) % 65536) * 65536
          + (k32 % 65536) * 2654435761) % 4294967296 AS h
  FROM labeled
),
stats AS (
  SELECT sum(CASE WHEN label = 1.0 THEN 1 ELSE 0 END) AS p,
         sum(CASE WHEN label = 0.0 THEN 1 ELSE 0 END) AS s
  FROM labeled
),
frac AS (
  SELECT CASE WHEN s > 2.0 * p THEN (p * 2.0) / s END AS fraction
  FROM stats
)
SELECT event_id, label, CAST(1.0 AS DOUBLE) AS w
FROM hashed
WHERE label = 1.0 OR (SELECT fraction FROM frac) IS NULL
UNION ALL
SELECT event_id, label,
       round(1.0 / (SELECT fraction FROM frac), 4) AS w
FROM hashed
WHERE (SELECT fraction FROM frac) IS NOT NULL
  AND label = 0.0
  AND h < floor((SELECT fraction FROM frac) * 4294967296)
"""


def binning_quantity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Binning (A8) bin-index long form over lineitem.l_quantity with
    fixed splits [-inf,10,25,40,+inf]."""
    li = load(spark, sf_dir, "lineitem")
    model = Binning(splits=[float("-inf"), 10.0, 25.0, 40.0, float("inf")])
    model._set(inputCol="l_quantity", outputCol="qty_bin")
    return li.select("l_orderkey", "l_linenumber",
                     model.bin_index_col("l_quantity").alias("bin"))


BINNING_QUANTITY_SQL = """
SELECT l_orderkey, l_linenumber,
       -- NULL and isnan first: both are OUTSIDE every bin (Spark's
       -- when-chain leaves NULL input at the final otherwise(NULL),
       -- and NaN fails the last bin's 'c <= +Inf' upper check since
       -- Spark orders NaN above Infinity), while a bare ELSE would
       -- sweep either into the top bin here (round-10 NaN sweep +
       -- self-review)
       CASE WHEN l_quantity IS NULL THEN NULL
            WHEN isnan(l_quantity) THEN NULL
            WHEN l_quantity < 10 THEN 0
            WHEN l_quantity < 25 THEN 1
            WHEN l_quantity < 40 THEN 2
            ELSE 3 END AS bin
FROM lineitem
"""


def gather_encoder_distfit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A4's 100 TB fit path: the SAME top-75% dictionary computed with
    fitPartitions=4 — distributed two-phase prefix sums over 4 range
    partitions (operators/prefix.py) instead of the single-partition
    window. The oracle is identical to gather_encoder_top: the fit
    strategy must not change the result."""
    return _encode(spark, sf_dir, transformation="top", cover=75.0,
                   allOther=False, fitPartitions=4)
