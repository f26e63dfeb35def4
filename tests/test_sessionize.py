"""applyInPandasWithState sessionization test: two sessions per user
split by a gap, closed by watermark advancement."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from spark_ext_spark.streaming.sessionize import sessionize

ROWS = [
    # user 1: session A (3 events within 10min gaps), then 2h pause,
    # session B (1 event)
    ("2024-01-01 00:00:00", 1, 1.0),
    ("2024-01-01 00:10:00", 1, 2.0),
    ("2024-01-01 00:20:00", 1, 3.0),
    ("2024-01-01 02:30:00", 1, 4.0),
    # user 2: single session, with one NULL value — counts as an
    # event but contributes 0.0 (NULL arrives in pandas as NaN; an
    # unguarded `v or 0.0` would NaN-poison the whole session total)
    ("2024-01-01 00:05:00", 2, 10.0),
    ("2024-01-01 00:12:00", 2, None),
    ("2024-01-01 00:15:00", 2, 20.0),
    # flush row far in the future so the watermark closes everything
    ("2024-01-01 09:00:00", 99, 0.0),
]


def test_sessionize_gap_splitting(spark, tmp_path):
    df = (spark.createDataFrame(ROWS, "ts string, user_id long, value double")
          .withColumn("ts", F.to_timestamp("ts")))
    path = str(tmp_path / "in")
    df.coalesce(1).write.mode("overwrite").parquet(path)
    stream = spark.readStream.schema(df.schema).parquet(path)

    out = sessionize(stream, gap_seconds=1800, watermark="10 minutes")
    q = (out.writeStream.format("memory").queryName("sessions")
         .outputMode("append").trigger(availableNow=True).start())
    q.awaitTermination(120)

    rows = spark.sql("SELECT * FROM sessions").collect()
    by_user = {}
    for r in rows:
        by_user.setdefault(r["user_id"], []).append(r)

    u1 = sorted(by_user[1], key=lambda r: r["session_start"])
    assert len(u1) == 2
    a, b = u1
    assert a["n_events"] == 3 and a["total_value"] == 6.0
    assert str(a["session_start"]) == "2024-01-01 00:00:00"
    assert str(a["session_end"]) == "2024-01-01 00:20:00"
    assert b["n_events"] == 1 and b["total_value"] == 4.0

    (u2,) = by_user[2]
    assert u2["n_events"] == 3 and u2["total_value"] == 30.0  # not NaN
