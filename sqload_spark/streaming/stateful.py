"""Custom stateful streaming operator via applyInPandasWithState.

The built-in windowed aggregations cover time-bucketed state; this is the
escape hatch for arbitrary per-key state machines (running profiles,
conversion funnels, CEP-ish logic). Here: a per-user running profile
(event count, value sum, last-seen µs) maintained in GroupState across
micro-batches. With an availableNow one-shot replay the final emitted
state must equal the batch groupBy — asserted in tests; registered
rows-only for the driver.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

from sqload_spark.registry import query
from sqload_spark.streaming.windows import run_to_memory, stream_events

OUTPUT_SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.LongType()),
        T.StructField("n_events", T.LongType()),
        T.StructField("value_sum", T.DoubleType()),
        T.StructField("last_seen_us", T.LongType()),
    ]
)

STATE_SCHEMA = T.StructType(
    [
        T.StructField("n", T.LongType()),
        T.StructField("vsum", T.DoubleType()),
        T.StructField("last_us", T.LongType()),
    ]
)


def _update_profile(
    key: tuple, batches: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    (user_id,) = key
    n, vsum, last_us = state.get if state.exists else (0, 0.0, 0)
    for pdf in batches:
        n += len(pdf)
        vsum += float(pdf["value"].sum())
        last_us = max(last_us, int(pdf["ts_us"].max()))
    state.update((n, vsum, last_us))
    yield pd.DataFrame(
        {"user_id": [user_id], "n_events": [n], "value_sum": [vsum], "last_seen_us": [last_us]}
    )


@query("stream_stateful_profile")
def stream_stateful_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user stateful profile over the replayed event stream. Update
    output mode: each micro-batch emits the keys it touched with their
    current state; after an availableNow replay the memory sink's last
    emission per key is the complete profile."""
    ev = stream_events(spark, sf_dir).select("user_id", "value", "ts_us")
    profiled = ev.groupBy("user_id").applyInPandasWithState(
        _update_profile,
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
    out = run_to_memory(profiled, output_mode="update")
    return out.orderBy("user_id")
