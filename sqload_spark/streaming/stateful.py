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
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

from sqload_spark.registry import query
from sqload_spark.streaming.windows import events_source_bytes, run_to_memory, stream_events

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
        # value_sum is accumulated as integer CENTS (the events values are
        # exact 2-decimal doubles): integer addition is order-independent
        # across batches/partitions, so the emitted profile is bit-stable
        # and the operator can share an exact DuckDB oracle.
        T.StructField("n", T.LongType()),
        T.StructField("vcents", T.LongType()),
        T.StructField("last_us", T.LongType()),
    ]
)


def _update_profile(
    key: tuple, batches: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    (user_id,) = key
    n, vcents, last_us = state.get if state.exists else (0, 0, 0)
    for pdf in batches:
        n += len(pdf)
        # dropna: a NULL measurement arrives as NaN, and NaN.astype(int64)
        # raises — the row still counts (the oracle's count(*) vs
        # sum(CAST ...) make the same distinction: count all, sum non-null)
        vals = pdf["value"].dropna()
        if len(vals):
            vcents += int((vals * 100).round().astype("int64").sum())
        ts_vals = pdf["ts_us"].dropna()
        if len(ts_vals):
            last_us = max(last_us, int(ts_vals.max()))
    state.update((n, vcents, last_us))
    yield pd.DataFrame(
        {
            "user_id": [user_id],
            "n_events": [n],
            "value_sum": [vcents / 100.0],
            "last_seen_us": [last_us],
        }
    )


@query(
    "stream_stateful_profile",
    oracle="""
    SELECT user_id,
           count(*) AS n_events,
           CAST(sum(CAST(value * 100 AS BIGINT)) AS DOUBLE) / 100.0 AS value_sum,
           max(epoch_us(ts)) AS last_seen_us
    FROM events
    GROUP BY user_id
    ORDER BY user_id
    """,
)
def stream_stateful_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user stateful profile over the replayed event stream. Update
    output mode: each micro-batch emits the keys it touched with their
    current state; the final emission per key (strictly-largest n_events —
    every touching batch adds ≥1 event) is the complete profile, reduced
    with max/max_by so the result is one row per user no matter how many
    micro-batches the replay used. State accumulates integer cents, so the
    profile equals the batch GROUP BY exactly and the custom stateful
    operator is hash-checked against a plain SQL oracle."""
    ev = stream_events(spark, sf_dir).select("user_id", "value", "ts_us")
    profiled = ev.groupBy("user_id").applyInPandasWithState(
        _update_profile,
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
    out = run_to_memory(
        profiled, output_mode="update", src_bytes=events_source_bytes(sf_dir)
    )
    return (
        out.groupBy("user_id")
        .agg(
            F.max("n_events").alias("n_events"),
            F.max_by("value_sum", "n_events").alias("value_sum"),
            F.max("last_seen_us").alias("last_seen_us"),
        )
        .orderBy("user_id")
    )
