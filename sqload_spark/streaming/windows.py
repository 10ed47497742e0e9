"""Structured Streaming building blocks over the events table.

The events parquet doubles as a replayable stream: ``readStream`` with an
explicit schema (streaming sources never infer), nanosecond longs converted
to microsecond timestamps, and one-shot execution via
``trigger(availableNow=True)`` into a memory sink — which is exactly how a
batch-equivalence check of a streaming pipeline is done. On a real cluster
the same code points at a growing directory / Kafka source and runs
continuously; nothing in the transformations changes.
"""

from __future__ import annotations

import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from sqload_spark.session import configure, scratch_dir

def _events_schema(ts_type: T.DataType) -> T.StructType:
    return T.StructType(
        [
            T.StructField("event_id", T.LongType()),
            T.StructField("ts", ts_type),
            T.StructField("user_id", T.LongType()),
            T.StructField("event_type", T.StringType()),
            T.StructField("value", T.DoubleType()),
            T.StructField("props", T.StringType()),
        ]
    )


def stream_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """events as a file-source stream with exact ts_us + a real timestamp.

    Streaming sources never infer schemas, so probe the batch-read schema
    once (driver-side metadata only) to match the file's ts layout:
    nanos-as-long in older generated data, TIMESTAMP(MICROS) in newer
    (see sources/tables.py for the normalization contract).
    """
    configure(spark)
    batch_ts = spark.read.parquet(f"{sf_dir}/events.parquet").schema["ts"].dataType
    # file streams need a directory basePath; glob to the single table file
    path = f"{sf_dir}/events.parquet*"
    if isinstance(batch_ts, T.LongType):
        raw = spark.readStream.schema(_events_schema(T.LongType())).parquet(path)
        return (
            raw.withColumnRenamed("ts", "ts_ns")
            .withColumn("ts_us", F.expr("ts_ns div 1000"))
            .withColumn("ts", F.timestamp_micros(F.col("ts_us")))
        )
    raw = spark.readStream.schema(_events_schema(batch_ts)).parquet(path)
    return (
        raw.withColumn("ts", F.col("ts").cast("timestamp"))
        .withColumn("ts_us", F.unix_micros(F.col("ts")))
        .withColumn("ts_ns", F.col("ts_us") * F.lit(1000))
    )


def run_to_memory(sdf: DataFrame, output_mode: str = "complete") -> DataFrame:
    """Execute a streaming DataFrame to completion (availableNow) into a
    memory sink and return the sink contents as a batch DataFrame."""
    name = f"sink_{uuid.uuid4().hex[:12]}"
    query = (
        sdf.writeStream.format("memory")
        .queryName(name)
        .outputMode(output_mode)
        .option("checkpointLocation", scratch_dir(prefix="sqload_ckpt_"))
        .trigger(availableNow=True)
        .start()
    )
    query.awaitTermination()
    spark = sdf.sparkSession
    return spark.table(name)


def run_micro_batches(
    sdf: DataFrame,
    min_batches: int = 3,
    interval: str = "1 second",
    output_mode: str = "update",
    timeout_sec: float = 120.0,
) -> tuple[DataFrame, list[dict]]:
    """Run a streaming DataFrame under a REAL periodic trigger
    (processingTime=interval) until at least `min_batches` micro-batches
    have committed, then stop. Returns (sink contents, progress list) so
    callers can assert incremental/latency behavior — the piece an
    availableNow one-shot replay can't exercise. Used with unbounded
    sources (rate); see tests/test_streaming.py."""
    name = f"sink_{uuid.uuid4().hex[:12]}"
    query = (
        sdf.writeStream.format("memory")
        .queryName(name)
        .outputMode(output_mode)
        .option("checkpointLocation", scratch_dir(prefix="sqload_ckpt_"))
        .trigger(processingTime=interval)
        .start()
    )
    import time as _time

    deadline = _time.time() + timeout_sec
    try:
        while _time.time() < deadline:
            done = [p for p in query.recentProgress if p["numInputRows"] > 0]
            if len(done) >= min_batches:
                break
            _time.sleep(0.25)
        else:
            raise TimeoutError(f"fewer than {min_batches} micro-batches committed")
    finally:
        progress = [dict(p) for p in query.recentProgress]
        query.stop()
        query.awaitTermination()
    spark = sdf.sparkSession
    return spark.table(name), progress
