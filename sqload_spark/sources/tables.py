"""Catalog over the driver-provided parquet test tables.

Tables (one parquet file per table under ``{sf_dir}/``): region nation
customer supplier part orders lineitem events documents embeddings — a
TPC-H-ish star schema plus an event stream and LLM-pipeline tables
(see /root/repo/FIXTURES.md).

Scale notes: these are plain ``spark.read.parquet`` scans, so Catalyst
predicate pushdown / column pruning applies unchanged whether the path is a
single 60 KB file (sf0.01) or a 100 TB partitioned directory — callers never
materialize a table, they compose on the returned DataFrame.

The one irregular table is ``events``: its ``ts`` column is parquet INT64
TIMESTAMP(NANOS, false), which Spark cannot represent (TimestampType is
microseconds). We read it as a raw long (``spark.sql.legacy.parquet
.nanosAsLong``) and expose BOTH:

* ``ts_ns``  — the exact int64 epoch-nanoseconds (lossless; used by every
  oracle-checked query so ordering / gap arithmetic matches DuckDB, which
  keeps full nanosecond precision, bit for bit), and
* ``ts``     — a microsecond-truncated ``TimestampType`` column for the
  time-window / Structured Streaming APIs that need a real timestamp.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

TABLE_NAMES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Load one test table; ``events`` gets the nanosecond-timestamp shim."""
    if name == "events":
        # Runtime-settable (the correctness driver owns the SparkSession).
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        df = spark.read.parquet(f"{sf_dir}/events.parquet")
        return (
            df.withColumnRenamed("ts", "ts_ns")
            .withColumn("ts", F.timestamp_micros((F.col("ts_ns") / 1000).cast("long")))
        )
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Register every table as a temp view (for the SQL-flavored operators)."""
    for name in TABLE_NAMES:
        load_table(spark, sf_dir, name).createOrReplaceTempView(name)
