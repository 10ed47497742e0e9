"""Subquery shapes: uncorrelated scalar, IN, correlated EXISTS (TPC-H Q4
style), correlated scalar (per-group extremum) — plus complex-typed columns
(from_json → MapType/StructType access).

Catalyst rewrites all of these into joins (scalar → cross/broadcast join on
the 1-row aggregate, IN → left-semi, correlated EXISTS → left-semi on the
correlation key), so they ride the same shuffle machinery as the explicit
join queries; the SQL-facing surface is what's being proven here.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from sqload_spark.registry import query
from sqload_spark.sources.tables import load_table, register_views


@query(
    "q_scalar_subquery",
    oracle="""
    SELECT o_orderpriority, count(*) AS n_above_avg
    FROM orders
    WHERE o_totalprice > (SELECT avg(o_totalprice) FROM orders)
    GROUP BY o_orderpriority
    ORDER BY o_orderpriority
    """,
)
def scalar_subquery(spark: SparkSession, sf_dir: str) -> DataFrame:
    register_views(spark, sf_dir)
    return spark.sql(
        """
        SELECT o_orderpriority, count(*) AS n_above_avg
        FROM orders
        WHERE o_totalprice > (SELECT avg(o_totalprice) FROM orders)
        GROUP BY o_orderpriority
        ORDER BY o_orderpriority
        """
    )


@query(
    "q_in_subquery",
    oracle="""
    SELECT count(*) AS n_lineitems,
           floor((sum(l_extendedprice)) * 100.0 + 0.5) / 100.0 AS total
    FROM lineitem
    WHERE l_orderkey IN (SELECT o_orderkey FROM orders WHERE o_orderpriority = '1-URGENT')
    """,
)
def in_subquery(spark: SparkSession, sf_dir: str) -> DataFrame:
    register_views(spark, sf_dir)
    return spark.sql(
        """
        SELECT count(*) AS n_lineitems,
               -- 100.0D: bare 100.0 is DECIMAL in Spark SQL; floor() is BIGINT,
               -- and BIGINT/DECIMAL would yield DecimalType vs the oracle DOUBLE.
               floor((sum(l_extendedprice)) * 100.0D + 0.5D) / 100.0D AS total
        FROM lineitem
        WHERE l_orderkey IN (SELECT o_orderkey FROM orders WHERE o_orderpriority = '1-URGENT')
        """
    )


@query(
    "q_exists_correlated",
    oracle="""
    SELECT o_orderpriority, count(*) AS n_orders
    FROM orders
    WHERE o_orderdate >= TIMESTAMP '1997-01-01 00:00:00'
      AND o_orderdate <  TIMESTAMP '1997-07-01 00:00:00'
      AND EXISTS (SELECT 1 FROM lineitem
                  WHERE l_orderkey = o_orderkey AND l_shipdate > o_orderdate)
    GROUP BY o_orderpriority
    ORDER BY o_orderpriority
    """,
)
def exists_correlated(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q4 shape: orders with at least one line shipped after the
    order date (correlated EXISTS → left-semi join)."""
    register_views(spark, sf_dir)
    return spark.sql(
        """
        SELECT o_orderpriority, count(*) AS n_orders
        FROM orders
        WHERE o_orderdate >= TIMESTAMP '1997-01-01 00:00:00'
          AND o_orderdate <  TIMESTAMP '1997-07-01 00:00:00'
          AND EXISTS (SELECT 1 FROM lineitem
                      WHERE l_orderkey = o_orderkey AND l_shipdate > o_orderdate)
        GROUP BY o_orderpriority
        ORDER BY o_orderpriority
        """
    )


@query(
    "q_correlated_scalar",
    oracle="""
    SELECT s_suppkey, s_name, s_acctbal
    FROM supplier s
    WHERE s_acctbal = (SELECT max(s2.s_acctbal) FROM supplier s2
                       WHERE s2.s_nationkey = s.s_nationkey)
    ORDER BY s_suppkey
    """,
)
def correlated_scalar(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-nation max-balance supplier via a correlated scalar subquery
    (TPC-H Q2's inner shape)."""
    register_views(spark, sf_dir)
    return spark.sql(
        """
        SELECT s_suppkey, s_name, s_acctbal
        FROM supplier s
        WHERE s_acctbal = (SELECT max(s2.s_acctbal) FROM supplier s2
                           WHERE s2.s_nationkey = s.s_nationkey)
        ORDER BY s_suppkey
        """
    )


@query(
    "q_from_json_map",
    oracle="""
    SELECT CAST(regexp_extract(props, '"k": ([0-9]+)', 1) AS BIGINT) % 10 AS k_bucket,
           count(*) AS n_events,
           CAST(sum(CAST(regexp_extract(props, '"k": ([0-9]+)', 1) AS BIGINT)) AS BIGINT) AS k_sum
    FROM events
    GROUP BY 1
    ORDER BY k_bucket
    """,
)
def from_json_map(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Complex-typed column surface: parse props into MapType(string,long)
    with from_json, access by key, aggregate. (The oracle reads the same
    value by regex — proving the JSON parser agrees with the raw text.)"""
    ev = load_table(spark, sf_dir, "events")
    parsed = ev.select(
        F.from_json("props", T.MapType(T.StringType(), T.LongType())).alias("m")
    )
    return (
        parsed.select((F.col("m")["k"] % 10).alias("k_bucket"), F.col("m")["k"].alias("k"))
        .groupBy("k_bucket")
        .agg(F.count("*").alias("n_events"), F.sum("k").alias("k_sum"))
        .orderBy("k_bucket")
    )
