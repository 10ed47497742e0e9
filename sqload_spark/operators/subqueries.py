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
    SELECT TRY_CAST(NULLIF(regexp_extract(props, '"k": ([0-9]+)', 1), '') AS BIGINT) % 10 AS k_bucket,
           count(*) AS n_events,
           CAST(sum(TRY_CAST(NULLIF(regexp_extract(props, '"k": ([0-9]+)', 1), '') AS BIGINT)) AS BIGINT) AS k_sum
    FROM events
    GROUP BY 1
    ORDER BY k_bucket
    """,
)
def from_json_map(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Complex-typed column surface: parse props into MapType(string,long)
    with from_json, access by key, aggregate. (The oracle reads the same
    value by regex — proving the JSON parser agrees with the raw text.)
    Malformed / wrong-typed / missing-key props NULL out identically in
    both engines (from_json's PERMISSIVE NULL vs the oracle's
    TRY_CAST(NULLIF(...))), landing those rows in the NULL bucket rather
    than raising — one dirty feed row must not kill the aggregate."""
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


@query(
    "q_not_in_null_semantics",
    oracle="""
    SELECT
      (SELECT count(*) FROM customer
       WHERE c_custkey NOT IN (SELECT NULLIF(o_custkey, 42) FROM orders))
        AS n_with_null,
      (SELECT count(*) FROM customer
       WHERE c_custkey NOT IN (SELECT NULLIF(o_custkey, 42) FROM orders
                               WHERE NULLIF(o_custkey, 42) IS NOT NULL))
        AS n_null_stripped,
      (SELECT count(*) FROM customer
       WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey))
        AS n_not_exists
    """,
)
def not_in_null_semantics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Three-valued-logic parity: `x NOT IN (subquery)` is NEVER true when
    the subquery yields a NULL (here NULLIF plants one), while the
    NULL-stripped variant and NOT EXISTS count normally — the classic
    correctness trap engines get wrong when they rewrite NOT IN as a plain
    anti join. Spark plans the first column as a NULL-AWARE anti join
    (broadcast, no fallback to per-row subqueries); the hash-match proves
    the rewrite preserves SQL semantics. One row, three counts."""
    load_table(spark, sf_dir, "customer").createOrReplaceTempView("customer_v")
    load_table(spark, sf_dir, "orders").createOrReplaceTempView("orders_v")
    return spark.sql("""
        SELECT
          (SELECT count(*) FROM customer_v
           WHERE c_custkey NOT IN (SELECT NULLIF(o_custkey, 42) FROM orders_v))
            AS n_with_null,
          (SELECT count(*) FROM customer_v
           WHERE c_custkey NOT IN (SELECT NULLIF(o_custkey, 42) FROM orders_v
                                   WHERE NULLIF(o_custkey, 42) IS NOT NULL))
            AS n_null_stripped,
          (SELECT count(*) FROM customer_v
           WHERE NOT EXISTS (SELECT 1 FROM orders_v WHERE o_custkey = c_custkey))
            AS n_not_exists
    """)
