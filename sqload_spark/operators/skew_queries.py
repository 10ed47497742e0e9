"""Skew-mitigation operators registered against plain-formulation oracles:
the salted plans must produce exactly what the unsalted plans produce."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from sqload_spark.functions.skew import salted_agg, salted_join
from sqload_spark.functions.rounding import round_half_up
from sqload_spark.registry import query
from sqload_spark.sources.tables import load_table


@query(
    "q_salted_agg",
    oracle="""
    SELECT l_returnflag, count(*) AS n_rows,
           CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS total_qty
    FROM lineitem
    GROUP BY l_returnflag
    ORDER BY l_returnflag
    """,
)
def salted_agg_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-phase salted aggregation on a 3-value (maximally skewed) key:
    partial sums over (key, salt) then final re-agg — result must equal the
    plain GROUP BY. Quantities are integral, summed as longs so the
    re-association is exact."""
    li = load_table(spark, sf_dir, "lineitem")
    out = salted_agg(
        li,
        key="l_returnflag",
        aggs=[
            F.count("*").alias("n_rows"),
            F.sum(F.col("l_quantity").cast("bigint")).alias("total_qty"),
        ],
        identity_cols=["l_orderkey", "l_linenumber"],
        salt_buckets=8,
    )
    return out.orderBy("l_returnflag")


@query(
    "q_salted_join",
    oracle="""
    SELECT o_orderpriority, count(*) AS n_items,
           floor((sum(l_extendedprice)) * 100.0 + 0.5) / 100.0 AS total_price
    FROM lineitem JOIN orders ON l_orderkey = o_orderkey
    GROUP BY o_orderpriority
    ORDER BY o_orderpriority
    """,
)
def salted_join_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """lineitem⋈orders with the fact side salted and the other side
    replicated over 8 buckets — the manual hot-key split for when AQE's
    skew handling can't apply. Must equal the plain join."""
    li = load_table(spark, sf_dir, "lineitem")
    od = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_orderpriority")
    joined = salted_join(
        li.select(F.col("l_orderkey").alias("o_orderkey"), "l_linenumber", "l_extendedprice"),
        od,
        key="o_orderkey",
        left_identity=["o_orderkey", "l_linenumber"],
        salt_buckets=8,
    )
    return (
        joined.groupBy("o_orderpriority")
        .agg(F.count("*").alias("n_items"), round_half_up(F.sum("l_extendedprice"), 2).alias("total_price"))
        .orderBy("o_orderpriority")
    )
