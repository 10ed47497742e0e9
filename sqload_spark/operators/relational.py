"""Relational core: scan/filter/project, joins, aggregation, windows,
set ops, scalar functions — all built-in DataFrame ops so Catalyst owns
pushdown, pruning, join selection (broadcast for the dim tables) and
whole-stage codegen.

Every query here is paired with a DuckDB oracle (SQL in the ``@query``
decorator). Determinism conventions (cross-engine hash compare):

* double aggregates are ``floor((...) * 100.0 + 0.5) / 100.0`` (sums) / ``floor((...) * 10000.0 + 0.5) / 10000.0``
  (averages) AFTER aggregating, in both engines;
* every window / top-k ordering carries a unique-key tie-breaker;
* computed columns share the exact alias between Spark and SQL.

Scale notes (100 TB): region/nation/part/supplier/customer are dimension
tables → explicitly ``broadcast()``-hinted so fact-side joins never shuffle
the big table on dim keys. lineitem⋈orders is the one genuinely large join
— both sides shuffle-hash/sort-merge on the order key, which AQE re-plans
and skew-splits at runtime. Aggregations are partial+final automatically
(hash agg with map-side combine), so groupBy cardinality — not input rows —
drives shuffle volume.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from sqload_spark.functions.rounding import (
    exact_decimal_sum,
    round_half_up,
    sql_exact_decimal_sum,
    sql_round_half_up,
)
from sqload_spark.registry import query
from sqload_spark.sources.tables import load_table


# ---------------------------------------------------------------------------
# Flagship: TPC-H Q1-shaped pricing summary (scan → filter → agg → sort).
# Mirrors the "bulk load then report" use the reference generator feeds
# (/root/reference/README.md:3 — data for SQL load testing).
# ---------------------------------------------------------------------------


def pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.filter(F.col("l_shipdate") <= F.lit("2001-09-02").cast("timestamp_ntz"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            round_half_up(F.sum("l_quantity"), 2).alias("sum_qty"),
            round_half_up(F.sum("l_extendedprice"), 2).alias("sum_base_price"),
            round_half_up(exact_decimal_sum(disc_price, 4), 2).alias("sum_disc_price"),
            round_half_up(exact_decimal_sum(disc_price * (1 + F.col("l_tax")), 6, 22), 2).alias(
                "sum_charge"
            ),
            round_half_up(F.avg("l_quantity"), 4).alias("avg_qty"),
            round_half_up(F.avg("l_extendedprice"), 4).alias("avg_price"),
            round_half_up(F.avg("l_discount"), 4).alias("avg_disc"),
            F.count("*").alias("count_order"),
        )
        .orderBy("l_returnflag", "l_linestatus")
    )


query(
    "q1_pricing_summary",
    oracle="""
    SELECT l_returnflag, l_linestatus,
           floor((sum(l_quantity)) * 100.0 + 0.5) / 100.0                                            AS sum_qty,
           floor((sum(l_extendedprice)) * 100.0 + 0.5) / 100.0                                       AS sum_base_price,
           floor((CAST(sum(CAST((l_extendedprice * (1 - l_discount)) AS DECIMAL(18,4))) AS DOUBLE)) * 100.0 + 0.5) / 100.0 AS sum_disc_price,
           floor((CAST(sum(CAST((l_extendedprice * (1 - l_discount) * (1 + l_tax)) AS DECIMAL(22,6))) AS DOUBLE)) * 100.0 + 0.5) / 100.0 AS sum_charge,
           floor(avg(l_quantity) * 10000.0 + 0.5) / 10000.0                     AS avg_qty,
           floor(avg(l_extendedprice) * 10000.0 + 0.5) / 10000.0                AS avg_price,
           floor(avg(l_discount) * 10000.0 + 0.5) / 10000.0                     AS avg_disc,
           count(*)                                                             AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '2001-09-02 00:00:00'
    GROUP BY l_returnflag, l_linestatus
    ORDER BY l_returnflag, l_linestatus
    """,
)(pricing_summary)


# SQL-string API parity: the exact same pricing summary submitted through
# spark.sql() over a registered temp view — proving the engine's textual
# SQL surface produces the identical (hash-checked) result as the
# DataFrame plan. One registration per session; the view is just a
# metadata alias over the parquet scan, so pushdown/pruning are unchanged.
@query(
    "q1_pricing_summary_sqltext",
    oracle="""
    SELECT l_returnflag, l_linestatus,
           floor((sum(l_quantity)) * 100.0 + 0.5) / 100.0 AS sum_qty,
           floor((CAST(sum(CAST((l_extendedprice * (1 - l_discount)) AS DECIMAL(18,4))) AS DOUBLE)) * 100.0 + 0.5) / 100.0 AS sum_disc_price,
           count(*) AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '2001-09-02 00:00:00'
    GROUP BY l_returnflag, l_linestatus
    ORDER BY l_returnflag, l_linestatus
    """,
)
def pricing_summary_sqltext(spark: SparkSession, sf_dir: str) -> DataFrame:
    load_table(spark, sf_dir, "lineitem").createOrReplaceTempView("lineitem_v")
    return spark.sql("""
        SELECT l_returnflag, l_linestatus,
               floor((sum(l_quantity)) * 100.0D + 0.5D) / 100.0D AS sum_qty,
               floor((CAST(sum(CAST((l_extendedprice * (1 - l_discount)) AS DECIMAL(18,4))) AS DOUBLE)) * 100.0D + 0.5D) / 100.0D AS sum_disc_price,
               count(*) AS count_order
        FROM lineitem_v
        WHERE l_shipdate <= TIMESTAMP_NTZ '2001-09-02 00:00:00'
        GROUP BY l_returnflag, l_linestatus
        ORDER BY l_returnflag, l_linestatus
    """)


# ---------------------------------------------------------------------------
# Scan / filter / project with pushdown-friendly predicates.
# ---------------------------------------------------------------------------


@query(
    "q_filter_project",
    oracle="""
    SELECT l_orderkey, l_linenumber, l_quantity,
           floor((l_extendedprice * (1 - l_discount)) * 100.0 + 0.5) / 100.0 AS net_price
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '2000-01-01 00:00:00'
      AND l_quantity > 45
      AND l_returnflag = 'R'
    """,
)
def filter_project(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    return li.filter(
        (F.col("l_shipdate") >= F.lit("2000-01-01").cast("timestamp_ntz"))
        & (F.col("l_quantity") > 45)
        & (F.col("l_returnflag") == "R")
    ).select(
        "l_orderkey",
        "l_linenumber",
        "l_quantity",
        round_half_up(F.col("l_extendedprice") * (1 - F.col("l_discount")), 2).alias("net_price"),
    )


# ---------------------------------------------------------------------------
# Joins: broadcast dim joins, the big fact⋈fact join, semi/anti.
# ---------------------------------------------------------------------------


@query(
    "q3_shipping_priority",
    oracle="""
    SELECT l_orderkey,
           floor((CAST(sum(CAST((l_extendedprice * (1 - l_discount)) AS DECIMAL(18,4))) AS DOUBLE)) * 100.0 + 0.5) / 100.0 AS revenue,
           o_orderdate
    FROM customer
    JOIN orders   ON c_custkey = o_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    WHERE c_mktsegment = 'BUILDING'
      AND o_orderdate < TIMESTAMP '1998-03-15 00:00:00'
      AND l_shipdate  > TIMESTAMP '1998-03-15 00:00:00'
    GROUP BY l_orderkey, o_orderdate
    ORDER BY revenue DESC, o_orderdate, l_orderkey
    LIMIT 10
    """,
)
def shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q3 shape. customer scales with sf (sf×150K rows), so it gets
    NO broadcast hint — statistics/AQE pick BHJ while the side fits and
    fall back to a shuffle join at the 100 TB design point. The
    orders⋈lineitem join shuffles on the order key (SMJ/SHJ via AQE)."""
    cu = load_table(spark, sf_dir, "customer")
    od = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    cutoff = F.lit("1998-03-15").cast("timestamp_ntz")
    return (
        li.filter(F.col("l_shipdate") > cutoff)
        .join(od.filter(F.col("o_orderdate") < cutoff), F.col("l_orderkey") == F.col("o_orderkey"))
        .join(cu.filter(F.col("c_mktsegment") == "BUILDING"), F.col("o_custkey") == F.col("c_custkey"))
        .groupBy("l_orderkey", "o_orderdate")
        .agg(
            round_half_up(
                exact_decimal_sum(F.col("l_extendedprice") * (1 - F.col("l_discount")), 4), 2
            ).alias("revenue")
        )
        .select("l_orderkey", "revenue", "o_orderdate")
        .orderBy(F.col("revenue").desc(), "o_orderdate", "l_orderkey")
        .limit(10)
    )


@query(
    "q5_region_revenue",
    oracle="""
    SELECT n_name, floor((CAST(sum(CAST((l_extendedprice * (1 - l_discount)) AS DECIMAL(18,4))) AS DOUBLE)) * 100.0 + 0.5) / 100.0 AS revenue
    FROM customer
    JOIN orders   ON c_custkey = o_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
    JOIN nation   ON s_nationkey = n_nationkey
    JOIN region   ON n_regionkey = r_regionkey
    WHERE o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND o_orderdate <  TIMESTAMP '1998-01-01 00:00:00'
    GROUP BY n_name
    ORDER BY revenue DESC, n_name
    """,
)
def region_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q5 shape: 6-way join. All of supplier/nation/region broadcast;
    only customer⋈orders⋈lineitem shuffle on their keys."""
    cu = load_table(spark, sf_dir, "customer")
    od = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    su = load_table(spark, sf_dir, "supplier")
    na = load_table(spark, sf_dir, "nation")
    re = load_table(spark, sf_dir, "region")
    return (
        od.filter(
            (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp_ntz"))
            & (F.col("o_orderdate") < F.lit("1998-01-01").cast("timestamp_ntz"))
        )
        .join(cu, F.col("o_custkey") == F.col("c_custkey"))
        .join(li, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(
            su,
            (F.col("l_suppkey") == F.col("s_suppkey")) & (F.col("c_nationkey") == F.col("s_nationkey")),
        )
        .join(F.broadcast(na), F.col("s_nationkey") == F.col("n_nationkey"))
        .join(F.broadcast(re), F.col("n_regionkey") == F.col("r_regionkey"))
        .groupBy("n_name")
        .agg(
            round_half_up(
                exact_decimal_sum(F.col("l_extendedprice") * (1 - F.col("l_discount")), 4), 2
            ).alias("revenue")
        )
        .orderBy(F.col("revenue").desc(), "n_name")
    )


@query(
    "q_semi_join",
    oracle="""
    SELECT c_mktsegment, count(*) AS n_customers
    FROM customer
    WHERE EXISTS (SELECT 1 FROM orders
                  WHERE o_custkey = c_custkey AND o_orderstatus = 'F')
    GROUP BY c_mktsegment
    ORDER BY c_mktsegment
    """,
)
def semi_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    cu = load_table(spark, sf_dir, "customer")
    od = load_table(spark, sf_dir, "orders")
    return (
        cu.join(
            od.filter(F.col("o_orderstatus") == "F"),
            F.col("c_custkey") == F.col("o_custkey"),
            "left_semi",
        )
        .groupBy("c_mktsegment")
        .agg(F.count("*").alias("n_customers"))
        .orderBy("c_mktsegment")
    )


@query(
    "q_anti_join",
    oracle="""
    SELECT c_nationkey, count(*) AS n_customers
    FROM customer
    WHERE NOT EXISTS (SELECT 1 FROM orders
                      WHERE o_custkey = c_custkey AND o_orderpriority = '1-URGENT')
    GROUP BY c_nationkey
    ORDER BY c_nationkey
    """,
)
def anti_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Customers with no urgent orders (every customer has *some* order in
    the test data, so the anti-join needs the narrower right side to be a
    meaningful check)."""
    cu = load_table(spark, sf_dir, "customer")
    od = load_table(spark, sf_dir, "orders")
    return (
        cu.join(
            od.filter(F.col("o_orderpriority") == "1-URGENT"),
            F.col("c_custkey") == F.col("o_custkey"),
            "left_anti",
        )
        .groupBy("c_nationkey")
        .agg(F.count("*").alias("n_customers"))
        .orderBy("c_nationkey")
    )


# ---------------------------------------------------------------------------
# Aggregation: rollup / cube / grouping sets, distinct + approx-distinct,
# having, conditional aggregation, pivot.
# ---------------------------------------------------------------------------


@query(
    "q_rollup_region_nation",
    oracle="""
    SELECT coalesce(r_name, 'ALL') AS region_name,
           coalesce(n_name, 'ALL') AS nation_name,
           floor((sum(o_totalprice)) * 100.0 + 0.5) / 100.0 AS total_sales,
           count(*) AS n_orders
    FROM orders
    JOIN customer ON o_custkey = c_custkey
    JOIN nation   ON c_nationkey = n_nationkey
    JOIN region   ON n_regionkey = r_regionkey
    GROUP BY ROLLUP (r_name, n_name)
    ORDER BY region_name, nation_name
    """,
)
def rollup_region_nation(spark: SparkSession, sf_dir: str) -> DataFrame:
    od = load_table(spark, sf_dir, "orders")
    cu = load_table(spark, sf_dir, "customer")
    na = load_table(spark, sf_dir, "nation")
    re = load_table(spark, sf_dir, "region")
    return (
        od.join(cu, F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(na), F.col("c_nationkey") == F.col("n_nationkey"))
        .join(F.broadcast(re), F.col("n_regionkey") == F.col("r_regionkey"))
        .rollup("r_name", "n_name")
        .agg(
            round_half_up(F.sum("o_totalprice"), 2).alias("total_sales"),
            F.count("*").alias("n_orders"),
        )
        .select(
            F.coalesce(F.col("r_name"), F.lit("ALL")).alias("region_name"),
            F.coalesce(F.col("n_name"), F.lit("ALL")).alias("nation_name"),
            "total_sales",
            "n_orders",
        )
        .orderBy("region_name", "nation_name")
    )


@query(
    "q_cube_returnflag_status",
    oracle="""
    SELECT coalesce(l_returnflag, 'ALL') AS returnflag,
           coalesce(l_linestatus, 'ALL') AS linestatus,
           floor((sum(l_quantity)) * 100.0 + 0.5) / 100.0 AS sum_qty,
           count(*) AS n_items
    FROM lineitem
    GROUP BY CUBE (l_returnflag, l_linestatus)
    ORDER BY returnflag, linestatus
    """,
)
def cube_returnflag_status(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.cube("l_returnflag", "l_linestatus")
        .agg(round_half_up(F.sum("l_quantity"), 2).alias("sum_qty"), F.count("*").alias("n_items"))
        .select(
            F.coalesce(F.col("l_returnflag"), F.lit("ALL")).alias("returnflag"),
            F.coalesce(F.col("l_linestatus"), F.lit("ALL")).alias("linestatus"),
            "sum_qty",
            "n_items",
        )
        .orderBy("returnflag", "linestatus")
    )


@query(
    "q_count_distinct",
    oracle="""
    SELECT c_mktsegment,
           count(DISTINCT c_nationkey) AS n_nations,
           count(*) AS n_customers,
           floor((sum(c_acctbal)) * 100.0 + 0.5) / 100.0 AS total_balance
    FROM customer
    GROUP BY c_mktsegment
    ORDER BY c_mktsegment
    """,
)
def count_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    cu = load_table(spark, sf_dir, "customer")
    return (
        cu.groupBy("c_mktsegment")
        .agg(
            F.countDistinct("c_nationkey").alias("n_nations"),
            F.count("*").alias("n_customers"),
            round_half_up(F.sum("c_acctbal"), 2).alias("total_balance"),
        )
        .orderBy("c_mktsegment")
    )


@query(
    "q_approx_count_distinct",
    oracle="""
    SELECT l_returnflag,
           CAST(count(DISTINCT l_orderkey) AS BIGINT) AS exact_orders,
           TRUE AS within_bound
    FROM lineitem
    GROUP BY l_returnflag
    ORDER BY l_returnflag
    """,
)
def approx_count_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HLL++ sketch — the 100 TB path for distinct counts (no exact-distinct
    shuffle explosion) — as a CHECKED twin (VERDICT r5 #4, the
    sketch_cms_checked recipe): the raw estimate is engine-specific so it
    can't be hash-compared directly; instead the result carries the exact
    count plus `within_bound` = |estimate − exact| ≤ 5×rsd×exact, and the
    oracle asserts the bound holds by construction (TRUE). rsd=0.02 →
    bound 10%; measured worst group error is 3.3% at sf0.1, so the boolean
    is deterministic, and any sketch regression past 5σ flips it to a hash
    mismatch. Error-curve law remains in pytest."""
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.groupBy("l_returnflag")
        .agg(
            F.approx_count_distinct("l_orderkey", 0.02).alias("approx_orders"),
            F.countDistinct("l_orderkey").alias("exact_orders"),
        )
        .select(
            "l_returnflag",
            "exact_orders",
            (
                F.abs(F.col("approx_orders") - F.col("exact_orders"))
                <= 0.10 * F.col("exact_orders")
            ).alias("within_bound"),
        )
        .orderBy("l_returnflag")
    )


@query(
    "q_having",
    oracle="""
    SELECT l_suppkey, floor((sum(l_quantity)) * 100.0 + 0.5) / 100.0 AS total_qty
    FROM lineitem
    GROUP BY l_suppkey
    HAVING sum(l_quantity) > 15000
    ORDER BY total_qty DESC, l_suppkey
    """,
)
def having(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.groupBy("l_suppkey")
        .agg(F.sum("l_quantity").alias("_raw_qty"))
        .filter(F.col("_raw_qty") > 15000)
        .select("l_suppkey", round_half_up(F.col("_raw_qty"), 2).alias("total_qty"))
        .orderBy(F.col("total_qty").desc(), "l_suppkey")
    )


@query(
    "q_conditional_agg",
    oracle="""
    SELECT o_orderpriority,
           count(*) AS n_orders,
           CAST(sum(CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END) AS BIGINT) AS n_finished,
           floor((sum(CASE WHEN o_totalprice > 200000 THEN o_totalprice ELSE 0 END)) * 100.0 + 0.5) / 100.0 AS big_order_value
    FROM orders
    GROUP BY o_orderpriority
    ORDER BY o_orderpriority
    """,
)
def conditional_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    od = load_table(spark, sf_dir, "orders")
    return (
        od.groupBy("o_orderpriority")
        .agg(
            F.count("*").alias("n_orders"),
            F.sum(F.when(F.col("o_orderstatus") == "F", 1).otherwise(0)).alias("n_finished"),
            round_half_up(
                F.sum(F.when(F.col("o_totalprice") > 200000, F.col("o_totalprice")).otherwise(0.0)), 2
            ).alias("big_order_value"),
        )
        .orderBy("o_orderpriority")
    )


@query(
    "q_pivot_status",
    oracle="""
    SELECT o_orderpriority,
           floor((coalesce(sum(CASE WHEN o_orderstatus = 'F' THEN o_totalprice END), 0)) * 100.0 + 0.5) / 100.0 AS F,
           floor((coalesce(sum(CASE WHEN o_orderstatus = 'O' THEN o_totalprice END), 0)) * 100.0 + 0.5) / 100.0 AS O,
           floor((coalesce(sum(CASE WHEN o_orderstatus = 'P' THEN o_totalprice END), 0)) * 100.0 + 0.5) / 100.0 AS P
    FROM orders
    GROUP BY o_orderpriority
    ORDER BY o_orderpriority
    """,
)
def pivot_status(spark: SparkSession, sf_dir: str) -> DataFrame:
    od = load_table(spark, sf_dir, "orders")
    pv = (
        od.groupBy("o_orderpriority")
        .pivot("o_orderstatus", ["F", "O", "P"])
        .agg(F.sum("o_totalprice"))
    )
    return pv.select(
        "o_orderpriority",
        *[round_half_up(F.coalesce(F.col(c), F.lit(0.0)), 2).alias(c) for c in ("F", "O", "P")],
    ).orderBy("o_orderpriority")


# ---------------------------------------------------------------------------
# Windows: ranking, running totals, lag/lead with frames.
# ---------------------------------------------------------------------------


@query(
    "q_window_topk_per_customer",
    oracle="""
    SELECT o_custkey, o_orderkey, o_totalprice, rn
    FROM (
      SELECT o_custkey, o_orderkey, o_totalprice,
             row_number() OVER (PARTITION BY o_custkey
                                ORDER BY o_totalprice DESC, o_orderkey) AS rn
      FROM orders
    )
    WHERE rn <= 3
    ORDER BY o_custkey, rn
    """,
)
def window_topk_per_customer(spark: SparkSession, sf_dir: str) -> DataFrame:
    od = load_table(spark, sf_dir, "orders")
    w = W.partitionBy("o_custkey").orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey"))
    return (
        od.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 3)
        .select("o_custkey", "o_orderkey", "o_totalprice", "rn")
        .orderBy("o_custkey", "rn")
    )


@query(
    "q_window_rank_dense",
    oracle="""
    SELECT p_type, p_partkey, p_retailprice,
           rank()       OVER (PARTITION BY p_type ORDER BY p_size DESC, p_partkey) AS rnk,
           dense_rank() OVER (PARTITION BY p_type ORDER BY p_size DESC, p_partkey) AS drnk
    FROM part
    WHERE p_size >= 45
    ORDER BY p_type, rnk, p_partkey
    """,
)
def window_rank_dense(spark: SparkSession, sf_dir: str) -> DataFrame:
    pa = load_table(spark, sf_dir, "part")
    w = W.partitionBy("p_type").orderBy(F.col("p_size").desc(), F.col("p_partkey"))
    return (
        pa.filter(F.col("p_size") >= 45)
        .select(
            "p_type",
            "p_partkey",
            "p_retailprice",
            F.rank().over(w).alias("rnk"),
            F.dense_rank().over(w).alias("drnk"),
        )
        .orderBy("p_type", "rnk", "p_partkey")
    )


@query(
    "q_window_running_revenue",
    oracle="""
    SELECT l_suppkey, l_orderkey, l_linenumber,
           floor((sum(l_extendedprice) OVER (
               PARTITION BY l_suppkey
               ORDER BY l_shipdate NULLS LAST, l_orderkey, l_linenumber
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)) * 100.0 + 0.5) / 100.0 AS running_revenue
    FROM lineitem
    WHERE l_suppkey <= 10
    ORDER BY l_suppkey, l_shipdate NULLS LAST, l_orderkey, l_linenumber
    """,
)
def window_running_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Running (cumulative) revenue per supplier in shipdate order.

    NULL-ordering contract (adversarial part 3): a NULL sort key placed a
    dirty row FIRST in Spark (ASC default NULLS FIRST) but LAST in the
    oracle (DuckDB default NULLS LAST), shifting every running sum in the
    partition by that row's value — silent, order-of-NULLs divergence.
    The engine's documented window semantics are NULLS LAST on ascending
    keys (unknown sort keys sort after known ones), explicit on BOTH
    sides; DESC keys already agree (both engines default NULLS LAST)."""
    li = load_table(spark, sf_dir, "lineitem")
    w = (
        W.partitionBy("l_suppkey")
        .orderBy(F.asc_nulls_last("l_shipdate"), "l_orderkey", "l_linenumber")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    return (
        li.filter(F.col("l_suppkey") <= 10)
        .select(
            "l_suppkey",
            "l_orderkey",
            "l_linenumber",
            round_half_up(F.sum("l_extendedprice").over(w), 2).alias("running_revenue"),
            "l_shipdate",
        )
        .orderBy("l_suppkey", "l_shipdate", "l_orderkey", "l_linenumber")
        .drop("l_shipdate")
    )


@query(
    "q_window_lag_lead",
    oracle="""
    SELECT o_custkey, o_orderkey,
           coalesce(CAST(date_diff('day',
               lag(o_orderdate) OVER (PARTITION BY o_custkey ORDER BY o_orderdate NULLS LAST, o_orderkey),
               o_orderdate) AS BIGINT), -1) AS days_since_prev,
           coalesce(lead(o_orderkey) OVER (PARTITION BY o_custkey ORDER BY o_orderdate NULLS LAST, o_orderkey), -1) AS next_orderkey
    FROM orders
    WHERE o_custkey <= 100
    ORDER BY o_custkey, o_orderdate, o_orderkey
    """,
)
def window_lag_lead(spark: SparkSession, sf_dir: str) -> DataFrame:
    """lag/lead per customer in order-date order. NULLS LAST on the
    ascending date key — the engine's window NULL-ordering contract (see
    window_running_revenue); without it a NULL o_orderdate silently
    shifts every lag/lead in the partition between engines."""
    od = load_table(spark, sf_dir, "orders")
    w = W.partitionBy("o_custkey").orderBy(F.asc_nulls_last("o_orderdate"), "o_orderkey")
    return (
        od.filter(F.col("o_custkey") <= 100)
        .select(
            "o_custkey",
            "o_orderkey",
            F.coalesce(
                F.datediff(F.col("o_orderdate"), F.lag("o_orderdate").over(w)).cast("bigint"),
                F.lit(-1),
            ).alias("days_since_prev"),
            F.coalesce(F.lead("o_orderkey").over(w), F.lit(-1)).alias("next_orderkey"),
            "o_orderdate",
        )
        .orderBy("o_custkey", "o_orderdate", "o_orderkey")
        .drop("o_orderdate")
    )


@query(
    "q_window_range_frame",
    oracle="""
    SELECT o_custkey, o_orderkey, day,
           count(*) OVER w AS n_30d,
           CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) OVER w AS DOUBLE) AS sum_30d
    FROM (
      SELECT o_custkey, o_orderkey, o_totalprice,
             CAST(date_diff('day', DATE '1970-01-01', CAST(o_orderdate AS DATE)) AS BIGINT) AS day
      FROM orders WHERE o_custkey <= 300
    )
    WINDOW w AS (PARTITION BY o_custkey ORDER BY day
                 RANGE BETWEEN 30 PRECEDING AND CURRENT ROW)
    ORDER BY o_custkey, day, o_orderkey
    """,
)
def window_range_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RANGE (value-based) frame: per customer, the count and revenue of
    that customer's orders in the trailing 30 DAYS — unlike a ROWS frame
    the boundary is a value offset, so peers (same-day orders) enter the
    frame together and the result is order-insensitive within ties. The
    windowed sum goes through the exact-decimal trick because a RANGE
    frame's summation order is engine-internal. One shuffle on the
    partition key, then per-partition frames — the standard trailing-
    window feature shape at any scale."""
    od = load_table(spark, sf_dir, "orders").filter(F.col("o_custkey") <= 300)
    base = od.select(
        "o_custkey",
        "o_orderkey",
        "o_totalprice",
        F.datediff(F.to_date("o_orderdate"), F.lit("1970-01-01")).cast("bigint").alias("day"),
    )
    w = W.partitionBy("o_custkey").orderBy("day").rangeBetween(-30, 0)
    return (
        base.select(
            "o_custkey",
            "o_orderkey",
            "day",
            F.count("*").over(w).alias("n_30d"),
            F.sum(F.col("o_totalprice").cast("decimal(18,2)")).over(w).cast("double").alias("sum_30d"),
        )
        .orderBy("o_custkey", "day", "o_orderkey")
    )


# ---------------------------------------------------------------------------
# Sort / top-k (planned as TakeOrderedAndProject — no global sort shuffle).
# ---------------------------------------------------------------------------


@query(
    "q_topk_orders",
    oracle="""
    SELECT o_orderkey, o_custkey, o_totalprice
    FROM orders
    ORDER BY o_totalprice DESC, o_orderkey
    LIMIT 10
    """,
)
def topk_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    od = load_table(spark, sf_dir, "orders")
    return (
        od.select("o_orderkey", "o_custkey", "o_totalprice")
        .orderBy(F.col("o_totalprice").desc(), "o_orderkey")
        .limit(10)
    )


# ---------------------------------------------------------------------------
# Set operations.
# ---------------------------------------------------------------------------


@query(
    "q_intersect_custkeys",
    oracle="""
    SELECT o_custkey FROM orders WHERE o_orderdate < TIMESTAMP '1997-01-01 00:00:00'
    INTERSECT
    SELECT o_custkey FROM orders WHERE o_orderdate >= TIMESTAMP '2000-01-01 00:00:00'
    ORDER BY o_custkey
    """,
)
def intersect_custkeys(spark: SparkSession, sf_dir: str) -> DataFrame:
    od = load_table(spark, sf_dir, "orders")
    early = od.filter(F.col("o_orderdate") < F.lit("1997-01-01").cast("timestamp_ntz")).select("o_custkey")
    late = od.filter(F.col("o_orderdate") >= F.lit("2000-01-01").cast("timestamp_ntz")).select("o_custkey")
    return early.intersect(late).orderBy("o_custkey")


@query(
    "q_except_custkeys",
    oracle="""
    SELECT o_custkey FROM orders WHERE o_orderstatus = 'O'
    EXCEPT
    SELECT o_custkey FROM orders WHERE o_orderstatus = 'F'
    ORDER BY o_custkey
    """,
)
def except_custkeys(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Customers with open orders but no finished ones (EXCEPT = set
    difference with implicit distinct on both sides)."""
    od = load_table(spark, sf_dir, "orders")
    open_ = od.filter(F.col("o_orderstatus") == "O").select("o_custkey")
    finished = od.filter(F.col("o_orderstatus") == "F").select("o_custkey")
    return open_.subtract(finished).orderBy("o_custkey")


@query(
    "q_union_priority_counts",
    oracle="""
    SELECT src, count(*) AS n FROM (
      SELECT 'urgent' AS src FROM orders WHERE o_orderpriority = '1-URGENT'
      UNION ALL
      SELECT 'low'    AS src FROM orders WHERE o_orderpriority = '5-LOW'
    ) GROUP BY src ORDER BY src
    """,
)
def union_priority_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    od = load_table(spark, sf_dir, "orders")
    urgent = od.filter(F.col("o_orderpriority") == "1-URGENT").select(F.lit("urgent").alias("src"))
    low = od.filter(F.col("o_orderpriority") == "5-LOW").select(F.lit("low").alias("src"))
    return urgent.unionByName(low).groupBy("src").agg(F.count("*").alias("n")).orderBy("src")


# ---------------------------------------------------------------------------
# Scalar functions: string / date / math / JSON.
# ---------------------------------------------------------------------------


@query(
    "q_string_funcs",
    oracle="""
    SELECT p_partkey,
           upper(p_type)                                    AS type_upper,
           substr(p_name, 1, 8)                             AS name_prefix,
           length(p_name)                                   AS name_len,
           concat(p_brand, ':', p_type)                     AS brand_type,
           CAST(regexp_extract(p_brand, '#(\\d+)', 1) AS INT) AS brand_num,
           replace(p_name, ' ', '_')                        AS name_snake
    FROM part
    WHERE p_size <= 5
    ORDER BY p_partkey
    """,
)
def string_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    pa = load_table(spark, sf_dir, "part")
    return (
        pa.filter(F.col("p_size") <= 5)
        .select(
            "p_partkey",
            F.upper("p_type").alias("type_upper"),
            F.substring("p_name", 1, 8).alias("name_prefix"),
            F.length("p_name").cast("bigint").alias("name_len"),
            F.concat_ws(":", "p_brand", "p_type").alias("brand_type"),
            F.regexp_extract("p_brand", r"#(\d+)", 1).cast("int").alias("brand_num"),
            F.replace(F.col("p_name"), F.lit(" "), F.lit("_")).alias("name_snake"),
        )
        .orderBy("p_partkey")
    )


@query(
    "q_date_funcs",
    oracle="""
    SELECT CAST(year(o_orderdate) AS INT)    AS order_year,
           CAST(quarter(o_orderdate) AS INT) AS order_quarter,
           count(*)                          AS n_orders,
           floor((sum(o_totalprice)) * 100.0 + 0.5) / 100.0       AS total_sales
    FROM orders
    GROUP BY 1, 2
    ORDER BY order_year, order_quarter
    """,
)
def date_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    od = load_table(spark, sf_dir, "orders")
    return (
        od.groupBy(
            F.year("o_orderdate").alias("order_year"),
            F.quarter("o_orderdate").alias("order_quarter"),
        )
        .agg(F.count("*").alias("n_orders"), round_half_up(F.sum("o_totalprice"), 2).alias("total_sales"))
        .orderBy("order_year", "order_quarter")
    )


@query(
    "q_math_funcs",
    oracle="""
    SELECT l_orderkey, l_linenumber,
           floor((abs(l_extendedprice - 50000)) * 100.0 + 0.5) / 100.0        AS price_dev,
           floor((CASE WHEN l_quantity >= 0 THEN sqrt(l_quantity) END) * 10000.0 + 0.5) / 10000.0       AS qty_sqrt,
           floor((CASE WHEN l_extendedprice > 0 THEN ln(l_extendedprice) END) * 10000.0 + 0.5) / 10000.0 AS price_ln,
           floor((power(1 + l_discount, 2)) * 10000.0 + 0.5) / 10000.0            AS disc_sq,
           CAST(floor(l_quantity / 10) AS BIGINT)        AS qty_bucket,
           CAST(l_orderkey % 7 AS BIGINT)                AS key_mod
    FROM lineitem
    WHERE l_partkey <= 20
    ORDER BY l_orderkey, l_linenumber
    """,
)
def math_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scalar math over fact rows, with explicit domain guards
    (adversarial part 3): sqrt/ln are undefined off-domain, and the
    engines disagree on what "undefined" means — Spark sqrt(-5) yields
    NaN and DuckDB raises. The engine's semantics: out-of-domain math is
    NULL (the row survives, the value is unknown), stated as the same
    CASE guard on both sides."""
    li = load_table(spark, sf_dir, "lineitem")
    qty_ok = F.col("l_quantity") >= 0
    price_ok = F.col("l_extendedprice") > 0
    return (
        li.filter(F.col("l_partkey") <= 20)
        .select(
            "l_orderkey",
            "l_linenumber",
            round_half_up(F.abs(F.col("l_extendedprice") - 50000), 2).alias("price_dev"),
            round_half_up(F.when(qty_ok, F.sqrt("l_quantity")), 4).alias("qty_sqrt"),
            round_half_up(F.when(price_ok, F.log(F.col("l_extendedprice"))), 4).alias("price_ln"),
            round_half_up(F.pow(1 + F.col("l_discount"), 2), 4).alias("disc_sq"),
            F.floor(F.col("l_quantity") / 10).cast("bigint").alias("qty_bucket"),
            (F.col("l_orderkey") % 7).cast("bigint").alias("key_mod"),
        )
        .orderBy("l_orderkey", "l_linenumber")
    )


@query(
    "q_json_extract",
    oracle="""
    SELECT event_type,
           count(*) AS n_events,
           floor(avg(TRY_CAST(NULLIF(regexp_extract(props, '"k": ([0-9]+)', 1), '') AS BIGINT)) * 10000.0 + 0.5) / 10000.0 AS avg_k
    FROM events
    GROUP BY event_type
    ORDER BY event_type
    """,
)
def json_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """`props` is a JSON string column (`{"k": 87}`): extract server-side
    with get_json_object (codegen'd path, no UDF). try_cast, not cast:
    real feeds carry malformed JSON and wrong-typed values, where
    get_json_object returns a non-numeric string and a plain cast raises
    under ANSI; both engines NULL the value instead (avg skips it, the
    row still counts)."""
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.select("event_type", F.get_json_object("props", "$.k").try_cast("bigint").alias("k"))
        .groupBy("event_type")
        .agg(F.count("*").alias("n_events"), round_half_up(F.avg("k"), 4).alias("avg_k"))
        .orderBy("event_type")
    )


# ---------------------------------------------------------------------------
# Unpivot / melt.
# ---------------------------------------------------------------------------

_UNPIVOT_MEASURE_SQL = """
      SELECT l_returnflag, '{m}' AS measure,
             {total} AS total
      FROM lineitem GROUP BY l_returnflag"""


@query(
    "q_unpivot_measures",
    oracle=" UNION ALL ".join(
        _UNPIVOT_MEASURE_SQL.format(
            m=m,
            total=sql_round_half_up(f"CAST(sum(CAST({m} AS DECIMAL(18,2))) AS DOUBLE)", 2),
        )
        for m in ("l_quantity", "l_extendedprice", "l_discount", "l_tax")
    )
    + " ORDER BY l_returnflag, measure",
)
def unpivot_measures(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Wide→long reshape: melt four lineitem measures into (measure, value)
    rows with DataFrame.unpivot, then aggregate per (returnflag, measure).
    Unpivot is a narrow map-side transform (each input row emits 4 — no
    shuffle, no UDF), so at 100 TB the cost is the same scan plus the one
    bounded-cardinality aggregation shuffle. Sums are exact-decimal so the
    4x-reordered accumulation matches the per-column oracle bit-for-bit."""
    li = load_table(spark, sf_dir, "lineitem")
    long = li.unpivot(
        ids=["l_returnflag"],
        values=["l_quantity", "l_extendedprice", "l_discount", "l_tax"],
        variableColumnName="measure",
        valueColumnName="val",
    )
    return (
        long.groupBy("l_returnflag", "measure")
        .agg(round_half_up(exact_decimal_sum(F.col("val"), 2), 2).alias("total"))
        .orderBy("l_returnflag", "measure")
    )
