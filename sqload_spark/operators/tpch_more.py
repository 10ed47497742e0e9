"""Additional TPC-H-shaped queries adapted to the fixture schema (no
partsupp/shipmode/comment columns, so predicates use the columns that
exist). These broaden the relational surface with the classic plan shapes:
Q6 single-scan conditional sum, Q10 returned-item top-k join, Q14 ratio
of conditional aggregates over a fact⋈dim join, Q18 large-order semi-
aggregation, Q19 disjunctive multi-attribute predicates.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from sqload_spark.functions.rounding import (
    exact_decimal_sum,
    round_half_up,
    sql_round_half_up,
)
from sqload_spark.registry import query
from sqload_spark.sources.tables import load_table


@query(
    "q6_forecast_revenue",
    oracle="""
    SELECT floor((CAST(sum(CAST((l_extendedprice * l_discount) AS DECIMAL(18,4))) AS DOUBLE)) * 100.0 + 0.5) / 100.0 AS revenue,
           count(*) AS n_items
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
      AND l_shipdate <  TIMESTAMP '1998-01-01 00:00:00'
      AND l_discount BETWEEN 0.05 AND 0.07
      AND l_quantity < 24
    """,
)
def forecast_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q6: pure scan + pushed predicates + one aggregate — the
    pushdown stress test."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.filter(
        (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp_ntz"))
        & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp_ntz"))
        & (F.col("l_discount").between(0.05, 0.07))
        & (F.col("l_quantity") < 24)
    ).agg(
        round_half_up(exact_decimal_sum(F.col("l_extendedprice") * F.col("l_discount"), 4), 2).alias(
            "revenue"
        ),
        F.count("*").alias("n_items"),
    )


@query(
    "q10_returned_items",
    oracle="""
    SELECT c_custkey, c_name,
           floor((CAST(sum(CAST((l_extendedprice * (1 - l_discount)) AS DECIMAL(18,4))) AS DOUBLE)) * 100.0 + 0.5) / 100.0 AS revenue,
           n_name
    FROM customer
    JOIN orders   ON c_custkey = o_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    JOIN nation   ON c_nationkey = n_nationkey
    WHERE o_orderdate >= TIMESTAMP '1997-01-01 00:00:00'
      AND o_orderdate <  TIMESTAMP '1997-04-01 00:00:00'
      AND l_returnflag = 'R'
    GROUP BY c_custkey, c_name, n_name
    ORDER BY revenue DESC, c_custkey
    LIMIT 20
    """,
)
def returned_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q10: who returned the most revenue last quarter."""
    cu = load_table(spark, sf_dir, "customer")
    od = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    na = load_table(spark, sf_dir, "nation")
    return (
        li.filter(F.col("l_returnflag") == "R")
        .join(
            od.filter(
                (F.col("o_orderdate") >= F.lit("1997-01-01").cast("timestamp_ntz"))
                & (F.col("o_orderdate") < F.lit("1997-04-01").cast("timestamp_ntz"))
            ),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        .join(cu, F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(na), F.col("c_nationkey") == F.col("n_nationkey"))
        .groupBy("c_custkey", "c_name", "n_name")
        .agg(
            round_half_up(
                exact_decimal_sum(F.col("l_extendedprice") * (1 - F.col("l_discount")), 4), 2
            ).alias("revenue")
        )
        .select("c_custkey", "c_name", "revenue", "n_name")
        .orderBy(F.col("revenue").desc(), "c_custkey")
        .limit(20)
    )


@query(
    "q14_promo_share",
    oracle=f"""
    SELECT {sql_round_half_up(
        "100.0 * CAST(sum(CAST((CASE WHEN p_type = 'PROMO' THEN l_extendedprice * (1 - l_discount) ELSE 0 END) AS DECIMAL(18,4))) AS DOUBLE)"
        " / CAST(sum(CAST((l_extendedprice * (1 - l_discount)) AS DECIMAL(18,4))) AS DOUBLE)", 4)} AS promo_share,
           count(*) AS n_items
    FROM lineitem JOIN part ON l_partkey = p_partkey
    WHERE l_shipdate >= TIMESTAMP '1997-06-01 00:00:00'
      AND l_shipdate <  TIMESTAMP '1997-07-01 00:00:00'
    """,
)
def promo_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q14: promo revenue share — ratio of two conditional exact-
    decimal sums over a broadcast dim join."""
    li = load_table(spark, sf_dir, "lineitem")
    pa = load_table(spark, sf_dir, "part")
    net = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    promo_net = F.when(F.col("p_type") == "PROMO", net).otherwise(F.lit(0.0))
    return (
        li.filter(
            (F.col("l_shipdate") >= F.lit("1997-06-01").cast("timestamp_ntz"))
            & (F.col("l_shipdate") < F.lit("1997-07-01").cast("timestamp_ntz"))
        )
        .join(pa, F.col("l_partkey") == F.col("p_partkey"))
        .agg(
            round_half_up(
                100.0 * exact_decimal_sum(promo_net, 4) / exact_decimal_sum(net, 4), 4
            ).alias("promo_share"),
            F.count("*").alias("n_items"),
        )
    )


@query(
    "q18_large_orders",
    oracle="""
    SELECT c_custkey, c_name, o_orderkey, o_totalprice,
           floor((sum(l_quantity)) * 100.0 + 0.5) / 100.0 AS total_qty
    FROM customer
    JOIN orders   ON c_custkey = o_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    WHERE o_orderkey IN (
      SELECT l_orderkey FROM lineitem GROUP BY l_orderkey HAVING sum(l_quantity) > 160
    )
    GROUP BY c_custkey, c_name, o_orderkey, o_totalprice
    ORDER BY o_totalprice DESC, o_orderkey
    LIMIT 50
    """,
)
def large_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q18: large-volume orders via an IN over a grouped HAVING."""
    cu = load_table(spark, sf_dir, "customer")
    od = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    big = (
        li.groupBy("l_orderkey")
        .agg(F.sum("l_quantity").alias("q"))
        .filter(F.col("q") > 160)
        .select("l_orderkey")
    )
    return (
        li.join(big, "l_orderkey", "left_semi")
        .join(od, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(cu, F.col("o_custkey") == F.col("c_custkey"))
        .groupBy("c_custkey", "c_name", "o_orderkey", "o_totalprice")
        .agg(round_half_up(F.sum("l_quantity"), 2).alias("total_qty"))
        .orderBy(F.col("o_totalprice").desc(), "o_orderkey")
        .limit(50)
    )


@query(
    "q19_disjunctive_predicates",
    oracle="""
    SELECT floor((CAST(sum(CAST((l_extendedprice * (1 - l_discount)) AS DECIMAL(18,4))) AS DOUBLE)) * 100.0 + 0.5) / 100.0 AS revenue,
           count(*) AS n_items
    FROM lineitem JOIN part ON l_partkey = p_partkey
    WHERE (p_brand = 'Brand#1' AND p_size BETWEEN 1 AND 15 AND l_quantity BETWEEN 1 AND 20)
       OR (p_brand = 'Brand#2' AND p_size BETWEEN 10 AND 30 AND l_quantity BETWEEN 10 AND 30)
       OR (p_type = 'ECONOMY'  AND p_size BETWEEN 20 AND 50 AND l_quantity BETWEEN 20 AND 40)
    """,
)
def disjunctive_predicates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q19 shape: OR-of-ANDs across both join sides — exercises
    predicate normalization and join-condition extraction."""
    li = load_table(spark, sf_dir, "lineitem")
    pa = load_table(spark, sf_dir, "part")
    joined = li.join(pa, F.col("l_partkey") == F.col("p_partkey"))
    cond = (
        ((F.col("p_brand") == "Brand#1") & F.col("p_size").between(1, 15) & F.col("l_quantity").between(1, 20))
        | ((F.col("p_brand") == "Brand#2") & F.col("p_size").between(10, 30) & F.col("l_quantity").between(10, 30))
        | ((F.col("p_type") == "ECONOMY") & F.col("p_size").between(20, 50) & F.col("l_quantity").between(20, 40))
    )
    return joined.filter(cond).agg(
        round_half_up(
            exact_decimal_sum(F.col("l_extendedprice") * (1 - F.col("l_discount")), 4), 2
        ).alias("revenue"),
        F.count("*").alias("n_items"),
    )


@query(
    "q7_volume_shipping",
    oracle=f"""
    SELECT n1.n_name AS supp_nation,
           n2.n_name AS cust_nation,
           CAST(year(l.l_shipdate) AS BIGINT) AS l_year,
           {sql_round_half_up(
               "CAST(sum(CAST((l.l_extendedprice * (1 - l.l_discount)) AS DECIMAL(18,4))) AS DOUBLE)", 2)} AS revenue
    FROM lineitem l
    JOIN orders o   ON l.l_orderkey = o.o_orderkey
    JOIN customer c ON o.o_custkey = c.c_custkey
    JOIN nation n2  ON c.c_nationkey = n2.n_nationkey
    JOIN supplier s ON l.l_suppkey = s.s_suppkey
    JOIN nation n1  ON s.s_nationkey = n1.n_nationkey
    WHERE ((n1.n_name = 'NATION_9' AND n2.n_name = 'NATION_10')
        OR (n1.n_name = 'NATION_10' AND n2.n_name = 'NATION_9'))
    GROUP BY 1, 2, 3
    ORDER BY supp_nation, cust_nation, l_year
    """,
)
def volume_shipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q7: the six-table join with a DISJUNCTIVE cross-nation
    predicate — supplier nation and customer nation reach the fact table
    through different join paths, so the planner must broadcast both
    nation dims down both arms and keep the one fact⋈orders shuffle. The
    classic test that join reordering + broadcast selection compose."""
    li = load_table(spark, sf_dir, "lineitem")
    od = load_table(spark, sf_dir, "orders")
    cu = load_table(spark, sf_dir, "customer")
    su = load_table(spark, sf_dir, "supplier")
    na = load_table(spark, sf_dir, "nation")
    n1 = na.select(F.col("n_nationkey").alias("s_nk"), F.col("n_name").alias("supp_nation"))
    n2 = na.select(F.col("n_nationkey").alias("c_nk"), F.col("n_name").alias("cust_nation"))
    joined = (
        li.join(od, li.l_orderkey == od.o_orderkey)
        .join(cu, od.o_custkey == cu.c_custkey)
        .join(F.broadcast(n2), cu.c_nationkey == F.col("c_nk"))
        .join(su, li.l_suppkey == su.s_suppkey)
        .join(F.broadcast(n1), su.s_nationkey == F.col("s_nk"))
        .filter(
            ((F.col("supp_nation") == "NATION_9") & (F.col("cust_nation") == "NATION_10"))
            | ((F.col("supp_nation") == "NATION_10") & (F.col("cust_nation") == "NATION_9"))
        )
    )
    return (
        joined.groupBy(
            "supp_nation", "cust_nation", F.year("l_shipdate").cast("bigint").alias("l_year")
        )
        .agg(
            round_half_up(
                exact_decimal_sum(F.col("l_extendedprice") * (1 - F.col("l_discount")), 4), 2
            ).alias("revenue")
        )
        .orderBy("supp_nation", "cust_nation", "l_year")
    )


@query(
    "q8_market_share",
    oracle=f"""
    WITH volumes AS (
      SELECT CAST(year(o.o_orderdate) AS BIGINT) AS o_year,
             CAST((l.l_extendedprice * (1 - l.l_discount)) AS DECIMAL(18,4)) AS volume,
             n1.n_name AS supp_nation
      FROM lineitem l
      JOIN part p     ON l.l_partkey = p.p_partkey
      JOIN orders o   ON l.l_orderkey = o.o_orderkey
      JOIN customer c ON o.o_custkey = c.c_custkey
      JOIN nation n2  ON c.c_nationkey = n2.n_nationkey
      JOIN region r   ON n2.n_regionkey = r.r_regionkey
      JOIN supplier s ON l.l_suppkey = s.s_suppkey
      JOIN nation n1  ON s.s_nationkey = n1.n_nationkey
      WHERE r.r_name = 'EUROPE' AND p.p_type = 'ECONOMY'
    )
    SELECT o_year,
           {sql_round_half_up(
               "CAST(sum(CASE WHEN supp_nation = 'NATION_9' THEN volume ELSE 0 END) AS DOUBLE)"
               " / CAST(sum(volume) AS DOUBLE)", 6)} AS mkt_share,
           count(*) AS n_items
    FROM volumes
    GROUP BY o_year
    ORDER BY o_year
    """,
)
def market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q8: national market share — an EIGHT-table star join feeding
    a conditional-aggregate ratio per year. Every dimension broadcasts;
    the only shuffles are fact⋈orders and the final per-year aggregation.
    The exact-decimal volumes make the ratio engine-stable at 6dp."""
    li = load_table(spark, sf_dir, "lineitem")
    od = load_table(spark, sf_dir, "orders")
    cu = load_table(spark, sf_dir, "customer")
    su = load_table(spark, sf_dir, "supplier")
    na = load_table(spark, sf_dir, "nation")
    re = load_table(spark, sf_dir, "region")
    pa = load_table(spark, sf_dir, "part")
    n1 = na.select(F.col("n_nationkey").alias("s_nk"), F.col("n_name").alias("supp_nation"))
    n2 = na.select(F.col("n_nationkey").alias("c_nk"), F.col("n_regionkey").alias("c_rk"))
    vol = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    volumes = (
        li.join(pa.filter(F.col("p_type") == "ECONOMY"), li.l_partkey == pa.p_partkey)
        .join(od, li.l_orderkey == od.o_orderkey)
        .join(cu, od.o_custkey == cu.c_custkey)
        .join(F.broadcast(n2), cu.c_nationkey == F.col("c_nk"))
        .join(
            F.broadcast(re.filter(F.col("r_name") == "EUROPE")),
            F.col("c_rk") == re.r_regionkey,
        )
        .join(su, li.l_suppkey == su.s_suppkey)
        .join(F.broadcast(n1), su.s_nationkey == F.col("s_nk"))
        .select(
            F.year("o_orderdate").cast("bigint").alias("o_year"),
            vol.cast("decimal(18,4)").alias("volume"),
            "supp_nation",
        )
    )
    fr = F.when(F.col("supp_nation") == "NATION_9", F.col("volume")).otherwise(
        F.lit(0).cast("decimal(18,4)")
    )
    return (
        volumes.groupBy("o_year")
        .agg(
            round_half_up(
                F.sum(fr).cast("double") / F.sum("volume").cast("double"), 6
            ).alias("mkt_share"),
            F.count("*").alias("n_items"),
        )
        .orderBy("o_year")
    )
