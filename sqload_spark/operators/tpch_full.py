"""The remaining TPC-H query shapes (Q2, Q4, Q9, Q11, Q12, Q13, Q15, Q16,
Q17, Q20, Q21, Q22) adapted to the fixture schema, completing 22/22 TPC-H
plan-shape coverage together with relational.py (Q1/Q3/Q5) and
tpch_more.py (Q6/Q7/Q8/Q10/Q14/Q18/Q19).

The fixture star schema has no partsupp table, no
l_commitdate/l_receiptdate, no c_phone and no comment columns, so each
query keeps the CLASSIC PLAN SHAPE (the thing that matters at 100 TB) with
documented column substitutions:

* supply cost         -> min ``l_extendedprice`` observed per part (Q2) /
                         10% of ``p_retailprice`` per unit (Q9)
* availqty vs shipped -> per-(part,supplier) shipped-quantity share of the
                         part's total (Q20)
* "late" line         -> ``l_shipdate > o_orderdate`` (Q4, Q12, Q21)
* l_shipmode          -> ``l_returnflag`` as the categorical axis (Q12)
* comment filters     -> priority / type predicates on existing columns
* phone country code  -> ``c_nationkey % 7`` (Q22)

Every query is hash-checked against a DuckDB oracle; float stability
follows the repo-wide rules (exact decimal sums, shared floor-based
half-up rounding — functions/rounding.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from sqload_spark.functions.rounding import (
    exact_decimal_sum,
    round_half_up,
    sql_exact_decimal_sum,
    sql_round_half_up,
)
from sqload_spark.registry import query
from sqload_spark.sources.tables import load_table


def _ts(s: str) -> F.Column:
    return F.lit(s).cast("timestamp_ntz")


@query(
    "q2_min_cost_supplier",
    oracle="""
    WITH asia_supp AS (
      SELECT s_suppkey, s_acctbal, s_name, n_name
      FROM supplier
      JOIN nation ON s_nationkey = n_nationkey
      JOIN region ON n_regionkey = r_regionkey
      WHERE r_name = 'ASIA'
    ),
    costs AS (
      SELECT l_partkey, l_suppkey, l_extendedprice
      FROM lineitem JOIN asia_supp ON l_suppkey = s_suppkey
    )
    SELECT DISTINCT s_acctbal, s_name, n_name, p_partkey,
           l_extendedprice AS min_price
    FROM part
    JOIN costs ON p_partkey = l_partkey
    JOIN asia_supp ON l_suppkey = s_suppkey
    WHERE p_type = 'LARGE' AND p_size < 15
      AND l_extendedprice = (
        SELECT min(l_extendedprice) FROM costs c2
        WHERE c2.l_partkey = p_partkey)
    ORDER BY s_acctbal DESC, n_name, s_name, p_partkey
    LIMIT 100
    """,
)
def min_cost_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q2 shape: for each qualifying part, the region-scoped
    supplier(s) achieving the minimum cost — a correlated-min subquery
    rewritten as aggregate + join-back.

    Substitution (no partsupp): "cost" is the minimum ``l_extendedprice``
    the part ever shipped at from an ASIA supplier — an exact stored
    double, so the min-equality join-back is bit-exact cross-engine.
    Scale shape: the correlated min is ONE map-side-combined groupBy on
    l_partkey, the dims broadcast, and the join-back reuses the same
    l_partkey shuffle key; equality on the min never needs a sort."""
    su = load_table(spark, sf_dir, "supplier")
    na = load_table(spark, sf_dir, "nation")
    re = load_table(spark, sf_dir, "region")
    li = load_table(spark, sf_dir, "lineitem")
    pa = load_table(spark, sf_dir, "part")
    asia_supp = (
        su.join(F.broadcast(na), su.s_nationkey == na.n_nationkey)
        .join(
            F.broadcast(re.filter(F.col("r_name") == "ASIA")),
            na.n_regionkey == re.r_regionkey,
        )
        .select("s_suppkey", "s_acctbal", "s_name", "n_name")
    )
    costs = li.join(
        asia_supp.select("s_suppkey"),
        li.l_suppkey == F.col("s_suppkey"),
        "left_semi",
    ).select("l_partkey", "l_suppkey", "l_extendedprice")
    min_cost = costs.groupBy("l_partkey").agg(
        F.min("l_extendedprice").alias("min_price")
    )
    return (
        pa.filter((F.col("p_type") == "LARGE") & (F.col("p_size") < 15))
        .join(costs, pa.p_partkey == costs.l_partkey)
        .join(min_cost.withColumnRenamed("l_partkey", "mc_partkey"),
              (F.col("p_partkey") == F.col("mc_partkey"))
              & (F.col("l_extendedprice") == F.col("min_price")))
        .join(asia_supp, F.col("l_suppkey") == F.col("s_suppkey"))
        .select("s_acctbal", "s_name", "n_name", "p_partkey", "min_price")
        .distinct()
        .orderBy(F.col("s_acctbal").desc(), "n_name", "s_name", "p_partkey")
        .limit(100)
    )


@query(
    "q4_order_priority",
    oracle="""
    SELECT o_orderpriority, count(*) AS order_count
    FROM orders
    WHERE o_orderdate >= TIMESTAMP '1997-07-01 00:00:00'
      AND o_orderdate <  TIMESTAMP '1997-10-01 00:00:00'
      AND EXISTS (SELECT 1 FROM lineitem
                  WHERE l_orderkey = o_orderkey AND l_shipdate > o_orderdate)
    GROUP BY o_orderpriority
    ORDER BY o_orderpriority
    """,
)
def order_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q4: order-priority checking — an EXISTS with a non-equi
    correlated predicate, planned as a left-semi join whose condition
    carries both the key equality and the late-shipment comparison
    (substitution: late = l_shipdate > o_orderdate, no commit/receipt
    dates in the fixture). One semi-join shuffle, then a tiny agg."""
    od = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    q = od.filter(
        (F.col("o_orderdate") >= _ts("1997-07-01"))
        & (F.col("o_orderdate") < _ts("1997-10-01"))
    )
    return (
        q.join(
            li,
            (F.col("l_orderkey") == F.col("o_orderkey"))
            & (F.col("l_shipdate") > F.col("o_orderdate")),
            "left_semi",
        )
        .groupBy("o_orderpriority")
        .agg(F.count("*").alias("order_count"))
        .orderBy("o_orderpriority")
    )


@query(
    "q9_product_profit",
    oracle=f"""
    SELECT n_name AS nation, CAST(year(o_orderdate) AS BIGINT) AS o_year,
           {sql_round_half_up(
               sql_exact_decimal_sum(
                   "l_extendedprice * (1 - l_discount)"
                   " - 0.1 * p_retailprice * l_quantity", 4), 2)} AS sum_profit
    FROM lineitem
    JOIN part     ON l_partkey = p_partkey
    JOIN supplier ON l_suppkey = s_suppkey
    JOIN orders   ON l_orderkey = o_orderkey
    JOIN nation   ON s_nationkey = n_nationkey
    WHERE p_name LIKE '%red%'
    GROUP BY 1, 2
    ORDER BY nation, o_year DESC
    """,
)
def product_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q9: product-type profit by nation and year — the five-table
    join where the part filter prunes the fact scan through a broadcast.

    Substitution (no ps_supplycost): unit cost = 10% of p_retailprice.
    The profit expression rounds to 4 decimals exactly (prices are 2dp,
    discounts 2dp, quantities integral), so the decimal-sum is exact and
    the per-group rounding cross-engine-stable even for negative rows."""
    li = load_table(spark, sf_dir, "lineitem")
    pa = load_table(spark, sf_dir, "part")
    su = load_table(spark, sf_dir, "supplier")
    od = load_table(spark, sf_dir, "orders")
    na = load_table(spark, sf_dir, "nation")
    profit = (
        F.col("l_extendedprice") * (1 - F.col("l_discount"))
        - 0.1 * F.col("p_retailprice") * F.col("l_quantity")
    )
    return (
        li.join(
            pa.filter(F.col("p_name").like("%red%")),
            li.l_partkey == pa.p_partkey,
        )
        .join(su, li.l_suppkey == su.s_suppkey)
        .join(od, li.l_orderkey == od.o_orderkey)
        .join(F.broadcast(na), su.s_nationkey == na.n_nationkey)
        .groupBy(
            F.col("n_name").alias("nation"),
            F.year("o_orderdate").cast("bigint").alias("o_year"),
        )
        .agg(round_half_up(exact_decimal_sum(profit, 4), 2).alias("sum_profit"))
        .orderBy("nation", F.col("o_year").desc())
    )


@query(
    "q11_important_stock",
    oracle=f"""
    WITH vals AS (
      SELECT l_partkey,
             {sql_exact_decimal_sum("l_quantity * p_retailprice", 4)} AS value_d
      FROM lineitem
      JOIN part ON l_partkey = p_partkey
      JOIN supplier ON l_suppkey = s_suppkey
      JOIN nation ON s_nationkey = n_nationkey
      WHERE n_name = 'NATION_3'
      GROUP BY l_partkey
    )
    SELECT l_partkey AS p_partkey,
           {sql_round_half_up("value_d", 2)} AS stock_value
    FROM vals
    WHERE value_d * 1000 > (SELECT sum(value_d) FROM vals)
    ORDER BY stock_value DESC, p_partkey
    """,
)
def important_stock(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q11: important stock — per-part inventory value filtered by a
    GLOBAL scalar-subquery threshold (fraction of the grand total).

    Substitution (no partsupp): value = sum(l_quantity * p_retailprice)
    over one nation's shipments. Scale shape: one groupBy(l_partkey) with
    map-side combine; the grand total re-aggregates the tiny per-part
    table and broadcasts a single row back — no second fact scan."""
    li = load_table(spark, sf_dir, "lineitem")
    pa = load_table(spark, sf_dir, "part")
    su = load_table(spark, sf_dir, "supplier")
    na = load_table(spark, sf_dir, "nation")
    vals = (
        li.join(pa, li.l_partkey == pa.p_partkey)
        .join(
            su.join(
                F.broadcast(na.filter(F.col("n_name") == "NATION_3")),
                su.s_nationkey == na.n_nationkey,
            ).select("s_suppkey"),
            li.l_suppkey == F.col("s_suppkey"),
            "left_semi",
        )
        .groupBy("l_partkey")
        .agg(
            exact_decimal_sum(
                F.col("l_quantity") * F.col("p_retailprice"), 4
            ).alias("value_d")
        )
    )
    # Decimal-exact threshold (ADVICE r4): compare value_d*1000 > total so
    # BOTH engines stay in exact decimal arithmetic — multiplying by the
    # double literal 0.001 would route the Spark side through double and a
    # part landing within one ulp of exactly 0.1% could classify
    # differently across engines.
    threshold = vals.agg(F.sum("value_d").alias("thresh"))
    return (
        vals.join(F.broadcast(threshold))
        .filter(F.col("value_d") * 1000 > F.col("thresh"))
        .select(
            F.col("l_partkey").alias("p_partkey"),
            round_half_up(F.col("value_d"), 2).alias("stock_value"),
        )
        .orderBy(F.col("stock_value").desc(), "p_partkey")
    )


@query(
    "q12_shipmode_priority",
    oracle="""
    SELECT l_returnflag,
           CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT','2-HIGH')
                         THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
           CAST(sum(CASE WHEN o_orderpriority NOT IN ('1-URGENT','2-HIGH')
                         THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
    FROM orders JOIN lineitem ON o_orderkey = l_orderkey
    WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
      AND l_shipdate <  TIMESTAMP '1998-01-01 00:00:00'
      AND l_shipdate > o_orderdate
    GROUP BY l_returnflag
    ORDER BY l_returnflag
    """,
)
def shipmode_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q12: shipping modes vs priority — conditional counts split by
    a categorical axis after a fact⋈fact join with a non-equi residual.
    Substitutions: l_returnflag stands in for l_shipmode; late =
    l_shipdate > o_orderdate replaces the commit/receipt comparison."""
    od = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        li.filter(
            (F.col("l_shipdate") >= _ts("1997-01-01"))
            & (F.col("l_shipdate") < _ts("1998-01-01"))
        )
        .join(od, (F.col("o_orderkey") == F.col("l_orderkey"))
              & (F.col("l_shipdate") > F.col("o_orderdate")))
        .groupBy("l_returnflag")
        .agg(
            F.sum(F.when(high, 1).otherwise(0)).cast("bigint").alias("high_line_count"),
            F.sum(F.when(~high, 1).otherwise(0)).cast("bigint").alias("low_line_count"),
        )
        .orderBy("l_returnflag")
    )


@query(
    "q13_customer_distribution",
    oracle="""
    WITH c_orders AS (
      SELECT c_custkey, count(o_orderkey) AS c_count
      FROM customer
      LEFT JOIN orders ON c_custkey = o_custkey
                      AND o_orderpriority <> '5-LOW'
      GROUP BY c_custkey
    )
    SELECT c_count, count(*) AS custdist
    FROM c_orders
    GROUP BY c_count
    ORDER BY custdist DESC, c_count DESC
    """,
)
def customer_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q13: customer order-count distribution — the double
    aggregation over a filtered LEFT OUTER join (customers with zero
    qualifying orders must survive as c_count = 0). Substitution: the
    o_comment NOT LIKE filter becomes a priority exclusion. Scale shape:
    the outer join shuffles on custkey once; the second agg runs on the
    tiny per-customer table."""
    cu = load_table(spark, sf_dir, "customer")
    od = load_table(spark, sf_dir, "orders")
    per_cust = (
        cu.join(
            od.filter(F.col("o_orderpriority") != "5-LOW"),
            cu.c_custkey == od.o_custkey,
            "left_outer",
        )
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return (
        per_cust.groupBy("c_count")
        .agg(F.count("*").alias("custdist"))
        .orderBy(F.col("custdist").desc(), F.col("c_count").desc())
    )


@query(
    "q15_top_supplier",
    oracle=f"""
    WITH revenue AS (
      SELECT l_suppkey,
             {sql_exact_decimal_sum("l_extendedprice * (1 - l_discount)", 4)} AS rev_d
      FROM lineitem
      WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
        AND l_shipdate <  TIMESTAMP '1997-04-01 00:00:00'
      GROUP BY l_suppkey
    )
    SELECT s_suppkey, s_name,
           {sql_round_half_up("rev_d", 2)} AS total_revenue
    FROM supplier JOIN revenue ON s_suppkey = l_suppkey
    WHERE rev_d = (SELECT max(rev_d) FROM revenue)
    ORDER BY s_suppkey
    """,
)
def top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q15: top supplier — the revenue "view" consumed twice: once
    for the global max (scalar subquery) and once to select the arg-max
    row(s). The equality is on the EXACT decimal sum (cast back to double
    only for display), so ties and the max comparison are bit-stable.
    Scale shape: one fact groupBy; the max is an agg of the ~|suppliers|
    row table broadcast back — the fact is scanned once."""
    li = load_table(spark, sf_dir, "lineitem")
    su = load_table(spark, sf_dir, "supplier")
    revenue = (
        li.filter(
            (F.col("l_shipdate") >= _ts("1997-01-01"))
            & (F.col("l_shipdate") < _ts("1997-04-01"))
        )
        .groupBy("l_suppkey")
        .agg(
            exact_decimal_sum(
                F.col("l_extendedprice") * (1 - F.col("l_discount")), 4
            ).alias("rev_d")
        )
    )
    mx = revenue.agg(F.max("rev_d").alias("max_rev"))
    return (
        su.join(revenue, su.s_suppkey == F.col("l_suppkey"))
        .join(F.broadcast(mx))
        .filter(F.col("rev_d") == F.col("max_rev"))
        .select(
            "s_suppkey",
            "s_name",
            round_half_up(F.col("rev_d"), 2).alias("total_revenue"),
        )
        .orderBy("s_suppkey")
    )


@query(
    "q16_parts_supplier_count",
    oracle="""
    SELECT p_brand, p_type, p_size,
           count(DISTINCT l_suppkey) AS supplier_cnt
    FROM lineitem JOIN part ON l_partkey = p_partkey
    WHERE p_brand <> 'Brand#1' AND p_type <> 'PROMO'
      AND p_size IN (1, 4, 7, 10, 13, 16, 19, 22)
      AND l_suppkey NOT IN (
        SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
    GROUP BY p_brand, p_type, p_size
    ORDER BY supplier_cnt DESC, p_brand, p_type, p_size
    """,
)
def parts_supplier_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q16: parts/supplier relationship — count-distinct suppliers
    per part attribute triple, excluding a NOT-IN supplier blacklist
    (substitution: negative account balance stands in for the complaints
    comment filter). The NOT IN over non-null keys plans as a broadcast
    anti join; the distinct-count shuffles once on the group triple."""
    li = load_table(spark, sf_dir, "lineitem")
    pa = load_table(spark, sf_dir, "part")
    su = load_table(spark, sf_dir, "supplier")
    bad = su.filter(F.col("s_acctbal") < 0).select("s_suppkey")
    part_f = pa.filter(
        (F.col("p_brand") != "Brand#1")
        & (F.col("p_type") != "PROMO")
        & F.col("p_size").isin(1, 4, 7, 10, 13, 16, 19, 22)
    )
    return (
        li.join(bad, li.l_suppkey == bad.s_suppkey, "left_anti")
        .join(part_f, li.l_partkey == pa.p_partkey)
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.countDistinct("l_suppkey").alias("supplier_cnt"))
        .orderBy(F.col("supplier_cnt").desc(), "p_brand", "p_type", "p_size")
    )


@query(
    "q17_small_quantity_revenue",
    oracle=f"""
    SELECT {sql_round_half_up(
        sql_exact_decimal_sum("l_extendedprice", 4) + " / 7.0", 2)} AS avg_yearly,
           count(*) AS n_items
    FROM lineitem JOIN part ON l_partkey = p_partkey
    WHERE p_brand = 'Brand#3' AND p_type = 'SMALL'
      AND l_quantity < (
        SELECT 0.5 * avg(l_quantity) FROM lineitem l2
        WHERE l2.l_partkey = p_partkey)
    """,
)
def small_quantity_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q17: small-quantity-order revenue — a correlated per-part
    AVG threshold, rewritten as groupBy(l_partkey) + broadcast join-back.
    Quantities are integral doubles, so the per-part mean (exact integer
    sum / count) and the 0.5× threshold are bit-identical cross-engine.
    Scale shape: the per-part avg table is |parts|-sized and broadcasts;
    the fact is scanned twice but never shuffled on a non-key."""
    li = load_table(spark, sf_dir, "lineitem")
    pa = load_table(spark, sf_dir, "part")
    per_part = li.groupBy(F.col("l_partkey").alias("ap_partkey")).agg(
        (F.lit(0.5) * (F.sum("l_quantity") / F.count("l_quantity"))).alias("half_avg_qty")
    )
    return (
        li.join(
            pa.filter((F.col("p_brand") == "Brand#3") & (F.col("p_type") == "SMALL")),
            li.l_partkey == pa.p_partkey,
        )
        .join(per_part, F.col("l_partkey") == F.col("ap_partkey"))
        .filter(F.col("l_quantity") < F.col("half_avg_qty"))
        .agg(
            round_half_up(
                exact_decimal_sum(F.col("l_extendedprice"), 4) / 7.0, 2
            ).alias("avg_yearly"),
            F.count("*").alias("n_items"),
        )
    )


@query(
    "q20_excess_supply",
    oracle="""
    WITH shipped AS (
      SELECT l_partkey, l_suppkey, sum(l_quantity) AS qty
      FROM lineitem
      WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
        AND l_shipdate <  TIMESTAMP '1998-01-01 00:00:00'
      GROUP BY l_partkey, l_suppkey
    ),
    excess AS (
      SELECT s.l_suppkey
      FROM shipped s
      JOIN (SELECT l_partkey, sum(qty) AS total_qty
            FROM shipped GROUP BY l_partkey) t
        ON s.l_partkey = t.l_partkey
      WHERE s.qty > 0.3 * t.total_qty
        AND s.l_partkey IN (
          SELECT p_partkey FROM part WHERE p_name LIKE 'small%')
    )
    SELECT s_name, n_name
    FROM supplier
    JOIN nation ON s_nationkey = n_nationkey
    JOIN region ON n_regionkey = r_regionkey
    WHERE r_name = 'AFRICA'
      AND s_suppkey IN (SELECT l_suppkey FROM excess)
    ORDER BY s_name
    """,
)
def excess_supply(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q20: suppliers with excess stock — the nested semi-join
    chain: region-scoped suppliers IN (suppliers whose shipped share of a
    name-filtered part exceeds a per-part threshold).

    Substitution (no partsupp.availqty): a supplier qualifies when its
    1997 shipped quantity for a 'small%' part exceeds 30% of that part's
    total. Quantity sums are integral doubles (exact); the 0.3× threshold
    is the same double op in both engines. Scale shape: one
    groupBy(part,supp), a re-agg per part joined back on the same key,
    then two broadcast semi-joins — the fact never shuffles twice."""
    li = load_table(spark, sf_dir, "lineitem")
    pa = load_table(spark, sf_dir, "part")
    su = load_table(spark, sf_dir, "supplier")
    na = load_table(spark, sf_dir, "nation")
    re = load_table(spark, sf_dir, "region")
    shipped = (
        li.filter(
            (F.col("l_shipdate") >= _ts("1997-01-01"))
            & (F.col("l_shipdate") < _ts("1998-01-01"))
        )
        .groupBy("l_partkey", "l_suppkey")
        .agg(F.sum("l_quantity").alias("qty"))
    )
    totals = shipped.groupBy(F.col("l_partkey").alias("t_partkey")).agg(
        F.sum("qty").alias("total_qty")
    )
    small_parts = pa.filter(F.col("p_name").like("small%")).select("p_partkey")
    excess = (
        shipped.join(totals, F.col("l_partkey") == F.col("t_partkey"))
        .filter(F.col("qty") > 0.3 * F.col("total_qty"))
        .join(small_parts, F.col("l_partkey") == F.col("p_partkey"), "left_semi")
        .select("l_suppkey")
    )
    return (
        su.join(F.broadcast(na), su.s_nationkey == na.n_nationkey)
        .join(
            F.broadcast(re.filter(F.col("r_name") == "AFRICA")),
            na.n_regionkey == re.r_regionkey,
        )
        .join(excess, su.s_suppkey == excess.l_suppkey, "left_semi")
        .select("s_name", "n_name")
        .orderBy("s_name")
    )


@query(
    "q21_waiting_suppliers",
    oracle="""
    SELECT s_name, count(*) AS numwait
    FROM supplier
    JOIN lineitem l1 ON s_suppkey = l1.l_suppkey
    JOIN orders o    ON o_orderkey = l1.l_orderkey
    JOIN nation      ON s_nationkey = n_nationkey
    WHERE o_orderstatus = 'F'
      AND l1.l_shipdate > o.o_orderdate
      AND n_name = 'NATION_7'
      AND EXISTS (SELECT 1 FROM lineitem l2
                  WHERE l2.l_orderkey = l1.l_orderkey
                    AND l2.l_suppkey <> l1.l_suppkey)
      AND NOT EXISTS (SELECT 1 FROM lineitem l3
                      WHERE l3.l_orderkey = l1.l_orderkey
                        AND l3.l_suppkey <> l1.l_suppkey
                        AND l3.l_shipdate > o.o_orderdate)
    GROUP BY s_name
    ORDER BY numwait DESC, s_name
    LIMIT 100
    """,
)
def waiting_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q21: suppliers who kept orders waiting — the EXISTS /
    NOT-EXISTS pair over self-joined lineitem (substitution: late =
    l_shipdate > o_orderdate).

    Spark formulation: both correlated quantifiers collapse into ONE
    per-order aggregate — n_supp = countDistinct(suppkey) and n_late_supp
    = countDistinct(suppkey) among late lines. A late l1 in a finished
    order qualifies iff n_supp > 1 (EXISTS another supplier) and
    n_late_supp = 1 (l1's supplier is then necessarily the only late one,
    so NOT EXISTS another late supplier). That turns two shuffling
    semi/anti self-joins into one groupBy(l_orderkey) + broadcast-sized
    join-back — the 100 TB-friendly plan. The DuckDB oracle keeps the
    classic EXISTS form, so the hash-match doubles as an equivalence
    proof of the rewrite."""
    li = load_table(spark, sf_dir, "lineitem")
    su = load_table(spark, sf_dir, "supplier")
    od = load_table(spark, sf_dir, "orders")
    na = load_table(spark, sf_dir, "nation")
    fin = od.filter(F.col("o_orderstatus") == "F").select("o_orderkey", "o_orderdate")
    late = li.join(fin, F.col("l_orderkey") == F.col("o_orderkey")).filter(
        F.col("l_shipdate") > F.col("o_orderdate")
    )
    per_order = (
        li.join(fin.select("o_orderkey"), F.col("l_orderkey") == F.col("o_orderkey"), "left_semi")
        .groupBy("l_orderkey")
        .agg(F.countDistinct("l_suppkey").alias("n_supp"))
    )
    late_per_order = late.groupBy(F.col("l_orderkey").alias("lo_orderkey")).agg(
        F.countDistinct("l_suppkey").alias("n_late_supp")
    )
    qualifying = (
        late.join(per_order.withColumnRenamed("l_orderkey", "po_orderkey"),
                  F.col("l_orderkey") == F.col("po_orderkey"))
        .join(late_per_order, F.col("l_orderkey") == F.col("lo_orderkey"))
        .filter((F.col("n_supp") > 1) & (F.col("n_late_supp") == 1))
    )
    supp = su.join(
        F.broadcast(na.filter(F.col("n_name") == "NATION_7")),
        su.s_nationkey == na.n_nationkey,
    ).select("s_suppkey", "s_name")
    return (
        qualifying.join(supp, F.col("l_suppkey") == F.col("s_suppkey"))
        .groupBy("s_name")
        .agg(F.count("*").alias("numwait"))
        .orderBy(F.col("numwait").desc(), "s_name")
        .limit(100)
    )


@query(
    "q22_global_sales",
    oracle=f"""
    WITH eligible AS (
      SELECT c_custkey, c_acctbal, (c_nationkey % 7) AS cntrycode
      FROM customer
      WHERE (c_nationkey % 7) IN (1, 2, 3, 4, 5)
    ),
    avg_bal AS (
      SELECT {sql_exact_decimal_sum("c_acctbal", 2)} / count(*) AS a
      FROM eligible WHERE c_acctbal > 0.0
    )
    SELECT cntrycode, count(*) AS numcust,
           {sql_round_half_up(sql_exact_decimal_sum("c_acctbal", 2), 2)} AS totacctbal
    FROM eligible
    WHERE c_acctbal > (SELECT a FROM avg_bal)
      AND NOT EXISTS (SELECT 1 FROM orders
                      WHERE o_custkey = c_custkey
                        AND o_orderdate >= TIMESTAMP '1999-01-01 00:00:00')
    GROUP BY cntrycode
    ORDER BY cntrycode
    """,
)
def global_sales(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q22: global sales opportunity — rich customers who never
    recently ordered, bucketed by "country code" (substitutions:
    c_nationkey % 7 stands in for the phone prefix; "no orders" becomes
    "no orders since 1999" because the fixture's dense keys give every
    customer at least one order). Three classic pieces compose: a
    global-average scalar subquery (exact decimal sum / count, so the
    threshold is bit-stable), an anti join against orders, and the final
    small aggregation. Scale shape: the scalar avg broadcasts one row;
    the anti join is the only customer-table shuffle."""
    cu = load_table(spark, sf_dir, "customer")
    od = load_table(spark, sf_dir, "orders")
    eligible = cu.filter((F.col("c_nationkey") % 7).isin(1, 2, 3, 4, 5)).select(
        "c_custkey", "c_acctbal", (F.col("c_nationkey") % 7).alias("cntrycode")
    )
    avg_bal = eligible.filter(F.col("c_acctbal") > 0.0).agg(
        (exact_decimal_sum(F.col("c_acctbal"), 2) / F.count("*")).alias("a")
    )
    return (
        eligible.join(F.broadcast(avg_bal))
        .filter(F.col("c_acctbal") > F.col("a"))
        .join(
            od.filter(F.col("o_orderdate") >= _ts("1999-01-01")),
            F.col("c_custkey") == od.o_custkey,
            "left_anti",
        )
        .groupBy("cntrycode")
        .agg(
            F.count("*").alias("numcust"),
            round_half_up(exact_decimal_sum(F.col("c_acctbal"), 2), 2).alias("totacctbal"),
        )
        .orderBy("cntrycode")
    )


# --- TPC-DS-style shapes ----------------------------------------------------
# Two signature TPC-DS plan shapes the TPC-H suite doesn't exercise,
# adapted to the fixture schema.


@query(
    "qds_hour_bands",
    oracle="""
    SELECT
      (SELECT count(*) FROM events WHERE hour(ts) BETWEEN 0  AND 2  AND event_type = 'view')     AS h0,
      (SELECT count(*) FROM events WHERE hour(ts) BETWEEN 3  AND 5  AND event_type = 'view')     AS h1,
      (SELECT count(*) FROM events WHERE hour(ts) BETWEEN 6  AND 8  AND event_type = 'click')    AS h2,
      (SELECT count(*) FROM events WHERE hour(ts) BETWEEN 9  AND 11 AND event_type = 'click')    AS h3,
      (SELECT count(*) FROM events WHERE hour(ts) BETWEEN 12 AND 14 AND event_type = 'purchase') AS h4,
      (SELECT count(*) FROM events WHERE hour(ts) BETWEEN 15 AND 17 AND event_type = 'purchase') AS h5,
      (SELECT count(*) FROM events WHERE hour(ts) BETWEEN 18 AND 20 AND event_type = 'signup')   AS h6,
      (SELECT count(*) FROM events WHERE hour(ts) BETWEEN 21 AND 23 AND event_type = 'error')    AS h7
    """,
)
def ds_hour_bands(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-DS Q88 shape: one result row of eight independent banded
    counts. The classic formulation (and the oracle) is eight scalar
    subqueries — eight scans. The Spark plan here is the 100 TB rewrite:
    ONE scan with eight conditional aggregates; the hash-match proves the
    rewrite. (Spark would also accept the eight-subquery form, but each
    subquery becomes its own scan stage — at a 100 TB fact table that is
    8× the IO for literally the same answer.)"""
    from sqload_spark.sources.tables import load_table as _lt

    ev = _lt(spark, sf_dir, "events")
    hour = F.hour("ts")
    bands = [
        ((0, 2), "view"), ((3, 5), "view"), ((6, 8), "click"), ((9, 11), "click"),
        ((12, 14), "purchase"), ((15, 17), "purchase"), ((18, 20), "signup"),
        ((21, 23), "error"),
    ]
    aggs = [
        F.sum(
            F.when(
                hour.between(lo, hi) & (F.col("event_type") == et), 1
            ).otherwise(0)
        ).cast("bigint").alias(f"h{i}")
        for i, ((lo, hi), et) in enumerate(bands)
    ]
    return ev.agg(*aggs)


@query(
    "qds_yoy_ratio",
    oracle=f"""
    WITH yearly AS (
      SELECT n_name, CAST(year(o_orderdate) AS BIGINT) AS o_year,
             {sql_exact_decimal_sum("o_totalprice", 2)} AS rev_d
      FROM orders
      JOIN customer ON o_custkey = c_custkey
      JOIN nation   ON c_nationkey = n_nationkey
      WHERE o_orderdate IS NOT NULL
      GROUP BY 1, 2
    )
    SELECT n_name, o_year,
           {sql_round_half_up("rev_d", 2)} AS revenue,
           {sql_round_half_up(
               "rev_d / lag(rev_d) OVER (PARTITION BY n_name ORDER BY o_year)", 6)} AS yoy_ratio
    FROM yearly
    QUALIFY lag(rev_d) OVER (PARTITION BY n_name ORDER BY o_year) IS NOT NULL
    ORDER BY n_name, o_year
    """,
)
def ds_yoy_ratio(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-DS Q47 shape: window-over-aggregate — yearly revenue per nation,
    then a lag() ratio across years WITHIN the aggregated table. The
    window runs on the |nations × years| aggregate, never the fact; the
    ratio divides exact decimal sums so it is bit-stable at 6dp.

    Calendar rollups exclude unknown dates (adversarial part 3): a NULL
    o_orderdate has no year, and a NULL year in the lag chain diverges
    between engines twice over — NULL-ordering decides WHICH row becomes
    its lag, and the NULL group promotes the oracle's BIGINT year column
    to float64 in pandas (dtype hash break). The explicit IS NOT NULL is
    the stated semantics, on both sides."""
    from sqload_spark.sources.tables import load_table as _lt
    from pyspark.sql import Window as W

    od = _lt(spark, sf_dir, "orders").filter(F.col("o_orderdate").isNotNull())
    cu = _lt(spark, sf_dir, "customer")
    na = _lt(spark, sf_dir, "nation")
    yearly = (
        od.join(cu, od.o_custkey == cu.c_custkey)
        .join(F.broadcast(na), cu.c_nationkey == na.n_nationkey)
        .groupBy("n_name", F.year("o_orderdate").cast("bigint").alias("o_year"))
        .agg(exact_decimal_sum(F.col("o_totalprice"), 2).alias("rev_d"))
    )
    w = W.partitionBy("n_name").orderBy("o_year")
    prev = F.lag("rev_d").over(w)
    return (
        yearly.withColumn("prev", prev)
        .filter(F.col("prev").isNotNull())
        .select(
            "n_name", "o_year",
            round_half_up(F.col("rev_d"), 2).alias("revenue"),
            round_half_up(F.col("rev_d") / F.col("prev"), 6).alias("yoy_ratio"),
        )
        .orderBy("n_name", "o_year")
    )
