"""Statistical aggregates: stddev/variance/correlation/covariance, exact
percentiles (linear interpolation — identical in Spark and DuckDB), median,
approximate percentile sketches, ordered string aggregation, GROUPING SETS.

All exact ops are oracle-checked; the sketch op is rows-only (engine-
specific estimates) with its error bounded in tests.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from sqload_spark.functions.rounding import round_half_up, sql_round_half_up
from sqload_spark.registry import query
from sqload_spark.sources.tables import load_table, register_views


@query(
    "q_stats_moments",
    oracle=f"""
    SELECT l_returnflag,
           {sql_round_half_up("stddev_samp(l_extendedprice)", 4)} AS price_stddev,
           {sql_round_half_up("var_samp(l_quantity)", 4)} AS qty_var,
           {sql_round_half_up("corr(l_extendedprice, l_quantity)", 4)} AS price_qty_corr,
           {sql_round_half_up("covar_samp(l_extendedprice, l_discount)", 4)} AS price_disc_covar
    FROM lineitem
    GROUP BY l_returnflag
    ORDER BY l_returnflag
    """,
)
def stats_moments(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.groupBy("l_returnflag")
        .agg(
            round_half_up(F.stddev_samp("l_extendedprice"), 4).alias("price_stddev"),
            round_half_up(F.var_samp("l_quantity"), 4).alias("qty_var"),
            round_half_up(F.corr("l_extendedprice", "l_quantity"), 4).alias("price_qty_corr"),
            round_half_up(F.covar_samp("l_extendedprice", "l_discount"), 4).alias("price_disc_covar"),
        )
        .orderBy("l_returnflag")
    )


@query(
    "q_percentiles",
    oracle=f"""
    SELECT l_returnflag,
           {sql_round_half_up("quantile_cont(l_extendedprice, 0.25)", 4)} AS price_p25,
           {sql_round_half_up("quantile_cont(l_extendedprice, 0.5)", 4)} AS price_median,
           {sql_round_half_up("quantile_cont(l_extendedprice, 0.75)", 4)} AS price_p75,
           {sql_round_half_up("quantile_cont(l_extendedprice, 0.99)", 4)} AS price_p99
    FROM lineitem
    GROUP BY l_returnflag
    ORDER BY l_returnflag
    """,
)
def percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact percentiles (both engines use linear interpolation between
    order statistics, so values agree bit-for-bit before rounding)."""
    li = load_table(spark, sf_dir, "lineitem")
    pcts = F.percentile("l_extendedprice", F.array(F.lit(0.25), F.lit(0.5), F.lit(0.75), F.lit(0.99)))
    return (
        li.groupBy("l_returnflag")
        .agg(pcts.alias("p"))
        .select(
            "l_returnflag",
            round_half_up(F.col("p")[0], 4).alias("price_p25"),
            round_half_up(F.col("p")[1], 4).alias("price_median"),
            round_half_up(F.col("p")[2], 4).alias("price_p75"),
            round_half_up(F.col("p")[3], 4).alias("price_p99"),
        )
        .orderBy("l_returnflag")
    )


@query(
    "q_approx_percentile",
    oracle=f"""
    SELECT l_returnflag,
           {sql_round_half_up("quantile_cont(l_extendedprice, 0.5)", 4)}
             AS exact_median,
           TRUE AS within_bound
    FROM lineitem
    GROUP BY l_returnflag
    ORDER BY l_returnflag
    """,
)
def approx_percentile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """approx_percentile sketch (GK-style) next to the exact value — the
    100 TB path for quantiles (single pass, mergeable, no global sort) —
    as a CHECKED twin (VERDICT r5 #4): the estimate is engine-specific so
    the result carries the exact median plus `within_bound` = estimate
    lies between the exact 0.47 and 0.53 quantiles; accuracy=1000
    guarantees rank error ≤ 0.001, a 30× margin, so the boolean is
    deterministic and a sketch regression flips it to a hash mismatch.
    The oracle asserts the bound by construction (TRUE); the error-curve
    law remains in pytest."""
    li = load_table(spark, sf_dir, "lineitem")
    q = F.percentile(
        "l_extendedprice", F.array(F.lit(0.47), F.lit(0.5), F.lit(0.53))
    )
    return (
        li.groupBy("l_returnflag")
        .agg(
            F.approx_percentile("l_extendedprice", 0.5, 1000).alias("approx_median"),
            q.alias("q"),
        )
        .select(
            "l_returnflag",
            round_half_up(F.col("q")[1], 4).alias("exact_median"),
            F.col("approx_median").between(F.col("q")[0], F.col("q")[2]).alias(
                "within_bound"
            ),
        )
        .orderBy("l_returnflag")
    )


@query(
    "q_string_agg",
    oracle="""
    SELECT n_name, string_agg(s_name, ',' ORDER BY s_name) AS supplier_csv,
           count(*) AS n_suppliers
    FROM supplier JOIN nation ON s_nationkey = n_nationkey
    GROUP BY n_name
    ORDER BY n_name
    """,
)
def string_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    su = load_table(spark, sf_dir, "supplier")
    na = load_table(spark, sf_dir, "nation")
    return (
        su.join(F.broadcast(na), F.col("s_nationkey") == F.col("n_nationkey"))
        .groupBy("n_name")
        .agg(
            F.array_join(F.array_sort(F.collect_list("s_name")), ",").alias("supplier_csv"),
            F.count("*").alias("n_suppliers"),
        )
        .orderBy("n_name")
    )


@query(
    "q_window_first_nth",
    oracle="""
    SELECT s_suppkey, s_nationkey,
           first_value(s_name) OVER w AS richest,
           nth_value(s_name, 2) OVER w AS second_richest,
           last_value(s_name) OVER w AS poorest
    FROM supplier
    WINDOW w AS (PARTITION BY s_nationkey ORDER BY s_acctbal DESC, s_suppkey
                 ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
    ORDER BY s_suppkey
    """,
)
def window_first_nth(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window as W

    su = load_table(spark, sf_dir, "supplier")
    w = (
        W.partitionBy("s_nationkey")
        .orderBy(F.col("s_acctbal").desc(), "s_suppkey")
        .rowsBetween(W.unboundedPreceding, W.unboundedFollowing)
    )
    return (
        su.select(
            "s_suppkey",
            "s_nationkey",
            F.first("s_name").over(w).alias("richest"),
            F.nth_value("s_name", 2).over(w).alias("second_richest"),
            F.last("s_name").over(w).alias("poorest"),
        )
        .orderBy("s_suppkey")
    )


@query(
    "q_grouping_sets",
    oracle="""
    SELECT coalesce(o_orderstatus, 'ALL') AS status,
           coalesce(o_orderpriority, 'ALL') AS priority,
           count(*) AS n_orders,
           floor((sum(o_totalprice)) * 100.0 + 0.5) / 100.0 AS total
    FROM orders
    GROUP BY GROUPING SETS ((o_orderstatus, o_orderpriority), (o_orderstatus), ())
    ORDER BY status, priority
    """,
)
def grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit GROUPING SETS through the SQL API (same Catalyst Expand
    operator the rollup/cube DataFrame calls produce)."""
    register_views(spark, sf_dir)
    return spark.sql(
        """
        SELECT coalesce(o_orderstatus, 'ALL') AS status,
               coalesce(o_orderpriority, 'ALL') AS priority,
               count(*) AS n_orders,
               -- 100.0D: in Spark SQL a bare 100.0 is a DECIMAL literal, and
               -- floor() returns BIGINT, so BIGINT/DECIMAL would make this
               -- column DecimalType vs the oracle's DOUBLE (driver hash fail).
               floor((sum(o_totalprice)) * 100.0D + 0.5D) / 100.0D AS total
        FROM orders
        GROUP BY GROUPING SETS ((o_orderstatus, o_orderpriority), (o_orderstatus), ())
        ORDER BY status, priority
        """
    )


@query(
    "q_mode_per_group",
    oracle="""
    SELECT user_id, event_type AS mode_type, n FROM (
      SELECT user_id, event_type, count(*) AS n,
             row_number() OVER (
               PARTITION BY user_id ORDER BY count(*) DESC, event_type NULLS LAST) AS rn
      FROM events GROUP BY user_id, event_type)
    WHERE rn = 1
    ORDER BY user_id
    """,
)
def mode_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-entity MODE (most frequent category): count per (key, category)
    — one shuffle with map-side partials — then a window argmax with a
    total tie-break. The grouped-argmax shape every feature pipeline
    needs; never collects a frequency map driver-side. The categorical
    tie-break is NULLS LAST (the engine's window NULL-ordering contract):
    if an entity's NULL-category count ties its top real category, both
    engines prefer the real one."""
    ev = load_table(spark, sf_dir, "events")
    counted = ev.groupBy("user_id", "event_type").agg(F.count("*").alias("n"))
    w = W.partitionBy("user_id").orderBy(F.col("n").desc(), F.asc_nulls_last("event_type"))
    return (
        counted.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("user_id", F.col("event_type").alias("mode_type"), "n")
        .orderBy("user_id")
    )


# ---------------------------------------------------------------------------
# Data profiling (the ANALYZE-TABLE shape).
# ---------------------------------------------------------------------------

_PROFILE_COLS = ("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice", "o_orderpriority")

_PROFILE_MEASURE_SQL = """
      SELECT '{c}' AS col_name,
             count(*) AS n_rows,
             count({c}) AS n_nonnull,
             count(DISTINCT {c}) AS n_distinct,
             CAST(min({c}) AS VARCHAR) AS min_str,
             CAST(max({c}) AS VARCHAR) AS max_str
      FROM orders"""


@query(
    "q_profile_columns",
    oracle=" UNION ALL ".join(
        _PROFILE_MEASURE_SQL.format(c=c) for c in _PROFILE_COLS
    )
    + " ORDER BY col_name",
)
def profile_columns(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Column-profile report (row/non-null/distinct counts, min/max as
    strings) for five orders columns — the table-statistics pass every
    ingest runs before partitioning and every optimizer feeds on. One
    aggregation per column over a single cached scan, unioned; at scale
    each is a partial-aggregated pass with bounded output, and the distinct
    counts are the only shuffles (swap in approx_count_distinct when
    estimates suffice — the exact form here is what the oracle can check).
    Values stringified so one schema carries numeric and varchar columns."""
    od = load_table(spark, sf_dir, "orders")

    def one(c: str) -> DataFrame:
        return od.agg(
            F.count("*").alias("n_rows"),
            F.count(c).alias("n_nonnull"),
            F.countDistinct(c).alias("n_distinct"),
            F.min(c).cast("string").alias("min_str"),
            F.max(c).cast("string").alias("max_str"),
        ).select(F.lit(c).alias("col_name"), "*")

    out = one(_PROFILE_COLS[0])
    for c in _PROFILE_COLS[1:]:
        out = out.unionByName(one(c))
    return out.orderBy("col_name")


N_HIST_BUCKETS = 10


@query(
    "q_equidepth_histogram",
    oracle=f"""
    WITH bucketed AS (
      SELECT o_totalprice,
             ntile({N_HIST_BUCKETS}) OVER (ORDER BY o_totalprice NULLS LAST, o_orderkey) AS bucket
      FROM orders
    )
    SELECT bucket,
           count(*) AS n_rows,
           {sql_round_half_up("min(o_totalprice)", 2)} AS lo,
           {sql_round_half_up("max(o_totalprice)", 2)} AS hi
    FROM bucketed
    GROUP BY bucket
    ORDER BY bucket
    """,
)
def equidepth_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Equi-depth histogram of order totals ({N_HIST_BUCKETS} buckets with
    equal row counts, bounds reported) — the optimizer statistic that
    survives skew where equi-width bins collapse. ntile with a unique
    tie-break makes bucket assignment total and cross-engine identical.
    Note the global sort: exact equi-depth is inherently a total order —
    at 100 TB you run this on a sample or swap in approx_percentile
    bounds; the exact form is what the oracle can check. NULLS LAST on
    the ascending price key (the engine's window NULL-ordering contract,
    see window_running_revenue): a NULL price lands in the last bucket in
    both engines instead of shifting every bucket boundary."""
    od = load_table(spark, sf_dir, "orders")
    w = W.orderBy(F.asc_nulls_last("o_totalprice"), "o_orderkey")
    return (
        od.select("o_totalprice", F.ntile(N_HIST_BUCKETS).over(w).alias("bucket"))
        .groupBy("bucket")
        .agg(
            F.count("*").alias("n_rows"),
            round_half_up(F.min("o_totalprice"), 2).alias("lo"),
            round_half_up(F.max("o_totalprice"), 2).alias("hi"),
        )
        .orderBy("bucket")
    )


@query(
    "q_winsorize",
    oracle=f"""
    WITH bounds AS (
      SELECT quantile_cont(o_totalprice, 0.01) AS p01,
             quantile_cont(o_totalprice, 0.99) AS p99
      FROM orders
    )
    SELECT o.o_orderstatus,
           count(*) AS n_orders,
           CAST(sum(CASE WHEN o.o_totalprice < b.p01 OR o.o_totalprice > b.p99
                    THEN 1 ELSE 0 END) AS BIGINT) AS n_clipped,
           {sql_round_half_up("avg(o.o_totalprice)", 4)} AS mean_raw,
           {sql_round_half_up(
               "avg(greatest(b.p01, least(b.p99, o.o_totalprice)))", 4)} AS mean_winsor
    FROM orders o CROSS JOIN bounds b
    GROUP BY o.o_orderstatus
    ORDER BY o.o_orderstatus
    """,
)
def winsorize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Winsorized means: clip order totals at the exact [P1, P99] bounds
    and report raw vs clipped means per status — the outlier-robust
    aggregation a metrics pipeline applies before averaging heavy-tailed
    values. The bounds are ONE tiny percentile aggregate broadcast back
    (cross join of a 1-row frame), so the clip pass stays map-side;
    percentile_cont's linear interpolation is identical in both engines."""
    od = load_table(spark, sf_dir, "orders")
    bounds = od.agg(
        F.expr("percentile(o_totalprice, 0.01)").alias("p01"),
        F.expr("percentile(o_totalprice, 0.99)").alias("p99"),
    )
    clipped = F.greatest(F.col("p01"), F.least(F.col("p99"), F.col("o_totalprice")))
    out_of = (F.col("o_totalprice") < F.col("p01")) | (F.col("o_totalprice") > F.col("p99"))
    return (
        od.crossJoin(F.broadcast(bounds))
        .groupBy("o_orderstatus")
        .agg(
            F.count("*").alias("n_orders"),
            F.sum(F.when(out_of, 1).otherwise(0)).cast("bigint").alias("n_clipped"),
            round_half_up(F.avg("o_totalprice"), 4).alias("mean_raw"),
            round_half_up(F.avg(clipped), 4).alias("mean_winsor"),
        )
        .orderBy("o_orderstatus")
    )


@query(
    "q_window_ntile_bands",
    oracle="""
    WITH banded AS (
      SELECT n_nationkey, c_custkey, c_acctbal,
             ntile(4) OVER (PARTITION BY n_nationkey
                            ORDER BY c_acctbal NULLS LAST, c_custkey) AS quartile
      FROM customer JOIN nation ON c_nationkey = n_nationkey
    )
    SELECT n_nationkey, quartile,
           count(*) AS n_customers,
           floor((min(c_acctbal)) * 100.0 + 0.5) / 100.0 AS min_bal,
           floor((max(c_acctbal)) * 100.0 + 0.5) / 100.0 AS max_bal
    FROM banded
    GROUP BY n_nationkey, quartile
    ORDER BY n_nationkey, quartile
    """,
)
def window_ntile_bands(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ntile(4) banding — the bucketing window function (equal-count
    quartiles per nation) the distribution suite hadn't covered; the
    (c_acctbal, c_custkey) order key makes tile assignment total, so both
    engines band identically. NULLS LAST on the ascending balance key
    (the engine's window NULL-ordering contract): a NULL balance bands
    into the top quartile in both engines instead of the bottom one in
    Spark only."""
    cu = load_table(spark, sf_dir, "customer")
    na = load_table(spark, sf_dir, "nation")
    w = W.partitionBy("n_nationkey").orderBy(F.asc_nulls_last("c_acctbal"), "c_custkey")
    banded = (
        cu.join(F.broadcast(na), cu.c_nationkey == na.n_nationkey)
        .select("n_nationkey", "c_custkey", "c_acctbal")
        .withColumn("quartile", F.ntile(4).over(w))
    )
    return (
        banded.groupBy("n_nationkey", "quartile")
        .agg(
            F.count("*").alias("n_customers"),
            round_half_up(F.min("c_acctbal"), 2).alias("min_bal"),
            round_half_up(F.max("c_acctbal"), 2).alias("max_bal"),
        )
        .orderBy("n_nationkey", "quartile")
    )
