"""Error bounds for the sketch-based operators (the 100 TB paths for
distinct counts and quantiles)."""

from __future__ import annotations

from sqload_spark import registry
from tests.conftest import SF_DIR

registry.load_all()


def test_approx_count_distinct_error(spark):
    """Checked-twin boolean (5×rsd) plus the original TIGHT law (2.5×rsd)
    on the raw estimate, recomputed here since the twin's result schema
    carries only exact + within_bound (the estimate is engine-specific)."""
    df = registry.QUERIES["q_approx_count_distinct"](spark, SF_DIR).toPandas()
    assert df.within_bound.all(), "HLL estimate outside 5×rsd of exact"
    from pyspark.sql import functions as F

    from sqload_spark.sources.tables import load_table

    raw = (
        load_table(spark, SF_DIR, "lineitem")
        .groupBy("l_returnflag")
        .agg(
            F.approx_count_distinct("l_orderkey", 0.02).alias("a"),
            F.countDistinct("l_orderkey").alias("e"),
        )
        .toPandas()
    )
    rel_err = (raw.a - raw.e).abs() / raw.e
    assert (rel_err <= 0.05).all(), f"HLL rsd=0.02 blown: {rel_err.tolist()}"


def test_count_min_guarantee(spark):
    """CMS law: exact ≤ estimate ≤ exact + εN with ε = e/width (loose)."""
    df = registry.QUERIES["sketch_count_min"](spark, SF_DIR).toPandas()
    n_total = df.exact_count.sum() * 10  # lineitem has ~100 suppliers at sf0.01
    assert (df.cms_estimate >= df.exact_count).all(), "CMS must never underestimate"
    eps_n = 2.72 / 256 * max(n_total, 60000)
    assert (df.cms_estimate - df.exact_count <= eps_n).all()


def test_approx_percentile_error(spark):
    """Checked-twin boolean (p47..p53 rank window) plus the original TIGHT
    relative-error law on the raw estimate, recomputed here since the
    twin's result schema carries only exact + within_bound."""
    df = registry.QUERIES["q_approx_percentile"](spark, SF_DIR).toPandas()
    assert df.within_bound.all(), "approx median outside the p47..p53 window"
    from pyspark.sql import functions as F

    from sqload_spark.sources.tables import load_table

    raw = (
        load_table(spark, SF_DIR, "lineitem")
        .groupBy("l_returnflag")
        .agg(
            F.approx_percentile("l_extendedprice", 0.5, 1000).alias("a"),
            F.percentile("l_extendedprice", 0.5).alias("e"),
        )
        .toPandas()
    )
    rel_err = (raw.a - raw.e).abs() / raw.e
    assert (rel_err <= 0.02).all(), f"approx_percentile off: {rel_err.tolist()}"


def test_hll_merge_equals_direct(spark):
    """HLL merge law: the register union loses nothing structurally (the
    estimates differ only by the HIP→composite estimator downgrade a
    union forces), and both estimates hold the lgK=12 error bound vs the
    exact distinct count."""
    from pyspark.sql import functions as F

    from sqload_spark.sources.tables import load_table

    df = registry.QUERIES["sketch_hll_merge"](spark, SF_DIR).toPandas()
    # union keeps the registers but downgrades HIP → composite estimator:
    # the two estimates differ slightly, and both must hold the error bound
    assert (abs(df.merged_estimate - df.direct_estimate) / df.direct_estimate <= 0.03).all()
    assert (df.n_shards == 8).all()
    exact = (
        load_table(spark, SF_DIR, "lineitem")
        .groupBy("l_returnflag")
        .agg(F.countDistinct("l_orderkey").alias("exact"))
        .toPandas()
        .set_index("l_returnflag")["exact"]
    )
    est = df.set_index("l_returnflag")["merged_estimate"]
    rel_err = (est - exact).abs() / exact
    assert (rel_err <= 0.05).all(), f"HLL lgK=12 error blown: {rel_err.to_dict()}"
