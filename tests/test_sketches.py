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
    """Checked-twin booleans (the CMS contract: exact ≤ estimate ≤
    exact + εN with ε = e/width) plus the raw law recomputed on the
    underlying sketch, since the twin's result schema carries only
    exact + booleans (the xxhash64-placed estimate is engine-specific)."""
    df = registry.QUERIES["sketch_count_min"](spark, SF_DIR).toPandas()
    assert df.never_underestimates.all(), "CMS must never underestimate"
    assert df.within_eps.all(), "CMS estimate outside exact + εN"
    from pyspark.sql import functions as F

    from sqload_spark.operators.advanced import CMS_DEPTH, CMS_WIDTH, count_min_table
    from sqload_spark.sources.tables import load_table

    li = load_table(spark, SF_DIR, "lineitem")
    cms = count_min_table(li, "l_suppkey").toPandas()
    assert set(cms.d) == set(range(CMS_DEPTH))
    assert cms.w.between(0, CMS_WIDTH - 1).all()
    # every depth row holds the full stream count — the sketch is complete
    assert (cms.groupby("d").c.sum() == li.count()).all()


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
    # — the checked-twin booleans carry exactly those three contracts
    assert df.merge_consistent.all()
    assert df.merged_within_bound.all()
    assert df.direct_within_bound.all()
    assert (df.n_shards == 8).all()
    # raw TIGHT law on the direct estimate (2.5%, tighter than the twin's
    # 5% boolean), recomputed since the twin's schema drops the estimates
    raw = (
        load_table(spark, SF_DIR, "lineitem")
        .groupBy("l_returnflag")
        .agg(
            F.hll_sketch_estimate(F.hll_sketch_agg("l_orderkey", F.lit(12))).alias("a"),
            F.countDistinct("l_orderkey").alias("e"),
        )
        .toPandas()
    )
    rel_err = (raw.a - raw.e).abs() / raw.e
    assert (rel_err <= 0.025).all(), f"HLL lgK=12 error blown: {rel_err.tolist()}"
