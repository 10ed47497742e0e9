"""Oracle-differential correctness: every registered query with an oracle is
run on Spark and on DuckDB over the same parquet and must match exactly
(row count + column names + order-insensitive canonical values) — the same
gate the driver applies. Queries without an oracle get a rows-run check."""

from __future__ import annotations

import pytest

from sqload_spark import registry
from tests.conftest import SF_DIR, assert_matches_oracle

registry.load_all()

ORACLE_NAMES = sorted(registry.all_oracles())
ROWS_ONLY_NAMES = sorted(set(registry.all_queries()) - set(registry.all_oracles()))


@pytest.mark.parametrize("name", ORACLE_NAMES)
def test_query_matches_oracle(spark, duck, name):
    fn = registry.QUERIES[name]
    assert_matches_oracle(fn(spark, SF_DIR), duck, registry.ORACLES[name], name)


@pytest.mark.parametrize("name", ROWS_ONLY_NAMES)
def test_query_runs(spark, name):
    df = registry.QUERIES[name](spark, SF_DIR)
    assert df.count() >= 0
    assert len(df.schema.fields) > 0


def test_entry_smoke(spark):
    import __spark_entry__ as e

    df = e.entry(spark)
    rows = df.collect()
    assert len(rows) > 0
    assert set(e.oracle_sql()) <= set(e.queries())
