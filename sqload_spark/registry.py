"""Query registry — the single source of truth behind ``__spark_entry__``.

Every implemented operator registers a named query (``(spark, sf_dir) ->
DataFrame``) and, when the semantics are ANSI-SQL-expressible, a DuckDB
oracle SQL string over the same parquet tables. The correctness driver
compares the two (row count + schema + order-insensitive value hash), so:

* alias every computed column identically in both,
* make float aggregates deterministic (round after aggregating),
* avoid types whose cross-engine representation is ambiguous (prefer
  epoch ints / strings / timestamp_ntz for time results).

Queries with no oracle entry get a weaker rows-only check by the driver
(LSH, streaming, generator output — anything non-SQL-expressible).
"""

from __future__ import annotations

import importlib
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]

QUERIES: dict[str, QueryFn] = {}
ORACLES: dict[str, str] = {}

_OPERATOR_MODULES = [
    "sqload_spark.operators.relational",
    "sqload_spark.operators.tpch_more",
    "sqload_spark.operators.stats",
    "sqload_spark.operators.text",
    "sqload_spark.operators.text_tfidf",
    "sqload_spark.operators.dedup",
    "sqload_spark.operators.similarity",
    "sqload_spark.operators.timeseries",
    "sqload_spark.operators.multimodal",
    "sqload_spark.operators.generator_queries",
    "sqload_spark.operators.etl",
    "sqload_spark.operators.udf_variants",
    "sqload_spark.operators.skew_queries",
    "sqload_spark.operators.subqueries",
    "sqload_spark.operators.advanced",
    "sqload_spark.streaming.queries",
    "sqload_spark.streaming.stateful",
]

_loaded = False


def query(name: str, oracle: str | None = None) -> Callable[[QueryFn], QueryFn]:
    """Decorator: register a named query and (optionally) its DuckDB oracle."""

    def deco(fn: QueryFn) -> QueryFn:
        if name in QUERIES:
            raise ValueError(f"duplicate query name: {name}")
        QUERIES[name] = fn
        if oracle is not None:
            ORACLES[name] = oracle
        return fn

    return deco


def load_all() -> None:
    """Import every operator module so their @query decorators run."""
    global _loaded
    if _loaded:
        return
    for mod in _OPERATOR_MODULES:
        importlib.import_module(mod)
    _loaded = True


def all_queries() -> dict[str, QueryFn]:
    load_all()
    return dict(QUERIES)


def all_oracles() -> dict[str, str]:
    load_all()
    return dict(ORACLES)
