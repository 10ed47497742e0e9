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
    "sqload_spark.operators.sampling",
    "sqload_spark.operators.subqueries",
    "sqload_spark.operators.advanced",
    "sqload_spark.streaming.queries",
    "sqload_spark.streaming.stateful",
]

_loaded = False

# The external correctness driver checks queries in registry order and stops
# after a fixed window (50 in round 1, which left 36 queries with no hard
# correctness row — VERDICT.md "Next round" #3). Order the registry so the
# window covers, in priority order:
#   1. the 36 queries never checked in round 1,
#   2. the 4 round-1 red rows (now fixed) so their green flips are recorded,
#   3. the flagship + the scale-critical dedup/window/top-k queries.
# Anything not listed keeps registration (module import) order after these.
_PRIORITY = [
    # -- never checked in round 1 -------------------------------------------
    "sim_topk_bruteforce", "sim_label_centroids", "sim_topk_hyperplane_lsh",
    "sim_topk_ivf",
    "ts_tumbling_window", "ts_sliding_window", "ts_sessionize", "ts_asof_join",
    "ts_daily_rate", "ts_moving_avg", "ts_first_last_per_user",
    "ts_multires_rollup",
    "q_scalar_subquery", "q_in_subquery", "q_exists_correlated",
    "q_correlated_scalar", "q_from_json_map",
    "q_salted_agg", "q_salted_join",
    "q_range_join_bands", "sketch_count_min",
    "dedup_simhash", "dedup_embedding_cosine", "dedup_embedding_cosine_banded",
    "gen_default_table", "gen_all_types_table", "gen_keys_law",
    "src_csv_roundtrip", "src_json_roundtrip", "etl_partitioned_bulk_load",
    "etl_jdbc_bulk_load",
    "text_quality_pandas_udf", "text_top_terms_applyinpandas",
    "mm_payload_stats", "mm_decode_features",
    "stream_tumbling_counts", "stream_session_window",
    "stream_stateful_profile",
    # -- round-1 red rows, fixed this round ---------------------------------
    "q_conditional_agg", "q_grouping_sets", "text_token_stats",
    "text_rolling_fingerprint",
    # -- new in round 2 (training-data curation) ----------------------------
    "q_sample_hash", "q_sample_stratified", "q_mix_rebalance",
    "q_chunk_documents", "q_split_leakage_safe", "q_pack_sequences",
    # -- scale-critical queries whose implementation changed this round -----
    "pipe_training_mix", "dedup_keep_list",
]


def _ordered(d: dict) -> dict:
    """Priority names first (those present), then the rest in insertion order."""
    out = {n: d[n] for n in _PRIORITY if n in d}
    out.update((n, v) for n, v in d.items() if n not in out)
    return out


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
    return _ordered(QUERIES)


def all_oracles() -> dict[str, str]:
    load_all()
    return _ordered(ORACLES)
