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
    "sqload_spark.operators.tpch_full",
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
    "sqload_spark.operators.scale_ops",
    "sqload_spark.operators.clustering",
    "sqload_spark.operators.rag",
    "sqload_spark.streaming.queries",
    "sqload_spark.streaming.stateful",
    "sqload_spark.streaming.joins",
]

_loaded = False

# The external correctness driver checks queries in registry order and stops
# after a fixed window of 50. ROUND-5 rotation (VERDICT r4 "Next round" #2):
# drain the verification debt — 98 of 201 registered queries had never
# received an external driver row after round 4. This window converts 50 of
# them:
#   1-44: never-driver-checked queries with oracles, highest-signal first —
#         the 12 TPC-H completions, the TPC-DS shapes, the round-4
#         retrieval/graph/linear-algebra row, the checked-sketch trilogy,
#         the fixed dedup_edit_distance + new dedup_pairs_materialized
#         (write-once artifact demo), then the oldest staged items
#         (scale_ops, clustering, etl);
#   45-50: the six r01-stale rows whose modules changed in round 4
#         (tpch_more.py gained Q7/Q8 in 7685b58; text_tfidf.py gained
#         q_array_higher_order in 83ae16f — the old "byte-identical since
#         round 1" rationale no longer held and they need fresh rows).
# Everything hash-green in r03/r04 on current code rotates out. 55
# still-never-checked queries (see tools/coverage_report.py --list) are all
# green in the local driver sim (tools/drive_entry.py, same comparator) and
# are staged for the round-6 window; per VERDICT r4 #3 the query surface is
# FROZEN (only dedup_pairs_materialized added, mandated by #5) until the
# debt drains below the window size.
#
# ROUND-6 WINDOW RECIPE (verify against CORRECTNESS_r05 first): rebuild
# _PRIORITY with 50 of the 52 oracled never-checked queries —
#   q7_volume_shipping, q8_market_share (the r4 TPC-H join classics),
#   stream_stream_interval_join, stream_static_enrich,
#   stream_upsert_compaction, stream_late_data_policy, stream_drift_scores,
#   stream_sliding_counts (the staged streaming row),
#   dedup_cluster_sizes, dedup_cross_source_matrix, dedup_exact_spans,
#   dedup_incremental_shard, dedup_keep_list_weighted,
#   sim_knn_graph, sim_pagerank_knn, sim_topk_blas, sim_vector_quantize,
#   text_unigram_logprob, text_inverted_index, text_pii_scrub,
#   text_gopher_quality, text_vocab_coverage, text_quality_arrow_udf,
#   etl_constraint_check, etl_file_sizing, etl_zorder_cluster,
#   etl_dynamic_partition_overwrite, src_schema_evolution,
#   mm_frame_sample, mm_dedup_payload, pipe_output_manifest,
#   the ts_* event-analytics block (anomaly_days, asof_nearest_tolerance,
#   ewma, funnel_stages, gap_fill, ohlc_bars, resample_interp,
#   retention_cohorts, transition_matrix, window_unique_users),
#   q_array_higher_order, q_equidepth_histogram, q_mode_per_group,
#   q_profile_columns, q_sample_temperature, q_source_quota_cap,
#   q_token_histogram, q_unpivot_measures, q_window_ntile_bands,
#   q_window_range_frame / q_winsorize (pick one; the other plus the 3
#   rows-only entries — gen_datasource_table, gen_stream_table,
#   sketch_hll_merge — land in round 7, which also re-freshens anything
#   CORRECTNESS_r05 unexpectedly missed).

_PRIORITY = [
    # -- 12 TPC-H completions (round-4 session 4, never driver-checked) -----
    "q2_min_cost_supplier", "q4_order_priority", "q9_product_profit",
    "q11_important_stock", "q12_shipmode_priority",
    "q13_customer_distribution", "q15_top_supplier",
    "q16_parts_supplier_count", "q17_small_quantity_revenue",
    "q20_excess_supply", "q21_waiting_suppliers", "q22_global_sales",
    # -- TPC-DS shapes ------------------------------------------------------
    "qds_hour_bands", "qds_yoy_ratio",
    # -- retrieval / graph / linear-algebra row (round-4 session 4) ---------
    "text_bm25_topk", "sim_mmr_rerank", "q_embedding_gram",
    "sim_knn_triangles", "etl_scd2_history", "text_bigram_logprob",
    "stream_stream_left_outer", "dedup_minhash_eval", "pipe_rag_corpus",
    "sim_crossencoder_rerank", "src_text_logparse",
    "q1_pricing_summary_sqltext", "q_not_in_null_semantics",
    "src_csv_corrupt_tolerant", "q_length_bucketed_batches",
    # -- checked-sketch trilogy + mergeable histogram -----------------------
    "dedup_simhash_checked", "dedup_minhash_checked", "sketch_cms_checked",
    "sketch_histogram_merge",
    # -- dedup: PPJoin, fixed-broadcast edit distance, write-once artifact --
    "dedup_prefix_filter", "dedup_edit_distance", "dedup_pairs_materialized",
    # -- oldest staged: scale_ops / clustering / etl ------------------------
    "q_join_bucketed_colocated", "q_training_order", "q_partial_agg_merge",
    "q_kmeans_assign", "q_kmeans_refine", "dedup_semantic_representative",
    "etl_partition_pruning", "etl_upsert_latest",
    # -- the six r01-stale rows (modules changed in round 4) ----------------
    "q6_forecast_revenue", "q10_returned_items", "q14_promo_share",
    "q18_large_orders", "q19_disjunctive_predicates", "text_tfidf_top_terms",
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
