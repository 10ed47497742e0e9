"""Benchmark harness — one JSON line on stdout.

Runs the headline queries at $SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1)
on local[$SPARK_GRAFT_CPUS], plus the reference generator's own published
benchmark workload (10M rows of `key,bigint,int(11),varchar(50),double,date,
bigint(20)` — /root/reference/README.md:37-47: 18.9 s single-threaded ≈
529 K rows/s). Every query is forced end-to-end with a noop sink (full
computation, no driver collect).

Output contract (round 5 — VERDICT r4 "Next round" #1): the stdout JSON line
must stay well under the driver's ~2 KB tail-capture buffer (the r4 record was
lost because a 105-entry per-query dict pushed the front of the JSON — where
"value" lives — past the buffer). So stdout carries only the scalars plus the
top-10 slowest entries, and the FULL per-query map is written to
BENCH_DETAIL.json next to this file:

  stdout: {"metric": "bench_total_sec", "value": <sum sec>, "unit": "sec",
           "sf": <sf>, "gen_rows_per_sec": N, "n_queries": N,
           "r3_subset_sec": <sum over the 25 entries BENCH_r03 recorded,
                             for round-over-round comparability>,
           "pass_totals": [<sum of pass-0 timings>, <pass-1>, ...],
           "stall_flags": N,
           "queries": {...top-10 slowest only...},
           "detail": "BENCH_DETAIL.json"}
  BENCH_DETAIL.json: the same scalars with the complete per-query map.

Self-attribution (round 11 — VERDICT r10 "Next round" #2): the driver-record
series has twice drifted ±7-15% on bit-identical plans, and the evidence
that it was host noise lived in builder sessions, not the artifact. So the
artifact now classifies itself:

* per-query PER-PASS timings ("queries_passes": {name: [t1, t2]}) — a
  one-sided 3-10× outlier in one pass with a normal twin is the documented
  periodic machine stall, not a regression;
* per-pass metadata ("passes": started/ended UTC wall-clock, pass total,
  per-pass generator rate);
* a stall sentinel: one fixed trivial job (sum over spark.range(1e6),
  ~40-80 ms warm) timed after every suite entry. A sentinel reading
  >= max(1 s, 10x the pass median) flags a machine-wide stall at a known
  timeline position ("stalls": the entry it followed + the reading).
  Sentinel time is NOT added to any query timing or total; it costs ~10 s
  of wall per pass and buys the JSON-only noise-vs-regression call.

SPARK_GRAFT_BENCH_ONLY=<comma list> restricts the run to the named entries
(gen_10m_* pseudo-entries included) — the cheap way to A/B a subset (e.g.
the r3 subset) within one session without paying the full suite twice.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from sqload_spark import registry
from sqload_spark.session import get_spark
from sqload_spark.sources.generate import generate_table

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

HEADLINE = [
    "q1_pricing_summary",
    "q3_shipping_priority",
    "q5_region_revenue",
    "q_rollup_region_nation",
    "q_window_topk_per_customer",
    "q_window_running_revenue",
    "ts_tumbling_window",
    "ts_sessionize",
    "ts_asof_join",
    "text_top_terms_per_lang",
    "text_quality_score",
    "text_contamination_ngram",
    "text_repetition_filter",
    "dedup_ngram_jaccard",
    "dedup_minhash_lsh",
    "dedup_embedding_cosine_banded",
    "sim_topk_bruteforce",
    "sim_topk_hyperplane_lsh",
    "mm_decode_features",
    "q_sample_hash",
    "q_chunk_documents",
    "q_pack_sequences",
    "q_split_leakage_safe",
    "etl_jdbc_bulk_load",
    # round-4 staged ops (driver rows land in round 5; perf tracked now)
    "dedup_incremental_shard",
    "text_pii_scrub",
    "mm_frame_sample",
    "q_training_order",
    "q_join_bucketed_colocated",
    # round-4 session-2 additions
    "q_kmeans_assign",
    "dedup_semantic_representative",
    "sim_knn_graph",
    "text_gopher_quality",
    "etl_upsert_latest",
    "etl_partition_pruning",
    "q_partial_agg_merge",
    "sketch_hll_merge",
    # round-4 session-3 additions
    "text_unigram_logprob",
    "dedup_exact_spans",
    "sim_topk_blas",
    "etl_zorder_cluster",
    "q_unpivot_measures",
    "ts_ewma",
    "sim_pagerank_knn",
    "q_profile_columns",
    "text_inverted_index",
    "ts_funnel_stages",
    "ts_retention_cohorts",
    "dedup_cluster_sizes",
    "ts_transition_matrix",
    "q_equidepth_histogram",
    "q_winsorize",
    "etl_file_sizing",
    "src_schema_evolution",
    "stream_upsert_compaction",
    "stream_stream_interval_join",
    "dedup_edit_distance",
    "ts_window_unique_users",
    "mm_dedup_payload",
    "ts_anomaly_days",
    "sim_vector_quantize",
    "etl_dynamic_partition_overwrite",
    "q_array_higher_order",
    "etl_constraint_check",
    "stream_late_data_policy",
    "q_sample_temperature",
    "dedup_prefix_filter",
    "sketch_histogram_merge",
    "dedup_simhash_checked",
    "pipe_output_manifest",
    "q7_volume_shipping",
    "q8_market_share",
    "sketch_cms_checked",
    "ts_ohlc_bars",
    "dedup_minhash_checked",
    "dedup_cross_source_matrix",
    "text_quality_arrow_udf",
    "dedup_keep_list_weighted",
    "ts_resample_interp",
    # round-4 session-4: TPC-H completion (22/22 plan shapes)
    "q9_product_profit",
    "q13_customer_distribution",
    "q17_small_quantity_revenue",
    "q21_waiting_suppliers",
    # round-4 session-4: retrieval + linear-algebra + outer-join streaming
    "text_bm25_topk",
    "sim_mmr_rerank",
    "q_embedding_gram",
    "stream_stream_left_outer",
    "sim_knn_triangles",
    "etl_scd2_history",
    "text_bigram_logprob",
    "src_text_logparse",
    "src_csv_corrupt_tolerant",
    "sim_crossencoder_rerank",
    "q_length_bucketed_batches",
    "dedup_minhash_eval",
    "pipe_rag_corpus",
    "qds_hour_bands",
    "qds_yoy_ratio",
    "text_vocab_coverage",
    "stream_drift_scores",
    "q_window_ntile_bands",
    "ts_asof_nearest_tolerance",
    # round-5: write-once pair-mine artifact (mine once, three consumers
    # read the parquet back — compare against dedup_cluster_sizes +
    # dedup_keep_list re-mining independently)
    "dedup_pairs_materialized",
    # round-6: the last window entries the suite didn't already time, so
    # BENCH_r06 carries a number for every query the driver checks
    "stream_static_enrich",
    "stream_sliding_counts",
    "ts_gap_fill",
    "q_mode_per_group",
    "q_source_quota_cap",
    "q_token_histogram",
    "q_window_range_frame",
]

GEN_BENCH_SPEC = "key,bigint,int(11),varchar(50),double,date,bigint(20)"  # README.md:42
GEN_BENCH_ROWS = 10_000_000

# The exact entry set BENCH_r03 recorded (driver artifact, total 76.623 s).
# Summed separately each round so the driver record keeps a like-for-like
# round-over-round total even as the suite grows.
R3_SUBSET = [
    "dedup_embedding_cosine_banded", "dedup_minhash_lsh", "dedup_ngram_jaccard",
    "etl_jdbc_bulk_load", "gen_10m_arrow_backend", "gen_10m_expr_backend",
    "gen_10m_reference_spec", "mm_decode_features", "q1_pricing_summary",
    "q3_shipping_priority", "q5_region_revenue", "q_chunk_documents",
    "q_pack_sequences", "q_rollup_region_nation", "q_sample_hash",
    "q_split_leakage_safe", "q_window_running_revenue",
    "q_window_topk_per_customer", "sim_topk_bruteforce",
    "sim_topk_hyperplane_lsh", "text_quality_score", "text_top_terms_per_lang",
    "ts_asof_join", "ts_sessionize", "ts_tumbling_window",
]


def _force(df) -> None:
    df.write.mode("overwrite").format("noop").save()


def main() -> None:
    registry.load_all()
    spark = get_spark("sqload_spark_bench")
    sf = float(SF_DIR.rstrip("/").rsplit("sf", 1)[-1])

    only_env = os.environ.get("SPARK_GRAFT_BENCH_ONLY", "").strip()
    only = {n.strip() for n in only_env.split(",") if n.strip()} if only_env else None

    # warm up the JVM/session + parquet datasource + Python workers so the
    # first measured query isn't charged for one-time init (codegen
    # compiler, filesystem, footer readers, Arrow worker spawn)
    spark.range(1000).count()
    spark.read.parquet(f"{SF_DIR}/lineitem.parquet").limit(10).count()
    # The generator warmups only matter when a gen_10m_* entry is being
    # timed (r11): a SPARK_GRAFT_BENCH_ONLY subset without them skips the
    # two full-size generations, which cost minutes of untimed wall per
    # invocation on a stalled host. Timed methodology is unchanged — a
    # full run (only=None) warms exactly as before.
    if only is None or any(n.startswith("gen_10m_") for n in only):
        _force(generate_table(spark, 100_000, GEN_BENCH_SPEC, seed=1, impl="arrow"))
        # warm the expr backend at FULL size: its first 10M-row run pays a
        # 15-40 s JVM JIT/compile storm that small-size warmups do not
        # absorb (measured: 100k 1.9 s, 1M 1.0 s, first 10M 18-46 s,
        # second 10M 3.7 s). The measured number below is the backend's
        # steady-state throughput; the one-time cost is in BASELINE.md.
        _force(generate_table(spark, GEN_BENCH_ROWS, GEN_BENCH_SPEC, seed=1, impl="expr"))

    # Two SEPARATED passes over every workload, min per entry. The host
    # takes a periodic machine-wide stall (~30-90 s, roughly every 15 min)
    # that would otherwise land on one arbitrary query and misreport it by
    # 3-10x (observed: the same query measuring 3.7 s and 37 s in
    # back-to-back runs with an idle machine). Two passes separated by the
    # full suite length cannot both be hit for the same entry.
    # Generation workloads FIRST in each pass: measured late in a
    # 20+-query session the expr backend reads 4-6x slower (JVM
    # heap/codegen-cache pressure, not the pipeline).
    def one_pass() -> tuple[dict[str, float], dict]:
        t: dict[str, float] = {}
        sentinels: list[tuple[str, float]] = []
        started = time.strftime("%Y-%m-%dT%H:%M:%SZ", time.gmtime())

        def sentinel(after: str) -> None:
            # fixed trivial job: scheduler + one whole-stage-codegen'd scan,
            # no I/O, no shuffle width — its only variable is the host
            t0 = time.monotonic()
            spark.range(1_000_000).selectExpr("sum(id)").collect()
            sentinels.append((after, round(time.monotonic() - t0, 3)))

        def clock(name: str, thunk) -> None:
            if only is not None and name not in only:
                return
            t0 = time.monotonic()
            thunk()
            t[name] = round(time.monotonic() - t0, 3)
            sentinel(name)

        # Default path (impl="auto" picks arrow for this string-heavy spec).
        clock(
            "gen_10m_reference_spec",
            lambda: _force(generate_table(spark, GEN_BENCH_ROWS, GEN_BENCH_SPEC, seed=42)),
        )
        clock(
            "gen_10m_arrow_backend",
            lambda: _force(
                generate_table(spark, GEN_BENCH_ROWS, GEN_BENCH_SPEC, seed=42, impl="arrow")
            ),
        )
        clock(
            "gen_10m_expr_backend",
            lambda: _force(
                generate_table(spark, GEN_BENCH_ROWS, GEN_BENCH_SPEC, seed=42, impl="expr")
            ),
        )
        for name in HEADLINE:
            clock(name, lambda fn=registry.QUERIES[name]: _force(fn(spark, SF_DIR)))
        svals = sorted(s for _, s in sentinels) or [0.0]
        median = svals[len(svals) // 2]
        stall_floor = max(1.0, 10 * median)
        meta = {
            "started_utc": started,
            "ended_utc": time.strftime("%Y-%m-%dT%H:%M:%SZ", time.gmtime()),
            "total_sec": round(sum(t.values()), 3),
            "gen_rows_per_sec": (
                int(GEN_BENCH_ROWS / t["gen_10m_reference_spec"])
                if "gen_10m_reference_spec" in t
                else None
            ),
            "sentinel_median_sec": median,
            "sentinel_max_sec": svals[-1],
            "stalls": [
                {"after": name, "sec": s} for name, s in sentinels if s >= stall_floor
            ],
        }
        return t, meta

    n_passes = max(1, int(os.environ.get("SPARK_GRAFT_BENCH_PASSES", "2")))
    results = [one_pass() for _ in range(n_passes)]
    passes = [r[0] for r in results]
    pass_meta = [r[1] for r in results]
    timings = {k: min(p[k] for p in passes) for k in passes[0]}
    gen_sec = timings.get("gen_10m_reference_spec")
    total = round(sum(timings.values()), 3)
    scalars = {
        "metric": "bench_total_sec",
        "value": total,
        "unit": "sec",
        "sf": sf,
        "gen_rows_per_sec": int(GEN_BENCH_ROWS / gen_sec) if gen_sec else None,
        "n_queries": len(timings),
        "r3_subset_sec": round(sum(timings[k] for k in R3_SUBSET if k in timings), 3),
        "pass_totals": [m["total_sec"] for m in pass_meta],
        "stall_flags": sum(len(m["stalls"]) for m in pass_meta),
        # Per-pass sentinel medians in the stdout scalars (r12 — VERDICT r11
        # "Next round" #5): the stall sentinel's 10× threshold catches
        # spikes, but a DIFFUSE 1.5-2× host storm (r11 driver run: pass
        # totals 253/159 s with stall_flags 0) was only diagnosable from
        # builder-side context. The pass MEDIAN sentinel reading is the
        # host-health scalar that classifies those storms from the one-line
        # JSON alone: a healthy pass reads ~0.04-0.08 s; a storm lifts the
        # median itself. Additive only — no timing or total changes.
        "sentinel_medians": [m["sentinel_median_sec"] for m in pass_meta],
    }
    # a subset run must not clobber the committed full-suite artifact
    detail_name = "BENCH_DETAIL.json" if only is None else "BENCH_DETAIL_subset.json"
    detail_path = os.path.join(
        os.path.dirname(os.path.abspath(__file__)),
        os.environ.get("SPARK_GRAFT_BENCH_DETAIL", detail_name),
    )
    with open(detail_path, "w") as f:
        json.dump(
            {
                **scalars,
                "queries": timings,
                "queries_passes": {k: [p[k] for p in passes] for k in timings},
                "passes": pass_meta,
            },
            f,
            indent=1,
            sort_keys=False,
        )
        f.write("\n")
    # The driver keeps only ~2 KB of stdout TAIL, so the line must fit the
    # budget — but never crash after the timing work is done (ADVICE r5):
    # degrade by dropping slowest-map entries until it fits; the full map
    # is always in BENCH_DETAIL.json.
    slowest = sorted(timings.items(), key=lambda kv: -kv[1])[:10]
    while True:
        line = json.dumps(
            {**scalars, "queries": dict(slowest), "detail": os.path.basename(detail_path)}
        )
        if len(line) < 1800 or not slowest:
            break
        slowest = slowest[:-1]
    print(line)


if __name__ == "__main__":
    main()
