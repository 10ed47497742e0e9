"""Dirty-data robustness laws (the fast half of tools/adversarial_run.py).

The full tool rebuilds a dirty corpus and re-runs all 193 oracles (~10
min); these tests lock the individual guard behaviors at unit cost so a
regression shows up in CI, not only in the heavy geometry. Every law here
was a real stage-killing failure or silent cross-engine divergence on the
first adversarial run (BASELINE.md round-6 hardening section) — Spark 4
runs ANSI mode by default, where division by zero and out-of-range
element_at raise instead of returning NULL.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import functions as F

from sqload_spark.functions.text_funcs import shingles, rolling_fingerprints, tokens
from sqload_spark.functions.vectors import EMB_VALID_SQL, valid_embedding


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id bigint, text string")


def test_shingles_empty_for_short_and_null_docs(spark):
    """Sub-n-token docs (and NULL text) yield an EMPTY shingle set — the
    DuckDB oracle comprehension semantics — and never raise under ANSI."""
    df = _docs(
        spark,
        [
            (1, "a"),
            (2, "a b"),
            (3, "a b c"),
            (4, ""),
            (5, None),
            (6, "w x y z"),
        ],
    )
    out = {
        r.doc_id: r.sh
        for r in df.select("doc_id", shingles(F.col("text"), 3).alias("sh")).collect()
    }
    assert out[1] == [] and out[2] == [] and out[4] == []
    assert out[5] == []  # NULL text → empty, not NULL/raise
    assert out[3] == ["a b c"]
    assert sorted(out[6]) == ["w x y z"[0:5], "x y z"]  # "w x y", "x y z"


def test_rolling_fingerprints_short_doc_fallback(spark):
    """The winnowing fingerprint keeps the oracle's short-doc fallback
    (one partial span, concat_ws skipping past-the-end NULLs) instead of
    raising under ANSI."""
    df = _docs(spark, [(1, "a b"), (2, None), (3, "a b c d e")])
    out = {
        r.doc_id: r.fp
        for r in df.select(
            "doc_id", rolling_fingerprints(tokens(F.col("text"))).alias("fp")
        ).collect()
    }
    assert len(out[1]) == 1  # one partial-span hash, no crash
    assert len(out[2]) == 1  # NULL text → md5("") span, same in DuckDB
    assert len(out[3]) == 2  # two full 4-token spans


def test_valid_embedding_contract(spark):
    """Zero-norm, NULL, and >1e6-magnitude vectors are excluded; tiny,
    negative, duplicate and one-hot vectors are kept."""
    rows = [
        (1, [0.0, 0.0]),
        (2, None),
        (3, [2e6, 0.0]),
        (4, [1e-30, 0.0]),
        (5, [-1.0, -1.0]),
        (6, [1.0, 0.0]),
        (7, [float("nan"), 1.0]),
    ]
    df = spark.createDataFrame(rows, "vec_id bigint, embedding array<float>")
    kept = sorted(
        r.vec_id for r in df.filter(valid_embedding(F.col("embedding"))).collect()
    )
    assert kept == [4, 5, 6]


def test_valid_embedding_sql_twin_matches():
    """The DuckDB predicate keeps exactly the same vectors (including the
    NULL-first-conjunct guard that shields list_dot_product)."""
    import duckdb

    con = duckdb.connect()
    con.execute("CREATE TABLE t (vec_id BIGINT, embedding FLOAT[])")
    con.execute(
        "INSERT INTO t VALUES (1, [0.0, 0.0]), (2, NULL), (3, [2e6, 0.0]),"
        " (4, [1e-30, 0.0]), (5, [-1.0, -1.0]), (6, [1.0, 0.0]), (7, ['nan'::FLOAT, 1.0])"
    )
    kept = [r[0] for r in con.execute(f"SELECT vec_id FROM t WHERE {EMB_VALID_SQL} ORDER BY vec_id").fetchall()]
    assert kept == [4, 5, 6]


def test_quality_udfs_null_text_row():
    """The pandas UDF feature builder emits the oracle's all-NULL row for
    NULL text instead of crashing the Arrow batch."""
    from sqload_spark.operators.udf_variants import _quality_features

    # call the wrapped python function directly on a pandas Series
    fn = _quality_features.func
    out = fn(pd.Series(["a b a", None, ""]))
    assert out.iloc[1].isna().all()
    assert out.iloc[0]["n_tokens"] == 3
    assert out.iloc[2]["n_tokens"] == 1  # "".split(" ") == [""] in all engines


def test_frame_sampler_null_and_empty_payload():
    """mapInPandas frame sampling: NULL payload → all-NULL row; empty
    payload → zero frames with NULL checksum (DuckDB list_sum([]) is
    NULL, not 0)."""
    from sqload_spark.operators.multimodal import _sample_frames

    pdf = pd.DataFrame({"doc_id": [1, 2, 3], "payload": [b"x" * 40, None, b""]})
    out = pd.concat(list(_sample_frames(iter([pdf]))), ignore_index=True)
    full = out[out.doc_id == 1].iloc[0]
    assert full.n_frames == 2 and full.n_sampled == 1 and full.sample_checksum > 0
    nul = out[out.doc_id == 2].iloc[0]
    assert pd.isna(nul.n_frames) and pd.isna(nul.sample_checksum)
    empty = out[out.doc_id == 3].iloc[0]
    assert empty.n_frames == 0 and empty.n_sampled == 0 and pd.isna(empty.sample_checksum)
