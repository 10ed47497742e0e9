"""Law tests for the round-4 retrieval / graph / linear-algebra operators —
properties the oracle hash can't express by itself (diversity, tiling,
symmetry), checked at sf0.001.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from pyspark.sql import functions as F

from sqload_spark import registry
from tests.conftest import SF_SMOKE_DIR

registry.load_all()


def test_mmr_first_pick_is_top_relevance_and_diversifies(spark):
    """MMR pick #1 must equal the plain top-1 neighbor (no penalty yet),
    every pick must come from the candidate pool, and the MMR set must be
    no MORE redundant than the plain top-k (λ < 1 trades relevance for
    diversity)."""
    mmr = registry.QUERIES["sim_mmr_rerank"](spark, SF_SMOKE_DIR).toPandas()
    topk = registry.QUERIES["sim_topk_bruteforce"](spark, SF_SMOKE_DIR).toPandas()
    emb = (
        spark.read.parquet(f"{SF_SMOKE_DIR}/embeddings.parquet")
        .select("vec_id", "embedding")
        .toPandas()
    )
    vecs = {int(r.vec_id): np.asarray(r.embedding, dtype=np.float64) for r in emb.itertuples()}

    def cos(a, b):
        return float(a @ b / (np.linalg.norm(a) * np.linalg.norm(b)))

    def avg_pairwise(ids):
        ids = list(ids)
        sims = [cos(vecs[i], vecs[j]) for k, i in enumerate(ids) for j in ids[k + 1:]]
        return float(np.mean(sims))

    assert set(mmr["rnk"]) == {1, 2, 3, 4, 5}
    for qid, grp in mmr.groupby("q_id"):
        picks = grp.sort_values("rnk")["n_id"].tolist()
        assert len(set(picks)) == 5, "duplicate picks"
        top = topk[topk["q_id"] == qid].sort_values("rnk")
        assert picks[0] == int(top.iloc[0]["n_id"]), "first pick must be argmax relevance"
        # diversity: MMR's selection is never more redundant than plain top-5
        assert avg_pairwise(picks) <= avg_pairwise(top["n_id"].tolist()) + 1e-9


def test_gram_matches_numpy_and_is_psd_diagonal(spark):
    """Spot-check Gram cells against a direct numpy X^T X computation and
    assert the diagonal is non-negative (it is a sum of squares)."""
    out = registry.QUERIES["q_embedding_gram"](spark, SF_SMOKE_DIR).toPandas()
    emb = (
        spark.read.parquet(f"{SF_SMOKE_DIR}/embeddings.parquet")
        .select("embedding")
        .toPandas()
    )
    x = np.vstack(emb["embedding"].to_numpy()).astype(np.float64)
    gram = x.T @ x
    diag = out[out["i"] == out["j"]]
    assert (diag["gram"] >= 0).all()
    for row in out.sample(n=25, random_state=7).itertuples():
        assert abs(row.gram - gram[row.i - 1, row.j - 1]) < 1e-4, (
            f"cell ({row.i},{row.j}) deviates from numpy"
        )


def test_scd2_intervals_tile_and_one_current_per_user(spark):
    df = registry.QUERIES["etl_scd2_history"](spark, SF_SMOKE_DIR).toPandas()
    for uid, grp in df.groupby("user_id"):
        g = grp.sort_values("version")
        assert g["is_current"].sum() == 1, "exactly one open interval per user"
        assert bool(g.iloc[-1]["is_current"])
        froms = g["valid_from_us"].tolist()
        tos = g["valid_to_us"].tolist()
        for k in range(len(g) - 1):
            assert tos[k] == froms[k + 1], "intervals must tile without gaps"
        # consecutive versions always change state (runs are maximal)
        states = g["state"].tolist()
        assert all(states[k] != states[k + 1] for k in range(len(states) - 1))


def test_left_outer_stream_join_contains_inner_result(spark):
    outer = registry.QUERIES["stream_stream_left_outer"](spark, SF_SMOKE_DIR).toPandas()
    inner = registry.QUERIES["stream_stream_interval_join"](spark, SF_SMOKE_DIR).toPandas()
    matched = outer[outer["purchase_id"].notna()]
    inner_pairs = set(zip(inner["click_id"], inner["purchase_id"]))
    outer_pairs = set(zip(matched["click_id"], matched["purchase_id"].astype("int64")))
    assert outer_pairs == inner_pairs, "matched rows must equal the inner join"
    nulls = outer[outer["purchase_id"].isna()]
    assert (~nulls["click_id"].isin(inner["click_id"])).all(), (
        "null-extended rows must be unmatched clicks"
    )


def test_bigram_scores_heldout_docs_only(spark):
    df = registry.QUERIES["text_bigram_logprob"](spark, SF_SMOKE_DIR).toPandas()
    assert (df["doc_id"] % 2 == 1).all(), "train docs must not be scored"
    assert (df["avg_nll"] > 0).all()
    assert (df["n_bigrams"] > 0).all()


def test_bm25_scores_positive_and_bounded_terms(spark):
    df = registry.QUERIES["text_bm25_topk"](spark, SF_SMOKE_DIR).toPandas()
    assert (df["bm25"] > 0).all()
    assert df["n_terms"].between(1, 3).all()
    # ranked output: scores non-increasing
    assert (df["bm25"].diff().fillna(0) <= 1e-12).iloc[1:].all()
