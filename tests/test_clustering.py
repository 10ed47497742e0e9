"""Law tests for the clustering module beyond the oracle equality that
tests/test_correctness.py already enforces: assignment is a partition of
the corpus, one Lloyd iteration never increases the k-means objective,
and the semantic representative really is its cluster's argmin."""

from __future__ import annotations

import pytest

from sqload_spark import registry
from tests.conftest import SF_DIR

registry.load_all()


@pytest.fixture(scope="module")
def clustering(spark):
    names = ["q_kmeans_assign", "q_kmeans_refine", "dedup_semantic_representative"]
    return {n: registry.QUERIES[n](spark, SF_DIR).toPandas() for n in names}


@pytest.fixture(scope="module")
def corpus_size(spark):
    from sqload_spark.sources.tables import load_table

    return load_table(spark, SF_DIR, "embeddings").count()


def test_assignment_is_a_partition(clustering, corpus_size):
    a = clustering["q_kmeans_assign"]
    assert len(a) == corpus_size
    assert a["vec_id"].is_unique
    assert set(a["cluster"]) <= set(range(10))
    assert (a["dist2"] >= 0).all()


def test_lloyd_iteration_does_not_increase_cost(clustering):
    """Lloyd monotonicity: recompute-centroids + reassign can only lower
    Σ d² (up to the 6dp centroid rounding, hence the epsilon)."""
    initial = clustering["q_kmeans_assign"]["dist2"].sum()
    refined = clustering["q_kmeans_refine"]["cost"].sum()
    assert refined <= initial + 1e-2


def test_refine_preserves_corpus(clustering, corpus_size):
    r = clustering["q_kmeans_refine"]
    assert r["n_vecs"].sum() == corpus_size
    assert (r["n_vecs"] > 0).all()


def test_representative_is_cluster_argmin(clustering, corpus_size):
    a = clustering["q_kmeans_assign"]
    reps = clustering["dedup_semantic_representative"]
    assert reps["n_members"].sum() == corpus_size
    best = a.loc[a.groupby("cluster")["dist2"].idxmin()]
    merged = reps.merge(best, on="cluster")
    # the rep's distance equals the cluster minimum (id tie-break aside)
    rep_d = a.set_index("vec_id").loc[merged["rep_vec_id"], "dist2"].to_numpy()
    assert (abs(rep_d - merged["dist2"].to_numpy()) < 1e-9).all()
