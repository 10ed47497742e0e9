"""Semantic laws for the training-data-curation operators (sampling.py):
the differential oracle gate (test_correctness) proves engine parity;
these prove the operators mean what they claim."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from sqload_spark import registry
from tests.conftest import SF_DIR

registry.load_all()


@pytest.fixture(scope="module")
def split_df(spark):
    return registry.QUERIES["q_split_leakage_safe"](spark, SF_DIR).toPandas()


def test_split_never_separates_neardups(spark, split_df):
    """THE property: every ≥0.5-Jaccard near-dup pair lands on one side."""
    pairs = registry.QUERIES["dedup_ngram_jaccard"](spark, SF_DIR).toPandas()
    side = dict(zip(split_df.doc_id, split_df.split))
    assert len(pairs) > 0
    for a, b in zip(pairs.doc_a, pairs.doc_b):
        assert side[a] == side[b], f"near-dup pair ({a},{b}) split across sides"


def test_split_covers_corpus_and_both_sides(spark, split_df):
    from sqload_spark.sources.tables import load_table

    n_docs = load_table(spark, SF_DIR, "documents").count()
    assert len(split_df) == n_docs and split_df.doc_id.is_unique
    shares = split_df.split.value_counts(normalize=True)
    assert 0.10 < shares.get("test", 0) < 0.45  # TEST_SHARE=0.25 ± hash noise
    # cluster members share cluster_id == component minimum ≤ doc_id
    assert (split_df.cluster_id <= split_df.doc_id).all()


def test_sample_rate_and_determinism(spark):
    a = registry.QUERIES["q_sample_hash"](spark, SF_DIR).toPandas()
    b = registry.QUERIES["q_sample_hash"](spark, SF_DIR).toPandas()
    assert a.equals(b)
    from sqload_spark.sources.tables import load_table

    n = load_table(spark, SF_DIR, "documents").count()
    assert 0.12 < len(a) / n < 0.30  # rate 0.2 ± binomial noise


def test_chunks_cover_every_token(spark):
    """Stride-64 windows of length 128: chunk k covers tokens
    [64k, 64k+len); union over k must equal [0, n_tokens)."""
    chunks = registry.QUERIES["q_chunk_documents"](spark, SF_DIR).toPandas()
    from sqload_spark.sources.tables import load_table

    docs = (
        load_table(spark, SF_DIR, "documents")
        .select("doc_id", F.size(F.split("text", " ")).alias("n"))
        .toPandas()
        .set_index("doc_id")
        .n
    )
    got = {}
    for doc_id, grp in chunks.groupby("doc_id"):
        covered = set()
        for idx, ln in zip(grp.chunk_idx, grp.chunk_len):
            covered |= set(range(64 * idx, 64 * idx + ln))
        got[doc_id] = covered
    assert set(got) == set(docs.index)
    for doc_id, covered in got.items():
        assert covered == set(range(docs[doc_id])), f"doc {doc_id} coverage hole"


def test_stratified_rates_differ_by_parity(spark):
    df = registry.QUERIES["q_sample_stratified"](spark, SF_DIR).toPandas()
    df["par"] = df.source.str[3:].astype(int) % 2
    even = df[df.par == 0]
    odd = df[df.par == 1]
    assert (even.n_sampled.sum() / even.n_total.sum()) > 0.35
    assert (odd.n_sampled.sum() / odd.n_total.sum()) < 0.25


def test_mix_rebalance_moves_toward_uniform(spark):
    df = registry.QUERIES["q_mix_rebalance"](spark, SF_DIR).toPandas()
    before = df.n_before / df.n_before.sum()
    after = df.n_after / df.n_after.sum()
    target = 1.0 / len(df)
    # rebalancing must not increase the max deviation from uniform
    assert (after - target).abs().max() <= (before - target).abs().max() + 1e-9
    # languages above target share get downsampled, those at/below stay whole
    over = df[before > target * 1.2]
    under = df[before <= target]
    assert (over.n_after < over.n_before).all()
    assert (under.n_after == under.n_before).all()


def test_pack_sequences_manifest_laws(spark):
    """Blocks are dense per source (0..max), every doc packed exactly once,
    and block k starts at token offset 1024k (cumsum consistency)."""
    from sqload_spark.sources.tables import load_table

    df = registry.QUERIES["q_pack_sequences"](spark, SF_DIR).toPandas()
    docs = (
        load_table(spark, SF_DIR, "documents")
        .select("source", F.size(F.split("text", " ")).alias("n"))
        .groupBy("source")
        .agg(F.count("*").alias("n_docs"), F.sum("n").alias("n_tokens"))
        .toPandas()
        .set_index("source")
    )
    for src, grp in df.groupby("source"):
        ids = sorted(grp.block_id)
        assert ids == list(range(len(ids))), f"{src}: blocks not dense"
        assert grp.n_docs.sum() == docs.loc[src].n_docs
        assert grp.n_tokens.sum() == docs.loc[src].n_tokens
        # every non-final block spans >= the budget from its start offset
        # (the next block's first doc starts past 1024(k+1))
        cum = 0
        for k in ids[:-1]:
            row = grp[grp.block_id == k].iloc[0]
            cum += row.n_tokens
            assert cum >= 1024 * (k + 1), f"{src}: block {k} underfilled"
