"""Laws for the scale-corpus sign-pattern screens (tools/scale_run.py).

The group construction is pure numpy once the screening corpus is loaded,
so these tests monkeypatch _unit_corpus with a small deterministic matrix
and run sparkless — they guard the math (group law, screen coverage,
prefix stability) and the two loudly-failing acceptance-wall guards, not
the measurement harness itself.
"""

from __future__ import annotations

import sys

import numpy as np
import pytest

sys.path.insert(0, "/root/repo/tools")

import scale_run as sr  # noqa: E402


@pytest.fixture()
def fake_corpus(monkeypatch):
    """Small unit-row matrix standing in for the embeddings screen corpus.
    LOW coherence matters: random unit vectors in 64 dims have pairwise
    |cos| ~ N(0, 1/64) (max ≈ 0.4 over a dozen rows), so the 0.78 screen
    accepts nearly every candidate and the tests exercise the CONSTRUCTION,
    not the screen's rejection loop — a small-dimension corpus (tried 16)
    is coherent enough that basis acceptance stalls exactly like the
    documented k-wall. Caches cleared around each test so the seeded
    streams restart."""
    rng = np.random.RandomState(5)
    U = rng.randn(12, 64)
    U /= np.linalg.norm(U, axis=1, keepdims=True)
    monkeypatch.setattr(sr, "_unit_corpus", lambda spark: U)
    sr._BASIS_CACHE.clear()
    sr._PATTERN_CACHE.clear()
    yield U
    sr._BASIS_CACHE.clear()
    sr._PATTERN_CACHE.clear()


def test_group_patterns_identity_and_group_law(fake_corpus):
    """Replica 0 is the identity, and the construction is a group under ⊙:
    s_a ⊙ s_b == s_{a XOR b} — the property that lets 2^m−1 screens cover
    all k(k−1)/2 replica pairs."""
    pats = sr._group_sign_patterns(None, 16)
    assert (pats[0] == 1.0).all()
    for a, b in ((1, 2), (3, 5), (7, 12), (9, 9)):
        assert (pats[a] * pats[b] == pats[a ^ b]).all()


def test_group_patterns_screen_every_nonzero_element(fake_corpus):
    """Every cross-replica combined pattern (= every nonzero group element)
    keeps the full cross-cosine matrix under GROUP_COS_LIMIT — checked here
    by brute force over all pairs, which the construction claims to cover
    with only 2^m−1 screens."""
    U = fake_corpus
    k = 8
    pats = sr._group_sign_patterns(None, k)
    for a in range(k):
        for b in range(a + 1, k):
            m = np.abs((U * (pats[a] * pats[b])) @ U.T).max()
            assert m < sr.GROUP_COS_LIMIT, (a, b, m)


def test_group_patterns_prefix_stable(fake_corpus):
    """Pattern r is identical whatever k ≥ r+1 is requested (the basis
    stream restarts from its seed, and acceptance of b_j depends only on
    b_1..b_{j−1}), so replicas are comparable across scales."""
    pats16 = [p.copy() for p in sr._group_sign_patterns(None, 16)]
    sr._BASIS_CACHE.clear()
    pats5 = sr._group_sign_patterns(None, 5)
    for i in range(5):
        assert (pats5[i] == pats16[i]).all()


def test_pattern_screens_fail_loudly_past_their_walls(fake_corpus):
    """Both screens hit geometric acceptance walls; past them they must
    raise instead of silently looping forever."""
    with pytest.raises(ValueError, match="pairwise sign-pattern screen"):
        sr._sign_patterns(None, 51)
    with pytest.raises(ValueError, match="group sign-pattern screen"):
        sr._group_sign_patterns(None, 513)
