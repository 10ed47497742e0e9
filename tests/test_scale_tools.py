"""Laws for the scale-corpus sign-pattern screens (tools/scale_run.py).

The group construction is pure numpy once the screening corpus is loaded,
so these tests monkeypatch _unit_corpus with a small deterministic matrix
and run sparkless — they guard the math (group law, screen coverage,
prefix stability) and the two loudly-failing acceptance-wall guards, not
the measurement harness itself.
"""

from __future__ import annotations

import os
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tools"))

import scale_run as sr  # noqa: E402


@pytest.fixture()
def fake_corpus(monkeypatch):
    """Small unit-row matrix standing in for the embeddings screen corpus.
    LOW coherence matters: random unit vectors in 64 dims have pairwise
    |cos| ~ N(0, 1/64) (max ≈ 0.4 over a dozen rows), so the 0.79 screen
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
        sr._group_sign_patterns(None, 1025)


def test_corpus_patterns_route_by_k(fake_corpus, monkeypatch):
    """build_corpus's pattern source: pairwise stream up to k=50 (keeps
    historical cache dirs valid), group stream beyond (ADVICE r9 — the
    full-corpus builder must not be walled at 50× when only the embeddings
    table depends on patterns at all)."""
    calls = []
    monkeypatch.setattr(
        sr, "_sign_patterns", lambda spark, k: calls.append(("pair", k)) or ["p"] * k
    )
    monkeypatch.setattr(
        sr,
        "_group_sign_patterns",
        lambda spark, k: calls.append(("group", k)) or ["g"] * k,
    )
    assert sr._corpus_patterns(None, 50) == ["p"] * 50
    assert sr._corpus_patterns(None, 51) == ["g"] * 51
    assert calls == [("pair", 50), ("group", 51)]


def test_signflip_marker_distinguishes_pattern_streams(tmp_path):
    """A cache dir built by one pattern stream must not satisfy the other's
    marker check, and the group variant is content-addressed by the screen
    contract (limit/seed/construction)."""
    assert sr._signflip_marker(50) == "v2"
    assert sr._signflip_marker(51) != "v2"
    assert sr._group_screen_version() in sr._signflip_marker(51)
    m = tmp_path / "_emb_signflip"
    m.write_text(sr._signflip_marker(50) + "\n")
    assert sr._marker_matches(str(m), sr._signflip_marker(50))
    assert not sr._marker_matches(str(m), sr._signflip_marker(51))
    assert not sr._marker_matches(str(tmp_path / "missing"), "v2")


def test_unstable_emb_tier_cell_nulls_recall():
    """ADVICE r9, on the PRODUCTION helpers (the round-10 self-review found
    the first version asserting on its own inline copy of the logic): when
    rows flap across passes the cell must not report the pass-0 recall as
    a clean figure — recall goes None with one recall per observed row
    count, and _note_rows must keep EVERY observation, not just pass-0 +
    latest."""
    cell = {"rows": 100, "expected": 100, "sig_sec": 1.0, "full_sec": 4.0}
    assert not sr._note_rows(cell, 100)          # stable pass
    assert "rows_unstable" not in cell
    assert sr._note_rows(cell, 98)               # flap
    assert sr._note_rows(cell, 97)               # second flap: 98 must survive
    assert not sr._note_rows(cell, 100)          # pass-0 value again, still unstable
    assert cell["rows_unstable"] == [97, 98, 100]
    sr._finalize_recall(cell)
    assert cell["recall"] is None
    assert cell["recall_by_rows"] == {"97": 0.97, "98": 0.98, "100": 1.0}
    assert cell["sig_share"] == 0.25

    stable = {"rows": 99, "expected": 100, "sig_sec": 1.0, "full_sec": 4.0}
    sr._note_rows(stable, 99)
    sr._finalize_recall(stable)
    assert stable["recall"] == 0.99 and "recall_by_rows" not in stable


def test_parse_tiers_roundtrip_and_rejects_malformed():
    """--tiers parsing (tier_compare_main's input): BITSxBANDS list, loud
    failure on malformed specs BEFORE any corpus build starts."""
    assert sr._parse_tiers("20x100,24x188") == [(20, 100), (24, 188)]
    assert sr._parse_tiers("8X20") == [(8, 20)]  # case-insensitive
    for bad in ("20", "20x", "x100", "20x100x5", "20xab", "0x100", "20x0"):
        with pytest.raises(ValueError):
            sr._parse_tiers(bad)
