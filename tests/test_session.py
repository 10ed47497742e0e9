"""persist_bounded keeps exactly one cached epoch per call-site key —
the guarantee that long bench/driver sessions re-running the same query
don't accumulate pinned cache copies (ADVICE r4)."""

from __future__ import annotations

from sqload_spark.session import _PERSISTED, persist_bounded


def _is_cached(df) -> bool:
    lvl = df.storageLevel
    return lvl.useMemory or lvl.useDisk


def test_persist_bounded_rotates_epochs(spark):
    df1 = persist_bounded("test.rotate", spark.range(10))
    df1.count()
    assert _is_cached(df1)

    df2 = persist_bounded("test.rotate", spark.range(20))
    df2.count()
    assert not _is_cached(df1), "previous epoch should be unpersisted"
    assert _is_cached(df2)
    assert _PERSISTED["test.rotate"] is df2

    # distinct keys do not evict each other
    other = persist_bounded("test.other", spark.range(5))
    other.count()
    assert _is_cached(df2) and _is_cached(other)

    # cleanup so later tests see no pinned blocks
    for key in ("test.rotate", "test.other"):
        _PERSISTED.pop(key).unpersist()


def test_scratch_dir_registers_exit_cleanup(tmp_path, monkeypatch):
    """scratch_dir = mkdtemp + atexit rmtree: the no-temp-residue policy
    (ADVICE r5 flagged the bare-mkdtemp leak on the pair artifact; round 6
    routed every scratch consumer through this helper)."""
    import atexit
    import shutil

    from sqload_spark.session import scratch_dir

    registered = []
    monkeypatch.setattr(atexit, "register", lambda fn, *a, **k: registered.append((fn, a)))
    monkeypatch.setenv("TMPDIR", str(tmp_path))
    import tempfile

    tempfile.tempdir = None  # force TMPDIR re-probe
    try:
        p = scratch_dir("sqload_test_")
        assert p.startswith(str(tmp_path))
        assert registered and registered[0][0] is shutil.rmtree
        assert registered[0][1][0] == p
    finally:
        tempfile.tempdir = None


def test_no_bare_mkdtemp_in_package():
    """Policy lock: every scratch directory in sqload_spark goes through
    session.scratch_dir (which guarantees process-exit cleanup). A bare
    tempfile.mkdtemp anywhere in the package is residue waiting to
    accumulate across a long bench/driver session."""
    import pathlib

    import sqload_spark

    root = pathlib.Path(sqload_spark.__file__).parent
    offenders = []
    for py in root.rglob("*.py"):
        src = py.read_text()
        if py.name == "session.py":
            # the one sanctioned call site, inside scratch_dir itself
            assert src.count("tempfile.mkdtemp(") == 1
            continue
        # tempfile.gettempdir() + a hand-built name is the same leak with
        # extra steps (the pre-r7 dedup pair artifact and etl fixtures) —
        # stable per-process artifact paths go through session.scratch_subdir
        if "tempfile.mkdtemp(" in src or "gettempdir(" in src:
            offenders.append(str(py))
    assert not offenders, f"bare scratch path outside session.scratch_dir: {offenders}"


def test_scratch_subdir_stable_and_under_one_root(tmp_path, monkeypatch):
    """scratch_subdir: same key -> same path across invocations (artifact
    writers overwrite in place), distinct keys -> sibling dirs under ONE
    mkdtemp root registered for cleanup exactly once."""
    import importlib

    from sqload_spark import session as sess

    monkeypatch.setattr(sess, "_SCRATCH_ROOT", [])
    calls = []
    real = sess.scratch_dir
    monkeypatch.setattr(
        sess, "scratch_dir", lambda prefix: calls.append(prefix) or real(prefix)
    )
    a1 = sess.scratch_subdir("etl")
    a2 = sess.scratch_subdir("etl")
    b = sess.scratch_subdir("dedup_pairs_x")
    assert a1 == a2
    assert a1 != b
    import os

    assert os.path.dirname(a1) == os.path.dirname(b)
    assert len(calls) == 1  # one root, one cleanup hook


def test_codegen_cache_sized_for_the_suite(spark):
    """get_spark must raise the Janino codegen cache above Spark's
    100-entry default: a 113-entry bench suite evicts and re-compiles the
    big generated classes every pass (measured A/B, one session, two-pass
    min each: suite 195.6 s at 100 entries vs 183.0 s at 2048, with the
    delta concentrated on the codegen-heavy entries —
    dedup_embedding_cosine_banded alone 10.4 s -> 7.1 s). Static conf, so
    it must be present on the session get_spark built; semantics-free
    (compilation cache size), so the oracle gate cannot move."""
    assert int(spark.conf.get("spark.sql.codegen.cache.maxEntries")) >= 2048
