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
