"""Arrow/numpy generator backend — the vectorized-Python alternative to the
Catalyst-expression planner (plans/planner.py).

Same semantics, same determinism law (every value a pure function of
(row id, seed, column, draw)), different execution: ``mapInPandas`` streams
id batches into numpy, where a vectorized SplitMix64 produces the draws and
string columns are built as (n × len) byte matrices. Exists because the
expression path's per-character cost goes through Spark's interpreted
higher-order-function machinery (~130 K rows/s/core for varchar(50));
numpy does the same work ~3× faster per core, at the price of Python
workers in the pipeline. The JVM path stays the default; pass
``impl="arrow"`` to ``generate_table`` for string-heavy specs.

The randomness differs numerically from the JVM path (SplitMix64 vs
xxhash64) — both satisfy the same distribution laws; outputs are not meant
to be bit-identical across backends (key/rkey ARE identical: key is the id,
rkey is the same exact bijection, vectorized).
"""

from __future__ import annotations

import time
from collections.abc import Iterator

import numpy as np
import pandas as pd

from sqload_spark.plans.spec_parser import ColumnSpec

U64 = np.uint64
_CHARSET62 = np.frombuffer(
    b"0123456789ABCDEFGHIJKLMNOPQRSTUVWXYZabcdefghijklmnopqrstuvwxyz", dtype=np.uint8
)
_CHARSET26 = np.frombuffer(b"ABCDEFGHIJKLMNOPQRSTUVWXYZ", dtype=np.uint8)


def _splitmix64(x: np.ndarray) -> np.ndarray:
    x = x + U64(0x9E3779B97F4A7C15)
    z = (x ^ (x >> U64(30))) * U64(0xBF58476D1CE4E5B9)
    z = (z ^ (z >> U64(27))) * U64(0x94D049BB133111EB)
    return z ^ (z >> U64(31))


def _draw(ids: np.ndarray, seed: int, col: int, j: int) -> np.ndarray:
    """One uint64 draw per row for (seed, column, draw-index)."""
    salt = U64((seed * 1_000_003 + col * 1031 + j * 7919) & 0xFFFFFFFFFFFFFFFF)
    return _splitmix64(ids * U64(0x9E3779B97F4A7C15) + salt)


def _uniform(ids, lo: int, hi: int, seed, col, j=0) -> np.ndarray:
    span = U64(hi - lo + 1)
    return (_draw(ids, seed, col, j) % span).astype(np.int64) + lo


def _strings(ids, lengths, charset: np.ndarray, seed, col) -> np.ndarray:
    """(n,) object array of strings with per-row lengths (int or array)."""
    max_len = int(lengths if np.isscalar(lengths) else lengths.max())
    pos = np.arange(max_len, dtype=U64)
    salt = U64((seed * 1_000_003 + col * 1031 + 101) & 0xFFFFFFFFFFFFFFFF)
    h = _splitmix64((ids * U64(65536) + salt)[:, None] + pos[None, :])
    chars = charset[(h % U64(len(charset))).astype(np.uint8)]
    raw = chars.view(f"S{max_len}").ravel().astype(str)
    if np.isscalar(lengths):
        return raw
    return np.array([s[:l] for s, l in zip(raw, lengths)], dtype=object)


def _rkey(ids: np.ndarray) -> np.ndarray:
    """The reference rkey bijection, vectorized (same bits as rkey_py)."""
    g = ids + U64(1)
    x = (g << U64(63)) | (g >> U64(1))
    for mask, shift in ((0x2222222222222222, 1), (0x0C0C0C0C0C0C0C0C, 2), (0x00F000F000F000F0, 4)):
        t = ((x >> U64(shift)) ^ x) & U64(mask)
        x = x ^ t ^ (t << U64(shift))
    return x


def _column(ids: np.ndarray, spec: ColumnSpec, seed: int, col: int, now_epoch: int):
    t = spec.type
    if t == "key":
        return ids.astype(np.int64)
    if t == "rkey":
        return _rkey(ids)  # uint64, pandas → object/decimal-compatible
    if t == "bit":
        return _uniform(ids, 0, 1, seed, col).astype(np.int32)
    if t == "tinyint":
        return _uniform(ids, -128, 127, seed, col).astype(np.int8)
    if t == "smallint":
        return _uniform(ids, -32768, 32767, seed, col).astype(np.int16)
    if t == "mediumint":
        return _uniform(ids, -8388608, 8388607, seed, col).astype(np.int32)
    if t == "int":
        return _uniform(ids, -(2**31), 2**31 - 1, seed, col).astype(np.int32)
    if t == "bigint":
        return _draw(ids, seed, col, 0).astype(np.int64)
    if t == "float":
        u = _draw(ids, seed, col, 0) >> U64(11)
        return ((u.astype(np.float64) / float(1 << 53)) * 2 - 1).astype(np.float32) * np.float32(1e38)
    if t == "double":
        u = _draw(ids, seed, col, 0) >> U64(11)
        return ((u.astype(np.float64) / float(1 << 53)) * 2 - 1) * 2147483647.0
    if t in ("char", "nchar"):
        return _strings(ids, spec.length, _CHARSET26, seed, col)
    if t in ("varchar", "varchar2", "nvarchar2"):
        return _strings(ids, spec.length, _CHARSET62, seed, col)
    if t in ("text", "blob"):
        lengths = _uniform(ids, 1, 256, seed, col, j=9)
        return _strings(ids, lengths, _CHARSET62, seed, col)
    if t == "date":
        y = _uniform(ids, 1900, 2021, seed, col, 0)
        m = _uniform(ids, 1, 12, seed, col, 1)
        d = _uniform(ids, 1, 28, seed, col, 2)
        return pd.to_datetime(
            {"year": y, "month": m, "day": d}
        ).dt.date.to_numpy()
    if t == "datetime":
        y = _uniform(ids, 1900, 2021, seed, col, 0)
        m = _uniform(ids, 1, 12, seed, col, 1)
        d = _uniform(ids, 1, 28, seed, col, 2)
        hh = _uniform(ids, 0, 23, seed, col, 3)
        mm = _uniform(ids, 0, 59, seed, col, 4)
        ss = _uniform(ids, 0, 59, seed, col, 5)
        return pd.to_datetime(
            {"year": y, "month": m, "day": d, "hour": hh, "minute": mm, "second": ss}
        ).to_numpy()
    if t == "timestamp":
        secs = _uniform(ids, 1, now_epoch, seed, col)
        return pd.to_datetime(secs, unit="s").to_numpy()
    if t == "time":
        hh = _uniform(ids, 0, 23, seed, col, 0)
        mm = _uniform(ids, 0, 59, seed, col, 1)
        ss = _uniform(ids, 0, 59, seed, col, 2)
        return np.array([f"{h:02d}:{m:02d}:{s:02d}" for h, m, s in zip(hh, mm, ss)], dtype=object)
    if t == "year":
        return _uniform(ids, 1901, 2155, seed, col).astype(np.int32)
    if t in ("decimal", "number"):
        p, s = spec.precision, spec.scale
        if p - s > 18 or s > 18:
            raise ValueError(f"decimal({p},{s}) not supported")
        ipart = _uniform(ids, 0, 10 ** (p - s) - 1, seed, col, 0) if p > s else np.zeros(len(ids), np.int64)
        frac = _uniform(ids, 0, 10**s - 1, seed, col, 1) if s > 0 else np.zeros(len(ids), np.int64)
        from decimal import Decimal

        q = Decimal(1).scaleb(-s)
        return np.array(
            [(Decimal(int(i)) + Decimal(int(f)).scaleb(-s)).quantize(q) for i, f in zip(ipart, frac)],
            dtype=object,
        )
    return np.full(len(ids), "", dtype=object)


def arrow_generator(specs: list[ColumnSpec], seed: int):
    """Build the mapInPandas function for these specs."""
    now_epoch = int(time.time())

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids = pdf["id"].to_numpy().astype(U64)
            out = {}
            for i, spec in enumerate(specs):
                col = _column(ids, spec, seed, i, now_epoch)
                if spec.type == "rkey":
                    from decimal import Decimal

                    col = np.array([Decimal(int(v)) for v in col], dtype=object)
                out[f"c{i}"] = col
            yield pd.DataFrame(out)

    return gen
