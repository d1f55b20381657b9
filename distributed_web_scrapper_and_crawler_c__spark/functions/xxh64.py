"""Driver-side twin of Spark SQL's ``xxhash64`` expression.

The seen-filter state (plans/bloom, plans/cuckoo) hashes keys JVM-side with
``F.xxhash64`` so the hot path never leaves the JVM. The driver fast-round
path (plans/frontier, sub-batch rounds) needs the SAME hash values for a
handful of keys without launching a Spark job — this module computes them
in Python.

Algorithm: XXH64 (Yann Collet's public xxHash, BSD) exactly as Spark SQL
evaluates it:

- ``xxhash64(c1, c2, ...)`` folds over the children with the running hash
  as the seed: ``h = 42; for c in children: h = H(c, seed=h)``.
- a string child hashes its UTF-8 bytes through the general XXH64 routine;
- an int child (e.g. ``F.lit(1)``) takes the 4-byte specialization;
- a long child takes the 8-byte specialization.

Byte-equality with the JVM expression is asserted by fuzz in
``tests/test_fast_rounds.py`` (test_xxh64_matches_spark_expression) — the
bloom/cuckoo bitmaps a fast round updates must be bit-identical to the
ones a distributed round would produce.
"""

from __future__ import annotations

import numpy as np

_P1 = 0x9E3779B185EBCA87
_P2 = 0xC2B2AE3D27D4EB4F
_P3 = 0x165667B19E3779F9
_P4 = 0x85EBCA77C2B2AE63
_P5 = 0x27D4EB2F165667C5
_M = (1 << 64) - 1

SPARK_DEFAULT_SEED = 42


def _rotl(x: int, r: int) -> int:
    return ((x << r) | (x >> (64 - r))) & _M


def _fmix(h: int) -> int:
    h ^= h >> 33
    h = (h * _P2) & _M
    h ^= h >> 29
    h = (h * _P3) & _M
    h ^= h >> 32
    return h


def _round(acc: int, inp: int) -> int:
    acc = (acc + inp * _P2) & _M
    return (_rotl(acc, 31) * _P1) & _M


def xxh64_bytes(data: bytes, seed: int = SPARK_DEFAULT_SEED) -> int:
    """XXH64 of a byte string (unsigned 64-bit result)."""
    n = len(data)
    i = 0
    if n >= 32:
        v1 = (seed + _P1 + _P2) & _M
        v2 = (seed + _P2) & _M
        v3 = seed & _M
        v4 = (seed - _P1) & _M
        while i <= n - 32:
            v1 = _round(v1, int.from_bytes(data[i : i + 8], "little"))
            v2 = _round(v2, int.from_bytes(data[i + 8 : i + 16], "little"))
            v3 = _round(v3, int.from_bytes(data[i + 16 : i + 24], "little"))
            v4 = _round(v4, int.from_bytes(data[i + 24 : i + 32], "little"))
            i += 32
        h = (_rotl(v1, 1) + _rotl(v2, 7) + _rotl(v3, 12) + _rotl(v4, 18)) & _M
        for v in (v1, v2, v3, v4):
            h ^= _round(0, v)
            h = (h * _P1 + _P4) & _M
    else:
        h = (seed + _P5) & _M
    h = (h + n) & _M
    while i <= n - 8:
        h ^= _round(0, int.from_bytes(data[i : i + 8], "little"))
        h = (_rotl(h, 27) * _P1 + _P4) & _M
        i += 8
    if i <= n - 4:
        h ^= (int.from_bytes(data[i : i + 4], "little") * _P1) & _M
        h = (_rotl(h, 23) * _P2 + _P3) & _M
        i += 4
    while i < n:
        h ^= (data[i] * _P5) & _M
        h = (_rotl(h, 11) * _P1) & _M
        i += 1
    return _fmix(h)


def xxh64_int(value: int, seed: int) -> int:
    """Spark XXH64.hashInt — the 4-byte specialization (IntegerType child,
    e.g. ``F.lit(1)``)."""
    h = (seed + _P5 + 4) & _M
    h ^= ((value & 0xFFFFFFFF) * _P1) & _M
    h = (_rotl(h, 23) * _P2 + _P3) & _M
    return _fmix(h)


def xxh64_long(value: int, seed: int) -> int:
    """Spark XXH64.hashLong — the 8-byte specialization (LongType child)."""
    h = (seed + _P5 + 8) & _M
    h ^= _round(0, value & _M)
    h = (_rotl(h, 27) * _P1 + _P4) & _M
    return _fmix(h)


def spark_xxhash64_str(s: str, *int_children: int) -> int:
    """``F.xxhash64(col, F.lit(i1), ...)`` for a string column value plus
    optional Python-int literal children (IntegerType), as an UNSIGNED
    64-bit int. Spark returns the same bits as a signed long."""
    h = xxh64_bytes(s.encode("utf-8"), SPARK_DEFAULT_SEED)
    for c in int_children:
        h = xxh64_int(c, h)
    return h


def hash_str_array(strings, *int_children: int) -> np.ndarray:
    """Vectorize :func:`spark_xxhash64_str` over a sequence — returns a
    uint64 array shaped for the numpy bitmap/table kernels in plans/bloom
    and plans/cuckoo (they ``.view(np.uint64)`` Spark's signed output; this
    is already the unsigned view)."""
    out = np.empty(len(strings), dtype=np.uint64)
    for j, s in enumerate(strings):
        out[j] = spark_xxhash64_str(s, *int_children)
    return out
