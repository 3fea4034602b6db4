"""Pure-Python XXH64 matching Spark's ``xxhash64`` expression.

Implements the public xxHash64 algorithm (Yann Collet's spec,
https://github.com/Cyan4973/xxHash) exactly as Spark evaluates it:
seed 42, per-column fold where each column's hash seeds the next
(``org.apache.spark.sql.catalyst.expressions.XxHash64``). Used by the
golden-result generator so the MinHash/SimHash oracles are computed
with no Spark involvement; ``tests/test_goldens.py`` pins parity
against Spark for strings and longs of every tail-length class.
"""

from __future__ import annotations

import struct

_P1 = 0x9E3779B185EBCA87
_P2 = 0xC2B2AE3D27D4EB4F
_P3 = 0x165667B19E3779F9
_P4 = 0x85EBCA77C2B2AE63
_P5 = 0x27D4EB2F165667C5
_M = (1 << 64) - 1

SPARK_SEED = 42


def _rotl(x: int, r: int) -> int:
    return ((x << r) | (x >> (64 - r))) & _M


def _round(acc: int, inp: int) -> int:
    return (_rotl((acc + inp * _P2) & _M, 31) * _P1) & _M


def _merge_round(acc: int, val: int) -> int:
    return ((acc ^ _round(0, val)) * _P1 + _P4) & _M


def _fmix(h: int) -> int:
    h ^= h >> 33
    h = (h * _P2) & _M
    h ^= h >> 29
    h = (h * _P3) & _M
    h ^= h >> 32
    return h


def xxh64_bytes(data: bytes, seed: int) -> int:
    """Unsigned 64-bit xxHash64 of ``data`` with ``seed``."""
    seed &= _M
    n = len(data)
    i = 0
    if n >= 32:
        v1 = (seed + _P1 + _P2) & _M
        v2 = (seed + _P2) & _M
        v3 = seed
        v4 = (seed - _P1) & _M
        while i <= n - 32:
            v1 = _round(v1, int.from_bytes(data[i:i + 8], "little"))
            v2 = _round(v2, int.from_bytes(data[i + 8:i + 16], "little"))
            v3 = _round(v3, int.from_bytes(data[i + 16:i + 24], "little"))
            v4 = _round(v4, int.from_bytes(data[i + 24:i + 32], "little"))
            i += 32
        h = (_rotl(v1, 1) + _rotl(v2, 7) + _rotl(v3, 12) + _rotl(v4, 18)) & _M
        for v in (v1, v2, v3, v4):
            h = _merge_round(h, v)
    else:
        h = (seed + _P5) & _M
    h = (h + n) & _M
    while i + 8 <= n:
        k1 = _round(0, int.from_bytes(data[i:i + 8], "little"))
        h = (_rotl(h ^ k1, 27) * _P1 + _P4) & _M
        i += 8
    if i + 4 <= n:
        h = (_rotl(h ^ ((int.from_bytes(data[i:i + 4], "little") * _P1) & _M),
                   23) * _P2 + _P3) & _M
        i += 4
    while i < n:
        h = (_rotl(h ^ ((data[i] * _P5) & _M), 11) * _P1) & _M
        i += 1
    return _fmix(h)


def _signed(h: int) -> int:
    return h - (1 << 64) if h >= (1 << 63) else h


def xxh64_long(value: int, seed: int) -> int:
    """Spark's hash of one LongType value (8-byte little-endian)."""
    return xxh64_bytes(struct.pack("<q", value), seed)


def xxh64_str(value: str, seed: int) -> int:
    """Spark's hash of one StringType value (UTF-8 bytes)."""
    return xxh64_bytes(value.encode("utf-8"), seed)


def spark_xxhash64(*cols) -> int:
    """Signed result of Spark's ``xxhash64(c1, c2, ...)``: seed 42,
    each column's hash seeding the next; int → long, str → UTF-8."""
    h = SPARK_SEED
    for c in cols:
        if isinstance(c, str):
            h = xxh64_str(c, h)
        elif isinstance(c, int):
            h = xxh64_long(c, h)
        else:
            raise TypeError(f"unsupported column type {type(c)}")
    return _signed(h)
