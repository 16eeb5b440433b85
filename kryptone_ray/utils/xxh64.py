"""Pure-Python implementation of the public XXH64 algorithm.

XXH64 is the 64-bit variant of xxHash (public domain / BSD-2, spec at
github.com/Cyan4973/xxHash). The north-star design keys the URL-seen
set on ``xxhash64(canonical_url)``; the ``xxhash`` wheel is not
available in this sandbox, so we implement the algorithm from its
published specification.

Scalar (``xxh64``) for single keys, plus ``xxh64_batch`` which hashes a
list/array of strings into a ``numpy.uint64`` array (one tight Python
loop per batch — called once per Arrow batch inside ``map_batches``,
never per row from the driver).
"""

from __future__ import annotations

import struct

import numpy as np

_P1 = 0x9E3779B185EBCA87
_P2 = 0xC2B2AE3D27D4EB4F
_P3 = 0x165667B19E3779F9
_P4 = 0x85EBCA77C2B2AE63
_P5 = 0x27D4EB2F165667C5
_M = 0xFFFFFFFFFFFFFFFF

_u64 = struct.Struct("<Q").unpack_from
_u32 = struct.Struct("<I").unpack_from


def _rotl(x: int, r: int) -> int:
    return ((x << r) | (x >> (64 - r))) & _M


def _round(acc: int, inp: int) -> int:
    acc = (acc + inp * _P2) & _M
    acc = _rotl(acc, 31)
    return (acc * _P1) & _M


def _merge_round(acc: int, val: int) -> int:
    acc ^= _round(0, val)
    return (acc * _P1 + _P4) & _M


def xxh64(data: bytes | str, seed: int = 0) -> int:
    """XXH64 of ``data`` with ``seed``; returns an unsigned 64-bit int."""
    if isinstance(data, str):
        data = data.encode("utf-8")
    n = len(data)
    p = 0
    if n >= 32:
        v1 = (seed + _P1 + _P2) & _M
        v2 = (seed + _P2) & _M
        v3 = seed & _M
        v4 = (seed - _P1) & _M
        limit = n - 32
        while p <= limit:
            v1 = _round(v1, _u64(data, p)[0])
            v2 = _round(v2, _u64(data, p + 8)[0])
            v3 = _round(v3, _u64(data, p + 16)[0])
            v4 = _round(v4, _u64(data, p + 24)[0])
            p += 32
        h = (_rotl(v1, 1) + _rotl(v2, 7) + _rotl(v3, 12) + _rotl(v4, 18)) & _M
        h = _merge_round(h, v1)
        h = _merge_round(h, v2)
        h = _merge_round(h, v3)
        h = _merge_round(h, v4)
    else:
        h = (seed + _P5) & _M
    h = (h + n) & _M
    while p + 8 <= n:
        h ^= _round(0, _u64(data, p)[0])
        h = (_rotl(h, 27) * _P1 + _P4) & _M
        p += 8
    if p + 4 <= n:
        h ^= (_u32(data, p)[0] * _P1) & _M
        h = (_rotl(h, 23) * _P2 + _P3) & _M
        p += 4
    while p < n:
        h ^= (data[p] * _P5) & _M
        h = (_rotl(h, 11) * _P1) & _M
        p += 1
    h ^= h >> 33
    h = (h * _P2) & _M
    h ^= h >> 29
    h = (h * _P3) & _M
    h ^= h >> 32
    return h


def content_hash64(data: bytes, seed: int = 0) -> int:
    """Fast deterministic 64-bit hash for LARGE payloads (pixel buffers):
    numpy-vectorized position-mixed fold, finalized through scalar XXH64.
    Not XXH64 of the input — a distinct, stable function used where the
    spec only requires "a deterministic hash of decoded pixels"
    (BASELINE.json input_hint ``phash``). ~100× faster than the scalar
    loop on multi-KB inputs."""
    n = len(data)
    pad = (-n) % 8
    if pad:
        data = data + b"\x00" * pad
    a = np.frombuffer(data, dtype="<u8")
    idx = np.arange(1, len(a) + 1, dtype=np.uint64)
    with np.errstate(over="ignore"):
        mixed = (a ^ (idx * np.uint64(_P1))) * np.uint64(_P2)
    digest = int(np.bitwise_xor.reduce(mixed)) if len(mixed) else 0
    return xxh64(digest.to_bytes(8, "little") + n.to_bytes(8, "little"), seed)


def xxh64_batch(strings, seed: int = 0) -> np.ndarray:
    """Hash an iterable of str/bytes → ``np.ndarray(dtype=uint64)``.

    One Python loop per *batch* (the per-string core is the scalar
    implementation above); intended to be called from inside a
    ``map_batches`` body, amortizing the call overhead over the batch.
    """
    out = np.empty(len(strings), dtype=np.uint64)
    h = xxh64
    for i, s in enumerate(strings):
        out[i] = h(s, seed)
    return out
