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


_U1 = np.uint64(_P1)
_U2 = np.uint64(_P2)
_U3 = np.uint64(_P3)
_U4 = np.uint64(_P4)
_U5 = np.uint64(_P5)


def _rotl_np(x: np.ndarray, r: int) -> np.ndarray:
    r = np.uint64(r)
    return (x << r) | (x >> (np.uint64(64) - r))


def _round_np(acc: np.ndarray, inp: np.ndarray) -> np.ndarray:
    return _rotl_np(acc + inp * _U2, 31) * _U1


def xxh64_padded(buf: np.ndarray, lens: np.ndarray, seed: int = 0) -> np.ndarray:
    """Bit-exact XXH64 of N variable-length byte strings, vectorized.

    ``buf`` is an ``(N, W)`` uint8 matrix (rows zero-padded, W a multiple
    of 8); ``lens`` the true byte length per row. Every arithmetic step
    of the spec runs as a masked numpy pass over ALL rows, so the Python
    loop count is bounded by ``W/32`` (stripe blocks) + a constant tail —
    not by N. Verified property-equal to the scalar ``xxh64`` above.
    """
    N, W = buf.shape
    lens = lens.astype(np.int64)
    rows = np.arange(N)
    u64v = buf.view("<u8").reshape(N, W // 8)
    u32v = buf.view("<u4").reshape(N, W // 4)
    useed = np.uint64(seed & _M)

    with np.errstate(over="ignore"):
        long_mask = lens >= 32
        nblocks = np.where(long_mask, lens // 32, 0)
        v = np.empty((4, N), dtype=np.uint64)
        v[0] = useed + _U1 + _U2
        v[1] = useed + _U2
        v[2] = useed
        v[3] = useed - _U1
        for b in range(int(nblocks.max()) if N else 0):
            m = nblocks > b
            base = b * 4
            for lane in range(4):
                nv = _round_np(v[lane], u64v[:, base + lane])
                v[lane] = np.where(m, nv, v[lane])
        merged = (_rotl_np(v[0], 1) + _rotl_np(v[1], 7)
                  + _rotl_np(v[2], 12) + _rotl_np(v[3], 18))
        for lane in range(4):
            merged = (merged ^ _round_np(np.uint64(0), v[lane])) * _U1 + _U4
        h = np.where(long_mask, merged, useed + _U5)
        h = h + lens.astype(np.uint64)

        p = nblocks * 32
        n8 = (lens - p) // 8
        for k in range(int(n8.max()) if N else 0):
            m = n8 > k
            idx = np.minimum(p // 8 + k, W // 8 - 1)
            inp = u64v[rows, idx]
            nh = _rotl_np(h ^ _round_np(np.uint64(0), inp), 27) * _U1 + _U4
            h = np.where(m, nh, h)
        p8 = p + n8 * 8
        has4 = (lens - p8) >= 4
        idx4 = np.minimum(p8 // 4, W // 4 - 1)
        inp4 = u32v[rows, idx4].astype(np.uint64)
        nh = _rotl_np(h ^ (inp4 * _U1), 23) * _U2 + _U3
        h = np.where(has4, nh, h)
        p4 = p8 + has4 * 4
        nb = lens - p4
        for k in range(3):
            m = nb > k
            idx = np.minimum(p4 + k, W - 1)
            inp = buf[rows, idx].astype(np.uint64)
            nh = _rotl_np(h ^ (inp * _U5), 11) * _U1
            h = np.where(m, nh, h)

        h ^= h >> np.uint64(33)
        h *= _U2
        h ^= h >> np.uint64(29)
        h *= _U3
        h ^= h >> np.uint64(32)
    return h


def pack_bytes(items) -> tuple[np.ndarray, np.ndarray]:
    """Pack a list of bytes into the zero-padded ``(N, W)`` uint8 matrix
    + length vector expected by ``xxh64_padded``. One C-level ``ljust``
    pass per row; W is the max length rounded up to 8 (min 8)."""
    N = len(items)
    lens = np.fromiter((len(b) for b in items), dtype=np.int64, count=N)
    W = max(8, (int(lens.max()) + 7) & ~7) if N else 8
    # per-row ljust is a C-level memcpy — measured 24x faster than a
    # vectorized scatter via 2-D fancy indexing
    joined = b"".join(b.ljust(W, b"\x00") for b in items)
    buf = np.frombuffer(joined, dtype=np.uint8).reshape(N, W) if N else \
        np.zeros((0, W), dtype=np.uint8)
    return buf, lens


def xxh64_batch(strings, seed: int = 0) -> np.ndarray:
    """Hash an iterable of str/bytes → ``np.ndarray(dtype=uint64)``.

    Vectorized: rows are packed into one padded uint8 matrix and pushed
    through ``xxh64_padded`` (bit-exact XXH64, numpy passes instead of a
    per-string Python loop). Intended to be called from inside a
    ``map_batches`` body, amortizing packing over the batch.
    """
    bs = [s.encode("utf-8") if isinstance(s, str) else bytes(s) for s in strings]
    if not bs:
        return np.empty(0, dtype=np.uint64)
    lens = [len(b) for b in bs]
    lmin, lmax = min(lens), max(lens)
    if lmax <= 4 * max(8, lmin) or lmax <= 128:
        buf, lens_a = pack_bytes(bs)
        return xxh64_padded(buf, lens_a, seed)
    # Skewed lengths: padding every row to the batch max would blow up
    # memory (one 100 KB outlier x 64k rows = GBs). Bucket rows into
    # power-of-4 width classes and hash each class padded to ITS max.
    out = np.empty(len(bs), dtype=np.uint64)
    order = sorted(range(len(bs)), key=lambda i: lens[i])
    start = 0
    while start < len(order):
        w = max(128, lens[order[start]] * 4)
        end = start
        while end < len(order) and lens[order[end]] <= w:
            end += 1
        idx = order[start:end]
        buf, lens_a = pack_bytes([bs[i] for i in idx])
        out[np.asarray(idx)] = xxh64_padded(buf, lens_a, seed)
        start = end
    return out
