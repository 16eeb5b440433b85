"""Vectorized Bloom filter for distributed join pruning.

The 100-TB semi/anti-join accelerator (reference capability: the
seen-set membership test, base.py:728-745, approximated): instead of
broadcasting the probe-side KEY SET (which grows with data), broadcast
a FIXED-SIZE bitmap built from OR-mergeable per-batch partials, filter
the big side map-only down to candidates (no false negatives, bounded
false-positive rate), and run the exact join only on the survivors.

All operations are numpy-vectorized over int64/uint64 key arrays:
splitmix64 finalizer for h1/h2, Kirsch-Mitzenmacher double hashing for
the k probe positions, bit-packed uint8 bitmap. Partial bitmaps from
different batches OR together associatively, so the build distributes
like any other partial aggregate.
"""

from __future__ import annotations

import numpy as np

_C1 = np.uint64(0xBF58476D1CE4E5B9)
_C2 = np.uint64(0x94D049BB133111EB)


def _mix(x: np.ndarray, seed: int) -> np.ndarray:
    """splitmix64 finalizer — avalanche int keys to uniform uint64."""
    with np.errstate(over="ignore"):
        z = x.astype(np.uint64) + np.uint64(seed)
        z = (z ^ (z >> np.uint64(30))) * _C1
        z = (z ^ (z >> np.uint64(27))) * _C2
        return z ^ (z >> np.uint64(31))


def bloom_bits_for(n_keys: int, bits_per_key: int = 10,
                   max_bits: int = 1 << 27) -> int:
    """Power-of-two bitmap size: ~10 bits/key ≈ 1% FP at k=4, capped at
    16 MiB so the broadcast object stays node-friendly regardless of
    probe cardinality (the FP rate, not correctness, degrades past the
    cap — the exact join behind the filter eliminates FPs)."""
    want = max(1 << 10, n_keys * bits_per_key)
    return min(max_bits, 1 << int(np.ceil(np.log2(want))))


def bloom_partial(keys: np.ndarray, n_bits: int, k: int = 4) -> np.ndarray:
    """Bitmap (uint8, n_bits/8 bytes) with ``keys`` inserted. OR these
    partials together (np.bitwise_or) to merge batches/partitions."""
    bitmap = np.zeros(n_bits // 8, dtype=np.uint8)
    if len(keys) == 0:
        return bitmap
    mask = np.uint64(n_bits - 1)
    h1 = _mix(keys, 0x9E3779B9)
    h2 = _mix(keys, 0x85EBCA6B) | np.uint64(1)  # odd → full-period step
    for i in range(k):
        with np.errstate(over="ignore"):
            pos = (h1 + np.uint64(i) * h2) & mask
        np.bitwise_or.at(bitmap, (pos >> np.uint64(3)).astype(np.int64),
                         np.uint8(1) << (pos & np.uint64(7)).astype(np.uint8))
    return bitmap


def bloom_contains(bitmap: np.ndarray, keys: np.ndarray,
                   k: int = 4) -> np.ndarray:
    """Vectorized membership mask. Guaranteed True for every inserted
    key (no false negatives); False positives at the configured rate."""
    if len(keys) == 0:
        return np.zeros(0, dtype=bool)
    n_bits = len(bitmap) * 8
    mask = np.uint64(n_bits - 1)
    h1 = _mix(keys, 0x9E3779B9)
    h2 = _mix(keys, 0x85EBCA6B) | np.uint64(1)
    out = np.ones(len(keys), dtype=bool)
    for i in range(k):
        with np.errstate(over="ignore"):
            pos = (h1 + np.uint64(i) * h2) & mask
        byte = bitmap[(pos >> np.uint64(3)).astype(np.int64)]
        out &= (byte >> (pos & np.uint64(7)).astype(np.uint8)) & 1 > 0
    return out
