"""A numpy-backed cuckoo filter for the URL-seen set (north_rule:
"sharded cuckoo-filter URL-seen set").

Standard partial-key cuckoo hashing (Fan et al., "Cuckoo Filter:
Practically Better Than Bloom", CoNEXT 2014 — public algorithm):
buckets of ``slots`` 16-bit fingerprints; an item's two candidate
buckets are ``i1 = h(x) mod m`` and ``i2 = i1 xor h(fp)``; inserts
relocate on collision up to ``max_kicks``.

Memory: 2 bytes/slot → a 10^10-key seen set at load 0.95 with 4 slots
per bucket is ~22 GB cluster-wide, split across shards (SURVEY.md §4).
At test scale each shard actor additionally keeps an exact hash set so
correctness assertions stay exact; the filter answers the hot-path
membership probe.
"""

from __future__ import annotations

import numpy as np


class CuckooFilter:
    def __init__(self, capacity: int, slots: int = 4, max_kicks: int = 500, seed: int = 7):
        n_buckets = 1
        while n_buckets * slots < capacity:
            n_buckets *= 2
        self.n_buckets = n_buckets
        self.slots = slots
        self.max_kicks = max_kicks
        self.table = np.zeros((n_buckets, slots), dtype=np.uint16)
        self._mask = np.uint64(n_buckets - 1)
        self._rng = np.random.default_rng(seed)
        self.count = 0

    def _fingerprint(self, h: np.ndarray) -> np.ndarray:
        fp = ((h >> np.uint64(48)) & np.uint64(0xFFFF)).astype(np.uint16)
        fp[fp == 0] = 1  # 0 marks an empty slot
        return fp

    def _index1(self, h: np.ndarray) -> np.ndarray:
        return (h & self._mask).astype(np.uint64)

    def _index2(self, i1: np.ndarray, fp: np.ndarray) -> np.ndarray:
        # ix xor (fp * odd-constant) mod m — the standard partial-key trick
        return (i1 ^ (fp.astype(np.uint64) * np.uint64(0x5BD1E995))) & self._mask

    def contains_batch(self, hashes: np.ndarray) -> np.ndarray:
        h = hashes.astype(np.uint64, copy=False)
        fp = self._fingerprint(h)
        i1 = self._index1(h)
        i2 = self._index2(i1, fp)
        t = self.table
        out = np.zeros(len(h), dtype=bool)
        for s in range(self.slots):
            out |= t[i1, s] == fp
            out |= t[i2, s] == fp
        return out

    def insert_batch(self, hashes: np.ndarray) -> None:
        h = hashes.astype(np.uint64, copy=False)
        fp_arr = self._fingerprint(h)
        i1_arr = self._index1(h)
        for k in range(len(h)):
            self._insert_one(int(i1_arr[k]), int(fp_arr[k]))

    def _insert_one(self, i1: int, fp: int) -> None:
        i2 = int((np.uint64(i1) ^ (np.uint64(fp) * np.uint64(0x5BD1E995))) & self._mask)
        for i in (i1, i2):
            row = self.table[i]
            empty = np.flatnonzero(row == 0)
            if len(empty):
                row[empty[0]] = fp
                self.count += 1
                return
        # relocate
        i = i1 if self._rng.integers(2) else i2
        cur = fp
        for _ in range(self.max_kicks):
            s = int(self._rng.integers(self.slots))
            cur, self.table[i, s] = int(self.table[i, s]), cur
            i = int((np.uint64(i) ^ (np.uint64(cur) * np.uint64(0x5BD1E995))) & self._mask)
            row = self.table[i]
            empty = np.flatnonzero(row == 0)
            if len(empty):
                row[empty[0]] = cur
                self.count += 1
                return
        raise RuntimeError("cuckoo filter full — grow capacity or add shards")
