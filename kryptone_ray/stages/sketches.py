"""Mergeable quantile sketch (KLL-style) for unbounded value domains.

``relational.q_acctbal_quantiles`` gets EXACT quantiles by exploiting a
bounded fixed-point domain; this sketch is the scale path when values
are arbitrary floats (latencies, scores, money in unknown ranges): a
hierarchy of fixed-size buffers where an overflowing level sorts
itself and promotes every other element (weight doubles per level) —
per-batch partials serialize to bytes, merge associatively by buffer
concatenation + re-compaction, and the merged sketch answers any
quantile with rank error ~O(1/k). Compaction parity is DETERMINISTIC
(per-level alternating counter instead of a random coin), so the same
input in the same block layout reproduces the same sketch —
golden-pinnable, at the cost of adversarial-input error guarantees the
randomized variant has (documented trade; fine for telemetry-shaped
data).

Reference capability analog: Performance's percentile-style reporting
(base.py:199-250) at a scale where exact sorting is off the table.
"""

from __future__ import annotations

import pickle

import numpy as np

K_DEFAULT = 256


class KllSketch:
    """Levels of float64 buffers; level i elements carry weight 2^i."""

    def __init__(self, k: int = K_DEFAULT):
        self.k = int(k)
        self.levels: list[np.ndarray] = [np.empty(0, dtype=np.float64)]
        self.parity: list[int] = [0]
        self.n = 0

    def add(self, values: np.ndarray) -> "KllSketch":
        v = np.asarray(values, dtype=np.float64)
        v = v[~np.isnan(v)]
        self.n += len(v)
        self.levels[0] = np.concatenate([self.levels[0], v])
        self._compact()
        return self

    def _compact(self) -> None:
        lvl = 0
        while lvl < len(self.levels):
            if len(self.levels[lvl]) > self.k:
                buf = np.sort(self.levels[lvl], kind="stable")
                off = self.parity[lvl]
                self.parity[lvl] ^= 1
                promoted = buf[off::2]
                self.levels[lvl] = np.empty(0, dtype=np.float64)
                if lvl + 1 == len(self.levels):
                    self.levels.append(np.empty(0, dtype=np.float64))
                    self.parity.append(0)
                self.levels[lvl + 1] = np.concatenate(
                    [self.levels[lvl + 1], promoted])
            lvl += 1

    def merge(self, other: "KllSketch") -> "KllSketch":
        self.n += other.n
        for i, buf in enumerate(other.levels):
            if i == len(self.levels):
                self.levels.append(np.empty(0, dtype=np.float64))
                self.parity.append(0)
            self.levels[i] = np.concatenate([self.levels[i], buf])
        self._compact()
        return self

    def quantile(self, q: float) -> float:
        vals, wts = [], []
        for i, buf in enumerate(self.levels):
            if len(buf):
                vals.append(buf)
                wts.append(np.full(len(buf), 1 << i, dtype=np.int64))
        if not vals:
            return float("nan")
        v = np.concatenate(vals)
        w = np.concatenate(wts)
        order = np.argsort(v, kind="stable")
        v, w = v[order], w[order]
        cum = np.cumsum(w)
        target = q * cum[-1]
        return float(v[np.searchsorted(cum, target, "left")])

    def to_bytes(self) -> bytes:
        return pickle.dumps(
            {"k": self.k, "n": self.n, "parity": self.parity,
             "levels": [b.tobytes() for b in self.levels]})

    @classmethod
    def from_bytes(cls, blob: bytes) -> "KllSketch":
        d = pickle.loads(blob)
        s = cls(d["k"])
        s.n = d["n"]
        s.parity = list(d["parity"])
        s.levels = [np.frombuffer(b, dtype=np.float64).copy()
                    for b in d["levels"]]
        return s


class CountMinSketch:
    """Mergeable Count-Min sketch for heavy-hitter estimation over
    unbounded key domains (the approximate sibling of the exact
    ``events.q_events_topk_users`` top-k, the way ``KllSketch`` sits
    beside the exact bounded-cents quantiles): ``depth`` hash rows ×
    ``width`` counters, estimate = min over rows — never an
    UNDER-estimate, over-estimates bounded by n/width per row.

    Hashing is vectorized multiplicative (odd uint64 multipliers from a
    fixed seed, natural mod-2^64 wraparound, high bits taken) — no
    per-key Python, deterministic across runs/processes/partitionings.
    Merging is elementwise counter addition (exact associativity, not
    just approximate — pytest-verified)."""

    def __init__(self, width: int = 2048, depth: int = 4, seed: int = 7):
        self.width = int(width)
        self.depth = int(depth)
        self.seed = int(seed)
        rng = np.random.default_rng(seed)
        self.mult = (rng.integers(1, 2 ** 62, size=depth).astype(np.uint64)
                     << np.uint64(1)) | np.uint64(1)
        self.counts = np.zeros((depth, width), dtype=np.int64)
        self.n = 0

    def _rows_idx(self, keys: np.ndarray) -> np.ndarray:
        k = keys.astype(np.uint64, copy=False)
        return np.stack([((k * m) >> np.uint64(17)) % np.uint64(self.width)
                         for m in self.mult])

    def add(self, keys: np.ndarray) -> "CountMinSketch":
        idx = self._rows_idx(np.asarray(keys))
        for r in range(self.depth):
            np.add.at(self.counts[r], idx[r], 1)
        self.n += idx.shape[1]
        return self

    def estimate(self, keys: np.ndarray) -> np.ndarray:
        idx = self._rows_idx(np.asarray(keys))
        return np.min(
            np.stack([self.counts[r][idx[r]] for r in range(self.depth)]),
            axis=0)

    def merge(self, other: "CountMinSketch") -> "CountMinSketch":
        assert (self.width, self.depth, self.seed) == \
            (other.width, other.depth, other.seed), "incompatible sketches"
        self.counts += other.counts
        self.n += other.n
        return self

    def to_bytes(self) -> bytes:
        return pickle.dumps(
            {"w": self.width, "d": self.depth, "s": self.seed,
             "n": self.n, "c": self.counts})

    @classmethod
    def from_bytes(cls, blob: bytes) -> "CountMinSketch":
        st = pickle.loads(blob)
        sk = cls(width=st["w"], depth=st["d"], seed=st["s"])
        sk.counts = st["c"]
        sk.n = st["n"]
        return sk
