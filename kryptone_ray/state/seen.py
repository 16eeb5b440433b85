"""Sharded URL-seen set — the distributed replacement for the reference's
process-global ``list_of_seen_urls`` (/root/reference/kryptone/base.py:295,
updated at base.py:744-745).

``SeenShard`` actors are keyed by ``url_hash = xxh64(canonical_url)``;
shard = ``url_hash % num_shards``. Each shard holds a cuckoo filter (the
at-scale membership structure) plus an exact uint64 hash set (authoritative;
~8 B/key in-python — at 10^10 keys only the filter + the Parquet snapshots
remain authoritative, mode='cuckoo').

``check_and_add`` is the frontier anti-join: it reports which hashes were
UNSEEN before the call and marks every input hash seen — the batched,
order-free equivalent of check_urls steps 10/11 + the seen-set union
(order-free because within one validation pass the reference's updates are
idempotent set unions; see stages/validate.py docstring).

Snapshots: each shard dumps (url_hash, url) sorted by url to Parquet; the
union of shard snapshots sorted lexicographically reproduces the
reference's ``seen_urls.csv`` contract (base.py:577-588, sort order
urls.py:110-113).
"""

from __future__ import annotations

import pathlib

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq
import ray

from kryptone_ray.state.cuckoo import CuckooFilter


class SeenShardLocal:
    """The shard logic, usable in-process (tests/simulator cross-checks)
    and wrapped as a Ray actor below."""

    def __init__(self, capacity: int = 1 << 22, mode: str = "exact",
                 delta_dir: str | None = None):
        assert mode in ("exact", "cuckoo")
        self.mode = mode
        # the filter backs the hot-path probe ONLY in cuckoo mode; exact
        # mode uses the hash set alone (inserting into a fixed-capacity
        # filter in exact mode would cap the shard needlessly)
        self.filter = CuckooFilter(capacity) if mode == "cuckoo" else None
        self.exact: set[int] = set()
        # exact mode keeps hash→url in memory (snapshot source at test
        # scale); cuckoo mode is MEMORY-BOUNDED: urls are appended to
        # delta parquet files under delta_dir instead (the authoritative
        # seen set at 10^10 keys lives on disk; the filter answers the
        # hot-path probe). SURVEY §4 "memory pressure".
        self.urls: dict[int, str] = {}
        self.delta_dir = pathlib.Path(delta_dir) if delta_dir else None
        if self.delta_dir is not None:
            self.delta_dir.mkdir(parents=True, exist_ok=True)
        self._delta_seq = 0

    def _record_urls(self, hashes: np.ndarray, urls: list[str]) -> None:
        if self.mode == "exact" or self.delta_dir is None:
            for k, u in zip(hashes, urls):
                self.urls[int(k)] = u
        if self.delta_dir is not None and len(urls):
            t = pa.table(
                {
                    "url_hash": pa.array(hashes, type=pa.uint64()),
                    "url": pa.array(urls, type=pa.string()),
                }
            )
            pq.write_table(t, self.delta_dir / f"delta-{self._delta_seq:08d}.parquet")
            self._delta_seq += 1

    def check_and_add(self, hashes: np.ndarray, urls: list[str] | None = None) -> np.ndarray:
        """Return is_new mask; then mark all inputs seen. Duplicates within
        the call: only the first occurrence is new."""
        h = hashes.astype(np.uint64, copy=False)
        if self.mode == "exact":
            is_new = np.fromiter(
                (int(x) not in self.exact for x in h), count=len(h), dtype=bool
            )
        else:
            is_new = ~self.filter.contains_batch(h)
        # first-occurrence-only within the batch
        _, first_idx = np.unique(h, return_index=True)
        first_mask = np.zeros(len(h), dtype=bool)
        first_mask[first_idx] = True
        is_new &= first_mask
        fresh = h[is_new]
        if len(fresh):
            if self.mode == "exact":
                self.exact.update(int(x) for x in fresh)
            else:
                self.filter.insert_batch(fresh)
            if urls is not None:
                idx = np.flatnonzero(is_new)
                self._record_urls(h[idx], [urls[i] for i in idx])
        return is_new

    def contains(self, hashes: np.ndarray) -> np.ndarray:
        h = hashes.astype(np.uint64, copy=False)
        if self.mode == "exact":
            return np.fromiter(
                (int(x) in self.exact for x in h), count=len(h), dtype=bool
            )
        return self.filter.contains_batch(h)

    def add_seen(self, hashes: np.ndarray, urls: list[str] | None = None) -> int:
        """Unconditionally mark ``hashes`` seen (driver-overlay push: the
        driver already did the anti-join; this just lands the authority
        and the snapshot urls in the shard)."""
        h = hashes.astype(np.uint64, copy=False)
        if self.mode == "exact":
            self.exact.update(int(x) for x in h)
        else:
            self.filter.insert_batch(h)
        if urls is not None:
            self._record_urls(h, urls)
        return len(h)

    # --- windowed (pipelined) ingest ----------------------------------
    # The exact, order-free frontier update for a politeness window
    # processed by concurrent slices: every slice streams its validated
    # rows in as it completes; the shard keeps, per NEW hash, the BEST
    # contributor (min (visit_iter, depth) — the documented tie-break,
    # identical to the sequential reference outcome; see
    # stages/expand.py). ``flush_window`` closes the window and returns
    # the deduplicated candidate entries to enqueue.

    def ingest_window(self, hashes: np.ndarray, urls: list[str],
                      hosts: list[str], depths: np.ndarray,
                      iters: np.ndarray, candidate: np.ndarray) -> int:
        h = hashes.astype(np.uint64, copy=False)
        if not hasattr(self, "_pending"):
            self._pending: dict[int, tuple] = {}
        pend = self._pending
        n_new = 0
        if self.mode == "exact":
            exact = self.exact
            for k in range(len(h)):
                key = int(h[k])
                cur = pend.get(key)
                if cur is not None:
                    cand = (int(iters[k]), int(depths[k]))
                    if cand < cur[:2]:
                        pend[key] = (cand[0], cand[1], bool(candidate[k]),
                                     urls[k], hosts[k])
                elif key not in exact:
                    pend[key] = (int(iters[k]), int(depths[k]),
                                 bool(candidate[k]), urls[k], hosts[k])
                    n_new += 1
        else:
            seen_mask = self.filter.contains_batch(h)
            for k in range(len(h)):
                key = int(h[k])
                cur = pend.get(key)
                if cur is not None:
                    cand = (int(iters[k]), int(depths[k]))
                    if cand < cur[:2]:
                        pend[key] = (cand[0], cand[1], bool(candidate[k]),
                                     urls[k], hosts[k])
                elif not seen_mask[k]:
                    pend[key] = (int(iters[k]), int(depths[k]),
                                 bool(candidate[k]), urls[k], hosts[k])
                    n_new += 1
        return n_new

    def flush_window(self) -> dict:
        """Commit pending entries as seen; return the candidate ones as
        {'url': [...], 'host': [...], 'depth': [...]} for the scheduler."""
        pend = getattr(self, "_pending", None)
        if not pend:
            self._pending = {}
            return {"url": [], "host": [], "depth": [],
                    "hash": np.empty(0, dtype=np.uint64)}
        keys = np.fromiter(pend.keys(), dtype=np.uint64, count=len(pend))
        if self.mode == "exact":
            self.exact.update(int(x) for x in keys)
        else:
            self.filter.insert_batch(keys)
        urls_out, hosts_out, depths_out = [], [], []
        all_urls = []
        for key, (it, depth, cand, url, host) in pend.items():
            all_urls.append(url)
            if cand:
                urls_out.append(url)
                hosts_out.append(host)
                depths_out.append(depth)
        self._record_urls(keys, all_urls)
        self._pending = {}
        # 'hash': every hash this window committed — the driver overlay's
        # mirror update (SeenSet.note_flushed) in mixed regimes
        return {"url": urls_out, "host": hosts_out, "depth": depths_out,
                "hash": keys}

    def size(self) -> int:
        return len(self.exact) if self.mode == "exact" else self.filter.count

    def _url_table(self) -> pa.Table:
        """hash→url pairs from memory (exact) or compacted deltas
        (cuckoo + delta_dir), deduplicated keep-first."""
        if self.mode == "exact" or self.delta_dir is None:
            return pa.table(
                {
                    "url_hash": pa.array(list(self.urls.keys()), type=pa.uint64()),
                    "url": pa.array(list(self.urls.values()), type=pa.string()),
                }
            )
        files = sorted(self.delta_dir.glob("delta-*.parquet"))
        if not files:
            return pa.table(
                {"url_hash": pa.array([], type=pa.uint64()),
                 "url": pa.array([], type=pa.string())}
            )
        t = pa.concat_tables([pq.read_table(f) for f in files]).combine_chunks()
        h = t["url_hash"].to_numpy()
        _, first = np.unique(h, return_index=True)
        first.sort()
        return t.take(pa.array(first))

    def snapshot_urls(self) -> list[str]:
        return self._url_table()["url"].to_pylist()

    # --- checkpoint ---------------------------------------------------
    def snapshot(self, path: str) -> int:
        t = self._url_table()
        t = t.take(pc.sort_indices(t["url"]))
        tmp = str(path) + ".tmp"
        pq.write_table(t, tmp)
        pathlib.Path(tmp).replace(path)
        return len(t)

    def restore(self, path: str) -> int:
        t = pq.read_table(path)
        h = t["url_hash"].to_numpy().astype(np.uint64)
        if self.mode == "exact":
            self.exact.update(int(x) for x in h)
        else:
            self.filter.insert_batch(h)
        if self.mode == "exact" or self.delta_dir is None:
            self.urls.update(zip((int(x) for x in h), t["url"].to_pylist()))
        else:
            # deltas written by the crashed run AFTER this snapshot hold
            # URLs that were rolled back (absent from the restored
            # filter) — purge the whole delta log before re-seeding it,
            # or they reappear as phantoms in _url_table()/snapshots and
            # new windows partially overwrite old files by sequence
            for f in self.delta_dir.glob("delta-*.parquet"):
                f.unlink()
            self._delta_seq = 0
            # re-seed the delta log so later snapshots include these
            pq.write_table(t, self.delta_dir / f"delta-{self._delta_seq:08d}.parquet")
            self._delta_seq += 1
        return len(t)


SeenShard = ray.remote(SeenShardLocal)


class SeenSet:
    """Driver-side handle over the shard actor pool.

    DRIVER OVERLAY (exact mode): the politeness regime routes ~98% of
    windows through the driver (small-window gate), and each window's
    anti-join + metrics ``size()`` paid a blocking actor round-trip —
    measured ~20 s of a 60k-page politeness crawl. In exact mode the
    driver keeps a COMPLETE hash mirror: ``check_and_add``/``contains``/
    ``size`` answer locally with zero RPCs; (hash, url) additions are
    buffered and pushed to the shard actors only when shard state must
    be authoritative — before a distributed window's in-actor ingest,
    before any snapshot, and before ``sorted_urls``. Distributed
    windows report their newly committed hashes back via
    ``flush_window``'s ``hash`` field (``note_flushed``), which keeps
    the mirror complete in mixed regimes. Cuckoo mode keeps the RPC
    path: its filter is the single approximate authority, and a 10^10-
    key driver mirror is exactly the memory blow-up cuckoo mode exists
    to avoid (at that scale the bulk regime never touches the driver
    path anyway)."""

    def __init__(self, num_shards: int = 4, capacity_per_shard: int = 1 << 22,
                 mode: str = "exact", delta_dir: str | None = None):
        self.num_shards = num_shards
        self.shards = [
            SeenShard.remote(
                capacity=capacity_per_shard, mode=mode,
                delta_dir=(f"{delta_dir}/shard-{i:03d}" if delta_dir else None),
            )
            for i in range(num_shards)
        ]
        self._overlay = mode == "exact"
        self._mirror: set[int] = set()
        # buffered driver-path additions not yet in the shard actors:
        # list of (hashes ndarray, urls list | None)
        self._push_buf: list[tuple[np.ndarray, list[str] | None]] = []

    def _split(self, hashes: np.ndarray):
        shard_of = hashes % np.uint64(self.num_shards)
        return shard_of

    def check_and_add(self, hashes: np.ndarray, urls: list[str] | None = None) -> np.ndarray:
        """Batched anti-join across shards; preserves input order."""
        h = hashes.astype(np.uint64, copy=False)
        if self._overlay:
            mirror = self._mirror
            is_new = np.fromiter(
                (int(x) not in mirror for x in h), count=len(h), dtype=bool
            )
            # first-occurrence-only within the batch
            _, first_idx = np.unique(h, return_index=True)
            first_mask = np.zeros(len(h), dtype=bool)
            first_mask[first_idx] = True
            is_new &= first_mask
            if is_new.any():
                idx = np.flatnonzero(is_new)
                fresh = h[idx]
                mirror.update(int(x) for x in fresh)
                self._push_buf.append(
                    (fresh, [urls[i] for i in idx] if urls is not None else None)
                )
            return is_new
        shard_of = self._split(h)
        out = np.zeros(len(h), dtype=bool)
        refs, idxs = [], []
        for s in range(self.num_shards):
            idx = np.flatnonzero(shard_of == np.uint64(s))
            if len(idx) == 0:
                continue
            sub_urls = [urls[i] for i in idx] if urls is not None else None
            refs.append(self.shards[s].check_and_add.remote(h[idx], sub_urls))
            idxs.append(idx)
        for idx, res in zip(idxs, ray.get(refs)):
            out[idx] = res
        return out

    def push_pending(self) -> None:
        """Ship buffered driver-path additions to the shard actors and
        WAIT — callers need cross-submitter visibility (a slice task's
        ``ingest_window`` must observe them). Rare by construction: once
        per distributed window / snapshot, not per window."""
        if not self._push_buf:
            return
        buf, self._push_buf = self._push_buf, []
        h = np.concatenate([b[0] for b in buf])
        have_urls = all(b[1] is not None for b in buf)
        urls: list[str] | None = None
        if have_urls:
            urls = [u for b in buf for u in b[1]]
        shard_of = self._split(h)
        refs = []
        for s in range(self.num_shards):
            idx = np.flatnonzero(shard_of == np.uint64(s))
            if len(idx) == 0:
                continue
            sub_urls = [urls[i] for i in idx] if urls is not None else None
            refs.append(self.shards[s].add_seen.remote(h[idx], sub_urls))
        ray.get(refs)

    def note_flushed(self, hashes) -> None:
        """Fold a distributed window's newly committed hashes (the
        ``hash`` field of ``flush_window``) into the driver mirror."""
        if self._overlay and len(hashes):
            self._mirror.update(int(x) for x in np.asarray(hashes))

    def contains(self, hashes: np.ndarray) -> np.ndarray:
        h = hashes.astype(np.uint64, copy=False)
        if self._overlay:
            mirror = self._mirror
            return np.fromiter(
                (int(x) in mirror for x in h), count=len(h), dtype=bool
            )
        shard_of = self._split(h)
        out = np.zeros(len(h), dtype=bool)
        refs, idxs = [], []
        for s in range(self.num_shards):
            idx = np.flatnonzero(shard_of == np.uint64(s))
            if len(idx) == 0:
                continue
            refs.append(self.shards[s].contains.remote(h[idx]))
            idxs.append(idx)
        for idx, res in zip(idxs, ray.get(refs)):
            out[idx] = res
        return out

    def size(self) -> int:
        if self._overlay:
            return len(self._mirror)
        return sum(ray.get([s.size.remote() for s in self.shards]))

    def snapshot(self, directory: str) -> int:
        return sum(ray.get(self.snapshot_async(directory)))

    def snapshot_async(self, directory: str) -> list:
        """Dispatch the per-shard snapshot tasks WITHOUT waiting and
        return their refs. Actor tasks from one submitter execute in
        submission order, so a snapshot submitted at a window boundary
        captures exactly the boundary state even if the caller then
        pipelines the next window's ``check_and_add`` calls behind it —
        the overlapped-checkpoint contract (engine/crawl.checkpoint).
        Buffered overlay additions are pushed first (synchronously), so
        the snapshot captures exactly the boundary state; driver
        ``check_and_add`` calls made after this return only buffer."""
        self.push_pending()
        d = pathlib.Path(directory)
        d.mkdir(parents=True, exist_ok=True)
        return [
            s.snapshot.remote(str(d / f"seen-{i:03d}.parquet"))
            for i, s in enumerate(self.shards)
        ]

    def restore(self, directory: str) -> int:
        d = pathlib.Path(directory)
        n = sum(
            ray.get(
                [
                    s.restore.remote(str(d / f"seen-{i:03d}.parquet"))
                    for i, s in enumerate(self.shards)
                ]
            )
        )
        if self._overlay:
            for f in sorted(d.glob("seen-*.parquet")):
                h = pq.read_table(f, columns=["url_hash"])["url_hash"].to_numpy()
                self._mirror.update(int(x) for x in h)
        return n

    def sorted_urls(self) -> list[str]:
        """All seen URLs in lexicographic order — reproduces the
        ``seen_urls.csv`` ordering contract (base.py:577-588)."""
        import itertools

        self.push_pending()
        all_urls = ray.get([s.snapshot_urls.remote() for s in self.shards])
        return sorted(itertools.chain.from_iterable(all_urls))
