"""Host-aware frontier scheduler — the distributed replacement for the
reference's ``urls_to_visit`` set + politeness gate.

Reference semantics replaced (file:line into /root/reference/kryptone):
- ``urls_to_visit.pop()`` — arbitrary set order (base.py:1080) → the
  DOCUMENTED deterministic tie-break: priority = (depth at first
  discovery, url lexicographic)  (SURVEY.md §4).
- politeness busy-wait ``next_execution_date`` (base.py:1075-1078,
  1185-1194; WAIT_TIME=25 conf/base.py:30) → a VIRTUAL clock advancing
  ``wait_time`` per released batch; optional ``host_delay`` serializes
  same-host fetches (at most one URL per host per batch, host eligible
  again when clock >= next_ok[host]).
- the batch-of-k-then-barrier shape mirrors ``boost_start``
  (base.py:1281-1469).

Scale design: per-host heaps with out-of-core spill — when a host's heap
exceeds ``spill_threshold`` the WORST half (largest (depth, url)) is
written to sorted Parquet "generations" under ``spill_dir`` and reloaded
only when the in-memory head drains; the frontier is thus RAM-bounded by
(hosts × threshold), not by total frontier size (SURVEY.md §4 "memory
pressure"). One scheduler actor suffices per ~10^8 frontier URLs; the
engine can run several, sharded by host hash, since all operations are
keyed by host (hot hosts stay in one shard — politeness serializes them
anyway, so a hot host is throughput-bounded by the clock, not the actor).
"""

from __future__ import annotations

import heapq
import pathlib
import uuid

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import ray


class FrontierSchedulerLocal:
    def __init__(
        self,
        batch_size: int = 1,
        wait_time: float = 25.0,
        host_delay: float = 0.0,
        spill_dir: str | None = None,
        spill_threshold: int = 100_000,
        delay_fn=None,
    ):
        self.batch_size = batch_size
        self.wait_time = wait_time
        self.host_delay = host_delay
        # optional per-host politeness delay (robots Crawl-delay override);
        # politeness is active when either knob is configured
        self.delay_fn = delay_fn
        self._delay_cache: dict[str, float] = {}
        self.spill_dir = pathlib.Path(spill_dir) if spill_dir else None
        self.spill_threshold = spill_threshold
        self.heaps: dict[str, list[tuple[int, str]]] = {}
        self.spilled: dict[str, list[str]] = {}  # host → spill files
        self.spilled_counts: dict[str, int] = {}
        self.spilled_min: dict[str, tuple[int, str]] = {}  # best spilled entry
        self.next_ok: dict[str, float] = {}
        self.clock = 0.0
        self.visit_counter = 0
        self.batch_counter = 0
        self.total = 0
        # speculative-window journals (engine/crawl.py multi-window
        # politeness dispatch): _journal records pop_batch windows when
        # this instance is the driver-local scheduler; _commit_journal
        # records commit_batch windows when this instance is a shard
        # actor under ShardedFrontierScheduler. Either enables exact
        # rollback of heaps/next_ok/total for not-yet-committed windows.
        self._journal: list[dict] | None = None
        self._commit_journal: dict[int, dict] | None = None

    # --- ingestion ----------------------------------------------------
    def add(self, urls: list[str], hosts: list[str], depths) -> int:
        """Enqueue already-deduplicated frontier URLs (the seen anti-join
        guarantees first-time); returns the new frontier size.

        Bulk adds (the per-window enqueue — part of the driver's serial
        residue between politeness windows) group by host first and use
        one O(n) extend+heapify per host instead of n O(log n)
        heappushes."""
        n = len(urls)
        if n > 256:
            by_host: dict[str, list[tuple[int, str]]] = {}
            for url, host, depth in zip(urls, hosts, depths):
                by_host.setdefault(host, []).append((int(depth), url))
            for host, items in by_host.items():
                heap = self.heaps.setdefault(host, [])
                heap.extend(items)
                heapq.heapify(heap)
                self.total += len(items)
                # _spill halves the heap — LOOP until the documented RAM
                # bound holds (a single 1M-url wave for one host would
                # otherwise leave 500k entries in memory)
                while (self.spill_dir is not None
                       and len(self.heaps[host]) > self.spill_threshold):
                    self._spill(host)
            return self.total
        for url, host, depth in zip(urls, hosts, depths):
            heap = self.heaps.setdefault(host, [])
            heapq.heappush(heap, (int(depth), url))
            self.total += 1
            if self.spill_dir is not None and len(heap) > self.spill_threshold:
                self._spill(host)
        return self.total

    def _spill(self, host: str) -> None:
        """Write the worst half of a host heap to sorted Parquet."""
        heap = self.heaps[host]
        heap.sort()
        keep = len(heap) // 2
        tail = heap[keep:]
        self.heaps[host] = heap[:keep]
        heapq.heapify(self.heaps[host])
        self.spill_dir.mkdir(parents=True, exist_ok=True)
        fname = self.spill_dir / f"gen-{host}-{uuid.uuid4().hex}.parquet"
        t = pa.table(
            {
                "depth": pa.array([d for d, _ in tail], type=pa.int32()),
                "url": pa.array([u for _, u in tail], type=pa.string()),
            }
        )
        pq.write_table(t, fname)
        self.spilled.setdefault(host, []).append(str(fname))
        self.spilled_counts[host] = self.spilled_counts.get(host, 0) + len(tail)
        cur_min = self.spilled_min.get(host)
        if cur_min is None or tail[0] < cur_min:
            self.spilled_min[host] = tail[0]

    def _unspill(self, host: str, keep_at_least: int = 0) -> None:
        """Merge spilled generations with the in-memory heap; keep the best
        entries in memory (at least ``keep_at_least`` of them) and re-spill
        the tail as one compacted generation."""
        files = self.spilled.pop(host, [])
        if not files:
            return
        entries: list[tuple[int, str]] = list(self.heaps.get(host, []))
        for f in files:
            t = pq.read_table(f)
            entries.extend(zip(t["depth"].to_pylist(), t["url"].to_pylist()))
            pathlib.Path(f).unlink()
        self.spilled_counts.pop(host, None)
        self.spilled_min.pop(host, None)
        entries.sort()
        if len(entries) > max(self.spill_threshold, keep_at_least):
            keep = max(1, self.spill_threshold // 2, keep_at_least)
            self.heaps[host] = entries[:keep]
            heapq.heapify(self.heaps[host])
            # re-spill the remainder as one generation
            tail = entries[keep:]
            fname = self.spill_dir / f"gen-{host}-{uuid.uuid4().hex}.parquet"
            t = pa.table(
                {
                    "depth": pa.array([d for d, _ in tail], type=pa.int32()),
                    "url": pa.array([u for _, u in tail], type=pa.string()),
                }
            )
            pq.write_table(t, fname)
            self.spilled[host] = [str(fname)]
            self.spilled_counts[host] = len(tail)
            self.spilled_min[host] = tail[0]
        else:
            self.heaps[host] = entries
            heapq.heapify(self.heaps[host])

    def _delay_of(self, host: str) -> float:
        if self.delay_fn is None:
            return self.host_delay
        d = self._delay_cache.get(host)
        if d is None:
            d = self.delay_fn(host)
            d = self.host_delay if d is None else d
            self._delay_cache[host] = d
        return d

    def _host_head(self, host: str):
        heap = self.heaps.get(host)
        smin = self.spilled_min.get(host)
        if smin is not None and (not heap or heap[0] > smin):
            self._unspill(host)
            heap = self.heaps.get(host)
        elif not heap and (host in self.spilled):
            self._unspill(host)
            heap = self.heaps.get(host)
        return heap[0] if heap else None

    # --- release ------------------------------------------------------
    def pop_batch(self, limit: int | None = None):
        """Release the next politeness window.

        Returns (urls, depths, visit_indices, virtual_ts, batch_index) —
        empty lists when the frontier is exhausted. Selection rule is
        identical to GoldenSimulator.run: among eligible hosts take the k
        best heads by (depth, url), one per host when host_delay > 0.

        ``limit`` caps the window below ``batch_size`` (max_pages
        headroom): selection is sequential-greedy in every path, so a
        smaller k yields exactly the prefix of the larger window — the
        engine never over-pops and then rolls back counters.
        """
        k = self.batch_size if limit is None else min(self.batch_size, limit)
        # drop empty hosts
        for h in [h for h, hp in self.heaps.items() if not hp]:
            if h in self.spilled:
                self._unspill(h)
            if not self.heaps.get(h):
                self.heaps.pop(h, None)

        if self.total <= 0 or not self.heaps:
            return [], [], [], self.clock, self.batch_counter

        jrec = None
        if self._journal is not None:
            # speculative pop: journal enough to undo this window exactly
            # (entries back into heaps, next_ok restored, counters/clock
            # rewound) plus the per-host selections the engine's
            # violation check compares additions against.
            jrec = {"popped": {}, "prev_next_ok": {}, "sel": {},
                    "clock_before": self.clock, "n": 0, "k": k}

        if self.host_delay > 0 or self.delay_fn is not None:
            eligible = [h for h in self.heaps if self.next_ok.get(h, 0.0) <= self.clock]
            if not eligible:
                if jrec is not None:
                    # the clock-advance branch depends on WHICH hosts are
                    # non-empty, which frontier additions can change — the
                    # engine's speculation guard (delay <= wait_time, no
                    # delay_fn) makes this unreachable; fail loud if not.
                    raise RuntimeError(
                        "speculative pop reached the clock-advance branch")
                self.clock = max(
                    self.clock, min(self.next_ok.get(h, 0.0) for h in self.heaps)
                )
                eligible = [
                    h for h in self.heaps if self.next_ok.get(h, 0.0) <= self.clock
                ]
            # k-way merge over host heads; at most one URL per batch for
            # hosts with a positive delay (GoldenSimulator.run rule)
            heads = []
            for h in eligible:
                head = self._host_head(h)
                if head is not None:
                    heads.append((head[0], head[1], h))
            heapq.heapify(heads)
            batch = []
            gated_chosen: set[str] = set()
            while heads and len(batch) < k:
                depth, url, h = heapq.heappop(heads)
                if h in gated_chosen:
                    continue  # gated host: rest of its urls wait
                heapq.heappop(self.heaps[h])
                batch.append((depth, url))
                if jrec is not None:
                    jrec["popped"].setdefault(h, []).append((depth, url))
                    jrec["sel"].setdefault(h, (depth, url))
                d = self._delay_of(h)
                if d > 0:
                    gated_chosen.add(h)
                    if jrec is not None and h not in jrec["prev_next_ok"]:
                        jrec["prev_next_ok"][h] = self.next_ok.get(h, 0.0)
                    self.next_ok[h] = self.clock + d
                else:
                    nxt = self._host_head(h)
                    if nxt is not None:
                        heapq.heappush(heads, (nxt[0], nxt[1], h))
        elif jrec is not None:
            raise RuntimeError(
                "speculative pop requires politeness gating (host_delay > 0)")
        elif k >= self.total:
            # whole-frontier wave (politeness off): one vectorized sort
            # instead of O(total) heap pops
            depths_all: list[int] = []
            urls_all: list[str] = []
            for h in list(self.heaps):
                heap = self.heaps.pop(h)
                for d, u in heap:
                    depths_all.append(d)
                    urls_all.append(u)
                for f in self.spilled.pop(h, []):
                    t = pq.read_table(f)
                    depths_all.extend(t["depth"].to_pylist())
                    urls_all.extend(t["url"].to_pylist())
                    pathlib.Path(f).unlink()
                self.spilled_counts.pop(h, None)
                self.spilled_min.pop(h, None)
            u_arr = np.asarray(urls_all, dtype=object)
            d_arr = np.asarray(depths_all, dtype=np.int64)
            order = np.lexsort((u_arr, d_arr))
            batch = [(int(d_arr[i]), u_arr[i]) for i in order]
        else:
            # k globally-best entries across all hosts
            heads = []
            for h in list(self.heaps):
                head = self._host_head(h)
                if head is not None:
                    heads.append((head[0], head[1], h))
            heapq.heapify(heads)
            batch = []
            while heads and len(batch) < k:
                depth, url, h = heapq.heappop(heads)
                heapq.heappop(self.heaps[h])
                batch.append((depth, url))
                nxt = self._host_head(h)
                if nxt is not None:
                    heapq.heappush(heads, (nxt[0], nxt[1], h))

        urls = [u for _, u in batch]
        depths = [d for d, _ in batch]
        ts = self.clock
        idxs = list(range(self.visit_counter, self.visit_counter + len(batch)))
        self.visit_counter += len(batch)
        self.total -= len(batch)
        bidx = self.batch_counter
        self.batch_counter += 1
        self.clock += self.wait_time
        if jrec is not None:
            jrec["n"] = len(batch)
            self._journal.append(jrec)
        return urls, depths, idxs, ts, bidx

    # --- speculative windows (engine/crawl.py multi-window politeness
    # dispatch). begin_windows() arms the journal; every subsequent
    # pop_batch is speculative until end_windows(). rollback_windows(keep)
    # exactly undoes all journaled windows after the first ``keep``:
    # popped entries rejoin their host heaps, next_ok reverts to its
    # pre-window value (earliest wins across multiple rolled windows —
    # journals are replayed newest-first), clock/visit/batch counters
    # rewind. window_selections() exposes the per-window {host:
    # (depth, url)} maps the engine validates frontier additions against.
    def begin_windows(self) -> None:
        assert self._journal is None, "speculation already active"
        self._journal = []

    def end_windows(self) -> None:
        self._journal = None

    def window_selections(self) -> list[dict]:
        return [{"sel": r["sel"], "n": r["n"], "k": r["k"]}
                for r in (self._journal or [])]

    def rollback_windows(self, keep: int) -> None:
        recs = self._journal[keep:]
        for rec in reversed(recs):
            for h, items in rec["popped"].items():
                heap = self.heaps.setdefault(h, [])
                for e in items:
                    heapq.heappush(heap, e)
                self.total += len(items)
            self.next_ok.update(rec["prev_next_ok"])
            self.clock = rec["clock_before"]
            self.visit_counter -= rec["n"]
            self.batch_counter -= 1
        del self._journal[keep:]

    # shard-side twins: under ShardedFrontierScheduler the coordinator
    # owns clock/counters and journals window ordinals; each shard
    # journals only its own committed entries + next_ok prev values.
    def begin_commit_journal(self) -> None:
        self._commit_journal = {}

    def end_commit_journal(self) -> None:
        self._commit_journal = None

    def rollback_commits(self, keep_ord: int) -> None:
        for o in sorted((o for o in self._commit_journal if o >= keep_ord),
                        reverse=True):
            rec = self._commit_journal.pop(o)
            for h, items in rec["popped"].items():
                heap = self.heaps.setdefault(h, [])
                for e in items:
                    heapq.heappush(heap, e)
                self.total += len(items)
            self.next_ok.update(rec["prev_next_ok"])

    # --- sharded operation (peek/commit two-phase pop) ----------------
    # Host-hash sharding puts every host's queue wholly inside one shard,
    # so politeness gating never crosses shards; a global pop is: each
    # shard PEEKs its best ≤k candidates under its own gating, the
    # coordinator merges by (depth, url) and COMMITs the chosen subset
    # back to its shard. Exactness: a shard's top-k under the gating rule
    # is a superset of the global batch's slice from that shard.

    def peek_batch(self, k: int, clock: float):
        """Return (candidates, min_next_ok, total): up to k best
        (depth, url, host) triples eligible at ``clock`` — NO mutation
        beyond spill compaction."""
        for h in [h for h, hp in self.heaps.items() if not hp]:
            if h in self.spilled:
                self._unspill(h)
            if not self.heaps.get(h):
                self.heaps.pop(h, None)
        if not self.heaps:
            return [], None, self.total

        politeness = self.host_delay > 0 or self.delay_fn is not None
        if politeness:
            hosts = [h for h in self.heaps if self.next_ok.get(h, 0.0) <= clock]
            min_next = min(
                (self.next_ok.get(h, 0.0) for h in self.heaps), default=None
            )
        else:
            hosts = list(self.heaps)
            min_next = 0.0

        cands: list[tuple[int, str, str]] = []
        for h in hosts:
            if self._host_head(h) is None:
                continue
            heap = self.heaps[h]
            if politeness and self._delay_of(h) > 0:
                d, u = heap[0]
                cands.append((d, u, h))
            else:
                if h in self.spilled:
                    smin = self.spilled_min.get(h)
                    need = (
                        len(heap) < k
                        or (smin is not None
                            and smin < heapq.nsmallest(k, heap)[-1])
                    )
                    if need:
                        self._unspill(h, keep_at_least=k)
                        heap = self.heaps[h]
                for d, u in heapq.nsmallest(k, heap):
                    cands.append((d, u, h))
        cands.sort()
        return cands[:k], min_next, self.total

    def commit_batch(self, entries: list[tuple[int, str, str]], clock: float,
                     window_ord: int | None = None) -> None:
        """Pop the chosen (depth, url, host) entries (they are each
        host's current smallest prefix) and apply politeness delays.
        ``window_ord`` tags the commit in the speculative journal when
        the coordinator is running a multi-window dispatch."""
        jrec = None
        if self._commit_journal is not None and window_ord is not None:
            jrec = self._commit_journal.setdefault(
                window_ord, {"popped": {}, "prev_next_ok": {}})
        by_host: dict[str, list[tuple[int, str]]] = {}
        for d, u, h in entries:
            by_host.setdefault(h, []).append((d, u))
        for h, items in by_host.items():
            heap = self.heaps[h]
            items.sort()
            for d, u in items:
                head = heapq.heappop(heap)
                assert head == (d, u), f"commit mismatch on {h}: {head} != {(d, u)}"
            if jrec is not None:
                jrec["popped"].setdefault(h, []).extend(items)
            delay = self._delay_of(h)
            if delay > 0:
                if jrec is not None and h not in jrec["prev_next_ok"]:
                    jrec["prev_next_ok"][h] = self.next_ok.get(h, 0.0)
                self.next_ok[h] = clock + delay
        self.total -= len(entries)

    # --- introspection / checkpoint -----------------------------------
    def size(self) -> int:
        return self.total

    def state_table(self) -> pa.Table:
        """Full frontier (memory + spill) as Arrow — checkpoint source."""
        depths, urls = [], []
        for h, heap in self.heaps.items():
            for d, u in heap:
                depths.append(d)
                urls.append(u)
        for h, files in self.spilled.items():
            for f in files:
                t = pq.read_table(f)
                depths.extend(t["depth"].to_pylist())
                urls.extend(t["url"].to_pylist())
        return pa.table(
            {
                "depth": pa.array(depths, type=pa.int32()),
                "url": pa.array(urls, type=pa.string()),
            }
        )

    def clock_state(self) -> dict:
        return {
            "clock": self.clock,
            "visit_counter": self.visit_counter,
            "batch_counter": self.batch_counter,
            "next_ok": dict(self.next_ok),
        }

    def restore_clock(self, state: dict) -> None:
        self.clock = state["clock"]
        self.visit_counter = state["visit_counter"]
        self.batch_counter = state["batch_counter"]
        self.next_ok = dict(state["next_ok"])


FrontierScheduler = ray.remote(FrontierSchedulerLocal)


class ShardedFrontierScheduler:
    """Host-hash-sharded frontier over ``num_shards`` FrontierScheduler
    actors — the distributed form of the per-host priority queue (north
    rule "host-bucketed politeness scheduling ... explicit hash
    partitioning on host"). The driver-side coordinator owns the virtual
    clock and visit counter; pops are two-phase (peek → merge → commit,
    see FrontierSchedulerLocal.peek_batch). Exposes the same interface
    as FrontierSchedulerLocal, so RayCrawler can swap it in unchanged.

    Politeness gating is per host and hosts never span shards, so the
    merged outcome is bit-identical to the single scheduler (asserted by
    tests/test_sharded_scheduler.py against the local implementation).
    """

    def __init__(self, num_shards: int = 4, batch_size: int = 1,
                 wait_time: float = 25.0, host_delay: float = 0.0,
                 spill_dir: str | None = None, spill_threshold: int = 100_000,
                 delay_fn=None):
        from kryptone_ray.utils.xxh64 import xxh64

        self._hash = xxh64
        self.num_shards = num_shards
        self.batch_size = batch_size
        self.wait_time = wait_time
        self.shards = [
            FrontierScheduler.remote(
                batch_size=batch_size, wait_time=wait_time, host_delay=host_delay,
                spill_dir=(f"{spill_dir}/shard-{i}" if spill_dir else None),
                spill_threshold=spill_threshold, delay_fn=delay_fn,
            )
            for i in range(num_shards)
        ]
        self.clock = 0.0
        self.visit_counter = 0
        self.batch_counter = 0
        self._journal: list[dict] | None = None

    def _shard_of(self, host: str) -> int:
        return self._hash(host) % self.num_shards

    def add(self, urls, hosts, depths) -> int:
        """Shard-bucketed enqueue. Host hashing runs through the
        VECTORIZED xxh64 batch kernel (the scalar pure-Python hash per
        host was a measurable slice of the per-window driver serial
        residue), and per-shard sublists are cut with numpy index
        arrays."""
        from kryptone_ray.utils.xxh64 import xxh64_batch

        if not urls:
            return self.size()
        shard_of = xxh64_batch(hosts) % np.uint64(self.num_shards)
        u_arr = np.asarray(urls, dtype=object)
        h_arr = np.asarray(hosts, dtype=object)
        d_arr = np.asarray(depths, dtype=np.int64)
        refs = []
        for s in range(self.num_shards):
            idx = np.flatnonzero(shard_of == np.uint64(s))
            if len(idx) == 0:
                continue
            refs.append(self.shards[s].add.remote(
                u_arr[idx].tolist(), h_arr[idx].tolist(), d_arr[idx].tolist()))
        ray.get(refs)
        return self.size()

    def pop_batch(self, limit: int | None = None):
        k = self.batch_size if limit is None else min(self.batch_size, limit)
        peeks = ray.get(
            [sh.peek_batch.remote(k, self.clock) for sh in self.shards]
        )
        total = sum(p[2] for p in peeks)
        cands = sorted(c for p in peeks for c in p[0])
        if not cands and total > 0:
            if self._journal is not None:
                # see FrontierSchedulerLocal.pop_batch: additions can
                # change the advance amount — unreachable under the
                # engine's speculation guard
                raise RuntimeError(
                    "speculative pop reached the clock-advance branch")
            next_oks = [p[1] for p in peeks if p[1] is not None and p[2] > 0]
            if next_oks:
                self.clock = max(self.clock, min(next_oks))
                peeks = ray.get(
                    [sh.peek_batch.remote(k, self.clock) for sh in self.shards]
                )
                cands = sorted(c for p in peeks for c in p[0])
        if not cands:
            return [], [], [], self.clock, self.batch_counter
        chosen = cands[:k]
        window_ord = len(self._journal) if self._journal is not None else None
        by_shard: dict[int, list] = {}
        for d, u, h in chosen:
            by_shard.setdefault(self._shard_of(h), []).append((d, u, h))
        ray.get(
            [
                self.shards[s].commit_batch.remote(entries, self.clock,
                                                   window_ord)
                for s, entries in by_shard.items()
            ]
        )
        urls = [u for _, u, _ in chosen]
        depths = [d for d, _, _ in chosen]
        ts = self.clock
        idxs = list(range(self.visit_counter, self.visit_counter + len(chosen)))
        self.visit_counter += len(chosen)
        bidx = self.batch_counter
        self.batch_counter += 1
        self.clock += self.wait_time
        if self._journal is not None:
            sel: dict[str, tuple[int, str]] = {}
            for d, u, h in chosen:
                if h not in sel:
                    sel[h] = (d, u)
            self._journal.append(
                {"sel": sel, "n": len(chosen), "k": k,
                 "clock_before": ts})
            # NB ts == clock value this window was popped at
        return urls, depths, idxs, ts, bidx

    # --- speculative windows (coordinator side; see the local twin) ----
    def begin_windows(self) -> None:
        assert self._journal is None, "speculation already active"
        self._journal = []
        ray.get([sh.begin_commit_journal.remote() for sh in self.shards])

    def end_windows(self) -> None:
        self._journal = None
        ray.get([sh.end_commit_journal.remote() for sh in self.shards])

    def window_selections(self) -> list[dict]:
        return [{"sel": r["sel"], "n": r["n"], "k": r["k"]}
                for r in (self._journal or [])]

    def rollback_windows(self, keep: int) -> None:
        recs = self._journal[keep:]
        ray.get([sh.rollback_commits.remote(keep) for sh in self.shards])
        for rec in reversed(recs):
            self.clock = rec["clock_before"]
            self.visit_counter -= rec["n"]
            self.batch_counter -= 1
        del self._journal[keep:]

    def size(self) -> int:
        return sum(ray.get([sh.size.remote() for sh in self.shards]))

    def state_table(self) -> pa.Table:
        tables = ray.get([sh.state_table.remote() for sh in self.shards])
        return pa.concat_tables(tables)

    def clock_state(self) -> dict:
        shard_states = ray.get([sh.clock_state.remote() for sh in self.shards])
        next_ok: dict[str, float] = {}
        for st in shard_states:
            next_ok.update(st["next_ok"])
        return {
            "clock": self.clock,
            "visit_counter": self.visit_counter,
            "batch_counter": self.batch_counter,
            "next_ok": next_ok,
        }

    def restore_clock(self, state: dict) -> None:
        self.clock = state["clock"]
        self.visit_counter = state["visit_counter"]
        self.batch_counter = state["batch_counter"]
        # scatter next_ok back to the owning shards
        buckets: dict[int, dict[str, float]] = {}
        for host, t in state["next_ok"].items():
            buckets.setdefault(self._shard_of(host), {})[host] = t
        refs = []
        for s, m in buckets.items():
            refs.append(
                self.shards[s].restore_clock.remote(
                    {"clock": state["clock"], "visit_counter": 0,
                     "batch_counter": 0, "next_ok": m}
                )
            )
        if refs:
            ray.get(refs)
