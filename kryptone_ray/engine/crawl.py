"""The distributed crawl engine — the Ray-Data-native replacement for the
reference's ``SiteCrawler.start`` visit loop
(/root/reference/kryptone/base.py:1053-1211) and ``boost_start``
(base.py:1281-1469).

Per politeness window (batch): the scheduler releases the k best frontier
URLs → fetch (corpus take, actor pool) → decode/verify (actor pool) →
link expansion + vectorized validation → seen-shard anti-join → frontier
enqueue; visits / lineage / metrics append to Parquet logs each batch.

Two execution paths share the same stage functions:
- ``mode='ray'``  — a ``ray.data`` pipeline per batch:
  ``from_arrow(batch) → map_batches(FetchActor, concurrency=...) →
  map_batches(decode) → map_batches(expand+validate)``; the seen
  anti-join and scheduler updates run on the (metadata-sized) validated
  output. This is the at-scale path; per-batch pipeline overhead is
  amortized by large k (bench uses k ≥ 2048).
- ``mode='local'`` — the same functions called in-process; used by the
  golden-parity tests at k≤64 where a per-batch distributed pipeline
  would be all overhead. Results are bit-identical by construction.

Checkpoint/resume (reference contract: base.py:543-609 backup per page,
base.py:1213-1273 resume): every ``checkpoint_every`` batches the engine
atomically writes {frontier parquet, seen shard snapshots, scheduler
clock, counters} under ``run_dir/checkpoint``; visits/lineage logs are
append-only per batch, so a killed run resumes from the last manifest
WITHOUT re-fetching completed batches.
"""

from __future__ import annotations

import json
import os
import pathlib
import shutil

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

from kryptone_ray.corpus.store import CorpusReader
from kryptone_ray.sim.golden import CrawlSpec
from kryptone_ray.stages.expand import expand_and_validate
from kryptone_ray.stages.fetch import FetchActor, decode_table, fetch_table
from kryptone_ray.stages.validate import (
    CANDIDATE,
    ValidationConfig,
    validate_batch,
)
from kryptone_ray.state.scheduler import FrontierSchedulerLocal
from kryptone_ray.state.seen import SeenSet, SeenShardLocal


_READER_CACHE: dict[str, CorpusReader] = {}


class WindowHooks:
    """Picklable bundle of the IN-TASK lifecycle hooks (reference
    base.py:797-831), batch-wise: each receives the decoded page batch
    (Arrow table) instead of one URL per call — the documented
    batch-is-the-unit-of-work deviation (crawler.py module docstring).

    - ``post_navigation``: right after fetch+decode, BEFORE link
      expansion (reference: immediately after driver.get, cookie-banner
      territory — base.py:807-811,1116-1119).
    - ``page_actions``: after expansion/logging (current_page_actions,
      base.py:797-805,1129-1155).
    - ``after_data_save``: right after the items parquet lands
      (base.py:831, after storage save).
    """

    def __init__(self, page_actions=None, post_navigation=None,
                 after_data_save=None):
        self.page_actions = page_actions
        self.post_navigation = post_navigation
        self.after_data_save = after_data_save

    def __bool__(self):
        return any((self.page_actions, self.post_navigation,
                    self.after_data_save))


def _window_slice_stage(t: pa.Table, corpus_dir: str, outlinks_fn, vcfg,
                        nshards: int, run_dir: str,
                        shard_handles=None, hooks: WindowHooks | None = None,
                        crawl: bool = True) -> pa.Table:
    """The full per-slice window stage (fetch → decode → log → expand →
    validate) as a plain function — executed either by the map_batches
    pipeline (mode='ray') or by `ray.remote` tasks (mode='tasks'). The
    'tasks' mode exists because a NEW Dataset pipeline per politeness
    window costs ~1-2 s of executor startup/teardown regardless of work
    (measured in BASELINE.md) — an iterative bounded-window loop is the
    one shape the streaming executor cannot amortize. The batch bodies
    are identical Arrow-in/Arrow-out transforms either way."""
    import uuid as _uuid

    reader = _worker_reader(corpus_dir)
    fetched = fetch_table(reader, t)
    decoded = decode_table(fetched)
    if hooks is not None and hooks.post_navigation is not None:
        hooks.post_navigation(decoded)
    validated, lineage = expand_and_validate(decoded, outlinks_fn, vcfg, nshards,
                                             crawl=crawl)
    bidx = int(t["batch_idx"][0].as_py())
    tag = _uuid.uuid4().hex[:8]
    pq.write_table(decoded, f"{run_dir}/visits/batch-{bidx:08d}-{tag}.parquet")
    pq.write_table(lineage, f"{run_dir}/lineage/batch-{bidx:08d}-{tag}.parquet")
    if hooks is not None and hooks.page_actions is not None:
        items = hooks.page_actions(decoded)
        if items is not None and len(items):
            pq.write_table(items, f"{run_dir}/items/batch-{bidx:08d}-{tag}.parquet")
            if hooks.after_data_save is not None:
                hooks.after_data_save(items)
    if shard_handles is None:
        return validated
    # pipelined ingest: stream this slice's validated rows straight into
    # the seen shards (order-free and exact — the shards keep the best
    # (iter, depth) contributor per new url; see SeenShardLocal.ingest_window)
    import ray as _ray

    from kryptone_ray.stages.validate import CANDIDATE as _CAND

    h = validated["url_hash"].to_numpy().astype(np.uint64)
    if len(h) == 0:
        return _empty_validated()
    urls = validated["url"].to_pylist()
    hosts = validated["host"].to_pylist()
    depths = validated["depth"].to_numpy()
    iters = validated["min_iter"].to_numpy()
    import pyarrow.compute as _pc

    cand = _pc.equal(validated["verdict"], pa.scalar(_CAND)).to_numpy(
        zero_copy_only=False
    )
    shard_of = h % np.uint64(len(shard_handles))
    refs = []
    for s in range(len(shard_handles)):
        idx = np.flatnonzero(shard_of == np.uint64(s))
        if len(idx) == 0:
            continue
        refs.append(
            shard_handles[s].ingest_window.remote(
                h[idx], [urls[i] for i in idx], [hosts[i] for i in idx],
                depths[idx], iters[idx], cand[idx],
            )
        )
    _ray.get(refs)
    return _empty_validated()


def _worker_reader(corpus_dir: str) -> CorpusReader:
    """Per-worker-process corpus reader cache: ray worker processes are
    long-lived across batches, so footer parsing happens once per worker
    (the stateful-stage contract without paying actor-pool re-creation
    per politeness window)."""
    r = _READER_CACHE.get(corpus_dir)
    if r is None:
        # pin pyarrow's internal pools: each ray worker is a 1-CPU slot;
        # the default (one pool of size n_host_cores PER worker) makes
        # concurrent tasks thrash each other's parquet decodes
        pa.set_cpu_count(1)
        pa.set_io_thread_count(2)
        r = CorpusReader(corpus_dir)
        _READER_CACHE[corpus_dir] = r
    return r


def _env_flag_off(name: str) -> bool:
    """True when the env var explicitly disables a default-on feature
    ("0"/"off"/"false", case-insensitive); unset or anything else = on."""
    return os.environ.get(name, "").strip().lower() in ("0", "off", "false")


# scheduler_shards=None auto-selection: below SCHED_AUTO_MIN_CPUS the
# driver-local heap wins (actor RPC overhead > heap cost on small
# frontiers and small boxes); at or above it the host-hash-sharded
# actor scheduler removes the driver-serial frontier residue. Shard
# count stays modest — each shard is a tiny heap actor and the
# coordinator merges k heads per window, so more shards buy little
# past ~CPU/4 on one node (one per node at cluster scale).
SCHED_AUTO_MIN_CPUS = 16
SCHED_AUTO_SHARDS = 8


def _effective_cpu_count() -> int:
    """CPUs the crawl can actually schedule on: the Ray cluster's CPU
    resource when a session is live (the driver may have been inited
    with fewer CPUs than the box has — bench scaling runs). 0 when no
    session is up: auto-sharding must never be the thing that triggers
    a Ray auto-init (the sharded scheduler is actor-backed)."""
    try:
        import ray

        if ray.is_initialized():
            return int(ray.cluster_resources().get("CPU", 0)) or \
                (os.cpu_count() or 1)
    except Exception:
        pass
    return 0


def _empty_validated() -> pa.Table:
    return pa.table(
        {
            "url": pa.array([], type=pa.string()),
            "host": pa.array([], type=pa.string()),
            "url_hash": pa.array([], type=pa.uint64()),
            "verdict": pa.array([], type=pa.string()),
            "depth": pa.array([], type=pa.int32()),
            "min_iter": pa.array([], type=pa.int64()),
        }
    )


class _LocalSeenSet:
    """Single-process stand-in for SeenSet (same semantics, no actors)."""

    def __init__(self, num_shards: int = 4, mode: str = "exact",
                 delta_dir: str | None = None):
        self.num_shards = num_shards
        self.shards = [
            SeenShardLocal(
                mode=mode,
                delta_dir=(f"{delta_dir}/shard-{i:03d}" if delta_dir else None),
            )
            for i in range(num_shards)
        ]

    def check_and_add(self, hashes, urls=None):
        h = np.asarray(hashes, dtype=np.uint64)
        shard_of = h % np.uint64(self.num_shards)
        out = np.zeros(len(h), dtype=bool)
        for s in range(self.num_shards):
            idx = np.flatnonzero(shard_of == np.uint64(s))
            if len(idx) == 0:
                continue
            sub_urls = [urls[i] for i in idx] if urls is not None else None
            out[idx] = self.shards[s].check_and_add(h[idx], sub_urls)
        return out

    def size(self):
        return sum(s.size() for s in self.shards)

    def sorted_urls(self):
        urls = []
        for s in self.shards:
            urls.extend(s.snapshot_urls())
        return sorted(urls)

    def snapshot(self, directory):
        d = pathlib.Path(directory)
        d.mkdir(parents=True, exist_ok=True)
        return sum(
            s.snapshot(str(d / f"seen-{i:03d}.parquet"))
            for i, s in enumerate(self.shards)
        )

    def restore(self, directory):
        d = pathlib.Path(directory)
        return sum(
            s.restore(str(d / f"seen-{i:03d}.parquet"))
            for i, s in enumerate(self.shards)
        )

    def snapshot_async(self, directory):
        # no actors to pipeline behind — snapshot synchronously; the
        # empty ref list keeps the checkpoint publish path uniform
        self.snapshot(directory)
        return []


class RayCrawler:
    def __init__(
        self,
        corpus_dir: str,
        outlinks_fn,
        spec: CrawlSpec,
        run_dir: str,
        num_seen_shards: int = 4,
        seen_mode: str = "exact",
        mode: str = "local",
        fetch_concurrency: int = 4,
        ray_batch_rows: int = 1024,
        page_actions=None,
        post_navigation_actions=None,
        before_next_page_actions=None,
        after_fail=None,
        after_data_save=None,
        scheduler_shards: int | None = None,
        small_window_local_max: int = 256,
    ):
        self.corpus_dir = str(corpus_dir)
        self.outlinks_fn = outlinks_fn
        self.spec = spec
        self.run_dir = pathlib.Path(run_dir)
        self.mode = mode
        # SMALL-WINDOW GATE (the engine twin of the query-side
        # small-input gates): a politeness-collapsed window (at most one
        # page per ready host) pays ~100 ms+ of task dispatch +
        # shard-flush barriers for a few ms of work. Windows at or
        # below this page count run the SAME stage body driver-side.
        # Threshold measured on the bench corpus (60k-page politeness
        # crawl): ≤256-page windows always win locally; 256-512-page
        # windows carry enough decode+expand work to prefer the task
        # path (gate 256 best-of: 95.5 s vs 121.9 s all-local vs
        # 141.8 s pre-gate = 423→630 pages/s). Each window's outcome is
        # sim-equal on either path (golden parity green on all modes),
        # so mixing paths never changes visit order or the seen set.
        # Bulk windows (politeness-off, 65536 pages) stay distributed —
        # at multi-node scale the threshold is where window work ≈
        # dispatch cost.
        self.small_window_local_max = small_window_local_max
        self.num_seen_shards = num_seen_shards
        self.fetch_concurrency = fetch_concurrency
        self.ray_batch_rows = ray_batch_rows
        # current_page_actions analog (base.py:798-805, called per visited
        # page at base.py:1129-1155): a picklable callable over the
        # decoded page batch; rows it returns land in run_dir/items/.
        # post_navigation_actions / after_data_save run in-task with it
        # (WindowHooks); before_next_page_actions and after_fail run
        # driver-side (they mark window boundaries / failures).
        self.page_actions = page_actions
        self.hooks = WindowHooks(page_actions=page_actions,
                                 post_navigation=post_navigation_actions,
                                 after_data_save=after_data_save)
        self.before_next_page_actions = before_next_page_actions
        self.after_fail = after_fail
        if page_actions is not None:
            (self.run_dir / "items").mkdir(parents=True, exist_ok=True)

        (self.run_dir / "visits").mkdir(parents=True, exist_ok=True)
        (self.run_dir / "lineage").mkdir(parents=True, exist_ok=True)
        (self.run_dir / "metrics").mkdir(parents=True, exist_ok=True)

        seen_delta_dir = (
            str(self.run_dir / "seen_deltas") if seen_mode == "cuckoo" else None
        )
        if mode in ("ray", "tasks"):
            self.seen = SeenSet(num_shards=num_seen_shards, mode=seen_mode,
                                delta_dir=seen_delta_dir)
        else:
            self.seen = _LocalSeenSet(num_shards=num_seen_shards, mode=seen_mode,
                                      delta_dir=seen_delta_dir)
        delay_fn = None
        if spec.robots_provider is not None:
            from kryptone_ray.state.robots import RobotsCache

            robots = RobotsCache(spec.robots_provider, spec.robots_agent)

            def delay_fn(host, _r=robots):
                return _r.crawl_delay(host)

        if scheduler_shards is None:
            # AUTO (VERDICT r4 #9): the driver-local heap is the one
            # centralized residue in the crawl profile (sched_add +
            # pop_batch ≈ 0.27 s of the 0.4 s driver-serial share at 16
            # CPUs) — above the core-count threshold the sharded actor
            # scheduler amortizes it across host-hash shards; below it
            # the actor RPC overhead dominates tiny frontiers. Output
            # parity is mode-independent (test_sharded_scheduler +
            # golden parity), so the switch never changes visit order.
            scheduler_shards = (
                SCHED_AUTO_SHARDS
                if _effective_cpu_count() >= SCHED_AUTO_MIN_CPUS else 0)
        if scheduler_shards > 0:
            from kryptone_ray.state.scheduler import ShardedFrontierScheduler

            self.sched = ShardedFrontierScheduler(
                num_shards=scheduler_shards,
                batch_size=spec.batch_size,
                wait_time=spec.wait_time,
                host_delay=spec.host_delay,
                spill_dir=str(self.run_dir / "spill"),
                delay_fn=delay_fn,
            )
        else:
            self.sched = FrontierSchedulerLocal(
                batch_size=spec.batch_size,
                wait_time=spec.wait_time,
                host_delay=spec.host_delay,
                spill_dir=str(self.run_dir / "spill"),
                delay_fn=delay_fn,
            )
        self._reader: CorpusReader | None = None
        self._error_counts: dict[str, int] = {}  # per-visit-file cache
        self._stage_task = None
        self._cfg_refs = None
        self.vcfg: ValidationConfig | None = None
        self.pages_visited = 0
        self.errors = 0

    # --- seeding ------------------------------------------------------
    def seed(self, seeds: list[str]) -> None:
        """add_urls(start_urls) with start_url = LAST seed
        (base.py:1048-1049); iteration 0 → home-page guard off."""
        self.vcfg = ValidationConfig(
            start_url=seeds[-1],
            gather_ignore_regexes=self.spec.gather_ignore_regexes,
            rule_test_regexes=self.spec.rule_test_regexes,
            ignore_images=self.spec.ignore_images,
            allowed_hosts=self.spec.allowed_hosts,
            ignore_tests=self._ignore_tests(),
            robots_provider=self.spec.robots_provider,
            robots_agent=self.spec.robots_agent,
        )
        vt = validate_batch(seeds, self.vcfg, iteration_count=0)
        self._ingest_validated(
            vt.append_column("depth", pa.array([0] * len(vt), type=pa.int32()))
        )

    def _ignore_tests(self):
        from kryptone_ray.stages.validate import UrlIgnoreRegexTest, UrlIgnoreTest

        tests = []
        if self.spec.ignore_paths:
            tests.append(UrlIgnoreTest("paths", paths=tuple(self.spec.ignore_paths)))
        for i, r in enumerate(self.spec.ignore_regexes):
            tests.append(UrlIgnoreRegexTest(f"re{i}", r))
        return tuple(tests)

    def _ingest_validated(self, vt: pa.Table) -> int:
        """Seen anti-join + frontier enqueue for a validated table with
        columns (url, host, url_hash, verdict, depth)."""
        if len(vt) == 0:
            return 0
        import pyarrow.compute as pc

        hashes = vt["url_hash"].to_numpy().astype(np.uint64)
        urls = vt["url"].to_pylist()
        is_new = self.seen.check_and_add(hashes, urls)
        is_cand = pc.equal(vt["verdict"], pa.scalar(CANDIDATE)).to_numpy(
            zero_copy_only=False
        )
        enqueue = is_new & is_cand
        if not enqueue.any():
            return 0
        sub = vt.filter(pa.array(enqueue))
        self.sched.add(
            sub["url"].to_pylist(),
            sub["host"].to_pylist(),
            sub["depth"].to_pylist(),
        )
        return len(sub)

    # --- main loop ----------------------------------------------------
    def run(self, seeds: list[str] | None = None, checkpoint_every: int = 0,
            max_batches: int | None = None) -> dict:
        if seeds is not None:
            self.seed(seeds)
        assert self.vcfg is not None, "seed() first (or resume())"
        batches_done = 0
        # CROSS-WINDOW PIPELINING (politeness-ON lever): window N+1's
        # fetch+decode+validate runs in ONE background thread while the
        # driver writes window N's visits/lineage/metrics parquet. Visit
        # order and all state are UNCHANGED: the next window is popped at
        # exactly the point the sequential loop pops it (after window N's
        # ingest), the stage body is side-effect-free without hooks, and
        # seen/scheduler mutations stay on the driver thread. Disabled
        # when lifecycle hooks are registered (their contract is 'window
        # ingested, next window NOT yet selected') and skipped across a
        # checkpoint boundary (the checkpoint must capture the frontier
        # BEFORE the next pop so a resume re-pops the same window).
        pipeline_ok = (
            not self.hooks
            and self.before_next_page_actions is None
            and not _env_flag_off("KR_BENCH_PIPELINE_WINDOWS")
        )
        executor = None
        pending: tuple[pa.Table, object] | None = None

        def _pop_window() -> pa.Table | None:
            if max_batches is not None and batches_done >= max_batches:
                return None
            if (self.spec.max_pages is not None
                    and self.pages_visited >= self.spec.max_pages):
                return None
            # sim semantics: pages beyond max_pages stay in the frontier.
            # pop_batch(limit) never over-pops (sequential-greedy prefix
            # property), so visit_counter/clock advance only for pages
            # actually visited — no rollback, no counter skew in a
            # checkpoint taken after a truncated window.
            room = (self.spec.max_pages - self.pages_visited
                    if self.spec.max_pages is not None else None)
            urls, depths, idxs, ts, bidx = self.sched.pop_batch(limit=room)
            if not urls:
                return None
            return pa.table(
                {
                    "url": pa.array(urls, type=pa.string()),
                    "depth": pa.array(depths, type=pa.int32()),
                    "visit_idx": pa.array(idxs, type=pa.int64()),
                    "ts": pa.array([ts] * len(urls), type=pa.float64()),
                    "batch_idx": pa.array([bidx] * len(urls), type=pa.int64()),
                }
            )

        try:
            while True:
                if pending is not None:
                    batch, fut = pending
                    pending = None
                else:
                    batch = _pop_window()
                    if batch is None:
                        break
                    fut = None
                n_urls = len(batch)
                bidx = int(batch["batch_idx"][0].as_py())
                ts = float(batch["ts"][0].as_py())
                # small-window gate: below the threshold the distributed
                # modes run the window driver-side (same stage body; see
                # __init__ note) — politeness-collapsed windows stop paying
                # per-window task dispatch
                run_local = (self.mode not in ("ray", "tasks")
                             or n_urls <= self.small_window_local_max)
                lineage = visits = None
                try:
                    if fut is not None:
                        validated, lineage, visits = fut.result()
                    elif not run_local and self.mode == "ray":
                        validated = self._process_batch_ray(batch)
                    elif not run_local and self.mode == "tasks":
                        validated = self._process_batch_tasks(batch)
                    else:
                        validated, lineage, visits = self._process_batch_local(batch)
                except Exception as exc:
                    # after_fail hook (base.py:818-825): dump-before-dying —
                    # the subclass gets one shot at salvaging state, then the
                    # failure propagates unchanged
                    if self.after_fail is not None:
                        self.after_fail(exc)
                    raise

                self.pages_visited += n_urls
                self._ingest_validated(validated)
                batches_done += 1
                # frontier/seen sizes captured HERE (post-ingest,
                # pre-next-pop) so the metrics row is identical to the
                # sequential loop's even when the next window is popped
                # early below
                frontier_size = self.sched.size()
                seen_size = self.seen.size()
                will_ckpt = bool(checkpoint_every
                                 and (bidx + 1) % checkpoint_every == 0)
                if pipeline_ok and not will_ckpt:
                    nxt = _pop_window()
                    if nxt is not None:
                        nxt_local = (self.mode not in ("ray", "tasks")
                                     or len(nxt) <= self.small_window_local_max)
                        if nxt_local:
                            if executor is None:
                                from concurrent.futures import ThreadPoolExecutor

                                executor = ThreadPoolExecutor(max_workers=1)
                            pending = (
                                nxt,
                                executor.submit(self._process_batch_local, nxt),
                            )
                        else:
                            # a bulk window keeps the distributed path; it
                            # is processed synchronously next iteration
                            pending = (nxt, None)
                # window N bookkeeping rides under window N+1's fetch
                if visits is not None:
                    self.errors += sum(
                        1 for s in visits["status"].to_pylist() if s != "ok")
                    pq.write_table(
                        visits, self.run_dir / "visits" / f"batch-{bidx:08d}.parquet")
                    pq.write_table(
                        lineage, self.run_dir / "lineage" / f"batch-{bidx:08d}.parquet")
                # per-window metrics record (north rule: every partition emits
                # lineage AND metrics to the checkpoint store) — the
                # distributed Performance counters (base.py:199-250)
                mt = pa.table(
                    {
                        "batch_idx": pa.array([bidx], type=pa.int64()),
                        "virtual_ts": pa.array([ts], type=pa.float64()),
                        "pages": pa.array([n_urls], type=pa.int64()),
                        "pages_visited_total": pa.array(
                            [self.pages_visited], type=pa.int64()
                        ),
                        "frontier_size": pa.array([frontier_size], type=pa.int64()),
                        "seen_size": pa.array([seen_size], type=pa.int64()),
                    }
                )
                pq.write_table(mt, self.run_dir / "metrics" / f"batch-{bidx:08d}.parquet")
                if self.before_next_page_actions is not None:
                    # batch-wise before_next_page_actions (base.py:812-816):
                    # the window is fully visited and ingested, the politeness
                    # wait has (virtually) expired, the next window not yet
                    # selected — the hook sees the just-visited url list
                    # (pipeline_ok is False whenever this hook is set, so
                    # the next window really is not selected yet)
                    self.before_next_page_actions(batch["url"].to_pylist())
                if will_ckpt:
                    # overlapped: state captured here, IO rides under the
                    # next window's compute
                    self.checkpoint(overlap=True)
        finally:
            if executor is not None:
                executor.shutdown(wait=True)
        self.checkpoint_join()
        return self.metrics()

    def run_refresh(self, pages: list[str], checkpoint_every: int = 0,
                    start_url: str | None = None) -> dict:
        """Refresh mode (reference base.py:685-691 check_urls step 4 +
        base.py:1162-1164 re-collect): re-visit already-crawled pages;
        their out-links pass through the NORMAL seen anti-join, so only
        urls never seen before join the frontier — exactly the
        reference's 'keep the new urls that have appeared' semantics.

        ``pages`` (previously visited urls, deduplicated here — the
        simulator's refresh does the same) are enqueued directly,
        bypassing the anti-join (they are already in the seen set after
        ``resume()``/``restore``); the engine must already hold the prior
        seen state. The ``max_pages`` budget applies to the REFRESH run
        itself (the simulator counts a refresh from zero), so the
        visited counter restarts; visit_idx keeps continuing from the
        scheduler's counter."""
        from urllib.parse import urlparse

        pages = list(dict.fromkeys(pages))
        self.pages_visited = 0

        if self.vcfg is None:
            su = start_url if start_url is not None else pages[-1]
            self.vcfg = ValidationConfig(
                start_url=su,
                gather_ignore_regexes=self.spec.gather_ignore_regexes,
                rule_test_regexes=self.spec.rule_test_regexes,
                ignore_images=self.spec.ignore_images,
                allowed_hosts=self.spec.allowed_hosts,
                ignore_tests=self._ignore_tests(),
                robots_provider=self.spec.robots_provider,
                robots_agent=self.spec.robots_agent,
            )
        # ensure the refreshed pages are marked seen (idempotent when the
        # seen state was restored from the prior run)
        from kryptone_ray.utils.xxh64 import xxh64_batch

        self.seen.check_and_add(xxh64_batch(pages), pages)
        self.sched.add(pages, [urlparse(u).netloc for u in pages],
                       [0] * len(pages))
        return self.run(seeds=None, checkpoint_every=checkpoint_every)

    def _process_batch_local(self, batch: pa.Table):
        if self._reader is None:
            self._reader = CorpusReader(self.corpus_dir)
        fetched = fetch_table(self._reader, batch)
        decoded = decode_table(fetched)
        if self.hooks.post_navigation is not None:
            self.hooks.post_navigation(decoded)
        validated, lineage = expand_and_validate(
            decoded, self.outlinks_fn, self.vcfg, self.num_seen_shards,
            crawl=self.spec.crawl,
        )
        if self.page_actions is not None:
            items = self.page_actions(decoded)
            if items is not None and len(items):
                bidx = int(batch["batch_idx"][0].as_py())
                pq.write_table(
                    items, self.run_dir / "items" / f"batch-{bidx:08d}.parquet"
                )
                if self.hooks.after_data_save is not None:
                    self.hooks.after_data_save(items)
        return validated, lineage, decoded

    def _window_slices(self, batch: pa.Table) -> list[pa.Table]:
        """Sort the window by url_hash so each slice's corpus take touches
        a DISJOINT row-group range (the corpus is range-partitioned on the
        same key) — without this every task reads nearly every row group.
        Visit order is carried by the visit_idx column, so in-window row
        order is free to change. Then cut zero-copy slices, ~1 per CPU."""
        import pyarrow.compute as _pc
        import ray as _ray

        from kryptone_ray.utils.xxh64 import xxh64_batch as _xx

        key = pa.array(_xx(batch["url"].to_pylist()), type=pa.uint64())
        batch = batch.take(_pc.sort_indices(key))
        ncpu = int(_ray.cluster_resources().get("CPU", 8))
        # one slice per CPU: finer slices were measured SLOWER (each
        # extra slice re-touches boundary row groups and pays task
        # overhead; the straggler tail is cheaper than the duplication)
        n_tasks = max(1, min(len(batch) // 64 + 1, ncpu))
        per = -(-len(batch) // n_tasks)
        slices = [batch.slice(i * per, per) for i in range(n_tasks)]
        return [s for s in slices if len(s)]

    @staticmethod
    def _merge_validated(parts: list[pa.Table]) -> pa.Table:
        """Cross-slice dedupe: keep, per url, the row with the smallest
        (min_iter, depth) — guard-off (iter 0) rows win, independent of
        slice completion order."""
        parts = [p for p in parts if len(p)]
        if not parts:
            return _empty_validated()
        import pyarrow.compute as pc

        validated = pa.concat_tables(parts).combine_chunks()
        order = pc.sort_indices(
            validated,
            sort_keys=[("url", "ascending"), ("min_iter", "ascending"),
                       ("depth", "ascending")],
        )
        srt = validated.take(order)
        u = srt["url"]
        n = len(srt)
        if n <= 1:
            return srt
        neq = pc.not_equal(u.slice(1), u.slice(0, n - 1)).combine_chunks()
        keep = np.ones(n, dtype=bool)
        keep[1:] = neq.to_numpy(zero_copy_only=False)
        return srt.filter(pa.array(keep))

    def _process_batch_ray(self, batch: pa.Table) -> pa.Table:
        """One fused map_batches stage per politeness window: fetch
        (per-worker cached corpus reader) → decode → visits/lineage log
        writes (in-task, uniquely-named files) → expand+validate. Only
        the metadata-sized validated rows return to the driver; image
        bytes never cross a stage boundary."""
        import ray.data as rd

        outlinks_fn = self.outlinks_fn
        vcfg = self.vcfg
        nshards = self.num_seen_shards
        corpus_dir = self.corpus_dir
        run_dir = str(self.run_dir)

        hooks = self.hooks

        crawl_flag = self.spec.crawl

        def full_stage(t: pa.Table) -> pa.Table:
            return _window_slice_stage(t, corpus_dir, outlinks_fn, vcfg, nshards,
                                       run_dir, hooks=hooks,
                                       crawl=crawl_flag)

        ds = rd.from_arrow(self._window_slices(batch)).map_batches(
            full_stage, batch_format="pyarrow", batch_size=None
        )
        parts = list(ds.iter_batches(batch_size=None, batch_format="pyarrow"))
        return self._merge_validated(parts)

    def _process_batch_tasks(self, batch: pa.Table) -> pa.Table:
        """Same stage bodies as mode='ray', scheduled as plain ray tasks —
        see _window_slice_stage docstring for why this mode exists.

        Ingest is PIPELINED: each slice task streams its validated rows
        into the seen-shard actors as it finishes (exact: shards keep the
        min-(iter,depth) contributor per url — same outcome as the
        sequential reference); the window barrier is just a per-shard
        flush returning the deduplicated frontier adds."""
        import ray as _ray

        if self._stage_task is None:
            self._stage_task = _ray.remote(_window_slice_stage)
            self._cfg_refs = (
                _ray.put(self.outlinks_fn),
                _ray.put(self.vcfg),
                _ray.put(self.hooks),
            )
        ol_ref, vcfg_ref, hooks_ref = self._cfg_refs
        # the in-actor ingest's anti-join must observe every driver-path
        # addition made by gated local windows (cross-submitter ordering
        # is not guaranteed, so this waits); no-op when nothing is buffered
        self.seen.push_pending()
        refs = [
            self._stage_task.remote(
                s, self.corpus_dir, ol_ref, vcfg_ref,
                self.num_seen_shards, str(self.run_dir),
                self.seen.shards, hooks_ref, self.spec.crawl,
            )
            for s in self._window_slices(batch)
        ]
        _ray.get(refs)
        flushes = _ray.get([s.flush_window.remote() for s in self.seen.shards])
        urls: list[str] = []
        hosts: list[str] = []
        depths: list[int] = []
        for f in flushes:
            urls.extend(f["url"])
            hosts.extend(f["host"])
            depths.extend(f["depth"])
            self.seen.note_flushed(f["hash"])
        if urls:
            self.sched.add(urls, hosts, depths)
        return _empty_validated()

    # --- checkpoint / resume -----------------------------------------
    def checkpoint(self, overlap: bool = False) -> None:
        """Crash-atomic checkpoint. With ``overlap=True`` the state is
        CAPTURED synchronously at the call point (frontier table,
        counters, and the seen shard snapshots dispatched as actor
        tasks — actor ordering pins them to this boundary) but the
        parquet/manifest writes and the rename dance run in a
        background thread, overlapping the next window's compute
        (round-2 verdict: checkpoint IO was serial residue). Atomicity
        is unchanged — the rename is still the commit point and still
        happens strictly after every write lands."""
        self.checkpoint_join()
        ck = self.run_dir / "checkpoint"
        tmp = self.run_dir / "checkpoint.tmp"
        if tmp.exists():
            shutil.rmtree(tmp)
        tmp.mkdir(parents=True)
        frontier = self.sched.state_table()
        manifest = {
            "clock": self.sched.clock_state(),
            "pages_visited": self.pages_visited,
            "errors": self.count_errors(),
            "spec": {
                "batch_size": self.spec.batch_size,
                "wait_time": self.spec.wait_time,
                "host_delay": self.spec.host_delay,
            },
            "start_url": self.vcfg.start_url if self.vcfg else None,
        }
        seen_refs = self.seen.snapshot_async(str(tmp / "seen"))

        def _publish() -> None:
            import ray

            pq.write_table(frontier, tmp / "frontier.parquet")
            if seen_refs:
                ray.get(seen_refs)
            (tmp / "manifest.json").write_text(json.dumps(manifest))
            # crash-safe publish: at every instant either `checkpoint`
            # or `checkpoint.old` is a complete checkpoint — the live
            # dir is renamed ASIDE (not deleted) before the new one
            # takes its place, and resume() falls back to `.old` if a
            # crash lands between the two renames.
            old = self.run_dir / "checkpoint.old"
            if old.exists():
                shutil.rmtree(old)
            if ck.exists():
                ck.rename(old)
            tmp.rename(ck)
            if old.exists():
                shutil.rmtree(old)

        if overlap:
            import threading

            self._ck_thread = threading.Thread(target=_publish, daemon=True)
            self._ck_thread.start()
        else:
            _publish()

    def checkpoint_join(self) -> None:
        """Wait for an in-flight overlapped checkpoint publish. Called
        before starting another checkpoint (two rename dances must not
        interleave), at the end of ``run()``, and before ``resume()``
        reads the checkpoint dir."""
        t = getattr(self, "_ck_thread", None)
        if t is not None:
            t.join()
            self._ck_thread = None

    def resume(self, seeds: list[str]) -> None:
        """Rebuild state from run_dir/checkpoint; visits logs after the
        checkpointed batch counter are discarded (at-most-once re-fetch of
        the in-flight window — reference contract base.py:1213-1273)."""
        self.checkpoint_join()
        ck = self.run_dir / "checkpoint"
        if not ck.exists():
            # a crash between checkpoint()'s two renames leaves the last
            # complete checkpoint at checkpoint.old — promote it back
            old = self.run_dir / "checkpoint.old"
            if old.exists():
                old.rename(ck)
            else:
                raise FileNotFoundError(f"no checkpoint under {self.run_dir}")
        manifest = json.loads((ck / "manifest.json").read_text())
        self.vcfg = ValidationConfig(
            start_url=manifest["start_url"] or seeds[-1],
            gather_ignore_regexes=self.spec.gather_ignore_regexes,
            rule_test_regexes=self.spec.rule_test_regexes,
            ignore_images=self.spec.ignore_images,
            allowed_hosts=self.spec.allowed_hosts,
            ignore_tests=self._ignore_tests(),
            robots_provider=self.spec.robots_provider,
            robots_agent=self.spec.robots_agent,
        )
        self.seen.restore(str(ck / "seen"))
        ft = pq.read_table(ck / "frontier.parquet")
        urls = ft["url"].to_pylist()
        from urllib.parse import urlparse

        hosts = [urlparse(u).netloc for u in urls]
        self.sched.add(urls, hosts, ft["depth"].to_pylist())
        self.sched.restore_clock(manifest["clock"])
        self.pages_visited = manifest["pages_visited"]
        self.errors = manifest["errors"]
        # drop any visit/lineage logs written after the checkpoint
        ckpt_batches = manifest["clock"]["batch_counter"]
        for kind in ("visits", "lineage", "metrics"):
            for f in (self.run_dir / kind).glob("batch-*.parquet"):
                if int(f.stem.split("-")[1]) >= ckpt_batches:
                    f.unlink()
        # the per-file error-count cache may hold entries for the files
        # just deleted — drop it wholesale (it lazily recounts survivors)
        self._error_counts.clear()

    # --- outputs ------------------------------------------------------
    def visits_table(self) -> pa.Table:
        files = sorted((self.run_dir / "visits").glob("batch-*.parquet"))
        return pa.concat_tables([pq.read_table(f) for f in files]) if files else None

    def count_errors(self) -> int:
        """Fetch misses; in ray/tasks mode visit logs are written in-task,
        so the count is derived from the logs on demand. Visit files are
        append-only and immutable once written, so each file is counted
        ONCE and cached — without this a long politeness run (hundreds
        of window files) pays an O(files) re-read at EVERY checkpoint,
        quadratic over the run."""
        if self.mode == "local":
            return self.errors
        for f in (self.run_dir / "visits").glob("batch-*.parquet"):
            key = f.name
            if key in self._error_counts:
                continue
            t = pq.read_table(f, columns=["status"])
            self._error_counts[key] = int(
                len(t) - t["status"].to_pandas().eq("ok").sum())
        return int(sum(self._error_counts.values()))

    def metrics(self) -> dict:
        return {
            "pages_visited": self.pages_visited,
            "errors": self.count_errors(),
            "frontier_size": self.sched.size(),
            "seen_size": self.seen.size(),
            "batches": self.sched.batch_counter,
            "virtual_clock": self.sched.clock,
        }
