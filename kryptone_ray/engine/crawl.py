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


def _window_slice_compute(t: pa.Table, corpus_dir: str, outlinks_fn, vcfg,
                          nshards: int, crawl: bool = True,
                          hooks: WindowHooks | None = None):
    """Side-effect-free core of the per-slice window stage (fetch →
    decode → expand → validate): returns (validated, lineage, decoded)
    with nothing written and nothing ingested. Used directly by the
    SPECULATIVE multi-window dispatch (engine run loop), whose windows
    may be rolled back — all persistence happens at commit time on the
    driver."""
    reader = _worker_reader(corpus_dir)
    fetched = fetch_table(reader, t)
    decoded = decode_table(fetched)
    if hooks is not None and hooks.post_navigation is not None:
        hooks.post_navigation(decoded)
    validated, lineage = expand_and_validate(decoded, outlinks_fn, vcfg, nshards,
                                             crawl=crawl)
    return validated, lineage, decoded


class _PendingPage:
    """URL-cache placeholder for a page whose _page_compute task is still
    in flight — resolved lazily by _resolve_pending when the page's
    window commits."""

    __slots__ = ("ref",)

    def __init__(self, ref):
        self.ref = ref


def _page_compute(t: pa.Table, corpus_dir: str, outlinks_fn, vcfg,
                  nshards: int, crawl: bool = True):
    """Per-PAGE window-independent computation for the speculative URL
    cache: fetch+decode the slice (vectorized), then expand+validate each
    page ALONE. A page's results depend only on (url, frontier depth,
    guard group) — visit_idx/ts/batch_idx are reattached at assembly and
    min_iter/fetch_batch are stripped here (they are the only
    window-assigned fields; see expand_and_validate). Guard grouping is
    exact per page: merging per-page rows with _merge_validated keeps the
    min-(min_iter, depth) contributor, the same outcome as the window-
    level contributor merge (within a window iter order implies depth
    order, so the two lexicographic mins coincide — the existing
    slice-split parity relies on the same argument).

    Returns (decoded, [(validated_sans_min_iter, lineage_sans_fetch_batch)
    per page, aligned to decoded rows])."""
    reader = _worker_reader(corpus_dir)
    fetched = fetch_table(reader, t)
    decoded = decode_table(fetched)
    outs = _pages_expand_batched(decoded, outlinks_fn, vcfg, nshards, crawl)
    if outs is None:
        # exact fallback (a canonical url didn't round-trip the shared
        # canon map — never seen on the synthetic corpora): one
        # expand_and_validate per page, authoritative by construction
        outs = []
        for p in range(len(decoded)):
            row = decoded.slice(p, 1)
            validated, lineage = expand_and_validate(
                row, outlinks_fn, vcfg, nshards, crawl=crawl)
            outs.append((validated.drop_columns(["min_iter"]),
                         lineage.drop_columns(["fetch_batch"])))
    return decoded, outs


def _pages_expand_batched(decoded: pa.Table, outlinks_fn, vcfg, nshards,
                          crawl: bool):
    """Batched per-page expansion: ONE validate_batch per guard group
    over the whole slice (the per-url verdicts are independent, so the
    batch split cannot change them), then per-page row splits through a
    shared canonical-url map. Returns None when any validated canonical
    url is missing from the map (the expand_and_validate fallback path
    assigns those depth 0 via its contrib default — the slow per-page
    call reproduces it exactly)."""
    from kryptone_ray.stages.validate import validate_batch
    from kryptone_ray.utils.urlkit import join_relative
    from kryptone_ray.utils.xxh64 import xxh64_batch

    page_urls = decoded["url"].to_pylist()
    depths = decoded["depth"].to_pylist()
    iters = decoded["visit_idx"].to_pylist()
    statuses = decoded["status"].to_pylist()
    n = len(decoded)
    links_of: list[list[str]] = []
    lins: list[pa.Table] = []
    for u, st in zip(page_urls, statuses):
        links = outlinks_fn(u) if (crawl and st == "ok") else []
        links = [l if isinstance(l, str) else "" for l in links]
        links_of.append(links)
        lins.append(pa.table({
            "page_url": pa.array([u] * len(links), type=pa.string()),
            "out_url": pa.array(links, type=pa.string()),
            "ord": pa.array(np.arange(len(links), dtype=np.int32),
                            type=pa.int32()),
            "frontier_shard": pa.array(
                (xxh64_batch(links) % np.uint64(nshards)).astype(np.int32)
                if links else np.array([], dtype=np.int32),
                type=pa.int32()),
        }))
    canon_of = [
        [join_relative(vcfg._origin, l) if l.startswith("/") else l
         for l in links]
        for links in links_of
    ]
    outs: list = [None] * n
    for guard_iter, grp in ((0, [p for p in range(n) if iters[p] == 0]),
                            (1, [p for p in range(n) if iters[p] > 0])):
        if not grp:
            continue
        raw_g = [l for p in grp for l in links_of[p]]
        if not raw_g:
            vt = None
        else:
            vt = validate_batch(raw_g, vcfg, iteration_count=guard_iter)
        vmap: dict[str, int] = {}
        if vt is not None:
            for ix, vu in enumerate(vt["url"].to_pylist()):
                vmap[vu] = ix
            known = set()
            for p in grp:
                known.update(canon_of[p])
            if any(vu not in known for vu in vmap):
                return None
        for p in grp:
            take: list[int] = []
            seen: set[str] = set()
            for c in canon_of[p]:
                if c in seen:
                    continue
                seen.add(c)
                ix = vmap.get(c)
                if ix is not None:
                    take.append(ix)
            rows = vt.take(pa.array(take, type=pa.int64())) if take else None
            if rows is None:
                rows = pa.table({
                    "url": pa.array([], type=pa.string()),
                    "host": pa.array([], type=pa.string()),
                    "url_hash": pa.array([], type=pa.uint64()),
                    "verdict": pa.array([], type=pa.string()),
                })
            rows = rows.append_column(
                "depth", pa.array([depths[p] + 1] * len(rows),
                                  type=pa.int32()))
            outs[p] = (rows, lins[p])
    return outs


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

    validated, lineage, decoded = _window_slice_compute(
        t, corpus_dir, outlinks_fn, vcfg, nshards, crawl=crawl, hooks=hooks)
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
        speculate_windows: int | None = None,
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
            # AUTO resolves to the driver-local heap (VERDICT r4 #9
            # evaluated and REJECTED for single-box defaults): same-window
            # A/Bs measured the sharded actor scheduler SLOWER in both
            # regimes on this box — politeness-OFF 60k pages at 16 pinned
            # CPUs: 3.12 s local vs 4.22 s sharded (bulk waves pop the
            # whole frontier once; shard RPCs on ~100k-url adds are pure
            # overhead), politeness-ON 60k pages at 32 CPUs: 28.6 s local
            # vs 68.9 s sharded (per-window two-phase peek/commit is 2×8
            # actor round-trips per ~46-page window). The sharded
            # scheduler remains the multi-node shape (one shard per node,
            # frontier RAM sharded) — opt in via scheduler_shards /
            # KR_BENCH_SCHED_SHARDS; outputs are bit-identical either way
            # (test_sharded_scheduler + golden parity).
            scheduler_shards = 0
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
        # SPECULATIVE MULTI-WINDOW DISPATCH (VERDICT r4 #5, implemented,
        # measured, default OFF): in the politeness-collapsed regime the
        # run loop may pop up to this many windows at once (scheduler
        # journal armed), compute their pages as async per-page tasks
        # into a URL-keyed result cache, and commit windows sequentially
        # under an EXACT validation that frontier additions from window
        # i could not have changed windows > i, rolling the rest back
        # otherwise (exactness requires every eligible host selected
        # each window: uniform host_delay <= wait_time, no robots
        # delay_fn — _spec_guard_ok). Outcome is bit-identical to the
        # sequential loop (A/B + golden parity tested) but MEASURED
        # SLOWER on the bench workload (politeness-ON 15k pages: 6.4 s
        # sequential vs 9.3 s at depth 16 / 10.1 s at depth 4): ~110
        # frontier additions per ~46-page window make the first
        # speculative window violate almost every round (commit rate
        # ≈1.4 windows/round in the toy A/B), so the politeness barrier
        # the dispatch hoped to amortize is enforced by exact
        # visit-order semantics themselves, not by dispatch overhead.
        # Kept as an opt-in (KR_BENCH_SPEC_WINDOWS>1 or the ctor param)
        # for corpora whose discovery rate is low — e.g. refresh crawls
        # — where the validation rarely fires. 0/1 disables.
        if speculate_windows is None:
            speculate_windows = int(
                os.environ.get("KR_BENCH_SPEC_WINDOWS", "1") or "1")
        self.speculate_windows = speculate_windows
        self._has_delay_fn = delay_fn is not None
        self._reader: CorpusReader | None = None
        self._error_counts: dict[str, int] = {}  # per-visit-file cache
        self._stage_task = None
        self._spec_task = None
        # speculative per-URL result cache: url → (decoded 1-row slice,
        # validated rows sans min_iter, lineage rows sans fetch_batch).
        # Populated by _process_windows_spec, evicted when the url's
        # window COMMITS (every url is visited exactly once, so an entry
        # survives only across rollback→re-pop cycles) — memory is
        # bounded by the speculation depth × window size.
        self._url_cache: dict[str, tuple] = {}
        self._ncpu_cache: int | None = None
        self._cfg_refs = None
        self.vcfg: ValidationConfig | None = None
        self.pages_visited = 0
        self.errors = 0
        # speculation observability (bench/diagnostics only)
        self.spec_rounds = 0
        self.spec_windows_committed = 0
        self.spec_windows_rolled = 0

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

    def _ingest_validated(self, vt: pa.Table) -> pa.Table | None:
        """Seen anti-join + frontier enqueue for a validated table with
        columns (url, host, url_hash, verdict, depth). Returns the
        enqueued sub-table (the NEW frontier additions) — the speculative
        multi-window dispatch validates later windows against it."""
        if len(vt) == 0:
            return None
        import pyarrow.compute as pc

        hashes = vt["url_hash"].to_numpy().astype(np.uint64)
        urls = vt["url"].to_pylist()
        is_new = self.seen.check_and_add(hashes, urls)
        is_cand = pc.equal(vt["verdict"], pa.scalar(CANDIDATE)).to_numpy(
            zero_copy_only=False
        )
        enqueue = is_new & is_cand
        if not enqueue.any():
            return None
        sub = vt.filter(pa.array(enqueue))
        self.sched.add(
            sub["url"].to_pylist(),
            sub["host"].to_pylist(),
            sub["depth"].to_pylist(),
        )
        return sub

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
        # speculative multi-window dispatch (see _spec_round); it
        # subsumes the single-window pipelining for the gated regime, so
        # the early-pop below is skipped while it is active
        spec_active = self._spec_guard_ok()
        executor = None
        pending: tuple[pa.Table, object] | None = None

        def _pop_window(extra_pages: int = 0,
                        extra_batches: int = 0) -> pa.Table | None:
            # extra_* = speculatively popped but not yet committed
            # windows, so mid-speculation pops see the same budgets the
            # sequential loop would
            if (max_batches is not None
                    and batches_done + extra_batches >= max_batches):
                return None
            if (self.spec.max_pages is not None
                    and self.pages_visited + extra_pages
                    >= self.spec.max_pages):
                return None
            # sim semantics: pages beyond max_pages stay in the frontier.
            # pop_batch(limit) never over-pops (sequential-greedy prefix
            # property), so visit_counter/clock advance only for pages
            # actually visited — no rollback, no counter skew in a
            # checkpoint taken after a truncated window.
            room = (self.spec.max_pages - self.pages_visited - extra_pages
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
                if (spec_active and fut is None
                        and n_urls <= self.small_window_local_max):
                    # gated regime: gather more windows speculatively and
                    # dispatch them as one task round (see _spec_round)
                    wins = [batch]
                    spec_pages = n_urls
                    self.sched.begin_windows()
                    while len(wins) < self.speculate_windows:
                        last_bidx = int(wins[-1]["batch_idx"][0].as_py())
                        if (checkpoint_every
                                and (last_bidx + 1) % checkpoint_every == 0):
                            break  # never speculate across a checkpoint
                        nxt = _pop_window(extra_pages=spec_pages,
                                          extra_batches=len(wins))
                        if nxt is None:
                            break
                        wins.append(nxt)
                        spec_pages += len(nxt)
                        if len(nxt) > self.small_window_local_max:
                            break  # bulk window: stop extending the round
                    if len(wins) > 1:
                        try:
                            done = self._spec_round(wins, checkpoint_every)
                        except Exception as exc:
                            if self.after_fail is not None:
                                self.after_fail(exc)
                            raise
                        batches_done += done
                        continue
                    self.sched.end_windows()
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
                if self._url_cache:
                    # a rolled-back page re-popped into a bulk window was
                    # processed by the sequential path — drop its entry
                    for u in batch["url"].to_pylist():
                        self._url_cache.pop(u, None)
                # frontier/seen sizes captured HERE (post-ingest,
                # pre-next-pop) so the metrics row is identical to the
                # sequential loop's even when the next window is popped
                # early below
                frontier_size = self.sched.size()
                seen_size = self.seen.size()
                will_ckpt = bool(checkpoint_every
                                 and (bidx + 1) % checkpoint_every == 0)
                if pipeline_ok and not spec_active and not will_ckpt:
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
        ncpu = self._ncpu_cache
        if ncpu is None:
            # cluster_resources is a GCS round-trip — cache it (the
            # speculative path slices many small windows per round)
            ncpu = self._ncpu_cache = int(
                _ray.cluster_resources().get("CPU", 8))
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

    # --- speculative multi-window politeness dispatch ------------------
    # One politeness window carries ≤ one page per ready host, so the
    # gated regime pays a full dispatch+ingest round-trip per handful of
    # pages. This path pops up to ``speculate_windows`` windows in one go
    # (scheduler journal armed), fans ALL their slices out as one task
    # round (side-effect-free stage body), then commits windows in
    # order. Committing window i ingests its discoveries; an EXACT check
    # then asks whether any discovery could have changed a later
    # speculative window — under the guard conditions (uniform
    # host_delay ≤ wait_time, no robots delay_fn) every eligible host is
    # selected once per window, so window j changes iff some discovery
    # (d, u) on host h either beats h's selected (depth, url) in window
    # j or lands on a host j did NOT select (its queue must have been
    # empty — the discovery would have been fetched). The first violated
    # window and everything after it roll back exactly (entries, next_ok,
    # clock, counters) and the main loop re-pops them with the frontier
    # additions applied — output is therefore bit-identical to the
    # sequential loop (asserted by golden parity + A/B tests).

    def _spec_guard_ok(self) -> bool:
        return (
            self.speculate_windows > 1
            and self.mode in ("ray", "tasks")
            and not self.hooks
            and self.before_next_page_actions is None
            and self.spec.host_delay > 0
            and self.spec.host_delay <= self.spec.wait_time
            and not self._has_delay_fn
            and hasattr(self.sched, "begin_windows")
        )

    def _dispatch_spec_misses(self, wins: list[pa.Table]) -> None:
        """One task round computing the CACHE-MISS pages of all windows
        (per-page, window-independent — see _page_compute) into the URL
        cache. Rolled-back windows re-pop mostly cache-hit pages, so a
        mispredicted speculation never recomputes: each page is
        fetched/decoded/expanded once regardless of rollback count, and
        windows are assembled from the cache only when they COMMIT."""
        import ray as _ray

        if self._spec_task is None:
            self._spec_task = _ray.remote(_page_compute)
        if self._cfg_refs is None:
            self._cfg_refs = (
                _ray.put(self.outlinks_fn),
                _ray.put(self.vcfg),
                _ray.put(self.hooks),
            )
        ol_ref, vcfg_ref, _ = self._cfg_refs
        cache = self._url_cache
        for w in wins:
            mask = np.fromiter((u not in cache for u in w["url"].to_pylist()),
                               dtype=bool, count=len(w))
            if not mask.any():
                continue
            miss = w.filter(pa.array(mask))
            for s in self._window_slices(miss):
                # ASYNC: the ref is left pending in the cache — the
                # commit loop blocks on a page's task only when its
                # window actually commits, so miss compute (usually the
                # NEXT windows' pages) overlaps the current window's
                # ingest/bookkeeping
                ref = self._spec_task.remote(
                    s, self.corpus_dir, ol_ref, vcfg_ref,
                    self.num_seen_shards, self.spec.crawl)
                for u in s["url"].to_pylist():
                    cache[u] = _PendingPage(ref)

    def _prefetch_pages(self, pages: list[tuple[str, int]]) -> None:
        """Dispatch _page_compute for (url, depth) pairs not yet cached.
        visit_idx is a ≥1 placeholder (guard-ON — correct for every page
        except the run's very first, which is never prefetched) and
        ts/batch_idx are stale by construction: assembly reattaches all
        three from the committing window."""
        cache = self._url_cache
        pages = [(u, d) for u, d in pages if u not in cache]
        if not pages:
            return
        t = pa.table({
            "url": pa.array([u for u, _ in pages], type=pa.string()),
            "depth": pa.array([d for _, d in pages], type=pa.int32()),
            "visit_idx": pa.array([1] * len(pages), type=pa.int64()),
            "ts": pa.array([0.0] * len(pages), type=pa.float64()),
            "batch_idx": pa.array([0] * len(pages), type=pa.int64()),
        })
        ol_ref, vcfg_ref, _ = self._cfg_refs
        for s in self._window_slices(t):
            ref = self._spec_task.remote(
                s, self.corpus_dir, ol_ref, vcfg_ref,
                self.num_seen_shards, self.spec.crawl)
            for u in s["url"].to_pylist():
                cache[u] = _PendingPage(ref)

    def _resolve_pending(self, urls: list[str]) -> None:
        """Materialize any still-pending page results among ``urls``
        (one batched ray.get over the distinct outstanding tasks)."""
        import ray as _ray

        cache = self._url_cache
        refs = []
        seen_ids = set()
        for u in urls:
            e = cache.get(u)
            if isinstance(e, _PendingPage) and id(e.ref) not in seen_ids:
                seen_ids.add(id(e.ref))
                refs.append(e.ref)
        for dec, outs in _ray.get(refs):
            for p, u in enumerate(dec["url"].to_pylist()):
                if isinstance(cache.get(u), _PendingPage):
                    cache[u] = (dec.slice(p, 1), outs[p][0], outs[p][1])

    def _assemble_window(self, w: pa.Table) -> tuple:
        """Rebuild (validated, lineage, decoded) for a window whose pages
        are all in the URL cache, reattaching the window-assigned fields:
        visit_idx/ts/batch_idx on decoded (cached values are stale — the
        page may have been computed under a rolled-back window),
        min_iter = the page's visit_idx on validated rows, fetch_batch on
        lineage. Row order = pop order, identical to the sequential local
        path's output."""
        urls = w["url"].to_pylist()
        self._resolve_pending(urls)
        vidx = w["visit_idx"].to_pylist()
        bidx = int(w["batch_idx"][0].as_py())
        ts = float(w["ts"][0].as_py())
        dec_parts, val_parts, lin_parts = [], [], []
        for u, vi in zip(urls, vidx):
            dec_base, out_base, lin_base = self._url_cache[u]
            dec_parts.append(dec_base)
            if len(out_base):
                val_parts.append(out_base.append_column(
                    "min_iter",
                    pa.array([int(vi)] * len(out_base), type=pa.int64())))
            if len(lin_base):
                lin_parts.append(lin_base)
        decoded = pa.concat_tables(dec_parts)
        n = len(decoded)
        assert decoded.column_names[2:5] == ["visit_idx", "ts", "batch_idx"]
        decoded = decoded.set_column(
            2, "visit_idx", pa.array(vidx, type=pa.int64()))
        decoded = decoded.set_column(
            3, "ts", pa.array([ts] * n, type=pa.float64()))
        decoded = decoded.set_column(
            4, "batch_idx", pa.array([bidx] * n, type=pa.int64()))
        validated = self._merge_validated(val_parts)
        if lin_parts:
            lineage = pa.concat_tables(lin_parts)
        else:
            lineage = self._url_cache[urls[0]][2] if urls else None
        if lineage is not None:
            lineage = lineage.add_column(
                3, "fetch_batch",
                pa.array([bidx] * len(lineage), type=pa.int64()))
        return validated, lineage, decoded

    @staticmethod
    def _first_spec_violation(added: pa.Table, sels: list[dict],
                              start: int, commit_n: int):
        """(first violated window index or None, violating additions):
        the first speculative window in (start, commit_n) whose contents
        would have differed had ``added`` been in the frontier — see the
        section comment for why this check is exact. ``sels`` is
        window_selections() aligned to wins[1:] (wins[j] ↔ sels[j-1]).
        The violating (url, depth) pairs are ALSO collected across every
        remaining window: they are the pages the re-popped windows will
        contain, so the caller prefetches their compute before rolling
        back (their results are never wasted — every frontier url is
        eventually visited)."""
        urls = added["url"].to_pylist()
        hosts = added["host"].to_pylist()
        depths = added["depth"].to_pylist()
        first: int | None = None
        violators: list[tuple[str, int]] = []
        vseen: set[str] = set()
        for j in range(start, commit_n):
            rec = sels[j - 1]
            if rec["n"] >= rec["k"]:
                # k-truncated window: the k-best merge could admit any
                # addition — conservative violation (rare: max_pages tail)
                if first is None:
                    first = j
                break
            sel = rec["sel"]
            for u, h, d in zip(urls, hosts, depths):
                s = sel.get(h)
                if s is None or (int(d), u) < s:
                    if first is None:
                        first = j
                    if u not in vseen:
                        vseen.add(u)
                        violators.append((u, int(d)))
        return first, violators

    def _spec_round(self, wins: list[pa.Table], checkpoint_every: int) -> int:
        """Process + commit speculatively popped windows; returns how
        many committed (the rest rolled back). wins[0] was popped before
        the journal was armed and always commits."""
        self._dispatch_spec_misses(wins)
        sels = self.sched.window_selections()
        commit_n = len(wins)
        self.spec_rounds += 1
        i = 0
        while i < commit_n:
            w = wins[i]
            validated, lineage, decoded = self._assemble_window(w)
            n_urls = len(w)
            bidx = int(w["batch_idx"][0].as_py())
            ts = float(w["ts"][0].as_py())
            self.pages_visited += n_urls
            added = self._ingest_validated(validated)
            if added is not None and len(added) and i + 1 < commit_n:
                viol, violators = self._first_spec_violation(
                    added, sels, i + 1, commit_n)
                if violators:
                    # the violating pages are what the re-popped windows
                    # will contain — start their compute NOW so the next
                    # round's commits find them resolved
                    self._prefetch_pages(violators)
                if viol is not None:
                    self.sched.rollback_windows(viol - 1)
                    commit_n = viol
            # bookkeeping identical to the sequential local path
            self.errors += sum(
                1 for s in decoded["status"].to_pylist() if s != "ok")
            pq.write_table(
                decoded, self.run_dir / "visits" / f"batch-{bidx:08d}.parquet")
            pq.write_table(
                lineage, self.run_dir / "lineage" / f"batch-{bidx:08d}.parquet")
            # sequential frontier size at this window's post-ingest point:
            # entries of later speculative windows are popped physically
            # but not yet sequentially — add them back
            frontier_size = self.sched.size() + sum(
                len(wins[j]) for j in range(i + 1, commit_n))
            mt = pa.table(
                {
                    "batch_idx": pa.array([bidx], type=pa.int64()),
                    "virtual_ts": pa.array([ts], type=pa.float64()),
                    "pages": pa.array([n_urls], type=pa.int64()),
                    "pages_visited_total": pa.array(
                        [self.pages_visited], type=pa.int64()),
                    "frontier_size": pa.array([frontier_size], type=pa.int64()),
                    "seen_size": pa.array([self.seen.size()], type=pa.int64()),
                }
            )
            pq.write_table(
                mt, self.run_dir / "metrics" / f"batch-{bidx:08d}.parquet")
            # committed: the url will never be popped again — evict
            for u in w["url"].to_pylist():
                self._url_cache.pop(u, None)
            i += 1
        self.spec_windows_committed += commit_n
        self.spec_windows_rolled += len(wins) - commit_n
        self.sched.end_windows()
        if checkpoint_every and commit_n:
            last_bidx = int(wins[commit_n - 1]["batch_idx"][0].as_py())
            if (last_bidx + 1) % checkpoint_every == 0:
                self.checkpoint(overlap=True)
        return commit_n

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
