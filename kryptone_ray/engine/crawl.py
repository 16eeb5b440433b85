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


class _LocalSeenSet:
    """Single-process stand-in for SeenSet (same semantics, no actors)."""

    def __init__(self, num_shards: int = 4, mode: str = "exact"):
        self.num_shards = num_shards
        self.shards = [SeenShardLocal(mode=mode) for _ in range(num_shards)]

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
    ):
        self.corpus_dir = str(corpus_dir)
        self.outlinks_fn = outlinks_fn
        self.spec = spec
        self.run_dir = pathlib.Path(run_dir)
        self.mode = mode
        self.num_seen_shards = num_seen_shards
        self.fetch_concurrency = fetch_concurrency
        self.ray_batch_rows = ray_batch_rows

        (self.run_dir / "visits").mkdir(parents=True, exist_ok=True)
        (self.run_dir / "lineage").mkdir(parents=True, exist_ok=True)

        if mode == "ray":
            self.seen = SeenSet(num_shards=num_seen_shards, mode=seen_mode)
        else:
            self.seen = _LocalSeenSet(num_shards=num_seen_shards, mode=seen_mode)
        self.sched = FrontierSchedulerLocal(
            batch_size=spec.batch_size,
            wait_time=spec.wait_time,
            host_delay=spec.host_delay,
            spill_dir=str(self.run_dir / "spill"),
        )
        self._reader: CorpusReader | None = None
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
        hashes = vt["url_hash"].to_numpy().astype(np.uint64)
        urls = vt["url"].to_pylist()
        is_new = self.seen.check_and_add(hashes, urls)
        verdicts = np.asarray(vt["verdict"].to_pylist(), dtype=object)
        enqueue = is_new & (verdicts == CANDIDATE)
        if not enqueue.any():
            return 0
        idx = np.flatnonzero(enqueue)
        self.sched.add(
            [urls[i] for i in idx],
            [vt["host"][int(i)].as_py() for i in idx],
            [vt["depth"][int(i)].as_py() for i in idx],
        )
        return int(len(idx))

    # --- main loop ----------------------------------------------------
    def run(self, seeds: list[str] | None = None, checkpoint_every: int = 0,
            max_batches: int | None = None) -> dict:
        if seeds is not None:
            self.seed(seeds)
        assert self.vcfg is not None, "seed() first (or resume())"
        batches_done = 0
        while True:
            if max_batches is not None and batches_done >= max_batches:
                break
            if self.spec.max_pages is not None and self.pages_visited >= self.spec.max_pages:
                break
            urls, depths, idxs, ts, bidx = self.sched.pop_batch()
            if not urls:
                break
            if self.spec.max_pages is not None:
                room = self.spec.max_pages - self.pages_visited
                if room < len(urls):
                    # sim semantics: pages beyond max_pages stay in the
                    # frontier — re-queue the popped surplus
                    from urllib.parse import urlparse

                    surplus_urls = urls[room:]
                    surplus_depths = depths[room:]
                    self.sched.add(
                        surplus_urls,
                        [urlparse(u).netloc for u in surplus_urls],
                        surplus_depths,
                    )
                    urls, depths, idxs = urls[:room], depths[:room], idxs[:room]
                    if not urls:
                        break
            batch = pa.table(
                {
                    "url": pa.array(urls, type=pa.string()),
                    "depth": pa.array(depths, type=pa.int32()),
                    "visit_idx": pa.array(idxs, type=pa.int64()),
                    "ts": pa.array([ts] * len(urls), type=pa.float64()),
                    "batch_idx": pa.array([bidx] * len(urls), type=pa.int64()),
                }
            )
            if self.mode == "ray":
                validated, lineage, visits = self._process_batch_ray(batch)
            else:
                validated, lineage, visits = self._process_batch_local(batch)

            self.pages_visited += len(visits)
            self.errors += sum(1 for s in visits["status"].to_pylist() if s != "ok")
            pq.write_table(visits, self.run_dir / "visits" / f"batch-{bidx:08d}.parquet")
            pq.write_table(lineage, self.run_dir / "lineage" / f"batch-{bidx:08d}.parquet")
            self._ingest_validated(validated)
            batches_done += 1
            if checkpoint_every and (bidx + 1) % checkpoint_every == 0:
                self.checkpoint()
        return self.metrics()

    def _process_batch_local(self, batch: pa.Table):
        if self._reader is None:
            self._reader = CorpusReader(self.corpus_dir)
        fetched = fetch_table(self._reader, batch)
        decoded = decode_table(fetched)
        validated, lineage = expand_and_validate(
            decoded, self.outlinks_fn, self.vcfg, self.num_seen_shards
        )
        return validated, lineage, decoded

    def _process_batch_ray(self, batch: pa.Table):
        import ray.data as rd

        outlinks_fn = self.outlinks_fn
        vcfg = self.vcfg
        nshards = self.num_seen_shards

        ds = rd.from_arrow(batch)
        ds = ds.map_batches(
            FetchActor,
            fn_constructor_kwargs={"corpus_dir": self.corpus_dir},
            batch_format="pyarrow",
            batch_size=self.ray_batch_rows,
            concurrency=self.fetch_concurrency,
            num_cpus=1,
        )
        ds = ds.map_batches(decode_table, batch_format="pyarrow",
                            batch_size=self.ray_batch_rows)
        # decoded visits stream back to the driver; expansion+validation
        # runs per sub-batch, outputs are metadata-sized.
        visit_parts: list[pa.Table] = []
        validated_parts: list[pa.Table] = []
        lineage_parts: list[pa.Table] = []
        for sub in ds.iter_batches(batch_size=self.ray_batch_rows, batch_format="pyarrow"):
            visit_parts.append(sub.drop_columns([c for c in ("bytes",) if c in sub.schema.names]))
            validated, lineage = expand_and_validate(sub, outlinks_fn, vcfg, nshards)
            validated_parts.append(validated)
            lineage_parts.append(lineage)
        visits = pa.concat_tables(visit_parts) if visit_parts else batch
        lineage = pa.concat_tables(lineage_parts)
        validated = pa.concat_tables(validated_parts)
        if len(validated):
            # cross-sub-batch dedupe: keep, per url, the row with the
            # smallest (min_iter, depth) — guard-off (iter 0) rows win,
            # independent of sub-batch arrival order.
            u = np.asarray(validated["url"].to_pylist(), dtype=object)
            mi = validated["min_iter"].to_numpy()
            dd = validated["depth"].to_numpy()
            order = np.lexsort((dd, mi, u))
            u_sorted = u[order]
            keep_sorted = np.ones(len(u_sorted), dtype=bool)
            keep_sorted[1:] = u_sorted[1:] != u_sorted[:-1]
            validated = validated.take(pa.array(order[keep_sorted]))
        return validated, lineage, visits

    # --- checkpoint / resume -----------------------------------------
    def checkpoint(self) -> None:
        ck = self.run_dir / "checkpoint"
        tmp = self.run_dir / "checkpoint.tmp"
        if tmp.exists():
            shutil.rmtree(tmp)
        tmp.mkdir(parents=True)
        pq.write_table(self.sched.state_table(), tmp / "frontier.parquet")
        self.seen.snapshot(str(tmp / "seen"))
        manifest = {
            "clock": self.sched.clock_state(),
            "pages_visited": self.pages_visited,
            "errors": self.errors,
            "spec": {
                "batch_size": self.spec.batch_size,
                "wait_time": self.spec.wait_time,
                "host_delay": self.spec.host_delay,
            },
            "start_url": self.vcfg.start_url if self.vcfg else None,
        }
        (tmp / "manifest.json").write_text(json.dumps(manifest))
        if ck.exists():
            shutil.rmtree(ck)
        tmp.rename(ck)  # atomic publish

    def resume(self, seeds: list[str]) -> None:
        """Rebuild state from run_dir/checkpoint; visits logs after the
        checkpointed batch counter are discarded (at-most-once re-fetch of
        the in-flight window — reference contract base.py:1213-1273)."""
        ck = self.run_dir / "checkpoint"
        manifest = json.loads((ck / "manifest.json").read_text())
        self.vcfg = ValidationConfig(
            start_url=manifest["start_url"] or seeds[-1],
            gather_ignore_regexes=self.spec.gather_ignore_regexes,
            rule_test_regexes=self.spec.rule_test_regexes,
            ignore_images=self.spec.ignore_images,
            allowed_hosts=self.spec.allowed_hosts,
            ignore_tests=self._ignore_tests(),
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
        for kind in ("visits", "lineage"):
            for f in (self.run_dir / kind).glob("batch-*.parquet"):
                if int(f.stem.split("-")[1]) >= ckpt_batches:
                    f.unlink()

    # --- outputs ------------------------------------------------------
    def visits_table(self) -> pa.Table:
        files = sorted((self.run_dir / "visits").glob("batch-*.parquet"))
        return pa.concat_tables([pq.read_table(f) for f in files]) if files else None

    def metrics(self) -> dict:
        return {
            "pages_visited": self.pages_visited,
            "errors": self.errors,
            "frontier_size": self.sched.size(),
            "seen_size": self.seen.size(),
            "batches": self.sched.batch_counter,
            "virtual_clock": self.sched.clock,
        }
