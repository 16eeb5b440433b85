"""Sharded frontier scheduler: bit-identical pop sequences vs the local
scheduler, and full engine parity vs the golden simulator."""

import numpy as np
import pytest

from kryptone_ray.state.scheduler import FrontierSchedulerLocal, ShardedFrontierScheduler


def _mk_entries(n, n_hosts, seed=3):
    rng = np.random.default_rng(seed)
    hosts = [f"h{int(i):03d}.x" for i in rng.integers(0, n_hosts, n)]
    urls = [f"https://{h}/p/{i}" for i, h in enumerate(hosts)]
    depths = rng.integers(0, 4, n).tolist()
    return urls, hosts, depths


@pytest.mark.parametrize("host_delay", [0.0, 30.0])
def test_sharded_matches_local(ray_session, tmp_path, host_delay):
    urls, hosts, depths = _mk_entries(500, 40)
    local = FrontierSchedulerLocal(batch_size=16, wait_time=25.0,
                                   host_delay=host_delay)
    shard = ShardedFrontierScheduler(num_shards=4, batch_size=16, wait_time=25.0,
                                     host_delay=host_delay,
                                     spill_dir=str(tmp_path / "sp"))
    local.add(urls, hosts, depths)
    shard.add(urls, hosts, depths)
    assert shard.size() == local.size() == 500

    while True:
        lu, ld, li, lt, lb = local.pop_batch()
        su, sd, si, st, sb = shard.pop_batch()
        assert (lu, ld, li, lt, lb) == (su, sd, si, st, sb)
        if not lu:
            break
    assert shard.size() == 0


def test_sharded_with_delay_fn(ray_session, tmp_path):
    # per-host crawl-delay override, as robots provides it
    def delay_fn(host):
        return 60.0 if host.startswith("h00") else None

    urls, hosts, depths = _mk_entries(200, 30, seed=9)
    local = FrontierSchedulerLocal(batch_size=8, wait_time=25.0, host_delay=10.0,
                                   delay_fn=delay_fn)
    shard = ShardedFrontierScheduler(num_shards=3, batch_size=8, wait_time=25.0,
                                     host_delay=10.0, delay_fn=delay_fn,
                                     spill_dir=str(tmp_path / "sp2"))
    local.add(urls, hosts, depths)
    shard.add(urls, hosts, depths)
    for _ in range(40):
        l = local.pop_batch()
        s = shard.pop_batch()
        assert l == s
        if not l[0]:
            break


def test_engine_parity_with_sharded_scheduler(ray_session, tmp_path):
    from kryptone_ray.corpus.store import write_corpus
    from kryptone_ray.corpus.synth import CorpusSpec, make_corpus_table, seed_urls
    from kryptone_ray.engine.crawl import RayCrawler
    from kryptone_ray.sim.golden import CrawlSpec, GoldenSimulator
    from tests.test_crawl_parity import assert_parity, page_outlinks

    spec = CorpusSpec(n_rows=300, n_hosts=8, seed=42)
    d = tmp_path / "corpus"
    write_corpus(make_corpus_table(spec), d, num_shards=4)
    cs = CrawlSpec(batch_size=16, wait_time=25.0, host_delay=40.0,
                   allowed_hosts=("*",), max_pages=90)
    seeds = seed_urls(spec, 8)
    golden = GoldenSimulator(page_outlinks(spec), cs).run(seeds)
    eng = RayCrawler(str(d), page_outlinks(spec), cs, str(tmp_path / "run"),
                     mode="tasks", scheduler_shards=3,
                     small_window_local_max=0)
    eng.run(seeds=seeds)
    assert_parity(golden, eng)


def test_sharded_with_spill(ray_session, tmp_path):
    urls, hosts, depths = _mk_entries(2000, 10, seed=5)
    local = FrontierSchedulerLocal(batch_size=64, wait_time=25.0,
                                   spill_dir=str(tmp_path / "l"),
                                   spill_threshold=40)
    shard = ShardedFrontierScheduler(num_shards=3, batch_size=64, wait_time=25.0,
                                     spill_dir=str(tmp_path / "s"),
                                     spill_threshold=40)
    local.add(urls, hosts, depths)
    shard.add(urls, hosts, depths)
    popped_l, popped_s = [], []
    while True:
        l = local.pop_batch()
        s = shard.pop_batch()
        assert l[:4] == s[:4]
        if not l[0]:
            break
        popped_l.extend(l[0])
    assert len(popped_l) == 2000
