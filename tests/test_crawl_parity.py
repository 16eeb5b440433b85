"""Golden-parity: the Ray engine must reproduce the reference state
machine's visit order, seen set and final frontier exactly (north_rule;
FIXTURES.md F4), under the documented tie-breaks, in both execution modes
and with politeness on and off."""

import pathlib

import pytest

from kryptone_ray.corpus.store import write_corpus
from kryptone_ray.corpus.synth import CorpusSpec, make_corpus_table, row_index_of, seed_urls
from kryptone_ray.engine.crawl import RayCrawler
from kryptone_ray.sim.golden import CrawlSpec, GoldenSimulator


from kryptone_ray.corpus.synth import page_outlinks  # noqa: E402 (shared fixture fn)


@pytest.fixture(scope="module")
def small_world(tmp_path_factory):
    spec = CorpusSpec(n_rows=400, n_hosts=6, seed=42)
    d = tmp_path_factory.mktemp("corpus")
    write_corpus(make_corpus_table(spec), d, num_shards=4, row_group_size=64)
    return spec, d


def run_pair(spec, corpus_dir, tmp_path, crawl_spec, mode="local", seeds=None,
             small_window_local_max=1024):
    seeds = seeds or seed_urls(spec, 12)
    sim = GoldenSimulator(page_outlinks(spec), crawl_spec)
    golden = sim.run(seeds)

    eng = RayCrawler(
        corpus_dir=str(corpus_dir),
        outlinks_fn=page_outlinks(spec),
        spec=crawl_spec,
        run_dir=str(tmp_path / f"run-{mode}"),
        num_seen_shards=4,
        mode=mode,
        # mode tests pass 0: test-scale windows are all below the
        # small-window gate, which would silently reroute them to the
        # local body and leave the distributed path untested
        small_window_local_max=small_window_local_max,
    )
    eng.run(seeds=seeds)
    return golden, eng


def assert_parity(golden, eng):
    vt = eng.visits_table()
    if vt is None:
        assert golden.visits == []
        return
    import pyarrow.compute as pc

    vt = vt.take(pc.sort_indices(vt["visit_idx"]))
    eng_visits = list(zip(vt["visit_idx"].to_pylist(), vt["url"].to_pylist(),
                          vt["ts"].to_pylist()))
    assert eng_visits == golden.visits, (
        f"visit order diverged at "
        f"{next((i for i, (a, b) in enumerate(zip(eng_visits, golden.visits)) if a != b), '?')}"
    )
    assert eng.seen.sorted_urls() == sorted(golden.seen)
    eng_frontier = set(eng.sched.state_table()["url"].to_pylist())
    assert eng_frontier == golden.frontier


def test_parity_single_page_batches(small_world, tmp_path):
    spec, d = small_world
    cs = CrawlSpec(batch_size=1, wait_time=25.0, max_pages=60)
    golden, eng = run_pair(spec, d, tmp_path, cs)
    assert len(golden.visits) > 10
    assert_parity(golden, eng)


def test_parity_batched_with_filters(small_world, tmp_path):
    spec, d = small_world
    cs = CrawlSpec(
        batch_size=8,
        wait_time=25.0,
        max_pages=80,
        ignore_images=True,
        gather_ignore_regexes=(r"/cat/",),
        ignore_paths=("/item/",),
    )
    golden, eng = run_pair(spec, d, tmp_path, cs)
    assert len(golden.visits) > 5
    assert_parity(golden, eng)


def test_parity_politeness_multi_host(small_world, tmp_path):
    spec, d = small_world
    cs = CrawlSpec(
        batch_size=4,
        wait_time=25.0,
        host_delay=60.0,
        max_pages=60,
        allowed_hosts=("*",),
    )
    golden, eng = run_pair(spec, d, tmp_path, cs)
    assert len({u.split("/")[2] for _, u, _ in golden.visits}) > 1, "multi-host expected"
    assert_parity(golden, eng)


def test_parity_crawl_to_exhaustion(small_world, tmp_path):
    spec, d = small_world
    cs = CrawlSpec(batch_size=16, wait_time=25.0)
    golden, eng = run_pair(spec, d, tmp_path, cs)
    assert golden.frontier == set()
    assert_parity(golden, eng)


def test_parity_ray_mode(small_world, tmp_path, ray_session):
    spec, d = small_world
    cs = CrawlSpec(batch_size=32, wait_time=25.0, allowed_hosts=("*",), max_pages=120)
    golden, eng = run_pair(spec, d, tmp_path, cs, mode="ray",
                           small_window_local_max=0)
    assert_parity(golden, eng)


def test_parity_tasks_mode(small_world, tmp_path, ray_session):
    spec, d = small_world
    cs = CrawlSpec(batch_size=32, wait_time=25.0, allowed_hosts=("*",), max_pages=120)
    golden, eng = run_pair(spec, d, tmp_path, cs, mode="tasks",
                           small_window_local_max=0)
    assert_parity(golden, eng)


def test_cuckoo_seen_mode_crawl(small_world, tmp_path, ray_session):
    """At-scale seen mode (cuckoo filter + delta log): approximate —
    false positives can only DROP urls (never duplicate work), so the
    visit log is a subset of golden's and the seen set is within the
    filter's FPR of exact. At this scale collisions are ~0, so the run
    is usually bit-identical."""
    spec, d = small_world
    cs = CrawlSpec(batch_size=16, wait_time=25.0, allowed_hosts=("*",), max_pages=100)
    seeds = seed_urls(spec, 12)
    golden = GoldenSimulator(page_outlinks(spec), cs).run(seeds)
    eng = RayCrawler(str(d), page_outlinks(spec), cs, str(tmp_path / "ck"),
                     mode="tasks", seen_mode="cuckoo",
                     small_window_local_max=0)
    eng.run(seeds=seeds)
    eng_visited = set(eng.visits_table()["url"].to_pylist())
    golden_visited = {u for _, u, _ in golden.visits}
    assert eng_visited <= golden_visited
    assert len(eng_visited) >= 0.99 * len(golden_visited)
    assert abs(eng.seen.size() - len(golden.seen)) <= 0.01 * len(golden.seen)


@pytest.mark.parametrize("mode", ["ray", "tasks"])
def test_parity_mixed_gate_regime(small_world, tmp_path, ray_session, mode):
    """Round-4 advice: the production default gate (256) creates a MIXED
    regime — some windows run driver-side via the small-window gate,
    others through the distributed window body — and no test exercised
    both branches inside one crawl. Gate=16 with batch_size=32 does:
    the 12-seed first window (and politeness-collapsed stragglers) run
    local, full 32-page windows run distributed; the whole run must
    still match the golden simulator exactly."""
    import pyarrow.parquet as pq

    spec, d = small_world
    cs = CrawlSpec(batch_size=32, wait_time=25.0, allowed_hosts=("*",),
                   max_pages=150)
    golden, eng = run_pair(spec, d, tmp_path, cs, mode=mode,
                           small_window_local_max=16)
    # both branches must actually have run
    sizes = []
    for f in sorted((tmp_path / f"run-{mode}" / "metrics").glob("*.parquet")):
        sizes.extend(pq.read_table(f)["pages"].to_pylist())
    assert any(s <= 16 for s in sizes), f"no local window in {sizes}"
    assert any(s > 16 for s in sizes), f"no distributed window in {sizes}"
    assert_parity(golden, eng)
