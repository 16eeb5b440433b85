"""Round-2 lifecycle-hook surface (reference base.py:797-831) + refresh
mode (base.py:685-691 step 4, 1162-1164): every facade hook fires at its
documented point in the window lifecycle, and refresh re-visits prior
pages while discovering only never-seen urls — engine vs simulator
parity.
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc
import pytest

from kryptone_ray.corpus.store import write_corpus
from kryptone_ray.corpus.synth import CorpusSpec, make_corpus_table, seed_urls
from kryptone_ray.crawler import SiteCrawler
from kryptone_ray.engine.crawl import RayCrawler
from kryptone_ray.sim.golden import CrawlSpec, GoldenSimulator
from tests.test_crawl_parity import page_outlinks


@pytest.fixture(scope="module")
def world(tmp_path_factory):
    spec = CorpusSpec(n_rows=300, n_hosts=4, seed=42)
    d = tmp_path_factory.mktemp("corpus")
    write_corpus(make_corpus_table(spec), d, num_shards=4, row_group_size=64)
    return spec, d


class RecordingCrawler(SiteCrawler):
    class Meta:
        domains = ["*"]

    def __init__(self, *a, **kw):
        self.events: list[tuple[str, object]] = []
        super().__init__(*a, **kw)

    def post_navigation_actions(self, pages):
        self.events.append(("post_nav", pages["url"].to_pylist()))

    def current_page_actions(self, pages):
        self.events.append(("page_actions", len(pages)))
        return pa.table({"url": pages["url"]})

    def before_next_page_actions(self, visited_urls):
        self.events.append(("before_next", list(visited_urls)))

    def after_data_save(self, items):
        self.events.append(("after_save", len(items)))


def test_all_hooks_fire_in_order(world, tmp_path):
    spec, d = world
    seeds = seed_urls(spec, 4)
    c = RecordingCrawler(str(d), page_outlinks(spec), str(tmp_path / "run"),
                         batch_size=8, max_pages=24, mode="local")
    c.start(start_urls=seeds)

    kinds = [k for k, _ in c.events]
    assert "post_nav" in kinds and "page_actions" in kinds
    assert "before_next" in kinds and "after_save" in kinds
    # per window: post_nav → page_actions → after_save → before_next
    first_window = kinds[: kinds.index("before_next") + 1]
    assert first_window.index("post_nav") < first_window.index("page_actions")
    assert first_window.index("page_actions") < first_window.index("after_save")
    # before_next receives the window's visited urls — must match the log
    vt = c.visits().take(pc.sort_indices(c.visits()["visit_idx"]))
    visited = vt["url"].to_pylist()
    hook_urls = [u for k, us in c.events if k == "before_next" for u in us]
    assert hook_urls == visited
    # items written by current_page_actions landed on disk
    assert list((tmp_path / "run" / "items").glob("batch-*.parquet"))


class FailingCrawler(SiteCrawler):
    class Meta:
        domains = ["*"]

    failures: list = []

    def current_page_actions(self, pages):
        raise RuntimeError("boom in page actions")

    def after_fail(self, exc):
        type(self).failures.append(repr(exc))


def test_after_fail_fires_and_reraises(world, tmp_path):
    spec, d = world
    FailingCrawler.failures.clear()
    c = FailingCrawler(str(d), page_outlinks(spec), str(tmp_path / "run"),
                       batch_size=8, max_pages=16, mode="local")
    with pytest.raises(RuntimeError, match="boom in page actions"):
        c.start(start_urls=seed_urls(spec, 4))
    assert FailingCrawler.failures and "boom" in FailingCrawler.failures[0]


def test_refresh_mode_engine_matches_simulator(world, tmp_path):
    """Phase 1: normal crawl. Phase 2: content changed (outlinks_fn now
    emits extra urls) — refresh re-visits the crawled pages and must
    visit EXACTLY the new urls afterwards, in the same order as the
    simulator's refresh run."""
    spec, d = world
    seeds = seed_urls(spec, 4)
    cs = CrawlSpec(batch_size=8, wait_time=25.0, allowed_hosts=("*",),
                   max_pages=40)
    base_links = page_outlinks(spec)

    run_dir = tmp_path / "run"
    eng = RayCrawler(str(d), base_links, cs, str(run_dir), mode="local")
    eng.run(seeds=seeds)
    golden1 = GoldenSimulator(base_links, cs).run(seeds)
    assert eng.seen.sorted_urls() == sorted(golden1.seen)

    vt = eng.visits_table().take(pc.sort_indices(eng.visits_table()["visit_idx"]))
    pages = list(dict.fromkeys(vt["url"].to_pylist()))

    # "new content": every ORIGINAL corpus page now also links to one
    # extra url. The new pages don't chain further, and pages without
    # base outlinks (fetch misses — the engine never expands those)
    # stay linkless so sim and engine see the same link universe.
    def changed_links(u, _base=base_links):
        base = list(_base(u))
        if u.endswith("?v=2") or not base:
            return []
        return base + [u + "?v=2"]

    cs2 = CrawlSpec(batch_size=8, wait_time=25.0, allowed_hosts=("*",),
                    max_pages=None)
    sim2 = GoldenSimulator(changed_links, cs2)
    golden2 = sim2.run(seeds, refresh_pages=pages, prior_seen=golden1.seen)

    run2 = tmp_path / "run2"
    eng2 = RayCrawler(str(d), changed_links, cs2, str(run2), mode="local")
    # carry the prior seen state (what resume() would restore)
    from kryptone_ray.utils.xxh64 import xxh64_batch

    prior = eng.seen.sorted_urls()
    eng2.seen.check_and_add(xxh64_batch(prior), prior)
    eng2.run_refresh(pages, start_url=seeds[-1])

    vt2 = eng2.visits_table().take(
        pc.sort_indices(eng2.visits_table()["visit_idx"]))
    eng_visits = list(zip(vt2["visit_idx"].to_pylist(), vt2["url"].to_pylist(),
                          vt2["ts"].to_pylist()))
    assert eng_visits == golden2.visits
    assert eng2.seen.sorted_urls() == sorted(golden2.seen)
    # the refresh discovered the ?v=2 urls and nothing previously seen
    new_urls = [u for _, u, _ in golden2.visits if u not in golden1.seen]
    assert new_urls and all(u.endswith("?v=2") for u in new_urls)


def test_facade_refresh_reads_prior_visits(world, tmp_path):
    spec, d = world
    seeds = seed_urls(spec, 4)

    class C(SiteCrawler):
        class Meta:
            domains = ["*"]

    run_dir = tmp_path / "run"
    c1 = C(str(d), page_outlinks(spec), str(run_dir), batch_size=8,
           max_pages=24, mode="local")
    c1.start(start_urls=seeds)
    n_seen = len(c1.seen_urls)

    # same facade instance refreshes in place: no new content → pages
    # re-visited, zero new discoveries
    res = c1.refresh()
    assert res["pages_visited"] >= 24
    assert len(c1.seen_urls) == n_seen


def test_hooks_run_in_task_mode(world, tmp_path, ray_session):
    """current_page_actions + after_data_save execute INSIDE ray tasks
    (WindowHooks pickled to workers): items parquet appears per window
    even though no driver-side callback could have written it."""
    spec, d = world

    # defined in-closure so cloudpickle serializes it BY VALUE (a test
    # module isn't importable from ray workers)
    def emit_items(pages):
        import pyarrow as _pa

        return _pa.table({"url": pages["url"], "mean": pages["px_mean"]})

    cs = CrawlSpec(batch_size=16, wait_time=25.0, allowed_hosts=("*",),
                   max_pages=48)
    eng = RayCrawler(str(d), page_outlinks(spec), cs, str(tmp_path / "run"),
                     mode="tasks", page_actions=emit_items,
                     small_window_local_max=0)
    eng.run(seeds=seed_urls(spec, 6))
    items = sorted((tmp_path / "run" / "items").glob("batch-*.parquet"))
    assert items
    import pyarrow.parquet as pq

    total = sum(pq.read_metadata(f).num_rows for f in items)
    assert total == 48  # one item row per visited page


def test_fresh_facade_refresh_restores_seen_from_checkpoint(world, tmp_path):
    """A NEW facade instance over an existing run_dir must restore the
    seen state before refreshing — otherwise every url would count as
    newly discovered."""
    spec, d = world
    seeds = seed_urls(spec, 4)

    class C(SiteCrawler):
        class Meta:
            domains = ["*"]

    run_dir = tmp_path / "run"
    # run to COMPLETION (frontier drained) — refresh's precondition;
    # resuming an unfinished run re-enqueues its leftover frontier,
    # which is continuation, not refresh
    c1 = C(str(d), page_outlinks(spec), str(run_dir), batch_size=64,
           mode="local")
    c1.start(start_urls=seeds, checkpoint_every=1)
    n_seen = len(c1.seen_urls)
    assert c1.engine.sched.size() == 0

    # brand-new facade (fresh process analog): empty in-memory seen set
    c2 = C(str(d), page_outlinks(spec), str(run_dir), batch_size=64,
           mode="local")
    assert c2.engine.seen.size() == 0
    c2.refresh()
    # refresh revisited pages but discovered NOTHING new
    assert len(c2.seen_urls) == n_seen


def test_refresh_with_max_pages_budget_matches_simulator(world, tmp_path):
    """The max_pages budget applies to the REFRESH run itself (counted
    from zero, like the simulator) — a refresh after a budget-limited
    crawl must not be a silent no-op."""
    spec, d = world
    seeds = seed_urls(spec, 4)
    cs = CrawlSpec(batch_size=8, wait_time=25.0, allowed_hosts=("*",),
                   max_pages=24)
    base_links = page_outlinks(spec)

    eng = RayCrawler(str(d), base_links, cs, str(tmp_path / "run"),
                     mode="local")
    eng.run(seeds=seeds)
    assert eng.pages_visited == 24
    vt = eng.visits_table().take(pc.sort_indices(eng.visits_table()["visit_idx"]))
    pages = list(dict.fromkeys(vt["url"].to_pylist()))

    golden = GoldenSimulator(base_links, cs).run(seeds)
    sim_refresh = GoldenSimulator(base_links, cs).run(
        seeds, refresh_pages=pages, prior_seen=golden.seen)
    # simulator refresh visits min(len(pages), max_pages) pages
    assert len(sim_refresh.visits) == 24

    n_before = len(eng.visits_table())
    eng.run_refresh(list(pages) + [pages[0]])  # duplicate must be dropped
    assert eng.pages_visited == 24  # budget restarted, fully used
    assert len(eng.visits_table()) == n_before + 24
