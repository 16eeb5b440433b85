"""robots.txt extension: parser semantics, validator integration,
crawl-delay politeness, and engine-vs-golden parity with robots on."""

import pytest

from kryptone_ray.sim.golden import CrawlSpec, GoldenSimulator
from kryptone_ray.stages.validate import ROBOTS, ValidationConfig, validate_batch
from kryptone_ray.state.robots import RobotsCache, parse_robots, synthetic_robots_provider


ROBOTS_TXT = """
# comment
User-agent: googlebot
Disallow: /private/

User-agent: *
Disallow: /cat/
Allow: /cat/open/
Crawl-delay: 30
Disallow: /exact$
"""


def test_parse_groups_and_agent_selection():
    star = parse_robots(ROBOTS_TXT, agent="*")
    assert star.crawl_delay == 30.0
    assert not star.allowed("/cat/x")
    assert star.allowed("/cat/open/y")  # longest-match Allow wins
    assert star.allowed("/other")
    assert not star.allowed("/exact")
    assert star.allowed("/exact/sub")  # $-anchored

    goog = parse_robots(ROBOTS_TXT, agent="googlebot")
    assert not goog.allowed("/private/x")
    assert goog.allowed("/cat/x")  # googlebot group has no /cat/ rule


def test_parse_empty_and_none():
    assert parse_robots(None).allowed("/anything")
    assert parse_robots("").allowed("/x")
    assert parse_robots("User-agent: *\nDisallow:").allowed("/x")  # allow-all


def test_robots_cache_and_synthetic_provider():
    from kryptone_ray.corpus.synth import CorpusSpec

    spec = CorpusSpec(n_rows=10, n_hosts=30, seed=42)
    cache = RobotsCache(synthetic_robots_provider(spec))
    assert not cache.allowed("h0005.corpus.test", "/cat/1/item/2")
    assert cache.allowed("h0005.corpus.test", "/p/1")
    assert cache.crawl_delay("h0007.corpus.test") is not None
    assert cache.crawl_delay("h0001.corpus.test") is None
    # evilbot-only disallow does not affect '*'
    assert cache.allowed("h0011.corpus.test", "/p/1")


def test_validator_robots_verdict():
    provider = lambda host: "User-agent: *\nDisallow: /blocked/"
    cfg = ValidationConfig(start_url="http://example.com/",
                           robots_provider=provider)
    t = validate_batch(
        ["http://example.com/blocked/1", "http://example.com/ok"], cfg, 1
    )
    v = dict(zip(t["url"].to_pylist(), t["verdict"].to_pylist()))
    assert v["http://example.com/blocked/1"] == ROBOTS
    assert v["http://example.com/ok"] == "candidate"


def test_parity_with_robots(tmp_path):
    from kryptone_ray.corpus.store import write_corpus
    from kryptone_ray.corpus.synth import CorpusSpec, make_corpus_table, seed_urls
    from kryptone_ray.engine.crawl import RayCrawler
    from tests.test_crawl_parity import assert_parity, page_outlinks

    spec = CorpusSpec(n_rows=300, n_hosts=12, seed=42)
    d = tmp_path / "corpus"
    write_corpus(make_corpus_table(spec), d, num_shards=4)
    cs = CrawlSpec(
        batch_size=6,
        wait_time=25.0,
        allowed_hosts=("*",),
        max_pages=80,
        robots_provider=synthetic_robots_provider(spec),
    )
    seeds = seed_urls(spec, 8)
    golden = GoldenSimulator(page_outlinks(spec), cs).run(seeds)
    eng = RayCrawler(str(d), page_outlinks(spec), cs, str(tmp_path / "run"),
                     mode="local")
    eng.run(seeds=seeds)
    assert len(golden.visits) > 10
    assert_parity(golden, eng)
    # robots actually bit: some /cat/ url of a %5 host must be seen-not-visited
    blocked = [
        u for u in golden.seen
        if "/cat/" in u and u.split("//")[1].split(".")[0] in
        {f"h{i:04d}" for i in range(0, 12, 5)}
    ]
    visited = {u for _, u, _ in golden.visits}
    assert blocked, "expected some robots-disallowed urls in the seen set"
    assert not (set(blocked) & visited)


def test_parity_with_robots_tasks_mode(tmp_path, ray_session):
    from kryptone_ray.corpus.store import write_corpus
    from kryptone_ray.corpus.synth import CorpusSpec, make_corpus_table, seed_urls
    from kryptone_ray.engine.crawl import RayCrawler
    from tests.test_crawl_parity import assert_parity, page_outlinks

    spec = CorpusSpec(n_rows=300, n_hosts=12, seed=42)
    d = tmp_path / "corpus"
    write_corpus(make_corpus_table(spec), d, num_shards=4)
    cs = CrawlSpec(
        batch_size=24,
        wait_time=25.0,
        allowed_hosts=("*",),
        max_pages=96,
        robots_provider=synthetic_robots_provider(spec),
    )
    seeds = seed_urls(spec, 8)
    golden = GoldenSimulator(page_outlinks(spec), cs).run(seeds)
    eng = RayCrawler(str(d), page_outlinks(spec), cs, str(tmp_path / "run"),
                     mode="tasks", small_window_local_max=0)
    eng.run(seeds=seeds)
    assert_parity(golden, eng)
