"""SiteCrawler facade: the reference's subclass-with-Meta surface driving
the distributed engine, including crawl=False and page actions."""

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from kryptone_ray.corpus.store import write_corpus
from kryptone_ray.corpus.synth import CorpusSpec, make_corpus_table, page_outlinks, seed_urls
from kryptone_ray.crawler import SiteCrawler
from kryptone_ray.sim.golden import CrawlSpec, GoldenSimulator
from kryptone_ray.stages.validate import UrlIgnoreTest


@pytest.fixture(scope="module")
def world(tmp_path_factory):
    spec = CorpusSpec(n_rows=300, n_hosts=4, seed=42)
    d = tmp_path_factory.mktemp("sc")
    write_corpus(make_corpus_table(spec), d / "corpus", num_shards=2)
    return spec, d


def test_meta_driven_crawl_matches_golden(world, tmp_path, ray_session):
    spec, d = world
    seeds = seed_urls(spec, 6)

    class MySpider(SiteCrawler):
        class Meta:
            start_urls = seeds
            domains = ["*"]
            ignore_images = True
            url_gather_ignore_tests = [r"/cat/"]

    s = MySpider(str(d / "corpus"), page_outlinks(spec), str(tmp_path / "r1"),
                 batch_size=8, max_pages=60, mode="local")
    m = s.start()
    assert m["pages_visited"] == 60

    cs = CrawlSpec(batch_size=8, wait_time=25.0, allowed_hosts=("*",),
                   max_pages=60, ignore_images=True,
                   gather_ignore_regexes=(r"/cat/",))
    golden = GoldenSimulator(page_outlinks(spec), cs).run(seeds)
    assert s.seen_urls == sorted(golden.seen)
    vt = s.visits()
    import pyarrow.compute as pc

    vt = vt.take(pc.sort_indices(vt["visit_idx"]))
    assert list(zip(vt["visit_idx"].to_pylist(), vt["url"].to_pylist(),
                    vt["ts"].to_pylist())) == golden.visits


def test_crawl_false_visits_seeds_only(world, tmp_path):
    spec, d = world
    seeds = seed_urls(spec, 6)

    class NoCrawl(SiteCrawler):
        class Meta:
            start_urls = seeds
            domains = ["*"]
            crawl = False

    s = NoCrawl(str(d / "corpus"), page_outlinks(spec), str(tmp_path / "r2"),
                batch_size=8, mode="local")
    s.start()
    # seeds only — nothing expanded
    assert s.metrics()["pages_visited"] == len(set(seeds))
    assert s.metrics()["frontier_size"] == 0
    cs = CrawlSpec(batch_size=8, wait_time=25.0, allowed_hosts=("*",), crawl=False)
    golden = GoldenSimulator(page_outlinks(spec), cs).run(seeds)
    assert s.seen_urls == sorted(golden.seen)


def test_page_actions_hook(world, tmp_path):
    spec, d = world
    seeds = seed_urls(spec, 4)

    class WithActions(SiteCrawler):
        class Meta:
            start_urls = seeds
            domains = ["*"]
            url_ignore_tests = [UrlIgnoreTest("cat", paths=("/cat/",))]

        def current_page_actions(self, pages):
            ok = pages.filter(pa.compute.equal(pages["status"], pa.scalar("ok")))
            return ok.select(["url", "caption"])

    s = WithActions(str(d / "corpus"), page_outlinks(spec), str(tmp_path / "r3"),
                    batch_size=8, max_pages=24, mode="local")
    s.start()
    files = sorted((tmp_path / "r3" / "items").glob("batch-*.parquet"))
    assert files
    items = pa.concat_tables([pq.read_table(f) for f in files])
    assert items.schema.names == ["url", "caption"]
    # ignore test held: no /cat/ url was ever visited
    assert not any("/cat/" in u for u in s.visits()["url"].to_pylist())
