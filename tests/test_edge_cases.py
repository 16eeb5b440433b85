"""Edge-case robustness: empty inputs, all-invalid seeds, missing pages,
stub contracts, sharded-scheduler resume."""

import pyarrow as pa
import pytest

from kryptone_ray.corpus.store import CorpusReader, write_corpus
from kryptone_ray.corpus.synth import CorpusSpec, make_corpus_table, page_outlinks, seed_urls
from kryptone_ray.engine.crawl import RayCrawler
from kryptone_ray.sim.golden import CrawlSpec, GoldenSimulator
from kryptone_ray.stages.validate import ValidationConfig, validate_batch


@pytest.fixture(scope="module")
def world(tmp_path_factory):
    spec = CorpusSpec(n_rows=200, n_hosts=4, seed=42)
    d = tmp_path_factory.mktemp("edge")
    write_corpus(make_corpus_table(spec), d / "corpus", num_shards=2)
    return spec, d


def test_validate_empty_batch():
    t = validate_batch([], ValidationConfig(start_url="http://e.com/"), 0)
    assert len(t) == 0
    assert t.schema.names == ["url", "host", "url_hash", "verdict"]


def test_all_invalid_seeds_terminate_cleanly(world, tmp_path):
    spec, d = world
    cs = CrawlSpec(batch_size=8, wait_time=25.0)  # start-netloc-only domain
    seeds = ["", "http://cross-domain.example/x", "#", "http://e.com/a#frag"]
    eng = RayCrawler(str(d / "corpus"), page_outlinks(spec), cs,
                     str(tmp_path / "r"), mode="local")
    m = eng.run(seeds=seeds)
    assert m["pages_visited"] == 0
    assert m["frontier_size"] == 0
    golden = GoldenSimulator(page_outlinks(spec), cs).run(seeds)
    assert eng.seen.sorted_urls() == sorted(golden.seen)


def test_crawl_of_entirely_missing_pages(world, tmp_path):
    spec, d = world
    cs = CrawlSpec(batch_size=4, wait_time=25.0, allowed_hosts=("*",), max_pages=8)
    seeds = [f"https://h0001.corpus.test/p/{900000 + i}" for i in range(4)]
    eng = RayCrawler(str(d / "corpus"), page_outlinks(spec), cs,
                     str(tmp_path / "rm"), mode="local")
    eng.run(seeds=seeds)
    vt = eng.visits_table()
    assert set(vt["status"].to_pylist()) == {"missing"}
    assert eng.count_errors() == 4


def test_corpus_reader_missing_dir(tmp_path):
    with pytest.raises(FileNotFoundError):
        CorpusReader(tmp_path / "nope")


def test_take_urls_empty_list(world):
    spec, d = world
    r = CorpusReader(d / "corpus")
    assert len(r.take_urls([])) == 0


def test_multimodal_stub_contracts():
    from kryptone_ray.pipelines.multimodal import AudioDecodeActor, VideoFrameSampleActor

    with pytest.raises(NotImplementedError):
        AudioDecodeActor()(pa.table({"bytes": pa.array([b"x"], type=pa.binary())}))
    with pytest.raises(NotImplementedError):
        VideoFrameSampleActor()(pa.table({"bytes": pa.array([b"x"], type=pa.binary())}))


def test_resume_with_sharded_scheduler(world, tmp_path, ray_session):
    spec, d = world
    cs = CrawlSpec(batch_size=8, wait_time=25.0, allowed_hosts=("*",), max_pages=48)
    seeds = seed_urls(spec, 4)
    golden = GoldenSimulator(page_outlinks(spec), cs).run(seeds)
    run_dir = tmp_path / "rs"
    eng1 = RayCrawler(str(d / "corpus"), page_outlinks(spec), cs, str(run_dir),
                      mode="tasks", scheduler_shards=2,
                      small_window_local_max=0)
    eng1.run(seeds=seeds, checkpoint_every=2, max_batches=2)
    eng2 = RayCrawler(str(d / "corpus"), page_outlinks(spec), cs, str(run_dir),
                      mode="tasks", scheduler_shards=2,
                      small_window_local_max=0)
    eng2.resume(seeds)
    eng2.run(seeds=None)
    assert eng2.seen.sorted_urls() == sorted(golden.seen)
    import pyarrow.compute as pc

    vt = eng2.visits_table()
    vt = vt.take(pc.sort_indices(vt["visit_idx"]))
    assert list(zip(vt["visit_idx"].to_pylist(), vt["url"].to_pylist(),
                    vt["ts"].to_pylist())) == golden.visits


def test_seed_larger_than_max_pages(world, tmp_path):
    spec, d = world
    cs = CrawlSpec(batch_size=64, wait_time=25.0, allowed_hosts=("*",), max_pages=5)
    seeds = seed_urls(spec, 30)
    golden = GoldenSimulator(page_outlinks(spec), cs).run(seeds)
    eng = RayCrawler(str(d / "corpus"), page_outlinks(spec), cs,
                     str(tmp_path / "mp"), mode="local")
    eng.run(seeds=seeds)
    assert eng.pages_visited == 5
    assert set(eng.sched.state_table()["url"].to_pylist()) == golden.frontier