"""Pinned-golden regression: the visit order / seen set / frontier of
three crawl configurations are CHECKED IN (tests/golden/crawl_golden.json,
produced by the simulator at round 1). Both the simulator and the engine
must keep matching the file — this catches semantic drift that
engine-vs-sim parity alone cannot (both drifting together).

Regenerate deliberately (and only with a documented semantics change):
see the generator snippet in the git history of this file's commit.
"""

import json
import pathlib

import pytest

from kryptone_ray.corpus.store import write_corpus
from kryptone_ray.corpus.synth import CorpusSpec, make_corpus_table, page_outlinks
from kryptone_ray.engine.crawl import RayCrawler
from kryptone_ray.sim.golden import CrawlSpec, GoldenSimulator
from kryptone_ray.state.robots import synthetic_robots_provider
from kryptone_ray.utils.xxh64 import xxh64

GOLDEN = json.loads(
    (pathlib.Path(__file__).parent / "golden" / "crawl_golden.json").read_text()
)


def _spec():
    c = GOLDEN["corpus"]
    return CorpusSpec(n_rows=c["n_rows"], n_hosts=c["n_hosts"], seed=c["seed"])


def _crawl_specs(spec):
    return {
        "plain": CrawlSpec(batch_size=8, wait_time=25.0, allowed_hosts=("*",),
                           max_pages=80),
        "filters": CrawlSpec(batch_size=4, wait_time=25.0, allowed_hosts=("*",),
                             max_pages=60, ignore_images=True,
                             gather_ignore_regexes=(r"/cat/",),
                             ignore_paths=("/item/",)),
        "politeness_robots": CrawlSpec(batch_size=6, wait_time=25.0,
                                       host_delay=40.0, allowed_hosts=("*",),
                                       max_pages=60,
                                       robots_provider=synthetic_robots_provider(spec)),
    }


def _digest(urls) -> str:
    return f"{xxh64('|'.join(sorted(urls))):016x}"


@pytest.mark.parametrize("case", sorted(GOLDEN["cases"]))
def test_simulator_matches_pinned_golden(case):
    spec = _spec()
    cs = _crawl_specs(spec)[case]
    want = GOLDEN["cases"][case]
    got = GoldenSimulator(page_outlinks(spec), cs).run(want["seeds"])
    assert [[i, u, t] for i, u, t in got.visits] == want["visits"]
    assert len(got.seen) == want["seen_count"]
    assert _digest(got.seen) == want["seen_digest"]
    assert len(got.frontier) == want["frontier_count"]
    assert _digest(got.frontier) == want["frontier_digest"]


@pytest.mark.parametrize("case", sorted(GOLDEN["cases"]))
def test_engine_matches_pinned_golden(case, tmp_path):
    spec = _spec()
    d = tmp_path / "corpus"
    write_corpus(make_corpus_table(spec), d, num_shards=2)
    cs = _crawl_specs(spec)[case]
    want = GOLDEN["cases"][case]
    eng = RayCrawler(str(d), page_outlinks(spec), cs, str(tmp_path / "run"),
                     mode="local")
    eng.run(seeds=want["seeds"])
    import pyarrow.compute as pc

    vt = eng.visits_table()
    vt = vt.take(pc.sort_indices(vt["visit_idx"]))
    got = [[i, u, t] for i, u, t in zip(vt["visit_idx"].to_pylist(),
                                        vt["url"].to_pylist(),
                                        vt["ts"].to_pylist())]
    assert got == want["visits"]
    assert _digest(eng.seen.sorted_urls()) == want["seen_digest"]
    assert _digest(eng.sched.state_table()["url"].to_pylist()) == want["frontier_digest"]
