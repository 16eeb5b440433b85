"""Cross-window pipelining A/B: with pipelining ON (default) window N+1's
fetch+decode+validate rides under window N's parquet bookkeeping in a
background thread. The pop point is unchanged (after window N's ingest),
so EVERYTHING observable — visit order, seen set, frontier, lineage,
per-window metrics, error counts — must be identical to the sequential
loop (KR_BENCH_PIPELINE_WINDOWS=0). VERDICT r3 #9."""

import pyarrow.compute as pc
import pytest

from kryptone_ray.corpus.store import write_corpus
from kryptone_ray.corpus.synth import (
    CorpusSpec,
    make_corpus_table,
    page_outlinks,
    seed_urls,
)
from kryptone_ray.engine.crawl import RayCrawler
from kryptone_ray.sim.golden import CrawlSpec, GoldenSimulator


@pytest.fixture(scope="module")
def world(tmp_path_factory):
    spec = CorpusSpec(n_rows=500, n_hosts=8, seed=77)
    d = tmp_path_factory.mktemp("corpus_pipe")
    write_corpus(make_corpus_table(spec), d, num_shards=4, row_group_size=64)
    return spec, d


def _run(spec, corpus_dir, run_dir, crawl_spec, *, mode="local",
         pipelined, checkpoint_every=0, gate=1024, monkeypatch):
    if pipelined:
        monkeypatch.delenv("KR_BENCH_PIPELINE_WINDOWS", raising=False)
    else:
        monkeypatch.setenv("KR_BENCH_PIPELINE_WINDOWS", "0")
    eng = RayCrawler(
        corpus_dir=str(corpus_dir),
        outlinks_fn=page_outlinks(spec),
        spec=crawl_spec,
        run_dir=str(run_dir),
        num_seen_shards=4,
        mode=mode,
        small_window_local_max=gate,
    )
    eng.run(seeds=seed_urls(spec, 10), checkpoint_every=checkpoint_every)
    return eng


def _sorted_visits(eng):
    vt = eng.visits_table()
    assert vt is not None
    vt = vt.take(pc.sort_indices(vt["visit_idx"]))
    return vt.select(sorted(vt.column_names))


def _metrics_rows(eng):
    import pyarrow.parquet as pq

    files = sorted((eng.run_dir / "metrics").glob("batch-*.parquet"))
    rows = []
    for f in files:
        t = pq.read_table(f)
        rows.extend(
            tuple(t[c][i].as_py() for c in sorted(t.column_names))
            for i in range(len(t))
        )
    return rows


def _assert_same(a, b):
    assert _sorted_visits(a).equals(_sorted_visits(b))
    assert a.seen.sorted_urls() == b.seen.sorted_urls()
    assert (set(a.sched.state_table()["url"].to_pylist())
            == set(b.sched.state_table()["url"].to_pylist()))
    assert _metrics_rows(a) == _metrics_rows(b)
    assert a.count_errors() == b.count_errors()
    assert a.metrics()["virtual_clock"] == b.metrics()["virtual_clock"]


def test_pipelined_equals_sequential_local(world, tmp_path, monkeypatch):
    spec, d = world
    cs = CrawlSpec(batch_size=4, wait_time=25.0, host_delay=60.0,
                   max_pages=120, allowed_hosts=("*",))
    on = _run(spec, d, tmp_path / "on", cs, pipelined=True,
              monkeypatch=monkeypatch)
    off = _run(spec, d, tmp_path / "off", cs, pipelined=False,
               monkeypatch=monkeypatch)
    # multi-window run (the pipeline must have engaged: >2 windows)
    assert len(_metrics_rows(on)) > 2
    _assert_same(on, off)
    # and both still match the golden simulator
    sim = GoldenSimulator(page_outlinks(spec), cs)
    golden = sim.run(seed_urls(spec, 10))
    vt = _sorted_visits(on)
    assert list(zip(vt["visit_idx"].to_pylist(), vt["url"].to_pylist(),
                    vt["ts"].to_pylist())) == golden.visits


def test_pipelined_with_checkpoints(world, tmp_path, monkeypatch):
    """Checkpoint windows skip the early pop, so a checkpoint captures
    the frontier BEFORE the next window is selected — resumable state is
    unchanged by pipelining."""
    spec, d = world
    cs = CrawlSpec(batch_size=4, wait_time=25.0, host_delay=60.0,
                   max_pages=100, allowed_hosts=("*",))
    on = _run(spec, d, tmp_path / "on", cs, pipelined=True,
              checkpoint_every=3, monkeypatch=monkeypatch)
    off = _run(spec, d, tmp_path / "off", cs, pipelined=False,
               checkpoint_every=3, monkeypatch=monkeypatch)
    _assert_same(on, off)


def test_pipelined_mixed_regime_tasks(world, tmp_path, monkeypatch):
    """tasks mode with a gate that splits windows: small windows prefetch
    through the local body, bulk windows fall back to the synchronous
    distributed path — the mix must equal the fully sequential run."""
    spec, d = world
    cs = CrawlSpec(batch_size=16, wait_time=25.0, host_delay=30.0,
                   max_pages=120, allowed_hosts=("*",))
    on = _run(spec, d, tmp_path / "on", cs, mode="tasks", pipelined=True,
              gate=3, monkeypatch=monkeypatch)
    off = _run(spec, d, tmp_path / "off", cs, mode="tasks", pipelined=False,
               gate=3, monkeypatch=monkeypatch)
    import pyarrow.parquet as pq

    window_sizes = [
        pq.read_table(f, columns=["pages"])["pages"][0].as_py()
        for f in sorted((on.run_dir / "metrics").glob("batch-*.parquet"))
    ]
    assert any(s <= 3 for s in window_sizes), "no window took the local path"
    assert any(s > 3 for s in window_sizes), "no window took the task path"
    _assert_same(on, off)
