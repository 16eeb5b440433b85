"""Checkpoint/resume (FIXTURES.md F6; reference contract base.py:1213-1273):
a killed run resumes from the last manifest, does NOT re-fetch completed
batches, and finishes with results identical to an uninterrupted run."""

import pyarrow.compute as pc
import pytest

from kryptone_ray.corpus.store import write_corpus
from kryptone_ray.corpus.synth import CorpusSpec, make_corpus_table, seed_urls
from kryptone_ray.engine.crawl import RayCrawler
from kryptone_ray.sim.golden import CrawlSpec, GoldenSimulator
from tests.test_crawl_parity import page_outlinks


@pytest.fixture(scope="module")
def world(tmp_path_factory):
    spec = CorpusSpec(n_rows=300, n_hosts=4, seed=42)
    d = tmp_path_factory.mktemp("corpus")
    write_corpus(make_corpus_table(spec), d, num_shards=4, row_group_size=64)
    return spec, d


def test_kill_and_resume_matches_golden(world, tmp_path):
    spec, d = world
    cs = CrawlSpec(batch_size=8, wait_time=25.0, allowed_hosts=("*",), max_pages=96)
    seeds = seed_urls(spec, 6)
    golden = GoldenSimulator(page_outlinks(spec), cs).run(seeds)

    run_dir = tmp_path / "run"
    # phase 1: crawl 6 batches with a checkpoint every 2, then "die"
    eng1 = RayCrawler(str(d), page_outlinks(spec), cs, str(run_dir), mode="local")
    eng1.run(seeds=seeds, checkpoint_every=2, max_batches=6)
    assert (run_dir / "checkpoint" / "manifest.json").exists()
    ckpt_batches = eng1.sched.clock_state()["batch_counter"]
    assert ckpt_batches == 6  # checkpoint at 6 (every 2)

    # phase 2: fresh engine resumes and finishes
    eng2 = RayCrawler(str(d), page_outlinks(spec), cs, str(run_dir), mode="local")
    eng2.resume(seeds)
    assert eng2.sched.clock_state()["batch_counter"] == 6
    eng2.run(seeds=None)

    vt = eng2.visits_table().take(
        pc.sort_indices(eng2.visits_table()["visit_idx"])
    )
    eng_visits = list(
        zip(vt["visit_idx"].to_pylist(), vt["url"].to_pylist(), vt["ts"].to_pylist())
    )
    assert eng_visits == golden.visits
    assert eng2.seen.sorted_urls() == sorted(golden.seen)
    assert set(eng2.sched.state_table()["url"].to_pylist()) == golden.frontier

    # no re-fetch: batches 0..5 ran only in phase 1 (their log files
    # predate the resume and were not rewritten)
    batch_ids = sorted(
        int(f.stem.split("-")[1]) for f in (run_dir / "visits").glob("batch-*.parquet")
    )
    assert batch_ids == sorted(set(batch_ids)), "a batch was fetched twice"


def test_kill_and_resume_tasks_mode(world, tmp_path, ray_session):
    """Resume with the distributed state (seen-shard actors + pipelined
    ingest) — same golden end state."""
    spec, d = world
    cs = CrawlSpec(batch_size=16, wait_time=25.0, allowed_hosts=("*",), max_pages=96)
    seeds = seed_urls(spec, 6)
    golden = GoldenSimulator(page_outlinks(spec), cs).run(seeds)

    run_dir = tmp_path / "run-tasks"
    eng1 = RayCrawler(str(d), page_outlinks(spec), cs, str(run_dir), mode="tasks",
                      small_window_local_max=0)
    eng1.run(seeds=seeds, checkpoint_every=2, max_batches=4)
    eng2 = RayCrawler(str(d), page_outlinks(spec), cs, str(run_dir), mode="tasks",
                      small_window_local_max=0)
    eng2.resume(seeds)
    eng2.run(seeds=None)
    assert eng2.seen.sorted_urls() == sorted(golden.seen)
    vt = eng2.visits_table()
    import pyarrow.compute as pc

    vt = vt.take(pc.sort_indices(vt["visit_idx"]))
    assert list(zip(vt["visit_idx"].to_pylist(), vt["url"].to_pylist(),
                    vt["ts"].to_pylist())) == golden.visits
    # metrics log covers every window
    mfiles = sorted((run_dir / "metrics").glob("batch-*.parquet"))
    assert len(mfiles) == eng2.sched.clock_state()["batch_counter"]


def test_resume_discards_post_checkpoint_logs(world, tmp_path):
    spec, d = world
    cs = CrawlSpec(batch_size=8, wait_time=25.0, allowed_hosts=("*",), max_pages=80)
    seeds = seed_urls(spec, 6)
    run_dir = tmp_path / "run2"
    eng1 = RayCrawler(str(d), page_outlinks(spec), cs, str(run_dir), mode="local")
    # checkpoint every 4 but run 6 batches → 2 uncheckpointed batches
    eng1.run(seeds=seeds, checkpoint_every=4, max_batches=6)
    orphan = [
        int(f.stem.split("-")[1]) for f in (run_dir / "visits").glob("batch-*.parquet")
        if int(f.stem.split("-")[1]) >= 4
    ]
    assert orphan  # logs beyond the checkpoint exist pre-resume

    eng2 = RayCrawler(str(d), page_outlinks(spec), cs, str(run_dir), mode="local")
    eng2.resume(seeds)
    left = [
        int(f.stem.split("-")[1]) for f in (run_dir / "visits").glob("batch-*.parquet")
    ]
    assert max(left) == 3  # orphans pruned, completed batches kept
    eng2.run(seeds=None)
    # end state still golden
    golden = GoldenSimulator(page_outlinks(spec), cs).run(seeds)
    assert eng2.seen.sorted_urls() == sorted(golden.seen)


def test_overlapped_checkpoint_captures_boundary_state(world, tmp_path):
    """checkpoint(overlap=True) must capture the state AT THE CALL,
    even though the publish happens in a background thread while the
    caller keeps mutating the live engine — and a second checkpoint
    must join the first (rename dances never interleave)."""
    import json

    from kryptone_ray.sim.golden import CrawlSpec
    from kryptone_ray.corpus.synth import page_outlinks, seed_urls

    spec, d = world
    cs = CrawlSpec(batch_size=8, wait_time=25.0, allowed_hosts=("*",),
                   max_pages=64)
    run_dir = tmp_path / "run"
    eng = RayCrawler(str(d), page_outlinks(spec), cs, str(run_dir),
                     mode="local")
    eng.seed(seed_urls(spec, 4))
    eng.run(seeds=None, max_batches=2)
    pages_at_boundary = eng.pages_visited

    eng.checkpoint(overlap=True)
    # mutate AFTER the capture: crawl two more windows while (possibly)
    # publishing — then overlap a second checkpoint right behind it
    eng.run(seeds=None, max_batches=2)
    eng.checkpoint(overlap=True)
    eng.checkpoint_join()

    manifest = json.loads(
        (run_dir / "checkpoint" / "manifest.json").read_text())
    # the LAST checkpoint won and reflects the post-mutation state
    assert manifest["pages_visited"] == eng.pages_visited
    assert manifest["pages_visited"] > pages_at_boundary
    assert not (run_dir / "checkpoint.tmp").exists()
    assert not (run_dir / "checkpoint.old").exists()


def test_error_cache_invalidated_on_resume(world, tmp_path, ray_session):
    """count_errors() caches per-visit-file counts; resume() deletes
    post-checkpoint files, so the cache must be dropped — a stale cache
    would keep counting deleted files forever (same-instance resume)."""
    spec, d = world
    cs = CrawlSpec(batch_size=16, wait_time=25.0, allowed_hosts=("*",),
                   max_pages=96)
    seeds = seed_urls(spec, 6)
    run_dir = tmp_path / "run-errcache"
    eng = RayCrawler(str(d), page_outlinks(spec), cs, str(run_dir),
                     mode="tasks", small_window_local_max=0)
    eng.run(seeds=seeds, checkpoint_every=2, max_batches=4)
    eng.count_errors()  # populate the cache over batches 0..3
    cached = set(eng._error_counts)
    assert cached
    eng.resume(seeds)   # drops post-checkpoint logs AND the cache
    assert eng._error_counts == {}
    eng.run(seeds=None)
    # cached total must equal a from-scratch recount over surviving files
    total = eng.count_errors()
    fresh = RayCrawler(str(d), page_outlinks(spec), cs, str(run_dir),
                       mode="tasks", small_window_local_max=0)
    assert total == fresh.count_errors()
