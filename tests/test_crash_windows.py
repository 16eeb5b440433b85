"""Round-2 crash-window regressions (ADVICE items): checkpoint publish
must survive a crash between its two renames, cuckoo resume must purge
stale post-checkpoint deltas, pop_batch(limit) must be a prefix of the
full window, and corpus row-group pruning must probe boundary-straddling
keys.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from kryptone_ray.corpus.store import CorpusReader, write_corpus
from kryptone_ray.corpus.synth import CorpusSpec, make_corpus_table, seed_urls
from kryptone_ray.engine.crawl import RayCrawler
from kryptone_ray.sim.golden import CrawlSpec, GoldenSimulator
from kryptone_ray.state.scheduler import FrontierSchedulerLocal
from kryptone_ray.state.seen import SeenShardLocal
from tests.test_crawl_parity import page_outlinks


@pytest.fixture(scope="module")
def world(tmp_path_factory):
    spec = CorpusSpec(n_rows=300, n_hosts=4, seed=42)
    d = tmp_path_factory.mktemp("corpus")
    write_corpus(make_corpus_table(spec), d, num_shards=4, row_group_size=64)
    return spec, d


def test_resume_from_checkpoint_old_after_crash(world, tmp_path):
    """Crash between `ck -> ck.old` and `tmp -> ck`: resume promotes
    checkpoint.old and completes with the golden end state."""
    spec, d = world
    cs = CrawlSpec(batch_size=8, wait_time=25.0, allowed_hosts=("*",), max_pages=96)
    seeds = seed_urls(spec, 6)
    run_dir = tmp_path / "run"
    eng1 = RayCrawler(str(d), page_outlinks(spec), cs, str(run_dir), mode="local")
    eng1.run(seeds=seeds, checkpoint_every=2, max_batches=4)
    # simulate the crash window: the live checkpoint was renamed aside
    # and the new one never landed
    (run_dir / "checkpoint").rename(run_dir / "checkpoint.old")

    eng2 = RayCrawler(str(d), page_outlinks(spec), cs, str(run_dir), mode="local")
    eng2.resume(seeds)
    eng2.run(seeds=None)
    golden = GoldenSimulator(page_outlinks(spec), cs).run(seeds)
    assert eng2.seen.sorted_urls() == sorted(golden.seen)


def test_checkpoint_always_leaves_a_complete_dir(world, tmp_path):
    spec, d = world
    cs = CrawlSpec(batch_size=8, wait_time=25.0, allowed_hosts=("*",), max_pages=48)
    run_dir = tmp_path / "run"
    eng = RayCrawler(str(d), page_outlinks(spec), cs, str(run_dir), mode="local")
    eng.run(seeds=seed_urls(spec, 4), checkpoint_every=1)
    # after a clean run: live checkpoint present, no leftovers
    assert (run_dir / "checkpoint" / "manifest.json").exists()
    assert not (run_dir / "checkpoint.old").exists()
    assert not (run_dir / "checkpoint.tmp").exists()


def test_cuckoo_restore_purges_stale_deltas(tmp_path):
    """Deltas written after the snapshot being restored must not leak
    into later url tables (phantom rolled-back URLs)."""
    d = tmp_path / "deltas"
    s = SeenShardLocal(mode="cuckoo", delta_dir=str(d))
    h1 = np.array([1, 2, 3], dtype=np.uint64)
    s.check_and_add(h1, ["u1", "u2", "u3"])
    snap = tmp_path / "snap.parquet"
    s.snapshot(str(snap))
    # post-checkpoint work that will be rolled back
    h2 = np.array([4, 5], dtype=np.uint64)
    s.check_and_add(h2, ["phantom4", "phantom5"])

    s2 = SeenShardLocal(mode="cuckoo", delta_dir=str(d))
    s2.restore(str(snap))
    urls = set(s2.snapshot_urls())
    assert urls == {"u1", "u2", "u3"}
    assert not s2.contains(h2).any()
    # new inserts after restore land in fresh deltas without collisions
    s2.check_and_add(np.array([7], dtype=np.uint64), ["u7"])
    assert set(s2.snapshot_urls()) == {"u1", "u2", "u3", "u7"}


def _mk_sched(batch_size):
    s = FrontierSchedulerLocal(batch_size=batch_size, wait_time=25.0)
    urls = [f"https://h{i % 3}.test/p{i:03d}" for i in range(20)]
    hosts = [f"h{i % 3}.test" for i in range(20)]
    depths = [i % 4 for i in range(20)]
    s.add(urls, hosts, depths)
    return s


def test_pop_batch_limit_is_prefix_of_full_window():
    full = _mk_sched(16).pop_batch()
    lim = _mk_sched(16).pop_batch(limit=5)
    assert lim[0] == full[0][:5]
    assert lim[1] == full[1][:5]
    assert lim[2] == [0, 1, 2, 3, 4]


def test_pop_batch_limit_no_counter_skew():
    s = _mk_sched(16)
    s.pop_batch(limit=5)
    st = s.clock_state()
    assert st["visit_counter"] == 5  # not 16
    assert s.size() == 15  # the other 15 remain in the frontier
    # next window continues the visit_idx sequence without gaps
    urls, _, idxs, _, _ = s.pop_batch()
    assert idxs[0] == 5


def test_truncated_window_then_checkpoint_resume_clean(world, tmp_path):
    """max_pages truncation mid-window + checkpoint + resume with raised
    max_pages: visit_idx stays gap-free and matches the golden sim run
    at the higher limit for the common prefix."""
    spec, d = world
    seeds = seed_urls(spec, 6)
    cs_small = CrawlSpec(batch_size=8, wait_time=25.0, allowed_hosts=("*",),
                         max_pages=20)  # truncates the 3rd window
    run_dir = tmp_path / "run"
    eng1 = RayCrawler(str(d), page_outlinks(spec), cs_small, str(run_dir),
                      mode="local")
    eng1.run(seeds=seeds, checkpoint_every=1)
    assert eng1.pages_visited == 20

    cs_big = CrawlSpec(batch_size=8, wait_time=25.0, allowed_hosts=("*",),
                       max_pages=60)
    eng2 = RayCrawler(str(d), page_outlinks(spec), cs_big, str(run_dir),
                      mode="local")
    eng2.resume(seeds)
    eng2.run(seeds=None)
    vt = eng2.visits_table()
    import pyarrow.compute as pc

    idxs = sorted(vt["visit_idx"].to_pylist())
    assert idxs == list(range(len(idxs))), "visit_idx gaps after resume"


def test_rowgroup_boundary_duplicate_key(tmp_path):
    """Two rows with the SAME url_hash straddling a row-group boundary:
    pruning must probe the preceding group too."""
    from kryptone_ray.corpus.store import KEY, add_key

    spec = CorpusSpec(n_rows=8, n_hosts=2, seed=1)
    t = add_key(make_corpus_table(spec))
    # duplicate row 3's key into row 4 position by rebuilding the table
    # sorted by key, then force row_group_size=4 so the dup straddles
    import pyarrow.compute as pc

    t = t.take(pc.sort_indices(t[KEY]))
    dup = t.slice(3, 1)
    t2 = pa.concat_tables([t.slice(0, 4), dup, t.slice(4, 4)])
    out = tmp_path / "corpus"
    out.mkdir()
    pq.write_table(t2, out / "shard-000.parquet", row_group_size=4)
    # row 4 (index 4) == duplicate of row 3 → same key spans groups 0/1
    r = CorpusReader(str(out))
    url = t2["image_id"][3].as_py()
    got = r.take_urls([url])
    assert len(got) == 2, "both boundary-straddling rows must be found"
