"""Speculative multi-window politeness dispatch (engine/crawl.py
_spec_round, VERDICT r4 #5): bit-identical outputs vs the sequential
loop, exact journal rollback in both schedulers, URL-cache hygiene.

The feature is default-OFF (measured slower on the bench workload — see
the RayCrawler.__init__ note); these tests force it on to pin the
machinery: a discovery-heavy crawl exercises the validation + rollback
path on nearly every round.
"""

import tempfile

import pyarrow.compute as pc
import pytest

from kryptone_ray.corpus.store import write_corpus
from kryptone_ray.corpus.synth import (CorpusSpec, make_corpus_table,
                                       page_outlinks, seed_urls)
from kryptone_ray.engine.crawl import RayCrawler
from kryptone_ray.sim.golden import CrawlSpec
from kryptone_ray.state.scheduler import FrontierSchedulerLocal

_VISIT_COLS = ["url", "visit_idx", "ts", "depth", "status"]


@pytest.fixture(scope="module")
def corpus(ray_session):
    spec = CorpusSpec(n_rows=2000, n_hosts=24, seed=11)
    tmp = tempfile.mkdtemp(prefix="kr_specwin_")
    write_corpus(make_corpus_table(spec), f"{tmp}/corpus", num_shards=4)
    return spec, f"{tmp}/corpus"


def _run(corpus, speculate_windows, scheduler_shards=0, max_pages=1200,
         checkpoint_every=0):
    spec, corpus_dir = corpus
    cs = CrawlSpec(batch_size=4096, wait_time=25.0, host_delay=0.5,
                   allowed_hosts=("*",), max_pages=max_pages)
    eng = RayCrawler(
        corpus_dir=corpus_dir, outlinks_fn=page_outlinks(spec), spec=cs,
        run_dir=tempfile.mkdtemp(prefix="kr_specrun_"), mode="tasks",
        num_seen_shards=4, scheduler_shards=scheduler_shards,
        speculate_windows=speculate_windows)
    eng.run(seeds=seed_urls(spec, 48), checkpoint_every=checkpoint_every)
    vt = eng.visits_table()
    vt = vt.take(pc.sort_indices(vt["visit_idx"])).select(_VISIT_COLS)
    return vt.to_pandas(), eng


def test_speculative_parity_local_scheduler(corpus):
    """Forced-on speculation must reproduce the sequential loop's visit
    table, seen set and metrics exactly — and must actually have
    speculated (rounds > 0) and rolled back (the discovery-heavy corpus
    violates nearly every round)."""
    seq, eng_seq = _run(corpus, speculate_windows=1)
    spc, eng_spc = _run(corpus, speculate_windows=8)
    assert eng_spc.spec_rounds > 0
    assert eng_spc.spec_windows_rolled > 0  # validation + rollback fired
    assert spc.equals(seq)
    assert eng_spc.seen.size() == eng_seq.seen.size()
    assert eng_spc.metrics() == eng_seq.metrics()


def test_speculative_parity_sharded_scheduler(corpus):
    """The coordinator-journaled (shard commit-journal) variant must be
    bit-identical too."""
    seq, _ = _run(corpus, speculate_windows=1)
    spc, eng = _run(corpus, speculate_windows=8, scheduler_shards=3)
    assert eng.spec_rounds > 0
    assert spc.equals(seq)


def test_speculative_parity_with_checkpoints(corpus):
    """Speculation never crosses a checkpoint boundary; outputs stay
    identical with periodic checkpoints enabled."""
    seq, _ = _run(corpus, speculate_windows=1, checkpoint_every=7)
    spc, eng = _run(corpus, speculate_windows=8, checkpoint_every=7)
    assert eng.spec_rounds > 0
    assert spc.equals(seq)


def test_url_cache_evicted_on_commit(corpus):
    """Every committed page's cache entry is dropped — the cache holds
    only rolled-back (not-yet-committed) pages, so memory is bounded by
    speculation depth × window size."""
    _, eng = _run(corpus, speculate_windows=8, max_pages=600)
    # leftovers can only be pages popped speculatively then rolled back
    # and never re-committed before max_pages cut the run
    assert len(eng._url_cache) < 8 * 64


def test_scheduler_journal_rollback_exact():
    """rollback_windows restores heaps, next_ok, clock and counters to
    the pre-speculation state exactly (direct scheduler-level pin)."""
    s = FrontierSchedulerLocal(batch_size=64, wait_time=25.0, host_delay=0.5)
    urls = [f"https://h{i % 5}.test/p{j}" for i in range(5) for j in range(4)]
    hosts = [f"h{i % 5}.test" for i in range(5) for j in range(4)]
    s.add(urls, hosts, [1] * len(urls))
    s.pop_batch()  # non-speculative window advances state first
    snap = (dict(s.next_ok), {h: sorted(v) for h, v in s.heaps.items()},
            s.clock, s.visit_counter, s.batch_counter, s.total)
    s.begin_windows()
    w1 = s.pop_batch()
    w2 = s.pop_batch()
    assert w1[0] and w2[0]
    assert [r["sel"] for r in s.window_selections()]
    s.rollback_windows(0)
    s.end_windows()
    assert (dict(s.next_ok), {h: sorted(v) for h, v in s.heaps.items()},
            s.clock, s.visit_counter, s.batch_counter, s.total) == snap
    # and a re-pop reproduces the first speculative window exactly
    assert s.pop_batch() == w1


def test_scheduler_journal_partial_rollback():
    """keep=1 commits the first speculative window and undoes the rest."""
    s = FrontierSchedulerLocal(batch_size=64, wait_time=25.0, host_delay=0.5)
    s.add([f"https://h0.test/p{j}" for j in range(6)], ["h0.test"] * 6,
          [1] * 6)
    s.begin_windows()
    w1 = s.pop_batch()
    w2 = s.pop_batch()
    w3 = s.pop_batch()
    s.rollback_windows(1)
    s.end_windows()
    assert s.batch_counter == 1 and s.visit_counter == len(w1[0])
    re2 = s.pop_batch()
    assert re2[:2] == w2[:2]  # same urls/depths re-released
    assert re2[3] == w2[3]  # same virtual ts
    assert s.pop_batch()[:2] == w3[:2]
