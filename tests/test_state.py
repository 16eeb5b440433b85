"""Cuckoo filter, seen-shard semantics, and scheduler spill."""

import numpy as np
import pytest

from kryptone_ray.state.cuckoo import CuckooFilter
from kryptone_ray.state.scheduler import FrontierSchedulerLocal
from kryptone_ray.state.seen import SeenShardLocal
from kryptone_ray.utils.xxh64 import xxh64_batch


def test_cuckoo_no_false_negatives():
    f = CuckooFilter(capacity=4096)
    keys = xxh64_batch([f"url-{i}" for i in range(2000)])
    f.insert_batch(keys)
    assert f.contains_batch(keys).all()


def test_cuckoo_low_false_positive_rate():
    f = CuckooFilter(capacity=4096)
    keys = xxh64_batch([f"url-{i}" for i in range(2000)])
    f.insert_batch(keys)
    probe = xxh64_batch([f"other-{i}" for i in range(10000)])
    fpr = f.contains_batch(probe).mean()
    assert fpr < 0.01, fpr


def test_seen_shard_first_occurrence_only():
    s = SeenShardLocal(mode="exact")
    h = xxh64_batch(["a", "b", "a", "c"])
    is_new = s.check_and_add(h, ["a", "b", "a", "c"])
    assert is_new.tolist() == [True, True, False, True]
    # second call: nothing new
    assert not s.check_and_add(h).any()
    assert s.size() == 3


def test_seen_shard_cuckoo_mode_matches_exact():
    a = SeenShardLocal(mode="exact")
    b = SeenShardLocal(mode="cuckoo", capacity=1 << 14)
    h = xxh64_batch([f"u{i}" for i in range(1000)])
    np.testing.assert_array_equal(a.check_and_add(h), b.check_and_add(h))
    h2 = xxh64_batch([f"u{i}" for i in range(500, 1500)])
    # cuckoo may have rare false positives → is_new_cuckoo ⊆ is_new_exact
    new_a = a.check_and_add(h2)
    new_b = b.check_and_add(h2)
    assert (~new_b | new_a).all()


def test_seen_shard_snapshot_restore(tmp_path):
    s = SeenShardLocal(mode="exact")
    urls = [f"https://h/{i}" for i in range(50)]
    s.check_and_add(xxh64_batch(urls), urls)
    p = tmp_path / "snap.parquet"
    assert s.snapshot(str(p)) == 50
    s2 = SeenShardLocal(mode="exact")
    assert s2.restore(str(p)) == 50
    assert not s2.check_and_add(xxh64_batch(urls)).any()
    assert sorted(s2.snapshot_urls()) == sorted(urls)


def test_scheduler_priority_order():
    s = FrontierSchedulerLocal(batch_size=3, wait_time=10.0)
    s.add(["https://h/a", "https://h/c", "https://h/b"], ["h"] * 3, [1, 0, 0])
    urls, depths, idxs, ts, b = s.pop_batch()
    assert urls == ["https://h/b", "https://h/c", "https://h/a"]  # (depth, url)
    assert depths == [0, 0, 1]
    assert idxs == [0, 1, 2]
    assert ts == 0.0 and b == 0
    assert s.pop_batch()[0] == []


def test_scheduler_politeness_one_per_host():
    s = FrontierSchedulerLocal(batch_size=4, wait_time=10.0, host_delay=30.0)
    s.add(
        ["https://a/1", "https://a/2", "https://b/1"],
        ["a", "a", "b"],
        [0, 0, 0],
    )
    urls, *_ = s.pop_batch()
    assert urls == ["https://a/1", "https://b/1"]  # one per host
    # host a/b blocked until clock reaches next_ok → clock jumps
    urls2, _, _, ts2, _ = s.pop_batch()
    assert urls2 == ["https://a/2"]
    assert ts2 >= 30.0


def test_scheduler_spill_roundtrip(tmp_path):
    s = FrontierSchedulerLocal(
        batch_size=1000, wait_time=1.0, spill_dir=str(tmp_path), spill_threshold=50
    )
    urls = [f"https://h/{i:05d}" for i in range(500)]
    s.add(urls, ["h"] * 500, [0] * 500)
    assert s.size() == 500
    assert list(tmp_path.glob("gen-*.parquet")), "expected spill files"
    popped, *_ = s.pop_batch()
    assert popped == sorted(urls)  # order survives the spill
    assert s.size() == 0


def test_scheduler_state_table_includes_spill(tmp_path):
    s = FrontierSchedulerLocal(
        batch_size=10, wait_time=1.0, spill_dir=str(tmp_path), spill_threshold=20
    )
    urls = [f"https://h/{i:04d}" for i in range(100)]
    s.add(urls, ["h"] * 100, [0] * 100)
    t = s.state_table()
    assert sorted(t["url"].to_pylist()) == sorted(urls)


def test_cuckoo_delta_mode_memory_bounded(tmp_path):
    # at-scale mode: urls go to append-only delta parquet, not RAM
    s = SeenShardLocal(mode="cuckoo", capacity=1 << 14,
                       delta_dir=str(tmp_path / "d"))
    urls = [f"https://h/{i}" for i in range(300)]
    h = xxh64_batch(urls)
    s.check_and_add(h, urls)
    assert s.urls == {}  # nothing retained in memory
    assert sorted(s.snapshot_urls()) == sorted(urls)
    p = tmp_path / "snap.parquet"
    assert s.snapshot(str(p)) == 300
    s2 = SeenShardLocal(mode="cuckoo", capacity=1 << 14,
                        delta_dir=str(tmp_path / "d2"))
    assert s2.restore(str(p)) == 300
    assert not s2.check_and_add(h).any()
    assert sorted(s2.snapshot_urls()) == sorted(urls)
