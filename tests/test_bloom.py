"""Bloom filter properties: no false negatives ever, FP rate near the
design point, partials OR-merge associatively."""

import numpy as np
import pandas as pd
import pytest

from kryptone_ray.stages.bloom import (bloom_bits_for, bloom_contains,
                                       bloom_partial)


def test_no_false_negatives():
    rng = np.random.default_rng(7)
    keys = rng.integers(-2**62, 2**62, size=50_000, dtype=np.int64)
    bm = bloom_partial(keys, bloom_bits_for(len(keys)))
    assert bloom_contains(bm, keys).all()


def test_false_positive_rate_near_design():
    rng = np.random.default_rng(11)
    keys = rng.integers(0, 2**62, size=100_000, dtype=np.int64)
    bm = bloom_partial(keys, bloom_bits_for(len(keys)))
    probe = rng.integers(-2**62, -1, size=100_000, dtype=np.int64)
    fp = bloom_contains(bm, probe).mean()
    # 10 bits/key, k=4 → ~1.2% theoretical; allow generous slack
    assert fp < 0.05


def test_partials_or_merge():
    rng = np.random.default_rng(3)
    a = rng.integers(0, 2**40, size=10_000, dtype=np.int64)
    b = rng.integers(0, 2**40, size=10_000, dtype=np.int64)
    n_bits = bloom_bits_for(20_000)
    merged = np.bitwise_or(bloom_partial(a, n_bits),
                           bloom_partial(b, n_bits))
    both = bloom_partial(np.concatenate([a, b]), n_bits)
    assert (merged == both).all()


def test_empty_keys():
    bm = bloom_partial(np.array([], dtype=np.int64), 1 << 10)
    assert bm.sum() == 0
    assert bloom_contains(bm, np.array([], dtype=np.int64)).shape == (0,)


@pytest.mark.usefixtures("ray_session")
def test_bloom_semi_join_matches_plain(monkeypatch):
    from kryptone_ray.pipelines import relational

    import ray.data as rd

    def _df(res):
        if not isinstance(res, rd.Dataset):
            return res
        return res.to_pandas().sort_values("o_orderkey") \
            .reset_index(drop=True)

    SF = "/root/testdata/sf0.001"
    plain = _df(relational.q_orders_with_returns(SF))
    via_bloom = _df(relational.q_orders_with_returns_bloom(SF))
    pd.testing.assert_frame_equal(plain, via_bloom, check_dtype=False)
    # distributed shape too (streams a Dataset above the gate now)
    monkeypatch.setattr(relational, "DISTRIBUTED_JOIN_MIN_ROWS", 0)
    big = _df(relational.q_orders_with_returns_bloom(SF))
    pd.testing.assert_frame_equal(plain, big, check_dtype=False)
