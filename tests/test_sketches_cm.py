"""Count-Min sketch properties: overestimate-only, exact associative
merge, determinism across partitionings, and the heavy-hitters query
vs the exact top-k at fixture scale (cardinality << width, so the
estimates are collision-free and exactly the true counts)."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest

from kryptone_ray.stages.sketches import CountMinSketch

SF = "/root/testdata/sf0.01"


def _keys(seed: int, n: int, dom: int) -> np.ndarray:
    return np.random.default_rng(seed).integers(0, dom, size=n)


def test_never_underestimates():
    keys = _keys(1, 50_000, 10_000)  # domain >> width forces collisions
    sk = CountMinSketch(width=512, depth=4).add(keys)
    uniq, true = np.unique(keys, return_counts=True)
    est = sk.estimate(uniq)
    assert (est >= true).all()
    # and the total inserted count is tracked exactly
    assert sk.n == len(keys)


def test_merge_is_exact_and_associative():
    a, b, c = (_keys(s, 20_000, 5_000) for s in (2, 3, 4))
    whole = CountMinSketch().add(np.concatenate([a, b, c]))
    merged = CountMinSketch().add(a).merge(
        CountMinSketch().add(b).merge(CountMinSketch().add(c)))
    assert (whole.counts == merged.counts).all()
    assert whole.n == merged.n


def test_roundtrip_and_seed_determinism():
    keys = _keys(5, 10_000, 1_000)
    sk = CountMinSketch().add(keys)
    back = CountMinSketch.from_bytes(sk.to_bytes())
    assert (back.counts == sk.counts).all()
    # two sketches with the same seed hash identically
    assert (CountMinSketch().add(keys).counts == sk.counts).all()


def test_incompatible_merge_rejected():
    with pytest.raises(AssertionError):
        CountMinSketch(width=512).merge(CountMinSketch(width=1024))


@pytest.mark.usefixtures("ray_session")
def test_heavy_hitters_query_matches_exact_topk():
    from kryptone_ray.pipelines import events
    from kryptone_ray.pipelines.common import T

    out = events.q_heavy_hitters_sketch(SF)
    exact = T(SF, "events", columns=["user_id"]).to_pandas()["user_id"] \
        .value_counts()
    ex = exact.reset_index()
    ex.columns = ["user_id", "n"]
    ex = ex.sort_values(["n", "user_id"], ascending=[False, True]).head(10)
    assert out["user_id"].tolist() == ex["user_id"].tolist()
    assert out["est_events"].tolist() == ex["n"].tolist()
