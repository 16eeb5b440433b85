"""KLL quantile sketch: rank-error accuracy, merge associativity,
determinism, and the events pipeline entry."""

import numpy as np
import pytest

from kryptone_ray.stages.sketches import KllSketch


def exact_rank(values, x):
    return np.searchsorted(np.sort(values), x, "right") / len(values)


def test_rank_error_bounded():
    rng = np.random.default_rng(5)
    vals = rng.lognormal(3, 2, size=200_000)
    sk = KllSketch()
    for chunk in np.array_split(vals, 40):
        sk.add(chunk)
    for q in [0.1, 0.5, 0.9, 0.99]:
        est = sk.quantile(q)
        assert abs(exact_rank(vals, est) - q) < 0.03, q


def test_merge_matches_single_sketch_accuracy():
    rng = np.random.default_rng(9)
    a = rng.normal(0, 1, size=50_000)
    b = rng.normal(10, 1, size=50_000)
    left = KllSketch().add(a)
    right = KllSketch().add(b)
    merged = left.merge(right)
    allv = np.concatenate([a, b])
    for q in [0.25, 0.5, 0.75]:
        est = merged.quantile(q)
        assert abs(exact_rank(allv, est) - q) < 0.03, q


def test_deterministic_roundtrip():
    vals = np.arange(100_000, dtype=np.float64)
    s1 = KllSketch().add(vals)
    s2 = KllSketch().add(vals)
    assert s1.quantile(0.5) == s2.quantile(0.5)
    s3 = KllSketch.from_bytes(s1.to_bytes())
    assert s3.quantile(0.9) == s1.quantile(0.9)
    assert s3.n == s1.n


@pytest.mark.usefixtures("ray_session")
def test_events_quantile_sketch_close_to_exact():
    import duckdb

    from kryptone_ray.pipelines import events

    SF = "/root/testdata/sf0.001"
    out = events.q_value_quantiles_sketch(SF)
    assert list(out.columns) == ["event_type", "p50_approx",
                                 "p90_approx", "p99_approx"]
    exact = duckdb.sql(
        f"""SELECT event_type,
                   quantile_cont(value, 0.5) AS p50,
                   quantile_cont(value, 0.9) AS p90
            FROM read_parquet('{SF}/events.parquet')
            GROUP BY event_type ORDER BY event_type""").df()
    m = out.merge(exact, on="event_type")
    # small-n sketch ≈ exact; generous relative tolerance
    assert (abs(m["p50_approx"] - m["p50"]) /
            m["p50"].abs().clip(lower=1)).max() < 0.1
    assert (abs(m["p90_approx"] - m["p90"]) /
            m["p90"].abs().clip(lower=1)).max() < 0.1
