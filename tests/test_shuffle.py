"""Salted groupby / hot-key salting (north rule skew handling)."""

import numpy as np
import pandas as pd
import pytest

from kryptone_ray.stages.shuffle import add_salted_key, salted_groupby_agg


@pytest.fixture()
def skewed_ds(ray_session):
    import ray.data as rd

    # Zipf-ish: one hot host with 80% of rows
    hosts = ["hot.example"] * 8000 + [f"h{i}.example" for i in range(2000)]
    vals = np.arange(10000, dtype=np.float64)
    return rd.from_pandas(pd.DataFrame({"host": hosts, "v": vals}))


def test_salted_count_matches_plain(skewed_ds):
    out = salted_groupby_agg(skewed_ds, key="host", value=None, agg="count")
    assert out.loc[out["host"] == "hot.example", "count"].iloc[0] == 8000
    assert len(out) == 2001
    assert out["count"].sum() == 10000


def test_salted_sum_matches_plain(skewed_ds):
    out = salted_groupby_agg(skewed_ds, key="host", value="v", agg="sum")
    expected = float(np.arange(8000).sum())
    got = float(out.loc[out["host"] == "hot.example", "sum_v"].iloc[0])
    assert got == expected


def test_invalid_agg(skewed_ds):
    with pytest.raises(ValueError):
        salted_groupby_agg(skewed_ds, key="host", value="v", agg="median")


def test_add_salted_key():
    df = pd.DataFrame({"host": ["hot"] * 100 + ["cold"] * 5})
    out = add_salted_key(df, "host", hot_keys={"hot"}, num_salts=8)
    hot_keys = out.loc[out["host"] == "hot", "host_salted"]
    assert hot_keys.str.startswith("hot#").all()
    assert hot_keys.nunique() > 1  # spread across salts
    assert (out.loc[out["host"] == "cold", "host_salted"] == "cold").all()
