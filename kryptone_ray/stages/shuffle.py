"""Skew-aware shuffle helpers — the explicit partitioning/salting layer
the north rule requires ("explicit hash partitioning on host and salting
for hot-domain skew").

The frontier's host distribution is Zipf (corpus/synth.py draws it that
way on purpose): a bare ``groupby(host)`` puts ~25% of all rows in one
group. ``salted_groupby_agg`` computes per-(key, salt) partials so no
single reducer sees more than ~1/S of a hot key's rows, then combines
the tiny per-salt partials. Associative aggregations only (sum/count/
min/max) — exactly the class the crawl's metrics/grouping needs.

Note the engine's own shuffles avoid skew structurally: the seen set and
the corpus are keyed by ``xxh64(url)`` (uniform by construction), and
politeness intentionally serializes per host at the scheduler, where a
hot host is throughput-bounded by the politeness clock, not by a
reducer. This helper is for analytic groupbys over crawl outputs
(per-host counts, per-domain stats) where the skew would land on one
worker.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from kryptone_ray.utils.xxh64 import xxh64_batch

_AGGS = {"sum": "sum", "count": "size", "min": "min", "max": "max"}


def salted_groupby_agg(ds, key: str, value: str | None, agg: str = "count",
                       num_salts: int = 16, batch_size: int = 65536) -> pd.DataFrame:
    """groupby(key).agg over a skewed key:

    1. per batch: partial agg per (key, salt) where salt =
       xxh64(row-position entropy) % num_salts — inside ``map_batches``;
    2. tiny global combine per (key, salt) → per key.

    Returns a pandas DataFrame (key, <agg>) — the combined result is
    one row per key.
    """
    if agg not in _AGGS:
        raise ValueError(f"agg must be one of {sorted(_AGGS)}")

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        n = len(df)
        salt = (np.arange(n) % num_salts).astype(np.int32)
        df = df.assign(_salt=salt)
        g = df.groupby([key, "_salt"], sort=False)
        if agg == "count":
            out = g.size().rename("v").reset_index()
        else:
            out = g[value].agg(_AGGS[agg]).rename("v").reset_index()
        return out

    partials = ds.map_batches(partial, batch_format="pandas",
                              batch_size=batch_size).to_pandas()
    g = partials.groupby(key, sort=False)["v"]
    if agg in ("sum", "count"):
        combined = g.sum()
    elif agg == "min":
        combined = g.min()
    else:
        combined = g.max()
    name = agg if value is None else f"{agg}_{value}"
    return combined.rename(name).reset_index().sort_values(key).reset_index(drop=True)


def add_salted_key(df: pd.DataFrame, key: str, hot_keys: set,
                   num_salts: int = 16) -> pd.DataFrame:
    """The classic hot-key salting transform for partitioned joins:
    ``key#salt`` for hot keys (salt = xxh64(secondary entropy) % S), the
    bare key otherwise. The small side of a join replicates each hot key
    S times to match."""
    keys = df[key].astype(str)
    is_hot = keys.isin({str(k) for k in hot_keys})
    salts = xxh64_batch(keys.index.astype(str).tolist()) % np.uint64(num_salts)
    salted = keys.where(~is_hot, keys + "#" + pd.Series(salts, index=df.index).astype(str))
    return df.assign(**{f"{key}_salted": salted})
