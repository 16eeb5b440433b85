"""Query-layer fault tolerance: Ray retries failed map tasks, so a
pipeline whose worker DIES mid-batch must still complete with the exact
oracle answer (the engine's crash story for the crawl side lives in
test_checkpoint/test_crash_windows; this is the Dataset-shapes side).
Also pins the join_partitions sizing probe from common.py's docstring:
oracle-exact results even when target_max_block_size is forced far
below a hash partition."""

from __future__ import annotations

import pathlib

import pandas as pd
import pytest

SF = "/root/testdata/sf0.001"


def _norm(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    return df.sort_values(list(df.columns)).reset_index(drop=True)


@pytest.mark.usefixtures("ray_session")
def test_map_task_survives_worker_death(tmp_path):
    """First task attempt kills its own worker process (SIGKILL-level
    os._exit — no exception for Ray to catch); Ray must retry the task
    and the aggregate must come out exact."""
    import os

    import ray.data as rd

    flag = tmp_path / "died_once"

    def bomb(df: pd.DataFrame) -> pd.DataFrame:
        if not flag.exists():
            flag.write_text("x")
            os._exit(1)  # hard worker death, not a Python exception
        return pd.DataFrame({"s": [int(df["id"].sum())]})

    out = rd.range(10_000, override_num_blocks=1) \
        .map_batches(bomb, batch_format="pandas", batch_size=None) \
        .to_pandas()
    assert int(out["s"].sum()) == 10_000 * 9_999 // 2
    assert flag.exists()


@pytest.mark.usefixtures("ray_session")
def test_gated_queries_exact_under_tiny_blocks(monkeypatch):
    """The load-bearing sizing invariant (common.join_partitions
    docstring): hash partitions reach the per-block combines INTACT
    even when target_max_block_size is forced to 16 KB — so the
    distributed shapes stay oracle-exact under any block splitting the
    executor chooses."""
    import duckdb
    import ray.data as rd

    from kryptone_ray.pipelines import relational

    base = _norm(relational.q_orders_cdc_merge(SF))

    ctx = rd.DataContext.get_current()
    prev = ctx.target_max_block_size
    monkeypatch.setattr(relational, "DISTRIBUTED_JOIN_MIN_ROWS", 0)
    try:
        ctx.target_max_block_size = 16 * 1024
        tiny = _norm(relational.q_orders_cdc_merge(SF))
    finally:
        ctx.target_max_block_size = prev
    pd.testing.assert_frame_equal(base, tiny, check_dtype=False)

    con = duckdb.connect()
    con.sql(f"CREATE VIEW orders AS SELECT * "
            f"FROM read_parquet('{SF}/orders.parquet')")
    oracle = _norm(con.sql(relational.Q_ORDERS_CDC_MERGE_SQL).df())
    pd.testing.assert_frame_equal(tiny, oracle, check_dtype=False)
