"""Relational/events scale smoke: synthesize events (default 3M rows,
60k users) and orders/lineitem (600k orders, ~2.4M lines) ABOVE the
round-3 small-input gates, so ``q_events_sessions`` / ``q_bucketed_join``
run their genuinely distributed shapes (hash-repartition sessionization,
native hash-shuffle join) with no test monkeypatching, verify both
against independent single-process pandas recounts, and print one JSON
line of wall times. Evidence for BASELINE.md that the distributed shapes
stay correct and live past the bench tables.

Usage: python scripts/scale_smoke_relational.py [n_events] [n_orders]
"""

from __future__ import annotations

import json
import pathlib
import sys
import time

sys.path.insert(0, ".")

N_EVENTS = int(sys.argv[1]) if len(sys.argv) > 1 else 3_000_000
N_ORDERS = int(sys.argv[2]) if len(sys.argv) > 2 else 600_000
N_USERS = max(1, N_EVENTS // 50)
OUT = pathlib.Path(f"/tmp/kr_rel_smoke_{N_EVENTS}_{N_ORDERS}")


def ensure_tables() -> None:
    import numpy as np
    import pandas as pd
    import pyarrow as pa
    import pyarrow.parquet as pq

    if (OUT / "_DONE").exists():
        return
    OUT.mkdir(parents=True, exist_ok=True)
    rng = np.random.default_rng(7)

    ev = pd.DataFrame(
        {
            "event_id": np.arange(N_EVENTS, dtype=np.int64),
            "user_id": rng.integers(0, N_USERS, N_EVENTS).astype(np.int64),
            "ts": pd.Timestamp("2024-01-01")
            + pd.to_timedelta(rng.integers(0, 90 * 24 * 3600, N_EVENTS),
                              unit="s"),
        }
    )
    pq.write_table(pa.Table.from_pandas(ev, preserve_index=False),
                   OUT / "events.parquet", row_group_size=200_000)

    n_lines = N_ORDERS * 4
    li = pd.DataFrame(
        {
            "l_orderkey": rng.integers(0, N_ORDERS, n_lines).astype(np.int64),
            "l_quantity": rng.integers(1, 51, n_lines).astype("float64"),
        }
    )
    pq.write_table(pa.Table.from_pandas(li, preserve_index=False),
                   OUT / "lineitem.parquet", row_group_size=200_000)
    od = pd.DataFrame(
        {
            "o_orderkey": np.arange(N_ORDERS, dtype=np.int64),
            "o_totalprice": (rng.integers(100, 10_000_000, N_ORDERS) / 100.0),
        }
    )
    pq.write_table(pa.Table.from_pandas(od, preserve_index=False),
                   OUT / "orders.parquet", row_group_size=200_000)
    (OUT / "_DONE").touch()


def main() -> None:
    import pandas as pd
    import ray

    ray.init(address="local", include_dashboard=False,
             ignore_reinit_error=True, logging_level="ERROR")
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False
    ensure_tables()

    from kryptone_ray.pipelines import events as E
    from kryptone_ray.pipelines import relational as R

    res: dict = {"n_events": N_EVENTS, "n_orders": N_ORDERS,
                 "n_users": N_USERS, "timings_sec": {}}

    assert N_EVENTS >= E.DISTRIBUTED_SESSIONS_MIN_ROWS, \
        "smoke must exercise the distributed sessionization path"
    t0 = time.time()
    sess = E.q_events_sessions(str(OUT))
    import ray.data as _rd

    if isinstance(sess, _rd.Dataset):  # streamed above the gate now
        sess = sess.to_pandas()
    sess = sess.sort_values("user_id").reset_index(drop=True)
    res["timings_sec"]["events_sessions"] = round(time.time() - t0, 2)

    # independent recount: one single-process vectorized pass
    ev = pd.read_parquet(OUT / "events.parquet")
    ref = E.sessionize_frame(ev, 30).sort_values("user_id").reset_index(drop=True)
    pd.testing.assert_frame_equal(sess, ref, check_dtype=False)
    res["sessions_users"] = len(sess)
    res["sessions_match_recount"] = True

    assert N_ORDERS * 4 >= R.DISTRIBUTED_JOIN_MIN_ROWS, \
        "smoke must exercise the native hash-join path"
    t0 = time.time()
    bj = R.q_bucketed_join(str(OUT))
    import ray.data as rd

    if isinstance(bj, rd.Dataset):
        bj = bj.to_pandas()
    res["timings_sec"]["bucketed_join"] = round(time.time() - t0, 2)

    li = pd.read_parquet(OUT / "lineitem.parquet")
    od = pd.read_parquet(OUT / "orders.parquet")
    g = li.groupby("l_orderkey").agg(sum_qty=("l_quantity", "sum"),
                                     n_lines=("l_quantity", "size")).reset_index()
    ref2 = g.merge(od, left_on="l_orderkey", right_on="o_orderkey")
    ref2 = ref2[["o_orderkey", "n_lines", "sum_qty", "o_totalprice"]] \
        .sort_values("o_orderkey").reset_index(drop=True)
    got = bj.sort_values("o_orderkey").reset_index(drop=True)[ref2.columns]
    pd.testing.assert_frame_equal(got, ref2, check_dtype=False)
    res["join_rows"] = len(got)
    res["join_match_recount"] = True

    ray.shutdown()
    print(json.dumps(res))


if __name__ == "__main__":
    main()
