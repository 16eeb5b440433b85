"""Round-3 operator scale smoke: synthesize tables ABOVE every new
small-input gate (orders 2.5M > DISTRIBUTED_JOIN_MIN_ROWS, events 600k >
DISTRIBUTED_SESSIONS_MIN_ROWS, documents 250k >
DISTRIBUTED_COMBINE_MIN_ROWS, customer 150k >
MINHASH_DISTRIBUTED_MIN_DOCS) so the genuinely distributed shapes of the
round-3 additions run UN-PATCHED — CDC merge, interval-overlap join,
grouped count-distinct, shingle-dedup census, edit-distance-1 join —
each verified against an independent recount (DuckDB over the same
parquet; the edit-1 pair count against a positional mask-group recount,
a different algorithm than the deletion-neighborhood pipeline).

Usage: python scripts/scale_smoke_round3.py [n_orders] [n_events] [n_docs] [n_names]
Prints one JSON line; evidence for BASELINE.md that the round-3 shapes
hold past bench scale.
"""

from __future__ import annotations

import json
import pathlib
import sys
import time

sys.path.insert(0, ".")

N_ORDERS = int(sys.argv[1]) if len(sys.argv) > 1 else 2_500_000
N_EVENTS = int(sys.argv[2]) if len(sys.argv) > 2 else 600_000
N_DOCS = int(sys.argv[3]) if len(sys.argv) > 3 else 250_000
N_NAMES = int(sys.argv[4]) if len(sys.argv) > 4 else 150_000
OUT = pathlib.Path(f"/tmp/kr_r3_smoke_{N_ORDERS}_{N_EVENTS}_{N_DOCS}_{N_NAMES}")

VOCAB = (
    "the quick brown fox jumps over lazy dog data pipeline ray arrow "
    "batch shuffle partition frontier crawl image caption vector hash "
    "join filter window stream spill actor block scan merge sort key"
).split()


def ensure_tables() -> None:
    import numpy as np
    import pandas as pd
    import pyarrow as pa
    import pyarrow.parquet as pq

    if (OUT / "_DONE").exists():
        return
    OUT.mkdir(parents=True, exist_ok=True)
    rng = np.random.default_rng(31)

    od = pd.DataFrame({
        "o_orderkey": np.arange(N_ORDERS, dtype=np.int64),
        "o_custkey": rng.integers(0, N_ORDERS // 10, N_ORDERS).astype(np.int64),
        "o_orderstatus": np.array(["O", "F", "P"])[
            rng.integers(0, 3, N_ORDERS)],
        "o_totalprice": rng.integers(100, 10_000_000, N_ORDERS) / 100.0,
        "o_orderdate": pd.Timestamp("1995-01-01")
        + pd.to_timedelta(rng.integers(0, 2400, N_ORDERS), unit="D"),
    })
    pq.write_table(pa.Table.from_pandas(od, preserve_index=False),
                   OUT / "orders.parquet", row_group_size=200_000)

    ev = pd.DataFrame({
        "event_id": np.arange(N_EVENTS, dtype=np.int64),
        "event_type": np.array(["view", "click", "purchase", "error"])[
            rng.integers(0, 4, N_EVENTS)],
        "user_id": rng.integers(0, N_EVENTS // 20, N_EVENTS).astype(np.int64),
        "ts": pd.Timestamp("2024-01-01")
        + pd.to_timedelta(rng.integers(0, 30 * 24 * 3600_000_000, N_EVENTS),
                          unit="us"),
        "value": rng.integers(3, 32753, N_EVENTS) / 100.0,
    })
    pq.write_table(pa.Table.from_pandas(ev, preserve_index=False),
                   OUT / "events.parquet", row_group_size=200_000)

    n_lines = N_ORDERS * 3
    li = pd.DataFrame({
        "l_orderkey": rng.integers(0, N_ORDERS, n_lines).astype(np.int64),
        "l_extendedprice": rng.integers(100, 10_000_000, n_lines) / 100.0,
    })
    pq.write_table(pa.Table.from_pandas(li, preserve_index=False),
                   OUT / "lineitem.parquet", row_group_size=200_000)

    vocab = np.array(VOCAB)
    n_words = rng.integers(8, 40, size=N_DOCS)
    texts = [" ".join(vocab[rng.integers(0, len(vocab), size=k)])
             for k in n_words]
    docs = pd.DataFrame({"doc_id": np.arange(N_DOCS, dtype=np.int64),
                         "text": texts})
    pq.write_table(pa.Table.from_pandas(docs, preserve_index=False),
                   OUT / "documents.parquet", row_group_size=50_000)

    names = pd.DataFrame({"c_name": [f"User#{i:07d}" for i in range(N_NAMES)]})
    pq.write_table(pa.Table.from_pandas(names, preserve_index=False),
                   OUT / "customer.parquet", row_group_size=50_000)
    (OUT / "_DONE").touch()


def main() -> None:
    import duckdb
    import numpy as np
    import pandas as pd
    import ray

    ensure_tables()
    if not ray.is_initialized():
        ray.init(address="local", num_cpus=32, include_dashboard=False,
                 logging_level="ERROR")
    import ray.data as rd

    rd.DataContext.get_current().enable_progress_bars = False

    from kryptone_ray.pipelines import dedup, events, relational, textops

    # gates must be BELOW the table sizes — assert, don't patch
    assert N_ORDERS >= relational.DISTRIBUTED_JOIN_MIN_ROWS
    assert N_EVENTS >= events.DISTRIBUTED_SESSIONS_MIN_ROWS
    assert N_DOCS >= textops.DISTRIBUTED_COMBINE_MIN_ROWS
    assert N_NAMES >= dedup.MINHASH_DISTRIBUTED_MIN_DOCS

    con = duckdb.connect()
    for t in ("orders", "events", "documents", "customer", "lineitem"):
        con.sql(f"CREATE VIEW {t} AS SELECT * "
                f"FROM read_parquet('{OUT}/{t}.parquet')")

    sf = str(OUT)
    times: dict[str, float] = {}

    def norm(df: pd.DataFrame) -> pd.DataFrame:
        df = df[sorted(df.columns)].copy()
        return df.sort_values(list(df.columns)).reset_index(drop=True)

    def run(name, fn, sql):
        t0 = time.time()
        res = fn(sf)
        if isinstance(res, rd.Dataset):
            res = res.to_pandas()
        times[name] = round(time.time() - t0, 2)
        oracle = con.sql(sql).df()
        pd.testing.assert_frame_equal(norm(res), norm(oracle),
                                      check_dtype=False)

    run("orders_cdc_merge", relational.q_orders_cdc_merge,
        relational.Q_ORDERS_CDC_MERGE_SQL)
    run("orders_scd2_census", relational.q_orders_scd2_census,
        relational.Q_ORDERS_SCD2_SQL)
    run("orders_overlap_pairs", relational.q_orders_overlap_pairs,
        relational.Q_ORDERS_OVERLAP_PAIRS_SQL)
    run("orders_lineitem_mergejoin", relational.q_orders_lineitem_mergejoin,
        relational.Q_ORDERS_LINEITEM_MERGEJOIN_SQL)
    run("events_type_distinct_users", events.q_events_type_distinct_users,
        events.Q_EVENTS_TYPE_DISTINCT_USERS_SQL)
    run("events_cohort_retention", events.q_events_cohort_retention,
        events.Q_EVENTS_COHORT_SQL)
    run("events_time_weighted_avg", events.q_events_time_weighted_avg,
        events.Q_EVENTS_TWA_SQL)
    run("events_pattern_matches", events.q_events_pattern_matches,
        events.Q_EVENTS_PATTERN_SQL)
    run("shingle_dedup_census", textops.q_shingle_dedup_census,
        textops.Q_SHINGLE_DEDUP_SQL)
    run("docs_id_encode", textops.q_docs_id_encode,
        textops.Q_DOCS_ID_ENCODE_SQL)

    # edit-1: count recount by a DIFFERENT algorithm — for equal-length
    # digit names distance-1 pairs differ in exactly one digit, so group
    # by each position-masked name and sum C(g, 2)
    t0 = time.time()
    pairs = dedup.q_name_edit1_pairs(sf)
    times["name_edit1_pairs"] = round(time.time() - t0, 2)
    names = pd.read_parquet(OUT / "customer.parquet")["c_name"]
    expected = 0
    for p in range(5, len("User#0000000")):  # the 7 digit positions
        masked = names.str.slice(0, p) + "_" + names.str.slice(p + 1)
        g = masked.value_counts().to_numpy()
        expected += int((g * (g - 1) // 2).sum())
    assert len(pairs) == expected, (len(pairs), expected)
    assert (pairs["name_a"] != pairs["name_b"]).all()

    ray.shutdown()
    print(json.dumps({"ok": True, "n_orders": N_ORDERS, "n_events": N_EVENTS,
                      "n_docs": N_DOCS, "n_names": N_NAMES,
                      "edit1_pairs": len(pairs), "times_sec": times}))


if __name__ == "__main__":
    main()
