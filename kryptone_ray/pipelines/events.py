"""Stream-shaped pipelines over the ``events`` table.

Ray Data has no event-time windows (ray_guide §streaming): windows are
expressed as ``groupby(key).map_groups`` over ts-sorted groups — the
same incremental-state shape as the reference's per-iteration counters
(Performance, base.py:199-250) and its politeness clock
(§2.7 streaming semantics).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from kryptone_ray.pipelines.common import T, parquet_rows, partial_sum_count

# events tables below this row count sessionize on the driver (one
# vectorized pandas pass); above it the hash-repartition + per-block
# pass kicks in. The distributed shape pays ~2 s of fixed shuffle cost
# locally (aggregator actor startup + barrier), which dominates at
# sf0.1 (100k events) — the same gate shape as
# textops.DISTRIBUTED_COMBINE_MIN_ROWS (tests force the distributed
# path by patching this to 0).
DISTRIBUTED_SESSIONS_MIN_ROWS = 500_000


def _cents_arrow(t, keep: list[str]):
    """value has exact 2 decimals → integer-cents sums are bit-identical
    across engines (see relational.q1 note). Zero-copy Arrow in,
    pyarrow.compute kernels — no per-batch pandas conversion."""
    import pyarrow as pa
    import pyarrow.compute as pc

    cents = pc.cast(pc.round(pc.multiply(t["value"], 100)), pa.int64())
    return pa.table([t[c] for c in keep] + [cents], names=keep + ["cents"])


def q_events_by_type(sf_dir: str) -> pd.DataFrame:
    from kryptone_ray.pipelines.common import partial_sum_count_arrow

    ds = T(sf_dir, "events", columns=["event_type", "value"]) \
        .map_batches(lambda t: _cents_arrow(t, ["event_type"]),
                     batch_format="pyarrow", batch_size=65536)
    out = partial_sum_count_arrow(ds, keys=["event_type"],
                                  sums={"cents": "cents"}, count_name="n")
    out["total_value"] = out.pop("cents") / 100.0
    out = out[["event_type", "total_value", "n"]]
    return out.sort_values("event_type").reset_index(drop=True)


Q_EVENTS_BY_TYPE_SQL = """
SELECT event_type, sum(CAST(round(value * 100) AS BIGINT)) / 100.0 AS total_value,
       count(*) AS n
FROM events GROUP BY event_type ORDER BY event_type
"""


def q_events_tumbling_1h(sf_dir: str) -> pd.DataFrame:
    """Tumbling 1-hour windows per event type: window key computed
    vectorized per batch (floor to hour), then partial-agg groupby —
    windows never materialize per-row state."""
    from kryptone_ray.pipelines.common import partial_sum_count_arrow

    ds = T(sf_dir, "events", columns=["event_type", "ts", "value"])

    def f(t):
        import pyarrow as pa
        import pyarrow.compute as pc

        win = pc.floor_temporal(t["ts"], unit="hour")
        cents = pc.cast(pc.round(pc.multiply(t["value"], 100)), pa.int64())
        return pa.table([t["event_type"], win, cents],
                        names=["event_type", "window_start", "cents"])

    ds = ds.map_batches(f, batch_format="pyarrow", batch_size=65536)
    out = partial_sum_count_arrow(
        ds, keys=["event_type", "window_start"],
        sums={"cents": "cents"}, count_name="n",
    )
    out["total_value"] = out.pop("cents") / 100.0
    out = out[["event_type", "window_start", "total_value", "n"]]
    return out.sort_values(["event_type", "window_start"]).reset_index(drop=True)


Q_EVENTS_TUMBLING_SQL = """
SELECT event_type, date_trunc('hour', ts) AS window_start,
       sum(CAST(round(value * 100) AS BIGINT)) / 100.0 AS total_value, count(*) AS n
FROM events GROUP BY event_type, date_trunc('hour', ts)
ORDER BY event_type, window_start
"""


def _sessionize_arrays(uid: np.ndarray, tsi: np.ndarray,
                       eid: np.ndarray, gap_ns: int):
    """One fully vectorized sessionization pass over parallel arrays
    holding ALL events of each of their users: lexsort by (user, ts,
    event_id), mark session starts (user change OR gap > threshold),
    then two reduceat sweeps over session-run boundaries. No per-user
    or per-session Python/pandas dispatch at all (VERDICT r4 #4 —
    the round-2 per-group loop paid ~1 ms/user; the round-4 pandas
    groupby pair still paid one hash aggregation per block).

    Returns (user_ids, n_sessions, max_session_events, n_events)."""
    order = np.lexsort((eid, tsi, uid))
    u, s = uid[order], tsi[order]
    n = len(u)
    new_sess = np.empty(n, dtype=bool)
    new_sess[0] = True
    new_sess[1:] = (u[1:] != u[:-1]) | ((s[1:] - s[:-1]) > gap_ns)
    starts = np.flatnonzero(new_sess)
    sess_len = np.diff(np.append(starts, n))
    sess_user = u[starts]
    u_new = np.empty(len(sess_user), dtype=bool)
    u_new[0] = True
    u_new[1:] = sess_user[1:] != sess_user[:-1]
    u_start = np.flatnonzero(u_new)
    return (sess_user[u_start],
            np.diff(np.append(u_start, len(sess_user))).astype(np.int64),
            np.maximum.reduceat(sess_len, u_start).astype(np.int64),
            np.add.reduceat(sess_len, u_start).astype(np.int64))


def sessionize_table(t: pa.Table, gap_minutes: int) -> pa.Table:
    """Arrow-native sessionization block: zero-copy int64 views of the
    (user_id, ts, event_id) columns into ``_sessionize_arrays``."""
    if not t.num_rows:
        return pa.table({"user_id": pa.array([], type=pa.int64()),
                         "n_sessions": pa.array([], type=pa.int64()),
                         "max_session_events": pa.array([], type=pa.int64()),
                         "n_events": pa.array([], type=pa.int64())})
    uid = t["user_id"].to_numpy(zero_copy_only=False)
    tsi = t["ts"].to_numpy(zero_copy_only=False) \
        .astype("datetime64[ns]").astype(np.int64)
    eid = t["event_id"].to_numpy(zero_copy_only=False)
    users, n_sess, max_len, n_ev = _sessionize_arrays(
        uid, tsi, eid, int(gap_minutes) * 60 * 1_000_000_000)
    return pa.table({"user_id": pa.array(users),
                     "n_sessions": pa.array(n_sess),
                     "max_session_events": pa.array(max_len),
                     "n_events": pa.array(n_ev)})


def sessionize_frame(df: pd.DataFrame, gap_minutes: int) -> pd.DataFrame:
    """Pandas wrapper over ``_sessionize_arrays`` (driver small path)."""
    users, n_sess, max_len, n_ev = _sessionize_arrays(
        df["user_id"].to_numpy(),
        df["ts"].to_numpy().astype("datetime64[ns]").astype(np.int64),
        df["event_id"].to_numpy(),
        int(gap_minutes) * 60 * 1_000_000_000)
    return pd.DataFrame({"user_id": users, "n_sessions": n_sess,
                         "max_session_events": max_len,
                         "n_events": n_ev})


def q_events_sessions(sf_dir: str, gap_minutes: int = 30) -> pd.DataFrame:
    """Sessionization: per-user session count + max session length, a
    session breaking on gaps > 30 min. Below the gate the whole
    (user_id, event_id, ts) projection fits the driver and one
    vectorized pass beats the shuffle's fixed cost; above it,
    hash-partition by user (every user's events land in ONE block,
    partition count sized from the footer row count like
    ``join_partitions`` — a fixed count would cap per-block memory at
    1/16th of the table) + the same vectorized pass per block.
    Ordering assumption: sort inside the group — ties on ts broken by
    event_id."""
    from kryptone_ray.pipelines.common import (hash_shuffle,
                                               join_partitions,
                                               parquet_rows)

    n_rows = parquet_rows(sf_dir, "events")
    if n_rows < DISTRIBUTED_SESSIONS_MIN_ROWS:
        df = T(sf_dir, "events",
               columns=["user_id", "event_id", "ts"]).to_pandas()
        out = sessionize_frame(df, gap_minutes)
        return out.sort_values("user_id").reset_index(drop=True)

    def sess_block(t: pa.Table) -> pa.Table:
        return sessionize_table(t, gap_minutes)

    # per-user output is table-sized at 10^10 events — return the
    # Dataset (the q_bucketed_join shape) instead of landing it whole
    # on the driver; the oracle compare is order-insensitive.
    with hash_shuffle():
        ds = T(sf_dir, "events", columns=["user_id", "event_id", "ts"])
        return ds.repartition(num_blocks=join_partitions(n_rows),
                              keys=["user_id"]) \
            .map_batches(sess_block, batch_format="pyarrow",
                         batch_size=None)


Q_EVENTS_SESSIONS_SQL = """
WITH marked AS (
  SELECT user_id, ts,
         CASE WHEN ts - lag(ts) OVER w > INTERVAL 30 MINUTE
              OR lag(ts) OVER w IS NULL THEN 1 ELSE 0 END AS new_session
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
), sess AS (
  SELECT user_id, ts,
         sum(new_session) OVER (PARTITION BY user_id
                                ORDER BY ts ROWS UNBOUNDED PRECEDING) AS sid
  FROM marked
), sized AS (
  SELECT user_id, sid, count(*) AS n FROM sess GROUP BY user_id, sid
)
SELECT user_id, count(*) AS n_sessions,
       CAST(max(n) AS BIGINT) AS max_session_events,
       CAST(sum(n) AS BIGINT) AS n_events
FROM sized GROUP BY user_id ORDER BY user_id
"""


def q_events_topk_users(sf_dir: str) -> pd.DataFrame:
    """Top-10 users by total value. Per-batch Arrow partials either way;
    below the gate the (user, batch) partials combine on the driver,
    above it (user cardinality grows with the table — the driver combine
    would BE the user table at 10^10 rows) they hash-repartition by user
    so each block's combine is globally exact for its users, each block
    emits a LOCAL top-10, and the driver merges 10 × n_blocks rows —
    the word_frequency at-scale top-k shape."""
    from kryptone_ray.pipelines.common import (hash_shuffle,
                                               join_partitions,
                                               parquet_rows,
                                               partial_sum_count_arrow)

    def finish(agg: pd.DataFrame) -> pd.DataFrame:
        agg["total_value"] = agg.pop("cents") / 100.0
        agg = agg[["user_id", "total_value", "n"]]
        return agg.sort_values(["total_value", "user_id"],
                               ascending=[False, True]).head(10)

    n_rows = parquet_rows(sf_dir, "events")
    if n_rows < DISTRIBUTED_SESSIONS_MIN_ROWS:
        ds = T(sf_dir, "events", columns=["user_id", "value"]) \
            .map_batches(lambda t: _cents_arrow(t, ["user_id"]),
                         batch_format="pyarrow", batch_size=65536)
        agg = partial_sum_count_arrow(ds, keys=["user_id"],
                                      sums={"cents": "cents"},
                                      count_name="n")
        return finish(agg).reset_index(drop=True)

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby("user_id", sort=False)["cents"].agg(["sum", "size"])
        g.columns = ["cents", "n"]
        return g.reset_index()

    def block_topk(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby("user_id", sort=False, as_index=False).sum()
        return finish(g)

    with hash_shuffle():
        ds = T(sf_dir, "events", columns=["user_id", "value"]) \
            .map_batches(lambda t: _cents_arrow(t, ["user_id"]),
                         batch_format="pyarrow", batch_size=65536) \
            .map_batches(partial, batch_format="pandas", batch_size=65536)
        cand = ds.repartition(num_blocks=join_partitions(n_rows),
                              keys=["user_id"]) \
            .map_batches(block_topk, batch_format="pandas",
                         batch_size=None).to_pandas()
    return cand.sort_values(["total_value", "user_id"],
                            ascending=[False, True]).head(10) \
        .reset_index(drop=True)


Q_EVENTS_TOPK_SQL = """
SELECT user_id, sum(CAST(round(value * 100) AS BIGINT)) / 100.0 AS total_value,
       count(*) AS n
FROM events GROUP BY user_id
ORDER BY total_value DESC, user_id LIMIT 10
"""


def q_events_sliding_1h_30m(sf_dir: str) -> pd.DataFrame:
    """SLIDING windows (width 1 h, step 30 min) per event type — the
    windowed-aggregate shape Ray Data lacks natively: each event is
    expanded to its two covering windows inside ``map_batches`` (no
    per-row state), then the usual partial-agg groupby. Window key =
    window START, so an event at 10:47 lands in the 10:30 and 10:00
    windows."""
    from kryptone_ray.pipelines.common import partial_sum_count_arrow

    ds = T(sf_dir, "events", columns=["event_type", "ts", "value"])

    def expand(t):
        import pyarrow as pa
        import pyarrow.compute as pc

        f30 = pc.floor_temporal(t["ts"], multiple=30, unit="minute")
        prev = pc.subtract(
            f30, pa.scalar(30 * 60 * 1_000_000, type=pa.duration("us")))
        cents = pc.cast(pc.round(pc.multiply(t["value"], 100)), pa.int64())
        names = ["event_type", "window_start", "cents"]
        a = pa.table([t["event_type"], f30, cents], names=names)
        b = pa.table([t["event_type"], prev, cents], names=names)
        return pa.concat_tables([a, b])

    out = partial_sum_count_arrow(
        ds.map_batches(expand, batch_format="pyarrow", batch_size=65536),
        keys=["event_type", "window_start"], sums={"cents": "cents"},
        count_name="n",
    )
    out["total_value"] = out.pop("cents") / 100.0
    out = out[["event_type", "window_start", "total_value", "n"]]
    return out.sort_values(["event_type", "window_start"]).reset_index(drop=True)


Q_EVENTS_SLIDING_SQL = """
SELECT event_type, window_start,
       sum(CAST(round(value * 100) AS BIGINT)) / 100.0 AS total_value,
       count(*) AS n
FROM (
  SELECT event_type, value,
         unnest([time_bucket(INTERVAL '30 minutes', ts),
                 time_bucket(INTERVAL '30 minutes', ts)
                   - INTERVAL 30 MINUTE]) AS window_start
  FROM events
)
GROUP BY event_type, window_start
ORDER BY event_type, window_start
"""


def q_events_asof_orders(sf_dir: str) -> pd.DataFrame:
    """AS-OF JOIN (task-brief custom operator): for each event, the
    latest order of the same key (``o_custkey = user_id``) with
    ``o_orderdate <= ts``; aggregated per user. Distributed shape: the
    native hash join CO-PARTITIONS events and orders by key, each
    joined block holds every (event × candidate-order) row of its keys,
    and the as-of selection is a vectorized in-block
    sort + groupby-tail(1). The per-key fan-out is bounded by
    orders-per-customer (~10 in TPC-H), which is the documented
    partitioning assumption — for unbounded keys switch the in-block
    step to sort-merge (merge_asof) over the two sides.

    Tie-break (two orders on the same date): larger ``o_orderkey`` wins,
    mirrored exactly in the oracle's row_number() ordering."""
    from kryptone_ray.pipelines.common import join_partitions, parquet_rows

    ev = T(sf_dir, "events", columns=["user_id", "event_id", "ts"])
    od = T(sf_dir, "orders", columns=["o_custkey", "o_orderkey", "o_orderdate"])
    npart = join_partitions(parquet_rows(sf_dir, "events"))
    joined = ev.join(od, "inner", num_partitions=npart,
                     on=("user_id",), right_on=("o_custkey",))

    def asof_block(df: pd.DataFrame) -> pd.DataFrame:
        df = df[df["o_orderdate"] <= df["ts"]]
        if not len(df):
            return pd.DataFrame({"user_id": pd.Series(dtype="int64"),
                                 "n_matched": pd.Series(dtype="int64"),
                                 "sum_asof_orderkey": pd.Series(dtype="int64")})
        best = (df.sort_values(["event_id", "o_orderdate", "o_orderkey"])
                  .groupby("event_id", sort=False).tail(1))
        g = best.groupby("user_id", sort=False)
        return pd.DataFrame(
            {"user_id": list(g.groups),
             "n_matched": g.size().to_numpy().astype("int64"),
             "sum_asof_orderkey": g["o_orderkey"].sum().to_numpy().astype("int64")}
        )

    parts_ds = joined.map_batches(asof_block, batch_format="pandas",
                                  batch_size=None)
    # per-user rows are complete per block (the join co-partitions by
    # key), and per-user output is table-sized at 10^10 events — above
    # the gate the Dataset streams out instead of landing on the driver
    if parquet_rows(sf_dir, "events") >= DISTRIBUTED_SESSIONS_MIN_ROWS:
        return parts_ds
    parts = parts_ds.to_pandas()
    out = parts.groupby("user_id", sort=False, as_index=False).sum()
    out["n_matched"] = out["n_matched"].astype("int64")
    out["sum_asof_orderkey"] = out["sum_asof_orderkey"].astype("int64")
    return out.sort_values("user_id").reset_index(drop=True)


def q_events_asof_orders_sortmerge(sf_dir: str) -> pd.DataFrame:
    """AS-OF JOIN, sort-merge strategy — the documented alternative for
    UNBOUNDED per-key fan-out (the hash-join path materializes every
    event × candidate-order row of a key; fine at ~10 orders/customer,
    quadratic when a key has millions of both). Shape: tag-union the two
    tables, hash-repartition by key so each block holds BOTH sides of
    its keys, and run ``pd.merge_asof`` per block — O(n log n) per
    block, no fan-out ever materialized. Ordering/tie-break identical to
    ``q_events_asof_orders`` (latest o_orderdate <= ts, larger
    o_orderkey wins date ties — guaranteed by sorting orders by
    (ts, o_orderkey) and merge_asof taking the LAST qualifying row);
    equality with the join path is asserted in tests."""
    from kryptone_ray.pipelines.common import (hash_shuffle,
                                               join_partitions,
                                               parquet_rows)

    def tag_events(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {"key": df["user_id"],
             "ts": df["ts"].astype("datetime64[us]"),  # unify for union
             "event_id": df["event_id"],
             "o_orderkey": np.int64(-1), "tag": "e"})

    def tag_orders(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {"key": df["o_custkey"],
             "ts": df["o_orderdate"].astype("datetime64[us]"),
             "event_id": np.int64(-1),
             "o_orderkey": df["o_orderkey"], "tag": "o"})

    def asof_block(df: pd.DataFrame) -> pd.DataFrame:
        ev = df[df["tag"] == "e"]
        od = df[df["tag"] == "o"]
        empty = pd.DataFrame({"user_id": pd.Series(dtype="int64"),
                              "n_matched": pd.Series(dtype="int64"),
                              "sum_asof_orderkey": pd.Series(dtype="int64")})
        if ev.empty or od.empty:
            return empty
        ev = ev[["key", "ts", "event_id"]].sort_values(
            ["ts", "event_id"], kind="stable")
        od = od[["key", "ts", "o_orderkey"]].sort_values(
            ["ts", "o_orderkey"], kind="stable")
        m = pd.merge_asof(ev, od, on="ts", by="key", direction="backward")
        m = m[m["o_orderkey"].notna()]
        if m.empty:
            return empty
        g = m.groupby("key", sort=False)
        return pd.DataFrame(
            {"user_id": list(g.groups),
             "n_matched": g.size().to_numpy().astype("int64"),
             "sum_asof_orderkey":
                 g["o_orderkey"].sum().to_numpy().astype("int64")})

    n_rows = parquet_rows(sf_dir, "events")
    npart = join_partitions(n_rows)
    with hash_shuffle():
        ev = T(sf_dir, "events", columns=["user_id", "event_id", "ts"]) \
            .map_batches(tag_events, batch_format="pandas", batch_size=65536)
        od = T(sf_dir, "orders",
               columns=["o_custkey", "o_orderkey", "o_orderdate"]) \
            .map_batches(tag_orders, batch_format="pandas", batch_size=65536)
        parts_ds = ev.union(od).repartition(num_blocks=npart, keys=["key"]) \
            .map_batches(asof_block, batch_format="pandas",
                         batch_size=None)
    # per-user output is table-sized — stream it above the gate
    if n_rows >= DISTRIBUTED_SESSIONS_MIN_ROWS:
        return parts_ds
    out = parts_ds.to_pandas()
    return out.sort_values("user_id").reset_index(drop=True)


Q_EVENTS_ASOF_SQL = """
WITH cand AS (
  SELECT e.user_id, e.event_id, o.o_orderkey,
         row_number() OVER (PARTITION BY e.event_id
                            ORDER BY o.o_orderdate DESC,
                                     o.o_orderkey DESC) AS rn
  FROM events e
  JOIN orders o ON o.o_custkey = e.user_id AND o.o_orderdate <= e.ts
)
SELECT user_id, count(*) AS n_matched,
       CAST(sum(o_orderkey) AS BIGINT) AS sum_asof_orderkey
FROM cand WHERE rn = 1
GROUP BY user_id ORDER BY user_id
"""


def q_events_json_props(sf_dir: str) -> pd.DataFrame:
    """JSON property extraction (the reference's dynamic dict payloads,
    encoders.py:8-65 analog): parse props per batch, aggregate k by
    type."""
    ds = T(sf_dir, "events", columns=["event_type", "props"])

    def f(df: pd.DataFrame) -> pd.DataFrame:
        import json

        df["k"] = df["props"].map(lambda s: int(json.loads(s)["k"]))
        return df[["event_type", "k"]]

    ds = ds.map_batches(f, batch_format="pandas", batch_size=65536)
    out = partial_sum_count(ds, keys=["event_type"], sums={"sum_k": "k"},
                            count_name="n")
    return out.sort_values("event_type").reset_index(drop=True)


Q_EVENTS_JSON_SQL = """
SELECT event_type, CAST(sum(CAST(props->>'k' AS BIGINT)) AS BIGINT) AS sum_k,
       count(*) AS n
FROM events GROUP BY event_type ORDER BY event_type
"""


# ---------------------------------------------------------------- sketches

HLL_P = 12  # 4096 registers — ~1.6% standard error (Flajolet et al. 2007)


def hll_partial(values: np.ndarray) -> np.ndarray:
    """(2^p,) uint8 register maxima for one batch of int64 keys —
    HyperLogLog (Flajolet-Fourier-Gandouet-Meunier 2007): register =
    top p hash bits, rank = leading-zero count of the remaining 64-p
    bits + 1, register keeps the max rank. Fully vectorized; XXH64 of
    the little-endian key bytes so the sketch is deterministic and
    mergeable across engines."""
    from kryptone_ray.utils.xxh64 import xxh64_padded

    buf = np.ascontiguousarray(values.astype("<i8")).view(np.uint8) \
        .reshape(len(values), 8)
    h = xxh64_padded(buf, np.full(len(values), 8, dtype=np.int64))
    reg = (h >> np.uint64(64 - HLL_P)).astype(np.int64)
    rest = (h << np.uint64(HLL_P)) | np.uint64((1 << HLL_P) - 1)
    # leading zeros of `rest` via float64 exponent would lose precision;
    # use the bit_length identity instead: lz = 64 - bit_length(rest)
    bl = np.zeros(len(values), dtype=np.int64)
    r = rest.copy()
    for shift in (32, 16, 8, 4, 2, 1):
        m = r >= (np.uint64(1) << np.uint64(shift))
        bl[m] += shift
        r[m] >>= np.uint64(shift)
    bl += 1  # bit_length of the residual 1
    rank = (64 - bl + 1).astype(np.uint8)
    out = np.zeros(1 << HLL_P, dtype=np.uint8)
    np.maximum.at(out, reg, rank)
    return out


def hll_estimate(registers: np.ndarray) -> float:
    """Standard HLL estimator with small-range (linear counting) and
    large-range corrections."""
    m = float(len(registers))
    alpha = 0.7213 / (1 + 1.079 / m)
    est = alpha * m * m / np.sum(np.exp2(-registers.astype(np.float64)))
    zeros = int(np.count_nonzero(registers == 0))
    if est <= 2.5 * m and zeros:
        est = m * np.log(m / zeros)
    elif est > (1 << 64) / 30.0:
        est = -(2.0 ** 64) * np.log(1 - est / 2.0 ** 64)
    return float(est)


def q_hll_distinct_users(sf_dir: str) -> pd.DataFrame:
    """Approximate distinct users per event type via a DISTRIBUTED
    HyperLOGLOG sketch — the brief's "novel sketch" custom operator:
    each batch emits one 4096-register partial per event type (a few KB,
    never the keys), the driver combine is an elementwise register MAX
    (associative/commutative — the defining sketch property, so the
    shape survives any partitioning at 10^10 rows), and the estimate is
    read off the merged registers. Deterministic given XXH64 →
    golden-pinned; accuracy vs exact asserted in tests (rows-only:
    DuckDB has no bit-exact HLL analog — its approx_count_distinct uses
    a different sketch)."""
    ds = T(sf_dir, "events", columns=["event_type", "user_id"])

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        rows = []
        for et, g in df.groupby("event_type", sort=False):
            rows.append((et, hll_partial(g["user_id"].to_numpy()).tobytes()))
        return pd.DataFrame(rows, columns=["event_type", "registers"])

    parts = ds.map_batches(partial, batch_format="pandas",
                           batch_size=65536).to_pandas()
    out = []
    for et, g in parts.groupby("event_type", sort=True):
        regs = np.zeros(1 << HLL_P, dtype=np.uint8)
        for b in g["registers"]:
            regs = np.maximum(regs, np.frombuffer(b, dtype=np.uint8))
        out.append((et, int(round(hll_estimate(regs)))))
    return pd.DataFrame(out, columns=["event_type", "approx_distinct_users"])


def q_events_value_band_join(sf_dir: str, band_cents: int = 5) -> pd.DataFrame:
    """NON-EQUI RANGE (BAND) JOIN — no equality key at all: every
    (event, customer) pair where the customer's account balance falls
    within ±``band_cents`` of the event value. The reference's
    numeric-window matching (price-comparison shape, parse_price /
    audit thresholds) expressed as a first-class distributed operator.

    Scale shape (the classic bucketized range join): both sides compare
    in exact integer cents. The numeric domain is cut into fixed-width
    buckets (width >= band, so an interval overlaps at most 2);
    customers emit ONE row to their point bucket, events emit one row
    per bucket their ±band interval overlaps (<=2), then a hash
    repartition on ``bucket`` co-locates every possibly-matching pair
    and each block finishes locally with a sort + searchsorted window
    sweep — each qualifying pair is produced exactly once (in the
    customer's point bucket), so no distinct pass is needed. The
    shuffle moves O(n) rows regardless of match density; nothing is
    ever broadcast. Below the gate the bucket partials merge on the
    driver (same emit/match code) instead of paying the shuffle's
    fixed cost."""
    from kryptone_ray.pipelines.common import (hash_shuffle,
                                               join_partitions,
                                               parquet_rows)

    width = max(100, 2 * band_cents)  # bucket width in cents
    n_events = parquet_rows(sf_dir, "events")

    def emit_events(df: pd.DataFrame) -> pd.DataFrame:
        cents = (df["value"] * 100).round().astype("int64")
        lo = (cents - band_cents) // width
        hi = (cents + band_cents) // width
        base = pd.DataFrame({"bucket": lo, "cents": cents,
                             "rid": df["event_id"], "is_probe": True})
        spill = base.loc[hi != lo].assign(bucket=hi[hi != lo])
        return pd.concat([base, spill], ignore_index=True)

    def emit_cust(df: pd.DataFrame) -> pd.DataFrame:
        cents = (df["c_acctbal"] * 100).round().astype("int64")
        return pd.DataFrame({"bucket": cents // width, "cents": cents,
                             "rid": df["c_custkey"], "is_probe": False})

    def band_block(df: pd.DataFrame) -> pd.DataFrame:
        ev = df[df["is_probe"]]
        cu = df[~df["is_probe"]]
        empty = pd.DataFrame({"event_id": pd.Series(dtype="int64"),
                              "c_custkey": pd.Series(dtype="int64")})
        if ev.empty or cu.empty:
            return empty
        out = []
        # per-bucket window sweep: sort customers once, binary-search
        # each event's [cents-band, cents+band] window
        for _, g in df.groupby("bucket", sort=False):
            e = g[g["is_probe"]]
            c = g[~g["is_probe"]].sort_values("cents", kind="stable")
            if e.empty or c.empty:
                continue
            cc = c["cents"].to_numpy()
            cid = c["rid"].to_numpy()
            lo = np.searchsorted(cc, e["cents"].to_numpy() - band_cents, "left")
            hi = np.searchsorted(cc, e["cents"].to_numpy() + band_cents, "right")
            n = hi - lo
            keep = n > 0
            if not keep.any():
                continue
            eids = np.repeat(e["rid"].to_numpy()[keep], n[keep])
            idx = np.concatenate(
                [np.arange(a, b) for a, b in zip(lo[keep], hi[keep])])
            out.append(pd.DataFrame({"event_id": eids,
                                     "c_custkey": cid[idx]}))
        return pd.concat(out, ignore_index=True) if out else empty

    def build_sides():
        # shuffle strategy is captured at dataset CREATION — build the
        # reads inside whichever context the branch needs
        ev = T(sf_dir, "events", columns=["event_id", "value"]) \
            .map_batches(emit_events, batch_format="pandas",
                         batch_size=65536)
        cu = T(sf_dir, "customer", columns=["c_custkey", "c_acctbal"]) \
            .map_batches(emit_cust, batch_format="pandas",
                         batch_size=65536)
        return ev, cu

    if n_events < DISTRIBUTED_SESSIONS_MIN_ROWS:
        ev, cu = build_sides()
        out = band_block(pd.concat([ev.to_pandas(), cu.to_pandas()],
                                   ignore_index=True))
        out = out.astype("int64")
        return out.sort_values(["event_id", "c_custkey"]) \
            .reset_index(drop=True)
    # pair output is table-sized (events x band density) — stream it
    with hash_shuffle():
        ev, cu = build_sides()
        return ev.union(cu).repartition(
            num_blocks=join_partitions(n_events), keys=["bucket"]) \
            .map_batches(lambda df: band_block(df).astype("int64"),
                         batch_format="pandas", batch_size=None)


Q_EVENTS_VALUE_BAND_SQL = """
SELECT e.event_id, c.c_custkey
FROM events e JOIN customer c
  ON abs(CAST(round(c.c_acctbal * 100) AS BIGINT)
         - CAST(round(e.value * 100) AS BIGINT)) <= 5
ORDER BY e.event_id, c.c_custkey
"""


def q_events_gap_to_next(sf_dir: str) -> pd.DataFrame:
    """OFFSET WINDOW (``lead() OVER (PARTITION BY user ORDER BY ts)``
    shape — the reference's inter-request politeness gap measurement,
    base.py wait-loop timing): per event, the exact microseconds until
    the SAME user's next event; a user's last event emits nothing.

    Scale shape: identical partitioning requirement to sessionization —
    each user's full history in one block — so it reuses the same
    hash-repartition-by-user layout (footer-sized partition count)
    with one vectorized sort + shift(-1) pass per block, and the same
    driver pass below the gate. Ties on ts broken by event_id."""
    from kryptone_ray.pipelines.common import (hash_shuffle,
                                               join_partitions,
                                               parquet_rows)

    def gaps(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(["user_id", "ts", "event_id"], kind="stable")
        same = df["user_id"].eq(df["user_id"].shift(-1))
        # exact integer microseconds (ns view // 1000) — a float
        # seconds delta truncates differently than SQL's boundary count
        gap = (df["ts"].shift(-1) - df["ts"]).astype("timedelta64[ns]")
        out = pd.DataFrame({"event_id": df["event_id"],
                            "user_id": df["user_id"],
                            "gap_us": gap.astype("int64") // 1000})[same]
        return out

    def build():
        return T(sf_dir, "events", columns=["user_id", "event_id", "ts"])

    n_rows = parquet_rows(sf_dir, "events")
    if n_rows < DISTRIBUTED_SESSIONS_MIN_ROWS:
        out = gaps(build().to_pandas())
        return out.sort_values("event_id").reset_index(drop=True)
    # per-event output is table-sized — stream it above the gate
    with hash_shuffle():
        return build().repartition(
            num_blocks=join_partitions(n_rows),
            keys=["user_id"]) \
            .map_batches(gaps, batch_format="pandas",
                         batch_size=None)


Q_EVENTS_GAP_SQL = """
WITH e AS (SELECT user_id, event_id, ts,
                  lead(ts) OVER (PARTITION BY user_id
                                 ORDER BY ts, event_id) AS nxt
           FROM events)
SELECT event_id, user_id,
       CAST(date_diff('microsecond', ts, nxt) AS BIGINT) AS gap_us
FROM e WHERE nxt IS NOT NULL ORDER BY event_id
"""


# the event_type domain is CLOSED (generator-fixed 5 values) — pivot
# output columns are deterministic, independent of which types a given
# slice of data happens to contain
EVENT_TYPES = ["click", "error", "purchase", "signup", "view"]


def q_events_pivot_daily(sf_dir: str) -> pd.DataFrame:
    """PIVOT / CROSSTAB (``count(*) FILTER (WHERE type = ...)`` wide
    table — the reference's per-domain × per-verdict URL census,
    url_distribution rotated): one row per calendar day with a count
    column per event type.

    Scale shape: per-batch (day, type) partials — bounded by
    days × 5 types per batch regardless of row count — combine on the
    driver and rotate wide there; the fact table never shuffles and
    nothing wider than the final crosstab materializes. Days with no
    events of a type get 0 (the closed-domain contract above)."""
    from kryptone_ray.pipelines.common import partial_sum_count_arrow

    ds = T(sf_dir, "events", columns=["ts", "event_type"])

    def prep(t):
        import pyarrow as pa
        import pyarrow.compute as pc

        day = pc.cast(pc.floor_temporal(t["ts"], unit="day"),
                      pa.timestamp("us"))
        one = pa.array(np.ones(len(t), dtype=np.int64))
        return pa.table([day, t["event_type"], one],
                        names=["day", "event_type", "one"])

    long = partial_sum_count_arrow(
        ds.map_batches(prep, batch_format="pyarrow", batch_size=65536),
        keys=["day", "event_type"], sums={"n": "one"})
    wide = long.pivot_table(index="day", columns="event_type", values="n",
                            fill_value=0, aggfunc="sum")
    for et in EVENT_TYPES:
        if et not in wide.columns:
            wide[et] = 0
    out = wide[EVENT_TYPES].astype("int64").reset_index()
    out.columns = ["day"] + [f"n_{et}" for et in EVENT_TYPES]
    out.columns.name = None
    return out.sort_values("day").reset_index(drop=True)


Q_EVENTS_PIVOT_SQL = """
SELECT date_trunc('day', ts) AS day,
       count(*) FILTER (WHERE event_type = 'click')    AS n_click,
       count(*) FILTER (WHERE event_type = 'error')    AS n_error,
       count(*) FILTER (WHERE event_type = 'purchase') AS n_purchase,
       count(*) FILTER (WHERE event_type = 'signup')   AS n_signup,
       count(*) FILTER (WHERE event_type = 'view')     AS n_view
FROM events GROUP BY day ORDER BY day
"""


def q_value_quantiles_sketch(sf_dir: str) -> pd.DataFrame:
    """APPROXIMATE QUANTILES via mergeable KLL-style sketch
    (``stages/sketches.py``) — the unbounded-domain scale path beside
    ``relational.q_acctbal_quantiles``'s exact bounded-cents histogram:
    p50/p90/p99 of event value per event type.

    Scale shape: one fixed-size sketch per (type, batch) serialized to
    bytes — O(k log n) each regardless of row count — merged
    associatively on the driver (same two-level pattern as the HLL
    registers). Rank error ~O(1/k); accuracy and merge properties are
    pytest-verified against exact quantiles (no SQL oracle — the
    sketch's answer is approximate by design, rows-only entry)."""
    from kryptone_ray.stages.sketches import KllSketch

    ds = T(sf_dir, "events", columns=["event_type", "value"])

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        rows = []
        for et, g in df.groupby("event_type", sort=False):
            sk = KllSketch().add(g["value"].to_numpy())
            rows.append((et, sk.to_bytes()))
        return pd.DataFrame(rows, columns=["event_type", "sketch"])

    parts = ds.map_batches(partial, batch_format="pandas",
                           batch_size=65536).to_pandas()
    out = []
    for et, g in parts.groupby("event_type", sort=True):
        acc = None
        for b in g["sketch"]:
            sk = KllSketch.from_bytes(b)
            acc = sk if acc is None else acc.merge(sk)
        out.append((et, round(acc.quantile(0.5), 2),
                    round(acc.quantile(0.9), 2),
                    round(acc.quantile(0.99), 2)))
    return pd.DataFrame(out, columns=["event_type", "p50_approx",
                                      "p90_approx", "p99_approx"])


def q_events_partitioned_sink(sf_dir: str) -> pd.DataFrame:
    """RESUMABLE PARTITIONED OUTPUT (task-brief "resumable output"):
    write the events table as one parquet directory per calendar day,
    each sealed with a ``_SUCCESS`` marker so a crashed run's re-run
    skips finished days (``stages/sinks.write_partitioned_resumable``).
    Returns the (partition, n_rows) manifest — which is what the SQL
    oracle checks, while the resume-skip behavior itself is covered by
    tests/test_partitioned_sink.py."""
    import hashlib
    import pathlib
    import shutil

    from kryptone_ray.stages.sinks import write_partitioned_resumable

    def build():
        ds = T(sf_dir, "events", columns=["event_id", "ts", "event_type"])

        def day_col(df: pd.DataFrame) -> pd.DataFrame:
            out = df[["event_id", "event_type"]].copy()
            out["day"] = df["ts"].dt.strftime("%Y-%m-%d")
            return out

        return ds.map_batches(day_col, batch_format="pandas",
                              batch_size=65536)

    tag = hashlib.sha1(sf_dir.encode()).hexdigest()[:10]
    out_dir = pathlib.Path(f"/tmp/kr_events_by_day_{tag}")
    shutil.rmtree(out_dir, ignore_errors=True)  # oracle wants a cold run
    manifest = write_partitioned_resumable(build, out_dir, "day")
    return manifest[["partition", "n_rows"]].reset_index(drop=True)


Q_EVENTS_PARTITIONED_SINK_SQL = """
SELECT strftime(ts, '%Y-%m-%d') AS partition, count(*) AS n_rows
FROM events GROUP BY partition ORDER BY partition
"""


def q_heavy_hitters_sketch(sf_dir: str, k: int = 10,
                           candidates_per_batch: int = 32) -> pd.DataFrame:
    """APPROXIMATE HEAVY HITTERS via mergeable Count-Min sketch
    (``stages/sketches.CountMinSketch``) — the unbounded-key-domain
    scale path beside the exact ``q_events_topk_users``: top-k users by
    estimated event count.

    Scale shape: each batch emits ONE fixed-size sketch (depth×width
    int64, independent of row count) plus its local top candidate ids;
    the driver sums the counter arrays (exact associative merge) and
    ranks the unioned candidates by merged estimate. A true global
    top-k member is always some batch's local heavy hitter long before
    it is globally heavy, so the candidate union misses a true top-k
    key only if it is locally rare in EVERY batch — the classic
    candidate-set caveat, bounded by candidates_per_batch × n_batches
    driver rows. Estimates never undercount (CM property, pytest);
    rows-only entry — approximate by design."""
    from kryptone_ray.stages.sketches import CountMinSketch

    ds = T(sf_dir, "events", columns=["user_id"])

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        ids = df["user_id"].to_numpy()
        sk = CountMinSketch().add(ids)
        cand = df["user_id"].value_counts().head(candidates_per_batch)
        return pd.DataFrame(
            {"sketch": [sk.to_bytes()],
             "candidates": [cand.index.to_numpy().tolist()]})

    parts = ds.map_batches(partial, batch_format="pandas",
                           batch_size=65536).to_pandas()
    acc = None
    cands: set[int] = set()
    for _, row in parts.iterrows():
        sk = CountMinSketch.from_bytes(row["sketch"])
        acc = sk if acc is None else acc.merge(sk)
        cands.update(int(c) for c in row["candidates"])
    cand_arr = np.array(sorted(cands), dtype=np.int64)
    est = acc.estimate(cand_arr)
    order = np.lexsort((cand_arr, -est))[:k]
    out = pd.DataFrame({"user_id": cand_arr[order],
                        "est_events": est[order].astype("int64")})
    return out.reset_index(drop=True)


def q_events_hourly_full_outer(sf_dir: str) -> pd.DataFrame:
    """FULL OUTER JOIN of two grouped aggregates: hourly purchase
    counts vs hourly signup counts, keeping hours where either side is
    missing (COALESCE 0) — the join family's last quadrant after
    inner/semi/anti/as-of/band.

    Scale shape: one scan (not two) — each batch filters to the two
    types and emits (hour, type, n) partials in zero-copy Arrow; the
    key domain is bounded by the time range (hours, not rows), so the
    outer merge of the two combined sides runs on the driver like the
    pivot. For an unbounded join key the partials hash-partition by
    key and each block outer-merges its own slice (the
    events_pivot_daily / set-ops block shape)."""
    import pyarrow as pa
    import pyarrow.compute as pc

    def partial(t: pa.Table) -> pa.Table:
        keep = pc.is_in(t["event_type"],
                        value_set=pa.array(["purchase", "signup"]))
        sub = t.filter(keep)
        hr = pc.floor_temporal(sub["ts"], unit="hour")
        g = pa.table({"hour": hr, "event_type": sub["event_type"]}) \
            .group_by(["hour", "event_type"], use_threads=False) \
            .aggregate([("hour", "count")])
        return pa.table({"hour": g["hour"], "event_type": g["event_type"],
                         "n": pc.cast(g["hour_count"], pa.int64())})

    df = T(sf_dir, "events", columns=["ts", "event_type"]) \
        .map_batches(partial, batch_format="pyarrow", batch_size=65536) \
        .to_pandas()
    g = df.groupby(["hour", "event_type"], sort=False)["n"].sum() \
        .reset_index()
    a = g[g["event_type"] == "purchase"][["hour", "n"]] \
        .rename(columns={"n": "n_purchase"})
    b = g[g["event_type"] == "signup"][["hour", "n"]] \
        .rename(columns={"n": "n_signup"})
    out = a.merge(b, on="hour", how="outer")
    out["n_purchase"] = out["n_purchase"].fillna(0).astype("int64")
    out["n_signup"] = out["n_signup"].fillna(0).astype("int64")
    return out.sort_values("hour").reset_index(drop=True)


Q_EVENTS_HOURLY_FULL_OUTER_SQL = """
WITH a AS (SELECT date_trunc('hour', ts) AS hour, count(*) AS n_purchase
           FROM events WHERE event_type = 'purchase' GROUP BY 1),
     b AS (SELECT date_trunc('hour', ts) AS hour, count(*) AS n_signup
           FROM events WHERE event_type = 'signup' GROUP BY 1)
SELECT COALESCE(a.hour, b.hour) AS hour,
       COALESCE(n_purchase, 0) AS n_purchase,
       COALESCE(n_signup, 0) AS n_signup
FROM a FULL OUTER JOIN b ON a.hour = b.hour
ORDER BY hour
"""


def q_events_argmax_user(sf_dir: str) -> pd.DataFrame:
    """ARG-MAX reduce (``max_by``): per event type, the single event
    with the highest value — carrying the OTHER columns of the winning
    row, which a sum/count aggregate cannot do. Tie-break is total and
    deterministic (value DESC, user_id, event_id), expressed in SQL as
    a row_number() window rather than DuckDB's tie-arbitrary arg_max.

    Scale shape: each batch keeps one candidate row per type (the
    partial IS an argmax — associative), so the driver combine sees
    #types × #batches rows. A per-key variant at unbounded key
    cardinality rides a hash partition like top_orders_per_customer."""
    keys = ["value", "user_id", "event_id"]
    asc = [False, True, True]

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        return df.sort_values(keys, ascending=asc) \
            .groupby("event_type", sort=False).head(1)

    parts = T(sf_dir, "events",
              columns=["event_type", "event_id", "user_id", "value"]) \
        .map_batches(partial, batch_format="pandas", batch_size=65536) \
        .to_pandas()
    out = parts.sort_values(keys, ascending=asc) \
        .groupby("event_type", sort=False).head(1)
    out = out[["event_type", "user_id", "event_id", "value"]] \
        .rename(columns={"user_id": "top_user", "event_id": "top_event",
                         "value": "top_value"})
    return out.sort_values("event_type").reset_index(drop=True)


Q_EVENTS_ARGMAX_SQL = """
SELECT event_type, user_id AS top_user, event_id AS top_event,
       value AS top_value
FROM (SELECT *, row_number() OVER (PARTITION BY event_type
          ORDER BY value DESC, user_id, event_id) AS rn FROM events)
WHERE rn = 1 ORDER BY event_type
"""


def q_events_value_stddev(sf_dir: str) -> pd.DataFrame:
    """EXACT distributed variance/stddev per group — the classic
    "impossible to hash-match" float aggregate made deterministic:
    per-batch integer partials (n, Σc, Σc²) in cents, combined on the
    driver in arbitrary-precision Python ints (Σc² crosses int64 at
    ~1e12 events — int64 partials per batch stay safe, the COMBINE is
    where overflow lives, mirrored in SQL by HUGEINT casts), then
    stddev = sqrt(n·Σc² − (Σc)²) / (100·n) — one float cast, one sqrt,
    one division, identical on both engines."""
    import math

    import pyarrow as pa
    import pyarrow.compute as pc

    def partial(t: pa.Table) -> pa.Table:
        c = pc.cast(pc.round(pc.multiply(t["value"], 100)), pa.int64())
        g = pa.table({"event_type": t["event_type"], "c": c,
                      "c2": pc.multiply(c, c)}) \
            .group_by(["event_type"], use_threads=False) \
            .aggregate([("c", "sum"), ("c2", "sum"), ("c", "count")])
        return pa.table({"event_type": g["event_type"],
                         "s": g["c_sum"], "s2": g["c2_sum"],
                         "n": pc.cast(g["c_count"], pa.int64())})

    df = T(sf_dir, "events", columns=["event_type", "value"]) \
        .map_batches(partial, batch_format="pyarrow", batch_size=65536) \
        .to_pandas()
    rows = []
    for et, sub in df.groupby("event_type", sort=True):
        n = int(sub["n"].sum())
        s = sum(int(v) for v in sub["s"])     # Python ints: no overflow
        s2 = sum(int(v) for v in sub["s2"])
        var_num = n * s2 - s * s              # exact integer
        rows.append({"event_type": et, "n": n,
                     "total_value": s / 100.0,
                     "stddev_value": math.sqrt(float(var_num)) / (100.0 * n)})
    return pd.DataFrame(rows)


Q_EVENTS_VALUE_STDDEV_SQL = """
WITH p AS (SELECT event_type,
                  CAST(round(value * 100) AS BIGINT) AS c FROM events)
SELECT event_type, count(*) AS n,
       sum(c) / 100.0 AS total_value,
       sqrt(CAST(count(*) * sum(CAST(c AS HUGEINT) * c)
                 - CAST(sum(c) AS HUGEINT) * sum(c) AS DOUBLE))
           / (100.0 * count(*)) AS stddev_value
FROM p GROUP BY event_type ORDER BY event_type
"""


def q_events_cumulative_users(sf_dir: str) -> pd.DataFrame:
    """CUMULATIVE DISTINCT (first-touch attribution): distinct users
    seen up to each day — a running COUNT(DISTINCT) that needs no
    per-day sets: per-batch partial ``min(day) per user`` (associative
    min), combine to each user's true first day, histogram first days
    (bounded domain), cumsum. The per-user combine runs on the driver
    below the sessions gate and hash-partitions by user above it —
    only (user, day) pairs ever move."""
    import pyarrow as pa
    import pyarrow.compute as pc

    def partial(t: pa.Table) -> pa.Table:
        day = pc.floor_temporal(t["ts"], unit="day")
        g = pa.table({"user_id": t["user_id"], "day": day}) \
            .group_by(["user_id"], use_threads=False) \
            .aggregate([("day", "min")])
        return pa.table({"user_id": g["user_id"], "day": g["day_min"]})

    def build():
        return T(sf_dir, "events", columns=["user_id", "ts"]) \
            .map_batches(partial, batch_format="pyarrow", batch_size=65536)

    from kryptone_ray.pipelines.common import parquet_rows

    if parquet_rows(sf_dir, "events") < DISTRIBUTED_SESSIONS_MIN_ROWS:
        df = build().to_pandas()
        first = df.groupby("user_id", sort=False)["day"].min()
        hist = first.value_counts().sort_index()
    else:
        from kryptone_ray.pipelines.common import (hash_shuffle,
                                                   join_partitions)

        # per-user first days are table-sized; each block (holding ALL
        # of its users' partials after the hash shuffle) collapses to
        # its O(#days) first-day histogram, and the driver only sums
        # histograms — never sees a per-user row.
        def block_hist(df: pd.DataFrame) -> pd.DataFrame:
            first = df.groupby("user_id", sort=False)["day"].min()
            h = first.value_counts()
            return pd.DataFrame({"day": h.index,
                                 "n_new": h.to_numpy().astype("int64")})

        with hash_shuffle():
            parts = build().repartition(
                num_blocks=join_partitions(parquet_rows(sf_dir, "events")),
                keys=["user_id"]) \
                .map_batches(block_hist, batch_format="pandas",
                             batch_size=None).to_pandas()
        hist = parts.groupby("day", sort=True)["n_new"].sum()
    return pd.DataFrame({"day": hist.index,
                         "n_new": hist.to_numpy().astype("int64"),
                         "cum_users": hist.cumsum().to_numpy().astype("int64")})


Q_EVENTS_CUMULATIVE_USERS_SQL = """
SELECT day, n_new,
       CAST(sum(n_new) OVER (ORDER BY day) AS BIGINT) AS cum_users
FROM (SELECT first_day AS day, count(*) AS n_new
      FROM (SELECT user_id, min(date_trunc('day', ts)) AS first_day
            FROM events GROUP BY user_id)
      GROUP BY first_day)
ORDER BY day
"""


def q_events_late_census(sf_dir: str,
                         lateness_minutes: int = 10) -> pd.DataFrame:
    """WATERMARK / LATE-DATA CENSUS — the streaming-semantics operator
    every event pipeline eventually needs: with arrival order defined
    by ``event_id`` (ingestion sequence) and the watermark = the
    maximum event time seen so far, count per 1-hour tumbling window
    how many events arrived more than ``lateness_minutes`` behind the
    watermark (i.e. would have missed their window had it been
    finalized at the watermark).

    A GLOBAL ordered prefix-max is not batch-decomposable, so the
    distributed shape is the ntile-shards recipe turned inward:
    pass 1 streams per-arrival-bucket (event_id // B) max-ts partials;
    the driver exclusive-prefix-maxes the tiny bucket vector (bucket
    count capped at 65 536 — B grows with the table, the driver state
    does not); pass 2 hash-partitions rows by bucket, and each block
    computes the in-bucket shifted prefix-max, seeds it with the
    bucket's offset, and emits per-window (n_events, n_late) partials.
    Exact integer µs comparisons throughout — no float time math."""
    import pyarrow as pa

    LATE_US = np.int64(lateness_minutes * 60 * 1_000_000)
    n_rows = parquet_rows(sf_dir, "events")
    NEG = np.int64(-(2**62))

    def census(ts_us: np.ndarray, wm: np.ndarray) -> pd.DataFrame:
        late = ts_us < wm - LATE_US
        hour = ts_us - (ts_us % np.int64(3_600_000_000))
        g = pd.DataFrame({"h": hour, "late": late.astype(np.int64)}) \
            .groupby("h", sort=False)["late"].agg(["size", "sum"])
        return pd.DataFrame({
            "window_start": pd.to_datetime(g.index.to_numpy(), unit="us"),
            "n_events": g["size"].to_numpy().astype("int64"),
            "n_late": g["sum"].to_numpy().astype("int64")})

    def finish(parts: pd.DataFrame) -> pd.DataFrame:
        out = parts.groupby("window_start", sort=True, as_index=False)[
            ["n_events", "n_late"]].sum()
        out["n_events"] = out["n_events"].astype("int64")
        out["n_late"] = out["n_late"].astype("int64")
        return out.reset_index(drop=True)

    if n_rows < DISTRIBUTED_SESSIONS_MIN_ROWS:
        df = T(sf_dir, "events", columns=["event_id", "ts"]).to_pandas()
        df = df.sort_values("event_id", kind="stable")
        ts_us = df["ts"].to_numpy().astype("datetime64[us]").astype(np.int64)
        wm = np.maximum.accumulate(ts_us)
        wm = np.concatenate([[NEG], wm[:-1]])  # strictly-earlier arrivals
        return finish(census(ts_us, wm))

    from kryptone_ray.pipelines.common import hash_shuffle, join_partitions

    B = max(8192, n_rows // 65536 + 1)

    def prep(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        eid = pc.cast(t["event_id"], pa.int64())
        ts_us = pc.cast(t["ts"], pa.timestamp("us")).cast(pa.int64())
        bucket = pc.divide(eid, B)
        return pa.table([eid, ts_us, bucket],
                        names=["eid", "ts_us", "bucket"])

    def bucket_partial(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby("bucket", sort=False)["ts_us"].max()
        return pd.DataFrame({"bucket": g.index.to_numpy(),
                             "mx": g.to_numpy()})

    # pass 1: bucket → max ts (driver state capped at 65 536 rows)
    parts = T(sf_dir, "events", columns=["event_id", "ts"]) \
        .map_batches(prep, batch_format="pyarrow", batch_size=65536) \
        .map_batches(bucket_partial, batch_format="pandas",
                     batch_size=None).to_pandas()
    bmax = parts.groupby("bucket", sort=True)["mx"].max()
    offsets = np.concatenate(
        [[NEG], np.maximum.accumulate(bmax.to_numpy())[:-1]])
    off_map = dict(zip(bmax.index.to_numpy(), offsets))

    import ray

    off_ref = ray.put(off_map)

    def block_census(df: pd.DataFrame) -> pd.DataFrame:
        om = ray.get(off_ref)
        out = []
        for b, g in df.groupby("bucket", sort=False):
            g = g.sort_values("eid", kind="stable")
            ts_us = g["ts_us"].to_numpy()
            wm = np.maximum.accumulate(ts_us)
            wm = np.concatenate([[om[b]], wm[:-1]])
            wm = np.maximum(wm, om[b])
            out.append(census(ts_us, wm))
        return pd.concat(out, ignore_index=True) if out else pd.DataFrame(
            {"window_start": pd.Series([], dtype="datetime64[us]"),
             "n_events": pd.Series([], dtype="int64"),
             "n_late": pd.Series([], dtype="int64")})

    with hash_shuffle():
        res = T(sf_dir, "events", columns=["event_id", "ts"]) \
            .map_batches(prep, batch_format="pyarrow",
                         batch_size=65536) \
            .repartition(num_blocks=join_partitions(n_rows),
                         keys=["bucket"]) \
            .map_batches(block_census, batch_format="pandas",
                         batch_size=None).to_pandas()
    return finish(res)


Q_EVENTS_LATE_CENSUS_SQL = """
WITH w AS (SELECT ts,
                  max(ts) OVER (ORDER BY event_id
                                ROWS BETWEEN UNBOUNDED PRECEDING
                                AND 1 PRECEDING) AS wm
           FROM events)
SELECT date_trunc('hour', ts) AS window_start,
       count(*) AS n_events,
       CAST(count(*) FILTER (WHERE wm IS NOT NULL
                             AND ts < wm - INTERVAL 10 MINUTES)
            AS BIGINT) AS n_late
FROM w GROUP BY window_start ORDER BY window_start
"""


def q_events_type_distinct_users(sf_dir: str) -> pd.DataFrame:
    """Exact grouped COUNT(DISTINCT): distinct users + event count per
    event type (the reference's per-domain visited-URL tallies,
    base.py urls_to_visit/visited bookkeeping, as a grouped aggregate).

    COUNT(DISTINCT) is not sum-decomposable, but its two-level form is:
    per-batch partials collapse to one ``(event_type, user_id, n)`` row
    per distinct pair — bounded by the pair domain, not the row count —
    then a combine dedups pairs and counts them per type. Below the
    sessions gate the pair partials combine on the driver; above it
    they hash-partition by ``user_id`` (all copies of a pair land in
    one block) and each block emits per-type ``(n_users, n_events)``
    partials that sum driver-side — only pairs ever move, never rows."""
    import pyarrow as pa

    def partial(t: pa.Table) -> pa.Table:
        g = t.group_by(["event_type", "user_id"], use_threads=False) \
            .aggregate([("user_id", "count")])
        return g.rename_columns(["event_type", "user_id", "n"])

    def build():
        return T(sf_dir, "events", columns=["event_type", "user_id"]) \
            .map_batches(partial, batch_format="pyarrow", batch_size=65536)

    from kryptone_ray.pipelines.common import parquet_rows

    n_rows = parquet_rows(sf_dir, "events")
    if n_rows < DISTRIBUTED_SESSIONS_MIN_ROWS:
        pairs = build().to_pandas()
        g = pairs.groupby("event_type", sort=False)
        out = pd.DataFrame({
            "n_users": g["user_id"].nunique(),
            "n_events": g["n"].sum().astype("int64"),
        }).reset_index()
    else:
        from kryptone_ray.pipelines.common import (hash_shuffle,
                                                   join_partitions)

        def block_combine(df: pd.DataFrame) -> pd.DataFrame:
            g = df.groupby("event_type", sort=False)
            return pd.DataFrame({
                "n_users": g["user_id"].nunique().astype("int64"),
                "n_events": g["n"].sum().astype("int64"),
            }).reset_index()

        with hash_shuffle():
            parts = build().repartition(
                num_blocks=join_partitions(n_rows), keys=["user_id"]) \
                .map_batches(block_combine, batch_format="pandas",
                             batch_size=None).to_pandas()
        g = parts.groupby("event_type", sort=False)
        out = pd.DataFrame({
            "n_users": g["n_users"].sum().astype("int64"),
            "n_events": g["n_events"].sum().astype("int64"),
        }).reset_index()
    return out.sort_values("event_type").reset_index(drop=True)


Q_EVENTS_TYPE_DISTINCT_USERS_SQL = """
SELECT event_type, count(DISTINCT user_id) AS n_users,
       count(*) AS n_events
FROM events GROUP BY event_type ORDER BY event_type
"""


def q_events_value_median(sf_dir: str) -> pd.DataFrame:
    """EXACT grouped median + mode without a sort: ``value`` carries
    exactly 2 decimals, so the cents domain is bounded (~2^15 distinct
    values) and order statistics reduce to a histogram — per-batch
    ``(event_type, cents) → count`` partials, one tiny groupby-sum
    shuffle over domain-bounded rows, then cumulative counts on the
    driver. At 10^10 rows the shuffled state is still ≤ |types| ×
    |cents domain| rows; no gate needed because nothing here grows
    with the row count.

    Deterministic definitions (matched in the SQL): median = LOWER
    median (smallest cents with 2·cum ≥ n); mode = smallest cents
    among the max-count values."""
    import pyarrow as pa
    import pyarrow.compute as pc

    from kryptone_ray.pipelines.common import partial_sum_count_arrow

    def prep(t: pa.Table) -> pa.Table:
        cents = pc.cast(pc.round(pc.multiply(t["value"], 100)), pa.int64())
        return pa.table({"event_type": t["event_type"], "cents": cents})

    ds = T(sf_dir, "events", columns=["event_type", "value"]) \
        .map_batches(prep, batch_format="pyarrow", batch_size=65536)
    hist = partial_sum_count_arrow(ds, keys=["event_type", "cents"],
                                   sums={}, count_name="n")

    rows = []
    for etype, g in hist.groupby("event_type", sort=True):
        g = g.sort_values("cents")
        n = int(g["n"].sum())
        cum = g["n"].cumsum().to_numpy()
        cents = g["cents"].to_numpy()
        median_c = int(cents[np.searchsorted(cum * 2, n, side="left")])
        counts = g["n"].to_numpy()
        mode_c = int(cents[counts == counts.max()].min())
        rows.append((etype, median_c / 100.0, mode_c / 100.0, n))
    return pd.DataFrame(rows, columns=["event_type", "median_value",
                                       "mode_value", "n_events"])


Q_EVENTS_VALUE_MEDIAN_SQL = """
WITH h AS (SELECT event_type,
                  CAST(round(value * 100) AS BIGINT) AS cents,
                  count(*) AS n
           FROM events GROUP BY 1, 2),
cum AS (SELECT event_type, cents, n,
               sum(n) OVER (PARTITION BY event_type ORDER BY cents) AS cum_n,
               sum(n) OVER (PARTITION BY event_type) AS tot,
               max(n) OVER (PARTITION BY event_type) AS max_n
        FROM h)
SELECT event_type,
       min(CASE WHEN cum_n * 2 >= tot THEN cents END) / 100.0 AS median_value,
       min(CASE WHEN n = max_n THEN cents END) / 100.0 AS mode_value,
       CAST(min(tot) AS BIGINT) AS n_events
FROM cum GROUP BY event_type ORDER BY event_type
"""


def q_events_funnel(sf_dir: str) -> pd.DataFrame:
    """FUNNEL ANALYSIS (view → click → purchase, greedy ordering): how
    many users reach each step, where step k+1 must happen strictly
    AFTER the user's earliest completion of step k. Three vectorized
    passes — no per-user Python: t1 = min view-ts per user; t2 = min
    click-ts after t1; t3 = min purchase-ts after t2. Each pass is a
    filtered per-batch partial min + tiny combine keyed by user, with
    the previous step's (user → ts) map broadcast (bounded by the
    step's surviving-user count, which only shrinks down the funnel)."""
    import pyarrow as pa

    from kryptone_ray.pipelines.common import parquet_rows

    STEPS = ["view", "click", "purchase"]

    def build(step: str):
        def partial(t: pa.Table) -> pa.Table:
            import pyarrow.compute as pc

            f = t.filter(pc.equal(t["event_type"], step))
            g = pa.table({"user_id": f["user_id"],
                          "t": pc.cast(pc.cast(f["ts"], pa.timestamp("us")),
                                       pa.int64())}) \
                .group_by(["user_id"], use_threads=False) \
                .aggregate([("t", "min")])
            return g.rename_columns(["user_id", "t"])

        return T(sf_dir, "events",
                 columns=["user_id", "event_type", "ts"]) \
            .map_batches(partial, batch_format="pyarrow", batch_size=65536)

    # step 1: plain per-user min
    parts = build(STEPS[0]).to_pandas()
    cur = parts.groupby("user_id", sort=False)["t"].min()
    counts = [len(cur)]
    # steps 2..k: per-user min AFTER the previous step's timestamp.
    # The after-filter needs the previous map per batch — broadcast it
    # (funnel maps shrink monotonically; a 10^10-user funnel would
    # hash-join instead, the q_customer_order_stats shape, same gate
    # family as everything else here).
    import ray

    for step in STEPS[1:]:
        prev_ref = ray.put(cur.to_dict())

        def after_min(df: pd.DataFrame, _step=step) -> pd.DataFrame:
            pv = ray.get(prev_ref)
            sub = df[df["event_type"] == _step]
            t = sub["ts"].astype("datetime64[us]").astype("int64")
            prev_t = sub["user_id"].map(pv)
            ok = prev_t.notna() & (t > prev_t)
            g = pd.DataFrame({"user_id": sub["user_id"][ok],
                              "t": t[ok]}).groupby(
                "user_id", sort=False)["t"].min()
            return g.reset_index()

        parts = T(sf_dir, "events",
                  columns=["user_id", "event_type", "ts"]) \
            .map_batches(after_min, batch_format="pandas",
                         batch_size=65536).to_pandas()
        cur = parts.groupby("user_id", sort=False)["t"].min()
        counts.append(len(cur))

    return pd.DataFrame({"step": np.arange(1, len(STEPS) + 1,
                                           dtype="int64"),
                         "event_type": STEPS,
                         "n_users": np.array(counts, dtype="int64")})


Q_EVENTS_FUNNEL_SQL = """
WITH s1 AS (SELECT user_id, min(ts) AS t1 FROM events
            WHERE event_type = 'view' GROUP BY user_id),
s2 AS (SELECT e.user_id, min(e.ts) AS t2 FROM events e
       JOIN s1 ON e.user_id = s1.user_id
       WHERE e.event_type = 'click' AND e.ts > s1.t1 GROUP BY e.user_id),
s3 AS (SELECT e.user_id, min(e.ts) AS t3 FROM events e
       JOIN s2 ON e.user_id = s2.user_id
       WHERE e.event_type = 'purchase' AND e.ts > s2.t2 GROUP BY e.user_id)
SELECT * FROM (
  SELECT 1 AS step, 'view' AS event_type,
         (SELECT count(*) FROM s1) AS n_users
  UNION ALL SELECT 2, 'click', (SELECT count(*) FROM s2)
  UNION ALL SELECT 3, 'purchase', (SELECT count(*) FROM s3))
ORDER BY step
"""


def q_events_cohort_retention(sf_dir: str) -> pd.DataFrame:
    """COHORT RETENTION: users grouped by first-touch day (their
    cohort); for each (cohort_day, day_offset) the count of cohort
    users active that many days later. Built from two bounded
    aggregates — per-user first day (associative min) and distinct
    (user, day) activity pairs — joined per user; only day-bounded
    partials and pair-bounded distincts ever move."""
    import pyarrow as pa
    import pyarrow.compute as pc

    def pairs(t: pa.Table) -> pa.Table:
        day = pc.cast(pc.floor_temporal(t["ts"], unit="day"),
                      pa.timestamp("us"))
        g = pa.table({"user_id": t["user_id"], "day": day}) \
            .group_by(["user_id", "day"], use_threads=False) \
            .aggregate([("day", "count")])
        return pa.table({"user_id": g["user_id"], "day": g["day"]})

    from kryptone_ray.pipelines.common import parquet_rows

    def build():
        # built inside the caller's shuffle context: the strategy
        # binds at dataset creation (common.hash_shuffle docstring)
        return T(sf_dir, "events", columns=["user_id", "ts"]) \
            .map_batches(pairs, batch_format="pyarrow", batch_size=65536)

    n_rows = parquet_rows(sf_dir, "events")
    if n_rows < DISTRIBUTED_SESSIONS_MIN_ROWS:
        act = build().to_pandas().drop_duplicates(["user_id", "day"])
    else:
        from kryptone_ray.pipelines.common import (hash_shuffle,
                                                   join_partitions)

        with hash_shuffle():
            act = build().repartition(num_blocks=join_partitions(n_rows),
                                      keys=["user_id"]) \
                .map_batches(
                    lambda df: df.drop_duplicates(["user_id", "day"]),
                    batch_format="pandas", batch_size=None).to_pandas()
            act = act.drop_duplicates(["user_id", "day"])

    first = act.groupby("user_id", sort=False)["day"].min().rename("cohort")
    m = act.merge(first, left_on="user_id", right_index=True)
    off = ((m["day"] - m["cohort"]).dt.days).astype("int64")
    out = pd.DataFrame({"cohort_day": m["cohort"], "day_offset": off}) \
        .groupby(["cohort_day", "day_offset"], sort=True) \
        .size().rename("n_users").reset_index()
    out["n_users"] = out["n_users"].astype("int64")
    return out


Q_EVENTS_COHORT_SQL = """
WITH act AS (SELECT DISTINCT user_id, date_trunc('day', ts) AS day
             FROM events),
first AS (SELECT user_id, min(day) AS cohort FROM act GROUP BY user_id)
SELECT cohort AS cohort_day,
       CAST(date_diff('day', cohort, day) AS BIGINT) AS day_offset,
       count(*) AS n_users
FROM act JOIN first USING (user_id)
GROUP BY cohort_day, day_offset ORDER BY cohort_day, day_offset
"""


def q_events_time_weighted_avg(sf_dir: str) -> pd.DataFrame:
    """TIME-WEIGHTED AVERAGE value per user (step-function semantics —
    each value holds until the user's next event; the metric-system
    aggregate plain AVG gets wrong when samples are irregular). Exact:
    integer cents × µs-gap sums per user (per-user numerators bound by
    cents_max × observed span < 2^63), one float division at the end,
    rounded identically on both sides. Users with a single event have
    no span and are excluded. Per-user gaps need the user's events
    together and time-ordered: hash-partition by user above the
    sessions gate, one vectorized diff per block."""

    def twa(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(["user_id", "t", "event_id"],
                            kind="stable").reset_index(drop=True)
        u = df["user_id"].to_numpy()
        t = df["t"].to_numpy()
        c = df["cents"].to_numpy()
        same = np.r_[u[:-1] == u[1:], False]
        dt = np.where(same, np.r_[t[1:] - t[:-1], 0], 0)
        num = pd.Series(c * dt).groupby(u).sum()
        g = pd.DataFrame({"u": u, "t": t}).groupby("u")["t"]
        den = g.max() - g.min()
        keep = den > 0
        return pd.DataFrame({"user_id": num.index[keep].astype("int64"),
                             "num": num[keep].astype("int64"),
                             "den": den[keep].astype("int64")})

    def prep(t):
        import pyarrow as pa
        import pyarrow.compute as pc

        return pa.table({
            "user_id": t["user_id"], "event_id": t["event_id"],
            "t": pc.cast(pc.cast(t["ts"], pa.timestamp("us")), pa.int64()),
            "cents": pc.cast(pc.round(pc.multiply(t["value"], 100)),
                             pa.int64())})

    from kryptone_ray.pipelines.common import parquet_rows

    def build():
        return T(sf_dir, "events",
                 columns=["user_id", "event_id", "ts", "value"]) \
            .map_batches(prep, batch_format="pyarrow", batch_size=65536)

    n_rows = parquet_rows(sf_dir, "events")
    if n_rows < DISTRIBUTED_SESSIONS_MIN_ROWS:
        parts = twa(build().to_pandas())
    else:
        from kryptone_ray.pipelines.common import (hash_shuffle,
                                                   join_partitions)

        with hash_shuffle():
            parts = build().repartition(
                num_blocks=join_partitions(n_rows), keys=["user_id"]) \
                .map_batches(twa, batch_format="pandas",
                             batch_size=None).to_pandas()
    out = pd.DataFrame({
        "user_id": parts["user_id"],
        "twa_value": (parts["num"] / parts["den"] / 100.0).round(6)})
    return out.sort_values("user_id").reset_index(drop=True)


Q_EVENTS_TWA_SQL = """
WITH x AS (SELECT user_id, epoch_us(ts) AS t,
                  CAST(round(value * 100) AS BIGINT) AS c, event_id
           FROM events),
w AS (SELECT user_id, t, c,
             lead(t) OVER (PARTITION BY user_id
                           ORDER BY t, event_id) AS nt
      FROM x)
SELECT user_id,
       round(sum(c * (nt - t)) / (max(t) - min(t)) / 100.0, 6)
           AS twa_value
FROM w GROUP BY user_id HAVING max(t) > min(t)
ORDER BY user_id
"""


# gap shared by the pipeline default AND the SQL oracle (f-string
# interpolation below) so a non-default call can't diverge silently.
PATTERN_GAP_MINUTES = 5


def q_events_pattern_matches(
        sf_dir: str, gap_minutes: int = PATTERN_GAP_MINUTES) -> pd.DataFrame:
    """SEQUENCE-PATTERN MATCHING (MATCH_RECOGNIZE-lite): per user,
    count occurrences of the pattern "an ``error`` immediately followed
    by a ``purchase`` within ``gap_minutes``" in event order (ts, then
    event_id — the deterministic total order every window query here
    uses). One vectorized shift comparison per block — the user's
    events must be together and ordered, so the distributed shape is
    the sessionization hash-partition; only (user, ts, type) moves."""

    def matches(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(["user_id", "t", "event_id"],
                            kind="stable").reset_index(drop=True)
        u = df["user_id"].to_numpy()
        t = df["t"].to_numpy()
        et = df["event_type"].to_numpy()
        same = u[:-1] == u[1:]
        hit = same & (et[:-1] == "error") & (et[1:] == "purchase") & \
            (t[1:] - t[:-1] <= gap_minutes * 60_000_000)
        g = pd.Series(hit.astype("int64")).groupby(u[:-1]).sum()
        g = g[g > 0]
        return pd.DataFrame({"user_id": g.index.astype("int64"),
                             "n_matches": g.to_numpy()})

    def prep(t):
        import pyarrow as pa
        import pyarrow.compute as pc

        return pa.table({
            "user_id": t["user_id"], "event_id": t["event_id"],
            "event_type": t["event_type"],
            "t": pc.cast(pc.cast(t["ts"], pa.timestamp("us")), pa.int64())})

    from kryptone_ray.pipelines.common import parquet_rows

    def build():
        return T(sf_dir, "events",
                 columns=["user_id", "event_id", "event_type", "ts"]) \
            .map_batches(prep, batch_format="pyarrow", batch_size=65536)

    n_rows = parquet_rows(sf_dir, "events")
    if n_rows < DISTRIBUTED_SESSIONS_MIN_ROWS:
        out = matches(build().to_pandas())
    else:
        from kryptone_ray.pipelines.common import (hash_shuffle,
                                                   join_partitions)

        # each user's events land whole in one block, so the per-block
        # result is final — per-user output is table-sized: stream it
        with hash_shuffle():
            return build().repartition(
                num_blocks=join_partitions(n_rows), keys=["user_id"]) \
                .map_batches(matches, batch_format="pandas",
                             batch_size=None)
    return out.sort_values("user_id").reset_index(drop=True)


Q_EVENTS_PATTERN_SQL = f"""
WITH w AS (SELECT user_id,
                  event_type,
                  lead(event_type) OVER u AS next_type,
                  epoch_us(ts) AS t,
                  lead(epoch_us(ts)) OVER u AS next_t
           FROM events
           WINDOW u AS (PARTITION BY user_id ORDER BY ts, event_id))
SELECT user_id, count(*) AS n_matches
FROM w
WHERE event_type = 'error' AND next_type = 'purchase'
  AND next_t - t <= {PATTERN_GAP_MINUTES} * 60 * 1000000
GROUP BY user_id ORDER BY user_id
"""


def q_events_value_regression(sf_dir: str) -> pd.DataFrame:
    """LINEAR REGRESSION BY SUFFICIENT STATISTICS — the closed-form ML
    aggregate: fit value ≈ a·hour_of_day + b per event type from the
    five associative sums (n, Σx, Σy, Σxy, Σx²), which reduce per
    batch and combine in one tiny shuffle exactly like any other
    partial aggregate; no iteration, no driver data pass. All sums are
    exact integers (hours 0-23, cents), the slope/intercept are ONE
    float division each at the end — the SQL oracle builds the same
    integer sums and divides identically, so the match is bit-exact.
    Headroom: the per-row products fit int64 through the distributed
    sum (Σxy ≤ 23·32753·n ≈ 7.5e12 at n=1e7), but the closed-form
    terms n·Σxy and Σx·Σy reach ~7.5e19 at that same scale — past
    2^63 — so the final num/den arithmetic runs in arbitrary-precision
    Python ints (object dtype) on the tiny per-event-type frame,
    matching DuckDB's HUGEINT sums, before the one double division."""
    import pyarrow as pa
    import pyarrow.compute as pc

    from kryptone_ray.pipelines.common import partial_sum_count_arrow

    def prep(t: pa.Table) -> pa.Table:
        x = pc.cast(pc.hour(t["ts"]), pa.int64())
        y = pc.cast(pc.round(pc.multiply(t["value"], 100)), pa.int64())
        return pa.table({"event_type": t["event_type"], "x": x, "y": y,
                         "xy": pc.multiply(x, y), "xx": pc.multiply(x, x)})

    ds = T(sf_dir, "events", columns=["event_type", "ts", "value"]) \
        .map_batches(prep, batch_format="pyarrow", batch_size=65536)
    s = partial_sum_count_arrow(
        ds, keys=["event_type"],
        sums={"sx": "x", "sy": "y", "sxy": "xy", "sxx": "xx"},
        count_name="n")
    n = s["n"].astype("int64")
    # exact arbitrary-precision combine (n·Σxy etc. overflow int64 past
    # ~1e7 rows/type); DuckDB computes these in HUGEINT, we in Python int
    n_o = n.astype(object)
    sx = s["sx"].astype("int64").astype(object)
    sy = s["sy"].astype("int64").astype(object)
    sxy = s["sxy"].astype("int64").astype(object)
    sxx = s["sxx"].astype("int64").astype(object)
    num = n_o * sxy - sx * sy
    den = n_o * sxx - sx * sx
    # one double division, like the oracle's CAST(... AS DOUBLE): cast
    # the exact ints to double first (correctly-rounded, = HUGEINT cast)
    slope = num.astype("float64") / den.astype("float64")
    intercept = (sy.astype("float64") - slope * sx.astype("float64")) \
        / n_o.astype("float64")
    out = pd.DataFrame({"event_type": s["event_type"],
                        "slope_cents_per_hour": slope.round(6),
                        "intercept_cents": intercept.round(4),
                        "n": n})
    return out.sort_values("event_type").reset_index(drop=True)


Q_EVENTS_REGRESSION_SQL = """
WITH p AS (SELECT event_type, CAST(hour(ts) AS BIGINT) AS x,
                  CAST(round(value * 100) AS BIGINT) AS y
           FROM events),
s AS (SELECT event_type, count(*) AS n, sum(x) AS sx, sum(y) AS sy,
             sum(x * y) AS sxy, sum(x * x) AS sxx
      FROM p GROUP BY event_type)
SELECT event_type,
       round((n * sxy - sx * sy) / CAST(n * sxx - sx * sx AS DOUBLE), 6)
           AS slope_cents_per_hour,
       round((sy - ((n * sxy - sx * sy) / CAST(n * sxx - sx * sx AS DOUBLE))
              * sx) / CAST(n AS DOUBLE), 4) AS intercept_cents,
       n
FROM s ORDER BY event_type
"""


def q_events_windowed_dedup(sf_dir: str) -> pd.DataFrame:
    """WINDOWED DEDUP — keep the FIRST event per (user, tumbling hour):
    the streaming-ingest classic (at-least-once feeds dedup on a key ×
    window). First = min (ts, event_id), an associative argmin, so
    per-batch partials collapse to one row per (user, window) per batch
    and the combine is exact under any partitioning — no ordering
    barrier, no shuffle beyond the pair-bounded partials. Output: per
    window, rows kept vs rows seen (the dedup ratio a pipeline
    monitors)."""
    import pyarrow as pa
    import pyarrow.compute as pc

    def partial(t: pa.Table) -> pa.Table:
        # census only needs counts per (user, window): the kept row is
        # implied (min ts, then min event_id — matching the SQL
        # row_number ORDER BY ts, event_id) but never materialized.
        hour = pc.floor_temporal(pc.cast(t["ts"], pa.timestamp("us")),
                                 unit="hour")
        g = pa.table({"user_id": t["user_id"], "w": hour}) \
            .group_by(["user_id", "w"], use_threads=False) \
            .aggregate([("user_id", "count")])
        return g.rename_columns(["user_id", "w", "n"])

    def build():
        return T(sf_dir, "events", columns=["user_id", "ts"]) \
            .map_batches(partial, batch_format="pyarrow",
                         batch_size=65536)

    def window_census(df: pd.DataFrame) -> pd.DataFrame:
        # dedupe partials per (user, window), then collapse to the tiny
        # per-window census; exact under hash partitioning by user_id
        # because every (user, window) pair lives in one partition.
        per_key = df.groupby(["user_id", "w"], sort=False)["n"].sum() \
            .reset_index()
        return per_key.groupby("w", sort=False).agg(
            n_kept=("n", "size"), n_seen=("n", "sum")).reset_index()

    from kryptone_ray.pipelines.common import parquet_rows

    n_rows = parquet_rows(sf_dir, "events")
    if n_rows < DISTRIBUTED_SESSIONS_MIN_ROWS:
        parts = window_census(build().to_pandas())
    else:
        # distinct (user, window) pairs approach the row count when
        # users emit ~1 event per window, so the combine must not land
        # whole on the driver: hash-partition by user_id, census per
        # partition, then sum the O(#windows) per-partition censuses.
        from kryptone_ray.pipelines.common import (hash_shuffle,
                                                   join_partitions)

        with hash_shuffle():
            parts = build().repartition(
                num_blocks=join_partitions(n_rows), keys=["user_id"]) \
                .map_batches(window_census, batch_format="pandas",
                             batch_size=None).to_pandas()
    out = parts.groupby("w", sort=True).agg(
        n_kept=("n_kept", "sum"), n_seen=("n_seen", "sum")).reset_index()
    out = out.rename(columns={"w": "window_start"})
    out["n_kept"] = out["n_kept"].astype("int64")
    out["n_seen"] = out["n_seen"].astype("int64")
    return out


Q_EVENTS_WINDOWED_DEDUP_SQL = """
WITH r AS (SELECT user_id, date_trunc('hour', ts) AS w,
                  row_number() OVER (PARTITION BY user_id,
                                     date_trunc('hour', ts)
                                     ORDER BY ts, event_id) AS rn
           FROM events)
SELECT w AS window_start,
       count(*) FILTER (WHERE rn = 1) AS n_kept,
       count(*) AS n_seen
FROM r GROUP BY w ORDER BY w
"""
