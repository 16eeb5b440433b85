"""Relational query pipelines over the driver's TPC-H-ish tables.

These are the driver-harness operators of SURVEY.md §7 phase D: each maps
a reference *capability* (filters/predicates urls.py:157-246; grouped
aggregation seo.py:407-421; top-k; joins) onto the Ray Data primitive,
with an equivalent DuckDB oracle in ``oracle_sql()``.

Scale notes per query are in the docstrings; the common rules: prune at
the read, pre-aggregate before shuffles, broadcast small dimension
tables instead of shuffle-joining them.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from kryptone_ray.pipelines.common import (
    T, join_partitions, parquet_rows, partial_stats, partial_sum_count,
    small)

# fact tables below this row count combine their per-batch partials on
# the driver and merge against a driver-read dimension; above it the
# native hash-shuffle join runs. The join's fixed cost (one aggregator
# actor per partition + an all-to-all barrier) is ~2 s locally, which
# dominates at sf0.1 (600k lineitem rows) — same gate shape as
# textops.DISTRIBUTED_COMBINE_MIN_ROWS (tests force the distributed
# path by patching this to 0).
DISTRIBUTED_JOIN_MIN_ROWS = 2_000_000

# dimension sides below this row count broadcast as a driver-built
# dict/frozenset via ray.put (customer is 1.5M rows/SF in TPC-H — it
# GROWS with scale factor, so an unconditional broadcast becomes a
# multi-GB driver object at 100 TB); above it the query falls back to
# the native hash join it already uses fact×fact.
BROADCAST_MAX_ROWS = 5_000_000


def q1_pricing_summary(sf_dir: str) -> pd.DataFrame:
    """TPC-H Q1 shape: filtered scan → computed columns → grouped
    aggregate with per-batch partials (SURVEY §2.4 word-frequency /
    performance-counter analog)."""
    ds = T(sf_dir, "lineitem",
           columns=["l_returnflag", "l_linestatus", "l_quantity",
                    "l_extendedprice", "l_discount", "l_tax", "l_shipdate"])

    # Money columns carry exact 2-decimal values; all sums run in integer
    # "cents" space (int64) so pipeline and SQL oracle are bit-identical
    # regardless of summation order (float order differs between numpy
    # partials and DuckDB). int64 headroom: cents(≈1e7)×1e4 scale ×1e7
    # rows ≈ 1e18 < 2^63. Zero-copy Arrow batches + pyarrow.compute —
    # no per-batch pandas conversion on this pure-numeric path.
    def prep(t):
        import pyarrow as pa
        import pyarrow.compute as pc

        t = t.filter(pc.less_equal(
            t["l_shipdate"], pa.scalar(pd.Timestamp("1998-09-02"))))

        def e2(col):
            return pc.cast(pc.round(pc.multiply(t[col], 100)), pa.int64())

        cents, disc_bp, tax_bp = e2("l_extendedprice"), e2("l_discount"), \
            e2("l_tax")
        disc_e4 = pc.multiply(cents, pc.subtract(100, disc_bp))
        charge_e6 = pc.multiply(disc_e4, pc.add(100, tax_bp))
        qty = pc.cast(pc.round(t["l_quantity"]), pa.int64())
        return pa.table(
            [t["l_returnflag"], t["l_linestatus"], qty, cents, disc_e4,
             charge_e6],
            names=["l_returnflag", "l_linestatus", "qty", "cents",
                   "disc_e4", "charge_e6"])

    from kryptone_ray.pipelines.common import partial_sum_count_arrow

    ds = ds.map_batches(prep, batch_format="pyarrow", batch_size=65536)
    out = partial_sum_count_arrow(
        ds,
        keys=["l_returnflag", "l_linestatus"],
        sums={
            "sum_qty_i": "qty",
            "sum_cents": "cents",
            "sum_disc_e4": "disc_e4",
            "sum_charge_e6": "charge_e6",
        },
        count_name="count_order",
    )
    out["sum_qty"] = (out.pop("sum_qty_i")).astype("float64")
    out["sum_base_price"] = out.pop("sum_cents") / 100.0
    out["sum_disc_price"] = out.pop("sum_disc_e4") / 1e4
    out["sum_charge"] = out.pop("sum_charge_e6") / 1e6
    out["avg_qty"] = out["sum_qty"] / out["count_order"]
    out["avg_price"] = out["sum_base_price"] / out["count_order"]
    out = out[["l_returnflag", "l_linestatus", "sum_qty", "sum_base_price",
               "sum_disc_price", "sum_charge", "count_order", "avg_qty", "avg_price"]]
    return out.sort_values(["l_returnflag", "l_linestatus"]).reset_index(drop=True)


Q1_SQL = """
SELECT l_returnflag, l_linestatus,
       CAST(sum(CAST(round(l_quantity) AS BIGINT)) AS DOUBLE)          AS sum_qty,
       sum(CAST(round(l_extendedprice * 100) AS BIGINT)) / 100.0       AS sum_base_price,
       sum(CAST(round(l_extendedprice * 100) AS BIGINT)
           * (100 - CAST(round(l_discount * 100) AS BIGINT))) / 1e4       AS sum_disc_price,
       sum(CAST(round(l_extendedprice * 100) AS BIGINT)
           * (100 - CAST(round(l_discount * 100) AS BIGINT))
           * (100 + CAST(round(l_tax * 100) AS BIGINT))) / 1e6            AS sum_charge,
       count(*)                                                        AS count_order,
       sum(CAST(round(l_quantity) AS BIGINT)) / count(*)               AS avg_qty,
       (sum(CAST(round(l_extendedprice * 100) AS BIGINT)) / 100.0) / count(*) AS avg_price
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '1998-09-02'
GROUP BY l_returnflag, l_linestatus
ORDER BY l_returnflag, l_linestatus
"""


def q_filter_project(sf_dir: str):
    """Vectorized filter + projection — the URL-predicate analog
    (urls.py:157-246 as batch masks). Streams; no shuffle."""
    ds = T(sf_dir, "lineitem",
           columns=["l_orderkey", "l_linenumber", "l_quantity",
                    "l_extendedprice", "l_discount"])

    def f(t):
        import pyarrow as pa
        import pyarrow.compute as pc

        t = t.filter(pc.greater(t["l_quantity"], 45.0))

        def e2(col):
            return pc.cast(pc.round(pc.multiply(t[col], 100)), pa.int64())

        rev_e4 = pc.multiply(e2("l_extendedprice"),
                             pc.subtract(100, e2("l_discount")))
        revenue = pc.divide(pc.cast(rev_e4, pa.float64()), 1e4)  # exact 4-decimal
        return pa.table(
            [t["l_orderkey"], t["l_linenumber"], t["l_quantity"], revenue],
            names=["l_orderkey", "l_linenumber", "l_quantity", "revenue"])

    return ds.map_batches(f, batch_format="pyarrow", batch_size=65536)


Q_FILTER_PROJECT_SQL = """
SELECT l_orderkey, l_linenumber, l_quantity,
       CAST(round(l_extendedprice * 100) AS BIGINT)
       * (100 - CAST(round(l_discount * 100) AS BIGINT)) / 1e4 AS revenue
FROM lineitem WHERE l_quantity > 45
"""


def q_topk_orders(sf_dir: str) -> pd.DataFrame:
    """Global top-k = sort desc + limit (seo.py:407-421 top-10 analog).
    Ray sorts distributed; the limit prunes early."""
    ds = T(sf_dir, "orders", columns=["o_orderkey", "o_totalprice", "o_orderdate"])
    # Two-key sort matches the oracle's deterministic tie-break
    # (o_totalprice DESC, o_orderkey ASC) — equal prices at the limit
    # boundary would otherwise make the returned set data-dependent.
    top = ds.sort(["o_totalprice", "o_orderkey"],
                  descending=[True, False]).limit(10).to_pandas()
    return top


Q_TOPK_SQL = """
SELECT o_orderkey, o_totalprice, o_orderdate
FROM orders ORDER BY o_totalprice DESC, o_orderkey LIMIT 10
"""


def q_distinct_segments(sf_dir: str) -> pd.DataFrame:
    """Exact distinct — the seen-set/dedupe analog (base.py:728-730)."""
    vals = T(sf_dir, "customer", columns=["c_mktsegment"]).unique("c_mktsegment")
    return pd.DataFrame({"c_mktsegment": sorted(vals)})


Q_DISTINCT_SQL = "SELECT DISTINCT c_mktsegment FROM customer ORDER BY c_mktsegment"


def q_count_by_priority(sf_dir: str) -> pd.DataFrame:
    from kryptone_ray.pipelines.common import partial_sum_count_arrow

    ds = T(sf_dir, "orders", columns=["o_orderpriority", "o_totalprice"])

    def cents(t):
        import pyarrow as pa
        import pyarrow.compute as pc

        c = pc.cast(pc.round(pc.multiply(t["o_totalprice"], 100)), pa.int64())
        return pa.table([t["o_orderpriority"], c],
                        names=["o_orderpriority", "cents"])

    out = partial_sum_count_arrow(
        ds.map_batches(cents, batch_format="pyarrow", batch_size=65536),
        keys=["o_orderpriority"],
        sums={"cents": "cents"},
        count_name="n_orders",
    )
    out["total_price"] = out.pop("cents") / 100.0
    out = out[["o_orderpriority", "total_price", "n_orders"]]
    return out.sort_values("o_orderpriority").reset_index(drop=True)


Q_COUNT_PRIORITY_SQL = """
SELECT o_orderpriority,
       sum(CAST(round(o_totalprice * 100) AS BIGINT)) / 100.0 AS total_price,
       count(*) AS n_orders
FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority
"""


def q_customer_order_stats(sf_dir: str):
    """Aggregate the big side (orders) first with per-batch partials,
    then attach the customer dimension. Customer GROWS with scale
    factor (1.5M rows/SF), so the attach is bounded: below
    ``BROADCAST_MAX_ROWS`` a driver-side merge (broadcast-small-side
    pattern, SURVEY §2.6 — no shuffle); above it the orders partials
    stay a Dataset and meet customer in the native hash-shuffle join,
    combined per block (the join co-partitions by custkey)."""
    ds = T(sf_dir, "orders", columns=["o_custkey", "o_totalprice"])

    def cents(t):
        import pyarrow as pa
        import pyarrow.compute as pc

        c = pc.cast(pc.round(pc.multiply(t["o_totalprice"], 100)), pa.int64())
        return pa.table([t["o_custkey"], c], names=["o_custkey", "cents"])

    ds = ds.map_batches(cents, batch_format="pyarrow", batch_size=65536)

    if parquet_rows(sf_dir, "customer") <= BROADCAST_MAX_ROWS:
        from kryptone_ray.pipelines.common import partial_sum_count_arrow

        agg = partial_sum_count_arrow(ds, keys=["o_custkey"],
                                      sums={"cents": "cents"},
                                      count_name="n_orders")
        agg["total_spent"] = agg.pop("cents") / 100.0
        cust = small(sf_dir, "customer",
                     columns=["c_custkey", "c_name", "c_mktsegment"])
        out = cust.merge(agg, left_on="c_custkey", right_on="o_custkey",
                         how="inner")
        out = out[["c_custkey", "c_name", "c_mktsegment", "n_orders",
                   "total_spent"]]
        return out.sort_values("c_custkey").reset_index(drop=True)

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby("o_custkey", sort=False)["cents"].agg(["sum", "size"])
        g.columns = ["cents", "n_orders"]
        return g.reset_index()

    parts = ds.map_batches(partial, batch_format="pandas", batch_size=65536)
    cust_ds = T(sf_dir, "customer",
                columns=["c_custkey", "c_name", "c_mktsegment"])
    npart = join_partitions(parquet_rows(sf_dir, "orders"))
    joined = parts.join(cust_ds, "inner", num_partitions=npart,
                        on=("o_custkey",), right_on=("c_custkey",))

    def combine(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby("o_custkey", sort=False, as_index=False).agg(
            cents=("cents", "sum"), n_orders=("n_orders", "sum"),
            c_name=("c_name", "first"), c_mktsegment=("c_mktsegment", "first"))
        return pd.DataFrame(
            {"c_custkey": g["o_custkey"], "c_name": g["c_name"],
             "c_mktsegment": g["c_mktsegment"],
             "n_orders": g["n_orders"].astype("int64"),
             "total_spent": g["cents"] / 100.0}
        )

    return joined.map_batches(combine, batch_format="pandas",
                              batch_size=None)


Q_CUST_ORDERS_SQL = """
SELECT c_custkey, c_name, c_mktsegment, count(*) AS n_orders,
       sum(CAST(round(o_totalprice * 100) AS BIGINT)) / 100.0 AS total_spent
FROM customer JOIN orders ON o_custkey = c_custkey
GROUP BY c_custkey, c_name, c_mktsegment
ORDER BY c_custkey
"""


def q3_shipping_priority(sf_dir: str) -> pd.DataFrame:
    """TPC-H Q3 shape, fully distributed: only the true dimension filter
    (customer segment → key set) is broadcast via ``ray.put``; the orders
    FACT table streams through a Dataset filter (never materialized on
    the driver), lineitem revenue is partial-aggregated per batch then
    combined by a distributed ``groupby().sum()``, the two fact-sized
    sides meet in Ray's native hash-shuffle join, and the top-10 is a
    distributed two-key sort + limit."""
    import ray

    cutoff = pd.Timestamp("1998-03-15")

    # BOUNDED broadcast: customer grows with scale factor (1.5M
    # rows/SF), so above BROADCAST_MAX_ROWS the segment-filtered key
    # set goes through the native hash join instead of a driver-built
    # frozenset.
    if parquet_rows(sf_dir, "customer") <= BROADCAST_MAX_ROWS:
        cust = small(sf_dir, "customer", columns=["c_custkey", "c_mktsegment"])
        keys_ref = ray.put(frozenset(
            cust.loc[cust["c_mktsegment"] == "BUILDING", "c_custkey"]))

        def sel_orders(df: pd.DataFrame) -> pd.DataFrame:
            keys = ray.get(keys_ref)
            df = df[(df["o_orderdate"] < cutoff) & df["o_custkey"].isin(keys)]
            return df[["o_orderkey", "o_orderdate"]]

        orders_ds = T(sf_dir, "orders",
                      columns=["o_orderkey", "o_custkey", "o_orderdate"]) \
            .map_batches(sel_orders, batch_format="pandas", batch_size=65536)
    else:
        def sel_building(df: pd.DataFrame) -> pd.DataFrame:
            return df.loc[df["c_mktsegment"] == "BUILDING", ["c_custkey"]]

        cust_ds = T(sf_dir, "customer",
                    columns=["c_custkey", "c_mktsegment"]) \
            .map_batches(sel_building, batch_format="pandas",
                         batch_size=65536)

        def date_filter(df: pd.DataFrame) -> pd.DataFrame:
            return df[df["o_orderdate"] < cutoff]

        orders_f = T(sf_dir, "orders",
                     columns=["o_orderkey", "o_custkey", "o_orderdate"]) \
            .map_batches(date_filter, batch_format="pandas",
                         batch_size=65536)
        orders_ds = orders_f.join(
            cust_ds, "inner",
            num_partitions=join_partitions(parquet_rows(sf_dir, "orders")),
            on=("o_custkey",), right_on=("c_custkey",)) \
            .map_batches(lambda df: df[["o_orderkey", "o_orderdate"]],
                         batch_format="pandas", batch_size=65536)

    def line_rev(df: pd.DataFrame) -> pd.DataFrame:
        df = df[df["l_shipdate"] > cutoff]
        cents = (df["l_extendedprice"] * 100).round().astype("int64")
        disc_bp = (df["l_discount"] * 100).round().astype("int64")
        part = pd.DataFrame(
            {"l_orderkey": df["l_orderkey"], "rev_e4": cents * (100 - disc_bp)}
        )
        # per-batch combiner before the groupby shuffle
        return part.groupby("l_orderkey", sort=False, as_index=False)["rev_e4"].sum()

    line_ds = T(sf_dir, "lineitem",
                columns=["l_orderkey", "l_extendedprice", "l_discount", "l_shipdate"]) \
        .map_batches(line_rev, batch_format="pandas", batch_size=65536)

    # small-input gate: both sides are already filtered + per-batch
    # combined, so below the gate the partials merge on the driver
    # (bounded by matching orders, never lineitem) instead of paying
    # the hash join's fixed cost.
    if parquet_rows(sf_dir, "lineitem") < DISTRIBUTED_JOIN_MIN_ROWS:
        lp = line_ds.to_pandas()
        lp = lp.groupby("l_orderkey", sort=False, as_index=False)["rev_e4"].sum()
        od = orders_ds.to_pandas()
        m = lp.merge(od, left_on="l_orderkey", right_on="o_orderkey",
                     how="inner")
        top = m.sort_values(["rev_e4", "l_orderkey"],
                            ascending=[False, True]).head(10)
        top = top.reset_index(drop=True)
        top["revenue"] = top.pop("rev_e4") / 1e4
        return top[["l_orderkey", "revenue", "o_orderdate"]]

    # The hash join partitions BOTH sides by orderkey, so every partial
    # row of a key lands in one output block — the global combine is a
    # per-block pandas groupby (batch_size=None = whole block), never a
    # separate all-to-all aggregate. (Ray's groupby().sum() runs a
    # per-row Python aggregate — ~10^3 rows/s — so the combine rides the
    # join's partitioning instead.)
    npart = join_partitions(parquet_rows(sf_dir, "lineitem"))
    joined = line_ds.join(orders_ds, "inner", num_partitions=npart,
                          on=("l_orderkey",), right_on=("o_orderkey",))

    def combine(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby("l_orderkey", sort=False, as_index=False).agg(
            rev_e4=("rev_e4", "sum"), o_orderdate=("o_orderdate", "first"))
        return g

    agg = joined.map_batches(combine, batch_format="pandas", batch_size=None)
    top = agg.sort(["rev_e4", "l_orderkey"],
                   descending=[True, False]).limit(10).to_pandas()
    top["revenue"] = top.pop("rev_e4") / 1e4
    return top[["l_orderkey", "revenue", "o_orderdate"]].reset_index(drop=True)


# exact integer-cents revenue for Q3 (see q1 note)
Q3_SQL = """
SELECT l_orderkey,
       sum(CAST(round(l_extendedprice * 100) AS BIGINT)
           * (100 - CAST(round(l_discount * 100) AS BIGINT))) / 1e4 AS revenue,
       o_orderdate
FROM customer
JOIN orders ON c_custkey = o_custkey
JOIN lineitem ON l_orderkey = o_orderkey
WHERE c_mktsegment = 'BUILDING'
  AND o_orderdate < TIMESTAMP '1998-03-15'
  AND l_shipdate > TIMESTAMP '1998-03-15'
GROUP BY l_orderkey, o_orderdate
ORDER BY revenue DESC, l_orderkey LIMIT 10
"""


def q5_nation_volume(sf_dir: str) -> pd.DataFrame:
    """TPC-H Q5 shape, fully distributed: only the TRUE dimensions
    (nation/region/customer/supplier → tiny key→nation dicts) are
    broadcast via ``ray.put``. The orders FACT table streams through a
    map stage that resolves the customer nation per order; lineitem
    resolves the supplier nation and pre-aggregates revenue by
    (orderkey, supplier-nation) per batch; the two fact-sized sides meet
    in Ray's native hash-shuffle join, the same-nation predicate is
    applied post-join as a vectorized filter, and only 25 (nation)
    partial rows per batch reach the final combine."""
    import ray

    nation = small(sf_dir, "nation", columns=["n_nationkey", "n_name", "n_regionkey"])
    region = small(sf_dir, "region", columns=["r_regionkey", "r_name"])
    nkeys = nation.merge(region, left_on="n_regionkey", right_on="r_regionkey")
    nation_ref = ray.put(dict(zip(nkeys["n_nationkey"], nkeys["n_name"])))

    # BOUNDED broadcast: customer/supplier grow with scale factor
    # (1.5M / 0.1M rows/SF), so above BROADCAST_MAX_ROWS their key→
    # nation maps go through native hash joins instead of driver-built
    # dicts. nation/region are FIXED size (25/5 rows) and always
    # broadcast.
    broadcast_dims = (parquet_rows(sf_dir, "customer")
                      <= BROADCAST_MAX_ROWS)

    if broadcast_dims:
        # key→nation broadcast as dense numpy LOOKUP ARRAYS (keys are
        # 0..N-1), read by position inside zero-copy Arrow batches —
        # no per-batch pandas conversion and no Python dict lookups on
        # the two hottest stages (round-4 Arrow-native partials)
        cust = small(sf_dir, "customer", columns=["c_custkey", "c_nationkey"])
        supp = small(sf_dir, "supplier", columns=["s_suppkey", "s_nationkey"])
        import numpy as _np

        cn_arr = _np.zeros(int(cust["c_custkey"].max()) + 1, dtype=_np.int64)
        cn_arr[cust["c_custkey"].to_numpy()] = cust["c_nationkey"].to_numpy()
        sn_arr = _np.zeros(int(supp["s_suppkey"].max()) + 1, dtype=_np.int64)
        sn_arr[supp["s_suppkey"].to_numpy()] = supp["s_nationkey"].to_numpy()
        maps_ref = ray.put((cn_arr, sn_arr))

        def order_nation(t):
            import pyarrow as pa

            cn, _ = ray.get(maps_ref)
            ck = t["o_custkey"].to_numpy(zero_copy_only=False)
            return pa.table({"o_orderkey": t["o_orderkey"],
                             "c_nation": pa.array(cn[ck], pa.int64())})

        orders_ds = T(sf_dir, "orders", columns=["o_orderkey", "o_custkey"]) \
            .map_batches(order_nation, batch_format="pyarrow",
                         batch_size=65536)

        def line_rev(t):
            import pyarrow as pa
            import pyarrow.compute as pc

            _, sn = ray.get(maps_ref)
            cents = pc.cast(pc.round(pc.multiply(t["l_extendedprice"], 100)),
                            pa.int64())
            disc = pc.cast(pc.round(pc.multiply(t["l_discount"], 100)),
                           pa.int64())
            rev = pc.multiply(cents, pc.subtract(pa.scalar(100, pa.int64()),
                                                 disc))
            sk = t["l_suppkey"].to_numpy(zero_copy_only=False)
            tbl = pa.table({"l_orderkey": t["l_orderkey"],
                            "s_nation": pa.array(sn[sk], pa.int64()),
                            "rev_e4": rev})
            g = tbl.group_by(["l_orderkey", "s_nation"],
                             use_threads=False).aggregate([("rev_e4", "sum")])
            return pa.table({"l_orderkey": g["l_orderkey"],
                             "s_nation": g["s_nation"],
                             "rev_e4": g["rev_e4_sum"]})

        line_ds = T(sf_dir, "lineitem",
                    columns=["l_orderkey", "l_suppkey", "l_extendedprice", "l_discount"]) \
            .map_batches(line_rev, batch_format="pyarrow", batch_size=65536)
    else:
        cust_ds = T(sf_dir, "customer", columns=["c_custkey", "c_nationkey"])
        orders_ds = T(sf_dir, "orders", columns=["o_orderkey", "o_custkey"]) \
            .join(cust_ds, "inner",
                  num_partitions=join_partitions(parquet_rows(sf_dir, "orders")),
                  on=("o_custkey",), right_on=("c_custkey",)) \
            .map_batches(
                lambda df: pd.DataFrame(
                    {"o_orderkey": df["o_orderkey"],
                     "c_nation": df["c_nationkey"].astype("int64")}),
                batch_format="pandas", batch_size=65536)

        def line_cents(df: pd.DataFrame) -> pd.DataFrame:
            cents = (df["l_extendedprice"] * 100).round().astype("int64")
            disc_bp = (df["l_discount"] * 100).round().astype("int64")
            return pd.DataFrame(
                {"l_orderkey": df["l_orderkey"],
                 "l_suppkey": df["l_suppkey"],
                 "rev_e4": cents * (100 - disc_bp)}
            )

        supp_ds = T(sf_dir, "supplier", columns=["s_suppkey", "s_nationkey"])
        nline = parquet_rows(sf_dir, "lineitem")
        line_ds = T(sf_dir, "lineitem",
                    columns=["l_orderkey", "l_suppkey", "l_extendedprice",
                             "l_discount"]) \
            .map_batches(line_cents, batch_format="pandas", batch_size=65536) \
            .join(supp_ds, "inner", num_partitions=join_partitions(nline),
                  on=("l_suppkey",), right_on=("s_suppkey",)) \
            .map_batches(
                lambda df: pd.DataFrame(
                    {"l_orderkey": df["l_orderkey"],
                     "s_nation": df["s_nationkey"].astype("int64"),
                     "rev_e4": df["rev_e4"]})
                .groupby(["l_orderkey", "s_nation"], sort=False,
                         as_index=False)["rev_e4"].sum(),
                batch_format="pandas", batch_size=65536)

    nn = dict(zip(nkeys["n_nationkey"], nkeys["n_name"]))

    # small-input gate: the per-batch combined lineitem partials and
    # the skinny (orderkey, nation) orders projection merge on the
    # driver below the gate — integer-cents sums are order-independent,
    # so the result is bit-identical to the distributed combine.
    if parquet_rows(sf_dir, "lineitem") < DISTRIBUTED_JOIN_MIN_ROWS:
        lp = line_ds.to_pandas()
        od = orders_ds.to_pandas()
        m = lp.merge(od, left_on="l_orderkey", right_on="o_orderkey",
                     how="inner")
        sub = m[(m["c_nation"] == m["s_nation"]) & m["c_nation"].isin(nn)]
        agg = sub.groupby("c_nation", sort=False)["rev_e4"].sum()
        out = pd.DataFrame({"n_name": agg.index.map(nn),
                            "revenue": agg.to_numpy() / 1e4})
        return out.sort_values(["revenue", "n_name"],
                               ascending=[False, True]).reset_index(drop=True)

    npart = join_partitions(parquet_rows(sf_dir, "lineitem"))
    joined = line_ds.join(orders_ds, "inner", num_partitions=npart,
                          on=("l_orderkey",), right_on=("o_orderkey",))

    def same_nation(df: pd.DataFrame) -> pd.DataFrame:
        nn = ray.get(nation_ref)
        sub = df[(df["c_nation"] == df["s_nation"]) & df["c_nation"].isin(nn.keys())]
        out = pd.DataFrame({"n_name": sub["c_nation"].map(nn),
                            "rev_e4": sub["rev_e4"]})
        return out.groupby("n_name", sort=False, as_index=False)["rev_e4"].sum()

    ds = joined.map_batches(same_nation, batch_format="pandas", batch_size=65536)
    out = partial_sum_count(ds, keys=["n_name"], sums={"rev_e4": "rev_e4"})
    out["revenue"] = out.pop("rev_e4") / 1e4
    return out.sort_values(["revenue", "n_name"], ascending=[False, True]).reset_index(drop=True)


Q5_SQL = """
SELECT n_name,
       sum(CAST(round(l_extendedprice * 100) AS BIGINT)
           * (100 - CAST(round(l_discount * 100) AS BIGINT))) / 1e4 AS revenue
FROM lineitem
JOIN orders   ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN supplier ON l_suppkey = s_suppkey
JOIN nation   ON c_nationkey = n_nationkey
JOIN region   ON n_regionkey = r_regionkey
WHERE s_nationkey = c_nationkey
GROUP BY n_name
ORDER BY revenue DESC, n_name
"""


def q_bucketed_join(sf_dir: str):
    """Hash-partitioned join with BOTH sides large: lineitem is
    pre-aggregated per batch (combiner); below the gate the partials
    (one row per orderkey per batch — bounded by |orders| × n_batches,
    never |lineitem|) combine on the driver and merge against a
    driver-read orders projection; above it orders STREAMS as a Dataset
    and the two sides meet in Ray's native hash-shuffle join, each of
    ``num_partitions`` join partitions seeing only its hash range of
    either side. Produces order line counts per order with totals."""

    def line_partial(t):
        # zero-copy Arrow partial (round-4): pyarrow's C++ group_by over
        # the raw batch — no pandas conversion on the fact table
        import pyarrow as pa

        g = t.group_by(["l_orderkey"], use_threads=False).aggregate(
            [("l_quantity", "sum"), ("l_quantity", "count")])
        return pa.table({"l_orderkey": g["l_orderkey"],
                         "sum_qty": g["l_quantity_sum"],
                         "n_lines": g["l_quantity_count"]})

    line = T(sf_dir, "lineitem", columns=["l_orderkey", "l_quantity"]) \
        .map_batches(line_partial, batch_format="pyarrow", batch_size=65536)

    if parquet_rows(sf_dir, "lineitem") < DISTRIBUTED_JOIN_MIN_ROWS:
        parts = line.to_pandas()
        g = parts.groupby("l_orderkey", sort=False, as_index=False).sum()
        odf = small(sf_dir, "orders", columns=["o_orderkey", "o_totalprice"])
        out = g.merge(odf, left_on="l_orderkey", right_on="o_orderkey",
                      how="inner")
        return pd.DataFrame(
            {"o_orderkey": out["o_orderkey"],
             "n_lines": out["n_lines"].astype("int64"),
             "sum_qty": out["sum_qty"],
             "o_totalprice": out["o_totalprice"]}
        )

    orders_ds = T(sf_dir, "orders", columns=["o_orderkey", "o_totalprice"])
    npart = join_partitions(parquet_rows(sf_dir, "lineitem"))
    joined = line.join(orders_ds, "inner", num_partitions=npart,
                       on=("l_orderkey",), right_on=("o_orderkey",))

    # Combine partials per joined block: the hash join co-partitions by
    # orderkey, so a per-block pandas groupby (batch_size=None = whole
    # block) IS the global combine — see q3 note on why this beats Ray's
    # row-wise groupby().sum() aggregate.
    def finish(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby("l_orderkey", sort=False, as_index=False).agg(
            sum_qty=("sum_qty", "sum"), n_lines=("n_lines", "sum"),
            o_totalprice=("o_totalprice", "first"))
        return pd.DataFrame(
            {"o_orderkey": g["l_orderkey"],
             "n_lines": g["n_lines"].astype("int64"),
             "sum_qty": g["sum_qty"],
             "o_totalprice": g["o_totalprice"]}
        )

    return joined.map_batches(finish, batch_format="pandas", batch_size=None)


Q_BUCKETED_JOIN_SQL = """
SELECT o_orderkey, count(*) AS n_lines, sum(l_quantity) AS sum_qty,
       o_totalprice
FROM lineitem JOIN orders ON l_orderkey = o_orderkey
GROUP BY o_orderkey, o_totalprice
"""


def q_part_type_stats(sf_dir: str) -> pd.DataFrame:
    """String-predicate filter + grouped stats (test_url/test_path regex
    analog, urls.py:410-453)."""
    ds = T(sf_dir, "part", columns=["p_type", "p_retailprice", "p_size"])

    def f(df: pd.DataFrame) -> pd.DataFrame:
        df = df[df["p_type"].str.match("^(ECONOMY|PROMO)")]
        return pd.DataFrame(
            {
                "p_type": df["p_type"],
                "cents": (df["p_retailprice"] * 100).round().astype("int64"),
                "p_size": df["p_size"].astype("int64"),
            }
        )

    ds = ds.map_batches(f, batch_format="pandas")
    out = partial_sum_count(
        ds, keys=["p_type"], sums={"cents": "cents", "total_size": "p_size"},
        count_name="n_parts",
    )
    out["total_price"] = out.pop("cents") / 100.0
    out = out[["p_type", "total_price", "total_size", "n_parts"]]
    return out.sort_values("p_type").reset_index(drop=True)


Q_PART_TYPE_SQL = """
SELECT p_type, sum(CAST(round(p_retailprice * 100) AS BIGINT)) / 100.0 AS total_price,
       CAST(sum(p_size) AS BIGINT) AS total_size, count(*) AS n_parts
FROM part WHERE regexp_matches(p_type, '^(ECONOMY|PROMO)')
GROUP BY p_type ORDER BY p_type
"""


def q_orders_monthly(sf_dir: str) -> pd.DataFrame:
    """Calendar-window aggregate (date_functions.py analog over data):
    order count + exact-cents revenue per month."""
    from kryptone_ray.pipelines.common import partial_sum_count_arrow

    ds = T(sf_dir, "orders", columns=["o_orderdate", "o_totalprice"])

    def f(t):
        import pyarrow as pa
        import pyarrow.compute as pc

        month = pc.floor_temporal(t["o_orderdate"], unit="month")
        c = pc.cast(pc.round(pc.multiply(t["o_totalprice"], 100)), pa.int64())
        return pa.table([month, c], names=["month", "cents"])

    out = partial_sum_count_arrow(
        ds.map_batches(f, batch_format="pyarrow", batch_size=65536),
        keys=["month"], sums={"cents": "cents"}, count_name="n_orders",
    )
    out["total_price"] = out.pop("cents") / 100.0
    out = out[["month", "total_price", "n_orders"]]
    return out.sort_values("month").reset_index(drop=True)


Q_ORDERS_MONTHLY_SQL = """
SELECT date_trunc('month', o_orderdate) AS month,
       sum(CAST(round(o_totalprice * 100) AS BIGINT)) / 100.0 AS total_price,
       count(*) AS n_orders
FROM orders GROUP BY 1 ORDER BY 1
"""


def q_customer_balance_stats(sf_dir: str) -> pd.DataFrame:
    """Min/Max/avg aggregates per segment (exact: 2-decimal balances in
    cents space; avg = single division)."""
    ds = T(sf_dir, "customer", columns=["c_mktsegment", "c_acctbal"])

    def f(t):
        import pyarrow as pa
        import pyarrow.compute as pc

        c = pc.cast(pc.round(pc.multiply(t["c_acctbal"], 100)), pa.int64())
        return pa.table([t["c_mktsegment"], c],
                        names=["c_mktsegment", "cents"])

    stats = partial_stats(
        ds.map_batches(f, batch_format="pyarrow", batch_size=65536),
        keys=["c_mktsegment"], col="cents", count_name="n",
    )
    out = pd.DataFrame(
        {
            "c_mktsegment": stats["c_mktsegment"],
            "min_bal": stats["min_v"] / 100.0,
            "max_bal": stats["max_v"] / 100.0,
            "avg_bal": (stats["sum_v"] / 100.0) / stats["n"],
            "n": stats["n"],
        }
    )
    return out.sort_values("c_mktsegment").reset_index(drop=True)


Q_CUSTOMER_BALANCE_SQL = """
SELECT c_mktsegment,
       min(CAST(round(c_acctbal * 100) AS BIGINT)) / 100.0 AS min_bal,
       max(CAST(round(c_acctbal * 100) AS BIGINT)) / 100.0 AS max_bal,
       (sum(CAST(round(c_acctbal * 100) AS BIGINT)) / 100.0) / count(*) AS avg_bal,
       count(*) AS n
FROM customer GROUP BY c_mktsegment ORDER BY c_mktsegment
"""


# per-query knobs shared by the pipeline default AND its SQL oracle
# (interpolated into the f-string oracles below, the ZORDER_SHARD_BITS
# pattern) so calling with a non-default value can't silently diverge.
TOP_ORDERS_K = 3
NATION_RICH_MIN_ACCTBAL = 9000.0
BRAND_BASKET_K = 20
DENSE_RANK_K = 3


def q_top_orders_per_customer(sf_dir: str,
                              k: int = TOP_ORDERS_K) -> pd.DataFrame:
    """WINDOW RANK / top-k PER GROUP (``row_number() OVER (PARTITION BY
    ... ORDER BY ...)`` shape — the reference's per-domain "best pages"
    ranking, seo.py audit ordering analog): the k highest-value orders
    of every customer with their rank.

    Scale shape: top-k per key is a semilattice — per-batch PARTIAL
    top-k inside ``map_batches`` first (each batch emits at most
    k rows per key it saw), so the shuffle moves O(k × keys), never the
    fact table. Below the gate the partials merge on the driver; above
    it they hash-repartition by key and each block finishes its keys
    independently (``batch_size=None`` = one complete hash partition,
    see join_partitions invariant). Ordering ties broken by o_orderkey
    asc — prices compare in exact integer cents on both sides."""
    n_orders = parquet_rows(sf_dir, "orders")

    def partial_topk(df: pd.DataFrame) -> pd.DataFrame:
        out = pd.DataFrame(
            {"o_custkey": df["o_custkey"], "o_orderkey": df["o_orderkey"],
             "cents": (df["o_totalprice"] * 100).round().astype("int64")})
        out = out.sort_values(["o_custkey", "cents", "o_orderkey"],
                              ascending=[True, False, True], kind="stable")
        return out.groupby("o_custkey", sort=False).head(k)

    def final_topk(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(["o_custkey", "cents", "o_orderkey"],
                            ascending=[True, False, True], kind="stable")
        df = df.groupby("o_custkey", sort=False).head(k).copy()
        df["rnk"] = df.groupby("o_custkey", sort=False).cumcount() + 1
        return df

    def build_parts():
        # the shuffle strategy is captured at dataset CREATION, so the
        # read is (re)built inside whichever context the branch needs
        return T(sf_dir, "orders",
                 columns=["o_custkey", "o_orderkey", "o_totalprice"]) \
            .map_batches(partial_topk, batch_format="pandas",
                         batch_size=65536)

    def finish(df: pd.DataFrame) -> pd.DataFrame:
        df = df.copy()
        df["o_totalprice"] = df.pop("cents") / 100.0
        df["rnk"] = df["rnk"].astype("int64")
        return df[["o_custkey", "rnk", "o_orderkey", "o_totalprice"]]

    if n_orders < DISTRIBUTED_JOIN_MIN_ROWS:
        out = finish(final_topk(build_parts().to_pandas()))
        return out.sort_values(["o_custkey", "rnk"]).reset_index(drop=True)
    from kryptone_ray.pipelines.common import hash_shuffle

    # k×customers output is table-sized — stream it above the gate
    with hash_shuffle():
        # partials are k×keys-sized; repartition them, not orders
        return build_parts().repartition(
            num_blocks=join_partitions(n_orders, rows_per_partition=500_000),
            keys=["o_custkey"]) \
            .map_batches(lambda df: finish(final_topk(df)),
                         batch_format="pandas", batch_size=None)


Q_TOP_ORDERS_PER_CUSTOMER_SQL = f"""
SELECT o_custkey, rn AS rnk, o_orderkey,
       CAST(round(o_totalprice * 100) AS BIGINT) / 100.0 AS o_totalprice
FROM (
  SELECT o_custkey, o_orderkey, o_totalprice,
         row_number() OVER (
           PARTITION BY o_custkey
           ORDER BY CAST(round(o_totalprice * 100) AS BIGINT) DESC,
                    o_orderkey) AS rn
  FROM orders)
WHERE rn <= {TOP_ORDERS_K}
ORDER BY o_custkey, rnk
"""


def q_customers_no_urgent(sf_dir: str) -> pd.DataFrame:
    """ANTI JOIN (``NOT EXISTS`` shape — the reference's seen-set
    exclusion `urls_to_visit - visited_urls`, base.py add_urls analog,
    expressed relationally): customers with no '1-URGENT' order.

    Scale shape: the probe side pre-shrinks to DISTINCT custkeys per
    batch (bounded by customer count, never orders). Below the gate the
    distinct-key partials and the customer table anti-join on the
    driver; above it both sides tag-union and hash-repartition by key
    so each block anti-joins its keys locally — no broadcast of a
    with-scale-growing side ever happens (BROADCAST_MAX_ROWS note on
    q5)."""
    n_orders = parquet_rows(sf_dir, "orders")

    def urgent_keys(df: pd.DataFrame) -> pd.DataFrame:
        sub = df[df["o_orderpriority"] == "1-URGENT"]
        return pd.DataFrame({"key": sub["o_custkey"].unique()})

    def build_probe():
        return T(sf_dir, "orders",
                 columns=["o_custkey", "o_orderpriority"]) \
            .map_batches(urgent_keys, batch_format="pandas",
                         batch_size=65536)

    def build_cust():
        return T(sf_dir, "customer", columns=["c_custkey", "c_mktsegment"])

    if n_orders < DISTRIBUTED_JOIN_MIN_ROWS:
        have = build_probe().to_pandas()["key"].unique()
        cdf = build_cust().to_pandas()
        out = cdf[~cdf["c_custkey"].isin(have)]
    else:
        from kryptone_ray.pipelines.common import hash_shuffle

        def tag_cust(df: pd.DataFrame) -> pd.DataFrame:
            return pd.DataFrame({"key": df["c_custkey"],
                                 "c_mktsegment": df["c_mktsegment"],
                                 "is_probe": False})

        def tag_probe(df: pd.DataFrame) -> pd.DataFrame:
            return pd.DataFrame({"key": df["key"],
                                 "c_mktsegment": "", "is_probe": True})

        def anti_block(df: pd.DataFrame) -> pd.DataFrame:
            have = df.loc[df["is_probe"], "key"].unique()
            sub = df[~df["is_probe"] & ~df["key"].isin(have)]
            return pd.DataFrame({"c_custkey": sub["key"],
                                 "c_mktsegment": sub["c_mktsegment"]})

        # per-customer output is table-sized — stream it above the gate
        with hash_shuffle():
            both = build_cust().map_batches(
                tag_cust, batch_format="pandas", batch_size=65536) \
                .union(build_probe().map_batches(
                    tag_probe, batch_format="pandas", batch_size=65536))
            return both.repartition(
                num_blocks=join_partitions(parquet_rows(sf_dir, "customer")),
                keys=["key"]) \
                .map_batches(anti_block, batch_format="pandas",
                             batch_size=None)
    out = out[["c_custkey", "c_mktsegment"]]
    return out.sort_values("c_custkey").reset_index(drop=True)


Q_CUSTOMERS_NO_URGENT_SQL = """
SELECT c_custkey, c_mktsegment
FROM customer c
WHERE NOT EXISTS (SELECT 1 FROM orders o
                  WHERE o.o_custkey = c.c_custkey
                    AND o.o_orderpriority = '1-URGENT')
ORDER BY c_custkey
"""


def q_orders_rollup(sf_dir: str) -> pd.DataFrame:
    """GROUPING SETS / ROLLUP (``GROUP BY ROLLUP(year, priority)``
    shape — the reference's nested url_distribution → per-domain →
    global rollups, seo.py audit summary levels): order totals at
    (year, priority), (year) and grand-total granularity in ONE pass.

    Scale shape: the fact table reduces per batch to the FINEST level
    only (one row per (year, priority) per batch — bounded by ~7 years
    × 5 priorities regardless of table size), the coarser levels
    derive from that combine on the driver with plain pandas groupbys.
    No second scan, no shuffle beyond the tiny partials. Sentinels
    (yr=-1, priority='ALL') encode the rolled-up levels so the hash
    compare never sees NULL grouping keys."""
    ds = T(sf_dir, "orders",
           columns=["o_orderdate", "o_orderpriority", "o_totalprice"])

    def prep(t):
        import pyarrow as pa
        import pyarrow.compute as pc

        yr = pc.cast(pc.year(t["o_orderdate"]), pa.int64())
        cents = pc.cast(pc.round(pc.multiply(t["o_totalprice"], 100)),
                        pa.int64())
        return pa.table([yr, t["o_orderpriority"], cents],
                        names=["yr", "pri", "cents"])

    from kryptone_ray.pipelines.common import partial_sum_count_arrow

    fine = partial_sum_count_arrow(
        ds.map_batches(prep, batch_format="pyarrow", batch_size=65536),
        keys=["yr", "pri"], sums={"cents": "cents"}, count_name="n")

    by_year = fine.groupby("yr", as_index=False)[["cents", "n"]].sum()
    by_year["pri"] = "ALL"
    total = pd.DataFrame({"yr": [-1], "pri": ["ALL"],
                          "cents": [fine["cents"].sum()],
                          "n": [fine["n"].sum()]})
    out = pd.concat([fine, by_year, total], ignore_index=True)
    out["total_price"] = out.pop("cents") / 100.0
    out["n"] = out["n"].astype("int64")
    out = out.rename(columns={"pri": "o_orderpriority"})
    out = out[["yr", "o_orderpriority", "total_price", "n"]]
    return out.sort_values(["yr", "o_orderpriority"]).reset_index(drop=True)


Q_ORDERS_ROLLUP_SQL = """
WITH o AS (SELECT CAST(year(o_orderdate) AS BIGINT) AS yr,
                  o_orderpriority AS pri,
                  CAST(round(o_totalprice * 100) AS BIGINT) AS cents
           FROM orders)
SELECT COALESCE(yr, -1) AS yr,
       COALESCE(pri, 'ALL') AS o_orderpriority,
       sum(cents) / 100.0 AS total_price, count(*) AS n
FROM o GROUP BY ROLLUP(yr, pri)
ORDER BY yr, o_orderpriority
"""


def q_acctbal_quantiles(sf_dir: str) -> pd.DataFrame:
    """EXACT DISTRIBUTED QUANTILES per group (p25/p50/p75/p90 of
    account balance per market segment) via value-count histograms —
    the reference's Performance percentile reporting shape.

    Scale shape: balances are exact 2-decimal money → the integer-cents
    DOMAIN is bounded (~1.1M distinct values for TPC-H's [-999.99,
    9999.99] range) no matter how many rows exist, so per-batch
    ``value_counts`` partials (one row per (segment, cents) per batch)
    combine on the driver into an exact histogram; quantiles read off
    the cumsum with searchsorted. The fact table never shuffles and the
    driver holds O(segments × domain), not O(rows). For unbounded
    domains the same shape degrades to a t-digest/KLL sketch — this
    operator deliberately exploits the fixed-point domain for
    EXACTNESS. Quantile rule (matches the SQL oracle exactly): value at
    1-based position ceil(q × n) of the sorted column."""
    ds = T(sf_dir, "customer", columns=["c_mktsegment", "c_acctbal"])

    def hist(df: pd.DataFrame) -> pd.DataFrame:
        cents = (df["c_acctbal"] * 100).round().astype("int64")
        out = pd.DataFrame({"seg": df["c_mktsegment"], "cents": cents}) \
            .groupby(["seg", "cents"], sort=False).size().reset_index(name="n")
        return out

    parts = ds.map_batches(hist, batch_format="pandas",
                           batch_size=65536).to_pandas()
    h = parts.groupby(["seg", "cents"], as_index=False)["n"].sum()

    qs = [0.25, 0.50, 0.75, 0.90]
    rows = []
    for seg, g in h.groupby("seg", sort=True):
        g = g.sort_values("cents")
        counts = g["n"].to_numpy()
        values = g["cents"].to_numpy()
        cum = np.cumsum(counts)
        n = int(cum[-1])
        picks = [values[np.searchsorted(cum, int(np.ceil(q * n)), "left")]
                 for q in qs]
        rows.append([seg] + [p / 100.0 for p in picks])
    out = pd.DataFrame(rows, columns=["c_mktsegment", "p25", "p50",
                                      "p75", "p90"])
    return out.reset_index(drop=True)


Q_ACCTBAL_QUANTILES_SQL = """
WITH c AS (SELECT c_mktsegment,
                  CAST(round(c_acctbal * 100) AS BIGINT) AS cents
           FROM customer),
r AS (SELECT c_mktsegment, cents,
             row_number() OVER (PARTITION BY c_mktsegment
                                ORDER BY cents) AS rn,
             count(*) OVER (PARTITION BY c_mktsegment) AS n
      FROM c)
SELECT c_mktsegment,
       max(CASE WHEN rn = CAST(ceil(0.25 * n) AS BIGINT) THEN cents END) / 100.0 AS p25,
       max(CASE WHEN rn = CAST(ceil(0.50 * n) AS BIGINT) THEN cents END) / 100.0 AS p50,
       max(CASE WHEN rn = CAST(ceil(0.75 * n) AS BIGINT) THEN cents END) / 100.0 AS p75,
       max(CASE WHEN rn = CAST(ceil(0.90 * n) AS BIGINT) THEN cents END) / 100.0 AS p90
FROM r GROUP BY c_mktsegment ORDER BY c_mktsegment
"""


def q_customer_running_spend(sf_dir: str) -> pd.DataFrame:
    """ORDERED PREFIX AGGREGATE (``sum() OVER (PARTITION BY ... ORDER
    BY ...)`` running total — the reference's cumulative Performance
    counters across iterations): each order annotated with the
    customer's cumulative spend up to and including it.

    Scale shape: running sums are NOT batch-decomposable (each row
    needs every earlier row of its key), so the distributed path
    hash-partitions by customer — every customer's orders in ONE block,
    partition count footer-sized — and runs one vectorized
    sort + grouped-cumsum pass per block. Below the gate the same pass
    runs once on the driver. Ordering ties broken by o_orderkey;
    sums in integer cents."""
    n_orders = parquet_rows(sf_dir, "orders")

    def running(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(["o_custkey", "o_orderdate", "o_orderkey"],
                            kind="stable")
        cents = (df["o_totalprice"] * 100).round().astype("int64")
        run = cents.groupby(df["o_custkey"], sort=False).cumsum()
        return pd.DataFrame({"o_custkey": df["o_custkey"],
                             "o_orderkey": df["o_orderkey"],
                             "running_spend": run / 100.0})

    def build():
        return T(sf_dir, "orders",
                 columns=["o_custkey", "o_orderkey", "o_orderdate",
                          "o_totalprice"])

    if n_orders < DISTRIBUTED_JOIN_MIN_ROWS:
        out = running(build().to_pandas())
        return out.sort_values(["o_custkey", "o_orderkey"]) \
            .reset_index(drop=True)
    from kryptone_ray.pipelines.common import hash_shuffle

    # per-order output is table-sized — stream it above the gate
    with hash_shuffle():
        return build().repartition(
            num_blocks=join_partitions(n_orders),
            keys=["o_custkey"]) \
            .map_batches(running, batch_format="pandas",
                         batch_size=None)


Q_CUSTOMER_RUNNING_SPEND_SQL = """
SELECT o_custkey, o_orderkey,
       sum(CAST(round(o_totalprice * 100) AS BIGINT)) OVER (
         PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
       ) / 100.0 AS running_spend
FROM orders ORDER BY o_custkey, o_orderkey
"""


def q_orders_with_returns(sf_dir: str) -> pd.DataFrame:
    """SEMI JOIN (``EXISTS`` shape — the reference's has-been-visited
    membership test, the positive twin of the seen-set anti join):
    orders having at least one returned ('R') line item; the lineitem
    payload never appears in the output.

    Scale shape: mirror of q_customers_no_urgent — the probe side
    pre-shrinks to DISTINCT returned orderkeys per batch, then below
    the gate the key partials and the orders table semi-join on the
    driver; above it both sides tag-union, hash-repartition by
    orderkey, and each block keeps its orders whose key appears among
    its probe rows. No broadcast of a scale-growing side."""
    n_li = parquet_rows(sf_dir, "lineitem")

    def ret_keys(df: pd.DataFrame) -> pd.DataFrame:
        sub = df[df["l_returnflag"] == "R"]
        return pd.DataFrame({"key": sub["l_orderkey"].unique()})

    def build_probe():
        return T(sf_dir, "lineitem",
                 columns=["l_orderkey", "l_returnflag"]) \
            .map_batches(ret_keys, batch_format="pandas",
                         batch_size=65536)

    def build_orders():
        return T(sf_dir, "orders", columns=["o_orderkey", "o_totalprice"])

    if n_li < DISTRIBUTED_JOIN_MIN_ROWS:
        have = build_probe().to_pandas()["key"].unique()
        odf = build_orders().to_pandas()
        out = odf[odf["o_orderkey"].isin(have)].copy()
    else:
        from kryptone_ray.pipelines.common import hash_shuffle

        def tag_orders(df: pd.DataFrame) -> pd.DataFrame:
            return pd.DataFrame({"key": df["o_orderkey"],
                                 "o_totalprice": df["o_totalprice"],
                                 "is_probe": False})

        def tag_probe(df: pd.DataFrame) -> pd.DataFrame:
            return pd.DataFrame({"key": df["key"], "o_totalprice": 0.0,
                                 "is_probe": True})

        def semi_block(df: pd.DataFrame) -> pd.DataFrame:
            have = df.loc[df["is_probe"], "key"].unique()
            sub = df[~df["is_probe"] & df["key"].isin(have)]
            price = (sub["o_totalprice"] * 100).round() / 100.0
            return pd.DataFrame({"o_orderkey": sub["key"],
                                 "o_totalprice": price})

        # per-order output is table-sized — stream it above the gate
        with hash_shuffle():
            both = build_orders().map_batches(
                tag_orders, batch_format="pandas", batch_size=65536) \
                .union(build_probe().map_batches(
                    tag_probe, batch_format="pandas", batch_size=65536))
            return both.repartition(
                num_blocks=join_partitions(parquet_rows(sf_dir, "orders")),
                keys=["key"]) \
                .map_batches(semi_block, batch_format="pandas",
                             batch_size=None)
    out["o_totalprice"] = (out["o_totalprice"] * 100).round() / 100.0
    out = out[["o_orderkey", "o_totalprice"]]
    return out.sort_values("o_orderkey").reset_index(drop=True)


Q_ORDERS_WITH_RETURNS_SQL = """
SELECT o_orderkey,
       CAST(round(o_totalprice * 100) AS BIGINT) / 100.0 AS o_totalprice
FROM orders o
WHERE EXISTS (SELECT 1 FROM lineitem l
              WHERE l.l_orderkey = o.o_orderkey
                AND l.l_returnflag = 'R')
ORDER BY o_orderkey
"""


def q_customers_above_segment_avg(sf_dir: str) -> pd.DataFrame:
    """CORRELATED SUBQUERY / grouped-average filter (``c_acctbal >
    (SELECT avg(...) ... same segment)`` — the reference's
    above-average-frequency term filter in TFIDFProcessor): customers
    whose balance strictly exceeds their market segment's average.

    Scale shape: decorrelates into (1) a per-segment sum/count from
    per-batch partials — output bounded by the 5-value segment domain
    regardless of row count, so broadcasting it is ALWAYS safe (unlike
    the q5 key→nation dicts, which grow with SF) — and (2) one
    map-only filter pass. The comparison is exact integer arithmetic:
    ``cents × n > sum_cents`` instead of a float average, so pipeline
    and oracle agree bit-for-bit."""
    from kryptone_ray.pipelines.common import partial_sum_count

    def cents_prep(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {"seg": df["c_mktsegment"],
             "cents": (df["c_acctbal"] * 100).round().astype("int64")})

    stats = partial_sum_count(
        T(sf_dir, "customer", columns=["c_mktsegment", "c_acctbal"])
        .map_batches(cents_prep, batch_format="pandas", batch_size=65536),
        keys=["seg"], sums={"sum_cents": "cents"}, count_name="n")
    sums = dict(zip(stats["seg"], stats["sum_cents"]))
    ns = dict(zip(stats["seg"], stats["n"]))

    def above(df: pd.DataFrame) -> pd.DataFrame:
        cents = (df["c_acctbal"] * 100).round().astype("int64")
        seg = df["c_mktsegment"]
        keep = cents * seg.map(ns).astype("int64") \
            > seg.map(sums).astype("int64")
        sub = df[keep]
        return pd.DataFrame({"c_custkey": sub["c_custkey"],
                             "c_mktsegment": sub["c_mktsegment"],
                             "c_acctbal": cents[keep] / 100.0})

    out = T(sf_dir, "customer",
            columns=["c_custkey", "c_mktsegment", "c_acctbal"]) \
        .map_batches(above, batch_format="pandas",
                     batch_size=65536).to_pandas()
    return out.sort_values("c_custkey").reset_index(drop=True)


Q_CUSTOMERS_ABOVE_SEGMENT_AVG_SQL = """
WITH c AS (SELECT c_custkey, c_mktsegment,
                  CAST(round(c_acctbal * 100) AS BIGINT) AS cents
           FROM customer),
s AS (SELECT c_mktsegment, sum(cents) AS sum_cents, count(*) AS n
      FROM c GROUP BY c_mktsegment)
SELECT c.c_custkey, c.c_mktsegment, c.cents / 100.0 AS c_acctbal
FROM c JOIN s USING (c_mktsegment)
WHERE c.cents * s.n > s.sum_cents
ORDER BY c.c_custkey
"""


def q_orders_with_returns_bloom(sf_dir: str) -> pd.DataFrame:
    """SEMI JOIN, BLOOM-PRUNED STRATEGY (same semantics and oracle as
    ``q_orders_with_returns``): the 100-TB accelerator where neither
    side is broadcastable as a key set — build a FIXED-SIZE Bloom
    bitmap of the probe keys from OR-mergeable per-batch partials
    (``stages/bloom.py``; 16 MiB cap regardless of probe cardinality),
    broadcast it once via ``ray.put``, filter the big side MAP-ONLY
    down to candidates (no false negatives, ~1% FPs), and run the
    exact tag-union semi join only on the survivors — the shuffle
    moves matching-plus-1% rows instead of the whole fact table.

    Below the gate the bitmap build and probe both run on the driver
    (same bloom code, no Ray round-trips); FPs are eliminated by the
    exact key check either way, so the bitmap only ever affects how
    much data the exact join sees."""
    import ray

    from kryptone_ray.stages.bloom import (bloom_bits_for, bloom_contains,
                                           bloom_partial)

    n_li = parquet_rows(sf_dir, "lineitem")
    # ~1/4 of lineitem rows are 'R'; only sizes the FP rate, not
    # correctness — a bad estimate costs extra exact-join input
    n_bits = bloom_bits_for(max(1024, n_li // 4))

    def bloom_batch(df: pd.DataFrame) -> pd.DataFrame:
        keys = df.loc[df["l_returnflag"] == "R", "l_orderkey"] \
            .unique().astype("int64")
        bm = bloom_partial(keys, n_bits)
        return pd.DataFrame({"bitmap": [bm.tobytes()]})

    def build_probe_keys():
        def ret_keys(df: pd.DataFrame) -> pd.DataFrame:
            sub = df[df["l_returnflag"] == "R"]
            return pd.DataFrame({"key": sub["l_orderkey"].unique()})

        return T(sf_dir, "lineitem",
                 columns=["l_orderkey", "l_returnflag"]) \
            .map_batches(ret_keys, batch_format="pandas",
                         batch_size=65536)

    if n_li < DISTRIBUTED_JOIN_MIN_ROWS:
        li = small(sf_dir, "lineitem",
                   columns=["l_orderkey", "l_returnflag"])
        keys = li.loc[li["l_returnflag"] == "R", "l_orderkey"] \
            .unique().astype("int64")
        bitmap = bloom_partial(keys, n_bits)
        odf = small(sf_dir, "orders",
                    columns=["o_orderkey", "o_totalprice"])
        cand = odf[bloom_contains(
            bitmap, odf["o_orderkey"].to_numpy().astype("int64"))]
        out = cand[cand["o_orderkey"].isin(keys)].copy()
    else:
        from kryptone_ray.pipelines.common import hash_shuffle

        # stage 1: distributed OR-mergeable bitmap partials, one
        # intermediate 64-way OR combine so the driver never holds
        # more than n_batches/64 bitmaps at once
        parts = T(sf_dir, "lineitem",
                  columns=["l_orderkey", "l_returnflag"]) \
            .map_batches(bloom_batch, batch_format="pandas",
                         batch_size=65536)

        def or_combine(df: pd.DataFrame) -> pd.DataFrame:
            acc = np.zeros(n_bits // 8, dtype=np.uint8)
            for b in df["bitmap"]:
                np.bitwise_or(acc, np.frombuffer(b, dtype=np.uint8),
                              out=acc)
            return pd.DataFrame({"bitmap": [acc.tobytes()]})

        merged = parts.map_batches(or_combine, batch_format="pandas",
                                   batch_size=64).to_pandas()
        bitmap = np.zeros(n_bits // 8, dtype=np.uint8)
        for b in merged["bitmap"]:
            np.bitwise_or(bitmap, np.frombuffer(b, dtype=np.uint8),
                          out=bitmap)
        bm_ref = ray.put(bitmap)

        def prefilter(df: pd.DataFrame) -> pd.DataFrame:
            bm = ray.get(bm_ref)
            keep = bloom_contains(
                bm, df["o_orderkey"].to_numpy().astype("int64"))
            sub = df[keep]
            return pd.DataFrame({"key": sub["o_orderkey"],
                                 "o_totalprice": sub["o_totalprice"],
                                 "is_probe": False})

        def tag_probe(df: pd.DataFrame) -> pd.DataFrame:
            return pd.DataFrame({"key": df["key"], "o_totalprice": 0.0,
                                 "is_probe": True})

        def semi_block(df: pd.DataFrame) -> pd.DataFrame:
            have = df.loc[df["is_probe"], "key"].unique()
            sub = df[~df["is_probe"] & df["key"].isin(have)]
            price = (sub["o_totalprice"] * 100).round() / 100.0
            return pd.DataFrame({"o_orderkey": sub["key"],
                                 "o_totalprice": price})

        # per-order output is table-sized — stream it above the gate
        with hash_shuffle():
            cand = T(sf_dir, "orders",
                     columns=["o_orderkey", "o_totalprice"]) \
                .map_batches(prefilter, batch_format="pandas",
                             batch_size=65536)
            both = cand.union(build_probe_keys().map_batches(
                tag_probe, batch_format="pandas", batch_size=65536))
            return both.repartition(
                num_blocks=join_partitions(parquet_rows(sf_dir, "orders")),
                keys=["key"]) \
                .map_batches(semi_block, batch_format="pandas",
                             batch_size=None)
    out["o_totalprice"] = (out["o_totalprice"] * 100).round() / 100.0
    out = out[["o_orderkey", "o_totalprice"]]
    return out.sort_values("o_orderkey").reset_index(drop=True)


def q_order_count_histogram(sf_dir: str) -> pd.DataFrame:
    """LEFT OUTER JOIN → histogram (TPC-H Q13 shape): orders per
    customer including customers with NO orders, then count customers
    per order-count bucket.

    Scale shape: the outer (customer) side never reads a single byte —
    c_custkey is the table's primary key, so the zero bucket is exactly
    ``footer_row_count(customer) − #distinct custkeys in orders``,
    recovering full outer-join semantics from parquet metadata. Orders
    shrink to per-batch (custkey, n) partials; below the gate the
    partials combine on the driver, above it they hash-partition by
    custkey (all partials of a key land in one block), each block
    finalizes its per-customer counts and emits its own tiny histogram
    partial — the per-customer counts (1.5M rows/SF in TPC-H) never
    materialize anywhere."""

    import pyarrow.compute as pc

    def partial(t):
        import pyarrow as pa

        g = t.group_by(["o_custkey"], use_threads=False) \
            .aggregate([("o_custkey", "count")])
        return pa.table({"o_custkey": g["o_custkey"],
                         "n": pc.cast(g["o_custkey_count"], pa.int64())})

    parts = T(sf_dir, "orders", columns=["o_custkey"]) \
        .map_batches(partial, batch_format="pyarrow", batch_size=65536)
    n_orders_rows = parquet_rows(sf_dir, "orders")

    if n_orders_rows < DISTRIBUTED_JOIN_MIN_ROWS:
        df = parts.to_pandas()
        per_cust = df.groupby("o_custkey", sort=False)["n"].sum()
        hist = per_cust.value_counts()
    else:
        from kryptone_ray.pipelines.common import hash_shuffle

        def block_hist(df: pd.DataFrame) -> pd.DataFrame:
            per = df.groupby("o_custkey", sort=False)["n"].sum()
            vc = per.value_counts()
            return pd.DataFrame({"n_orders": vc.index.astype("int64"),
                                 "n_customers": vc.to_numpy()})

        with hash_shuffle():
            blocks = T(sf_dir, "orders", columns=["o_custkey"]) \
                .map_batches(partial, batch_format="pyarrow",
                             batch_size=65536) \
                .repartition(num_blocks=join_partitions(n_orders_rows),
                             keys=["o_custkey"]) \
                .map_batches(block_hist, batch_format="pandas",
                             batch_size=None).to_pandas()
        hist = blocks.groupby("n_orders", sort=False)["n_customers"].sum()

    out = pd.DataFrame({"n_orders": hist.index.astype("int64"),
                        "n_customers": hist.to_numpy().astype("int64")})
    n_with_orders = int(out["n_customers"].sum())
    zero = parquet_rows(sf_dir, "customer") - n_with_orders
    if zero > 0:
        out = pd.concat([out, pd.DataFrame(
            {"n_orders": [0], "n_customers": [zero]})], ignore_index=True)
    return out.sort_values("n_orders").reset_index(drop=True)


Q_ORDER_COUNT_HISTOGRAM_SQL = """
SELECT n_orders, count(*) AS n_customers FROM (
    SELECT c_custkey, count(o_orderkey) AS n_orders
    FROM customer LEFT JOIN orders ON o_custkey = c_custkey
    GROUP BY c_custkey
) GROUP BY n_orders ORDER BY n_orders
"""


def q_custkey_set_ops(sf_dir: str) -> pd.DataFrame:
    """SET OPERATIONS (INTERSECT / EXCEPT) as one pass: customers who
    ordered in 1996, in 1997, or in both — DISTINCT keys per side, then
    set membership resolved per key.

    Scale shape: each batch shrinks to distinct (custkey, side-bit)
    pairs (bit 1 = 1996, bit 2 = 1997); the OR of a key's bits IS its
    set-op verdict (3 = intersect, 1/2 = the two excepts) — so the
    operator is one partial-distinct pass + a per-key bit-OR, never a
    pairwise comparison. Below the gate the pairs combine on the
    driver; above it they hash-partition by custkey and each block
    resolves its keys and emits a (side, count, min, max) partial."""
    import pyarrow as pa
    import pyarrow.compute as pc

    def pairs(t: pa.Table) -> pa.Table:
        yr = pc.year(t["o_orderdate"])
        keep = pc.or_(pc.equal(yr, 1996), pc.equal(yr, 1997))
        sub = t.filter(keep)
        yr = pc.year(sub["o_orderdate"])
        bit = pc.if_else(pc.equal(yr, 1996), pa.scalar(1, pa.int64()),
                         pa.scalar(2, pa.int64()))
        d = pa.table({"k": sub["o_custkey"], "bit": bit}) \
            .group_by(["k", "bit"], use_threads=False).aggregate([])
        return d

    SIDES = {1: "only_1996", 2: "only_1997", 3: "both"}

    def resolve(df: pd.DataFrame) -> pd.DataFrame:
        # distinct (k, bit) first so the sum of bits == the bit-OR
        d = df.drop_duplicates(["k", "bit"])
        flags = d.groupby("k", sort=False)["bit"].sum()
        g = pd.DataFrame({"k": flags.index, "side": flags.map(SIDES)}) \
            .groupby("side", sort=False)["k"]
        return pd.DataFrame({
            "side": list(g.groups),
            "n_customers": g.size().to_numpy().astype("int64"),
            "min_key": g.min().to_numpy().astype("int64"),
            "max_key": g.max().to_numpy().astype("int64"),
        })

    ds = T(sf_dir, "orders", columns=["o_custkey", "o_orderdate"]) \
        .map_batches(pairs, batch_format="pyarrow", batch_size=65536)
    n_rows = parquet_rows(sf_dir, "orders")
    if n_rows < DISTRIBUTED_JOIN_MIN_ROWS:
        out = resolve(ds.to_pandas())
    else:
        from kryptone_ray.pipelines.common import hash_shuffle

        with hash_shuffle():
            parts = T(sf_dir, "orders",
                      columns=["o_custkey", "o_orderdate"]) \
                .map_batches(pairs, batch_format="pyarrow",
                             batch_size=65536) \
                .repartition(num_blocks=join_partitions(n_rows),
                             keys=["k"]) \
                .map_batches(resolve, batch_format="pandas",
                             batch_size=None).to_pandas()
        g = parts.groupby("side", sort=False)
        out = g.agg(n_customers=("n_customers", "sum"),
                    min_key=("min_key", "min"),
                    max_key=("max_key", "max")).reset_index()
    return out.sort_values("side").reset_index(drop=True)


Q_CUSTKEY_SET_OPS_SQL = """
WITH a AS (SELECT DISTINCT o_custkey AS k FROM orders
           WHERE year(o_orderdate) = 1996),
     b AS (SELECT DISTINCT o_custkey AS k FROM orders
           WHERE year(o_orderdate) = 1997),
     i AS (SELECT k FROM a INTERSECT SELECT k FROM b),
     ea AS (SELECT k FROM a EXCEPT SELECT k FROM b),
     eb AS (SELECT k FROM b EXCEPT SELECT k FROM a)
SELECT side, n_customers, min_key, max_key FROM (
    SELECT 'both' AS side, count(*) AS n_customers,
           min(k) AS min_key, max(k) AS max_key FROM i
    UNION ALL
    SELECT 'only_1996', count(*), min(k), max(k) FROM ea
    UNION ALL
    SELECT 'only_1997', count(*), min(k), max(k) FROM eb
) ORDER BY side
"""


def q_orders_moving_avg(sf_dir: str) -> pd.DataFrame:
    """MOVING-WINDOW aggregate (7-row trailing mean over ordered daily
    totals) — the ordered-frame window shape (``ROWS BETWEEN 6
    PRECEDING AND CURRENT ROW``) next to the prefix shape of
    q_customer_running_spend.

    Scale shape: the fact shrinks to per-batch (day, cents) partials
    (bounded key domain: days of the time range), the combined daily
    series sorts on the driver, and the window itself is an exact
    int64 cumsum difference — ``win_sum[i] = cs[i] - cs[i-7]`` — so
    the only float op is the final single division, mirrored in SQL
    as CAST(sum OVER w AS DOUBLE) / (100 * count OVER w). For a
    partitioned window (per-key series) the same pass rides a hash
    partition by key, as in q_customer_running_spend."""
    import pyarrow as pa
    import pyarrow.compute as pc

    from kryptone_ray.pipelines.common import partial_sum_count_arrow

    def prep(t: pa.Table) -> pa.Table:
        day = pc.floor_temporal(t["o_orderdate"], unit="day")
        cents = pc.cast(pc.round(pc.multiply(t["o_totalprice"], 100)),
                        pa.int64())
        return pa.table({"day": day, "cents": cents})

    ds = T(sf_dir, "orders", columns=["o_orderdate", "o_totalprice"]) \
        .map_batches(prep, batch_format="pyarrow", batch_size=65536)
    daily = partial_sum_count_arrow(ds, keys=["day"],
                                    sums={"cents": "cents"})
    daily = daily.sort_values("day").reset_index(drop=True)
    cents = daily["cents"].to_numpy()
    cs = np.cumsum(cents)
    win_sum = cs.copy()
    win_sum[7:] = cs[7:] - cs[:-7]
    n = np.minimum(np.arange(len(cents)) + 1, 7)
    return pd.DataFrame({
        "day": daily["day"],
        "day_total": cents / 100.0,
        "ma7": win_sum.astype("float64") / (100.0 * n),
    })


Q_ORDERS_MOVING_AVG_SQL = """
WITH d AS (SELECT date_trunc('day', o_orderdate) AS day,
                  sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS cents
           FROM orders GROUP BY 1)
SELECT day,
       cents / 100.0 AS day_total,
       CAST(sum(cents) OVER w AS DOUBLE) / (100.0 * count(*) OVER w) AS ma7
FROM d WINDOW w AS (ORDER BY day ROWS BETWEEN 6 PRECEDING AND CURRENT ROW)
ORDER BY day
"""


def q_customer_percent_rank(sf_dir: str) -> pd.DataFrame:
    """WINDOW RANK over an unordered distributed table:
    ``percent_rank() OVER (PARTITION BY segment ORDER BY acctbal)`` for
    every customer, computed WITHOUT any sort or shuffle — acctbal is
    a bounded integer-cents domain (same insight as
    q_acctbal_quantiles), so per-batch partial histograms per segment
    combine into exact cumulative counts; the cumsums broadcast back
    (``ray.put``, read once per task) and a second map-only pass emits
    each row's rank. percent_rank = cnt_less / (n − 1) is tie-stable
    (equal values share a rank) and a single float division."""
    import ray

    OFF = 100_000  # acctbal ≥ -1000.00 → cents + OFF ≥ 0
    DOM = 1_100_000

    def cents(t):
        import pyarrow as pa
        import pyarrow.compute as pc

        c = pc.add(pc.cast(pc.round(pc.multiply(t["c_acctbal"], 100)),
                           pa.int64()), OFF)
        return pa.table([t["c_custkey"], t["c_mktsegment"], c],
                        names=["c_custkey", "c_mktsegment", "cents"])

    def build():
        return T(sf_dir, "customer",
                 columns=["c_custkey", "c_mktsegment", "c_acctbal"]) \
            .map_batches(cents, batch_format="pyarrow", batch_size=65536)

    def hist_partial(df: pd.DataFrame) -> pd.DataFrame:
        out = []
        for seg, sub in df.groupby("c_mktsegment", sort=False):
            h = np.bincount(sub["cents"].to_numpy(), minlength=DOM)
            nz = np.flatnonzero(h)
            out.append(pd.DataFrame({"seg": seg, "v": nz, "n": h[nz]}))
        return pd.concat(out, ignore_index=True)

    parts = build().map_batches(hist_partial, batch_format="pandas",
                                batch_size=65536).to_pandas()
    cum = {}
    for seg, sub in parts.groupby("seg", sort=False):
        h = np.zeros(DOM, dtype=np.int64)
        np.add.at(h, sub["v"].to_numpy(), sub["n"].to_numpy())
        cs = np.concatenate([[0], np.cumsum(h)[:-1]])  # cnt strictly less
        cum[seg] = (cs, int(h.sum()))
    ref = ray.put(cum)

    def rank_rows(df: pd.DataFrame) -> pd.DataFrame:
        c = ray.get(ref)
        df = df.reset_index(drop=True)
        pr = np.empty(len(df))
        for seg, sub in df.groupby("c_mktsegment", sort=False):
            cs, n = c[seg]
            pr[sub.index.to_numpy()] = cs[sub["cents"].to_numpy()] / (n - 1)
        return pd.DataFrame({"c_custkey": df["c_custkey"],
                             "c_mktsegment": df["c_mktsegment"],
                             "pr": pr})

    out = build().map_batches(rank_rows, batch_format="pandas",
                              batch_size=65536).to_pandas()
    return out.sort_values("c_custkey").reset_index(drop=True)


Q_CUSTOMER_PERCENT_RANK_SQL = """
SELECT c_custkey, c_mktsegment,
       percent_rank() OVER (PARTITION BY c_mktsegment
                            ORDER BY c_acctbal) AS pr
FROM customer ORDER BY c_custkey
"""


def q_orders_ntile_shards(sf_dir: str, n_shards: int = 8) -> pd.DataFrame:
    """GLOBAL TOTAL-ORDER RANKING at scale (the heart of a distributed
    sort): every order gets its exact global rank under
    (o_orderdate, o_orderkey) and its ntile shard, WITHOUT a global
    sort — (1) per-batch day-histogram partials give exact cumulative
    row offsets per day (bounded domain); (2) rows hash-partition by
    day so each block holds whole days, sorts locally by key, and
    assigns rank = day_offset + local position; (3) ntile arithmetic
    maps ranks to equal-depth shards. Per shard the census (count,
    key sum, first/last key by rank) is an associative partial. This
    is exactly the range-partitioned export recipe: step (2)'s blocks
    ARE the sorted shards a writer would emit."""
    import ray

    def prep(t):
        import pyarrow as pa
        import pyarrow.compute as pc

        return pa.table({"day": pc.floor_temporal(t["o_orderdate"],
                                                  unit="day"),
                         "key": t["o_orderkey"]})

    def build():
        return T(sf_dir, "orders",
                 columns=["o_orderkey", "o_orderdate"]) \
            .map_batches(prep, batch_format="pyarrow", batch_size=65536)

    def day_hist(df: pd.DataFrame) -> pd.DataFrame:
        vc = df["day"].value_counts()
        return pd.DataFrame({"day": vc.index, "n": vc.to_numpy()})

    hist = build().map_batches(day_hist, batch_format="pandas",
                               batch_size=65536).to_pandas()
    hist = hist.groupby("day", sort=True)["n"].sum()
    total = int(hist.sum())
    offsets = dict(zip(hist.index,
                       np.concatenate([[0], np.cumsum(hist.to_numpy())[:-1]])))

    size, rem = divmod(total, n_shards)

    def ntile_of(r0: np.ndarray) -> np.ndarray:
        # r0 = 0-based global rank; first `rem` shards get size+1 rows
        cut = rem * (size + 1)
        return np.where(r0 < cut, r0 // (size + 1) + 1,
                        rem + (r0 - cut) // size + 1).astype("int64")

    def census(df: pd.DataFrame) -> pd.DataFrame:
        rows = []
        for shard, sub in df.groupby("shard", sort=False):
            i_lo = sub["rn"].idxmin()
            i_hi = sub["rn"].idxmax()
            rows.append({"shard": int(shard), "n_rows": len(sub),
                         "key_sum": int(sub["key"].sum()),
                         "lo_rn": int(sub.loc[i_lo, "rn"]),
                         "hi_rn": int(sub.loc[i_hi, "rn"]),
                         "first_key": int(sub.loc[i_lo, "key"]),
                         "last_key": int(sub.loc[i_hi, "key"])})
        return pd.DataFrame(rows)

    if parquet_rows(sf_dir, "orders") < DISTRIBUTED_JOIN_MIN_ROWS:
        df = build().to_pandas().sort_values(["day", "key"]) \
            .reset_index(drop=True)
        df["rn"] = np.arange(1, len(df) + 1)
        df["shard"] = ntile_of(df["rn"].to_numpy() - 1)
        parts = census(df)
    else:
        from kryptone_ray.pipelines.common import hash_shuffle

        ref = ray.put(offsets)

        def rank_block(df: pd.DataFrame) -> pd.DataFrame:
            off = ray.get(ref)
            out = []
            for day, sub in df.groupby("day", sort=False):
                sub = sub.sort_values("key").reset_index(drop=True)
                r0 = off[day] + np.arange(len(sub))
                sub["rn"] = r0 + 1
                sub["shard"] = ntile_of(r0)
                out.append(sub)
            return census(pd.concat(out, ignore_index=True))

        with hash_shuffle():
            parts = build().repartition(
                num_blocks=join_partitions(parquet_rows(sf_dir, "orders")),
                keys=["day"]) \
                .map_batches(rank_block, batch_format="pandas",
                             batch_size=None).to_pandas()

    rows = []
    for shard, sub in parts.groupby("shard", sort=True):
        lo = sub.loc[sub["lo_rn"].idxmin()]
        hi = sub.loc[sub["hi_rn"].idxmax()]
        rows.append({"shard": int(shard),
                     "n_rows": int(sub["n_rows"].sum()),
                     "key_sum": int(sub["key_sum"].sum()),
                     "first_key": int(lo["first_key"]),
                     "last_key": int(hi["last_key"])})
    return pd.DataFrame(rows)


Q_ORDERS_NTILE_SHARDS_SQL = """
WITH s AS (SELECT o_orderkey AS key,
                  ntile(8) OVER (ORDER BY date_trunc('day', o_orderdate),
                                 o_orderkey) AS shard,
                  row_number() OVER (ORDER BY date_trunc('day', o_orderdate),
                                     o_orderkey) AS rn
           FROM orders),
     b AS (SELECT shard, min(rn) AS lo, max(rn) AS hi,
                  count(*) AS n_rows, sum(key) AS key_sum
           FROM s GROUP BY shard)
SELECT b.shard, b.n_rows, CAST(b.key_sum AS BIGINT) AS key_sum,
       f.key AS first_key, l.key AS last_key
FROM b JOIN s f ON f.rn = b.lo JOIN s l ON l.rn = b.hi
ORDER BY b.shard
"""


def q_small_quantity_revenue(sf_dir: str) -> pd.DataFrame:
    """TPC-H Q17 shape generalized per brand: revenue from lineitems
    whose quantity is under 20% of their part's average quantity
    (reference capability: grouped stats feeding a per-record filter,
    seo.py:407-421 word-frequency → threshold pattern).

    The correlated scalar subquery ``qty < 0.2 * avg(qty per part)``
    becomes a per-part (n, Σqty) partial aggregate that meets the fact
    table again — fact×self-aggregate. The predicate is evaluated as
    the EXACT integer cross-multiplication ``5·qty·n < Σqty``
    (quantities are integral), so no float-division drift can flip a
    row. Below BROADCAST_MAX_ROWS the part stats + brand map broadcast
    via ray.put and lineitem streams once more (two passes — Q17 is
    inherently two-pass); above it both the stats and the brand attach
    run as native hash joins riding the same partkey partitioning."""
    import pyarrow as pa

    def prep(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        qty = pc.cast(t["l_quantity"], pa.int64())
        cents = pc.cast(pc.round(pc.multiply(t["l_extendedprice"], 100)),
                        pa.int64())
        return pa.table([t["l_partkey"], qty, cents],
                        names=["pk", "qty", "cents"])

    def stats_partial(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby("pk", sort=False)["qty"].agg(["size", "sum"])
        g.columns = ["n", "sq"]
        return g.reset_index()

    cols = ["l_partkey", "l_quantity", "l_extendedprice"]

    if parquet_rows(sf_dir, "part") <= BROADCAST_MAX_ROWS:
        import ray

        ds = T(sf_dir, "lineitem", columns=cols) \
            .map_batches(prep, batch_format="pyarrow", batch_size=65536)
        parts = ds.map_batches(stats_partial, batch_format="pandas",
                               batch_size=65536).to_pandas()
        stats = parts.groupby("pk", sort=False)[["n", "sq"]].sum() \
            .reset_index()
        brand = small(sf_dir, "part", columns=["p_partkey", "p_brand"]) \
            .rename(columns={"p_partkey": "pk"})
        side = stats.merge(brand, on="pk", how="inner")
        ref = ray.put(side)

        def brand_partial(df: pd.DataFrame) -> pd.DataFrame:
            s = ray.get(ref)
            m = df.merge(s, on="pk", how="inner")
            m = m[5 * m["qty"] * m["n"] < m["sq"]]
            g = m.groupby("p_brand", sort=False)["cents"] \
                .agg(["sum", "size"]).reset_index()
            g.columns = ["p_brand", "cents", "n_lineitems"]
            return g

        out = T(sf_dir, "lineitem", columns=cols) \
            .map_batches(prep, batch_format="pyarrow", batch_size=65536) \
            .map_batches(brand_partial, batch_format="pandas",
                         batch_size=65536).to_pandas()
        g = out.groupby("p_brand", sort=False, as_index=False).agg(
            cents=("cents", "sum"), n_lineitems=("n_lineitems", "sum"))
        g["avg_yearly"] = g.pop("cents") / 700.0
        g["n_lineitems"] = g["n_lineitems"].astype("int64")
        return g[["p_brand", "avg_yearly", "n_lineitems"]] \
            .sort_values("p_brand").reset_index(drop=True)

    # distributed: stats combine rides a hash repartition by partkey,
    # then two native hash joins (fact×stats, fact×part) on the SAME
    # key — the join output is co-partitioned by pk, so the per-pk
    # shrink before the brand join is a per-block groupby.
    from kryptone_ray.pipelines.common import hash_shuffle

    npart = join_partitions(parquet_rows(sf_dir, "lineitem"))
    with hash_shuffle():
        ds = T(sf_dir, "lineitem", columns=cols) \
            .map_batches(prep, batch_format="pyarrow", batch_size=65536)
        stats = ds.map_batches(stats_partial, batch_format="pandas",
                               batch_size=65536) \
            .repartition(num_blocks=npart, keys=["pk"]) \
            .map_batches(
                lambda df: df.groupby("pk", sort=False)[["n", "sq"]]
                .sum().reset_index().rename(columns={"pk": "spk"}),
                batch_format="pandas", batch_size=None)
        joined = ds.join(stats, "inner", num_partitions=npart,
                         on=("pk",), right_on=("spk",))

        def shrink(df: pd.DataFrame) -> pd.DataFrame:
            m = df[5 * df["qty"] * df["n"] < df["sq"]]
            g = m.groupby("pk", sort=False)["cents"] \
                .agg(["sum", "size"]).reset_index()
            g.columns = ["pk", "cents", "n_lineitems"]
            return g

        shrunk = joined.map_batches(shrink, batch_format="pandas",
                                    batch_size=None)
        part_ds = T(sf_dir, "part", columns=["p_partkey", "p_brand"])
        j2 = shrunk.join(part_ds, "inner", num_partitions=npart,
                         on=("pk",), right_on=("p_partkey",))
        out = j2.map_batches(
            lambda df: df.groupby("p_brand", sort=False)[
                ["cents", "n_lineitems"]].sum().reset_index(),
            batch_format="pandas", batch_size=None).to_pandas()
    g = out.groupby("p_brand", sort=False, as_index=False)[
        ["cents", "n_lineitems"]].sum()
    g["avg_yearly"] = g.pop("cents") / 700.0
    g["n_lineitems"] = g["n_lineitems"].astype("int64")
    return g[["p_brand", "avg_yearly", "n_lineitems"]] \
        .sort_values("p_brand").reset_index(drop=True)


Q_SMALL_QTY_REVENUE_SQL = """
WITH l AS (SELECT l_partkey AS pk, CAST(l_quantity AS BIGINT) AS qty,
                  CAST(round(l_extendedprice * 100) AS BIGINT) AS cents
           FROM lineitem),
     s AS (SELECT pk, count(*) AS n, sum(qty) AS sq FROM l GROUP BY pk)
SELECT p_brand,
       CAST(sum(l.cents) AS BIGINT) / 700.0 AS avg_yearly,
       count(*) AS n_lineitems
FROM l JOIN s USING (pk) JOIN part ON p_partkey = l.pk
WHERE 5 * l.qty * s.n < s.sq
GROUP BY p_brand ORDER BY p_brand
"""


def q_lineitem_unpivot(sf_dir: str) -> pd.DataFrame:
    """UNPIVOT / melt (wide→long): the four lineitem money measures
    become rows of ``(measure, cents)``, then a grouped aggregate per
    ``(l_returnflag, measure)``. The melt happens per batch — Arrow in,
    one long Arrow table out (column-concat, no per-row Python) — and
    collapses immediately to per-batch partials, so the long form never
    exists beyond a batch (at 100 TB the melt would otherwise 4× the
    row count)."""
    import pyarrow as pa
    import pyarrow.compute as pc

    from kryptone_ray.pipelines.common import partial_sum_count_arrow

    MEASURES = ["quantity", "extendedprice", "discount", "tax"]
    COLS = ["l_quantity", "l_extendedprice", "l_discount", "l_tax"]

    def melt(t: pa.Table) -> pa.Table:
        flags, names, cents = [], [], []
        for m, c in zip(MEASURES, COLS):
            flags.append(t["l_returnflag"])
            names.append(pa.array([m] * len(t), type=pa.string()))
            cents.append(pc.cast(pc.round(pc.multiply(t[c], 100)),
                                 pa.int64()))
        return pa.table({
            "l_returnflag": pa.concat_arrays(
                [a.combine_chunks() for a in flags]),
            "measure": pa.concat_arrays(names),
            "cents": pa.concat_arrays(
                [a.combine_chunks() for a in cents]),
        })

    ds = T(sf_dir, "lineitem", columns=["l_returnflag"] + COLS) \
        .map_batches(melt, batch_format="pyarrow", batch_size=65536)
    out = partial_sum_count_arrow(ds, keys=["l_returnflag", "measure"],
                                  sums={"cents": "cents"}, count_name="n")
    out["total"] = out.pop("cents") / 100.0
    out = out[["l_returnflag", "measure", "total", "n"]]
    return out.sort_values(["l_returnflag", "measure"]) \
        .reset_index(drop=True)


Q_LINEITEM_UNPIVOT_SQL = """
SELECT l_returnflag, measure, sum(cents) / 100.0 AS total, count(*) AS n
FROM (
  SELECT l_returnflag, 'quantity' AS measure,
         CAST(round(l_quantity * 100) AS BIGINT) AS cents FROM lineitem
  UNION ALL SELECT l_returnflag, 'extendedprice',
         CAST(round(l_extendedprice * 100) AS BIGINT) FROM lineitem
  UNION ALL SELECT l_returnflag, 'discount',
         CAST(round(l_discount * 100) AS BIGINT) FROM lineitem
  UNION ALL SELECT l_returnflag, 'tax',
         CAST(round(l_tax * 100) AS BIGINT) FROM lineitem
)
GROUP BY l_returnflag, measure ORDER BY l_returnflag, measure
"""


def q_nation_rich_customer_names(
        sf_dir: str,
        min_acctbal: float = NATION_RICH_MIN_ACCTBAL) -> pd.DataFrame:
    """Ordered STRING_AGG / LISTAGG: per nation, the comma-joined names
    of high-balance customers in ``c_custkey`` order, plus their count.

    An ordered string_agg inherently co-locates each group's rows, so
    the operator's scale contract is that the AGGREGATED SUBSET is
    bounded: the predicate prunes at the read (only qualifying rows
    leave the scan), group count is bounded by the nation domain (25),
    and per-group size by the predicate's selectivity — the caller owns
    choosing a selective-enough predicate, exactly like any LISTAGG in
    a warehouse. Below the gate the qualifying rows combine on the
    driver; above it they hash-partition by nation key (every group
    lands whole in one block — same invariant join_partitions relies
    on) and each block emits finished ``(nation, names, n)`` rows."""

    def agg(df: pd.DataFrame) -> pd.DataFrame:
        rows = []
        for nk, g in df.groupby("c_nationkey", sort=False):
            g = g.sort_values("c_custkey")
            rows.append((nk, ",".join(g["c_name"]), len(g)))
        return pd.DataFrame(rows, columns=["c_nationkey", "names", "n_rich"])

    def build():
        return T(sf_dir, "customer",
                 columns=["c_nationkey", "c_custkey", "c_name",
                          "c_acctbal"]) \
            .filter(expr=f"c_acctbal > {min_acctbal}")

    if parquet_rows(sf_dir, "customer") < DISTRIBUTED_JOIN_MIN_ROWS:
        out = agg(build().to_pandas())
    else:
        from kryptone_ray.pipelines.common import hash_shuffle

        with hash_shuffle():
            out = build().repartition(num_blocks=25, keys=["c_nationkey"]) \
                .map_batches(agg, batch_format="pandas",
                             batch_size=None).to_pandas()
    out["n_rich"] = out["n_rich"].astype("int64")
    return out.sort_values("c_nationkey").reset_index(drop=True)


Q_NATION_RICH_NAMES_SQL = f"""
SELECT c_nationkey,
       string_agg(c_name, ',' ORDER BY c_custkey) AS names,
       count(*) AS n_rich
FROM customer WHERE c_acctbal > {NATION_RICH_MIN_ACCTBAL}
GROUP BY c_nationkey ORDER BY c_nationkey
"""


def _orders_with_changes(t):
    """Deterministic CDC change-set derived from the orders base (keys
    ≡ 0 mod 7 → v1 price update with status 'U'; keys ≡ 0 mod 97 → v2
    delete tombstone) — shared by the LWW merge and SCD2 history
    builds; a real deployment unions a change parquet instead."""
    import pyarrow as pa
    import pyarrow.compute as pc

    cents = pc.cast(pc.round(pc.multiply(t["o_totalprice"], 100)),
                    pa.int64())
    key = t["o_orderkey"]
    base = pa.table({
        "o_orderkey": key, "o_orderstatus": t["o_orderstatus"],
        "cents": cents,
        "version": pa.array([0] * len(t), type=pa.int32()),
        "deleted": pa.array([False] * len(t)),
    })
    # integer divide-multiply-subtract = key % 7 (pyarrow has no mod)
    upd_mask = pc.equal(
        pc.subtract(key, pc.multiply(pc.divide(key, 7), 7)), 0)
    upd = base.filter(upd_mask)
    upd = pa.table({
        "o_orderkey": upd["o_orderkey"],
        "o_orderstatus": pa.array(["U"] * len(upd)),
        "cents": pc.add(upd["cents"], 1000),
        "version": pa.array([1] * len(upd), type=pa.int32()),
        "deleted": pa.array([False] * len(upd)),
    })
    del_mask = pc.equal(
        pc.subtract(key, pc.multiply(pc.divide(key, 97), 97)), 0)
    dele = base.filter(del_mask)
    dele = pa.table({
        "o_orderkey": dele["o_orderkey"],
        "o_orderstatus": dele["o_orderstatus"],
        "cents": dele["cents"],
        "version": pa.array([2] * len(dele), type=pa.int32()),
        "deleted": pa.array([True] * len(dele)),
    })
    return pa.concat_tables([base, upd, dele])


def q_orders_cdc_merge(sf_dir: str) -> pd.DataFrame:
    """CDC MERGE / UPSERT (SCD-style last-write-wins): apply a
    change-set of updates + delete tombstones to the orders base table,
    keeping per key the highest-version row, then census the merged
    table per status. The change-set is derived deterministically from
    the base itself (keys ≡ 0 mod 7 get a v1 price update with status
    'U'; keys ≡ 0 mod 97 a v2 tombstone) so the operator needs no
    external feed; a real deployment unions a change parquet instead.

    Distributed shape: base and change rows carry ``(version,
    deleted)``, hash-partition by order key (all versions of a key in
    one block), per-block LWW reduce = sort by version, keep last,
    drop tombstones — then per-block census partials sum driver-side.
    Only (key, status, cents, version) ever moves, never full rows."""
    def lww_census(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(["o_orderkey", "version"], kind="stable")
        last = df.drop_duplicates("o_orderkey", keep="last")
        live = last[~last["deleted"]]
        g = live.groupby("o_orderstatus", sort=False)
        return pd.DataFrame({"n": g.size(),
                             "cents": g["cents"].sum()}).reset_index()

    def build():
        return T(sf_dir, "orders",
                 columns=["o_orderkey", "o_orderstatus", "o_totalprice"]) \
            .map_batches(_orders_with_changes, batch_format="pyarrow",
                         batch_size=65536)

    n_rows = parquet_rows(sf_dir, "orders")
    if n_rows < DISTRIBUTED_JOIN_MIN_ROWS:
        parts = lww_census(build().to_pandas())
    else:
        from kryptone_ray.pipelines.common import hash_shuffle

        with hash_shuffle():
            parts = build().repartition(
                num_blocks=join_partitions(n_rows), keys=["o_orderkey"]) \
                .map_batches(lww_census, batch_format="pandas",
                             batch_size=None).to_pandas()
    g = parts.groupby("o_orderstatus", sort=False)
    out = pd.DataFrame({"n": g["n"].sum().astype("int64"),
                        "total": g["cents"].sum() / 100.0}).reset_index()
    return out[["o_orderstatus", "n", "total"]] \
        .sort_values("o_orderstatus").reset_index(drop=True)


Q_ORDERS_CDC_MERGE_SQL = """
WITH base AS (
  SELECT o_orderkey, o_orderstatus,
         CAST(round(o_totalprice * 100) AS BIGINT) AS cents,
         0 AS version, FALSE AS deleted
  FROM orders),
chg AS (
  SELECT o_orderkey, 'U' AS o_orderstatus, cents + 1000 AS cents,
         1 AS version, FALSE AS deleted
  FROM base WHERE o_orderkey % 7 = 0
  UNION ALL
  SELECT o_orderkey, o_orderstatus, cents, 2 AS version, TRUE AS deleted
  FROM base WHERE o_orderkey % 97 = 0),
merged AS (
  SELECT *, row_number() OVER (PARTITION BY o_orderkey
                               ORDER BY version DESC) AS rn
  FROM (SELECT * FROM base UNION ALL SELECT * FROM chg))
SELECT o_orderstatus, count(*) AS n, sum(cents) / 100.0 AS total
FROM merged WHERE rn = 1 AND NOT deleted
GROUP BY o_orderstatus ORDER BY o_orderstatus
"""


def q_orders_overlap_pairs(sf_dir: str) -> pd.DataFrame:
    """INTERVAL-OVERLAP SELF-JOIN: each order is an interval
    ``[o_orderdate, o_orderdate + (1 + o_orderkey % 14) days]``; count
    per customer the pairs of that customer's orders whose intervals
    overlap, and output the histogram (pair count → customers).

    Per-key sweep instead of a quadratic join: hash-partition by
    customer, per block sort each customer's intervals by start, and
    for interval i count the later-starting intervals with
    ``start_j <= end_i`` via one searchsorted — sorted-by-start makes
    the other overlap condition (``end_j >= start_i``) automatic. The
    partitioning contract: per-customer order counts are bounded
    (TPC-H ~10/customer at every SF), so no group outgrows a block."""

    def sweep(df: pd.DataFrame) -> pd.DataFrame:
        rows = []
        for ck, g in df.groupby("o_custkey", sort=False):
            s = np.sort(g["start_us"].to_numpy())
            order = np.argsort(g["start_us"].to_numpy(), kind="stable")
            e = g["end_us"].to_numpy()[order]
            idx = np.searchsorted(s, e, side="right")
            n_pairs = int((idx - np.arange(1, len(s) + 1)).sum())
            if n_pairs > 0:
                rows.append((ck, n_pairs))
        return pd.DataFrame(rows, columns=["o_custkey", "n_overlaps"])

    def prep(t):
        import pyarrow as pa
        import pyarrow.compute as pc

        key = t["o_orderkey"]
        dur_days = pc.add(
            pc.subtract(key, pc.multiply(pc.divide(key, 14), 14)), 1)
        # normalize to µs first: a raw int64 cast of a ns-unit column
        # would mix ns starts with the µs day constant below
        start = pc.cast(pc.cast(t["o_orderdate"], pa.timestamp("us")),
                        pa.int64())
        end = pc.add(start, pc.multiply(
            pc.cast(dur_days, pa.int64()),
            pa.scalar(86_400_000_000, pa.int64())))
        return pa.table({"o_custkey": t["o_custkey"],
                         "start_us": start, "end_us": end})

    def build():
        return T(sf_dir, "orders",
                 columns=["o_custkey", "o_orderkey", "o_orderdate"]) \
            .map_batches(prep, batch_format="pyarrow", batch_size=65536)

    n_rows = parquet_rows(sf_dir, "orders")
    if n_rows < DISTRIBUTED_JOIN_MIN_ROWS:
        per_cust = sweep(build().to_pandas())
    else:
        from kryptone_ray.pipelines.common import hash_shuffle

        with hash_shuffle():
            per_cust = build().repartition(
                num_blocks=join_partitions(n_rows), keys=["o_custkey"]) \
                .map_batches(sweep, batch_format="pandas",
                             batch_size=None).to_pandas()
    hist = per_cust.groupby("n_overlaps", sort=True).size()
    return pd.DataFrame({"n_overlaps": hist.index.astype("int64"),
                         "n_customers": hist.to_numpy().astype("int64")})


Q_ORDERS_OVERLAP_PAIRS_SQL = """
WITH iv AS (
  SELECT o_custkey, o_orderkey, o_orderdate AS s,
         o_orderdate + INTERVAL 1 DAY * (1 + o_orderkey % 14) AS e
  FROM orders)
SELECT n_overlaps, count(*) AS n_customers
FROM (SELECT a.o_custkey, count(*) AS n_overlaps
      FROM iv a JOIN iv b
        ON a.o_custkey = b.o_custkey AND a.o_orderkey < b.o_orderkey
       AND a.s <= b.e AND b.s <= a.e
      GROUP BY a.o_custkey)
GROUP BY n_overlaps ORDER BY n_overlaps
"""


def _footer_minmax(sf_dir: str, table: str, col: str) -> tuple[int, int]:
    """Column min/max from parquet footer row-group statistics — a
    metadata read, no data pass (the same trick as the Q13 zero-bucket
    row count)."""
    import pyarrow.parquet as pq

    f = pq.ParquetFile(f"{sf_dir}/{table}.parquet")
    idx = f.schema_arrow.get_field_index(col)
    los, his = [], []
    for rg in range(f.metadata.num_row_groups):
        st = f.metadata.row_group(rg).column(idx).statistics
        los.append(st.min)
        his.append(st.max)
    return min(los), max(his)


def _morton_spread_sql(col: str) -> str:
    """SQL expression spreading a 16-bit value's bits to even positions
    (same mask ladder as the numpy path in q_lineitem_zorder_export)."""
    v = col
    for shift, mask in ((8, 16711935), (4, 252645135),
                        (2, 858993459), (1, 1431655765)):
        v = f"(({v} | ({v} << {shift})) & {mask})"
    return v


ZORDER_SHARD_BITS = 4  # shared by the pipeline, its SQL oracle and tests


def q_lineitem_zorder_export(sf_dir: str,
                             shard_bits: int = ZORDER_SHARD_BITS) -> pd.DataFrame:
    """Z-ORDER (Morton) CLUSTERED EXPORT — multi-dimensional data
    clustering for range-scan locality (the Delta/Iceberg ``ZORDER BY``
    operator): interleave the bits of ``(l_partkey, l_suppkey)`` (16
    bits each) into a 32-bit z-value, shard on the z-prefix (top
    ``shard_bits`` bits → fixed z-ranges, disjoint by construction) and
    write one sealed parquet directory per shard with rows z-sorted
    inside — so a 2-D range predicate touches O(few) shards instead of
    all of them. Prefix shards can skew with the key distribution;
    balanced shards would reuse the ntile-shards recipe
    (q_orders_ntile_shards) over z instead.

    The z-value is computed per batch with the numpy mask-ladder bit
    spread (vectorized, no Python loop) and the returned per-shard
    aggregate is computed by READING THE SHARDS BACK — an oracle match
    proves the written clustering, not just the in-memory plan."""
    import hashlib
    import pathlib
    import shutil

    import ray.data as rd

    from kryptone_ray.pipelines.common import partial_sum_count_arrow
    from kryptone_ray.stages.sinks import write_partitioned_resumable

    def spread(v: np.ndarray) -> np.ndarray:
        v = (v | (v << 8)) & np.int64(0x00FF00FF)
        v = (v | (v << 4)) & np.int64(0x0F0F0F0F)
        v = (v | (v << 2)) & np.int64(0x33333333)
        v = (v | (v << 1)) & np.int64(0x55555555)
        return v

    # real ZORDER semantics: each dimension is range-normalized to the
    # full 16-bit domain first (otherwise small keys leave the z prefix
    # all-zero and every row lands in shard 0). Min/max come from the
    # parquet FOOTER statistics — no data pass; the SQL mirror computes
    # the same bounds with min()/max() subqueries.
    (pmin, pmax), (smin, smax) = (
        _footer_minmax(sf_dir, "lineitem", "l_partkey"),
        _footer_minmax(sf_dir, "lineitem", "l_suppkey"))

    def norm16(v: np.ndarray, lo: int, hi: int) -> np.ndarray:
        return (v - lo) * 65535 // max(hi - lo, 1)

    def prep(df: pd.DataFrame) -> pd.DataFrame:
        p = norm16(df["l_partkey"].to_numpy().astype(np.int64), pmin, pmax)
        s = norm16(df["l_suppkey"].to_numpy().astype(np.int64), smin, smax)
        z = spread(p) | (spread(s) << 1)
        cents = np.round(
            df["l_extendedprice"].to_numpy() * 100).astype(np.int64)
        # z first: the sink sorts each partition by column order, so
        # rows inside every shard file come out z-clustered
        return pd.DataFrame({"z": z,
                             "shard": (z >> (32 - shard_bits)).astype(np.int64),
                             "l_partkey": df["l_partkey"],
                             "l_suppkey": df["l_suppkey"],
                             "cents": cents})

    def build():
        return T(sf_dir, "lineitem",
                 columns=["l_partkey", "l_suppkey", "l_extendedprice"]) \
            .map_batches(prep, batch_format="pandas", batch_size=65536)

    tag = hashlib.sha1(sf_dir.encode()).hexdigest()[:10]
    out = pathlib.Path(f"/tmp/kr_zorder_{tag}")
    shutil.rmtree(out, ignore_errors=True)
    write_partitioned_resumable(build, out, "shard")

    back = rd.read_parquet(str(out))
    agg = partial_sum_count_arrow(
        back, keys=["shard"],
        sums={"sum_z": "z", "sum_cents": "cents"}, count_name="n_rows")
    agg["shard"] = agg["shard"].astype("int64")
    agg["total"] = agg.pop("sum_cents") / 100.0
    agg["sum_z"] = agg["sum_z"].astype("int64")
    return agg[["shard", "n_rows", "sum_z", "total"]] \
        .sort_values("shard").reset_index(drop=True)


_ZP = _morton_spread_sql("p16")
_ZS = _morton_spread_sql("s16")
Q_LINEITEM_ZORDER_SQL = f"""
WITH mm AS (SELECT min(l_partkey) AS pmin, max(l_partkey) AS pmax,
                   min(l_suppkey) AS smin, max(l_suppkey) AS smax
            FROM lineitem),
n16 AS (
  SELECT (l_partkey - pmin) * 65535 // GREATEST(pmax - pmin, 1) AS p16,
         (l_suppkey - smin) * 65535 // GREATEST(smax - smin, 1) AS s16,
         CAST(round(l_extendedprice * 100) AS BIGINT) AS cents
  FROM lineitem, mm),
z AS (
  SELECT ({_ZP} | ({_ZS} << 1)) AS z, cents FROM n16)
SELECT CAST(z >> {32 - ZORDER_SHARD_BITS} AS BIGINT) AS shard, count(*) AS n_rows,
       CAST(sum(z) AS BIGINT) AS sum_z, sum(cents) / 100.0 AS total
FROM z GROUP BY shard ORDER BY shard
"""


def q7_nation_pair_volume(sf_dir: str) -> pd.DataFrame:
    """TPC-H Q7 shape (volume shipping): revenue between every pair of
    DIFFERENT customer/supplier nations, per order year — the
    multi-join showcase: two fact-sized sides (orders resolving the
    customer nation + order year, lineitem resolving the supplier
    nation with per-batch revenue pre-aggregation) meet in one hash
    join on the order key; the cross-nation predicate and the
    (supp_nation, cust_nation, year) rollup are vectorized post-join,
    so at most |nations|²·|years| partial rows per block reach the
    combine. Dimension broadcasts are bounded exactly as in
    q5_nation_volume (BROADCAST_MAX_ROWS → native-join fallback)."""
    import ray

    nation = small(sf_dir, "nation", columns=["n_nationkey", "n_name"])
    nn_ref = ray.put(dict(zip(nation["n_nationkey"], nation["n_name"])))

    broadcast_dims = (parquet_rows(sf_dir, "customer")
                      <= BROADCAST_MAX_ROWS)

    if broadcast_dims:
        cust = small(sf_dir, "customer", columns=["c_custkey", "c_nationkey"])
        supp = small(sf_dir, "supplier", columns=["s_suppkey", "s_nationkey"])
        maps_ref = ray.put((
            dict(zip(cust["c_custkey"], cust["c_nationkey"])),
            dict(zip(supp["s_suppkey"], supp["s_nationkey"])),
        ))

        def order_side(df: pd.DataFrame) -> pd.DataFrame:
            cn, _ = ray.get(maps_ref)
            return pd.DataFrame(
                {"o_orderkey": df["o_orderkey"],
                 "c_nation": df["o_custkey"].map(cn).astype("int64"),
                 "l_year": df["o_orderdate"].dt.year.astype("int64")})

        orders_ds = T(sf_dir, "orders",
                      columns=["o_orderkey", "o_custkey", "o_orderdate"]) \
            .map_batches(order_side, batch_format="pandas", batch_size=65536)

        def line_side(df: pd.DataFrame) -> pd.DataFrame:
            _, sn = ray.get(maps_ref)
            cents = (df["l_extendedprice"] * 100).round().astype("int64")
            disc_bp = (df["l_discount"] * 100).round().astype("int64")
            part = pd.DataFrame(
                {"l_orderkey": df["l_orderkey"],
                 "s_nation": df["l_suppkey"].map(sn).astype("int64"),
                 "rev_e4": cents * (100 - disc_bp)})
            return part.groupby(["l_orderkey", "s_nation"], sort=False,
                                as_index=False)["rev_e4"].sum()

        line_ds = T(sf_dir, "lineitem",
                    columns=["l_orderkey", "l_suppkey", "l_extendedprice",
                             "l_discount"]) \
            .map_batches(line_side, batch_format="pandas", batch_size=65536)
    else:
        cust_ds = T(sf_dir, "customer", columns=["c_custkey", "c_nationkey"])
        orders_ds = T(sf_dir, "orders",
                      columns=["o_orderkey", "o_custkey", "o_orderdate"]) \
            .join(cust_ds, "inner",
                  num_partitions=join_partitions(parquet_rows(sf_dir, "orders")),
                  on=("o_custkey",), right_on=("c_custkey",)) \
            .map_batches(
                lambda df: pd.DataFrame(
                    {"o_orderkey": df["o_orderkey"],
                     "c_nation": df["c_nationkey"].astype("int64"),
                     "l_year": df["o_orderdate"].dt.year.astype("int64")}),
                batch_format="pandas", batch_size=65536)

        supp_ds = T(sf_dir, "supplier", columns=["s_suppkey", "s_nationkey"])
        nline = parquet_rows(sf_dir, "lineitem")
        line_ds = T(sf_dir, "lineitem",
                    columns=["l_orderkey", "l_suppkey", "l_extendedprice",
                             "l_discount"]) \
            .map_batches(
                lambda df: pd.DataFrame(
                    {"l_orderkey": df["l_orderkey"],
                     "l_suppkey": df["l_suppkey"],
                     "rev_e4": (df["l_extendedprice"] * 100).round()
                               .astype("int64")
                               * (100 - (df["l_discount"] * 100).round()
                                  .astype("int64"))}),
                batch_format="pandas", batch_size=65536) \
            .join(supp_ds, "inner", num_partitions=join_partitions(nline),
                  on=("l_suppkey",), right_on=("s_suppkey",)) \
            .map_batches(
                lambda df: pd.DataFrame(
                    {"l_orderkey": df["l_orderkey"],
                     "s_nation": df["s_nationkey"].astype("int64"),
                     "rev_e4": df["rev_e4"]})
                .groupby(["l_orderkey", "s_nation"], sort=False,
                         as_index=False)["rev_e4"].sum(),
                batch_format="pandas", batch_size=65536)

    def finish(df: pd.DataFrame) -> pd.DataFrame:
        nn = pd.Series(dict(zip(nation["n_nationkey"], nation["n_name"])))
        out = pd.DataFrame({
            "supp_nation": df["s_nation"].map(nn),
            "cust_nation": df["c_nation"].map(nn),
            "l_year": df["l_year"].astype("int64"),
            "revenue": df["rev_e4"] / 1e4})
        return out.sort_values(["supp_nation", "cust_nation", "l_year"]) \
            .reset_index(drop=True)

    if parquet_rows(sf_dir, "lineitem") < DISTRIBUTED_JOIN_MIN_ROWS:
        m = line_ds.to_pandas().merge(
            orders_ds.to_pandas(), left_on="l_orderkey",
            right_on="o_orderkey", how="inner")
        sub = m[m["c_nation"] != m["s_nation"]]
        agg = sub.groupby(["s_nation", "c_nation", "l_year"], sort=False,
                          as_index=False)["rev_e4"].sum()
        return finish(agg)

    npart = join_partitions(parquet_rows(sf_dir, "lineitem"))
    joined = line_ds.join(orders_ds, "inner", num_partitions=npart,
                          on=("l_orderkey",), right_on=("o_orderkey",))

    def pair_partial(df: pd.DataFrame) -> pd.DataFrame:
        sub = df[df["c_nation"] != df["s_nation"]]
        return sub.groupby(["s_nation", "c_nation", "l_year"], sort=False,
                           as_index=False)["rev_e4"].sum()

    parts = partial_sum_count(
        joined.map_batches(pair_partial, batch_format="pandas",
                           batch_size=65536),
        keys=["s_nation", "c_nation", "l_year"], sums={"rev_e4": "rev_e4"})
    return finish(parts)


Q7_SQL = """
SELECT sn.n_name AS supp_nation, cn.n_name AS cust_nation,
       CAST(year(o_orderdate) AS BIGINT) AS l_year,
       sum(CAST(round(l_extendedprice * 100) AS BIGINT)
           * (100 - CAST(round(l_discount * 100) AS BIGINT))) / 1e4
           AS revenue
FROM lineitem
JOIN orders   ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN supplier ON l_suppkey = s_suppkey
JOIN nation cn ON c_nationkey = cn.n_nationkey
JOIN nation sn ON s_nationkey = sn.n_nationkey
WHERE c_nationkey <> s_nationkey
GROUP BY supp_nation, cust_nation, l_year
ORDER BY supp_nation, cust_nation, l_year
"""


def q_orders_cube(sf_dir: str) -> pd.DataFrame:
    """GROUP BY CUBE(status, priority): all four grouping sets —
    (status, priority), (status), (priority), () — from ONE scan. Same
    scale shape as q_orders_rollup: the fact table reduces per batch to
    the finest level only (bounded by the 3×5 key domain), and every
    coarser level is a driver-side re-aggregation of that tiny partial;
    sentinel 'ALL' encodes rolled-up keys so the hash compare never
    sees NULL grouping columns."""
    from kryptone_ray.pipelines.common import partial_sum_count_arrow

    def prep(t):
        import pyarrow as pa
        import pyarrow.compute as pc

        cents = pc.cast(pc.round(pc.multiply(t["o_totalprice"], 100)),
                        pa.int64())
        return pa.table([t["o_orderstatus"], t["o_orderpriority"], cents],
                        names=["st", "pri", "cents"])

    ds = T(sf_dir, "orders",
           columns=["o_orderstatus", "o_orderpriority", "o_totalprice"]) \
        .map_batches(prep, batch_format="pyarrow", batch_size=65536)
    fine = partial_sum_count_arrow(ds, keys=["st", "pri"],
                                   sums={"cents": "cents"}, count_name="n")

    by_st = fine.groupby("st", as_index=False)[["cents", "n"]].sum()
    by_st["pri"] = "ALL"
    by_pri = fine.groupby("pri", as_index=False)[["cents", "n"]].sum()
    by_pri["st"] = "ALL"
    total = pd.DataFrame({"st": ["ALL"], "pri": ["ALL"],
                          "cents": [fine["cents"].sum()],
                          "n": [fine["n"].sum()]})
    out = pd.concat([fine, by_st, by_pri, total], ignore_index=True)
    out["total_price"] = out.pop("cents") / 100.0
    out["n"] = out["n"].astype("int64")
    out = out.rename(columns={"st": "o_orderstatus",
                              "pri": "o_orderpriority"})
    out = out[["o_orderstatus", "o_orderpriority", "total_price", "n"]]
    return out.sort_values(["o_orderstatus", "o_orderpriority"]) \
        .reset_index(drop=True)


Q_ORDERS_CUBE_SQL = """
WITH o AS (SELECT o_orderstatus AS st, o_orderpriority AS pri,
                  CAST(round(o_totalprice * 100) AS BIGINT) AS cents
           FROM orders)
SELECT COALESCE(st, 'ALL') AS o_orderstatus,
       COALESCE(pri, 'ALL') AS o_orderpriority,
       sum(cents) / 100.0 AS total_price, count(*) AS n
FROM o GROUP BY CUBE(st, pri)
ORDER BY o_orderstatus, o_orderpriority
"""


def q_orders_scd2_census(sf_dir: str) -> pd.DataFrame:
    """SCD TYPE-2 HISTORY BUILD over the same deterministic CDC
    change-set as q_orders_cdc_merge: instead of keeping only the
    winner, EVERY non-tombstone version becomes a history row with a
    validity span (valid_to = the next version, open if none), and
    ``is_current`` marks rows whose span is open and not closed by a
    tombstone. Output: the (status, is_current) census of the history
    table — counting superseded rows separately from current ones.

    Same partitioning contract as the LWW merge: all versions of a key
    land in one hash partition, the per-block pass is one stable sort +
    shift comparison (vectorized, no per-key loop), and only census
    partials reach the driver."""

    def scd2_census(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(["o_orderkey", "version"],
                            kind="stable").reset_index(drop=True)
        key = df["o_orderkey"].to_numpy()
        # a row is current iff nothing follows it for its key (a later
        # update OR a tombstone both close the span) and it is not
        # itself a tombstone
        has_next = np.r_[key[:-1] == key[1:], False]
        is_current = ~df["deleted"].to_numpy() & ~has_next
        live = ~df["deleted"].to_numpy()
        out = pd.DataFrame({"o_orderstatus": df["o_orderstatus"],
                            "is_current": is_current,
                            "cents": df["cents"]})[live]
        g = out.groupby(["o_orderstatus", "is_current"], sort=False)
        return pd.DataFrame({"n": g.size(),
                             "cents": g["cents"].sum()}).reset_index()

    def build():
        return T(sf_dir, "orders",
                 columns=["o_orderkey", "o_orderstatus", "o_totalprice"]) \
            .map_batches(_orders_with_changes, batch_format="pyarrow",
                         batch_size=65536)

    n_rows = parquet_rows(sf_dir, "orders")
    if n_rows < DISTRIBUTED_JOIN_MIN_ROWS:
        parts = scd2_census(build().to_pandas())
    else:
        from kryptone_ray.pipelines.common import hash_shuffle

        with hash_shuffle():
            parts = build().repartition(
                num_blocks=join_partitions(n_rows), keys=["o_orderkey"]) \
                .map_batches(scd2_census, batch_format="pandas",
                             batch_size=None).to_pandas()
    g = parts.groupby(["o_orderstatus", "is_current"], sort=False)
    out = pd.DataFrame({"n": g["n"].sum().astype("int64"),
                        "total": g["cents"].sum() / 100.0}).reset_index()
    return out.sort_values(["o_orderstatus", "is_current"]) \
        .reset_index(drop=True)


Q_ORDERS_SCD2_SQL = """
WITH base AS (
  SELECT o_orderkey, o_orderstatus,
         CAST(round(o_totalprice * 100) AS BIGINT) AS cents,
         0 AS version, FALSE AS deleted
  FROM orders),
chg AS (
  SELECT o_orderkey, 'U' AS o_orderstatus, cents + 1000 AS cents,
         1 AS version, FALSE AS deleted
  FROM base WHERE o_orderkey % 7 = 0
  UNION ALL
  SELECT o_orderkey, o_orderstatus, cents, 2 AS version, TRUE AS deleted
  FROM base WHERE o_orderkey % 97 = 0),
h AS (
  SELECT *, lead(version) OVER (PARTITION BY o_orderkey
                                ORDER BY version) AS next_v
  FROM (SELECT * FROM base UNION ALL SELECT * FROM chg))
SELECT o_orderstatus, (next_v IS NULL AND NOT deleted) AS is_current,
       count(*) AS n, sum(cents) / 100.0 AS total
FROM h WHERE NOT deleted
GROUP BY o_orderstatus, is_current ORDER BY o_orderstatus, is_current
"""


def q_orders_lineitem_mergejoin(sf_dir: str) -> pd.DataFrame:
    """SORT-MERGE JOIN with RANGE CO-PARTITIONING — the physical
    alternative to the hash join the other queries use: both fact
    tables assign each row a key-range id computed from the SHARED
    footer min/max of the join key (a metadata read), the two sides
    co-partition on that id in ONE shuffle each, and every block
    resolves its range with a sorted-array merge (searchsorted against
    the unique order keys) instead of a hash table. This is the plan a
    100-TB engine picks when both inputs are already key-clustered on
    disk (TPC-H lineitem/orders are) — the block-local sort is then a
    no-op and the join never builds hash state. Skew contract: ranges
    are equal-width in key space; a skewed key distribution would use
    the ntile-shards histogram offsets instead (same recipe, already
    built)."""
    import ray

    (olo, ohi) = _footer_minmax(sf_dir, "orders", "o_orderkey")
    (llo, lhi) = _footer_minmax(sf_dir, "lineitem", "l_orderkey")
    lo, hi = min(olo, llo), max(ohi, lhi)
    n_orders = parquet_rows(sf_dir, "orders")
    nparts = join_partitions(parquet_rows(sf_dir, "lineitem"))
    span = max(hi - lo + 1, 1)

    def o_side(df: pd.DataFrame) -> pd.DataFrame:
        k = df["o_orderkey"].to_numpy().astype(np.int64)
        return pd.DataFrame({
            "rid": ((k - lo) * nparts // span).astype(np.int64),
            "key": k, "side": np.zeros(len(k), dtype=np.int8),
            "status": df["o_orderstatus"],
            "cents": np.zeros(len(k), dtype=np.int64)})

    def l_side(df: pd.DataFrame) -> pd.DataFrame:
        k = df["l_orderkey"].to_numpy().astype(np.int64)
        return pd.DataFrame({
            "rid": ((k - lo) * nparts // span).astype(np.int64),
            "key": k, "side": np.ones(len(k), dtype=np.int8),
            "status": np.full(len(k), "", dtype=object),
            "cents": np.round(df["l_extendedprice"].to_numpy()
                              * 100).astype(np.int64)})

    def merge_block(df: pd.DataFrame) -> pd.DataFrame:
        o = df[df["side"] == 0]
        l = df[df["side"] == 1]
        if o.empty or l.empty:
            return pd.DataFrame({"o_orderstatus": pd.Series([], dtype=str),
                                 "n_lines": pd.Series([], dtype="int64"),
                                 "cents": pd.Series([], dtype="int64")})
        ok = o["key"].to_numpy()
        order = np.argsort(ok, kind="stable")
        ok = ok[order]
        ost = o["status"].to_numpy()[order]
        lk = l["key"].to_numpy()
        pos = np.searchsorted(ok, lk)
        hit = (pos < len(ok))
        pos = np.minimum(pos, len(ok) - 1)
        hit &= ok[pos] == lk
        res = pd.DataFrame({"o_orderstatus": ost[pos[hit]],
                            "cents": l["cents"].to_numpy()[hit]})
        g = res.groupby("o_orderstatus", sort=False)
        return pd.DataFrame({"n_lines": g.size().astype("int64"),
                             "cents": g["cents"].sum()}).reset_index()

    def build_union():
        o = T(sf_dir, "orders", columns=["o_orderkey", "o_orderstatus"]) \
            .map_batches(o_side, batch_format="pandas", batch_size=65536)
        l = T(sf_dir, "lineitem",
              columns=["l_orderkey", "l_extendedprice"]) \
            .map_batches(l_side, batch_format="pandas", batch_size=65536)
        return o.union(l)

    if parquet_rows(sf_dir, "lineitem") < DISTRIBUTED_JOIN_MIN_ROWS:
        parts = merge_block(build_union().to_pandas())
    else:
        from kryptone_ray.pipelines.common import hash_shuffle

        with hash_shuffle():
            parts = build_union().repartition(
                num_blocks=nparts, keys=["rid"]) \
                .map_batches(merge_block, batch_format="pandas",
                             batch_size=None).to_pandas()
    g = parts.groupby("o_orderstatus", sort=False)
    out = pd.DataFrame({"n_lines": g["n_lines"].sum().astype("int64"),
                        "revenue": g["cents"].sum() / 100.0}).reset_index()
    return out.sort_values("o_orderstatus").reset_index(drop=True)


Q_ORDERS_LINEITEM_MERGEJOIN_SQL = """
SELECT o_orderstatus, count(*) AS n_lines,
       sum(CAST(round(l_extendedprice * 100) AS BIGINT)) / 100.0 AS revenue
FROM lineitem JOIN orders ON l_orderkey = o_orderkey
GROUP BY o_orderstatus ORDER BY o_orderstatus
"""


def q_brand_basket_pairs(sf_dir: str,
                         k: int = BRAND_BASKET_K) -> pd.DataFrame:
    """MARKET-BASKET CO-OCCURRENCE (frequent-itemset pairs): the top-k
    pairs of part brands bought together in the same order. Per-order
    pair expansion is bounded by (lines/order)² — a TPC-H constant, so
    the expansion never outgrows its block; brand resolution is a tiny
    broadcast (|brands| = 25, FIXED size, not a growing dimension);
    pair counts collapse per batch before one domain-bounded (≤ 25²/2
    keys) combine. Deterministic top-k tie-break (count desc, brands
    asc)."""
    import ray

    from kryptone_ray.pipelines.common import partial_sum_count

    part = small(sf_dir, "part", columns=["p_partkey", "p_brand"])
    brand_ref = ray.put(dict(zip(part["p_partkey"], part["p_brand"])))

    def pairs(df: pd.DataFrame) -> pd.DataFrame:
        bm = ray.get(brand_ref)
        d = pd.DataFrame({"o": df["l_orderkey"],
                          "b": df["l_partkey"].map(bm)})
        d = d.drop_duplicates()
        m = d.merge(d, on="o")
        m = m[m["b_x"] < m["b_y"]]
        g = m.groupby(["b_x", "b_y"], sort=False).size()
        return g.rename("n").reset_index() \
            .rename(columns={"b_x": "brand_a", "b_y": "brand_b"})

    # NOTE on the pairs() self-merge: it runs per BATCH, so an order's
    # lines must be co-located. Below the gate the whole (2-column)
    # projection combines on the driver — trivially co-located; above
    # it the general path hash-partitions by order key first, the same
    # contract as every per-key window here.
    n_rows = parquet_rows(sf_dir, "lineitem")
    if n_rows < DISTRIBUTED_JOIN_MIN_ROWS:
        df = T(sf_dir, "lineitem",
               columns=["l_orderkey", "l_partkey"]).to_pandas()
        out = pairs(df).groupby(["brand_a", "brand_b"],
                                as_index=False)["n"].sum()
    else:
        from kryptone_ray.pipelines.common import hash_shuffle

        with hash_shuffle():
            ds = T(sf_dir, "lineitem",
                   columns=["l_orderkey", "l_partkey"]) \
                .repartition(num_blocks=join_partitions(n_rows),
                             keys=["l_orderkey"]) \
                .map_batches(pairs, batch_format="pandas", batch_size=None)
            out = partial_sum_count(ds, keys=["brand_a", "brand_b"],
                                    sums={"n": "n"})
    out["n"] = out["n"].astype("int64")
    out = out.sort_values(["n", "brand_a", "brand_b"],
                          ascending=[False, True, True]).head(k)
    return out[["brand_a", "brand_b", "n"]].reset_index(drop=True)


Q_BRAND_BASKET_SQL = f"""
WITH d AS (SELECT DISTINCT l_orderkey AS o, p_brand AS b
           FROM lineitem JOIN part ON l_partkey = p_partkey)
SELECT a.b AS brand_a, b.b AS brand_b, count(*) AS n
FROM d a JOIN d b ON a.o = b.o AND a.b < b.b
GROUP BY brand_a, brand_b
ORDER BY n DESC, brand_a, brand_b LIMIT {BRAND_BASKET_K}
"""


def q_customer_dense_rank_top(sf_dir: str,
                              k: int = DENSE_RANK_K) -> pd.DataFrame:
    """DENSE_RANK window + top-k WITH TIES (``dense_rank() OVER
    (PARTITION BY segment ORDER BY acctbal DESC) <= k`` — the
    "top-3 balances per segment, ties all qualify" query): computed
    with NO sort and NO shuffle by the same bounded-cents-domain
    histogram trick as q_customer_percent_rank — dense rank descending
    = 1 + count of DISTINCT values above, read off a reversed cumsum of
    the merged per-segment histograms; a map-only second pass emits the
    qualifying rows. Output size is bounded by k × ties, not the table."""
    import ray

    OFF = 100_000
    DOM = 1_100_000

    def cents(t):
        import pyarrow as pa
        import pyarrow.compute as pc

        c = pc.add(pc.cast(pc.round(pc.multiply(t["c_acctbal"], 100)),
                           pa.int64()), OFF)
        return pa.table([t["c_custkey"], t["c_mktsegment"], c],
                        names=["c_custkey", "c_mktsegment", "cents"])

    def build():
        return T(sf_dir, "customer",
                 columns=["c_custkey", "c_mktsegment", "c_acctbal"]) \
            .map_batches(cents, batch_format="pyarrow", batch_size=65536)

    def hist_partial(df: pd.DataFrame) -> pd.DataFrame:
        out = []
        for seg, sub in df.groupby("c_mktsegment", sort=False):
            h = np.bincount(sub["cents"].to_numpy(), minlength=DOM)
            nz = np.flatnonzero(h)
            out.append(pd.DataFrame({"seg": seg, "v": nz, "n": h[nz]}))
        return pd.concat(out, ignore_index=True)

    parts = build().map_batches(hist_partial, batch_format="pandas",
                                batch_size=65536).to_pandas()
    # per segment: dense rank (desc) of value v = 1 + #distinct values > v;
    # the k-th distinct value from the top is the qualify threshold
    thresholds = {}
    for seg, sub in parts.groupby("seg", sort=False):
        present = np.zeros(DOM, dtype=bool)
        present[np.unique(sub["v"].to_numpy())] = True
        vals = np.flatnonzero(present)
        thresholds[seg] = int(vals[max(0, len(vals) - k)])
    ref = ray.put(thresholds)

    def qualify(df: pd.DataFrame) -> pd.DataFrame:
        th = ray.get(ref)
        keep = df["cents"].to_numpy() >= \
            df["c_mktsegment"].map(th).to_numpy()
        return df[keep]

    out = build().map_batches(qualify, batch_format="pandas",
                              batch_size=65536).to_pandas()
    # dense rank assignment for the qualifying rows (tiny): rank among
    # the distinct qualifying values per segment, descending
    rows = []
    for seg, sub in out.groupby("c_mktsegment", sort=False):
        vals = np.sort(sub["cents"].unique())[::-1]
        rank_of = {int(v): i + 1 for i, v in enumerate(vals)}
        rows.append(pd.DataFrame({
            "c_custkey": sub["c_custkey"],
            "c_mktsegment": seg,
            "c_acctbal": (sub["cents"] - 100_000) / 100.0,
            "rnk": sub["cents"].map(rank_of).astype("int64")}))
    res = pd.concat(rows, ignore_index=True)
    return res.sort_values(["c_mktsegment", "rnk", "c_custkey"]) \
        .reset_index(drop=True)


Q_CUSTOMER_DENSE_RANK_SQL = f"""
SELECT c_custkey, c_mktsegment, c_acctbal, rnk
FROM (SELECT c_custkey, c_mktsegment, c_acctbal,
             CAST(dense_rank() OVER (PARTITION BY c_mktsegment
                                     ORDER BY c_acctbal DESC) AS BIGINT)
                 AS rnk
      FROM customer)
WHERE rnk <= {DENSE_RANK_K}
ORDER BY c_mktsegment, rnk, c_custkey
"""
