"""Link-graph analytics over the crawl corpus — the batch-side twin of
the engine's frontier expansion (`stages/expand.py` builds exactly these
edges live; reference parity: `collect_page_urls`'s lineage,
`base.py:601-650`).

PageRank here is EXACT fixed-point integer arithmetic, not floats:
``r'(v) = base + Σ_{u→v} (r(u)·85) // (100·deg(u))`` with
SCALE = 10^12. Integer floor-division contributions make the sum
order-independent (float PageRank can never hash-match across engines;
this formulation is bit-identical in numpy, Python and DuckDB), so an
ITERATIVE graph algorithm gets a full SQL oracle — the iterations
unroll into chained CTEs.

Scale shape: the rank/degree vectors are bounded by the node count and
broadcast (``ray.put``) per iteration while edges stream through
``map_batches`` emitting per-batch (dst, contrib) partials; at
web-scale node counts the same update runs as a hash-join of the edge
table against a rank Dataset co-partitioned by src (the
q_customer_order_stats join shape) — documented, gated by corpus size
like every other small-input gate.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data as rd

from kryptone_ray.corpus.synth import CorpusSpec, row_index_of

_G_ROWS = 300
_G_SEED = 1234
SCALE = 10**12
DAMP_NUM, DAMP_DEN = 85, 100
N_ITER = 3

# Above this node count the rank/degree vectors no longer broadcast
# (2M nodes ≈ 32 MB of int64 vectors — the documented ray.put comfort
# ceiling used by the relational BROADCAST_MAX_ROWS gate); the update
# becomes the join-shaped distributed iteration below. Tests force the
# distributed path by patching this to -1.
PAGERANK_BROADCAST_MAX_NODES = 2_000_000


def _edges_dir() -> str:
    """Deterministic (src, dst) edge snapshot extracted from the corpus
    out-link function: strip fragments, resolve each link back to a
    corpus row, keep exact canonical matches, drop self-loops, dedupe.
    Parquet so DuckDB reads the same graph."""
    import pathlib
    import tempfile

    import pyarrow.parquet as pq

    spec = CorpusSpec(n_rows=_G_ROWS, n_hosts=8, seed=_G_SEED)
    base = pathlib.Path(tempfile.gettempdir()) / \
        f"kr_graph_{_G_SEED}_{_G_ROWS}"
    marker = base / "_SUCCESS"
    if not marker.exists():
        base.mkdir(parents=True, exist_ok=True)
        edges = set()
        for i in range(_G_ROWS):
            for link in spec.outlinks(i):
                u = link.split("#", 1)[0]
                j = row_index_of(u)
                if j is None or not (0 <= j < _G_ROWS):
                    continue
                if spec.url_of(j) != u or j == i:
                    continue
                edges.add((i, j))
        src, dst = zip(*sorted(edges))
        pq.write_table(
            pa.table({"src": pa.array(src, type=pa.int64()),
                      "dst": pa.array(dst, type=pa.int64())}),
            base / "edges.parquet")
        marker.touch()
    return str(base)


def q_graph_degree_stats(sf_dir: str) -> pd.DataFrame:
    """Degree census of the link graph: per out-degree bucket, how many
    nodes (isolated nodes — no out-edges — counted from the known node
    domain, the Q13 zero-bucket trick). Per-batch Arrow partials."""
    import pyarrow.compute as pc

    def partial(t: pa.Table) -> pa.Table:
        g = t.group_by(["src"], use_threads=False) \
            .aggregate([("dst", "count")])
        return pa.table({"src": g["src"],
                         "d": pc.cast(g["dst_count"], pa.int64())})

    df = rd.read_parquet(_edges_dir()) \
        .map_batches(partial, batch_format="pyarrow", batch_size=65536) \
        .to_pandas()
    per_src = df.groupby("src", sort=False)["d"].sum()
    hist = per_src.value_counts()
    out = pd.DataFrame({"out_degree": hist.index.astype("int64"),
                        "n_nodes": hist.to_numpy().astype("int64")})
    zero = _G_ROWS - len(per_src)
    if zero > 0:
        out = pd.concat([out, pd.DataFrame(
            {"out_degree": [0], "n_nodes": [zero]})], ignore_index=True)
    return out.sort_values("out_degree").reset_index(drop=True)


def graph_degree_stats_oracle_sql() -> str:
    snap = _edges_dir()
    return f"""
WITH deg AS (SELECT src, count(*) AS d
             FROM read_parquet('{snap}/edges.parquet') GROUP BY src),
     nodes AS (SELECT range AS v FROM range({_G_ROWS}))
SELECT out_degree, count(*) AS n_nodes FROM (
    SELECT COALESCE(deg.d, 0) AS out_degree
    FROM nodes LEFT JOIN deg ON deg.src = nodes.v
) GROUP BY out_degree ORDER BY out_degree
"""


def _pagerank_distributed(snap: str, n: int) -> pd.DataFrame:
    """Join-shaped PageRank for node counts past the broadcast gate:
    the rank vector lives as a Dataset co-joined with the out-degree
    table, each iteration is edges ⋈ rank-state (hash join on src) →
    per-block (dst, contrib) partials → hash-partition combine by dst —
    the q_customer_order_stats shape. Only per-node state shuffles;
    edges re-stream from parquet each iteration (at 100 TB the edge
    table is the thing that must never materialize). Rank datasets are
    materialized per iteration to cut lineage — bounded by node count,
    never by edge count."""
    from kryptone_ray.pipelines.common import (hash_shuffle,
                                               join_partitions,
                                               parquet_rows_path)

    base_term = (SCALE * (DAMP_DEN - DAMP_NUM)) // (DAMP_DEN * n)
    init = SCALE // n
    npart = join_partitions(parquet_rows_path(f"{snap}/edges.parquet"))

    def deg_partial(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        g = t.group_by(["src"], use_threads=False) \
            .aggregate([("dst", "count")])
        return pa.table({"pr_v": g["src"],
                         "d": pc.cast(g["dst_count"], pa.int64())})

    def combine_deg(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby("pr_v", sort=False, as_index=False)["d"].sum()
        return g.assign(r=np.int64(init))

    with hash_shuffle():
        # state: (pr_v, d, r) for every node with out-edges
        state = rd.read_parquet(snap) \
            .map_batches(deg_partial, batch_format="pyarrow",
                         batch_size=65536) \
            .repartition(num_blocks=npart, keys=["pr_v"]) \
            .map_batches(combine_deg, batch_format="pandas",
                         batch_size=None).materialize()

    def contrib_block(df: pd.DataFrame) -> pd.DataFrame:
        c = (df["r"].to_numpy() * DAMP_NUM) \
            // (DAMP_DEN * df["d"].to_numpy())
        g = pd.DataFrame({"dst": df["dst"], "c": c}) \
            .groupby("dst", sort=False)["c"].sum()
        return pd.DataFrame({"dst": g.index.to_numpy(),
                             "c": g.to_numpy()})

    def zero_seed(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        ids = pc.cast(t["id"], pa.int64())
        return pa.table({"dst": ids,
                         "c": pa.array(np.zeros(len(ids), np.int64))})

    def new_rank(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby("dst", sort=False)["c"].sum()
        return pd.DataFrame({"pr_v": g.index.to_numpy(),
                             "r": base_term + g.to_numpy()})

    ranks = None
    for it in range(N_ITER):
        with hash_shuffle():
            # zero seed: every node in the domain gets a row, so nodes
            # with no in-links (or no links at all) survive the combine
            # with rank = base_term — no outer join needed.
            zeros = rd.range(n).map_batches(
                zero_seed, batch_format="pyarrow", batch_size=65536)
            parts = rd.read_parquet(snap) \
                .join(state, "inner", num_partitions=npart,
                      on=("src",), right_on=("pr_v",)) \
                .map_batches(contrib_block, batch_format="pandas",
                             batch_size=None)
            ranks = parts.union(zeros) \
                .repartition(num_blocks=npart, keys=["dst"]) \
                .map_batches(new_rank, batch_format="pandas",
                             batch_size=None).materialize()
        if it < N_ITER - 1:
            deg_side = state.map_batches(
                lambda df: df[["pr_v", "d"]].rename(
                    columns={"pr_v": "deg_v"}),
                batch_format="pandas", batch_size=None)
            state = ranks.join(deg_side, "inner",
                               num_partitions=npart,
                               on=("pr_v",), right_on=("deg_v",)) \
                .map_batches(lambda df: df[["pr_v", "d", "r"]],
                             batch_format="pandas",
                             batch_size=None).materialize()

    out = ranks.to_pandas().rename(columns={"pr_v": "node",
                                            "r": "rank_fp"})
    out["node"] = out["node"].astype("int64")
    out["rank_fp"] = out["rank_fp"].astype("int64")
    return out.sort_values("node").reset_index(drop=True)


def q_graph_pagerank(sf_dir: str) -> pd.DataFrame:
    """Fixed-point PageRank, {N_ITER} exact integer iterations (see
    module docstring). Returns every node's final rank numerator — at
    SCALE=10^12 the conventional float rank is rank_fp / SCALE."""
    import ray

    snap = _edges_dir()
    if _G_ROWS > PAGERANK_BROADCAST_MAX_NODES:
        return _pagerank_distributed(snap, _G_ROWS)

    base_term = (SCALE * (DAMP_DEN - DAMP_NUM)) // (DAMP_DEN * _G_ROWS)

    def deg_partial(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        g = t.group_by(["src"], use_threads=False) \
            .aggregate([("dst", "count")])
        return pa.table({"src": g["src"],
                         "d": pc.cast(g["dst_count"], pa.int64())})

    ddf = rd.read_parquet(snap) \
        .map_batches(deg_partial, batch_format="pyarrow",
                     batch_size=65536).to_pandas()
    deg = np.zeros(_G_ROWS, dtype=np.int64)
    dsum = ddf.groupby("src", sort=False)["d"].sum()
    deg[dsum.index.to_numpy()] = dsum.to_numpy()

    r = np.full(_G_ROWS, SCALE // _G_ROWS, dtype=np.int64)
    for _ in range(N_ITER):
        ref = ray.put((r, deg))

        def contrib(df: pd.DataFrame) -> pd.DataFrame:
            rv, dv = ray.get(ref)
            src = df["src"].to_numpy()
            c = (rv[src] * DAMP_NUM) // (DAMP_DEN * dv[src])
            g = pd.DataFrame({"dst": df["dst"], "c": c}) \
                .groupby("dst", sort=False)["c"].sum()
            return pd.DataFrame({"dst": g.index, "c": g.to_numpy()})

        parts = rd.read_parquet(snap) \
            .map_batches(contrib, batch_format="pandas",
                         batch_size=65536).to_pandas()
        total = parts.groupby("dst", sort=False)["c"].sum()
        nxt = np.full(_G_ROWS, base_term, dtype=np.int64)
        nxt[total.index.to_numpy()] += total.to_numpy()
        r = nxt

    return pd.DataFrame({"node": np.arange(_G_ROWS, dtype=np.int64),
                         "rank_fp": r})


def _cc_broadcast(snap: str, n: int) -> pd.DataFrame:
    """Min-label propagation with the label vector broadcast per
    iteration (small-input shape). Labels only ever decrease, so two
    consecutive equal label-sums ⟺ fixed point — the convergence
    check is one int comparison on the driver, no dataset diff."""
    import ray

    labels = np.arange(n, dtype=np.int64)
    while True:
        ref = ray.put(labels)

        def push_min(df: pd.DataFrame) -> pd.DataFrame:
            lv = ray.get(ref)
            src = df["src"].to_numpy()
            dst = df["dst"].to_numpy()
            node = np.concatenate([dst, src])
            lab = np.concatenate([lv[src], lv[dst]])
            g = pd.DataFrame({"node": node, "lab": lab}) \
                .groupby("node", sort=False)["lab"].min()
            return pd.DataFrame({"node": g.index.to_numpy(),
                                 "lab": g.to_numpy()})

        parts = rd.read_parquet(snap) \
            .map_batches(push_min, batch_format="pandas",
                         batch_size=65536).to_pandas()
        mins = parts.groupby("node", sort=False)["lab"].min()
        nxt = labels.copy()
        np.minimum.at(nxt, mins.index.to_numpy(), mins.to_numpy())
        if np.array_equal(nxt, labels):
            break
        labels = nxt
    return pd.DataFrame({"node": np.arange(n, dtype=np.int64),
                         "component": labels})


def _cc_distributed(snap: str, n: int) -> pd.DataFrame:
    """Join-shaped min-label propagation past the broadcast gate: each
    iteration hash-joins the streamed edge table against the label
    Dataset twice (once per direction), unions the self-labels, and
    takes per-node minima in a hash-partition combine. Convergence =
    unchanged label sum (labels are monotone non-increasing), computed
    from per-block partial sums — a tiny driver-side reduce, never a
    dataset diff."""
    from kryptone_ray.pipelines.common import (hash_shuffle,
                                               join_partitions,
                                               parquet_rows_path)

    npart = join_partitions(parquet_rows_path(f"{snap}/edges.parquet"))

    def init_labels(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        ids = pc.cast(t["id"], pa.int64())
        return pa.table({"pr_v": ids, "lab": ids})

    labels = rd.range(n).map_batches(init_labels, batch_format="pyarrow",
                                     batch_size=65536).materialize()
    prev_sum = (n - 1) * n // 2

    def fwd(df: pd.DataFrame) -> pd.DataFrame:
        g = pd.DataFrame({"node": df["dst"], "lab": df["lab"]}) \
            .groupby("node", sort=False)["lab"].min()
        return pd.DataFrame({"node": g.index.to_numpy(),
                             "lab": g.to_numpy()})

    def bwd(df: pd.DataFrame) -> pd.DataFrame:
        g = pd.DataFrame({"node": df["src"], "lab": df["lab"]}) \
            .groupby("node", sort=False)["lab"].min()
        return pd.DataFrame({"node": g.index.to_numpy(),
                             "lab": g.to_numpy()})

    def self_rows(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({"node": df["pr_v"], "lab": df["lab"]})

    def combine_min(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby("node", sort=False)["lab"].min()
        return pd.DataFrame({"pr_v": g.index.to_numpy(),
                             "lab": g.to_numpy()})

    while True:
        with hash_shuffle():
            lab_dst = labels.map_batches(
                lambda df: df.rename(columns={"pr_v": "lab_v"}),
                batch_format="pandas", batch_size=None)
            f = rd.read_parquet(snap) \
                .join(labels, "inner", num_partitions=npart,
                      on=("src",), right_on=("pr_v",)) \
                .map_batches(fwd, batch_format="pandas", batch_size=None)
            b = rd.read_parquet(snap) \
                .join(lab_dst, "inner", num_partitions=npart,
                      on=("dst",), right_on=("lab_v",)) \
                .map_batches(bwd, batch_format="pandas", batch_size=None)
            s = labels.map_batches(self_rows, batch_format="pandas",
                                   batch_size=None)
            labels = f.union(b).union(s) \
                .repartition(num_blocks=npart, keys=["node"]) \
                .map_batches(combine_min, batch_format="pandas",
                             batch_size=None).materialize()
        sums = labels.map_batches(
            lambda df: pd.DataFrame({"s": [int(df["lab"].sum())]}),
            batch_format="pandas", batch_size=None).to_pandas()
        cur_sum = int(sums["s"].sum())
        if cur_sum == prev_sum:
            break
        prev_sum = cur_sum

    out = labels.to_pandas().rename(columns={"pr_v": "node",
                                             "lab": "component"})
    out["node"] = out["node"].astype("int64")
    out["component"] = out["component"].astype("int64")
    return out.sort_values("node").reset_index(drop=True)


def q_graph_components(sf_dir: str) -> pd.DataFrame:
    """Connected components of the (undirected) link graph by min-label
    propagation run to FIXED POINT — convergence detected, not a fixed
    iteration count. component = smallest node id in the component, so
    the result is deterministic and order-independent. Oracle: DuckDB
    recursive-CTE transitive closure (exact at fixture scale)."""
    snap = _edges_dir()
    if _G_ROWS > PAGERANK_BROADCAST_MAX_NODES:
        return _cc_distributed(snap, _G_ROWS)
    return _cc_broadcast(snap, _G_ROWS)


def graph_components_oracle_sql() -> str:
    snap = _edges_dir()
    return f"""
WITH RECURSIVE
  sym AS (SELECT src, dst FROM read_parquet('{snap}/edges.parquet')
          UNION
          SELECT dst, src FROM read_parquet('{snap}/edges.parquet')),
  nodes AS (SELECT range AS v FROM range({_G_ROWS})),
  reach(a, b) AS (
    SELECT v, v FROM nodes
    UNION
    SELECT r.a, s.dst FROM reach r JOIN sym s ON s.src = r.b)
SELECT a AS node, min(b) AS component FROM reach
GROUP BY a ORDER BY node
"""


def graph_pagerank_oracle_sql() -> str:
    snap = _edges_dir()
    base_term = (SCALE * (DAMP_DEN - DAMP_NUM)) // (DAMP_DEN * _G_ROWS)
    init = SCALE // _G_ROWS
    sql = f"""
WITH edges AS (SELECT src, dst FROM read_parquet('{snap}/edges.parquet')),
     deg AS (SELECT src, count(*) AS d FROM edges GROUP BY src),
     nodes AS (SELECT range AS v FROM range({_G_ROWS})),
     r0 AS (SELECT v, CAST({init} AS BIGINT) AS r FROM nodes)"""
    prev = "r0"
    for k in range(1, N_ITER + 1):
        sql += f""",
     r{k} AS (
        SELECT n.v, {base_term} + COALESCE(s.contrib, 0) AS r
        FROM nodes n LEFT JOIN (
            SELECT e.dst AS v,
                   CAST(sum(({prev}.r * {DAMP_NUM})
                            // ({DAMP_DEN} * deg.d)) AS BIGINT) AS contrib
            FROM edges e
            JOIN {prev} ON {prev}.v = e.src
            JOIN deg ON deg.src = e.src
            GROUP BY e.dst) s ON s.v = n.v)"""
        prev = f"r{k}"
    sql += f"""
SELECT v AS node, r AS rank_fp FROM {prev} ORDER BY node
"""
    return sql


def q_graph_triangles(sf_dir: str) -> pd.DataFrame:
    """Per-node triangle participation counts over the undirected link
    graph — the classic two-hash-join shape: canonicalize edges to
    (a<b) and DISTINCT them (a hash-partition dedup, both directions
    of a link collapse), join edge(a,b)×edge(b,c) into wedges a<b<c,
    then close each wedge against edge(a,c). Each closed triangle
    credits all three corners; per-batch partials shrink before the
    final hash-partition combine. No broadcast anywhere — the edge
    table is the only input and it only ever streams through joins
    partitioned by its own keys, so the shape is the 100-TB one at
    every size (a triangle query has no meaningful driver-combine
    sibling: its cost IS the joins)."""
    from kryptone_ray.pipelines.common import (hash_shuffle,
                                               join_partitions,
                                               parquet_rows_path)

    snap = _edges_dir()
    npart = join_partitions(parquet_rows_path(f"{snap}/edges.parquet"))

    def canon(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        a = pc.min_element_wise(t["src"], t["dst"])
        b = pc.max_element_wise(t["src"], t["dst"])
        mask = pc.not_equal(a, b)
        return pa.table({"a": a.filter(mask), "b": b.filter(mask)})

    def node_partial(df: pd.DataFrame) -> pd.DataFrame:
        corners = np.concatenate([df["a"].to_numpy(), df["b"].to_numpy(),
                                  df["b2"].to_numpy()])
        g = pd.Series(corners).value_counts()
        return pd.DataFrame({"node": g.index.to_numpy(),
                             "n_triangles": g.to_numpy()})

    with hash_shuffle():
        und = rd.read_parquet(snap) \
            .map_batches(canon, batch_format="pyarrow", batch_size=65536) \
            .repartition(num_blocks=npart, keys=["a", "b"]) \
            .map_batches(lambda df: df.drop_duplicates(),
                         batch_format="pandas", batch_size=None) \
            .materialize()
        e2 = und.map_batches(
            lambda df: df.rename(columns={"a": "a2", "b": "b2"}),
            batch_format="pandas", batch_size=None)
        e3 = und.map_batches(
            lambda df: df.rename(columns={"a": "ca", "b": "cb"}),
            batch_format="pandas", batch_size=None)
        wedges = und.join(e2, "inner", num_partitions=npart,
                          on=("b",), right_on=("a2",))
        closed = wedges.join(e3, "inner", num_partitions=npart,
                             on=("a", "b2"), right_on=("ca", "cb"))
        out = closed.map_batches(node_partial, batch_format="pandas",
                                 batch_size=65536) \
            .repartition(num_blocks=npart, keys=["node"]) \
            .map_batches(
                lambda df: df.groupby("node", sort=False, as_index=False)
                ["n_triangles"].sum(),
                batch_format="pandas", batch_size=None).to_pandas()
    out["node"] = out["node"].astype("int64")
    out["n_triangles"] = out["n_triangles"].astype("int64")
    return out.sort_values("node").reset_index(drop=True)


def graph_triangles_oracle_sql() -> str:
    snap = _edges_dir()
    return f"""
WITH und AS (SELECT DISTINCT least(src, dst) AS a, greatest(src, dst) AS b
             FROM read_parquet('{snap}/edges.parquet') WHERE src <> dst),
     tri AS (SELECT e1.a AS x, e1.b AS y, e2.b AS z
             FROM und e1
             JOIN und e2 ON e2.a = e1.b
             JOIN und e3 ON e3.a = e1.a AND e3.b = e2.b)
SELECT node, count(*) AS n_triangles FROM (
    SELECT x AS node FROM tri
    UNION ALL SELECT y FROM tri
    UNION ALL SELECT z FROM tri
) GROUP BY node ORDER BY node
"""


N_SEEDS = 8  # BFS sources: nodes 0..7, mirroring the crawl's seed list


def _bfs_broadcast(snap: str, n: int) -> pd.DataFrame:
    """Level-synchronous multi-source BFS with the distance vector
    broadcast per level: level k's frontier edges emit their unreached
    targets, the driver stamps them k+1. Terminates when a level adds
    nothing; the per-iteration driver state is node-bounded (the same
    ceiling as PAGERANK_BROADCAST_MAX_NODES)."""
    import ray

    dist = np.full(n, -1, dtype=np.int64)
    dist[:N_SEEDS] = 0
    level = 0
    while True:
        ref = ray.put(dist)
        k = level

        def frontier_push(df: pd.DataFrame) -> pd.DataFrame:
            dv = ray.get(ref)
            src = df["src"].to_numpy()
            dst = df["dst"].to_numpy()
            hit = dst[(dv[src] == k) & (dv[dst] < 0)]
            return pd.DataFrame({"node": np.unique(hit)})

        newly = rd.read_parquet(snap) \
            .map_batches(frontier_push, batch_format="pandas",
                         batch_size=65536).to_pandas()
        if newly.empty:
            break
        dist[np.unique(newly["node"].to_numpy())] = level + 1
        level += 1
    return pd.DataFrame({"node": np.arange(n, dtype=np.int64),
                         "depth": dist})


def _bfs_distributed(snap: str, n: int) -> pd.DataFrame:
    """Join-shaped BFS past the broadcast gate — Bellman-Ford min-plus
    to fixed point, the directed single-direction twin of
    _cc_distributed: each iteration hash-joins the streamed edge table
    against the distance Dataset on src, pushes d+1 to dst, unions the
    self-distances and takes per-node minima in a hash-partition
    combine. Distances are monotone non-increasing from the n-valued
    'infinity', so convergence = unchanged distance sum."""
    from kryptone_ray.pipelines.common import (hash_shuffle,
                                               join_partitions,
                                               parquet_rows_path)

    npart = join_partitions(parquet_rows_path(f"{snap}/edges.parquet"))
    INF = np.int64(n)

    def init_dist(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        ids = pc.cast(t["id"], pa.int64())
        d = pc.if_else(pc.less(ids, pa.scalar(N_SEEDS, pa.int64())),
                       pa.scalar(0, pa.int64()), pa.scalar(int(INF), pa.int64()))
        return pa.table({"pr_v": ids, "d": d})

    dist = rd.range(n).map_batches(init_dist, batch_format="pyarrow",
                                   batch_size=65536).materialize()
    prev_sum = int(INF) * (n - N_SEEDS)

    def push(df: pd.DataFrame) -> pd.DataFrame:
        g = pd.DataFrame({"node": df["dst"], "d": df["d"] + 1}) \
            .groupby("node", sort=False)["d"].min()
        return pd.DataFrame({"node": g.index.to_numpy(),
                             "d": g.to_numpy()})

    def self_rows(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({"node": df["pr_v"], "d": df["d"]})

    def combine_min(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby("node", sort=False)["d"].min()
        return pd.DataFrame({"pr_v": g.index.to_numpy(),
                             "d": g.to_numpy()})

    while True:
        with hash_shuffle():
            f = rd.read_parquet(snap) \
                .join(dist, "inner", num_partitions=npart,
                      on=("src",), right_on=("pr_v",)) \
                .map_batches(push, batch_format="pandas", batch_size=None)
            s = dist.map_batches(self_rows, batch_format="pandas",
                                 batch_size=None)
            dist = f.union(s) \
                .repartition(num_blocks=npart, keys=["node"]) \
                .map_batches(combine_min, batch_format="pandas",
                             batch_size=None).materialize()
        sums = dist.map_batches(
            lambda df: pd.DataFrame({"s": [int(df["d"].sum())]}),
            batch_format="pandas", batch_size=None).to_pandas()
        cur_sum = int(sums["s"].sum())
        if cur_sum == prev_sum:
            break
        prev_sum = cur_sum

    out = dist.to_pandas().rename(columns={"pr_v": "node", "d": "depth"})
    out.loc[out["depth"] >= int(INF), "depth"] = -1
    out["node"] = out["node"].astype("int64")
    out["depth"] = out["depth"].astype("int64")
    return out.sort_values("node").reset_index(drop=True)


def q_graph_bfs_depth(sf_dir: str) -> pd.DataFrame:
    """MULTI-SOURCE BFS hop distance over the directed link graph —
    the batch twin of the crawler's frontier depth (each visit window
    IS a BFS level of `stages/expand.py` edges; reference analog: the
    depth implicit in base.py's urls_to_visit rounds). Unreached nodes
    report -1. Broadcast levels below the node gate, Bellman-Ford
    joins above it; the oracle is a depth-capped recursive CTE."""
    snap = _edges_dir()
    if _G_ROWS > PAGERANK_BROADCAST_MAX_NODES:
        return _bfs_distributed(snap, _G_ROWS)
    return _bfs_broadcast(snap, _G_ROWS)


def graph_bfs_oracle_sql() -> str:
    snap = _edges_dir()
    return f"""
WITH RECURSIVE reach(v, d) AS (
    SELECT range AS v, 0 AS d FROM range({N_SEEDS})
    UNION
    SELECT e.dst, r.d + 1
    FROM reach r JOIN read_parquet('{snap}/edges.parquet') e
      ON e.src = r.v
    WHERE r.d < {_G_ROWS})
SELECT n.v AS node, CAST(COALESCE(min(r.d), -1) AS BIGINT) AS depth
FROM (SELECT range AS v FROM range({_G_ROWS})) n
LEFT JOIN reach r ON r.v = n.v
GROUP BY n.v ORDER BY node
"""
