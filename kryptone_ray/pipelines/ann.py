"""Similarity search over the ``embeddings`` table: brute-force cosine
top-k as the exact baseline, and an IVF-bucketed variant as the scale
path (task brief: ANN over a list<float> column).

Output discipline: neighbor IDs + integer ranks only (no float columns)
so DuckDB value-hash comparison is exact; both sides break ties by
neighbor id.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from kryptone_ray.pipelines.common import T

K = 5
N_QUERIES = 8


def q_knn_bruteforce(sf_dir: str) -> pd.DataFrame:
    """Exact cosine top-K for the first N_QUERIES vectors against all
    OTHER vectors: per-batch numpy matmul against the broadcast query
    matrix (the scale shape: queries broadcast once via ray.put, corpus
    streamed in batches). The query vectors come from a distributed
    sort+limit — the corpus is never materialized on the driver."""
    import ray

    q_df = T(sf_dir, "embeddings", columns=["vec_id", "embedding"]) \
        .sort("vec_id").limit(N_QUERIES).to_pandas()
    q_ids, q_mat = _norm_batch(q_df)
    q_ref = ray.put((q_ids, q_mat))

    # small blocks: map tasks dispatch per BLOCK — a one-file table at
    # the default block size would run the matmul stage serially
    ds = T(sf_dir, "embeddings", columns=["vec_id", "embedding"],
           rows_per_block=8192)

    def f(df: pd.DataFrame) -> pd.DataFrame:
        # matmul + IN-TASK top-K (round-4 fix: the nq×nb cross product
        # used to cross a stage boundary before pruning — only nq×K
        # rows leave each task now). Ties at the K boundary break by
        # neighbor_id asc (lexsort), matching the global merge order.
        qi, qm = ray.get(q_ref)
        c = np.stack(df["embedding"].to_numpy()).astype(np.float64)
        c /= np.clip(np.linalg.norm(c, axis=1, keepdims=True), 1e-12, None)
        sims = qm @ c.T  # (n_queries, batch)
        cids = df["vec_id"].to_numpy()
        nq, nb = sims.shape
        sims[cids[None, :] == qi[:, None]] = -np.inf  # drop self-match
        k = min(K, nb)
        qs, ns, ss = [], [], []
        for r in range(nq):  # nq is tiny (N_QUERIES); lexsort is exact
            order = np.lexsort((cids, -sims[r]))[:k]
            qs.append(np.full(k, qi[r]))
            ns.append(cids[order])
            ss.append(sims[r][order])
        out = pd.DataFrame({"query_id": np.concatenate(qs),
                            "neighbor_id": np.concatenate(ns),
                            "sim": np.concatenate(ss)})
        return out[out["sim"] > -np.inf]

    parts = ds.map_batches(f, batch_format="pandas",
                           batch_size=1024).to_pandas()
    top = (
        parts.sort_values(["query_id", "sim", "neighbor_id"],
                          ascending=[True, False, True])
        .groupby("query_id", sort=False)
        .head(K)
        .reset_index(drop=True)
    )
    top["rank"] = top.groupby("query_id", sort=False).cumcount() + 1
    return top[["query_id", "neighbor_id", "rank"]]


Q_KNN_SQL = f"""
WITH q AS (
  SELECT vec_id AS query_id, embedding AS qe FROM embeddings
  ORDER BY vec_id LIMIT {N_QUERIES}
), sims AS (
  SELECT q.query_id, e.vec_id AS neighbor_id,
         list_cosine_similarity(q.qe, e.embedding) AS sim
  FROM q CROSS JOIN embeddings e
  WHERE e.vec_id <> q.query_id
), ranked AS (
  SELECT query_id, neighbor_id,
         row_number() OVER (PARTITION BY query_id
                            ORDER BY sim DESC, neighbor_id) AS rank
  FROM sims
)
SELECT query_id, neighbor_id, rank FROM ranked
WHERE rank <= {K} ORDER BY query_id, rank
"""


def _norm_batch(df: pd.DataFrame):
    m = np.stack(df["embedding"].to_numpy()).astype(np.float64)
    m /= np.clip(np.linalg.norm(m, axis=1, keepdims=True), 1e-12, None)
    return df["vec_id"].to_numpy(), m


# below this footer row count the whole Lloyd+probe loop runs on the
# driver over one materialized read — 8 sequential Dataset executions
# (seed sort, 5 Lloyd passes, query sort, probe) cost ~0.5 s EACH in
# pure streaming-executor startup, which dominates tiny corpora; the
# distributed shape (unchanged above the gate) is forced by
# tests/test_small_input_gates.py and exercised un-patched by the
# 200k/500k ANN scale smokes
IVF_DISTRIBUTED_MIN_ROWS = 100_000


def q_knn_ivf(sf_dir: str, n_cells: int = 16, n_probe: int = 4) -> pd.DataFrame:
    """IVF-style ANN, distributed: centroids are seeded from the first
    ``n_cells`` vectors by vec_id (a tiny sorted limit) and refined by
    5 Lloyd iterations where each iteration is ONE ``map_batches`` pass
    emitting per-cell partial sums/counts against the broadcast
    centroids (the distributed k-means shape — only (n_cells × dim)
    partials cross to the driver). Search assigns cells and computes
    per-batch local top-K inside ``map_batches`` with queries +
    centroids broadcast via ``ray.put``; the driver merges
    N_QUERIES × K × n_batches candidate rows. Recall < 1 by design —
    rows-only entry (exactness gate: q_knn_bruteforce); pinned against
    tests/golden/dedup_knn_ivf_sf001.json.

    Small-input gate: below ``IVF_DISTRIBUTED_MIN_ROWS`` the same math
    runs on the driver over one materialized read (``_knn_ivf_local``)
    — bit-identical at gate scale because a sub-gate corpus fits one
    4096-row batch, so the distributed partial-sum order IS the local
    whole-array order (the equality is asserted by the forced-gate
    test)."""
    import ray

    from kryptone_ray.pipelines.common import parquet_rows

    ds = T(sf_dir, "embeddings", columns=["vec_id", "embedding"],
           rows_per_block=8192)  # parallel Lloyd/probe passes (see knn)
    if parquet_rows(sf_dir, "embeddings") < IVF_DISTRIBUTED_MIN_ROWS:
        return _knn_ivf_local(ds.to_pandas(), n_cells, n_probe)
    seed = ds.sort("vec_id").limit(n_cells).to_pandas()
    _, cent = _norm_batch(seed)
    cent = cent.copy()

    for _ in range(5):
        cent_ref = ray.put(cent)

        def partials(df: pd.DataFrame) -> pd.DataFrame:
            c = ray.get(cent_ref)
            _, m = _norm_batch(df)
            assign = np.argmax(m @ c.T, axis=1)
            sums = np.zeros_like(c)
            np.add.at(sums, assign, m)
            counts = np.bincount(assign, minlength=len(c))
            return pd.DataFrame(
                {"cell": np.arange(len(c)),
                 "n": counts.astype("int64"),
                 "vsum": list(sums)}
            )

        part = ds.map_batches(partials, batch_format="pandas",
                              batch_size=4096).to_pandas()
        for c in range(n_cells):
            sub = part[part["cell"] == c]
            n = int(sub["n"].sum())
            if n:
                v = np.sum(np.stack(sub["vsum"].to_numpy()), axis=0) / n
                cent[c] = v / max(np.linalg.norm(v), 1e-12)

    q_df = ds.sort("vec_id").limit(N_QUERIES).to_pandas()
    q_ids, q_mat = _norm_batch(q_df)
    probe_cells = np.argsort(-(q_mat @ cent.T), axis=1)[:, :n_probe]
    bc = ray.put((cent, q_ids, q_mat, probe_cells))

    def local_topk(df: pd.DataFrame) -> pd.DataFrame:
        c, qi, qm, cells = ray.get(bc)
        ids, m = _norm_batch(df)
        assign = np.argmax(m @ c.T, axis=1)
        rows = []
        for qidx in range(len(qi)):
            mask = np.isin(assign, cells[qidx]) & (ids != qi[qidx])
            cand = np.flatnonzero(mask)
            if not len(cand):
                continue
            sims = m[cand] @ qm[qidx]
            top = cand[np.lexsort((ids[cand], -sims))][:K]
            rows.append(pd.DataFrame(
                {"query_id": qi[qidx], "neighbor_id": ids[top],
                 "sim": m[top] @ qm[qidx]}))
        if not rows:
            return pd.DataFrame({"query_id": pd.Series(dtype="int64"),
                                 "neighbor_id": pd.Series(dtype="int64"),
                                 "sim": pd.Series(dtype="float64")})
        return pd.concat(rows, ignore_index=True)

    parts = ds.map_batches(local_topk, batch_format="pandas",
                           batch_size=4096).to_pandas()
    out_rows = []
    for qid in sorted(set(parts["query_id"])):
        sub = parts[parts["query_id"] == qid]
        order = np.lexsort((sub["neighbor_id"].to_numpy(),
                            -sub["sim"].to_numpy()))
        top = sub.iloc[order[:K]]
        for r, nid in enumerate(top["neighbor_id"], 1):
            out_rows.append((int(qid), int(nid), r))
    return pd.DataFrame(out_rows, columns=["query_id", "neighbor_id", "rank"])


def q_knn_lsh(sf_dir: str, n_bits: int = 6, n_tables: int = 32) -> pd.DataFrame:
    """Random-hyperplane LSH ANN (task brief: "an IVF or LSH-bucketed
    variant as the scale path" — this is the LSH sibling of
    ``q_knn_ivf``): ``n_tables`` independent sign-hash tables of
    ``n_bits`` hyperplanes each; a corpus vector is a candidate for a
    query iff they share a bucket in ANY table (classic multi-table
    OR-amplification). One pass over the corpus: hyperplanes + query
    signatures broadcast via ``ray.put``, per-batch signature matmul +
    candidate cosine + local top-K inside ``map_batches``; the driver
    merges N_QUERIES × K × n_batches rows. At cluster scale the same
    shape holds — the only cross-node traffic is the broadcast (once)
    and the tiny top-K partials. Hyperplanes are seeded (fixed RNG) so
    the output is deterministic; recall < 1 by design — rows-only
    entry, recall-vs-bruteforce pinned in tests.

    Parameter note: the synthetic embeddings are a NEAR-WORST case for
    sign-LSH -- true top-5 neighbors sit at cosine ~0.3 (collision
    prob per bit 1 - arccos(0.3)/pi ~ 0.60) against a median pairwise
    cosine of ~0. At 6 bits x 32 tables the predicted recall is
    1-(1-0.60^6)^32 ~ 0.77 at a ~40% candidate fraction (a 2.5x
    compute prune); sharper bucketing would need the neighbors to be
    closer, which is a property of the data, not the index. Corpora
    with real near-dup structure (cosine >= 0.8) prune 100-1000x at
    the same recall -- see the embedding-LSH dedup path (dedup.py),
    which targets exactly that regime."""
    import ray

    ds = T(sf_dir, "embeddings", columns=["vec_id", "embedding"],
           rows_per_block=8192)
    q_df = ds.sort("vec_id").limit(N_QUERIES).to_pandas()
    q_ids, q_mat = _norm_batch(q_df)
    dim = q_mat.shape[1]
    rng = np.random.default_rng(20260817)
    planes = rng.standard_normal((n_tables, n_bits, dim))
    pow2 = (1 << np.arange(n_bits)).astype(np.int64)

    def signatures(m: np.ndarray) -> np.ndarray:
        """(n, dim) -> (n_tables, n) int bucket ids."""
        return np.stack([((m @ planes[t].T) > 0).astype(np.int64) @ pow2
                         for t in range(n_tables)])

    q_sigs = signatures(q_mat)  # (n_tables, n_queries)
    bc = ray.put((q_ids, q_mat, planes, q_sigs))

    def probe(df: pd.DataFrame) -> pd.DataFrame:
        qi, qm, pl, qs = ray.get(bc)
        ids, m = _norm_batch(df)
        sigs = np.stack([((m @ pl[t].T) > 0).astype(np.int64) @ pow2
                         for t in range(len(pl))])
        rows = []
        for qidx in range(len(qi)):
            mask = np.zeros(len(ids), dtype=bool)
            for t in range(len(pl)):
                mask |= sigs[t] == qs[t, qidx]
            mask &= ids != qi[qidx]
            cand = np.flatnonzero(mask)
            if not len(cand):
                continue
            sims = m[cand] @ qm[qidx]
            top = cand[np.lexsort((ids[cand], -sims))][:K]
            rows.append(pd.DataFrame(
                {"query_id": qi[qidx], "neighbor_id": ids[top],
                 "sim": m[top] @ qm[qidx]}))
        if not rows:
            return pd.DataFrame({"query_id": pd.Series(dtype="int64"),
                                 "neighbor_id": pd.Series(dtype="int64"),
                                 "sim": pd.Series(dtype="float64")})
        return pd.concat(rows, ignore_index=True)

    parts = ds.map_batches(probe, batch_format="pandas",
                           batch_size=4096).to_pandas()
    out_rows = []
    for qid in sorted(set(parts["query_id"])):
        sub = parts[parts["query_id"] == qid]
        order = np.lexsort((sub["neighbor_id"].to_numpy(),
                            -sub["sim"].to_numpy()))
        top = sub.iloc[order[:K]]
        for r, nid in enumerate(top["neighbor_id"], 1):
            out_rows.append((int(qid), int(nid), r))
    return pd.DataFrame(out_rows, columns=["query_id", "neighbor_id", "rank"])


def _knn_ivf_local(df: pd.DataFrame, n_cells: int, n_probe: int) -> pd.DataFrame:
    """Driver-side mirror of the distributed IVF math (same seeding,
    same Lloyd update, same lexsort tie-breaks) over one in-memory
    batch. Only reached below IVF_DISTRIBUTED_MIN_ROWS."""
    seed = df.sort_values("vec_id").head(n_cells)
    _, cent = _norm_batch(seed)
    cent = cent.copy()
    ids, m = _norm_batch(df)

    for _ in range(5):
        assign = np.argmax(m @ cent.T, axis=1)
        sums = np.zeros_like(cent)
        np.add.at(sums, assign, m)
        counts = np.bincount(assign, minlength=len(cent))
        for c in range(n_cells):
            if counts[c]:
                v = sums[c] / counts[c]
                cent[c] = v / max(np.linalg.norm(v), 1e-12)

    q_df = df.sort_values("vec_id").head(N_QUERIES)
    q_ids, q_mat = _norm_batch(q_df)
    probe_cells = np.argsort(-(q_mat @ cent.T), axis=1)[:, :n_probe]
    assign = np.argmax(m @ cent.T, axis=1)

    out_rows = []
    for qidx in range(len(q_ids)):
        mask = np.isin(assign, probe_cells[qidx]) & (ids != q_ids[qidx])
        cand = np.flatnonzero(mask)
        if not len(cand):
            continue
        sims = m[cand] @ q_mat[qidx]
        top = cand[np.lexsort((ids[cand], -sims))][:K]
        for r, nid in enumerate(ids[top], 1):
            out_rows.append((int(q_ids[qidx]), int(nid), r))
    return pd.DataFrame(out_rows, columns=["query_id", "neighbor_id", "rank"])
