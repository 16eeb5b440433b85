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


def _normalized_matrix(sf_dir: str):
    emb = T(sf_dir, "embeddings", columns=["vec_id", "embedding"]).to_pandas()
    mat = np.stack(emb["embedding"].to_numpy()).astype(np.float64)
    mat /= np.clip(np.linalg.norm(mat, axis=1, keepdims=True), 1e-12, None)
    return emb["vec_id"].to_numpy(), mat


def q_knn_bruteforce(sf_dir: str) -> pd.DataFrame:
    """Exact cosine top-K for the first N_QUERIES vectors against all
    OTHER vectors: per-batch numpy matmul against the broadcast query
    matrix (the scale shape: queries broadcast once via ray.put, corpus
    streamed in batches)."""
    import ray

    ids, mat = _normalized_matrix(sf_dir)
    qsel = np.argsort(ids)[:N_QUERIES]
    q_ids, q_mat = ids[qsel], mat[qsel]
    q_ref = ray.put((q_ids, q_mat))

    ds = T(sf_dir, "embeddings", columns=["vec_id", "embedding"])

    def f(df: pd.DataFrame) -> pd.DataFrame:
        qi, qm = ray.get(q_ref)
        c = np.stack(df["embedding"].to_numpy()).astype(np.float64)
        c /= np.clip(np.linalg.norm(c, axis=1, keepdims=True), 1e-12, None)
        sims = qm @ c.T  # (n_queries, batch)
        cids = df["vec_id"].to_numpy()
        nq, nb = sims.shape
        out = pd.DataFrame(
            {
                "query_id": np.repeat(qi, nb),
                "neighbor_id": np.tile(cids, nq),
                "sim": sims.ravel(),
            }
        )
        return out[out["query_id"] != out["neighbor_id"]]

    # per-batch local top-K before the global merge keeps shuffle tiny
    def local_topk(df: pd.DataFrame) -> pd.DataFrame:
        return (
            df.sort_values(["query_id", "sim", "neighbor_id"],
                           ascending=[True, False, True])
            .groupby("query_id", sort=False)
            .head(K)
        )

    parts = (
        ds.map_batches(f, batch_format="pandas", batch_size=1024)
        .map_batches(local_topk, batch_format="pandas", batch_size=65536)
        .to_pandas()
    )
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


def q_knn_ivf(sf_dir: str, n_cells: int = 16, n_probe: int = 4) -> pd.DataFrame:
    """IVF-style ANN: k-means-lite centroids (deterministic: first
    n_cells vectors after sorting by vec_id, 5 Lloyd iterations), search
    only the n_probe nearest cells per query. Recall < 1 by design —
    rows-only entry; the exactness gate is q_knn_bruteforce."""
    ids, mat = _normalized_matrix(sf_dir)
    order = np.argsort(ids)
    ids, mat = ids[order], mat[order]
    cent = mat[:n_cells].copy()
    for _ in range(5):
        assign = np.argmax(mat @ cent.T, axis=1)
        for c in range(n_cells):
            members = mat[assign == c]
            if len(members):
                v = members.mean(axis=0)
                cent[c] = v / max(np.linalg.norm(v), 1e-12)
    assign = np.argmax(mat @ cent.T, axis=1)

    qsel = np.arange(N_QUERIES)
    rows = []
    for a in qsel:
        cells = np.argsort(-(cent @ mat[a]))[:n_probe]
        cand = np.flatnonzero(np.isin(assign, cells))
        cand = cand[ids[cand] != ids[a]]
        sims = mat[cand] @ mat[a]
        top = cand[np.lexsort((ids[cand], -sims))][:K]
        for r, b in enumerate(top, 1):
            rows.append((int(ids[a]), int(ids[b]), r))
    return pd.DataFrame(rows, columns=["query_id", "neighbor_id", "rank"])
