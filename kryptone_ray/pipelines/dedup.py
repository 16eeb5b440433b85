"""Deduplication family over ``documents`` — exact, MinHash+LSH, SimHash,
n-gram Jaccard, embedding-cosine near-dup. Core training-data-pipeline
operators (task brief), built on public algorithms (Broder 1997 MinHash;
Charikar 2002 SimHash; Leskovec et al., MMDS ch.3 LSH banding).

Scale shapes:
- exact:   content-hash per batch (vectorized xxh64) → groupby(hash) →
           first-wins. One small shuffle of (hash, doc_id) pairs.
- minhash: shingle→K minhashes per batch → explode to (band, band_hash)
           rows → groupby bucket → candidate pairs → exact-Jaccard verify.
           Only metadata-sized rows are shuffled; signatures are computed
           in ONE vectorized pass per batch.
- simhash: 64-bit simhash per batch; near-dup = hamming distance ≤ t on
           bucketed prefixes.
- cosine:  normalized embeddings, per-batch matmul against broadcast
           candidate matrix.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from kryptone_ray.pipelines.common import T
from kryptone_ray.utils.xxh64 import xxh64, xxh64_batch


def q_dedup_exact(sf_dir: str) -> pd.DataFrame:
    """Exact dedup: one representative (min doc_id) per distinct text +
    duplicate count. Hash-partitioned groupby on the content hash; the
    text itself never shuffles (only hash + doc_id)."""
    ds = T(sf_dir, "documents", columns=["doc_id", "text"])

    # partial-aggregate shape: per batch, one (hash, min doc_id, count)
    # row per DISTINCT text — the text never leaves its batch, only the
    # hash partials shuffle to the (tiny) final combine. At 10^10 docs
    # the final combine becomes groupby(text_hash) over partials; here
    # the partials are already small enough for the driver.
    def partial(df: pd.DataFrame) -> pd.DataFrame:
        df["text_hash"] = xxh64_batch(df["text"].tolist()).astype("int64")
        g = df.groupby("text_hash", sort=False)["doc_id"]
        return pd.DataFrame(
            {"doc_id": g.min(), "n_dups": g.size()}
        ).reset_index()

    parts = ds.map_batches(partial, batch_format="pandas", batch_size=8192).to_pandas()
    g = parts.groupby("text_hash", sort=False)
    out = pd.DataFrame(
        {"doc_id": g["doc_id"].min(), "n_dups": g["n_dups"].sum()}
    ).reset_index(drop=True)
    return out.sort_values("doc_id").reset_index(drop=True)


Q_DEDUP_EXACT_SQL = """
SELECT min(doc_id) AS doc_id, count(*) AS n_dups
FROM documents GROUP BY text ORDER BY doc_id
"""


def _shingles(text: str, k: int = 3) -> set:
    toks = text.lower().split()
    if len(toks) < k:
        return {" ".join(toks)} if toks else set()
    return {" ".join(toks[i : i + k]) for i in range(len(toks) - k + 1)}


_MINHASH_PERMS = 64
_A = None
_B = None
_P = (1 << 61) - 1


def _perm_params():
    global _A, _B
    if _A is None:
        rng = np.random.default_rng(42)
        _A = rng.integers(1, _P, size=_MINHASH_PERMS, dtype=np.int64).astype(np.uint64)
        _B = rng.integers(0, _P, size=_MINHASH_PERMS, dtype=np.int64).astype(np.uint64)
    return _A, _B


def minhash_signature(text: str) -> np.ndarray:
    """K=64 permuted-hash minima over 3-token shingles (Broder)."""
    sh = _shingles(text)
    if not sh:
        return np.full(_MINHASH_PERMS, np.iinfo(np.uint64).max, dtype=np.uint64)
    a, b = _perm_params()
    base = np.array([xxh64(s) for s in sh], dtype=np.uint64)
    # (n_shingles, K) permutations in one vectorized op
    vals = (base[:, None] * a[None, :] + b[None, :]) % np.uint64(_P)
    return vals.min(axis=0)


def q_minhash_lsh_pairs(sf_dir: str, bands: int = 16, threshold: float = 0.6) -> pd.DataFrame:
    """MinHash+LSH near-dup pairs: signatures per batch → band buckets →
    groupby(band, bucket_hash) → candidate pairs → exact Jaccard verify.
    Rows-only (no SQL oracle — LSH is not SQL-expressible); deterministic
    given the pinned permutation seed."""
    rows_per_band = _MINHASH_PERMS // bands
    ds = T(sf_dir, "documents", columns=["doc_id", "text"])

    def sig_batch(df: pd.DataFrame) -> pd.DataFrame:
        out = []
        for doc_id, text in zip(df["doc_id"], df["text"]):
            sig = minhash_signature(text)
            for band in range(bands):
                chunk = sig[band * rows_per_band : (band + 1) * rows_per_band]
                out.append((doc_id, band, xxh64(chunk.tobytes())))
        return pd.DataFrame(out, columns=["doc_id", "band", "bucket"])

    # signatures are the expensive part and run distributed; the bucket
    # table is metadata-sized ((doc_id, band, bucket) ints — n_docs×bands
    # rows), grouped here via a driver hash-groupby. At corpus scale this
    # becomes `groupby(["band","bucket"]).map_groups(emit_pairs)` — the
    # same key, pairs emitted in-group — traded here because ray's
    # sort-based groupby costs seconds on kilobyte inputs.
    buckets = ds.map_batches(sig_batch, batch_format="pandas",
                             batch_size=2048).to_pandas()
    g = buckets.groupby(["band", "bucket"], sort=False)["doc_id"].apply(list)
    cand = set()
    for ids in g:
        if len(ids) > 1:
            ids = sorted(set(ids))
            for i in range(len(ids)):
                for j in range(i + 1, len(ids)):
                    cand.add((ids[i], ids[j]))
    if not cand:
        return pd.DataFrame(columns=["doc_a", "doc_b", "jaccard"])
    # verify with exact shingle Jaccard
    docs = T(sf_dir, "documents", columns=["doc_id", "text"]).to_pandas()
    text_of = dict(zip(docs["doc_id"], docs["text"]))
    rows = []
    for a_id, b_id in sorted(cand):
        sa, sb = _shingles(text_of[a_id]), _shingles(text_of[b_id])
        if not sa or not sb:
            continue
        j = len(sa & sb) / len(sa | sb)
        if j >= threshold:
            rows.append((a_id, b_id, round(j, 6)))
    return pd.DataFrame(rows, columns=["doc_a", "doc_b", "jaccard"])


def simhash64(text: str) -> int:
    """Charikar 64-bit SimHash over whitespace tokens."""
    acc = np.zeros(64, dtype=np.int64)
    for tok in text.lower().split():
        h = xxh64(tok)
        bits = (h >> np.arange(64, dtype=np.uint64)) & np.uint64(1)
        acc += np.where(bits.astype(bool), 1, -1)
    out = 0
    for i in range(64):
        if acc[i] > 0:
            out |= 1 << i
    return out


def q_simhash_clusters(sf_dir: str, max_hamming: int = 3) -> pd.DataFrame:
    """SimHash near-dup pairs: 64-bit simhash per doc; candidates bucketed
    by each of 4 16-bit chunks (any chunk equal → candidate; exact for
    hamming ≤ 3 by pigeonhole); verify hamming ≤ max_hamming.
    Rows-only."""
    ds = T(sf_dir, "documents", columns=["doc_id", "text"])

    def f(df: pd.DataFrame) -> pd.DataFrame:
        df["simhash"] = df["text"].map(simhash64).astype("uint64")
        return df[["doc_id", "simhash"]]

    sh = ds.map_batches(f, batch_format="pandas", batch_size=2048).to_pandas()
    hv = sh["simhash"].to_numpy(dtype=np.uint64)
    ids = sh["doc_id"].to_numpy()
    cand = set()
    for chunk in range(4):
        key = (hv >> np.uint64(16 * chunk)) & np.uint64(0xFFFF)
        buck = pd.DataFrame({"key": key, "i": np.arange(len(hv))}).groupby("key")["i"].apply(list)
        for grp in buck:
            if len(grp) > 1:
                for x in range(len(grp)):
                    for y in range(x + 1, len(grp)):
                        cand.add((min(grp[x], grp[y]), max(grp[x], grp[y])))
    rows = []
    for i, j in sorted(cand):
        d = int(bin(int(hv[i]) ^ int(hv[j])).count("1"))
        if d <= max_hamming:
            a, b = sorted((int(ids[i]), int(ids[j])))
            rows.append((a, b, d))
    return pd.DataFrame(sorted(set(rows)), columns=["doc_a", "doc_b", "hamming"])


def q_ngram_jaccard_dups(sf_dir: str, threshold: float = 0.8) -> pd.DataFrame:
    """Character-n-gram Jaccard near-dup count per source: docs whose
    5-gram Jaccard vs ANOTHER doc in the same source exceeds threshold.
    Quadratic within source groups only (groupby partitions the work);
    rows-only."""
    ds = T(sf_dir, "documents", columns=["doc_id", "source", "text"])

    def per_source(g: pd.DataFrame) -> pd.DataFrame:
        grams = [
            {t[i : i + 5] for i in range(max(1, len(t) - 4))}
            for t in g["text"].str.lower()
        ]
        n = len(g)
        dup = np.zeros(n, dtype=bool)
        for i in range(n):
            for j in range(i + 1, n):
                inter = len(grams[i] & grams[j])
                if inter == 0:
                    continue
                jac = inter / len(grams[i] | grams[j])
                if jac >= threshold:
                    dup[i] = dup[j] = True
        return pd.DataFrame(
            {"source": [g["source"].iloc[0]], "n_docs": [n], "n_near_dup": [int(dup.sum())]}
        )

    out = ds.groupby("source").map_groups(per_source, batch_format="pandas").to_pandas()
    return out.sort_values("source").reset_index(drop=True)


def q_embedding_near_dups(sf_dir: str, threshold: float = 0.35) -> pd.DataFrame:
    """Embedding-cosine near-dup pairs: normalize per batch, then blocked
    matmul against the (broadcast) normalized matrix — reports pairs with
    cosine ≥ threshold. Rank/id output only (no float columns) so the
    result is hash-stable. Rows-only."""
    import ray

    emb = T(sf_dir, "embeddings", columns=["vec_id", "embedding"]).to_pandas()
    mat = np.stack(emb["embedding"].to_numpy())
    norms = np.linalg.norm(mat, axis=1, keepdims=True)
    mat = mat / np.clip(norms, 1e-12, None)
    ids = emb["vec_id"].to_numpy()
    mat_ref = ray.put((mat, ids))

    ds = T(sf_dir, "embeddings", columns=["vec_id", "embedding"])

    def f(df: pd.DataFrame) -> pd.DataFrame:
        m, all_ids = ray.get(mat_ref)
        q = np.stack(df["embedding"].to_numpy())
        q = q / np.clip(np.linalg.norm(q, axis=1, keepdims=True), 1e-12, None)
        sims = q @ m.T
        qi, mi = np.nonzero(sims >= threshold)
        qids = df["vec_id"].to_numpy()[qi]
        mids = all_ids[mi]
        keep = qids < mids  # each unordered pair once
        return pd.DataFrame({"vec_a": qids[keep], "vec_b": mids[keep]})

    pairs = ds.map_batches(f, batch_format="pandas", batch_size=1024).to_pandas()
    if pairs.empty:
        return pd.DataFrame({"vec_a": pd.Series(dtype="int64"),
                             "vec_b": pd.Series(dtype="int64")})
    return pairs.sort_values(["vec_a", "vec_b"]).reset_index(drop=True)
