"""Multimodal (image) pipelines — binary columns + typed metadata with
actor-pool decode / resize / feature-extract stages (task brief).

The driver's sf tables carry no binary columns, so these queries operate
on the engine's own deterministic corpus (synthesized per call from a
pinned seed — same rows every run, independent of sf_dir size so the
driver's sf0.01-vs-oracle comparison is stable). Rows-only entries: the
codecs are not SQL-expressible.

Image decode/resize are REAL (pure-numpy codecs, nearest-neighbor
resize); audio decode and video frame-sampling are stubbed behind
NotImplementedError with the actor/batch plumbing in place (the decode
libraries are absent in this environment — FIXTURES.md F1a).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data as rd

from kryptone_ray.corpus import codecs
from kryptone_ray.corpus.synth import CorpusSpec

_MM_ROWS = 300
_MM_SEED = 1234


def _corpus_ds() -> "rd.Dataset":
    """Deterministic in-memory corpus as a Dataset: range(n) →
    map_batches(synthesize) — the generator runs distributed, nothing is
    materialized on the driver."""
    spec = CorpusSpec(n_rows=_MM_ROWS, n_hosts=8, seed=_MM_SEED)

    def synth(batch: pa.Table) -> pa.Table:
        return spec.synth_batch(batch["id"].to_pylist())

    return rd.range(_MM_ROWS).map_batches(synth, batch_format="pyarrow", batch_size=64)


class ImageStatsActor:
    """Actor-pool decode + feature extraction: decode once, emit mean /
    std / dominant-channel features. Codec dispatch tables are bound at
    actor init."""

    def __init__(self):
        self.decode = codecs.decode

    def __call__(self, batch: pa.Table) -> pa.Table:
        d = batch.to_pydict()
        n = len(batch)
        mean = np.zeros(n)
        std = np.zeros(n)
        dom = np.zeros(n, dtype=np.int32)
        for i in range(n):
            px = self.decode(d["bytes"][i], d["fmt"][i], d["w"][i], d["h"][i])
            mean[i] = px.mean()
            std[i] = px.std()
            dom[i] = int(px.reshape(-1, 3).mean(axis=0).argmax())
        return pa.table(
            {
                "image_id": batch["image_id"],
                "fmt": batch["fmt"],
                "w": batch["w"],
                "h": batch["h"],
                "px_mean": pa.array(np.round(mean, 4)),
                "px_std": pa.array(np.round(std, 4)),
                "dominant_channel": pa.array(dom, type=pa.int32()),
            }
        )


def q_image_decode_stats(sf_dir: str) -> pd.DataFrame:
    """Per-format decode statistics via an actor-pool decode stage.
    ``sf_dir`` is unused (pinned corpus) — rows-only oracle."""
    ds = _corpus_ds().map_batches(
        ImageStatsActor, batch_format="pyarrow", batch_size=64, concurrency=2
    )
    df = ds.to_pandas()
    g = df.groupby("fmt", sort=True)
    out = pd.DataFrame(
        {
            "fmt": list(g.groups),
            "n": g.size().to_numpy(),
            "avg_px_mean": g["px_mean"].mean().round(4).to_numpy(),
            "avg_w": g["w"].mean().round(4).to_numpy(),
            "avg_h": g["h"].mean().round(4).to_numpy(),
        }
    )
    return out.reset_index(drop=True)


class ImageResizeActor:
    """Nearest-neighbor resize to a fixed thumbnail (REAL implementation;
    replaces the reference's PIL resize path, base.py:426-443). Output
    keeps the binary column + updated typed metadata."""

    def __init__(self, out_w: int = 16, out_h: int = 16):
        self.out_w = out_w
        self.out_h = out_h

    def __call__(self, batch: pa.Table) -> pa.Table:
        d = batch.to_pydict()
        thumbs, hashes = [], []
        for i in range(len(batch)):
            px = codecs.decode(d["bytes"][i], d["fmt"][i], d["w"][i], d["h"][i])
            h, w, _ = px.shape
            yi = (np.arange(self.out_h) * h // self.out_h).astype(int)
            xi = (np.arange(self.out_w) * w // self.out_w).astype(int)
            thumb = px[yi][:, xi]
            thumbs.append(codecs.encode_raw(thumb))
            from kryptone_ray.utils.xxh64 import content_hash64

            hashes.append(np.uint64(content_hash64(thumb.tobytes())).astype(np.int64))
        return pa.table(
            {
                "image_id": batch["image_id"],
                "bytes": pa.array(thumbs, type=pa.binary()),
                "w": pa.array([self.out_w] * len(batch), type=pa.int32()),
                "h": pa.array([self.out_h] * len(batch), type=pa.int32()),
                "fmt": pa.array(["raw"] * len(batch), type=pa.string()),
                "thumb_phash": pa.array(hashes, type=pa.int64()),
            }
        )


def q_image_resize_thumbs(sf_dir: str) -> pd.DataFrame:
    """Resize every corpus image to 16×16 raw thumbnails; returns
    (image_id, thumb_phash) — deterministic, rows-only."""
    ds = _corpus_ds().map_batches(
        ImageResizeActor, batch_format="pyarrow", batch_size=64, concurrency=2
    )
    df = ds.to_pandas()[["image_id", "thumb_phash"]]
    return df.sort_values("image_id").reset_index(drop=True)


class AudioDecodeActor:
    """STUB — audio decoding needs an audio codec library not present in
    this environment. The Ray-side plumbing (binary column in, typed
    waveform metadata out, actor-pool stage) is the real contract; the
    decode call raises until a codec is wired in."""

    def __call__(self, batch: pa.Table) -> pa.Table:
        raise NotImplementedError(
            "audio decode requires an audio codec library (e.g. soundfile); "
            "wire it into AudioDecodeActor.__call__ — the stage signature "
            "(binary 'bytes' column → waveform metadata columns) is final"
        )


class VideoFrameSampleActor:
    """STUB — video frame sampling needs a container/codec library (e.g.
    PyAV). Contract: binary 'bytes' column in → one row per sampled frame
    (image bytes + frame_idx + pts) out."""

    def __call__(self, batch: pa.Table) -> pa.Table:
        raise NotImplementedError(
            "video frame sampling requires a video codec library; the "
            "flat_map-style expansion contract is final"
        )


class ImagePHashActor:
    """Perceptual hash (aHash, public algorithm): decode → grayscale →
    8×8 block means → bit = cell > global mean → 64-bit hash. Near-
    duplicate images (small pixel perturbations, re-encodes) land within
    a few bits of each other, unlike the exact content hash ``phash``
    column. Codec dispatch bound at actor init; one decode per row."""

    GRID = 8

    def __init__(self):
        self.decode = codecs.decode

    def _ahash(self, px: np.ndarray) -> np.int64:
        g = px.astype(np.float64).mean(axis=2)
        h, w = g.shape
        yi = (np.arange(self.GRID + 1) * h // self.GRID).astype(int)
        xi = (np.arange(self.GRID + 1) * w // self.GRID).astype(int)
        cells = np.empty((self.GRID, self.GRID))
        for r in range(self.GRID):
            for c in range(self.GRID):
                cells[r, c] = g[yi[r]:max(yi[r + 1], yi[r] + 1),
                                xi[c]:max(xi[c + 1], xi[c] + 1)].mean()
        bits = (cells > cells.mean()).ravel()
        return np.int64(
            np.uint64(np.bitwise_or.reduce(
                bits.astype(np.uint64) << np.arange(64, dtype=np.uint64)))
            .astype(np.int64))

    def __call__(self, batch: pa.Table) -> pa.Table:
        d = batch.to_pydict()
        hashes = [
            self._ahash(self.decode(d["bytes"][i], d["fmt"][i],
                                    d["w"][i], d["h"][i]))
            for i in range(len(batch))
        ]
        return pa.table({"image_id": batch["image_id"],
                         "ahash": pa.array(hashes, type=pa.int64())})


# above this hashed-row count the aHash candidate/verify stage runs
# distributed (chunk-key hash-repartition + per-block pair emission +
# inline hamming verify) instead of the driver bucket scan; the
# fixture corpus sits far below it, tests force the distributed path
# by patching to 0.
IMAGE_PHASH_DISTRIBUTED_MIN_ROWS = 100_000


def q_image_phash_near_dups(sf_dir: str, max_hamming: int = 6) -> pd.DataFrame:
    """Image near-duplicate detection over DECODED PIXELS: the corpus
    plus deterministically perturbed copies (a few ±2 pixel edits — the
    re-encoded-thumbnail situation) flow through an actor-pool aHash
    stage; candidates come from 16-bit hash-chunk bucketing (pigeonhole:
    hamming ≤ 6 pairs share at least one of 4 chunks... not guaranteed —
    ≤3 is; 4 chunks catch most ≤6 pairs and the perturbations used stay
    ≤3 bits) and a vectorized hamming verify. Above
    ``IMAGE_PHASH_DISTRIBUTED_MIN_ROWS`` the bucketing and the verify
    run distributed (the hash travels with the chunk row, so the verify
    is in-block — no join needed). Rows-only; deterministic."""
    out = _image_phash_pairs(sf_dir, max_hamming, as_dataset=False)
    return out


def _image_phash_pairs(sf_dir: str, max_hamming: int = 6,
                       as_dataset: bool = False):
    """Implementation of ``q_image_phash_near_dups``; with
    ``as_dataset=True`` the distributed regime returns the verified
    pair DATASET so clustering never lands the pair list on the driver
    (VERDICT r4 #2, image twin)."""
    from kryptone_ray.pipelines.dedup import hamming64

    spec = CorpusSpec(n_rows=_MM_ROWS, n_hosts=8, seed=_MM_SEED)
    n_dup = _MM_ROWS // 10

    def synth_plus(batch: pa.Table) -> pa.Table:
        ids = batch["id"].to_pylist()
        base = spec.synth_batch([i % _MM_ROWS for i in ids])
        d = base.to_pydict()
        out_ids, out_bytes = [], []
        for k, i in enumerate(ids):
            if i < _MM_ROWS:
                out_ids.append(d["image_id"][k])
                out_bytes.append(d["bytes"][k])
            else:
                # perturbed duplicate of image (i - _MM_ROWS): decode,
                # nudge 3 pixels by +2, re-encode raw
                px = codecs.decode(d["bytes"][k], d["fmt"][k],
                                   d["w"][k], d["h"][k]).copy()
                rng = np.random.default_rng(i)
                for _ in range(3):
                    y = int(rng.integers(0, px.shape[0]))
                    x = int(rng.integers(0, px.shape[1]))
                    px[y, x] = np.clip(px[y, x].astype(int) + 2, 0, 255)
                out_ids.append(d["image_id"][k] + "?dup")
                out_bytes.append(codecs.encode_raw(px))
        enc = pa.table({
            "image_id": pa.array(out_ids, type=pa.string()),
            "bytes": pa.array(out_bytes, type=pa.binary()),
            "w": pa.array([0] * len(ids), type=pa.int32()),
            "h": pa.array([0] * len(ids), type=pa.int32()),
            "fmt": pa.array(["raw"] * len(ids), type=pa.string()),
        })
        # raw re-encode carries its own dims header; decode ignores w/h
        # for fmt='raw'? codecs.decode needs dims — re-derive from base
        return pa.table({
            "image_id": enc["image_id"],
            "bytes": enc["bytes"],
            "w": base["w"], "h": base["h"],
            "fmt": pa.array(
                [d["fmt"][k] if i < _MM_ROWS else "raw"
                 for k, i in enumerate(ids)], type=pa.string()),
        })

    def hash_ds() -> "rd.Dataset":
        return rd.range(_MM_ROWS + n_dup).map_batches(
            synth_plus, batch_format="pyarrow", batch_size=64
        ).map_batches(ImagePHashActor, batch_format="pyarrow",
                      batch_size=64, concurrency=2)

    if _MM_ROWS + n_dup >= IMAGE_PHASH_DISTRIBUTED_MIN_ROWS:
        from kryptone_ray.pipelines.common import hash_shuffle

        # the shuffle strategy is captured at dataset CREATION — the
        # whole distributed pipeline builds inside the context
        with hash_shuffle():
            return _image_phash_pairs_distributed(hash_ds(), max_hamming,
                                                  as_dataset)

    hashed = hash_ds().to_pandas()  # (image_id, ahash) — metadata-sized
    hv = hashed["ahash"].to_numpy().astype(np.uint64)
    ids = hashed["image_id"].to_numpy()
    # 16-bit chunk bucketing + vectorized hamming verify (the simhash
    # candidate machinery over perceptual hashes)
    cand = set()
    for chunk in range(4):
        key = (hv >> np.uint64(16 * chunk)) & np.uint64(0xFFFF)
        df = pd.DataFrame({"key": key, "i": np.arange(len(hv))})
        for _, grp in df.groupby("key", sort=False):
            idx = grp["i"].to_numpy()
            if len(idx) > 1:
                for x in range(len(idx)):
                    for y in range(x + 1, len(idx)):
                        cand.add((int(idx[x]), int(idx[y])))
    rows = []
    if cand:
        cand = np.array(sorted(cand))
        d = hamming64(hv[cand[:, 0]], hv[cand[:, 1]])
        keep = d <= max_hamming
        for (i, j), dd in zip(cand[keep], d[keep]):
            a, b = sorted((str(ids[i]), str(ids[j])))
            rows.append((a, b, int(dd)))
    return pd.DataFrame(sorted(set(rows)),
                        columns=["image_a", "image_b", "hamming"])


# chunk buckets past this star-pair to the bucket's min image_id
# instead of emitting member×member pairs (the minhash hot-bucket cap:
# a degenerate bucket — e.g. one logo duplicated 10^6 times — is
# quadratic by definition; star pairs keep cluster connectivity for
# hamming-0 clones and stay linear). Cluster-preserving for buckets
# whose members are mutual near-dups (the degenerate case that makes a
# bucket hot); never pair-complete above the cap.
IMAGE_PHASH_BUCKET_CAP = 1024


def _image_phash_pairs_distributed(hashed_ds, max_hamming: int,
                                   as_dataset: bool):
    """Distributed aHash near-dup: each (image_id, ahash) row explodes
    to four (chunk, key) rows; rows hash-repartition by (chunk, key);
    pairs form per block with the packed sorted-segment pass (the
    n-gram census's ``bucket_pairs`` shape) and hamming-verify IN the
    block — the 64-bit hash travels with the row, so no join attaches
    payloads. A pair sharing several chunks surfaces once per chunk; a
    final hash-partition distinct collapses it. With ``as_dataset``
    the verified pair Dataset streams onward (clustering input)."""
    from kryptone_ray.pipelines.common import hash_shuffle, join_partitions
    from kryptone_ray.pipelines.dedup import hamming64

    with hash_shuffle():
        hashed = hashed_ds.materialize()
        n_rows = hashed.count()
        npart = join_partitions(n_rows * 4,
                                rows_per_partition=1_000_000, hi=512)

        def chunk_rows(df: pd.DataFrame) -> pd.DataFrame:
            hv = df["ahash"].to_numpy().astype(np.uint64)
            ids = df["image_id"].to_numpy()
            return pd.DataFrame({
                "chunk": np.repeat(np.arange(4, dtype=np.int64), len(df)),
                "key": np.concatenate([
                    ((hv >> np.uint64(16 * c)) & np.uint64(0xFFFF))
                    .astype(np.int64) for c in range(4)]),
                "image_id": pd.Series(np.tile(ids, 4), dtype="object"),
                "ahash": np.tile(hv, 4)})

        def bucket_pairs(df: pd.DataFrame) -> pd.DataFrame:
            empty = pd.DataFrame({
                "image_a": pd.Series([], dtype="object"),
                "image_b": pd.Series([], dtype="object"),
                "hamming": pd.array([], dtype="int64")})
            if not len(df):
                return empty
            ck = df["chunk"].to_numpy(dtype=np.int64)
            ky = df["key"].to_numpy(dtype=np.int64)
            ids = df["image_id"].to_numpy()
            hv = df["ahash"].to_numpy().astype(np.uint64)
            # ids inside the lexsort: within a segment rows sort by
            # image_id, so emitted pairs are already (min, max)-ordered
            # and a capped segment's FIRST row is its min image_id
            order = np.lexsort((ids, ky, ck))
            ck, ky, ids, hv = ck[order], ky[order], ids[order], hv[order]
            n = len(ids)
            newseg = np.empty(n, dtype=bool)
            newseg[0] = True
            newseg[1:] = (ck[1:] != ck[:-1]) | (ky[1:] != ky[:-1])
            seg = np.cumsum(newseg) - 1
            bounds = np.append(np.flatnonzero(newseg), n)
            seg_size = bounds[1:] - bounds[:-1]
            big = seg_size > IMAGE_PHASH_BUCKET_CAP
            idx = np.arange(n)
            counts = np.where(big[seg], 0, bounds[seg + 1] - idx - 1)
            pa_i = np.repeat(idx, counts)
            starts = np.cumsum(counts) - counts
            pb_i = (np.arange(int(counts.sum())) - starts[pa_i]
                    + pa_i + 1) if counts.sum() else np.empty(0, np.int64)
            if big.any():
                # star recovery: member → segment-min pairs, verified
                sb = np.flatnonzero(big[seg] & (idx != bounds[seg]))
                pa_i = np.concatenate([pa_i, bounds[seg[sb]]])
                pb_i = np.concatenate([pb_i, sb])
            if not len(pa_i):
                return empty
            d = hamming64(hv[pa_i], hv[pb_i])
            keep = d <= max_hamming
            return pd.DataFrame({
                "image_a": pd.Series(ids[pa_i[keep]], dtype="object"),
                "image_b": pd.Series(ids[pb_i[keep]], dtype="object"),
                "hamming": d[keep].astype("int64")})

        pairs = hashed.map_batches(chunk_rows, batch_format="pandas",
                                   batch_size=None) \
            .repartition(num_blocks=npart, keys=["chunk", "key"]) \
            .map_batches(bucket_pairs, batch_format="pandas",
                         batch_size=None) \
            .repartition(num_blocks=npart, keys=["image_a", "image_b"]) \
            .map_batches(lambda df: df.drop_duplicates(),
                         batch_format="pandas", batch_size=None) \
            .materialize()
    if as_dataset:
        return pairs
    out = pairs.to_pandas().drop_duplicates()
    return out.sort_values(["image_a", "image_b", "hamming"]) \
        .reset_index(drop=True)


class ImageHistogramEmbedActor:
    """Feature-extract stage producing an EMBEDDING per image: 8x8
    nearest-neighbor luminance thumbnail, flattened to a 64-dim
    L2-normalized float32 vector — a real decode→embed path with no
    external model dependency. (Channel HISTOGRAMS were tried first and
    rejected: the synthetic corpus' noise-like pixels make every
    histogram near-uniform, collapsing all cosines within 1e-6 of each
    other — thumbnails keep per-image structure and spread the cosine
    distribution.) Codec dispatch bound at actor init."""

    GRID = 8

    def __init__(self):
        self.decode = codecs.decode

    def embed(self, px: np.ndarray) -> np.ndarray:
        h, w, _ = px.shape
        yi = (np.arange(self.GRID) * h // self.GRID).astype(int)
        xi = (np.arange(self.GRID) * w // self.GRID).astype(int)
        lum = px[yi][:, xi].astype(np.float64).mean(axis=2).reshape(-1)
        n = np.linalg.norm(lum)
        return (lum / n if n else lum).astype(np.float32)

    def __call__(self, batch: pa.Table) -> pa.Table:
        d = batch.to_pydict()
        vecs = [
            self.embed(self.decode(d["bytes"][i], d["fmt"][i],
                                   d["w"][i], d["h"][i]))
            for i in range(len(batch))
        ]
        return pa.table(
            {"image_id": batch["image_id"],
             "embedding": pa.array([v.tolist() for v in vecs],
                                   type=pa.list_(pa.float32()))}
        )


def q_image_knn(sf_dir: str, k: int = 5, n_queries: int = 5) -> pd.DataFrame:
    """Image similarity search — the multimodal↔ANN composite: actor-pool
    decode → histogram embedding → brute-force cosine top-k against a
    broadcast query matrix (the kNN shape of ``ann.q_knn_bruteforce``:
    per-batch matmul + local top-k partials, driver merges k × n_batches
    rows). Queries are the corpus' first ``n_queries`` images; self-
    matches excluded. Rank/id output only (hash-stable); rows-only
    (codec + float scoring not SQL-expressible), golden-pinned."""
    import ray

    spec = CorpusSpec(n_rows=_MM_ROWS, n_hosts=8, seed=_MM_SEED)
    emb = _corpus_ds().map_batches(
        ImageHistogramEmbedActor, batch_format="pyarrow", batch_size=64,
        concurrency=2).materialize()

    q_ids = [spec.url_of(i) for i in range(n_queries)]

    def is_q(df: pd.DataFrame) -> pd.DataFrame:
        return df[df["image_id"].isin(q_ids)]

    qdf = emb.map_batches(is_q, batch_format="pandas",
                          batch_size=None).to_pandas()
    qmat = np.stack(qdf["embedding"].to_numpy())
    q_ref = ray.put((qdf["image_id"].tolist(), qmat))

    def topk_partial(df: pd.DataFrame) -> pd.DataFrame:
        ids, qm = ray.get(q_ref)
        m = np.stack(df["embedding"].to_numpy())
        # float64 matmul: scores must round identically whatever the
        # batch shape (float32 accumulation order shifts the 6th decimal)
        sims = qm.astype(np.float64) @ m.T.astype(np.float64)
        out = []
        cand_ids = df["image_id"].to_numpy()
        for qi, qid in enumerate(ids):
            # round BEFORE ranking so in-batch order, the global merge
            # and any reference recount share one tie-break domain
            s = np.round(sims[qi], 6)
            mask = cand_ids != qid
            idx = np.flatnonzero(mask)
            order = idx[np.lexsort((cand_ids[idx], -s[idx]))][:k]
            for m_i in order:
                out.append((qid, cand_ids[m_i], float(s[m_i])))
        return pd.DataFrame(out, columns=["query_id", "match_id", "cosine"])

    parts = emb.map_batches(topk_partial, batch_format="pandas",
                            batch_size=None).to_pandas()
    # global top-k from per-batch partials; tie-break (cosine desc,
    # match_id asc) mirrors the in-batch lexsort
    parts = parts.sort_values(["query_id", "cosine", "match_id"],
                              ascending=[True, False, True], kind="stable")
    out = parts.groupby("query_id", sort=True).head(k).reset_index(drop=True)
    out.insert(1, "rank", out.groupby("query_id").cumcount().astype("int64"))
    return out[["query_id", "rank", "match_id"]]


def _image_snapshot_dir() -> str:
    """Pinned (image_id, fmt, w, h, bytes) snapshot as parquet — gives
    DuckDB access to the same IMAGE BYTES the Ray pipeline reads, so the
    exact-dedup query gets a full value-hash oracle (the one image
    operator where that is possible: byte equality needs no codec).
    12 duplicate rows are planted deterministically (ids ``dup-k-of-i``
    copying row i's payload; two of them share one source row, making a
    3-copy group) — without them the census would be vacuously empty."""
    import pathlib
    import tempfile

    import pyarrow.parquet as pq

    spec = CorpusSpec(n_rows=_MM_ROWS, n_hosts=8, seed=_MM_SEED)
    base = pathlib.Path(tempfile.gettempdir()) / \
        f"kr_imgsnap_{_MM_SEED}_{_MM_ROWS}"
    marker = base / "_SUCCESS"
    if not marker.exists():
        base.mkdir(parents=True, exist_ok=True)
        t = spec.synth_batch(range(_MM_ROWS)).select(
            ["image_id", "fmt", "w", "h", "bytes"])
        dup_src = [(k * 37) % _MM_ROWS for k in range(11)] + [0]  # 0 twice
        extra = spec.synth_batch(dup_src).select(
            ["image_id", "fmt", "w", "h", "bytes"]).to_pylist()
        for k, row in enumerate(extra):
            row["image_id"] = f"dup-{k}-of-{dup_src[k]}"
        t = pa.concat_tables(
            [t, pa.Table.from_pylist(extra, schema=t.schema)])
        pq.write_table(t, base / "images.parquet")
        marker.touch()
    return str(base)


def q_image_exact_dups(sf_dir: str) -> pd.DataFrame:
    """EXACT image dedup by content digest — the byte-level sibling of
    the perceptual ``q_image_phash_near_dups``: md5 per image inside
    ``map_batches`` (only (digest, id) pairs ever leave the stage — the
    payload never shuffles, the q_dedup_exact shape), group by digest,
    keep groups with >1 copy. Digest convention is
    ``md5(hex(bytes).upper())`` — bit-for-bit what DuckDB's
    ``md5(hex(blob))`` computes, so the oracle re-derives every digest
    from the same parquet bytes with an independent hashing stack.
    Pinned snapshot (312 rows) → driver combine; above a real corpus'
    scale the combine hash-partitions by digest exactly like
    ``dedup.q_dedup_exact``."""
    import hashlib

    snap = _image_snapshot_dir()

    def digest(t: pa.Table) -> pa.Table:
        ids = t["image_id"].to_pylist()
        dg = [hashlib.md5(b.hex().upper().encode()).hexdigest()
              for b in t["bytes"].to_pylist()]
        return pa.table({"image_id": pa.array(ids, type=pa.string()),
                         "digest": pa.array(dg, type=pa.string())})

    df = rd.read_parquet(snap, columns=["image_id", "bytes"]) \
        .map_batches(digest, batch_format="pyarrow", batch_size=64) \
        .to_pandas()
    g = df.groupby("digest", sort=True)
    out = pd.DataFrame({
        "digest": list(g.groups),
        "n_copies": g.size().to_numpy().astype("int64"),
        "first_id": g["image_id"].min().to_numpy(),
    })
    out = out[out["n_copies"] > 1]
    return out.sort_values("digest").reset_index(drop=True)


def q_image_size_stats(sf_dir: str) -> pd.DataFrame:
    """Image metadata census — the triage pass a 100-TB image corpus
    runs before any decode: per (fmt, orientation) image counts, pixel
    and storage totals, and the derived compression density
    (bytes/pixel). All keys and partial sums are computed in zero-copy
    Arrow inside ``map_batches`` (``pyarrow.compute`` only — the
    payload column is reduced to ``binary_length`` per batch and never
    re-shipped); the combine is one row per key per batch. Ratios are
    a single float division of exact integer totals, so the oracle
    (DuckDB ``octet_length`` over the same parquet) is bit-identical."""
    import pyarrow.compute as pc

    from kryptone_ray.pipelines.common import partial_sum_count_arrow

    snap = _image_snapshot_dir()

    def prep(t: pa.Table) -> pa.Table:
        w = pc.cast(t["w"], pa.int64())
        h = pc.cast(t["h"], pa.int64())
        orient = pc.if_else(
            pc.greater(w, h), pa.scalar("landscape"),
            pc.if_else(pc.less(w, h), pa.scalar("portrait"),
                       pa.scalar("square")))
        return pa.table({
            "fmt": t["fmt"],
            "orient": orient,
            "w64": w,
            "pixels": pc.multiply(w, h),
            "blen": pc.cast(pc.binary_length(t["bytes"]), pa.int64()),
        })

    ds = rd.read_parquet(snap, columns=["fmt", "w", "h", "bytes"]) \
        .map_batches(prep, batch_format="pyarrow", batch_size=128)
    out = partial_sum_count_arrow(
        ds, keys=["fmt", "orient"],
        sums={"sum_w": "w64", "total_pixels": "pixels",
              "total_bytes": "blen"},
        count_name="n_images")
    out["avg_w"] = out["sum_w"] / out["n_images"]
    out["bytes_per_pixel"] = out["total_bytes"] / out["total_pixels"]
    out = out[["fmt", "orient", "n_images", "total_pixels",
               "total_bytes", "avg_w", "bytes_per_pixel"]]
    return out.sort_values(["fmt", "orient"]).reset_index(drop=True)


def image_size_stats_oracle_sql() -> str:
    snap = _image_snapshot_dir()
    return f"""
SELECT fmt,
       CASE WHEN w > h THEN 'landscape'
            WHEN w < h THEN 'portrait' ELSE 'square' END AS orient,
       count(*) AS n_images,
       CAST(sum(CAST(w AS BIGINT) * h) AS BIGINT) AS total_pixels,
       CAST(sum(octet_length(bytes)) AS BIGINT) AS total_bytes,
       CAST(sum(CAST(w AS BIGINT)) AS DOUBLE) / count(*) AS avg_w,
       CAST(sum(octet_length(bytes)) AS DOUBLE)
           / sum(CAST(w AS BIGINT) * h) AS bytes_per_pixel
FROM read_parquet('{snap}/images.parquet')
GROUP BY fmt, orient ORDER BY fmt, orient
"""


def image_exact_dups_oracle_sql() -> str:
    snap = _image_snapshot_dir()
    return f"""
SELECT md5(hex(bytes)) AS digest, count(*) AS n_copies,
       min(image_id) AS first_id
FROM read_parquet('{snap}/images.parquet')
GROUP BY digest HAVING count(*) > 1
ORDER BY digest
"""


def _image_quarantine_dir() -> str:
    """Snapshot with deterministically PLANTED damage for the decode
    triage: rows ``i % 7 == 3`` are truncated to 3/4 of their payload
    (kills raw/qraw size and the png IDAT/IEND tail), png rows
    ``i % 7 == 5`` get their first signature byte zeroed (bad magic,
    trailer intact — so the oracle must test magic before trailer,
    exactly like the decoder does)."""
    import pathlib
    import tempfile

    import pyarrow.parquet as pq

    spec = CorpusSpec(n_rows=_MM_ROWS, n_hosts=8, seed=_MM_SEED)
    base = pathlib.Path(tempfile.gettempdir()) / \
        f"kr_imgquar_{_MM_SEED}_{_MM_ROWS}"
    marker = base / "_SUCCESS"
    if not marker.exists():
        base.mkdir(parents=True, exist_ok=True)
        rows = spec.synth_batch(range(_MM_ROWS)).select(
            ["image_id", "fmt", "w", "h", "bytes"]).to_pylist()
        for i, row in enumerate(rows):
            if i % 7 == 3:
                b = row["bytes"]
                row["bytes"] = b[: len(b) * 3 // 4]
            elif i % 7 == 5 and row["fmt"] == "png":
                row["bytes"] = b"\x00" + row["bytes"][1:]
        pq.write_table(pa.Table.from_pylist(rows), base / "images.parquet")
        marker.touch()
    return str(base)


class DecodeTriageActor:
    """Quarantine classifier: genuinely ATTEMPT the decode per row and
    classify the failure — 'bad_magic' (signature rejected before any
    parsing) vs 'truncated' (parse/inflate/reshape died mid-stream) vs
    'ok'. Codec dispatch bound once per actor."""

    def __init__(self):
        self.decode = codecs.decode

    def __call__(self, t: pa.Table) -> pa.Table:
        d = t.to_pydict()
        status = []
        for i in range(len(t)):
            try:
                self.decode(d["bytes"][i], d["fmt"][i], d["w"][i], d["h"][i])
                status.append("ok")
            except AssertionError as e:
                status.append("bad_magic" if "not a PNG" in str(e)
                              else "truncated")
            except Exception:
                status.append("truncated")
        blen = [len(b) for b in d["bytes"]]
        return pa.table({
            "fmt": t["fmt"],
            "status": pa.array(status, type=pa.string()),
            "blen": pa.array(blen, type=pa.int64()),
        })


def q_image_decode_quarantine(sf_dir: str) -> pd.DataFrame:
    """Corrupt-input QUARANTINE census — the triage a 100-TB image
    ingest runs to route undecodable payloads out of the pipeline:
    actor-pool decode attempts classify every row (nothing but
    (fmt, status, len) leaves the stage), then a grouped census.
    The oracle re-derives every verdict from pure byte predicates
    (payload length vs w*h*3 for raw/qraw; PNG signature and IEND
    trailer bytes for png) — decode attempt vs byte forensics must
    agree row-for-row or the counts diverge."""
    snap = _image_quarantine_dir()
    ds = rd.read_parquet(snap, columns=["fmt", "w", "h", "bytes"]) \
        .map_batches(DecodeTriageActor, batch_format="pyarrow",
                     batch_size=64, concurrency=2)
    df = ds.to_pandas()
    g = df.groupby(["fmt", "status"], sort=True)
    out = g.agg(n=("blen", "size"), total_bytes=("blen", "sum")) \
        .reset_index()
    out["n"] = out["n"].astype("int64")
    out["total_bytes"] = out["total_bytes"].astype("int64")
    return out.sort_values(["fmt", "status"]).reset_index(drop=True)


def image_decode_quarantine_oracle_sql() -> str:
    snap = _image_quarantine_dir()
    return f"""
SELECT fmt, status, count(*) AS n,
       CAST(sum(octet_length(bytes)) AS BIGINT) AS total_bytes
FROM (
    SELECT fmt, bytes, CASE
        WHEN fmt IN ('raw', 'qraw') THEN
            CASE WHEN octet_length(bytes) = CAST(w AS BIGINT) * h * 3
                 THEN 'ok' ELSE 'truncated' END
        ELSE
            CASE WHEN substring(hex(bytes), 1, 16) <> '89504E470D0A1A0A'
                     THEN 'bad_magic'
                 WHEN substring(hex(bytes), 2 * octet_length(bytes) - 23, 24)
                     <> '0000000049454E44AE426082' THEN 'truncated'
                 ELSE 'ok' END
    END AS status
    FROM read_parquet('{snap}/images.parquet')
) GROUP BY fmt, status ORDER BY fmt, status
"""


def _caption_snapshot_dir() -> str:
    """(image_id, caption, bytes) snapshot with PLANTED caption reuse:
    rows ``i % 31 == 7`` take row (i-7)'s caption while keeping their
    own payload — the "same alt-text, different image" shape a real
    crawl produces from templated pages."""
    import pathlib
    import tempfile

    import pyarrow.parquet as pq

    spec = CorpusSpec(n_rows=_MM_ROWS, n_hosts=8, seed=_MM_SEED)
    base = pathlib.Path(tempfile.gettempdir()) / \
        f"kr_imgcap_{_MM_SEED}_{_MM_ROWS}"
    marker = base / "_SUCCESS"
    if not marker.exists():
        base.mkdir(parents=True, exist_ok=True)
        rows = spec.synth_batch(range(_MM_ROWS)).select(
            ["image_id", "caption", "bytes"]).to_pylist()
        for i in range(_MM_ROWS):
            if i % 31 == 7 and i >= 7:
                rows[i]["caption"] = rows[i - 7]["caption"]
        pq.write_table(pa.Table.from_pylist(rows), base / "images.parquet")
        marker.touch()
    return str(base)


def q_caption_image_mismatch(sf_dir: str) -> pd.DataFrame:
    """Multimodal dedup census: captions attached to MORE THAN ONE
    distinct image payload (templated alt-text reuse). Per batch each
    row reduces to (caption-digest, payload-digest, id) and the partial
    groups by the digest pair — text and payload both stay in their
    blocks. The combine is associative (sum counts, min ids, then
    count distinct payload digests per caption)."""
    import hashlib

    snap = _caption_snapshot_dir()

    def partial(t: pa.Table) -> pd.DataFrame:
        cap = [hashlib.md5(c.encode()).hexdigest()
               for c in t["caption"].to_pylist()]
        img = [hashlib.md5(b.hex().upper().encode()).hexdigest()
               for b in t["bytes"].to_pylist()]
        df = pd.DataFrame({"cap_digest": cap, "img_digest": img,
                           "image_id": t["image_id"].to_pylist()})
        g = df.groupby(["cap_digest", "img_digest"], sort=False)
        return g.agg(n=("image_id", "size"),
                     first_id=("image_id", "min")).reset_index()

    parts = rd.read_parquet(snap) \
        .map_batches(partial, batch_format="pyarrow", batch_size=64) \
        .to_pandas()
    pair = parts.groupby(["cap_digest", "img_digest"], sort=False).agg(
        n=("n", "sum"), first_id=("first_id", "min")).reset_index()
    g = pair.groupby("cap_digest", sort=True)
    out = pd.DataFrame({
        "cap_digest": list(g.groups),
        "n_images": g["n"].sum().to_numpy().astype("int64"),
        "n_payloads": g.size().to_numpy().astype("int64"),
        "first_id": g["first_id"].min().to_numpy(),
    })
    out = out[out["n_payloads"] > 1]
    return out.sort_values("cap_digest").reset_index(drop=True)


def caption_image_mismatch_oracle_sql() -> str:
    snap = _caption_snapshot_dir()
    return f"""
SELECT md5(caption) AS cap_digest, count(*) AS n_images,
       count(DISTINCT md5(hex(bytes))) AS n_payloads,
       min(image_id) AS first_id
FROM read_parquet('{snap}/images.parquet')
GROUP BY cap_digest HAVING count(DISTINCT md5(hex(bytes))) > 1
ORDER BY cap_digest
"""


def _wds_src_dir() -> str:
    """Pinned (image_id, fmt, w, h, bytes, caption) snapshot for the
    WebDataset export — parquet so DuckDB groups the same rows the
    tars are packed from. No planted duplicates here: tar member names
    are keyed by the Knuth hash of the row index, which must be
    unique."""
    import pathlib
    import tempfile

    import pyarrow.parquet as pq

    spec = CorpusSpec(n_rows=_MM_ROWS, n_hosts=8, seed=_MM_SEED)
    base = pathlib.Path(tempfile.gettempdir()) / \
        f"kr_wds_src_{_MM_SEED}_{_MM_ROWS}"
    marker = base / "_SUCCESS"
    if not marker.exists():
        base.mkdir(parents=True, exist_ok=True)
        t = spec.synth_batch(range(_MM_ROWS)).select(
            ["image_id", "fmt", "w", "h", "bytes", "caption"])
        pq.write_table(t, base / "images.parquet")
        marker.touch()
    return str(base)


_WDS_KN = np.int64(2654435761)
_WDS_SHARDS = 4


def q_image_wds_export(sf_dir: str, n_shards: int = _WDS_SHARDS) -> pd.DataFrame:
    """WEBDATASET-STYLE TAR SHARD EXPORT — the standard packaging for
    multimodal training corpora: each sample becomes two adjacent tar
    members, ``{key}.{fmt}`` (raw image payload) and ``{key}.txt``
    (UTF-8 caption), and a shard is one tar file a dataloader streams
    sequentially. Shard assignment + within-shard order are the
    REPRODUCIBLE hash-order recipe of q_training_shard_export (Knuth
    multiplicative hash of the row index — deterministic across runs,
    engines and partitionings; the hash key doubles as the sample key,
    injective because the multiplier is odd). Rows hash-partition by
    shard so ALL rows of a shard land in one block (the join_partitions
    sizing invariant); one task writes each tar with zeroed
    mtime/uid/gid → byte-identical re-runs, temp-file + rename commit,
    a sealed ``.ok`` shard is skipped on resume. The returned aggregate
    is computed by READING THE TARS BACK member by member, so the
    oracle match (counts + payload bytes + caption bytes + hash sums
    per shard, vs SQL over the source parquet) proves the WRITTEN
    FILES: nothing lost, duplicated, misplaced or truncated."""
    import hashlib
    import io
    import pathlib
    import tarfile

    from kryptone_ray.pipelines.common import hash_shuffle

    snap = _wds_src_dir()
    tag = hashlib.sha1(f"{snap}|{n_shards}".encode()).hexdigest()[:10]
    out = pathlib.Path(f"/tmp/kr_wds_shards_{tag}")
    # NO wipe: the output dir is keyed by (source snapshot, shard
    # count) and tars are byte-deterministic, so a sealed (.ok) shard
    # from a previous or killed run is exactly what this run would
    # write — resume skips it; an unsealed/corrupt shard is rewritten
    # through the temp-file + rename commit.
    out.mkdir(parents=True, exist_ok=True)

    def assign(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        idx = pc.cast(
            pc.struct_field(
                pc.extract_regex(t["image_id"],
                                 r"/(?P<i>[0-9]+)(?:\.[a-z]+)?$"), "i"),
            pa.int64()).to_numpy()
        h = (idx * _WDS_KN) % np.int64(1 << 32)
        return t.append_column("hkey", pa.array(h)) \
            .append_column("shard", pa.array(h % n_shards))

    def write_shard_tars(df: pd.DataFrame) -> pd.DataFrame:
        rows = []
        for shard, g in df.groupby("shard", sort=True):
            g = g.sort_values("hkey")
            path = out / f"shard-{int(shard):05d}.tar"
            ok = out / f"shard-{int(shard):05d}.ok"
            if not ok.exists():
                tmp = path.with_suffix(".tar.tmp")
                with tarfile.open(tmp, "w") as tf:
                    for r in g.itertuples(index=False):
                        key = f"{int(r.hkey):010d}"
                        for name, payload in (
                                (f"{key}.{r.fmt}", bytes(r.bytes)),
                                (f"{key}.txt", r.caption.encode())):
                            ti = tarfile.TarInfo(name=name)
                            ti.size = len(payload)
                            ti.mtime = 0
                            ti.uid = ti.gid = 0
                            ti.uname = ti.gname = ""
                            tf.addfile(ti, io.BytesIO(payload))
                tmp.rename(path)
                ok.touch()
            rows.append({"shard": int(shard)})
        return pd.DataFrame(rows)

    with hash_shuffle():
        written = rd.read_parquet(snap) \
            .map_batches(assign, batch_format="pyarrow",
                         batch_size=65536) \
            .repartition(num_blocks=n_shards, keys=["shard"]) \
            .map_batches(write_shard_tars, batch_format="pandas",
                         batch_size=None).to_pandas()
    assert sorted(written["shard"]) == list(range(n_shards))

    def read_back(df: pd.DataFrame) -> pd.DataFrame:
        recs = []
        for p in df["path"]:
            shard = int(pathlib.Path(p).stem.split("-")[1])
            n = pb = cb = hs = 0
            with tarfile.open(p) as tf:
                for m in tf.getmembers():
                    key, ext = m.name.split(".", 1)
                    if ext == "txt":
                        cb += m.size
                    else:
                        pb += m.size
                        n += 1
                        hs += int(key)
            recs.append({"shard": shard, "n_items": n,
                         "payload_bytes": pb, "caption_bytes": cb,
                         "hash_sum": hs})
        return pd.DataFrame(recs)

    paths = sorted(str(p) for p in out.glob("shard-*.tar"))
    agg = rd.from_items([{"path": p} for p in paths]) \
        .map_batches(read_back, batch_format="pandas", batch_size=1) \
        .to_pandas()
    for c in ["shard", "n_items", "payload_bytes", "caption_bytes",
              "hash_sum"]:
        agg[c] = agg[c].astype("int64")
    return agg.sort_values("shard").reset_index(drop=True)


def image_wds_export_oracle_sql() -> str:
    snap = _wds_src_dir()
    return rf"""
WITH x AS (
  SELECT CAST(regexp_extract(image_id, '/([0-9]+)(\.[a-z]+)?$', 1) AS BIGINT) AS idx,
         octet_length(bytes) AS pb, strlen(caption) AS cb
  FROM read_parquet('{snap}/images.parquet')),
     y AS (SELECT (idx * 2654435761) % 4294967296 AS h, pb, cb FROM x)
SELECT CAST(h % {_WDS_SHARDS} AS BIGINT) AS shard, count(*) AS n_items,
       CAST(sum(pb) AS BIGINT) AS payload_bytes,
       CAST(sum(cb) AS BIGINT) AS caption_bytes,
       CAST(sum(h) AS BIGINT) AS hash_sum
FROM y GROUP BY shard ORDER BY shard
"""


def q_image_neardup_clusters(sf_dir: str) -> pd.DataFrame:
    """Image near-duplicate CLUSTERS: union-find over the verified
    aHash pair list of q_image_phash_near_dups — the image-side twin of
    dedup.q_neardup_clusters (same driver union-find: the pair list is
    density-bounded, never corpus-sized). Output: one row per cluster,
    keyed by its lexicographically-smallest image_id. Rows-only (pixel
    codecs aren't SQL-expressible); the planted-duplicate structure is
    pinned in tests."""
    from kryptone_ray.pipelines import dedup as _dedup

    pairs = _image_phash_pairs(sf_dir, as_dataset=True)
    if not isinstance(pairs, pd.DataFrame):
        # distributed pair Dataset: cluster without landing the pair
        # list on the driver — unless it is union-find-sized anyway
        if pairs.count() > _dedup.UNIONFIND_MAX_PAIRS:
            return _image_clusters_distributed(pairs)
        pairs = pairs.to_pandas().drop_duplicates() \
            .sort_values(["image_a", "image_b", "hamming"]) \
            .reset_index(drop=True)
    if pairs.empty:
        return pd.DataFrame({"representative": pd.Series([], dtype=str),
                             "n_members": pd.Series([], dtype="int64")})
    # int-code the string ids by SORTED rank (np.unique), so min code ↔
    # min string id and both clustering paths agree on representatives
    all_ids = pd.concat([pairs["image_a"], pairs["image_b"]],
                        ignore_index=True).to_numpy()
    uniq = np.unique(all_ids)
    codes = np.searchsorted(uniq, all_ids)
    n = len(pairs)
    int_pairs = pd.DataFrame({"a": codes[:n], "b": codes[n:]})

    from kryptone_ray.pipelines import dedup as _dedup

    if len(int_pairs) > _dedup.UNIONFIND_MAX_PAIRS:
        # pair graph past driver size: distributed min-label propagation
        # (dedup._label_prop_clusters — the q_graph_components shape)
        out = _dedup._label_prop_clusters(int_pairs, "a", "b")
        out["representative"] = uniq[out["representative"].to_numpy()]
        return out.sort_values("representative").reset_index(drop=True)
    import collections
    adj = collections.defaultdict(set)
    for a, b in zip(int_pairs["a"], int_pairs["b"]):
        adj[a].add(b)
        adj[b].add(a)
    seen: set = set()
    rows = []
    for start in adj:
        if start in seen:
            continue
        comp, stack = [], [start]
        seen.add(start)
        while stack:
            x = stack.pop()
            comp.append(x)
            for y in adj[x]:
                if y not in seen:
                    seen.add(y)
                    stack.append(y)
        rows.append((min(uniq[c] for c in comp), len(comp)))
    out = pd.DataFrame(sorted(rows),
                       columns=["representative", "n_members"])
    out["n_members"] = out["n_members"].astype("int64")
    return out


def _image_clusters_distributed(pairs_ds) -> pd.DataFrame:
    """Dataset-native image near-dup clustering: string image_ids code
    to int64 via XXH64 (no global rank table — a sorted-rank coding
    would itself need a driver-sized unique pass), labels propagate
    with ``dedup._label_prop_labels``, and the per-cluster census joins
    the converged labels back to the (hash, image_id) node names so the
    representative is the MIN IMAGE_ID STRING per cluster — identical
    to the union-find output. The 64-bit id-hash collision probability
    (~n²/2⁶⁵) is the documented residual, the same one the n-gram
    census accepts for non-latin-1 grams."""
    from kryptone_ray.pipelines import dedup as _dedup
    from kryptone_ray.pipelines.common import hash_shuffle
    from kryptone_ray.utils.xxh64 import xxh64_batch

    def code_edges(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({
            "a": xxh64_batch(df["image_a"].tolist()).astype("int64"),
            "b": xxh64_batch(df["image_b"].tolist()).astype("int64")})

    with hash_shuffle():
        edges = pairs_ds.map_batches(code_edges, batch_format="pandas",
                                     batch_size=None)
        labels, npart = _dedup._label_prop_labels(edges, "a", "b")

        def node_names(df: pd.DataFrame) -> pd.DataFrame:
            ids = pd.concat([df["image_a"], df["image_b"]],
                            ignore_index=True).drop_duplicates()
            return pd.DataFrame({
                "nh": xxh64_batch(ids.tolist()).astype("int64"),
                "image_id": pd.Series(ids.to_numpy(), dtype="object")})

        names = pairs_ds.map_batches(node_names, batch_format="pandas",
                                     batch_size=None) \
            .repartition(num_blocks=npart, keys=["nh"]) \
            .map_batches(lambda df: df.drop_duplicates(),
                         batch_format="pandas", batch_size=None)
        j = labels.join(names, "inner", num_partitions=npart,
                        on=("pr_v",), right_on=("nh",))

        # per-cluster partials: min image_id (string min is associative)
        # + node count; only the cluster-count-bounded table lands
        def census_partial(df: pd.DataFrame) -> pd.DataFrame:
            g = df.groupby("lab", sort=False)["image_id"]
            return pd.DataFrame({"rep": g.min(),
                                 "n": g.size()}).reset_index()

        def census_combine(df: pd.DataFrame) -> pd.DataFrame:
            g = df.groupby("lab", sort=False)
            return pd.DataFrame({
                "representative": g["rep"].min(),
                "n_members": g["n"].sum().astype("int64")
            }).reset_index(drop=True)

        out = j.map_batches(census_partial, batch_format="pandas",
                            batch_size=None) \
            .repartition(num_blocks=npart, keys=["lab"]) \
            .map_batches(census_combine, batch_format="pandas",
                         batch_size=None).to_pandas()
    return out.sort_values("representative").reset_index(drop=True)


_SCAN_ROWS = 2000
_SCAN_SEED = 77


def _scan_corpus_dir() -> str:
    """Deterministic SINGLE-COPY corpus snapshot for the scan query —
    payload bytes exist only in the .blob sidecars, so the oracle match
    below proves the Datasource's blob stitching, not just parquet IO."""
    import pathlib
    import tempfile

    from kryptone_ray.corpus.store import write_corpus
    from kryptone_ray.corpus.synth import make_corpus_table

    base = pathlib.Path(tempfile.gettempdir()) / \
        f"kr_scan_corpus_{_SCAN_SEED}_{_SCAN_ROWS}"
    if not (base / "_SUCCESS").exists():
        spec = CorpusSpec(n_rows=_SCAN_ROWS, n_hosts=8, seed=_SCAN_SEED)
        write_corpus(make_corpus_table(spec), base, num_shards=4,
                     single_copy=True)
        (base / "_SUCCESS").touch()
    return str(base)


def q_corpus_scan_stats(sf_dir: str) -> pd.DataFrame:
    """FULL-SCAN the stored corpus through the Ray-native Datasource
    (`corpus/store.read_corpus` — the Lance `scanner()` face of the
    store): per-format row counts and total PAYLOAD bytes, where the
    payload lengths are measured from the blob-stitched ``bytes``
    column the scan materialized — the DuckDB oracle reads the same
    shards' ``bytes_len`` metadata column, so a hash match proves every
    sidecar byte range arrived intact through the Dataset path."""
    from kryptone_ray.corpus.store import read_corpus

    def partial(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        lens = pc.binary_length(t["bytes"])
        g = pa.table({"fmt": t["fmt"], "blen": pc.cast(lens, pa.int64())}) \
            .group_by(["fmt"], use_threads=False) \
            .aggregate([("blen", "sum"), ("blen", "count")])
        return g.rename_columns(["fmt", "total_bytes", "n"])

    parts = read_corpus(_scan_corpus_dir(), columns=["fmt", "bytes"]) \
        .map_batches(partial, batch_format="pyarrow",
                     batch_size=None).to_pandas()
    g = parts.groupby("fmt", sort=True)
    return pd.DataFrame({
        "fmt": g.size().index,
        "n": g["n"].sum().astype("int64").to_numpy(),
        "total_bytes": g["total_bytes"].sum().astype("int64").to_numpy()})


def corpus_scan_oracle_sql() -> str:
    d = _scan_corpus_dir()
    return f"""
SELECT fmt, count(*) AS n, CAST(sum(bytes_len) AS BIGINT) AS total_bytes
FROM read_parquet('{d}/*.parquet') GROUP BY fmt ORDER BY fmt
"""


class ThumbCorpusActor:
    """Actor-pool stage deriving a THUMBNAIL CORPUS row from each source
    row: decode (dispatch bound at init) → 16×16 nearest-neighbor
    resize → raw re-encode, carrying the caption through and stamping
    the thumb's content hash as the new ``phash`` — the full corpus
    schema (input_hint), so the output is directly ingestible by
    ``write_corpus_distributed``."""

    def __init__(self, out_w: int = 16, out_h: int = 16):
        from kryptone_ray.utils.xxh64 import content_hash64

        self.decode = codecs.decode
        self.hash = content_hash64
        self.out_w, self.out_h = out_w, out_h

    def __call__(self, batch: pa.Table) -> pa.Table:
        d = batch.to_pydict()
        thumbs, hashes = [], []
        for i in range(len(batch)):
            px = self.decode(d["bytes"][i], d["fmt"][i],
                             d["w"][i], d["h"][i])
            h, w, _ = px.shape
            yi = (np.arange(self.out_h) * h // self.out_h).astype(int)
            xi = (np.arange(self.out_w) * w // self.out_w).astype(int)
            thumb = px[yi][:, xi]
            thumbs.append(codecs.encode_raw(thumb))
            hashes.append(np.uint64(self.hash(thumb.tobytes()))
                          .astype(np.int64))
        n = len(batch)
        return pa.table({
            "image_id": batch["image_id"],
            "bytes": pa.array(thumbs, type=pa.binary()),
            "w": pa.array([self.out_w] * n, type=pa.int32()),
            "h": pa.array([self.out_h] * n, type=pa.int32()),
            "fmt": pa.array(["raw"] * n, type=pa.string()),
            "caption": batch["caption"],
            "phash": pa.array(hashes, type=pa.int64()),
        })


def q_corpus_thumbs_roundtrip(sf_dir: str) -> pd.DataFrame:
    """END-TO-END IMAGE PIPELINE OVER THE STORE — the image-training
    shape the input_hint describes, with the store on BOTH ends:
    Datasource full scan of the single-copy source corpus → actor-pool
    decode/resize → distributed single-copy corpus write (sort-shuffle
    range partitioning, blob sidecars) → verified by reading the NEW
    corpus back through BOTH access paths (full Datasource scan for the
    census, indexed ``take_urls`` spot-checks in tests). Rows-only
    (codecs aren't SQL); the census is deterministic."""
    import hashlib
    import pathlib
    import shutil

    from kryptone_ray.corpus.store import (add_key, read_corpus,
                                           write_corpus_distributed)

    src = _scan_corpus_dir()
    # cache key carries every input the transform depends on — a dims or
    # source change regenerates instead of serving a stale corpus
    out = pathlib.Path(
        f"/tmp/kr_thumb_corpus_{_SCAN_SEED}_{_SCAN_ROWS}_16x16")
    marker = out / "_DONE"
    if not marker.exists():
        shutil.rmtree(out, ignore_errors=True)
        ds = read_corpus(src) \
            .map_batches(ThumbCorpusActor, batch_format="pyarrow",
                         batch_size=64, concurrency=2) \
            .map_batches(add_key, batch_format="pyarrow", batch_size=None)
        write_corpus_distributed(ds, out, single_copy=True)
        marker.touch()

    def census(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        return pa.table({
            "n": pa.array([len(t)], type=pa.int64()),
            "total_bytes": pa.array(
                [int(pc.sum(pc.binary_length(t["bytes"])).as_py())],
                type=pa.int64()),
            "phash_xor": pa.array(
                [int(np.bitwise_xor.reduce(
                    t["phash"].to_numpy().astype(np.uint64)).astype(np.int64))
                 if len(t) else 0], type=pa.int64()),
        })

    parts = read_corpus(str(out), columns=["bytes", "phash"]) \
        .map_batches(census, batch_format="pyarrow",
                     batch_size=None).to_pandas()
    return pd.DataFrame({
        "n_thumbs": [int(parts["n"].sum())],
        "total_bytes": [int(parts["total_bytes"].sum())],
        "phash_xor": [int(np.bitwise_xor.reduce(
            parts["phash_xor"].to_numpy().astype(np.uint64))
            .astype(np.int64))],
    })
