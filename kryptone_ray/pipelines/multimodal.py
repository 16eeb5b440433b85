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
from kryptone_ray.corpus.synth import CORPUS_SCHEMA, CorpusSpec

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
