"""Fetch + decode stages — the actor-pool replacement for the reference's
Selenium navigation (``/root/reference/kryptone/base.py:1096-1114``) and
PIL image handling (``base.py:363-471``).

A "fetch" is an indexed corpus lookup (``CorpusReader.take_urls``) — no
live network in this design; the corpus IS the web (BASELINE.json
input_hint). Both stages are plain functions over Arrow tables plus thin
callable-class wrappers for ``map_batches(Cls, concurrency=N)`` — the
class holds the open corpus handles / codec tables ONCE per actor.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from kryptone_ray.corpus import codecs
from kryptone_ray.corpus.store import CorpusReader
from kryptone_ray.utils.xxh64 import xxh64

FETCH_STATUS_OK = "ok"
FETCH_STATUS_MISSING = "missing"  # reference: skip-and-continue on fetch
# errors (base.py:1096-1101) — recorded as a status row, never raised.


def fetch_table(reader: CorpusReader, batch: pa.Table) -> pa.Table:
    """Join a released frontier batch (url, depth, visit_idx, ts, batch_idx)
    with its corpus rows. Missing URLs produce status='missing' rows with
    null payloads."""
    urls = batch["url"].to_pylist()
    hit = reader.take_urls(urls)
    by_url = {}
    if len(hit):
        cols = hit.to_pydict()
        for i, u in enumerate(cols["image_id"]):
            by_url[u] = i

    n = len(urls)
    out = {
        "url": urls,
        "depth": batch["depth"].to_pylist(),
        "visit_idx": batch["visit_idx"].to_pylist(),
        "ts": batch["ts"].to_pylist(),
        "batch_idx": batch["batch_idx"].to_pylist(),
        "status": [FETCH_STATUS_OK if u in by_url else FETCH_STATUS_MISSING for u in urls],
        "bytes": [None] * n,
        "w": [0] * n,
        "h": [0] * n,
        "fmt": [""] * n,
        "caption": [None] * n,
        "phash": [0] * n,
    }
    if by_url:
        cols = hit.to_pydict()
        for i, u in enumerate(urls):
            j = by_url.get(u)
            if j is None:
                continue
            out["bytes"][i] = cols["bytes"][j]
            out["w"][i] = cols["w"][j]
            out["h"][i] = cols["h"][j]
            out["fmt"][i] = cols["fmt"][j]
            out["caption"][i] = cols["caption"][j]
            out["phash"][i] = cols["phash"][j]
    return pa.table(
        {
            "url": pa.array(out["url"], type=pa.string()),
            "depth": pa.array(out["depth"], type=pa.int32()),
            "visit_idx": pa.array(out["visit_idx"], type=pa.int64()),
            "ts": pa.array(out["ts"], type=pa.float64()),
            "batch_idx": pa.array(out["batch_idx"], type=pa.int64()),
            "status": pa.array(out["status"], type=pa.string()),
            "bytes": pa.array(out["bytes"], type=pa.binary()),
            "w": pa.array(out["w"], type=pa.int32()),
            "h": pa.array(out["h"], type=pa.int32()),
            "fmt": pa.array(out["fmt"], type=pa.string()),
            "caption": pa.array(out["caption"], type=pa.string()),
            "phash": pa.array(out["phash"], type=pa.int64()),
        }
    )


def decode_table(batch: pa.Table) -> pa.Table:
    """Decode image bytes, verify the per-row invariant material, DROP the
    heavy binary column (bytes leave the pipeline here — everything
    downstream is metadata-sized).

    Emits ``decoded_phash`` (xxh64 of decoded pixels — equals ``phash``
    for lossless formats) and ``px_mean``; the PSNR≥40dB assertion against
    the original pixels lives in the test suite (the engine does not know
    the pre-encode pixels at fetch time).
    """
    n = len(batch)
    dec_hash = np.zeros(n, dtype=np.int64)
    px_mean = np.zeros(n, dtype=np.float64)
    ok = np.zeros(n, dtype=bool)
    data = batch.to_pydict()
    for i in range(n):
        b = data["bytes"][i]
        if b is None or data["status"][i] != FETCH_STATUS_OK:
            continue
        try:
            px = codecs.decode(b, data["fmt"][i], data["w"][i], data["h"][i])
        except Exception:
            continue
        dec_hash[i] = np.uint64(xxh64(px.tobytes())).astype(np.int64)
        px_mean[i] = float(px.mean())
        ok[i] = True
    out = batch.drop_columns(["bytes"])
    out = out.append_column("decoded_ok", pa.array(ok))
    out = out.append_column("decoded_phash", pa.array(dec_hash, type=pa.int64()))
    out = out.append_column("px_mean", pa.array(px_mean, type=pa.float64()))
    return out


class FetchActor:
    """``map_batches`` actor: corpus handles opened once per actor."""

    def __init__(self, corpus_dir: str):
        self.reader = CorpusReader(corpus_dir)

    def __call__(self, batch: pa.Table) -> pa.Table:
        return fetch_table(self.reader, batch)


class DecodeActor:
    """``map_batches`` actor for decode+verify (codec tables are module
    state; the class exists so the stage runs in a reusable actor pool)."""

    def __call__(self, batch: pa.Table) -> pa.Table:
        return decode_table(batch)
