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
from kryptone_ray.utils.xxh64 import content_hash64

FETCH_STATUS_OK = "ok"
FETCH_STATUS_MISSING = "missing"  # reference: skip-and-continue on fetch
# errors (base.py:1096-1101) — recorded as a status row, never raised.


def fetch_table(reader: CorpusReader, batch: pa.Table) -> pa.Table:
    """Join a released frontier batch (url, depth, visit_idx, ts, batch_idx)
    with its corpus rows — fully vectorized (``pc.index_in`` hash join on
    the url strings). Missing URLs produce status='missing' rows with
    null payloads."""
    urls_col = batch["url"]
    if isinstance(urls_col, pa.ChunkedArray):
        urls_col = urls_col.combine_chunks()
    hit = reader.take_urls(urls_col.to_pylist())

    n = len(batch)
    out = {
        "url": urls_col,
        "depth": batch["depth"],
        "visit_idx": batch["visit_idx"],
        "ts": batch["ts"],
        "batch_idx": batch["batch_idx"],
    }
    if len(hit) == 0:
        out["status"] = pa.array([FETCH_STATUS_MISSING] * n, type=pa.string())
        out["bytes"] = pa.nulls(n, type=pa.binary())
        out["w"] = pa.array([0] * n, type=pa.int32())
        out["h"] = pa.array([0] * n, type=pa.int32())
        out["fmt"] = pa.array([""] * n, type=pa.string())
        out["caption"] = pa.nulls(n, type=pa.string())
        out["phash"] = pa.array([0] * n, type=pa.int64())
        return pa.table(out)

    idx = pc.index_in(urls_col, value_set=hit["image_id"].combine_chunks()
                      if isinstance(hit["image_id"], pa.ChunkedArray)
                      else hit["image_id"])
    miss = pc.is_null(idx)
    safe = pc.fill_null(idx, 0)
    out["status"] = pc.if_else(
        miss, pa.scalar(FETCH_STATUS_MISSING), pa.scalar(FETCH_STATUS_OK)
    )
    for src, dst, null_fill in (
        ("bytes", "bytes", None),
        ("w", "w", 0),
        ("h", "h", 0),
        ("fmt", "fmt", ""),
        ("caption", "caption", None),
        ("phash", "phash", 0),
    ):
        col = hit[src].take(safe)
        if null_fill is None:
            col = pc.if_else(miss, pa.scalar(None, type=col.type), col)
        else:
            col = pc.if_else(miss, pa.scalar(null_fill, type=col.type), col)
        out[dst] = col
    return pa.table(out)


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
    col_bytes = batch["bytes"].to_pylist()
    col_fmt = batch["fmt"].to_pylist()
    col_w = batch["w"].to_pylist()
    col_h = batch["h"].to_pylist()
    col_status = batch["status"].to_pylist()
    for i in range(n):
        b = col_bytes[i]
        if b is None or col_status[i] != FETCH_STATUS_OK:
            continue
        try:
            px = codecs.decode(b, col_fmt[i], col_w[i], col_h[i])
        except Exception:
            continue
        dec_hash[i] = np.uint64(content_hash64(px.tobytes())).astype(np.int64)
        px_mean[i] = float(px.mean())
        ok[i] = True
    out = batch.drop_columns(["bytes"])
    out = out.append_column("decoded_ok", pa.array(ok))
    out = out.append_column("decoded_phash", pa.array(dec_hash, type=pa.int64()))
    out = out.append_column("px_mean", pa.array(px_mean, type=pa.float64()))
    return out


class FetchActor:
    """``map_batches`` actor: corpus handles opened once per actor.

    Like the reference's browser launch (base.py:100 — one
    ``RANDOM_USER_AGENT()`` per browser instance), each actor draws ONE
    user agent at construction; ``user_agent_seed`` pins the draw for
    reproducible pools (None = nondeterministic, reference behavior).
    The synthetic corpus ignores request headers, so the agent is
    politeness metadata only — outputs are agent-independent."""

    def __init__(self, corpus_dir: str, user_agent_seed: int | None = None):
        from kryptone_ray.utils.randomizers import random_user_agent

        self.reader = CorpusReader(corpus_dir)
        self.user_agent = random_user_agent(seed=user_agent_seed)()

    def __call__(self, batch: pa.Table) -> pa.Table:
        return fetch_table(self.reader, batch)


class DecodeActor:
    """``map_batches`` actor for decode+verify (codec tables are module
    state; the class exists so the stage runs in a reusable actor pool)."""

    def __call__(self, batch: pa.Table) -> pa.Table:
        return decode_table(batch)
