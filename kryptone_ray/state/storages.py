"""Pluggable checkpoint/data storages — reference parity for
``/root/reference/kryptone/data_storages.py`` (``BaseStorage`` ABC
:31-86, ``FileStorage`` :123-217, ``RedisStorage`` :220-308).

The new engine's durable state is Parquet (engine/crawl.py checkpoints);
these storages carry the reference's *small-state* contract — JSON/CSV
documents keyed by filename (cache.json / performance.json /
uuid manifests) — behind the same ``has/get/save/save_or_create``
surface. ``KVStorage`` replaces Redis (no external DB in a worker): an
in-process dict with the same JSON-encoded value semantics, usable as a
Ray actor for cross-task sharing.
"""

from __future__ import annotations

import csv
import json
import pathlib
from typing import Any

from kryptone_ray.utils.encoders import DefaultJsonEncoder


class BaseStorage:
    """data_storages.py:31-86 contract."""

    def has(self, key: str) -> bool:
        raise NotImplementedError

    def get(self, key: str) -> Any:
        raise NotImplementedError

    def save(self, key: str, data: Any) -> None:
        raise NotImplementedError

    def save_or_create(self, key: str, data: Any) -> None:
        self.save(key, data)


class FileStorage(BaseStorage):
    """data_storages.py:123-217 — JSON/CSV documents under a directory;
    the directory listing is preloaded at init (reference behavior) and
    refreshed on writes. Writes are atomic (tmp+rename, an upgrade the
    checkpoint contract requires)."""

    def __init__(self, storage_path: str | pathlib.Path):
        self.path = pathlib.Path(storage_path)
        self.path.mkdir(parents=True, exist_ok=True)
        self.refresh()

    def refresh(self) -> None:
        self.known = {p.name for p in self.path.iterdir() if p.is_file()}

    def has(self, key: str) -> bool:
        return key in self.known

    def get(self, key: str) -> Any:
        p = self.path / key
        if p.suffix == ".json":
            return json.loads(p.read_text())
        if p.suffix == ".csv":
            with open(p, newline="") as f:
                return list(csv.reader(f))
        return p.read_text()

    def save(self, key: str, data: Any) -> None:
        p = self.path / key
        tmp = self.path / (key + ".tmp")
        if p.suffix == ".json":
            tmp.write_text(json.dumps(data, cls=DefaultJsonEncoder))
        elif p.suffix == ".csv":
            with open(tmp, "w", newline="") as f:
                writer = csv.writer(f)
                for row in data:
                    writer.writerow(row if isinstance(row, (list, tuple)) else [row])
        else:
            tmp.write_text(str(data))
        tmp.replace(p)
        self.known.add(key)


class KVStorage(BaseStorage):
    """data_storages.py:220-308 ``RedisStorage`` semantics without Redis:
    hash-per-namespace key/value with JSON-encoded values. Wrap with
    ``ray.remote(KVStorage)`` for a shared cross-task store."""

    def __init__(self, namespace: str = "default"):
        self.namespace = namespace
        self._data: dict[str, str] = {}

    def has(self, key: str) -> bool:
        return key in self._data

    def get(self, key: str) -> Any:
        raw = self._data.get(key)
        return None if raw is None else json.loads(raw)

    def save(self, key: str, data: Any) -> None:
        self._data[key] = json.dumps(data, cls=DefaultJsonEncoder)

    def keys(self) -> list[str]:
        return list(self._data)
