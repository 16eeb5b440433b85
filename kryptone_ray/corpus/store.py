"""Lance-style corpus storage shim over Parquet (SURVEY.md §1.2).

``pylance`` is not installable in this sandbox, so the "Lance table of
image+caption pairs" is a Parquet layout exposing the Lance-shaped API the
fetch stage needs: open once per actor, **take rows by key** with
row-group pruning (an indexed point lookup, NOT a broadcast and NOT a
full-table scan — cf. SURVEY.md §2.6).

Layout (resumable / scale-ready):
- ``S`` shard files ``shard=000.parquet``..., shard = ``url_hash % S``;
- rows inside each shard sorted by ``url_hash``; small row groups
  (default 4096 rows) so a take touches few row groups;
- a take computes the shard per key, binary-searches the shard's
  row-group [min,max] url_hash statistics (read once from the footer at
  open time), reads only the matching row groups, and filters exactly.

At 100 TB each shard file becomes a directory of files on shared storage
and the footer-stat index is unchanged; swap-in of real Lance ``take`` is
a drop-in replacement for :meth:`CorpusReader.take_urls`.
"""

from __future__ import annotations

import os
import pathlib

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

from kryptone_ray.utils.xxh64 import xxh64_batch

KEY = "url_hash"


def write_corpus(table: pa.Table, out_dir: str | os.PathLike, num_shards: int = 8,
                 row_group_size: int = 4096) -> None:
    """Shard ``table`` by ``xxh64(image_id) % num_shards``, sort each shard
    by the hash key, and write one Parquet file per shard (atomic: tmp +
    rename, so a partially-written corpus is never read)."""
    out = pathlib.Path(out_dir)
    out.mkdir(parents=True, exist_ok=True)
    hashes = xxh64_batch(table["image_id"].to_pylist())
    table = table.append_column(KEY, pa.array(hashes, type=pa.uint64()))
    shard_of = hashes % np.uint64(num_shards)
    for s in range(num_shards):
        sub = table.filter(pa.array(shard_of == np.uint64(s)))
        sub = sub.take(pc.sort_indices(sub[KEY]))
        tmp = out / f".shard={s:03d}.parquet.tmp"
        pq.write_table(sub, tmp, row_group_size=row_group_size)
        os.replace(tmp, out / f"shard={s:03d}.parquet")


class CorpusReader:
    """Open-once reader with take-by-url — held by each fetch actor.

    ``__init__`` reads only footers (row-group count + per-row-group
    min/max of ``url_hash``); data pages are read lazily per take.
    """

    def __init__(self, corpus_dir: str | os.PathLike):
        self.dir = pathlib.Path(corpus_dir)
        self.shards: list[pq.ParquetFile] = []
        self.rg_mins: list[np.ndarray] = []
        self.rg_maxs: list[np.ndarray] = []
        paths = sorted(self.dir.glob("shard=*.parquet"))
        if not paths:
            raise FileNotFoundError(f"no corpus shards under {self.dir}")
        for p in paths:
            f = pq.ParquetFile(p)
            md = f.metadata
            key_idx = md.schema.to_arrow_schema().get_field_index(KEY)
            mins = np.empty(md.num_row_groups, dtype=np.uint64)
            maxs = np.empty(md.num_row_groups, dtype=np.uint64)
            for g in range(md.num_row_groups):
                st = md.row_group(g).column(key_idx).statistics
                mins[g] = st.min
                maxs[g] = st.max
            self.shards.append(f)
            self.rg_mins.append(mins)
            self.rg_maxs.append(maxs)
        self.num_shards = len(self.shards)

    def take_urls(self, urls: list[str]) -> pa.Table:
        """Fetch corpus rows for ``urls``; missing URLs are simply absent
        from the result (the caller joins and marks fetch misses)."""
        hashes = xxh64_batch(urls)
        shard_of = hashes % np.uint64(self.num_shards)
        url_set = set(urls)
        pieces: list[pa.Table] = []
        for s in np.unique(shard_of):
            keys = np.unique(hashes[shard_of == s])
            f = self.shards[int(s)]
            mins, maxs = self.rg_mins[int(s)], self.rg_maxs[int(s)]
            # row groups whose [min,max] interval contains any key —
            # shard is sorted by key, so binary-search the min stats
            g_idx = np.searchsorted(mins, keys, side="right") - 1
            ok = (g_idx >= 0) & (maxs[np.clip(g_idx, 0, None)] >= keys)
            gsel = sorted(set(g_idx[ok].tolist()))
            if not gsel:
                continue
            t = f.read_row_groups(gsel)
            mask = pc.is_in(t[KEY], value_set=pa.array(keys, type=pa.uint64()))
            t = t.filter(mask)
            if len(t):
                # exact match on the string key (hash collisions are
                # ~2^-64 but the equality check keeps this exact)
                t = t.filter(pc.is_in(t["image_id"], value_set=pa.array(list(url_set))))
                pieces.append(t)
        if not pieces:
            empty = self.shards[0].schema_arrow.empty_table()
            return empty
        return pa.concat_tables(pieces)
