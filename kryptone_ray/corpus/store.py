"""Lance-style corpus storage shim over Parquet (SURVEY.md §1.2).

``pylance`` is not installable in this sandbox, so the "Lance table of
image+caption pairs" is a Parquet layout exposing the Lance-shaped API the
fetch stage needs: open once per actor, **take rows by key** with
row-group pruning (an indexed point lookup, NOT a broadcast and NOT a
full-table scan — cf. SURVEY.md §2.6).

Layout: the corpus is RANGE-PARTITIONED on ``url_hash = xxh64(image_id)``
— files sorted by the key and mutually disjoint, small row groups
(default 4096 rows). That layout is produced either:

- in one shot for tests (:func:`write_corpus`, driver-side), or
- distributed (:func:`write_corpus_distributed`): ``ds.sort('url_hash')
  → write_parquet`` — ONE shuffle at ingest, then every fetch is an
  indexed lookup forever after. At 100 TB the sort is the only
  all-to-all stage and the per-file footer index is unchanged.

A take binary-searches the global (file, row-group) [min,max] key-stat
intervals (read once from footers at open), reads only matching row
groups, and filters exactly. Swapping in real Lance ``take`` replaces
:meth:`CorpusReader.take_urls` only.
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
ROW_GROUP_SIZE = 4096


def add_key(table: pa.Table) -> pa.Table:
    if KEY in table.schema.names:
        return table
    hashes = xxh64_batch(table["image_id"].to_pylist())
    return table.append_column(KEY, pa.array(hashes, type=pa.uint64()))


def write_corpus(table: pa.Table, out_dir: str | os.PathLike, num_shards: int = 8,
                 row_group_size: int = ROW_GROUP_SIZE) -> None:
    """Driver-side writer (tests / small corpora): global sort by key,
    split into ``num_shards`` range files (atomic tmp+rename)."""
    out = pathlib.Path(out_dir)
    out.mkdir(parents=True, exist_ok=True)
    table = add_key(table)
    table = table.take(pc.sort_indices(table[KEY]))
    n = len(table)
    per = max(1, -(-n // num_shards))
    for s in range(num_shards):
        sub = table.slice(s * per, per)
        if len(sub) == 0:
            continue
        tmp = out / f".part-{s:05d}.parquet.tmp"
        pq.write_table(sub, tmp, row_group_size=row_group_size, compression="none")
        os.replace(tmp, out / f"part-{s:05d}.parquet")


def write_corpus_distributed(ds, out_dir: str | os.PathLike,
                             row_group_size: int = ROW_GROUP_SIZE) -> None:
    """Distributed writer: ``ds`` must already carry ``url_hash``; one
    sort shuffle then parallel parquet writes (files are range-disjoint
    because the dataset is globally sorted)."""
    # image bytes are high-entropy — compression buys nothing and its
    # decode is a flat per-byte cost on the fetch path
    ds.sort(KEY).write_parquet(str(out_dir), row_group_size=row_group_size,
                               compression="none")


class CorpusReader:
    """Open-once reader with take-by-url — held by each fetch actor.

    ``__init__`` reads only footers (per-row-group min/max of
    ``url_hash``), building one flat, globally-sorted interval index;
    data pages are read lazily per take.
    """

    def __init__(self, corpus_dir: str | os.PathLike):
        self.dir = pathlib.Path(corpus_dir)
        paths = sorted(p for p in self.dir.glob("*.parquet"))
        if not paths:
            raise FileNotFoundError(f"no corpus files under {self.dir}")
        self.files: list[pq.ParquetFile] = []
        mins, maxs, fidx, gidx = [], [], [], []
        for fi, p in enumerate(paths):
            f = pq.ParquetFile(p)
            md = f.metadata
            key_idx = md.schema.to_arrow_schema().get_field_index(KEY)
            for g in range(md.num_row_groups):
                st = md.row_group(g).column(key_idx).statistics
                mins.append(int(st.min))
                maxs.append(int(st.max))
                fidx.append(fi)
                gidx.append(g)
            self.files.append(f)
        order = np.argsort(np.asarray(mins, dtype=np.uint64), kind="stable")
        self.rg_mins = np.asarray(mins, dtype=np.uint64)[order]
        self.rg_maxs = np.asarray(maxs, dtype=np.uint64)[order]
        self.rg_file = np.asarray(fidx)[order]
        self.rg_group = np.asarray(gidx)[order]

    def take_urls(self, urls: list[str]) -> pa.Table:
        """Fetch corpus rows for ``urls``; missing URLs are simply absent
        from the result (the caller joins and marks fetch misses)."""
        keys = np.unique(xxh64_batch(urls))
        # row groups whose [min,max] interval contains any key — global
        # binary search over the sorted interval index
        g_idx = np.searchsorted(self.rg_mins, keys, side="right") - 1
        ok = (g_idx >= 0) & (self.rg_maxs[np.clip(g_idx, 0, None)] >= keys)
        # a key can straddle a row-group boundary (rows with an equal
        # url_hash split across groups, or externally-written overlapping
        # files): the PRECEDING group matches too when its max still
        # covers the key — probe it as well instead of assuming disjoint
        # intervals
        prev = g_idx - 1
        ok_prev = (prev >= 0) & (self.rg_maxs[np.clip(prev, 0, None)] >= keys)
        sel = np.unique(np.concatenate([g_idx[ok], prev[ok_prev]]))
        if len(sel) == 0:
            return self.files[0].schema_arrow.empty_table()
        url_arr = pa.array(list(set(urls)))
        key_arr = pa.array(keys, type=pa.uint64())
        pieces: list[pa.Table] = []
        # group selected row groups per file for one read call each
        for fi in np.unique(self.rg_file[sel]):
            groups = self.rg_group[sel[self.rg_file[sel] == fi]].tolist()
            t = self.files[int(fi)].read_row_groups(sorted(groups))
            t = t.filter(pc.is_in(t[KEY], value_set=key_arr))
            if len(t):
                # exact string match keeps this exact under hash collision
                t = t.filter(pc.is_in(t["image_id"], value_set=url_arr))
                if len(t):
                    pieces.append(t)
        if not pieces:
            return self.files[0].schema_arrow.empty_table()
        return pa.concat_tables(pieces)
