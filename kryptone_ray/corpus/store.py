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
- distributed (:func:`write_corpus_distributed`): ``ds.sort('url_hash')``
  then one shard write per sorted block — ONE shuffle at ingest, then
  every fetch is an indexed lookup forever after. At 100 TB the sort is
  the only all-to-all stage and the per-file footer index is unchanged.

A take binary-searches the global (file, row-group) [min,max] key-stat
intervals (read once from footers at open), reads only matching row
groups, and filters exactly.

RANDOM-ACCESS BYTES (the Lance ``take`` semantics parquet lacks): each
shard carries a ``.blob`` sidecar holding the raw image payloads
back-to-back in row order, with per-row ``bytes_off``/``bytes_len``
columns in the parquet. A take then reads only the METADATA columns of
the matching row groups (a few hundred bytes/row) and mmap-slices
exactly the hit rows' payloads from the blob — parquet has no row-level
take, so without the sidecar every take decodes every image in every
touched row group (measured 7-8x read amplification on a seed window).
Corpora without sidecars (or rows with null offsets) fall back to the
whole-row-group parquet path. The parquet keeps a ``bytes`` copy so
direct scans still work here; a production layout stores the payload
once (blob only). Swapping in real Lance ``take`` replaces
:meth:`CorpusReader.take_urls` only.
"""

from __future__ import annotations

import collections
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


def _with_blob_offsets(sub: pa.Table) -> tuple[pa.Table, bytes]:
    """Append ``bytes_off``/``bytes_len`` columns and return the shard's
    blob payload (row payloads back-to-back, in row order)."""
    vals = sub["bytes"].to_pylist()
    lens = np.array([0 if v is None else len(v) for v in vals], dtype=np.int64)
    offs = np.concatenate(([0], np.cumsum(lens)[:-1]))
    sub = sub.append_column("bytes_off", pa.array(offs, type=pa.int64()))
    sub = sub.append_column("bytes_len", pa.array(lens, type=pa.int64()))
    return sub, b"".join(v for v in vals if v is not None)


def write_shard(sub: pa.Table, out: pathlib.Path, name: str,
                row_group_size: int = ROW_GROUP_SIZE,
                single_copy: bool = False) -> None:
    """One range shard: parquet (atomic tmp+rename) + the ``.blob``
    random-access sidecar. The blob is published BEFORE the parquet so a
    reader never sees offsets without their payload.

    ``single_copy=True`` drops the ``bytes`` column from the parquet —
    the payload lives ONLY in the blob (the production/Lance layout:
    half the storage and half the ingest write bytes). Takes then
    REQUIRE the sidecar (the reader raises if it is missing instead of
    silently falling back); the dual-copy default keeps direct parquet
    scans working."""
    sub, blob = _with_blob_offsets(sub)
    if single_copy:
        sub = sub.drop_columns(["bytes"])
    tmpb = out / f".{name}.blob.tmp"
    tmpb.write_bytes(blob)
    os.replace(tmpb, out / f"{name}.blob")
    tmp = out / f".{name}.parquet.tmp"
    pq.write_table(sub, tmp, row_group_size=row_group_size, compression="none")
    os.replace(tmp, out / f"{name}.parquet")


def write_corpus(table: pa.Table, out_dir: str | os.PathLike, num_shards: int = 8,
                 row_group_size: int = ROW_GROUP_SIZE,
                 single_copy: bool = False) -> None:
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
        write_shard(sub, out, f"part-{s:05d}", row_group_size,
                    single_copy=single_copy)


def write_corpus_distributed(ds, out_dir: str | os.PathLike,
                             row_group_size: int = ROW_GROUP_SIZE,
                             single_copy: bool = False) -> None:
    """Distributed writer: ``ds`` must already carry ``url_hash``; one
    sort shuffle, then each sorted block writes its own shard (parquet +
    blob sidecar) in parallel — files are range-disjoint because the
    dataset is globally sorted. Resumable output: one shard per block,
    atomic publish per shard."""
    # image bytes are high-entropy — compression buys nothing and its
    # decode is a flat per-byte cost on the fetch path
    out = pathlib.Path(out_dir)
    out.mkdir(parents=True, exist_ok=True)

    def write_block(t: pa.Table) -> pa.Table:
        import uuid as _uuid

        if len(t):
            write_shard(t, out, f"part-{_uuid.uuid4().hex[:12]}",
                        row_group_size, single_copy=single_copy)
        return pa.table({"rows": pa.array([len(t)], type=pa.int64())})

    ds.sort(KEY).map_batches(write_block, batch_format="pyarrow",
                             batch_size=None).materialize()


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
        self.paths = paths
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
        # random-access fast path: every shard has offset columns AND a
        # .blob sidecar (older corpora fall back to whole-row-group reads)
        schema = self.files[0].schema_arrow
        self._schema_v1 = schema if "bytes_off" not in schema.names else \
            schema.remove(schema.get_field_index("bytes_len")).remove(
                schema.get_field_index("bytes_off"))
        blobs_ok = all(p.with_suffix(".blob").exists() for p in paths)
        if "bytes" not in schema.names:
            # single-copy layout: the payload exists ONLY in the blob —
            # a missing sidecar is corruption, not a fallback
            if "bytes_off" not in schema.names:
                raise ValueError(f"corpus {self.dir} has neither a bytes "
                                 "column nor blob offsets")
            if not blobs_ok:
                raise FileNotFoundError(
                    f"single-copy corpus {self.dir} is missing .blob "
                    "sidecars — takes cannot be served")
            self._schema_v1 = self._schema_v1.insert(
                1, pa.field("bytes", pa.binary()))
            self.fast = True
        else:
            self.fast = "bytes_off" in schema.names and blobs_ok
        self._meta_cols = [n for n in schema.names if n != "bytes"]
        self._bytes_pos = self._schema_v1.names.index("bytes")
        self._mmaps: dict[int, np.memmap | bytes] = {}
        # DECODED-GROUP LRU (politeness-regime lever): a collapsed crawl
        # window takes ~50 scattered urls, so every take re-decodes the
        # same metadata row groups (54% of a 60k-page politeness crawl's
        # wall in the round-4 profile). Cache decoded META tables (fast
        # path only — payload bytes stay in the blob mmap) under a row
        # budget; at bench scale the whole metadata set fits (~10 MB),
        # at 100 TB the budget bounds each fetch actor to a fixed slice
        # and eviction keeps takes correct. 0 disables.
        self._cache_budget = int(os.environ.get(
            "KR_READER_CACHE_ROWS", str(1 << 19)))
        self._group_cache: "collections.OrderedDict[tuple[int,int], pa.Table]" = (
            collections.OrderedDict())
        self._cache_rows = 0
        # per-group row counts for slicing a batched multi-group read
        self._group_rows: dict[tuple[int, int], int] = {}
        for fi, f in enumerate(self.files):
            md = f.metadata
            for g in range(md.num_row_groups):
                self._group_rows[(fi, g)] = md.row_group(g).num_rows

    def _cached_groups(self, fi: int, groups: list[int],
                       cols: list[str]) -> pa.Table:
        """Concatenate the decoded meta tables of ``groups`` of file
        ``fi``, reading only cache-missing groups (one batched
        read_row_groups call), then LRU-inserting each."""
        missing = [g for g in groups if (fi, g) not in self._group_cache]
        if missing:
            t = self.files[fi].read_row_groups(sorted(missing), columns=cols)
            off = 0
            for g in sorted(missing):
                n = self._group_rows[(fi, g)]
                self._group_cache[(fi, g)] = t.slice(off, n)
                self._cache_rows += n
                off += n
            while (self._cache_rows > self._cache_budget
                   and len(self._group_cache) > len(groups)):
                _, old = self._group_cache.popitem(last=False)
                self._cache_rows -= len(old)
        parts = []
        for g in groups:
            self._group_cache.move_to_end((fi, g))
            parts.append(self._group_cache[(fi, g)])
        return pa.concat_tables(parts)

    def _blob(self, fi: int):
        m = self._mmaps.get(fi)
        if m is None:
            m = np.memmap(self.paths[fi].with_suffix(".blob"),
                          dtype=np.uint8, mode="r")
            self._mmaps[fi] = m
        return m

    def take_urls(self, urls: list[str]) -> pa.Table:
        """Fetch corpus rows for ``urls``; missing URLs are simply absent
        from the result (the caller joins and marks fetch misses).
        Output schema is the v1 corpus schema (offset columns stripped)
        either way."""
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
            return self._schema_v1.empty_table()
        url_arr = pa.array(list(set(urls)))
        key_arr = pa.array(keys, type=pa.uint64())
        pieces: list[pa.Table] = []
        # group selected row groups per file for one read call each
        for fi in np.unique(self.rg_file[sel]):
            groups = self.rg_group[sel[self.rg_file[sel] == fi]].tolist()
            cols = self._meta_cols if self.fast else None
            if self.fast and self._cache_budget > 0:
                t = self._cached_groups(int(fi), sorted(groups), cols)
            else:
                t = self.files[int(fi)].read_row_groups(sorted(groups),
                                                        columns=cols)
            t = t.filter(pc.is_in(t[KEY], value_set=key_arr))
            if len(t):
                # exact string match keeps this exact under hash collision
                t = t.filter(pc.is_in(t["image_id"], value_set=url_arr))
                if len(t):
                    if self.fast:
                        t = self._attach_bytes(int(fi), t)
                    pieces.append(t)
        if not pieces:
            return self._schema_v1.empty_table()
        out = pa.concat_tables(pieces)
        if not self.fast and "bytes_off" in out.schema.names:
            # offset-carrying corpus read through the fallback path
            # (blob sidecar missing): strip to the v1 schema
            out = out.drop_columns(["bytes_off", "bytes_len"])
        return out

    def _attach_bytes(self, fi: int, t: pa.Table) -> pa.Table:
        """Random-access payload fetch: mmap-slice exactly the hit rows'
        ranges from the shard blob (offsets are per-shard, ascending —
        the slices read in file order, page-cache friendly)."""
        blob = self._blob(fi)
        offs = t["bytes_off"].to_numpy()
        lens = t["bytes_len"].to_numpy()
        payload = [blob[o:o + l].tobytes() for o, l in zip(offs, lens)]
        t = t.drop_columns(["bytes_off", "bytes_len"])
        return t.add_column(self._bytes_pos, "bytes",
                            pa.array(payload, type=pa.binary()))


class CorpusDatasource:
    """Ray-native FULL-SCAN source for a corpus directory — the
    ``ray.data.Datasource`` face of the store (``read_corpus()``
    below), so a stored corpus streams through ``Dataset`` pipelines
    exactly like ``read_parquet`` would, INCLUDING single-copy layouts
    whose payload lives only in the ``.blob`` sidecars (a plain
    read_parquet cannot surface those bytes at all).

    One read task per shard (shards are the natural block size: they
    were written range-partitioned on ``url_hash``), column-pruned at
    the parquet read; when ``bytes`` is requested on a sidecar corpus
    the task mmaps its shard blob and slices payloads in ascending
    offset order (one sequential pass, page-cache friendly). Lance
    parity note: this is ``lance.dataset(...).scanner(columns=...)``;
    swapping in real Lance replaces this class and
    ``CorpusReader.take_urls`` only."""

    def __init__(self, corpus_dir: str | os.PathLike,
                 columns: list[str] | None = None):
        self.dir = pathlib.Path(corpus_dir)
        self.paths = sorted(self.dir.glob("*.parquet"))
        if not self.paths:
            raise FileNotFoundError(f"no corpus files under {self.dir}")
        schema = pq.ParquetFile(self.paths[0]).schema_arrow
        self.single_copy = "bytes" not in schema.names
        self.has_offsets = "bytes_off" in schema.names
        all_cols = [n for n in schema.names
                    if n not in ("bytes_off", "bytes_len")]
        if self.single_copy:
            all_cols.insert(1, "bytes")
        self.columns = columns if columns is not None else all_cols
        unknown = set(self.columns) - set(all_cols)
        if unknown:
            raise KeyError(f"unknown corpus columns: {sorted(unknown)}")

    def read_tasks(self):
        """One zero-arg callable per shard returning its pa.Table."""
        cols = self.columns
        return [(lambda p=p: _read_corpus_shard(str(p), cols))
                for p in self.paths]


def _read_corpus_shard(path_s: str, cols: list[str]) -> pa.Table:
    """Read one shard with column pruning; when ``bytes`` is requested
    on a sidecar shard, mmap-slice the payloads (ascending offsets —
    one sequential pass) and attach them as a binary column."""
    path = pathlib.Path(path_s)
    want_bytes = "bytes" in cols
    pcols = [c for c in cols if c != "bytes"]
    if want_bytes:
        if path.with_suffix(".blob").exists():
            pcols = pcols + ["bytes_off", "bytes_len"]
        elif "bytes" in pq.ParquetFile(path).schema_arrow.names:
            pcols = pcols + ["bytes"]
        else:
            raise FileNotFoundError(
                f"single-copy shard {path} is missing its .blob sidecar")
    t = pq.read_table(path, columns=pcols)
    if want_bytes and "bytes_off" in t.schema.names:
        blob = np.memmap(path.with_suffix(".blob"), dtype=np.uint8,
                         mode="r")
        offs = t["bytes_off"].to_numpy()
        lens = t["bytes_len"].to_numpy()
        payload = pa.array(
            [blob[o:o + l].tobytes() for o, l in zip(offs, lens)],
            type=pa.binary())
        t = t.drop_columns(["bytes_off", "bytes_len"])
        t = t.add_column(min(1, t.num_columns), "bytes", payload)
    return t.select(cols)


def read_corpus(corpus_dir: str | os.PathLike,
                columns: list[str] | None = None):
    """Full corpus scan as a ``ray.data.Dataset`` — one block per
    range-partitioned shard, parquet column pruning, blob-sidecar
    payload stitching for single-copy corpora. The per-shard read
    callables execute as Ray read tasks (streamed, never
    driver-materialized)."""
    import ray.data as rd

    src = CorpusDatasource(corpus_dir, columns=columns)
    # paths + schema are resolved ONCE on the driver; each task receives
    # its shard path strings directly (no per-task dir glob / footer
    # re-read — O(S) metadata work total, not O(S²))
    paths = [str(p) for p in src.paths]
    cols = src.columns

    ds = rd.from_items(paths, override_num_blocks=len(paths))

    def load(batch: pa.Table) -> pa.Table:
        return pa.concat_tables(
            [_read_corpus_shard(p, cols) for p in batch["item"].to_pylist()])

    return ds.map_batches(load, batch_format="pyarrow", batch_size=None)
