"""Corpus store: sharded write + indexed take-by-url with row-group pruning."""

import numpy as np
import pyarrow as pa
import pytest

from kryptone_ray.corpus.store import CorpusReader, write_corpus
from kryptone_ray.corpus.synth import CorpusSpec, make_corpus_table


@pytest.fixture(scope="module")
def corpus_dir(tmp_path_factory):
    spec = CorpusSpec(n_rows=500, n_hosts=8, seed=42)
    table = make_corpus_table(spec)
    d = tmp_path_factory.mktemp("corpus")
    write_corpus(table, d, num_shards=4, row_group_size=64)
    return spec, d


def test_take_by_urls(corpus_dir):
    spec, d = corpus_dir
    reader = CorpusReader(d)
    want = [spec.url_of(i) for i in (0, 17, 255, 499)]
    t = reader.take_urls(want)
    got = set(t["image_id"].to_pylist())
    assert got == set(want)
    # columns intact
    assert {"image_id", "bytes", "w", "h", "fmt", "caption", "phash"} <= set(t.schema.names)


def test_take_missing_urls_absent(corpus_dir):
    spec, d = corpus_dir
    reader = CorpusReader(d)
    t = reader.take_urls(["https://nowhere.corpus.test/p/9999", spec.url_of(3)])
    assert t["image_id"].to_pylist() == [spec.url_of(3)]


def test_take_empty_result(corpus_dir):
    _, d = corpus_dir
    reader = CorpusReader(d)
    t = reader.take_urls(["https://nowhere.corpus.test/p/123456"])
    assert len(t) == 0


def test_all_rows_reachable(corpus_dir):
    spec, d = corpus_dir
    reader = CorpusReader(d)
    urls = [spec.url_of(i) for i in range(spec.n_rows)]
    t = reader.take_urls(urls)
    assert len(t) == len(set(urls))


class FakeLanceReader:
    """Drop-in stand-in for a real Lance dataset's ``take``-by-key path:
    same constructor shape (open a directory once) and the same
    ``take_urls`` contract as CorpusReader. Exists to pin the swap-in
    seam — replacing the Parquet shim with pylance touches ONLY this
    class (store.py module docstring)."""

    def __init__(self, corpus_dir):
        import pyarrow.parquet as pq
        import pathlib

        paths = sorted(pathlib.Path(corpus_dir).glob("*.parquet"))
        self._table = pa.concat_tables(pq.read_table(p) for p in paths)
        self._by_id = {
            u: i for i, u in enumerate(self._table["image_id"].to_pylist())
        }

    def take_urls(self, urls):
        idx = sorted(self._by_id[u] for u in set(urls) if u in self._by_id)
        if not idx:
            return self._table.schema.empty_table()
        return self._table.take(pa.array(idx, type=pa.int64()))


@pytest.mark.parametrize("backend", [CorpusReader, FakeLanceReader])
def test_reader_contract_backend_agnostic(corpus_dir, backend):
    """The fetch stage's reader contract, asserted over BOTH backends:
    per-url hit rows with identical content, missing urls absent, empty
    request empty result — so a Lance ``take`` drop-in is verified by
    construction."""
    spec, d = corpus_dir
    reader = backend(d)
    urls = [spec.url_of(i) for i in (0, 3, 7)]
    t = reader.take_urls(urls + ["https://nowhere.test/missing"])
    assert set(t["image_id"].to_pylist()) == set(urls)
    assert reader.take_urls([]).num_rows == 0
    assert reader.take_urls(["https://nowhere.test/x"]).num_rows == 0
    # contract: full fetch-stage pass over the backend
    from kryptone_ray.stages.fetch import fetch_table

    batch = pa.table({
        "url": pa.array(urls, type=pa.string()),
        "depth": pa.array([0, 0, 0], type=pa.int32()),
        "visit_idx": pa.array([0, 1, 2], type=pa.int64()),
        "ts": pa.array([0.0] * 3, type=pa.float64()),
        "batch_idx": pa.array([0] * 3, type=pa.int64()),
    })
    out = fetch_table(reader, batch)
    assert out.num_rows == 3
    assert set(out["status"].to_pylist()) == {"ok"}


def test_blob_fast_path_equals_parquet_fallback(tmp_path):
    """The random-access blob path and the whole-row-group parquet
    fallback (blob sidecars deleted) must return identical rows with
    the identical v1 schema — byte-for-byte payloads included."""
    spec = CorpusSpec(n_rows=300, n_hosts=8, seed=7)
    d = tmp_path / "c"
    write_corpus(make_corpus_table(spec), d, num_shards=3, row_group_size=64)
    fast = CorpusReader(d)
    assert fast.fast
    urls = [spec.url_of(i) for i in range(0, 300, 7)]
    t_fast = fast.take_urls(urls)

    for b in d.glob("*.blob"):
        b.unlink()
    slow = CorpusReader(d)
    assert not slow.fast
    t_slow = slow.take_urls(urls)
    assert t_fast.schema.names == t_slow.schema.names
    key = "image_id"
    import pyarrow.compute as pc

    a = t_fast.take(pc.sort_indices(t_fast[key]))
    b = t_slow.take(pc.sort_indices(t_slow[key]))
    assert a.equals(b)


def test_single_copy_layout_take_equals_dual(tmp_path):
    """single_copy=True drops the parquet bytes column (payload only in
    the blob — the production/Lance layout): takes must return the same
    rows with the same v1 schema, and a missing sidecar must raise
    instead of silently returning wrong data."""
    spec = CorpusSpec(n_rows=200, n_hosts=4, seed=9)
    table = make_corpus_table(spec)
    d_dual = tmp_path / "dual"
    d_slim = tmp_path / "slim"
    write_corpus(table, d_dual, num_shards=3, row_group_size=64)
    write_corpus(table, d_slim, num_shards=3, row_group_size=64,
                 single_copy=True)
    # parquet shards really are slimmer
    import pyarrow.parquet as pq

    slim_schema = pq.ParquetFile(next(d_slim.glob("*.parquet"))).schema_arrow
    assert "bytes" not in slim_schema.names
    urls = [spec.url_of(i) for i in range(0, 200, 9)]
    a = CorpusReader(d_dual).take_urls(urls)
    b = CorpusReader(d_slim).take_urls(urls)
    assert a.schema.names == b.schema.names
    import pyarrow.compute as pc

    a = a.take(pc.sort_indices(a["image_id"]))
    b = b.take(pc.sort_indices(b["image_id"]))
    assert a.equals(b)

    for blob in d_slim.glob("*.blob"):
        blob.unlink()
    import pytest as _pytest

    with _pytest.raises(FileNotFoundError):
        CorpusReader(d_slim)


@pytest.mark.usefixtures("ray_session")
@pytest.mark.parametrize("single_copy", [False, True])
def test_read_corpus_full_scan_roundtrip(tmp_path, single_copy):
    """read_corpus() streams the whole corpus back bit-identically in
    BOTH layouts — including single-copy, where the payload exists only
    in the blob sidecars and a plain read_parquet could never serve it."""
    from kryptone_ray.corpus.store import read_corpus, write_corpus

    spec = CorpusSpec(n_rows=300, n_hosts=8, seed=7)
    table = make_corpus_table(spec)
    d = tmp_path / ("sc" if single_copy else "dual")
    write_corpus(table, d, num_shards=4, row_group_size=64,
                 single_copy=single_copy)

    got = read_corpus(d).to_pandas().sort_values("image_id") \
        .reset_index(drop=True)
    want = table.to_pandas().sort_values("image_id").reset_index(drop=True)
    assert list(got["image_id"]) == list(want["image_id"])
    assert [bytes(b) for b in got["bytes"]] == \
           [bytes(b) for b in want["bytes"]]
    assert list(got["caption"]) == list(want["caption"])


@pytest.mark.usefixtures("ray_session")
def test_read_corpus_column_pruning_and_errors(tmp_path):
    from kryptone_ray.corpus.store import read_corpus, write_corpus

    spec = CorpusSpec(n_rows=200, n_hosts=4, seed=9)
    write_corpus(make_corpus_table(spec), tmp_path / "c", num_shards=2,
                 single_copy=True)
    # metadata-only scan never touches the blobs
    slim = read_corpus(tmp_path / "c", columns=["image_id", "fmt"])
    df = slim.to_pandas()
    assert list(df.columns) == ["image_id", "fmt"]
    assert len(df) == 200
    with pytest.raises(KeyError):
        read_corpus(tmp_path / "c", columns=["nope"])
    # single-copy corpus with a deleted sidecar: a bytes scan must FAIL
    # loudly, not silently drop payloads
    for b in (tmp_path / "c").glob("*.blob"):
        b.unlink()
    import ray
    with pytest.raises((FileNotFoundError, ray.exceptions.RayTaskError,
                        ray.exceptions.UserCodeException)):
        read_corpus(tmp_path / "c").to_pandas()


@pytest.mark.usefixtures("ray_session")
def test_thumb_corpus_roundtrip_takes_and_hashes():
    """The derived thumbnail corpus serves indexed takes, and each
    taken thumb's phash equals a direct decode+resize+hash of the
    SOURCE row — the store→actor-pool→store pipeline end to end."""
    from kryptone_ray.pipelines import multimodal as mm
    from kryptone_ray.corpus.store import CorpusReader
    from kryptone_ray.corpus import codecs
    from kryptone_ray.utils.xxh64 import content_hash64

    out = mm.q_corpus_thumbs_roundtrip("")
    assert out["n_thumbs"][0] == mm._SCAN_ROWS
    assert out["total_bytes"][0] == mm._SCAN_ROWS * 16 * 16 * 3

    spec = CorpusSpec(n_rows=mm._SCAN_ROWS, n_hosts=8, seed=mm._SCAN_SEED)
    src = make_corpus_table(spec)
    ids = src["image_id"].to_pylist()[:: mm._SCAN_ROWS // 7]
    r = CorpusReader(
        f"/tmp/kr_thumb_corpus_{mm._SCAN_SEED}_{mm._SCAN_ROWS}_16x16")
    got = r.take_urls(ids)
    assert len(got) == len(ids)
    d = src.to_pydict()
    by_id = {d["image_id"][i]: i for i in range(len(d["image_id"]))}
    g = got.to_pydict()
    for k in range(len(got)):
        i = by_id[g["image_id"][k]]
        px = codecs.decode(d["bytes"][i], d["fmt"][i], d["w"][i], d["h"][i])
        h, w, _ = px.shape
        import numpy as np
        yi = (np.arange(16) * h // 16).astype(int)
        xi = (np.arange(16) * w // 16).astype(int)
        thumb = px[yi][:, xi]
        assert bytes(g["bytes"][k]) == codecs.encode_raw(thumb)
        assert np.uint64(g["phash"][k]).astype(np.int64) == \
            np.uint64(content_hash64(thumb.tobytes())).astype(np.int64)
