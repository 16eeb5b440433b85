"""Corpus store: sharded write + indexed take-by-url with row-group pruning."""

import numpy as np
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
