"""Engine-level per-row invariants (BASELINE.json input_hint): for every
page the engine fetched+decoded, decoded pixels must match the original
corpus pixels — exactly for lossless formats (phash equality), PSNR ≥ 40
dB for the lossy stand-in — and the fetched caption must equal the
corpus caption."""

import numpy as np
import pyarrow.compute as pc
import pytest

from kryptone_ray.corpus import codecs
from kryptone_ray.corpus.store import write_corpus
from kryptone_ray.corpus.synth import CorpusSpec, make_corpus_table, row_index_of, seed_urls
from kryptone_ray.engine.crawl import RayCrawler
from kryptone_ray.sim.golden import CrawlSpec
from tests.test_crawl_parity import page_outlinks


@pytest.fixture(scope="module")
def crawl_result(tmp_path_factory):
    spec = CorpusSpec(n_rows=250, n_hosts=4, seed=42)
    d = tmp_path_factory.mktemp("inv")
    write_corpus(make_corpus_table(spec), d / "corpus", num_shards=4)
    cs = CrawlSpec(batch_size=16, wait_time=25.0, allowed_hosts=("*",), max_pages=120)
    eng = RayCrawler(str(d / "corpus"), page_outlinks(spec), cs, str(d / "run"),
                     mode="local")
    eng.run(seeds=seed_urls(spec, 6))
    vt = eng.visits_table().to_pandas()
    return spec, vt


def test_every_ok_page_decoded(crawl_result):
    spec, vt = crawl_result
    ok = vt[vt["status"] == "ok"]
    assert len(ok) > 50
    assert ok["decoded_ok"].all()


def test_lossless_phash_equality(crawl_result):
    # decoded pixels hash-identical to the encoder input for raw/png
    spec, vt = crawl_result
    lossless = vt[(vt["status"] == "ok") & vt["fmt"].isin(["raw", "png"])]
    assert len(lossless) > 10
    assert (lossless["decoded_phash"] == lossless["phash"]).all()


def test_lossy_psnr_and_caption_equality(crawl_result):
    spec, vt = crawl_result
    ok = vt[vt["status"] == "ok"]
    checked_lossy = 0
    for _, row in ok.iterrows():
        i = row_index_of(row["url"])
        assert spec.url_of(i) == row["url"]
        # caption equality per-row
        assert row["caption"] == spec.caption(i)
        if row["fmt"] == "qraw":
            orig = spec.pixels(i)
            dec = codecs.decode_qraw(codecs.encode_qraw(orig), row["w"], row["h"])
            assert codecs.psnr(orig, dec) >= 40.0
            checked_lossy += 1
    assert checked_lossy > 5


def test_missing_pages_recorded_not_raised(crawl_result):
    # reference skip-and-continue semantics (base.py:1096-1101)
    spec, vt = crawl_result
    assert set(vt["status"]) <= {"ok", "missing"}
