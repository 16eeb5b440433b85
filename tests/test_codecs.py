"""Codec round-trips and the PSNR >= 40 dB lossy invariant (BASELINE.json
input_hint; FIXTURES.md F1a)."""

import numpy as np
import pytest

from kryptone_ray.corpus import codecs
from kryptone_ray.corpus.synth import CorpusSpec


@pytest.fixture(scope="module")
def spec():
    return CorpusSpec(n_rows=200, n_hosts=8, seed=42)


def test_raw_roundtrip(spec):
    px = spec.pixels(0)
    h, w, _ = px.shape
    out = codecs.decode_raw(codecs.encode_raw(px), w, h)
    np.testing.assert_array_equal(px, out)


def test_png_roundtrip_lossless(spec):
    for i in range(5):
        px = spec.pixels(i)
        h, w, _ = px.shape
        data = codecs.encode_png(px)
        assert data[:8] == b"\x89PNG\r\n\x1a\n"
        out = codecs.decode_png(data)
        np.testing.assert_array_equal(px, out)
        assert codecs.psnr(px, out) == float("inf")


def test_qraw_lossy_psnr_above_40db(spec):
    for i in range(20):
        px = spec.pixels(i)
        h, w, _ = px.shape
        out = codecs.decode_qraw(codecs.encode_qraw(px), w, h)
        p = codecs.psnr(px, out)
        assert p >= 40.0, f"row {i}: PSNR {p:.2f} dB < 40"


def test_corpus_rows_decode_and_match_phash(spec):
    from kryptone_ray.utils.xxh64 import content_hash64

    for i in range(30):
        row = spec.row(i)
        px = codecs.decode(row["bytes"], row["fmt"], row["w"], row["h"])
        assert px.shape == (row["h"], row["w"], 3)
        if row["fmt"] in codecs.LOSSLESS:
            assert int(np.uint64(row["phash"])) == content_hash64(px.tobytes())
        else:
            assert codecs.psnr(spec.pixels(i), px) >= 40.0


def test_corpus_determinism(spec):
    spec2 = CorpusSpec(n_rows=200, n_hosts=8, seed=42)
    for i in (0, 7, 199):
        assert spec.row(i)["bytes"] == spec2.row(i)["bytes"]
        assert spec.url_of(i) == spec2.url_of(i)
        assert spec.outlinks(i) == spec2.outlinks(i)


def test_outlinks_cover_validator_branches(spec):
    seen_kinds = set()
    for i in range(200):
        for link in spec.outlinks(i):
            if link == "":
                seen_kinds.add("empty")
            elif link.endswith("#") or "#" in link:
                seen_kinds.add("fragment")
            elif link.startswith("/"):
                seen_kinds.add("relative")
            elif link.endswith("/") and link.count("/") == 3:
                seen_kinds.add("home")
            elif "facebook" in link:
                seen_kinds.add("social")
    assert {"empty", "fragment", "relative", "home", "social"} <= seen_kinds


def test_url_row_roundtrip(spec):
    from kryptone_ray.corpus.synth import row_index_of

    for i in range(50):
        assert row_index_of(spec.url_of(i)) == i
