"""Crawl-side operator pipelines exposed to the driver harness —
rows-only entries (no SQL oracle: they run over the engine's own
deterministic corpus, not the sf tables), each exercising a reference
operator family end-to-end:

- the full crawl engine (visit log of a pinned mini-crawl);
- the URL validation pipeline over generated out-links (verdict census);
- URL predicate classification (urls.py predicate suite);
- caption text ops (price parsing, email extraction — utils/text.py,
  contrib/seo.py over the corpus captions);
- the frontier-maintenance commands (reorder / filter_cache /
  extract_urls — management/commands/*.py).
"""

from __future__ import annotations

import tempfile

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data as rd

from kryptone_ray.corpus.synth import CorpusSpec, seed_urls
from kryptone_ray.stages.validate import (
    UrlIgnoreTest,
    ValidationConfig,
    validate_batch,
)
from kryptone_ray.text import ops
from kryptone_ray.utils import urlkit

_SPEC = CorpusSpec(n_rows=600, n_hosts=8, seed=77)


def _corpus_urls() -> list[str]:
    return [_SPEC.url_of(i) for i in range(_SPEC.n_rows)]


def q_crawl_visits(sf_dir: str) -> pd.DataFrame:
    """Deterministic mini-crawl through the full engine (local mode —
    exact parity semantics); returns the visit log (visit_idx, url,
    status, fmt). Pinned corpus; sf_dir unused."""
    from kryptone_ray.corpus.store import write_corpus
    from kryptone_ray.corpus.synth import make_corpus_table
    from kryptone_ray.engine.crawl import RayCrawler
    from kryptone_ray.sim.golden import CrawlSpec
    from kryptone_ray.corpus.synth import page_outlinks

    tmp = tempfile.mkdtemp(prefix="kr_q_crawl_")
    write_corpus(make_corpus_table(_SPEC), f"{tmp}/corpus", num_shards=4)
    cs = CrawlSpec(batch_size=16, wait_time=25.0, allowed_hosts=("*",), max_pages=200)
    eng = RayCrawler(f"{tmp}/corpus", page_outlinks(_SPEC), cs, f"{tmp}/run",
                     mode="local")
    eng.run(seeds=seed_urls(_SPEC, 8))
    vt = eng.visits_table().to_pandas()
    vt = vt.sort_values("visit_idx").reset_index(drop=True)
    return vt[["visit_idx", "url", "status", "fmt", "depth"]]


def q_link_verdicts(sf_dir: str) -> pd.DataFrame:
    """Validator verdict census over every out-link of the pinned corpus
    (check_urls branch distribution, base.py:652-760). Distributed:
    pages → outlinks → validate per batch → verdict counts."""
    spec = _SPEC

    def expand_validate(t: pa.Table) -> pa.Table:
        links: list[str] = []
        for i in t["id"].to_pylist():
            links.extend(spec.outlinks(int(i)))
        cfg = ValidationConfig(start_url=spec.url_of(0), allowed_hosts=("*",))
        vt = validate_batch(links, cfg, iteration_count=1)
        return vt.select(["verdict"])

    ds = rd.range(spec.n_rows).map_batches(expand_validate, batch_format="pyarrow",
                                           batch_size=128)
    df = ds.to_pandas()
    out = df.groupby("verdict").size().reset_index(name="n")
    return out.sort_values("verdict").reset_index(drop=True)


def q_url_predicates(sf_dir: str) -> pd.DataFrame:
    """URL predicate suite over all corpus URLs + noise variants
    (urls.py:157-246 as batch masks): counts per predicate."""
    urls = _corpus_urls() + [u + "#frag" for u in _corpus_urls()[:50]] + ["", "/rel"]
    f = urlkit.parse_batch(urls)
    rows = [
        ("is_valid", int(f.is_valid().sum())),
        ("is_empty", int(f.is_empty().sum())),
        ("is_path", int(f.is_path().sum())),
        ("has_fragment", int(f.has_fragment().sum())),
        ("has_query", int(f.has_query().sum())),
        ("is_image", int(f.is_image().sum())),
        ("is_file", int(f.is_file().sum())),
        ("is_secured", int(f.is_secured().sum())),
        ("is_social_link", int(f.is_social_link().sum())),
    ]
    return pd.DataFrame(rows, columns=["predicate", "n"])


def q_caption_prices(sf_dir: str) -> pd.DataFrame:
    """Price extraction from corpus captions (parse_price,
    utils/text.py:20-45) — per-format caption price stats."""

    def f(t: pa.Table) -> pa.Table:
        idxs = [int(i) for i in t["id"].to_pylist()]
        fmts, prices = [], []
        for i in idxs:
            cap = _SPEC.caption(i)
            m = ops.PRICE.search(cap) or ops.PRICE_EURO.match(cap)
            if m:
                fmts.append(_SPEC.fmt(i))
                prices.append(ops.parse_price(m.group(0)))
        return pa.table({"fmt": pa.array(fmts, type=pa.string()),
                         "price": pa.array(prices, type=pa.float64())})

    ds = rd.range(_SPEC.n_rows).map_batches(f, batch_format="pyarrow", batch_size=128)
    df = ds.to_pandas()
    g = df.groupby("fmt")
    out = pd.DataFrame({
        "fmt": list(g.groups),
        "n_prices": g.size().to_numpy(),
        "total": g["price"].sum().round(2).to_numpy(),
    })
    return out.reset_index(drop=True)


def q_caption_emails(sf_dir: str) -> pd.DataFrame:
    """Distinct emails across corpus captions (EmailMixin analog,
    contrib/seo.py:587-643): flat_map + distinct."""

    def f(t: pa.Table) -> pa.Table:
        emails: list[str] = []
        for i in t["id"].to_pylist():
            emails.extend(ops.extract_emails(_SPEC.caption(int(i))))
        return pa.table({"email": pa.array(emails, type=pa.string())})

    ds = rd.range(_SPEC.n_rows).map_batches(f, batch_format="pyarrow", batch_size=128)
    emails = sorted(set(ds.to_pandas()["email"]))
    return pd.DataFrame({"email": emails})


def q_frontier_reorder(sf_dir: str) -> pd.DataFrame:
    """management/commands/reorder.py analog: partition frontier URLs by
    regex match — matching URLs ranked first (stable within groups)."""
    import re

    urls = sorted(_corpus_urls())[:200]
    pat = re.compile(r"/img/")
    has_match = np.array([bool(pat.search(u)) for u in urls])
    order = np.argsort(~has_match, kind="stable")
    out = pd.DataFrame({
        "rank": np.arange(len(urls), dtype=np.int64),
        "url": [urls[i] for i in order],
        "has_match": has_match[order],
    })
    return out


def q_extract_urls(sf_dir: str) -> pd.DataFrame:
    """management/commands/extract_urls.py analog: apply a URLIgnoreTest
    over the frontier snapshot and write the MATCHING urls sorted (the
    command's CSV contract)."""
    urls = _corpus_urls()
    test = UrlIgnoreTest("items", paths=("/item/",))
    f = urlkit.parse_batch(urls)
    mask = test.mask(f)
    return pd.DataFrame({"url": sorted(np.asarray(urls, dtype=object)[mask])})


def q_filter_cache(sf_dir: str) -> pd.DataFrame:
    """management/commands/filter_cache.py analog: move pattern-matching
    URLs from to_visit → visited; returns the resulting set sizes."""
    import re

    urls = _corpus_urls()
    pat = re.compile(r"/cat/")
    to_visit = [u for u in urls if not pat.search(u)]
    visited = [u for u in urls if pat.search(u)]
    return pd.DataFrame(
        {"bucket": ["to_visit", "visited"], "n": [len(to_visit), len(visited)]}
    )


def q_images_by_extension(sf_dir: str) -> pd.DataFrame:
    """PageImagesIterator.classified_images analog
    (utils/iterators.py:113-195): group image URLs by extension."""
    urls = _corpus_urls()
    f = urlkit.parse_batch(urls)
    ext = [s if s in urlkit.IMAGE_SUFFIXES else "(none)" for s in f.suffix]
    out = pd.DataFrame({"ext": ext}).groupby("ext").size().reset_index(name="n")
    return out.sort_values("ext").reset_index(drop=True)
