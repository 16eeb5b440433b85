"""Deterministic synthetic crawl corpus (FIXTURES.md F1-F3).

The "web" the engine crawls: a Lance-style table of image+caption rows
with schema ``(image_id:string, bytes:binary, w:int32, h:int32,
fmt:string, caption:string, phash:int64)`` (BASELINE.json input_hint).
Everything is a pure function of ``(row_index, seed)`` — no RNG state —
so any slice of the corpus can be produced independently on any worker
(``ray.data.range(n).map_batches(synth_batch)``) and the link graph can
be recomputed without lookups.

The out-link function replaces the reference's Selenium link collection
(``/root/reference/kryptone/base.py:473-503``): per page it emits a
deterministic mix of same-host children, cross-host URLs, fragments,
empties, image links, duplicates, relative paths and home-page links —
one for every branch of the validator (FIXTURES.md F2).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from kryptone_ray.corpus import codecs
from kryptone_ray.utils.xxh64 import content_hash64, xxh64

_M = 0xFFFFFFFFFFFFFFFF
_MIX1 = 0xFF51AFD7ED558CCD
_MIX2 = 0xC4CEB9FE1A85EC53

CORPUS_SCHEMA = pa.schema(
    [
        ("image_id", pa.string()),
        ("bytes", pa.binary()),
        ("w", pa.int32()),
        ("h", pa.int32()),
        ("fmt", pa.string()),
        ("caption", pa.string()),
        ("phash", pa.int64()),
    ]
)

_CAPTION_VOCAB = (
    "soleil montagne rivière forêt château plage marché café déjà être "
    "naïve crème brûlée garçon hôtel île façade cliché résumé touché "
    "sunset harbor window garden velvet copper meadow lantern whisper "
    "autumn bridge marble shadow ribbon".split()
)
_CAPTION_EXTRAS = (
    "contact@example-shop.fr",
    "promo: 4,4 €",
    "prix 12€50 !",
    "sale -50% (today)",
    "info@corpus.test",
)


def mix64(x: int) -> int:
    """splitmix64-style avalanche — cheap deterministic per-index entropy."""
    x = (x + 0x9E3779B97F4A7C15) & _M
    x = ((x ^ (x >> 30)) * _MIX1) & _M
    x = ((x ^ (x >> 27)) * _MIX2) & _M
    return x ^ (x >> 31)


def _zipf_cdf(n_hosts: int, alpha: float = 1.2) -> np.ndarray:
    w = 1.0 / np.power(np.arange(1, n_hosts + 1, dtype=np.float64), alpha)
    return np.cumsum(w / w.sum())


class CorpusSpec:
    """Deterministic corpus layout: row index → host / path / fmt / size.

    Hot-domain skew on purpose: hosts are drawn Zipf(alpha) so host 0
    receives a large share of pages (exercises salting / politeness).
    """

    def __init__(self, n_rows: int, n_hosts: int = 64, seed: int = 42,
                 alpha: float = 1.2, min_dim: int = 8, max_dim: int = 64):
        self.n_rows = n_rows
        self.n_hosts = n_hosts
        self.seed = seed
        self.min_dim = min_dim
        self.max_dim = max_dim
        self._cdf = _zipf_cdf(n_hosts, alpha)

    def host_index(self, i: int) -> int:
        u = (mix64(i * 2 + self.seed) & 0xFFFFFFFF) / 2**32
        return int(np.searchsorted(self._cdf, u))

    def host(self, i: int) -> str:
        return f"h{self.host_index(i):04d}.corpus.test"

    def url_of(self, i: int) -> str:
        """Canonical page URL of corpus row ``i`` — recomputable anywhere."""
        h = mix64(i * 3 + 1 + self.seed)
        kind = h % 100
        host = self.host(i)
        if kind < 80:
            return f"https://{host}/p/{i}"
        if kind < 90:
            return f"https://{host}/img/{i}.png"  # image-suffixed page
        return f"https://{host}/cat/{h % 7}/item/{i}"

    def dims(self, i: int) -> tuple[int, int]:
        h = mix64(i * 5 + 2 + self.seed)
        span = self.max_dim - self.min_dim + 1
        return self.min_dim + (h % span), self.min_dim + ((h >> 8) % span)

    def fmt(self, i: int) -> str:
        return codecs.FORMATS[mix64(i * 7 + 3 + self.seed) % 3]

    def pixels(self, i: int) -> np.ndarray:
        w, h = self.dims(i)
        idx = np.arange(w * h * 3, dtype=np.uint64)
        base = np.uint64(mix64(i * 11 + 4 + self.seed))
        v = (idx * np.uint64(0x9E3779B97F4A7C15) + base) * np.uint64(_MIX1)
        return ((v >> np.uint64(33)) & np.uint64(0xFF)).astype(np.uint8).reshape(h, w, 3)

    def caption(self, i: int) -> str:
        h = mix64(i * 13 + 5 + self.seed)
        n_tok = 4 + h % 8
        toks = [
            _CAPTION_VOCAB[mix64(i * 17 + 6 + t) % len(_CAPTION_VOCAB)]
            for t in range(n_tok)
        ]
        if h % 5 == 0:
            toks.append(_CAPTION_EXTRAS[(h >> 8) % len(_CAPTION_EXTRAS)])
        return " ".join(toks)

    def row(self, i: int) -> dict:
        w, h = self.dims(i)
        fmt = self.fmt(i)
        px = self.pixels(i)
        return {
            "image_id": self.url_of(i),
            "bytes": codecs.encode(px, fmt),
            "w": w,
            "h": h,
            "fmt": fmt,
            "caption": self.caption(i),
            "phash": np.int64(np.uint64(content_hash64(px.tobytes())).astype(np.int64)),
        }

    def synth_batch(self, indices) -> pa.Table:
        """Batch materializer for ``ray.data.range(n).map_batches``."""
        rows = [self.row(int(i)) for i in indices]
        return pa.Table.from_pylist(rows, schema=CORPUS_SCHEMA)

    # --- out-link function (F2) --------------------------------------
    def outlinks(self, i: int, fanout: int = 6) -> list[str]:
        """Deterministic out-links of corpus page ``i``.

        Mix per FIXTURES.md F2: (a) children pointing at other corpus rows
        (same- and cross-host — the validator's domain check prunes the
        latter), (b) noise exercising every validator branch: fragments,
        empty strings, trailing-#, image suffixes, duplicates, relative
        paths, home-page links, social links.
        """
        h = mix64(i * 19 + 7 + self.seed)
        links: list[str] = []
        for c in range(fanout):
            j = mix64(i * 23 + 11 * (c + 1) + self.seed) % self.n_rows
            links.append(self.url_of(j))
        # noise — each branch keyed off independent bits
        j0 = mix64(i * 29 + 13 + self.seed) % self.n_rows
        if h % 3 == 0:
            links.append(self.url_of(j0) + "#section")
        if h % 5 == 0:
            links.append("")
        if h % 7 == 0:
            links.append(self.url_of(j0) + "#")
        if h % 11 == 0:
            u = self.url_of(j0)
            links.append("/" + u.split("/", 3)[3])  # relative form of a child
        if h % 13 == 0:
            links.append(f"https://{self.host(i)}/")  # home-page link
        if h % 17 == 0:
            links.append("https://facebook.com/corpus")  # cross-domain social
        if h % 4 == 0 and links:
            links.append(links[0])  # duplicate
        return links


def page_outlinks(spec: CorpusSpec):
    """Out-link function for EXISTING corpus pages; anything else (fetch
    miss) yields no links — the contract shared by the engine, the golden
    simulator, entry() and the parity tests."""

    def fn(url: str):
        i = row_index_of(url)
        if i is None or not (0 <= i < spec.n_rows) or spec.url_of(i) != url:
            return []
        return spec.outlinks(i)

    return fn


def outlink_batch(spec: CorpusSpec, urls: list[str]) -> list[list[str]]:
    """Vectorized-ish wrapper: page URL → out-links, recovering the row
    index from the URL's trailing integer (url_of embeds it)."""
    out = []
    for u in urls:
        i = row_index_of(u)
        out.append(spec.outlinks(i) if i is not None else [])
    return out


def row_index_of(url: str) -> int | None:
    """Recover the corpus row index embedded in a canonical page URL."""
    tail = url.rstrip("/").rsplit("/", 1)[-1]
    if tail.endswith(".png"):
        tail = tail[:-4]
    try:
        return int(tail)
    except ValueError:
        return None


def make_corpus_table(spec: CorpusSpec) -> pa.Table:
    """In-memory corpus for unit tests (small n only)."""
    return spec.synth_batch(range(spec.n_rows))


def seed_urls(spec: CorpusSpec, n_seeds: int) -> list[str]:
    """F3 — seed list: the first ``n_seeds`` distinct corpus URLs drawn
    deterministically; the crawl's start_url is the LAST seed
    (reference convention, base.py:1048-1049)."""
    step = max(1, spec.n_rows // max(1, n_seeds))
    return [spec.url_of((k * step) % spec.n_rows) for k in range(n_seeds)]
