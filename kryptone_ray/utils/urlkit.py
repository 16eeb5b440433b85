"""Vectorized URL toolkit — the batch-level equivalent of the reference's
``URL`` object (``/root/reference/kryptone/utils/urls.py:41-492``).

The reference wraps every URL string in a Python object with ~40 lazy
predicates. In a Ray Data engine URLs arrive as an Arrow string column;
this module parses a whole batch in ONE pass (`parse_batch`) into plain
numpy arrays and exposes every predicate as a vectorized mask, so the
frontier validator (`stages/validate.py`) is a single `map_batches` body.

Semantics reproduced 1:1 (file:line cites into /root/reference):
- ``is_empty``         urls.py:172-177   (raw == '' or None)
- ``is_path``          urls.py:179-183   (startswith '/')
- ``is_valid``         urls.py:196-205   (startswith http:// or https://)
- ``has_fragment``     urls.py:207-215   (fragment != '' or endswith '#')
- ``is_image``         urls.py:241-246   (as_path suffix ∈ image-extension set)
- ``is_file``          urls.py:248-260   (as_path suffix ∈ file-extension set)
- ``as_path`` suffix   urls.py:263-278   (query → path only, else full raw url,
                                          unquote_plus, pathlib suffix rule)
- ``is_same_domain``   urls.py:360-373   (netloc equality)
- ``test_path``        urls.py:438-453   (re.search on urlparse().path)
- ``test_url``         urls.py:424-436   (re.search on raw url)
- ``urljoin`` + origin base.py:611-616, 341-356 (urljoin(origin, path), unquote)
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field
from urllib.parse import parse_qs, unquote, unquote_plus, urlencode, urljoin, urlparse, urlunparse

import numpy as np

# Image extensions: the reference's live property defers to PIL's registry
# (urls.py:30-38) and falls back to a static set (constants.py:6-36). PIL is
# not in this sandbox; we pin a deterministic set covering the common raster
# and vector web-image formats (superset of what the synthetic corpus emits).
IMAGE_SUFFIXES = frozenset(
    "." + e
    for e in (
        "jpg jpeg png gif bmp webp avif tif tiff ico svg heif heic jxl psd tga dds"
    ).split()
)

# File extensions: the full wordlist shipped as package data
# (kryptone_ray/data/file_extensions.txt — a public web-extension list,
# consumed by the reference at urls.py:152-155,248-260 with the same
# line-set membership semantics). Loaded once at import into a
# frozenset; the vectorized is_file() mask probes it per suffix.
def _load_file_suffixes() -> frozenset:
    import pathlib as _pl

    p = _pl.Path(__file__).parent.parent / "data" / "file_extensions.txt"
    try:
        lines = p.read_text().splitlines()
    except OSError:  # fallback: compact common-web set
        lines = [
            "." + e for e in (
                "php html htm xhtml shtml asp aspx jsp cgi js css txt xml json "
                "pdf doc docx xls xlsx ppt pptx zip gz tar rar 7z exe dmg iso "
                "csv ico swf wmv avi mp4 mp3 wav ogg woff woff2 ttf eot map "
                "yaml yml rss atom"
            ).split()
        ]
    return frozenset(ln.strip() for ln in lines if ln.strip())


FILE_SUFFIXES = _load_file_suffixes()

SOCIAL_HOST_MARKERS = (
    # urls.py:157-170 — substring membership on the *raw url*
    "facebook.com",
    "twitter.com",
    "tiktok.com",
    "snapchat.com",
    "youtube.com",
    "pinterest.com",
    "spotify.com",
)


def path_suffix(name: str) -> str:
    """``pathlib.PurePath(name).suffix`` semantics without pathlib overhead.

    Final-component extension: text from the last '.' iff that dot is
    neither the first nor the last character of the basename. Trailing
    slashes are ignored, as pathlib does ('a.jpg/' → '.jpg'), and
    trailing '.' components are dropped ('a.jpg/.' → '.jpg') — pathlib
    normalizes '.' segments away.
    """
    name = name.rstrip("/")
    while name.endswith("/."):
        name = name[:-2].rstrip("/")
    if name == ".":
        return ""
    base = name[name.rfind("/") + 1 :]
    i = base.rfind(".")
    if 0 < i < len(base) - 1:
        return base[i:]
    return ""


def as_path_suffix(raw: str, path: str, query: str) -> str:
    """Suffix of the reference's ``as_path`` (urls.py:263-278): when the URL
    has a query the path alone is used; otherwise the whole raw URL."""
    if raw == "":
        return ""
    if query != "":
        return path_suffix(unquote_plus(path))
    return path_suffix(unquote_plus(raw))


def origin_of(url: str) -> str:
    """scheme://netloc with empty path — reference ``get_origin``
    (base.py:341-356)."""
    if not url:
        return ""
    p = urlparse(url)
    return urlunparse((p.scheme, p.netloc, "", None, None, None))


def join_relative(origin: str, path: str) -> str:
    """Reference ``SiteCrawler.urljoin`` (base.py:611-616): strip, join onto
    the origin, unquote."""
    return unquote(urljoin(origin, str(path).strip()))


@dataclass
class UrlFrame:
    """Parsed components for a batch of URLs, columnar (object-dtype numpy).

    Built by :func:`parse_batch` in a single pass; every reference predicate
    is then a vectorized mask over these arrays.
    """

    raw: np.ndarray
    scheme: np.ndarray
    netloc: np.ndarray
    path: np.ndarray
    query: np.ndarray
    fragment: np.ndarray
    suffix: np.ndarray  # as_path suffix (see as_path_suffix)

    def __len__(self) -> int:
        return len(self.raw)

    def take(self, idx) -> "UrlFrame":
        """Row subset without re-parsing."""
        return UrlFrame(
            self.raw[idx], self.scheme[idx], self.netloc[idx], self.path[idx],
            self.query[idx], self.fragment[idx], self.suffix[idx],
        )

    # --- predicates (each returns np.ndarray[bool]) -------------------
    def is_empty(self) -> np.ndarray:
        return self.raw == ""

    def is_path(self) -> np.ndarray:
        return np.array([r.startswith("/") for r in self.raw], dtype=bool)

    def is_valid(self) -> np.ndarray:
        return np.array(
            [r.startswith("http://") or r.startswith("https://") for r in self.raw],
            dtype=bool,
        )

    def has_fragment(self) -> np.ndarray:
        return np.array(
            [(f != "" or r.endswith("#")) and r != "" for f, r in zip(self.fragment, self.raw)],
            dtype=bool,
        )

    def has_query(self) -> np.ndarray:
        return (self.query != "") & (self.raw != "")

    def has_path(self) -> np.ndarray:
        return (self.path != "") & (self.raw != "")

    def is_secured(self) -> np.ndarray:
        return (self.scheme == "https") & (self.raw != "")

    def is_image(self) -> np.ndarray:
        return np.array(
            [s in IMAGE_SUFFIXES and r != "" for s, r in zip(self.suffix, self.raw)], dtype=bool
        )

    def is_file(self) -> np.ndarray:
        return np.array(
            [s in FILE_SUFFIXES and r != "" for s, r in zip(self.suffix, self.raw)], dtype=bool
        )

    def is_social_link(self) -> np.ndarray:
        return np.array(
            [r != "" and any(m in r for m in SOCIAL_HOST_MARKERS) for r in self.raw], dtype=bool
        )

    def is_same_domain(self, start_url: str | None) -> np.ndarray:
        """urls.py:360-373 — netloc equality vs the start URL; a missing
        start URL makes every URL fail (reference returns False on None)."""
        if start_url is None:
            return np.zeros(len(self), dtype=bool)
        start_netloc = urlparse(start_url).netloc
        return self.netloc == start_netloc

    def test_path(self, regex: str | re.Pattern) -> np.ndarray:
        """urls.py:438-453 — re.search on the parsed path only."""
        pat = re.compile(regex) if isinstance(regex, str) else regex
        return np.array([pat.search(p) is not None for p in self.path], dtype=bool)

    def test_url(self, regex: str | re.Pattern) -> np.ndarray:
        """urls.py:424-436 — re.search anywhere in the raw url."""
        pat = re.compile(regex) if isinstance(regex, str) else regex
        return np.array([pat.search(r) is not None for r in self.raw], dtype=bool)

    def multi_test_path(self, regexes, operator: str = "and") -> np.ndarray:
        """urls.py:455-472 — AND/OR combination of test_path results."""
        if not regexes:
            return (
                np.ones(len(self), dtype=bool)
                if operator == "and"
                else np.zeros(len(self), dtype=bool)
            )
        masks = [self.test_path(r) for r in regexes]
        if operator == "and":
            return np.logical_and.reduce(masks)
        if operator == "or":
            return np.logical_or.reduce(masks)
        raise ValueError("Operator is not valid")


# One C-level regex pass replaces per-row stdlib urlparse for the two
# shapes that dominate a crawl frontier (http(s) absolute urls and
# scheme-less relatives) — urlparse was 12µs/url and the single hottest
# call of the expand/validate stage. Anything outside the proven-
# equivalent profile falls back to stdlib per row: other schemes
# (':' without a leading http(s)://), ';' (urlparse splits path params),
# control chars (urlsplit strips \t\r\n), or backslashes.
_FAST_SPLIT = re.compile(
    r"^(?:(http|https)://([^/?#]*))?([^?#]*)(?:\?([^#]*))?(?:#(.*))?$")
# '[' / ']' included: urlparse VALIDATES IPv6 bracket hosts (raising
# ValueError on malformed ones) — the fast path must not accept them
_NEEDS_STDLIB = re.compile(r"[;\t\r\n\\\[\]]")


def _parse_one(u: str):
    try:
        p = urlparse(u)
        return p.scheme, p.netloc, p.path, p.query, p.fragment
    except ValueError:
        # mirrors the ``except ValueError`` branch at urls.py:90-96
        return "", "", "", "", ""


def parse_batch(urls) -> UrlFrame:
    """Parse a batch of URL strings in one pass → :class:`UrlFrame`.

    None and non-string values map to '' (the reference's
    ``invalid_initial_check`` path, urls.py:66-72, makes them empty-ish
    and they are dropped by ``is_empty``/domain checks downstream).
    Unparseable URLs (e.g. invalid IPv6 literals) get empty components —
    mirroring the ``except ValueError`` branch at urls.py:90-96.
    Fast-path/stdlib equivalence is asserted over the whole conformance
    corpus (tests/test_urlkit.py)."""
    n = len(urls)
    raw = np.empty(n, dtype=object)
    scheme = np.empty(n, dtype=object)
    netloc = np.empty(n, dtype=object)
    path = np.empty(n, dtype=object)
    query = np.empty(n, dtype=object)
    fragment = np.empty(n, dtype=object)
    suffix = np.empty(n, dtype=object)
    for i, u in enumerate(urls):
        if u is None:
            u = ""
        elif not isinstance(u, str):
            u = str(u)
        raw[i] = u
        fast = (m := _FAST_SPLIT.match(u)) is not None and \
            not _NEEDS_STDLIB.search(u) and \
            (":" not in u or u.startswith(("http://", "https://"))) and \
            not u.startswith("//")  # scheme-less netloc-relative form
        if fast:
            sc, nl, pt, q, fr = m.groups()
            scheme[i] = sc or ""
            netloc[i] = nl or ""
            path[i] = pt or ""
            query[i] = q or ""
            fragment[i] = fr or ""
        else:
            scheme[i], netloc[i], path[i], query[i], fragment[i] = _parse_one(u)
        suffix[i] = as_path_suffix(u, path[i], query[i])
    return UrlFrame(raw, scheme, netloc, path, query, fragment, suffix)


# --- scalar URL transforms (reference parity helpers) ---------------------


def remove_fragment(url: str) -> str:
    """urls.py:474-492 — rebuild scheme://netloc/path (query and fragment
    dropped) iff a fragment is present, else the url unchanged."""
    p = urlparse(url)
    if p.fragment != "" or url.endswith("#"):
        return urlunparse((p.scheme, p.netloc, p.path, None, None, None))
    return url


def rebuild_query(url: str, **params: str) -> str:
    """urls.py:333-358 — merge existing query params (joined by ',') over
    the provided ones and re-encode; fragment dropped."""
    p = urlparse(url)
    if p.query != "":
        merged = dict(params)
        for key, value in parse_qs(p.query).items():
            merged[key] = ",".join(value) if isinstance(value, list) else value
        params = merged
    return urlunparse((p.scheme, p.netloc, p.path, None, urlencode(params), None))


def decompose_path(url: str, exclude: list[str] | None = None) -> list[str]:
    """urls.py:455-472(decompose) — split path on '/', dropping empties and
    excluded segments."""
    exclude = exclude or []
    return [s for s in urlparse(url).path.split("/") if s != "" and s not in exclude]


def capture(url: str, regex: str):
    """urls.py:397-408 — re.search returning the match or False."""
    m = re.search(regex, url)
    return m if m else False


def url_query(url: str) -> dict:
    """urls.py:299-311 — parse_qs of the query component."""
    return parse_qs(urlparse(url).query)


def transform_string_urls(urls):
    """base.py:881-884 — lifting generator. The reference lifts ``str``
    → ``URL`` objects; this engine's URL value type IS the canonical
    string (an Arrow string column at batch level), so the lift
    direction inverts: any URL-like object (something exposing a url
    string via ``str()``) passes through as its string, strings pass
    unchanged. One generator, same lazy contract."""
    for u in urls:
        yield u if isinstance(u, str) else str(u)


def normalize_urls(urls) -> list[str]:
    """base.py:358-361 — URL→str projection of a list/set. Batch-level
    equivalent: an Arrow string column is already the normalized form;
    this scalar form exists for driver-side call sites (seed lists,
    checkpoint manifests) that hold small Python collections."""
    return [str(u) for u in urls]
