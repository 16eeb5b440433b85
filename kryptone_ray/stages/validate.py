"""The frontier URL validation pipeline, vectorized.

Reproduces the reference's ordered ``check_urls`` pipeline
(``/root/reference/kryptone/base.py:652-760``) and the post-validation
``run_url_filters`` exclusion pass (``base.py:618-650``) as ONE batch
function suitable for ``Dataset.map_batches(batch_format="pyarrow")``.

Semantics preserved bit-for-bit (order matters because the reference adds
BOTH valid and invalid URLs to the seen set, ``base.py:744-745``, while
gather-ignored URLs are dropped *before* tracking, ``base.py:661-670``):

 1. raw-set dedupe                      (base.py:653; here: post-join dedupe,
                                         see note below)
 2. ``url_gather_ignore_tests``: regex-OR over the *path*; matches are
    dropped entirely — never tracked    (base.py:661-670)
 3. relative path → absolute via urljoin(origin, path) + unquote
                                        (base.py:682-683, 611-616)
 4. refresh-mode seen check             (base.py:685-691; membership is
                                         resolved by the seen-shard stage)
 5. same-domain (netloc equality vs start url)   (base.py:694-696)
 6. empty                               (base.py:698-700)
 7. fragment                            (base.py:702-704)
 8. home-page revisit guard (path=='/' both sides AND iteration>0)
                                        (base.py:706-717)
 9. ``ignore_images`` suffix drop       (base.py:719-722)
10. visited membership                  (base.py:724-726; seen-shard stage)
11. seen membership                     (base.py:728-730; seen-shard stage)
12. ``url_rule_tests``: regex-AND over the path — keep only if all match
                                        (base.py:735-740)
13. ``url_ignore_tests`` exclusion (any test True → removed from frontier
    but STILL seen — filters run after check_urls)   (base.py:618-650,771-773)

Dedupe note: the reference dedupes raw strings first (``set(urls)``) and
joins relative paths after; since joined URLs get the joined string as
their ``raw_url`` (base.py:615-616) and set identity keys on
``(raw_url, path)`` (urls.py:146-147), the net set outcome equals deduping
on the *post-join canonical string* — which is what we do.

Steps 4/10/11 need the distributed seen/visited state: this stage only
*marks* candidates; the membership anti-join happens in
``kryptone_ray.state.seen`` (order-free within a batch because the
reference's frontier/seen are sets and updates within one validation pass
are idempotent unions — see SURVEY.md §2.2).
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field
from urllib.parse import urlparse

import numpy as np
import pyarrow as pa

from kryptone_ray.utils.urlkit import UrlFrame, join_relative, origin_of, parse_batch
from kryptone_ray.utils.xxh64 import xxh64_batch

# Verdict labels (string column; compact dictionary-encoded by Arrow).
GATHER_IGNORED = "gather_ignored"  # dropped pre-tracking — NOT seen
CROSS_DOMAIN = "cross_domain"
EMPTY = "empty"
FRAGMENT = "fragment"
HOME_PAGE = "home_page"
IMAGE = "image"
QUERY = "query"  # extension: enforce_ignore_queries=True only
RULE_TEST = "rule_test"
FILTERED = "filtered"  # url_ignore_tests exclusion — seen but not frontier
ROBOTS = "robots_blocked"  # robots.txt disallow — extension (north rule);
# runs LAST, after every reference check, so reference parity is
# untouched when no robots provider is configured
CANDIDATE = "candidate"  # frontier candidate pending seen/visited anti-join


@dataclass
class UrlIgnoreTest:
    """Exclusion by path-substring — reference ``URLIgnoreTest``
    (urls.py:509-551): exclude if ANY configured path fragment is a
    substring of the URL's parsed path."""

    name: str
    paths: tuple[str, ...] = ()

    def mask(self, frame: UrlFrame) -> np.ndarray:
        if not self.paths:
            return np.zeros(len(frame), dtype=bool)
        return np.array(
            [any(p in path for p in self.paths) for path in frame.path], dtype=bool
        )


@dataclass
class UrlIgnoreRegexTest:
    """Exclusion by regex — reference ``URLIgnoreRegexTest``
    (urls.py:554-581): exclude if the regex searches anywhere in the full
    URL. Pattern compiled once per spec (per actor/closure), not per batch."""

    name: str
    regex: str

    def __post_init__(self) -> None:
        self._pat = re.compile(self.regex)

    def mask(self, frame: UrlFrame) -> np.ndarray:
        return np.array([self._pat.search(r) is not None for r in frame.raw], dtype=bool)


@dataclass
class ValidationConfig:
    """The ``Meta`` knobs that shape validation (base.py:41-83)."""

    start_url: str | None = None
    gather_ignore_regexes: tuple[str, ...] = ()  # url_gather_ignore_tests
    rule_test_regexes: tuple[str, ...] = ()  # url_rule_tests (AND)
    ignore_tests: tuple = ()  # UrlIgnoreTest | UrlIgnoreRegexTest
    ignore_images: bool = False
    # `ignore_queries` is declared in the reference Meta but never enforced
    # (base.py:68-69,158) — kept for parity as a declared no-op.
    ignore_queries: bool = False
    # the OPTIONAL real enforcement (extension; SURVEY §2.2 note): drop
    # URLs carrying a query string. Off by default for parity.
    enforce_ignore_queries: bool = False
    # Scale extension (NOT reference behavior, which is single-domain:
    # base.py:694-696): when set, a URL passes the domain check iff its
    # netloc is in this whitelist ("*" = any non-empty netloc). None →
    # reference parity: netloc equality vs the start URL.
    allowed_hosts: tuple[str, ...] | None = None
    # robots.txt extension: host → robots.txt text (deterministic);
    # None disables the check entirely (reference parity).
    robots_provider: object = None
    robots_agent: str = "*"

    def __post_init__(self) -> None:
        from kryptone_ray.state.robots import RobotsCache

        self._robots = (
            RobotsCache(self.robots_provider, self.robots_agent)
            if self.robots_provider is not None
            else None
        )
        self._gather_pats = tuple(re.compile(r) for r in self.gather_ignore_regexes)
        self._rule_pats = tuple(re.compile(r) for r in self.rule_test_regexes)
        self._origin = origin_of(self.start_url) if self.start_url else ""
        self._start_netloc = urlparse(self.start_url).netloc if self.start_url else None
        self._start_path = urlparse(self.start_url).path if self.start_url else ""


VALIDATE_SCHEMA = pa.schema(
    [
        ("url", pa.string()),
        ("host", pa.string()),
        ("url_hash", pa.uint64()),
        ("verdict", pa.string()),
    ]
)


def validate_batch(
    urls,
    cfg: ValidationConfig,
    iteration_count: int,
) -> pa.Table:
    """Run steps 1-3, 5-9, 12-13 over a batch of raw URL strings.

    Returns one row per *unique canonical* URL with columns
    ``(url, host, url_hash, verdict)``; ``verdict == 'candidate'`` rows
    proceed to the seen-shard anti-join (steps 4/10/11), every verdict
    except ``gather_ignored`` is added to the seen set afterwards.
    """
    frame = parse_batch(urls)

    # step 2 — gather-ignore regex-OR on the path, BEFORE join/tracking.
    gather_mask = np.zeros(len(frame), dtype=bool)
    for pat in cfg._gather_pats:
        gather_mask |= frame.test_path(pat)

    # step 3 — relative paths → absolute (only non-gather-ignored
    # survive); only joined rows are re-parsed.
    keep = ~gather_mask
    frame = frame.take(keep)
    is_rel = frame.is_path()
    if is_rel.any():
        rel_idx = np.flatnonzero(is_rel)
        joined = parse_batch(
            [join_relative(cfg._origin, frame.raw[i]) for i in rel_idx]
        )
        for name in ("raw", "scheme", "netloc", "path", "query", "fragment", "suffix"):
            getattr(frame, name)[rel_idx] = getattr(joined, name)

    # step 1 — dedupe on the post-join canonical string (keep-first).
    _, first_idx = np.unique(frame.raw.astype(str), return_index=True)
    first_idx.sort()
    frame = frame.take(first_idx)

    n = len(frame)
    verdict = np.full(n, CANDIDATE, dtype=object)
    undecided = np.ones(n, dtype=bool)

    def settle(mask: np.ndarray, label: str) -> None:
        nonlocal undecided
        hit = mask & undecided
        verdict[hit] = label
        undecided &= ~hit

    # step 5 — domain (reference order: before the empty test).
    if cfg.allowed_hosts is None:
        domain_ok = frame.is_same_domain(cfg.start_url)
    elif "*" in cfg.allowed_hosts:
        domain_ok = frame.netloc != ""
    else:
        allowed = frozenset(cfg.allowed_hosts)
        domain_ok = np.array([nl in allowed for nl in frame.netloc], dtype=bool)
    settle(~domain_ok, CROSS_DOMAIN)
    # step 6 — empty.
    settle(frame.is_empty(), EMPTY)
    # step 7 — fragment.
    settle(frame.has_fragment(), FRAGMENT)
    # step 8 — home-page revisit guard, active only after iteration 0.
    if iteration_count > 0 and cfg._start_path == "/":
        settle(frame.path == "/", HOME_PAGE)
    # step 9 — image suffixes.
    if cfg.ignore_images:
        settle(frame.is_image(), IMAGE)
    # step 9b (extension) — optional REAL ignore_queries enforcement.
    if cfg.enforce_ignore_queries:
        settle(frame.has_query(), QUERY)
    # step 12 — rule tests: keep only if ALL regexes match the path.
    if cfg._rule_pats:
        keep = np.ones(n, dtype=bool)
        for pat in cfg._rule_pats:
            keep &= frame.test_path(pat)
        settle(~keep, RULE_TEST)
    # step 13 — ignore filters: any test True → out of the frontier.
    if cfg.ignore_tests:
        excluded = np.zeros(n, dtype=bool)
        for test in cfg.ignore_tests:
            excluded |= test.mask(frame)
        settle(excluded, FILTERED)
    # step 14 (extension) — robots.txt disallow; last so reference
    # semantics are unchanged without a provider.
    if cfg._robots is not None:
        blocked = np.zeros(n, dtype=bool)
        for i in range(n):
            if undecided[i] and not cfg._robots.allowed(frame.netloc[i], frame.path[i]):
                blocked[i] = True
        settle(blocked, ROBOTS)

    return pa.table(
        {
            "url": pa.array(frame.raw, type=pa.string()),
            "host": pa.array(frame.netloc, type=pa.string()),
            "url_hash": pa.array(xxh64_batch(frame.raw), type=pa.uint64()),
            "verdict": pa.array(verdict, type=pa.string()),
        }
    )
