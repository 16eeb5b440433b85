"""Reference-faithful crawl simulator — the golden oracle (FIXTURES.md F4).

A pure-Python, single-process re-implementation of the reference state
machine (/root/reference/kryptone/base.py:1053-1211 visit loop,
base.py:652-760 check_urls, base.py:618-650 run_url_filters,
base.py:1281-1469 boost batch shape), with Selenium replaced by the
deterministic out-link function and ``set.pop()`` replaced by the
DOCUMENTED deterministic tie-break (SURVEY.md §4):

    visit priority = (depth at first discovery, url lexicographic)

Politeness is a VIRTUAL clock (no wall sleeps): the global WAIT_TIME gate
(conf/base.py:30, base.py:1185-1194) advances the clock once per batch;
optional per-host min-delay (``host_delay``) additionally serializes
same-host fetches — at most one URL per host per batch, a host becomes
eligible again once ``clock >= next_ok[host]``.

This module is deliberately INDEPENDENT of the vectorized validator in
``stages/validate.py`` — it re-derives every check from ``urllib.parse``
scalars so engine-vs-golden equality is a meaningful cross-check.
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field
from urllib.parse import urljoin, urlparse, unquote

from kryptone_ray.utils.urlkit import IMAGE_SUFFIXES, as_path_suffix


@dataclass
class CrawlSpec:
    """Knobs shared verbatim by the simulator and the Ray engine."""

    batch_size: int = 1  # k pages per politeness window (boost_start tabs)
    crawl: bool = True  # Meta.crawl (base.py:1123-1125): False = visit the
    # seeds only, never expand links
    wait_time: float = 25.0  # virtual seconds per batch
    host_delay: float = 0.0  # >0 → at most one fetch per host per batch
    max_pages: int | None = None
    ignore_images: bool = False
    gather_ignore_regexes: tuple[str, ...] = ()
    rule_test_regexes: tuple[str, ...] = ()
    ignore_paths: tuple[str, ...] = ()  # URLIgnoreTest-style path substrings
    ignore_regexes: tuple[str, ...] = ()  # URLIgnoreRegexTest-style
    allowed_hosts: tuple[str, ...] | None = None  # None → start-netloc only
    # robots.txt extension (north rule; reference has none): host →
    # robots.txt text; disallowed URLs are seen-but-not-frontier, a
    # host's Crawl-delay overrides host_delay for that host.
    robots_provider: object = None
    robots_agent: str = "*"


@dataclass
class GoldenResult:
    visits: list  # [(iter, url, virtual_ts)]
    seen: set
    frontier: set  # urls left unvisited at termination
    lineage: list  # [(page_url, out_url)] raw collection log


class GoldenSimulator:
    def __init__(self, outlinks_fn, spec: CrawlSpec):
        self.outlinks_fn = outlinks_fn
        self.spec = spec
        self._gather = [re.compile(r) for r in spec.gather_ignore_regexes]
        self._rules = [re.compile(r) for r in spec.rule_test_regexes]
        self._ignore_res = [re.compile(r) for r in spec.ignore_regexes]
        if spec.robots_provider is not None:
            from kryptone_ray.state.robots import RobotsCache

            self._robots = RobotsCache(spec.robots_provider, spec.robots_agent)
        else:
            self._robots = None

    def _delay_of(self, host: str) -> float:
        if self._robots is not None:
            cd = self._robots.crawl_delay(host)
            if cd is not None:
                return cd
        return self.spec.host_delay

    @property
    def _politeness_active(self) -> bool:
        return self.spec.host_delay > 0 or self._robots is not None

    # --- scalar re-derivation of check_urls (base.py:652-760) ---------
    def _check_one(self, url: str, start_netloc: str, start_path: str,
                   origin: str, iteration: int, seen: set, visited: set):
        """Returns (canonical_url, 'candidate'|'invalid'|'dropped').

        'dropped' = gather-ignored → never tracked; 'invalid' → tracked
        as seen but not frontier.
        """
        if url is None or not isinstance(url, str):
            url = "" if url is None else str(url)
        p = _safe_parse(url)
        # gather-ignore: regex-OR on the (possibly relative) path
        if any(g.search(p.path) for g in self._gather):
            return url, "dropped"
        # relative → absolute on the START url origin (base.py:611-616)
        if url.startswith("/"):
            url = unquote(urljoin(origin, url.strip()))
            p = _safe_parse(url)
        # domain
        if self.spec.allowed_hosts is None:
            ok = p.netloc == start_netloc and start_netloc != ""
        elif "*" in self.spec.allowed_hosts:
            ok = p.netloc != ""
        else:
            ok = p.netloc in self.spec.allowed_hosts
        if not ok:
            return url, "invalid"
        if url == "":
            return url, "invalid"
        if p.fragment != "" or url.endswith("#"):
            return url, "invalid"
        if p.path == "/" and start_path == "/" and iteration > 0:
            return url, "invalid"
        if self.spec.ignore_images:
            if as_path_suffix(url, p.path, p.query) in IMAGE_SUFFIXES:
                return url, "invalid"
        if url in visited:
            return url, "invalid"
        if url in seen:
            return url, "invalid"
        if self._rules and not all(r.search(p.path) for r in self._rules):
            return url, "invalid"
        # run_url_filters (base.py:618-650): any ignore test → excluded,
        # but check_urls already marked it seen.
        if any(frag in p.path for frag in self.spec.ignore_paths):
            return url, "invalid"
        if any(r.search(url) for r in self._ignore_res):
            return url, "invalid"
        if self._robots is not None and not self._robots.allowed(p.netloc, p.path):
            return url, "invalid"
        return url, "candidate"

    def run(self, seeds: list[str], *, refresh_pages: list[str] | None = None,
            prior_seen: set[str] | None = None) -> GoldenResult:
        """Normal crawl from ``seeds`` — or, when ``refresh_pages`` is
        given, the reference's REFRESH mode (base.py:685-691 step 4 +
        1162-1164): previously-visited pages re-enter the frontier
        directly (depth 0) while ``prior_seen`` blocks every already-seen
        out-link, so only new urls are discovered."""
        spec = self.spec
        start_url = seeds[-1]  # reference convention, base.py:1048-1049
        sp = _safe_parse(start_url)
        start_netloc, start_path = sp.netloc, sp.path
        origin = f"{sp.scheme}://{sp.netloc}" if sp.netloc else ""

        seen: set[str] = set(prior_seen) if prior_seen else set()
        visited: set[str] = set()
        frontier: dict[str, int] = {}  # url -> depth at first discovery
        next_ok: dict[str, float] = {}
        visits: list = []
        lineage: list = []

        def ingest(urls, iteration: int, depth: int):
            for u in dict.fromkeys(urls):  # set-dedupe, deterministic order
                cu, verdict = self._check_one(
                    u, start_netloc, start_path, origin, iteration, seen, visited
                )
                if verdict == "dropped":
                    continue
                already = cu in seen
                seen.add(cu)
                if verdict == "candidate" and not already and cu not in frontier:
                    frontier[cu] = depth

        if refresh_pages is not None:
            seen.update(refresh_pages)
            for u in dict.fromkeys(refresh_pages):
                frontier[u] = 0
        else:
            ingest(seeds, iteration=0, depth=0)

        clock = 0.0
        visit_index = 0
        while frontier:
            if spec.max_pages is not None and visit_index >= spec.max_pages:
                break
            if self._politeness_active:
                eligible = [u for u in frontier if next_ok.get(_host(u), 0.0) <= clock]
                if not eligible:
                    clock = max(
                        clock, min(next_ok.get(_host(u), 0.0) for u in frontier)
                    )
                    eligible = [
                        u for u in frontier if next_ok.get(_host(u), 0.0) <= clock
                    ]
            else:
                eligible = list(frontier)

            eligible.sort(key=lambda u: (frontier[u], u))
            batch: list[str] = []
            hosts_in_batch: set[str] = set()
            for u in eligible:
                if len(batch) >= spec.batch_size:
                    break
                h = _host(u)
                # one-per-batch only for hosts with a positive delay
                if h in hosts_in_batch and self._delay_of(h) > 0:
                    continue
                batch.append(u)
                hosts_in_batch.add(h)
            if not batch:
                break

            # visit every page of the batch in priority order
            for u in batch:
                depth = frontier.pop(u)
                visited.add(u)
                visits.append((visit_index, u, clock))
                if self._politeness_active:
                    d = self._delay_of(_host(u))
                    if d > 0:
                        next_ok[_host(u)] = clock + d
                links = self.outlinks_fn(u) if spec.crawl else []
                lineage.extend((u, l) for l in links)
                ingest(links, iteration=visit_index, depth=depth + 1)
                visit_index += 1
                if spec.max_pages is not None and visit_index >= spec.max_pages:
                    break
            clock += spec.wait_time

        return GoldenResult(
            visits=visits, seen=seen, frontier=set(frontier), lineage=lineage
        )


def _safe_parse(url: str):
    try:
        return urlparse(url)
    except ValueError:
        return urlparse("")


def _host(url: str) -> str:
    return _safe_parse(url).netloc
