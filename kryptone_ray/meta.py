"""Crawler Meta options — reference parity for
``/root/reference/kryptone/base.py:41-83`` (``DEFAULT_META_OPTIONS``) and
``base.py:137-196`` (``CrawlerOptions``): the 11-knob user surface,
validated by name (unknown option → ValueError), with generator seeds
resolved at prepare time.

``to_crawl_spec()`` bridges the user surface onto the engine's
``CrawlSpec`` / ``ValidationConfig`` pair.
"""

from __future__ import annotations

from typing import Any

DEFAULT_META_OPTIONS: frozenset[str] = frozenset(
    {
        "domains",
        "url_ignore_tests",
        "url_rule_tests",
        "debug_mode",
        "default_scroll_step",
        "router",
        "crawl",
        "start_urls",
        "ignore_queries",
        "ignore_images",
        "restrict_search_to",
        "url_gather_ignore_tests",
        "database",
    }
)


class CrawlerOptions:
    def __init__(self, name: str):
        self.spider_name = name.lower()
        self.verbose_name = name.title()
        self.domains: list[str] = []
        self.url_ignore_tests: list[Any] = []
        self.debug_mode: bool = False
        self.default_scroll_step: int = 80
        self.router = None
        self.crawl: bool = True
        self.start_urls: list = []
        self.restrict_search_to: list[str] = []
        self.ignore_queries: bool = False  # declared but never enforced
        # (reference parity: base.py:68-69,158)
        self.ignore_images: bool = False
        self.url_gather_ignore_tests: list[str] = []
        self.url_rule_tests: list[str] = []
        self.database = None

    @property
    def has_start_urls(self) -> bool:
        return len(self.start_urls) > 0

    def add_meta_options(self, options) -> None:
        for name, value in options:
            if name not in DEFAULT_META_OPTIONS:
                raise ValueError(
                    f"Meta for model '{self.verbose_name}' received "
                    f"an illegal option '{name}'"
                )
            setattr(self, name, value)

    def prepare(self) -> None:
        """base.py:180-196 — resolve URL generators (anything iterable
        that is not a string) into the flat seed list."""
        if hasattr(self.start_urls, "resolve_generator") or (
            not isinstance(self.start_urls, (list, tuple))
            and hasattr(self.start_urls, "__iter__")
        ):
            self.start_urls = [str(u) for u in self.start_urls]
            return
        flat: list[str] = []
        for item in self.start_urls:
            if isinstance(item, str):
                flat.append(item)
            elif hasattr(item, "__iter__"):
                flat.extend(str(u) for u in item)
        self.start_urls = flat

    def to_crawl_spec(self, **overrides):
        """Bridge onto the engine's CrawlSpec (politeness knobs come from
        settings/overrides; WAIT_TIME default 25 s = conf/base.py:30)."""
        from kryptone_ray.sim.golden import CrawlSpec

        ignore_paths = []
        ignore_regexes = []
        for test in self.url_ignore_tests:
            paths = getattr(test, "paths", None)
            if paths is not None:
                ignore_paths.extend(paths)
            regex = getattr(test, "regex", None)
            if regex is not None:
                ignore_regexes.append(regex if isinstance(regex, str) else regex.pattern)
        kwargs = dict(
            ignore_images=self.ignore_images,
            gather_ignore_regexes=tuple(self.url_gather_ignore_tests),
            rule_test_regexes=tuple(self.url_rule_tests),
            ignore_paths=tuple(ignore_paths),
            ignore_regexes=tuple(ignore_regexes),
            allowed_hosts=tuple(self.domains) if self.domains else None,
        )
        kwargs.update(overrides)
        return CrawlSpec(**kwargs)
