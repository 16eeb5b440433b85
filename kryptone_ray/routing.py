"""URL routing — reference parity for
``/root/reference/kryptone/routing.py:7-131`` (``Route`` / ``route`` /
``Router``), re-expressed for batch pipelines: routing is a computed
``tag`` column (``tag_batch``) feeding a ``groupby(tag)`` dispatch, with
the callable-resolution form (``Router.resolve``) preserved for
driver-side hooks.
"""

from __future__ import annotations

import re
from collections import OrderedDict
from dataclasses import dataclass, field as dc_field
from urllib.parse import urlparse

import numpy as np
import pyarrow as pa


@dataclass
class Route:
    """routing.py:7-70 — match on exact path equality OR regex over the
    path; dispatches to a named method on the handler instance."""

    function_name: str
    path: str | None = None
    regex: str | None = None
    name: str | None = None
    matched_urls: list = dc_field(default_factory=list)

    def __post_init__(self):
        if self.path is None and self.regex is None:
            raise ValueError("Both url path and regex cannot be None")
        self._pat = re.compile(self.regex) if self.regex else None

    def matches(self, url: str) -> bool:
        p = urlparse(url)
        if self.path is not None and p.path == self.path:
            return True
        if self._pat is not None and self._pat.search(p.path):
            return True
        return False

    def __call__(self, current_url: str, handler) -> bool:
        if not self.matches(current_url):
            return False
        func = getattr(handler, self.function_name, None)
        if func is None:
            # reference: silently skip when no function exists
            return False
        func(current_url, route=self)
        self.matched_urls.insert(0, current_url)
        return True


def route(function_name: str, *, path: str | None = None,
          regex: str | None = None, name: str | None = None) -> Route:
    return Route(function_name=function_name, path=path, regex=regex, name=name)


class Router:
    """routing.py:88-131 — ordered route collection; ``resolve`` invokes
    every matching route; ``tag_batch`` is the vectorized form: first
    matching route's name per URL (or '' when none)."""

    def __init__(self, routes: list[Route]):
        self.routes: OrderedDict[str, Route] = OrderedDict()
        for i, r in enumerate(routes):
            self.routes[r.name if r.name is not None else f"route_{i}"] = r

    @property
    def has_routes(self) -> bool:
        return len(self.routes) > 0

    def resolve(self, current_url: str, handler) -> list[bool]:
        return [r(current_url, handler) for r in self.routes.values()]

    def tag_batch(self, urls) -> np.ndarray:
        """Vectorized dispatch column for ``groupby(tag)``."""
        out = np.empty(len(urls), dtype=object)
        for i, u in enumerate(urls):
            tag = ""
            for name, r in self.routes.items():
                if r.matches(u):
                    tag = name
                    break
            out[i] = tag
        return out

    def tag_table(self, t: pa.Table, url_col: str = "url") -> pa.Table:
        return t.append_column(
            "route_tag", pa.array(self.tag_batch(t[url_col].to_pylist()))
        )
