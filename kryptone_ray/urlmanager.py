"""MultipleUrlManager — reference parity for
``/root/reference/kryptone/utils/urls.py:758-1070``: the standalone
frontier/visited manager with its own check pipeline, backup document,
and visit tracking table.

Deviation documented (SURVEY §4 tie-break): the reference pops with
``set.pop()`` — non-deterministic — here ``get()`` pops in lexicographic
order (the same documented deterministic rule the engine uses). The
reference's pandas ``dataframe`` mirror becomes an Arrow-friendly
``visits_frame()``; wall-clock visit stamps are replaced by an injected
virtual clock (determinism; see functions/dates.py).
"""

from __future__ import annotations

from urllib.parse import urlparse

import pandas as pd

from kryptone_ray.utils.urlkit import IMAGE_SUFFIXES, as_path_suffix


class MultipleUrlManager:
    def __init__(self, ignore_images: bool = True, sort_urls: bool = False):
        self._urls_to_visit: set[str] = set()
        self._visited_urls: set[str] = set()
        self.list_of_seen_urls: set[str] = set()
        self.start_url: str | None = None
        self.ignore_images = ignore_images
        self.sort_urls = sort_urls
        self.current_iteration = 0
        self._current_url: str | None = None
        self._visit_log: list[tuple[str, float]] = []

    def __repr__(self):
        return (f"<{type(self).__name__} urls_to_visit={self.urls_to_visit_count} "
                f"visited_urls={self.visited_urls_count}>")

    def __iter__(self):
        return iter(sorted(self._urls_to_visit))

    def __contains__(self, url) -> bool:
        return str(url) in self._urls_to_visit or str(url) in self._visited_urls

    def __len__(self) -> int:
        return len(self._urls_to_visit)

    @property
    def empty(self) -> bool:
        return not self._urls_to_visit

    @property
    def urls_to_visit_count(self) -> int:
        return len(self._urls_to_visit)

    @property
    def visited_urls_count(self) -> int:
        return len(self._visited_urls)

    @property
    def completion_rate(self) -> float:
        total = self.urls_to_visit_count + self.visited_urls_count
        if total == 0:
            return 0.0
        return round(self.visited_urls_count / total, 3)

    # --- the manager's own check pipeline (urls.py:930-998) -----------
    def add_urls(self, urls) -> set[str]:
        start_netloc = urlparse(self.start_url).netloc if self.start_url else ""
        start_path = urlparse(self.start_url).path if self.start_url else ""
        valid: set[str] = set()
        invalid: set[str] = set()
        for raw in set(str(u) for u in urls):
            p = urlparse(raw)
            if self.start_url and p.netloc != start_netloc:
                invalid.add(raw)
                continue
            if raw == "":
                invalid.add(raw)
                continue
            if p.fragment != "" or raw.endswith("#"):
                invalid.add(raw)
                continue
            if (p.path == "/" and start_path == "/" and self.current_iteration > 0):
                invalid.add(raw)
                continue
            if self.ignore_images and as_path_suffix(raw, p.path, p.query) in IMAGE_SUFFIXES:
                invalid.add(raw)
                continue
            if raw in self._visited_urls or raw in self.list_of_seen_urls:
                invalid.add(raw)
                continue
            valid.add(raw)
        self.list_of_seen_urls.update(valid)
        self.list_of_seen_urls.update(invalid)
        self._urls_to_visit.update(valid)
        return valid

    def populate(self, start_urls) -> None:
        """urls.py:1040-1070 — first call wins; the first start URL must
        be absolute."""
        if self.start_url is not None:
            return
        first = str(start_urls[0])
        if first.startswith("/"):
            raise ValueError(
                "The first url in the list of starting urls is a path; "
                "provide an absolute url string as the first value"
            )
        self.start_url = first
        self.add_urls([str(u) for u in start_urls])

    def get(self, now: float = 0.0) -> str | None:
        """Destructive next-url pop — deterministic lexicographic order
        (documented replacement for set.pop())."""
        if not self._urls_to_visit:
            return None
        url = min(self._urls_to_visit)
        self._urls_to_visit.discard(url)
        self._visited_urls.add(url)
        self._current_url = url
        self._visit_log.append((url, now))
        self.current_iteration += 1
        return url

    def visits_frame(self) -> pd.DataFrame:
        """The reference's ``dataframe`` mirror: every known URL with its
        visited flag and (virtual) visit stamp."""
        rows = {u: None for u in sorted(self._urls_to_visit | self._visited_urls)}
        stamps = dict(self._visit_log)
        return pd.DataFrame(
            {
                "urls": list(rows),
                "visited": [u in self._visited_urls for u in rows],
                "visited_on": [stamps.get(u) for u in rows],
            }
        )

    def backup(self, now_iso: str = "") -> dict:
        """urls.py:999-1013 — checkpoint document (clock injected)."""
        return {
            "date": now_iso,
            "urls_to_visit": sorted(self._urls_to_visit),
            "visited_urls": sorted(self._visited_urls),
            "statistics": {
                "last_visited_url": self._current_url,
                "urls_to_visit_count": self.urls_to_visit_count,
                "visited_urls_count": self.visited_urls_count,
                "total_urls": self.urls_to_visit_count + self.visited_urls_count,
                "completion_rate": self.completion_rate,
            },
        }

    def clear(self) -> None:
        self._urls_to_visit.clear()
        self._visited_urls.clear()
