"""Seed sources + URL generators — reference parity for
``/root/reference/kryptone/utils/urls.py:598-756`` (generators),
``urls.py:1073-1110`` (``LoadStartUrls``) and
``utils/iterators.py:62-110`` (``CombinedIterators``).

Every generator has two forms:
- a plain deterministic Python iterable (driver-side, small seed lists);
- ``as_dataset(n)`` → ``ray.data.range(n).map_batches(expand)`` for
  synthetic seed lists too large to materialize (the 10^10-URL case:
  the generator function ships to workers; no file ever exists).
"""

from __future__ import annotations

import csv
import json
import pathlib
from string import Template
from urllib.parse import urlencode

import pyarrow as pa


def load_start_urls(path: str | pathlib.Path) -> list[str]:
    """urls.py:1073-1110 — seed file reader: CSV rows flattened, or JSON
    as ``[{'url': ...}, ...]`` or ``[str, ...]``."""
    p = pathlib.Path(path)
    if not p.exists():
        raise FileNotFoundError(f"no start-urls file: {p}")
    if p.suffix == ".json":
        data = json.loads(p.read_text())
        out = []
        for item in data:
            out.append(item["url"] if isinstance(item, dict) else str(item))
        return out
    with open(p, newline="") as f:
        return [cell for row in csv.reader(f) for cell in row if cell]


def load_start_urls_dataset(path: str):
    """Same contract as a Dataset source (for big seed files):
    column-pruned read, one ``url`` column out."""
    import ray.data as rd

    p = pathlib.Path(path)
    if p.suffix == ".json":
        return rd.read_json(str(p))
    ds = rd.read_csv(str(p))
    first = ds.schema().names[0]
    return ds.select_columns([first]).rename_columns(["url"])


class UrlQueryGenerator:
    """urls.py:598-661 — vary one numeric query param over
    [initial, end) with step; existing query keys are merged in.

    Reference quirks preserved: the range is ``end - initial`` iterations
    filtered by ``i % step == 0``; values are ``initial + i``.
    """

    def __init__(self, url: str, *, param: str, initial_value: int = 0,
                 end_value: int = 0, step: int = 1, query: dict | None = None):
        if initial_value < 0 or end_value < 0:
            raise ValueError("End value cannot be below initial value")
        self.url = url
        self.param = param
        self.initial = initial_value
        self.end = end_value
        self.step = step
        self.query = {k: ("" if v is None else v) for k, v in (query or {}).items()}

    def __iter__(self):
        for i in range(self.end - self.initial):
            if i % self.step == 0:
                q = self.query | {self.param: self.initial + i}
                yield f"{self.url}?{urlencode(q)}"

    def as_dataset(self):
        import ray.data as rd

        url, param, initial, step, query = (
            self.url, self.param, self.initial, self.step, dict(self.query),
        )

        def expand(t: pa.Table) -> pa.Table:
            urls = [
                f"{url}?{urlencode(query | {param: initial + int(i)})}"
                for i in t["id"].to_pylist()
                if int(i) % step == 0
            ]
            return pa.table({"url": pa.array(urls, type=pa.string())})

        return rd.range(self.end - self.initial).map_batches(
            expand, batch_format="pyarrow"
        )


class UrlPathGenerator:
    """urls.py:664-704 — ``string.Template`` path substitution: params
    whose value is 'number'/'k' count ``start..start+k-1``."""

    def __init__(self, template: str, params: dict | None = None, k: int = 10,
                 start: int = 0):
        self.template = Template(template)
        self.params = params or {}
        self.k = k
        self.start = start

    def _sub(self, i: int) -> str:
        values = {
            key.removeprefix("$"): i
            for key, value in self.params.items()
            if value in ("number", "k")
        }
        try:
            return self.template.substitute(values)
        except KeyError:
            return self.template.template

    def __iter__(self):
        for i in range(self.start, self.start + self.k):
            yield self._sub(i)

    def as_dataset(self):
        import ray.data as rd

        start, sub = self.start, self._sub

        def expand(t: pa.Table) -> pa.Table:
            return pa.table(
                {"url": pa.array([sub(start + int(i)) for i in t["id"].to_pylist()],
                                 type=pa.string())}
            )

        return rd.range(self.k).map_batches(expand, batch_format="pyarrow")


class UrlPaginationGenerator:
    """urls.py:707-756 — append ``?{param}=1..k`` to a base URL (fragment
    stripped first, reference behavior)."""

    def __init__(self, url: str, param_name: str = "page", k: int = 10):
        from kryptone_ray.utils.urlkit import remove_fragment

        self.url = remove_fragment(url)
        self.param = param_name
        self.k = int(k)

    def __iter__(self):
        for counter in range(1, self.k + 1):
            yield f"{self.url}?{urlencode({self.param: str(counter)})}"

    def as_dataset(self):
        import ray.data as rd

        url, param = self.url, self.param

        def expand(t: pa.Table) -> pa.Table:
            return pa.table(
                {
                    "url": pa.array(
                        [f"{url}?{urlencode({param: str(int(i) + 1)})}"
                         for i in t["id"].to_pylist()],
                        type=pa.string(),
                    )
                }
            )

        return rd.range(self.k).map_batches(expand, batch_format="pyarrow")


def combine(*generators):
    """iterators.py:62-110 ``CombinedIterators`` — concatenation; the
    Dataset form is a ``union``."""
    for g in generators:
        yield from g


def combine_datasets(*datasets):
    first, *rest = datasets
    return first.union(*rest) if rest else first
