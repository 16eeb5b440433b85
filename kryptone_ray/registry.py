"""Spider registry + system checks — the project scaffolding surface
(reference ``registry.py:215-296`` spider registry, ``checks/core.py``
``ApplicationChecks``) without the Django-style project directory: in a
Ray deployment the "project" is the driver script, so spiders register
by decorator/call or are resolved from a ``module:Class`` dotted path
at the CLI.
"""

from __future__ import annotations

import importlib
from typing import Callable


class SpiderRegistry:
    """Name → SiteCrawler subclass map (reference ``registry.get_spider``,
    registry.py:268-276)."""

    def __init__(self):
        self._spiders: dict[str, type] = {}

    def register(self, cls: type | None = None, *, name: str | None = None):
        """Use as ``@registry.register`` or ``@registry.register(name=…)``."""
        def _do(c: type) -> type:
            self._spiders[name or c.__name__] = c
            return c

        if cls is not None:
            return _do(cls)
        return _do

    def get_spider(self, name: str) -> type:
        if name in self._spiders:
            return self._spiders[name]
        raise KeyError(
            f"no spider named {name!r} registered "
            f"(known: {sorted(self._spiders)})"
        )

    @property
    def spiders_ready(self) -> bool:
        return bool(self._spiders)

    def clear(self) -> None:
        self._spiders.clear()


registry = SpiderRegistry()


def resolve(path: str):
    """``module:attr`` (or ``module.attr``) dotted-path import — the
    CLI's project-free stand-in for the reference's spiders module
    discovery (registry.py:215-241)."""
    if ":" in path:
        mod, attr = path.split(":", 1)
    else:
        mod, _, attr = path.rpartition(".")
        if not mod:
            raise ValueError(f"cannot resolve {path!r}: need module:attr")
    return getattr(importlib.import_module(mod), attr)


class ApplicationChecks:
    """System-check registry (reference checks/core.py:60-112): named
    callables run before a crawl starts; a check raises to fail."""

    def __init__(self):
        self._checks: dict[str, Callable] = {}

    def register(self, tag_name: str | None = None):
        def inner(func: Callable) -> Callable:
            if not callable(func):
                raise TypeError(
                    "A system check should be a callable function"
                )
            self._checks[tag_name or func.__name__] = func
            return func

        return inner

    def run(self, **context) -> list[str]:
        ran = []
        for tag, fn in self._checks.items():
            fn(**context)
            ran.append(tag)
        return ran


checks_registry = ApplicationChecks()


@checks_registry.register("corpus_dir_exists")
def _check_corpus(corpus_dir: str | None = None, **_) -> None:
    import pathlib

    if corpus_dir is None:
        return
    p = pathlib.Path(corpus_dir)
    if not p.is_dir() or not any(p.glob("*.parquet")):
        raise ValueError(f"corpus dir {corpus_dir!r} has no parquet shards")


@checks_registry.register("spider_meta_valid")
def _check_meta(spider_cls: type | None = None, **_) -> None:
    """Instantiating CrawlerOptions validates every Meta knob by name
    (meta.py — unknown option raises), without building an engine."""
    if spider_cls is None:
        return
    from kryptone_ray.meta import CrawlerOptions

    opts = CrawlerOptions(spider_cls.__name__)
    meta_cls = getattr(spider_cls, "Meta", None)
    if meta_cls is not None:
        opts.add_meta_options(
            [(n, v) for n, v in vars(meta_cls).items() if not n.startswith("_")]
        )
    opts.prepare()
