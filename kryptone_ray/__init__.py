"""kryptone_ray — a Ray-Data-native crawl/data-processing engine.

A from-scratch reimplementation of the *capabilities* of the reference
crawler (Zadigo/kryptone, read-only at /root/reference) on top of
``ray.data.Dataset`` pipelines: a distributed URL frontier (sharded
seen-set + per-host politeness scheduler), actor-pool fetch/decode
stages over Arrow batches of image+caption rows, and the full set of
URL / text / relational operators the reference exposes — each
re-expressed as vectorized ``map_batches`` stages.

No code is copied from the reference; file:line citations in
docstrings point at the behavior being reproduced.
"""

__version__ = "0.2.0"


def __getattr__(name):
    """Lazy top-level API (keeps `import kryptone_ray` light — the
    engine pulls in ray/pyarrow only when actually used)."""
    if name == "SiteCrawler":
        from kryptone_ray.crawler import SiteCrawler

        return SiteCrawler
    if name == "RayCrawler":
        from kryptone_ray.engine.crawl import RayCrawler

        return RayCrawler
    if name == "registry":
        from kryptone_ray.registry import registry

        return registry
    raise AttributeError(name)
