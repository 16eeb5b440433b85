"""``SiteCrawler`` — the migration facade: the reference user's
subclass-with-``Meta`` surface (/root/reference/kryptone/base.py
``SiteCrawler`` + metaclass options collection, base.py:253-285) mapped
onto the distributed engine.

A reference spider:

    class MySpider(SiteCrawler):
        class Meta:
            start_urls = ['https://host/p/1', ...]
            url_ignore_tests = [URLIgnoreTest('x', paths=['/2'])]
            ignore_images = True

        def current_page_actions(self, current_url, **kwargs): ...

becomes:

    class MySpider(SiteCrawler):
        class Meta:
            start_urls = [...]
            url_ignore_tests = [UrlIgnoreTest('x', paths=('/2',))]
            ignore_images = True

        def current_page_actions(self, pages):   # Arrow batch, not one url
            return items_table_or_None

    MySpider(corpus_dir=..., outlinks_fn=..., run_dir=...).start()

Differences (documented): page actions receive the decoded PAGE BATCH
(Arrow table) instead of one URL per call — the batch is the unit of
work in a distributed engine; Selenium navigation is the corpus fetch;
the politeness clock is virtual.
"""

from __future__ import annotations

from kryptone_ray.engine.crawl import RayCrawler
from kryptone_ray.meta import CrawlerOptions


class SiteCrawler:
    """Subclass + inner ``Meta`` → configured distributed crawl."""

    model = None  # optional dataclass for item validation (models.py)

    class Meta:
        pass

    def __init__(self, corpus_dir: str, outlinks_fn, run_dir: str,
                 batch_size: int = 16, wait_time: float = 25.0,
                 host_delay: float = 0.0, max_pages: int | None = None,
                 mode: str = "tasks", robots_provider=None, **engine_kwargs):
        self._meta = CrawlerOptions(type(self).__name__)
        meta_cls = getattr(type(self), "Meta", None)
        if meta_cls is not None:
            options = [
                (name, value)
                for name, value in vars(meta_cls).items()
                if not name.startswith("_")
            ]
            self._meta.add_meta_options(options)
        self._meta.prepare()

        spec = self._meta.to_crawl_spec(
            batch_size=batch_size,
            wait_time=wait_time,
            host_delay=host_delay,
            max_pages=max_pages,
            crawl=self._meta.crawl,
            robots_provider=robots_provider,
        )
        page_actions = None
        if type(self).current_page_actions is not SiteCrawler.current_page_actions:
            page_actions = self.current_page_actions
        self.engine = RayCrawler(
            corpus_dir=corpus_dir,
            outlinks_fn=outlinks_fn,
            spec=spec,
            run_dir=run_dir,
            mode=mode,
            page_actions=page_actions,
            **engine_kwargs,
        )

    # --- lifecycle hooks (base.py:798-831) ----------------------------
    def before_start(self, start_urls: list[str]) -> list[str]:
        """Override to massage the seed list (reference before_start)."""
        return start_urls

    def current_page_actions(self, pages):
        """Override: called per decoded page batch (Arrow table); return
        an Arrow table of items (landed in run_dir/items/) or None."""
        return None

    # --- run ----------------------------------------------------------
    def start(self, start_urls: list[str] | None = None,
              checkpoint_every: int = 0) -> dict:
        seeds = list(start_urls or self._meta.start_urls)
        if not seeds:
            raise ValueError("no start_urls (Meta.start_urls or argument)")
        seeds = self.before_start(seeds)
        return self.engine.run(seeds=seeds, checkpoint_every=checkpoint_every)

    def resume(self, start_urls: list[str] | None = None) -> dict:
        seeds = list(start_urls or self._meta.start_urls)
        self.engine.resume(seeds)
        return self.engine.run(seeds=None)

    # --- results ------------------------------------------------------
    def visits(self):
        return self.engine.visits_table()

    def metrics(self) -> dict:
        return self.engine.metrics()

    @property
    def seen_urls(self) -> list[str]:
        return self.engine.seen.sorted_urls()
