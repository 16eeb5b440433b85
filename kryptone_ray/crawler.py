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
        def _if_overridden(name):
            return (getattr(self, name)
                    if getattr(type(self), name) is not getattr(SiteCrawler, name)
                    else None)

        self.engine = RayCrawler(
            corpus_dir=corpus_dir,
            outlinks_fn=outlinks_fn,
            spec=spec,
            run_dir=run_dir,
            mode=mode,
            page_actions=_if_overridden("current_page_actions"),
            post_navigation_actions=_if_overridden("post_navigation_actions"),
            before_next_page_actions=_if_overridden("before_next_page_actions"),
            after_fail=_if_overridden("after_fail"),
            after_data_save=_if_overridden("after_data_save"),
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

    def post_navigation_actions(self, pages):
        """Override: called on the decoded page batch immediately after
        fetch+decode, BEFORE link expansion (reference base.py:807-811 —
        the cookie-banner hook, batch-wise)."""
        return None

    def before_next_page_actions(self, visited_urls: list[str]):
        """Override: called driver-side after each politeness window is
        fully visited and ingested, before the next window is selected
        (reference base.py:812-816 — after the wait_time expires).
        Receives the window's visited url list (batch-wise deviation:
        the reference gets (current_url, next_url) per page)."""
        return None

    def after_fail(self, exc: Exception):
        """Override: called once when a window raises, before the
        exception propagates (reference base.py:818-825 — dump collected
        results on driver failure)."""
        return None

    def after_data_save(self, items):
        """Override: called right after an items table is persisted
        (reference base.py:831)."""
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

    def refresh(self, pages: list[str] | None = None,
                checkpoint_every: int = 0) -> dict:
        """Reference refresh mode (base.py:685-691 step 4, 1162-1164
        re-collect): re-visit previously-crawled pages — by default every
        page in this run_dir's visit log — discovering ONLY urls never
        seen before. The prior seen state must be loaded (fresh engines
        restore it from the run checkpoint automatically)."""
        # a FRESH facade over an existing run_dir holds no seen state —
        # without restoring it the refresh would re-discover every url
        # instead of only new ones. Restore from the run checkpoint
        # whenever the in-memory seen set is empty.
        ck = self.engine.run_dir / "checkpoint"
        if self.engine.seen.size() == 0:
            if not ck.exists():
                raise ValueError(
                    "refresh() needs the prior seen state: this engine's "
                    "seen set is empty and no checkpoint exists under "
                    f"{self.engine.run_dir} — run start(checkpoint_every=N) "
                    "first, or refresh from the original facade instance "
                    "(otherwise every url would re-count as newly "
                    "discovered)"
                )
            self.engine.resume(list(self._meta.start_urls) or [""])
        if pages is None:
            vt = self.engine.visits_table()
            if vt is None:
                raise ValueError("no prior visits to refresh")
            import pyarrow.compute as pc

            vt = vt.take(pc.sort_indices(vt["visit_idx"]))
            pages = list(dict.fromkeys(vt["url"].to_pylist()))
        return self.engine.run_refresh(pages, checkpoint_every=checkpoint_every)

    # --- results ------------------------------------------------------
    def visits(self):
        return self.engine.visits_table()

    def metrics(self) -> dict:
        return self.engine.metrics()

    @property
    def seen_urls(self) -> list[str]:
        return self.engine.seen.sorted_urls()
