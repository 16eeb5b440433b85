"""``python -m kryptone_ray`` — the management-command surface
(reference ``management/commands/{start,resume,test_run}.py``) mapped
onto the distributed engine. Project-free: spiders and outlink
functions are ``module:attr`` dotted paths (see ``registry.resolve``);
frontier-maintenance commands (reorder / filter_cache / extract_urls)
are exposed as library pipelines in ``pipelines/crawlops.py``.

Examples:
    python -m kryptone_ray checks  --spider myspiders:Shop --corpus /data/corpus
    python -m kryptone_ray start   --spider myspiders:Shop --corpus /data/corpus \
        --outlinks myspiders:links --run-dir /tmp/run --windows 8
    python -m kryptone_ray resume  --spider myspiders:Shop --corpus /data/corpus \
        --outlinks myspiders:links --run-dir /tmp/run
    python -m kryptone_ray test-run --spider ... --pages 50
"""

from __future__ import annotations

import argparse
import json
import sys

from kryptone_ray.registry import checks_registry, resolve


def _common(p: argparse.ArgumentParser, with_urls: bool = True) -> None:
    p.add_argument("--spider", required=True,
                   help="module:Class SiteCrawler subclass")
    p.add_argument("--corpus", required=True, help="corpus directory")
    p.add_argument("--outlinks", required=True,
                   help="module:fn page→outlinks callable")
    p.add_argument("--run-dir", required=True)
    # reference start.py:30-36 '--windows' = parallel browser tabs,
    # bounded 1..16; here it is the politeness-window batch size and the
    # bound is gone — the engine is not tab-limited
    p.add_argument("--windows", type=int, default=16,
                   help="pages per politeness window (batch_size)")
    p.add_argument("--wait-time", type=float, default=25.0)
    p.add_argument("--max-pages", type=int, default=None)
    p.add_argument("--checkpoint-every", type=int, default=0)
    p.add_argument("--mode", default="tasks",
                   choices=("local", "tasks", "ray"))
    if with_urls:
        p.add_argument("-u", "--start-urls", action="append", default=[],
                       help="starting urls (repeatable; default Meta.start_urls)")


def _build(ns, max_pages=None):
    spider_cls = resolve(ns.spider)
    outlinks = resolve(ns.outlinks)
    checks_registry.run(corpus_dir=ns.corpus, spider_cls=spider_cls)
    return spider_cls(
        corpus_dir=ns.corpus,
        outlinks_fn=outlinks,
        run_dir=ns.run_dir,
        batch_size=ns.windows,
        wait_time=ns.wait_time,
        max_pages=max_pages if max_pages is not None else ns.max_pages,
        mode=ns.mode,
    )


def main(argv: list[str] | None = None) -> int:
    ap = argparse.ArgumentParser(prog="python -m kryptone_ray")
    sub = ap.add_subparsers(dest="cmd", required=True)

    p_start = sub.add_parser("start", help="run a crawl (start.py analog)")
    _common(p_start)
    p_resume = sub.add_parser("resume",
                              help="resume from run-dir checkpoint (resume.py)")
    _common(p_resume, with_urls=False)
    p_refresh = sub.add_parser("refresh",
                               help="re-visit crawled pages, new urls only")
    _common(p_refresh, with_urls=False)
    p_test = sub.add_parser("test-run",
                            help="bounded smoke crawl (test_run.py analog)")
    _common(p_test)
    p_test.add_argument("--pages", type=int, default=50)
    p_checks = sub.add_parser("checks", help="system checks only")
    p_checks.add_argument("--spider", required=True)
    p_checks.add_argument("--corpus", default=None)

    p_reset = sub.add_parser("reset",
                             help="clear a run dir's crawl artifacts "
                                  "(reset.py analog)")
    p_reset.add_argument("--run-dir", required=True)
    p_reset.add_argument("--keep-checkpoint", action="store_true")

    p_ro = sub.add_parser("frontier-reorder",
                          help="rank pattern-matching frontier urls first "
                               "(reorder.py analog)")
    p_ro.add_argument("--frontier", required=True)
    p_ro.add_argument("--pattern", required=True)
    p_ro.add_argument("--out", required=True)

    p_ex = sub.add_parser("frontier-extract-urls",
                          help="write urls matching path filters "
                               "(extract_urls.py analog)")
    p_ex.add_argument("--frontier", required=True)
    p_ex.add_argument("--path", action="append", required=True,
                      help="path substring filter (repeatable)")
    p_ex.add_argument("--out", required=True)

    p_fc = sub.add_parser("frontier-filter-cache",
                          help="split frontier into to_visit/visited by "
                               "pattern (filter_cache.py analog)")
    p_fc.add_argument("--frontier", required=True)
    p_fc.add_argument("--pattern", required=True)
    p_fc.add_argument("--out", required=True)

    ns = ap.parse_args(argv)

    if ns.cmd == "reset":
        import pathlib
        import shutil

        run = pathlib.Path(ns.run_dir)
        kinds = ["visits", "lineage", "metrics", "items", "spill",
                 "seen_deltas"]
        if not ns.keep_checkpoint:
            kinds += ["checkpoint", "checkpoint.old", "checkpoint.tmp"]
        removed = []
        for k in kinds:
            p = run / k
            if p.exists():
                shutil.rmtree(p)
                removed.append(k)
        print(json.dumps({"removed": removed}))
        return 0

    import ray

    started_ray = False
    if ns.cmd != "checks" and not ray.is_initialized():
        ray.init(address="local", include_dashboard=False,
                 logging_level="ERROR")
        started_ray = True
    try:
        if ns.cmd == "checks":
            ran = checks_registry.run(corpus_dir=ns.corpus,
                                      spider_cls=resolve(ns.spider))
            print(json.dumps({"checks": ran, "ok": True}))
            return 0
        if ns.cmd.startswith("frontier-"):
            from kryptone_ray.pipelines import crawlops

            if ns.cmd == "frontier-reorder":
                n = crawlops.frontier_reorder(ns.frontier, ns.pattern, ns.out)
                print(json.dumps({"rows": n, "out": ns.out}))
            elif ns.cmd == "frontier-extract-urls":
                n = crawlops.frontier_extract_urls(ns.frontier,
                                                   tuple(ns.path), ns.out)
                print(json.dumps({"rows": n, "out": ns.out}))
            else:
                counts = crawlops.frontier_filter_cache(ns.frontier,
                                                        ns.pattern, ns.out)
                print(json.dumps({"counts": counts, "out": ns.out}))
            return 0
        if ns.cmd == "start":
            c = _build(ns)
            m = c.start(start_urls=ns.start_urls or None,
                        checkpoint_every=ns.checkpoint_every)
        elif ns.cmd == "resume":
            c = _build(ns)
            m = c.resume()
        elif ns.cmd == "refresh":
            c = _build(ns)
            m = c.refresh(checkpoint_every=ns.checkpoint_every)
        else:  # test-run
            c = _build(ns, max_pages=ns.pages)
            m = c.start(start_urls=ns.start_urls or None,
                        checkpoint_every=ns.checkpoint_every)
        print(json.dumps(m))
        return 0
    finally:
        # only tear down a session this command itself created (library
        # callers and the test fixture own their session)
        if started_ray and ray.is_initialized():
            ray.shutdown()


if __name__ == "__main__":
    sys.exit(main())
