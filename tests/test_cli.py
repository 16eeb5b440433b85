"""CLI / registry / checks scaffolding (reference
management/commands/{start,resume,test_run}.py, registry.py:215-296,
checks/core.py): `python -m kryptone_ray` drives a real crawl through
the facade from dotted-path spider + outlinks references.
"""

from __future__ import annotations

import json
import sys
import textwrap

import pytest

from kryptone_ray.__main__ import main
from kryptone_ray.corpus.store import write_corpus
from kryptone_ray.corpus.synth import CorpusSpec, make_corpus_table, seed_urls
from kryptone_ray.registry import (
    ApplicationChecks,
    SpiderRegistry,
    checks_registry,
    resolve,
)


@pytest.fixture(scope="module")
def world(tmp_path_factory):
    spec = CorpusSpec(n_rows=300, n_hosts=4, seed=42)
    d = tmp_path_factory.mktemp("corpus")
    write_corpus(make_corpus_table(spec), d, num_shards=4, row_group_size=64)

    moddir = tmp_path_factory.mktemp("mod")
    (moddir / "cli_spider_mod.py").write_text(textwrap.dedent("""
        from kryptone_ray.crawler import SiteCrawler
        from kryptone_ray.corpus.synth import CorpusSpec

        _SPEC = CorpusSpec(n_rows=300, n_hosts=4, seed=42)

        class Shop(SiteCrawler):
            class Meta:
                domains = ["*"]
                start_urls = [_SPEC.url_of(i) for i in (0, 10, 20, 30)]

        def links(url):
            from kryptone_ray.corpus.synth import row_index_of
            i = row_index_of(url)
            if i is None or not (0 <= i < _SPEC.n_rows) or _SPEC.url_of(i) != url:
                return []
            return _SPEC.outlinks(i)
    """))
    sys.path.insert(0, str(moddir))
    yield spec, d
    sys.path.remove(str(moddir))


def test_registry_and_resolve():
    reg = SpiderRegistry()
    assert not reg.spiders_ready

    @reg.register
    class A:
        pass

    @reg.register(name="other")
    class B:
        pass

    assert reg.get_spider("A") is A
    assert reg.get_spider("other") is B
    with pytest.raises(KeyError):
        reg.get_spider("nope")
    assert resolve("kryptone_ray.crawler:SiteCrawler").__name__ == "SiteCrawler"


def test_checks_registry_runs_and_fails():
    checks = ApplicationChecks()

    @checks.register("always_ok")
    def ok(**_):
        pass

    assert checks.run() == ["always_ok"]

    @checks.register()
    def boom(**_):
        raise ValueError("bad config")

    with pytest.raises(ValueError, match="bad config"):
        checks.run()


def test_builtin_checks(world, tmp_path):
    spec, d = world
    import cli_spider_mod

    checks_registry.run(corpus_dir=str(d), spider_cls=cli_spider_mod.Shop)
    with pytest.raises(ValueError, match="no parquet shards"):
        checks_registry.run(corpus_dir=str(tmp_path / "empty"))


def test_cli_checks_command(world, capsys):
    rc = main(["checks", "--spider", "cli_spider_mod:Shop"])
    assert rc == 0
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert out["ok"] and "spider_meta_valid" in out["checks"]


def test_cli_test_run_and_resume(world, tmp_path, capsys, ray_session):
    spec, d = world
    run_dir = tmp_path / "run"
    rc = main([
        "test-run", "--spider", "cli_spider_mod:Shop",
        "--corpus", str(d), "--outlinks", "cli_spider_mod:links",
        "--run-dir", str(run_dir), "--windows", "8", "--pages", "24",
        "--mode", "local", "--checkpoint-every", "1",
    ])
    assert rc == 0
    m = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert m["pages_visited"] == 24
    assert (run_dir / "checkpoint" / "manifest.json").exists()

    rc = main([
        "resume", "--spider", "cli_spider_mod:Shop",
        "--corpus", str(d), "--outlinks", "cli_spider_mod:links",
        "--run-dir", str(run_dir), "--windows", "8", "--max-pages", "40",
        "--mode", "local",
    ])
    assert rc == 0
    m2 = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert m2["pages_visited"] == 40


def test_cli_frontier_commands(world, tmp_path, capsys, ray_session):
    """frontier-reorder / frontier-extract-urls / frontier-filter-cache
    run real read→transform→write pipelines over an arbitrary frontier
    parquet dir."""
    import pyarrow as pa
    import pyarrow.parquet as pq
    import ray.data as rd

    spec, d = world
    frontier = tmp_path / "frontier"
    frontier.mkdir()
    urls = [spec.url_of(i) for i in range(200)]
    pq.write_table(pa.table({"url": pa.array(urls)}),
                   frontier / "part-0.parquet")

    out1 = tmp_path / "reordered"
    rc = main(["frontier-reorder", "--frontier", str(frontier),
               "--pattern", "/img/", "--out", str(out1)])
    assert rc == 0
    res = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert res["rows"] == 200
    got = rd.read_parquet(str(out1)).to_pandas()
    assert got["has_match"].iloc[0] or not got["has_match"].any()

    out2 = tmp_path / "extracted"
    rc = main(["frontier-extract-urls", "--frontier", str(frontier),
               "--path", "/item/", "--out", str(out2)])
    assert rc == 0
    res = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    exp = sum(1 for u in urls if "/item/" in u)
    assert res["rows"] == exp

    out3 = tmp_path / "cache"
    rc = main(["frontier-filter-cache", "--frontier", str(frontier),
               "--pattern", "/cat/", "--out", str(out3)])
    assert rc == 0
    res = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert res["counts"]["visited"] + res["counts"]["to_visit"] == 200


def test_cli_reset(world, tmp_path, capsys, ray_session):
    spec, d = world
    run_dir = tmp_path / "run"
    rc = main([
        "test-run", "--spider", "cli_spider_mod:Shop",
        "--corpus", str(d), "--outlinks", "cli_spider_mod:links",
        "--run-dir", str(run_dir), "--windows", "8", "--pages", "16",
        "--mode", "local", "--checkpoint-every", "1",
    ])
    assert rc == 0
    capsys.readouterr()
    assert (run_dir / "visits").exists()
    rc = main(["reset", "--run-dir", str(run_dir), "--keep-checkpoint"])
    assert rc == 0
    res = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert "visits" in res["removed"]
    assert not (run_dir / "visits").exists()
    assert (run_dir / "checkpoint").exists()  # kept
    rc = main(["reset", "--run-dir", str(run_dir)])
    assert rc == 0
    assert not (run_dir / "checkpoint").exists()
