"""Routing, Meta options, item models, signals, storages, webhook sinks —
the reference's user-extension surface (SURVEY §2.8)."""

import dataclasses
import json

import pyarrow as pa
import pytest

from kryptone_ray import signals
from kryptone_ray.meta import CrawlerOptions, DEFAULT_META_OPTIONS
from kryptone_ray.models import Product, validate_items
from kryptone_ray.routing import Router, route
from kryptone_ray.stages.sinks import FileTransport, Webhook, Webhooks
from kryptone_ray.state.storages import FileStorage, KVStorage


class Handler:
    def __init__(self):
        self.calls = []

    def on_products(self, url, route=None):
        self.calls.append(("products", url))

    def on_detail(self, url, route=None):
        self.calls.append(("detail", url))


def test_route_matching_and_dispatch():
    h = Handler()
    r = Router([
        route("on_products", regex=r"/products", name="products"),
        route("on_detail", path="/detail", name="detail"),
    ])
    states = r.resolve("http://e.com/products/1", h)
    assert states == [True, False]
    r.resolve("http://e.com/detail", h)
    assert ("detail", "http://e.com/detail") in h.calls
    # silent skip when the function is missing (routing.py:49-58)
    r2 = Router([route("nope", path="/x")])
    assert r2.resolve("http://e.com/x", h) == [False]
    with pytest.raises(ValueError):
        route("f")  # both path and regex None


def test_router_tag_batch():
    r = Router([
        route("on_products", regex=r"/products", name="products"),
        route("on_detail", path="/detail", name="detail"),
    ])
    tags = r.tag_batch(["http://e.com/products/2", "http://e.com/detail", "http://e.com/other"])
    assert list(tags) == ["products", "detail", ""]
    t = r.tag_table(pa.table({"url": ["http://e.com/detail"]}))
    assert t["route_tag"].to_pylist() == ["detail"]


def test_meta_options_validation():
    opts = CrawlerOptions("MySpider")
    opts.add_meta_options([("crawl", False), ("ignore_images", True)])
    assert opts.crawl is False and opts.ignore_images is True
    with pytest.raises(ValueError):
        opts.add_meta_options([("bogus_option", 1)])
    assert len(DEFAULT_META_OPTIONS) == 13


def test_meta_prepare_resolves_generators():
    from kryptone_ray.sources.generators import UrlPaginationGenerator

    opts = CrawlerOptions("S")
    opts.start_urls = ["http://a.com", UrlPaginationGenerator("http://b.com", k=2)]
    opts.prepare()
    assert opts.start_urls == [
        "http://a.com", "http://b.com?page=1", "http://b.com?page=2",
    ]
    assert opts.has_start_urls


def test_meta_to_crawl_spec():
    from kryptone_ray.stages.validate import UrlIgnoreTest

    opts = CrawlerOptions("S")
    opts.add_meta_options([
        ("url_ignore_tests", [UrlIgnoreTest("base", paths=("/2",))]),
        ("url_rule_tests", [r"/products/"]),
        ("domains", ["example.com"]),
    ])
    cs = opts.to_crawl_spec(batch_size=4)
    assert cs.ignore_paths == ("/2",)
    assert cs.rule_test_regexes == (r"/products/",)
    assert cs.allowed_hosts == ("example.com",)
    assert cs.batch_size == 4


def test_model_clean_hooks():
    # base.py:505-541 — clean_<field> runs over the constructed value
    @dataclasses.dataclass
    class Item:
        name: str

        def clean_name(self, value):
            return value.strip().title()

    out = validate_items(Item, [{"name": " kendall "}])
    assert out[0].name == "Kendall"
    with pytest.raises(ValueError):
        validate_items(None, [])
    with pytest.raises(ValueError):
        validate_items(object, [])


def test_product_model():
    p = Product(name="Robe été", description="d", price=10.0,
                url="http://e.com/col/123/robe-1.html", images=["a", "b"])
    assert p.number_of_images == 2
    assert p["name"] == "Robe été"
    assert "name" in p.fields
    p.set_collection_id(r"/col/(\d+)/")
    assert p.collection_id == "123"
    assert p.complex_name().startswith("robe_ete")
    assert p.as_csv()[9] is None or isinstance(p.as_csv(), list)


def test_signals():
    got = []
    sig = signals.signal("test_sig")
    sig.connect(lambda sender, **kw: got.append((sender, kw.get("x"))))
    sig.send(sender="me", x=1)
    assert got == [("me", 1)]
    assert signals.post_init.name == "post_init"


def test_file_storage(tmp_path):
    s = FileStorage(tmp_path)
    s.save("cache.json", {"a": 1})
    assert s.has("cache.json")
    assert s.get("cache.json") == {"a": 1}
    s.save("seen.csv", ["http://a", "http://b"])
    assert s.get("seen.csv") == [["http://a"], ["http://b"]]
    # atomicity: no tmp file left behind
    assert not list(tmp_path.glob("*.tmp"))


def test_kv_storage():
    s = KVStorage("spider-1")
    assert not s.has("k")
    s.save("k", {"x": [1, 2]})
    assert s.get("k") == {"x": [1, 2]}
    assert s.keys() == ["k"]
    assert s.get("missing") is None


def test_webhook_chunking(tmp_path):
    # webhooks.py — chunks of 100, fan-out to several endpoints
    f = tmp_path / "sent.ndjson"
    w = Webhook("http://hook-a", transport=FileTransport(f), chunk_size=100)
    records = [{"i": i} for i in range(250)]
    statuses = w.send(records)
    assert statuses == [200, 200, 200]
    assert w.sent_chunks == 3
    lines = [json.loads(l) for l in f.read_text().splitlines()]
    assert [len(l["records"]) for l in lines] == [100, 100, 50]
    ws = Webhooks([w])
    assert ws.send(records[:10]) == {"http://hook-a": [200]}


def test_multiple_url_manager():
    from kryptone_ray.urlmanager import MultipleUrlManager

    m = MultipleUrlManager(ignore_images=True)
    with pytest.raises(ValueError):
        m.populate(["/relative"])
    m.populate(["http://e.com/", "http://e.com/a", "http://e.com/logo.png",
                "http://other.com/x", "http://e.com/b#frag"])
    # images / cross-domain / fragments rejected but seen
    assert "http://e.com/logo.png" in m.list_of_seen_urls
    assert "http://other.com/x" not in m
    assert len(m) == 2  # '/', '/a'
    # second populate is a no-op
    m.populate(["http://z.com/"])
    assert m.start_url == "http://e.com/"
    # deterministic lexicographic pops
    assert m.get(now=0.0) == "http://e.com/"
    assert m.get(now=25.0) == "http://e.com/a"
    assert m.get() is None and m.empty
    assert m.completion_rate == 1.0
    df = m.visits_frame()
    assert df["visited"].all()
    b = m.backup(now_iso="2024-01-01T00:00:00Z")
    assert b["statistics"]["total_urls"] == 2
    # home-page guard active after iteration 0
    m2 = MultipleUrlManager()
    m2.populate(["http://e.com/", "http://e.com/a"])
    m2.get()
    assert m2.add_urls(["http://e.com/"]) == set()


@pytest.mark.usefixtures("ray_session")
def test_seed_attribution_covers_every_visit():
    """The lineage audit must attribute EVERY visited page to exactly
    one origin seed (north-rule lineage: seed → frontier shard →
    fetch batch), deterministically."""
    import pandas as pd

    from kryptone_ray.pipelines import crawlops

    out = crawlops.q_crawl_seed_attribution("")
    assert int(out["n_pages"].sum()) == 200  # the pinned crawl visits
    assert out["seed"].is_unique
    assert (out["n_pages"] >= 1).all()
    out2 = crawlops.q_crawl_seed_attribution("")
    pd.testing.assert_frame_equal(out, out2)
