"""current_page_actions analog (base.py:798-805,1129-1155): a user
callable over each decoded page batch whose rows land in the items log —
the distributed DATA_CONTAINER + clean-hook pipeline."""

import dataclasses

import pyarrow as pa
import pyarrow.parquet as pq

from kryptone_ray.corpus.store import write_corpus
from kryptone_ray.corpus.synth import CorpusSpec, make_corpus_table, seed_urls
from kryptone_ray.engine.crawl import RayCrawler
from kryptone_ray.models import items_batch
from kryptone_ray.sim.golden import CrawlSpec
from tests.test_crawl_parity import page_outlinks

ITEM_SCHEMA = pa.schema([("url", pa.string()), ("caption", pa.string()),
                         ("n_words", pa.int64())])


def make_caption_items():
    # returned as a closure so ray pickles it BY VALUE (a top-level
    # function of a test module is pickled by reference, which workers
    # cannot import)
    def caption_items(decoded: pa.Table) -> pa.Table:
        ok = decoded.filter(pa.compute.equal(decoded["status"], pa.scalar("ok")))
        caps = ok["caption"].to_pylist()
        return pa.table(
            {
                "url": ok["url"],
                "caption": ok["caption"],
                "n_words": pa.array([len(c.split()) for c in caps], type=pa.int64()),
            }
        )

    return caption_items


def _run(tmp_path, mode, ray_needed=False):
    spec = CorpusSpec(n_rows=200, n_hosts=4, seed=42)
    d = tmp_path / f"c-{mode}"
    write_corpus(make_corpus_table(spec), d, num_shards=2)
    cs = CrawlSpec(batch_size=16, wait_time=25.0, allowed_hosts=("*",), max_pages=64)
    eng = RayCrawler(str(d), page_outlinks(spec), cs, str(tmp_path / f"r-{mode}"),
                     mode=mode, page_actions=make_caption_items())
    eng.run(seeds=seed_urls(spec, 4))
    files = sorted((tmp_path / f"r-{mode}" / "items").glob("batch-*.parquet"))
    assert files
    items = pa.concat_tables([pq.read_table(f) for f in files])
    return spec, eng, items


def test_page_actions_local(tmp_path):
    spec, eng, items = _run(tmp_path, "local")
    assert items.schema.names == ["url", "caption", "n_words"]
    assert len(items) == sum(
        1 for s in eng.visits_table()["status"].to_pylist() if s == "ok"
    )
    assert min(items["n_words"].to_pylist()) >= 4


def test_page_actions_tasks(tmp_path, ray_session):
    spec, eng, items = _run(tmp_path, "tasks")
    assert len(items) > 20


def test_page_actions_with_model_hooks(tmp_path):
    # compose with the clean_<field> item pipeline (models.items_batch)
    @dataclasses.dataclass
    class Cap:
        url: str
        caption: str

        def clean_caption(self, v):
            return v.upper()

    schema = pa.schema([("url", pa.string()), ("caption", pa.string())])
    body = items_batch(Cap, schema)

    def actions(decoded: pa.Table) -> pa.Table:
        ok = decoded.filter(pa.compute.equal(decoded["status"], pa.scalar("ok")))
        return body(ok.select(["url", "caption"]))

    spec = CorpusSpec(n_rows=100, n_hosts=4, seed=42)
    d = tmp_path / "c2"
    write_corpus(make_corpus_table(spec), d, num_shards=2)
    cs = CrawlSpec(batch_size=8, wait_time=25.0, allowed_hosts=("*",), max_pages=24)
    eng = RayCrawler(str(d), page_outlinks(spec), cs, str(tmp_path / "r2"),
                     mode="local", page_actions=actions)
    eng.run(seeds=seed_urls(spec, 4))
    files = sorted((tmp_path / "r2" / "items").glob("batch-*.parquet"))
    items = pa.concat_tables([pq.read_table(f) for f in files])
    assert all(c == c.upper() for c in items["caption"].to_pylist())


def test_page_audits_record_fields(ray_session):
    """SEO audit-record assembly (reference contrib/seo.py:550-584):
    every corpus page gets one audit row; per-page top token matches a
    direct recount with the (count desc, token asc) tie-break."""
    from kryptone_ray.pipelines.crawlops import _SPEC, q_page_audits

    out = q_page_audits("")
    assert len(out) == _SPEC.n_rows
    assert list(out.columns) == ["url", "content_length", "is_https",
                                 "n_tokens", "top_token", "top_token_count"]
    # spot-check 20 rows against a direct scalar recount
    by_url = out.set_index("url")
    for i in range(0, _SPEC.n_rows, _SPEC.n_rows // 20):
        url, cap = _SPEC.url_of(i), _SPEC.caption(i)
        row = by_url.loc[url]
        assert row["content_length"] == len(cap)
        assert row["is_https"] == int(url.startswith("https"))
        toks = cap.lower().split(" ")
        assert row["n_tokens"] == len(toks)
        from collections import Counter

        best = sorted(Counter(toks).items(), key=lambda kv: (-kv[1], kv[0]))[0]
        assert (row["top_token"], row["top_token_count"]) == best
