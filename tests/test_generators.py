"""URL generators / seed sources vs reference (utils/urls.py:598-756,
1073-1110; utils/iterators.py:62-110)."""

import json

import pytest

from kryptone_ray.sources import generators as g


def test_query_generator():
    # urls.py:598-661 — range is end-initial, filtered by i % step
    out = list(g.UrlQueryGenerator("http://example.com", param="year",
                                   initial_value=2001, end_value=2004))
    assert out == [
        "http://example.com?year=2001",
        "http://example.com?year=2002",
        "http://example.com?year=2003",
    ]
    out2 = list(g.UrlQueryGenerator("http://e.com", param="p", initial_value=0,
                                    end_value=6, step=2))
    assert out2 == ["http://e.com?p=0", "http://e.com?p=2", "http://e.com?p=4"]
    # None query values become empty strings
    out3 = list(g.UrlQueryGenerator("http://e.com", param="p", initial_value=0,
                                    end_value=1, query={"a": None}))
    assert out3 == ["http://e.com?a=&p=0"]


def test_path_generator():
    # urls.py:664-704 doctest
    out = list(g.UrlPathGenerator("http://example.com/$id",
                                  params={"id": "number"}, k=2, start=1))
    assert out == ["http://example.com/1", "http://example.com/2"]
    # missing params → template unchanged
    out2 = list(g.UrlPathGenerator("http://example.com/$other",
                                   params={"id": "number"}, k=1))
    assert out2 == ["http://example.com/$other"]


def test_pagination_generator():
    out = list(g.UrlPaginationGenerator("http://example.com#frag", k=2))
    assert out == ["http://example.com?page=1", "http://example.com?page=2"]


def test_combine():
    a = g.UrlPaginationGenerator("http://a.com", k=1)
    b = g.UrlPaginationGenerator("http://b.com", k=1)
    assert list(g.combine(a, b)) == ["http://a.com?page=1", "http://b.com?page=1"]


def test_load_start_urls(tmp_path):
    j = tmp_path / "seeds.json"
    j.write_text(json.dumps([{"url": "http://a.com"}, "http://b.com"]))
    assert g.load_start_urls(j) == ["http://a.com", "http://b.com"]
    c = tmp_path / "seeds.csv"
    c.write_text("http://a.com,http://b.com\nhttp://c.com\n")
    assert g.load_start_urls(c) == ["http://a.com", "http://b.com", "http://c.com"]
    with pytest.raises(FileNotFoundError):
        g.load_start_urls(tmp_path / "missing.csv")


def test_generators_as_dataset(ray_session):
    ds = g.UrlQueryGenerator("http://e.com", param="p", initial_value=0,
                             end_value=100).as_dataset()
    urls = sorted(r["url"] for r in ds.take_all())
    assert len(urls) == 100 and urls[0] == "http://e.com?p=0"
    ds2 = g.UrlPaginationGenerator("http://e.com", k=5).as_dataset()
    assert ds2.count() == 5
    u = g.combine_datasets(ds, ds2)
    assert u.count() == 105
