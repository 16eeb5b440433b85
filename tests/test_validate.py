"""Conformance tests for the vectorized frontier validator.

Mirrors the reference's frontier-pipeline tests
(/root/reference/tests/test_spider.py:310-462): no malformed URL may become
a frontier candidate; gather-ignore is a regex-OR pre-drop; rule tests are
regex-AND keep; ignore tests exclude-if-any while staying "seen".
"""

import numpy as np
import pyarrow as pa

from kryptone_ray.stages.validate import (
    CANDIDATE,
    CROSS_DOMAIN,
    FILTERED,
    FRAGMENT,
    GATHER_IGNORED,
    HOME_PAGE,
    IMAGE,
    RULE_TEST,
    UrlIgnoreRegexTest,
    UrlIgnoreTest,
    ValidationConfig,
    validate_batch,
)
from tests.url_corpus import MALFORMED, WELL_FORMED

START = "http://example.com/"


def run(urls, iteration_count=0, **cfg_kwargs):
    cfg = ValidationConfig(start_url=START, **cfg_kwargs)
    t = validate_batch(urls, cfg, iteration_count)
    return {u: v for u, v in zip(t["url"].to_pylist(), t["verdict"].to_pylist())}


def candidates(verdicts):
    return {u for u, v in verdicts.items() if v == CANDIDATE}


def test_no_malformed_url_becomes_candidate():
    # Every candidate must be same-netloc, non-empty, fragment-free —
    # malformed corpus entries never reach the frontier
    # (cf. test_spider.py:296-304 assertion over urls_to_visit).
    # NOTE reference quirk preserved: check_urls (base.py:652-760) never
    # checks the scheme — domain validation is netloc equality only
    # (urls.py:360-373) — so ftp://example.com/ IS admitted by the
    # reference, and by us.
    from urllib.parse import urlparse

    verdicts = run(MALFORMED + WELL_FORMED + ["http://example.com/keep-me"])
    cands = candidates(verdicts)
    assert "http://example.com/keep-me" in cands
    for url in cands:
        assert urlparse(url).netloc == "example.com", url
        assert not url.endswith("#") and urlparse(url).fragment == ""


def test_cross_domain_rejected():
    # test_spider.py:320-338 — only same-domain URLs survive.
    v = run(["http://example.com/product-1", "http://ecommerce.com/product-1"])
    assert v["http://example.com/product-1"] == CANDIDATE
    assert v["http://ecommerce.com/product-1"] == CROSS_DOMAIN


def test_fragment_rejected():
    v = run(["http://example.com/a#frag", "http://example.com/a#", "http://example.com/a"])
    assert v["http://example.com/a#frag"] == FRAGMENT
    assert v["http://example.com/a#"] == FRAGMENT
    assert v["http://example.com/a"] == CANDIDATE


def test_relative_path_joined_to_origin():
    # base.py:682-683 — '/x' is joined onto the start url's origin.
    v = run(["/products/1"])
    assert v == {"http://example.com/products/1": CANDIDATE}


def test_dedupe_on_canonical_form():
    # '/a' and its absolute form collapse to one row after the join.
    v = run(["/a", "http://example.com/a", "http://example.com/a"])
    assert list(v) == ["http://example.com/a"]


def test_home_page_guard_only_after_first_iteration():
    # base.py:706-717 — home-page revisits allowed at iteration 0 only.
    assert run(["http://example.com/"], iteration_count=0)["http://example.com/"] == CANDIDATE
    assert run(["http://example.com/"], iteration_count=3)["http://example.com/"] == HOME_PAGE


def test_ignore_images():
    v = run(
        ["http://example.com/logo.png", "http://example.com/page"],
        ignore_images=True,
    )
    assert v["http://example.com/logo.png"] == IMAGE
    assert v["http://example.com/page"] == CANDIDATE
    # Without the flag images pass through (base.py:719-722 is conditional).
    v2 = run(["http://example.com/logo.png"])
    assert v2["http://example.com/logo.png"] == CANDIDATE


def test_gather_ignore_is_or_and_drops_pre_tracking():
    # test_spider.py:340-358,426-446 — regex-OR over the path, dropped rows
    # do not appear at all (never tracked as seen).
    v = run(
        [
            "http://example.com/product-1",
            "http://example.com/product-2",
            "http://example.com/2",
        ],
        gather_ignore_regexes=(r"/product-\d+",),
    )
    assert set(v) == {"http://example.com/2"}
    assert v["http://example.com/2"] == CANDIDATE

    v2 = run(
        [
            "http://example.com/product-1",
            "http://example.com/product-2",
            "http://example.com/2",
        ],
        gather_ignore_regexes=(r"2$",),
    )
    assert set(v2) == {"http://example.com/product-1"}


def test_rule_tests_are_and_semantics():
    # test_spider.py:449-462 — keep only URLs whose path matches ALL rules.
    v = run(
        ["http://example.com/product/123", "http://example.com/legal"],
        rule_test_regexes=(r"/product/", r"/123$"),
    )
    assert v["http://example.com/product/123"] == CANDIDATE
    assert v["http://example.com/legal"] == RULE_TEST


def test_ignore_tests_exclude_if_any_but_stay_tracked():
    # test_spider.py:406-423 — URLIgnoreTest('/2') removes the matching URL
    # from the frontier; it still appears in the output (→ seen set).
    v = run(
        [
            "http://example.com/product-1",
            "http://example.com/2",
        ],
        ignore_tests=(UrlIgnoreTest("base", paths=("/2",)),),
    )
    assert v["http://example.com/2"] == FILTERED
    assert v["http://example.com/product-1"] == CANDIDATE


def test_ignore_regex_test_matches_full_url():
    v = run(
        ["http://example.com/abc", "http://example.com/123"],
        ignore_tests=(UrlIgnoreRegexTest("digits", r"\d+"),),
    )
    assert v["http://example.com/123"] == FILTERED
    assert v["http://example.com/abc"] == CANDIDATE


def test_missing_start_url_rejects_everything():
    # urls.py:360-373 — is_same_domain(None) is False for every URL.
    cfg = ValidationConfig(start_url=None)
    t = validate_batch(["http://example.com/a"], cfg, 0)
    assert t["verdict"].to_pylist() == [CROSS_DOMAIN]


def test_output_schema_and_hash_column():
    t = validate_batch(["http://example.com/a"], ValidationConfig(start_url=START), 0)
    assert t.schema.names == ["url", "host", "url_hash", "verdict"]
    assert t["url_hash"].type == pa.uint64()
    assert t["host"].to_pylist() == ["example.com"]


def test_enforce_ignore_queries_extension():
    # extension flag (SURVEY §2.2 note): the reference declares
    # ignore_queries but never enforces it — off by default (parity),
    # enforced when opted in.
    from kryptone_ray.stages.validate import QUERY

    v = run(["http://example.com/a?x=1", "http://example.com/a"])
    assert v["http://example.com/a?x=1"] == CANDIDATE  # parity default
    cfg = ValidationConfig(start_url=START, enforce_ignore_queries=True)
    t = validate_batch(["http://example.com/a?x=1", "http://example.com/a"], cfg, 0)
    got = dict(zip(t["url"].to_pylist(), t["verdict"].to_pylist()))
    assert got["http://example.com/a?x=1"] == QUERY
    assert got["http://example.com/a"] == CANDIDATE
