"""Unit tests for the vectorized URL toolkit vs the reference's ``URL``
object semantics (/root/reference/kryptone/utils/urls.py)."""

import pathlib

import numpy as np
import pytest

from kryptone_ray.utils import urlkit
from kryptone_ray.utils.urlkit import (
    as_path_suffix,
    decompose_path,
    join_relative,
    origin_of,
    parse_batch,
    path_suffix,
    rebuild_query,
    remove_fragment,
    url_query,
)


def test_path_suffix_matches_pathlib():
    cases = [
        "a.jpg", "a", ".hidden", "a.", "a.b.c", "a..b", "dir/x.png",
        "http://example.com/a.jpg", "http://example.com", "", "x.tar.gz",
    ]
    for c in cases:
        expected = pathlib.PurePosixPath(c).suffix if c else ""
        assert path_suffix(c) == expected, c


def test_as_path_suffix_query_vs_full():
    # urls.py:263-278 — with a query only the path is considered.
    assert as_path_suffix("http://e.com/a.jpg?x=1", "/a.jpg", "x=1") == ".jpg"
    # without a query, the full raw url (netloc dot counts as suffix source).
    assert as_path_suffix("http://example.com", "", "") == ".com"
    assert as_path_suffix("http://e.com/a.png", "/a.png", "") == ".png"


def test_parse_batch_handles_none_and_numbers():
    f = parse_batch([None, 56, "http://example.com/a"])
    assert f.raw[0] == ""
    assert f.raw[1] == "56"
    assert f.netloc[2] == "example.com"
    assert f.is_empty().tolist() == [True, False, False]


def test_parse_batch_survives_malformed_ipv6():
    f = parse_batch(["http://[::1:2::3]:8080/", "http://example.com/"])
    assert len(f) == 2  # no exception; components empty for the bad row
    assert f.netloc[1] == "example.com"


def test_predicates():
    f = parse_batch(
        [
            "http://example.com/a#x",
            "https://example.com/b",
            "/rel",
            "",
            "http://example.com/i.png",
            "http://facebook.com/page",
        ]
    )
    assert f.has_fragment().tolist() == [True, False, False, False, False, False]
    assert f.is_path().tolist() == [False, False, True, False, False, False]
    assert f.is_valid().tolist() == [True, True, False, False, True, True]
    assert f.is_secured().tolist() == [False, True, False, False, False, False]
    assert f.is_image().tolist() == [False, False, False, False, True, False]
    assert f.is_social_link().tolist() == [False, False, False, False, False, True]
    assert f.is_same_domain("http://example.com/").tolist() == [
        True, True, False, False, True, False,
    ]


def test_test_path_and_url():
    f = parse_batch(["http://example.com/product/123", "http://example.com/legal"])
    assert f.test_path(r"/product/").tolist() == [True, False]
    assert f.test_url(r"example").tolist() == [True, True]
    assert f.multi_test_path([r"/product/", r"123$"], "and").tolist() == [True, False]
    assert f.multi_test_path([r"/product/", r"legal"], "or").tolist() == [True, True]
    with pytest.raises(ValueError):
        f.multi_test_path([r"x"], "xor")


def test_origin_and_join():
    # base.py:341-356, 611-616.
    assert origin_of("http://example.com/deep/path?q=1") == "http://example.com"
    assert join_relative("http://example.com", "/a%20b") == "http://example.com/a b"
    assert join_relative("http://example.com", " /x ") == "http://example.com/x"


def test_remove_fragment():
    # urls.py:474-492 — only rebuilt when a fragment exists.
    assert remove_fragment("http://example.com/a#frag") == "http://example.com/a"
    assert remove_fragment("http://example.com/a#") == "http://example.com/a"
    assert remove_fragment("http://example.com/a?q=1") == "http://example.com/a?q=1"


def test_rebuild_query_merges_existing_over_new():
    # urls.py:333-358 — existing query values win over supplied ones.
    out = rebuild_query("http://e.com/p?a=1", a="9", b="2")
    assert url_query(out) == {"a": ["1"], "b": ["2"]}


def test_decompose_path():
    assert decompose_path("http://example.com/a/b/") == ["a", "b"]
    assert decompose_path("http://example.com/a/b", exclude=["a"]) == ["b"]


def test_is_file_full_wordlist_parity():
    """is_file must implement the reference's semantics exactly: the
    as_path suffix is a member of the shipped file_extensions.txt line
    set (urls.py:152-155,248-260) — probed against the full wordlist."""
    import pathlib

    from kryptone_ray.utils import urlkit

    lines = (pathlib.Path(urlkit.__file__).parent.parent / "data"
             / "file_extensions.txt").read_text().splitlines()
    assert len([ln for ln in lines if ln.strip()]) > 2000

    urls = [
        "https://a.test/x.php", "https://a.test/x.html",
        "https://a.test/doc.pdf", "https://a.test/a.tar",
        "https://a.test/weird.xpi", "https://a.test/page",   # no suffix
        "https://a.test/x.notanext9z",                        # not in list
        "https://a.test/", "",
    ]
    f = urlkit.parse_batch(urls)
    got = f.is_file()
    exp = []
    for u, s in zip(urls, f.suffix):
        exp.append(bool(u) and s != "" and s in urlkit.FILE_SUFFIXES)
    assert got.tolist() == exp
    # spot-check against the raw file contents (reference membership)
    assert ".php" in urlkit.FILE_SUFFIXES and ".xpi" in set(lines)
    assert ".notanext9z" not in urlkit.FILE_SUFFIXES


def test_parse_batch_fast_path_equals_stdlib_everywhere():
    """The regex fast path must produce EXACTLY stdlib urlparse's
    (scheme, netloc, path, query, fragment) on every conformance-corpus
    url plus adversarial shapes (multiple '?'/'#', ports, userinfo,
    params, IPv6, control chars, other schemes) — anything it can't
    prove falls back to stdlib, so equality here is equality always."""
    from urllib.parse import urlparse

    from kryptone_ray.utils import urlkit
    from tests.url_corpus import MALFORMED, WELL_FORMED

    cases = list(WELL_FORMED) + list(MALFORMED) + [
        "", "/rel", "a#b", "a?x#b", "http://h##a", "http://h#f?q",
        "http://h?a?b#c", "https://u:p@h:8080/p:1/x;y?q=1#z",
        "http://h/p;params", "mailto:x@y", "HTTP://H/", "ftp://h/",
        "http://h/\tx", "http://[::1]/", "http://[::1:2::3]/",
        "http://h/a\\b", "//netloc-relative/p", "?onlyquery", "#onlyfrag",
    ]
    f = urlkit.parse_batch(cases)
    for i, u in enumerate(cases):
        if u is None:  # parse_batch's None/non-str normalization
            u = ""
        elif not isinstance(u, str):
            u = str(u)
        try:
            p = urlparse(u)
            exp = (p.scheme, p.netloc, p.path, p.query, p.fragment)
        except ValueError:
            exp = ("", "", "", "", "")
        got = (f.scheme[i], f.netloc[i], f.path[i], f.query[i], f.fragment[i])
        assert got == exp, (u, got, exp)


def test_transform_string_urls_and_normalize_urls():
    """base.py:881-884 / 358-361 — the str↔URL lifting pair. The
    engine's URL value type is the string, so both directions resolve
    to strings; non-str URL-likes pass through str()."""
    from kryptone_ray.utils.urlkit import normalize_urls, transform_string_urls

    class UrlLike:
        def __init__(self, raw):
            self.raw = raw

        def __str__(self):
            return self.raw

    mixed = ["http://a.com/x", UrlLike("http://b.com/y"), "http://c.com"]
    out = list(transform_string_urls(mixed))
    assert out == ["http://a.com/x", "http://b.com/y", "http://c.com"]
    assert all(isinstance(u, str) for u in out)
    assert normalize_urls(mixed) == out
    assert normalize_urls(set(["http://a.com"])) == ["http://a.com"]
    assert list(transform_string_urls([])) == []


def test_random_user_agent_seeded_and_batch():
    """randomizers.py contract (reference randomizers.py:9-19): every
    draw is a line of data/user_agents.txt; seeded draws reproduce;
    the batch form matches per-call draws for the same seed."""
    import numpy as np

    from kryptone_ray.utils.randomizers import (
        RANDOM_USER_AGENT,
        load_user_agents,
        random_user_agent,
        user_agent_batch,
    )

    agents = set(load_user_agents())
    assert len(agents) >= 20
    assert RANDOM_USER_AGENT() in agents
    a = random_user_agent(seed=7)
    b = random_user_agent(seed=7)
    seq_a = [a() for _ in range(10)]
    assert seq_a == [b() for _ in range(10)]
    assert set(seq_a) <= agents
    batch = user_agent_batch(64, seed=11)
    assert isinstance(batch, np.ndarray) and len(batch) == 64
    assert set(batch) <= agents
    assert list(batch) == list(user_agent_batch(64, seed=11))


def test_fetch_actor_draws_seeded_user_agent(tmp_path):
    """FetchActor mirrors the reference's one-agent-per-browser launch
    (base.py:100): the agent is actor state drawn once in __init__ and
    never alters fetch output."""
    from kryptone_ray.corpus.store import write_corpus
    from kryptone_ray.corpus.synth import CorpusSpec, make_corpus_table
    from kryptone_ray.stages.fetch import FetchActor
    from kryptone_ray.utils.randomizers import load_user_agents

    spec = CorpusSpec(n_rows=8, n_hosts=2, seed=1)
    write_corpus(make_corpus_table(spec), tmp_path / "c", num_shards=1)
    a1 = FetchActor(str(tmp_path / "c"), user_agent_seed=3)
    a2 = FetchActor(str(tmp_path / "c"), user_agent_seed=3)
    assert a1.user_agent == a2.user_agent
    assert a1.user_agent in set(load_user_agents())
