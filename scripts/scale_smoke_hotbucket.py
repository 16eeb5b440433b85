"""Round-4 adversarial scale smoke: DEGENERATE-BUCKET minhash and
HOT-SOURCE n-gram Jaccard at 200k docs.

Plants the two inputs the round-3 verdict flagged as scale hazards:
- one boilerplate text duplicated 20 000x (every LSH band bucket holds
  all 20k copies — quadratic in the uncapped self-join: ~3.2e9
  in-partition pair rows) plus 5 000 token-less docs (the all-MAX
  signature bucket), alongside planted near-dup pairs and normal docs;
- the bulk of the table is ONE 194k-doc source, so the n-gram census
  hits the prefix-filter path with a group ~50x past the gate.

Doc text is drawn Zipf(s=1.1) from a 500 000-word deterministic
letter vocabulary, the shape real corpora have (Heaps/Zipf): common
words carry high-document-frequency grams (excluded from rarest-first
prefixes), tail words carry near-unique grams, so prefix probes hit
small buckets — the regime Bayardo et al.'s prefix filter is exact
AND fast in. (Two earlier drafts used 40- and 2 000-word digit
vocabularies; with V words of ~L tokens/doc every within-word gram
has df ≈ n·L/V, so at 194k docs EVERY bucket held hundreds-to-
thousands of docs and the exact census was quadratic by construction
— measured 112 s @ 5k → 452 s @ 10k, the documented residual worst
case of exact all-pairs, not the hot-source shape the fix targets.)

Verifies, with the gates forced to the distributed paths:
- q_minhash_lsh_pairs finishes in bounded time; token-less docs emit no
  pairs; all 20k boilerplate copies land in ONE cluster via the
  star-recovery pairs; the planted (i, i+1) near-dup pairs are all
  recovered (they live in normal-sized buckets — the cap must not eat
  them);
- q_ngram_jaccard_dups' census is exact: the 194k-doc hot source
  (above NGRAM_DISTRIBUTED_MIN_DOCS → the distributed Vernica-style
  census) completes and equals the planted structure exactly (boiler +
  empties + in-source planted pairs), and a second 6 000-doc source —
  between NGRAM_PREFIX_MIN_DOCS and the distributed gate, so it runs
  the in-task prefix-filter path — equals an independent quadratic
  recount on the driver. One run therefore exercises BOTH above-gate
  paths against independent expectations.

Prints one JSON line of wall times + check booleans for BASELINE.md.

Usage: python scripts/scale_smoke_hotbucket.py [n_docs]
"""

from __future__ import annotations

import json
import pathlib
import sys
import time

sys.path.insert(0, ".")


def _progress(msg: str) -> None:
    """Unbuffered stderr phase marker — the smoke runs for tens of
    minutes under background harnesses; per-phase timestamps make a
    partial run diagnosable instead of a silent timeout."""
    print(f"[smoke {time.strftime('%H:%M:%S')}] {msg}",
          file=sys.stderr, flush=True)

N_DOCS = int(sys.argv[1]) if len(sys.argv) > 1 else 200_000
OUT = pathlib.Path(f"/tmp/kr_hotbucket_smoke_v2_{N_DOCS}")

N_BOILER = min(20_000, N_DOCS // 10)   # identical copies (the hot bucket)
N_EMPTY = min(5_000, N_DOCS // 40)     # token-less docs (all-MAX bucket)
N_REF = 6_000                          # recountable second source

BOILER = "terms of service apply contact us for details all rights reserved"

_VOCAB_SIZE = 500_000
_ZIPF_S = 1.1
_LETTERS = "abcdefghijklmnopqrstuvwxyz"
_vocab_cache: tuple | None = None


def _vocab():
    """(words, zipf_cdf) — built once, deterministic (seed 12345)."""
    global _vocab_cache
    if _vocab_cache is None:
        import numpy as np

        rng = np.random.default_rng(12345)
        lens = rng.integers(5, 10, size=_VOCAB_SIZE)
        chars = rng.integers(0, 26, size=int(lens.sum()))
        words, pos = [], 0
        for ln in lens:
            words.append("".join(_LETTERS[c] for c in chars[pos:pos + ln]))
            pos += ln
        p = np.arange(1, _VOCAB_SIZE + 1, dtype=np.float64) ** -_ZIPF_S
        _vocab_cache = (words, np.cumsum(p / p.sum()))
    return _vocab_cache


def _zipf_words(seed: int, size: int) -> list[str]:
    import numpy as np

    words, cdf = _vocab()
    rng = np.random.default_rng(seed)
    return [words[j] for j in np.searchsorted(cdf, rng.random(size))]


def text_of(i: int) -> str:
    """Deterministic doc text for global index i (single source of
    truth for generation AND the planted-structure recount)."""
    import numpy as np

    if i < N_BOILER:
        return BOILER
    if i < N_BOILER + N_EMPTY:
        return ""
    if (i - N_BOILER - N_EMPTY) % 100 == 1 and i - 1 >= N_BOILER + N_EMPTY:
        # near-duplicate of doc i-1 (same tokens, one word edited)
        base = np.random.default_rng(i - 1)
        toks = _zipf_words(i - 1, int(base.integers(40, 80)))
        toks[5] = "EDITED"
        return " ".join(toks)
    rng = np.random.default_rng(i)
    return " ".join(_zipf_words(i, int(rng.integers(40, 80))))


def ensure_table() -> None:
    import pyarrow as pa
    import pyarrow.parquet as pq

    if (OUT / "_DONE").exists():
        return
    OUT.mkdir(parents=True, exist_ok=True)
    texts = [text_of(i) for i in range(N_DOCS)]
    n_hot = N_DOCS - N_REF
    t = pa.table({
        "doc_id": pa.array(range(N_DOCS), pa.int64()),
        "source": pa.array(["hot"] * n_hot + ["ref"] * N_REF),
        "lang": pa.array(["en"] * N_DOCS),
        "text": pa.array(texts),
    })
    pq.write_table(t, OUT / "documents.parquet", row_group_size=16384)
    (OUT / "_DONE").touch()


def main() -> None:
    import ray

    ray.init(address="local", include_dashboard=False,
             ignore_reinit_error=True, logging_level="ERROR")
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False
    _progress('corpus ready')
    ensure_table()
    _progress('table ensured')

    from kryptone_ray.pipelines import dedup

    res: dict = {"n_docs": N_DOCS, "n_boiler": N_BOILER,
                 "n_empty": N_EMPTY, "n_ref": N_REF,
                 "timings_sec": {}, "checks": {}}

    assert N_DOCS >= dedup.MINHASH_DISTRIBUTED_MIN_DOCS, \
        "smoke must exercise the distributed self-join path"
    assert N_REF > dedup.NGRAM_PREFIX_MIN_DOCS, \
        "ref source must take the same prefix-filter path as hot"

    t0 = time.time()
    _progress('minhash start')
    pairs = dedup.q_minhash_lsh_pairs(str(OUT))
    _progress('minhash done')
    res["timings_sec"]["minhash_lsh_pairs"] = round(time.time() - t0, 2)
    res["n_pairs"] = len(pairs)

    lo, hi = N_BOILER, N_BOILER + N_EMPTY
    empties_a = ((pairs["doc_a"] >= lo) & (pairs["doc_a"] < hi)).any()
    empties_b = ((pairs["doc_b"] >= lo) & (pairs["doc_b"] < hi)).any()
    res["checks"]["no_empty_doc_pairs"] = not (empties_a or empties_b)

    # star recovery: clustering must put ALL boilerplate copies in one
    # cluster rooted at doc 0
    t0 = time.time()
    clusters = dedup._union_find_clusters(pairs, "doc_a", "doc_b")
    _progress('clusters done')
    res["timings_sec"]["cluster_pairs"] = round(time.time() - t0, 2)
    row = clusters[clusters["representative"] == 0]
    res["checks"]["boiler_one_cluster"] = (
        len(row) == 1 and int(row["n_members"].iloc[0]) == N_BOILER)

    # planted near-dup recovery: every (i-1, i) pair with the one-word
    # edit must be present (word-3-gram jaccard ~0.9 at 40-80 tokens,
    # well past the 0.6 verify threshold; 16-band LSH miss probability
    # ~(1 - 0.9^4)^16 ~ 4e-8 per pair)
    planted = [(i - 1, i) for i in range(hi, N_DOCS)
               if (i - hi) % 100 == 1 and i - 1 >= hi]
    have = set(zip(pairs["doc_a"].astype(int), pairs["doc_b"].astype(int)))
    missing = [p for p in planted if p not in have]
    res["n_planted"] = len(planted)
    res["checks"]["planted_pairs_recovered"] = not missing
    res["n_missing_planted"] = len(missing)

    # n-gram census through the prefix-filter path: the hot source for
    # bounded time + the structural lower bound, the ref source for
    # exactness against an independent quadratic recount
    t0 = time.time()
    _progress('ngram census start')
    census = dedup.q_ngram_jaccard_dups(str(OUT))
    _progress('ngram census done')
    res["timings_sec"]["ngram_jaccard_dups"] = round(time.time() - t0, 2)
    by_src = census.set_index("source")
    n_hot_dup = int(by_src.loc["hot", "n_near_dup"])
    res["checks"]["ngram_hot_group_size"] = (
        int(by_src.loc["hot", "n_docs"]) == N_DOCS - N_REF)
    # the hot census is EXACTLY the planted structure: boiler copies +
    # empty docs (mutual J=1 wholesale) + both ends of every planted
    # near-dup pair fully inside the hot source (random Zipf docs never
    # reach J>=0.8 against each other — verified at 40k during tuning)
    n_hot = N_DOCS - N_REF
    planted_hot = sum(1 for i in range(hi, n_hot)
                      if (i - hi) % 100 == 1 and i - 1 >= hi)
    res["checks"]["ngram_hot_exact"] = (
        n_hot_dup == N_BOILER + N_EMPTY + 2 * planted_hot)
    res["ngram_hot_n_near_dup"] = n_hot_dup

    import pandas as pd

    t0 = time.time()
    ref_docs = pd.DataFrame({
        "source": "ref",
        "text": [text_of(i) for i in range(N_DOCS - N_REF, N_DOCS)],
    })
    _progress('ref recount start')
    recount = dedup._ngram_per_source(ref_docs, 0.8)
    _progress('ref recount done')
    res["timings_sec"]["ref_quadratic_recount"] = round(time.time() - t0, 2)
    res["checks"]["ngram_ref_matches_recount"] = (
        int(by_src.loc["ref", "n_near_dup"])
        == int(recount["n_near_dup"].iloc[0]))
    res["ngram_ref_n_near_dup"] = int(by_src.loc["ref", "n_near_dup"])

    ray.shutdown()
    assert all(res["checks"].values()), res
    print(json.dumps(res))


if __name__ == "__main__":
    main()
