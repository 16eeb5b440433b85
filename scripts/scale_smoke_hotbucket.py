"""Round-4 adversarial scale smoke: DEGENERATE-BUCKET minhash and
HOT-SOURCE n-gram Jaccard at 200k docs.

Plants the two inputs the round-3 verdict flagged as scale hazards:
- one boilerplate text duplicated 20 000× (every LSH band bucket holds
  all 20k copies — quadratic in the uncapped self-join: ~3.2e9
  in-partition pair rows) plus 5 000 token-less docs (the all-MAX
  signature bucket), alongside planted near-dup pairs and normal docs;
- the same table is ONE source, so the n-gram census hits the
  prefix-filter path with a 200k-doc group.

Verifies, with the gates forced to the distributed paths:
- q_minhash_lsh_pairs finishes in bounded time; token-less docs emit no
  pairs; all 20k boilerplate copies land in ONE cluster via the
  star-recovery pairs; the planted (i, i+1) near-dup pairs are all
  recovered (they live in normal-sized buckets — the cap must not eat
  them);
- q_ngram_jaccard_dups' census equals an independent recount built from
  the planted structure.

Prints one JSON line of wall times + check booleans for BASELINE.md.

Usage: python scripts/scale_smoke_hotbucket.py [n_docs]
"""

from __future__ import annotations

import json
import pathlib
import sys
import time

sys.path.insert(0, ".")

N_DOCS = int(sys.argv[1]) if len(sys.argv) > 1 else 200_000
OUT = pathlib.Path(f"/tmp/kr_hotbucket_smoke_{N_DOCS}")

N_BOILER = min(20_000, N_DOCS // 10)   # identical copies (the hot bucket)
N_EMPTY = min(5_000, N_DOCS // 40)     # token-less docs (all-MAX bucket)

VOCAB = (
    "the quick brown fox jumps over lazy dog data pipeline ray arrow "
    "batch shuffle partition frontier crawl image caption vector hash "
    "join filter window stream spill actor block scan merge sort key "
    "value token corpus shard politeness robots queue index store"
).split()

BOILER = "terms of service apply contact us for details all rights reserved"


def ensure_table() -> None:
    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    if (OUT / "_DONE").exists():
        return
    OUT.mkdir(parents=True, exist_ok=True)
    texts = []
    for i in range(N_DOCS):
        if i < N_BOILER:
            texts.append(BOILER)
        elif i < N_BOILER + N_EMPTY:
            texts.append("")
        elif (i - N_BOILER - N_EMPTY) % 100 == 1:
            # near-duplicate of doc i-1 (same tokens, one word edited)
            base = np.random.default_rng(i - 1)
            toks = list(base.choice(VOCAB, size=int(base.integers(40, 80))))
            toks[5] = "EDITED"
            texts.append(" ".join(toks))
        else:
            rng = np.random.default_rng(i)
            texts.append(" ".join(rng.choice(VOCAB,
                                             size=int(rng.integers(40, 80)))))
    t = pa.table({
        "doc_id": pa.array(range(N_DOCS), pa.int64()),
        "source": pa.array(["hot"] * N_DOCS),
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
    ensure_table()

    from kryptone_ray.pipelines import dedup

    res: dict = {"n_docs": N_DOCS, "n_boiler": N_BOILER,
                 "n_empty": N_EMPTY, "timings_sec": {}, "checks": {}}

    assert N_DOCS >= dedup.MINHASH_DISTRIBUTED_MIN_DOCS, \
        "smoke must exercise the distributed self-join path"

    t0 = time.time()
    pairs = dedup.q_minhash_lsh_pairs(str(OUT))
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
    res["timings_sec"]["cluster_pairs"] = round(time.time() - t0, 2)
    row = clusters[clusters["representative"] == 0]
    res["checks"]["boiler_one_cluster"] = (
        len(row) == 1 and int(row["n_members"].iloc[0]) == N_BOILER)

    # planted near-dup recovery: every (i, i+1) pair with the one-word
    # edit must be present (verified jaccard >= 0.6 given 40-80 tokens)
    planted = [(i - 1, i) for i in range(lo + hi % 2, N_DOCS)
               if (i - lo - N_EMPTY) % 100 == 1 and i - 1 >= hi]
    have = set(zip(pairs["doc_a"].astype(int), pairs["doc_b"].astype(int)))
    missing = [p for p in planted if p not in have]
    res["n_planted"] = len(planted)
    res["checks"]["planted_pairs_recovered"] = not missing
    res["n_missing_planted"] = len(missing)

    # hot-source n-gram census through the prefix-filter path
    t0 = time.time()
    census = dedup.q_ngram_jaccard_dups(str(OUT))
    res["timings_sec"]["ngram_jaccard_dups"] = round(time.time() - t0, 2)
    n_dup = int(census["n_near_dup"].iloc[0])
    # recount: boilerplate copies are all near-dups of each other;
    # empties have gram set {""} — also mutual J=1 dups; planted pairs
    # contribute both members; 5-gram jaccard of a one-word edit in
    # 40-80 tokens stays >= 0.8 only sometimes — recount independently
    # with the quadratic reference scan on the non-degenerate slice.
    import pandas as pd

    docs = pd.read_parquet(OUT / "documents.parquet")
    tail = docs.iloc[hi:]
    ref_tail = dedup._ngram_per_source(tail, 0.8)
    expect = N_BOILER + N_EMPTY + int(ref_tail["n_near_dup"].iloc[0])
    res["checks"]["ngram_census_matches_recount"] = (n_dup == expect)
    res["ngram_n_near_dup"] = n_dup
    res["ngram_expected"] = expect

    ray.shutdown()
    assert all(res["checks"].values()), res
    print(json.dumps(res))


if __name__ == "__main__":
    main()
