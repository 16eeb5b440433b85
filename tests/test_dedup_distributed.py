"""Round-2 dedup/ANN distribution: the rewritten pipelines must produce
byte-identical output to the round-1 implementations (pinned goldens at
sf0.01) while running distributed — vectorized hash kernels, self-join
banding, object-store block pairs, map_batches Lloyd iterations.
"""

from __future__ import annotations

import pathlib

import numpy as np
import pandas as pd
import pytest

from kryptone_ray.pipelines import ann, dedup
from kryptone_ray.utils.xxh64 import xxh64, xxh64_batch

SF = "/root/testdata/sf0.01"
GOLDEN = pathlib.Path(__file__).parent / "golden"


def _golden(name: str) -> pd.DataFrame:
    return pd.read_json(GOLDEN / f"dedup_{name}_sf001.json", orient="split")


# ---------------------------------------------------------------- kernels


def test_xxh64_batch_bit_exact_vs_scalar():
    import random

    rng = random.Random(11)
    cases = [bytes(rng.randrange(256) for _ in range(L))
             for L in [0, 1, 3, 4, 7, 8, 9, 31, 32, 33, 63, 64, 100, 4000]
             for _ in range(3)]
    cases += ["", "a", "déjà ✓", "x" * 32]
    exp = np.array([xxh64(c) for c in cases], dtype=np.uint64)
    assert (xxh64_batch(cases) == exp).all()
    exp_seed = np.array([xxh64(c, 99) for c in cases], dtype=np.uint64)
    assert (xxh64_batch(cases, 99) == exp_seed).all()


def test_minhash_batch_bit_exact_vs_scalar():
    texts = ["the quick brown fox jumps over the lazy dog",
             "", "one two", "a b c d e f", "single",
             "the quick brown fox jumps over the lazy dog"]
    sigs = dedup.minhash_signatures_batch(texts)
    for i, t in enumerate(texts):
        assert (sigs[i] == dedup.minhash_signature(t)).all()


def test_simhash_batch_bit_exact_vs_scalar():
    texts = ["the quick brown fox", "", "one two one two one", "a"]
    got = dedup.simhash_batch(texts)
    for i, t in enumerate(texts):
        assert int(got[i]) == dedup.simhash64(t)


def test_hamming64_vectorized():
    a = np.array([0, 0xFFFFFFFFFFFFFFFF, 0b1010], dtype=np.uint64)
    b = np.array([0, 0, 0b0101], dtype=np.uint64)
    assert dedup.hamming64(a, b).tolist() == [0, 64, 4]


# ---------------------------------------------------------------- goldens


@pytest.mark.usefixtures("ray_session")
def test_minhash_lsh_matches_round1_golden():
    out = dedup.q_minhash_lsh_pairs(SF)
    pd.testing.assert_frame_equal(out.reset_index(drop=True),
                                  _golden("minhash_lsh_pairs"),
                                  check_dtype=False)


@pytest.mark.usefixtures("ray_session")
def test_simhash_matches_round1_golden():
    out = dedup.q_simhash_clusters(SF)
    pd.testing.assert_frame_equal(out.reset_index(drop=True),
                                  _golden("simhash_clusters"),
                                  check_dtype=False)


@pytest.mark.usefixtures("ray_session")
def test_ngram_jaccard_matches_round1_golden():
    out = dedup.q_ngram_jaccard_dups(SF)
    pd.testing.assert_frame_equal(out.reset_index(drop=True),
                                  _golden("ngram_jaccard_dups"),
                                  check_dtype=False)


@pytest.mark.usefixtures("ray_session")
def test_embedding_near_dups_matches_round1_golden():
    out = dedup.q_embedding_near_dups(SF)
    pd.testing.assert_frame_equal(out.reset_index(drop=True),
                                  _golden("embedding_near_dups"),
                                  check_dtype=False)


@pytest.mark.usefixtures("ray_session")
def test_knn_ivf_matches_round1_golden():
    out = ann.q_knn_ivf(SF)
    pd.testing.assert_frame_equal(out.reset_index(drop=True),
                                  _golden("knn_ivf"),
                                  check_dtype=False)


def test_ngram_size_prune_equals_bruteforce():
    """The AllPairs length filter must not change which docs are flagged."""
    rng = np.random.default_rng(5)
    words = ["alpha", "beta", "gamma", "delta", "epsilon", "zeta"]
    texts = [" ".join(rng.choice(words, size=rng.integers(1, 30)))
             for _ in range(40)]
    texts += [texts[0], texts[1] + " tail", "zz"]
    g = pd.DataFrame({"source": "s", "doc_id": range(len(texts)), "text": texts})

    grams = [{t[i:i + 5] for i in range(max(1, len(t) - 4))}
             for t in g["text"].str.lower()]
    n = len(g)
    brute = np.zeros(n, dtype=bool)
    for i in range(n):
        for j in range(i + 1, n):
            inter = len(grams[i] & grams[j])
            if inter and inter / len(grams[i] | grams[j]) >= 0.8:
                brute[i] = brute[j] = True

    # run the pruned per-source fn through map_groups-equivalent call
    import kryptone_ray.pipelines.dedup as d

    # reconstruct by invoking the inner logic via the public query is
    # heavy; instead replicate the pruned scan here against brute force
    sizes = np.array([len(s) for s in grams])
    order = np.argsort(sizes, kind="stable")
    pruned = np.zeros(n, dtype=bool)
    for oi in range(n):
        i = order[oi]
        limit = sizes[i] / 0.8
        for oj in range(oi + 1, n):
            j = order[oj]
            if sizes[j] > limit:
                break
            inter = len(grams[i] & grams[j])
            if inter and inter / len(grams[i] | grams[j]) >= 0.8:
                pruned[i] = pruned[j] = True
    assert (pruned == brute).all()


@pytest.mark.usefixtures("ray_session")
def test_embedding_lsh_is_subset_of_exact():
    """The hyperplane-LSH scale path may miss pairs (recall < 1) but must
    never invent one: every LSH pair is in the exact all-pairs output."""
    lsh = dedup.q_embedding_near_dups_lsh(SF)
    exact = _golden("embedding_near_dups")
    ls = set(map(tuple, lsh.values))
    ex = set(map(tuple, exact.values))
    assert ls and ls <= ex
    assert len(ls) / len(ex) > 0.3  # seeded recall is deterministic (~0.5)


@pytest.mark.usefixtures("ray_session")
def test_image_phash_finds_planted_near_dups():
    """Multimodal dedup: every deterministically perturbed image copy
    must pair with its original through decode → aHash → chunk-bucket →
    hamming, and perturbed pairs dominate the output."""
    from kryptone_ray.pipelines import multimodal

    out = multimodal.q_image_phash_near_dups("")
    planted = out[out["image_b"].str.endswith("?dup")]
    n_expected = multimodal._MM_ROWS // 10
    assert len(planted) == n_expected
    # each planted pair is (original, original+'?dup') with tiny distance
    assert (planted["image_b"] == planted["image_a"] + "?dup").all()
    assert (planted["hamming"] <= 3).all()


@pytest.mark.usefixtures("ray_session")
def test_wordfreq_tfidf_hash_path_equals_driver_path(monkeypatch):
    """The at-scale hash-repartition combine must produce the same
    top-k as the small-corpus driver combine (disjoint vocabulary
    slices → per-block combines are globally exact)."""
    from kryptone_ray.pipelines import common, textops

    small_wf = textops.q_word_frequency(SF)
    small_tf = textops.q_tfidf_top_terms(SF)
    monkeypatch.setattr(textops, "DISTRIBUTED_COMBINE_MIN_ROWS", 0)
    big_wf = textops.q_word_frequency(SF)
    big_tf = textops.q_tfidf_top_terms(SF)
    pd.testing.assert_frame_equal(small_wf, big_wf, check_dtype=False)
    pd.testing.assert_frame_equal(small_tf, big_tf, check_dtype=False)


def test_neardup_clusters_transitive(monkeypatch):
    """a-b, b-c, plus an isolated pair: components must collapse chains
    (union-find transitivity), representative = min id, sizes exact."""
    fake = pd.DataFrame({"doc_a": [1, 2, 9, 5], "doc_b": [2, 3, 1, 6],
                         "jaccard": [0.9] * 4})
    monkeypatch.setattr(
        dedup, "_minhash_pairs",
        lambda sf_dir, bands, threshold, as_dataset=False: fake)
    out = dedup.q_neardup_clusters("")
    assert out.to_dict("list") == {"representative": [1, 5],
                                   "n_members": [4, 2]}


@pytest.mark.usefixtures("ray_session")
def test_neardup_clusters_matches_golden():
    out = dedup.q_neardup_clusters(SF)
    pd.testing.assert_frame_equal(out.reset_index(drop=True),
                                  _golden("neardup_clusters"),
                                  check_dtype=False)


@pytest.mark.usefixtures("ray_session")
def test_image_knn_matches_local_bruteforce_and_golden():
    """decode → histogram-embed → kNN: the distributed per-batch
    top-k partial merge must equal a single-process brute force over
    all embeddings, and stay pinned."""
    from kryptone_ray.corpus import codecs
    from kryptone_ray.corpus.synth import CorpusSpec
    from kryptone_ray.pipelines import multimodal

    out = multimodal.q_image_knn("")
    golden = pd.read_json(pathlib.Path(__file__).parent / "golden" /
                          "mm_image_knn.json", orient="split")
    pd.testing.assert_frame_equal(out.reset_index(drop=True), golden,
                                  check_dtype=False)

    spec = CorpusSpec(n_rows=multimodal._MM_ROWS, n_hosts=8,
                      seed=multimodal._MM_SEED)
    actor = multimodal.ImageHistogramEmbedActor()
    embs = {}
    for i in range(multimodal._MM_ROWS):
        r = spec.row(i)
        px = codecs.decode(r["bytes"], r["fmt"], r["w"], r["h"])
        embs[r["image_id"]] = actor.embed(px)
    qid = spec.url_of(2)
    qv = embs[qid].astype(np.float64)
    sims = sorted(
        ((float(qv @ v.astype(np.float64)), k)
         for k, v in embs.items() if k != qid),
        key=lambda t: (-round(t[0], 6), t[1]))
    expect = [k for _, k in sims[:5]]
    assert out[out["query_id"] == qid]["match_id"].tolist() == expect


@pytest.mark.usefixtures("ray_session")
def test_knn_lsh_matches_pinned_golden_and_recall():
    """Deterministic output (seeded hyperplanes) + recall@K vs the
    exact brute-force baseline stays above the predicted-for-this-
    corpus floor (see q_knn_lsh docstring: ~0.77 predicted at
    cosine-0.3 neighbors; 0.6 leaves margin for plane-draw variance)."""
    out = ann.q_knn_lsh(SF)
    pd.testing.assert_frame_equal(out.reset_index(drop=True),
                                  _golden("knn_lsh"),
                                  check_dtype=False)
    brute = ann.q_knn_bruteforce(SF)
    b = {(r.query_id, r.neighbor_id) for r in brute.itertuples()}
    l = {(r.query_id, r.neighbor_id) for r in out.itertuples()}
    assert len(b & l) / len(b) >= 0.6


@pytest.mark.usefixtures("ray_session")
def test_image_neardup_clusters_cover_planted_pairs():
    """Cluster output must cover every planted (original, ?dup) pair:
    each cluster has >=2 members, every ?dup id shares a cluster with
    its original (representative is never a ?dup unless its base sorts
    after it — ids are 'img...' so base always sorts first)."""
    from kryptone_ray.pipelines import multimodal

    cl = multimodal.q_image_neardup_clusters("")
    assert (cl["n_members"] >= 2).all()
    n_expected = multimodal._MM_ROWS // 10
    assert cl["n_members"].sum() >= 2 * n_expected
    assert not cl["representative"].str.endswith("?dup").any()


@pytest.mark.usefixtures("ray_session")
def test_minhash_hot_bucket_cap_and_empty_guard(monkeypatch, tmp_path):
    """Round-4 scale hazard fix: a degenerate bucket (one text repeated
    1200×, plus 300 token-less docs sharing the all-MAX signature) must
    not inflate a join partition quadratically. The capped distributed
    run must (a) finish, (b) emit NO pairs for empty docs, (c) keep all
    1200 copies connected through the representative (star recovery),
    and (d) agree with the driver path on the non-degenerate docs."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    rng = np.random.default_rng(5)
    words = [f"w{i}" for i in range(50)]
    texts, ids = [], []
    # 1200 identical docs — every band bucket holds all 1200 (> cap 512)
    for i in range(1200):
        ids.append(i)
        texts.append("alpha beta gamma delta epsilon zeta eta theta")
    # 300 token-less docs
    for i in range(1200, 1500):
        ids.append(i)
        texts.append("")
    # 200 distinct normal docs (unique shingles — no near-dups)
    for i in range(1500, 1700):
        ids.append(i)
        texts.append(" ".join(rng.choice(words, 30)) + f" unique{i} tail{i}")
    pq.write_table(pa.table({"doc_id": pa.array(ids, pa.int64()),
                             "source": pa.array(["s"] * len(ids)),
                             "text": pa.array(texts)}),
                   tmp_path / "documents.parquet")

    monkeypatch.setattr(dedup, "MINHASH_DISTRIBUTED_MIN_DOCS", 0)
    out = dedup.q_minhash_lsh_pairs(str(tmp_path))
    # empty docs never appear
    assert not ((out["doc_a"] >= 1200) & (out["doc_a"] < 1500)).any()
    assert not ((out["doc_b"] >= 1200) & (out["doc_b"] < 1500)).any()
    # star recovery: all 1200 identical docs pair with representative 0
    dup_ids = set(range(1200))
    touched = set(out[out["doc_a"] == 0]["doc_b"]) | {0}
    assert dup_ids <= touched
    # connectivity: clustering the capped pairs recovers ONE cluster
    # holding all 1200 members
    clusters = dedup._union_find_clusters(out, "doc_a", "doc_b")
    row = clusters[clusters["representative"] == 0]
    assert len(row) == 1 and int(row["n_members"].iloc[0]) == 1200


@pytest.mark.usefixtures("ray_session")
def test_label_prop_clusters_equal_union_find(monkeypatch):
    """Round-4: above UNIONFIND_MAX_PAIRS clustering switches from the
    driver union-find to distributed min-label propagation; both must
    produce identical (representative, n_members) rows. Exercised on
    the real sf0.01 verified-pair list plus a synthetic chain+clique
    graph (deep path stresses the >2-round propagation case)."""
    pairs = dedup.q_minhash_lsh_pairs(SF)
    uf = dedup._union_find_clusters(pairs, "doc_a", "doc_b")
    lp = dedup._label_prop_clusters(pairs, "doc_a", "doc_b")
    pd.testing.assert_frame_equal(uf, lp)

    # chain 0-1-2-...-19 (diameter 19 → several rounds) + clique {100..104}
    chain = pd.DataFrame({"doc_a": range(19), "doc_b": range(1, 20)})
    clique = pd.DataFrame(
        [(a, b) for a in range(100, 105) for b in range(a + 1, 105)],
        columns=["doc_a", "doc_b"])
    g = pd.concat([chain, clique], ignore_index=True)
    uf = dedup._union_find_clusters(g, "doc_a", "doc_b")
    lp = dedup._label_prop_clusters(g, "doc_a", "doc_b")
    pd.testing.assert_frame_equal(uf, lp)


@pytest.mark.usefixtures("ray_session")
def test_neardup_clusters_gate_routes_to_label_prop(monkeypatch):
    """Forcing the pair gate to 0 must route q_neardup_clusters through
    the distributed path with unchanged output."""
    small = dedup.q_neardup_clusters(SF)
    monkeypatch.setattr(dedup, "UNIONFIND_MAX_PAIRS", 0)
    big = dedup.q_neardup_clusters(SF)
    pd.testing.assert_frame_equal(small, big)


@pytest.mark.usefixtures("ray_session")
def test_neardup_clusters_dataset_route_no_driver_pairs(monkeypatch):
    """Round-5 (VERDICT r4 #2): with every gate forced distributed
    (candidate self-join + two-join verify + label propagation), the
    verified pair list must flow as a DATASET from the verify straight
    into clustering — the driver union-find must never run — with
    output identical to the ungated path."""
    small = dedup.q_neardup_clusters(SF)
    monkeypatch.setattr(dedup, "MINHASH_DISTRIBUTED_MIN_DOCS", 0)
    monkeypatch.setattr(dedup, "MINHASH_DISTRIBUTED_VERIFY_MIN_PAIRS", 0)
    monkeypatch.setattr(dedup, "UNIONFIND_MAX_PAIRS", 0)

    def boom(*a, **k):
        raise AssertionError("pair list landed on the driver")

    monkeypatch.setattr(dedup, "_union_find_clusters", boom)
    big = dedup.q_neardup_clusters(SF)
    pd.testing.assert_frame_equal(small.reset_index(drop=True),
                                  big.reset_index(drop=True),
                                  check_dtype=False)


@pytest.mark.usefixtures("ray_session")
def test_image_neardup_clusters_gate_routes_to_label_prop(monkeypatch):
    from kryptone_ray.pipelines import multimodal

    small = multimodal.q_image_neardup_clusters("")
    monkeypatch.setattr(dedup, "UNIONFIND_MAX_PAIRS", 0)
    big = multimodal.q_image_neardup_clusters("")
    pd.testing.assert_frame_equal(small.reset_index(drop=True),
                                  big.reset_index(drop=True),
                                  check_dtype=False)


@pytest.mark.usefixtures("ray_session")
def test_image_phash_distributed_route_matches_driver(monkeypatch):
    """Round-5 (VERDICT r4 #2, image twin): forcing the aHash row gate
    to 0 routes pair generation through the chunk-key repartition +
    in-block hamming verify; pairs must equal the driver bucket scan.
    With the union-find gate also forced, clustering must consume the
    pair DATASET end to end (hash-coded label propagation + min-string
    census) with unchanged clusters. (The bucket cap is deliberately
    NOT forced here: star pairs preserve clusters only for genuinely
    degenerate buckets — mutual near-dups, e.g. identical clones —
    not for random 16-bit-chunk collisions; the planted-clone case is
    covered by the minhash hot-bucket smoke.)"""
    from kryptone_ray.pipelines import multimodal

    small_pairs = multimodal.q_image_phash_near_dups("")
    small_cl = multimodal.q_image_neardup_clusters("")
    monkeypatch.setattr(multimodal, "IMAGE_PHASH_DISTRIBUTED_MIN_ROWS", 0)
    big_pairs = multimodal.q_image_phash_near_dups("")
    pd.testing.assert_frame_equal(small_pairs.reset_index(drop=True),
                                  big_pairs.reset_index(drop=True),
                                  check_dtype=False)
    monkeypatch.setattr(dedup, "UNIONFIND_MAX_PAIRS", 0)
    big_cl = multimodal.q_image_neardup_clusters("")
    pd.testing.assert_frame_equal(small_cl.reset_index(drop=True),
                                  big_cl.reset_index(drop=True),
                                  check_dtype=False)


def test_ngram_prefix_filter_equals_quadratic_scan():
    """The round-4 prefix-filter census must equal the size-pruned
    quadratic scan on every real sf0.01 source group AND on a planted
    hot source mixing exact dups, near-dups and unique docs."""
    import time

    docs = pd.read_parquet(f"{SF}/documents.parquet",
                           columns=["doc_id", "source", "text"])
    for _, g in docs.groupby("source", sort=False):
        slow = dedup._ngram_per_source(g, 0.8)
        fast = dedup._ngram_per_source_fast(g, 0.8)
        pd.testing.assert_frame_equal(slow.reset_index(drop=True),
                                      fast.reset_index(drop=True))

    # planted hot source: 3000 copies of one boilerplate, 50 docs that
    # are near-dups of it (tail tweak), 500 unique docs, 5 empties
    rng = np.random.default_rng(3)
    words = [f"tok{i}" for i in range(200)]
    base = " ".join(rng.choice(words, 60))
    texts = [base] * 3000
    texts += [base[:-6] + f" zz{i:03d}" for i in range(50)]
    texts += [" ".join(rng.choice(words, 40)) + f" u{i}x{i}y{i}z{i}w{i}q{i}"
              for i in range(500)]
    texts += [""] * 5
    g = pd.DataFrame({"doc_id": range(len(texts)),
                      "source": "hot", "text": texts})
    t0 = time.time()
    fast = dedup._ngram_per_source_fast(g, 0.8)
    fast_s = time.time() - t0
    slow = dedup._ngram_per_source(g, 0.8)
    pd.testing.assert_frame_equal(slow.reset_index(drop=True),
                                  fast.reset_index(drop=True))
    assert fast_s < 30  # bounded; the quadratic scan is the comparison


@pytest.mark.usefixtures("ray_session")
def test_ngram_gate_routes_hot_groups(monkeypatch):
    """Patching the group gate to 0 must route every group through the
    prefix-filter path with unchanged query output."""

    small = dedup.q_ngram_jaccard_dups(SF)
    monkeypatch.setattr(dedup, "NGRAM_PREFIX_MIN_DOCS", 0)
    big = dedup.q_ngram_jaccard_dups(SF)
    pd.testing.assert_frame_equal(small, big)


# ------------------------------------ distributed exact n-gram census


def test_gram_hashes_injective_vs_string_grams():
    """uint64 gram encodings must carry set semantics identical to the
    string grams the in-task scans use: same cardinality per doc, and
    cross-doc array equality iff the string gram sets are equal."""
    texts = ["the quick brown fox", "THE QUICK BROWN FOX",  # same lowered
             "", "ab", "abcde", "abcdef",
             "café crème brûlée", "你好世界你好", "naïve café",
             "the quick brown fo", "x" * 500]
    str_sets = [frozenset(t.lower()[i: i + 5]
                          for i in range(max(1, len(t) - 4)))
                for t in texts]
    arrs = [dedup._gram_hashes(t) for t in texts]
    for s, a in zip(str_sets, arrs):
        assert len(s) == len(a)
    for i in range(len(texts)):
        for j in range(len(texts)):
            assert (str_sets[i] == str_sets[j]) == \
                (len(arrs[i]) == len(arrs[j])
                 and bool((arrs[i] == arrs[j]).all()))


def test_hashed_prefix_census_matches_bruteforce():
    rng = np.random.default_rng(17)
    arrs = []
    for i in range(80):
        a = np.unique(rng.integers(0, 300, size=rng.integers(5, 40))
                      .astype(np.uint64))
        arrs.append(a)
        if i % 7 == 0:  # planted near-identical neighbour
            arrs.append(np.unique(np.append(a, np.uint64(1000 + i))))
    got = dedup._hashed_prefix_census(arrs, 0.8)
    exp = np.zeros(len(arrs), dtype=bool)
    for i in range(len(arrs)):
        for j in range(i + 1, len(arrs)):
            inter = np.intersect1d(arrs[i], arrs[j],
                                   assume_unique=True).size
            if inter and inter / (len(arrs[i]) + len(arrs[j]) - inter) >= 0.8:
                exp[i] = exp[j] = True
    assert (got == exp).all()


@pytest.mark.usefixtures("ray_session")
def test_ngram_distributed_census_equals_driver(monkeypatch):
    """Gate-forced distributed census (class collapse → prefix buckets →
    two-join verify) must equal the driver-exact census at sf0.01,
    through both the normal-bucket and the overflow-bucket paths."""
    ref = dedup.q_ngram_jaccard_dups(SF)
    monkeypatch.setattr(dedup, "MINHASH_DISTRIBUTED_MIN_DOCS", 0)
    monkeypatch.setattr(dedup, "NGRAM_DISTRIBUTED_MIN_DOCS", 0)
    got = dedup.q_ngram_jaccard_dups(SF)
    pd.testing.assert_frame_equal(
        got.reset_index(drop=True), ref.reset_index(drop=True),
        check_dtype=False)
    # force the JOIN verify regime (blobs "too big" to broadcast)
    monkeypatch.setattr(dedup, "NGRAM_BCAST_VERIFY_BYTES", 0)
    got_j = dedup.q_ngram_jaccard_dups(SF)
    pd.testing.assert_frame_equal(
        got_j.reset_index(drop=True), ref.reset_index(drop=True),
        check_dtype=False)
    monkeypatch.undo()
    monkeypatch.setattr(dedup, "MINHASH_DISTRIBUTED_MIN_DOCS", 0)
    monkeypatch.setattr(dedup, "NGRAM_DISTRIBUTED_MIN_DOCS", 0)
    monkeypatch.setattr(dedup, "NGRAM_PAIR_CAP", 0)  # all buckets overflow
    got2 = dedup.q_ngram_jaccard_dups(SF)
    pd.testing.assert_frame_equal(
        got2.reset_index(drop=True), ref.reset_index(drop=True),
        check_dtype=False)


def test_hashed_prefix_census_threshold_sweep_vs_bruteforce():
    """The probe-prefix length p = |x| − ⌈t·|x|⌉ + 1 and the PPJoin
    positional bound are both threshold-driven; sweep t across values
    where t·sz lands EXACTLY on an integer (0.5, 0.75 with even sizes)
    and where it doesn't, against an O(n²) recount. A ceil done one
    slot high (the float-guard failure mode) drops qualifying pairs
    only at specific (t, sz) combinations — one threshold can't see it."""
    rng = np.random.default_rng(23)
    arrs = []
    for i in range(70):
        # sizes forced through multiples of 2 and 4 so t·sz is integral
        # for t ∈ {0.5, 0.75} on many docs
        sz = int(rng.integers(4, 30)) * 2
        a = np.unique(rng.integers(0, 260, size=sz).astype(np.uint64))
        arrs.append(a)
        if i % 5 == 0:  # planted near-identical neighbour
            arrs.append(np.unique(np.append(a[1:], np.uint64(5000 + i))))
    for t in (0.5, 0.6, 2.0 / 3.0, 0.75, 0.8, 0.9):
        got = dedup._hashed_prefix_census(arrs, t)
        exp = np.zeros(len(arrs), dtype=bool)
        for i in range(len(arrs)):
            for j in range(i + 1, len(arrs)):
                inter = np.intersect1d(arrs[i], arrs[j],
                                       assume_unique=True).size
                if inter and inter / (len(arrs[i]) + len(arrs[j])
                                      - inter) >= t:
                    exp[i] = exp[j] = True
        assert (got == exp).all(), f"threshold {t}"


@pytest.mark.usefixtures("ray_session")
def test_ngram_distributed_census_threshold_sweep(monkeypatch):
    """Gate-forced distributed census must equal the driver-exact census
    at thresholds besides the default 0.8 — the AllPairs probe prefix,
    the PPJoin positional bound AND the verify all re-derive from t."""
    monkeypatch.setattr(dedup, "MINHASH_DISTRIBUTED_MIN_DOCS", 0)
    for t in (0.5, 0.9):
        monkeypatch.setattr(dedup, "NGRAM_DISTRIBUTED_MIN_DOCS", 10 ** 9)
        ref = dedup.q_ngram_jaccard_dups(SF, threshold=t)
        monkeypatch.setattr(dedup, "NGRAM_DISTRIBUTED_MIN_DOCS", 0)
        got = dedup.q_ngram_jaccard_dups(SF, threshold=t)
        pd.testing.assert_frame_equal(
            got.reset_index(drop=True), ref.reset_index(drop=True),
            check_dtype=False)
