"""Dedup-family scale smoke: synthesize an N-doc ``documents``-shaped
table (default 200k — 40x the sf0.1 bench table) with planted exact and
near-duplicate pairs, run the distributed dedup pipelines against it,
verify the planted pairs are recovered, and print one JSON line of wall
times. Evidence for BASELINE.md that the dedup shapes hold far past the
driver-table scale.

Usage: python scripts/scale_smoke_dedup.py [n_docs]
"""

from __future__ import annotations

import json
import pathlib
import sys
import time

sys.path.insert(0, ".")

N_DOCS = int(sys.argv[1]) if len(sys.argv) > 1 else 200_000
OUT = pathlib.Path(f"/tmp/kr_dedup_smoke_{N_DOCS}")

VOCAB = (
    "the quick brown fox jumps over lazy dog data pipeline ray arrow "
    "batch shuffle partition frontier crawl image caption vector hash "
    "join filter window stream spill actor block scan merge sort key "
    "value token corpus shard politeness robots queue index store"
).split()


def ensure_table() -> None:
    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq
    import ray.data as rd

    if (OUT / "_DONE").exists():
        return
    OUT.mkdir(parents=True, exist_ok=True)

    def synth(batch: pa.Table) -> pa.Table:
        ids = batch["id"].to_pylist()
        texts, langs, sources = [], [], []
        for i in ids:
            rng = np.random.default_rng(i)
            if i % 100 == 1:
                # near-duplicate of doc i-1: same tokens, one word edited
                base = np.random.default_rng(i - 1)
                toks = list(base.choice(VOCAB, size=int(base.integers(40, 80))))
                toks[int(rng.integers(0, len(toks)))] = "EDITED"
                texts.append(" ".join(toks))
            elif i % 100 == 2:
                # exact duplicate of doc i-2
                base = np.random.default_rng(i - 2)
                toks = base.choice(VOCAB, size=int(base.integers(40, 80)))
                texts.append(" ".join(toks))
            else:
                toks = rng.choice(VOCAB, size=int(rng.integers(40, 80)))
                texts.append(" ".join(toks))
            langs.append(["en", "fr", "de", "es", "it"][i % 5])
            sources.append(f"src{i % 64:02d}")
        n_chars = [len(t) for t in texts]
        return pa.table({
            "doc_id": pa.array(ids, type=pa.int64()),
            "source": pa.array(sources, type=pa.string()),
            "lang": pa.array(langs, type=pa.string()),
            "n_chars": pa.array(n_chars, type=pa.int64()),
            "text": pa.array(texts, type=pa.string()),
        })

    ds = rd.range(N_DOCS).map_batches(synth, batch_format="pyarrow",
                                      batch_size=4096)
    # single file named documents.parquet so T(sf_dir, 'documents') works
    import pyarrow as pa

    tables = [pa.Table.from_pydict(b.to_pydict())
              if not isinstance(b, pa.Table) else b
              for b in ds.iter_batches(batch_size=65536,
                                       batch_format="pyarrow")]
    pq.write_table(pa.concat_tables(tables), OUT / "documents.parquet",
                   row_group_size=65536)
    (OUT / "_DONE").touch()


N_VECS = N_DOCS  # embeddings table the same size
DIM = 64


def ensure_embeddings() -> None:
    """N normalized random vectors + planted near-duplicates (i%100==1
    is vec i-1 plus small noise → cosine ≈ 0.99)."""
    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq
    import ray.data as rd

    if (OUT / "_EMB_DONE").exists():
        return

    def synth(batch: pa.Table) -> pa.Table:
        ids = batch["id"].to_pylist()
        vecs = []
        for i in ids:
            if i % 100 == 1:
                v = np.random.default_rng(i - 1).standard_normal(DIM)
                v = v + 0.05 * np.random.default_rng(i).standard_normal(DIM)
            else:
                v = np.random.default_rng(i).standard_normal(DIM)
            vecs.append((v / np.linalg.norm(v)).astype(np.float32))
        return pa.table({
            "vec_id": pa.array(ids, type=pa.int64()),
            "embedding": pa.array([v.tolist() for v in vecs],
                                  type=pa.list_(pa.float32())),
        })

    ds = rd.range(N_VECS).map_batches(synth, batch_format="pyarrow",
                                      batch_size=4096)
    import pyarrow as pa

    tables = list(ds.iter_batches(batch_size=65536, batch_format="pyarrow"))
    pq.write_table(pa.concat_tables(tables), OUT / "embeddings.parquet",
                   row_group_size=65536)
    (OUT / "_EMB_DONE").touch()


def main() -> None:
    import ray

    if not ray.is_initialized():
        ray.init(address="local", include_dashboard=False,
                 logging_level="ERROR")
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False

    ensure_table()
    ensure_embeddings()
    from kryptone_ray.pipelines import dedup

    timings = {}
    t0 = time.time()
    exact = dedup.q_dedup_exact(str(OUT))
    import ray.data as _rd

    if isinstance(exact, _rd.Dataset):  # distributed path above the gate
        exact = exact.to_pandas()
    timings["dedup_exact"] = round(time.time() - t0, 2)
    n_exact_dups = int((exact["n_dups"] > 1).sum())

    t0 = time.time()
    mh = dedup.q_minhash_lsh_pairs(str(OUT))
    timings["minhash_lsh_pairs"] = round(time.time() - t0, 2)

    t0 = time.time()
    sh = dedup.q_simhash_clusters(str(OUT))
    timings["simhash_clusters"] = round(time.time() - t0, 2)

    from kryptone_ray.pipelines import ann

    t0 = time.time()
    knn = ann.q_knn_bruteforce(str(OUT))
    timings["knn_bruteforce"] = round(time.time() - t0, 2)

    t0 = time.time()
    ivf = ann.q_knn_ivf(str(OUT))
    timings["knn_ivf"] = round(time.time() - t0, 2)

    t0 = time.time()
    lsh = dedup.q_embedding_near_dups_lsh(str(OUT), threshold=0.9)
    timings["embedding_near_dups_lsh"] = round(time.time() - t0, 2)
    lsh_pairs = set(zip(lsh["vec_a"], lsh["vec_b"]))
    got_vec_near = sum(1 for i in range(1, N_VECS, 100)
                       if (i - 1, i) in lsh_pairs)

    planted_near = N_DOCS // 100  # one per i%100==1
    # planted near-dups are (i-1, i): count recovered by minhash
    mh_pairs = set(zip(mh["doc_a"], mh["doc_b"]))
    got_near = sum(1 for i in range(1, N_DOCS, 100) if (i - 1, i) in mh_pairs)

    print(json.dumps({
        "n_docs": N_DOCS,
        "timings_sec": timings,
        "planted_exact_dup_groups": N_DOCS // 100,
        "found_exact_dup_groups": n_exact_dups,
        "planted_near_dups": planted_near,
        "minhash_recovered_near_dups": got_near,
        "minhash_total_pairs": len(mh),
        "simhash_total_pairs": len(sh),
        "knn_rows": len(knn),
        "knn_ivf_rows": len(ivf),
        # IVF is approximate; overlap with exact brute-force top-5 per
        # query measures its recall on real (random+planted) vectors
        "ivf_overlap_with_exact": len(
            set(map(tuple, ivf.values)) & set(map(tuple, knn.values))),
        "planted_vec_near_dups": N_VECS // 100,
        "lsh_recovered_vec_near_dups": got_vec_near,
        "lsh_total_pairs": len(lsh),
    }))
    ray.shutdown()


if __name__ == "__main__":
    main()
