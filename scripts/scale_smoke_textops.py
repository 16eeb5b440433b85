"""Textops-family scale smoke: synthesize an N-doc ``documents``-shaped
table (default 300k — 60x the sf0.1 bench table, ABOVE the
DISTRIBUTED_COMBINE_MIN_ROWS gate so the genuinely distributed shapes
run un-patched), run the PII / repetition / wordcount / token pipelines
against it, and verify every output against an independent DuckDB
recount over the same parquet. Evidence for BASELINE.md that the text
shapes hold far past the driver-table scale.

Usage: python scripts/scale_smoke_textops.py [n_docs]
"""

from __future__ import annotations

import json
import pathlib
import sys
import time

sys.path.insert(0, ".")

N_DOCS = int(sys.argv[1]) if len(sys.argv) > 1 else 300_000
OUT = pathlib.Path(f"/tmp/kr_textops_smoke_{N_DOCS}")

VOCAB = (
    "the quick brown fox jumps over lazy dog data pipeline ray arrow "
    "batch shuffle partition frontier crawl image caption vector hash "
    "join filter window stream spill actor block scan merge sort key "
    "value token corpus shard politeness robots queue index store"
).split()
LANGS = ["en", "fr", "es", "de", "zh"]


def synth() -> None:
    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    if (OUT / "documents.parquet").exists():
        return
    OUT.mkdir(parents=True, exist_ok=True)
    rng = np.random.default_rng(2026)
    n_words = rng.integers(8, 40, size=N_DOCS)
    vocab = np.array(VOCAB)
    texts = [" ".join(vocab[rng.integers(0, len(vocab), size=k)])
             for k in n_words]
    t = pa.table({
        "doc_id": pa.array(range(N_DOCS), type=pa.int64()),
        "text": pa.array(texts, type=pa.string()),
        "lang": pa.array([LANGS[i % len(LANGS)] for i in range(N_DOCS)],
                         type=pa.string()),
        "source": pa.array([f"src{i % 20}" for i in range(N_DOCS)],
                           type=pa.string()),
        "n_chars": pa.array([len(x) for x in texts], type=pa.int64()),
    })
    pq.write_table(t, OUT / "documents.parquet", row_group_size=50_000)


def main() -> None:
    import duckdb
    import pandas as pd
    import ray

    if not ray.is_initialized():
        ray.init(address="local", num_cpus=16, include_dashboard=False,
                 logging_level="ERROR")
    import ray.data as rd

    rd.DataContext.get_current().enable_progress_bars = False

    synth()
    from kryptone_ray.pipelines import pii, textops

    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM "
        f"read_parquet('{OUT}/documents.parquet')")

    cases = {
        "pii_redaction": (pii.q_pii_redaction, pii.Q_PII_REDACTION_SQL),
        "repetition_stats": (textops.q_repetition_stats,
                             textops.Q_REPETITION_STATS_SQL),
        "word_frequency": (textops.q_word_frequency,
                           textops.Q_WORD_FREQ_SQL),
        "token_counts": (textops.q_token_counts,
                         textops.Q_TOKEN_COUNTS_SQL),
    }
    report: dict = {"n_docs": N_DOCS,
                    "gate": textops.DISTRIBUTED_COMBINE_MIN_ROWS,
                    "distributed": N_DOCS >= textops.DISTRIBUTED_COMBINE_MIN_ROWS}
    ok_all = True
    for name, (fn, sql) in cases.items():
        t0 = time.time()
        mine = fn(str(OUT))
        dt = round(time.time() - t0, 2)
        oracle = con.execute(sql).df()
        m = mine[sorted(mine.columns)].reset_index(drop=True)
        o = oracle[sorted(oracle.columns)].reset_index(drop=True)
        m = m.sort_values(list(m.columns)).reset_index(drop=True)
        o = o.sort_values(list(o.columns)).reset_index(drop=True)
        try:
            pd.testing.assert_frame_equal(m, o, check_dtype=False)
            match = True
        except AssertionError:
            match = False
            ok_all = False
        report[name] = {"sec": dt, "rows": len(m), "match": match}
    print(json.dumps(report))
    ray.shutdown()
    sys.exit(0 if ok_all else 1)


if __name__ == "__main__":
    main()
