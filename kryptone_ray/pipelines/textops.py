"""Text-analysis pipelines over the ``documents`` table — the distributed
re-expression of the reference's SEO/text operators
(/root/reference/kryptone/contrib/seo.py; utils/text.py) plus the
training-data-pipeline text ops (lang-id, quality scoring, token counts,
fingerprints).

Tokenization convention for ORACLE-CHECKED queries is plain
``lower().split(' ')`` so the DuckDB side (``string_split``) is exactly
equivalent; the richer reference tokenizer (stopwords, ≤30-char filter,
accent folding — text/ops.py) powers the caption pipeline and rows-only
entries.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from kryptone_ray.pipelines.common import T, partial_sum_count
from kryptone_ray.text import ops

# corpora below this row count combine vocabulary partials on the
# driver (a shuffle costs ~1 s locally); above it the hash-repartition
# distributed combine kicks in (tests force it by patching this)
DISTRIBUTED_COMBINE_MIN_ROWS = 200_000


def q_lang_distribution(sf_dir: str) -> pd.DataFrame:
    out = partial_sum_count(
        T(sf_dir, "documents", columns=["lang", "n_chars"]),
        keys=["lang"], sums={"total_chars": "n_chars"}, count_name="n_docs",
    )
    return out.sort_values("lang").reset_index(drop=True)


Q_LANG_SQL = """
SELECT lang, CAST(sum(n_chars) AS BIGINT) AS total_chars, count(*) AS n_docs
FROM documents GROUP BY lang ORDER BY lang
"""


def q_token_counts(sf_dir: str) -> pd.DataFrame:
    """Whitespace token count per doc (contrib/seo.py token pipeline
    analog) aggregated per source; vectorized str ops per batch."""
    ds = T(sf_dir, "documents", columns=["source", "text"])

    def f(df: pd.DataFrame) -> pd.DataFrame:
        df["n_tokens"] = df["text"].str.lower().str.split(" ").map(len)
        return df[["source", "n_tokens"]]

    ds = ds.map_batches(f, batch_format="pandas", batch_size=8192)
    out = partial_sum_count(ds, keys=["source"], sums={"total_tokens": "n_tokens"},
                            count_name="n_docs")
    return out.sort_values("source").reset_index(drop=True)


Q_TOKEN_COUNTS_SQL = """
SELECT source, CAST(sum(len(string_split(lower(text), ' '))) AS BIGINT) AS total_tokens,
       count(*) AS n_docs
FROM documents GROUP BY source ORDER BY source
"""


def q_word_frequency(sf_dir: str) -> pd.DataFrame:
    """Global top-10 word frequency — seo.py:407-421
    ``calculate_word_frequency`` (FreqDist → sorted top-10), fully
    distributed: per-batch partial token counts → hash-repartition by
    token (disjoint vocabulary slices, so each block's combine is the
    GLOBAL count for its tokens) → per-block top-10 → driver merges
    10 × n_blocks rows. The vocabulary never lands on the driver —
    the at-scale wordcount shape. Deterministic (count desc, token asc)
    tie-break."""
    from kryptone_ray.pipelines.common import hash_shuffle

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        toks = df["text"].str.lower().str.split(" ").explode()
        vc = toks.value_counts()
        return pd.DataFrame({"token": vc.index, "n": vc.to_numpy()})

    def combine_topk(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby("token", sort=False, as_index=False)["n"].sum()
        return g.sort_values(["n", "token"], ascending=[False, True]).head(10)

    from kryptone_ray.pipelines.common import parquet_rows

    if parquet_rows(sf_dir, "documents") < DISTRIBUTED_COMBINE_MIN_ROWS:
        # small corpus: the vocabulary partials are tiny — a driver
        # combine beats paying a shuffle (~1 s fixed locally)
        ds = T(sf_dir, "documents", columns=["text"])
        parts = ds.map_batches(partial, batch_format="pandas",
                               batch_size=8192).to_pandas()
        cand = combine_topk(parts)
    else:
        with hash_shuffle():
            ds = T(sf_dir, "documents", columns=["text"])
            cand = ds.map_batches(partial, batch_format="pandas",
                                  batch_size=8192) \
                .repartition(num_blocks=8, keys=["token"]) \
                .map_batches(combine_topk, batch_format="pandas",
                             batch_size=None).to_pandas()
    agg = cand.sort_values(["n", "token"], ascending=[False, True]).head(10)
    return agg.reset_index(drop=True)


Q_WORD_FREQ_SQL = """
SELECT tok AS token, count(*) AS n
FROM (SELECT unnest(string_split(lower(text), ' ')) AS tok FROM documents)
GROUP BY tok ORDER BY n DESC, token LIMIT 10
"""


def q_tfidf_top_terms(sf_dir: str) -> pd.DataFrame:
    """Corpus-level TF-IDF ranking — the two-pass distributed shape of
    ``TFIDFProcessor`` (seo.py:56-121): pass 1 computes per-token total
    term count and document frequency as partial aggregates; pass 2
    applies ``idf = ln(N / (1 + df))`` (the reference's exact formula,
    seo.py:96-99) once per token. Deviation from the reference is
    documented: the reference scores per-document tf = count/len; the
    corpus-level ranking uses total counts so the score is a single
    deterministic float op, reproducible bit-for-bit in SQL."""
    from kryptone_ray.pipelines.common import hash_shuffle, parquet_rows

    n_docs = parquet_rows(sf_dir, "documents")

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        toks = df["text"].str.lower().str.split(" ")
        total = toks.explode().value_counts()
        docfreq = toks.map(set).explode().value_counts()
        out = pd.DataFrame({"token": total.index, "tc": total.to_numpy()})
        d = pd.DataFrame({"token": docfreq.index, "df": docfreq.to_numpy()})
        return out.merge(d, on="token", how="outer").fillna(0)

    # hash-repartition by token: each block holds the COMPLETE partials
    # of its vocabulary slice, so the per-block combine + idf + local
    # top-15 is exact; the driver merges 15 × n_blocks rows instead of
    # the whole vocabulary (at-scale TF-IDF shape).
    def combine_topk(df: pd.DataFrame) -> pd.DataFrame:
        agg = df.groupby("token", sort=False)[["tc", "df"]].sum().reset_index()
        agg["tfidf"] = (agg["tc"] * np.log(n_docs / (1.0 + agg["df"]))).round(6)
        agg["tc"] = agg["tc"].astype("int64")
        agg["df"] = agg["df"].astype("int64")
        return agg.sort_values(["tfidf", "token"],
                               ascending=[False, True]).head(15)

    if n_docs < DISTRIBUTED_COMBINE_MIN_ROWS:
        # small corpus: driver combine beats the shuffle's fixed cost
        ds = T(sf_dir, "documents", columns=["text"])
        parts = ds.map_batches(partial, batch_format="pandas",
                               batch_size=8192).to_pandas()
        cand = combine_topk(parts)
    else:
        with hash_shuffle():
            ds = T(sf_dir, "documents", columns=["text"])
            cand = ds.map_batches(partial, batch_format="pandas",
                                  batch_size=8192) \
                .repartition(num_blocks=8, keys=["token"]) \
                .map_batches(combine_topk, batch_format="pandas",
                             batch_size=None).to_pandas()
    agg = cand.sort_values(["tfidf", "token"], ascending=[False, True]).head(15)
    return agg[["token", "tc", "df", "tfidf"]].reset_index(drop=True)


Q_TFIDF_SQL = """
WITH toks AS (
  SELECT doc_id, unnest(string_split(lower(text), ' ')) AS token
  FROM documents
), stats AS (
  SELECT token, count(*) AS tc, count(DISTINCT doc_id) AS df FROM toks GROUP BY token
)
SELECT token, tc, df,
       round(tc * ln((SELECT count(*) FROM documents) / (1.0 + df)), 6) AS tfidf
FROM stats ORDER BY tfidf DESC, token LIMIT 15
"""


def q_doc_quality(sf_dir: str) -> pd.DataFrame:
    """Quality-score features per language: avg chars, avg whitespace
    tokens, share of 'long' documents — length/stopword-style scoring
    vectorized per batch, aggregated with partials."""
    ds = T(sf_dir, "documents", columns=["lang", "text", "n_chars"])

    def f(df: pd.DataFrame) -> pd.DataFrame:
        df["n_tokens"] = df["text"].str.lower().str.split(" ").map(len)
        df["is_long"] = (df["n_chars"] > 300).astype("int64")
        return df[["lang", "n_chars", "n_tokens", "is_long"]]

    ds = ds.map_batches(f, batch_format="pandas", batch_size=8192)
    out = partial_sum_count(
        ds, keys=["lang"],
        sums={"sum_chars": "n_chars", "sum_tokens": "n_tokens", "n_long": "is_long"},
        count_name="n_docs",
    )
    out["avg_chars"] = (out["sum_chars"] / out["n_docs"]).round(4)
    out["avg_tokens"] = (out["sum_tokens"] / out["n_docs"]).round(4)
    out = out[["lang", "n_docs", "n_long", "avg_chars", "avg_tokens"]]
    return out.sort_values("lang").reset_index(drop=True)


Q_DOC_QUALITY_SQL = """
SELECT lang, count(*) AS n_docs,
       CAST(sum(CASE WHEN n_chars > 300 THEN 1 ELSE 0 END) AS BIGINT) AS n_long,
       round(sum(n_chars) / count(*), 4) AS avg_chars,
       round(sum(len(string_split(lower(text), ' '))) / count(*), 4) AS avg_tokens
FROM documents GROUP BY lang ORDER BY lang
"""


def q_lang_id_heuristic(sf_dir: str) -> pd.DataFrame:
    """Function-word language-ID heuristic vs the labeled ``lang`` column:
    confusion counts (predicted × labeled). The predictor
    (text/ops.py lang_id) is deterministic; its SQL oracle
    (``lang_id_oracle_sql``) is GENERATED from the same marker table —
    non-overlapping occurrence counts via length(replace(...)) mirror
    ``str.count`` exactly, and the CASE branch order mirrors the
    strictly-greater update loop (earliest marker language wins ties)."""
    ds = T(sf_dir, "documents", columns=["lang", "text"])

    def f(df: pd.DataFrame) -> pd.DataFrame:
        df["predicted"] = df["text"].map(ops.lang_id)
        return df[["lang", "predicted"]]

    ds = ds.map_batches(f, batch_format="pandas", batch_size=8192)
    out = partial_sum_count(ds, keys=["lang", "predicted"], sums={}, count_name="n")
    return out.sort_values(["lang", "predicted"]).reset_index(drop=True)


def lang_id_oracle_sql() -> str:
    """DuckDB mirror of ``ops.lang_id``, generated from the same
    ``_LANG_MARKERS`` table so predictor and oracle cannot drift.
    ``str.count`` is non-overlapping left-to-right, exactly what
    (length(p) - length(replace(p, m, ''))) / len(m) computes. The
    Python loop updates only on STRICTLY greater hit counts, so the
    first marker language in insertion order wins ties — mirrored by
    the CASE branch order with >= comparisons."""
    langs = list(ops._LANG_MARKERS)

    def hits(lang: str) -> str:
        terms = [
            f"(length(p) - length(replace(p, '{m}', ''))) / {len(m)}"
            for m in ops._LANG_MARKERS[lang]
        ]
        return " + ".join(terms)

    hit_cols = ", ".join(f"{hits(l)} AS h_{l}" for l in langs)
    branches = []
    for i, l in enumerate(langs):
        conds = [f"h_{l} > 0"] + [f"h_{l} >= h_{r}" for r in langs[i + 1:]]
        branches.append(f"WHEN {' AND '.join(conds)} THEN '{l}'")
    case = "CASE " + " ".join(branches) + " ELSE 'und' END"
    return f"""
WITH padded AS (
  SELECT lang, ' ' || lower(text) || ' ' AS p FROM documents
), h AS (
  SELECT lang, {hit_cols} FROM padded
), pred AS (
  SELECT lang, {case} AS predicted FROM h
)
SELECT lang, predicted, count(*) AS n
FROM pred GROUP BY lang, predicted ORDER BY lang, predicted
"""


def q_doc_fingerprints(sf_dir: str) -> pd.DataFrame:
    """Rolling-hash document fingerprints (text/ops.py) — count of
    distinct fingerprints per source. Rows-only (custom hash not in SQL)."""
    ds = T(sf_dir, "documents", columns=["source", "text"])

    def f(df: pd.DataFrame) -> pd.DataFrame:
        df["fp"] = df["text"].map(lambda t: ops.rolling_fingerprint(t))
        return df[["source", "fp"]]

    # partial-distinct shape instead of groupby().map_groups: each batch
    # emits its distinct (source, fp) pairs, the driver combine is one
    # dedupe + nunique over pairs (bounded by distinct fingerprints, not
    # rows; at 10^10 docs hash-repartition the pairs by fp first). Ray's
    # sort-based groupby cost ~1 s fixed for 5 one-task groups here.
    parts = ds.map_batches(f, batch_format="pandas", batch_size=4096)
    pairs = parts.map_batches(lambda df: df.drop_duplicates(),
                              batch_format="pandas",
                              batch_size=None).to_pandas().drop_duplicates()
    g = pairs.groupby("source", sort=True)["fp"].nunique()
    out = pd.DataFrame({"source": g.index, "n_distinct_fp": g.to_numpy()})
    return out.reset_index(drop=True)


# BPE-ish pre-tokenizer (GPT-2 shape: contraction suffixes, space-glued
# letter runs, digit runs, punctuation runs — expressible identically in
# Python re and DuckDB's RE2, so the count gets a full SQL oracle).
# Explicit Latin-1 letter range instead of \p{L}: Python re has no \p.
BPE_PATTERN = r"'s|'t|'re|'ve|'m|'ll|'d| ?[A-Za-zÀ-ÿ]+| ?[0-9]+| ?[^A-Za-zÀ-ÿ0-9\s']+|\s+"


def q_token_counts_bpe(sf_dir: str) -> pd.DataFrame:
    """Token counting with a BPE-ish regex pre-tokenizer (task brief:
    "token counting (whitespace + a BPE-ish regex)"; the whitespace
    variant is ``q_token_counts``): per-source total pre-token count +
    docs. Vectorized ``Series.str.count`` (one compiled-regex pass per
    batch; count of non-overlapping matches == len(findall)); the
    oracle mirrors it with RE2 ``regexp_extract_all`` over the same
    pattern."""
    ds = T(sf_dir, "documents", columns=["source", "text"])

    def f(df: pd.DataFrame) -> pd.DataFrame:
        df["n_bpe"] = df["text"].str.count(BPE_PATTERN).astype("int64")
        return df[["source", "n_bpe"]]

    ds = ds.map_batches(f, batch_format="pandas", batch_size=8192)
    out = partial_sum_count(ds, keys=["source"],
                            sums={"total_bpe_tokens": "n_bpe"},
                            count_name="n_docs")
    return out.sort_values("source").reset_index(drop=True)


def token_counts_bpe_oracle_sql() -> str:
    pat = BPE_PATTERN.replace("'", "''")
    return f"""
SELECT source,
       CAST(sum(len(regexp_extract_all(text, '{pat}'))) AS BIGINT)
         AS total_bpe_tokens,
       count(*) AS n_docs
FROM documents GROUP BY source ORDER BY source
"""


def q_stratified_sample(sf_dir: str, rate: float = 0.25) -> pd.DataFrame:
    """Deterministic stratified downsampling — the training-data op a
    100-TB pipeline runs constantly: keep a fixed fraction per language
    stratum, selected by an INTEGER multiplicative hash of the doc id
    (Knuth 2654435761 mod 2^32) so the sample is reproducible across
    runs, engines and partitionings (no RNG state, no shuffle; the same
    arithmetic is the SQL oracle). Per-batch filter + partial counts;
    returns per-lang kept/total."""
    ds = T(sf_dir, "documents", columns=["doc_id", "lang"])
    cut = np.int64(int(rate * (1 << 32)))

    def f(df: pd.DataFrame) -> pd.DataFrame:
        h = (df["doc_id"].to_numpy().astype(np.int64)
             * np.int64(2654435761)) % np.int64(1 << 32)
        df["kept"] = (h < cut).astype("int64")
        return df[["lang", "kept"]]

    out = partial_sum_count(
        ds.map_batches(f, batch_format="pandas", batch_size=65536),
        keys=["lang"], sums={"n_kept": "kept"}, count_name="n_total")
    out["n_kept"] = out["n_kept"].astype("int64")
    return out.sort_values("lang").reset_index(drop=True)


Q_STRATIFIED_SAMPLE_SQL = """
SELECT lang,
       CAST(sum(CASE WHEN (doc_id * 2654435761) % 4294967296
                          < CAST(0.25 * 4294967296 AS BIGINT)
                THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
       count(*) AS n_total
FROM documents GROUP BY lang ORDER BY lang
"""


def q_repetition_stats(sf_dir: str) -> pd.DataFrame:
    """Gopher-style repetition quality metrics per language: the
    corpus-weighted fraction of tokens occupied by each doc's single
    most-frequent token (high → boilerplate / keyword stuffing) and the
    distinct-token fraction (low → repetitive). Per-batch explode →
    per-doc grouped counts → INTEGER partial sums per lang, one float
    division at the end — integer sums are order-independent so the
    oracle value-hash is bit-exact (no rounding races). Tokenizer is
    the oracle convention (plain lower().split(' '))."""
    ds = T(sf_dir, "documents", columns=["lang", "text"])

    def f(df: pd.DataFrame) -> pd.DataFrame:
        toks = df["text"].str.lower().str.split(" ")
        ex = toks.explode()
        cnt = (pd.DataFrame({"row": ex.index, "lang": df["lang"].reindex(ex.index).to_numpy(),
                             "token": ex.to_numpy()})
               .groupby(["row", "token"], sort=False)
               .agg(lang=("lang", "first"), c=("token", "size")).reset_index())
        per_doc = cnt.groupby("row", sort=False).agg(
            lang=("lang", "first"), top_c=("c", "max"),
            n_distinct=("c", "size"), n_tokens=("c", "sum"))
        return per_doc.reset_index(drop=True)[
            ["lang", "top_c", "n_distinct", "n_tokens"]]

    ds = ds.map_batches(f, batch_format="pandas", batch_size=8192)
    out = partial_sum_count(
        ds, keys=["lang"],
        sums={"sum_top": "top_c", "sum_distinct": "n_distinct",
              "sum_tokens": "n_tokens"},
        count_name="n_docs")
    out["top_token_frac"] = (out["sum_top"] / out["sum_tokens"]).round(6)
    out["distinct_frac"] = (out["sum_distinct"] / out["sum_tokens"]).round(6)
    out = out[["lang", "n_docs", "top_token_frac", "distinct_frac"]]
    return out.sort_values("lang").reset_index(drop=True)


Q_REPETITION_STATS_SQL = """
WITH toks AS (
  SELECT doc_id, lang, unnest(string_split(lower(text), ' ')) AS tok
  FROM documents
), cnt AS (
  SELECT doc_id, lang, tok, count(*) AS c FROM toks GROUP BY 1, 2, 3
), per_doc AS (
  SELECT doc_id, lang, max(c) AS top_c, count(*) AS n_distinct,
         sum(c) AS n_tokens
  FROM cnt GROUP BY 1, 2
)
SELECT lang, count(*) AS n_docs,
       round(CAST(sum(top_c) AS DOUBLE) / sum(n_tokens), 6) AS top_token_frac,
       round(CAST(sum(n_distinct) AS DOUBLE) / sum(n_tokens), 6) AS distinct_frac
FROM per_doc GROUP BY lang ORDER BY lang
"""


def q_docs_jsonl_roundtrip(sf_dir: str) -> pd.DataFrame:
    """JSONL source/sink roundtrip (the reference's FileStorage persists
    JSON — conf/base.py FileStorage / backup files base.py:543-609; at
    scale the interchange format a crawl exports for downstream
    training-data jobs): stream documents → ``write_json`` NDJSON
    shards (one file per block — resumable layout, never one giant
    file) → ``read_json`` back → per-lang aggregate. The oracle runs
    the same aggregate over the source parquet, so the value-hash proves the
    JSON encode/decode round-trips every row and value exactly."""
    import hashlib
    import pathlib
    import shutil

    import ray.data as rd

    tag = hashlib.sha1(sf_dir.encode()).hexdigest()[:10]
    out = pathlib.Path(f"/tmp/kr_docs_jsonl_{tag}")
    shutil.rmtree(out, ignore_errors=True)
    T(sf_dir, "documents", columns=["doc_id", "lang", "n_chars"]) \
        .write_json(str(out))
    back = rd.read_json(str(out))
    agg = partial_sum_count(back, keys=["lang"],
                            sums={"sum_ids": "doc_id",
                                  "total_chars": "n_chars"},
                            count_name="n_docs")
    return agg.sort_values("lang").reset_index(drop=True)


Q_DOCS_JSONL_SQL = """
SELECT lang, CAST(sum(doc_id) AS BIGINT) AS sum_ids,
       CAST(sum(n_chars) AS BIGINT) AS total_chars, count(*) AS n_docs
FROM documents GROUP BY lang ORDER BY lang
"""


def q_training_shard_export(sf_dir: str, n_shards: int = 8) -> pd.DataFrame:
    """TRAINING-SET SHARD EXPORT — the canonical last stage of a
    training-data pipeline: a REPRODUCIBLE global shuffle of the corpus
    into ``n_shards`` shard directories. "Shuffle" is hash-order (the
    Knuth multiplicative hash of doc_id — same arithmetic as
    ``q_stratified_sample``): shard = h % n_shards, within-shard order
    = ascending h. Unlike ``Dataset.random_shuffle`` this is
    deterministic across runs, engines and partitionings (no RNG
    state), SQL-mirrorable, and restartable — the shards are written
    through ``stages/sinks.write_partitioned_resumable`` (_SUCCESS-
    sealed dirs, re-runs skip finished shards). The returned aggregate
    is computed by READING THE SHARDS BACK, so the oracle match proves
    the written files: every doc landed in exactly its hash shard with
    nothing lost or duplicated. (Hash domain: doc_id × 2654435761 must
    fit int64, i.e. doc_id < ~3.4e9 — shard by a 64-bit splitmix of a
    wider id beyond that.)"""
    import hashlib
    import pathlib
    import shutil

    import ray.data as rd

    from kryptone_ray.stages.sinks import write_partitioned_resumable

    KN = np.int64(2654435761)

    def build():
        ds = T(sf_dir, "documents", columns=["doc_id"])

        def f(df: pd.DataFrame) -> pd.DataFrame:
            h = (df["doc_id"].to_numpy().astype(np.int64) * KN) \
                % np.int64(1 << 32)
            return pd.DataFrame({"h": h, "doc_id": df["doc_id"],
                                 "shard": (h % n_shards).astype(np.int64)})

        return ds.map_batches(f, batch_format="pandas", batch_size=65536)

    tag = hashlib.sha1(sf_dir.encode()).hexdigest()[:10]
    out = pathlib.Path(f"/tmp/kr_train_shards_{tag}")
    shutil.rmtree(out, ignore_errors=True)
    write_partitioned_resumable(build, out, "shard")

    back = rd.read_parquet(str(out))
    agg = partial_sum_count(back, keys=["shard"],
                            sums={"sum_hash": "h", "sum_ids": "doc_id"},
                            count_name="n_rows")
    agg["shard"] = agg["shard"].astype("int64")
    return agg.sort_values("shard").reset_index(drop=True)


Q_TRAINING_SHARD_SQL = """
WITH x AS (
  SELECT doc_id, (doc_id * 2654435761) % 4294967296 AS h FROM documents
)
SELECT CAST(h % 8 AS BIGINT) AS shard,
       CAST(sum(h) AS BIGINT) AS sum_hash,
       CAST(sum(doc_id) AS BIGINT) AS sum_ids,
       count(*) AS n_rows
FROM x GROUP BY shard ORDER BY shard
"""


def q_docs_hash_sample(sf_dir: str, k: int = 64) -> pd.DataFrame:
    """ORDER-STATISTICS uniform sample: the k documents with the
    smallest md5(doc_id) — a deterministic, coordination-free k-sample
    (every engine that agrees on the hash agrees on the sample, no
    global count or rate needed, unlike the rate-based
    q_stratified_sample). Per-batch partial top-k means at most
    k × #batches tiny rows leave the scan; the driver merge is the
    same top-k again (associative)."""
    import hashlib

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        dg = [hashlib.md5(str(i).encode()).hexdigest()
              for i in df["doc_id"]]
        out = pd.DataFrame({"doc_id": df["doc_id"], "digest": dg})
        return out.sort_values("digest").head(k)

    parts = T(sf_dir, "documents", columns=["doc_id"]) \
        .map_batches(partial, batch_format="pandas", batch_size=65536) \
        .to_pandas()
    out = parts.sort_values("digest").head(k)
    return out.reset_index(drop=True)


Q_DOCS_HASH_SAMPLE_SQL = """
SELECT doc_id, md5(CAST(doc_id AS VARCHAR)) AS digest
FROM documents ORDER BY digest LIMIT 64
"""


# shingle width shared by the pipeline default AND its SQL oracle
# (interpolated below, the ZORDER_SHARD_BITS pattern) so calling with a
# different k can't silently diverge from the oracle.
SHINGLE_K = 8


def q_shingle_dedup_census(sf_dir: str, k: int = SHINGLE_K) -> pd.DataFrame:
    """EXACT SUBSTRING-DEDUP CENSUS at k-gram granularity (the
    Lee-et-al "Deduplicating Training Data Makes Language Models
    Better" exact-substring idea, expressed at word-shingle
    resolution): every k-word shingle of every document is counted
    across the corpus, and the output is the multiplicity histogram
    (how many shingles occur once, twice, ...) — the metric that tells
    a pretraining pipeline how much boilerplate it is feeding.

    Shingle STRINGS never shuffle: each batch hashes its shingles to a
    128-bit key (two independent-seed vectorized XXH64 lanes —
    birthday-safe at 10^10+ shingles where a single 64-bit key would
    collide) and collapses to per-batch ``(h1, h2, n)`` partials.
    Below the gate the partials combine on the driver; above it they
    hash-partition by ``h1`` and each block emits its multiplicity
    histogram partial — driver state is the histogram, never the
    shingle table."""
    from kryptone_ray.utils.xxh64 import xxh64_batch

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        shingles: list[str] = []
        for text in df["text"]:
            ws = text.split(" ")
            shingles.extend(
                " ".join(ws[i:i + k]) for i in range(len(ws) - k + 1))
        if not shingles:
            return pd.DataFrame({"h1": np.empty(0, np.int64),
                                 "h2": np.empty(0, np.int64),
                                 "n": np.empty(0, np.int64)})
        h1 = xxh64_batch(shingles).astype("int64")
        h2 = xxh64_batch(shingles, seed=0x9E3779B97F4A7C15).astype("int64")
        g = pd.DataFrame({"h1": h1, "h2": h2}).groupby(
            ["h1", "h2"], sort=False)
        return g.size().rename("n").reset_index()

    def build():
        return T(sf_dir, "documents", columns=["text"],
                 rows_per_block=8192) \
            .map_batches(partial, batch_format="pandas", batch_size=8192)

    from kryptone_ray.pipelines.common import parquet_rows

    n_docs = parquet_rows(sf_dir, "documents")
    if n_docs < DISTRIBUTED_COMBINE_MIN_ROWS:
        parts = build().to_pandas()
        counts = parts.groupby(["h1", "h2"], sort=False)["n"].sum()
        hist = counts.value_counts().sort_index()
    else:
        from kryptone_ray.pipelines.common import (hash_shuffle,
                                                   join_partitions)

        def block_hist(df: pd.DataFrame) -> pd.DataFrame:
            c = df.groupby(["h1", "h2"], sort=False)["n"].sum()
            h = c.value_counts()
            return pd.DataFrame({"multiplicity": h.index.astype("int64"),
                                 "n_shingles": h.to_numpy().astype("int64")})

        with hash_shuffle():
            hp = build().repartition(
                num_blocks=join_partitions(n_docs, rows_per_partition=50_000),
                keys=["h1"]) \
                .map_batches(block_hist, batch_format="pandas",
                             batch_size=None).to_pandas()
        hist = hp.groupby("multiplicity", sort=True)["n_shingles"].sum()
    return pd.DataFrame({"multiplicity": hist.index.astype("int64"),
                         "n_shingles": hist.to_numpy().astype("int64")})


Q_SHINGLE_DEDUP_SQL = f"""
WITH sh AS (
  SELECT array_to_string(ws[i:i+{SHINGLE_K - 1}], ' ') AS shingle
  FROM (SELECT string_split(text, ' ') AS ws FROM documents),
       UNNEST(generate_series(1, len(ws) - {SHINGLE_K - 1})) AS t(i)
),
cnt AS (SELECT shingle, count(*) AS c FROM sh GROUP BY shingle)
SELECT c AS multiplicity, count(*) AS n_shingles
FROM cnt GROUP BY c ORDER BY c
"""


def q_docs_id_encode(sf_dir: str) -> pd.DataFrame:
    """TOKENIZER FIT + TRANSFORM — the canonical pretraining encode
    stage (the reference's ``TextMixin.fit_transform`` vocabulary
    machinery, text/ops.py, taken to its training-data conclusion):
    pass 1 fits a deterministic vocabulary over the corpus (id = rank
    by count desc, token asc); pass 2 encodes every document to token
    ids. The returned per-doc summary (n_tokens, sum/min/max of ids)
    proves the id assignment end to end without hauling the id
    sequences to the driver.

    Scale: pass 1 is the wordcount shape (per-batch partials; the
    vocabulary combine rides the word_frequency gate); the fitted
    vocab broadcasts ONCE via ray.put and every encode batch reads it
    from the object store — the broadcast contract is vocabulary size
    (bounded by a min-count cut in a real pipeline), never corpus
    size. Encoding is a vectorized pandas map over exploded tokens."""
    import ray

    from kryptone_ray.pipelines.common import parquet_rows

    def counts_partial(df: pd.DataFrame) -> pd.DataFrame:
        toks = df["text"].str.lower().str.split(" ").explode()
        vc = toks.value_counts()
        return pd.DataFrame({"token": vc.index, "n": vc.to_numpy()})

    ds = T(sf_dir, "documents", columns=["doc_id", "text"],
           rows_per_block=8192)
    parts = ds.map_batches(
        lambda df: counts_partial(df[["text"]]),
        batch_format="pandas", batch_size=8192)

    if parquet_rows(sf_dir, "documents") < DISTRIBUTED_COMBINE_MIN_ROWS:
        counts = parts.to_pandas().groupby(
            "token", sort=False, as_index=False)["n"].sum()
    else:
        from kryptone_ray.pipelines.common import hash_shuffle

        def block_sum(df: pd.DataFrame) -> pd.DataFrame:
            return df.groupby("token", sort=False, as_index=False)["n"].sum()

        with hash_shuffle():
            counts = T(sf_dir, "documents", columns=["text"],
                       rows_per_block=8192) \
                .map_batches(counts_partial, batch_format="pandas",
                             batch_size=8192) \
                .repartition(num_blocks=16, keys=["token"]) \
                .map_batches(block_sum, batch_format="pandas",
                             batch_size=None).to_pandas()

    counts = counts.sort_values(["n", "token"],
                                ascending=[False, True]).reset_index(drop=True)
    vocab = dict(zip(counts["token"], range(len(counts))))
    vocab_ref = ray.put(vocab)

    def encode(df: pd.DataFrame) -> pd.DataFrame:
        v = ray.get(vocab_ref)
        toks = df.set_index("doc_id")["text"].str.lower() \
            .str.split(" ").explode()
        ids = toks.map(v).astype("int64")
        g = ids.groupby(level=0)
        return pd.DataFrame({"n_tokens": g.size().astype("int64"),
                             "sum_ids": g.sum(), "min_id": g.min(),
                             "max_id": g.max()}).reset_index()

    out = ds.map_batches(encode, batch_format="pandas",
                         batch_size=8192).to_pandas()
    return out.sort_values("doc_id").reset_index(drop=True)


Q_DOCS_ID_ENCODE_SQL = """
WITH w AS (SELECT doc_id, unnest(string_split(lower(text), ' ')) AS token
           FROM documents),
v AS (SELECT token,
             row_number() OVER (ORDER BY count(*) DESC, token) - 1 AS id
      FROM w GROUP BY token)
SELECT doc_id, count(*) AS n_tokens, CAST(sum(id) AS BIGINT) AS sum_ids,
       CAST(min(id) AS BIGINT) AS min_id, CAST(max(id) AS BIGINT) AS max_id
FROM w JOIN v USING (token)
GROUP BY doc_id ORDER BY doc_id
"""
