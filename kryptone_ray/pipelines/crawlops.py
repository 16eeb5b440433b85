"""Crawl-side operator pipelines exposed to the driver harness —
rows-only entries (no SQL oracle: they run over the engine's own
deterministic corpus, not the sf tables), each exercising a reference
operator family end-to-end:

- the full crawl engine (visit log of a pinned mini-crawl);
- the URL validation pipeline over generated out-links (verdict census);
- URL predicate classification (urls.py predicate suite);
- caption text ops (price parsing, email extraction — utils/text.py,
  contrib/seo.py over the corpus captions);
- the frontier-maintenance commands (reorder / filter_cache /
  extract_urls — management/commands/*.py).
"""

from __future__ import annotations

import tempfile

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data as rd

from kryptone_ray.corpus.synth import CorpusSpec, seed_urls
from kryptone_ray.stages.validate import (
    UrlIgnoreTest,
    ValidationConfig,
    validate_batch,
)
from kryptone_ray.text import ops
from kryptone_ray.utils import urlkit

_SPEC = CorpusSpec(n_rows=600, n_hosts=8, seed=77)


def _corpus_urls() -> list[str]:
    return [_SPEC.url_of(i) for i in range(_SPEC.n_rows)]


def q_crawl_visits(sf_dir: str) -> pd.DataFrame:
    """Deterministic mini-crawl through the full engine (local mode —
    exact parity semantics); returns the visit log (visit_idx, url,
    status, fmt). Pinned corpus; sf_dir unused."""
    from kryptone_ray.corpus.store import write_corpus
    from kryptone_ray.corpus.synth import make_corpus_table
    from kryptone_ray.engine.crawl import RayCrawler
    from kryptone_ray.sim.golden import CrawlSpec
    from kryptone_ray.corpus.synth import page_outlinks

    tmp = tempfile.mkdtemp(prefix="kr_q_crawl_")
    write_corpus(make_corpus_table(_SPEC), f"{tmp}/corpus", num_shards=4)
    cs = CrawlSpec(batch_size=16, wait_time=25.0, allowed_hosts=("*",), max_pages=200)
    eng = RayCrawler(f"{tmp}/corpus", page_outlinks(_SPEC), cs, f"{tmp}/run",
                     mode="local")
    eng.run(seeds=seed_urls(_SPEC, 8))
    vt = eng.visits_table().to_pandas()
    vt = vt.sort_values("visit_idx").reset_index(drop=True)
    return vt[["visit_idx", "url", "status", "fmt", "depth"]]


def q_link_verdicts(sf_dir: str) -> pd.DataFrame:
    """Validator verdict census over every out-link of the pinned corpus
    (check_urls branch distribution, base.py:652-760). Distributed:
    pages → outlinks → validate per batch → verdict counts."""
    spec = _SPEC

    def expand_validate(t: pa.Table) -> pa.Table:
        links: list[str] = []
        for i in t["id"].to_pylist():
            links.extend(spec.outlinks(int(i)))
        cfg = ValidationConfig(start_url=spec.url_of(0), allowed_hosts=("*",))
        vt = validate_batch(links, cfg, iteration_count=1)
        return vt.select(["verdict"])

    ds = rd.range(spec.n_rows).map_batches(expand_validate, batch_format="pyarrow",
                                           batch_size=128)
    df = ds.to_pandas()
    out = df.groupby("verdict").size().reset_index(name="n")
    return out.sort_values("verdict").reset_index(drop=True)


_PREDICATES = ("is_valid", "is_empty", "is_path", "has_fragment",
               "has_query", "is_image", "is_file", "is_secured",
               "is_social_link")


def _predicate_input_urls() -> list[str]:
    """Pinned predicate-suite input: corpus URLs + fragment/query noise
    variants + degenerate strings. Query variants only on path-carrying
    URLs (a query on a bare host makes pathlib-suffix semantics diverge
    from any reasonable SQL mirror — out of the reference's profile)."""
    base = _corpus_urls()
    return (base
            + [u + "#frag" for u in base[:50]]
            + [u + "?page=2" for u in base[:40]]
            + [u + "?q=x#sec" for u in base[40:70]]
            + ["", "/rel", "https://social.test/x facebook.com",
               "http://twitter.com/a", "https://h0.corpus.test/file.pdf",
               "https://h0.corpus.test/a.", "https://h0.corpus.test/.png"])


def _url_snapshot_dir() -> str:
    """Pinned url-list snapshot as parquet — DuckDB reads the same rows
    the Ray pipeline reads, so the predicate census gets a full
    value-hash oracle."""
    import pathlib

    import pyarrow.parquet as pq

    base = pathlib.Path(tempfile.gettempdir()) / \
        f"kr_urlpred_{_SPEC.seed}_{_SPEC.n_rows}"
    marker = base / "_SUCCESS"
    if not marker.exists():
        base.mkdir(parents=True, exist_ok=True)
        pq.write_table(
            pa.table({"url": pa.array(_predicate_input_urls(),
                                      type=pa.string())}),
            base / "urls.parquet",
        )
        marker.touch()
    return str(base)


def q_url_predicates(sf_dir: str) -> pd.DataFrame:
    """URL predicate suite (urls.py:157-246 as batch masks): counts per
    predicate over the pinned snapshot. Distributed: per-batch predicate
    partial counts inside ``map_batches``, tiny driver combine. The
    DuckDB oracle (``url_predicates_oracle_sql``) re-derives every
    predicate from the RAW url strings with independent SQL string ops
    — cross-checking urlkit's vectorized urlparse against a second
    implementation."""
    snap = _url_snapshot_dir()

    def census(df: pd.DataFrame) -> pd.DataFrame:
        f = urlkit.parse_batch(df["url"].tolist())
        return pd.DataFrame(
            {"predicate": list(_PREDICATES),
             "n": [int(getattr(f, p)().sum()) for p in _PREDICATES]}
        )

    parts = rd.read_parquet(snap).map_batches(
        census, batch_format="pandas", batch_size=256).to_pandas()
    out = parts.groupby("predicate", sort=False, as_index=False)["n"].sum()
    return out.sort_values("predicate").reset_index(drop=True)


def url_predicates_oracle_sql() -> str:
    """SQL mirror of the predicate suite, generated from the same
    suffix/marker sets as urlkit (cannot drift) but re-deriving the
    urlparse fields from the raw strings with DuckDB string ops:
    fragment = after first '#'; query = nonempty after first '?' of the
    pre-fragment part; suffix = pathlib rule (text from the last '.' of
    the final '/'-segment iff that dot is neither first nor last — the
    '.(\\.[^.]+)$' regex enforces both bounds) over the path when a
    query is present, else over the whole raw url."""
    snap = _url_snapshot_dir()

    def in_list(vals) -> str:
        return ", ".join("'" + v.replace("'", "''") + "'" for v in sorted(vals))

    social = " OR ".join(f"url LIKE '%{m}%'" for m in urlkit.SOCIAL_HOST_MARKERS)
    # suffix source: urlkit.as_path_suffix — path (pre-'?') when a query
    # exists, else the whole raw url (fragment INCLUDED, as the
    # reference's as_path does)
    sfx = r"""
      CASE WHEN url = '' THEN ''
           WHEN regexp_matches(split_part(url, '#', 1), '\?.')
           THEN regexp_extract(regexp_extract(rtrim(split_part(split_part(url, '#', 1), '?', 1), '/'), '[^/]*$'), '.(\.[^.]+)$', 1)
           ELSE regexp_extract(regexp_extract(rtrim(url, '/'), '[^/]*$'), '.(\.[^.]+)$', 1)
      END"""
    preds = {
        "is_valid": "url LIKE 'http://%' OR url LIKE 'https://%'",
        "is_empty": "url = ''",
        "is_path": "url LIKE '/%'",
        "has_fragment": "url LIKE '%#%' AND url <> ''",
        "has_query": r"regexp_matches(split_part(url, '#', 1), '\?.') AND url <> ''",
        "is_image": f"sfx IN ({in_list(urlkit.IMAGE_SUFFIXES)}) AND url <> ''",
        "is_file": f"sfx IN ({in_list(urlkit.FILE_SUFFIXES)}) AND url <> ''",
        "is_secured": "url LIKE 'https:%' AND url <> ''",
        "is_social_link": f"({social}) AND url <> ''",
    }
    selects = " UNION ALL ".join(
        f"SELECT '{name}' AS predicate, "
        f"CAST(sum(CASE WHEN {expr} THEN 1 ELSE 0 END) AS BIGINT) AS n FROM f"
        for name, expr in preds.items()
    )
    return f"""
WITH f AS (
  SELECT url, {sfx} AS sfx
  FROM read_parquet('{snap}/urls.parquet')
)
SELECT predicate, n FROM ({selects}) ORDER BY predicate
"""


def _caption_snapshot_dir() -> str:
    """Pinned (fmt, caption) snapshot as parquet — gives DuckDB access
    to the same caption rows the Ray pipelines read, so the caption
    queries get full value-hash oracles."""
    import pathlib

    import pyarrow.parquet as pq

    base = pathlib.Path(tempfile.gettempdir()) / \
        f"kr_captions_{_SPEC.seed}_{_SPEC.n_rows}_v2"
    marker = base / "_SUCCESS"
    if not marker.exists():
        base.mkdir(parents=True, exist_ok=True)
        pq.write_table(
            pa.table({
                "id": pa.array(range(_SPEC.n_rows), type=pa.int64()),
                "url": pa.array([_SPEC.url_of(i) for i in range(_SPEC.n_rows)],
                                type=pa.string()),
                "fmt": pa.array([_SPEC.fmt(i) for i in range(_SPEC.n_rows)],
                                type=pa.string()),
                "caption": pa.array(
                    [_SPEC.caption(i) for i in range(_SPEC.n_rows)],
                    type=pa.string()),
            }),
            base / "captions.parquet",
        )
        marker.touch()
    return str(base)


def q_caption_prices(sf_dir: str) -> pd.DataFrame:
    """Price extraction from corpus captions (parse_price,
    utils/text.py:20-45) — per-format caption price stats, vectorized
    regex over the caption snapshot (PRICE first, euro-form fallback —
    the reference's exact precedence)."""
    snap = _caption_snapshot_dir()

    def f(df: pd.DataFrame) -> pd.DataFrame:
        p1 = df["caption"].str.extract(r"(\d+,?\d+)", expand=False)
        price = pd.to_numeric(p1.str.replace(",", ".", regex=False),
                              errors="coerce")
        # euro fallback (caption-start \d+€\d+) — PRICE takes precedence
        euro = df["caption"].str.extract(r"^(\d+€\d+)", expand=False)
        fallback = pd.to_numeric(euro.str.replace("€", ".", regex=False),
                                 errors="coerce")
        price = price.fillna(fallback)
        out = pd.DataFrame({"fmt": df["fmt"], "price": price})
        return out[out["price"].notna()]

    df = rd.read_parquet(snap).map_batches(
        f, batch_format="pandas", batch_size=256).to_pandas()
    g = df.groupby("fmt")
    out = pd.DataFrame({
        "fmt": list(g.groups),
        "n_prices": g.size().to_numpy(),
        "total": g["price"].sum().round(2).to_numpy(),
    })
    return out.reset_index(drop=True)


def q_caption_emails(sf_dir: str) -> pd.DataFrame:
    """Distinct emails across corpus captions (EmailMixin analog,
    contrib/seo.py:587-643): vectorized findall over the snapshot +
    distinct."""
    snap = _caption_snapshot_dir()

    def f(df: pd.DataFrame) -> pd.DataFrame:
        found = df["caption"].str.findall(ops.EMAIL_REGEX.pattern).explode()
        return pd.DataFrame({"email": found.dropna()})

    df = rd.read_parquet(snap).map_batches(
        f, batch_format="pandas", batch_size=256).to_pandas()
    return pd.DataFrame({"email": sorted(set(df["email"]))})


def q_page_audits(sf_dir: str) -> pd.DataFrame:
    """Per-page SEO audit record — the data-shaped fields of the
    reference's ``audit_page`` (contrib/seo.py:550-584: url,
    page_content_length, is_https, per-page word frequency) assembled
    over the pinned corpus, the page text being the caption (the
    DOM/live-HTTP fields — title/description via driver.execute_script,
    seo.py:338-359; the status probe, seo.py:533-548 — have no corpus
    analog). Per-page top token uses the oracle-checked tokenizer
    convention (plain lower().split(' '); the reference's richer
    fit_transform tokenizer powers the rows-only caption entries), with
    the same (count desc, token asc) tie-break as word_frequency.
    Vectorized: explode tokens per batch, one grouped count + stable
    sort per batch — pages never cross batches, so per-page audits are
    exact without a shuffle."""
    snap = _caption_snapshot_dir()

    def audit(df: pd.DataFrame) -> pd.DataFrame:
        toks = df["caption"].str.lower().str.split(" ")
        ex = toks.explode()
        cnt = (
            pd.DataFrame({"row": ex.index, "token": ex.to_numpy()})
            .groupby(["row", "token"], sort=False).size().reset_index(name="n")
            .sort_values(["row", "n", "token"], ascending=[True, False, True],
                         kind="stable")
        )
        top = cnt.groupby("row", sort=True).first()
        out = pd.DataFrame(
            {"url": df["url"],
             "content_length": df["caption"].str.len().astype("int64"),
             "is_https": df["url"].str.startswith("https").astype("int64"),
             "n_tokens": toks.map(len).astype("int64")}
        )
        out["top_token"] = top["token"].reindex(df.index).to_numpy()
        out["top_token_count"] = top["n"].reindex(df.index).to_numpy().astype("int64")
        return out

    df = rd.read_parquet(snap, columns=["url", "caption"]).map_batches(
        audit, batch_format="pandas", batch_size=256).to_pandas()
    return df.sort_values("url").reset_index(drop=True)


def caption_oracle_sql() -> dict[str, str]:
    """DuckDB oracles over the caption snapshot (materialized here in
    case the driver evaluates SQL before the queries)."""
    snap = _caption_snapshot_dir()
    return {
        "caption_prices": rf"""
SELECT fmt, count(*) AS n_prices,
       round(sum(price), 2) AS total
FROM (
  SELECT fmt,
         CASE WHEN p1 <> ''
              THEN CAST(replace(p1, ',', '.') AS DOUBLE)
              WHEN regexp_matches(caption, '^\d+€\d+')
              THEN CAST(replace(regexp_extract(caption, '^\d+€\d+'),
                                '€', '.') AS DOUBLE)
         END AS price
  FROM (SELECT fmt, caption,
               regexp_extract(caption, '\d+,?\d+') AS p1
        FROM read_parquet('{snap}/captions.parquet'))
)
WHERE price IS NOT NULL
GROUP BY fmt ORDER BY fmt
""",
        "caption_emails": rf"""
SELECT DISTINCT unnest(regexp_extract_all(caption, '\S+@\S+')) AS email
FROM read_parquet('{snap}/captions.parquet')
ORDER BY email
""",
        "page_audits": rf"""
WITH toks AS (
  SELECT url, unnest(string_split(lower(caption), ' ')) AS token
  FROM read_parquet('{snap}/captions.parquet')
), cnt AS (
  SELECT url, token, count(*) AS n FROM toks GROUP BY url, token
), top AS (
  SELECT url, token AS top_token, CAST(n AS BIGINT) AS top_token_count,
         row_number() OVER (PARTITION BY url ORDER BY n DESC, token) AS rn
  FROM cnt
)
SELECT s.url, length(s.caption) AS content_length,
       CAST(s.url LIKE 'https%' AS BIGINT) AS is_https,
       CAST(len(string_split(lower(s.caption), ' ')) AS BIGINT) AS n_tokens,
       t.top_token, t.top_token_count
FROM read_parquet('{snap}/captions.parquet') s
JOIN top t ON t.url = s.url AND t.rn = 1
ORDER BY s.url
""",
    }


def _frontier_snapshot_dir() -> str:
    """Materialize the pinned frontier snapshot ONCE as sharded parquet
    under /tmp (the on-disk shape a frontier-maintenance job reads at
    10^10 URLs: one directory, one file per shard, resumable). The
    command queries below are real ``read_parquet → transform → write``
    pipelines over this directory — never in-memory Python lists."""
    import pathlib

    import pyarrow.parquet as pq

    base = pathlib.Path(tempfile.gettempdir()) / \
        f"kr_frontier_{_SPEC.seed}_{_SPEC.n_rows}"
    marker = base / "_SUCCESS"
    if not marker.exists():
        base.mkdir(parents=True, exist_ok=True)
        urls = _corpus_urls()
        for shard in range(4):
            part = urls[shard::4]
            pq.write_table(
                pa.table({"url": pa.array(part, type=pa.string())}),
                base / f"frontier-{shard:03d}.parquet",
            )
        marker.touch()
    return str(base)


def q_frontier_reorder(sf_dir: str) -> pd.DataFrame:
    """management/commands/reorder.py analog as a frontier pipeline:
    ``read_parquet(frontier) → vectorized regex flag → distributed
    two-key sort → limit`` — matching URLs ranked first (ties by url,
    equivalent to the command's stable partition of the sorted list)."""
    snap = _frontier_snapshot_dir()

    def flag(df: pd.DataFrame) -> pd.DataFrame:
        df["has_match"] = df["url"].str.contains("/img/", regex=False)
        return df

    top = (
        rd.read_parquet(snap)
        .sort("url").limit(200)
        .map_batches(flag, batch_format="pandas", batch_size=8192)
        .sort(["has_match", "url"], descending=[True, False])
        .to_pandas()
    )
    top.insert(0, "rank", np.arange(len(top), dtype=np.int64))
    return top[["rank", "url", "has_match"]]


def q_extract_urls(sf_dir: str) -> pd.DataFrame:
    """management/commands/extract_urls.py analog over the pinned
    snapshot — delegates to the parameterized ``frontier_extract_urls``
    pipeline (mask → write parquet → read back) and returns the urls
    sorted. The output dir is removed after the read-back (the result is
    fully materialized)."""
    import shutil
    import tempfile as _tf

    snap = _frontier_snapshot_dir()
    out_dir = _tf.mkdtemp(prefix="kr_extract_urls_")
    try:
        frontier_extract_urls(snap, ("/item/",), out_dir)
        out = rd.read_parquet(out_dir).to_pandas()
    finally:
        shutil.rmtree(out_dir, ignore_errors=True)
    return out.sort_values("url").reset_index(drop=True)


def q_filter_cache(sf_dir: str) -> pd.DataFrame:
    """management/commands/filter_cache.py analog over the pinned
    snapshot — delegates to the parameterized ``frontier_filter_cache``
    split-and-write pipeline; returns the bucket sizes."""
    import shutil
    import tempfile as _tf

    snap = _frontier_snapshot_dir()
    out_dir = _tf.mkdtemp(prefix="kr_filter_cache_")
    try:
        counts = frontier_filter_cache(snap, "/cat/", out_dir)
    finally:
        shutil.rmtree(out_dir, ignore_errors=True)
    out = pd.DataFrame(sorted(counts.items()), columns=["bucket", "n"])
    return out.reset_index(drop=True)


def q_images_by_extension(sf_dir: str) -> pd.DataFrame:
    """PageImagesIterator.classified_images analog
    (utils/iterators.py:113-195) as a frontier pipeline: stream the
    snapshot, classify by image extension per batch, partial-agg."""
    snap = _frontier_snapshot_dir()

    def classify(df: pd.DataFrame) -> pd.DataFrame:
        f = urlkit.parse_batch(df["url"].tolist())
        ext = [s if s in urlkit.IMAGE_SUFFIXES else "(none)" for s in f.suffix]
        g = pd.DataFrame({"ext": ext}).groupby("ext", sort=False)
        return g.size().reset_index(name="n")

    parts = (
        rd.read_parquet(snap)
        .map_batches(classify, batch_format="pandas", batch_size=8192)
        .to_pandas()
    )
    out = parts.groupby("ext", sort=False)["n"].sum().reset_index()
    return out.sort_values("ext").reset_index(drop=True)


# ---- generalized frontier-maintenance pipelines (CLI surface) --------
# The q_* queries above run over the pinned snapshot for the driver
# gate; these parameterized forms are what `python -m kryptone_ray
# frontier-*` exposes — read an arbitrary frontier parquet directory,
# transform, write results as partitioned parquet (reference contracts:
# management/commands/{reorder,filter_cache,extract_urls}.py).


def frontier_reorder(frontier_dir: str, pattern: str, out_dir: str) -> int:
    """reorder.py: rank regex-matching URLs first (ties by url), write
    the reordered frontier; returns the row count."""
    def flag(df: pd.DataFrame) -> pd.DataFrame:
        df["has_match"] = df["url"].str.contains(pattern, regex=True)
        return df

    ds = (rd.read_parquet(frontier_dir)
          .map_batches(flag, batch_format="pandas", batch_size=8192)
          .sort(["has_match", "url"], descending=[True, False]))
    ds.write_parquet(out_dir)
    return rd.read_parquet(out_dir).count()


def frontier_extract_urls(frontier_dir: str, paths: tuple[str, ...],
                          out_dir: str) -> int:
    """extract_urls.py: write URLs matching a URLIgnoreTest-style path
    filter; returns the matching count."""
    test = UrlIgnoreTest("cli", paths=tuple(paths))

    def match(df: pd.DataFrame) -> pd.DataFrame:
        f = urlkit.parse_batch(df["url"].tolist())
        return df[np.asarray(test.mask(f))]

    ds = rd.read_parquet(frontier_dir).map_batches(
        match, batch_format="pandas", batch_size=8192)
    ds.write_parquet(out_dir)
    return rd.read_parquet(out_dir).count()


def frontier_filter_cache(frontier_dir: str, pattern: str,
                          out_dir: str) -> dict:
    """filter_cache.py: split the frontier into to_visit / visited by
    regex; writes both partitions, returns the bucket sizes."""
    import pathlib

    def split(df: pd.DataFrame, keep_match: bool) -> pd.DataFrame:
        m = df["url"].str.contains(pattern, regex=True)
        return df[m if keep_match else ~m]

    base = pathlib.Path(out_dir)
    counts = {}
    for bucket, keep in (("visited", True), ("to_visit", False)):
        ds = rd.read_parquet(frontier_dir).map_batches(
            lambda df, k=keep: split(df, k),
            batch_format="pandas", batch_size=8192)
        ds.write_parquet(str(base / bucket))
        counts[bucket] = rd.read_parquet(str(base / bucket)).count()
    return counts


def frontier_oracle_sql() -> dict[str, str]:
    """DuckDB oracles for the snapshot-backed frontier queries: the
    snapshot itself is deterministic parquet on disk, so DuckDB can
    ``read_parquet`` the same files the Ray pipelines read — promoting
    these entries from rows-only to full value-hash checks. Calling
    this materializes the snapshot (the driver may run oracle SQL before
    the queries)."""
    snap = _frontier_snapshot_dir()
    img_list = ", ".join(f"'{s}'" for s in sorted(urlkit.IMAGE_SUFFIXES))
    return {
        "frontier_reorder": f"""
SELECT CAST(row_number() OVER (ORDER BY has_match DESC, url) - 1 AS BIGINT) AS rank,
       url, has_match
FROM (
  SELECT url, contains(url, '/img/') AS has_match
  FROM (SELECT url FROM read_parquet('{snap}/*.parquet') ORDER BY url LIMIT 200)
)
ORDER BY rank
""",
        "extract_urls": f"""
SELECT url FROM read_parquet('{snap}/*.parquet')
WHERE contains(regexp_extract(url, '^[a-z]+://[^/]+([^?#]*)', 1), '/item/')
ORDER BY url
""",
        "filter_cache": f"""
SELECT CASE WHEN contains(url, '/cat/') THEN 'visited' ELSE 'to_visit' END AS bucket,
       count(*) AS n
FROM read_parquet('{snap}/*.parquet')
GROUP BY 1 ORDER BY 1
""",
        "images_by_extension": f"""
SELECT ext, count(*) AS n FROM (
  SELECT CASE WHEN suffix IN ({img_list}) THEN suffix
              ELSE '(none)' END AS ext
  FROM (SELECT regexp_extract(url, '(\\.[a-zA-Z0-9]+)$', 1) AS suffix
        FROM read_parquet('{snap}/*.parquet'))
)
GROUP BY ext ORDER BY ext
""",
    }


def q_crawl_seed_attribution(sf_dir: str) -> pd.DataFrame:
    """LINEAGE AUDIT — materializes the north rule's "seed → frontier
    shard → fetch batch" chain for a pinned mini-crawl: every visited
    page is attributed to its ORIGIN SEED by walking the lineage log's
    first-contributor edges (parent(url) = the lineage row for url with
    the smallest (fetch_batch, ord) — the earliest recorded discovery,
    a deterministic provenance rule independent of engine internals).

    Shapes: parent extraction is a grouped ARGMIN over the lineage log
    (per-batch partials, combine per out_url — at 10^10 URLs this
    hash-partitions by out_url like every grouped argmin here); the
    seed resolution is bounded-depth label propagation (the
    graph.q_graph_bfs_depth shape — parent chains are exactly as long
    as the crawl depth). Output: per seed, pages attributed, max chain
    depth, distinct fetch batches and frontier shards its subtree
    touched — one row per seed, rows-only (engine corpus)."""
    import pathlib

    import pyarrow.parquet as pq

    from kryptone_ray.corpus.store import write_corpus
    from kryptone_ray.corpus.synth import make_corpus_table, page_outlinks
    from kryptone_ray.engine.crawl import RayCrawler
    from kryptone_ray.sim.golden import CrawlSpec

    tmp = tempfile.mkdtemp(prefix="kr_q_attr_")
    write_corpus(make_corpus_table(_SPEC), f"{tmp}/corpus", num_shards=4)
    cs = CrawlSpec(batch_size=16, wait_time=25.0, allowed_hosts=("*",),
                   max_pages=200)
    eng = RayCrawler(f"{tmp}/corpus", page_outlinks(_SPEC), cs, f"{tmp}/run",
                     mode="local")
    seeds = seed_urls(_SPEC, 8)
    eng.run(seeds=seeds)

    visits = eng.visits_table().to_pandas()[["url", "depth", "visit_idx"]]
    lin = pa.concat_tables([
        pq.read_table(f) for f in sorted(
            pathlib.Path(tmp, "run", "lineage").glob("batch-*.parquet"))
    ]).to_pandas()

    # lineage records RAW out-links; map them through the same
    # canonicalization the validator applies (reference urljoin(origin,
    # path) semantics + fragment strip) so they key against the
    # canonical frontier/visit urls
    from kryptone_ray.utils.urlkit import join_relative, remove_fragment

    # start_url = LAST seed (engine.seed(), reference base.py:1048-1049)
    origin = seeds[-1]

    def canon(u: str) -> str:
        u = u if isinstance(u, str) else ""
        if u.startswith("/"):
            u = join_relative(origin, u)
        return remove_fragment(u)

    lin["out_url"] = lin["out_url"].map(canon)

    # grouped argmin: first recorded contributor per out_url (per-batch
    # partial + combine — written driver-side here, the lineage of a
    # 200-page crawl; the partial IS the distributed shape)
    lin = lin.sort_values(["fetch_batch", "ord"], kind="stable")
    parent = lin.drop_duplicates("out_url", keep="first") \
        .set_index("out_url")[["page_url", "fetch_batch",
                               "frontier_shard"]]

    # bounded-depth label propagation to the seed
    seed_of = {u: u for u in seeds}
    batches_of: dict[str, set] = {u: set() for u in seeds}
    shards_of: dict[str, set] = {u: set() for u in seeds}
    visited = visits.sort_values("visit_idx")
    unresolved = 0
    for url, depth in zip(visited["url"], visited["depth"]):
        chain = []
        cur = url
        while cur not in seed_of:
            if cur not in parent.index:
                break
            row = parent.loc[cur]
            chain.append((cur, int(row["fetch_batch"]),
                          int(row["frontier_shard"])))
            cur = row["page_url"]
        if cur in seed_of:
            s = seed_of[cur]
            for u, fb, fs in chain:
                seed_of[u] = s
                batches_of[s].add(fb)
                shards_of[s].add(fs)
        else:
            unresolved += 1
    if unresolved:
        # a real error, not a debug check — python -O must not turn a
        # broken provenance chain into a silently under-counted census
        raise RuntimeError(
            f"{unresolved} visited pages lack a seed chain")

    vis_seed = visited.assign(seed=visited["url"].map(seed_of))
    g = vis_seed.groupby("seed", sort=True)
    out = pd.DataFrame({
        "seed": list(g.groups),
        "n_pages": g.size().to_numpy().astype("int64"),
        "max_depth": g["depth"].max().to_numpy().astype("int64"),
        "n_fetch_batches": [len(batches_of[s]) for s in g.groups],
        "n_frontier_shards": [len(shards_of[s]) for s in g.groups],
    })
    return out.reset_index(drop=True)
