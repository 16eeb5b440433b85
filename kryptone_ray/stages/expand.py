"""Link expansion + validation — the batch equivalent of the reference's
``collect_page_urls`` (+ lineage recording, base.py:473-503) feeding
``check_urls``/``run_url_filters`` (base.py:652-774).

Input: decoded page rows (url, depth, visit_idx, batch_idx, status).
Output: one row per unique canonical out-URL with its validator verdict,
the discovery depth (min contributing page depth + 1) and the min
contributing visit index (for the home-page guard), plus a lineage table
(page_url → out_url → frontier shard → fetch batch; north_rule lineage).

Home-page-guard handling across a batch: the guard (base.py:706-717) is
iteration-dependent; within a batch the sequential reference would
process the earliest-visited page first, so a URL contributed by any
iteration-0 page is validated guard-OFF. We therefore validate the
guard-off group first and dedupe keep-first — bit-equal to the
sequential outcome (see stages/validate.py ordering analysis).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from kryptone_ray.stages.validate import ValidationConfig, validate_batch
from kryptone_ray.utils.xxh64 import xxh64_batch

LINEAGE_SCHEMA = pa.schema(
    [
        ("page_url", pa.string()),
        ("out_url", pa.string()),
        ("ord", pa.int32()),
        ("fetch_batch", pa.int64()),
        ("frontier_shard", pa.int32()),
    ]
)


def expand_and_validate(
    pages: pa.Table,
    outlinks_fn,
    cfg: ValidationConfig,
    num_seen_shards: int,
    crawl: bool = True,
) -> tuple[pa.Table, pa.Table]:
    """Returns (validated, lineage).

    validated columns: url, host, url_hash, verdict, depth, min_iter.
    """
    page_urls = pages["url"].to_pylist()
    depths = pages["depth"].to_pylist()
    iters = pages["visit_idx"].to_pylist()
    batches = pages["batch_idx"].to_pylist()
    statuses = pages["status"].to_pylist()

    out_urls: list[str] = []
    out_depth: list[int] = []
    out_iter: list[int] = []
    lin_page: list[str] = []
    lin_url: list[str] = []
    lin_ord: list[int] = []
    lin_batch: list[int] = []
    for u, d, it, b, st in zip(page_urls, depths, iters, batches, statuses):
        links = outlinks_fn(u) if (crawl and st == "ok") else []
        for o, l in enumerate(links):
            lin_page.append(u)
            lin_url.append(l if isinstance(l, str) else "")
            lin_ord.append(o)
            lin_batch.append(b)
            out_urls.append(l)
            out_depth.append(d + 1)
            out_iter.append(it)

    lineage = pa.table(
        {
            "page_url": pa.array(lin_page, type=pa.string()),
            "out_url": pa.array(lin_url, type=pa.string()),
            "ord": pa.array(lin_ord, type=pa.int32()),
            "fetch_batch": pa.array(lin_batch, type=pa.int64()),
            "frontier_shard": pa.array(
                (xxh64_batch([u if isinstance(u, str) else "" for u in lin_url])
                 % np.uint64(num_seen_shards)).astype(np.int32),
                type=pa.int32(),
            ),
        }
    )

    if not out_urls:
        empty = pa.table(
            {
                "url": pa.array([], type=pa.string()),
                "host": pa.array([], type=pa.string()),
                "url_hash": pa.array([], type=pa.uint64()),
                "verdict": pa.array([], type=pa.string()),
                "depth": pa.array([], type=pa.int32()),
                "min_iter": pa.array([], type=pa.int64()),
            }
        )
        return empty, lineage

    # split by home-page-guard applicability; guard-off (iter 0) first
    groups: list[pa.Table] = []
    it_arr = np.asarray(out_iter)
    d_arr = np.asarray(out_depth)
    u_arr = np.asarray(out_urls, dtype=object)
    for guard_iter, mask in (
        (0, it_arr == 0),
        (1, it_arr > 0),
    ):
        if not mask.any():
            continue
        vt = validate_batch(u_arr[mask].tolist(), cfg, iteration_count=guard_iter)
        # depth/min_iter per deduped url: min over this group's contributors
        contrib: dict[str, tuple[int, int]] = {}
        # canonical urls can differ from raw (relative join) — validate_batch
        # dedupes post-join; recover contributor stats by re-running the
        # same canonicalization mapping on the raw urls:
        from kryptone_ray.utils.urlkit import join_relative

        canon = []
        for raw in u_arr[mask]:
            r = raw if isinstance(raw, str) else ""
            canon.append(join_relative(cfg._origin, r) if r.startswith("/") else r)
        for c, dd, ii in zip(canon, d_arr[mask], it_arr[mask]):
            cur = contrib.get(c)
            if cur is None or (dd, ii) < cur:
                contrib[c] = (int(dd), int(ii))
        urls_v = vt["url"].to_pylist()
        dd = [contrib.get(u, (0, guard_iter))[0] for u in urls_v]
        ii = [contrib.get(u, (0, guard_iter))[1] for u in urls_v]
        vt = vt.append_column("depth", pa.array(dd, type=pa.int32()))
        vt = vt.append_column("min_iter", pa.array(ii, type=pa.int64()))
        groups.append(vt)

    merged = pa.concat_tables(groups)
    # dedupe keep-first across the two guard groups
    _, first = np.unique(np.asarray(merged["url"].to_pylist(), dtype=object), return_index=True)
    first.sort()
    merged = merged.take(pa.array(first))
    return merged, lineage
