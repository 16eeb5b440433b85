"""Driver contract for the graft builder (Ray Data target).

The driver's verify calls ``entry()`` as a smoke check (Ray is already
initialised, local mode), runs each ``queries()[name](sf_dir)`` at
sf=0.01 and compares it against the matching ``oracle_sql()[name]`` via
DuckDB (row-count + schema + order-insensitive value-hash →
CORRECTNESS_r{N}.json).

Ray is initialised by the driver BEFORE this module is imported: nothing
here (nor in kryptone_ray) calls ``ray.init()`` / ``ray.shutdown()``.
"""

from __future__ import annotations

import logging
import tempfile
from collections.abc import Callable
from typing import Any

# ray probes hash(pa.Schema) for a dedup early-exit; schemas carrying
# pandas metadata (a dict) are unhashable, so every parquet read warns
# and then unifies fine — pure log noise. A filter (not setLevel: ray's
# dataset-logging setup re-applies levels on first execution) drops it.
class _DropSchemaHashNoise(logging.Filter):
    def filter(self, record: logging.LogRecord) -> bool:
        return "Failed to hash the schemas" not in record.getMessage()


logging.getLogger(
    "ray.data._internal.arrow_ops.transform_pyarrow"
).addFilter(_DropSchemaHashNoise())


def entry() -> Any:
    """Flagship pipeline: a crawl slice of the synthetic image+caption
    corpus through the full engine (frontier → fetch → decode → expand →
    validate → seen anti-join → scheduler), preceded by a read of the
    sf0.001 tables. Returns the visits log (stable schema)."""
    import ray.data as rd

    from kryptone_ray.corpus.store import write_corpus
    from kryptone_ray.corpus.synth import CorpusSpec, make_corpus_table, seed_urls
    from kryptone_ray.engine.crawl import RayCrawler
    from kryptone_ray.sim.golden import CrawlSpec
    from kryptone_ray.corpus.synth import page_outlinks

    # smoke-read the driver tables (column-pruned)
    n_docs = rd.read_parquet(
        "/root/testdata/sf0.001/documents.parquet", columns=["doc_id"]
    ).count()
    assert n_docs > 0

    spec = CorpusSpec(n_rows=500, n_hosts=8, seed=42)
    tmp = tempfile.mkdtemp(prefix="kr_entry_")
    write_corpus(make_corpus_table(spec), f"{tmp}/corpus", num_shards=4)
    cs = CrawlSpec(batch_size=16, wait_time=25.0, allowed_hosts=("*",), max_pages=128)
    eng = RayCrawler(
        corpus_dir=f"{tmp}/corpus",
        outlinks_fn=page_outlinks(spec),
        spec=cs,
        run_dir=f"{tmp}/run",
        mode="local",
    )
    eng.run(seeds=seed_urls(spec, 8))
    vt = eng.visits_table()
    import pyarrow.compute as pc

    return vt.take(pc.sort_indices(vt["visit_idx"]))


def queries() -> dict[str, Callable[[str], Any]]:
    from kryptone_ray.pipelines import (
        ann,
        crawlops,
        dedup,
        events,
        graph,
        multimodal,
        pii,
        relational,
        textops,
    )

    return {
        # ---- driver window (first 50 entries) ------------------------
        # The driver's CORRECTNESS check evaluates only the FIRST 50
        # entries of this dict, so the ordering rotates per round so no
        # query's latest driver evidence ages past two rounds. Round 5
        # fronts (a) the 23 entries whose latest driver check was round
        # 2 (the oldest evidence: crawlops family, image decode/resize/
        # phash, dedup_exact, embedding near-dups, knn_ivf, simhash,
        # early events), (b) 5 regression sentinels for code touched
        # this round (minhash Arrow stages, Dataset-native neardup/
        # image-neardup clustering, the n-gram census segment pass, the
        # sessionize rewrite), (c) q1 as the stable canary, and (d) 21
        # round-3-latest entries, oldest first.
        # -- (a) oldest driver evidence (round 2) --
        "crawl_visits": crawlops.q_crawl_visits,
        # lineage audit: seed -> frontier shard -> fetch batch chains
        "link_verdicts": crawlops.q_link_verdicts,
        "url_predicates": crawlops.q_url_predicates,
        "caption_prices": crawlops.q_caption_prices,
        "caption_emails": crawlops.q_caption_emails,
        "frontier_reorder": crawlops.q_frontier_reorder,
        "extract_urls": crawlops.q_extract_urls,
        "filter_cache": crawlops.q_filter_cache,
        "images_by_extension": crawlops.q_images_by_extension,
        # multimodal (actor-pool decode/resize over binary columns)
        "image_decode_stats": multimodal.q_image_decode_stats,
        "image_resize_thumbs": multimodal.q_image_resize_thumbs,
        "image_phash_near_dups": multimodal.q_image_phash_near_dups,
        # dedup family (training-data ops)
        "dedup_exact": dedup.q_dedup_exact,
        "simhash_clusters": dedup.q_simhash_clusters,
        "embedding_near_dups": dedup.q_embedding_near_dups,
        "embedding_near_dups_lsh": dedup.q_embedding_near_dups_lsh,
        # LSH sibling of knn_ivf — rows-only (recall<1 by design)
        "knn_ivf": ann.q_knn_ivf,
        # events / stream-shaped
        "events_by_type": events.q_events_by_type,
        "events_tumbling_1h": events.q_events_tumbling_1h,
        "events_topk_users": events.q_events_topk_users,
        "events_json_props": events.q_events_json_props,
        "events_sliding_1h_30m": events.q_events_sliding_1h_30m,
        "events_asof_orders": events.q_events_asof_orders,
        # -- (b) round-5 regression sentinels (code touched this round) --
        "minhash_lsh_pairs": dedup.q_minhash_lsh_pairs,
        "neardup_clusters": dedup.q_neardup_clusters,
        "image_neardup_clusters": multimodal.q_image_neardup_clusters,
        "ngram_jaccard_dups": dedup.q_ngram_jaccard_dups,
        "events_sessions": events.q_events_sessions,
        # -- (c) stable canary --
        "q1_pricing_summary": relational.q1_pricing_summary,
        # -- (d) round-3-latest entries, oldest evidence first --
        "word_frequency": textops.q_word_frequency,
        "tfidf_top_terms": textops.q_tfidf_top_terms,
        "doc_quality": textops.q_doc_quality,
        "lang_distribution": textops.q_lang_distribution,
        "token_counts": textops.q_token_counts,
        "filter_project": relational.q_filter_project,
        "topk_orders": relational.q_topk_orders,
        "distinct_segments": relational.q_distinct_segments,
        "count_by_priority": relational.q_count_by_priority,
        "customer_order_stats": relational.q_customer_order_stats,
        "q3_shipping_priority": relational.q3_shipping_priority,
        # TPC-H Q7 shape: nation-pair volume by year (multi-join)
        "q7_nation_pair_volume": relational.q7_nation_pair_volume,
        # GROUP BY CUBE: all four grouping sets from one scan
        "orders_cube": relational.q_orders_cube,
        "part_type_stats": relational.q_part_type_stats,
        "orders_monthly": relational.q_orders_monthly,
        "customer_balance_stats": relational.q_customer_balance_stats,
        "top_orders_per_customer": relational.q_top_orders_per_customer,
        "customers_no_urgent": relational.q_customers_no_urgent,
        "orders_rollup": relational.q_orders_rollup,
        "acctbal_quantiles": relational.q_acctbal_quantiles,
        # INTERSECT/EXCEPT via distinct (key, side-bit) partials + bit-OR
        "custkey_set_ops": relational.q_custkey_set_ops,
        # ---- end driver window ---------------------------------------
        "pii_redaction": pii.q_pii_redaction,
        "shingle_dedup_census": textops.q_shingle_dedup_census,
        "docs_id_encode": textops.q_docs_id_encode,
        "name_edit1_pairs": dedup.q_name_edit1_pairs,
        "knn_lsh": ann.q_knn_lsh,
        "knn_bruteforce": ann.q_knn_bruteforce,
        "events_asof_sortmerge": events.q_events_asof_orders_sortmerge,
        "hll_distinct_users": events.q_hll_distinct_users,
        "events_value_band_join": events.q_events_value_band_join,
        "events_gap_to_next": events.q_events_gap_to_next,
        "events_pivot_daily": events.q_events_pivot_daily,
        "events_hourly_full_outer": events.q_events_hourly_full_outer,
        "events_argmax_user": events.q_events_argmax_user,
        "events_value_stddev": events.q_events_value_stddev,
        "events_cumulative_users": events.q_events_cumulative_users,
        "events_type_distinct_users": events.q_events_type_distinct_users,
        "events_value_median": events.q_events_value_median,
        "events_funnel": events.q_events_funnel,
        "events_cohort_retention": events.q_events_cohort_retention,
        "events_time_weighted_avg": events.q_events_time_weighted_avg,
        "events_pattern_matches": events.q_events_pattern_matches,
        "events_value_regression": events.q_events_value_regression,
        "events_windowed_dedup": events.q_events_windowed_dedup,
        "value_quantiles_sketch": events.q_value_quantiles_sketch,
        "heavy_hitters_sketch": events.q_heavy_hitters_sketch,
        "events_partitioned_sink": events.q_events_partitioned_sink,
        "events_late_census": events.q_events_late_census,
        "corpus_scan_stats": multimodal.q_corpus_scan_stats,
        "corpus_thumbs_roundtrip": multimodal.q_corpus_thumbs_roundtrip,
        "image_exact_dups": multimodal.q_image_exact_dups,
        "image_size_stats": multimodal.q_image_size_stats,
        "image_decode_quarantine": multimodal.q_image_decode_quarantine,
        "caption_image_mismatch": multimodal.q_caption_image_mismatch,
        "image_wds_export": multimodal.q_image_wds_export,
        "image_knn": multimodal.q_image_knn,
        "graph_degree_stats": graph.q_graph_degree_stats,
        "graph_pagerank": graph.q_graph_pagerank,
        "graph_components": graph.q_graph_components,
        "graph_bfs_depth": graph.q_graph_bfs_depth,
        "graph_triangles": graph.q_graph_triangles,
        "crawl_seed_attribution": crawlops.q_crawl_seed_attribution,
        "page_audits": crawlops.q_page_audits,
        "q5_nation_volume": relational.q5_nation_volume,
        "bucketed_join": relational.q_bucketed_join,
        # relational (SURVEY §2 filters/aggregates/joins/top-k/distinct)
        "customer_running_spend": relational.q_customer_running_spend,
        "orders_with_returns": relational.q_orders_with_returns,
        "orders_with_returns_bloom": relational.q_orders_with_returns_bloom,
        "customers_above_segment_avg": relational.q_customers_above_segment_avg,
        # LEFT OUTER JOIN -> histogram (TPC-H Q13 shape; zero bucket from
        # the customer footer row count, no read of the outer side)
        "order_count_histogram": relational.q_order_count_histogram,
        # ordered-frame window (7-row trailing mean, exact cumsum diff)
        "orders_moving_avg": relational.q_orders_moving_avg,
        # percent_rank without sort/shuffle (bounded-domain histogram +
        # broadcast cumulative counts)
        "customer_percent_rank": relational.q_customer_percent_rank,
        # dense_rank top-k with ties, no sort (bounded-domain hist)
        "customer_dense_rank_top": relational.q_customer_dense_rank_top,
        # exact global ranks + ntile sharding without a global sort
        "orders_ntile_shards": relational.q_orders_ntile_shards,
        # TPC-H Q17 shape: correlated avg subquery as fact×self-aggregate
        "small_quantity_revenue": relational.q_small_quantity_revenue,
        # UNPIVOT/melt wide->long, collapsed to partials per batch
        "lineitem_unpivot": relational.q_lineitem_unpivot,
        # ordered STRING_AGG/LISTAGG per nation (predicate-bounded groups)
        "nation_rich_names": relational.q_nation_rich_customer_names,
        # CDC MERGE/upsert: LWW by version, tombstone deletes
        "orders_cdc_merge": relational.q_orders_cdc_merge,
        # SCD Type-2 history build over the same change-set
        "orders_scd2_census": relational.q_orders_scd2_census,
        # sort-merge join with range co-partitioning (no hash state)
        "orders_lineitem_mergejoin": relational.q_orders_lineitem_mergejoin,
        # market-basket co-occurrence: top brand pairs per order
        "brand_basket_pairs": relational.q_brand_basket_pairs,
        # interval-overlap self-join via per-key sorted sweep
        "orders_overlap_pairs": relational.q_orders_overlap_pairs,
        # Z-order (Morton) clustered export, proven by shard read-back
        "lineitem_zorder_export": relational.q_lineitem_zorder_export,
        # text analysis (SURVEY §2.3-2.4; training-data text ops)
        "token_counts_bpe": textops.q_token_counts_bpe,
        "stratified_sample": textops.q_stratified_sample,
        # order-statistics uniform k-sample (smallest md5(doc_id))
        "docs_hash_sample": textops.q_docs_hash_sample,
        "lang_id_heuristic": textops.q_lang_id_heuristic,
        "doc_fingerprints": textops.q_doc_fingerprints,
        "repetition_stats": textops.q_repetition_stats,
        # JSONL write→read roundtrip proven by the parquet-side oracle
        "docs_jsonl_roundtrip": textops.q_docs_jsonl_roundtrip,
        # reproducible hash-shuffle shard export, proven by read-back
        "training_shard_export": textops.q_training_shard_export,
    }


def oracle_sql() -> dict[str, str]:
    from kryptone_ray.pipelines import (
        ann,
        crawlops,
        dedup,
        events,
        graph,
        multimodal,
        pii,
        relational,
        textops,
    )

    return {
        "q1_pricing_summary": relational.Q1_SQL,
        "filter_project": relational.Q_FILTER_PROJECT_SQL,
        "topk_orders": relational.Q_TOPK_SQL,
        "distinct_segments": relational.Q_DISTINCT_SQL,
        "count_by_priority": relational.Q_COUNT_PRIORITY_SQL,
        "customer_order_stats": relational.Q_CUST_ORDERS_SQL,
        "q3_shipping_priority": relational.Q3_SQL,
        "q5_nation_volume": relational.Q5_SQL,
        "q7_nation_pair_volume": relational.Q7_SQL,
        "orders_cube": relational.Q_ORDERS_CUBE_SQL,
        "bucketed_join": relational.Q_BUCKETED_JOIN_SQL,
        "part_type_stats": relational.Q_PART_TYPE_SQL,
        "orders_monthly": relational.Q_ORDERS_MONTHLY_SQL,
        "customer_balance_stats": relational.Q_CUSTOMER_BALANCE_SQL,
        "top_orders_per_customer": relational.Q_TOP_ORDERS_PER_CUSTOMER_SQL,
        "customers_no_urgent": relational.Q_CUSTOMERS_NO_URGENT_SQL,
        "orders_rollup": relational.Q_ORDERS_ROLLUP_SQL,
        "acctbal_quantiles": relational.Q_ACCTBAL_QUANTILES_SQL,
        "customer_running_spend": relational.Q_CUSTOMER_RUNNING_SPEND_SQL,
        "orders_with_returns": relational.Q_ORDERS_WITH_RETURNS_SQL,
        # same semantics, Bloom-pruned strategy — same oracle
        "orders_with_returns_bloom": relational.Q_ORDERS_WITH_RETURNS_SQL,
        "customers_above_segment_avg": relational.Q_CUSTOMERS_ABOVE_SEGMENT_AVG_SQL,
        "order_count_histogram": relational.Q_ORDER_COUNT_HISTOGRAM_SQL,
        "custkey_set_ops": relational.Q_CUSTKEY_SET_OPS_SQL,
        "orders_moving_avg": relational.Q_ORDERS_MOVING_AVG_SQL,
        "customer_percent_rank": relational.Q_CUSTOMER_PERCENT_RANK_SQL,
        "customer_dense_rank_top": relational.Q_CUSTOMER_DENSE_RANK_SQL,
        "orders_ntile_shards": relational.Q_ORDERS_NTILE_SHARDS_SQL,
        "small_quantity_revenue": relational.Q_SMALL_QTY_REVENUE_SQL,
        "lineitem_unpivot": relational.Q_LINEITEM_UNPIVOT_SQL,
        "nation_rich_names": relational.Q_NATION_RICH_NAMES_SQL,
        "orders_cdc_merge": relational.Q_ORDERS_CDC_MERGE_SQL,
        "orders_scd2_census": relational.Q_ORDERS_SCD2_SQL,
        "orders_lineitem_mergejoin": relational.Q_ORDERS_LINEITEM_MERGEJOIN_SQL,
        "brand_basket_pairs": relational.Q_BRAND_BASKET_SQL,
        "orders_overlap_pairs": relational.Q_ORDERS_OVERLAP_PAIRS_SQL,
        "lineitem_zorder_export": relational.Q_LINEITEM_ZORDER_SQL,
        "corpus_scan_stats": multimodal.corpus_scan_oracle_sql(),
        "lang_distribution": textops.Q_LANG_SQL,
        "token_counts": textops.Q_TOKEN_COUNTS_SQL,
        # same regex on both sides (python re == RE2 for this pattern)
        "token_counts_bpe": textops.token_counts_bpe_oracle_sql(),
        "stratified_sample": textops.Q_STRATIFIED_SAMPLE_SQL,
        "docs_hash_sample": textops.Q_DOCS_HASH_SAMPLE_SQL,
        "word_frequency": textops.Q_WORD_FREQ_SQL,
        "tfidf_top_terms": textops.Q_TFIDF_SQL,
        "doc_quality": textops.Q_DOC_QUALITY_SQL,
        "dedup_exact": dedup.Q_DEDUP_EXACT_SQL,
        "name_edit1_pairs": dedup.Q_NAME_EDIT1_SQL,
        "embedding_near_dups": dedup.Q_EMBEDDING_NEAR_DUPS_SQL,
        "ngram_jaccard_dups": dedup.Q_NGRAM_JACCARD_SQL,
        "knn_bruteforce": ann.Q_KNN_SQL,
        "events_by_type": events.Q_EVENTS_BY_TYPE_SQL,
        "events_tumbling_1h": events.Q_EVENTS_TUMBLING_SQL,
        "events_sessions": events.Q_EVENTS_SESSIONS_SQL,
        "events_topk_users": events.Q_EVENTS_TOPK_SQL,
        "events_json_props": events.Q_EVENTS_JSON_SQL,
        "events_sliding_1h_30m": events.Q_EVENTS_SLIDING_SQL,
        "events_asof_orders": events.Q_EVENTS_ASOF_SQL,
        # same semantics, sort-merge strategy — same oracle
        "events_asof_sortmerge": events.Q_EVENTS_ASOF_SQL,
        "events_value_band_join": events.Q_EVENTS_VALUE_BAND_SQL,
        "events_gap_to_next": events.Q_EVENTS_GAP_SQL,
        "events_pivot_daily": events.Q_EVENTS_PIVOT_SQL,
        "events_hourly_full_outer": events.Q_EVENTS_HOURLY_FULL_OUTER_SQL,
        "events_argmax_user": events.Q_EVENTS_ARGMAX_SQL,
        "events_value_stddev": events.Q_EVENTS_VALUE_STDDEV_SQL,
        "events_cumulative_users": events.Q_EVENTS_CUMULATIVE_USERS_SQL,
        "events_type_distinct_users": events.Q_EVENTS_TYPE_DISTINCT_USERS_SQL,
        "events_value_median": events.Q_EVENTS_VALUE_MEDIAN_SQL,
        "events_funnel": events.Q_EVENTS_FUNNEL_SQL,
        "events_cohort_retention": events.Q_EVENTS_COHORT_SQL,
        "events_time_weighted_avg": events.Q_EVENTS_TWA_SQL,
        "events_pattern_matches": events.Q_EVENTS_PATTERN_SQL,
        "events_value_regression": events.Q_EVENTS_REGRESSION_SQL,
        "events_windowed_dedup": events.Q_EVENTS_WINDOWED_DEDUP_SQL,
        # manifest (partition, n_rows) of the resumable day-partitioned sink
        "events_partitioned_sink": events.Q_EVENTS_PARTITIONED_SINK_SQL,
        # generated from the same marker table as the predictor
        "lang_id_heuristic": textops.lang_id_oracle_sql(),
        "repetition_stats": textops.Q_REPETITION_STATS_SQL,
        "docs_jsonl_roundtrip": textops.Q_DOCS_JSONL_SQL,
        "training_shard_export": textops.Q_TRAINING_SHARD_SQL,
        "pii_redaction": pii.Q_PII_REDACTION_SQL,
        "shingle_dedup_census": textops.Q_SHINGLE_DEDUP_SQL,
        "docs_id_encode": textops.Q_DOCS_ID_ENCODE_SQL,
        # re-derives urlparse fields from raw strings with SQL string ops
        "url_predicates": crawlops.url_predicates_oracle_sql(),
        # the frontier-maintenance queries run over a deterministic
        # parquet snapshot DuckDB can read directly — full value-hash
        # oracles (crawlops.frontier_oracle_sql materializes the
        # snapshot in case the driver evaluates SQL first)
        **crawlops.frontier_oracle_sql(),
        **crawlops.caption_oracle_sql(),
        "image_exact_dups": multimodal.image_exact_dups_oracle_sql(),
        "image_size_stats": multimodal.image_size_stats_oracle_sql(),
        "image_decode_quarantine":
            multimodal.image_decode_quarantine_oracle_sql(),
        "caption_image_mismatch":
            multimodal.caption_image_mismatch_oracle_sql(),
        "image_wds_export": multimodal.image_wds_export_oracle_sql(),
        "graph_degree_stats": graph.graph_degree_stats_oracle_sql(),
        "graph_pagerank": graph.graph_pagerank_oracle_sql(),
        "graph_components": graph.graph_components_oracle_sql(),
        "graph_bfs_depth": graph.graph_bfs_oracle_sql(),
        "graph_triangles": graph.graph_triangles_oracle_sql(),
        "events_late_census": events.Q_EVENTS_LATE_CENSUS_SQL,
        # rows-only (not SQL-expressible):
        # doc_fingerprints, minhash_lsh_pairs, simhash_clusters,
        # embedding_near_dups_lsh, knn_ivf, knn_lsh, image_knn,
        # image_decode_stats, image_resize_thumbs, image_phash_near_dups,
        # crawl_visits, link_verdicts, neardup_clusters
    }
