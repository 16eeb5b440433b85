"""Round-3 small-input gates: every gated pipeline has a driver-combine
shape (fast below the gate — no shuffle fixed cost) and a distributed
shape (the 100-TB path). Both must produce identical output; these
tests force the distributed / fallback paths by patching the gate
constants to 0, the same pattern as
test_dedup_distributed.test_wordfreq_tfidf_hash_path_equals_driver_path.
"""

from __future__ import annotations

import pandas as pd
import pytest

SF = "/root/testdata/sf0.001"
SF01 = "/root/testdata/sf0.01"


def _norm(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    return df.sort_values(list(df.columns)).reset_index(drop=True)


def _df(res):
    import ray.data as rd

    return res.to_pandas() if isinstance(res, rd.Dataset) else res


@pytest.mark.usefixtures("ray_session")
def test_bucketed_join_distributed_equals_driver(monkeypatch):
    from kryptone_ray.pipelines import relational

    small = _df(relational.q_bucketed_join(SF))
    monkeypatch.setattr(relational, "DISTRIBUTED_JOIN_MIN_ROWS", 0)
    big = _df(relational.q_bucketed_join(SF))
    pd.testing.assert_frame_equal(_norm(small), _norm(big), check_dtype=False)


@pytest.mark.usefixtures("ray_session")
def test_events_sessions_distributed_equals_driver(monkeypatch):
    from kryptone_ray.pipelines import events

    small = _df(events.q_events_sessions(SF))
    monkeypatch.setattr(events, "DISTRIBUTED_SESSIONS_MIN_ROWS", 0)
    big = _df(events.q_events_sessions(SF))
    pd.testing.assert_frame_equal(_norm(small), _norm(big), check_dtype=False)


def test_sessions_partition_count_grows_with_rows():
    """The distributed sessionization sizes its hash partitions from
    the footer row count (round-2 verdict: a fixed 16 caps per-block
    memory at 1/16th of the table)."""
    from kryptone_ray.pipelines.common import join_partitions

    lo = join_partitions(100_000)
    hi = join_partitions(10_000_000)
    assert hi > lo
    assert join_partitions(10**10) == 64  # capped per node-count


@pytest.mark.usefixtures("ray_session")
def test_minhash_distributed_candidates_equal_driver(monkeypatch):
    from kryptone_ray.pipelines import dedup

    small = dedup.q_minhash_lsh_pairs(SF01)
    monkeypatch.setattr(dedup, "MINHASH_DISTRIBUTED_MIN_DOCS", 0)
    big = dedup.q_minhash_lsh_pairs(SF01)
    pd.testing.assert_frame_equal(_norm(small), _norm(big), check_dtype=False)


@pytest.mark.usefixtures("ray_session")
def test_minhash_distributed_verify_equals_broadcast(monkeypatch):
    """Forcing the >2M-candidate switch to 0 routes the exact-Jaccard
    verify through the two-join distributed path — pairs and texts
    never land on the driver — with byte-identical output."""
    from kryptone_ray.pipelines import dedup

    small = dedup.q_minhash_lsh_pairs(SF01)
    monkeypatch.setattr(dedup, "MINHASH_DISTRIBUTED_MIN_DOCS", 0)
    monkeypatch.setattr(dedup, "MINHASH_DISTRIBUTED_VERIFY_MIN_PAIRS", 0)
    big = dedup.q_minhash_lsh_pairs(SF01)
    pd.testing.assert_frame_equal(_norm(small), _norm(big), check_dtype=False)


@pytest.mark.usefixtures("ray_session")
def test_events_windowed_dedup_distributed_equals_driver(monkeypatch):
    from kryptone_ray.pipelines import events

    small = events.q_events_windowed_dedup(SF)
    monkeypatch.setattr(events, "DISTRIBUTED_SESSIONS_MIN_ROWS", 0)
    big = events.q_events_windowed_dedup(SF)
    pd.testing.assert_frame_equal(_norm(small), _norm(big), check_dtype=False)


@pytest.mark.usefixtures("ray_session")
def test_events_cumulative_users_distributed_equals_driver(monkeypatch):
    from kryptone_ray.pipelines import events

    small = events.q_events_cumulative_users(SF)
    monkeypatch.setattr(events, "DISTRIBUTED_SESSIONS_MIN_ROWS", 0)
    big = events.q_events_cumulative_users(SF)
    pd.testing.assert_frame_equal(_norm(small), _norm(big), check_dtype=False)


@pytest.mark.usefixtures("ray_session")
def test_q3_join_fallback_equals_broadcast(monkeypatch):
    from kryptone_ray.pipelines import relational

    bc = relational.q3_shipping_priority(SF)
    monkeypatch.setattr(relational, "BROADCAST_MAX_ROWS", 0)
    jn = relational.q3_shipping_priority(SF)
    pd.testing.assert_frame_equal(bc, jn, check_dtype=False)


@pytest.mark.usefixtures("ray_session")
def test_q5_join_fallback_equals_broadcast(monkeypatch):
    from kryptone_ray.pipelines import relational

    bc = relational.q5_nation_volume(SF)
    monkeypatch.setattr(relational, "BROADCAST_MAX_ROWS", 0)
    jn = relational.q5_nation_volume(SF)
    pd.testing.assert_frame_equal(bc, jn, check_dtype=False)


@pytest.mark.usefixtures("ray_session")
def test_customer_order_stats_join_fallback_equals_broadcast(monkeypatch):
    from kryptone_ray.pipelines import relational

    bc = _df(relational.q_customer_order_stats(SF))
    monkeypatch.setattr(relational, "BROADCAST_MAX_ROWS", 0)
    jn = _df(relational.q_customer_order_stats(SF))
    pd.testing.assert_frame_equal(_norm(bc), _norm(jn), check_dtype=False)


@pytest.mark.usefixtures("ray_session")
def test_q3_distributed_equals_driver(monkeypatch):
    from kryptone_ray.pipelines import relational

    small = relational.q3_shipping_priority(SF)
    monkeypatch.setattr(relational, "DISTRIBUTED_JOIN_MIN_ROWS", 0)
    big = relational.q3_shipping_priority(SF)
    pd.testing.assert_frame_equal(small, big, check_dtype=False)


@pytest.mark.usefixtures("ray_session")
def test_q5_distributed_equals_driver(monkeypatch):
    from kryptone_ray.pipelines import relational

    small = relational.q5_nation_volume(SF)
    monkeypatch.setattr(relational, "DISTRIBUTED_JOIN_MIN_ROWS", 0)
    big = relational.q5_nation_volume(SF)
    pd.testing.assert_frame_equal(small, big, check_dtype=False)


@pytest.mark.usefixtures("ray_session")
def test_dedup_exact_distributed_equals_driver(monkeypatch):
    from kryptone_ray.pipelines import dedup

    small = _df(dedup.q_dedup_exact(SF))
    monkeypatch.setattr(dedup, "MINHASH_DISTRIBUTED_MIN_DOCS", 0)
    big = _df(dedup.q_dedup_exact(SF))
    pd.testing.assert_frame_equal(_norm(small), _norm(big), check_dtype=False)


@pytest.mark.usefixtures("ray_session")
def test_topk_users_distributed_equals_driver(monkeypatch):
    from kryptone_ray.pipelines import events

    small = events.q_events_topk_users(SF)
    monkeypatch.setattr(events, "DISTRIBUTED_SESSIONS_MIN_ROWS", 0)
    big = events.q_events_topk_users(SF)
    pd.testing.assert_frame_equal(small, big, check_dtype=False)


@pytest.mark.usefixtures("ray_session")
def test_top_orders_per_customer_distributed_equals_driver(monkeypatch):
    from kryptone_ray.pipelines import relational

    small = _df(relational.q_top_orders_per_customer(SF))
    monkeypatch.setattr(relational, "DISTRIBUTED_JOIN_MIN_ROWS", 0)
    big = _df(relational.q_top_orders_per_customer(SF))
    pd.testing.assert_frame_equal(_norm(small), _norm(big),
                                  check_dtype=False)


@pytest.mark.usefixtures("ray_session")
def test_customers_no_urgent_distributed_equals_driver(monkeypatch):
    from kryptone_ray.pipelines import relational

    small = _df(relational.q_customers_no_urgent(SF))
    monkeypatch.setattr(relational, "DISTRIBUTED_JOIN_MIN_ROWS", 0)
    big = _df(relational.q_customers_no_urgent(SF))
    pd.testing.assert_frame_equal(_norm(small), _norm(big),
                                  check_dtype=False)


@pytest.mark.usefixtures("ray_session")
def test_value_band_join_distributed_equals_driver(monkeypatch):
    from kryptone_ray.pipelines import events

    small = _df(events.q_events_value_band_join(SF))
    monkeypatch.setattr(events, "DISTRIBUTED_SESSIONS_MIN_ROWS", 0)
    big = _df(events.q_events_value_band_join(SF))
    pd.testing.assert_frame_equal(_norm(small), _norm(big),
                                  check_dtype=False)


@pytest.mark.usefixtures("ray_session")
def test_running_spend_distributed_equals_driver(monkeypatch):
    from kryptone_ray.pipelines import relational

    small = _df(relational.q_customer_running_spend(SF))
    monkeypatch.setattr(relational, "DISTRIBUTED_JOIN_MIN_ROWS", 0)
    big = _df(relational.q_customer_running_spend(SF))
    pd.testing.assert_frame_equal(_norm(small), _norm(big),
                                  check_dtype=False)


@pytest.mark.usefixtures("ray_session")
def test_gap_to_next_distributed_equals_driver(monkeypatch):
    from kryptone_ray.pipelines import events

    small = _df(events.q_events_gap_to_next(SF))
    monkeypatch.setattr(events, "DISTRIBUTED_SESSIONS_MIN_ROWS", 0)
    big = _df(events.q_events_gap_to_next(SF))
    pd.testing.assert_frame_equal(_norm(small), _norm(big),
                                  check_dtype=False)


@pytest.mark.usefixtures("ray_session")
def test_orders_with_returns_distributed_equals_driver(monkeypatch):
    from kryptone_ray.pipelines import relational

    small = _df(relational.q_orders_with_returns(SF))
    monkeypatch.setattr(relational, "DISTRIBUTED_JOIN_MIN_ROWS", 0)
    big = _df(relational.q_orders_with_returns(SF))
    pd.testing.assert_frame_equal(_norm(small), _norm(big),
                                  check_dtype=False)


@pytest.mark.usefixtures("ray_session")
def test_knn_ivf_distributed_equals_driver(monkeypatch):
    from kryptone_ray.pipelines import ann

    small = ann.q_knn_ivf(SF01)
    monkeypatch.setattr(ann, "IVF_DISTRIBUTED_MIN_ROWS", 0)
    big = ann.q_knn_ivf(SF01)
    pd.testing.assert_frame_equal(_norm(small), _norm(big), check_dtype=False)


@pytest.mark.usefixtures("ray_session")
def test_order_count_histogram_distributed_equals_driver(monkeypatch):
    from kryptone_ray.pipelines import relational

    small = _df(relational.q_order_count_histogram(SF01))
    monkeypatch.setattr(relational, "DISTRIBUTED_JOIN_MIN_ROWS", 0)
    big = _df(relational.q_order_count_histogram(SF01))
    pd.testing.assert_frame_equal(_norm(small), _norm(big), check_dtype=False)


@pytest.mark.usefixtures("ray_session")
def test_custkey_set_ops_distributed_equals_driver(monkeypatch):
    from kryptone_ray.pipelines import relational

    small = _df(relational.q_custkey_set_ops(SF01))
    monkeypatch.setattr(relational, "DISTRIBUTED_JOIN_MIN_ROWS", 0)
    big = _df(relational.q_custkey_set_ops(SF01))
    pd.testing.assert_frame_equal(_norm(small), _norm(big), check_dtype=False)


@pytest.mark.usefixtures("ray_session")
def test_cumulative_users_distributed_equals_driver(monkeypatch):
    from kryptone_ray.pipelines import events

    small = events.q_events_cumulative_users(SF01)
    monkeypatch.setattr(events, "DISTRIBUTED_SESSIONS_MIN_ROWS", 0)
    big = events.q_events_cumulative_users(SF01)
    pd.testing.assert_frame_equal(_norm(small), _norm(big), check_dtype=False)


@pytest.mark.usefixtures("ray_session")
def test_ntile_shards_distributed_equals_driver(monkeypatch):
    from kryptone_ray.pipelines import relational

    small = _df(relational.q_orders_ntile_shards(SF01))
    monkeypatch.setattr(relational, "DISTRIBUTED_JOIN_MIN_ROWS", 0)
    big = _df(relational.q_orders_ntile_shards(SF01))
    pd.testing.assert_frame_equal(_norm(small), _norm(big), check_dtype=False)


@pytest.mark.usefixtures("ray_session")
def test_small_qty_revenue_distributed_equals_broadcast(monkeypatch):
    from kryptone_ray.pipelines import relational

    small = _df(relational.q_small_quantity_revenue(SF))
    monkeypatch.setattr(relational, "BROADCAST_MAX_ROWS", 0)
    big = _df(relational.q_small_quantity_revenue(SF))
    pd.testing.assert_frame_equal(_norm(small), _norm(big), check_dtype=False)


@pytest.mark.usefixtures("ray_session")
def test_type_distinct_users_distributed_equals_driver(monkeypatch):
    from kryptone_ray.pipelines import events

    small = events.q_events_type_distinct_users(SF)
    monkeypatch.setattr(events, "DISTRIBUTED_SESSIONS_MIN_ROWS", 0)
    big = events.q_events_type_distinct_users(SF)
    pd.testing.assert_frame_equal(_norm(small), _norm(big), check_dtype=False)


@pytest.mark.usefixtures("ray_session")
@pytest.mark.parametrize("qname", ["q_nation_rich_customer_names",
                                   "q_orders_cdc_merge",
                                   "q_orders_overlap_pairs"])
def test_round3_relational_distributed_equals_driver(monkeypatch, qname):
    from kryptone_ray.pipelines import relational

    fn = getattr(relational, qname)
    small = _df(fn(SF))
    monkeypatch.setattr(relational, "DISTRIBUTED_JOIN_MIN_ROWS", 0)
    big = _df(fn(SF))
    pd.testing.assert_frame_equal(_norm(small), _norm(big), check_dtype=False)


@pytest.mark.usefixtures("ray_session")
def test_shingle_census_distributed_equals_driver(monkeypatch):
    from kryptone_ray.pipelines import textops

    small = textops.q_shingle_dedup_census(SF)
    monkeypatch.setattr(textops, "DISTRIBUTED_COMBINE_MIN_ROWS", 0)
    big = textops.q_shingle_dedup_census(SF)
    pd.testing.assert_frame_equal(_norm(small), _norm(big), check_dtype=False)


@pytest.mark.usefixtures("ray_session")
def test_q7_distributed_and_fallback_equal_driver(monkeypatch):
    from kryptone_ray.pipelines import relational

    base = _df(relational.q7_nation_pair_volume(SF))
    monkeypatch.setattr(relational, "DISTRIBUTED_JOIN_MIN_ROWS", 0)
    dist = _df(relational.q7_nation_pair_volume(SF))
    pd.testing.assert_frame_equal(_norm(base), _norm(dist), check_dtype=False)
    monkeypatch.setattr(relational, "BROADCAST_MAX_ROWS", 0)
    fb = _df(relational.q7_nation_pair_volume(SF))
    pd.testing.assert_frame_equal(_norm(base), _norm(fb), check_dtype=False)


@pytest.mark.usefixtures("ray_session")
def test_edit1_pairs_distributed_equals_driver(monkeypatch):
    from kryptone_ray.pipelines import dedup

    small = dedup.q_name_edit1_pairs(SF)
    monkeypatch.setattr(dedup, "MINHASH_DISTRIBUTED_MIN_DOCS", 0)
    big = dedup.q_name_edit1_pairs(SF)
    pd.testing.assert_frame_equal(_norm(small), _norm(big), check_dtype=False)


@pytest.mark.usefixtures("ray_session")
def test_id_encode_distributed_equals_driver(monkeypatch):
    from kryptone_ray.pipelines import textops

    small = textops.q_docs_id_encode(SF)
    monkeypatch.setattr(textops, "DISTRIBUTED_COMBINE_MIN_ROWS", 0)
    big = textops.q_docs_id_encode(SF)
    pd.testing.assert_frame_equal(_norm(small), _norm(big), check_dtype=False)


@pytest.mark.usefixtures("ray_session")
@pytest.mark.parametrize("qname", ["q_orders_scd2_census",
                                   "q_orders_lineitem_mergejoin"])
def test_scd2_and_mergejoin_distributed_equal_driver(monkeypatch, qname):
    from kryptone_ray.pipelines import relational

    fn = getattr(relational, qname)
    small = _df(fn(SF))
    monkeypatch.setattr(relational, "DISTRIBUTED_JOIN_MIN_ROWS", 0)
    big = _df(fn(SF))
    pd.testing.assert_frame_equal(_norm(small), _norm(big), check_dtype=False)


@pytest.mark.usefixtures("ray_session")
@pytest.mark.parametrize("qname", ["q_events_cohort_retention",
                                   "q_events_time_weighted_avg"])
def test_analytics_distributed_equals_driver(monkeypatch, qname):
    from kryptone_ray.pipelines import events

    fn = getattr(events, qname)
    small = fn(SF)
    monkeypatch.setattr(events, "DISTRIBUTED_SESSIONS_MIN_ROWS", 0)
    big = fn(SF)
    pd.testing.assert_frame_equal(_norm(small), _norm(big), check_dtype=False)


@pytest.mark.usefixtures("ray_session")
def test_pattern_matches_distributed_equals_driver(monkeypatch):
    from kryptone_ray.pipelines import events

    small = _df(events.q_events_pattern_matches(SF))
    monkeypatch.setattr(events, "DISTRIBUTED_SESSIONS_MIN_ROWS", 0)
    big = _df(events.q_events_pattern_matches(SF))
    pd.testing.assert_frame_equal(_norm(small), _norm(big), check_dtype=False)


@pytest.mark.usefixtures("ray_session")
def test_basket_pairs_distributed_equals_driver(monkeypatch):
    from kryptone_ray.pipelines import relational

    small = _df(relational.q_brand_basket_pairs(SF))
    monkeypatch.setattr(relational, "DISTRIBUTED_JOIN_MIN_ROWS", 0)
    big = _df(relational.q_brand_basket_pairs(SF))
    pd.testing.assert_frame_equal(_norm(small), _norm(big), check_dtype=False)


@pytest.mark.usefixtures("ray_session")
def test_value_regression_exact_past_int64(tmp_path):
    """The closed-form terms n·Σxy and Σx·Σy overflow int64 well before
    the per-row sums do (round-4 advice): with 120k rows at ~1e6 value,
    n·Σxy ≈ 2.6e19 > 2^63. The combine must run in arbitrary precision
    and still match DuckDB's HUGEINT arithmetic bit-for-bit."""
    import duckdb
    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    from kryptone_ray.pipelines import events

    rng = np.random.default_rng(7)
    n = 120_000
    ts = (np.datetime64("2024-01-01T00:00:00", "us")
          + rng.integers(0, 30 * 86_400, n) * np.timedelta64(1_000_000, "us"))
    # 2-decimal values near 8e6 so n·Σxy ≈ 6e4·(6e4·11.5·8e8) ≈ 3e19
    # per type — past 2^63; correlated with the hour so num/den are far
    # from zero and any wrap is visible
    hours = (ts.astype("datetime64[h]").astype("int64")) % 24
    value = np.round(8e6 + hours * 1234.56 + rng.integers(0, 100, n), 2)
    t = pa.table({
        "event_type": pa.array(rng.choice(["a", "b"], n)),
        "ts": pa.array(ts),
        "value": pa.array(value, pa.float64()),
    })
    pq.write_table(t, tmp_path / "events.parquet")

    got = events.q_events_value_regression(str(tmp_path))
    con = duckdb.connect()
    con.execute(f"CREATE VIEW events AS SELECT * FROM "
                f"read_parquet('{tmp_path}/events.parquet')")
    want = con.execute(events.Q_EVENTS_REGRESSION_SQL).df()
    # the sums themselves must have crossed 2^63 for this test to bite
    chk = con.execute(
        "SELECT max(n * sxy) FROM (SELECT count(*) AS n, "
        "sum(CAST(hour(ts) AS BIGINT) * CAST(round(value*100) AS BIGINT)) "
        "AS sxy FROM events GROUP BY event_type)").fetchone()[0]
    assert int(chk) > 2**63
    pd.testing.assert_frame_equal(_norm(got), _norm(want), check_dtype=False)
