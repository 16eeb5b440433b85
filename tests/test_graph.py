"""Link-graph pipeline: the broadcast PageRank (small-input shape) and
the join-shaped distributed PageRank (100-TB shape, forced by patching
PAGERANK_BROADCAST_MAX_NODES) must produce bit-identical integer
ranks; the degree census must cover the full node domain including
zero-out-degree nodes."""

from __future__ import annotations

import pandas as pd
import pytest

SF = "/root/testdata/sf0.001"


@pytest.mark.usefixtures("ray_session")
def test_pagerank_distributed_equals_broadcast(monkeypatch):
    from kryptone_ray.pipelines import graph

    small = graph.q_graph_pagerank(SF)
    monkeypatch.setattr(graph, "PAGERANK_BROADCAST_MAX_NODES", -1)
    big = graph.q_graph_pagerank(SF)
    pd.testing.assert_frame_equal(small, big, check_dtype=False)


@pytest.mark.usefixtures("ray_session")
def test_pagerank_mass_is_conserved_to_rounding():
    # Σ rank == SCALE minus only integer floor-division dust: each
    # src node loses < DAMP_DEN*d per iteration to the floors, and the
    # base term loses < DAMP_DEN per node. A loose but load-bearing
    # bound — a wrong join/combine shape misses whole contributions
    # (≫ dust), a float drift breaks exactness elsewhere.
    from kryptone_ray.pipelines import graph

    r = graph.q_graph_pagerank(SF)
    total = int(r["rank_fp"].sum())
    assert total <= graph.SCALE
    dust_bound = graph.N_ITER * graph._G_ROWS * (
        graph.DAMP_DEN * int(r["rank_fp"].count()) + graph.DAMP_DEN)
    assert graph.SCALE - total < dust_bound


@pytest.mark.usefixtures("ray_session")
def test_degree_census_covers_node_domain():
    from kryptone_ray.pipelines import graph

    d = graph.q_graph_degree_stats(SF)
    assert int(d["n_nodes"].sum()) == graph._G_ROWS
    assert (d["out_degree"] >= 0).all()


@pytest.mark.usefixtures("ray_session")
def test_components_distributed_equals_broadcast(monkeypatch):
    from kryptone_ray.pipelines import graph

    small = graph.q_graph_components(SF)
    monkeypatch.setattr(graph, "PAGERANK_BROADCAST_MAX_NODES", -1)
    big = graph.q_graph_components(SF)
    pd.testing.assert_frame_equal(small, big, check_dtype=False)


@pytest.mark.usefixtures("ray_session")
def test_components_are_valid_labels():
    # every component label is the min node id of its member set, and
    # both endpoints of every edge share a label
    import pyarrow.parquet as pq

    from kryptone_ray.pipelines import graph

    cc = graph.q_graph_components(SF).set_index("node")["component"]
    edges = pq.read_table(graph._edges_dir() + "/edges.parquet").to_pandas()
    assert (cc.loc[edges["src"]].to_numpy()
            == cc.loc[edges["dst"]].to_numpy()).all()
    mins = cc.groupby(cc).apply(lambda s: s.index.min())
    assert (mins.index.to_numpy() == mins.to_numpy()).all()


@pytest.mark.usefixtures("ray_session")
def test_triangle_totals_are_multiple_of_three():
    # each triangle credits exactly 3 corners
    from kryptone_ray.pipelines import graph

    t = graph.q_graph_triangles(SF)
    assert int(t["n_triangles"].sum()) % 3 == 0
    assert int(t["n_triangles"].sum()) > 0
    assert (t["n_triangles"] > 0).all()


def test_edge_snapshot_is_deterministic(tmp_path):
    # two builds from scratch produce byte-identical edge tables
    import pyarrow.parquet as pq

    from kryptone_ray.pipelines import graph

    first = pq.read_table(graph._edges_dir() + "/edges.parquet")
    import shutil

    rebuilt_dir = graph._edges_dir()
    shutil.rmtree(rebuilt_dir)
    second = pq.read_table(graph._edges_dir() + "/edges.parquet")
    assert first.equals(second)
    assert first.num_rows > 0


@pytest.mark.usefixtures("ray_session")
def test_bfs_distributed_equals_broadcast(monkeypatch):
    """Bellman-Ford join iteration (past-the-gate shape) must reach the
    same fixed point as the level-synchronous broadcast BFS."""
    from kryptone_ray.pipelines import graph

    base = graph.q_graph_bfs_depth("")
    monkeypatch.setattr(graph, "PAGERANK_BROADCAST_MAX_NODES", -1)
    dist = graph.q_graph_bfs_depth("")
    pd.testing.assert_frame_equal(base.reset_index(drop=True),
                                  dist.reset_index(drop=True))
    assert (base["depth"][:graph.N_SEEDS] == 0).all()
