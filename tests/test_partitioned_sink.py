"""Resumable partitioned sink: sealed partitions are skipped on
re-run, unsealed ones are rewritten, and the files round-trip."""

import pathlib
import shutil

import pandas as pd
import pyarrow.parquet as pq
import pytest

from kryptone_ray.pipelines.common import T
from kryptone_ray.stages.sinks import write_partitioned_resumable

SF = "/root/testdata/sf0.001"
OUT = pathlib.Path("/tmp/kr_test_part_sink")


def build():
    ds = T(SF, "events", columns=["event_id", "ts", "event_type"])

    def day_col(df: pd.DataFrame) -> pd.DataFrame:
        out = df[["event_id", "event_type"]].copy()
        out["day"] = df["ts"].dt.strftime("%Y-%m-%d")
        return out

    return ds.map_batches(day_col, batch_format="pandas", batch_size=65536)


@pytest.mark.usefixtures("ray_session")
def test_write_skip_and_rewrite():
    shutil.rmtree(OUT, ignore_errors=True)
    m1 = write_partitioned_resumable(build, OUT, "day")
    assert not m1["skipped"].any()
    assert (m1["n_rows"] > 0).all()

    # every sealed partition has a marker and a readable parquet
    total = 0
    for _, row in m1.iterrows():
        pdir = OUT / f"day={row['partition']}"
        assert (pdir / "_SUCCESS").exists()
        total += pq.read_table(pdir / "part-0.parquet").num_rows
    assert total == m1["n_rows"].sum()

    # simulate a crash that lost one partition mid-write: remove its
    # marker (file may be torn) — re-run must rewrite ONLY that one
    victim = m1["partition"].iloc[0]
    (OUT / f"day={victim}" / "_SUCCESS").unlink()
    m2 = write_partitioned_resumable(build, OUT, "day")
    assert set(m2.loc[~m2["skipped"], "partition"]) == {victim}
    assert m2["skipped"].sum() == len(m2) - 1
    pd.testing.assert_frame_equal(
        m1[["partition", "n_rows"]], m2[["partition", "n_rows"]],
        check_dtype=False)


@pytest.mark.usefixtures("ray_session")
def test_zorder_export_clusters_and_seals():
    """The written shards are the operator's real output: z-sorted
    inside every file, disjoint ascending z-ranges across shards,
    every shard sealed."""
    import glob
    import hashlib

    import numpy as np
    import pyarrow.parquet as pq

    from kryptone_ray.pipelines import relational

    sf = "/root/testdata/sf0.001"
    relational.q_lineitem_zorder_export(sf)
    tag = hashlib.sha1(sf.encode()).hexdigest()[:10]
    dirs = sorted(glob.glob(f"/tmp/kr_zorder_{tag}/shard=*"),
                  key=lambda s: int(s.split("=")[1]))
    assert len(dirs) == 2 ** relational.ZORDER_SHARD_BITS
    prev_max = -1
    for d in dirs:
        assert (pathlib.Path(d) / "_SUCCESS").exists()
        bounds = []
        for f in glob.glob(d + "/*.parquet"):
            z = pq.read_table(f, columns=["z"])["z"].to_numpy()
            assert (np.diff(z) >= 0).all()
            bounds += [int(z.min()), int(z.max())]
        assert min(bounds) > prev_max
        prev_max = max(bounds)
