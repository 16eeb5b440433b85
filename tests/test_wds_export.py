"""WebDataset tar shard export: byte-identical tars across fresh runs,
the (sample.ext, sample.txt) adjacent-pair layout in ascending key
order, and sealed-shard resume (a .ok shard is never rewritten; an
unsealed/corrupt one is)."""

from __future__ import annotations

import hashlib
import pathlib
import shutil
import tarfile

import pytest

SF = "/root/testdata/sf0.001"


def _out_dir():
    from kryptone_ray.pipelines import multimodal as mm

    snap = mm._wds_src_dir()
    tag = hashlib.sha1(f"{snap}|{mm._WDS_SHARDS}".encode()).hexdigest()[:10]
    return pathlib.Path(f"/tmp/kr_wds_shards_{tag}")


@pytest.mark.usefixtures("ray_session")
def test_tars_byte_identical_across_fresh_runs():
    from kryptone_ray.pipelines import multimodal as mm

    shutil.rmtree(_out_dir(), ignore_errors=True)
    mm.q_image_wds_export(SF)
    first = {p.name: p.read_bytes() for p in _out_dir().glob("*.tar")}
    shutil.rmtree(_out_dir(), ignore_errors=True)
    mm.q_image_wds_export(SF)
    second = {p.name: p.read_bytes() for p in _out_dir().glob("*.tar")}
    assert first.keys() == second.keys() and len(first) == mm._WDS_SHARDS
    for name in first:
        assert first[name] == second[name], name


@pytest.mark.usefixtures("ray_session")
def test_webdataset_pair_layout():
    from kryptone_ray.pipelines import multimodal as mm

    mm.q_image_wds_export(SF)
    for p in _out_dir().glob("*.tar"):
        with tarfile.open(p) as tf:
            names = [m.name for m in tf.getmembers()]
        assert len(names) % 2 == 0 and names
        keys = []
        for i in range(0, len(names), 2):
            k1, ext1 = names[i].split(".", 1)
            k2, ext2 = names[i + 1].split(".", 1)
            assert k1 == k2 and ext1 != "txt" and ext2 == "txt"
            keys.append(int(k1))
        assert keys == sorted(keys)


@pytest.mark.usefixtures("ray_session")
def test_resume_skips_sealed_rewrites_unsealed():
    from kryptone_ray.pipelines import multimodal as mm

    mm.q_image_wds_export(SF)
    out = _out_dir()
    sealed = out / "shard-00001.tar"
    good = sealed.read_bytes()
    # sentinel: a VALID but clearly-different tar (read-back parses
    # every tar, so raw garbage would abort the query, not prove skip)
    import io

    buf = io.BytesIO()
    with tarfile.open(fileobj=buf, mode="w") as tf:
        ti = tarfile.TarInfo(name="0000000001.txt")
        ti.size = 1
        tf.addfile(ti, io.BytesIO(b"x"))
    sealed_sentinel = buf.getvalue()
    sealed.write_bytes(sealed_sentinel)  # .ok kept → must be skipped

    broken = out / "shard-00000.tar"
    broken.write_bytes(b"CORRUPT")
    (out / "shard-00000.ok").unlink()  # unsealed → must be rewritten

    res = mm.q_image_wds_export(SF)
    # skipped: the sentinel survives (resume did not re-pack shard 1)
    assert sealed.read_bytes() == sealed_sentinel
    # rewritten: shard 0 is a valid tar again
    with tarfile.open(broken) as tf:
        assert len(tf.getmembers()) > 0
    # repair the sentinel for later tests / queries
    sealed.write_bytes(good)
    assert res is not None
