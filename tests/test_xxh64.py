"""XXH64 against the published reference test vectors (xxHash spec)."""

import numpy as np

from kryptone_ray.utils.xxh64 import xxh64, xxh64_batch


def test_known_vectors_seed0():
    # Vectors from the public xxHash specification / reference impl.
    assert xxh64(b"") == 0xEF46DB3751D8E999
    assert xxh64(b"a") == 0xD24EC4F1A98C6E5B
    assert xxh64(b"abc") == 0x44BC2CF5AD770999


def test_str_and_bytes_agree():
    assert xxh64("hello") == xxh64(b"hello")


def test_all_length_classes():
    # <4, 4-7, 8-31, >=32 byte paths all deterministic and distinct.
    data = [b"x" * n for n in (0, 1, 3, 4, 7, 8, 31, 32, 33, 100)]
    hashes = [xxh64(d) for d in data]
    assert len(set(hashes)) == len(hashes)


def test_seed_changes_hash():
    assert xxh64(b"abc", seed=1) != xxh64(b"abc", seed=0)


def test_batch_matches_scalar():
    urls = [f"https://host{i}.example.com/p/{i}" for i in range(50)]
    out = xxh64_batch(urls)
    assert out.dtype == np.uint64
    assert [int(v) for v in out] == [xxh64(u) for u in urls]
