"""Deterministic image codecs for the synthetic crawl corpus.

The reference downloads image bytes and decodes them with PIL
(/root/reference/kryptone/base.py:363-471). PIL is not available in this
sandbox, so the corpus uses three self-contained codecs (FIXTURES.md F1a):

- ``raw``  — lossless: little-endian interleaved RGB8 rows.
- ``png``  — lossless: a real, spec-conformant PNG (8-bit RGB, filter 0)
             written/read with stdlib ``zlib`` + ``struct``.
- ``qraw`` — the documented "lossy" stand-in: RGB quantized to 6 bits per
             channel and re-expanded on decode. For uniform-ish pixel
             distributions this yields PSNR ≈ 42.7 dB ≥ the 40 dB gate in
             BASELINE.json's per-row invariant.

All functions are numpy-vectorized per image; the decode actor applies
them per Arrow batch.
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

FORMATS = ("raw", "png", "qraw")
LOSSLESS = frozenset({"raw", "png"})

_PNG_SIG = b"\x89PNG\r\n\x1a\n"


def encode_raw(pixels: np.ndarray) -> bytes:
    """(h, w, 3) uint8 → interleaved RGB8 bytes, row-major."""
    assert pixels.dtype == np.uint8 and pixels.ndim == 3 and pixels.shape[2] == 3
    return pixels.tobytes()


def decode_raw(data: bytes, w: int, h: int) -> np.ndarray:
    return np.frombuffer(data, dtype=np.uint8).reshape(h, w, 3)


def encode_qraw(pixels: np.ndarray) -> bytes:
    """Quantize to 6 bits/channel (drop the 2 LSBs)."""
    return (pixels >> 2).tobytes()


def decode_qraw(data: bytes, w: int, h: int) -> np.ndarray:
    """Re-expand 6-bit values to 8-bit range: v8 = (q << 2) | (q >> 4)."""
    q = np.frombuffer(data, dtype=np.uint8).reshape(h, w, 3)
    return ((q << 2) | (q >> 4)).astype(np.uint8)


def _chunk(tag: bytes, payload: bytes) -> bytes:
    return (
        struct.pack(">I", len(payload))
        + tag
        + payload
        + struct.pack(">I", zlib.crc32(tag + payload) & 0xFFFFFFFF)
    )


def encode_png(pixels: np.ndarray) -> bytes:
    """Minimal conformant PNG: 8-bit RGB, no interlace, filter type 0."""
    h, w, _ = pixels.shape
    ihdr = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)
    # prepend a 0x00 filter byte to every row
    raw = np.concatenate(
        [np.zeros((h, 1), dtype=np.uint8), pixels.reshape(h, w * 3)], axis=1
    ).tobytes()
    return (
        _PNG_SIG
        + _chunk(b"IHDR", ihdr)
        + _chunk(b"IDAT", zlib.compress(raw, 6))
        + _chunk(b"IEND", b"")
    )


def decode_png(data: bytes, w: int | None = None, h: int | None = None) -> np.ndarray:
    """Decode the PNG subset our encoder emits (8-bit RGB, filters 0-2).

    Filter types 0 (None), 1 (Sub) and 2 (Up) are un-applied; our encoder
    only writes 0, but 1/2 support keeps the decoder honest against other
    minimal encoders.
    """
    assert data[:8] == _PNG_SIG, "not a PNG"
    pos = 8
    idat = b""
    width = height = None
    while pos < len(data):
        (length,) = struct.unpack_from(">I", data, pos)
        tag = data[pos + 4 : pos + 8]
        payload = data[pos + 8 : pos + 8 + length]
        pos += 12 + length
        if tag == b"IHDR":
            width, height, depth, ctype, _, _, interlace = struct.unpack(
                ">IIBBBBB", payload
            )
            assert depth == 8 and ctype == 2 and interlace == 0, "unsupported PNG"
        elif tag == b"IDAT":
            idat += payload
        elif tag == b"IEND":
            break
    raw = zlib.decompress(idat)
    stride = width * 3
    # fast path: all filter bytes are 0 (what our encoder emits) — one
    # vectorized strided view instead of a per-row loop
    arr = np.frombuffer(raw, dtype=np.uint8).reshape(height, stride + 1)
    if not arr[:, 0].any():
        return arr[:, 1:].reshape(height, width, 3).copy()
    out = np.empty((height, stride), dtype=np.uint8)
    prev = np.zeros(stride, dtype=np.uint8)
    for y in range(height):
        ftype = raw[y * (stride + 1)]
        row = np.frombuffer(raw, dtype=np.uint8, count=stride, offset=y * (stride + 1) + 1)
        if ftype == 0:
            cur = row.copy()
        elif ftype == 2:  # Up
            cur = (row + prev) & 0xFF
        elif ftype == 1:  # Sub (sequential along the row, bpp=3)
            cur = row.copy()
            for x in range(3, stride):
                cur[x] = (cur[x] + cur[x - 3]) & 0xFF
        else:
            raise ValueError(f"unsupported PNG filter {ftype}")
        out[y] = cur
        prev = cur
    return out.reshape(height, width, 3)


_ENCODERS = {"raw": encode_raw, "png": encode_png, "qraw": encode_qraw}
_DECODERS = {"raw": decode_raw, "png": decode_png, "qraw": decode_qraw}


def encode(pixels: np.ndarray, fmt: str) -> bytes:
    return _ENCODERS[fmt](pixels)


def decode(data: bytes, fmt: str, w: int, h: int) -> np.ndarray:
    return _DECODERS[fmt](data, w, h)


def psnr(a: np.ndarray, b: np.ndarray) -> float:
    """Peak signal-to-noise ratio in dB between two uint8 images."""
    diff = a.astype(np.float64) - b.astype(np.float64)
    mse = float(np.mean(diff * diff))
    if mse == 0.0:
        return float("inf")
    return 20.0 * np.log10(255.0) - 10.0 * np.log10(mse)
