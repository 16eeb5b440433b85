"""Path-building normalizers — reference parity for
``/root/reference/kryptone/utils/functions.py`` (directory derivation
used by the image-download sink; the derived path becomes a computed
partition column in the new engine, SURVEY.md §2.1).
"""

from __future__ import annotations

import pathlib
import string
from urllib.parse import urlparse

from kryptone_ray.text.ops import normalize_spaces, remove_accents, remove_punctuation
from kryptone_ray.utils.xxh64 import xxh64


def directory_from_breadcrumbs(text: str, separator: str = ">",
                               remove_last: bool = True,
                               exclude: list[str] | None = None) -> pathlib.PurePosixPath:
    """functions.py:11-38 — breadcrumb text → directory path: lowercase,
    split on the separator, drop the final crumb (the current page),
    punctuation-strip each token and join with underscores."""
    tokens = normalize_spaces(text.lower()).split(separator)
    if remove_last:
        tokens = tokens[: len(tokens) - 1]
    stripped = (t.strip() for t in tokens)
    if exclude:
        tokens = [t for t in stripped if t not in exclude]
    else:
        tokens = list(stripped)
    built = [remove_punctuation(t.strip()).replace(" ", "_").lower() for t in tokens]
    return pathlib.PurePosixPath("/".join(built))


def directory_from_url(url_or_path: str, exclude: list[str] | None = None) -> pathlib.PurePosixPath:
    """functions.py:41-62 — URL path → directory: split segments, drop
    excluded/empty, '-'→'_', accents/punctuation stripped, drop the last
    segment (the file)."""
    exclude = exclude or []
    path = url_or_path
    if "://" in path:
        path = urlparse(path).path
    tokens = [t for t in path.split("/") if t not in exclude and t != ""]
    tokens = [
        remove_accents(remove_punctuation(t.replace("-", "_").lower(), keep=["_"]))
        for t in tokens
    ]
    if tokens:
        tokens.pop(-1)
    return pathlib.PurePosixPath("/".join(tokens))


def create_filename(length: int = 5, extension: str | None = None,
                    suffix: str | None = None, *, seed_key: str = "",
                    date: str | None = None) -> str:
    """functions.py:64-79, DETERMINISTIC variant: the reference draws
    random characters (which breaks reproducibility — SURVEY §2.3); here
    the name is derived from ``xxh64(seed_key)`` so the same logical
    record always maps to the same file. ``date`` (ISO string) replaces
    the reference's wall-clock suffix — the clock is injected, never
    read (determinism)."""
    chars = string.ascii_lowercase + string.digits
    h = xxh64(seed_key or "kryptone")
    name = "".join(chars[(h >> (6 * i)) % len(chars)] for i in range(length))
    if suffix is not None:
        name = f"{name}_{suffix}"
    elif date is not None:
        name = f"{name}_{date.replace('-', '_')}"
    if extension is not None:
        return f"{name}.{extension}"
    return name
