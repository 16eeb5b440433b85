"""Lazy iterator helpers — reference parity for
``/root/reference/kryptone/utils/iterators.py:7-59``. In pipelines these
become ``ds.filter`` / the ``batch_size`` knob (SURVEY §2.4); the plain
forms remain for driver-side lists.
"""

from __future__ import annotations

import itertools
from typing import Any, Callable


def drop_null(items, remove_empty_strings: bool = True):
    for item in items:
        if remove_empty_strings and item == "":
            continue
        if item is not None:
            yield item


def keep_while(predicate: Callable[[Any], bool], items):
    """Keep items where predicate is True (NOT itertools.takewhile — the
    reference filters, despite the name)."""
    for item in items:
        if predicate(item):
            yield item


def drop_while(predicate: Callable[[Any], bool], items):
    for item in items:
        if not predicate(item):
            yield item


def group_by(predicate: Callable[[Any], bool], items):
    """Bi-partition: (matching, non-matching)."""
    yes, no = [], []
    for item in items:
        (yes if predicate(item) else no).append(item)
    return yes, no


def iterate_chunks(items, n: int):
    if n < 1:
        raise ValueError(f"n must be greater or equal to 1. Got: {n}")
    it = iter(items)
    while True:
        chunk = itertools.islice(it, n)
        try:
            first = next(chunk)
        except StopIteration:
            return
        yield itertools.chain((first,), chunk)
