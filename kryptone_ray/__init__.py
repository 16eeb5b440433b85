"""kryptone_ray — a Ray-Data-native crawl/data-processing engine.

A from-scratch reimplementation of the *capabilities* of the reference
crawler (Zadigo/kryptone, read-only at /root/reference) on top of
``ray.data.Dataset`` pipelines: a distributed URL frontier (sharded
seen-set + per-host politeness scheduler), actor-pool fetch/decode
stages over Arrow batches of image+caption rows, and the full set of
URL / text / relational operators the reference exposes — each
re-expressed as vectorized ``map_batches`` stages.

No code is copied from the reference; file:line citations in
docstrings point at the behavior being reproduced.
"""

__version__ = "0.1.0"
