"""User-agent randomization — the reference's ``RANDOM_USER_AGENT``
(``/root/reference/kryptone/utils/randomizers.py:9-19``): a zero-arg
callable that draws one line from ``data/user_agents.txt`` per call.

Two engine-grade differences:

- **Seedable.** The reference uses the process-global ``random``; every
  callable here accepts an explicit seed so actor pools get
  deterministic, reproducible per-actor agents (tests and golden parity
  need draw-for-draw stability).
- **Batch form.** ``user_agent_batch`` assigns agents to a whole Arrow
  batch of requests in one vectorized RNG call instead of one Python
  ``random.choice`` per row.

The shipped list (``kryptone_ray/data/user_agents.txt``) is a compact
set of well-known public browser/bot agent strings — same file contract
as the reference (one agent per line), independently assembled.
"""

from __future__ import annotations

import pathlib
from collections.abc import Callable

import numpy as np

_DEFAULT_PATH = pathlib.Path(__file__).parent.parent / "data" / "user_agents.txt"
_cache: dict[str, list[str]] = {}


def load_user_agents(path: str | pathlib.Path | None = None) -> list[str]:
    """Non-empty lines of the agents file, cached per path (the
    reference re-reads the file on every call — randomizers.py:11-15;
    one read per process is the batch-engine equivalent)."""
    p = str(path or _DEFAULT_PATH)
    if p not in _cache:
        lines = [ln.strip() for ln in
                 pathlib.Path(p).read_text().splitlines()]
        _cache[p] = [ln for ln in lines if ln]
    return _cache[p]


def random_user_agent(path: str | pathlib.Path | None = None,
                      seed: int | None = None) -> Callable[[], str]:
    """Factory matching the reference contract: returns a zero-arg
    callable, each call yielding one agent string. ``seed`` pins the
    draw sequence (None = nondeterministic, the reference behavior)."""
    agents = load_user_agents(path)
    rng = np.random.default_rng(seed)

    def wrapper() -> str:
        return agents[int(rng.integers(0, len(agents)))]

    return wrapper


# module-level instance, same name/shape as the reference's
# ``RANDOM_USER_AGENT()`` call sites (base.py:100, contrib/seo.py:535)
RANDOM_USER_AGENT: Callable[[], str] = random_user_agent()


def user_agent_batch(n: int, seed: int | None = None,
                     path: str | pathlib.Path | None = None) -> np.ndarray:
    """``n`` agent strings in one vectorized draw — assign per-request
    agents to a whole batch (object-dtype array, ready for an Arrow
    string column)."""
    agents = load_user_agents(path)
    rng = np.random.default_rng(seed)
    idx = rng.integers(0, len(agents), size=n)
    return np.array(agents, dtype=object)[idx]
