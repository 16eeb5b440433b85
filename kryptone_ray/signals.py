"""Signals — reference parity for ``/root/reference/kryptone/signals.py``
and ``signal_constants.py:1-13``: a Django-style synchronous pub/sub used
by lifecycle hooks (post_init / navigation / db_signal /
registry_populated). Driver-side only — distributed stages report
through tables, not signals (SURVEY §2.8).
"""

from __future__ import annotations

from collections import defaultdict
from typing import Any, Callable

POST_INIT = "post_init"
NAVIGATION = "navigation"
DB_SIGNAL = "db_signal"
REGISTRY_POPULATED = "registry_populated"


class Signal:
    def __init__(self, name: str):
        self.name = name
        self._receivers: list[Callable] = []

    def connect(self, receiver: Callable) -> None:
        if receiver not in self._receivers:
            self._receivers.append(receiver)

    def disconnect(self, receiver: Callable) -> None:
        if receiver in self._receivers:
            self._receivers.remove(receiver)

    def send(self, sender: Any = None, **kwargs) -> list:
        return [r(sender=sender, **kwargs) for r in self._receivers]


_registry: dict[str, Signal] = {}


def signal(name: str) -> Signal:
    if name not in _registry:
        _registry[name] = Signal(name)
    return _registry[name]


post_init = signal(POST_INIT)
navigation = signal(NAVIGATION)
db_signal = signal(DB_SIGNAL)
registry_populated = signal(REGISTRY_POPULATED)
