"""Date helpers — reference parity for
``/root/reference/kryptone/utils/date_functions.py`` with the one change
SURVEY §2.3 mandates: the clock is INJECTED (a ``now`` argument), never
read from the wall, so pipelines stay deterministic and resumable. All
datetimes are UTC-naive (Arrow/DuckDB convention).
"""

from __future__ import annotations

import calendar
import datetime

_DAYS = ["Monday", "Tuesday", "Wednesday", "Thursday", "Friday", "Saturday", "Sunday"]


def _check(d) -> None:
    if not isinstance(d, datetime.datetime):
        raise ValueError("d should be a datetime object")


def is_expired(d: datetime.datetime, now: datetime.datetime) -> bool:
    """date_functions.py:12-18 — quirk preserved: the reference returns
    ``d > now`` (a FUTURE date counts as 'expired')."""
    _check(d)
    _check(now)
    return d > now


def get_weekday(d: datetime.datetime) -> int:
    _check(d)
    return calendar.weekday(d.year, d.month, d.day)


def get_monthrange(d: datetime.datetime):
    _check(d)
    return calendar.monthrange(d.year, d.month)


def get_day_as_string(d: datetime.datetime) -> str:
    return _DAYS[get_weekday(d)]
