"""JSON encoder — reference parity for
``/root/reference/kryptone/utils/encoders.py:8-65``
(``DefaultJsonEncoder``): datetime / date / timedelta / Decimal /
dataclass / UUID / bytes / ndarray → JSON-safe values. Arrow makes this
mostly moot for data; it remains for checkpoint manifests and small-state
storages.
"""

from __future__ import annotations

import dataclasses
import datetime
import json
import uuid
from decimal import Decimal


class DefaultJsonEncoder(json.JSONEncoder):
    def default(self, obj):
        if isinstance(obj, datetime.datetime):
            r = obj.isoformat()
            if obj.microsecond:
                r = r[:23] + r[26:]
            if r.endswith("+00:00"):
                r = r[:-6] + "Z"
            return r
        if isinstance(obj, datetime.date):
            return obj.isoformat()
        if isinstance(obj, datetime.timedelta):
            return str(obj.total_seconds())
        if isinstance(obj, Decimal):
            return str(obj)
        if dataclasses.is_dataclass(obj) and not isinstance(obj, type):
            return dataclasses.asdict(obj)
        if isinstance(obj, uuid.UUID):
            return str(obj)
        if isinstance(obj, (bytes, bytearray)):
            return obj.decode("utf-8", errors="replace")
        try:
            import numpy as np

            if isinstance(obj, np.ndarray):
                return obj.tolist()
            if isinstance(obj, np.generic):
                return obj.item()
        except ImportError:
            pass
        return super().default(obj)
