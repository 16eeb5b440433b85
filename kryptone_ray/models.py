"""Item models — reference parity for the user-dataclass item pipeline
(/root/reference/kryptone/contrib/models.py:13-121 ``BaseModel`` /
``Product``; /root/reference/kryptone/base.py:505-541 ``save_object``
``clean_<field>`` hooks).

In the new engine items are rows of an ``items`` Dataset with an explicit
Arrow schema (SURVEY §1.2); the dataclass model is the per-row validation
layer applied inside a ``map_batches`` body: construct → run
``clean_<field>`` hooks → emit a dict. ``items_batch`` is that body.
"""

from __future__ import annotations

import dataclasses
import pathlib
import re
from dataclasses import field
from typing import Optional
from urllib.parse import unquote, urlparse

import pyarrow as pa

from kryptone_ray.text.ops import Text


class BaseModel:
    """contrib/models.py:13-44 — field access, url helpers, CSV view."""

    def __getitem__(self, key):
        return getattr(self, key)

    @property
    def fields(self) -> list[str]:
        return [f.name for f in dataclasses.fields(self)]

    @property
    def get_url_object(self):
        return urlparse(str(unquote(getattr(self, "url", ""))))

    @property
    def url_stem(self) -> str:
        return pathlib.Path(str(getattr(self, "url", ""))).stem

    def as_csv(self) -> list:
        out = []
        for name in self.fields:
            value = getattr(self, name)
            out.append(" / ".join(value) if isinstance(value, (list, tuple)) else value)
        return out

    def set_collection_id(self, regex: str) -> None:
        """contrib/models.py:104-117 — named group 'collection_id' wins,
        else group(1), matched against the url path."""
        m = re.search(regex, self.get_url_object.path)
        if m:
            self.collection_id = m.groupdict().get("collection_id", None) or m.group(1)


@dataclasses.dataclass
class Product(BaseModel):
    """contrib/models.py:60-121 — the reference's flagship item model."""

    name: str
    description: str
    price: float
    url: str
    material: Optional[str] = None
    discount_price: Optional[float] = None
    breadcrumb: Optional[str] = None
    collection_id: Optional[str] = None
    number_of_colors: int = 1
    id_or_reference: Optional[str] = None
    images: list[str] = field(default_factory=list)
    composition: Optional[str] = None
    color: Optional[str] = None
    date: Optional[str] = None
    sizes: list[str] = field(default_factory=list)
    out_of_stock: bool = False
    inventory: Optional[str] = None
    is_404: bool = False
    other_detail: Optional[dict] = field(default_factory=dict)

    def __hash__(self):
        return hash((self.name, self.url, self.id_or_reference))

    @property
    def number_of_images(self) -> int:
        return len(self.images)

    def complex_name(self) -> str:
        name = str(Text(self.name, punctuation=True, accents=True)).replace(" ", "_")
        if self.id_or_reference is not None:
            return f"{name}_{self.id_or_reference}"
        return name


def validate_items(model, rows: list[dict]) -> list:
    """base.py:505-541 ``save_object`` semantics: construct the dataclass
    per row, then run every ``clean_<field>`` hook over its field value."""
    if model is None:
        raise ValueError("You need to implement a dataclass model")
    if not dataclasses.is_dataclass(model):
        raise ValueError("Your model should be an instance of a dataclass")
    names = [f.name for f in dataclasses.fields(model)]
    out = []
    for row in rows:
        inst = model(**row)
        for name in names:
            hook = getattr(inst, f"clean_{name}", None)
            if hook is not None:
                setattr(inst, name, hook(getattr(inst, name)))
        out.append(inst)
    return out


def items_batch(model, schema: pa.Schema):
    """Build a ``map_batches`` body that validates raw item rows through
    ``model`` and emits an Arrow table with ``schema`` — the distributed
    DATA_CONTAINER (base.py:289-290)."""

    def body(t: pa.Table) -> pa.Table:
        instances = validate_items(model, t.to_pylist())
        return pa.Table.from_pylist(
            [dataclasses.asdict(i) for i in instances], schema=schema
        )

    return body
