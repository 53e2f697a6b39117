"""Fixed-vertex CSV reader.

Reference: processor/vertex/FixedVertexDataReader.scala:41-61 — a small
driver-side CSV of pre-created "similarity" vertices (recipe vertices),
with variadic 3-column property groups ``(name, type, value)`` and value
coercion by declared type (common/Utils.scala:43-66). Ids must be unique
and < reservedIdSpace (docs/classifiers/VertexClassifiers.md:70-71).

Example row: ``4,"similarity","recipe","string","catalog","equals","string","WD*"``
"""

from __future__ import annotations

import csv
from dataclasses import dataclass, field
from typing import Any

from grafink_spark.errors import GrafinkException


@dataclass
class FixedVertexProperty:
    name: str
    typ: str
    value: Any


@dataclass
class FixedVertex:
    id: int
    label: str
    properties: list[FixedVertexProperty] = field(default_factory=list)

    def prop(self, name: str) -> Any:
        for p in self.properties:
            if p.name == name:
                return p.value
        return None


def _coerce(typ: str, raw: str) -> Any:
    """Config-string type → python value (Utils.scala:55-66). Unknown
    types fall back to string (Utils.scala:40,52)."""
    t = typ.lower()
    if t in ("int", "integer"):
        return int(raw)
    if t == "long":
        return int(raw)
    if t == "float":
        return float(raw)
    if t == "double":
        return float(raw)
    if t in ("bool", "boolean"):
        return raw.strip().lower() == "true"
    if t == "byte":
        return int(raw)
    return str(raw)  # string / binary / unknown → string


def read_fixed_vertices(path: str, reserved_id_space: int | None = None) -> list[FixedVertex]:
    """Parse the CSV; validates id bound when reserved_id_space given."""
    out: list[FixedVertex] = []
    with open(path, newline="") as f:
        for row in csv.reader(f):
            if not row or not row[0].strip():
                continue
            vid = int(row[0])
            label = row[1].strip()
            props = []
            rest = row[2:]
            if len(rest) % 3 != 0:
                raise GrafinkException(
                    f"fixed vertex row for id={vid} has non-triplet property group"
                )
            for i in range(0, len(rest), 3):
                name, typ, raw = rest[i].strip(), rest[i + 1].strip(), rest[i + 2]
                props.append(FixedVertexProperty(name, typ, _coerce(typ, raw)))
            if reserved_id_space is not None and vid >= reserved_id_space:
                raise GrafinkException(
                    f"fixed vertex id {vid} >= reservedIdSpace {reserved_id_space}"
                )
            out.append(FixedVertex(vid, label, props))
    ids = [v.id for v in out]
    if len(ids) != len(set(ids)):
        raise GrafinkException("duplicate fixed vertex ids")
    return out
