"""Graph schema catalog (replaces JanusGraph management / SchemaLoader).

Reference: schema/SchemaLoader.scala:83-229 declares vertex labels with
typed property keys (config-declared + data-inferred), edge labels with
MULTI multiplicity and SINGLE-cardinality properties, and three index
kinds; creation is idempotent (skip when the label exists,
SchemaLoader.scala:208-229). The HTTP ``/info`` endpoint
(api/.../InfoService.scala:37-102) reports it all back.

Here the catalog is a JSON document next to the graph tables. Indexes
carry no physical structure of their own — Spark's access paths are
partition pruning + parquet min/max + (optionally) sorted/bucketed table
copies — but declarations are preserved so ``info()`` answers the same
introspection queries, and the writer can honor a vertex-centric index
declaration by sorting edge files by (src, propVal).
"""

from __future__ import annotations

import json
import os
from dataclasses import asdict, dataclass, field

from pyspark.sql import DataFrame

# Spark type → graph property class, BinaryType downcast to String
# (common/Utils.scala:31-41)
_SPARK_TO_PROPERTY_CLASS = {
    "binary": "String",
    "tinyint": "Byte",
    "int": "Integer",
    "integer": "Integer",
    "bigint": "Long",
    "long": "Long",
    "float": "Float",
    "double": "Double",
    "string": "String",
    "boolean": "Boolean",
}


def property_class_for(spark_type: str) -> str:
    """DataType→class mapping with the reference's catch-all default
    (Utils.scala:40,52: anything else → String)."""
    return _SPARK_TO_PROPERTY_CLASS.get(spark_type.lower(), "String")


@dataclass
class PropertyKey:
    name: str
    typ: str  # property class name
    cardinality: str = "SINGLE"  # SchemaLoader.scala:93-98


@dataclass
class VertexLabel:
    name: str
    properties: list[PropertyKey] = field(default_factory=list)


@dataclass
class EdgeLabel:
    name: str
    multiplicity: str = "MULTI"  # SchemaLoader.scala:128-151
    properties: list[PropertyKey] = field(default_factory=list)


@dataclass
class IndexDecl:
    name: str
    kind: str  # composite | mixed | vertex-centric (SchemaLoader.scala:153-185)
    element: str  # vertex | edge
    properties: list[str] = field(default_factory=list)
    status: str = "ENABLED"


class GraphCatalog:
    def __init__(self, root: str):
        self.root = root
        self.path = os.path.join(root, "catalog.json")
        self._doc: dict = {"vertexLabels": [], "edgeLabels": [], "indexes": []}
        if os.path.exists(self.path):
            with open(self.path) as f:
                self._doc = json.load(f)

    # --------------------------------------------------------------- DDL

    def create_vertex_label(
        self,
        name: str,
        df: DataFrame | None = None,
        extra_properties: list[PropertyKey] | None = None,
    ) -> bool:
        """Idempotent vertex-label creation; property types inferred from
        the live DataFrame schema like the reference
        (SchemaLoader.scala:67-69,93-98). Returns False if it existed."""
        if self._find("vertexLabels", name):
            return False
        props = list(extra_properties or [])
        if df is not None:
            seen = {p.name for p in props}
            for f_ in df.schema.fields:
                if f_.name in seen:
                    continue
                props.append(
                    PropertyKey(f_.name, property_class_for(f_.dataType.simpleString()))
                )
        self._doc["vertexLabels"].append(asdict(VertexLabel(name, props)))
        self._save()
        return True

    def create_edge_label(self, name: str, property_key: str, typ: str) -> bool:
        if self._find("edgeLabels", name):
            return False
        self._doc["edgeLabels"].append(
            asdict(EdgeLabel(name, "MULTI", [PropertyKey(property_key, typ)]))
        )
        self._save()
        return True

    def create_index(
        self, name: str, kind: str, element: str, properties: list[str]
    ) -> bool:
        if any(i["name"] == name for i in self._doc["indexes"]):
            return False
        self._doc["indexes"].append(asdict(IndexDecl(name, kind, element, properties)))
        self._save()
        return True

    # ------------------------------------------------------ introspection

    def info(self) -> dict:
        """The /info response shape (InfoService.scala:37-102,
        RequestResponse.scala:9-39): labels, property keys with
        cardinality+type, and index inventories."""
        return {
            "vertexLabels": [v["name"] for v in self._doc["vertexLabels"]],
            "edgeLabels": [
                {"name": e["name"], "multiplicity": e["multiplicity"]}
                for e in self._doc["edgeLabels"]
            ],
            "propertyKeys": [
                {"name": p["name"], "type": p["typ"], "cardinality": p["cardinality"]}
                for lbl in self._doc["vertexLabels"] + self._doc["edgeLabels"]
                for p in lbl["properties"]
            ],
            "indexes": self._doc["indexes"],
        }

    # ------------------------------------------------------------ helpers

    def _find(self, kind: str, name: str):
        for item in self._doc[kind]:
            if item["name"] == name:
                return item
        return None

    def _save(self) -> None:
        os.makedirs(self.root, exist_ok=True)
        with open(self.path, "w") as f:
            json.dump(self._doc, f, indent=2)
