"""Edge classifier rule contract.

Reference: processor/edgerules/VertexClassifierRule.scala:21-39 and
processor/EdgeProcessor.scala:41-46 — every rule consumes
(loaded, current) vertex DataFrames and must return a DataFrame with
exactly the columns ``src: long, dst: long, propVal: <rule type>``,
plus static edge-label / property-key metadata.
"""

from __future__ import annotations

from abc import ABC, abstractmethod

from pyspark.sql import DataFrame

SRC = "src"
DST = "dst"
PROP_VAL = "propVal"

EDGE_SCHEMA = [SRC, DST, PROP_VAL]


class ClassifierRule(ABC):
    """A vertex-pair classifier producing edges."""

    @property
    @abstractmethod
    def name(self) -> str: ...

    @property
    @abstractmethod
    def edge_label(self) -> str: ...

    @property
    @abstractmethod
    def property_key(self) -> str: ...

    @abstractmethod
    def classify(self, loaded: DataFrame, current: DataFrame) -> DataFrame:
        """(loaded, current) → edges (src, dst, propVal)."""

    @staticmethod
    def validate(edges: DataFrame) -> DataFrame:
        """Presence check of the mandatory edge columns
        (EdgeProcessor.scala:94, spark-daria validatePresenceOfColumns)."""
        missing = [c for c in EDGE_SCHEMA if c not in edges.columns]
        if missing:
            raise ValueError(f"edge DataFrame missing mandatory columns: {missing}")
        return edges
