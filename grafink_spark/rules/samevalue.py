"""Same-value classifier — connect vertices sharing a column value.

Reference: processor/edgerules/SameValueClassifier.scala:31-62. For each
configured column:

- **new × new clique**: every unordered pair of current-batch vertices
  with equal column values (reference: groupByKey + combinations(2));
- **new × old pairs**: equi join of current against loaded on the column
  (src = new id, dst = loaded id);

edge label ``exactmatch``, propVal = the **column name**.

Spark-first design: the clique is a self equi-join with ``src < dst``
instead of collecting each group — semantically identical to
combinations(2) over id-sorted groups, but it streams through a
sort-merge join rather than materializing a whole group in one task
(a 1M-member group would OOM a collect_list; the join just produces its
pairs). Null keys: the reference groups nulls together (flatMapGroups),
so the clique join is null-safe; the new×old join is a plain equi join
(nulls dropped), also matching the reference.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from grafink_spark.rules.base import DST, PROP_VAL, SRC, ClassifierRule


class SameValueClassifier(ClassifierRule):
    def __init__(self, cols_to_connect: list[str]):
        if not cols_to_connect:
            raise ValueError("sameValueClassifier needs at least one column")
        self.cols_to_connect = list(cols_to_connect)

    @property
    def name(self) -> str:
        return "sameValueClassifier"

    @property
    def edge_label(self) -> str:
        return "exactmatch"

    @property
    def property_key(self) -> str:
        return "propertyname"

    def classify(self, loaded: DataFrame, current: DataFrame) -> DataFrame:
        outs = [
            self._edges_for_column(loaded, current, c) for c in self.cols_to_connect
        ]
        return reduce(lambda a, b: a.unionByName(b), outs)

    def _edges_for_column(
        self, loaded: DataFrame, current: DataFrame, column: str
    ) -> DataFrame:
        new = current.select(F.col(column).alias("_k"), F.col("id"))

        a = new.select(F.col("_k"), F.col("id").alias(SRC))
        b = new.select(F.col("_k").alias("_k2"), F.col("id").alias(DST))
        clique = (
            a.join(
                b,
                F.col("_k").eqNullSafe(F.col("_k2")) & (F.col(SRC) < F.col(DST)),
                "inner",
            )
            .select(SRC, DST, F.lit(column).alias(PROP_VAL))
        )

        old = loaded.select(F.col(column).alias("_k"), F.col("id").alias(DST))
        cross = (
            new.select(F.col("_k"), F.col("id").alias(SRC))
            .join(old, "_k", "inner")
            .select(SRC, DST, F.lit(column).alias(PROP_VAL))
        )
        return clique.unionByName(cross)
