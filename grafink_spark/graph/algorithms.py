"""Graph algorithms over edge DataFrames.

The reference delegates analytics to JanusGraph/Gremlin (SURVEY §2.8
covers the read surface); a Spark-native engine runs them directly on
the edge tables. PageRank here is the standard synchronous formulation
pr' = (1-d)/N + d·Σ pr(src)/outdeg(src), fixed iteration count.

Scale notes: each iteration is one equi join (ranks onto edges, both
sides shuffle-partitioned by the join key) plus one keyed aggregation
with map-side partials; lineage is cut per iteration with
localCheckpoint so the plan stays constant-depth regardless of iters
(the same pattern as dedup.connected_components). Dangling vertices
(no out-edges) leak their mass — the common simplified variant; the
oracle replays the identical formulation, unrolled.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def pagerank(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    iters: int = 3,
    damping: float = 0.85,
) -> DataFrame:
    """(id, rank) after ``iters`` iterations over the DIRECTED edge set
    (pass both directions for an undirected graph)."""
    e = edges.select(F.col(src).alias("_s"), F.col(dst).alias("_d"))
    verts = (
        e.select(F.col("_s").alias("id"))
        .unionByName(e.select(F.col("_d").alias("id")))
        .distinct()
        .localCheckpoint()
    )
    n = verts.count()
    deg = e.groupBy("_s").agg(F.count(F.lit(1)).alias("_deg"))
    ed = e.join(deg, "_s").localCheckpoint()
    pr = verts.withColumn("rank", F.lit(1.0 / n))
    base = (1.0 - damping) / n
    for _ in range(iters):
        contrib = (
            ed.join(pr.withColumnRenamed("id", "_s"), "_s")
            .groupBy("_d")
            .agg(F.sum(F.col("rank") / F.col("_deg")).alias("_in"))
        )
        pr = (
            verts.join(contrib, verts["id"] == contrib["_d"], "left")
            .select(
                "id",
                (base + damping * F.coalesce(F.col("_in"), F.lit(0.0))).alias(
                    "rank"
                ),
            )
            .localCheckpoint()
        )
    return pr
