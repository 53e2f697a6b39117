"""Graph algorithms over edge DataFrames.

The reference delegates analytics to JanusGraph/Gremlin (SURVEY §2.8
covers the read surface); a Spark-native engine runs them directly on
the edge tables. PageRank here is the standard synchronous formulation
pr' = (1-d)/N + d·Σ pr(src)/outdeg(src), fixed iteration count.

Scale notes: each iteration is one equi join (ranks onto edges, both
sides shuffle-partitioned by the join key) plus one keyed aggregation
with map-side partials; lineage of the evolving frame is cut every
``PIN_EVERY`` iterations (see ``_loop_cp``) so plan depth stays
bounded for deep loops while the default small round counts run as a
single pin-free job. Dangling vertices
(no out-edges) leak their mass — the common simplified variant; the
oracle replays the identical formulation, unrolled.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from grafink_spark.util import pin


# Reliable-checkpoint support: every iterative algorithm takes an
# explicit ``checkpoint_dir`` (kept for API stability); the mechanics —
# reliable df.checkpoint() into an HDFS/S3 dir vs fast localCheckpoint,
# plus the session-conf fallback ``spark.grafink.checkpointDir`` —
# live in util.pin, which the whole engine now routes through.


def _cp(df: DataFrame, checkpoint_dir: str | None = None) -> DataFrame:
    return pin(df, checkpoint_dir=checkpoint_dir)


# In-loop lineage policy (optimization round 9). A LINEAR iteration
# chain — each round's evolving frame consumed exactly once, by the
# next round — needs no per-round checkpoint for single execution: the
# undrained plan runs as ONE job with zero re-computation. A pin inside
# such a loop therefore only bounds PLAN DEPTH (optimizer/codegen/
# scheduler cost, which grows with the round count, never with data
# size), but each eager pin costs a full driver→cluster job round-trip
# plus a block-manager materialization — at bench scale ~0.3-0.5 s per
# round of pure overhead, and at any scale one scheduling barrier per
# round. So evolving frames in linear loops are pinned every PIN_EVERY
# rounds rather than every round: the default 2-3 analytic rounds run
# pin-free (one job at the drain), while a 50-round caller still gets
# constant-bounded plan depth. Static multi-consumer frames (edge
# lists, vertex tables — genuinely re-derived per consumer without a
# pin) keep their unconditional pins. Results are bit-identical: the
# same expressions evaluate either way (decimal sums are
# partition-order independent by design).
PIN_EVERY = 4


def _loop_cp(
    df: DataFrame, round_idx: int, checkpoint_dir: str | None = None
) -> DataFrame:
    """Pin the evolving frame of a linear iteration loop on every
    ``PIN_EVERY``-th round (``round_idx`` counts from 0); identity
    otherwise. See the policy note above."""
    if (round_idx + 1) % PIN_EVERY == 0:
        return _cp(df, checkpoint_dir)
    return df


def pagerank(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    iters: int = 3,
    damping: float = 0.85,
    checkpoint_dir: str | None = None,
    exact: bool = True,
) -> DataFrame:
    """(id, rank) after ``iters`` iterations over the DIRECTED edge set
    (pass both directions for an undirected graph).

    ``exact=True`` (default) accumulates contributions as
    decimal(38,18) — partition-order independent, bit-identical across
    engines (the oracle contract). ``exact=False`` sums plain doubles:
    the production fast path at scale (no 128-bit decimal arithmetic
    per addend); ranks then agree with the exact path to ~1 ulp but the
    last digit can vary between runs. Measured as the
    pagerank_exact/pagerank_double stress pair."""
    # cut lineage on the raw edge list FIRST: verts/deg/ed all consume
    # it, and the upstream derivation is often a whole classifier
    # pipeline — without this it re-executes once per consumer
    e = edges.select(
        F.col(src).alias("_s"), F.col(dst).alias("_d")
    ).transform(_cp, checkpoint_dir)
    verts = (
        e.select(F.col("_s").alias("id"))
        .unionByName(e.select(F.col("_d").alias("id")))
        .distinct()
        .transform(_cp, checkpoint_dir)
    )
    n = verts.count()
    deg = e.groupBy("_s").agg(F.count(F.lit(1)).alias("_deg"))
    # pre-partition the (static) weighted edge list on the per-iteration
    # join key; the checkpoint preserves the hash partitioning, so each
    # iteration shuffles only the vertex-sized rank table, never the edges
    ed = e.join(deg, "_s").repartition("_s").transform(_cp, checkpoint_dir)
    pr = verts.withColumn("rank", F.lit(1.0 / n))
    base = (1.0 - damping) / n
    for _i in range(iters):
        contrib = (
            ed.join(pr.withColumnRenamed("id", "_s"), "_s")
            .groupBy("_d")
            # decimal addends: a plain double sum is accumulation-order
            # dependent, so a rank straddling the output rounding
            # boundary can flip between runs/engines (r2 review: a
            # confirmed 0.370813-vs-0.370812 oracle mismatch). 18
            # fractional digits cover the full double mantissa of
            # sub-1.0 ranks; the per-element double->decimal rounding
            # is identical in Spark and DuckDB.
            .agg(
                (
                    F.sum(
                        (F.col("rank") / F.col("_deg")).cast("decimal(38,18)")
                    ).cast("double")
                    if exact
                    else F.sum(F.col("rank") / F.col("_deg"))
                ).alias("_in")
            )
        )
        pr = (
            verts.join(contrib, verts["id"] == contrib["_d"], "left")
            .select(
                "id",
                (base + damping * F.coalesce(F.col("_in"), F.lit(0.0))).alias(
                    "rank"
                ),
            )
            .transform(_loop_cp, _i, checkpoint_dir)
        )
    return pr


def triangle_counts(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    checkpoint_dir: str | None = None,
) -> DataFrame:
    """Per-vertex triangle counts (id, n_triangles) over the undirected
    simple graph induced by ``edges`` (direction and duplicates are
    normalized away; self-loops dropped). Vertices in no triangle are
    omitted.

    Algorithm: degree orientation — each undirected edge points from
    its lower-(degree, id) endpoint to the higher one, wedges are
    enumerated only at their lowest-ranked apex, and a wedge closes
    into a triangle iff the third edge exists. Every triangle's
    orientation is an acyclic tournament with exactly one out-degree-2
    vertex, so each triangle is found exactly once.

    Scale: the classic O(m^1.5) bound — out-degrees are capped near
    sqrt(m) because a vertex only points at higher-degree neighbors, so
    hub vertices (the skew hazard of the naive id-ordered wedge join)
    never fan out. Three hash shuffles: degree agg, wedge self-join on
    the apex, closure equi-join on the (y1, y2) pair key.
    """
    e = edges.select(F.col(src).alias("_a"), F.col(dst).alias("_b"))
    und = (
        e.where(F.col("_a") != F.col("_b"))
        .select(
            F.least("_a", "_b").alias("u"), F.greatest("_a", "_b").alias("v")
        )
        .distinct()
        # the normalized edge list feeds three consumers (degree agg,
        # orientation join, closure join) — cut lineage once instead of
        # re-running the upstream edge derivation (often a full
        # classifier pipeline) three times
        .transform(_cp, checkpoint_dir)
    )
    deg = (
        und.select(F.col("u").alias("id"))
        .unionByName(und.select(F.col("v").alias("id")))
        .groupBy("id")
        .agg(F.count(F.lit(1)).alias("_deg"))
    )
    j = (
        und.join(deg.select(F.col("id").alias("u"), F.col("_deg").alias("_du")), "u")
        .join(deg.select(F.col("id").alias("v"), F.col("_deg").alias("_dv")), "v")
    )
    u_first = (F.col("_du") < F.col("_dv")) | (
        (F.col("_du") == F.col("_dv")) & (F.col("u") < F.col("v"))
    )
    # materialized once: both sides of the wedge self-join read it
    oriented = j.select(
        F.when(u_first, F.col("u")).otherwise(F.col("v")).alias("x"),
        F.when(u_first, F.col("v")).otherwise(F.col("u")).alias("y"),
    ).transform(_cp, checkpoint_dir)
    e1 = oriented.select("x", F.col("y").alias("y1"))
    e2 = oriented.select("x", F.col("y").alias("y2"))
    wedges = e1.join(e2, "x").where(F.col("y1") < F.col("y2"))
    tri = wedges.join(
        und,
        (wedges["y1"] == und["u"]) & (wedges["y2"] == und["v"]),
    ).select("x", "y1", "y2")
    verts = (
        tri.select(F.col("x").alias("id"))
        .unionByName(tri.select(F.col("y1").alias("id")))
        .unionByName(tri.select(F.col("y2").alias("id")))
    )
    return verts.groupBy("id").agg(F.count(F.lit(1)).alias("n_triangles"))


def k_core(
    edges: DataFrame,
    k: int = 3,
    src: str = "src",
    dst: str = "dst",
    rounds: int = 4,
    checkpoint_dir: str | None = None,
) -> DataFrame:
    """(id, core_degree) for vertices surviving ``rounds`` peel rounds
    of k-core decomposition over the undirected simple graph: each
    round drops vertices with degree < k and the edges touching them.
    A FIXED round count (like pagerank's fixed iterations) keeps the
    result deterministic and oracle-replayable; graphs whose peeling
    cascades deeper than ``rounds`` return a superset of the true
    k-core (rounds ≈ log(n) suffices in practice — each round removes
    every currently-underweight vertex at once, not one vertex).

    Scale: per round one degree aggregation + two left-semi joins, all
    hash-partitioned on vertex id; lineage is cut per round with
    localCheckpoint so the plan stays constant-depth. The edge list
    shrinks monotonically, so later rounds are cheaper.
    """
    cur = (
        edges.select(F.col(src).alias("_a"), F.col(dst).alias("_b"))
        .where(F.col("_a") != F.col("_b"))
        .select(
            F.least("_a", "_b").alias("u"), F.greatest("_a", "_b").alias("v")
        )
        .distinct()
        .transform(_cp, checkpoint_dir)
    )
    for _ in range(rounds):
        deg = (
            cur.select(F.col("u").alias("id"))
            .unionByName(cur.select(F.col("v").alias("id")))
            .groupBy("id")
            .agg(F.count(F.lit(1)).alias("_deg"))
        )
        keep = deg.where(F.col("_deg") >= k).select("id")
        cur = (
            cur.join(keep.withColumnRenamed("id", "u"), "u", "left_semi")
            .join(keep.withColumnRenamed("id", "v"), "v", "left_semi")
            .transform(_cp, checkpoint_dir)
        )
    return (
        cur.select(F.col("u").alias("id"))
        .unionByName(cur.select(F.col("v").alias("id")))
        .groupBy("id")
        .agg(F.count(F.lit(1)).alias("core_degree"))
    )


def bfs_distances(
    edges: DataFrame,
    source,
    max_hops: int = 6,
    src: str = "src",
    dst: str = "dst",
    checkpoint_dir: str | None = None,
) -> DataFrame:
    """(id, dist) — minimum hop count from ``source`` over the DIRECTED
    edge set (pass both directions for undirected), bounded at
    ``max_hops``. The read surface's k-hop neighborhood (SURVEY §2.8,
    `g.V(id).outE()...`) generalized to whole-reachability with
    distances.

    Scale: classic frontier BFS — per hop ONE equi join of the frontier
    onto the (static, pre-partitioned) edge list plus one anti-join
    against the seen set, both hash-partitioned on vertex id. Frontier
    and seen set are localCheckpoint-ed every hop so plan depth and
    re-execution stay O(1) per hop regardless of depth (same pattern as
    graph.query.neighborhood / dedup.connected_components). Early-exits
    when the frontier empties.
    """
    spark = edges.sparkSession
    e = edges.select(
        F.col(src).alias("_s"), F.col(dst).alias("_d")
    ).distinct()
    # static join side: partition once on the probe key, reused per hop
    e = e.repartition("_s").transform(_cp, checkpoint_dir)
    seen = spark.createDataFrame([(int(source), 0)], "id long, dist int")
    frontier = seen
    for h in range(1, max_hops + 1):
        nxt = (
            e.join(
                frontier.select(F.col("id").alias("_s")), "_s"
            )
            .select(F.col("_d").alias("id"))
            .distinct()
            .join(seen.select("id"), "id", "left_anti")
            .withColumn("dist", F.lit(h))
            .transform(_cp, checkpoint_dir)
        )
        if not nxt.take(1):
            break
        seen = seen.unionByName(nxt).transform(_cp, checkpoint_dir)
        frontier = nxt
    return seen


def adamic_adar(
    edges: DataFrame,
    min_common: int = 2,
    src: str = "src",
    dst: str = "dst",
    checkpoint_dir: str | None = None,
) -> DataFrame:
    """Link prediction over the undirected simple graph: for every
    non-adjacent pair (a, b) with ≥ ``min_common`` common neighbors,
    emit (a, b, common_neighbors, aa_score) where aa_score =
    Σ_n 1/ln(deg(n)) over the common neighbors n (Adamic-Adar).

    Scale: the wedge self-join is the cost driver — it shuffles both
    copies of the edge list on the shared-neighbor key n, and its
    output is Σ_n deg(n)², so hub vertices dominate. Callers should
    bound hub degree upstream (drop or sample neighbors of celebrity
    nodes) exactly as for triangle counting; within that bound the plan
    is two hash joins + one pair aggregation, no cartesian anywhere.
    The existing-edge exclusion is a left-anti join on the canonical
    (least, greatest) pair key.
    """
    und = (
        edges.select(F.col(src).alias("_a"), F.col(dst).alias("_b"))
        .where(F.col("_a") != F.col("_b"))
        .select(
            F.least("_a", "_b").alias("u"), F.greatest("_a", "_b").alias("v")
        )
        .distinct()
        .transform(_cp, checkpoint_dir)
    )
    both = und.unionByName(
        und.select(F.col("v").alias("u"), F.col("u").alias("v"))
    )
    deg = both.groupBy(F.col("u").alias("n")).agg(
        F.count(F.lit(1)).alias("_deg")
    )
    # wedges through n: (a - n - b), a < b
    l = both.select(F.col("u").alias("n"), F.col("v").alias("a"))
    r = both.select(F.col("u").alias("n"), F.col("v").alias("b"))
    wedges = (
        l.join(r, "n")
        .where(F.col("a") < F.col("b"))
        .join(deg, "n")
    )
    pairs = wedges.groupBy("a", "b").agg(
        F.count(F.lit(1)).alias("common_neighbors"),
        F.sum(F.lit(1.0) / F.log(F.col("_deg").cast("double"))).alias("_aa"),
    )
    return (
        pairs.join(
            und,
            (pairs["a"] == und["u"]) & (pairs["b"] == und["v"]),
            "left_anti",
        )
        .where(F.col("common_neighbors") >= min_common)
        .select(
            "a", "b", "common_neighbors", F.round("_aa", 6).alias("aa_score")
        )
    )


def shortest_paths(
    edges: DataFrame,
    source,
    rounds: int = 4,
    src: str = "src",
    dst: str = "dst",
    weight: str = "weight",
    checkpoint_dir: str | None = None,
) -> DataFrame:
    """(id, dist) — minimum-weight path cost from ``source`` using at
    most ``rounds`` edges (bounded Bellman-Ford relaxation over the
    DIRECTED edge set; pass both directions for undirected). A fixed
    round budget makes the result deterministic and oracle-replayable;
    rounds ≥ graph diameter gives exact shortest paths.

    Scale: each round is one equi join of the current distance table
    onto the statically pre-partitioned edge list + one min-aggregation
    — both hash-partitioned on vertex id, distance table is
    vertex-sized. localCheckpoint per round keeps plan depth O(1)
    (the shared pattern of pagerank/k_core/bfs here). min() is
    order-insensitive, so float path costs are reproducible across
    partitionings.
    """
    spark = edges.sparkSession
    e = (
        edges.select(
            F.col(src).alias("_s"),
            F.col(dst).alias("_d"),
            F.col(weight).cast("double").alias("_w"),
        )
        .groupBy("_s", "_d")
        .agg(F.min("_w").alias("_w"))
        .repartition("_s")
        .transform(_cp, checkpoint_dir)
    )
    dist = spark.createDataFrame([(int(source), 0.0)], "id long, dist double")
    for _ in range(rounds):
        relaxed = (
            e.join(dist.select(F.col("id").alias("_s"), "dist"), "_s")
            .select(F.col("_d").alias("id"), (F.col("dist") + F.col("_w")).alias("dist"))
        )
        dist = (
            dist.unionByName(relaxed)
            .groupBy("id")
            .agg(F.min("dist").alias("dist"))
            .transform(_cp, checkpoint_dir)
        )
    return dist


def label_propagation(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    iters: int = 2,
    checkpoint_dir: str | None = None,
) -> DataFrame:
    """Synchronous label-propagation community detection: labels start
    as vertex ids; each round every vertex adopts the most frequent
    label among its neighbors, ties broken by smallest label. Fixed
    ``iters`` synchronous rounds make the result deterministic (the
    classic async variant is run-order dependent), which is what lets
    the oracle replay it round-for-round in SQL.

    Plan/scale per round: one (vertex, label) count shuffle + one
    per-vertex argmax — the argmax is a max_by over the count struct
    (partial-aggregates map-side; no rank window, no row explosion).
    The static edge list is pre-partitioned on the join key once and
    checkpointed, so each round shuffles only the vertex-sized label
    table. Labels monotonically coarsen; 2-5 rounds suffice for
    community structure (Raghavan et al., 2007).
    """
    e = edges.select(
        F.col(src).alias("_u"), F.col(dst).alias("_v")
    ).transform(_cp, checkpoint_dir)
    both = e.unionByName(
        e.select(F.col("_v").alias("_u"), F.col("_u").alias("_v"))
    ).repartition("_v").transform(_cp, checkpoint_dir)
    labels = (
        both.select(F.col("_u").alias("id"))
        .distinct()
        .withColumn("label", F.col("id"))
        .transform(_cp, checkpoint_dir)
    )
    for _i in range(iters):
        counted = (
            both.join(labels.withColumnRenamed("id", "_v"), "_v")
            .groupBy("_u", "label")
            .agg(F.count(F.lit(1)).alias("_c"))
        )
        # argmax(count) with min-label tie-break: min_by over a struct
        # ordered (-count, label) — one agg, no window. Negating the
        # COUNT (always numeric) instead of the label keeps the
        # tie-break well-defined for string vertex ids too (negating
        # a string label nulls out / errors under ANSI)
        labels = (
            counted.groupBy("_u")
            .agg(
                F.min_by(
                    F.col("label"), F.struct(-F.col("_c"), F.col("label"))
                ).alias("label")
            )
            .select(F.col("_u").alias("id"), "label")
            .transform(_loop_cp, _i, checkpoint_dir)
        )
    return labels


def personalized_pagerank(
    edges: DataFrame,
    seeds: list[int],
    src: str = "src",
    dst: str = "dst",
    iters: int = 3,
    damping: float = 0.85,
    checkpoint_dir: str | None = None,
    exact: bool = True,
) -> DataFrame:
    """(id, rank) after ``iters`` rounds of random-walk-with-restart:
    the teleport mass returns to the ``seeds`` (uniformly) instead of
    all vertices — ranks measure proximity TO the seed set, the
    recommendation / similar-items primitive PageRank's global variant
    can't express. Same per-round plan as :func:`pagerank` (static
    edge list pre-partitioned once; each round shuffles only the
    vertex-sized rank table); the seed indicator is a broadcast-sized
    literal IN-list."""
    e = edges.select(
        F.col(src).alias("_s"), F.col(dst).alias("_d")
    ).transform(_cp, checkpoint_dir)
    verts = (
        e.select(F.col("_s").alias("id"))
        .unionByName(e.select(F.col("_d").alias("id")))
        .distinct()
        .transform(_cp, checkpoint_dir)
    )
    deg = e.groupBy("_s").agg(F.count(F.lit(1)).alias("_deg"))
    ed = e.join(deg, "_s").repartition("_s").transform(_cp, checkpoint_dir)
    n_seeds = float(len(seeds))
    is_seed = F.col("id").isin(seeds)
    restart = F.when(is_seed, F.lit(1.0 / n_seeds)).otherwise(F.lit(0.0))
    pr = verts.withColumn("rank", restart)
    for _i in range(iters):
        contrib = (
            ed.join(pr.withColumnRenamed("id", "_s"), "_s")
            .groupBy("_d")
            # decimal addends: a plain double sum is accumulation-order
            # dependent, so a rank straddling the output rounding
            # boundary can flip between runs/engines (r2 review: a
            # confirmed 0.370813-vs-0.370812 oracle mismatch). 18
            # fractional digits cover the full double mantissa of
            # sub-1.0 ranks; the per-element double->decimal rounding
            # is identical in Spark and DuckDB.
            .agg(
                (
                    F.sum(
                        (F.col("rank") / F.col("_deg")).cast("decimal(38,18)")
                    ).cast("double")
                    if exact
                    else F.sum(F.col("rank") / F.col("_deg"))
                ).alias("_in")
            )
        )
        pr = (
            verts.join(contrib, verts["id"] == contrib["_d"], "left")
            .select(
                "id",
                (
                    (1.0 - damping) * restart
                    + damping * F.coalesce(F.col("_in"), F.lit(0.0))
                ).alias("rank"),
            )
            .transform(_loop_cp, _i, checkpoint_dir)
        )
    return pr


def multi_source_bfs(
    edges: DataFrame,
    sources: list,
    max_hops: int = 6,
    src: str = "src",
    dst: str = "dst",
    checkpoint_dir: str | None = None,
) -> DataFrame:
    """(seed, id, dist) hop distances from EVERY seed at once — one
    frontier carries (seed, vertex) pairs, so k seeds cost the same
    number of rounds as one (each hop is still ONE equi join + one
    anti-join, just on a frontier ≤ k× wider). The basis for sampled
    closeness/harmonic centrality, reachability audits, and
    multi-query shortest-hop lookups."""
    spark = edges.sparkSession
    e = edges.select(
        F.col(src).alias("_s"), F.col(dst).alias("_d")
    ).distinct()
    e = e.repartition("_s").transform(_cp, checkpoint_dir)
    # seed/id typed from the graph's own dst column (long, string, ...)
    # so string-id graphs work and joins never silently type-coerce
    id_type = e.schema["_d"].dataType
    seen = spark.createDataFrame(
        [(s, s, 0) for s in sources],
        T.StructType(
            [
                T.StructField("seed", id_type),
                T.StructField("id", id_type),
                T.StructField("dist", T.IntegerType()),
            ]
        ),
    )
    frontier = seen
    for h in range(1, max_hops + 1):
        nxt = (
            e.join(frontier.select("seed", F.col("id").alias("_s")), "_s")
            .select("seed", F.col("_d").alias("id"))
            .distinct()
            .join(seen.select("seed", "id"), ["seed", "id"], "left_anti")
            .withColumn("dist", F.lit(h))
            .transform(_cp, checkpoint_dir)
        )
        if not nxt.take(1):
            break
        seen = seen.unionByName(nxt).transform(_cp, checkpoint_dir)
        frontier = nxt
    return seen


def closeness_centrality(
    edges: DataFrame,
    sources: list,
    max_hops: int = 6,
    src: str = "src",
    dst: str = "dst",
    checkpoint_dir: str | None = None,
) -> DataFrame:
    """(seed, n_reached, closeness): bounded closeness centrality for
    the seed set — closeness = (n_reached − 1) / Σ dist over vertices
    within ``max_hops``. Exact integer distance sums → engine-exact."""
    d = multi_source_bfs(
        edges, sources, max_hops, src, dst, checkpoint_dir=checkpoint_dir
    )
    return (
        d.where(F.col("dist") > 0)
        .groupBy("seed")
        .agg(
            (F.count(F.lit(1)) + 1).alias("n_reached"),
            (
                F.count(F.lit(1)).cast("double")
                / F.sum("dist").cast("double")
            ).alias("closeness"),
        )
    )


def hits(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    iters: int = 2,
    checkpoint_dir: str | None = None,
    exact: bool = True,
) -> DataFrame:
    """(id, hub, authority) after ``iters`` rounds of HITS
    (Kleinberg's hubs-and-authorities) over the DIRECTED edge set:
    auth'(v) = sum_{u->v} hub(u), hub'(u) = sum_{u->v} auth'(v), with
    ONE L2 normalization of each vector at the end — HITS is linear,
    so per-round rescaling changes nothing but the intermediate
    floats, and deferring it removes two driver actions and two
    materialized tables per round (the oracle replays the same
    deferred form). Unnormalized scores grow ~(max degree)^iters;
    decimal(38,18) partial sums hold that comfortably for the small
    fixed ``iters`` this formulation targets.

    Same per-round plan as :func:`pagerank`: the static edge list is
    pre-partitioned once per join side; every round shuffles only the
    vertex-sized score table. All sums (scores AND the squared-norm
    reductions) use decimal addends so scores are bit-identical in any
    engine/partitioning; vertices with no in-edges (or out-edges) hold
    score 0 for that role.
    """
    if iters < 1:
        raise ValueError("iters must be >= 1")
    import math

    dec = "decimal(38,18)"
    e = edges.select(
        F.col(src).alias("_s"), F.col(dst).alias("_d")
    ).distinct().transform(_cp, checkpoint_dir)
    verts = (
        e.select(F.col("_s").alias("id"))
        .unionByName(e.select(F.col("_d").alias("id")))
        .distinct()
        .transform(_cp, checkpoint_dir)
    )
    n = verts.count()
    init = 1.0 / math.sqrt(float(n))
    # one copy partitioned per join key; each round joins shuffle-free
    # against the pre-partitioned edges
    e_by_s = e.repartition("_s").transform(_cp, checkpoint_dir)
    e_by_d = e.repartition("_d").transform(_cp, checkpoint_dir)
    scores = verts.select("id", F.lit(init).alias("hub"))

    def _dsum(c):
        # exact=False: plain double sums (production fast path; scores
        # agree to ~1 ulp, last digit run-dependent — see pagerank)
        return F.sum(c.cast(dec)).cast("double") if exact else F.sum(c)

    for _i in range(iters):
        auth_raw = (
            e_by_s.join(
                scores.select(F.col("id").alias("_s"), "hub"), "_s"
            )
            .groupBy("_d")
            .agg(_dsum(F.col("hub")).alias("_a"))
        )
        # the chain is linear within rounds (auth feeds hub_raw, scores
        # feeds the next round); only the FINAL auth is referenced
        # twice — by the last hub_raw and by `joined` below — a
        # constant-factor-2 re-derivation absorbed by the `joined` pin,
        # far cheaper than two eager pin jobs per round (_loop_cp note)
        auth = verts.join(
            auth_raw, verts["id"] == auth_raw["_d"], "left"
        ).select(
            "id", F.coalesce(F.col("_a"), F.lit(0.0)).alias("authority")
        ).transform(_loop_cp, _i, checkpoint_dir)
        hub_raw = (
            e_by_d.join(
                auth.select(F.col("id").alias("_d"), "authority"), "_d"
            )
            .groupBy("_s")
            .agg(_dsum(F.col("authority")).alias("_h"))
        )
        scores = verts.join(
            hub_raw, verts["id"] == hub_raw["_s"], "left"
        ).select(
            "id", F.coalesce(F.col("_h"), F.lit(0.0)).alias("hub")
        ).transform(_loop_cp, _i, checkpoint_dir)
    # single deferred normalization (norms of the FINAL vectors)
    joined = scores.join(auth, "id").transform(_cp, checkpoint_dir)
    norms = joined.agg(
        F.sqrt(_dsum(F.col("hub") * F.col("hub"))).alias("_hn"),
        F.sqrt(_dsum(F.col("authority") * F.col("authority"))).alias("_an"),
    ).first()
    h_norm = float(norms["_hn"] or 1.0) or 1.0
    a_norm = float(norms["_an"] or 1.0) or 1.0
    return joined.select(
        "id",
        (F.col("hub") / h_norm).alias("hub"),
        (F.col("authority") / a_norm).alias("authority"),
    )


def betweenness_sampled(
    edges: DataFrame,
    sources: list,
    max_hops: int = 3,
    src: str = "src",
    dst: str = "dst",
    checkpoint_dir: str | None = None,
) -> DataFrame:
    """(id, betweenness) — Brandes dependency accumulation from a seed
    SAMPLE over the DIRECTED edge set (pass both directions for
    undirected), truncated at ``max_hops`` (k-bounded betweenness).
    Exact betweenness needs all |V| sources; sampling seeds is the
    standard estimator (Brandes & Pich 2007) and each seed costs one
    BFS forward pass + one layered backward pass.

    Forward: layer-synchronous BFS carrying exact integer path counts
    σ (σ(w) = Σ σ(v) over layer-h predecessors). Backward: δ(v) =
    Σ_{w ∈ layer h+1 successors} (σ_v/σ_w)·(1+δ_w), accumulated from
    the deepest layer up; betweenness(v) = Σ_seeds δ_seed(v) for
    v ≠ seed (reached leaves report 0.0).

    Plan/scale: the edge list is pre-partitioned on the probe key once
    and every hop/layer is one equi join + one keyed aggregation over
    frontier-sized tables (the multi_source_bfs shape — k seeds widen
    the frontier, not the round count). All δ sums stage addends as
    decimal(38,18), so the doubles are accumulation-order independent
    and the oracle can replay them bit-for-bit."""
    dec = "decimal(38,18)"
    e = (
        edges.select(F.col(src).alias("_s"), F.col(dst).alias("_d"))
        .distinct()
        .repartition("_s")
        .transform(_cp, checkpoint_dir)
    )
    id_type = e.schema["_d"].dataType
    spark = edges.sparkSession
    l0 = spark.createDataFrame(
        [(s, s, 1) for s in sources],
        T.StructType(
            [
                T.StructField("seed", id_type),
                T.StructField("id", id_type),
                T.StructField("sigma", T.LongType()),
            ]
        ),
    )
    layers = [l0]
    seen = l0.select("seed", "id")
    for _h in range(1, max_hops + 1):
        frontier = layers[-1]
        nxt = (
            e.join(
                frontier.select("seed", F.col("id").alias("_s"), "sigma"),
                "_s",
            )
            .groupBy("seed", F.col("_d").alias("id"))
            .agg(F.sum("sigma").alias("sigma"))
            .join(seen, ["seed", "id"], "left_anti")
            .transform(_cp, checkpoint_dir)
        )
        if not nxt.take(1):
            break
        layers.append(nxt)
        seen = seen.unionByName(nxt.select("seed", "id")).transform(
            _cp, checkpoint_dir
        )
    if len(layers) == 1:
        # no seed reached anyone: no interior vertices, empty result
        return l0.select(
            "id", F.lit(0.0).alias("betweenness")
        ).where(F.lit(False))
    # backward dependency accumulation, deepest layer first (δ = 0 there)
    deltas = [
        layers[-1].select("seed", "id", F.lit(0.0).alias("delta"))
    ]
    for h in range(len(layers) - 2, 0, -1):
        cur = layers[h]
        succ = layers[h + 1].join(deltas[-1], ["seed", "id"]).select(
            "seed",
            F.col("id").alias("_d"),
            F.col("sigma").alias("_sw"),
            F.col("delta").alias("_dw"),
        )
        contrib = (
            e.join(cur.select("seed", F.col("id").alias("_s"), "sigma"), "_s")
            .join(succ, ["seed", "_d"])
            .groupBy("seed", F.col("_s").alias("id"))
            .agg(
                F.sum(
                    (
                        (
                            F.col("sigma").cast("double")
                            / F.col("_sw").cast("double")
                        )
                        * (F.lit(1.0) + F.col("_dw"))
                    ).cast(dec)
                )
                .cast("double")
                .alias("_delta")
            )
        )
        cur_delta = (
            cur.join(contrib, ["seed", "id"], "left")
            .select(
                "seed",
                "id",
                F.coalesce("_delta", F.lit(0.0)).alias("delta"),
            )
            .transform(_cp, checkpoint_dir)
        )
        deltas.append(cur_delta)
    out = deltas[0]
    for d in deltas[1:]:
        out = out.unionByName(d)
    return out.groupBy("id").agg(
        F.sum(F.col("delta").cast(dec)).cast("double").alias("betweenness")
    )


def katz_centrality(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    iters: int = 3,
    alpha: float = 0.05,
    beta: float = 1.0,
    checkpoint_dir: str | None = None,
) -> DataFrame:
    """(id, katz) after ``iters`` rounds of the Katz recursion
    x ← β + α·Aᵀx (x₀ = β) over the DIRECTED edge set — the
    attenuated-path-count centrality: unlike PageRank it does NOT
    divide by out-degree, so a vertex pointed at by well-connected
    hubs scores high even when those hubs point many places.
    Truncation at ``iters`` sums walk lengths ≤ iters (α must be
    below 1/λ_max for the infinite sum to converge; a fixed small
    round count is the bounded variant).

    Same plan discipline as :func:`pagerank`: edges pre-partitioned on
    the join key once, per-round decimal(38,18) contribution sums
    (partition-order independent → oracle bit-parity), per-round
    checkpoint for constant-depth plans."""
    e = edges.select(
        F.col(src).alias("_s"), F.col(dst).alias("_d")
    ).transform(_cp, checkpoint_dir)
    verts = (
        e.select(F.col("_s").alias("id"))
        .unionByName(e.select(F.col("_d").alias("id")))
        .distinct()
        .transform(_cp, checkpoint_dir)
    )
    ed = e.repartition("_s").transform(_cp, checkpoint_dir)
    x = verts.withColumn("katz", F.lit(float(beta)))
    for _i in range(iters):
        contrib = (
            ed.join(x.withColumnRenamed("id", "_s"), "_s")
            .groupBy("_d")
            .agg(
                F.sum(F.col("katz").cast("decimal(38,18)"))
                .cast("double")
                .alias("_in")
            )
        )
        x = (
            verts.join(contrib, verts["id"] == contrib["_d"], "left")
            .select(
                "id",
                (
                    F.lit(float(beta))
                    + F.lit(float(alpha))
                    * F.coalesce(F.col("_in"), F.lit(0.0))
                ).alias("katz"),
            )
            .transform(_loop_cp, _i, checkpoint_dir)
        )
    return x
