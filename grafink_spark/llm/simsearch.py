"""Similarity search over an embedding column (array<float>).

Two paths, same contract (query set → top-k neighbors per query):

- **brute force** — broadcast the (small) query set, one pass over the
  corpus computing cosine via zip_with/aggregate expressions, top-k by
  window. Exact; scales linearly in corpus size and is
  embarrassingly parallel (queries are broadcast, corpus partitions
  stream) — the right baseline even at 100 TB when the query set is
  small.
- **LSH-bucketed (random hyperplanes)** — a deterministic seeded
  hyperplane matrix (driver-side numpy, shipped as literals) gives each
  vector a b-bit signature; candidates share a signature bucket
  (multi-probe over signature bands), cosine re-rank inside buckets.
  Approximate; pair space shrinks by ~2^b.
"""

from __future__ import annotations

import math

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from grafink_spark.util import maybe_broadcast, pin, pin_lazy, would_broadcast

from grafink_spark.llm.dedup import cosine_similarity


def derive_nlist(n: int) -> int:
    """Count-derived inverted-list count: ``max(8, ceil(sqrt(N)))`` —
    the FAISS sizing rule for IVF-flat. It balances the two costs that
    pull in opposite directions: the centroid scan is N·nlist dim-wide
    cosines (wants nlist small) while the candidate join volume is
    ≈ nprobe·N²/nlist (wants nlist large); at nlist = √N both grow as
    N^1.5, whereas any PINNED nlist leaves the candidate join quadratic
    in N — the round-6 "measured hang" at sf1. Deterministic, so SQL
    oracles replay it exactly as ``greatest(8, ceil(sqrt(count(*))))``
    (IEEE sqrt of an exact integer is correctly rounded on both
    engines)."""
    return max(8, math.isqrt(max(n, 1) - 1) + 1)


def _salted_list_sides(
    c: DataFrame,
    q: DataFrame,
    row_key: str,
    nlist: int | None,
    hot_threshold: int | None,
) -> tuple[DataFrame, DataFrame, list[str]]:
    """Salt a partitioned IVF candidate equi join on ``list_id``.

    The join's key cardinality IS nlist, so a small nlist caps reducer
    parallelism at nlist tasks, and a hot inverted list (skewed
    centroid) pins one reducer no matter how large nlist is. Corpus
    rows hash (on ``row_key``) into one of S sub-keys; probe rows
    replicate to all S — every candidate pair still meets EXACTLY once
    (the corpus row owns a single salt), so results are bit-identical
    and oracles are untouched.

    S per list = max(parallelism floor, hot split): the floor
    ``ceil(shuffle_partitions / nlist)`` applies when nlist is small
    (free — no extra job); the hot split ``ceil(|list| /
    hot_threshold)`` (capped at the partition count) applies per
    oversized list and needs one count probe over the corpus side —
    driver-bounded output (only lists ≥ hot_threshold are collected,
    ≤ N/hot_threshold rows), the samevalue hot-key pattern. The probe
    re-executes the assignment lineage, so ``c`` is pinned first — the
    join consumer reuses the materialized copy."""
    spark = c.sparkSession
    parts = int(spark.conf.get("spark.sql.shuffle.partitions", "200"))
    floor_s = -(-parts // nlist) if (nlist and 0 < nlist < parts) else 1
    s_expr = F.lit(floor_s)
    hot_map: dict[int, int] = {}
    if hot_threshold:
        c = pin(c)
        hot_map = {
            int(r.list_id): min(parts, -(-int(r._n) // hot_threshold))
            for r in (
                c.groupBy("list_id")
                .agg(F.count(F.lit(1)).alias("_n"))
                .where(F.col("_n") >= hot_threshold)
                .collect()
            )
        }
        hot_map = {k: v for k, v in hot_map.items() if v > floor_s}
        if hot_map:
            m = F.create_map(
                *[F.lit(x) for kv in hot_map.items() for x in kv]
            )
            s_expr = F.coalesce(
                m[F.col("list_id")].cast("int"), F.lit(floor_s)
            )
    if floor_s <= 1 and not hot_map:
        return c, q, ["list_id"]
    c2 = c.withColumn(
        "_salt", F.pmod(F.hash(F.col(row_key)), s_expr).cast("int")
    )
    q2 = q.withColumn(
        "_salt", F.explode(F.sequence(F.lit(0), s_expr - F.lit(1)))
    )
    return c2, q2, ["list_id", "_salt"]


def brute_force_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 10,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    broadcast_queries: bool = True,
) -> DataFrame:
    """Exact top-k: (query_id, neighbor_id, cosine_sim, rank). Self-pairs
    (same id) are excluded. Ties broken by neighbor id (deterministic).

    ``broadcast_queries=True`` (the point-lookup shape: a handful of
    query vectors against a large corpus) pins a broadcast so the
    corpus streams once with no shuffle. Pass ``False`` when the query
    side is corpus-sized (all-pairs kNN, e.g. label-noise mining) —
    broadcasting the whole corpus to every executor would exhaust the
    driver/broadcast limits that a plain partitioned cross join
    avoids."""
    norm = lambda v: F.sqrt(  # noqa: E731
        F.aggregate(v, F.lit(0.0), lambda acc, x: acc + x * x)
    )
    # norms staged per row BEFORE the join: a corpus row's norm is
    # otherwise recomputed once per query it pairs with
    q = queries.select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).cast("array<double>").alias("_qv"),
    ).withColumn("_qn", norm(F.col("_qv")))
    c = corpus.select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).cast("array<double>").alias("_cv"),
    ).withColumn("_cn", norm(F.col("_cv")))
    dot = F.aggregate(
        F.zip_with(F.col("_qv"), F.col("_cv"), lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    denom = F.col("_qn") * F.col("_cn")
    if broadcast_queries:
        q_side = F.broadcast(q)
    else:
        # CartesianProduct parallelism = left-partitions x right-
        # partitions; a corpus read as 1-2 splits would evaluate the
        # whole quadratic pair space (interpreted higher-order cosine,
        # no codegen) in 1-4 tasks. Spread BOTH sides first.
        from grafink_spark.util import ensure_min_partitions

        c = ensure_min_partitions(c)
        q_side = ensure_min_partitions(q, min_partitions=8)
    scored = (
        c.crossJoin(q_side)
        .where(F.col("query_id") != F.col("neighbor_id"))
        .select(
            "query_id",
            "neighbor_id",
            F.when(denom > 0, dot / denom).otherwise(F.lit(0.0)).alias("cosine_sim"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine_sim").desc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "cosine_sim", "rank")
    )


def _hyperplanes(dim: int, bits: int, seed: int = 42) -> list[list[float]]:
    """Deterministic pseudo-random unit hyperplanes (no numpy needed at
    call sites — plain python RNG, stable across sessions)."""
    import random

    rnd = random.Random(seed)
    planes = []
    for _ in range(bits):
        v = [rnd.gauss(0.0, 1.0) for _ in range(dim)]
        n = math.sqrt(sum(x * x for x in v)) or 1.0
        planes.append([x / n for x in v])
    return planes


def hyperplane_signature(
    vec: Column, dim: int, bits: int = 8, seed: int = 42
) -> Column:
    """b-bit random-hyperplane signature as an int: bit i = sign(v·r_i)."""
    planes = _hyperplanes(dim, bits, seed)
    sig = F.lit(0)
    for i, p in enumerate(planes):
        plane = F.array(*[F.lit(x) for x in p])
        dot = F.aggregate(
            F.zip_with(vec, plane, lambda x, y: x * y),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
        sig = sig + F.when(dot >= 0, F.lit(1 << i)).otherwise(F.lit(0))
    return sig


def _centroid_matrix(df_like: DataFrame, centroids: list[tuple[int, list[float]]]):
    """One-row broadcastable DataFrame holding the full centroid matrix
    as ``_cmat: array<array<double>>`` (position = cid; cids are dense
    0..nlist-1 by construction in ivf_train) plus ``_cnorms``, the
    centroids' L2 norms precomputed ONCE (strict left fold, the same
    order as the Spark-side aggregate — bit-identical doubles).

    The matrix travels as *broadcast data*, not as plan literals, so
    analysis time and plan width are O(1) regardless of nlist×dim —
    a 4096×1024 index costs the same plan as 8×64 (VERDICT r1 item 5;
    the previous literal-expansion plan was O(nlist×dim))."""
    import math

    mat = [list(map(float, vec)) for _, vec in sorted(centroids)]

    def l2(vec: list[float]) -> float:
        acc = 0.0
        for x in vec:
            acc += x * x
        return math.sqrt(acc)

    norms = [l2(vec) for vec in mat]
    spark = df_like.sparkSession
    return spark.createDataFrame(
        [(mat, norms)], "_cmat array<array<double>>, _cnorms array<double>"
    )


def ivf_assign(
    corpus: DataFrame,
    centroids: list[tuple[int, list[float]]],
    vec_col: str = "embedding",
) -> DataFrame:
    """Assign each vector to its nearest centroid (by cosine): adds a
    ``list_id`` column. The centroid matrix joins in as a broadcast
    single row (BroadcastNestedLoopJoin over one row — no shuffle);
    the argmax is one zip_with + array_position expression, so the
    plan is dimension- and nlist-independent. Ties pick the lowest
    cid (first maximum), matching the previous fold semantics.

    The row's norm is staged once per ROW and the centroid norms ride
    the broadcast — the per-centroid lambda is just dot/(nv·nc), a ~3×
    cut over recomputing both norms per centroid. Same expression tree
    per value, so results (and the SQL oracle replays) are bit-equal.

    The corpus is fanned out to cluster parallelism first: the N×nlist
    interpreted HOF cosines are CPU-bound, and a small parquet read as
    1-2 splits would run them serially (measured 9 s → <2 s on the
    label-noise twin); no-op at real scale where inputs already carry
    thousands of splits."""
    from grafink_spark.util import ensure_min_partitions

    corpus = ensure_min_partitions(corpus)
    v = F.col(vec_col).cast("array<double>")
    nv = F.sqrt(F.aggregate(v, F.lit(0.0), lambda acc, x: acc + x * x))

    def cos_to(c, nc):
        dot = F.aggregate(
            F.zip_with(v, c, lambda x, y: x * y),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
        denom = F.col("_nv") * nc
        return F.when(denom > 0, dot / denom).otherwise(F.lit(0.0))

    sims = F.zip_with(F.col("_cmat"), F.col("_cnorms"), cos_to)
    best = (F.array_position(sims, F.array_max(sims)) - 1).cast("int")
    return (
        corpus.crossJoin(F.broadcast(_centroid_matrix(corpus, centroids)))
        .withColumn("_nv", nv)
        .withColumn("list_id", best)
        .drop("_cmat", "_cnorms", "_nv")
    )


def ivf_train(
    corpus: DataFrame,
    nlist: int = 16,
    iters: int = 2,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> list[tuple[int, list[float]]]:
    """Deterministic IVF centroids: seed with the ``nlist`` lowest-id
    vectors, refine with ``iters`` Lloyd steps. Each step is one
    broadcast-assignment projection + posexplode + one
    groupBy(list_id, pos) mean — a single shuffle of nlist×dim partial
    sums, independent of corpus size (map-side partial aggregation)
    and with constant plan width regardless of dim. A list that ends
    an iteration empty keeps its previous centroid (cids stay dense)."""
    seeds = (
        corpus.select(id_col, F.col(vec_col).cast("array<double>").alias("_v"))
        .orderBy(id_col)
        .limit(nlist)
        .collect()
    )
    centroids = [(i, list(r._v)) for i, r in enumerate(seeds)]
    for _ in range(iters):
        assigned = ivf_assign(corpus, centroids, vec_col)
        v = F.col(vec_col).cast("array<double>")
        means = (
            assigned.select("list_id", F.posexplode(v).alias("pos", "val"))
            .groupBy("list_id", "pos")
            .agg(F.avg("val").alias("m"))
            .collect()
        )
        by_list: dict[int, dict[int, float]] = {}
        for r in means:
            by_list.setdefault(int(r.list_id), {})[int(r.pos)] = float(r.m)
        centroids = [
            (
                cid,
                [by_list[cid][p] for p in range(len(prev))]
                if cid in by_list
                else prev,
            )
            for cid, prev in centroids
        ]
    return centroids


def _ivf_query_probes(
    queries: DataFrame,
    centroids: list[tuple[int, list[float]]],
    nprobe: int,
    vec_col: str,
    id_col: str,
) -> DataFrame:
    """(query_id, _qv, _qn, list_id) — one row per probed inverted
    list, with the query's L2 norm staged ONCE per query row (``_qn``):
    downstream pair scoring reuses it across every candidate, cutting
    the per-pair cosine from 3 interpreted HOF folds to 1 (same
    expression tree as cosine_similarity, so values are bit-identical —
    the SQL oracles' per-pair norms compute the same doubles). Probe
    selection ties (equal centroid cosine) resolve to the higher cid
    (descending struct sort). Queries fan out to cluster parallelism
    first — same CPU-bound HOF rationale as ivf_assign."""
    from grafink_spark.util import ensure_min_partitions

    queries = ensure_min_partitions(queries)
    qv = F.col(vec_col).cast("array<double>")
    qn = F.sqrt(F.aggregate(qv, F.lit(0.0), lambda acc, x: acc + x * x))
    sims = F.transform(
        F.col("_cmat"),
        lambda cvec, i: F.struct(
            cosine_similarity(F.col("_qv"), cvec).alias("s"),
            i.cast("int").alias("c"),
        ),
    )
    probes = F.slice(F.reverse(F.array_sort(sims)), 1, nprobe)
    return (
        queries.select(
            F.col(id_col).alias("query_id"), qv.alias("_qv"), qn.alias("_qn")
        )
        .crossJoin(F.broadcast(_centroid_matrix(queries, centroids)))
        .select(
            "query_id",
            "_qv",
            "_qn",
            F.explode(
                F.transform(probes, lambda p: p.getField("c"))
            ).alias("list_id"),
        )
    )


def ivf_topk_allpairs(
    corpus: DataFrame,
    centroids: list[tuple[int, list[float]]],
    k: int = 10,
    nprobe: int = 4,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    hot_threshold: int | None = None,
) -> DataFrame:
    """All-pairs IVF kNN (queries == corpus — the mining shape behind
    label-noise / near-dup passes): the assignment argmax (lowest cid
    on ties, ivf_assign's rule) and the top-``nprobe`` probe lists
    (higher cid on ties, the probes rule) are computed from ONE
    centroid-similarity array in ONE pass over the corpus, pinned, and
    both candidate-join sides read the materialized copy — where
    ``ivf_topk(corpus, corpus, …)`` pays two full N×nlist HOF passes
    plus a re-scan. Values are bit-identical to the two-pass path (same
    expression trees), so SQL oracles replay unchanged. The pinned
    frame kills Catalyst stats, so the broadcast gate reads the RAW
    corpus as the probe side's size proxy (×nprobe): a bench-sized
    corpus still gets the broadcast-join fast path, a real one degrades
    to the salted partitioned equi join. Output schema matches
    brute_force_topk."""
    from grafink_spark.util import ensure_min_partitions

    corpus = ensure_min_partitions(corpus)
    v = F.col(vec_col).cast("array<double>")
    nv = F.sqrt(
        F.aggregate(F.col("_v"), F.lit(0.0), lambda acc, x: acc + x * x)
    )

    def cos_to(cvec, nc):
        dot = F.aggregate(
            F.zip_with(F.col("_v"), cvec, lambda x, y: x * y),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
        denom = F.col("_n") * nc
        return F.when(denom > 0, dot / denom).otherwise(F.lit(0.0))

    sims = F.zip_with(F.col("_cmat"), F.col("_cnorms"), cos_to)
    best = (F.array_position(sims, F.array_max(sims)) - 1).cast("int")
    probe_structs = F.transform(
        sims,
        lambda s, i: F.struct(s.alias("s"), i.cast("int").alias("c")),
    )
    probes = F.transform(
        F.slice(F.reverse(F.array_sort(probe_structs)), 1, nprobe),
        lambda p: p.getField("c"),
    )
    fused = (
        corpus.select(F.col(id_col).alias("_id"), v.alias("_v"))
        .withColumn("_n", nv)
        .crossJoin(F.broadcast(_centroid_matrix(corpus, centroids)))
        .select("_id", "_v", "_n", best.alias("list_id"), probes.alias("_probes"))
        .transform(pin)
    )
    c = fused.select(
        F.col("_id").alias("neighbor_id"),
        F.col("_v").alias("_cv"),
        F.col("_n").alias("_cn"),
        "list_id",
    )
    q = fused.select(
        F.col("_id").alias("query_id"),
        F.col("_v").alias("_qv"),
        F.col("_n").alias("_qn"),
        F.explode("_probes").alias("list_id"),
    )
    return _probe_and_rerank(
        c, q, k, q_size_proxy=corpus, proxy_scale=nprobe,
        nlist=len(centroids), hot_threshold=hot_threshold,
    )


def _probe_and_rerank(
    c: DataFrame,
    q: DataFrame,
    k: int,
    q_size_proxy: DataFrame | None = None,
    proxy_scale: float = 1.0,
    nlist: int | None = None,
    hot_threshold: int | None = None,
) -> DataFrame:
    """Equi-join probed lists against the query probes (broadcast when
    the query side's size estimate allows — the point-lookup shape),
    exact cosine re-rank, top-k per query.

    The broadcast is SIZE-GATED, not forced: all-pairs consumers
    (label-noise mining feeds the whole corpus as queries) degrade to
    a partitioned equi join on list_id instead of OOMing the driver.
    In THAT path the join keys are salted (:func:`_salted_list_sides`)
    so a small nlist no longer caps reducer parallelism at nlist tasks
    and, with ``hot_threshold`` set, a skewed centroid's list splits
    across reducers instead of pinning one.
    ``q_size_proxy``: the raw query frame, for when ``q``'s own stats
    are a join-product guess (probes derive from a crossJoin with the
    1-row centroid matrix); ``proxy_scale``: the probes-frame
    expansion over that raw frame (~nprobe rows per query)."""
    if would_broadcast(q, size_proxy=q_size_proxy, proxy_scale=proxy_scale):
        joined = c.join(F.broadcast(q), "list_id")
    else:
        c2, q2, keys = _salted_list_sides(c, q, "neighbor_id", nlist, hot_threshold)
        joined = c2.join(q2, keys)
    # per-pair cosine from STAGED norms (one fold per pair instead of
    # three — measured 3x on the candidate-scoring stage); same guard
    # and same expression trees as cosine_similarity, so every value
    # is bit-identical to the unstaged form and the SQL oracles
    dot = F.aggregate(
        F.zip_with(F.col("_qv"), F.col("_cv"), lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    denom = F.col("_qn") * F.col("_cn")
    scored = (
        joined.where(F.col("query_id") != F.col("neighbor_id"))
        .select(
            "query_id",
            "neighbor_id",
            F.when(denom > 0, dot / denom)
            .otherwise(F.lit(0.0))
            .alias("cosine_sim"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine_sim").desc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "cosine_sim", "rank")
    )


def ivf_topk(
    corpus: DataFrame,
    queries: DataFrame,
    centroids: list[tuple[int, list[float]]],
    k: int = 10,
    nprobe: int = 4,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    hot_threshold: int | None = None,
) -> DataFrame:
    """IVF search: each query probes its ``nprobe`` nearest inverted
    lists; exact cosine re-rank within the probed lists. Same output
    schema as brute_force_topk; scan fraction ≈ nprobe/nlist.

    The assignment is recomputed inline here (equivalent plan above the
    scan); ``ivf_write_index`` + ``ivf_topk_indexed`` persist the
    assignment so probes prune FILES instead. When the query side is
    too big to broadcast, the candidate join is salted (small-nlist
    parallelism floor always; ``hot_threshold`` additionally splits
    skewed lists — results identical either way)."""
    cv = F.col(vec_col).cast("array<double>")
    c = ivf_assign(corpus, centroids, vec_col).select(
        F.col(id_col).alias("neighbor_id"),
        cv.alias("_cv"),
        F.sqrt(
            F.aggregate(cv, F.lit(0.0), lambda acc, x: acc + x * x)
        ).alias("_cn"),
        "list_id",
    )
    q = _ivf_query_probes(queries, centroids, nprobe, vec_col, id_col)
    return _probe_and_rerank(
        c, q, k, q_size_proxy=queries, proxy_scale=nprobe,
        nlist=len(centroids), hot_threshold=hot_threshold,
    )


def ivf_write_index(
    corpus: DataFrame,
    path: str,
    centroids: list[tuple[int, list[float]]] | None = None,
    nlist: int = 16,
    iters: int = 2,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> list[tuple[int, list[float]]]:
    """Materialize the IVF index: the corpus written
    ``partitionBy(list_id)`` (one directory per inverted list — the
    physical realization of "probes prune files") plus a
    ``centroids.json`` sidecar, both through the Hadoop FileSystem API
    paths so hdfs:// / s3a:// roots work. Returns the centroids
    (trained here when not supplied)."""
    import json

    from grafink_spark import fsutil

    if centroids is None:
        centroids = ivf_train(corpus, nlist=nlist, iters=iters,
                              vec_col=vec_col, id_col=id_col)
    assigned = ivf_assign(corpus, centroids, vec_col)
    assigned.write.partitionBy("list_id").mode("overwrite").parquet(
        f"{path}/vectors"
    )
    fsutil.write_text(
        corpus.sparkSession, f"{path}/centroids.json", json.dumps(centroids)
    )
    return centroids


def ivf_index_append(
    spark,
    path: str,
    new_vectors: DataFrame,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> None:
    """Incremental index maintenance: assign a new vector batch to the
    EXISTING centroids and append into the partitioned layout — no
    retrain, no rewrite of resident lists. This is the standard
    freshness/recall trade of IVF serving stacks (centroids drift as
    the corpus grows; retrain with ``ivf_write_index`` when recall
    sags). Appended files land in the same ``list_id=`` directories, so
    probe-time partition pruning is unchanged; pair with
    ``maintenance.compact_parquet_dir`` when small appended files
    accumulate."""
    import json

    from grafink_spark import fsutil

    raw = fsutil.read_text(spark, f"{path}/centroids.json")
    centroids = [(int(c), list(map(float, v))) for c, v in json.loads(raw)]
    assigned = ivf_assign(new_vectors, centroids, vec_col)
    assigned.write.partitionBy("list_id").mode("append").parquet(
        f"{path}/vectors"
    )


def ivf_topk_indexed(
    spark,
    path: str,
    queries: DataFrame,
    k: int = 10,
    nprobe: int = 4,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    hot_threshold: int | None = None,
) -> DataFrame:
    """IVF search over a persisted index: reads ONLY the probed
    ``list_id=`` partitions. The union of all queries' probe lists is
    collected (nq × nprobe ints — queries are broadcast-small by
    contract) and applied as a static ``isin`` filter, which Spark turns
    into partition pruning at the scan (PartitionFilters in the plan,
    pinned in tests/test_simsearch.py) — unprobed lists are never read,
    so the scan cost is ~nprobe/nlist of the corpus regardless of
    corpus size. The per-query probe join then restricts candidates
    further, exactly as the inline ivf_topk."""
    import json

    from grafink_spark import fsutil

    raw = fsutil.read_text(spark, f"{path}/centroids.json")
    centroids = [(int(c), list(map(float, v))) for c, v in json.loads(raw)]
    q = _ivf_query_probes(queries, centroids, nprobe, vec_col, id_col)
    probe_ids = [r.list_id for r in q.select("list_id").distinct().collect()]
    cv = F.col(vec_col).cast("array<double>")
    c = (
        spark.read.parquet(f"{path}/vectors")
        .where(F.col("list_id").isin(probe_ids))
        .select(
            F.col(id_col).alias("neighbor_id"),
            cv.alias("_cv"),
            F.sqrt(
                F.aggregate(cv, F.lit(0.0), lambda acc, x: acc + x * x)
            ).alias("_cn"),
            "list_id",
        )
    )
    return _probe_and_rerank(
        c, q, k, q_size_proxy=queries, proxy_scale=nprobe,
        nlist=len(centroids), hot_threshold=hot_threshold,
    )


def lsh_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 10,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    dim: int = 64,
    bits: int = 8,
    tables: int = 4,
    seed: int = 42,
    probes: int = 0,
) -> DataFrame:
    """Approximate top-k with L independent hash tables: a candidate
    shares a full b-bit bucket with the query in ANY table; cosine
    re-rank over the unioned candidate set. Recall dials: (bits ↓,
    tables ↑), and ``probes`` — multi-probe LSH (Lv et al., VLDB'07):
    each query additionally probes the ``probes`` buckets at Hamming
    distance 1 (one sign bit flipped), buying the recall of ~probes
    extra tables WITHOUT re-hashing or storing the corpus again — the
    corpus side is untouched; only the broadcast-sized query side
    fans out ×(1+probes). Same output schema as brute_force_topk.

    Plan shape: buckets per table are one array column; explode →
    equi-join on (table, bucket) against the broadcast queries → dedup
    (query, candidate) → rerank. Pair space ≈ L × (1+probes) ×
    corpus/2^b per query.
    """
    def sigs(df: DataFrame) -> Column:
        v = F.col(vec_col).cast("array<double>")
        return F.array(
            *[
                hyperplane_signature(v, dim, bits, seed + 1000 * t)
                for t in range(tables)
            ]
        )

    c = corpus.select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).cast("array<double>").alias("_cv"),
        F.posexplode(sigs(corpus)).alias("_tbl", "_bucket"),
    )
    q = queries.select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).cast("array<double>").alias("_qv"),
        F.posexplode(sigs(queries)).alias("_qtbl", "_qbucket0"),
    )
    # multi-probe fanout: flip = -1 keeps the exact bucket; flip = i
    # probes the bucket with sign bit i inverted (query side only —
    # broadcast-sized, so the fanout costs nothing at the corpus scan)
    q = q.select(
        "query_id",
        "_qv",
        "_qtbl",
        F.explode(
            F.array(F.lit(-1), *[F.lit(i) for i in range(probes)])
        ).alias("_flip"),
        "_qbucket0",
    ).select(
        "query_id",
        "_qv",
        "_qtbl",
        F.when(F.col("_flip") < 0, F.col("_qbucket0"))
        .otherwise(F.expr("_qbucket0 ^ shiftleft(1, _flip)"))
        .alias("_qbucket"),
    )
    scored = (
        c.join(
            F.broadcast(q),
            (F.col("_tbl") == F.col("_qtbl"))
            & (F.col("_bucket") == F.col("_qbucket")),
            "inner",
        )
        .where(F.col("query_id") != F.col("neighbor_id"))
        .select("query_id", "neighbor_id", F.col("_qv"), F.col("_cv"))
        .dropDuplicates(["query_id", "neighbor_id"])
        .select(
            "query_id",
            "neighbor_id",
            cosine_similarity(F.col("_qv"), F.col("_cv")).alias("cosine_sim"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine_sim").desc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "cosine_sim", "rank")
    )


def quantize_embeddings(
    emb: DataFrame,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """(id, codes): int8-style scalar quantization — each dimension
    mapped to 0..255 over its corpus [min, max]. Min/max are exact
    order-free aggregates and the code rounding is the same IEEE
    arithmetic everywhere, so the codes — and every INTEGER dot
    product computed from them — are engine-identical (the float
    cosine path needs ordered folds for that; quantized search gets
    exactness for free, which is one of quantization's quiet wins).
    4× smaller vectors, one stats pass + one narrow map."""
    stats = (
        emb.select(F.posexplode(vec_col).alias("pos", "x"))
        .groupBy("pos")
        .agg(
            F.min(F.col("x").cast("double")).alias("mn"),
            F.max(F.col("x").cast("double")).alias("mx"),
        )
        .orderBy("pos")
        .collect()
    )
    mn = F.array(*[F.lit(float(r.mn)) for r in stats])
    mx = F.array(*[F.lit(float(r.mx)) for r in stats])
    code = F.transform(
        F.col(vec_col),
        lambda x, i: F.when(
            F.element_at(mx, i + 1) > F.element_at(mn, i + 1),
            F.round(
                (x.cast("double") - F.element_at(mn, i + 1))
                / (F.element_at(mx, i + 1) - F.element_at(mn, i + 1))
                * 255.0
            ),
        )
        .otherwise(F.lit(0.0))
        .cast("int"),
    )
    return emb.select(F.col(id_col), code.alias("codes"))


def quantized_topk(
    codes: DataFrame,
    query_codes: DataFrame,
    k: int = 10,
    id_col: str = "vec_id",
) -> DataFrame:
    """Top-k by quantized cosine: codes are CENTERED (−128) so the
    integer dot tracks direction rather than the all-positive code
    offset, then normalized by the integer norms —
    cos ≈ Σ c_q·c_n / (‖c_q‖·‖c_n‖). The dot and squared norms are
    exact integer sums (order-free); the only float ops are one sqrt
    and one division on those exact integers, so scores and ranks are
    engine-identical without ordered folds. Recall@5 ≈ 0.75 vs exact
    cosine on the test corpus (pytest-pinned ≥ 0.5).
    Output: (query_id, neighbor_id, qcos, rank)."""
    center = lambda col: F.transform(  # noqa: E731
        F.col(col), lambda c: (c - 128).cast("long")
    )
    q = query_codes.select(
        F.col(id_col).alias("query_id"), center("codes").alias("_qc")
    )
    c = codes.select(
        F.col(id_col).alias("neighbor_id"), center("codes").alias("_cc")
    )
    sq = lambda col: F.aggregate(  # noqa: E731
        F.transform(F.col(col), lambda a: a * a),
        F.lit(0).cast("long"),
        lambda acc, x: acc + x,
    )
    q = q.withColumn("_qn", F.sqrt(sq("_qc").cast("double")))
    c = c.withColumn("_cn", F.sqrt(sq("_cc").cast("double")))
    dot = F.aggregate(
        F.zip_with(F.col("_qc"), F.col("_cc"), lambda a, b: a * b),
        F.lit(0).cast("long"),
        lambda acc, x: acc + x,
    )
    scored = (
        c.crossJoin(F.broadcast(q))
        .where(F.col("query_id") != F.col("neighbor_id"))
        .select(
            "query_id",
            "neighbor_id",
            (dot.cast("double") / (F.col("_qn") * F.col("_cn"))).alias("qcos"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("qcos").desc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
    )


def mmr_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 3,
    m: int = 8,
    lam: float = 0.5,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Diverse top-k per query via Maximal Marginal Relevance
    (Carbonell & Goldstein): greedily pick the candidate maximizing
    ``lam·sim(q, d) − (1−lam)·max_{s ∈ selected} sim(d, s)`` — the
    de-redundancy re-rank every retrieval-for-training pipeline runs
    after a similarity top-m, so three near-identical passages don't
    crowd out the third-best distinct one.

    Distributed formulation: the greedy loop is over RANK POSITIONS
    (k steps), not rows — every step is one candidates×selected join +
    one max aggregation + one per-query argmax, computed for ALL
    queries at once. Ties break to the lowest neighbor id via a
    (score, -id) struct max — one hash agg per step, no windows over
    the full candidate set.

    Returns (query_id, neighbor_id, rank 1..k, mmr_score). Step 1 has
    an empty selected set (penalty 0), so mmr_score(rank 1) =
    lam·sim."""
    if k < 1 or m < k:
        raise ValueError("need m >= k >= 1")
    cand = brute_force_topk(corpus, queries, k=m, vec_col=vec_col, id_col=id_col)
    norm = lambda v: F.sqrt(  # noqa: E731
        F.aggregate(v, F.lit(0.0), lambda acc, x: acc + x * x)
    )
    emb = corpus.select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).cast("array<double>").alias("_e"),
    ).withColumn("_n", norm(F.col("_e")))
    cand = (
        cand.join(emb, "neighbor_id")
        .select("query_id", "neighbor_id", "cosine_sim", "_e", "_n")
        .transform(pin)
    )

    def argmax(df: DataFrame, score) -> DataFrame:
        # min over (-score, id): greatest score, ties to LOWEST id.
        # The SCORE is negated (always a double here), never the id —
        # negating a string/uuid id column would null out or error
        # (ANSI) for the non-numeric id spaces brute_force_topk accepts
        best = df.groupBy("query_id").agg(
            F.min(
                F.struct(
                    (-score).alias("_ns"), F.col("neighbor_id").alias("_nid")
                )
            ).alias("_b")
        )
        return best.select(
            "query_id",
            F.col("_b._nid").alias("neighbor_id"),
            (-F.col("_b._ns")).alias("mmr_score"),
        )

    selected = argmax(cand, F.lit(lam) * F.col("cosine_sim")).withColumn(
        "rank", F.lit(1)
    )
    remaining = cand.join(
        selected.select("query_id", "neighbor_id"),
        ["query_id", "neighbor_id"],
        "left_anti",
    )
    for t in range(2, k + 1):
        sel_emb = selected.select("query_id", "neighbor_id").join(
            cand.select("query_id", "neighbor_id", "_e", "_n"),
            ["query_id", "neighbor_id"],
        ).select(
            "query_id", F.col("_e").alias("_se"), F.col("_n").alias("_sn")
        )
        dot = F.aggregate(
            F.zip_with(F.col("_e"), F.col("_se"), lambda x, y: x * y),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
        pen = (
            remaining.join(sel_emb, "query_id")
            .select(
                "query_id",
                "neighbor_id",
                (dot / (F.col("_n") * F.col("_sn"))).alias("_p"),
            )
            .groupBy("query_id", "neighbor_id")
            .agg(F.max("_p").alias("_pen"))
        )
        scored = remaining.join(pen, ["query_id", "neighbor_id"])
        mmr = (
            F.lit(lam) * F.col("cosine_sim")
            - F.lit(1.0 - lam) * F.col("_pen")
        )
        winner = argmax(scored, mmr).withColumn("rank", F.lit(t))
        selected = selected.unionByName(winner).transform(pin)
        remaining = remaining.join(
            winner.select("query_id", "neighbor_id"),
            ["query_id", "neighbor_id"],
            "left_anti",
        )
    return selected.select("query_id", "neighbor_id", "rank", "mmr_score")


def bitext_mine(
    side_a: DataFrame,
    side_b: DataFrame,
    k: int = 4,
    threshold: float = 1.0,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Margin-based parallel-pair mining (Artetxe & Schwenk 2019, the
    standard bitext-mining criterion): for every vector in ``side_a``,
    its best ``side_b`` match scored by RATIO MARGIN — cosine divided
    by the mean of both directions' k-NN cosines — which suppresses
    hub vectors that are "near everything". Pairs with margin below
    ``threshold`` are dropped; ties break on the b-side id.

    Returns (a_id, b_id, cosine_sim, margin).

    Scale: this exact form scores A×B once — quadratic by semantics,
    so it is the ORACLE ANCHOR, not the production path; use
    :func:`bitext_mine_ivf` for unbounded corpora (identical margin
    criterion over IVF candidates only). The b side's broadcast is
    SIZE-GATED (``maybe_broadcast``): a small mined corpus broadcasts
    so A streams one pass with no shuffle, while a corpus-sized b
    degrades to a partitioned cross join — slower but executable,
    never a driver/broadcast OOM (the round-5 audit found the old
    forced hint asserted a caller bound the registered query did not
    satisfy). Both k-NN means and the final argmax reuse the same
    scored set via an eager-free localCheckpoint instead of
    recomputing the pair space per consumer. k-NN means use decimal
    addends so margins are bit-deterministic (oracle contract).
    """
    norm = lambda v: F.sqrt(  # noqa: E731
        F.aggregate(v, F.lit(0.0), lambda acc, x: acc + x * x)
    )
    a = side_a.select(
        F.col(id_col).alias("a_id"),
        F.col(vec_col).cast("array<double>").alias("_av"),
    ).withColumn("_an", norm(F.col("_av")))
    b = side_b.select(
        F.col(id_col).alias("b_id"),
        F.col(vec_col).cast("array<double>").alias("_bv"),
    ).withColumn("_bn", norm(F.col("_bv")))
    dot = F.aggregate(
        F.zip_with(F.col("_av"), F.col("_bv"), lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    denom = F.col("_an") * F.col("_bn")
    # size-gated, proxied on the raw side_b input (b's own stats are
    # exact too — project over the source — but the raw side is the
    # honest upper bound if a caller pre-checkpoints their slice)
    scored = (
        a.crossJoin(maybe_broadcast(b, size_proxy=side_b))
        .select(
            "a_id",
            "b_id",
            F.when(denom > 0, dot / denom).otherwise(F.lit(0.0)).alias("_cs"),
        )
        .transform(pin_lazy)
    )

    def knn_mean(part_col: str) -> DataFrame:
        w = Window.partitionBy(part_col).orderBy(
            F.col("_cs").desc(), F.col("b_id" if part_col == "a_id" else "a_id").asc()
        )
        return (
            scored.withColumn("_r", F.row_number().over(w))
            .where(F.col("_r") <= k)
            .groupBy(part_col)
            .agg(
                (
                    F.sum(F.col("_cs").cast("decimal(20,18)")).cast("double")
                    / F.count(F.lit(1))
                ).alias(f"_m_{part_col}")
            )
        )

    means_a = knn_mean("a_id")
    means_b = knn_mean("b_id")
    # means_a/means_b carry ONE ROW PER SIDE VECTOR — side-cardinality,
    # which grows with the data (the round-5 oversized-broadcast lint
    # caught the old forced hints). Size-gated: small sides broadcast,
    # big sides degrade to shuffle equi joins on the id keys. The
    # means derive from the CHECKPOINTED scored table (unknown Catalyst
    # stats), so the gate reads the original sides as size PROXIES —
    # a per-id means table is never bigger than its id-carrying input.
    margins = (
        scored.join(maybe_broadcast(means_a, size_proxy=a), "a_id")
        .join(maybe_broadcast(means_b, size_proxy=b), "b_id")
        .withColumn(
            "margin",
            F.col("_cs") / ((F.col("_m_a_id") + F.col("_m_b_id")) / 2),
        )
    )
    w_best = Window.partitionBy("a_id").orderBy(
        F.col("margin").desc(), F.col("b_id").asc()
    )
    return (
        margins.withColumn("_rk", F.row_number().over(w_best))
        .where((F.col("_rk") == 1) & (F.col("margin") >= threshold))
        .select(
            "a_id",
            "b_id",
            F.col("_cs").alias("cosine_sim"),
            "margin",
        )
    )


def bitext_mine_ivf(
    side_a: DataFrame,
    side_b: DataFrame,
    k: int = 4,
    threshold: float = 1.0,
    nlist: int | None = None,
    nprobe: int = 4,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    hot_threshold: int | None = None,
    train_per_list: int | None = 64,
) -> DataFrame:
    """Candidate-backed :func:`bitext_mine` — the scale path for
    corpus-sized sides: IVF centroids train on ``side_b`` (the mined
    corpus; deterministic lowest-id seeds + 1 Lloyd step, so the SQL
    oracle replays them), each b vector lands in ONE inverted list,
    each a vector probes its ``nprobe`` nearest lists, and cosines —
    and therefore both k-NN means and the ratio margin — are computed
    over the matched candidates only. The margin CRITERION is
    unchanged; recall is bounded by the probes (nprobe=nlist recovers
    the exact pair space).

    ``nlist`` defaults to COUNT-DERIVED from the b side
    (:func:`derive_nlist` = max(8, ceil(sqrt(|B|)))): at √N lists the
    candidate volume is ≈ nprobe·|A|·√|B| instead of the quadratic
    nprobe·|A|·|B|/nlist a pinned nlist decays to — the round-6
    "measured hang" at sf1 was exactly nlist=8 keeping ~half the full
    pair space. A pinned nlist stays supported for reproducing a fixed
    blocking. Deterministic, so the SQL oracle replays the derivation
    as a scalar subquery.

    Plan/scale: the candidate join is a partitioned EQUI join on
    list_id — no cross join, no corpus-side broadcast anywhere (the
    only broadcast is the 1-row nlist×dim centroid matrix) — and its
    keys are salted (:func:`_salted_list_sides`): the parallelism
    floor kicks in automatically when nlist < shuffle partitions, and
    ``hot_threshold`` splits skewed lists. Both means consumers reuse
    one checkpointed candidate table, exactly like the exact form.
    Same decimal k-NN-mean staging, so margins over the candidate set
    are bit-deterministic (oracle contract).

    Returns (a_id, b_id, cosine_sim, margin) — margins are relative
    to CANDIDATE neighborhoods, so scores can differ from the exact
    form where a true k-NN falls outside the probed lists; pairs
    found by both forms carry identical cosines."""
    if nlist is None:
        nlist = derive_nlist(side_b.count())
    # FAISS-style sampled training: seeds + the Lloyd step see only the
    # lowest-id train_per_list·nlist rows (a LIMIT past |B| is the full
    # slice, so small corpora are unchanged) — training cost is
    # O(nlist²·train_per_list) instead of |B|·nlist, while every b
    # vector is still assigned and searchable. None = train on all of B.
    train = (
        side_b.orderBy(id_col).limit(train_per_list * nlist)
        if train_per_list
        else side_b
    )
    centroids = ivf_train(
        train, nlist=nlist, iters=1, vec_col=vec_col, id_col=id_col
    )
    bv = F.col(vec_col).cast("array<double>")
    b = ivf_assign(side_b, centroids, vec_col).select(
        F.col(id_col).alias("b_id"),
        "list_id",
        bv.alias("_bv"),
        F.sqrt(
            F.aggregate(bv, F.lit(0.0), lambda acc, x: acc + x * x)
        ).alias("_bn"),
    )
    a = _ivf_query_probes(side_a, centroids, nprobe, vec_col, id_col).select(
        F.col("query_id").alias("a_id"), "_qv", "_qn", "list_id"
    )
    # each b sits in exactly one list and probe lists are distinct, so
    # a candidate pair appears AT MOST ONCE — no dedup needed. Norms
    # are STAGED per row (1 fold per pair, bit-identical values).
    b, a, join_keys = _salted_list_sides(b, a, "b_id", nlist, hot_threshold)
    dot = F.aggregate(
        F.zip_with(F.col("_qv"), F.col("_bv"), lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    denom = F.col("_qn") * F.col("_bn")
    scored = (
        b.join(a, join_keys)
        .select(
            "a_id",
            "b_id",
            F.when(denom > 0, dot / denom).otherwise(F.lit(0.0)).alias("_cs"),
        )
        .transform(pin_lazy)
    )

    def knn_mean(part_col: str) -> DataFrame:
        w = Window.partitionBy(part_col).orderBy(
            F.col("_cs").desc(),
            F.col("b_id" if part_col == "a_id" else "a_id").asc(),
        )
        return (
            scored.withColumn("_r", F.row_number().over(w))
            .where(F.col("_r") <= k)
            .groupBy(part_col)
            .agg(
                (
                    F.sum(F.col("_cs").cast("decimal(20,18)")).cast("double")
                    / F.count(F.lit(1))
                ).alias(f"_m_{part_col}")
            )
        )

    # per-id means are never bigger than their id-carrying input —
    # gate on the raw sides (the checkpointed candidate table has no
    # Catalyst stats), same proxy pattern as the exact form
    margins = (
        scored.join(maybe_broadcast(knn_mean("a_id"), size_proxy=side_a), "a_id")
        .join(maybe_broadcast(knn_mean("b_id"), size_proxy=side_b), "b_id")
        .withColumn(
            "margin",
            F.col("_cs") / ((F.col("_m_a_id") + F.col("_m_b_id")) / 2),
        )
    )
    w_best = Window.partitionBy("a_id").orderBy(
        F.col("margin").desc(), F.col("b_id").asc()
    )
    return (
        margins.withColumn("_rk", F.row_number().over(w_best))
        .where((F.col("_rk") == 1) & (F.col("margin") >= threshold))
        .select(
            "a_id",
            "b_id",
            F.col("_cs").alias("cosine_sim"),
            "margin",
        )
    )


def hard_triplet_mining(
    corpus: DataFrame,
    anchors: DataFrame,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    label_col: str = "label",
) -> DataFrame:
    """Hard-triplet mining for contrastive/metric learning: for each
    anchor, the hardest POSITIVE (same label, LOWEST cosine — the
    same-class example the model most confuses) and the hardest
    NEGATIVE (different label, HIGHEST cosine — the impostor), plus the
    margin (pos_cos − neg_cos; negative margin = the triplet is
    currently violated). Ties break on the other id, so the mined
    triplets are deterministic.

    Plan: anchors broadcast against the corpus (one narrow streaming
    pass, the point-lookup shape of brute_force_topk), then two
    WindowGroupLimit rank-1 picks per anchor. Linear in |corpus| ×
    |anchors|; for corpus-sized anchor sets swap the candidate source
    for the IVF/LSH blocked pair generators, same downstream picks."""
    from pyspark.sql import Window

    norm = lambda v: F.sqrt(  # noqa: E731
        F.aggregate(v, F.lit(0.0), lambda acc, x: acc + x * x)
    )
    a = anchors.select(
        F.col(id_col).alias("anchor_id"),
        F.col(label_col).alias("_al"),
        F.col(vec_col).cast("array<double>").alias("_av"),
    ).withColumn("_an", norm(F.col("_av")))
    c = corpus.select(
        F.col(id_col).alias("other_id"),
        F.col(label_col).alias("_cl"),
        F.col(vec_col).cast("array<double>").alias("_cv"),
    ).withColumn("_cn", norm(F.col("_cv")))
    dot = F.aggregate(
        F.zip_with(F.col("_av"), F.col("_cv"), lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    # zero-norm guard: 0/0 = NaN, and NaN sorts ABOVE every number in
    # Spark's DESC order — an unguarded zero vector would hijack the
    # hardest-negative pick for every anchor
    denom = F.col("_an") * F.col("_cn")
    scored = (
        c.crossJoin(F.broadcast(a))
        .where(F.col("anchor_id") != F.col("other_id"))
        .select(
            "anchor_id",
            "_al",
            "other_id",
            "_cl",
            F.when(denom > 0, dot / denom).otherwise(F.lit(0.0)).alias("cos"),
        )
        .transform(pin_lazy)
    )
    w_pos = Window.partitionBy("anchor_id").orderBy(
        F.col("cos").asc(), F.col("other_id").asc()
    )
    pos = (
        scored.where(F.col("_cl") == F.col("_al"))
        .withColumn("_r", F.row_number().over(w_pos))
        .where(F.col("_r") == 1)
        .select(
            "anchor_id",
            F.col("other_id").alias("pos_id"),
            F.col("cos").alias("pos_cos"),
        )
    )
    w_neg = Window.partitionBy("anchor_id").orderBy(
        F.col("cos").desc(), F.col("other_id").asc()
    )
    neg = (
        scored.where(F.col("_cl") != F.col("_al"))
        .withColumn("_r", F.row_number().over(w_neg))
        .where(F.col("_r") == 1)
        .select(
            "anchor_id",
            F.col("other_id").alias("neg_id"),
            F.col("cos").alias("neg_cos"),
        )
    )
    return pos.join(neg, "anchor_id").select(
        "anchor_id",
        "pos_id",
        "pos_cos",
        "neg_id",
        "neg_cos",
        (F.col("pos_cos") - F.col("neg_cos")).alias("margin"),
    )


# ---- product quantization (PQ / IVF-PQ) ----
#
# Jégou, Douze, Schmid, "Product Quantization for Nearest Neighbor
# Search" (TPAMI 2011): split each d-dim vector into m subvectors,
# k-means each subspace to ksub codes, store m small codes per vector
# (d·4 bytes → m bytes at ksub ≤ 256) and score queries against the
# codebook with an additive lookup (ADC). At 100 TB this is the memory
# side of the ANN story — IVF prunes WHICH vectors are scored, PQ
# shrinks WHAT is stored and makes each score m adds instead of d
# multiplies. Training is deterministic (lowest-id seeds + fixed Lloyd
# steps) so a SQL oracle can replay codebooks, codes, and distances.


def _pq_subspaces(dim: int, m: int) -> int:
    if dim % m:
        raise ValueError(f"dim {dim} not divisible by m {m}")
    return dim // m


def _pq_matrix(df_like: DataFrame, codebooks: list[list[tuple[int, list[float]]]]):
    """One-row broadcastable DataFrame holding all m codebooks as
    ``_pqmat: array<array<array<double>>>`` ([subspace][code][dsub]) —
    same plan-width rationale as :func:`_centroid_matrix`: the
    codebooks travel as broadcast DATA, so the plan is O(1) in
    m×ksub×dsub."""
    mat = [
        [list(map(float, cv)) for _, cv in sorted(cb)] for cb in codebooks
    ]
    return df_like.sparkSession.createDataFrame(
        [(mat,)], "_pqmat array<array<array<double>>>"
    )


def _l2sq(a: Column, b: Column) -> Column:
    """Squared L2 distance between two equal-length arrays — one
    zip_with + left-fold aggregate, same expression shape both engines
    replay bit-identically."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: (x - y) * (x - y)),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def _pq_codes_expr(v: Column, dsub: int) -> Column:
    """codes[j] = argmin over codebook j of ||v_sub_j − c||² (tie →
    lowest code, via array_position of the first minimum)."""

    def per_subspace(cb: Column, j: Column) -> Column:
        sub = F.slice(v, j * dsub + 1, dsub)
        dists = F.transform(cb, lambda c: _l2sq(sub, c))
        return (F.array_position(dists, F.array_min(dists)) - 1).cast("int")

    return F.transform(F.col("_pqmat"), per_subspace)


def pq_train(
    corpus: DataFrame,
    dim: int,
    m: int = 4,
    ksub: int = 16,
    iters: int = 1,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> list[list[tuple[int, list[float]]]]:
    """Deterministic PQ codebooks: subspace j is seeded with the j-th
    subvectors of the ``ksub`` lowest-id vectors, refined with
    ``iters`` Lloyd steps — ALL m subspaces per step run in ONE pass
    (one broadcast-assignment projection + posexplode + a single
    groupBy(subspace, code, subpos) mean of m·ksub·dsub partial sums,
    independent of corpus size). A code that ends an iteration empty
    keeps its previous sub-centroid (codes stay dense 0..ksub-1)."""
    dsub = _pq_subspaces(dim, m)
    seeds = (
        corpus.select(id_col, F.col(vec_col).cast("array<double>").alias("_v"))
        .orderBy(id_col)
        .limit(ksub)
        .collect()
    )
    codebooks = [
        [(c, list(r._v[j * dsub : (j + 1) * dsub])) for c, r in enumerate(seeds)]
        for j in range(m)
    ]
    v = F.col(vec_col).cast("array<double>")
    for _ in range(iters):
        assigned = corpus.crossJoin(
            F.broadcast(_pq_matrix(corpus, codebooks))
        ).select(F.col(vec_col), _pq_codes_expr(v, dsub).alias("_codes"))
        means = (
            assigned.select("_codes", F.posexplode(v).alias("pos", "val"))
            .select(
                (F.col("pos") / dsub).cast("int").alias("j"),
                (F.col("pos") % dsub).alias("subpos"),
                "val",
                "_codes",
            )
            .select(
                "j",
                F.element_at("_codes", F.col("j") + 1).alias("code"),
                "subpos",
                "val",
            )
            .groupBy("j", "code", "subpos")
            .agg(F.avg("val").alias("mv"))
            .collect()
        )
        by_key: dict[tuple[int, int], dict[int, float]] = {}
        for r in means:
            by_key.setdefault((int(r.j), int(r.code)), {})[int(r.subpos)] = float(
                r.mv
            )
        codebooks = [
            [
                (
                    code,
                    [by_key[(j, code)][p] for p in range(dsub)]
                    if (j, code) in by_key
                    else prev,
                )
                for code, prev in cb
            ]
            for j, cb in enumerate(codebooks)
        ]
    return codebooks


def pq_encode(
    corpus: DataFrame,
    codebooks: list[list[tuple[int, list[float]]]],
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """(id, codes array<int>) — the m-byte-per-vector compressed
    representation. One broadcast of the 1-row codebook matrix + a
    narrow projection; no shuffle."""
    dsub = len(codebooks[0][0][1])
    v = F.col(vec_col).cast("array<double>")
    return corpus.crossJoin(F.broadcast(_pq_matrix(corpus, codebooks))).select(
        F.col(id_col).alias("neighbor_id"),
        _pq_codes_expr(v, dsub).alias("codes"),
    )


def _adc_table_expr(qv: Column, dsub: int) -> Column:
    """The per-QUERY ADC lookup table (FAISS's precomputed distance
    table): ``_dtab[j][c] = ||q_sub_j − codebook[j][c]||²``, computed
    ONCE per query row. Scoring a candidate then costs m array lookups
    and m−1 adds — no arithmetic against the codebook per pair. The
    round-6 stress A/B caught the difference: recomputing the
    subvector distance per candidate made the ADC scan no faster than
    brute force (identical per-pair FLOPs); the table restores the
    m-lookups contract. Same expression tree per (j, c) as before, so
    distances are bit-identical and the SQL oracles are unchanged."""
    return F.transform(
        F.col("_pqmat"),
        lambda cb, j: F.transform(
            cb, lambda c: _l2sq(F.slice(qv, j * dsub + 1, dsub), c)
        ),
    )


def _adc_expr() -> Column:
    """ADC distance: Σ_j _dtab[j][codes[j]] — a left fold over the m
    table lookups (deterministic addend order, so the SQL twin's
    list_reduce replays it bit-exactly)."""
    dists = F.transform(
        F.col("codes"),
        lambda code, j: F.element_at(
            F.element_at(F.col("_dtab"), j + 1), code + 1
        ),
    )
    return F.aggregate(dists, F.lit(0.0), lambda acc, x: acc + x)


def pq_topk(
    corpus: DataFrame,
    queries: DataFrame,
    codebooks: list[list[tuple[int, list[float]]]],
    k: int = 10,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Approximate top-k by ADC over PQ codes: (query_id, neighbor_id,
    adc_dist, rank), ascending distance, ties by neighbor id. The
    corpus is scanned as CODES ONLY (m ints per vector — the
    compressed store); each query scores a candidate with m codebook
    lookups instead of a d-dim dot product.

    Scale: linear one-pass scan like brute_force_topk but over ~d/m×
    less data; the query side is size-gated (a corpus-sized query set
    degrades to a partitioned cross). Compose with IVF list pruning
    via :func:`ivfpq_topk` for sublinear candidate counts."""
    dsub = len(codebooks[0][0][1])
    codes = pq_encode(corpus, codebooks, vec_col, id_col)
    q = (
        queries.select(
            F.col(id_col).alias("query_id"),
            F.col(vec_col).cast("array<double>").alias("_qv"),
        )
        .crossJoin(F.broadcast(_pq_matrix(queries, codebooks)))
        .select(
            "query_id", _adc_table_expr(F.col("_qv"), dsub).alias("_dtab")
        )
    )
    # _dtab is m*ksub doubles per row vs the proxy's m*dsub-double
    # vector: scale the gate by the ratio so the proxy stays a bound
    dtab_scale = max(1.0, len(codebooks[0]) / dsub)
    scored = codes.crossJoin(
        maybe_broadcast(q, size_proxy=queries, proxy_scale=dtab_scale)
    ).where(F.col("query_id") != F.col("neighbor_id"))
    w = Window.partitionBy("query_id").orderBy(
        F.col("_adc").asc(), F.col("neighbor_id").asc()
    )
    return (
        scored.select("query_id", "neighbor_id", _adc_expr().alias("_adc"))
        .withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select(
            "query_id",
            "neighbor_id",
            F.col("_adc").alias("adc_dist"),
            "rank",
        )
    )


def ivfpq_encode(
    corpus: DataFrame,
    centroids: list[tuple[int, list[float]]],
    codebooks: list[list[tuple[int, list[float]]]],
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """(neighbor_id, list_id, codes) — the IVF-PQ index rows: each
    vector's inverted-list assignment plus its m-code compression. One
    corpus pass, two 1-row broadcasts, no shuffle; persist/partition
    the output by list_id for the ivf_write_index-style on-disk
    layout."""
    dsub = len(codebooks[0][0][1])
    c = ivf_assign(corpus, centroids, vec_col).select(
        F.col(id_col).alias("neighbor_id"),
        "list_id",
        F.col(vec_col).cast("array<double>").alias("_cv"),
    )
    return c.crossJoin(F.broadcast(_pq_matrix(corpus, codebooks))).select(
        "neighbor_id", "list_id", _pq_codes_expr(F.col("_cv"), dsub).alias("codes")
    )


def ivfpq_topk(
    corpus: DataFrame,
    queries: DataFrame,
    centroids: list[tuple[int, list[float]]],
    codebooks: list[list[tuple[int, list[float]]]],
    k: int = 10,
    nprobe: int = 4,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    encoded: DataFrame | None = None,
) -> DataFrame:
    """IVF-PQ: IVF lists prune WHICH vectors are candidates, PQ codes
    compress WHAT each candidate costs to score — the FAISS IVFPQ
    architecture as a Spark plan. Each corpus vector carries
    (list_id, codes); each query probes its ``nprobe`` nearest lists;
    candidates surface through a partitioned EQUI join on list_id and
    are scored by ADC (m lookups, never the raw vector).

    This variant encodes RAW vectors (not per-list residuals — the
    residual refinement changes recall constants, not the plan shape;
    documented so nobody mistakes it for the residual form). Pair
    space is Σ|list|·(probes landing there); the only broadcasts are
    the 1-row centroid and codebook matrices plus the size-gated query
    side.

    ``encoded``: a pre-built (neighbor_id, list_id, codes) index (see
    :func:`ivfpq_encode`) — the production shape, where assignment +
    encoding run ONCE per corpus and every query batch pays only
    probes + the candidate equi join + ADC (the ann_ab stress pair
    measures exactly this split)."""
    dsub = len(codebooks[0][0][1])
    c = (
        encoded
        if encoded is not None
        else ivfpq_encode(corpus, centroids, codebooks, vec_col, id_col)
    )
    q = _ivf_query_probes(queries, centroids, nprobe, vec_col, id_col)
    q = (
        q.crossJoin(F.broadcast(_pq_matrix(queries, codebooks)))
        # the table rides the (query, probed-list) rows into the join;
        # per-candidate work is then m lookups + m−1 adds, nothing else
        .select(
            "query_id",
            "list_id",
            _adc_table_expr(F.col("_qv"), dsub).alias("_dtab"),
        )
    )
    # nprobe rows per query, each carrying the m*ksub-double _dtab:
    # both expansions over the raw query frame go into the gate
    dtab_scale = nprobe * max(1.0, len(codebooks[0]) / dsub)
    scored = c.join(
        maybe_broadcast(q, size_proxy=queries, proxy_scale=dtab_scale),
        "list_id",
    ).where(F.col("query_id") != F.col("neighbor_id"))
    w = Window.partitionBy("query_id").orderBy(
        F.col("_adc").asc(), F.col("neighbor_id").asc()
    )
    return (
        scored.select("query_id", "neighbor_id", _adc_expr().alias("_adc"))
        .withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select(
            "query_id",
            "neighbor_id",
            F.col("_adc").alias("adc_dist"),
            "rank",
        )
    )
