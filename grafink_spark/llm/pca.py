"""Distributed PCA over an embedding column — linear algebra as a
DataFrame program, bit-reproducible across engines.

Two numerically hostile steps are made exactly deterministic:

1. **Covariance accumulation.** Each row contributes x_i·x_j for every
   (i, j) dimension pair; summing doubles is partition-order dependent,
   so the per-pair contributions are cast to DECIMAL(30,15) and summed
   EXACTLY (decimal addition is associative/commutative — any
   partitioning, any engine, same result). The cast itself is
   deterministic: a binary double can never land exactly on a
   half-ulp of a scale-15 decimal (5·10⁻¹⁶ is not dyadic), so
   round-half-up vs round-half-even can never disagree.
2. **Power iteration.** Runs inside Spark on the (d², 3) covariance
   DataFrame: each round is an equi join + a per-row fold over the
   d terms in sorted dimension order (collect_list + aggregate, as in
   llm/lm.py), so the matrix-vector products are bit-identical to the
   SQL oracle's ``list_reduce(list(... ORDER BY j))`` replay.

Scale design (100 TB): the d² explode is narrow (no join — nested
array transforms generate the pairs row-locally) and the groupBy(i, j)
partial-aggregates map-side, so the shuffle carries d² × #partitions
partial sums regardless of corpus size. For d in the thousands, swap
the explode for a mapInPandas partial-covariance kernel (same
contract, per-partition d×d partials) — at d=64 the expression form
keeps everything, including the oracle, in plain SQL. The iteration
itself touches only d²-sized data.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from grafink_spark.util import pin, pin_lazy

DEC = "decimal(30,15)"


def _ordered_dot(j_col: str, term) -> object:
    """Sum of ``term`` in ascending ``j_col`` order (bit-deterministic)."""
    ordered = F.transform(
        F.array_sort(F.collect_list(F.struct(F.col(j_col).alias("_j"), term.alias("_t")))),
        lambda s: s["_t"],
    )
    return F.aggregate(ordered, F.lit(0.0), lambda acc, x: acc + x)


def covariance_matrix(
    emb: DataFrame, vec_col: str = "embedding"
) -> DataFrame:
    """(i, j, c): population covariance of the vector dimensions,
    accumulated in exact decimal arithmetic. One narrow d²-explode +
    one groupBy(i, j) shuffle (map-side combined). Single-batch case
    of :func:`covariance_partials` + :func:`covariance_from_partials`
    (the union-of-one collapses; plan is identical)."""
    return covariance_from_partials([covariance_partials(emb, vec_col)])


# Pin the evolving eigenvector every Nth round: the packed-d-vector
# loop (r9) is a linear chain, but letting all 8 iterations pile into
# ONE plan trades 16 tiny jobs for a Catalyst tree whose analysis/
# optimization cost exceeds them (r10 3-way alternated A/B at sf0.1,
# tools/pca_oldnew.py: packed-unpinned 6.83/4.52/5.46 s vs
# packed+pin-every-4 6.77/3.86/4.50 s for pca_components/
# embedding_pca/incremental_pca; the r8 pin-every-round form sits
# between). Same bound the iterative graph loops use (PIN_EVERY=4,
# graph/algorithms.py) — constant plan depth for deep loops, a
# handful of materialization barriers instead of one per round.
_PIN_EVERY = 4


def _power(c: DataFrame, dim: int, iters: int):
    """(v, lam): dominant unit eigenvector (j, v) and 1-row Rayleigh
    eigenvalue of an already-checkpointed covariance DataFrame."""
    spark = c.sparkSession
    v = spark.range(dim).select(
        F.col("id").cast("int").alias("j"),
        F.lit(1.0 / float(dim) ** 0.5).alias("v"),
    )
    for it in range(iters):
        w = c.join(v, "j").groupBy("i").agg(
            _ordered_dot("j", F.col("c") * F.col("v")).alias("w")
        )
        # Pack the whole d-vector into ONE sorted array row so the norm
        # and the normalized components come out of a single Project:
        # w is then referenced once at the PLAN level, the loop stays a
        # linear chain, and the per-iteration eager pin (a full job per
        # round — the dominant cost of the old crossJoin(broadcast)
        # form, which referenced w from two branches) disappears. The
        # arithmetic is bit-identical: ascending-i fold of w·w (the
        # same order _ordered_dot produced), then one IEEE division per
        # entry.
        packed = (
            w.agg(
                F.array_sort(
                    F.collect_list(
                        F.struct(F.col("i").alias("_j"), F.col("w").alias("_t"))
                    )
                ).alias("_a")
            )
            .select(
                "_a",
                F.sqrt(
                    F.aggregate(
                        F.transform(F.col("_a"), lambda s: s["_t"] * s["_t"]),
                        F.lit(0.0),
                        lambda acc, x: acc + x,
                    )
                ).alias("_n"),
            )
        )
        v = packed.select(F.explode("_a").alias("_s"), "_n").select(
            F.col("_s._j").alias("j"), (F.col("_s._t") / F.col("_n")).alias("v")
        )
        # bound the linear chain's plan depth (see _PIN_EVERY above);
        # a pin materializes exact rows, so arithmetic is unchanged
        if (it + 1) % _PIN_EVERY == 0 and it + 1 < iters:
            v = v.transform(pin)
    v = v.transform(pin)
    cv = (
        c.join(v, "j")
        .groupBy("i")
        .agg(_ordered_dot("j", F.col("c") * F.col("v")).alias("cv"))
    )
    lam = (
        cv.join(v.select(F.col("j").alias("i"), "v"), "i")
        .select(_ordered_dot("i", F.col("cv") * F.col("v")).alias("lam"))
    )
    return v, lam


def power_iteration(
    cov: DataFrame, dim: int, iters: int = 8
) -> DataFrame:
    """(i, loading, eigenvalue, var_ratio): dominant eigenvector of the
    covariance DataFrame after ``iters`` power-iteration rounds from
    the uniform unit vector, plus the Rayleigh-quotient eigenvalue and
    its share of total variance. Every dot product folds in sorted
    index order; d-sized data throughout."""
    c = cov.transform(pin)  # pin: upstream is the corpus-sized agg
    v, lam = _power(c, dim, iters)
    tr = c.where(F.col("i") == F.col("j")).select(
        _ordered_dot("i", F.col("c")).alias("tr")
    )
    return (
        v.select(F.col("j").alias("i"), F.col("v").alias("loading"))
        .crossJoin(F.broadcast(lam))
        .crossJoin(F.broadcast(tr))
        .select(
            "i",
            "loading",
            F.col("lam").alias("eigenvalue"),
            (F.col("lam") / F.col("tr")).alias("var_ratio"),
        )
    )


def pca_components(
    emb: DataFrame, k: int = 2, vec_col: str = "embedding", iters: int = 8
) -> DataFrame:
    """Top-k principal components by Hotelling deflation: after each
    dominant eigenpair (v, λ), iterate on C' = C − λ·v·vᵀ — the
    deflated matrix's dominant direction is the next component. All
    d²-sized DataFrame arithmetic; the deflation outer product is one
    double-join projection, and every dot product keeps the sorted
    fold, so the whole decomposition replays bit-for-bit in SQL.
    Output: (component, i, loading, eigenvalue, var_ratio)."""
    dim = len(emb.select(vec_col).first()[0])
    c = covariance_matrix(emb, vec_col).transform(pin)
    tr = c.where(F.col("i") == F.col("j")).select(
        _ordered_dot("i", F.col("c")).alias("tr")
    )
    outs = []
    for comp in range(1, k + 1):
        v, lam = _power(c, dim, iters)
        outs.append(
            v.select(F.col("j").alias("i"), F.col("v").alias("loading"))
            .crossJoin(F.broadcast(lam))
            .crossJoin(F.broadcast(tr))
            .select(
                F.lit(comp).alias("component"),
                "i",
                "loading",
                F.col("lam").alias("eigenvalue"),
                (F.col("lam") / F.col("tr")).alias("var_ratio"),
            )
        )
        if comp < k:
            vi = v.select(F.col("j").alias("i"), F.col("v").alias("_vi"))
            vj = v.select("j", F.col("v").alias("_vj"))
            c = (
                c.join(vi, "i")
                .join(vj, "j")
                .crossJoin(F.broadcast(lam))
                .select(
                    "i",
                    "j",
                    (
                        F.col("c")
                        - F.col("lam") * F.col("_vi") * F.col("_vj")
                    ).alias("c"),
                )
                .transform(pin)
            )
    out = outs[0]
    for o in outs[1:]:
        out = out.unionByName(o)
    return out


def embedding_pca(
    emb: DataFrame, vec_col: str = "embedding", iters: int = 8
) -> DataFrame:
    """Top principal component of the embedding corpus: exact-decimal
    covariance + in-Spark power iteration. Output: one row per
    dimension (i, loading, eigenvalue, var_ratio)."""
    dim = len(emb.select(vec_col).first()[0])
    return power_iteration(covariance_matrix(emb, vec_col), dim, iters)


def covariance_matrix_arrow(
    emb: DataFrame, vec_col: str = "embedding"
) -> DataFrame:
    """(i, j, c): the large-dimension covariance path — per-partition
    d×d float64 partials via an Arrow ``mapInPandas`` kernel (one
    matrix multiply per batch), then an element-wise sum of the
    partition partials. This is the mode the expression form's
    docstring points large ``d`` at: the d² row explode is replaced by
    #partitions × d² partial cells, and the per-batch work is a BLAS
    ``X.T @ X``.

    Trade-off vs :func:`covariance_matrix`: float64 partials make the
    result partition-order dependent in the last ulps (no exact
    decimal), so the SQL-oracle bit-equality contract does NOT hold —
    use the expression form when cross-engine reproducibility matters
    and this form when d² × rows explode cost dominates (d ≳ 512).
    Numerically the two agree to ~1e-12 relative (pinned in tests).
    """
    import numpy as np
    import pandas as pd

    n = emb.count()
    d = len(emb.select(vec_col).first()[0])

    def partials(batches):
        acc = np.zeros((d, d), dtype=np.float64)
        sx = np.zeros(d, dtype=np.float64)
        seen = False
        for pdf in batches:
            if len(pdf) == 0:
                continue
            seen = True
            x = np.stack(
                [np.asarray(v, dtype=np.float64) for v in pdf[vec_col]]
            )
            acc += x.T @ x
            sx += x.sum(axis=0)
        if not seen:
            return
        ii, jj = np.meshgrid(np.arange(d), np.arange(d), indexing="ij")
        yield pd.DataFrame(
            {
                "i": ii.ravel().astype("int32"),
                "j": jj.ravel().astype("int32"),
                "sxx": acc.ravel(),
                # carry the mean partial only on the diagonal rows to
                # avoid a second pass (j == i slot reuse is NOT safe —
                # ship it as its own column instead, d² small anyway)
                "sx_i": np.repeat(sx, d),
            }
        )

    p = emb.select(vec_col).mapInPandas(
        partials, "i int, j int, sxx double, sx_i double"
    )
    sums = p.groupBy("i", "j").agg(
        F.sum("sxx").alias("sxx"),
        # sx_i is replicated d× per partition partial; every (i, j)
        # row of one partial carries the same sx_i, so summing over
        # partials at fixed (i, j) gives Σ_partitions sx_i exactly once
        F.sum("sx_i").alias("sx_i"),
    )
    mu_j = sums.where(F.col("i") == F.col("j")).select(
        F.col("j").alias("_j"), (F.col("sx_i") / F.lit(float(n))).alias("_mu_j")
    )
    return (
        sums.join(
            mu_j.select(F.col("_j").alias("i"), F.col("_mu_j").alias("_mi")),
            "i",
        )
        .join(mu_j.select(F.col("_j").alias("j"), F.col("_mu_j").alias("_mj")), "j")
        .select(
            "i",
            "j",
            (
                F.col("sxx") / F.lit(float(n)) - F.col("_mi") * F.col("_mj")
            ).alias("c"),
        )
    )


def covariance_partials(
    emb: DataFrame, vec_col: str = "embedding"
):
    """(sxx, sx, n) raw DECIMAL sums for one batch — the mergeable form
    of :func:`covariance_matrix`. Because decimal addition is exact and
    associative, partials from any batch split merge into EXACTLY the
    full-pass covariance (bit-for-bit — `incremental_pca` is checked
    against the full-pass oracle), which is what makes daily
    incremental model maintenance equal to retraining."""
    idx = F.transform(
        F.col(vec_col),
        lambda x, i: F.struct(i.alias("i"), x.cast("double").alias("x")),
    )
    # UPPER TRIANGLE ONLY (i <= j): covariance is symmetric and the
    # mirrored cell's product x_j·x_i is the SAME double (multiply is
    # commutative and exact), so emitting half the pairs and mirroring
    # after the final merge (covariance_from_partials) is bit-identical
    # — and halves the explode rows, shuffle bytes, and decimal adds of
    # the dominant stage (A/B at sf0.1, d=64, 3 reps each: full
    # 13-14.3 s, triangle 7-8.7 s).
    pairs = F.flatten(
        F.transform(
            idx,
            lambda a: F.transform(
                F.filter(idx, lambda b: b["i"] >= a["i"]),
                lambda b: F.struct(
                    a["i"].alias("i"),
                    b["i"].alias("j"),
                    (a["x"] * b["x"]).cast(DEC).alias("xx"),
                ),
            ),
        )
    )
    sxx = (
        emb.select(F.explode(pairs).alias("p"))
        .select("p.i", "p.j", "p.xx")
        .groupBy("i", "j")
        .agg(F.sum("xx").alias("sxx"))
    )
    sx = (
        emb.select(F.posexplode(vec_col).alias("i", "x"))
        .select("i", F.col("x").cast("double").cast(DEC).alias("x"))
        .groupBy("i")
        .agg(F.sum("x").alias("sx"))
    )
    # n must count only rows that CONTRIBUTED: explode silently drops
    # NULL/empty vectors from sxx/sx, so counting them here would
    # deflate every covariance cell and mean by the bad-row fraction
    n = emb.where(
        F.col(vec_col).isNotNull() & (F.size(F.col(vec_col)) > 0)
    ).count()
    return sxx, sx, n


def covariance_from_partials(parts) -> DataFrame:
    """Merge batch partials into the covariance matrix: union + one
    d²-sized decimal re-sum per table — batch-cost maintenance with a
    full-retrain-exact result. Partials carry the UPPER TRIANGLE only
    (see covariance_partials); the merged triangle is mirrored here,
    after the re-sum, into the full symmetric matrix."""
    sxx_all, sx_all, n = None, None, 0
    for sxx, sx, cnt in parts:
        sxx_all = sxx if sxx_all is None else sxx_all.unionByName(sxx)
        sx_all = sx if sx_all is None else sx_all.unionByName(sx)
        n += cnt
    # pin before mirroring: the union references the merged triangle
    # TWICE, and Spark does no cross-branch CSE — without the pin the
    # corpus-scale explode+aggregate would run once per branch
    sxx = (
        sxx_all.groupBy("i", "j")
        .agg(F.sum("sxx").alias("sxx"))
        .transform(pin_lazy)
    )
    sxx = sxx.unionByName(
        sxx.where(F.col("i") != F.col("j")).select(
            F.col("j").alias("i"), F.col("i").alias("j"), "sxx"
        )
    )
    sx = sx_all.groupBy("i").agg(F.sum("sx").alias("sx"))
    mu = sx.select("i", (F.col("sx").cast("double") / F.lit(float(n))).alias("mu"))
    return (
        sxx.join(mu.select(F.col("i"), F.col("mu").alias("_mi")), "i")
        .join(mu.select(F.col("i").alias("j"), F.col("mu").alias("_mj")), "j")
        .select(
            "i",
            "j",
            (
                F.col("sxx").cast("double") / F.lit(float(n))
                - F.col("_mi") * F.col("_mj")
            ).alias("c"),
        )
    )
