"""Same-session alternated A/B: r8 vs r9 _power form (r10 verdict ask
#4 — the r9 packed-d-vector rewrite's driver numbers doubled while the
builder's A/B claimed a win; settle it in one warm session).

Swaps grafink_spark.llm.pca._power between the current (packed) form
and the r8 form (per-iteration pin + crossJoin(broadcast(norm)))
re-defined here verbatim, timing the three registry queries.
Measurement tool only.

Usage: python tools/pca_oldnew.py [--sf DIR] [--reps N]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import DataFrame  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402

import grafink_spark.llm.pca as pca_mod  # noqa: E402
from grafink_spark.benchqueries import QUERIES  # noqa: E402
from grafink_spark.llm.pca import _ordered_dot  # noqa: E402
from grafink_spark.session import get_spark  # noqa: E402
from grafink_spark.util import pin  # noqa: E402


def _power_r8(c: DataFrame, dim: int, iters: int):
    """r8 form, verbatim from git ae8e5b5~1."""
    spark = c.sparkSession
    v = spark.range(dim).select(
        F.col("id").cast("int").alias("j"),
        F.lit(1.0 / float(dim) ** 0.5).alias("v"),
    )
    for _ in range(iters):
        w = (
            c.join(v, "j")
            .groupBy("i")
            .agg(_ordered_dot("j", F.col("c") * F.col("v")).alias("w"))
            .transform(pin)
        )
        norm = w.select(
            F.sqrt(_ordered_dot("i", F.col("w") * F.col("w"))).alias("n")
        )
        v = w.crossJoin(F.broadcast(norm)).select(
            F.col("i").alias("j"), (F.col("w") / F.col("n")).alias("v")
        )
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


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument(
        "--sf",
        default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"),
    )
    ap.add_argument("--reps", type=int, default=4)
    ap.add_argument(
        "--queries",
        default="pca_components,embedding_pca,incremental_pca",
    )
    args = ap.parse_args()
    names = [q for q in args.queries.split(",") if q]

    power_r9 = pca_mod._power

    spark = get_spark("pca-oldnew")
    spark.sparkContext.setLogLevel("ERROR")
    QUERIES["max_id"](spark, args.sf).collect()

    times: dict[str, list[float]] = {}
    for rep in range(args.reps):
        for tag, impl in (("r9", power_r9), ("r8", _power_r8)):
            pca_mod._power = impl
            for q in names:
                t0 = time.perf_counter()
                QUERIES[q](spark, args.sf).write.format("noop").mode(
                    "overwrite"
                ).save()
                dt = round(time.perf_counter() - t0, 3)
                times.setdefault(f"{q}[{tag}]", []).append(dt)
                print(f"rep{rep} {q}[{tag}]: {dt}", flush=True)
    pca_mod._power = power_r9
    for k, s in times.items():
        print(f"{k}: {s} min={min(s)}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
