"""Alternated A/B of APSS candidate-generation forms (r10).

Variants (built on the SAME upstream prefix pipeline unless noted):
  smj       — current: prefix×prefix sort-merge equi-join (baseline)
  plist     — posting lists: groupBy(_term) + double explode
  bcast     — broadcast self-join: pa join broadcast(pb)
  win       — window-rewritten prefix pipeline (freq+tot as windows
              over tc instead of agg+join), then the smj join
  win_bcast — window prefix + broadcast self-join

Each drains candidates via noop. Also checks candidate-set equality
of every variant against smj (losslessness proof). Measurement tool.

Usage: python tools/apss_ab.py [--sf DIR] [--reps N] [--check]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import Window  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402

from grafink_spark.llm.dedup import hash60, shingles_from_tokens  # noqa: E402
from grafink_spark.llm.text import tokens as _tokens  # noqa: E402
from grafink_spark.session import get_spark  # noqa: E402
from grafink_spark.sources.tables import load_table  # noqa: E402
from grafink_spark.util import ensure_min_partitions, pin_lazy  # noqa: E402

NUM, DEN, K = 9, 10, 3
DEC = "decimal(38,0)"


def tc_frame(docs):
    base = docs.select(
        F.col("doc_id").alias("_id"), _tokens(F.col("text")).alias("_t")
    )
    feats = base.select(
        "_id", F.explode(shingles_from_tokens(F.col("_t"), K)).alias("_term")
    )
    feats = feats.select("_id", hash60(F.col("_term")).alias("_term"))
    return (
        feats.groupBy("_id", "_term")
        .agg(F.count(F.lit(1)).alias("_c"))
        .transform(pin_lazy)
    )


def prefix_agg(tc):
    """Current form: freq agg + join, tot agg + join, window _s."""
    freq = tc.groupBy("_term").agg(F.count(F.lit(1)).alias("_df"))
    tot = tc.groupBy("_id").agg(
        F.sum(F.col("_c") * F.col("_c")).alias("_tt")
    ).transform(pin_lazy)
    w = Window.partitionBy("_id").orderBy(F.col("_df").asc(), F.col("_term").asc())
    ranked = (
        tc.join(freq, "_term")
        .withColumn(
            "_s",
            F.coalesce(
                F.sum(F.col("_c") * F.col("_c")).over(
                    w.rowsBetween(Window.unboundedPreceding, -1)
                ),
                F.lit(0),
            ),
        )
        .join(tot, "_id")
    )
    return ranked


def prefix_win(tc):
    """Window form: _df = count over _term partition, _tt = sum over
    _id partition — no freq/tot joins (guide §2.4: same-key windows
    share the aggregation's exchange)."""
    wt = Window.partitionBy("_term")
    wi = Window.partitionBy("_id").orderBy(F.col("_df").asc(), F.col("_term").asc())
    return (
        tc.withColumn("_df", F.count(F.lit(1)).over(wt))
        .withColumn("_tt", F.sum(F.col("_c") * F.col("_c")).over(Window.partitionBy("_id")))
        .withColumn(
            "_s",
            F.coalesce(
                F.sum(F.col("_c") * F.col("_c")).over(
                    wi.rowsBetween(Window.unboundedPreceding, -1)
                ),
                F.lit(0),
            ),
        )
    )


def prefix_frame(ranked):
    return ranked.where(
        F.lit(DEN * DEN).cast(DEC) * (F.col("_tt") - F.col("_s")).cast(DEC)
        >= F.lit(NUM * NUM).cast(DEC) * F.col("_tt").cast(DEC)
    ).select("_id", "_term", "_s", "_tt").transform(pin_lazy)


def pos_filter(df):
    return df.where(
        F.lit(DEN * DEN).cast(DEC)
        * (F.col("_ta") - F.col("_sa")).cast(DEC)
        * (F.col("_tb") - F.col("_sb")).cast(DEC)
        >= F.lit(NUM * NUM).cast(DEC)
        * F.col("_ta").cast(DEC)
        * F.col("_tb").cast(DEC)
    )


def cand_join(prefix, bcast=False):
    pa = prefix.select(
        "_term",
        F.col("_id").alias("id_a"),
        F.col("_s").alias("_sa"),
        F.col("_tt").alias("_ta"),
    )
    pb = prefix.select(
        "_term",
        F.col("_id").alias("id_b"),
        F.col("_s").alias("_sb"),
        F.col("_tt").alias("_tb"),
    )
    if bcast:
        pb = F.broadcast(pb)
    return (
        pos_filter(pa.join(pb, "_term").where(F.col("id_a") < F.col("id_b")))
        .select("id_a", "id_b")
        .distinct()
    )


def cand_plist(prefix):
    plist = prefix.groupBy("_term").agg(
        F.collect_list(F.struct("_id", "_s", "_tt")).alias("_l")
    ).where(F.size("_l") >= 2)
    exp = (
        plist.select(F.explode("_l").alias("_a"), "_l")
        .select("_a", F.explode("_l").alias("_b"))
        .where(F.col("_a._id") < F.col("_b._id"))
        .select(
            F.col("_a._id").alias("id_a"),
            F.col("_b._id").alias("id_b"),
            F.col("_a._s").alias("_sa"),
            F.col("_a._tt").alias("_ta"),
            F.col("_b._s").alias("_sb"),
            F.col("_b._tt").alias("_tb"),
        )
    )
    return pos_filter(exp).select("id_a", "id_b").distinct()


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument(
        "--sf",
        default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"),
    )
    ap.add_argument("--reps", type=int, default=4)
    ap.add_argument("--check", action="store_true")
    args = ap.parse_args()

    spark = get_spark("apss-ab")
    spark.sparkContext.setLogLevel("ERROR")
    docs = ensure_min_partitions(load_table(spark, args.sf, "documents"))
    docs.write.format("noop").mode("overwrite").save()

    def build(variant: str):
        tc = tc_frame(docs)
        if variant in ("win", "win_bcast"):
            prefix = prefix_frame(prefix_win(tc))
        else:
            prefix = prefix_frame(prefix_agg(tc))
        if variant == "plist":
            return cand_plist(prefix)
        return cand_join(prefix, bcast=variant in ("bcast", "win_bcast"))

    variants = ["smj", "plist", "bcast", "win", "win_bcast"]
    if args.check:
        ref = build("smj").collect()
        ref_set = {(r.id_a, r.id_b) for r in ref}
        print(f"smj candidates: {len(ref_set)}")
        for v in variants[1:]:
            got = {(r.id_a, r.id_b) for r in build(v).collect()}
            print(f"{v}: {'EQUAL' if got == ref_set else 'DIFFER'} ({len(got)})")
        return 0

    times: dict[str, list[float]] = {v: [] for v in variants}
    for rep in range(args.reps):
        for v in variants:
            t0 = time.perf_counter()
            build(v).write.format("noop").mode("overwrite").save()
            dt = round(time.perf_counter() - t0, 3)
            times[v].append(dt)
            print(f"rep{rep} {v}: {dt}", flush=True)
    for v in variants:
        print(f"{v}: {times[v]} min={min(times[v])}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
