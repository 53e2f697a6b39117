"""Finer-grained APSS stage timing (r10): mirrors _apss_frames' stage
construction to time tc/prefix/cand/verify separately, plus size
counters (prefix rows, max posting length, pre-distinct pair volume).
Measurement tool only.

Usage: python tools/apss_stages.py [--sf DIR] [--reps N]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import Window  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402

from grafink_spark.llm.dedup import hash60  # noqa: E402
from grafink_spark.llm.text import tokens as _tokens  # noqa: E402
from grafink_spark.session import get_spark  # noqa: E402
from grafink_spark.sources.tables import load_table  # noqa: E402
from grafink_spark.util import ensure_min_partitions, pin_lazy  # noqa: E402


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument(
        "--sf",
        default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"),
    )
    ap.add_argument("--reps", type=int, default=3)
    args = ap.parse_args()
    num, den, k = 9, 10, 3

    spark = get_spark("apss-stages")
    spark.sparkContext.setLogLevel("ERROR")
    docs = ensure_min_partitions(load_table(spark, args.sf, "documents"))
    docs.write.format("noop").mode("overwrite").save()

    from grafink_spark.llm.dedup import shingles_from_tokens

    def build(upto: str):
        base = docs.select(
            F.col("doc_id").alias("_id"), _tokens(F.col("text")).alias("_t")
        )
        feats = base.select(
            "_id",
            F.explode(shingles_from_tokens(F.col("_t"), k)).alias("_term"),
        )
        feats = feats.select("_id", hash60(F.col("_term")).alias("_term"))
        tc = (
            feats.groupBy("_id", "_term")
            .agg(F.count(F.lit(1)).alias("_c"))
            .transform(pin_lazy)
        )
        if upto == "tc":
            return tc
        freq = tc.groupBy("_term").agg(F.count(F.lit(1)).alias("_df"))
        tot = tc.groupBy("_id").agg(
            F.sum(F.col("_c") * F.col("_c")).alias("_tt")
        ).transform(pin_lazy)
        w = Window.partitionBy("_id").orderBy(
            F.col("_df").asc(), F.col("_term").asc()
        )
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
        dec = "decimal(38,0)"
        prefix = ranked.where(
            F.lit(den * den).cast(dec)
            * (F.col("_tt") - F.col("_s")).cast(dec)
            >= F.lit(num * num).cast(dec) * F.col("_tt").cast(dec)
        ).select("_id", "_term", "_s", "_tt").transform(pin_lazy)
        if upto == "prefix":
            return prefix
        pa = prefix.select(
            F.col("_term"),
            F.col("_id").alias("id_a"),
            F.col("_s").alias("_sa"),
            F.col("_tt").alias("_ta"),
        )
        pb = prefix.select(
            F.col("_term"),
            F.col("_id").alias("id_b"),
            F.col("_s").alias("_sb"),
            F.col("_tt").alias("_tb"),
        )
        raw = (
            pa.join(pb, "_term")
            .where(F.col("id_a") < F.col("id_b"))
            .where(
                F.lit(den * den).cast(dec)
                * (F.col("_ta") - F.col("_sa")).cast(dec)
                * (F.col("_tb") - F.col("_sb")).cast(dec)
                >= F.lit(num * num).cast(dec)
                * F.col("_ta").cast(dec)
                * F.col("_tb").cast(dec)
            )
            .select("id_a", "id_b")
        )
        if upto == "raw":
            return raw
        return raw.distinct()

    def t(label, fn):
        out = []
        for _ in range(args.reps):
            t0 = time.perf_counter()
            fn()
            out.append(round(time.perf_counter() - t0, 3))
        print(f"{label}: {out} min={min(out)}", flush=True)

    for stage in ("tc", "prefix", "raw", "cand"):
        t(stage, lambda s=stage: build(s).write.format("noop").mode(
            "overwrite"
        ).save())

    # size counters
    prefix = build("prefix")
    n_prefix = prefix.count()
    bucket = prefix.groupBy("_term").count()
    stats = bucket.agg(
        F.count(F.lit(1)).alias("n_terms"),
        F.max("count").alias("max_len"),
        F.sum(F.col("count") * (F.col("count") - 1) / 2).alias("join_pairs"),
    ).collect()[0]
    n_raw = build("raw").count()
    n_cand = build("cand").count()
    print(
        f"prefix_rows={n_prefix} terms={stats['n_terms']} "
        f"max_posting={stats['max_len']} join_pairs={stats['join_pairs']} "
        f"raw_pairs={n_raw} candidates={n_cand}",
        flush=True,
    )
    return 0


if __name__ == "__main__":
    sys.exit(main())
