"""Stage-level profiling for the APSS exact-cosine family (r10).

Times the weighted_cosine_join pipeline's stages in isolation in one
session: candidate generation (prefix pipeline through the distinct),
the vector-table collect (toPandas + broadcast build), and the full
query per verify backend. Measurement tool only — not part of the
bench contract.

Usage: python tools/apss_prof.py [--sf DIR] [--reps N]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from grafink_spark.session import get_spark  # noqa: E402
from grafink_spark.sources.tables import load_table  # noqa: E402
from grafink_spark.util import ensure_min_partitions  # noqa: E402


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument(
        "--sf",
        default=os.environ.get(
            "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"
        ),
    )
    ap.add_argument("--reps", type=int, default=3)
    args = ap.parse_args()

    import grafink_spark.llm.dedup as dd

    spark = get_spark("apss-prof")
    spark.sparkContext.setLogLevel("ERROR")
    docs = ensure_min_partitions(load_table(spark, args.sf, "documents"))
    docs.write.format("noop").mode("overwrite").save()

    def t(label, fn):
        out = []
        for _ in range(args.reps):
            t0 = time.perf_counter()
            fn()
            out.append(round(time.perf_counter() - t0, 3))
        print(f"{label}: {out} min={min(out)}")

    # stage: candidate generation only (explicit backend keeps the
    # constructor lazy; drain just the candidate frame)
    def cand_only():
        fr = dd._apss_frames(docs, threshold=(9, 10), k=3, verify="join")
        fr["candidates"].write.format("noop").mode("overwrite").save()

    t("candidates", cand_only)

    # stage: full query per backend
    for backend in ("arrow", "join", "map"):
        def full(b=backend):
            dd.weighted_cosine_join(
                docs, threshold=(9, 10), k=3, verify=b
            ).write.format("noop").mode("overwrite").save()

        t(f"full[{backend}]", full)
    return 0


if __name__ == "__main__":
    sys.exit(main())
