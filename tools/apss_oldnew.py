"""Same-session alternated A/B: old vs new _apss_frames (r10).

Loads the baseline dedup.py from a worktree under a separate module
name so BOTH implementations run inside one warm session — the only
protocol this host's memory weather respects. Measurement tool only.

Usage: python tools/apss_oldnew.py OLD_DEDUP_PY [--sf DIR] [--reps N]
"""

from __future__ import annotations

import argparse
import importlib.util
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from grafink_spark.session import get_spark  # noqa: E402
from grafink_spark.sources.tables import load_table  # noqa: E402
from grafink_spark.util import ensure_min_partitions  # noqa: E402


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("old_path")
    ap.add_argument(
        "--sf",
        default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"),
    )
    ap.add_argument("--reps", type=int, default=4)
    args = ap.parse_args()

    import grafink_spark.llm.dedup as dd_new

    spec = importlib.util.spec_from_file_location("dedup_old", args.old_path)
    dd_old = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(dd_old)

    spark = get_spark("apss-oldnew")
    spark.sparkContext.setLogLevel("ERROR")
    docs = ensure_min_partitions(load_table(spark, args.sf, "documents"))
    docs.write.format("noop").mode("overwrite").save()

    times = {"old": [], "new": []}
    for rep in range(args.reps):
        for tag, mod in (("old", dd_old), ("new", dd_new)):
            t0 = time.perf_counter()
            mod.weighted_cosine_join(
                docs, threshold=(9, 10), k=3
            ).write.format("noop").mode("overwrite").save()
            dt = round(time.perf_counter() - t0, 3)
            times[tag].append(dt)
            print(f"rep{rep} {tag}: {dt}", flush=True)
    for tag, s in times.items():
        print(f"{tag}: {s} min={min(s)}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
