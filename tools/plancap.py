"""Capture .explain("formatted") for named registry queries to files.

Usage: python tools/plancap.py OUTDIR SUFFIX q1 q2 ...

Writes OUTDIR/<query>_<SUFFIX>.txt. Pinned subtrees are captured too
(util.capture_pins) — a checkpoint truncates lineage, so the final
plan alone would hide everything upstream of a pin.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from grafink_spark.benchqueries import QUERIES  # noqa: E402
from grafink_spark.session import get_spark  # noqa: E402
from grafink_spark.util import capture_pins  # noqa: E402


def main() -> int:
    outdir, suffix = sys.argv[1], sys.argv[2]
    names = sys.argv[3:]
    os.makedirs(outdir, exist_ok=True)
    spark = get_spark("grafink-plancap")
    spark.sparkContext.setLogLevel("ERROR")
    sf = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    jvm = spark.sparkContext._jvm

    def fmt(df):
        return jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        )

    for name in names:
        with capture_pins() as pinned:
            df = QUERIES[name](spark, sf)
        parts = ["== FINAL PLAN ==", fmt(df)]
        for i, p in enumerate(pinned):
            parts.append(f"== PINNED SUBTREE {i} (pre-checkpoint) ==")
            parts.append(fmt(p))
        path = os.path.join(outdir, f"{name}_{suffix}.txt")
        with open(path, "w") as f:
            f.write("\n".join(parts))
        print(f"wrote {path}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
