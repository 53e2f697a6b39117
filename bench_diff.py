"""Round-over-round bench regression diff.

Compares two complete per-query bench artifacts (bench_results_r{n}.json,
written by ``python bench.py``) and prints per-query deltas, worst
regressions first — the mechanical replacement for reconstructing
timings from truncated BENCH stdout tails.

    python bench_diff.py [old.json] [new.json] [--threshold 1.5]

With no arguments, diffs the two most recent artifacts in the repo root.
Exit code 0 always (informational — regressions at bench scale are often
output-growth or first-touch noise; the threshold just orders attention).
"""

from __future__ import annotations

import glob
import json
import os
import sys


def load(path: str) -> dict:
    with open(path) as f:
        return json.load(f)


def contention_signature(
    flagged: list[tuple], run_order: list[str] | None,
    load_old: dict | None, load_new: dict | None,
) -> list[str]:
    """Heuristics separating machine contention from code regressions
    (round-5 verdict ask #5 — that round ~66 s of the driver headline
    was a busy machine, diagnosed by hand):

    - CONTIGUITY: regressed queries clustering in one contiguous
      run-order stretch is the signature of a noisy-neighbor window —
      independent code regressions scatter across the run.
    - LOADAVG: the artifact records the 1-min loadavg at each query's
      start; a regressed query whose loadavg jumped vs the old run was
      competing for cores.

    Returns printable marker lines (empty = no signature)."""
    out: list[str] = []
    names = [q for _, q, _, _ in flagged]
    if run_order and len(names) >= 3:
        idx = {q: i for i, q in enumerate(run_order)}
        pos = sorted(idx[q] for q in names if q in idx)
        if len(pos) >= 3:
            span = pos[-1] - pos[0] + 1
            if span <= 2 * len(pos):
                out.append(
                    f"!! contention signature: {len(pos)} regressions fall in "
                    f"one contiguous run-order stretch of {span} queries "
                    f"(positions {pos[0]}-{pos[-1]}) — machine noise, not a "
                    "code regression, is the likely cause"
                )
    if load_old and load_new:
        def _load(v) -> float:
            # r08+ artifacts record a loadavg PER PASS (list); the kept
            # timing is the min over passes, so the telling load figure
            # is the lowest one — if even the least-loaded pass ran hot,
            # contention explains a slow min. Pre-r08: scalar.
            if isinstance(v, list):
                return min(v) if v else 0.0
            return float(v or 0.0)

        hot = [
            (q, _load(load_old.get(q)), _load(load_new.get(q)))
            for q in names
            if _load(load_new.get(q))
            > max(2.0 * max(_load(load_old.get(q)), 1.0), 8.0)
        ]
        if hot:
            out.append(
                "!! loadavg jumped on regressed queries (old -> new): "
                + ", ".join(f"{q} {o} -> {n}" for q, o, n in hot)
            )
    return out


def diff_section(old: dict, new: dict, label: str, threshold: float,
                 run_order: list[str] | None = None,
                 load_old: dict | None = None,
                 load_new: dict | None = None) -> None:
    shared = sorted(set(old) & set(new))
    added = sorted(set(new) - set(old))
    removed = sorted(set(old) - set(new))
    rows = []
    for q in shared:
        o, n = float(old[q]), float(new[q])
        ratio = (n / o) if o > 0 else float("inf")
        rows.append((ratio, q, o, n))
    rows.sort(reverse=True)
    print(f"\n== {label}: {len(shared)} shared, {len(added)} added, "
          f"{len(removed)} removed ==")
    print(f"total: {sum(r[2] for r in rows):.1f}s -> {sum(r[3] for r in rows):.1f}s")
    flagged = [r for r in rows if r[0] >= threshold and r[3] - r[2] > 0.5]
    if flagged:
        print(f"-- regressions >= {threshold}x (and > 0.5s absolute) --")
        for ratio, q, o, n in flagged:
            print(f"  {q}: {o:.2f}s -> {n:.2f}s ({ratio:.2f}x)")
        for line in contention_signature(flagged, run_order, load_old, load_new):
            print(line)
    improved = [r for r in rows if r[0] <= 1 / threshold and r[2] - r[3] > 0.5]
    if improved:
        print(f"-- improvements <= {1/threshold:.2f}x --")
        for ratio, q, o, n in sorted(improved):
            print(f"  {q}: {o:.2f}s -> {n:.2f}s ({ratio:.2f}x)")
    if added:
        print(f"-- new queries: {', '.join(added)}")
    if removed:
        print(f"-- removed queries: {', '.join(removed)}")


def main() -> int:
    threshold = 1.5
    args: list[str] = []
    argv = sys.argv[1:]
    i = 0
    while i < len(argv):
        a = argv[i]
        if a.startswith("--threshold"):
            if "=" in a:
                threshold = float(a.split("=", 1)[1])
            else:
                if i + 1 >= len(argv):
                    print("--threshold needs a value")
                    return 2
                threshold = float(argv[i + 1])
                i += 1
        else:
            args.append(a)
        i += 1
    if len(args) >= 2:
        old_path, new_path = args[0], args[1]
    else:
        arts = sorted(glob.glob(os.path.join(os.path.dirname(os.path.abspath(__file__)), "bench_results_r*.json")))
        if len(arts) < 2:
            print("need two bench_results_r*.json artifacts (or pass paths)")
            return 0
        old_path, new_path = arts[-2], arts[-1]
    old, new = load(old_path), load(new_path)
    print(f"diff {os.path.basename(old_path)} (round {old.get('round')}) -> "
          f"{os.path.basename(new_path)} (round {new.get('round')})")
    diff_section(old.get("queries", {}), new.get("queries", {}),
                 f"sf{new.get('sf')}", threshold,
                 run_order=new.get("run_order"),
                 load_old=old.get("loadavg"), load_new=new.get("loadavg"))
    if old.get("sf1") and new.get("sf1"):
        diff_section(old["sf1"], new["sf1"], "sf1", threshold,
                     run_order=new.get("run_order"),
                     load_old=old.get("loadavg_sf1"),
                     load_new=new.get("loadavg_sf1"))
    if old.get("scale_stress") and new.get("scale_stress"):
        diff_section(old["scale_stress"], new["scale_stress"], "scale_stress", threshold)
    return 0


if __name__ == "__main__":
    sys.exit(main())
