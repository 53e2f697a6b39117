"""PII detection and redaction over text columns.

Another training-data-pipeline stage absent from the reference (its
alert payloads carry no free text); standard practice before a corpus
ships. Patterns are deliberately conservative and portable: the same
regex must mean the same thing to Spark's Java engine and the DuckDB
RE2 oracle, so no lookarounds, no backreferences, explicit character
classes only.

Scale notes: counting and redaction are pure per-row regexp
expressions — narrow, zero shuffles, whole-stage codegen; regex cost is
the algorithm. Redaction replaces in a fixed pattern order (email,
phone, ipv4) so overlapping matches resolve deterministically.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# ordered: applied to the text in this sequence
PII_PATTERNS: dict[str, tuple[str, str]] = {
    "email": (
        r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}",
        "<EMAIL>",
    ),
    "phone": (
        r"\+[0-9]{1,2} [0-9]{3}-[0-9]{3}-[0-9]{4}",
        "<PHONE>",
    ),
    "ipv4": (
        r"\b[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\b",
        "<IP>",
    ),
}


def pii_counts(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Adds one n_<kind> match-count column per pattern."""
    out = df
    for kind, (pat, _) in PII_PATTERNS.items():
        out = out.withColumn(
            f"n_{kind}", F.regexp_count(F.col(text_col), F.lit(pat))
        )
    return out


def redact_pii(
    df: DataFrame, text_col: str = "text", out_col: str | None = None
) -> DataFrame:
    """Replaces every PII match with its placeholder token, in the
    fixed PII_PATTERNS order."""
    red = F.col(text_col)
    for pat, token in PII_PATTERNS.values():
        red = F.regexp_replace(red, pat, token)
    return df.withColumn(out_col or text_col, red)


def k_anonymity_audit(
    df: DataFrame,
    quasi_cols: list[str],
    sensitive_col: str | None = None,
    k: int = 5,
    l_div: int = 2,
) -> DataFrame:
    """Re-identification risk audit before a dataset ships: group rows
    by the quasi-identifier combination and report, per group, its size
    (k-anonymity) and — when ``sensitive_col`` is given — its count of
    distinct sensitive values (l-diversity). A group is ``at_risk``
    when it has fewer than ``k`` members or fewer than ``l_div``
    distinct sensitive values (an attacker who maps a person to the
    group learns their sensitive value outright when diversity is 1).

    Returns (quasi_cols..., group_size, n_sensitive, at_risk) — one row
    per quasi combination, so the output is group-cardinality sized,
    never row sized.

    Scale: one hash shuffle on the quasi columns with map-side partial
    aggregation; count_distinct over the sensitive column is the only
    non-algebraic aggregate (exact here — at 100 TB swap for
    approx_count_distinct when an estimated diversity bound suffices).
    """
    aggs = [F.count(F.lit(1)).alias("group_size")]
    if sensitive_col is not None:
        aggs.append(
            F.countDistinct(F.col(sensitive_col)).alias("n_sensitive")
        )
    else:
        aggs.append(F.lit(None).cast("long").alias("n_sensitive"))
    out = df.groupBy(*quasi_cols).agg(*aggs)
    risk = F.col("group_size") < k
    if sensitive_col is not None:
        risk = risk | (F.col("n_sensitive") < l_div)
    return out.withColumn("at_risk", risk)
