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
