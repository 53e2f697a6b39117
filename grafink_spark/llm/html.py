"""HTML → text extraction and boilerplate signals, pure Catalyst.

The first real step of a web-corpus pipeline (Common-Crawl-style WARC
→ training text) is stripping markup and scoring boilerplate. Both are
string-expression work, so this module stays 100% JVM-side — chained
``regexp_replace``/``regexp_extract_all`` built-ins inside whole-stage
codegen, no UDF, no Arrow round trip — exactly the hot-path rule the
100 TB design point demands (a Python-UDF tag stripper would serialize
every document byte through the executor's Python worker).

Patterns stay in the Java-regex ∩ RE2 common subset (inline ``(?is)``
flags, non-greedy ``.*?``) so a DuckDB oracle replays the IDENTICAL
extraction on the identical synthesized HTML.

Semantics (deliberately boring, corpus-grade — not a browser):

- ``<script>``/``<style>`` elements vanish WITH their contents; every
  other tag becomes a space (block/inline distinction doesn't matter
  for shingle/quality purposes).
- The five predefined XML entities (``&lt; &gt; &quot; &apos;
  &amp;``) plus ``&nbsp;`` and the apostrophe's decimal form
  ``&#39;`` unescape; everything else — named entities beyond these,
  general numeric escapes — passes through verbatim (corpus-grade,
  not a full HTML5 entity table).
- ``link_density`` = anchor-text chars / visible-text chars — the
  jusText/CCNet-style boilerplate signal: navigation chrome is mostly
  links, article bodies are not.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_SCRIPT_STYLE = r"(?is)<(script|style)\b[^>]*>.*?</(script|style)\s*>"
_TITLE = r"(?is)<title[^>]*>(.*?)</title>"
_ANCHOR = r"(?is)<a\b[^>]*>(.*?)</a>"
_TAG = r"(?s)<[^>]*>"


def _unescape_entities(col: Column) -> Column:
    """The five predefined XML entities + nbsp + the apostrophe's
    decimal form. &amp; LAST, so double-escaped text (&amp;lt;)
    un-escapes exactly one level — the W3C-correct order."""
    col = F.regexp_replace(col, "&lt;", "<")
    col = F.regexp_replace(col, "&gt;", ">")
    col = F.regexp_replace(col, "&quot;", '"')
    col = F.regexp_replace(col, "&#39;", "'")
    col = F.regexp_replace(col, "&apos;", "'")
    col = F.regexp_replace(col, "&nbsp;", " ")
    col = F.regexp_replace(col, "&amp;", "&")
    return col


def _visible_text(html: Column) -> Column:
    """Markup → normalized visible text: drop script/style subtrees,
    tags → spaces, unescape entities, collapse whitespace."""
    no_script = F.regexp_replace(html, _SCRIPT_STYLE, " ")
    no_tags = F.regexp_replace(no_script, _TAG, " ")
    unescaped = _unescape_entities(no_tags)
    return F.trim(F.regexp_replace(unescaped, r"\s+", " "))


def html_text_signals(
    df: DataFrame,
    html_col: str = "html",
    id_col: str = "doc_id",
    keep: list[str] | None = None,
) -> DataFrame:
    """Per-document extraction + boilerplate signals:

    (id, *keep, title, text, text_chars, n_links, link_chars,
    link_density)

    ``keep``: extra input columns carried through unchanged (e.g. the
    WARC record index / url when the input is one row per crawled
    record). One narrow projection — every expression is a Catalyst
    built-in, so the whole row pipeline stays inside whole-stage
    codegen and scales as a pure map over the corpus scan."""
    html = F.col(html_col)
    no_script = F.regexp_replace(html, _SCRIPT_STYLE, " ")
    title = F.trim(
        _unescape_entities(
            F.regexp_replace(F.regexp_extract(no_script, _TITLE, 1), _TAG, " ")
        )
    )
    text = _visible_text(html)
    anchors = F.regexp_extract_all(no_script, F.lit(_ANCHOR), F.lit(1))
    anchor_text_len = F.aggregate(
        F.transform(
            anchors,
            lambda a: F.length(
                F.trim(
                    F.regexp_replace(
                        _unescape_entities(F.regexp_replace(a, _TAG, " ")),
                        r"\s+",
                        " ",
                    )
                )
            ),
        ),
        F.lit(0),
        lambda acc, x: acc + x,
    )
    text_chars = F.length(text)
    return df.select(
        F.col(id_col),
        *[F.col(c) for c in (keep or [])],
        title.alias("title"),
        text.alias("text"),
        text_chars.cast("long").alias("text_chars"),
        F.size(anchors).cast("long").alias("n_links"),
        anchor_text_len.cast("long").alias("link_chars"),
        (
            anchor_text_len.cast("double")
            / F.greatest(text_chars.cast("double"), F.lit(1.0))
        ).alias("link_density"),
    )


def boilerplate_filter(
    df: DataFrame,
    html_col: str = "html",
    id_col: str = "doc_id",
    max_link_density: float = 0.3,
    min_text_chars: int = 50,
) -> DataFrame:
    """Corpus-prep gate over :func:`html_text_signals`: keep documents
    whose extracted text is long enough and not link-chrome (the CCNet
    bucket rule applied at the HTML layer). Returns the signal columns
    plus ``keep`` — callers filter or route on it, so rejected rows
    remain observable for datasheet accounting."""
    sig = html_text_signals(df, html_col, id_col)
    return sig.withColumn(
        "keep",
        (F.col("link_density") <= max_link_density)
        & (F.col("text_chars") >= min_text_chars),
    )
