"""Gopher-style repetition/shape signals: hand-checked goldens."""

import pytest

from grafink_spark.llm import signals as sg


def _one(df):
    return df.collect()[0].asDict()


def test_line_signals(spark):
    df = spark.createDataFrame(
        [(1, "x\nx\n- b\nz...")], "doc_id long, text string"
    )
    r = _one(sg.line_signals(df))
    assert r["n_lines"] == 4
    assert r["dup_line_fraction"] == pytest.approx(0.25)
    assert r["bullet_line_fraction"] == pytest.approx(0.25)
    assert r["ellipsis_line_fraction"] == pytest.approx(0.25)


def test_repetition_golden(spark):
    # "a a b a c": unigrams 5 total / top 3 / dup 3;
    # bigrams {a a, a b, b a, a c} all unique; trigrams 3 unique
    df = spark.createDataFrame([(1, "a a b a c")], "doc_id long, text string")
    r = _one(sg.repetition_signals(df))
    assert r["top_1gram_fraction"] == pytest.approx(3 / 5)
    assert r["dup_1gram_fraction"] == pytest.approx(3 / 5)
    assert r["top_2gram_fraction"] == pytest.approx(1 / 4)
    assert r["dup_2gram_fraction"] == 0.0
    assert r["top_3gram_fraction"] == pytest.approx(1 / 3)
    assert r["dup_3gram_fraction"] == 0.0


def test_repeated_bigram(spark):
    df = spark.createDataFrame(
        [(1, "go go go go")], "doc_id long, text string"
    )
    r = _one(sg.repetition_signals(df))
    # bigrams: "go go" ×3
    assert r["top_2gram_fraction"] == 1.0
    assert r["dup_2gram_fraction"] == 1.0


def test_short_and_empty_docs(spark):
    df = spark.createDataFrame(
        [(1, "only two"), (2, ""), (3, "one")], "doc_id long, text string"
    )
    rows = {r["doc_id"]: r.asDict() for r in sg.document_signals(df).collect()}
    # doc 1: one bigram, no trigrams possible
    assert rows[1]["top_3gram_fraction"] == 0.0
    assert rows[1]["top_2gram_fraction"] == 1.0
    # doc 2: no tokens at all -> every fraction 0, no dropped row
    assert rows[2]["top_1gram_fraction"] == 0.0
    assert rows[2]["dup_1gram_fraction"] == 0.0
    # doc 3: single token
    assert rows[3]["top_1gram_fraction"] == 1.0
    assert rows[3]["dup_1gram_fraction"] == 0.0


def test_ngram_counts_building_block(spark):
    df = spark.createDataFrame([(1, "a a b")], "doc_id long, text string")
    got = {
        (r["n"], r["gram"]): r["cnt"]
        for r in sg.ngram_counts(df, ns=(1, 2)).collect()
    }
    assert got == {
        (1, "a"): 2, (1, "b"): 1,
        (2, "a a"): 1, (2, "a b"): 1,
    }


def test_run_stats_matches_bruteforce(spark):
    # 60 randomized docs (fixed seed), fold vs Counter reference
    import random
    from collections import Counter

    rng = random.Random(7)
    vocab = ["a", "b", "c", "dd", "ee"]
    docs = [
        (i, " ".join(rng.choice(vocab) for _ in range(rng.randint(0, 12))))
        for i in range(60)
    ]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    got = {
        r["doc_id"]: r.asDict()
        for r in sg.repetition_signals(df, ns=(1, 2)).collect()
    }
    for doc_id, text in docs:
        toks = text.split() if text.strip() else []
        for n in (1, 2):
            grams = [
                " ".join(toks[i : i + n]) for i in range(len(toks) - n + 1)
            ]
            c = Counter(grams)
            total = sum(c.values())
            top = max(c.values()) / total if total else 0.0
            dup = (
                sum(v for v in c.values() if v > 1) / total if total else 0.0
            )
            assert got[doc_id][f"top_{n}gram_fraction"] == pytest.approx(top)
            assert got[doc_id][f"dup_{n}gram_fraction"] == pytest.approx(dup)


def test_redact_is_idempotent(spark):
    from grafink_spark.llm import pii as pi
    from pyspark.sql import functions as F

    df = spark.createDataFrame(
        [(1, "a@b.co and +1 222-333-4444 at 1.2.3.4")],
        "doc_id long, text string",
    )
    once = pi.redact_pii(df)
    twice = pi.redact_pii(once)
    assert once.collect() == twice.collect()


def test_gopher_filter_rules(spark):
    """Each rule independently rejects its violation class."""
    from grafink_spark.llm.signals import gopher_filter

    good = "the quick brown fox jumps over the lazy dog while it was warm that day"
    rows = [
        (1, good),                                       # passes
        (2, "the cat"),                                  # too few tokens
        (3, "supercalifragilistic " * 20 + "the a of"),  # mean word len > 10
        (4, "zz qq ww ee rr tt yy uu ii oo pp aa"),      # no stopwords
        (5, "\n".join(["the same line the a of it"] * 10)),  # dup lines
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    kept = {r.doc_id for r in gopher_filter(docs, min_tokens=5).collect()}
    assert kept == {1}


def test_gopher_filter_case_insensitive(spark):
    """Gopher Table A1 rules are case-insensitive: ALL-CAPS words still
    count as alphabetic, and sentence-initial capitalized stopwords
    ('The', 'It') hit the stoplist."""
    from grafink_spark.llm.signals import gopher_filter

    # all-caps text whose lowercased form passes every rule; the only
    # stopword occurrences are capitalized
    caps = "The QUICK BROWN FOX JUMPS OVER It WAS WARM That DAY HERE NOW"
    docs = spark.createDataFrame(
        [(1, caps)], "doc_id long, text string"
    )
    out = gopher_filter(docs, min_tokens=5).collect()
    assert [r.doc_id for r in out] == [1]
    # 'The'/'It'/'That' fold to 3 distinct stopwords
    assert out[0].n_stopwords >= 2
