"""Bigram LM scoring (llm/lm.py) golden tests."""

import math

import pytest

from grafink_spark.llm.lm import bigram_counts, lm_score, vocab_size


@pytest.fixture()
def docs(spark):
    return spark.createDataFrame(
        [(1, "a b a b"), (2, "a b c"), (3, "z")],
        "doc_id long, text string",
    )


def test_bigram_counts(spark, docs):
    got = {
        (r["w1"], r["w2"]): r["c12"] for r in bigram_counts(docs).collect()
    }
    assert got == {("a", "b"): 3, ("b", "a"): 1, ("b", "c"): 1}


def test_vocab_size(spark, docs):
    assert vocab_size(docs) == 4


def test_lm_score_golden(spark, docs):
    out = {r["doc_id"]: r for r in lm_score(docs, alpha=0.1).collect()}
    lp_ab = math.log((3 + 0.1) / (3 + 0.1 * 4))
    lp_ba = math.log((1 + 0.1) / (2 + 0.1 * 4))
    lp_bc = math.log((1 + 0.1) / (2 + 0.1 * 4))
    assert out[1]["n_bigrams"] == 3
    assert out[1]["avg_logp"] == pytest.approx(
        (lp_ab + lp_ba + lp_ab) / 3, abs=1e-12
    )
    assert out[2]["avg_logp"] == pytest.approx(
        (lp_ab + lp_bc) / 2, abs=1e-12
    )
    # single-token doc has no bigrams and is omitted
    assert 3 not in out


def test_lm_score_separate_train_corpus(spark, docs):
    # score unseen docs against the LM trained on `docs`: 'b' is a seen
    # left context (marginal 2) but (b, z) is unseen; 'q' is an unseen
    # context, backing off to alpha / (alpha*V)
    target = spark.createDataFrame(
        [(10, "b z"), (11, "q q")], "doc_id long, text string"
    )
    out = {
        r["doc_id"]: r["avg_logp"]
        for r in lm_score(target, train=docs, alpha=0.1).collect()
    }
    v = 4
    assert out[10] == pytest.approx(
        math.log(0.1 / (2 + 0.1 * v)), abs=1e-12
    )
    assert out[11] == pytest.approx(math.log(0.1 / (0.1 * v)), abs=1e-12)


def test_nb_classify_golden(spark):
    from grafink_spark.llm.classify import nb_classify

    train = spark.createDataFrame(
        [
            (1, "spam buy now buy", "spam"),
            (2, "buy spam spam now", "spam"),
            (3, "hello dear friend hello", "ham"),
            (4, "dear friend hello dear", "ham"),
        ],
        "doc_id long, text string, lang string",
    )
    test = spark.createDataFrame(
        [(10, "buy buy now"), (11, "hello dear")],
        "doc_id long, text string",
    )
    got = {r.doc_id: r.pred for r in nb_classify(test, train=train).collect()}
    assert got == {10: "spam", 11: "ham"}


def test_nb_classify_tie_breaks_min_label(spark):
    from grafink_spark.llm.classify import nb_classify

    # perfectly symmetric classes → equal scores → min label wins
    train = spark.createDataFrame(
        [(1, "x y", "a"), (2, "x y", "b")],
        "doc_id long, text string, lang string",
    )
    test = spark.createDataFrame([(10, "x")], "doc_id long, text string")
    got = nb_classify(test, train=train).collect()
    assert got[0].pred == "a"


def test_nb_classify_resubstitution_beats_chance(spark):
    from pyspark.sql import functions as F

    from grafink_spark.llm.classify import nb_classify
    from grafink_spark.sources.tables import load_table

    docs = load_table(spark, "/root/testdata/sf0.001", "documents")
    out = nb_classify(docs).join(docs.select("doc_id", "lang"), "doc_id")
    acc = out.select(
        F.avg((F.col("pred") == F.col("lang")).cast("double")).alias("a")
    ).first().a
    n_classes = docs.select("lang").distinct().count()
    assert acc > 1.5 / n_classes


def test_perplexity_bucket_filter(spark):
    """Per-group tertiles on the rounded LM score: tail bucket dropped,
    head/middle kept, unscorable (<2 token) docs absent."""
    from grafink_spark.llm.lm import perplexity_bucket_filter

    rows = [
        (i, "the cat sat on the mat " * (1 + i % 3), "en") for i in range(9)
    ] + [(100, "zz qq xx yy ww vv", "fr"), (101, "zz qq xx yy", "fr"),
         (102, "one", "fr")]
    docs = spark.createDataFrame(rows, "doc_id long, text string, lang string")
    out = perplexity_bucket_filter(docs, group_col="lang", buckets=3, keep=2)
    got = out.collect()
    by_lang = {}
    for r in got:
        by_lang.setdefault(r.lang, []).append(r)
    # en: 9 scored docs → tertiles of 3/3/3, keep 6
    assert len(by_lang["en"]) == 6
    assert all(r.bucket in (1, 2) for r in got)
    # fr: doc 102 has 1 token → unscorable, absent; 2 scorable → ntile
    # puts them in buckets 1 and 2, both kept
    fr_ids = sorted(r.doc_id for r in by_lang["fr"])
    assert fr_ids == [100, 101]
