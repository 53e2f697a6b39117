"""BM25 retrieval: ordering, exclusions, tie-breaks."""

import math

import pytest

from grafink_spark.llm.search import bm25_search


def _corpus(spark):
    return spark.createDataFrame(
        [
            (1, "spark shuffle join of a table"),
            (2, "table table table scan"),
            (3, "scan and table and join words here"),
            (4, "completely unrelated words only"),
            (5, "Table SCAN"),  # case-folded match, shortest doc
        ],
        "doc_id long, text string",
    )


def test_ranking_and_exclusion(spark):
    out = bm25_search(_corpus(spark), "table scan", k=10).collect()
    ids = [r.doc_id for r in out]
    # doc 4 shares no term -> absent entirely
    assert 4 not in ids
    assert [r.rank for r in out] == list(range(1, len(out) + 1))
    # doc 5: both terms, dl=2 -> strongest length normalization, top rank
    assert ids[0] == 5
    # scores strictly ordered (ties broken by id, none here)
    scores = [r.score for r in out]
    assert scores == sorted(scores, reverse=True)
    assert all(math.isfinite(s) and s > 0 for s in scores)


def test_golden_single_term_score(spark):
    # one doc, one query term: idf = ln((N - df + .5)/(df + .5) + 1)
    # with N=df=1 -> ln(4/3); tf=1, dl=avgdl -> tf term = 2.2/(1+1.2)
    docs = _corpus(spark).where("doc_id = 1")
    r = bm25_search(docs, "spark", k=1).collect()[0]
    assert r.score == pytest.approx(math.log(4 / 3) * 2.2 / 2.2)


def test_empty_query_rejected(spark):
    with pytest.raises(ValueError):
        bm25_search(_corpus(spark), "   ")


def test_inverted_index_postings(spark):
    from grafink_spark.llm.search import inverted_index

    df = spark.createDataFrame(
        [(1, "a b a"), (2, "b c"), (3, "a")], "doc_id long, text string"
    )
    out = {r["token"]: r for r in inverted_index(df).collect()}
    assert (out["a"]["df"], out["a"]["total_tf"]) == (2, 3)
    assert out["a"]["postings"] == "1:2,3:1"
    assert out["b"]["postings"] == "1:1,2:1"
    assert out["c"]["postings"] == "2:1"


def test_inverted_index_min_df(spark):
    from grafink_spark.llm.search import inverted_index

    df = spark.createDataFrame(
        [(1, "a b"), (2, "a c")], "doc_id long, text string"
    )
    toks = [r["token"] for r in inverted_index(df, min_df=2).collect()]
    assert toks == ["a"]


def test_rrf_fusion_golden(spark):
    """A doc present in both lists outranks single-list docs even when
    neither ranks it first; exact 1/(60+r) sums."""
    from grafink_spark.llm.search import rrf_fuse

    lex = spark.createDataFrame(
        [(10, 1), (20, 2), (30, 3)], "doc_id long, rank long"
    )
    sem = spark.createDataFrame(
        [(40, 1), (20, 2), (50, 3)], "doc_id long, rank long"
    )
    got = {
        r.doc_id: (r.rrf_score, r.rank)
        for r in rrf_fuse([lex, sem], top_n=5).collect()
    }
    assert got[20][1] == 1  # in both lists at rank 2 -> wins
    assert got[20][0] == 1.0 / 62 + 1.0 / 62
    assert got[10][0] == 1.0 / 61  # single-list
    # single-list rank-1 docs tie -> lower id first
    assert got[10][1] == 2 and got[40][1] == 3


def test_rrf_rejects_empty(spark):
    import pytest

    from grafink_spark.llm.search import rrf_fuse

    with pytest.raises(ValueError):
        rrf_fuse([])
