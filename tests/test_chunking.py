"""Golden tests for document chunking and edit-distance verification."""

import pytest
from pyspark.sql import functions as F

from grafink_spark.llm.chunking import chunk_documents
from grafink_spark.llm.dedup import edit_distance_pairs


DOC_SCHEMA = "doc_id long, text string"


def test_chunk_windows_and_overlap(spark):
    # 10 tokens, window 4, stride 3 → starts 0,3,6,9
    text = "t0 t1 t2 t3 t4 t5 t6 t7 t8 t9"
    docs = spark.createDataFrame([(1, text)], DOC_SCHEMA)
    out = chunk_documents(docs, window=4, stride=3).collect()
    got = {r.chunk_id: (r.n_chunk_tokens, r.chunk_text) for r in out}
    assert got == {
        0: (4, "t0 t1 t2 t3"),
        1: (4, "t3 t4 t5 t6"),
        2: (4, "t6 t7 t8 t9"),
        3: (1, "t9"),
    }


def test_chunk_short_doc_single_chunk(spark):
    docs = spark.createDataFrame([(1, "a b"), (2, "  c  ")], DOC_SCHEMA)
    out = chunk_documents(docs, window=8, stride=8).collect()
    got = {(r.doc_id, r.chunk_id): r.chunk_text for r in out}
    assert got == {(1, 0): "a b", (2, 0): "c"}


def test_chunk_exact_boundary_no_empty_tail(spark):
    # 6 tokens, window=stride=3 → exactly two full chunks, no empty 3rd
    docs = spark.createDataFrame([(1, "a b c d e f")], DOC_SCHEMA)
    out = chunk_documents(docs, window=3, stride=3).collect()
    assert sorted(r.chunk_text for r in out) == ["a b c", "d e f"]


def test_chunk_rejects_bad_params(spark):
    docs = spark.createDataFrame([(1, "a")], DOC_SCHEMA)
    with pytest.raises(ValueError):
        chunk_documents(docs, window=0, stride=3)
    with pytest.raises(ValueError):
        chunk_documents(docs, window=4, stride=0)


def test_edit_distance_verify_on_candidates(spark):
    docs = spark.createDataFrame(
        [
            (1, "the quick brown fox jumps"),
            (2, "the quick brown fox jumped"),   # 2 edits from doc 1
            (3, "a completely different text here"),
        ],
        DOC_SCHEMA,
    )
    cand = spark.createDataFrame(
        [(1, 2), (1, 3)], "id_a long, id_b long"
    )
    out = edit_distance_pairs(docs, cand, max_ratio=0.3).collect()
    assert len(out) == 1
    row = out[0]
    assert (row.id_a, row.id_b, row.edit_distance) == (1, 2, 2)
    assert row.edit_ratio == pytest.approx(2 / 26)


def test_edit_distance_pairs_only_candidates_scored(spark):
    # identical docs NOT in the candidate set must not appear
    docs = spark.createDataFrame(
        [(1, "same text"), (2, "same text"), (3, "same text")], DOC_SCHEMA
    )
    cand = spark.createDataFrame([(1, 2)], "id_a long, id_b long")
    out = edit_distance_pairs(docs, cand, max_ratio=0.0).collect()
    assert [(r.id_a, r.id_b) for r in out] == [(1, 2)]
