"""Parser semantics (reference: SimilarityExpParserSpec.scala:13-69)."""

import pytest

from grafink_spark.errors import BadSimilarityExpression
from grafink_spark.rules.exp_parser import (
    BoolOp,
    ColRef,
    expand_columns,
    parse_similarity_exp,
    to_dnf,
)


def test_single_column():
    r = parse_similarity_exp("rfscore")
    assert r.columns == ["rfscore"]
    assert isinstance(r.ast, ColRef)


def test_and_or_left_fold_no_precedence():
    # FastParse chain folds left: a AND b OR c == (a AND b) OR c
    r = parse_similarity_exp("rfscore AND objectId OR roid")
    assert r.columns == ["rfscore", "objectId", "roid"]
    assert isinstance(r.ast, BoolOp) and r.ast.op == "OR"
    assert isinstance(r.ast.left, BoolOp) and r.ast.left.op == "AND"


def test_parens():
    r = parse_similarity_exp("(rfscore AND snn_snia_vs_nonia) OR mulens")
    assert r.columns == ["rfscore", "snn_snia_vs_nonia", "mulens"]
    assert r.ast.op == "OR"
    assert r.ast.left.op == "AND"
    assert r.ast.right == ColRef("mulens")


def test_duplicate_tokens_preserved():
    r = parse_similarity_exp("rfscore OR rfscore")
    assert r.columns == ["rfscore", "rfscore"]


def test_bad_expressions_raise():
    for bad in ["", "rfscore AND", "(rfscore", "rfscore XOR roid", "AND rfscore"]:
        with pytest.raises(BadSimilarityExpression):
            parse_similarity_exp(bad)


def test_mulens_expansion():
    assert expand_columns(["mulens", "rfscore"]) == [
        "mulens_class_1",
        "mulens_class_2",
        "rfscore",
    ]


def test_dnf():
    r = parse_similarity_exp("(rfscore AND cdsxmatch) OR objectId")
    d = to_dnf(r.ast)
    assert [x.tokens for x in d] == [["rfscore", "cdsxmatch"], ["objectId"]]
    assert d[0].equi_keys == ["cdsxmatch"]
    assert d[0].filter_tokens == ["rfscore"]
    assert d[1].equi_keys == ["objectId"]


def test_dnf_distributes_and_over_or():
    r = parse_similarity_exp("(rfscore OR roid) AND objectId")
    d = to_dnf(r.ast)
    assert [x.tokens for x in d] == [["rfscore", "objectId"], ["roid", "objectId"]]
