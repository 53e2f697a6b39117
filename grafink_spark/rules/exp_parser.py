"""Similarity-expression mini-language.

Reference: processor/edgerules/SimilarityExpParser.scala:62-127.

Grammar (exactly the reference's FastParse grammar):

    expr      := colName | '(' chain ')'
    chain     := expr ((' '+) ('AND'|'OR') (' '+) expr)*
    colName   := [a-zA-Z_]+

Crucially the chain is a **left fold with no operator precedence**
(SimilarityExpParser.scala:84-92): ``a AND b OR c`` parses as
``(a AND b) OR c``. The parse produces

- ``condition``: a pyspark Column combining per-column match conditions
  over side-suffixed column names (``rfscore1``/``rfscore2``), and
- ``columns``: the column tokens in order of appearance **with
  duplicates preserved** (the similarity value folds once per
  occurrence — SimilarityClassifer.scala:96-106).

Per-column conditions (SimilarityExpParser.scala:107-127):

    rfscore, snn_snia_vs_nonia  c1 > 0.9 AND c2 > 0.9
    cdsxmatch                   c1 != 'Unknown' AND c1 == c2
    roid                        c1 > 1 AND c2 > 1
    classtar                    (both > 0.9) OR (both < 0.1)
    mulens                      all of mulens_class_{1,2}{1,2} == 'ML'
    <anything else>             null-safe equality c1 <=> c2
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import Column
from pyspark.sql import functions as F

from grafink_spark.errors import BadSimilarityExpression


# ---------------------------------------------------------------- AST


@dataclass
class ColRef:
    name: str


@dataclass
class BoolOp:
    op: str  # "AND" | "OR"
    left: "Node"
    right: "Node"


Node = ColRef | BoolOp


@dataclass
class ParseResult:
    ast: Node
    columns: list[str]  # per-occurrence, in order

    @property
    def condition(self) -> Column:
        return ast_to_condition(self.ast)


# ------------------------------------------------------------- parser


class _Tokenizer:
    def __init__(self, s: str):
        self.s = s
        self.i = 0

    def peek(self) -> str | None:
        while self.i < len(self.s) and self.s[self.i] == " ":
            self.i += 1
        return self.s[self.i] if self.i < len(self.s) else None

    def word(self) -> str:
        self.peek()
        j = self.i
        while j < len(self.s) and (self.s[j].isalpha() or self.s[j] == "_"):
            j += 1
        w = self.s[self.i : j]
        self.i = j
        return w

    def expect(self, ch: str) -> None:
        c = self.peek()
        if c != ch:
            raise BadSimilarityExpression(
                f"expected {ch!r} at position {self.i} in {self.s!r}"
            )
        self.i += 1


def parse_similarity_exp(expr: str) -> ParseResult:
    """Parse; raises BadSimilarityExpression (exit code 4) on failure."""
    tz = _Tokenizer(expr)
    node, cols = _chain(tz)
    if tz.peek() is not None:
        raise BadSimilarityExpression(
            f"trailing input at position {tz.i} in {expr!r}"
        )
    return ParseResult(ast=node, columns=cols)


def _atom(tz: _Tokenizer) -> tuple[Node, list[str]]:
    c = tz.peek()
    if c == "(":
        tz.expect("(")
        node, cols = _chain(tz)
        tz.expect(")")
        return node, cols
    w = tz.word()
    if not w:
        raise BadSimilarityExpression(
            f"expected column name at position {tz.i} in {tz.s!r}"
        )
    return ColRef(w), [w]


def _chain(tz: _Tokenizer) -> tuple[Node, list[str]]:
    node, cols = _atom(tz)
    while True:
        save = tz.i
        c = tz.peek()
        if c is None or c == ")":
            return node, cols
        w = tz.word()
        if w not in ("AND", "OR"):
            tz.i = save
            raise BadSimilarityExpression(
                f"expected AND/OR at position {save} in {tz.s!r}"
            )
        rnode, rcols = _atom(tz)
        node = BoolOp(w, node, rnode)  # left fold, no precedence
        cols = cols + rcols
    return node, cols


# ------------------------------------------------- condition builders


def _score_cond(c1: Column, c2: Column) -> Column:
    return (c1 > 0.9) & (c2 > 0.9)


def _cdsxmatch_cond(c1: Column, c2: Column) -> Column:
    return (c1 != "Unknown") & (c1 == c2)


def _roid_cond(c1: Column, c2: Column) -> Column:
    return (c1 > 1) & (c2 > 1)


def _classtar_cond(c1: Column, c2: Column) -> Column:
    return ((c1 > 0.9) & (c2 > 0.9)) | ((c1 < 0.1) & (c2 < 0.1))


_FIELD_CONDITIONS = {
    "rfscore": _score_cond,
    "snn_snia_vs_nonia": _score_cond,
    "cdsxmatch": _cdsxmatch_cond,
    "roid": _roid_cond,
    "classtar": _classtar_cond,
}


def col_name_to_condition(name: str) -> Column:
    """Join condition for one column token over side-suffixed names
    (SimilarityExpParser.scala:43-59)."""
    c1, c2 = F.col(f"{name}1"), F.col(f"{name}2")
    if name in _FIELD_CONDITIONS:
        return _FIELD_CONDITIONS[name](c1, c2)
    if name == "mulens":
        return (
            (F.col("mulens_class_11") == "ML")
            & (F.col("mulens_class_21") == "ML")
            & (F.col("mulens_class_12") == "ML")
            & (F.col("mulens_class_22") == "ML")
        )
    return c1.eqNullSafe(c2)


def ast_to_condition(node: Node) -> Column:
    if isinstance(node, ColRef):
        return col_name_to_condition(node.name)
    left = ast_to_condition(node.left)
    right = ast_to_condition(node.right)
    return (left & right) if node.op == "AND" else (left | right)


def expand_columns(tokens: list[str]) -> list[str]:
    """Physical columns needed for a token list; ``mulens`` expands to
    its two class columns (SimilarityClassifer.scala:53-54). Duplicates
    removed (select list), order preserved."""
    out: list[str] = []
    for t in tokens:
        cols = ["mulens_class_1", "mulens_class_2"] if t == "mulens" else [t]
        for c in cols:
            if c not in out:
                out.append(c)
    return out


# ----------------------------------- analysis for the scale-path join


@dataclass
class Disjunct:
    """One OR-branch of the expression in DNF: a conjunction of column
    tokens. equi_keys are tokens whose condition contains an equality
    between the two sides (usable as hash-join keys); filter_tokens only
    constrain each side independently."""

    tokens: list[str]

    @property
    def equi_keys(self) -> list[str]:
        return [t for t in self.tokens if _is_equi_token(t)]

    @property
    def filter_tokens(self) -> list[str]:
        return [t for t in self.tokens if not _is_equi_token(t)]


def _is_equi_token(name: str) -> bool:
    # cdsxmatch compares c1 == c2; default is null-safe equality; score/
    # roid/classtar/mulens conditions are side-independent filters.
    return name not in ("rfscore", "snn_snia_vs_nonia", "roid", "classtar", "mulens")


def to_dnf(node: Node) -> list[Disjunct]:
    """Expand the AST to disjunctive normal form over column tokens.

    Used by the similarity scale path to turn the theta join into a
    union of equi joins (SURVEY §4: OR-decomposition). Exponential only
    in the number of nested AND-of-OR terms, which is tiny for rule
    expressions (they are hand-written config strings).
    """
    if isinstance(node, ColRef):
        return [Disjunct([node.name])]
    left = to_dnf(node.left)
    right = to_dnf(node.right)
    if node.op == "OR":
        return left + right
    return [Disjunct(a.tokens + b.tokens) for a in left for b in right]
