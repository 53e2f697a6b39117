"""Property-based tests (hypothesis) for the similarity expression
parser and its DNF expansion — pure Python, no Spark session.

Properties pinned:
1. printing a random AST and re-parsing it round-trips the tree,
2. the column list is the in-order token occurrence sequence,
3. DNF evaluates identically to the original AST under every truth
   assignment (the disjoint-branch join in rules/similarity.py relies
   on this equivalence exactly).
"""

from hypothesis import given, settings
from hypothesis import strategies as st

from grafink_spark.rules.exp_parser import (
    BoolOp,
    ColRef,
    Node,
    parse_similarity_exp,
    to_dnf,
)

TOKENS = ["rfscore", "snn_snia_vs_nonia", "cdsxmatch", "roid", "classtar",
          "mulens", "objectId", "customcol"]


def asts(max_leaves: int = 6):
    return st.recursive(
        st.sampled_from(TOKENS).map(ColRef),
        lambda children: st.tuples(
            st.sampled_from(["AND", "OR"]), children, children
        ).map(lambda t: BoolOp(*t)),
        max_leaves=max_leaves,
    )


def render(node: Node, parens: bool = True) -> str:
    if isinstance(node, ColRef):
        return node.name
    s = f"{render(node.left)} {node.op} {render(node.right)}"
    return f"({s})" if parens else s


def leaves(node: Node) -> list[str]:
    if isinstance(node, ColRef):
        return [node.name]
    return leaves(node.left) + leaves(node.right)


def eval_ast(node: Node, truth: dict[str, bool], occ: list[int]) -> bool:
    """Evaluate with *per-occurrence* truth values (occ is a mutable
    cursor) so duplicate tokens can differ — the strongest equivalence."""
    if isinstance(node, ColRef):
        v = truth[f"{node.name}#{occ[0]}"]
        occ[0] += 1
        return v
    left = eval_ast(node.left, truth, occ)
    right = eval_ast(node.right, truth, occ)
    return (left and right) if node.op == "AND" else (left or right)


@given(asts())
@settings(max_examples=200, deadline=None)
def test_parse_roundtrip(ast):
    parsed = parse_similarity_exp(render(ast, parens=False))
    assert parsed.ast == ast
    assert parsed.columns == leaves(ast)


@given(asts(), st.data())
@settings(max_examples=200, deadline=None)
def test_dnf_equivalent_to_ast(ast, data):
    toks = leaves(ast)
    # same-name occurrences share one truth value (column semantics:
    # a token's condition has one value per row pair)
    truth = {
        t: data.draw(st.booleans(), label=t) for t in set(toks)
    }
    occ_truth = {}
    for i, t in enumerate(toks):
        occ_truth[f"{t}#{i}"] = truth[t]
    original = eval_ast(ast, occ_truth, [0])
    dnf = to_dnf(ast)
    via_dnf = any(all(truth[t] for t in d.tokens) for d in dnf)
    assert via_dnf == original
    # disjoint-branch evaluation (what the join runs): first branch
    # whose conjunction holds — union over branches equals the OR
    fired = [
        i
        for i, d in enumerate(dnf)
        if all(truth[t] for t in d.tokens)
        and not any(
            all(truth[t] for t in e.tokens) for e in dnf[:i]
        )
    ]
    assert (len(fired) > 0) == original
    assert len(fired) <= 1


def test_weighted_cosine_join_lossless_property(spark):
    """Property: for random small corpora over a tiny vocabulary (the
    adversarial case for prefix filtering), the APSS join returns
    EXACTLY the brute-force pair set — losslessness does not depend on
    the corpus shape."""
    import itertools
    from collections import Counter

    from hypothesis import given, settings
    from hypothesis import strategies as st

    from grafink_spark.llm.dedup import weighted_cosine_join

    vocab = ["a", "b", "c", "d"]

    @settings(max_examples=5, deadline=None)
    @given(
        st.lists(
            st.lists(st.sampled_from(vocab), min_size=1, max_size=8),
            min_size=2,
            max_size=10,
        )
    )
    def check(corpus):
        rows = [(i, " ".join(ws)) for i, ws in enumerate(corpus)]
        df = spark.createDataFrame(rows, "doc_id long, text string")
        got = {
            (r.id_a, r.id_b)
            for r in weighted_cosine_join(df, threshold=(4, 5)).collect()
        }
        cnt = {i: Counter(t.split()) for i, t in rows}
        want = set()
        for a, b in itertools.combinations(sorted(cnt), 2):
            dot = sum(cnt[a][w] * cnt[b][w] for w in cnt[a])
            ta = sum(v * v for v in cnt[a].values())
            tb = sum(v * v for v in cnt[b].values())
            if 25 * dot * dot >= 16 * ta * tb:
                want.add((a, b))
        assert got == want

    check()


def test_simhash_banding_lossless_property(spark):
    """Property: banded SimHash candidate generation is EXHAUSTIVE for
    the Hamming predicate (pigeonhole: distance ≤ d leaves ≥ 1 of d+1
    bands untouched) — for random small corpora of near-duplicate
    variants, the banded join returns EXACTLY the brute-force pair set
    of signatures within max_hamming."""
    import itertools

    from hypothesis import given, settings
    from hypothesis import strategies as st

    from grafink_spark.llm.dedup import simhash, simhash_near_duplicates
    from pyspark.sql import functions as F

    base = "alpha beta gamma delta epsilon zeta eta theta iota kappa"

    @settings(max_examples=5, deadline=None)
    @given(
        st.lists(
            st.tuples(
                st.integers(min_value=0, max_value=9),  # word to mutate
                st.sampled_from(["xx", "yy", "zz", ""]),  # replacement
            ),
            min_size=2,
            max_size=12,
        )
    )
    def check(variants):
        rows = []
        for i, (pos, rep) in enumerate(variants):
            words = base.split()
            if rep:
                words[pos] = rep
            rows.append((i, " ".join(words)))
        df = spark.createDataFrame(rows, "doc_id long, text string")

        got = {
            (r.id_a, r.id_b)
            for r in simhash_near_duplicates(
                df, k=3, bits=32, bands=4, max_hamming=3
            ).collect()
        }

        # ground truth from the engine's own signature expression,
        # verified pairwise in Python (no banding involved)
        sigs = {
            r._id: r._sig
            for r in df.select(
                F.col("doc_id").alias("_id"),
                simhash(F.col("text"), 3, 32).alias("_sig"),
            ).collect()
        }
        want = {
            (a, b)
            for a, b in itertools.combinations(sorted(sigs), 2)
            if bin((sigs[a] ^ sigs[b]) & 0xFFFFFFFF).count("1") <= 3
        }
        assert got == want

    check()


def test_incremental_lsh_equals_batch_restriction(spark):
    """Property: the incremental (new×corpus) LSH candidate set equals
    the BATCH candidate set over new ∪ corpus restricted to cross
    pairs — daily ingest loses nothing relative to re-banding the
    whole corpus."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from grafink_spark.llm.dedup import (
        incremental_lsh_candidates,
        minhash_lsh_candidates,
    )

    vocab = ["red", "green", "blue", "cyan", "teal", "pink"]

    @settings(max_examples=5, deadline=None)
    @given(
        st.lists(
            st.lists(st.sampled_from(vocab), min_size=4, max_size=8),
            min_size=4,
            max_size=12,
        ),
        st.integers(min_value=1, max_value=3),
    )
    def check(texts, n_new):
        rows = [(i, " ".join(ws)) for i, ws in enumerate(texts)]
        n_new_eff = min(n_new, len(rows) - 1)
        new_rows, corpus_rows = rows[:n_new_eff], rows[n_new_eff:]
        new = spark.createDataFrame(new_rows, "doc_id long, text string")
        corpus = spark.createDataFrame(
            corpus_rows, "doc_id long, text string"
        )
        both = spark.createDataFrame(rows, "doc_id long, text string")

        inc = {
            (r.id_a, r.id_b)
            for r in incremental_lsh_candidates(
                new, corpus, num_hashes=16, k=3, bands=4
            ).collect()
        }
        new_ids = {i for i, _ in new_rows}
        batch_cross = {
            (a, b) if a in new_ids else (b, a)
            for a, b in (
                (r.id_a, r.id_b)
                for r in minhash_lsh_candidates(
                    both, num_hashes=16, k=3, bands=4
                ).collect()
            )
            if (a in new_ids) != (b in new_ids)
        }
        assert inc == batch_cross

    check()
