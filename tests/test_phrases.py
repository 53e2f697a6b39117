"""BPE-style phrase mining: pair choice and greedy merge semantics."""


def test_phrase_merge_golden(spark):
    from grafink_spark.llm.phrases import phrase_merge

    docs = spark.createDataFrame(
        [
            (1, "new york is in new york state"),
            (2, "new york new york"),
            (3, "a b"),
        ],
        "doc_id long, text string",
    )
    out = {r.doc_id: r.toks for r in phrase_merge(docs, rounds=1).collect()}
    # (new, york) appears 4x — the most frequent pair, merged everywhere
    assert out[1] == ["new_york", "is", "in", "new_york", "state"]
    assert out[2] == ["new_york", "new_york"]
    assert out[3] == ["a", "b"]  # (a, b) count 1 < 2 → untouched


def test_phrase_merge_greedy_left_to_right(spark):
    from grafink_spark.llm.phrases import phrase_merge

    # overlapping run: greedy left-to-right pairs (1,2), (3,4), leaves 5th
    docs = spark.createDataFrame(
        [(1, "x x x x x"), (2, "x x")], "doc_id long, text string"
    )
    out = {r.doc_id: r.toks for r in phrase_merge(docs, rounds=1).collect()}
    assert out[1] == ["x_x", "x_x", "x"]
    assert out[2] == ["x_x"]


def test_phrase_merge_stops_when_no_repeats(spark):
    from grafink_spark.llm.phrases import phrase_merge

    docs = spark.createDataFrame(
        [(1, "q w e r t y")], "doc_id long, text string"
    )
    out = phrase_merge(docs, rounds=5).collect()
    assert out[0].toks == ["q", "w", "e", "r", "t", "y"]


def test_learn_apply_split(spark):
    """learn_merges on a train slice + apply_merges to all docs == the
    rewrite the trainer itself produced on the train slice; unseen docs
    get the merges applied too."""
    from grafink_spark.llm.phrases import (
        apply_merges,
        learn_merges,
        phrase_merge,
    )

    train = spark.createDataFrame(
        [
            (1, "new york is in new york state"),
            (2, "new york new york"),
        ],
        "doc_id long, text string",
    )
    full = train.union(
        spark.createDataFrame(
            [(3, "i love new york a lot")], "doc_id long, text string"
        )
    )
    merges = learn_merges(train, rounds=1)
    assert merges == [("new", "york", "new_york")]
    out = {r.doc_id: r.toks for r in apply_merges(full, merges).collect()}
    assert out[3] == ["i", "love", "new_york", "a", "lot"]
    # on the train slice, apply == the trainer's own rewrite
    trained = {r.doc_id: r.toks for r in phrase_merge(train, rounds=1).collect()}
    assert out[1] == trained[1] and out[2] == trained[2]


def test_apply_merges_order_matters(spark):
    """Merges apply sequentially: a later merge can consume the token a
    prior merge produced."""
    from grafink_spark.llm.phrases import apply_merges

    docs = spark.createDataFrame([(1, "a b c")], "doc_id long, text string")
    out = apply_merges(
        docs, [("a", "b", "a_b"), ("a_b", "c", "a_b_c")]
    ).collect()
    assert out[0].toks == ["a_b_c"]


def test_learn_merges_stops_early(spark):
    from grafink_spark.llm.phrases import learn_merges

    docs = spark.createDataFrame([(1, "q w e")], "doc_id long, text string")
    assert learn_merges(docs, rounds=4) == []
