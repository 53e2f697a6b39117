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
