from __future__ import annotations

from chatbot_spark.operators.lexical import phrase_search


def _run(spark, docs, phrases):
    d = spark.createDataFrame(docs, "doc_id long, text string")
    p = spark.createDataFrame(phrases, "phrase_id long, phrase string")
    return {
        (r["phrase_id"], r["doc_id"]): r["n_occurrences"]
        for r in phrase_search(d, p).collect()
    }


def test_phrase_basic_and_no_match(spark):
    got = _run(
        spark,
        [(1, "the quick brown fox"), (2, "brown the quick")],
        [(0, "quick brown"), (1, "brown fox jumps")],
    )
    # adjacency required: doc 2 has both words but not adjacent in order
    assert got == {(0, 1): 1}


def test_phrase_overlapping_and_duplicate_terms(spark):
    # "a a a a" contains "a a" at anchors 0,1,2 -> 3 overlapping matches
    got = _run(spark, [(1, "a a a a")], [(0, "a a")])
    assert got == {(0, 1): 3}
    # "a b a" must NOT match inside "a b b" / "b b a"
    got2 = _run(
        spark,
        [(1, "a b a"), (2, "a b b"), (3, "x a b a y a b a")],
        [(0, "a b a")],
    )
    assert got2 == {(0, 1): 1, (0, 3): 2}


def test_phrase_document_boundaries(spark):
    # matches at position 0 and at the very end; never across documents
    got = _run(
        spark,
        [(1, "k v tail"), (2, "head k v"), (3, "k"), (4, "v k")],
        [(0, "k v")],
    )
    assert got == {(0, 1): 1, (0, 2): 1}


def test_phrase_case_and_whitespace_normalized(spark):
    got = _run(spark, [(1, "Foo   BAR baz")], [(0, "foo bar")])
    assert got == {(0, 1): 1}
