from __future__ import annotations

from chatbot_spark.operators.lm import (
    doc_bigrams,
    score_lm_bits,
    train_bigram_counts,
)


def test_doc_bigrams_and_short_docs(spark):
    df = spark.createDataFrame(
        [(1, "a b c"), (2, "solo"), (3, "x y")], "doc_id long, text string"
    )
    got = sorted(
        (r["__id"], r["w1"], r["w2"]) for r in doc_bigrams(df).collect()
    )
    assert got == [(1, "a", "b"), (1, "b", "c"), (3, "x", "y")]


def test_train_counts_hand_computed(spark):
    # corpus: "a b a b" -> bigrams (a,b)x2, (b,a)x1 ; "a c" -> (a,c)x1
    df = spark.createDataFrame(
        [(1, "a b a b"), (2, "a c")], "doc_id long, text string"
    )
    m = {
        (r["w1"], r["w2"]): (r["bg_cnt"], r["pre_cnt"])
        for r in train_bigram_counts(df).collect()
    }
    assert m == {("a", "b"): (2, 3), ("b", "a"): (1, 1), ("a", "c"): (1, 3)}


def test_score_bits_seen_and_backoff(spark):
    train = spark.createDataFrame([(1, "a b a b")], "doc_id long, text string")
    model = train_bigram_counts(train)
    # model: (a,b): bg=2 pre=2 -> bits = bitlen(2)-bitlen(2) = 0
    #        (b,a): bg=1 pre=1 -> bits = 0
    docs = spark.createDataFrame(
        [(10, "a b"), (11, "a z b")], "doc_id long, text string"
    )
    got = {
        r["doc_id"]: (r["n_bigrams"], r["total_bits"], r["score_milli"])
        for r in score_lm_bits(docs, model).collect()
    }
    assert got[10] == (1, 0, 0)
    # (a,z) unseen -> 20, (z,b) unseen -> 20 -> 40 total, 20000 milli
    assert got[11] == (2, 40, 20000)


def test_score_bits_quantized_log(spark):
    # pre=5 over one bigram seen once: bits = bitlen(5)-bitlen(1) = 3-1 = 2
    # (exact-integer surrogate of -log2(1/5) = 2.32)
    train = spark.createDataFrame(
        [(1, "q a q b q c q d q e")], "doc_id long, text string"
    )
    model = train_bigram_counts(train)
    pre = {r["w1"]: r["pre_cnt"] for r in model.collect()}
    assert pre["q"] == 5
    docs = spark.createDataFrame([(20, "q a")], "doc_id long, text string")
    r = score_lm_bits(docs, model).collect()[0]
    assert (r["total_bits"], r["score_milli"]) == (2, 2000)
