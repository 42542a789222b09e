from __future__ import annotations

import re

from chatbot_spark.operators.spancorrupt import t5_span_corrupt


def _examples(spark, texts):
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    return {r["doc_id"]: r.asDict() for r in t5_span_corrupt(df).collect()}


TEXTS = [
    "the quick brown fox jumps over the lazy dog again and again today",
    " ".join(f"w{i % 7}" for i in range(60)),
    "solo",
    " ".join(f"tok{i}" for i in range(40)),
]


def test_span_corrupt_reconstructs_original(spark):
    got = _examples(spark, TEXTS)
    for i, text in enumerate(TEXTS):
        ex = got[i]
        spans = dict(
            (int(m.group(1)), m.group(2).strip())
            for m in re.finditer(
                r"<extra_id_(\d+)>((?: (?!<extra_id_)\S+)*)", ex["target"]
            )
        )
        rebuilt = re.sub(
            r"<extra_id_(\d+)>", lambda m: spans[int(m.group(1))], ex["input"]
        )
        rebuilt = re.sub(r"\s+", " ", rebuilt).strip()
        assert rebuilt == text.lower(), f"doc {i}"


def test_span_corrupt_counts_consistent(spark):
    got = _examples(spark, TEXTS)
    for i, text in enumerate(TEXTS):
        ex = got[i]
        n_input_tokens = len(ex["input"].split())
        assert ex["n_tokens"] == len(text.split())
        # each island of n_masked tokens collapses to one sentinel
        assert n_input_tokens == ex["n_tokens"] - ex["n_masked"] + ex["n_spans"]
        assert ex["target"].count("<extra_id_") == ex["n_spans"]


def test_span_corrupt_islands_maximal(spark):
    # maximal runs: two sentinels can never be adjacent in the input
    got = _examples(spark, TEXTS)
    for ex in got.values():
        toks = ex["input"].split()
        for a, b in zip(toks, toks[1:]):
            assert not (a.startswith("<extra_id_") and b.startswith("<extra_id_"))


def test_span_corrupt_zero_span_doc_passthrough(spark):
    got = _examples(spark, ["solo"])
    ex = got[0]
    if ex["n_spans"] == 0:
        assert ex["input"] == "solo" and ex["target"] == ""
    else:  # single token fully masked
        assert ex["input"] == "<extra_id_0>" and ex["target"] == "<extra_id_0> solo"


def test_span_corrupt_array_form_equals_joins_form(spark):
    """r14: the single-pass array execution must emit the identical row
    set as the r13 position-keyed join/window form — including
    zero-token, null and whitespace-only documents (which both drop)."""
    from chatbot_spark.operators.spancorrupt import _t5_span_corrupt_joins

    texts = TEXTS + ["", None, "   ", "a b", " x  y\tz \n w"]
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    a = sorted(map(tuple, t5_span_corrupt(df).collect()))
    b = sorted(map(tuple, _t5_span_corrupt_joins(df).collect()))
    assert a == b
