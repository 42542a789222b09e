from __future__ import annotations

import pytest

from chatbot_spark.operators.sft import assemble_sft_pairs


def _pairs(spark, rows, k=2):
    df = spark.createDataFrame(
        rows, "conv long, seq long, role string, content string"
    )
    return {
        (r["conv"], r["pair_idx"]): (r["n_context"], r["context"], r["completion"])
        for r in assemble_sft_pairs(
            df, "conv", ["seq"], context_turns=k
        ).collect()
    }


def test_sft_basic_pairs_and_truncation(spark):
    rows = [
        (1, 1, "user", "q1"),
        (1, 2, "assistant", "a1"),
        (1, 3, "user", "q2"),
        (1, 4, "user", "q3"),
        (1, 5, "assistant", "a2"),
    ]
    got = _pairs(spark, rows, k=2)
    assert got == {
        (1, 1): (1, "user: q1", "a1"),
        # k=2 window keeps only the LAST two turns before a2
        (1, 2): (2, "user: q2\nuser: q3", "a2"),
    }


def test_sft_first_turn_assistant_skipped(spark):
    rows = [(1, 1, "assistant", "cold"), (1, 2, "user", "q"), (1, 3, "assistant", "a")]
    got = _pairs(spark, rows, k=3)
    assert got == {(1, 1): (2, "assistant: cold\nuser: q", "a")}


def test_sft_conversations_isolated(spark):
    rows = [
        (1, 1, "user", "u1"),
        (2, 2, "assistant", "lonely"),  # first turn of conv 2 -> skipped
        (1, 3, "assistant", "a1"),
        (2, 4, "user", "u2"),
        (2, 5, "assistant", "a2"),
    ]
    got = _pairs(spark, rows, k=4)
    assert got == {
        (1, 1): (1, "user: u1", "a1"),
        (2, 1): (2, "assistant: lonely\nuser: u2", "a2"),
    }


def test_sft_rejects_bad_context_turns(spark):
    df = spark.createDataFrame(
        [(1, 1, "user", "x")], "conv long, seq long, role string, content string"
    )
    with pytest.raises(ValueError):
        assemble_sft_pairs(df, "conv", ["seq"], context_turns=0)
