"""SFT training-pair assembly (beyond-reference §2.J scope).

Instruction-tuning datasets are built by replaying interaction logs into
(context, completion) pairs: every assistant turn becomes one training
example whose context is the last K turns before it (OpenAssistant-style
thread flattening; the reference's conversation JSON export,
src/api/chat.py, stores raw history but never materializes training
pairs — that's engine work).

Spark-first shape: ONE window per user ordered by event time with a
``ROWS BETWEEN K PRECEDING AND 1 PRECEDING`` frame — the context is
collected per-row from the frame, so neither a per-user full-history
array nor a self-join ever materializes; a second window numbers the
surviving assistant turns. Two hash exchanges on the conversation key
total (the second reuses the first's partitioning), each row carries at
most K formatted lines — bounded regardless of conversation length, the
property that keeps the operator safe at 100 TB of logs.

Determinism: the frame order is the window's (order_cols) sort, which
callers must make unique (e.g. ts + event_id); collect_list over a
ROWS frame preserves that order on any engine.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

__all__ = ["assemble_sft_pairs"]


def assemble_sft_pairs(
    df: DataFrame,
    conversation_col: str,
    order_cols: list[str],
    role_col: str = "role",
    content_col: str = "content",
    assistant_role: str = "assistant",
    context_turns: int = 4,
) -> DataFrame:
    """Emit one (context, completion) row per assistant turn.

    context = the last ``context_turns`` turns before it, formatted
    "role: content" and newline-joined; assistant turns with NO prior
    turn in frame are skipped (nothing to condition on). Returns
    (conversation, pair_idx, n_context, context, completion) where
    pair_idx numbers the emitted pairs within the conversation in
    time order.
    """
    if context_turns < 1:
        raise ValueError("context_turns must be >= 1")
    line = F.concat(F.col(role_col), F.lit(": "), F.col(content_col))
    frame = (
        Window.partitionBy(conversation_col)
        .orderBy(*order_cols)
        .rowsBetween(-context_turns, -1)
    )
    ctxed = df.withColumn("__ctx", F.collect_list(line).over(frame))
    pairs = ctxed.filter(
        (F.col(role_col) == assistant_role) & (F.size("__ctx") >= 1)
    )
    order = Window.partitionBy(conversation_col).orderBy(*order_cols)
    return pairs.select(
        F.col(conversation_col),
        F.row_number().over(order).cast("long").alias("pair_idx"),
        F.size("__ctx").cast("long").alias("n_context"),
        F.array_join("__ctx", "\n").alias("context"),
        F.col(content_col).alias("completion"),
    )
