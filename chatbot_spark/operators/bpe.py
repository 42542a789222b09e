"""Distributed BPE tokenizer training (Sennrich et al. 2016, "Neural
Machine Translation of Rare Words with Subword Units") — the learn-side
of the token-counting surface (SURVEY §2.J J4 counts tokens with a
BPE-ish regex; this trains the merge table that defines those tokens).

The algorithm is inherently iterative (each merge depends on the counts
AFTER the previous merge), so it runs as driver-coordinated rounds over
a distributed table — the canonical Spark shape for BPE:

 * **Word-count compression first.** The corpus collapses to
   (distinct word, count) in one shuffle. Every later round operates on
   THAT table, whose size is the vocabulary (~10M rows at 100 TB of
   text), not the corpus — the classic trick that makes corpus-scale
   BPE cheap: pair statistics are identical because pair counts weight
   by word frequency.
 * **Per round**: adjacent symbol pairs weighted by word count →
   groupBy(pair).sum (map-side partials) → argmax with total
   tie-order (count DESC, left ASC, right ASC) → ONE row to the driver
   → the merge applies as a literal string replace on the symbol
   encoding. Driver state is one (left, right) pair per round.
 * **Symbol encoding**: a word is ``<c><c>…<_>`` — every symbol wrapped
   in angle brackets, ``_`` the end-of-word marker. Delimited wrapping
   makes merge application a plain non-overlapping left-to-right
   ``replace('<a><b>', '<ab>')``, which IS greedy BPE merge order, with
   no boundary-sharing bugs (space-joined encodings consume the shared
   delimiter of consecutive matches; wrapped symbols don't). The
   wrapper chars must not occur in the text — validated up front.

Determinism: counts are integers, the argmax tie-order is total, and
``replace`` is left-to-right non-overlapping in Spark and DuckDB alike —
so the learned merge table is bit-reproducible and the workload query
carries a full SQL oracle (the same rounds unrolled as CTEs).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def word_counts(df: DataFrame, text_col: str = "text") -> DataFrame:
    """(distinct word, count) — the compressed training table."""
    return (
        df.select(
            F.explode(F.split(F.trim(F.col(text_col)), r"\s+")).alias("word")
        )
        .filter(F.col("word") != "")
        .groupBy("word")
        .agg(F.count("*").alias("cnt"))
    )


def _initial_rep() -> F.Column:
    """word -> '<c><c>...<_>' wrapped-symbol encoding."""
    chars = F.expr("filter(split(word, ''), x -> x != '')")
    syms = F.concat(chars, F.array(F.lit("_")))
    return F.concat(F.lit("<"), F.array_join(syms, "><"), F.lit(">"))


def _symbols(rep_col: str = "rep") -> F.Column:
    """'<a><b>' -> ['a','b'] (inverse of the wrapped encoding)."""
    return F.expr(
        f"split(substring({rep_col}, 2, length({rep_col}) - 2), '><')"
    )


def _pair_counts(words_df: DataFrame) -> F.Column:
    """(a, b, c): adjacent-symbol pair counts weighted by word count."""
    return (
        words_df.select("cnt", _symbols().alias("syms"))
        # fully-merged words (one symbol) have no pairs — and must be
        # filtered BEFORE the sequence: Spark's sequence(1, 0) is a
        # DESCENDING [1, 0], so the transform would index syms[1] out of
        # bounds (ANSI error) instead of producing an empty list
        .filter(F.expr("size(syms) >= 2"))
        .select(
            "cnt",
            F.explode(
                F.expr(
                    "transform(sequence(1, size(syms) - 1), "
                    "i -> struct(syms[i - 1] AS a, syms[i] AS b))"
                )
            ).alias("p"),
        )
        .groupBy(F.col("p.a").alias("a"), F.col("p.b").alias("b"))
        .agg(F.sum("cnt").alias("c"))
    )


def train_bpe(
    df: DataFrame,
    text_col: str = "text",
    n_merges: int = 10,
    checkpoint_every: int = 64,
) -> tuple[list[tuple[int, str, str, str, int]], DataFrame]:
    """Learn ``n_merges`` BPE merges from the corpus. Returns
    ``(merges, words)`` where merges is
    ``[(round, left, right, merged, weight), ...]`` (1-based rounds,
    weight = the corpus-frequency-weighted pair count that won the
    round) and ``words`` is the final (word, cnt, rep) DataFrame with
    all merges applied — feed it to :func:`encoded_token_count` or strip
    the wrappers for the actual subword sequences.

    Production-vocab scale discipline (r8 verdict item 4 — the LPA
    lineage lesson applied BEFORE the cliff):

    * **Incremental pair maintenance.** Only words CONTAINING the merged
      pair ``<a><b>`` change their pair multiset, so each round counts
      pairs over that filtered slice twice (old rep negative, new rep
      positive) and folds the delta into the carried pair table —
      O(changed words) explode work per round instead of re-exploding
      the whole vocabulary. Counts are integers and the fold is a keyed
      BIGINT sum, so the argmax sequence is bit-identical to the
      recount-everything form (the workload oracle pins that).
    * **Bounded lineage.** The carried pair table is
      ``localCheckpoint``-ed per round (it feeds the argmax and the next
      round's fold — unchecked, the union chain doubles; the checkpoint
      is LAZY because the argmax's global sort reads every partition,
      materializing it inside the job each round already pays); the word
      table chains one narrow ``replace`` per round and is eagerly
      checkpointed every ``checkpoint_every`` rounds, so no plan ever
      holds more than that many chained replaces — a 32k-merge vocab
      builds 32k/64 bounded plans instead of one 32k-deep expression
      tree (driver/codegen blowup).
    """
    spark = df.sparkSession
    # '_' is the end-of-word marker in the wrapped encoding: a literal
    # corpus underscore would conflate mid-word '_' symbols with word
    # boundaries in the learned merge table, so it is rejected alongside
    # the '<'/'>' wrappers (round-5 ADVICE).
    bad = df.filter(F.col(text_col).rlike("[<>_]")).limit(1).count()
    if bad:
        raise ValueError(
            "text contains reserved symbols: '<'/'>' (wrappers) or "
            "'_' (end-of-word marker)"
        )
    if checkpoint_every < 1:
        raise ValueError("checkpoint_every must be >= 1")
    base = (
        word_counts(df, text_col)
        .withColumn("rep", _initial_rep())
        .persist()
    )
    base.count()
    words = base
    # pairs checkpoints are LAZY: the very next argmax collect reads
    # every partition (global sort), materializing the checkpoint inside
    # the job we already pay — one Spark job per merge round, same as
    # the pre-incremental form
    pairs = _pair_counts(words).localCheckpoint(eager=False)
    merges: list[tuple[int, str, str, str, int]] = []
    for r in range(1, n_merges + 1):
        best = pairs.orderBy(
            F.col("c").desc(), F.col("a").asc(), F.col("b").asc()
        ).limit(1).collect()
        if not best:
            break
        a, b, c = best[0]["a"], best[0]["b"], int(best[0]["c"])
        merged = a + b
        merges.append((r, a, b, merged, c))
        pat, sub = f"<{a}><{b}>", f"<{merged}>"
        # the delta slice: only words whose rep contains the merged pair
        # change any pair count
        changed = words.filter(F.col("rep").contains(pat))
        changed_new = changed.withColumn(
            "rep", F.replace(F.col("rep"), F.lit(pat), F.lit(sub))
        )
        neg = _pair_counts(changed).select("a", "b", (-F.col("c")).alias("c"))
        pos = _pair_counts(changed_new).select("a", "b", "c")
        pairs = (
            pairs.unionByName(pos)
            .unionByName(neg)
            .groupBy("a", "b")
            .agg(F.sum("c").alias("c"))
            .filter(F.col("c") > 0)
            .localCheckpoint(eager=False)
        )
        words = words.withColumn(
            "rep", F.replace(F.col("rep"), F.lit(pat), F.lit(sub))
        )
        if r % checkpoint_every == 0:
            words = words.localCheckpoint(eager=True)
    base.unpersist()  # training done; the returned lineage recomputes if used
    return merges, words


def encoded_token_count(words: DataFrame) -> int:
    """Corpus token count under the trained merges:
    Σ word_count × symbols(word)."""
    return int(
        words.select(
            F.sum(F.col("cnt") * F.size(_symbols())).alias("n")
        ).first()["n"]
    )


def merges_df(spark: SparkSession, merges) -> DataFrame:
    return spark.createDataFrame(
        merges, "round INT, left_sym STRING, right_sym STRING, merged STRING, weight LONG"
    )
