"""T5 span-corruption example construction (beyond-reference §2.J scope).

The T5 denoising objective (Raffel et al. 2020) replaces random token
SPANS with sentinel tokens and trains the model to emit the spans after
their sentinels. Production variants sample spans with an RNG; this
operator derives every decision from md5(doc_id:pos) so the constructed
examples are a pure function of the corpus — reproducible across runs,
engines and partitionings (swap the seed string per epoch for fresh
corruption), and therefore oracle-checkable bit-for-bit.

Pipeline (all keyed by doc/(doc,pos) — no global state):
  1. positional postings (posexplode),
  2. span seeds: position p seeds a span iff hash(p) mod 1000 <
     start_permille; its length is 1 + hash mod max_span,
  3. masked set = union of seeded ranges clipped to the document
     (explode + distinct), overlaps allowed,
  4. islands: maximal masked runs via the mpos − row_number() trick
     (window keyed by doc) — each island is ONE sentinel span even when
     several seeds overlap, exactly T5's contiguous-span contract,
  5. assembly: unmasked tokens keep their position, an island's first
     position becomes <extra_id_k>, interior masked positions drop;
     targets are '<extra_id_k> tok ...' per island in order.

Per-doc strings are reassembled with sort_array(collect_list(struct)) —
deterministic order from the unique pos key, never shuffle luck.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from chatbot_spark.operators.textstats import let, tokens

__all__ = ["t5_span_corrupt"]


def _pos_hash(id_col: str) -> F.Column:
    return F.conv(
        F.substring(
            F.md5(
                F.concat(
                    F.col(id_col).cast("string"), F.lit(":"), F.col("pos").cast("string")
                )
            ),
            1,
            8,
        ),
        16,
        10,
    ).cast("long")


def t5_span_corrupt(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    start_permille: int = 60,
    max_span: int = 3,
) -> DataFrame:
    """Per document: (id, n_tokens, n_spans, n_masked, input, target).

    input = tokens with each masked island collapsed to <extra_id_k>;
    target = '<extra_id_k> tok ...' chunks in island order ('' when the
    document drew no span). Deterministic md5 seeding as per module doc.

    r14 execution (guide §1.2 — fix the distributed algorithm first):
    every decision is a pure function of (doc_id, pos, tokens), i.e.
    strictly PER-DOCUMENT, so the whole construction evaluates as one
    narrow pass of array expressions — the former position-keyed
    posexplode + 2 joins + 2 windows + 3 persists (6 exchanges at sf1)
    assembled per-position rows only to regroup them by the document
    they never left. Exact by construction: identical md5/integer
    arithmetic per position, identical island decomposition (a position
    is masked iff one of the max_span preceding seeds covers it; an
    island starts where masked starts), identical join-with-space
    assembly — all integer/string logic, no floats. The join form
    remains below (:func:`_t5_span_corrupt_joins`) as the pinned
    equivalence twin.
    """
    sentinel = lambda k: F.concat(  # noqa: E731  k is the 0-based island index
        F.lit("<extra_id_"), k.cast("string"), F.lit(">")
    )

    def _hash_at(p: Column) -> Column:
        # the exact _pos_hash expression with pos = p (lambda variable)
        return F.conv(
            F.substring(
                F.md5(
                    F.concat(
                        F.col(id_col).cast("string"),
                        F.lit(":"),
                        p.cast("string"),
                    )
                ),
                1,
                8,
            ),
            16,
            10,
        ).cast("long")

    def _assemble(tk: Column) -> Column:
        # every intermediate ARRAY is let-bound before reuse: Catalyst
        # does no CSE through lambdafunction (the r13 `let` finding), so
        # an unbound reference would re-evaluate the whole array per
        # element — O(n²) md5s for the hash array
        n = F.size(tk)
        pos = F.sequence(F.lit(0), n - 1)

        def _with_hashes(hh: Column) -> Column:
            # pm = masked[] padded with False on both ends, so prev/next
            # probes (island boundaries) never index out of range:
            # pm[p+2] == masked[p] for p in 0..n-1.
            # masked[p] <=> EXISTS s in [p-(max_span-1), p]: seed(s)
            # fires (h % 1000 < permille) and covers p (s + h%span >= p)
            padded = F.concat(
                F.array(F.lit(False)),
                F.transform(
                    pos,
                    lambda p: F.exists(
                        F.sequence(F.greatest(p - (max_span - 1), F.lit(0)), p),
                        lambda s: (
                            F.element_at(hh, s + 1) % 1000 < start_permille
                        )
                        & (s + (F.element_at(hh, s + 1) % max_span) >= p),
                    ),
                ),
                F.array(F.lit(False)),
            )
            return let(padded, _with_mask)

        def _with_mask(pm: Column) -> Column:
            starts = F.filter(
                pos,
                lambda p: F.element_at(pm, p + 2) & ~F.element_at(pm, p + 1),
            )
            ends = F.filter(
                pos,
                lambda p: F.element_at(pm, p + 2) & ~F.element_at(pm, p + 3),
            )
            return let(
                starts, lambda ss: let(ends, lambda ee: _result(pm, ss, ee))
            )

        def _result(pm: Column, ss: Column, ee: Column) -> Column:
            pieces = F.transform(
                pos,
                lambda p: F.when(
                    F.array_position(ss, p) > 0,
                    sentinel(F.array_position(ss, p) - 1),
                )
                .when(F.element_at(pm, p + 2), F.lit(None).cast("string"))
                .otherwise(F.element_at(tk, p + 1)),
            )
            target = F.array_join(
                F.transform(
                    ss,
                    lambda s, i: F.concat(
                        sentinel(i.cast("long")),
                        F.lit(" "),
                        F.array_join(
                            F.slice(tk, s + 1, F.element_at(ee, i + 1) - s + 1),
                            " ",
                        ),
                    ),
                ),
                " ",
            )
            return F.struct(
                n.cast("long").alias("n_tokens"),
                F.size(ss).cast("long").alias("n_spans"),
                F.size(F.filter(F.slice(pm, 2, n), lambda x: x))
                .cast("long")
                .alias("n_masked"),
                F.array_join(
                    F.filter(pieces, lambda x: x.isNotNull()), " "
                ).alias("input"),
                target.alias("target"),
            )

        # zero-token (and null-text) documents: CaseWhen guards the whole
        # evaluation — sequence(0, n-1) with n <= 0 would run descending
        return F.when(n >= 1, let(F.transform(pos, _hash_at), _with_hashes))

    out = docs.select(
        F.col(id_col),
        let(tokens(F.col(text_col)), _assemble).alias("__r"),
    ).filter(
        # the join form's posexplode drops zero-token (and null-text)
        # documents from the output entirely — replicate that contract
        F.col("__r.n_tokens") >= 1
    )
    return out.select(
        id_col,
        "__r.n_tokens",
        "__r.n_spans",
        "__r.n_masked",
        "__r.input",
        "__r.target",
    )


def _t5_span_corrupt_joins(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    start_permille: int = 60,
    max_span: int = 3,
) -> DataFrame:
    """The r13 position-keyed join/window execution of
    :func:`t5_span_corrupt` — kept as the pinned equivalence twin (the
    array form must emit the identical row set; tests toggle between
    them on the same corpus)."""
    tk = tokens(F.col(text_col))
    # The postings feed THREE consumers (seed scan, mask-token join,
    # final assembly) and the span table two; without persisting, each
    # branch re-scans and re-explodes the corpus — 7 parquet scans in
    # the physical plan (measured). Persist the shared subtrees so the
    # corpus is read ONCE however many branches compose downstream —
    # the same shared-subtree discipline as plans/dataprep.
    post = docs.select(
        F.col(id_col).alias("__id"),
        F.size(tk).alias("n"),
        F.posexplode(tk).alias("pos", "tok"),
    ).persist()
    h = _pos_hash("__id")
    seeded = post.withColumn("__h", h).filter(
        F.col("__h") % 1000 < start_permille
    )
    masked = (
        seeded.select(
            "__id",
            F.explode(
                F.sequence(
                    F.col("pos"),
                    F.least(
                        F.col("pos") + (F.col("__h") % max_span).cast("int"),
                        F.col("n") - 1,
                    ),
                )
            ).alias("mpos"),
        )
        .distinct()
    )
    maskt = masked.join(
        post.select("__id", F.col("pos").alias("mpos"), "tok"), ["__id", "mpos"]
    ).persist()
    w_run = Window.partitionBy("__id").orderBy("mpos")
    runs = maskt.withColumn("__grp", F.col("mpos") - F.row_number().over(w_run))
    spans = runs.groupBy("__id", "__grp").agg(
        F.min("mpos").alias("span_start"),
        F.count("*").cast("long").alias("span_len"),
        F.array_join(
            F.transform(
                F.sort_array(F.collect_list(F.struct("mpos", "tok"))),
                lambda s: s["tok"],
            ),
            " ",
        ).alias("span_text"),
    )
    w_span = Window.partitionBy("__id").orderBy("span_start")
    spans = spans.withColumn("span_idx", F.row_number().over(w_span)).persist()
    flags = maskt.select(
        F.col("__id").alias("__fid"), F.col("mpos").alias("__fpos"), F.lit(1).alias("__m")
    )
    sent = spans.select(
        F.col("__id").alias("__sid"), F.col("span_start").alias("__spos"), "span_idx"
    )
    pieces = (
        post.join(
            flags,
            (F.col("__id") == F.col("__fid")) & (F.col("pos") == F.col("__fpos")),
            "left",
        )
        .join(
            sent,
            (F.col("__id") == F.col("__sid")) & (F.col("pos") == F.col("__spos")),
            "left",
        )
        .select(
            "__id",
            "pos",
            F.when(
                F.col("span_idx").isNotNull(),
                F.concat(
                    F.lit("<extra_id_"),
                    (F.col("span_idx") - 1).cast("string"),
                    F.lit(">"),
                ),
            )
            .when(F.col("__m").isNotNull(), F.lit(None).cast("string"))
            .otherwise(F.col("tok"))
            .alias("piece"),
            "n",
        )
    )
    inputs = pieces.groupBy("__id").agg(
        F.max("n").cast("long").alias("n_tokens"),
        F.array_join(
            F.filter(
                F.transform(
                    F.sort_array(F.collect_list(F.struct("pos", "piece"))),
                    lambda s: s["piece"],
                ),
                lambda x: x.isNotNull(),
            ),
            " ",
        ).alias("input"),
    )
    targets = spans.groupBy("__id").agg(
        F.count("*").cast("long").alias("n_spans"),
        F.sum("span_len").cast("long").alias("n_masked"),
        F.array_join(
            F.transform(
                F.sort_array(F.collect_list(F.struct("span_idx", "span_text"))),
                lambda s: F.concat(
                    F.lit("<extra_id_"),
                    (s["span_idx"] - 1).cast("string"),
                    F.lit("> "),
                    s["span_text"],
                ),
            ),
            " ",
        ).alias("target"),
    )
    return (
        inputs.join(targets, "__id", "left")
        .select(
            F.col("__id").alias(id_col),
            "n_tokens",
            F.coalesce("n_spans", F.lit(0).cast("long")).alias("n_spans"),
            F.coalesce("n_masked", F.lit(0).cast("long")).alias("n_masked"),
            "input",
            F.coalesce("target", F.lit("")).alias("target"),
        )
    )
