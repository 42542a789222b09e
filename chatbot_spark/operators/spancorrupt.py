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

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from chatbot_spark.operators.textstats import tokens

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
    """
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
