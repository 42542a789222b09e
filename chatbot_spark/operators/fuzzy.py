"""Fuzzy (edit-distance) entity matching with scalable candidate blocking.

The naive shape — ``a JOIN b ON abs(len(a)-len(b)) <= k`` — has no equality
key, so Spark executes a BroadcastNestedLoopJoin that *enumerates* every
pair and only then filters: O(n²) regardless of the band. Worse, a plain
length-bucket equi-join fixes the operator but not the complexity when the
corpus has a skewed length distribution (TPC-H supplier names are all the
same length, so one bucket holds everything).

This module blocks with SymSpell-style *deletion neighborhoods* instead:
for Levenshtein distance(a, b) <= k, there exist variants a' of a and b'
of b, each obtained by deleting at most k characters, with a' == b'
(delete the edited positions from both sides of any optimal alignment).
Exploding each string to its <=k-deletion variants therefore yields a
candidate equi-join that is *complete* for dist <= k and highly selective:
a variant key pins down all but k characters of the string. A string of
length L emits <= 1 + L + L·(L-1)/2 variants for k=2 — ~170 rows for
typical name lengths, each a near-unique key — so the join is a
hash/sort-merge join on `variant` whose output is ~the true match set,
not n².

Variant generation is two cascaded ``explode(sequence(...))`` over the
deleted-position pair (i, j) plus pure substring/concat arithmetic —
ordinary codegen expressions, not interpreted higher-order-function
lambdas (the earlier transform/flatten form spent ~3 s on 1 000 rows in
lambda interpretation; this form is ~10× cheaper per row).

Scale notes (100 TB): exact-duplicate strings all share all variants, so
collapse exact dups first (``exact_dedup``) when the corpus has heavy
string multiplicity; remaining skew is bounded by true near-duplicate
cluster size. The explode factor is O(L²) for k=2 — for long strings,
block on a bounded prefix/fingerprint first (this operator targets
name-length strings, the reference's entity-matching shape).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _variant_rows(df: DataFrame, id_col: str, text_col: str, k: int) -> DataFrame:
    """(id, variant) rows: every distinct string obtained from `text_col`
    by deleting at most k characters (k in {1, 2}).

    Deleted positions are encoded as a pair (i, j), 1-based, with 0 as the
    "unused" sentinel: (0, 0) = original string, (0, j) = delete j only,
    (i, j) with j > i >= 1 = delete both. Sequences are guarded so empty
    ranges emit nothing (Spark's sequence(a, b) runs DESCENDING when
    a > b, which would corrupt the neighborhood).
    """
    if k not in (1, 2):
        raise ValueError(f"deletion-neighborhood blocking supports k in {{1, 2}}, got {k}")
    base = df.select(
        F.col(id_col).alias("__fid"),
        F.col(text_col).alias("__t"),
        F.length(text_col).alias("__L"),
    )
    if k == 1:
        with_i = base.withColumn("__i", F.lit(0))
    else:
        # i = 0 (no first deletion) or any first deleted position
        with_i = base.withColumn("__i", F.explode(F.expr("sequence(0, __L)")))
    # j: for i = 0 -> 0..L (original + single deletions); for i >= 1 ->
    # i+1..L (the second deleted position of a double deletion)
    with_ij = with_i.withColumn(
        "__j",
        F.explode(
            F.expr(
                "if(__i = 0, sequence(0, __L), "
                "if(__i + 1 <= __L, sequence(__i + 1, __L), array()))"
            )
        ),
    )
    variant = F.expr(
        "CASE WHEN __i = 0 AND __j = 0 THEN __t "
        "WHEN __i = 0 THEN concat(substring(__t, 1, __j - 1), substring(__t, __j + 1, __L)) "
        "ELSE concat(substring(__t, 1, __i - 1), "
        "substring(__t, __i + 1, __j - __i - 1), "
        "substring(__t, __j + 1, __L)) END"
    )
    # distinct: repeated characters make different (i, j) collide on the
    # same variant (e.g. the zero-runs in TPC-H names); deduping here keeps
    # the candidate join's per-key multiplicity at 1 per source string
    return with_ij.select("__fid", variant.alias("__variant")).distinct()


def fuzzy_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    max_dist: int = 2,
) -> DataFrame:
    """All pairs (id_a < id_b) whose `text_col` values are within Levenshtein
    distance `max_dist`, via deletion-neighborhood candidate blocking.

    Returns columns (id_a, id_b, dist). Exact: blocking is complete for
    dist <= max_dist (SymSpell deletion-neighborhood guarantee), and every
    candidate is verified with the JVM-builtin thresholded levenshtein
    (early exit past max_dist: O(k·len) per pair).

    Reference parity: ob-labs/ChatBot resolves near-identical entity names
    during component validation (src/chat/component.py dedup path); this is
    the scale-out form of that matching.

    Duplicate-storm guard: identical strings share every deletion variant,
    so k copies of one name would meet k² times in the candidate join and
    pay k² levenshteins. Each distinct string therefore collapses to its
    min-id REPRESENTATIVE first; the neighborhood explode, candidate join,
    and verify all run on unique strings, and the verified rep pairs
    expand back through the (id, rep) groups — cross-group pairs inherit
    the rep pair's distance (identical texts ⇒ identical distance),
    intra-group pairs are distance 0 by definition. The OUTPUT pair set is
    unchanged (it is inherently quadratic in string multiplicity); only
    the generation cost stops being.
    """
    from pyspark.sql import Window

    names = df.select(F.col(id_col).alias("__fid"), F.col(text_col).alias("__t"))
    w = Window.partitionBy("__t")
    # with_rep feeds reps + mapping, variants feeds both join sides —
    # persist the shared subtrees so the source is scanned once, not per
    # branch (plan measured 8 source scans unpersisted).
    with_rep = names.withColumn("__rep", F.min("__fid").over(w)).persist()
    reps = with_rep.filter(F.col("__fid") == F.col("__rep")).select("__fid", "__t")
    mapping = with_rep.select("__fid", "__rep")

    variants = _variant_rows(reps, "__fid", "__t", max_dist).persist()
    # keep the candidate join NARROW: ids + variant key only (texts attach
    # via the planner-chosen rep join — broadcast whenever reps fit).
    #
    # VERIFY BEFORE DEDUP (r14, guide §2.3/§2.5): on corpora with heavy
    # shared structure (e.g. fixed-prefix zero-padded names) the deletion
    # blocking degenerates — measured at the sf1 point: 10k names -> 77 M
    # raw candidate rows, 30 M DISTINCT candidate pairs, and the
    # pre-verify distinct was one 15 s exchange that then fed 30 M
    # levenshteins anyway. The thresholded levenshtein is prefix/suffix-
    # trimmed banded DP (~O(max_dist · len) per pair after the common
    # prefix drops out), far cheaper per row than exchanging and hashing
    # the row, so verification now runs map-side ON the join stream and
    # only TRUE pairs (identical (ra, rb, dist) per duplicate, dist is a
    # pure function of the texts) reach the dedup exchange. On selective
    # corpora raw ~= distinct and the order is a wash; on degenerate ones
    # the exchange shrinks by the false-positive factor.
    a = variants.select(F.col("__fid").alias("__ra"), "__variant")
    b = variants.select(F.col("__fid").alias("__rb"), "__variant")
    cand = (
        a.join(b, "__variant")
        .filter(F.col("__ra") < F.col("__rb"))
        .select("__ra", "__rb")
    )
    base_a = reps.select(F.col("__fid").alias("__ra"), F.col("__t").alias("__ta"))
    base_b = reps.select(F.col("__fid").alias("__rb"), F.col("__t").alias("__tb"))
    rep_pairs = (
        cand.join(base_a, "__ra")
        .join(base_b, "__rb")
        .withColumn("dist", F.levenshtein("__ta", "__tb", max_dist))
        .filter(F.col("dist") >= 0)
        .select("__ra", "__rb", "dist")
        .distinct()
    )
    ga = mapping.select(F.col("__rep").alias("__ra"), F.col("__fid").alias("__ia"))
    gb = mapping.select(F.col("__rep").alias("__rb"), F.col("__fid").alias("__ib"))
    cross = (
        rep_pairs.join(ga, "__ra")
        .join(gb, "__rb")
        .select(
            F.least("__ia", "__ib").alias("id_a"),
            F.greatest("__ia", "__ib").alias("id_b"),
            "dist",
        )
    )
    intra = (
        mapping.alias("x")
        .join(mapping.alias("y"), F.col("x.__rep") == F.col("y.__rep"))
        .filter(F.col("x.__fid") < F.col("y.__fid"))
        .select(
            F.col("x.__fid").alias("id_a"),
            F.col("y.__fid").alias("id_b"),
            F.lit(0).alias("dist"),
        )
    )
    return cross.unionByName(intra)
