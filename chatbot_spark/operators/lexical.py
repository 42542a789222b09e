"""Lexical (sparse / keyword) retrieval — TF-IDF top-k over a document
corpus (SURVEY §2.I I5 family: the text leg of hybrid search; the
reference's BGE-M3 sparse "lexical weights" leg, bge.py:178, is the
learned analog of this classic form).

Spark-first shape: tokenize → explode → two hash aggregations (term
frequencies per doc, document frequencies per term) → query-term semi-join
→ per-(query, doc) score fold → two-phase top-k window. Every stage is a
map-side-combinable aggregate or an equi-join keyed by term — at 100 TB
the posting-list join shuffles on `token`, the natural key, and never
materializes a dense N×V matrix.

Determinism contract (float-parity discipline, see workload.py header):
per-term contributions are ``tf · N / df`` — one double division of exact
integers, bit-identical on any IEEE engine — and the per-document score
folds those contributions in SORTED TERM ORDER via array_sort + aggregate,
so an oracle replaying the same fold reproduces the score bit-for-bit.
A plain SUM() would be partition-order-dependent and unverifiable.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from chatbot_spark.operators.textstats import tokens


def term_frequencies(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """(id, token, tf) posting list — explode + count, map-side combinable."""
    return (
        df.select(F.col(id_col).alias("id"), F.explode(tokens(F.col(text_col))).alias("token"))
        .groupBy("id", "token")
        .agg(F.count("*").alias("tf"))
    )


def document_frequencies(postings: DataFrame) -> DataFrame:
    """(token, df) from a posting list — one count per distinct (id, token)
    already guaranteed by term_frequencies' groupBy."""
    return postings.groupBy("token").agg(F.count("*").alias("df"))


def tfidf_topk(
    queries_df: DataFrame,
    corpus_df: DataFrame,
    k: int = 10,
    query_id: str = "query_id",
    query_text: str = "query_text",
    corpus_id: str = "doc_id",
    corpus_text: str = "text",
) -> DataFrame:
    """Top-k corpus docs per query by unsmoothed TF-IDF: score(q, d) =
    Σ_{t ∈ terms(q)} tf(d, t) · N / df(t), folded in sorted term order.

    Output: (query_id, neighbor_id, rank, score). BM25's saturation
    (k1, b) belongs to a production scorer; this rational form keeps every
    score an exact composition of integer-derived doubles so the result
    is engine-reproducible — the property the correctness gate needs.
    """
    postings = term_frequencies(corpus_df, corpus_id, corpus_text)
    dfreq = document_frequencies(postings)
    # corpus cardinality folded in as a broadcast 1-row side input — the
    # whole operator is ONE lazy DAG; nothing runs at plan-build time
    stats = corpus_df.agg(F.count_distinct(F.col(corpus_id)).alias("__n_docs"))

    qterms = (
        queries_df.select(
            F.col(query_id).alias("__qid"),
            F.explode(F.array_distinct(tokens(F.col(query_text)))).alias("token"),
        )
    )
    # per-(query, doc, term) contribution: exact ints → ONE double division
    contrib = (
        qterms.join(dfreq, "token")
        .join(postings, "token")
        .crossJoin(F.broadcast(stats))
        .select(
            "__qid",
            F.col("id").alias("neighbor_id"),
            "token",
            (F.col("tf").cast("double") * F.col("__n_docs") / F.col("df")).alias("w"),
        )
    )
    # deterministic fold: sort contributions by token, then left-fold from 0.0
    scored = (
        contrib.groupBy("__qid", "neighbor_id")
        .agg(
            F.aggregate(
                F.array_sort(F.collect_list(F.struct("token", "w"))),
                F.lit(0.0).cast("double"),
                lambda acc, s: acc + s["w"],
            ).alias("score")
        )
    )
    w2 = Window.partitionBy("__qid").orderBy(F.col("score").desc(), F.col("neighbor_id").asc())
    return (
        scored.withColumn("rank", F.row_number().over(w2))
        .filter(F.col("rank") <= k)
        .select(F.col("__qid").alias(query_id), "neighbor_id", "rank", "score")
    )


def bm25_topk(
    queries_df: DataFrame,
    corpus_df: DataFrame,
    k: int = 10,
    k1: float = 1.2,
    b: float = 0.75,
    idf_mode: str = "lucene",
    query_id: str = "query_id",
    query_text: str = "query_text",
    corpus_id: str = "doc_id",
    corpus_text: str = "text",
) -> DataFrame:
    """Top-k corpus docs per query by BM25 — TF-IDF plus the two things
    that make it the production lexical scorer: term-frequency saturation
    (k1) and document-length normalization (b):

        score(q, d) = Σ_t idf(t) · tf·(k1+1) / (tf + k1·(1 − b + b·dl/avgdl))

    ``idf_mode``:
      * "lucene"   — ln(1 + (N − df + 0.5)/(df + 0.5)), the standard form.
        ln() is libm-dependent in its last ulp, so cross-ENGINE bit-parity
        is not guaranteed (fine in production, wrong for the oracle gate).
      * "rational" — (N − df + 0.5)/(df + 0.5), the same monotone ordering
        per term without the transcendental: every factor is a division /
        product of exact-integer-derived doubles, so any IEEE engine
        reproduces the score bit-for-bit. The correctness gate runs this.

    Same distributed shape as tfidf_topk: posting-list joins keyed by
    token (never a dense matrix), map-side-combinable aggs, sorted-term
    fold, two-phase top-k window. dl/avgdl adds one tiny (doc_id → dl)
    broadcast-sized side input derived from the postings themselves."""
    # postings feed FOUR consumers (df, dl, the contrib join, total_dl);
    # persisted so the corpus tokenize/explode runs once, not per branch
    postings = term_frequencies(corpus_df, corpus_id, corpus_text).persist()
    dfreq = document_frequencies(postings)
    doclen = postings.groupBy("id").agg(F.sum("tf").alias("dl"))
    # corpus stats folded in as a broadcast 1-row side input (crossJoin
    # below) — the whole operator is ONE lazy DAG; nothing runs at
    # plan-build time. avgdl = one double division of two exact ints —
    # bit-identical whether computed here or driver-side.
    stats = corpus_df.agg(F.count_distinct(F.col(corpus_id)).alias("__n_docs")).crossJoin(
        doclen.agg(F.sum("dl").alias("__total_dl"))
    )

    qterms = queries_df.select(
        F.col(query_id).alias("__qid"),
        F.explode(F.array_distinct(tokens(F.col(query_text)))).alias("token"),
    )
    n_docs_d = F.col("__n_docs").cast("double")
    avgdl = F.col("__total_dl").cast("double") / n_docs_d
    idf_rational = (n_docs_d - F.col("df") + 0.5) / (F.col("df") + 0.5)
    idf = F.log1p(idf_rational) if idf_mode == "lucene" else idf_rational
    tfd = F.col("tf").cast("double")
    sat = (tfd * F.lit(k1 + 1.0)) / (
        tfd + F.lit(k1) * (F.lit(1.0 - b) + F.lit(b) * F.col("dl") / avgdl)
    )
    contrib = (
        qterms.join(dfreq, "token")
        .join(postings, "token")
        .join(doclen, "id")
        .crossJoin(F.broadcast(stats))
        .select(
            "__qid",
            F.col("id").alias("neighbor_id"),
            "token",
            (idf * sat).alias("w"),
        )
    )
    scored = contrib.groupBy("__qid", "neighbor_id").agg(
        F.aggregate(
            F.array_sort(F.collect_list(F.struct("token", "w"))),
            F.lit(0.0).cast("double"),
            lambda acc, s: acc + s["w"],
        ).alias("score")
    )
    w2 = Window.partitionBy("__qid").orderBy(F.col("score").desc(), F.col("neighbor_id").asc())
    return (
        scored.withColumn("rank", F.row_number().over(w2))
        .filter(F.col("rank") <= k)
        .select(F.col("__qid").alias(query_id), "neighbor_id", "rank", "score")
    )


def bm25_rm3_topk(
    queries_df: DataFrame,
    corpus_df: DataFrame,
    k: int = 10,
    n_fb: int = 5,
    m_terms: int = 10,
    alpha: float = 0.5,
    k1: float = 1.2,
    b: float = 0.75,
    query_id: str = "query_id",
    query_text: str = "query_text",
    corpus_id: str = "doc_id",
    corpus_text: str = "text",
) -> DataFrame:
    """BM25 + RM3 pseudo-relevance feedback (Lavrenko & Croft relevance
    models; the Anserini-style BM25+RM3 pipeline): retrieve n_fb feedback
    docs, estimate the relevance model

        RM1(t) = Σ_{d ∈ fb} (tf(t,d) / dl_d) · score(d)

    keep the top m_terms by RM1 weight (ties on token), normalize over the
    kept set, interpolate with the original query's term distribution
    (qtf/|q|) at weight ``alpha``, and re-score the corpus with the
    weighted expanded query: score₂(d) = Σ_t weight(t) · bm25_w(t, d).

    One DAG, two posting-list join passes over the SAME persisted postings
    (tokenize runs once); everything else is map-side-combinable aggs and
    broadcast-sized side inputs keyed by query. Rational idf (no
    transcendentals) and sorted folds everywhere — pass-1 scores, RM1 sums
    (folded over feedback rank), the normalizer and the final scores all
    replay bit-for-bit in the DuckDB oracle.
    """
    one_minus_alpha = 1.0 - alpha  # mirrored as (1.0 - alpha) in the oracle
    postings = term_frequencies(corpus_df, corpus_id, corpus_text).persist()
    dfreq = document_frequencies(postings)
    doclen = postings.groupBy("id").agg(F.sum("tf").alias("dl"))
    stats = corpus_df.agg(F.count_distinct(F.col(corpus_id)).alias("__n_docs")).crossJoin(
        doclen.agg(F.sum("dl").alias("__total_dl"))
    )

    n_docs_d = F.col("__n_docs").cast("double")
    avgdl = F.col("__total_dl").cast("double") / n_docs_d
    idf = (n_docs_d - F.col("df") + 0.5) / (F.col("df") + 0.5)
    tfd = F.col("tf").cast("double")
    sat = (tfd * F.lit(k1 + 1.0)) / (
        tfd + F.lit(k1) * (F.lit(1.0 - b) + F.lit(b) * F.col("dl") / avgdl)
    )

    def contribs(qterms: DataFrame, extra: list[str]) -> DataFrame:
        return (
            qterms.join(dfreq, "token")
            .join(postings, "token")
            .join(doclen, "id")
            .crossJoin(F.broadcast(stats))
            .select(
                "__qid",
                F.col("id").alias("neighbor_id"),
                "token",
                (idf * sat).alias("w"),
                *extra,
            )
        )

    def fold_scores(contrib: DataFrame, w_col: str) -> DataFrame:
        return contrib.groupBy("__qid", "neighbor_id").agg(
            F.aggregate(
                F.array_sort(F.collect_list(F.struct("token", F.col(w_col).alias("w")))),
                F.lit(0.0).cast("double"),
                lambda acc, s: acc + s["w"],
            ).alias("score")
        )

    # ---- pass 1: plain rational-idf BM25, keep the n_fb feedback docs ----
    qterms1 = queries_df.select(
        F.col(query_id).alias("__qid"),
        F.explode(F.array_distinct(tokens(F.col(query_text)))).alias("token"),
    )
    scored1 = fold_scores(contribs(qterms1, []), "w")
    wfb = Window.partitionBy("__qid").orderBy(
        F.col("score").desc(), F.col("neighbor_id").asc()
    )
    fb = (
        scored1.withColumn("fb_rank", F.row_number().over(wfb))
        .filter(F.col("fb_rank") <= n_fb)
        .select("__qid", F.col("neighbor_id").alias("fb_id"), "fb_rank",
                F.col("score").alias("fb_score"))
    )

    # ---- RM1 over the feedback set, folded over feedback rank ----
    rm1 = (
        fb.join(postings, fb.fb_id == postings.id)
        .join(doclen, "id")
        .select(
            "__qid", "token", "fb_rank",
            (tfd / F.col("dl").cast("double") * F.col("fb_score")).alias("c"),
        )
        .groupBy("__qid", "token")
        .agg(
            F.aggregate(
                F.array_sort(F.collect_list(F.struct("fb_rank", "c"))),
                F.lit(0.0).cast("double"),
                lambda acc, s: acc + s["c"],
            ).alias("rm1w")
        )
    )
    wterm = Window.partitionBy("__qid").orderBy(F.col("rm1w").desc(), F.col("token").asc())
    kept = rm1.withColumn("__tr", F.row_number().over(wterm)).filter(
        F.col("__tr") <= m_terms
    )
    norm = kept.groupBy("__qid").agg(
        F.aggregate(
            F.array_sort(F.collect_list(F.struct("token", "rm1w"))),
            F.lit(0.0).cast("double"),
            lambda acc, s: acc + s["rm1w"],
        ).alias("__z")
    )
    expansion = kept.join(norm, "__qid").select(
        "__qid", "token", (F.col("rm1w") / F.col("__z")).alias("rm1n")
    )

    # ---- original query term distribution: qtf / |q| ----
    qtoks = queries_df.select(
        F.col(query_id).alias("__qid"), F.explode(tokens(F.col(query_text))).alias("token")
    )
    qlen = qtoks.groupBy("__qid").agg(F.count("*").alias("__qlen"))
    orig = (
        qtoks.groupBy("__qid", "token")
        .agg(F.count("*").alias("__qtf"))
        .join(qlen, "__qid")
        .select(
            "__qid", "token",
            (F.col("__qtf").cast("double") / F.col("__qlen").cast("double")).alias("ow"),
        )
    )

    # ---- interpolate: alpha·orig + (1-alpha)·RM1-normalized ----
    weights = (
        orig.join(expansion, ["__qid", "token"], "full_outer")
        .select(
            "__qid", "token",
            (
                F.lit(alpha) * F.coalesce(F.col("ow"), F.lit(0.0))
                + F.lit(one_minus_alpha) * F.coalesce(F.col("rm1n"), F.lit(0.0))
            ).alias("qw"),
        )
        # zero-weight terms (possible at the alpha extremes) retrieve docs
        # they cannot score — drop them BEFORE the posting join, where they
        # would otherwise multiply the pass-2 shuffle for nothing
        .filter(F.col("qw") != 0.0)
    )

    # ---- pass 2: weighted BM25 over the expanded query ----
    contrib2 = contribs(weights, ["qw"]).withColumn("ww", F.col("qw") * F.col("w"))
    scored2 = fold_scores(contrib2, "ww")
    wfin = Window.partitionBy("__qid").orderBy(
        F.col("score").desc(), F.col("neighbor_id").asc()
    )
    return (
        scored2.withColumn("rank", F.row_number().over(wfin))
        .filter(F.col("rank") <= k)
        .select(F.col("__qid").alias(query_id), "neighbor_id", "rank", "score")
    )


def positional_postings(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """(id, pos, token) positional posting list — the phrase-search index.

    posexplode over the token array; positions are 0-based within the
    document. One narrow explode, shuffles only downstream on `token`.
    """
    return df.select(
        F.col(id_col).alias("__id"),
        F.posexplode(tokens(F.col(text_col))).alias("pos", "token"),
    )


def phrase_search(
    docs: DataFrame,
    phrases: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    phrase_id_col: str = "phrase_id",
    phrase_col: str = "phrase",
) -> DataFrame:
    """Exact multi-word phrase matching via positional-index intersection.

    The classic IR positional AND, as ONE equi-join + one aggregate:
    explode each phrase into (phrase_id, idx, term); join the corpus
    positional postings on term; every joined row votes for the anchor
    ``pos - idx`` (where the phrase would have to start); an anchor with
    phrase_len votes has every phrase slot present in sequence — an
    occurrence. Votes are UNIQUE per (phrase, doc, anchor, idx) by
    construction (pos = anchor + idx pins the posting row), so a plain
    count(*) equals count(DISTINCT idx) while skipping the distinct
    aggregate's extra dedup exchange; duplicate terms inside a phrase are
    still exact (each slot votes with its own idx).

    Returns (phrase_id, doc_id, n_occurrences). Scale shape (100 TB):
    postings shuffle on `token` — only terms that appear in some phrase
    survive the join (semi-join pushdown via the broadcast phrase side),
    so the wide exchange carries matched positions, never documents; the
    anchor aggregate is map-side combinable on (phrase, doc, anchor).
    Overlapping occurrences count separately ("a a a" matches "a a"
    twice), matching the standard positional-index semantics.
    """
    terms = phrases.select(
        F.col(phrase_id_col).alias("__pid"),
        F.posexplode(tokens(F.col(phrase_col))).alias("idx", "token"),
    )
    n_terms = terms.groupBy("__pid").agg(F.count("*").alias("__len"))
    post = positional_postings(docs, id_col, text_col)
    votes = post.join(F.broadcast(terms), "token").select(
        "__pid", "__id", (F.col("pos") - F.col("idx")).alias("anchor"), "idx"
    )
    hits = (
        votes.filter(F.col("anchor") >= 0)
        .groupBy("__pid", "__id", "anchor")
        .agg(F.count("*").alias("__n"))
        .join(F.broadcast(n_terms), "__pid")
        .filter(F.col("__n") == F.col("__len"))
    )
    return hits.groupBy("__pid", "__id").agg(
        F.count("*").cast("long").alias("n_occurrences")
    ).select(
        F.col("__pid").alias(phrase_id_col),
        F.col("__id").alias(id_col),
        "n_occurrences",
    )
