"""The declared query workload: every entry pairs a Spark DataFrame builder
with an equivalent ANSI-SQL oracle that DuckDB runs on the same parquet —
the driver's correctness gate (row-count + schema + order-insensitive
value-hash at sf0.01).

Float discipline (why every query looks the way it does):
 * Distances/similarities are computed in DOUBLE with a left-to-right fold
   over list order in BOTH engines (zip_with/aggregate ⟷ list_transform/
   list_reduce) → bit-identical, safe to round(6).
 * Large SUMs of doubles are order-dependent across engines → outputs are
   CAST(ROUND(sum) AS BIGINT) (error ≪ 0.5) or exact-in-double integer
   quantities. AVG of bounded values is safe at round(4).
 * Ranks order by (value, id) so ties never flip between engines.
 * Every computed column is aliased identically in Spark and SQL (driver
   hashes values under sorted column names).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from chatbot_spark.functions.vector import cosine_similarity, l2_norm
from chatbot_spark.io.tables import load_table
from chatbot_spark.operators.dedup import exact_dedup, minhash_lsh_pairs, ngram_jaccard_pairs
from chatbot_spark.operators.similarity import cosine_topk_join, embedding_neardup_pairs
from chatbot_spark.operators.textstats import with_text_stats
from chatbot_spark.operators.topk import knn_join

QueryFn = Callable[[SparkSession, str], DataFrame]

SPARK_QUERIES: dict[str, QueryFn] = {}
ORACLE_SQL: dict[str, str] = {}


def query(name: str, oracle: str | None = None):
    def deco(fn: QueryFn) -> QueryFn:
        SPARK_QUERIES[name] = fn
        if oracle is not None:
            ORACLE_SQL[name] = oracle
        return fn

    return deco


# DuckDB L2 distance reproducing functions/vector.py bit-for-bit:
# double cast, squared diffs in list order, left-fold sum, sqrt.
_DUCK_L2 = (
    "sqrt(list_reduce(list_transform(generate_series(1, len({a})), "
    "i -> (CAST({a}[i] AS DOUBLE) - CAST({b}[i] AS DOUBLE))^2), "
    "(acc, x) -> acc + x))"
)
_DUCK_DOT = (
    "list_reduce(list_transform(generate_series(1, len({a})), "
    "i -> CAST({a}[i] AS DOUBLE) * CAST({b}[i] AS DOUBLE)), "
    "(acc, x) -> acc + x)"
)
_DUCK_NORM = _DUCK_DOT.format(a="{a}", b="{a}")


def _queries_from_embeddings(spark: SparkSession, sf_dir: str, n: int = 10) -> DataFrame:
    """Deterministic query workload: the first n corpus vectors act as
    queries (FIXTURES.md §4's distance-0 sanity built in)."""
    emb = load_table(spark, sf_dir, "embeddings")
    return emb.filter(F.col("vec_id") < n).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("query_embedding")
    )


# --------------------------------------------------------------------------
# Vector search (SURVEY §2.I I4/I5, §2.E E1/E2, §2.C C1)
# --------------------------------------------------------------------------

@query(
    "knn_exact_l2",
    f"""
WITH q AS (SELECT vec_id AS query_id, embedding AS qe FROM embeddings WHERE vec_id < 10),
pairs AS (
  SELECT q.query_id, c.vec_id AS neighbor_id,
         {_DUCK_L2.format(a='q.qe', b='c.embedding')} AS d
  FROM q, embeddings c
),
ranked AS (
  SELECT query_id, neighbor_id,
         row_number() OVER (PARTITION BY query_id ORDER BY d ASC, neighbor_id ASC) AS rank,
         d
  FROM pairs)
SELECT query_id, neighbor_id, CAST(rank AS BIGINT) AS rank, round(d, 6) AS dist
FROM ranked WHERE rank <= 10
""",
)
def knn_exact_l2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """I4: exact top-10 by L2 — the reference's similarity_search_by_vector
    (doc_embedder.py:196-220) with k=DEFAULT_SEARCH_LIMIT (ob.py:30)."""
    emb = load_table(spark, sf_dir, "embeddings")
    q = _queries_from_embeddings(spark, sf_dir)
    res = knn_join(q, emb, k=10, metric="l2", corpus_id="vec_id", corpus_vec="embedding")
    return res.select(
        "query_id",
        "neighbor_id",
        F.col("rank").cast("long").alias("rank"),
        F.round("dist", 6).alias("dist"),
    )


@query(
    "knn_exact_cosine",
    f"""
WITH q AS (SELECT vec_id AS query_id, embedding AS qe FROM embeddings WHERE vec_id < 10),
pairs AS (
  SELECT q.query_id, c.vec_id AS neighbor_id,
         {_DUCK_DOT.format(a='q.qe', b='c.embedding')}
           / (sqrt({_DUCK_NORM.format(a='q.qe')}) * sqrt({_DUCK_NORM.format(a='c.embedding')})) AS s
  FROM q, embeddings c
),
ranked AS (
  SELECT query_id, neighbor_id,
         row_number() OVER (PARTITION BY query_id ORDER BY s DESC, neighbor_id ASC) AS rank,
         s
  FROM pairs)
SELECT query_id, neighbor_id, CAST(rank AS BIGINT) AS rank, round(s, 6) AS sim
FROM ranked WHERE rank <= 10
""",
)
def knn_exact_cosine(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cosine variant of I4 (cosine is the conventional metric for text
    embeddings; the engine supports l2/cosine/inner_product)."""
    emb = load_table(spark, sf_dir, "embeddings")
    q = _queries_from_embeddings(spark, sf_dir)
    res = cosine_topk_join(q, emb, k=10, corpus_id="vec_id", corpus_vec="embedding")
    return res.select(
        "query_id",
        "neighbor_id",
        F.col("rank").cast("long").alias("rank"),
        F.round("sim", 6).alias("sim"),
    )


@query(
    "knn_per_label_quota",
    f"""
WITH q AS (SELECT vec_id AS query_id, embedding AS qe FROM embeddings WHERE vec_id < 5),
pairs AS (
  SELECT q.query_id, c.label, c.vec_id AS neighbor_id,
         {_DUCK_L2.format(a='q.qe', b='c.embedding')} AS d
  FROM q, embeddings c
),
ranked AS (
  SELECT query_id, label, neighbor_id,
         row_number() OVER (PARTITION BY query_id, label ORDER BY d ASC, neighbor_id ASC) AS rank,
         d
  FROM pairs)
SELECT query_id, CAST(label AS BIGINT) AS label, neighbor_id,
       CAST(rank AS BIGINT) AS rank, round(d, 6) AS dist
FROM ranked WHERE rank <= 4
""",
)
def knn_per_label_quota(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E2/I8: per-partition fan-out search with quota — the reference's
    per-component search loop (rag_graph.py:365-417) as ONE windowed scan;
    k=4 = max(3, 13−3·3) for 3 components (rag_graph.py:371-375). `label`
    stands in for component_code."""
    emb = load_table(spark, sf_dir, "embeddings")
    q = _queries_from_embeddings(spark, sf_dir, n=5)
    qs = q.select(F.col("query_id").alias("__qid"), F.col("query_embedding").alias("__qvec"))
    from chatbot_spark.functions.vector import sq_l2_distance

    pairs = emb.join(F.broadcast(qs)).select(
        F.col("__qid").alias("query_id"),
        F.col("label"),
        F.col("vec_id").alias("neighbor_id"),
        sq_l2_distance(F.col("__qvec"), F.col("embedding")).alias("__rd"),
    )
    w = Window.partitionBy("query_id", "label").orderBy(F.col("__rd").asc(), F.col("neighbor_id").asc())
    return (
        pairs.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= 4)
        .select(
            "query_id",
            F.col("label").cast("long").alias("label"),
            "neighbor_id",
            F.col("rank").cast("long").alias("rank"),
            F.round(F.sqrt("__rd"), 6).alias("dist"),
        )
    )


@query(
    "vector_norms",
    f"""
SELECT vec_id, round(sqrt({_DUCK_NORM.format(a='embedding')}), 6) AS norm
FROM embeddings
""",
)
def vector_norms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Vector scalar math sanity: per-row L2 norm (zip_with/aggregate fold)."""
    emb = load_table(spark, sf_dir, "embeddings")
    return emb.select("vec_id", F.round(l2_norm(F.col("embedding")), 6).alias("norm"))


@query(
    "embedding_neardup",
    f"""
SELECT a.vec_id AS id_a, b.vec_id AS id_b,
       round({_DUCK_DOT.format(a='a.embedding', b='b.embedding')}
         / (sqrt({_DUCK_NORM.format(a='a.embedding')}) * sqrt({_DUCK_NORM.format(a='b.embedding')})), 6) AS cosine
FROM embeddings a, embeddings b
WHERE a.vec_id < b.vec_id
  AND {_DUCK_DOT.format(a='a.embedding', b='b.embedding')}
      / (sqrt({_DUCK_NORM.format(a='a.embedding')}) * sqrt({_DUCK_NORM.format(a='b.embedding')})) >= 0.35
""",
)
def embedding_neardup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J3: ε-ball similarity self-join (embedding-cosine near-dup)."""
    emb = load_table(spark, sf_dir, "embeddings")
    res = embedding_neardup_pairs(emb, id_col="vec_id", vec_col="embedding", min_cosine=0.35)
    return res.select("id_a", "id_b", F.round("cosine", 6).alias("cosine"))

# --------------------------------------------------------------------------
# Text analysis + dedup (SURVEY §2.J J1/J2/J4, §2.H)
# --------------------------------------------------------------------------

_DUCK_TOKENS = "regexp_extract_all(lower({c}), '\\S+')"
_DUCK_STOP = {
    "en": "['the','a','of','and','in','to','is']",
    "es": "['el','la','de','los','que','y','es']",
    "de": "['der','die','das','und','ist','nicht']",
    "fr": "['le','la','les','des','est','et','une']",
}


def _duck_stophits(lang: str) -> str:
    return (
        f"len(list_filter({_DUCK_TOKENS.format(c='text')}, "
        f"t -> list_contains({_DUCK_STOP[lang]}, t)))"
    )


@query(
    "text_stats",
    f"""
WITH s AS (
  SELECT doc_id,
         len(regexp_extract_all(lower(text), '\\S+')) AS n_tokens,
         len(regexp_extract_all(text, '[A-Za-z]+')) AS n_words,
         len(regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]')) AS n_bpe_tokens,
         len(regexp_extract_all(text, '[.,!?;:]')) AS n_punct,
         length(text) AS n_chars,
         {_duck_stophits('en')} AS hits_en,
         {_duck_stophits('es')} AS hits_es,
         {_duck_stophits('de')} AS hits_de,
         {_duck_stophits('fr')} AS hits_fr,
         len(regexp_extract_all(text, '[一-鿿぀-ヿ가-힯]')) AS cjk,
         md5(lower(trim(regexp_replace(text, '\\s+', ' ', 'g')))) AS fingerprint
  FROM documents)
SELECT doc_id,
       CAST(n_tokens AS BIGINT) AS n_tokens,
       CAST(n_words AS BIGINT) AS n_words,
       CAST(n_bpe_tokens AS BIGINT) AS n_bpe_tokens,
       round(CAST(n_punct AS DOUBLE) / greatest(n_chars, 1), 6) AS punct_ratio,
       round(CAST(hits_en AS DOUBLE) / greatest(n_tokens, 1), 6) AS stopword_ratio_en,
       CASE WHEN cjk > 0 THEN 'zh'
            WHEN hits_en >= hits_es AND hits_en >= hits_de AND hits_en >= hits_fr AND hits_en > 0 THEN 'en'
            WHEN hits_es >= hits_de AND hits_es >= hits_fr AND hits_es > 0 THEN 'es'
            WHEN hits_de >= hits_fr AND hits_de > 0 THEN 'de'
            WHEN hits_fr > 0 THEN 'fr'
            ELSE 'unknown' END AS lang_pred,
       fingerprint
FROM s
""",
)
def text_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J4: token counting, punctuation/stopword ratios, n-gram-heuristic
    language ID, md5 fingerprint — all JVM-side expressions."""
    docs = load_table(spark, sf_dir, "documents")
    res = with_text_stats(docs, "text")
    return res.select(
        "doc_id",
        F.col("n_tokens").cast("long").alias("n_tokens"),
        F.col("n_words").cast("long").alias("n_words"),
        F.col("n_bpe_tokens").cast("long").alias("n_bpe_tokens"),
        F.round("punct_ratio", 6).alias("punct_ratio"),
        F.round("stopword_ratio_en", 6).alias("stopword_ratio_en"),
        "lang_pred",
        "fingerprint",
    )


@query(
    "dedup_exact",
    """
WITH doubled AS (
  SELECT doc_id, text FROM documents
  UNION ALL
  SELECT doc_id + 1000000 AS doc_id, text FROM documents
),
fp AS (
  SELECT doc_id, md5(lower(trim(regexp_replace(text, '\\s+', ' ', 'g')))) AS fingerprint
  FROM doubled)
SELECT fingerprint, CAST(min(doc_id) AS BIGINT) AS keep_id, CAST(count(*) AS BIGINT) AS n_copies
FROM fp GROUP BY fingerprint
""",
)
def dedup_exact_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J1: exact dedup by normalized-content hash. The corpus is doubled
    with shifted ids first so the dedup actually collapses something."""
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    doubled = docs.unionAll(
        docs.select((F.col("doc_id") + 1000000).alias("doc_id"), "text")
    )
    from chatbot_spark.operators.textstats import fingerprint as fp

    return (
        doubled.withColumn("fingerprint", fp(F.col("text")))
        .groupBy("fingerprint")
        .agg(
            F.min("doc_id").cast("long").alias("keep_id"),
            F.count("*").cast("long").alias("n_copies"),
        )
    )


_DUCK_SHINGLES = (
    "list_distinct(list_transform(generate_series(1, greatest(len({t}) - 2, 1)), "
    "i -> concat_ws(' ', {t}[i], {t}[i+1], {t}[i+2])))"
)


@query(
    "neardup_jaccard",
    f"""
WITH sh AS (
  SELECT doc_id, {_DUCK_SHINGLES.format(t=_DUCK_TOKENS.format(c='text'))} AS shingles
  FROM documents WHERE doc_id < 200),
post AS (SELECT doc_id, unnest(shingles) AS sh FROM sh),
sizes AS (SELECT doc_id, len(shingles) AS n FROM sh),
inter AS (
  SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS i
  FROM post a JOIN post b ON a.sh = b.sh AND a.doc_id < b.doc_id
  GROUP BY 1, 2)
SELECT id_a, id_b,
       round(CAST(i AS DOUBLE) / (sa.n + sb.n - i), 6) AS jaccard
FROM inter
JOIN sizes sa ON sa.doc_id = id_a
JOIN sizes sb ON sb.doc_id = id_b
WHERE CAST(i AS DOUBLE) / (sa.n + sb.n - i) >= 0.1
""",
)
def neardup_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J2 oracle path: exact 3-gram Jaccard pairs via inverted shingle
    index (the verification operator behind MinHash LSH)."""
    docs = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") < 200)
    res = ngram_jaccard_pairs(docs, id_col="doc_id", text_col="text", shingle_n=3, threshold=0.1)
    return res.select("id_a", "id_b", F.round("jaccard", 6).alias("jaccard"))


@query(
    "chunk_fixed",
    """
WITH s AS (
  SELECT doc_id,
         unnest(list_transform(
           generate_series(0, greatest((length(text) - 1) // 100, 0)),
           i -> struct_pack(seq := i, chunk := substr(text, i * 100 + 1, 100)))) AS u
  FROM documents)
SELECT doc_id, CAST(u.seq AS BIGINT) AS chunk_seq, u.chunk AS chunk FROM s
""",
)
def chunk_fixed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """H2: fixed-size sub-chunking (reference doc_processing.py:135-158,
    4096 chars there; 100 here so the test corpus actually splits) —
    sequence/transform/posexplode, zero UDF, lossless slices."""
    from chatbot_spark.operators.chunking import subchunk

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    res = subchunk(docs, "text", max_chunk_size=100, seq_col="chunk_seq", out_col="chunk")
    return res.select("doc_id", F.col("chunk_seq").cast("long").alias("chunk_seq"), "chunk")
