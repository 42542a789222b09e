"""Text analysis operators for LLM-data pipelines (SURVEY §2.J J4).

Beyond-reference scope required by the north star: language ID, quality
scoring, token counting, document fingerprinting — each a pure Catalyst
expression (regexp + higher-order array functions), so they run JVM-side
with whole-stage codegen over 100 TB of text with zero Python cost.

Design notes for scale: every function here is a narrow map — no shuffle,
no UDF; Catalyst pushes the needed column reads down to the Parquet scan.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# Tiny per-language stopword marker sets (deterministic heuristic — the
# point is a reproducible distributed lang-ID operator, not model quality).
LANG_MARKERS: dict[str, list[str]] = {
    "en": ["the", "a", "of", "and", "in", "to", "is"],
    "es": ["el", "la", "de", "los", "que", "y", "es"],
    "de": ["der", "die", "das", "und", "ist", "nicht"],
    "fr": ["le", "la", "les", "des", "est", "et", "une"],
}

_CJK = r"[一-鿿぀-ヿ가-힯]"


def let(col: Column, body) -> Column:
    """Evaluate ``col`` ONCE and pass the bound value to ``body`` — a
    let-binding built from transform over a one-element array.

    Catalyst performs no common-subexpression elimination through
    ``lambdafunction``: a Column tree referenced k times inside a
    higher-order lambda is evaluated k times PER ELEMENT. For the text
    kernels here that meant the full ``regexp_extract_all`` tokenization
    re-ran for every shingle position — O(len²) per document (measured
    r13: the single biggest CPU sink of the dedup/ngram family). Binding
    the array as a lambda variable evaluates it once per row; the body
    then references a materialized value.
    """
    return F.element_at(F.transform(F.array(col), body), 1)


def tokens(col: Column) -> Column:
    """Whitespace tokens via regexp_extract_all — robust to repeated
    whitespace and identical across engines (unlike split())."""
    return F.regexp_extract_all(F.lower(col), F.lit(r"\S+"), 0)


def token_count(col: Column) -> Column:
    return F.size(tokens(col))


def word_count(col: Column) -> Column:
    """Alphabetic words only (BPE-ish pre-tokenization classes)."""
    return F.size(F.regexp_extract_all(col, F.lit(r"[A-Za-z]+"), 0))


def bpe_ish_token_count(col: Column) -> Column:
    """Count of GPT-style pre-tokenizer matches: runs of letters, runs of
    digits, or single non-alphanumeric non-space chars. A deterministic
    stand-in for a real BPE tokenizer's pre-split."""
    return F.size(
        F.regexp_extract_all(col, F.lit(r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]"), 0)
    )


def punct_ratio(col: Column) -> Column:
    n_punct = F.size(F.regexp_extract_all(col, F.lit(r"[.,!?;:]"), 0))
    return n_punct.cast("double") / F.greatest(F.length(col), F.lit(1)).cast("double")


def stopword_hits(col: Column, lang: str) -> Column:
    markers = F.array(*[F.lit(w) for w in LANG_MARKERS[lang]])
    return F.size(F.filter(tokens(col), lambda t: F.array_contains(markers, t)))


def stopword_ratio(col: Column, lang: str = "en") -> Column:
    return stopword_hits(col, lang).cast("double") / F.greatest(
        token_count(col), F.lit(1)
    ).cast("double")


def langid(col: Column) -> Column:
    """n-gram/marker heuristic language ID: CJK char presence → zh, else
    argmax of per-language stopword hits (ties broken en>es>de>fr),
    'unknown' when no marker hits at all."""
    cjk = F.size(F.regexp_extract_all(col, F.lit(_CJK), 0))
    hits = {lang: stopword_hits(col, lang) for lang in LANG_MARKERS}
    best = (
        F.when(cjk > 0, F.lit("zh"))
        .when(
            (hits["en"] >= hits["es"]) & (hits["en"] >= hits["de"]) & (hits["en"] >= hits["fr"]) & (hits["en"] > 0),
            F.lit("en"),
        )
        .when((hits["es"] >= hits["de"]) & (hits["es"] >= hits["fr"]) & (hits["es"] > 0), F.lit("es"))
        .when((hits["de"] >= hits["fr"]) & (hits["de"] > 0), F.lit("de"))
        .when(hits["fr"] > 0, F.lit("fr"))
        .otherwise(F.lit("unknown"))
    )
    return best


def quality_score(col: Column) -> Column:
    """Composite document quality in [0,1]: length sweet-spot, reasonable
    mean token length, some punctuation, some stopwords. Deterministic
    arithmetic (single divisions — safe to round for oracles)."""
    n_tok = token_count(col).cast("double")
    n_chars = F.length(col).cast("double")
    mean_tok_len = n_chars / F.greatest(n_tok, F.lit(1.0))
    len_ok = F.when((n_tok >= 10) & (n_tok <= 100000), F.lit(1.0)).otherwise(F.lit(0.0))
    tok_ok = F.when((mean_tok_len >= 2.0) & (mean_tok_len <= 12.0), F.lit(1.0)).otherwise(F.lit(0.0))
    punct_ok = F.when(punct_ratio(col) <= 0.2, F.lit(1.0)).otherwise(F.lit(0.0))
    stop_ok = F.when(stopword_ratio(col, "en") >= 0.01, F.lit(1.0)).otherwise(F.lit(0.0))
    return (0.4 * len_ok + 0.2 * tok_ok + 0.2 * punct_ok + 0.2 * stop_ok)


def fingerprint(col: Column) -> Column:
    """Whitespace-normalized md5 content fingerprint — the exact-dedup key.
    Portable across engines (md5 is bit-stable everywhere)."""
    return F.md5(F.lower(F.trim(F.regexp_replace(col, r"\s+", " "))))


def with_text_stats(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Attach the full stat set as columns — one narrow JVM-side map."""
    c = F.col(text_col)
    return (
        df.withColumn("n_tokens", token_count(c))
        .withColumn("n_words", word_count(c))
        .withColumn("n_bpe_tokens", bpe_ish_token_count(c))
        .withColumn("punct_ratio", punct_ratio(c))
        .withColumn("stopword_ratio_en", stopword_ratio(c, "en"))
        .withColumn("lang_pred", langid(c))
        .withColumn("quality", quality_score(c))
        .withColumn("fingerprint", fingerprint(c))
    )


def repetition_stats(col: Column, ngram_n: int = 2) -> dict[str, Column]:
    """Gopher/C4-style repetition signals — the filters that catch boiler-
    plate, keyword-stuffed, and template-generated text before it poisons a
    training mix:

     * ``distinct_token_ratio`` — |distinct tokens| / |tokens| (low ⇒ the
       doc loops over a tiny vocabulary);
     * ``top_token_count`` / ``top_token_frac`` — occurrences of the single
       most frequent token and its share (high ⇒ one token dominates);
     * ``dup_ngram_frac`` — 1 − |distinct n-grams| / |n-grams| (high ⇒ the
       doc repeats whole phrases).

    Pure Catalyst higher-order expressions: counting the max token
    frequency as transform(distinct, t -> size(filter(tokens, = t))) is
    O(|vocab|·|tokens|) per row — right when docs are bounded (the chunked
    4096-char corpus contract); for unbounded docs switch to the
    explode→groupBy form, paying one shuffle. No UDF, no shuffle: all five
    signals ride the same narrow map as `with_text_stats`, so a 100 TB
    quality pass is a single scan.

    Integer counts are exact in both engines; the two ratios are single
    divisions of exact integers — bit-identical, safe to round(6).

    The token array, the sorted-run aggregate and the gram array are all
    let-bound (``let``): referenced directly across the five signal
    expressions, tokenization would re-run per signal AND per gram slice
    (no CSE through lambdafunctions — the r13 O(len²) finding). The five
    signals are built once inside one bound struct; callers project its
    fields.
    """

    def _signals(toks: Column) -> Column:
        n_tok = F.size(toks)
        denom = F.greatest(n_tok, F.lit(1)).cast("double")
        # max token frequency = longest run in the SORTED token array — one
        # O(N) aggregate pass (the naive transform(distinct, count-in-tokens)
        # form is O(|vocab|·N) and measured ~5× slower at sf0.1; lambdas run
        # interpreted, so the constant factor matters).
        top_struct = F.aggregate(
            F.array_sort(toks),
            F.struct(
                F.lit("").alias("prev"), F.lit(0).alias("run"), F.lit(0).alias("best")
            ),
            lambda acc, t: F.struct(
                t.alias("prev"),
                F.when(t == acc["prev"], acc["run"] + 1).otherwise(F.lit(1)).alias("run"),
                F.greatest(
                    acc["best"],
                    F.when(t == acc["prev"], acc["run"] + 1).otherwise(F.lit(1)),
                ).alias("best"),
            ),
        )
        grams = F.transform(
            F.sequence(F.lit(1), F.greatest(n_tok - F.lit(ngram_n - 1), F.lit(1))),
            lambda i: F.concat_ws(" ", F.slice(toks, i, ngram_n)),
        )
        dup_frac = let(
            grams,
            lambda g: F.lit(1.0)
            - F.size(F.array_distinct(g)).cast("double")
            / F.greatest(F.size(g), F.lit(1)).cast("double"),
        )
        return let(
            F.when(n_tok == 0, F.lit(None)).otherwise(top_struct["best"]),
            lambda top_cnt: F.struct(
                n_tok.cast("long").alias("n_tokens"),
                (F.size(F.array_distinct(toks)).cast("double") / denom).alias(
                    "distinct_token_ratio"
                ),
                top_cnt.cast("long").alias("top_token_count"),
                (top_cnt.cast("double") / denom).alias("top_token_frac"),
                dup_frac.alias("dup_ngram_frac"),
            ),
        )

    return {"__rep_struct": let(tokens(col), _signals)}


_REPETITION_FIELDS = (
    "n_tokens",
    "distinct_token_ratio",
    "top_token_count",
    "top_token_frac",
    "dup_ngram_frac",
)


def with_repetition_stats(
    df: DataFrame, text_col: str = "text", ngram_n: int = 2
) -> DataFrame:
    """Attach the repetition signal set — one narrow JVM-side map.

    The struct column materializes in its own projection; the field
    projection stays separate (5 non-cheap references, CollapseProject
    keeps the barrier), so the whole signal set costs ONE tokenization
    per row."""
    s = repetition_stats(F.col(text_col), ngram_n=ngram_n)["__rep_struct"]
    df = df.withColumn("__rep_struct", s)
    for name in _REPETITION_FIELDS:
        df = df.withColumn(name, F.col("__rep_struct")[name])
    return df.drop("__rep_struct")


def rolling_fingerprints(
    col: Column,
    window: int = 8,
    block: int = 4,
    base: int = 257,
    mod: int = 1_000_000_007,
) -> Column:
    """Rolling-hash document fingerprints (Rabin–Karp over ``window``-char
    slices, winnowed to the min hash per ``block`` of consecutive windows —
    the MOSS-style selection that keeps fingerprint counts bounded while
    staying position-robust).

    Exact 64-bit integer arithmetic (base-257 polynomial mod 1e9+7) —
    portable, so the oracle reproduces every fingerprint. Implemented as a
    vectorized Arrow-batched kernel: Spark's higher-order array functions
    run INTERPRETED (no codegen inside lambdas) and a nested
    transform/aggregate formulation measured ~300× slower than numpy here;
    this is the documented "UDF only where builtins genuinely can't"
    exception. Returns ARRAY<BIGINT>, distinct selected fingerprints,
    sorted. Short documents (< window chars) hash what they have (zero-pad
    semantics identical to the SQL oracle).
    """
    import numpy as np
    import pandas as pd
    from pyspark.sql import types as T
    from pyspark.sql.functions import pandas_udf

    def one(text: str) -> list[int]:
        t = text or ""
        codes = np.array([ord(c) for c in t], dtype=np.int64)
        n_win = max(len(codes) - (window - 1), 1)
        if len(codes) < n_win + window - 1:  # short doc: zero-pad
            codes = np.concatenate([codes, np.zeros(n_win + window - 1 - len(codes), dtype=np.int64)])
        h = np.zeros(n_win, dtype=np.int64)
        for j in range(window):
            h = (h * base + codes[j : j + n_win]) % mod
        pad = (-len(h)) % block
        if pad:
            h = np.concatenate([h, np.full(pad, np.iinfo(np.int64).max)])
        sel = h.reshape(-1, block).min(axis=1)
        return sorted(set(int(x) for x in sel))

    # real-class annotations: string hints (future-annotations) resolve in
    # module scope where the local pandas import is invisible
    def fp(texts):
        return texts.map(one)

    fp.__annotations__ = {"texts": pd.Series, "return": pd.Series}
    return pandas_udf(T.ArrayType(T.LongType()))(fp)(col)
