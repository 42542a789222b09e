"""as-of / range join semantics (operators/joins.py) against hand-computed
expectations — backward match, strict mode, tolerance, no-match NULLs."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F


@pytest.fixture(scope="module")
def trades_quotes(spark):
    trades = spark.createDataFrame(
        [(1, 100, "t1"), (1, 200, "t2"), (2, 50, "t3"), (3, 10, "t4")],
        "sym INT, ts LONG, trade STRING",
    )
    quotes = spark.createDataFrame(
        [(1, 90, 10.0), (1, 100, 11.0), (1, 150, 12.0), (2, 60, 20.0)],
        "sym INT, qts LONG, px DOUBLE",
    )
    return trades, quotes


def _rows(df):
    return {tuple(r) for r in df.collect()}


def test_asof_backward_inclusive(spark, trades_quotes):
    from chatbot_spark.operators.joins import asof_join

    trades, quotes = trades_quotes
    out = asof_join(trades, quotes, on="sym", left_ts="ts", right_ts="qts")
    got = _rows(out.select("trade", "asof_qts", "px"))
    assert got == {
        ("t1", 100, 11.0),  # equal ts matches (inclusive)
        ("t2", 150, 12.0),  # latest prior quote
        ("t3", None, None),  # quote at 60 is AFTER trade at 50
        ("t4", None, None),  # no quotes for sym 3 at all
    }


def test_asof_strict(spark, trades_quotes):
    from chatbot_spark.operators.joins import asof_join

    trades, quotes = trades_quotes
    out = asof_join(trades, quotes, on="sym", left_ts="ts", right_ts="qts", strict=True)
    got = _rows(out.select("trade", "asof_qts", "px"))
    assert got == {
        ("t1", 90, 10.0),  # strict: the equal-ts quote is excluded
        ("t2", 150, 12.0),
        ("t3", None, None),
        ("t4", None, None),
    }


def test_asof_tolerance(spark, trades_quotes):
    from chatbot_spark.operators.joins import asof_join

    trades, quotes = trades_quotes
    out = asof_join(
        trades, quotes, on="sym", left_ts="ts", right_ts="qts",
        tolerance_seconds=20.0,
    )
    got = _rows(out.select("trade", "asof_qts", "px"))
    assert got == {
        ("t1", 100, 11.0),  # gap 0 ≤ 20
        ("t2", None, None),  # gap 50 > 20 → voided
        ("t3", None, None),
        ("t4", None, None),
    }


def test_asof_matches_pandas_merge_asof(spark, sf_dir):
    """Differential check vs pandas on real events data (sf0.001)."""
    import pandas as pd

    from chatbot_spark.io.tables import load_table
    from chatbot_spark.operators.joins import asof_join

    ev = load_table(spark, sf_dir, "events")
    left = ev.filter(F.col("event_type") == "purchase").select("event_id", "user_id", "ts")
    right = ev.filter(F.col("event_type") == "view").select(
        "user_id", F.col("ts").alias("vts"), F.col("event_id").alias("view_id")
    )
    got = (
        asof_join(left, right, on="user_id", left_ts="ts", right_ts="vts",
                  right_cols=["view_id"])
        .select("event_id", "view_id").toPandas()
        .sort_values("event_id").reset_index(drop=True)
    )
    lp = left.toPandas().sort_values("ts")
    rp = right.toPandas().sort_values("vts")
    want = (
        pd.merge_asof(lp, rp, left_on="ts", right_on="vts", by="user_id")
        [["event_id", "view_id"]].sort_values("event_id").reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(got, want, check_dtype=False)


def test_range_join_bands(spark):
    from chatbot_spark.operators.joins import range_join

    facts = spark.createDataFrame(
        [(1, 5.0), (2, 10.0), (3, 25.0), (4, 99.0)], "id INT, v DOUBLE"
    )
    ranges = spark.createDataFrame(
        [("low", 0.0, 10.0), ("mid", 10.0, 50.0)], "band STRING, lo DOUBLE, hi DOUBLE"
    )
    out = _rows(range_join(facts, ranges, "v").select("id", "band"))
    assert out == {(1, "low"), (2, "mid"), (3, "mid"), (4, None)}  # hi exclusive


def test_salted_agg_equals_plain_groupby(spark, sf_dir):
    from pyspark.sql import functions as F

    from chatbot_spark.operators.skew import salted_agg

    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    plain = {
        r["event_type"]: (r["n"], r["mx"])
        for r in ev.groupBy("event_type")
        .agg(F.count("*").alias("n"), F.max("user_id").alias("mx"))
        .collect()
    }
    salted = {
        r["event_type"]: (r["n"], r["mx"])
        for r in salted_agg(
            ev,
            key_cols=["event_type"],
            salt_source=F.col("user_id"),
            aggs={"n": ("sum", F.count("*")), "mx": ("max", F.max("user_id"))},
            n_salts=8,
        ).collect()
    }
    assert salted == plain


def test_upsert_latest_tie_breaks_toward_updates(spark):
    from chatbot_spark.io.tables import upsert_latest

    base = spark.createDataFrame(
        [(1, 1, "old"), (2, 5, "keep")], "id LONG, version LONG, text STRING"
    )
    updates = spark.createDataFrame(
        [(1, 1, "new-same-version"), (3, 1, "insert")], "id LONG, version LONG, text STRING"
    )
    got = {r["id"]: r["text"] for r in upsert_latest(base, updates).collect()}
    # same version on id=1 → updates side wins (replace-on-conflict)
    assert got == {1: "new-same-version", 2: "keep", 3: "insert"}


def test_tfidf_topk_known_scores(spark):
    from chatbot_spark.operators.lexical import tfidf_topk

    corpus = spark.createDataFrame(
        [(0, "apple banana"), (1, "apple apple cherry"), (2, "durian")],
        "doc_id LONG, text STRING",
    )
    q = spark.createDataFrame([(100, "apple")], "query_id LONG, query_text STRING")
    rows = sorted(tfidf_topk(q, corpus, k=3).collect(), key=lambda r: r["rank"])
    # df(apple)=2, N=3 → doc1: tf=2 → 2*3/2=3.0; doc0: tf=1 → 1.5; doc2 absent
    assert [(r["neighbor_id"], r["score"]) for r in rows] == [(1, 3.0), (0, 1.5)]


def test_bm25_topk_hand_computed(spark):
    from chatbot_spark.operators.lexical import bm25_topk

    corpus = spark.createDataFrame(
        [(0, "apple banana"), (1, "apple apple cherry"), (2, "durian")],
        "doc_id LONG, text STRING",
    )
    q = spark.createDataFrame([(100, "apple")], "query_id LONG, query_text STRING")
    rows = sorted(
        bm25_topk(q, corpus, k=3, idf_mode="rational").collect(),
        key=lambda r: r["rank"],
    )
    # N=3, df(apple)=2 → idf = (3-2+0.5)/(2+0.5) = 0.6
    # dl: doc0=2, doc1=3, doc2=1; avgdl = 6/3 = 2.0
    # doc1: tf=2 → 0.6 * 2*2.2 / (2 + 1.2*(0.25 + 0.75*3/2)) = 2.64/3.65
    # doc0: tf=1 → 0.6 * 2.2 / (1 + 1.2*(0.25 + 0.75*2/2)) = 1.32/2.2 = 0.6
    exp1 = 0.6 * (2 * 2.2) / (2 + 1.2 * (0.25 + 0.75 * 3 / 2.0))
    exp0 = 0.6 * (1 * 2.2) / (1 + 1.2 * (0.25 + 0.75 * 2 / 2.0))
    got = [(r["neighbor_id"], r["score"]) for r in rows]
    assert got[0][0] == 1 and abs(got[0][1] - exp1) < 1e-12
    assert got[1][0] == 0 and abs(got[1][1] - exp0) < 1e-12


def test_bm25_length_normalization_prefers_shorter_doc(spark):
    # same tf, different doc lengths → shorter doc scores higher (the
    # property TF-IDF lacks and BM25's b-term adds)
    from chatbot_spark.operators.lexical import bm25_topk

    corpus = spark.createDataFrame(
        [(0, "apple x y z w v u t s r"), (1, "apple b")],
        "doc_id LONG, text STRING",
    )
    q = spark.createDataFrame([(0, "apple")], "query_id LONG, query_text STRING")
    rows = {r["neighbor_id"]: r["score"] for r in bm25_topk(q, corpus, k=2).collect()}
    assert rows[1] > rows[0]


def test_bm25_lucene_and_rational_agree_on_ranking(spark):
    from chatbot_spark.operators.lexical import bm25_topk
    from chatbot_spark.io.tables import load_table
    from pyspark.sql import functions as F

    docs = load_table(spark, "/root/testdata/sf0.001", "documents").filter(
        F.col("doc_id") < 60
    )
    q = docs.filter(F.col("doc_id") < 2).select(
        F.col("doc_id").alias("query_id"), F.col("text").alias("query_text")
    )
    a = bm25_topk(q, docs, k=5, idf_mode="lucene").collect()
    b = bm25_topk(q, docs, k=5, idf_mode="rational").collect()
    # both idfs are monotone-decreasing in df, so the per-query top-5 SETS
    # agree (scores differ; ordering may differ only among near-ties)
    seta = {(r["query_id"], r["neighbor_id"]) for r in a}
    setb = {(r["query_id"], r["neighbor_id"]) for r in b}
    overlap = len(seta & setb) / max(len(seta), 1)
    assert overlap >= 0.8


def test_scd2_intervals_collapse_noop_updates(spark):
    from chatbot_spark.operators.scd import scd2_intervals

    feed = spark.createDataFrame(
        [
            (1, "a", 100, 1),
            (1, "a", 200, 2),   # no-op: same attr — must NOT open a version
            (1, "b", 300, 3),
            (1, "a", 400, 4),   # back to a — a NEW version (not merged with the first)
            (2, "x", 150, 5),
        ],
        "user_id LONG, event_type STRING, ts LONG, event_id LONG",
    )
    rows = sorted(
        scd2_intervals(feed, ts_col="ts", tiebreak_col="event_id").collect(),
        key=lambda r: (r["user_id"], r["valid_from"]),
    )
    got = [(r["user_id"], r["event_type"], r["valid_from"], r["valid_to"]) for r in rows]
    assert got == [
        (1, "a", 100, 300),
        (1, "b", 300, 400),
        (1, "a", 400, None),
        (2, "x", 150, None),
    ]


def test_scd2_single_exchange_plan(spark):
    """Both window passes share one (key, order) partitioning — the plan
    must contain exactly one Exchange."""
    from chatbot_spark.operators.scd import scd2_intervals
    from chatbot_spark.io.tables import load_table

    ev = load_table(spark, "/root/testdata/sf0.001", "events")
    iv = scd2_intervals(ev, ts_col="ts", tiebreak_col="event_id")
    plan = iv._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Exchange") == 1


def test_asof_forward_inclusive(spark, trades_quotes):
    from chatbot_spark.operators.joins import asof_join

    trades, quotes = trades_quotes
    out = asof_join(
        trades, quotes, on="sym", left_ts="ts", right_ts="qts", direction="forward"
    )
    got = _rows(out.select("trade", "asof_qts", "px"))
    assert got == {
        ("t1", 100, 11.0),  # equal ts matches (inclusive)
        ("t2", None, None),  # no quote at/after 200
        ("t3", 60, 20.0),   # next quote after the trade
        ("t4", None, None),
    }


def test_asof_forward_matches_pandas(spark):
    import pandas as pd
    from chatbot_spark.io.tables import load_table
    from chatbot_spark.operators.joins import asof_join

    ev = load_table(spark, "/root/testdata/sf0.001", "events")
    left = ev.filter(F.col("event_type") == "click").select("event_id", "user_id", "ts")
    right = ev.filter(F.col("event_type") == "purchase").select(
        "user_id", F.col("ts").alias("pts"), F.col("event_id").alias("purchase_id")
    )
    got = (
        asof_join(left, right, on="user_id", left_ts="ts", right_ts="pts",
                  right_cols=["purchase_id"], direction="forward")
        .select("event_id", "purchase_id").toPandas()
        .sort_values("event_id").reset_index(drop=True)
    )
    lp = left.toPandas().sort_values("ts")
    rp = right.toPandas().sort_values("pts")
    want = (
        pd.merge_asof(lp, rp, left_on="ts", right_on="pts", by="user_id",
                      direction="forward")
        [["event_id", "purchase_id"]].sort_values("event_id").reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(got, want, check_dtype=False)


def test_lexical_construction_is_lazy(spark):
    """Building the tfidf/bm25 DataFrames must trigger NO Spark job —
    corpus stats (N, avgdl) are folded in via broadcast crossJoin, not
    eager driver collects (VERDICT r2 "What's wrong" #3)."""
    from chatbot_spark.operators.lexical import bm25_topk, tfidf_topk

    corpus = spark.createDataFrame(
        [(0, "apple banana"), (1, "apple apple cherry")], "doc_id LONG, text STRING"
    )
    q = spark.createDataFrame([(100, "apple")], "query_id LONG, query_text STRING")
    tracker = spark.sparkContext.statusTracker()
    before = len(tracker.getJobIdsForGroup(None))
    tfidf_topk(q, corpus, k=3)
    bm25_topk(q, corpus, k=3)
    assert len(tracker.getJobIdsForGroup(None)) == before


def test_merge_into_all_clauses(spark):
    """MERGE semantics matrix: matched-update (gated), matched-delete,
    not-matched-insert, target-only passthrough — plus the Delta
    cardinality-violation rejection for ambiguous sources."""
    import pytest
    from pyspark.sql import functions as F

    from chatbot_spark.io.tables import merge_into

    base = spark.createDataFrame(
        [(1, "a", 10), (2, "b", 20), (3, "c", 30), (4, "d", 40)],
        "id LONG, val STRING, score LONG",
    )
    src = spark.createDataFrame(
        [(2, "B", "U"), (3, None, "D"), (5, "e", "I"), (4, "DD", "U")],
        "id LONG, val STRING, action STRING",
    )
    merged = merge_into(
        base,
        src,
        on=["id"],
        when_matched_update={"val": F.col("s.val")},
        when_matched_delete=F.col("s.action") == "D",
        # gate: only update rows whose score is < 35 -> id 4 keeps 'd'
        update_condition=F.col("t.score") < 35,
        when_not_matched_insert={"val": F.col("s.val"), "score": F.lit(0)},
    )
    got = {r.id: (r.val, r.score) for r in merged.collect()}
    assert got == {
        1: ("a", 10),   # target-only: untouched
        2: ("B", 20),   # matched + gate passes: updated, score kept
        4: ("d", 40),   # matched but gate fails: unchanged
        5: ("e", 0),    # source-only: inserted with explicit map
    }  # 3 deleted
    dup_src = src.unionByName(
        spark.createDataFrame([(2, "B2", "U")], "id LONG, val STRING, action STRING")
    )
    with pytest.raises(ValueError, match="cardinality"):
        merge_into(base, dup_src, on=["id"])


def test_merge_into_default_insert_is_source_row(spark):
    from pyspark.sql import functions as F

    from chatbot_spark.io.tables import merge_into

    base = spark.createDataFrame([(1, "a")], "id LONG, val STRING")
    src = spark.createDataFrame([(9, "z")], "id LONG, val STRING")
    got = {r.id: r.val for r in merge_into(base, src, on=["id"]).collect()}
    assert got == {1: "a", 9: "z"}


def test_collect_table_stats_native_order_and_nulls(spark):
    """min/max must use NATIVE column order (numerics not lexicographic)
    and null accounting must be exact; approx mode stays within the HLL
    band."""
    from pyspark.sql import functions as F

    from chatbot_spark.io.tables import collect_table_stats

    df = spark.createDataFrame(
        [(9, "b"), (10, None), (100, "a"), (None, "a")],
        "n LONG, s STRING",
    )
    stats = {r.column_name: r for r in collect_table_stats(df, ndv_mode="exact").collect()}
    n = stats["n"]
    assert (n.n_rows, n.n_nulls, n.n_distinct) == (4, 1, 3)
    assert (n.min_value, n.max_value) == ("9", "100")  # native, not "10"/"9"
    s = stats["s"]
    assert (s.n_nulls, s.n_distinct, s.min_value, s.max_value) == (1, 2, "a", "b")
    approx = {r.column_name: r.n_distinct for r in collect_table_stats(df).collect()}
    assert abs(approx["n"] - 3) <= 1


def test_merge_into_null_semantics(spark):
    """Review regressions: (a) a NULL delete-condition means the clause
    does NOT fire (SQL 3VL) — the row must survive; (b) NULL join keys
    match under eqNullSafe, so a null-key pair is MATCHED (update path),
    not a source-only insert."""
    from pyspark.sql import functions as F

    from chatbot_spark.io.tables import merge_into

    base = spark.createDataFrame(
        [(1, "a"), (None, "old")], "id LONG, val STRING"
    )
    src = spark.createDataFrame(
        [(1, "A", None), (None, "new", "U")], "id LONG, val STRING, action STRING"
    )
    merged = merge_into(
        base,
        src,
        on=["id"],
        when_matched_update={"val": F.col("s.val")},
        # action NULL for id=1 -> UNKNOWN -> must NOT delete
        when_matched_delete=F.col("s.action") == "D",
    )
    got = {r.id: r.val for r in merged.collect()}
    assert got == {1: "A", None: "new"}  # both matched-updated; none deleted/duplicated
    assert merged.count() == 2


def test_zorder_value_fractional_range_columns(spark):
    """Review regression: a DOUBLE column spanning [0, 1) must still
    spread across the full bit range (the old integer-truncating
    normalization collapsed it to 0, dropping the dimension)."""
    from pyspark.sql import functions as F

    from chatbot_spark.operators.zorder import zorder_value

    df = spark.range(256).select(
        (F.col("id") / 256.0).alias("x"), F.col("id").alias("y")
    )
    z = zorder_value(df, ["x", "y"], bits=8)
    # x == y/256 for every row, so both dims normalize identically and
    # the interleave of equal dims duplicates bit pairs: z = 3 * morton
    # spread check: distinct z count equals row count (no collapse)
    assert z.select("zval").distinct().count() == 256
    # and a thin x slab maps to a small z range, not everything
    lo = z.filter(F.col("x") < 0.05).agg(F.max("zval")).first()[0]
    hi = z.filter(F.col("x") > 0.95).agg(F.min("zval")).first()[0]
    assert lo < hi


def test_zorder_value_nontrivial_column_names(spark):
    """Round-5 ADVICE: names needing quoting (space, dot, hyphen, SQL
    keyword) must work — no raw identifier reaches an expr string. Same
    data as a clean-named twin ⇒ identical z values."""
    from pyspark.sql import functions as F

    from chatbot_spark.operators.zorder import zorder_value

    clean = spark.range(64).select(
        F.col("id").alias("x"), (F.col("id") * 7 % 64).alias("y")
    )
    weird = clean.select(
        F.col("x").alias("my col.a-b"), F.col("y").alias("select")
    )
    zc = [r.zval for r in zorder_value(clean, ["x", "y"], bits=6).orderBy("x").collect()]
    zw = [
        r.zval
        for r in zorder_value(weird, ["my col.a-b", "select"], bits=6)
        .orderBy(F.col("`my col.a-b`"))
        .collect()
    ]
    assert zc == zw


def test_apply_cdc_semantics_matrix(spark):
    """Hand-checked CDC classes incl. the same-seq tie (delete wins) and
    the phantom insert+delete of a never-existing key."""
    from chatbot_spark.io.tables import apply_cdc

    base = spark.createDataFrame(
        [(1, "a"), (2, "b"), (3, "c")], "id LONG, val STRING"
    )
    changes = spark.createDataFrame(
        [
            (1, "a1", 1, "U"), (1, "a2", 2, "U"),     # last update wins
            (2, None, 1, "D"), (2, "b2", 2, "U"),     # resurrected
            (3, "c1", 5, "U"), (3, None, 5, "D"),     # tie -> delete wins
            (9, "new", 1, "I"),                        # fresh insert
            (8, "ph", 1, "I"), (8, None, 2, "D"),     # phantom
        ],
        "id LONG, val STRING, seq LONG, op STRING",
    )
    got = {r.id: r.val for r in apply_cdc(base, changes, ["id"], "seq").collect()}
    assert got == {1: "a2", 2: "b2", 9: "new"}


def test_apply_cdc_random_feed_matches_reference_model(spark):
    """Differential test: 400 random ops over 60 keys applied by the
    Spark operator must equal a sequential dict-model replay (last op
    per key wins; same-seq ties prefer delete, matching the operator's
    documented order). Seeded — failures reproduce."""
    import random

    from chatbot_spark.io.tables import apply_cdc

    rng = random.Random(1234)
    base_rows = [(k, f"b{k}") for k in range(30)]
    ops = []
    for seq in range(1, 401):
        k = rng.randrange(60)
        op = rng.choice(["U", "U", "I", "D"])
        ops.append((k, f"v{seq}" if op != "D" else None, seq, op))
    # reference: compact to last op per key (ties impossible — seq unique)
    final = {}
    for k, v, seq, op in ops:
        final[k] = (seq, op, v)
    model = {k: v for k, v in dict(base_rows).items()}
    for k, (seq, op, v) in final.items():
        if op == "D":
            model.pop(k, None)
        else:
            model[k] = v
    base = spark.createDataFrame(base_rows, "id LONG, val STRING")
    changes = spark.createDataFrame(ops, "id LONG, val STRING, seq LONG, op STRING")
    got = {r.id: r.val for r in apply_cdc(base, changes, ["id"], "seq").collect()}
    assert got == model


def test_merge_into_insert_condition(spark):
    """WHEN NOT MATCHED AND <cond> THEN INSERT: failing (and NULL)
    conditions drop the source-only row instead of inserting it."""
    from pyspark.sql import functions as F

    from chatbot_spark.io.tables import merge_into

    base = spark.createDataFrame([(1, "a")], "id LONG, val STRING")
    src = spark.createDataFrame(
        [(2, "yes", 1), (3, "no", 0), (4, "nul", None)],
        "id LONG, val STRING, ok INT",
    )
    got = {
        r.id: r.val
        for r in merge_into(
            base, src, on=["id"], insert_condition=F.col("s.ok") == 1
        ).collect()
    }
    assert got == {1: "a", 2: "yes"}
