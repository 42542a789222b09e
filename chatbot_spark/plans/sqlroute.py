"""Raw-SQL nearest-neighbor routing onto a registered ANN index —
SURVEY §4 item (a), the last deferred optimizer note (round-9 verdict
item 6).

``retrieve()`` routes declaratively, but a user writing the idiomatic
serving SQL

    SELECT id, l2_dist(embedding, <query-vector>) AS dist
    FROM corpus
    ORDER BY dist [, id]
    LIMIT 10

against a corpus with a REGISTERED index silently got the exact scan.
:func:`routed_sql` is a pre-plan rewriter (string/AST level — no JVM
Catalyst rule needed): it recognizes the distance-order-by-k pattern
over a registered corpus and rewrites it onto
``plans.retrieve._routed_universal`` — the same audited routing path
the declarative API uses, so the slo=1.0 guarantee (full probe ≡ exact
scan, bit-for-bit) carries over unchanged.

Contract:

* SQL that doesn't match the top-k shape, names an unregistered table,
  ranks on a non-indexed column, or selects columns the index can't
  serve, PASSES THROUGH to ``spark.sql`` verbatim — the rewrite only
  ever changes the physical strategy, never the answer, and never
  silently refuses a valid query.
* A metric mismatch on the indexed column (e.g. ``cosine_dist`` over an
  L2 index) RAISES — routing would rank by the wrong metric and a
  silent exact-scan fallback would hide that the index the user paid to
  build is unusable for their query (the refuse-loudly contract).
* ``cosine_dist`` over a COSINE-registered index routes (r10): the
  index stores unit-normalized vectors and reports
  dist = ||u-v||^2/2 = 1-cos — identical ranking; the reported values
  agree with the SQL's 1-dot/(|a||b|) fold up to final-ULP float error
  (round at 6dp when comparing), unlike the l2 path's bit-for-bit
  guarantee whose fold shapes are identical.

:func:`register_sql_distance_functions` installs ``l2_dist`` /
``cosine_dist`` as Spark SQL scalar UDFs (pure Catalyst ``RETURN``
expressions — whole-stage codegen, no Python) with the SAME fold shape
as functions/vector.py, so the un-routed form of the query runs
as-written and bit-matches the routed form at slo=1.0.
"""

from __future__ import annotations

import re
from dataclasses import dataclass

from pyspark.sql import DataFrame

__all__ = [
    "register_corpus_index",
    "unregister_corpus_index",
    "register_sql_distance_functions",
    "routed_sql",
]


@dataclass
class _Registration:
    index_path: str
    metric: str
    id_col: str
    vec_col: str
    recall_slo: float
    # filtered-SQL brute cutover, per registration: None inherits the
    # measured retrieve() default (DEFAULT_FILTER_BRUTE_THRESHOLD); 0
    # pins the index path unconditionally (parity pins that assert the
    # plan read the index layout set this)
    filter_brute_threshold: int | None = None


_REGISTRY: dict[str, _Registration] = {}

_FN_METRIC = {"l2_dist": "l2", "cosine_dist": "cosine", "ip_dist": "inner_product"}


def register_corpus_index(
    table: str,
    index_path: str,
    metric: str = "l2",
    id_col: str = "id",
    vec_col: str = "embedding",
    recall_slo: float = 1.0,
    filter_brute_threshold: int | None = None,
) -> None:
    """Register a written ANN index for a table/view name. Subsequent
    :func:`routed_sql` calls rewrite matching top-k SQL over that name
    onto the index."""
    _REGISTRY[table.lower()] = _Registration(
        index_path=index_path,
        metric=metric,
        id_col=id_col,
        vec_col=vec_col,
        recall_slo=recall_slo,
        filter_brute_threshold=filter_brute_threshold,
    )


def unregister_corpus_index(table: str) -> None:
    _REGISTRY.pop(table.lower(), None)


def register_sql_distance_functions(spark) -> list[str]:
    """SQL scalar UDFs for the serving-distance vocabulary — pure
    Catalyst RETURN expressions (Spark SQL UDFs, no Python), with the
    exact fold shape of functions/vector.py so SQL and DataFrame forms
    agree bit-for-bit."""
    spark.sql(
        """
        CREATE OR REPLACE TEMPORARY FUNCTION l2_dist(
            a ARRAY<FLOAT>, b ARRAY<FLOAT>) RETURNS DOUBLE
        RETURN sqrt(aggregate(
            zip_with(a, b, (x, y) ->
                (CAST(x AS DOUBLE) - CAST(y AS DOUBLE))
                * (CAST(x AS DOUBLE) - CAST(y AS DOUBLE))),
            CAST(0.0 AS DOUBLE), (acc, v) -> acc + v))
        """
    )
    spark.sql(
        """
        CREATE OR REPLACE TEMPORARY FUNCTION cosine_dist(
            a ARRAY<FLOAT>, b ARRAY<FLOAT>) RETURNS DOUBLE
        RETURN 1.0 - aggregate(
                zip_with(a, b, (x, y) -> CAST(x AS DOUBLE) * CAST(y AS DOUBLE)),
                CAST(0.0 AS DOUBLE), (acc, v) -> acc + v)
            / (sqrt(aggregate(
                zip_with(a, a, (x, y) -> CAST(x AS DOUBLE) * CAST(y AS DOUBLE)),
                CAST(0.0 AS DOUBLE), (acc, v) -> acc + v))
             * sqrt(aggregate(
                zip_with(b, b, (x, y) -> CAST(x AS DOUBLE) * CAST(y AS DOUBLE)),
                CAST(0.0 AS DOUBLE), (acc, v) -> acc + v)))
        """
    )
    spark.sql(
        """
        CREATE OR REPLACE TEMPORARY FUNCTION ip_dist(
            a ARRAY<FLOAT>, b ARRAY<FLOAT>) RETURNS DOUBLE
        RETURN -aggregate(
            zip_with(a, b, (x, y) -> CAST(x AS DOUBLE) * CAST(y AS DOUBLE)),
            CAST(0.0 AS DOUBLE), (acc, v) -> acc + v)
        """
    )
    return ["l2_dist", "cosine_dist", "ip_dist"]


_KW = re.compile(r"(select|from|where|order\s+by|limit)\b", re.IGNORECASE)
_TBL = re.compile(r"^[A-Za-z_][\w.]*$")


def _parse_shape(sql: str) -> dict | None:
    """Split the query into top-level clauses paren- and quote-aware —
    a regex with an optional WHERE group would bind the FROM inside a
    scalar subquery in the select list (``l2_dist(e, (SELECT e FROM t
    WHERE id=0)))``) and swallow the rest as WHERE. Returns
    {sel, tbl, where, ob, k} for exactly the shape
    ``SELECT ... FROM <ident> [WHERE ...] ORDER BY ... LIMIT <n>``
    (each clause keyword appearing once at top level, in order), else
    None."""
    s = sql.strip().rstrip(";").strip()
    depth = 0
    in_str: str | None = None
    kws: list[tuple[str, int, int]] = []  # (normalized kw, start, end)
    i = 0
    while i < len(s):
        ch = s[i]
        if in_str is not None:
            if ch == in_str:
                in_str = None
            i += 1
            continue
        if ch in "'\"":
            in_str = ch
            i += 1
            continue
        if ch in "([":
            depth += 1
            i += 1
            continue
        if ch in ")]":
            depth -= 1
            i += 1
            continue
        if (
            depth == 0
            and ch.isalpha()
            and (i == 0 or not (s[i - 1].isalnum() or s[i - 1] == "_"))
        ):
            m = _KW.match(s, i)
            if m:
                kws.append(
                    (re.sub(r"\s+", " ", m.group(1).lower()), m.start(), m.end())
                )
                i = m.end()
                continue
        i += 1
    order = [k for k, _, _ in kws]
    if order not in (
        ["select", "from", "order by", "limit"],
        ["select", "from", "where", "order by", "limit"],
    ):
        return None
    seg = {}
    for idx, (kw, _start, end) in enumerate(kws):
        nxt = kws[idx + 1][1] if idx + 1 < len(kws) else len(s)
        seg[kw] = s[end:nxt].strip()
    if not seg["select"] or not _TBL.match(seg["from"]):
        return None
    if not re.fullmatch(r"\d+", seg["limit"]):
        return None
    return {
        "sel": seg["select"],
        "tbl": seg["from"],
        "where": seg.get("where"),
        "ob": seg["order by"],
        "k": seg["limit"],
    }


def _split_top_level(s: str) -> list[str]:
    """Split on commas not nested in parens/brackets."""
    parts, depth, cur = [], 0, []
    for ch in s:
        if ch in "([":
            depth += 1
        elif ch in ")]":
            depth -= 1
        if ch == "," and depth == 0:
            parts.append("".join(cur).strip())
            cur = []
        else:
            cur.append(ch)
    if cur:
        parts.append("".join(cur).strip())
    return parts


def _find_call(s: str, fnames) -> tuple[str, list[str], tuple[int, int]] | None:
    """First top-level call to any of ``fnames`` in ``s``: returns
    (fn, [arg1, arg2, ...], (start, end)) with args split at the call's
    top-level commas — paren-aware, so array(...)/subquery args work."""
    low = s.lower()
    for fn in fnames:
        i = low.find(fn + "(")
        while i != -1:
            # must be a token boundary
            if i > 0 and (low[i - 1].isalnum() or low[i - 1] == "_"):
                i = low.find(fn + "(", i + 1)
                continue
            j = i + len(fn)
            depth = 0
            for p in range(j, len(s)):
                if s[p] == "(":
                    depth += 1
                elif s[p] == ")":
                    depth -= 1
                    if depth == 0:
                        args = _split_top_level(s[j + 1 : p])
                        return fn, args, (i, p + 1)
            break  # unbalanced — not parseable
    return None


def _strip_alias(item: str) -> tuple[str, str | None]:
    m = re.match(r"^(?P<e>.+?)\s+AS\s+(?P<a>[A-Za-z_]\w*)\s*$", item, re.IGNORECASE | re.DOTALL)
    if m:
        return m.group("e").strip(), m.group("a")
    return item.strip(), None


def _norm(e: str) -> str:
    return re.sub(r"\s+", "", e).lower()


def _bare_col(e: str, table: str) -> str | None:
    """'id' / 't.id' -> 'id'; anything else -> None."""
    m = re.match(r"^(?:(?P<q>[A-Za-z_]\w*)\s*\.\s*)?(?P<c>[A-Za-z_]\w*)$", e.strip())
    if not m:
        return None
    if m.group("q") and m.group("q").lower() != table.lower():
        return None
    return m.group("c")


def routed_sql(
    spark,
    sql: str,
    route: str = "broadcast",
) -> DataFrame:
    """Run ``sql``, rewriting a distance-order-by-k over a registered
    corpus onto its ANN index (see module docstring for the pass-through
    / refuse-loudly contract). The registration's ``recall_slo`` picks
    the probe width — 1.0 (the default) is bit-for-bit the exact scan."""
    from pyspark.sql import functions as F

    from chatbot_spark.plans.retrieve import RetrieveConfig, _routed_universal

    shape = _parse_shape(sql)
    if shape is None:
        return spark.sql(sql)
    reg = _REGISTRY.get(shape["tbl"].lower())
    if reg is None:
        return spark.sql(sql)
    tbl = shape["tbl"]
    k = int(shape["k"])

    # --- select list: id col and ONE distance call, any order ---------
    sel_items = [_strip_alias(it) for it in _split_top_level(shape["sel"])]
    id_alias = dist_alias = None
    dist_expr_norm = None
    dist_call = None
    n_dist_items = 0
    out_cols: list[tuple[str, str]] = []  # (routed col, output name)
    for expr, alias in sel_items:
        col = _bare_col(expr, tbl)
        call = _find_call(expr, _FN_METRIC)
        if col == reg.id_col:
            id_alias = alias or reg.id_col
            out_cols.append(("neighbor_id", id_alias))
        elif col == "document":
            out_cols.append(("document", alias or "document"))
        elif call is not None and _norm(expr) == _norm(
            call[0] + "(" + ",".join(call[1]) + ")"
        ):
            # the whole item IS the distance call (alias already split)
            n_dist_items += 1
            dist_call = call
            dist_alias = alias
            dist_expr_norm = _norm(expr)
            out_cols.append(("dist", alias or "dist"))
        else:
            return spark.sql(sql)  # a column the index can't serve
    if dist_call is None or dist_expr_norm is None:
        return spark.sql(sql)
    if n_dist_items != 1:
        # two distance calls = two DIFFERENT rankings in one select list;
        # routing would serve one call's value for both columns and could
        # validate the ORDER BY against the wrong one — exact scan
        return spark.sql(sql)
    fn, args, _span = dist_call
    if len(args) != 2:
        return spark.sql(sql)

    # --- which arg is the indexed vector column? ----------------------
    cols = [_bare_col(a, tbl) for a in args]
    if cols[0] == reg.vec_col:
        qexpr = args[1]
    elif cols[1] == reg.vec_col:
        qexpr = args[0]
    else:
        return spark.sql(sql)  # ranking on a non-indexed column: exact

    # --- order-by: the distance expr (or its alias), optional id tiebreak
    ob_items = _split_top_level(shape["ob"])
    first = re.sub(r"\s+ASC\s*$", "", ob_items[0].strip(), flags=re.IGNORECASE)
    if re.search(r"\s+DESC\s*$", ob_items[0], re.IGNORECASE):
        return spark.sql(sql)  # farthest-first: not a NN query
    ok_first = _norm(first) == dist_expr_norm or (
        dist_alias is not None and _norm(first) == dist_alias.lower()
    )
    if not ok_first:
        return spark.sql(sql)
    if len(ob_items) > 1:
        if len(ob_items) > 2:
            return spark.sql(sql)
        second = re.sub(r"\s+ASC\s*$", "", ob_items[1].strip(), flags=re.IGNORECASE)
        if re.search(r"\s+DESC\s*$", ob_items[1], re.IGNORECASE):
            return spark.sql(sql)
        sec = _bare_col(second, tbl)
        if sec != reg.id_col and not (id_alias and _norm(second) == id_alias.lower()):
            return spark.sql(sql)
    # (no explicit tiebreak: the routed path's (dist, id) order is one
    # valid instance of the SQL's underdetermined tie order)

    # --- query vector: must be corpus-independent (evaluable alone) ---
    try:
        queries_df = spark.sql(
            f"SELECT 0L AS query_id, ({qexpr}) AS query_embedding"
        )
        queries_df.schema  # force analysis
    except Exception:
        return spark.sql(sql)  # references corpus columns: exact scan

    corpus = spark.table(tbl)

    # --- optional WHERE: a metadata predicate → filtered routed search --
    # (plans/retrieve.py::RetrieveConfig.filter). Routable only when the
    # predicate (a) never touches the ranking distance — a filter ON the
    # distance is a radius query, not this rewrite's shape — and (b)
    # analyzes standalone against the corpus (no subqueries / outer
    # references: those pass through to the exact scan).
    where = shape["where"]
    if where is not None:
        where = where.strip()
        if _find_call(where, _FN_METRIC) is not None or (
            dist_alias is not None
            and re.search(
                rf"\b{re.escape(dist_alias)}\b", where, re.IGNORECASE
            )
        ):
            return spark.sql(sql)
        try:
            corpus.filter(F.expr(where)).schema  # force analysis
        except Exception:
            return spark.sql(sql)

    # --- metric check: refuse loudly on mismatch ----------------------
    # LAST, after every pass-through condition: only a query that WOULD
    # otherwise route gets the refusal — SQL that cannot route for shape
    # reasons (ORDER BY not the distance, corpus-dependent query vector,
    # unroutable WHERE) keeps the verbatim pass-through the module
    # contract promises, whatever its metric.
    if _FN_METRIC[fn] != reg.metric:
        raise ValueError(
            f"routed_sql: {fn} ranks by {_FN_METRIC[fn]!r} but the index "
            f"registered for {tbl!r} is {reg.metric!r} — routing would "
            "return wrong neighbors and an exact-scan fallback would "
            "silently ignore the index; rebuild the index for this "
            "metric or change the query"
        )

    if "document" not in corpus.columns:
        corpus = corpus.withColumn("document", F.lit(None).cast("string"))
    cfg_kwargs = (
        {"filter_brute_threshold": reg.filter_brute_threshold}
        if reg.filter_brute_threshold is not None
        else {}
    )
    cfg = RetrieveConfig(
        mode="universal",
        k=k,
        metric=reg.metric,
        index_path=reg.index_path,
        index_kind="auto",
        index_id_col=reg.id_col,
        index_vec_col=reg.vec_col,
        recall_slo=reg.recall_slo,
        index_route=route,
        filter=where,
        **cfg_kwargs,
    )
    hits = _routed_universal(queries_df, corpus, cfg)
    # honor the SQL's ORDER BY in the OUTPUT rows (a k-row sort): rank
    # is exactly (dist asc, id asc), the query's requested order
    return hits.orderBy(F.col("rank").asc()).select(
        *[F.col(src).alias(name) for src, name in out_cols]
    )
