"""Prefix-Jaccard similarity-join scale point (round-7 verdict item 2):
show the sub-quadratic case the sf0.1 headline could never demonstrate.

The driver testdata's raw documents.text has a ~31-token vocabulary —
every 3-gram shingle is corpus-frequent, so BOTH the naive inverted-index
join and the prefix-filtered join degrade to near-all-pairs there (the
recorded adversarial worst case, still pinned for correctness by
prefix_jaccard_adversarial). Natural text is the opposite regime: Zipf —
a ~5-word stopword head carrying ~half the token mass plus a long rare
tail. There the naive join (operators/dedup.py::ngram_jaccard_pairs,
posting-list self-join on EVERY shared shingle) fans out quadratically on
the frequent all-stopword shingles (Σ df² over ~125 stop-triples ≈
0.06·N²), while the prefix-filtered join
(operators/dedup.py::prefix_jaccard_pairs) joins only on each doc's
rarest |s|−⌈t·|s|⌉+1 shingles — tail shingles with df≈1 — and stays
near-linear. This tool measures exactly that separation.

Corpus: the SAME deterministic Zipf generator the workload queries use
(workload._ZIPF_TEXT_EXPR — BIGINT LCG, 24 tokens/doc, 10% planted
predecessor near-dups at J = 5/6), applied to spark.range(n), at each
requested size. Both joins run on the same cached input; the pair SETS
are asserted equal (count + order-insensitive xxhash64 fold — the prefix
lemma's completeness is exact, this is a bench, not a recall tradeoff)
and must contain all n/10 planted pairs.

Writes BENCH_PREFIXJOIN.json at the repo root; bench.py attaches the
growth factors to the driver payload.

Usage: PYTHONPATH=/root/repo python tools/bench_prefixjoin.py [N ...]
       (default sizes: 10000 20000 40000)
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

T_NUM, T_DEN = 4, 5
SHINGLE_N = 3


def make_corpus(spark, n: int):
    from pyspark.sql import functions as F

    from chatbot_spark.workload import _ZIPF_TEXT_EXPR

    return spark.range(n).select(
        F.col("id").alias("doc_id"), F.expr(_ZIPF_TEXT_EXPR).alias("text")
    ).repartition(32)


def run_one(df, which: str) -> tuple[float, int, int]:
    from pyspark.sql import functions as F

    from chatbot_spark.operators.dedup import (
        ngram_jaccard_pairs,
        prefix_jaccard_pairs,
    )

    best, n_pairs, checksum = None, None, None
    out = None
    for _ in range(2):  # min-of-two, same policy as bench.py
        t0 = time.time()
        # same persist_index setting on BOTH sides — prefix defaults it
        # True, naive False, which made the min-of-two second run warm
        # only for the prefix join (cache-asymmetric timing, r8 ADVICE)
        if which == "naive":
            out = ngram_jaccard_pairs(
                df, "doc_id", "text", shingle_n=SHINGLE_N,
                threshold=T_NUM / T_DEN, persist_index=True,
            ).select("id_a", "id_b")
        else:
            out = prefix_jaccard_pairs(
                df, "doc_id", "text", shingle_n=SHINGLE_N,
                t_num=T_NUM, t_den=T_DEN, persist_index=True,
            ).select("id_a", "id_b")
        n_pairs = out.count()
        t = round(time.time() - t0, 3)
        best = t if best is None else min(best, t)
    # order-insensitive pair-set fingerprint: equal counts alone would let
    # a join that trades a missed pair for a spurious one slip through
    checksum = out.agg(
        F.expr("bit_xor(xxhash64(id_a, id_b))").alias("h")
    ).collect()[0]["h"]
    return best, n_pairs, checksum


def planted_pairs_found(df_pairs_count: int, spark, df, n: int) -> int:
    """Count planted (10k, 10k+1) pairs present in the prefix join."""
    from pyspark.sql import functions as F

    from chatbot_spark.operators.dedup import prefix_jaccard_pairs

    out = prefix_jaccard_pairs(
        df, "doc_id", "text", shingle_n=SHINGLE_N, t_num=T_NUM, t_den=T_DEN
    )
    return out.filter(
        (F.col("id_b") == F.col("id_a") + 1) & (F.col("id_b") % 10 == 1)
    ).count()


def main() -> int:
    from chatbot_spark.session import get_spark

    sizes = [int(a) for a in sys.argv[1:]] or [10_000, 20_000, 40_000]

    spark = get_spark(
        "bench-prefixjoin",
        extra_conf={"spark.ui.showConsoleProgress": "false"},
    )

    results: dict[str, dict] = {}
    for n in sizes:
        # each timed join gets an identically-warm environment: fresh
        # corpus cache, no leftover shingle-index cache from the other
        # join or a previous size (clearCache between runs — r8 ADVICE;
        # the per-join index caches are caller-evicted by contract)
        df = make_corpus(spark, n).persist()
        df.count()
        t_naive, p_naive, h_naive = run_one(df, "naive")
        spark.catalog.clearCache()
        df = make_corpus(spark, n).persist()
        df.count()
        t_prefix, p_prefix, h_prefix = run_one(df, "prefix")
        assert (p_naive, h_naive) == (p_prefix, h_prefix), (
            f"pair sets diverge at n={n}: naive=({p_naive},{h_naive}) "
            f"prefix=({p_prefix},{h_prefix})"
        )
        planted = planted_pairs_found(p_prefix, spark, df, n)
        assert planted == n // 10, (
            f"planted near-dups missing at n={n}: {planted} != {n // 10}"
        )
        results[str(n)] = {
            "naive_sec": t_naive,
            "prefix_sec": t_prefix,
            "n_pairs": p_prefix,
        }
        spark.catalog.clearCache()
        print(f"n={n}: naive {t_naive}s, prefix {t_prefix}s, "
              f"{p_prefix} pairs ({planted} planted)")

    lo, hi = str(sizes[0]), str(sizes[-1])
    scale = sizes[-1] / sizes[0]
    payload = {
        "metric": "prefixjoin_scale",
        "unit": "sec",
        "threshold": f"{T_NUM}/{T_DEN}",
        "shingle_n": SHINGLE_N,
        "sizes": sizes,
        "results": results,
        "data_growth": scale,
        "growth_naive": round(
            results[hi]["naive_sec"] / max(results[lo]["naive_sec"], 1e-9), 2
        ),
        "growth_prefix": round(
            results[hi]["prefix_sec"] / max(results[lo]["prefix_sec"], 1e-9), 2
        ),
        "loadavg": list(os.getloadavg()),
        "note": (
            "Zipf corpus (workload._ZIPF_TEXT_EXPR): naive posting-list "
            "join fans out on frequent stop-triples (~quadratic); "
            "prefix-filtered joins only rarest-prefix shingles "
            "(~linear). Pair sets asserted equal at every size."
        ),
    }
    with open(os.path.join(REPO, "BENCH_PREFIXJOIN.json"), "w") as f:
        json.dump(payload, f, indent=1)
        f.write("\n")
    print(json.dumps({k: payload[k] for k in (
        "sizes", "growth_naive", "growth_prefix")}))
    return 0


if __name__ == "__main__":
    sys.exit(main())
