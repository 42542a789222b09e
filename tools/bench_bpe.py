"""BPE training per-round cost flatness (round-8 verdict item 4): with
incremental pair maintenance + bounded lineage, the marginal cost of a
merge round must be FLAT in the round number — the pre-r9 form chained
one replace per round with no checkpoint (expression-tree depth grows
with rounds: driver/codegen blowup at production 32k-merge vocabs) and
re-exploded the WHOLE vocabulary's pairs every round.

Method: one deterministic synthetic vocabulary (LCG words — no RNG deps);
train_bpe from scratch at n_merges = 50, 100, 200 and compare MARGINAL
per-round cost between consecutive spans: marginal(100→200) /
marginal(50→100) ≈ 1 means flat (a lineage- or recount-driven cost grows
with the round number, pushing the ratio well above 1; the old form's
total was superlinear by construction).

Writes BENCH_BPE.json at the repo root; bench.py attaches it as
``bpe_scale``.

Usage: PYTHONPATH=/root/repo python tools/bench_bpe.py [n_words]
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

MERGE_POINTS = (50, 100, 200)


def make_words(n: int) -> dict[str, int]:
    """Deterministic vocabulary: LCG letters, lengths 3-12 over 8 letters,
    counts 1-9."""
    words: dict[str, int] = {}
    state = 12345
    letters = "abcdefgh"

    def nxt(mod: int) -> int:
        nonlocal state
        state = (state * 6364136223846793005 + 1442695040888963407) % (1 << 63)
        return (state >> 17) % mod

    while len(words) < n:
        w = "".join(letters[nxt(8)] for _ in range(3 + nxt(10)))
        words.setdefault(w, 1 + nxt(9))
    return words


def main() -> int:
    from chatbot_spark.session import get_spark

    n_words = int(sys.argv[1]) if len(sys.argv) > 1 else 5000
    spark = get_spark(
        "bench-bpe", extra_conf={"spark.ui.showConsoleProgress": "false"}
    )
    from chatbot_spark.operators.bpe import train_bpe

    words = make_words(n_words)
    docs = spark.createDataFrame(
        [(w + " ") * c for w, c in words.items()], "string"
    ).toDF("text").repartition(8).persist()
    docs.count()

    totals: dict[int, float] = {}
    merge_counts: dict[int, int] = {}
    for n in MERGE_POINTS:
        t0 = time.time()
        merges, _ = train_bpe(docs, n_merges=n, checkpoint_every=64)
        totals[n] = round(time.time() - t0, 2)
        merge_counts[n] = len(merges)
        print(f"n_merges={n}: {totals[n]}s ({len(merges)} merges learned)")
    docs.unpersist()

    # --- production-vocab point (r9 verdict item 1): >= 2k merges via
    # the greedy-equivalent batched trainer — pins (a) wall-clock for a
    # merge count one decade past the serial evidence, (b) the realized
    # batch factor (merges per driver round), (c) marginal flatness
    # between the first and second 1000 merges.
    from chatbot_spark.operators.bpe import train_bpe_batched

    batched: dict[str, object] = {}
    for n in (1000, 2000):
        st: dict = {}
        t0 = time.time()
        m, _ = train_bpe_batched(
            docs, n_merges=n, batch_size=64, checkpoint_every=64, stats=st
        )
        batched[str(n)] = {
            "sec": round(time.time() - t0, 2),
            "merges_learned": len(m),
            "driver_rounds": st.get("rounds"),
            "batch_factor": round(len(m) / max(st.get("rounds", 1), 1), 2),
        }
        print(f"batched n_merges={n}: {batched[str(n)]}")

    m_lo = (totals[100] - totals[50]) / 50  # marginal sec/round, rounds 51-100
    m_hi = (totals[200] - totals[100]) / 100  # rounds 101-200
    b1, b2 = batched["1000"], batched["2000"]
    payload = {
        "metric": "bpe_round_flatness",
        "unit": "sec",
        "n_words": n_words,
        "merge_points": list(MERGE_POINTS),
        "total_sec": {str(k): v for k, v in totals.items()},
        "merges_learned": {str(k): v for k, v in merge_counts.items()},
        "marginal_sec_per_round_51_100": round(m_lo, 4),
        "marginal_sec_per_round_101_200": round(m_hi, 4),
        "late_vs_early_marginal_ratio": round(m_hi / max(m_lo, 1e-9), 2),
        "batched": batched,
        "batched_marginal_sec_per_merge_0_1000": round(b1["sec"] / 1000, 4),
        "batched_marginal_sec_per_merge_1000_2000": round(
            (b2["sec"] - b1["sec"]) / 1000, 4
        ),
        "batched_vs_serial_extrapolation": round(
            (m_hi * 2000) / max(b2["sec"], 1e-9), 2
        ),
        "loadavg": list(os.getloadavg()),
        "note": (
            "incremental pair maintenance + lineage caps: marginal "
            "per-round cost must not grow with the round number "
            "(ratio ~1 = flat; lineage/recount growth pushes it >>1)"
        ),
    }
    with open(os.path.join(REPO, "BENCH_BPE.json"), "w") as f:
        json.dump(payload, f, indent=1)
        f.write("\n")
    print(json.dumps({k: payload[k] for k in (
        "total_sec", "marginal_sec_per_round_51_100",
        "marginal_sec_per_round_101_200", "late_vs_early_marginal_ratio")}))
    return 0


if __name__ == "__main__":
    sys.exit(main())
