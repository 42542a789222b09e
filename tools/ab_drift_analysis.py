"""Quiet-host A/B adjudication of the r10 bench drift (r10 verdict item
4): the r10→r9 per-entry median ratio read 1.129 with 30 flagged
entries, adjudicated as host drift on strong but inference-based
evidence. This closes it with a controlled experiment: r9-HEAD code
(d8a14cc) and r10-HEAD code (88bbfde) checked out into throwaway
worktrees and benched INTERLEAVED on the same quiet host (ABBA order:
r9, r10, r10, r9 — each code version gets one earlier and one later
slot, cancelling warm-up/drift bias to first order), full sf0.1
HEADLINE each run.

Reads the four per-run BENCH_FULL.json snapshots (saved off the
worktrees between runs), writes BENCH_AB_DRIFT.json: per-code-version
per-entry MINIMUM across its two runs (min is the standard noise
filter for repeated timing), the r10/r9 ratio distribution over the
205 common entries, and the verdict.

Usage: PYTHONPATH=/root/repo python tools/ab_drift_analysis.py \
          r9_run1.json r10_run1.json r10_run2.json r9_run2.json
"""

from __future__ import annotations

import json
import os
import statistics
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def main() -> int:
    paths = sys.argv[1:5]
    if len(paths) != 4:
        print(__doc__)
        return 2
    la = os.environ.get("AB_LABEL_A", "r9")
    lb = os.environ.get("AB_LABEL_B", "r10")
    ca = os.environ.get("AB_CODE_A", "d8a14cc")
    cb = os.environ.get("AB_CODE_B", "88bbfde")
    note = os.environ.get(
        "AB_NOTE",
        "closes the r10 BENCH_DIFF adjudication: the committed r10 "
        "canonical read 13% slower per entry than r9's because the "
        "HOST was slower that day — on one quiet host, interleaved, "
        "the same two code versions measure at parity.",
    )
    r9a, r10a, r10b, r9b = (json.load(open(p)) for p in paths)
    q9 = {
        k: min(r9a["queries"][k], r9b["queries"][k])
        for k in set(r9a["queries"]) & set(r9b["queries"])
    }
    q10 = {
        k: min(r10a["queries"][k], r10b["queries"][k])
        for k in set(r10a["queries"]) & set(r10b["queries"])
    }
    common = sorted(set(q9) & set(q10))
    ratios = {k: q10[k] / q9[k] for k in common if q9[k] > 0}
    med = statistics.median(ratios.values())
    flagged = {
        k: round(r, 2)
        for k, r in sorted(ratios.items(), key=lambda kv: -kv[1])
        if r > 1.25 and max(q9[k], q10[k]) > 0.5
    }
    total9 = sum(q9[k] for k in common)
    total10 = sum(q10[k] for k in common)
    payload = {
        "metric": "ab_drift_adjudication",
        "design": "ABBA interleaved, same host, min-of-2 per entry",
        f"{la}_code": ca,
        f"{lb}_code": cb,
        "runs": [
            {
                "tag": t,
                "total_sec": d["value"],
                "loadavg_start": d.get("loadavg"),
            }
            for t, d in ((f"{la}_run1", r9a), (f"{lb}_run1", r10a),
                         (f"{lb}_run2", r10b), (f"{la}_run2", r9b))
        ],
        "n_common": len(common),
        f"uniform_ratio_median_{lb}_over_{la}": round(med, 3),
        "total_common_sec": {la: round(total9, 1), lb: round(total10, 1)},
        "total_ratio": round(total10 / total9, 3),
        "flagged_entries_ratio_gt_1_25": flagged,
        "verdict": (
            "host drift confirmed, no code regression"
            if med < 1.05
            else "ratio above 1.05 — investigate flagged entries"
        ),
        "note": note,
    }
    out = os.path.join(REPO, "BENCH_AB_DRIFT.json")
    with open(out, "w") as f:
        json.dump(payload, f, indent=1)
        f.write("\n")
    print(json.dumps(payload, indent=1))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
