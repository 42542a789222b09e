"""Per-entry bench diff vs a committed baseline — the drift adjudicator.

Round 6 taught that a committed bench artifact can read uniformly ~10%
slow purely from host load during the refresh (BENCH_r06 165 s vs the
quiet-host 149.6 s for the same code). This tool separates that from a
real regression mechanically:

- UNIFORM inflation across entries + a high recorded loadavg → host
  drift; re-run solo, don't touch code.
- ISOLATED entries above the threshold with quiet loadavg → a real
  regression; investigate those queries.

Usage:
  PYTHONPATH=/root/repo python tools/bench_diff.py [current] [baseline] [pct]

current   defaults to BENCH_FULL.json
baseline  defaults to `git show <ref>:BENCH_FULL.json` with ref from
          BENCH_BASELINE_REF (default HEAD) — pass a file path or a
          git ref ending in :<path>
pct       flag threshold, default 30 (percent)

Prints one JSON line: {n_common, total_cur, total_base, uniform_ratio,
loadavg_cur, flagged: {query: [base, cur, pct]}, verdict}.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys


def _load(spec: str) -> dict:
    if os.path.exists(spec):
        with open(spec) as f:
            return json.load(f)
    # treat as git ref:path
    out = subprocess.run(
        ["git", "show", spec], capture_output=True, text=True, check=True,
        cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    )
    return json.loads(out.stdout)


def main() -> int:
    cur_spec = sys.argv[1] if len(sys.argv) > 1 else "BENCH_FULL.json"
    base_spec = (
        sys.argv[2]
        if len(sys.argv) > 2
        else os.environ.get("BENCH_BASELINE_REF", "HEAD") + ":BENCH_FULL.json"
    )
    pct = float(sys.argv[3]) if len(sys.argv) > 3 else 30.0
    cur, base = _load(cur_spec), _load(base_spec)
    qc, qb = cur.get("queries", {}), base.get("queries", {})
    common = sorted(set(qc) & set(qb))
    ratios = [qc[q] / qb[q] for q in common if qb[q] > 0.05]
    uniform = round(sorted(ratios)[len(ratios) // 2], 3) if ratios else None
    flagged = {
        q: [qb[q], qc[q], round(100.0 * (qc[q] - qb[q]) / qb[q], 1)]
        for q in common
        if qb[q] > 0.2 and qc[q] > qb[q] * (1 + pct / 100.0)
    }
    la = (cur.get("loadavg") or {})
    busy = any(v is not None and v > 3.0 for v in la.values())
    # bench.py stamps canonical=false on loaded-host runs (start loadavg
    # > 2); a non-canonical CURRENT artifact can never mint a verdict
    # other than "re-run solo" — that is the r7 lesson mechanized
    canonical_cur = cur.get("canonical")
    if canonical_cur is False:
        verdict = "non-canonical current artifact: re-run on a quiet host"
    elif not flagged:
        verdict = "clean"
    elif busy or (uniform is not None and uniform > 1 + pct / 200.0):
        verdict = "host-drift-suspect: re-run solo before changing code"
    else:
        verdict = "isolated-regressions: investigate flagged queries"
    print(
        json.dumps(
            {
                "n_common": len(common),
                "total_cur": cur.get("value"),
                "total_base": base.get("value"),
                "uniform_ratio_median": uniform,
                "loadavg_cur": la,
                "canonical_cur": canonical_cur,
                "canonical_base": base.get("canonical"),
                "flagged": flagged,
                "verdict": verdict,
            },
            separators=(",", ":"),
        )
    )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
