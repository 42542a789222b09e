"""32M-edge triangle audit (r10 verdict item 5): the r10 BENCH_GRAPH
triangle point read 97.8 s at 32M edges vs 8.66 s at 8M — 11× wall for
4× edges, outrunning the O(m^1.5) orientation bound (~8×), and on THIS
generator (constant degree ≤ ~8: ring + even chords + scramble) the
wedge count is O(m), so the honest expectation is ~4×. Two suspects:
(a) the r10 run coincided with documented host drift, (b) spill — the
suite runs every scale at shuffle_partitions = cpus, so 32M-edge joins
push ~4× the per-partition bytes of the 8M point through the same 32
reducers inside one shared 8g local JVM.

Method: rerun the 8M and 32M triangle points alone on a quiet host with
the Spark event log enabled, at the suite's default partitioning AND at
4× partitions; parse the event log for per-stage spill (memory/disk
bytes) and task-time skew (max/median). Verdict rules:
 * 32M/8M wall ratio ≈ 4 at default → r10's 11× was host drift;
 * large spill bytes at default that vanish at 4× partitions with the
   ratio collapsing → partition sizing, fix the suite/plan;
 * neither → record the anomaly honestly for the next round.

Writes BENCH_GRAPH_TRI32_AUDIT.json.

Usage: PYTHONPATH=/root/repo python tools/audit_triangle32m.py
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _event_lines(log_dir: str):
    """Yield event-log JSON lines. Spark 4 writes a rolling DIRECTORY
    per application (eventlog_v2_<app>/events_1_... files) — handle both
    that and the classic single-file layout."""
    newest = sorted(
        (os.path.join(log_dir, f) for f in os.listdir(log_dir)),
        key=os.path.getmtime,
    )[-1]
    files = (
        sorted(
            os.path.join(newest, f)
            for f in os.listdir(newest)
            if f.startswith("events_")
        )
        if os.path.isdir(newest)
        else [newest]
    )
    for path in files:
        with open(path) as f:
            yield from f


def parse_event_log(log_dir: str) -> dict:
    """Sum task spill/GC and per-stage skew from the newest event log."""
    stages: dict[int, dict] = {}
    tot = {"mem_spill": 0, "disk_spill": 0, "gc_ms": 0, "tasks": 0}
    for line in _event_lines(log_dir):
            try:
                ev = json.loads(line)
            except ValueError:
                continue
            if ev.get("Event") != "SparkListenerTaskEnd":
                continue
            m = ev.get("Task Metrics") or {}
            sid = ev.get("Stage ID", -1)
            st = stages.setdefault(
                sid, {"times": [], "mem_spill": 0, "disk_spill": 0}
            )
            rt = (ev.get("Task Info") or {}).get("Finish Time", 0) - (
                ev.get("Task Info") or {}
            ).get("Launch Time", 0)
            st["times"].append(rt)
            st["mem_spill"] += m.get("Memory Bytes Spilled", 0)
            st["disk_spill"] += m.get("Disk Bytes Spilled", 0)
            tot["mem_spill"] += m.get("Memory Bytes Spilled", 0)
            tot["disk_spill"] += m.get("Disk Bytes Spilled", 0)
            tot["gc_ms"] += m.get("JVM GC Time", 0)
            tot["tasks"] += 1
    skew = []
    for sid, st in stages.items():
        ts = sorted(st["times"])
        if len(ts) >= 4 and ts[-1] > 2000:
            med = ts[len(ts) // 2] or 1
            skew.append(
                {
                    "stage": sid,
                    "tasks": len(ts),
                    "max_ms": ts[-1],
                    "median_ms": med,
                    "skew": round(ts[-1] / med, 2),
                    "disk_spill_mb": round(st["disk_spill"] / 2**20, 1),
                }
            )
    skew.sort(key=lambda s: -s["max_ms"])
    return {
        "total_mem_spill_mb": round(tot["mem_spill"] / 2**20, 1),
        "total_disk_spill_mb": round(tot["disk_spill"] / 2**20, 1),
        "total_gc_sec": round(tot["gc_ms"] / 1000, 1),
        "tasks": tot["tasks"],
        "slowest_stages": skew[:5],
    }


def run_point(n_nodes: int, shuffle_partitions: int) -> dict:
    """One triangle timing in a FRESH session with event logging."""
    import tempfile

    from chatbot_spark.operators.graph import triangle_count
    from chatbot_spark.session import get_spark

    sys.path.insert(0, os.path.join(REPO, "tools"))
    from bench_graph_suite import synth_edges

    log_dir = tempfile.mkdtemp(prefix="cbs_tri_evlog_")
    spark = get_spark(
        "tri-audit",
        shuffle_partitions=shuffle_partitions,
        extra_conf={
            "spark.ui.showConsoleProgress": "false",
            "spark.eventLog.enabled": "true",
            "spark.eventLog.dir": log_dir,
            # rolling event-log files are zstd-compressed by default —
            # plain JSON so the parser reads them without a codec dep
            "spark.eventLog.compress": "false",
            "spark.eventLog.rolling.enabled": "false",
        },
    )
    e = synth_edges(spark, n_nodes).persist()
    n_edges = e.count()
    t0 = time.time()
    tc = triangle_count(e)
    n_tri_nodes = tc.count()
    wall = round(time.time() - t0, 2)
    e.unpersist()
    spark.stop()  # flush the event log; fresh JVM per point
    time.sleep(2)
    load = list(os.getloadavg())
    rec = {
        "n_nodes": n_nodes,
        "n_edges": n_edges,
        "shuffle_partitions": shuffle_partitions,
        "triangle_sec": wall,
        "n_triangle_nodes": n_tri_nodes,
        # NOTE: collected at the END of the point — a 32-thread run
        # pushes its own loadavg to ~10-20, so this reflects self-load
        # plus residue; points whose PREDECESSOR ran within ~2 min carry
        # residue and are marked load_suspect for the comparison fields
        "loadavg_end": load,
        "load_suspect": load[1] > 8,
    }
    rec.update(parse_event_log(log_dir))
    print(json.dumps(rec))
    return rec


def main() -> int:
    points = [
        (3_200_000, None),   # 8M edges, suite default partitions
        (12_800_000, None),  # 32M edges, suite default partitions
        (12_800_000, 128),   # 32M edges, 4x partitions
    ]
    out = []
    for i, (n_nodes, parts) in enumerate(points):
        if i:
            time.sleep(120)  # let loadavg decay between fresh sessions
        cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "0")) or (
            os.cpu_count() or 4
        )
        out.append(run_point(n_nodes, parts or max(cpus, 8)))
    wall8 = out[0]["triangle_sec"]
    wall32 = out[1]["triangle_sec"]
    payload = {
        "metric": "triangle_32m_audit",
        "points": out,
        "ratio_32m_over_8m_default": round(wall32 / max(wall8, 1e-9), 2),
        "ratio_32m_4x_partitions": round(
            out[2]["triangle_sec"] / max(wall8, 1e-9), 2
        ),
        "expected_ratio": "~4 (constant-degree generator: wedge count O(m))",
        "note": (
            "the verdict rests on the first two points (run after decay "
            "sleeps): any point marked load_suspect inherited residue "
            "from its predecessor's 32-thread run and its wall time is "
            "an upper bound only"
        ),
    }
    with open(os.path.join(REPO, "BENCH_GRAPH_TRI32_AUDIT.json"), "w") as f:
        json.dump(payload, f, indent=1)
        f.write("\n")
    print(json.dumps(payload))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
