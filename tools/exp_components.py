"""Experiment harness: run one headline query repeatedly under different
session confs to attribute wall time (round-13 optimization measurements).

Usage: python tools/exp_components.py <query> [confs-json] [passes]
Prints wall seconds per pass per variant.
"""
from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from chatbot_spark.session import get_spark  # noqa: E402


def main() -> None:
    qname = sys.argv[1]
    variants = json.loads(sys.argv[2]) if len(sys.argv) > 2 else {"base": {}}
    passes = int(sys.argv[3]) if len(sys.argv) > 3 else 2
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

    from chatbot_spark import workload

    fn = workload.SPARK_QUERIES[qname]

    out: dict[str, list[float]] = {}
    for vname, conf in variants.items():
        spark = get_spark(extra_conf=conf)
        # warm the session (scan registration etc.) with one throwaway tiny job
        spark.range(1).write.format("noop").mode("overwrite").save()
        walls = []
        for p in range(passes):
            spark.sparkContext.setJobDescription(f"{qname}[{vname}#{p}]")
            t0 = time.monotonic()
            df = fn(spark, sf_dir)
            df.write.format("noop").mode("overwrite").save()
            walls.append(round(time.monotonic() - t0, 3))
        out[vname] = walls
        print(json.dumps({vname: walls}), flush=True)
        spark.stop()
    print("RESULT " + json.dumps(out))


if __name__ == "__main__":
    main()
