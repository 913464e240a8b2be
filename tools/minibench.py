"""Isolated per-query timing, bench.py methodology (warm session, count()
action, sequential). Usage: python tools/minibench.py q1 q2 ... [--reps N]
Prints one JSON line {name: sec}."""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from apache_hive_1_2_2_src_spark.registry import load_all
from apache_hive_1_2_2_src_spark.session import get_session


def main() -> int:
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    reps = 1
    for a in sys.argv[1:]:
        if a.startswith("--reps"):
            reps = int(a.split("=")[1])
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_session("minibench")
    reg = load_all()
    # warmup: flagship query, absorbs session/scan/codegen startup
    reg["q1_pricing_summary"].build(spark, sf_dir).count()
    out = {}
    for name in args:
        vals = []
        for _ in range(reps):
            spark.sparkContext.setJobDescription(f"minibench:{name}")
            t0 = time.time()
            reg[name].build(spark, sf_dir).count()
            vals.append(round(time.time() - t0, 3))
        out[name] = vals[0] if reps == 1 else vals
    print(json.dumps(out))
    return 0


if __name__ == "__main__":
    sys.exit(main())
