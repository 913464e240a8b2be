"""Dump .explain("formatted") for headline (or named) queries to files.

Usage:
    python tools/dump_plans.py <out_dir> [query ...]

Writes <out_dir>/<query>.txt with the formatted physical plan of each
query's built DataFrame (no action is run for pure queries; note that
builders with side effects — streaming drains, layout writes — DO run
their build-time work, since the plan exists only for the returned frame).
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from apache_hive_1_2_2_src_spark.registry import load_all
from apache_hive_1_2_2_src_spark.session import get_session


def main() -> int:
    out_dir = sys.argv[1]
    names = sys.argv[2:]
    os.makedirs(out_dir, exist_ok=True)
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_session("dump_plans")
    reg = load_all()
    if not names:
        import bench

        names = list(bench.HEADLINE)
    for name in names:
        df = reg[name].build(spark, sf_dir)
        plan = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        )
        with open(os.path.join(out_dir, f"{name}.txt"), "w") as f:
            f.write(plan)
        print(f"wrote {name} ({len(plan)} bytes)")
    return 0


if __name__ == "__main__":
    sys.exit(main())
