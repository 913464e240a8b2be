"""r18 scale audit (VERDICT r17 item 4): write_hive_bucketed at HIGH bucket
counts — does the staged dynamic-partition write need per-task file-handle
pooling at n=1024..4096, and what do the bucket files look like?

Three measurements per n:
1. PEAK OPEN FILE DESCRIPTORS of the (local-mode) JVM during the write,
   sampled at 25 ms from /proc/<pid>/fd — the direct observable for "file
   handles per task" on local[32] (32 concurrent tasks; per-task handles
   ~= (peak - baseline) / 32 if writers were held open concurrently).
2. BUCKET-ID COLLISIONS per staging task: repartition(n, __hb) hash-routes
   n distinct bucket ids into n partitions, so some tasks carry several
   ids (balls-in-bins). If Spark opened one writer PER ID concurrently,
   handles/task would follow this distribution; if it sorts by partition
   column first (FileFormatWriter's concurrent-writers fallback when
   spark.sql.maxConcurrentOutputFileWriters=0, the default), handles/task
   stays 1 regardless.
3. BUCKET-FILE SIZING: min/median/max bytes of the final 000000_0 files.

Usage: python tools/measure_bucket_write.py [sf_dir] [n ...]
"""

from __future__ import annotations

import glob
import json
import os
import statistics
import sys
import threading
import time

sys.path.insert(0, ".")

from pyspark.sql import functions as F

from apache_hive_1_2_2_src_spark.session import get_session
from apache_hive_1_2_2_src_spark.sources.hive_bucketing import (
    hive_bucket_id,
    write_hive_bucketed,
)
from apache_hive_1_2_2_src_spark.tables import load_table


def _java_pid() -> int:
    for pid in os.listdir("/proc"):
        if not pid.isdigit():
            continue
        try:
            with open(f"/proc/{pid}/comm") as f:
                if f.read().strip() == "java":
                    return int(pid)
        except OSError:
            continue
    raise RuntimeError("no local JVM found")


class FdSampler(threading.Thread):
    def __init__(self, pid: int):
        super().__init__(daemon=True)
        self.pid, self.peak, self.stop = pid, 0, False

    def run(self):
        while not self.stop:
            try:
                self.peak = max(self.peak, len(os.listdir(f"/proc/{self.pid}/fd")))
            except OSError:
                pass
            time.sleep(0.025)


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    ns = [int(a) for a in sys.argv[2:]] or [1024, 2048, 4096]
    spark = get_session("bucket-write-audit")
    pid = _java_pid()
    df = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_partkey", "l_quantity", "l_extendedprice"
    )
    n_rows = df.count()
    print(json.dumps({"sf_dir": sf_dir, "rows": n_rows,
                      "maxConcurrentOutputFileWriters": spark.conf.get(
                          "spark.sql.maxConcurrentOutputFileWriters", "0")}))
    for n in ns:
        # collision profile of the staging repartition (measurement 2)
        prof = (
            df.withColumn("__hb", hive_bucket_id("l_orderkey", n, "long"))
            .repartition(n, "__hb")
            .groupBy(F.spark_partition_id().alias("p"))
            .agg(F.countDistinct("__hb").alias("ids"))
            .agg(F.max("ids").alias("max_ids"),
                 F.avg("ids").alias("avg_ids"),
                 F.count(F.lit(1)).alias("nonempty_tasks"))
            .first()
        )
        out = f"/tmp/bucket_audit_{n}"
        base_fd = len(os.listdir(f"/proc/{pid}/fd"))
        s = FdSampler(pid)
        s.start()
        t0 = time.time()
        write_hive_bucketed(df, "l_orderkey", n, out, kind="long")
        wall = time.time() - t0
        s.stop = True
        s.join()
        sizes = sorted(
            os.path.getsize(f) for f in glob.glob(out + "/*_0")
        )
        print(json.dumps({
            "n_buckets": n,
            "wall_s": round(wall, 2),
            "fd_baseline": base_fd,
            "fd_peak": s.peak,
            "fd_growth": s.peak - base_fd,
            "max_bucket_ids_per_task": prof["max_ids"],
            "avg_bucket_ids_per_task": round(prof["avg_ids"], 3),
            "nonempty_tasks": prof["nonempty_tasks"],
            "n_files": len(sizes),
            "file_bytes_min": sizes[0],
            "file_bytes_median": sizes[len(sizes) // 2],
            "file_bytes_max": sizes[-1],
        }))
        import shutil

        shutil.rmtree(out, ignore_errors=True)
    spark.stop()


if __name__ == "__main__":
    main()
