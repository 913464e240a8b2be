"""r18 audit (r19 candidate (c), brought forward): what does a CONCURRENT
reader observe while compact_partitioned_store swaps directories?

Four reader threads loop count() over the store while one compaction runs
(file://). The question is whether a racing reader can ever see a WRONG
answer (torn read: half old, half new files) or only a LOUD failure
(path/file missing inside the two-rename window).

Usage: python tools/measure_compactor_reader_race.py
"""

from __future__ import annotations

import json
import shutil
import sys
import threading
import time

sys.path.insert(0, ".")

from pyspark.sql import functions as F

from apache_hive_1_2_2_src_spark.session import get_session
from apache_hive_1_2_2_src_spark.streaming.windows import (
    compact_partitioned_store,
)


def main() -> None:
    spark = get_session("reader-race")
    store = "/tmp/race_store"
    shutil.rmtree(store, ignore_errors=True)
    for drop in range(10):
        spark.range(drop * 1000, drop * 1000 + 1000).select(
            F.col("id").alias("k"),
            F.pmod(F.col("id"), F.lit(8)).cast("int").alias("pb"),
        ).repartition(8, "pb").write.mode("append").partitionBy("pb").parquet(
            store
        )

    results = {"reads_ok": 0, "reads_failed": 0, "bad_counts": 0}
    stop = False

    def reader():
        while not stop:
            try:
                n = spark.read.parquet(store).count()
                results["reads_ok"] += 1
                if n != 10_000:
                    results["bad_counts"] += 1
            except Exception:
                results["reads_failed"] += 1

    threads = [threading.Thread(target=reader, daemon=True) for _ in range(4)]
    for t in threads:
        t.start()
    time.sleep(1)
    t0 = time.time()
    before, after = compact_partitioned_store(spark, store)
    results.update(
        before=before, after=after, compact_s=round(time.time() - t0, 2)
    )
    time.sleep(1)
    stop = True
    for t in threads:
        t.join(5)
    print(json.dumps(results))
    shutil.rmtree(store, ignore_errors=True)
    spark.stop()


if __name__ == "__main__":
    main()
