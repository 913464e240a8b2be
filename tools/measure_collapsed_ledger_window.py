"""r19 measurement (VERDICT r18 item 5): the collapsed streaming probe's
member-ledger WINDOW under a mega HOME group.

The expansion stage of _collapsed_probe_dedup windows (queries UNION
events) per HOME gkey — linear in rows, but a single window partition per
group: a mega group of m identical docs puts m query rows + m self-pair
event rows (+ partner-member events) into ONE task's sort. SCALE.md r18
measured the probe at m=4,000; this measures the window's scaling at
m = 25k / 100k clones through the REAL 3-drop streaming probe, and
isolates the expansion window itself (batch form) at m up to 400k, to
decide whether the sessionize_bucketed time-bucket split needs to apply.

Usage: python tools/measure_collapsed_ledger_window.py [m ...]
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time

sys.path.insert(0, ".")

from pyspark.sql import functions as F

from apache_hive_1_2_2_src_spark.session import get_session
from apache_hive_1_2_2_src_spark.tables import load_table


def main() -> None:
    ms = [int(a) for a in sys.argv[1:]] or [25_000, 100_000]
    sf_dir = "/root/testdata/sf0.01"
    spark = get_session("collapsed-ledger-window-audit")
    from apache_hive_1_2_2_src_spark.extensions.dedup import (
        exact_collapse_prior_dup_counts,
    )
    from apache_hive_1_2_2_src_spark.streaming import windows as sw

    base = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    donor = base.filter(F.col("doc_id") == 5).first()["text"]

    # (a) streaming probe end-to-end with a mega HOME group overlay
    for m in ms:
        clones = spark.range(m).select(
            (F.col("id") + 100_000).alias("doc_id"), F.lit(donor).alias("text")
        )
        overlay = base.unionByName(clones).localCheckpoint()
        d = f"/tmp/ledger_window_{m}"
        shutil.rmtree(d, ignore_errors=True)
        os.makedirs(d)
        overlay.write.parquet(os.path.join(d, "documents.parquet"))
        t0 = time.time()
        s = (
            sw._collapsed_probe_dedup(spark, d, n_batches=3)
            .agg(F.sum("n_dup_prior"))
            .first()[0]
        )
        print(json.dumps({
            "streaming_m_clones": m,
            "wall_s": round(time.time() - t0, 2),
            "sum_prior": int(s),
        }), flush=True)
        shutil.rmtree(d, ignore_errors=True)

    # (b) the expansion window isolated (batch collapse form) at larger m
    for m in [ms[-1], 4 * ms[-1]]:
        clones = spark.range(m).select(
            (F.col("id") + 100_000).alias("doc_id"), F.lit(donor).alias("text")
        )
        overlay = base.unionByName(clones).localCheckpoint()
        t0 = time.time()
        s = (
            exact_collapse_prior_dup_counts(overlay)
            .agg(F.sum("n_dup_prior"))
            .first()[0]
        )
        print(json.dumps({
            "batch_m_clones": m,
            "wall_s": round(time.time() - t0, 2),
            "sum_prior": int(s),
        }), flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
