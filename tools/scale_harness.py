"""Reusable scale-regression harness for hash-partitioned state stores
(round-13 item: the measure_lsh_prune recipe, generalized so every future
partitioned store gets the same measured treatment for free).

The pattern all the streaming state stores share (streaming/windows.py
``_lsh_probe_dedup``): state is written hash-partitioned under
``<part_col>=<v>`` dirs (v = some integer hash mod k), and probes read
``spark.read.parquet(store).where(col(part_col).isin(needed))`` so
partition pruning is PLAN-level — files in other dirs are never listed
into the scan. The harness gives three primitives:

- ``build_hash_partitioned_store(spark, rows, bucket_expr, k, path)`` —
  write ``rows`` partitioned by ``pb = bucket_expr mod k`` (one writer
  per partition dir, the repartition-first discipline).
- ``bytes_opened(df)`` — bytes the plan actually opens: the sum of
  ``df.inputFiles()`` sizes. Because pruning is plan-level, unlisted
  files are genuinely never opened — this is the honest numerator.
- ``prune_report(label, df, store_path)`` / ``assert_prune_ratio(...)``
  — ledger line + hard assertion that opened/total stays under a bound,
  so a regression that silently turns a pruned probe into a full scan
  fails a test instead of shipping.

CLI demo (the shingle-store shape at a configurable size):

    python tools/scale_harness.py [n_rows] [k] [n_probe_partitions]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def build_hash_partitioned_store(
    spark: SparkSession,
    rows: DataFrame,
    bucket_expr,
    k: int,
    path: str,
    part_col: str = "pb",
) -> str:
    """Write ``rows`` as a ``part_col=<v>`` hash-partitioned store,
    v = pmod(bucket_expr, k). repartition on the partition column first so
    each dir gets one writer (no small-files explosion — the same
    discipline as pipeline_publish_shards)."""
    staged = rows.withColumn(part_col, F.pmod(bucket_expr, F.lit(k)).cast("int"))
    staged.repartition(k, part_col).write.mode("overwrite").partitionBy(
        part_col
    ).parquet(path)
    return path


def bytes_on_disk(path: str) -> int:
    """Total bytes of every data file under ``path`` (local FS walk)."""
    total = 0
    for root, _dirs, files in os.walk(path):
        for f in files:
            if not f.startswith(("_", ".")):
                total += os.path.getsize(os.path.join(root, f))
    return total


def files_opened(df: DataFrame) -> list[str]:
    """The files a scan of ``df`` ACTUALLY reads — execution ground
    truth via distinct input_file_name(), which runs after Catalyst's
    PartitionFilters. NOT df.inputFiles(): that reflects the relation's
    file INDEX, so it honors explicit-path pruning (the
    read_hive_partitioned_bucketed style) but silently ignores
    filter-based partition pruning (the .where(col('pb').isin(...))
    style this harness measures) and would report 100% for a perfectly
    pruned probe. Costs one pass over the pruned data — fine for a
    regression harness, wrong for production telemetry."""
    from urllib.parse import unquote, urlparse

    return [
        unquote(urlparse(r.f).path)
        for r in df.select(F.input_file_name().alias("f")).distinct().collect()
    ]


def bytes_opened(df: DataFrame) -> int:
    """Bytes the scan actually reads (see files_opened)."""
    return sum(os.path.getsize(f) for f in files_opened(df))


def prune_report(label: str, df: DataFrame, store_path: str) -> dict:
    """Measure and print one ledger line; returns the numbers."""
    fls = files_opened(df)
    opened = sum(os.path.getsize(f) for f in fls)
    total = bytes_on_disk(store_path)
    ratio = opened / total if total else 0.0
    print(
        f"[scale-harness] {label}: opened {opened / 1e6:.2f} MB of "
        f"{total / 1e6:.2f} MB ({100 * ratio:.1f}%), {len(fls)} files"
    )
    return {"opened": opened, "total": total, "ratio": ratio, "files": len(fls)}


def assert_prune_ratio(
    label: str, df: DataFrame, store_path: str, max_ratio: float
) -> dict:
    """prune_report + hard failure when the probe reads more than
    ``max_ratio`` of the store — the scale-regression gate."""
    r = prune_report(label, df, store_path)
    if r["ratio"] > max_ratio:
        raise AssertionError(
            f"{label}: pruned probe read {100 * r['ratio']:.1f}% of the "
            f"store (bound {100 * max_ratio:.1f}%) — partition pruning "
            "regressed to a scan"
        )
    return r


def _demo(n_rows: int, k: int, n_probe: int) -> None:
    from apache_hive_1_2_2_src_spark.session import get_session
    from apache_hive_1_2_2_src_spark.tmputil import scratch_dir

    spark = get_session("scale-harness", shuffle_partitions=32)
    base = scratch_dir("scale_harness")
    store = os.path.join(base, "store")
    rows = spark.range(n_rows).select(
        F.col("id").alias("doc_id"),
        F.concat(F.lit("sh_"), (F.col("id") % 97).cast("string")).alias("sh"),
    )
    build_hash_partitioned_store(
        spark, rows, F.xxhash64("doc_id"), k, store
    )
    probe_pb = list(range(n_probe))
    pruned = spark.read.parquet(store).where(F.col("pb").isin(probe_pb))
    assert_prune_ratio(
        f"demo probe {n_probe}/{k} partitions", pruned, store,
        max_ratio=min(1.0, 2.0 * n_probe / k),
    )
    import shutil

    shutil.rmtree(base, ignore_errors=True)
    spark.stop()


if __name__ == "__main__":
    _demo(
        int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000,
        int(sys.argv[2]) if len(sys.argv) > 2 else 64,
        int(sys.argv[3]) if len(sys.argv) > 3 else 2,
    )
