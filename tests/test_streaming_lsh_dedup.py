"""streaming_dedup_lsh_incremental's load-bearing claim is
slicing-invariance: 'earlier' means smaller doc_id whether the near-dup
partner arrived in a previous drop (index probe) or the same drop
(within-batch candidates), so draining the corpus as ONE micro-batch or as
THREE must emit identical verdicts. A lost index append, a probe that
misses the within-batch side, or a double-counted epoch all break the
equality."""

from __future__ import annotations

from apache_hive_1_2_2_src_spark.streaming.windows import _lsh_probe_dedup
from tests.conftest import SF_DIR


def test_lsh_dedup_is_batch_count_independent(spark):
    one = {
        (r.doc_id, r.n_dup_prior, r.verdict)
        for r in _lsh_probe_dedup(spark, SF_DIR, n_batches=1).collect()
    }
    three = {
        (r.doc_id, r.n_dup_prior, r.verdict)
        for r in _lsh_probe_dedup(spark, SF_DIR, n_batches=3).collect()
    }
    assert one == three
    # store partitioning is a pure read-pruning dial: k=1 (single
    # partition, no pruning possible) must produce identical verdicts
    unpartitioned = {
        (r.doc_id, r.n_dup_prior, r.verdict)
        for r in _lsh_probe_dedup(spark, SF_DIR, n_batches=2, store_buckets=1).collect()
    }
    assert unpartitioned == one
    # every doc got exactly one verdict, and dedup actually fired
    assert len(one) == len({d for d, _, _ in one})
    assert any(v == "drop" for _, _, v in one)


def test_store_partition_pruning_is_plan_level(spark, tmp_path):
    """The store layout contract the scale claim rests on: a literal isin
    on the partition column must prune at FILE-LISTING level (scan's
    PartitionFilters + only matching db= files in inputFiles). If Spark's
    partition discovery ever stopped pruning this shape, the probe would
    silently regress to O(|corpus|) reads."""
    from pyspark.sql import functions as F

    store = str(tmp_path / "store")
    df = spark.range(1000).select(
        F.col("id").alias("doc_id"), (F.col("id") % 8).alias("db")
    )
    df.repartition(8, "db").write.partitionBy("db").parquet(store + "/epoch=0")
    df.repartition(8, "db").write.partitionBy("db").parquet(store + "/epoch=1")
    pruned = spark.read.parquet(store).where(F.col("db").isin([2, 5]))
    plan = pruned._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan and "db" in plan
    # Behavioral proof (inputFiles() ignores filters): delete every
    # NON-matching partition dir after planning — the pruned count can
    # only succeed if those files are never opened
    # (ignoreMissingFiles=false, so touching one would raise).
    import shutil

    for e in (0, 1):
        for d in range(8):
            if d not in (2, 5):
                shutil.rmtree(f"{store}/epoch={e}/db={d}")
    assert spark.conf.get("spark.sql.files.ignoreMissingFiles") == "false"
    # both epochs of the matching partitions are served
    assert pruned.count() == 2 * 250
