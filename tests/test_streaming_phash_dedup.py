"""streaming_dedup_phash_incremental's load-bearing claims: (1) arrival
slicing is invisible — draining as ONE micro-batch or FOUR must emit
identical verdicts, and the store-partitioning dial (k=1 = no pruning
possible) must not change them; (2) the probe's store reads stay
partition-PRUNED at the bytes level (the LSH stores' regression gate,
applied to the fingerprint store)."""

from __future__ import annotations

import os
import sys

from pyspark.sql import functions as F

from apache_hive_1_2_2_src_spark.streaming.windows import (
    LAST_PHASH_STORE,
    _phash_probe_dedup,
)
from tests.conftest import SF_DIR

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tools"))


def test_phash_dedup_is_batch_count_independent(spark):
    one = {
        (r.key, r.n_dup_prior, r.verdict)
        for r in _phash_probe_dedup(spark, SF_DIR, n_batches=1).collect()
    }
    four = {
        (r.key, r.n_dup_prior, r.verdict)
        for r in _phash_probe_dedup(spark, SF_DIR, n_batches=4).collect()
    }
    assert one == four
    unpartitioned = {
        (r.key, r.n_dup_prior, r.verdict)
        for r in _phash_probe_dedup(
            spark, SF_DIR, n_batches=2, store_k=1
        ).collect()
    }
    assert unpartitioned == one
    # one verdict per key; dedup actually fired; every re-encode and
    # grid-invisible edit (vcode 1/2 keys) was dropped
    assert len(one) == len({k for k, _, _ in one})
    dropped = {k for k, _, v in one if v == "drop"}
    assert {k for k, _, _ in one if k % 10 in (1, 2)} <= dropped


def test_phash_store_probe_stays_bytes_pruned(spark):
    """Probe the REAL post-drain fingerprint store the way a batch's
    band lookup does and assert the bytes ratio stays pruned — the
    regression gate that catches a silently-unpartitioned store."""
    from scale_harness import assert_prune_ratio

    _phash_probe_dedup(spark, SF_DIR, n_batches=3)
    store, k = LAST_PHASH_STORE["store"], LAST_PHASH_STORE["store_k"]
    assert k == 8 and os.path.isdir(store)
    probe = spark.read.parquet(store).where(F.col("pb").isin([0, 3]))
    # 2 of 8 partitions; parquet size variance across dirs leaves slack
    assert_prune_ratio(
        "phash fingerprint store, 2-of-8 band probe", probe, store, 0.45
    )
