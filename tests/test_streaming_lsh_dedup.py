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
