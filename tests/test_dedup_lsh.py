"""MinHash-LSH scale-safety properties: the hot-bucket cap must bound the
within-bucket pair stage on degenerate (boilerplate-heavy) corpora without
hurting recall on normal near-dup pairs."""

from __future__ import annotations

from pyspark.sql import functions as F

from apache_hive_1_2_2_src_spark.extensions.dedup import _words, minhash_lsh_pairs


def _docs_df(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string").select(
        "doc_id", _words().alias("w")
    )


def test_degenerate_corpus_stays_bounded(spark):
    """500 identical docs → one mega-bucket per band. Without the cap the
    pair stage emits ~500²/2 ≈ 125k candidates; with it the exact path
    skips the cluster entirely (exact dedup owns that case)."""
    boiler = "the quick brown fox jumps over the lazy dog again and again"
    rows = [(i, boiler) for i in range(500)]
    out = minhash_lsh_pairs(_docs_df(spark, rows), bucket_cap=64)
    assert out.count() == 0


def test_near_dup_recall_unaffected_by_cap(spark):
    """Normal-sized buckets pass through the cap: a genuinely near-dup pair
    among distinct filler docs must still be found (and nothing else)."""
    a = "alpha beta gamma delta epsilon zeta eta theta iota kappa lambda mu"
    b = a + " nu"  # one-token edit → high Jaccard on 3-gram shingles
    rows = [(0, a), (1, b)] + [
        (i, f"filler doc number {i} talks about topic {i * 7} and item {i * 13} only")
        for i in range(2, 60)
    ]
    out = minhash_lsh_pairs(_docs_df(spark, rows), threshold=0.5, bucket_cap=64)
    pairs = {(r.doc_a, r.doc_b) for r in out.collect()}
    assert (0, 1) in pairs
    assert all(p == (0, 1) for p in pairs)


def test_mega_cluster_does_not_mask_other_pairs(spark):
    """A boilerplate cluster and a legit near-dup pair coexist: the cap
    drops the cluster's buckets but the pair's buckets are small."""
    boiler = "standard legal disclaimer text repeated on every page of the corpus"
    a = "alpha beta gamma delta epsilon zeta eta theta iota kappa lambda mu"
    b = a + " nu"
    rows = [(i, boiler) for i in range(200)] + [(1000, a), (1001, b)]
    out = minhash_lsh_pairs(_docs_df(spark, rows), threshold=0.5, bucket_cap=64)
    pairs = {(r.doc_a, r.doc_b) for r in out.collect()}
    assert pairs == {(1000, 1001)}
