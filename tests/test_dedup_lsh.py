"""Dedup scale-safety properties: the MinHash hot-bucket cap and the
ngram-Jaccard hot-shingle cap must bound their quadratic stages on
degenerate (boilerplate-heavy) corpora without hurting recall on normal
near-dup pairs; the persisted shingle index must not leak across calls;
and the exact-equality MinHash oracle's corpus assumption (no mid-range
Jaccard pairs) is gated explicitly."""

from __future__ import annotations

from pyspark.sql import functions as F

from apache_hive_1_2_2_src_spark.extensions.dedup import (
    _words,
    minhash_lsh_pairs,
    ngram_jaccard_pairs,
    release_shingle_index,
    simhash_pairs,
)


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


def test_ngram_jaccard_shingle_cap_bounds_degenerate_corpus(spark):
    """500 docs sharing one boilerplate paragraph: every boilerplate shingle
    has df=500 > 64, so the cap removes them before the self-join — the
    inverted-index join emits ZERO rows for the cluster instead of
    ~500²/2 ≈ 125k. A legit near-dup pair with rare shingles survives."""
    boiler = "this standard license header is repeated verbatim on every single document"
    a = "alpha beta gamma delta epsilon zeta eta theta iota kappa lambda mu"
    b = a + " nu"
    rows = [(i, boiler) for i in range(500)] + [(1000, a), (1001, b)]
    out = ngram_jaccard_pairs(_docs_df(spark, rows), threshold=0.5, shingle_df_cap=64)
    pairs = {(r.doc_a, r.doc_b) for r in out.collect()}
    assert pairs == {(1000, 1001)}


def test_ngram_jaccard_cap_noop_on_normal_corpus(spark):
    """Below-cap shingles are untouched: capped and uncapped runs agree when
    no shingle exceeds the df cap (the testdata regime, which is why the
    driver oracle with the same cap stays equal to plain exact Jaccard)."""
    a = "alpha beta gamma delta epsilon zeta eta theta iota kappa lambda mu"
    b = a + " nu"
    rows = [(0, a), (1, b)] + [
        (i, f"filler doc number {i} talks about topic {i * 7} and item {i * 13} only")
        for i in range(2, 40)
    ]
    d = _docs_df(spark, rows)
    capped = {tuple(r) for r in ngram_jaccard_pairs(d, threshold=0.5, shingle_df_cap=64).collect()}
    uncapped = {tuple(r) for r in ngram_jaccard_pairs(d, threshold=0.5, shingle_df_cap=None).collect()}
    assert capped == uncapped and len(capped) == 1


def test_shingle_index_cache_is_bounded_and_releasable(spark):
    """Cache-lifetime contract (dedup.py): repeated minhash_lsh_pairs calls
    pin at most ONE shingle index; release_shingle_index() drops it."""
    rows = [(i, f"doc {i} content about topic {i} with words {i * 3} {i * 5}") for i in range(30)]
    d = _docs_df(spark, rows)
    jsc = spark.sparkContext._jsc.sc()
    release_shingle_index()
    baseline = jsc.getPersistentRDDs().size()
    for _ in range(3):
        minhash_lsh_pairs(d).count()
    # one pinned index, not three (each call releases its predecessor)
    assert jsc.getPersistentRDDs().size() <= baseline + 1
    release_shingle_index()
    assert jsc.getPersistentRDDs().size() <= baseline


def test_lsh_oracle_equality_gate(spark, oracle_con):
    """Gate for dedup_minhash_lsh's exact-equality oracle. 4-band×4-row LSH
    catches a J=0.7 pair only with p≈0.67 in expectation, and this corpus
    DOES contain pairs in the recall-uncertain range (J 0.92–0.99 at
    sf0.001) — but the min-hashes are SEEDED xxhash64, so for a fixed
    corpus the caught set is deterministic, and it has been verified equal
    to the exact pair set at sf0.001/sf0.01/sf0.1. This test certifies
    that equality directly at the test SF: if a regenerated corpus ever
    breaks it, this fails loudly BEFORE the driver does, and the fix is to
    weaken the registered oracle to a recall-bound invariant."""
    from apache_hive_1_2_2_src_spark.extensions.dedup import _jaccard_oracle
    from apache_hive_1_2_2_src_spark.tables import load_table
    from tests.conftest import SF_DIR

    d = load_table(spark, SF_DIR, "documents").select("doc_id", _words().alias("w"))
    lsh = {(r.doc_a, r.doc_b) for r in minhash_lsh_pairs(d).collect()}
    release_shingle_index()
    exact = {(a, b) for a, b, _ in oracle_con.execute(_jaccard_oracle(0.7)).fetchall()}
    missed = exact - lsh
    false_pos = lsh - exact
    assert not false_pos, f"LSH emitted non-pairs (verify stage broken): {sorted(false_pos)[:5]}"
    assert not missed, (
        f"LSH banding missed {len(missed)} true pairs on this corpus — the "
        f"exact-equality oracle is no longer sound; weaken it to a "
        f"recall-bound invariant. Missed: {sorted(missed)[:5]}"
    )


def test_simhash_degenerate_corpus_stays_bounded(spark):
    """300 identical docs → identical fingerprints → one mega-bucket per
    band. Without the per-(band,key) cap the self-join emits C(300,2) =
    44,850 candidates; with cap=32 it is bounded by C(32,2) = 496 (every
    band keeps the SAME first-32 doc_ids, so distinct() collapses the four
    bands to one set)."""
    boiler = "the quick brown fox jumps over the lazy dog again and again"
    rows = [(i, boiler) for i in range(300)]
    out = simhash_pairs(_docs_df(spark, rows), bucket_cap=32)
    n = out.count()
    assert 0 < n <= 32 * 31 // 2, n


def test_simhash_recall_unaffected_by_cap(spark):
    """Buckets under the cap pass through untouched: an identical pair among
    distinct filler docs is still found at the default cap, and every
    emitted pair is hamming<=12 by construction."""
    a = "alpha beta gamma delta epsilon zeta eta theta iota kappa lambda mu"
    rows = [(0, a), (1, a)] + [
        (i, f"filler doc number {i} talks about topic {i * 7} and item {i * 13} only")
        for i in range(2, 60)
    ]
    out = simhash_pairs(_docs_df(spark, rows))
    got = {(r.doc_a, r.doc_b): r.hamming for r in out.collect()}
    assert got.get((0, 1)) == 0
    assert all(h <= 12 for h in got.values())


def test_simhash_cap_soundness_gate(spark):
    """Gate for dedup_simhash's full-recall invariant (n_identical_found ==
    n_identical_pairs). The round-5 bucket cap drops pairs past 256 docs per
    (band,key), so that equality only holds while every bucket on the LIVE
    amplified corpus stays under the cap. If a regenerated corpus ever
    produces a hot bucket, this fails loudly BEFORE the driver does, and
    the fix is to weaken oracle invariant (a) to found <= pairs with a
    recall floor — the same remedy pattern as test_lsh_oracle_equality_gate."""
    from apache_hive_1_2_2_src_spark.extensions.dedup import simhash_blocked
    from apache_hive_1_2_2_src_spark.tables import load_table
    from tests.conftest import SF_DIR

    d = load_table(spark, SF_DIR, "documents").select("doc_id", _words().alias("w"))
    dup = d.filter(F.col("doc_id") % 10 == 0).select(
        (F.col("doc_id") + 1000000).alias("doc_id"), "w"
    )
    amp = d.unionAll(dup)
    max_bucket = (
        simhash_blocked(amp)
        .groupBy("band", "key")
        .count()
        .agg(F.max("count"))
        .collect()[0][0]
    )
    assert max_bucket <= 256, (
        f"hot simhash bucket ({max_bucket} docs > cap 256) — the registered "
        f"full-recall oracle is no longer sound on this corpus; weaken "
        f"invariant (a) to a recall floor"
    )
