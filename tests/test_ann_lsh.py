"""Sign-bit LSH ANN scale-safety and recall properties: the 16-bit
signature + Hamming-1 multi-probe must (a) find near-dup pairs whose
signatures differ in zero OR one bit — the multi-probe's whole reason to
exist, since a one-bit flip moves a vector to a different bucket — (b) keep
the per-bucket cap from blowing up on a degenerate corpus, and (c) agree
with a brute-force recheck on everything it emits (no false candidates)."""

from __future__ import annotations

from pyspark.sql import functions as F

from apache_hive_1_2_2_src_spark.extensions.similarity import (
    _N_SIGN_BITS,
    signbit_lsh_pairs,
)


def _emb_df(spark, rows):
    return spark.createDataFrame(rows, "vec_id long, embedding array<float>")


def _base_vec(dim=32):
    # Deterministic signs: alternating +/- pattern in the first 16 dims.
    return [(1.0 if i % 3 else -1.0) for i in range(dim)]


def test_multiprobe_finds_hamming1_pair(spark):
    """A pair whose sign signatures differ in EXACTLY one of the first 16
    dims lands in different buckets; exact-bucket LSH misses it, the
    Hamming-1 probe finds it."""
    a = _base_vec()
    b = list(a)
    b[4] = -b[4]  # flip one sign inside the signature window
    filler = []
    for i in range(2, 40):
        v = [(1.0 if (i * 7 + j * 13) % 5 < 3 else -1.0) for j in range(32)]
        filler.append((i, v))
    d = _emb_df(spark, [(0, a), (1, b)] + filler)
    got = {(r.vec_a, r.vec_b): r.hamming for r in signbit_lsh_pairs(d).collect()}
    assert got.get((0, 1)) == 1
    # identical-signature control: duplicate of vector 0
    d2 = _emb_df(spark, [(0, a), (1, list(a))])
    got2 = {(r.vec_a, r.vec_b): r.hamming for r in signbit_lsh_pairs(d2).collect()}
    assert got2.get((0, 1)) == 0


def test_hamming2_pair_not_emitted(spark):
    """Two sign flips -> Hamming 2 -> outside the probe radius: the pair
    must NOT appear (documents the recall boundary the oracle encodes)."""
    a = _base_vec()
    b = list(a)
    b[3], b[9] = -b[3], -b[9]
    d = _emb_df(spark, [(0, a), (1, b)])
    assert signbit_lsh_pairs(d).count() == 0


def test_degenerate_bucket_stays_bounded(spark):
    """400 identical vectors -> one mega-bucket. With cap=32 the emitted
    pair count is bounded by C(32,2) (every probe set is identical, so the
    join only sees the capped 32)."""
    v = _base_vec()
    rows = [(i, list(v)) for i in range(400)]
    out = signbit_lsh_pairs(_emb_df(spark, rows), bucket_cap=32)
    n = out.count()
    assert 0 < n <= 32 * 31 // 2, n


def test_emitted_pairs_are_sound(spark):
    """Everything emitted really has signature Hamming <= 1: recompute the
    signatures with an independent driver-side method and cross-check."""
    rows = []
    for i in range(60):
        v = [(1.0 if (i * 11 + j * 17) % 7 < 4 else -1.0) for j in range(32)]
        rows.append((i, v))
    d = _emb_df(spark, rows)
    sigs = {
        i: sum((1 << j) for j in range(_N_SIGN_BITS) if v[j] >= 0)
        for i, v in rows
    }
    for r in signbit_lsh_pairs(d).collect():
        ham = bin(sigs[r.vec_a] ^ sigs[r.vec_b]).count("1")
        assert ham == r.hamming and ham <= 1


def test_dedup_embedding_near_recall_vs_brute_force(spark, registry):
    """The scale-path dedup (LSH candidates + exact verify) must FIND every
    near-dup pair the all-pairs oracle finds whose signatures differ in <=1
    bit, and must never report a pair the brute-force threshold rejects."""
    from pyspark.sql import functions as F

    from apache_hive_1_2_2_src_spark.extensions.similarity import signbit_lsh_pairs
    from apache_hive_1_2_2_src_spark.tables import load_table

    sf = "/root/testdata/sf0.001"
    brute = {
        (r.vec_a, r.vec_b): r.cosine
        for r in registry["similarity_cosine_threshold"].build(spark, sf).collect()
    }
    e = load_table(spark, sf, "embeddings")
    lsh_verified = {
        (r.vec_a, r.vec_b): r.cosine
        for r in signbit_lsh_pairs(e).filter(F.col("cosine") >= 0.4).collect()
    }
    # Soundness: every verified LSH pair is a true brute-force pair.
    assert set(lsh_verified) <= set(brute)
    for k, c in lsh_verified.items():
        assert abs(brute[k] - c) < 1e-9
    # Recall contract: brute pairs at Hamming<=1 are all found. (Pairs at
    # larger signature distance are the documented recall tradeoff.)
    lsh_all = {
        (r.vec_a, r.vec_b) for r in signbit_lsh_pairs(e).collect()
    }
    missed_within_probe = {k for k in brute if k in lsh_all} - set(lsh_verified)
    assert not missed_within_probe
    # And the registered report's counts agree with the recomputed sets.
    rep = registry["dedup_embedding_near"].build(spark, sf).collect()[0]
    assert rep.n_verified_pairs == len(lsh_verified)
    assert rep.n_duplicates == len({b for _, b in lsh_verified})
    assert rep.n_survivors == rep.n_vectors - rep.n_duplicates
