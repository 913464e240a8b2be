"""Scale-stress properties for the dedup/ANN path (VERDICT r5 item 7).

The caps and convergence bounds on the near-dup pipeline (LSH bucket caps,
shingle df caps, the large/small-star iteration budget) are reasoned for a
duplicate-heavy corpus but were only ever exercised at the testdata's
natural duplication (none at sf0.001 — all 500 docs unique). These tests
build a 10x-duplicated OVERLAY corpus — every document and embedding cloned
10 times under fresh ids, the worst realistic shape for a crawl pipeline —
and pin three properties the 100 TB design depends on:

1. CC round count stays inside the log^2 bound (duplicate clusters are
   dense, so the star algorithm must converge in ~log rounds, nowhere near
   the max_iters budget);
2. LSH pair output stays inside the cap-implied bound (no quadratic
   blow-up: each doc can pair with at most bucket_cap-1 others per band);
3. duplicate-pair recall is 100% — the caps exist to shed pathological
   buckets, and on 10-member duplicate groups (well under every cap) they
   must not cost a single true pair.

Referenced from SCALE.md §dedup-caps.
"""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from apache_hive_1_2_2_src_spark.extensions.dedup import (
    _words,
    connected_components,
    minhash_lsh_pairs,
)
from apache_hive_1_2_2_src_spark.extensions.similarity import signbit_lsh_pairs
from apache_hive_1_2_2_src_spark.tables import load_table
from tests.conftest import SF_DIR

N_COPIES = 10


def _overlay_docs(spark):
    """Every sf0.001 document cloned N_COPIES times under fresh ids
    (orig_id * N_COPIES + copy), keeping text identical."""
    d = load_table(spark, SF_DIR, "documents").select("doc_id", "text")
    copies = spark.range(N_COPIES).select(F.col("id").alias("copy"))
    return d.crossJoin(copies).select(
        (F.col("doc_id") * N_COPIES + F.col("copy")).alias("doc_id"),
        F.col("doc_id").alias("orig_id"),
        "text",
    )


def _dup_pairs(overlay):
    """Ground-truth duplicate pairs: all C(N_COPIES, 2) id pairs per
    original document."""
    a = overlay.select(F.col("orig_id").alias("o"), F.col("doc_id").alias("ida"))
    b = overlay.select(F.col("orig_id").alias("o"), F.col("doc_id").alias("idb"))
    return (
        a.join(b, "o")
        .filter(F.col("ida") < F.col("idb"))
        .select(F.col("ida").alias("doc_a"), F.col("idb").alias("doc_b"))
    )


def test_minhash_overlay_recall_and_cap_bound(spark):
    overlay = _overlay_docs(spark)
    n_docs = overlay.count()
    d = overlay.select("doc_id", _words().alias("w"))
    bands, bucket_cap = 4, 64
    pairs = minhash_lsh_pairs(d, bands=bands, bucket_cap=bucket_cap)
    got = {(r.doc_a, r.doc_b) for r in pairs.select("doc_a", "doc_b").collect()}
    # Cap-implied output bound: a pair must share >= 1 band bucket and each
    # capped bucket holds <= bucket_cap docs, so every doc appears in at
    # most (bucket_cap - 1) * bands pairs.
    assert len(got) <= n_docs * (bucket_cap - 1) * bands / 2
    # 100% duplicate recall: every 10-member identical group is far below
    # the bucket cap (10 <= 64), so no true duplicate pair may be shed.
    expected = {
        (r.doc_a, r.doc_b) for r in _dup_pairs(overlay).collect()
    }
    missing = expected - got
    assert not missing, f"{len(missing)} duplicate pairs lost (of {len(expected)})"


def test_cc_rounds_within_log2_bound_on_overlay(spark):
    """Connected components over the duplicate-pair graph: components are
    10-cliques (possibly merged by base-corpus near-dups), i.e. dense and
    shallow — rounds must stay within ceil(log2(max_cluster)) + 2 (the
    measured chain bound k+1 for 2^k nodes, plus one round of slack for
    the convergence re-check), nowhere near the max_iters=24 budget."""
    overlay = _overlay_docs(spark)
    stats: dict = {}
    out = connected_components(_dup_pairs(overlay), stats=stats).collect()
    assert len(out) == 500  # one cluster per original document
    assert all(r.cluster_size == N_COPIES for r in out)
    max_cluster = max(r.cluster_size for r in out)
    bound = math.ceil(math.log2(max_cluster)) + 2
    assert stats["rounds"] <= bound, (
        f"CC took {stats['rounds']} rounds on dense {max_cluster}-cliques "
        f"(bound {bound})"
    )


def test_ann_overlay_duplicate_recall(spark):
    """Sign-bit ANN on 10x-duplicated embeddings: identical vectors share
    their signature bucket, duplicate groups (10) sit far below the bucket
    cap, so every duplicate pair must be emitted with hamming == 0."""
    e = load_table(spark, SF_DIR, "embeddings").select("vec_id", "embedding")
    copies = spark.range(N_COPIES).select(F.col("id").alias("copy"))
    overlay = e.crossJoin(copies).select(
        (F.col("vec_id") * N_COPIES + F.col("copy")).alias("vec_id"),
        F.col("vec_id").alias("orig_id"),
        "embedding",
    )
    got = {
        (r.vec_a, r.vec_b): r.hamming
        for r in signbit_lsh_pairs(
            overlay.select("vec_id", "embedding")
        ).collect()
    }
    a = overlay.select(F.col("orig_id").alias("o"), F.col("vec_id").alias("va"))
    b = overlay.select(F.col("orig_id").alias("o"), F.col("vec_id").alias("vb"))
    expected = {
        (r.va, r.vb)
        for r in a.join(b, "o").filter(F.col("va") < F.col("vb")).collect()
    }
    missing = expected - set(got)
    assert not missing, f"{len(missing)} duplicate ANN pairs lost"
    assert all(got[p] == 0 for p in expected)


def test_substring_spans_linear_join_and_full_dup_on_overlay(spark):
    """ExactSubstr span mining on the 10x overlay (r6 VERDICT item 8):

    1. the pre-aggregated gram-side join stays LINEAR — sum(n_grams) over
       the output equals the directly-computed gram-occurrence count
       (sum over docs of size(w) - k + 1); a per-occurrence x
       per-occurrence join would inflate it ~10x here;
    2. every gram of every copy is corpus-duplicated (its 9 clones carry
       it), so n_dup_grams == n_grams and half_duplicated for every doc
       with >= k tokens — 100% span recall on true duplicates.
    """
    from apache_hive_1_2_2_src_spark.extensions.dedup import substring_span_stats

    k = 8
    overlay = _overlay_docs(spark)
    toks = overlay.select("doc_id", _words().alias("w"))
    out = substring_span_stats(toks, k=k).collect()
    assert len(out) == overlay.count()  # one row per doc, short docs included
    expected_occurrences = (
        toks.select(
            F.when(F.size("w") >= k, F.size("w") - (k - 1))
            .otherwise(0)
            .alias("n")
        )
        .agg(F.sum("n"))
        .collect()[0][0]
    )
    assert sum(r.n_grams for r in out) == expected_occurrences
    long_docs = [r for r in out if r.n_grams > 0]
    assert long_docs, "overlay should contain docs with >= 8 tokens"
    assert all(r.n_dup_grams == r.n_grams for r in long_docs)
    assert all(r.half_duplicated for r in long_docs)


def test_tfidf_candidate_pairs_within_df_cap_bound(spark):
    """TF-IDF inverted-index join on the 10x overlay (r6 VERDICT item 8):
    candidate pairs (threshold < 0 => every pair sharing >= 1 surviving
    term) must stay within Sum_term C(df, 2) over the capped vocabulary —
    the Σdf² complexity claim in SCALE.md. The overlay also exercises the
    cap's purpose: common terms (orig df >= 7) blow past df_max = 64 once
    cloned 10x and must vanish from the index, while each original doc's
    rare terms (df = 10 copies) survive, so every 10-copy clique whose
    doc has >= 1 surviving term reports all C(10,2) pairs at cosine 1."""
    from apache_hive_1_2_2_src_spark.extensions.text import tfidf_cosine_pairs

    overlay = _overlay_docs(spark)
    w0 = overlay.select("doc_id", _words().alias("w")).filter(F.size("w") >= 3)
    df_min, df_max = 2, 64

    # Independent df histogram over the same trigram tokenization.
    grams3 = F.expr(
        "transform(sequence(0, size(w) - 3), x -> "
        "concat_ws(' ', w[x], w[x + 1], w[x + 2]))"
    )
    df_rows = (
        w0.select("doc_id", F.explode(grams3).alias("term"))
        .groupBy("term")
        .agg(F.countDistinct("doc_id").alias("df"))
        .collect()
    )
    capped = [r.df for r in df_rows if df_min <= r.df <= df_max]
    assert capped, "some rare terms must survive the cap on the overlay"
    # The 10x clone multiplies every df by 10: surviving df values are
    # exact multiples of 10 in [10, 60].
    assert all(d % N_COPIES == 0 for d in capped)
    pair_bound = sum(d * (d - 1) // 2 for d in capped)

    cand = tfidf_cosine_pairs(w0, threshold=-1.0).collect()
    assert 0 < len(cand) <= pair_bound, (len(cand), pair_bound)

    # Full duplicate recall at cosine == 1 for cliques with surviving terms.
    surviving_docs = {
        r.doc_id
        for r in w0.select("doc_id", F.explode(grams3).alias("term"))
        .join(
            w0.select("doc_id", F.explode(grams3).alias("term"))
            .groupBy("term")
            .agg(F.countDistinct("doc_id").alias("df"))
            .filter(F.col("df").between(df_min, df_max)),
            "term",
        )
        .select("doc_id")
        .distinct()
        .collect()
    }
    got = {(r.doc_a, r.doc_b): r.cosine for r in cand}
    expected = {
        (r.doc_a, r.doc_b)
        for r in _dup_pairs(overlay).collect()
        if r.doc_a in surviving_docs and r.doc_b in surviving_docs
    }
    missing = expected - set(got)
    assert not missing, f"{len(missing)} duplicate TF-IDF pairs lost"
    assert all(abs(got[p] - 1.0) < 1e-6 for p in expected)


def test_hierarchy_flatten_chain_rounds_log_bound(spark):
    """Pointer doubling on a 4096-node CHAIN (parent = n-1, depth up to
    4095 — the worst shape for naive one-hop iteration, which would need
    4095 joins): rounds must stay within ceil(log2(depth)) + 1, and every
    node's (root, depth) must be exact."""
    from apache_hive_1_2_2_src_spark.operators.workloads_extra import flatten_forest

    n = 4096
    nodes = spark.range(n).select(F.col("id").alias("node"))
    parent = F.expr("CASE WHEN node = 0 THEN NULL ELSE node - 1 END")
    stats: dict = {}
    out = {r.doc_id: (r.root_id, r.depth) for r in
           flatten_forest(nodes, parent, stats=stats).collect()}
    assert len(out) == n
    assert all(out[i] == (0, i) for i in range(n))
    assert stats["rounds"] <= math.ceil(math.log2(n)) + 1, stats


def test_semdedup_within_cluster_pairs_bounded_by_cap(spark):
    """SemDeDup's 100 TB guarantee is that candidate-pair work is
    O(N · cell_cap), never O(N²): with embeddings cloned 10x (dense
    duplicate mass inside every cluster), (a) the per-cluster member cap
    holds, and (b) clones of the SAME vector are always near-dup pairs
    within their (shared) cluster, so at least one member of every clone
    family must be pruned."""
    from apache_hive_1_2_2_src_spark.registry import load_all

    e = load_table(spark, SF_DIR, "embeddings")
    n_src = e.count()
    import tempfile

    overlay_dir = tempfile.mkdtemp(prefix="semdedup_overlay_")
    # id = copy * n_src + vec_id: clone ids 0..7 stay DISTINCT original
    # vectors, so the query's fixed-seed centroids (vec_id < 8) give the
    # intended multi-cluster geometry (vec_id * N + copy would make all 8
    # centroids clones of original 0 and collapse everything to one cell).
    clones = e.crossJoin(
        spark.range(N_COPIES).select(F.col("id").alias("copy"))
    ).select(
        (F.col("copy") * n_src + F.col("vec_id")).alias("vec_id"),
        "embedding",
        "label",
    )
    clones.write.mode("overwrite").parquet(f"{overlay_dir}/embeddings.parquet")

    rows = load_all()["dedup_semdedup_prune"].build(spark, overlay_dir).collect()
    total_members = sum(r.n_members for r in rows)
    total_removed = sum(r.n_removed for r in rows)
    # multi-cluster shape: all 8 cells populated, cap respected in each
    assert len(rows) == 8
    assert all(r.n_members <= 128 for r in rows)
    assert total_members <= 8 * 128
    # clone families are same-vector (cosine 1 >= tau) and co-cluster; every
    # family with >= 2 capped members loses all but its tie-broken keeper.
    # Worst capped mix (cluster of ~70 originals -> 58 two-member families)
    # still removes >= 40% of capped members; denser mixes remove more.
    assert total_removed >= total_members * 0.4, (total_removed, total_members)
    # and every cluster with duplicate mass actually pruned something
    for r in rows:
        if r.n_members >= 2 * (n_src // 8):  # has clone families in the cap
            assert r.n_removed > 0, r
