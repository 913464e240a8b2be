"""SemDeDup keep-most-atypical rule on hand-built geometry (round 9).

The oracle certifies Spark↔DuckDB equivalence; this test certifies the
SEMANTICS against a corpus whose correct answer is derivable by hand:
8 orthogonal centroids plus two vectors near centroid 0. Every pair in
cluster 0 is a near-dup, and the rule must remove the MORE TYPICAL member
of each pair (higher cosine to centroid): the prototype itself (ccos=1)
loses both its pairs, the mid vector loses to the far one, so only the
most atypical member survives.
"""

from __future__ import annotations

import math


def _unit(dim: int, i: int) -> list[float]:
    v = [0.0] * dim
    v[i] = 1.0
    return v


def _mix(dim: int, a: float, b: float) -> list[float]:
    """a·e0 + b·e1, normalized."""
    n = math.sqrt(a * a + b * b)
    v = [0.0] * dim
    v[0], v[1] = a / n, b / n
    return v


def test_semdedup_removes_more_typical_member(spark, tmp_path):
    from apache_hive_1_2_2_src_spark.registry import load_all

    dim = 16
    rows = [(i, _unit(dim, i), 0) for i in range(8)]
    rows.append((8, _mix(dim, 0.95, 0.32), 0))   # ccos≈0.95 to centroid 0
    rows.append((9, _mix(dim, 0.90, 0.44), 0))   # ccos≈0.90 — most atypical
    df = spark.createDataFrame(
        rows, "vec_id long, embedding array<float>, label int"
    )
    sf_dir = str(tmp_path)
    df.write.parquet(f"{sf_dir}/embeddings.parquet")

    got = {
        r.cid: r
        for r in load_all()["dedup_semdedup_prune"].build(spark, sf_dir).collect()
    }
    c0 = got[0]
    # cluster 0 = {centroid 0, vec 8, vec 9}; pairs (0,8),(0,9),(8,9) all
    # above tau; losers: 0 (vs 8), 0 (vs 9), 8 (vs 9) -> only 9 survives
    assert (c0.n_members, c0.n_removed, c0.n_kept) == (3, 2, 1)
    assert c0.removed_id_sum == 0 + 8
    assert c0.kept_id_sum == 9
    # the orthogonal singleton clusters are untouched
    for cid in range(1, 8):
        r = got[cid]
        assert (r.n_members, r.n_removed, r.n_kept) == (1, 0, 1)
        assert r.kept_id_sum == cid


def test_clustering_pin_lifetime(spark):
    """At most ONE pinned clustering per session: a second call releases
    the first (the dedup-module cache-lifetime contract)."""
    from apache_hive_1_2_2_src_spark.extensions import similarity as sim

    df1 = spark.range(3).persist()  # stand-ins; _pin_clustering persists
    df1.unpersist()
    a = sim._pin_clustering(spark.range(4))
    assert len(sim._PINNED_CLUSTERING) == 1 and sim._PINNED_CLUSTERING[0] is a
    b = sim._pin_clustering(spark.range(5))
    assert len(sim._PINNED_CLUSTERING) == 1 and sim._PINNED_CLUSTERING[0] is b
    assert a.storageLevel.useMemory is False  # released
    assert b.storageLevel.useMemory is True
    sim._PINNED_CLUSTERING.pop().unpersist(blocking=False)


def test_stage_payloads_distinct_dirs_same_basename(spark, tmp_path):
    """Two data dirs with the SAME basename must not share a staged
    payload table (round-9 review finding: the cache key was the
    basename)."""
    import pyspark.sql.functions as F

    from apache_hive_1_2_2_src_spark.extensions.multimodal import stage_payloads
    from apache_hive_1_2_2_src_spark.tables import load_table

    src = load_table(spark, "/root/testdata/sf0.001", "documents")
    a_dir, b_dir = tmp_path / "a" / "sfX", tmp_path / "b" / "sfX"
    src.filter(F.col("doc_id") < 10).write.parquet(f"{a_dir}/documents.parquet")
    src.filter(F.col("doc_id") < 30).write.parquet(f"{b_dir}/documents.parquet")

    pa = stage_payloads(spark, str(a_dir), "bmp")
    pb = stage_payloads(spark, str(b_dir), "bmp")
    assert pa != pb
    assert spark.read.parquet(pa).count() == 10
    assert spark.read.parquet(pb).count() == 30
