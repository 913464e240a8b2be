"""Round-14 operator pins: two-level IVF recall, distributed-NTILE helper
equivalence, and the steps-trainer k>=8 smoke."""

from __future__ import annotations

from pyspark.sql import functions as F

from tests.conftest import SF_DIR


def test_two_level_ivf_recall_at_equal_probe_budget(spark):
    """The two-level index (4 coarse x 4 sub, probe 2x2 -> ~N/4 scanned)
    must recall at least as much of the exact top-3 as the flat trained
    IVF (k=8, nprobe=2 -> ~N/4 scanned) it shares its budget with."""
    from pyspark.sql.window import Window

    from apache_hive_1_2_2_src_spark.extensions.similarity import (
        _KMQ_ITERS,
        _KMQ_K,
        _TL_Q_MIN,
        _cos,
        _ivf_probe2_report,
        ivf_two_level_topk,
        kmeans_centroids_quantized,
    )
    from apache_hive_1_2_2_src_spark.tables import load_table

    e = load_table(spark, SF_DIR, "embeddings")
    q = e.filter(F.col("vec_id") >= _TL_Q_MIN).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("qe")
    )
    w = Window.partitionBy("query_id").orderBy(
        _cos(F.col("qe"), F.col("embedding")).desc(), F.col("vec_id")
    )
    exact = {
        (r.query_id, r.vec_id)
        for r in F.broadcast(q)
        .join(e, F.col("vec_id") != F.col("query_id"))
        .withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= 3)
        .collect()
    }
    assert len(exact) == 30

    flat_cent = kmeans_centroids_quantized(e, _KMQ_K, _KMQ_ITERS)
    flat = {
        (r.query_id, r.cand_id)
        for r in _ivf_probe2_report(e, F.broadcast(flat_cent)).collect()
    }
    tl = {
        (r.query_id, r.cand_id) for r in ivf_two_level_topk(e).collect()
    }
    tl_hits, flat_hits = len(tl & exact), len(flat & exact)
    assert tl_hits >= flat_hits, (tl_hits, flat_hits)
    assert tl_hits > 0
