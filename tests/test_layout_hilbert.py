"""Hilbert layout pins (round 9).

Three layers: (1) the Python reference walk IS a Hilbert curve
(bijective, unit-step adjacent — a wrong rotation variant cannot pass);
(2) the packed-BIGINT SQL fold equals that reference in Spark (the DuckDB
side is equality-pinned by the registered oracle itself); (3) the
registered query's 32 curve segments all bound BOTH dimensions.
"""

from __future__ import annotations

import random

from pyspark.sql import functions as F

from apache_hive_1_2_2_src_spark.extensions.layout import (
    hilbert_fold_sql,
    hilbert_xy2d_py,
)


def test_python_reference_is_a_hilbert_curve():
    order = 5  # exhaustive 32x32 grid
    n = 1 << order
    pos = {}
    for x in range(n):
        for y in range(n):
            d = hilbert_xy2d_py(x, y, bits=order)
            assert d not in pos, "not injective"
            pos[d] = (x, y)
    assert len(pos) == n * n  # bijective onto [0, n^2)
    for i in range(n * n - 1):
        (x0, y0), (x1, y1) = pos[i], pos[i + 1]
        assert abs(x0 - x1) + abs(y0 - y1) == 1, (i, pos[i], pos[i + 1])


def test_sql_fold_matches_python_reference(spark):
    random.seed(11)
    pts = [(random.randrange(4096), random.randrange(4096)) for _ in range(300)]
    pts += [(0, 0), (4095, 4095), (0, 4095), (4095, 0), (1, 0), (0, 1)]
    df = spark.createDataFrame(pts, "sx long, sy long")
    rows = df.selectExpr(
        "sx", "sy", f"{hilbert_fold_sql('sx', 'sy', 'spark')} AS d"
    ).collect()
    for r in rows:
        assert r.d == hilbert_xy2d_py(r.sx, r.sy), (r.sx, r.sy)


def test_hilbert_buckets_bound_both_dimensions(spark):
    from apache_hive_1_2_2_src_spark.registry import load_all

    rows = load_all()["layout_hilbert_clustering"].build(
        spark, "/root/testdata/sf0.001"
    ).collect()
    assert len(rows) > 8
    for r in rows:
        # a 1/32 Hilbert segment covers area 1/32 and is CONNECTED; its
        # bounding box never spans half of either dimension (Morton's seam
        # jumps are exactly what this rules out)
        assert r.x_span_frac <= 0.5, (r.hbucket, r.x_span_frac)
        assert r.y_span_frac <= 0.5, (r.hbucket, r.y_span_frac)


def test_hilbert_layout_recipe_produces_clustered_partitions(spark):
    """The write recipe's range partitioning makes every partition a
    contiguous Hilbert span: per-partition code ranges never overlap."""
    from apache_hive_1_2_2_src_spark.extensions.layout import hilbert_layout
    from apache_hive_1_2_2_src_spark.tables import load_table

    li = load_table(spark, "/root/testdata/sf0.001", "lineitem").select(
        "l_orderkey", "l_partkey"
    )
    out = hilbert_layout(li, "l_orderkey", "l_partkey", 8)
    parts = (
        out.select(F.spark_partition_id().alias("pid"), "__hilbert")
        .groupBy("pid")
        .agg(F.min("__hilbert").alias("lo"), F.max("__hilbert").alias("hi"))
        .orderBy("lo")
        .collect()
    )
    assert len(parts) > 1
    for a, b in zip(parts, parts[1:]):
        assert a.hi <= b.lo, (a, b)  # disjoint contiguous spans


def test_hilbert_beats_morton_on_row_balanced_range_splits(spark):
    """Where the locality advantage actually lives: ALIGNED top-bit
    segments tile identically for both curves (measured equal), but the
    write recipe's row-balanced repartitionByRange cuts the curve at
    arbitrary code boundaries — a Morton cut can straddle the seam and
    produce a file spanning ~the whole x range, while every Hilbert range
    is connected. Measured on sf0.01 lineitem, 32 files: Morton worst
    combined span ≈1.16, Hilbert ≈0.50."""
    from apache_hive_1_2_2_src_spark.extensions.layout import (
        _scale_expr,
        hilbert_fold_sql,
        morton32,
    )
    from apache_hive_1_2_2_src_spark.tables import load_table

    li = load_table(spark, "/root/testdata/sf0.01", "lineitem").select(
        F.col("l_orderkey").alias("x"), F.col("l_partkey").alias("y")
    )
    ext = li.agg(
        F.min("x").alias("xmin"), F.max("x").alias("xmax"),
        F.min("y").alias("ymin"), F.max("y").alias("ymax"),
    )
    sc = li.crossJoin(F.broadcast(ext)).select(
        F.expr(_scale_expr("x", "xmin", "xmax", 4095)).alias("sx"),
        F.expr(_scale_expr("y", "ymin", "ymax", 4095)).alias("sy"),
    )
    both = sc.select(
        "sx", "sy",
        morton32(F.col("sx"), F.col("sy")).alias("m"),
        F.expr(hilbert_fold_sql("sx", "sy", "spark")).alias("h"),
    ).cache()
    try:
        spans = {}
        for code in ("m", "h"):
            parts = (
                both.repartitionByRange(32, F.col(code))
                .select(F.spark_partition_id().alias("pid"), "sx", "sy")
                .groupBy("pid")
                .agg(
                    (
                        (F.max("sx") - F.min("sx")) / 4095.0
                        + (F.max("sy") - F.min("sy")) / 4095.0
                    ).alias("s")
                )
                .collect()
            )
            vals = [r.s for r in parts]
            spans[code] = (sum(vals) / len(vals), max(vals))
        m_avg, m_max = spans["m"]
        h_avg, h_max = spans["h"]
        assert h_max <= 0.65, spans       # every Hilbert file stays compact
        assert m_max >= 0.90, spans       # a Morton file straddles the seam
        assert h_avg < m_avg, spans
    finally:
        both.unpersist()
