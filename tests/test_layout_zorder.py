"""Z-order layout: morton bit math pins + the PARQUET footer-statistics
proof that the clustering actually enables row-group skipping (the claim
extensions/layout.py makes; Hive 1.2.2 has no analogue — Delta/Iceberg
ZORDER is the modern equivalent)."""

from __future__ import annotations

import glob

import pyarrow.parquet as pq
import pytest
from pyspark.sql import functions as F

from apache_hive_1_2_2_src_spark.extensions.layout import morton32, zorder_layout
from apache_hive_1_2_2_src_spark.tables import load_table

SF_DIR = "/root/testdata/sf0.001"


def test_morton32_hand_computed(spark):
    # x=0b1010 -> even bits 2,6 ; y=0b0110 -> odd bits 3,5 ; total 108.
    row = (
        spark.range(1)
        .select(morton32(F.lit(10), F.lit(6)).alias("m"))
        .collect()[0]
    )
    assert row.m == 4 + 64 + 8 + 32 == 108
    # Interleave is a bijection on 16-bit pairs: distinct inputs, distinct codes.
    df = spark.range(256).select(
        (F.col("id") % 16).alias("x"), (F.col("id") / 16).cast("int").alias("y")
    )
    n = df.select(morton32(F.col("x"), F.col("y")).alias("m")).distinct().count()
    assert n == 256


def _rowgroup_spans(path_glob: str, col: str) -> list[tuple[int, int]]:
    spans = []
    for f in glob.glob(path_glob):
        md = pq.ParquetFile(f).metadata
        idx = {md.schema.column(i).name: i for i in range(md.num_columns)}[col]
        for rg in range(md.num_row_groups):
            st = md.row_group(rg).column(idx).statistics
            assert st is not None and st.has_min_max
            spans.append((st.min, st.max))
    return spans


def test_parquet_rowgroup_skipping_vs_single_column_sort(spark, tmp_path):
    """The data-skipping claim, measured from real parquet footers: under a
    z-order layout every file bounds BOTH columns, so a predicate on the
    SECOND column (the one a single-column sort ignores) overlaps far fewer
    row groups."""
    li = load_table(spark, SF_DIR, "lineitem").select("l_orderkey", "l_partkey")
    lo, hi = li.agg(F.min("l_partkey"), F.max("l_partkey")).collect()[0]

    zdir = str(tmp_path / "zorder")
    zorder_layout(li, "l_orderkey", "l_partkey", 8).drop("__morton").write.parquet(
        zdir
    )
    xdir = str(tmp_path / "xsort")
    li.repartitionByRange(8, "l_orderkey").sortWithinPartitions(
        "l_orderkey"
    ).write.parquet(xdir)

    z_spans = _rowgroup_spans(zdir + "/*.parquet", "l_partkey")
    x_spans = _rowgroup_spans(xdir + "/*.parquet", "l_partkey")
    assert len(z_spans) >= 4 and len(x_spans) >= 4

    rng = max(hi - lo, 1)
    z_frac = sum((mx - mn) / rng for mn, mx in z_spans) / len(z_spans)
    x_frac = sum((mx - mn) / rng for mn, mx in x_spans) / len(x_spans)
    # x-sorted files know nothing about partkey: each covers ~the full range.
    assert x_frac > 0.9
    # z-ordered files bound partkey too (8 files -> top 3 morton bits pin
    # y to ~1/4 of its range per aligned curve segment; range-partition
    # boundaries are approximate, so allow slack).
    assert z_frac < 0.6 * x_frac

    # A y-only band predicate (middle 10% of partkey) can skip row groups
    # under z-order, and cannot skip ANY under the x-sort.
    band_lo = lo + int(0.45 * rng)
    band_hi = lo + int(0.55 * rng)
    z_hit = sum(1 for mn, mx in z_spans if not (mx < band_lo or mn > band_hi))
    x_hit = sum(1 for mn, mx in x_spans if not (mx < band_lo or mn > band_hi))
    assert x_hit == len(x_spans)
    assert z_hit < len(z_spans)

    # Correctness: the clustered rewrite is a permutation, not a mutation.
    z_back = spark.read.parquet(zdir)
    assert z_back.count() == li.count()
    orig_sum = li.agg(F.sum("l_partkey"), F.sum("l_orderkey")).collect()[0]
    back_sum = z_back.agg(F.sum("l_partkey"), F.sum("l_orderkey")).collect()[0]
    assert tuple(orig_sum) == tuple(back_sum)


def test_zorder_query_spans_bounded(spark, registry):
    """The registered layout metric's own guarantee: with top-5-bit buckets
    y is pinned to <=1/8 of its range and x to <=1/4 (+1 quantum)."""
    df = registry["layout_zorder_clustering"].build(spark, SF_DIR)
    rows = df.collect()
    assert 1 <= len(rows) <= 32
    for r in rows:
        assert r.x_span_frac <= 0.25 + 2e-5
        assert r.y_span_frac <= 0.125 + 2e-5


def test_zorder_constant_column_degenerate(spark):
    """xmax == xmin must not divide by zero (greatest-1 guard): the morton
    code collapses to the y-only bits and bucketing still works."""
    df = spark.createDataFrame(
        [(7, y) for y in range(100)], "x long, y long"
    )
    out = zorder_layout(df, "x", "y", 4)
    rows = out.collect()
    assert len(rows) == 100
    assert {r.x for r in rows} == {7}
    # morton of (sx=0, sy) has only odd bits set; values still distinct per y
    assert len({r["__morton"] for r in rows}) == 100


def test_scale16_survives_int32_inputs_with_wide_range(spark):
    """ADVICE round 8: with native INT columns and a range > 32767,
    (v - vmin) * 65535 in int32 arithmetic silently wraps (ANSI off).
    The expression must widen to BIGINT internally: scaled values stay in
    [0, 65535] and are monotone in v even at int32 extremes."""
    from pyspark.sql import functions as F

    from apache_hive_1_2_2_src_spark.extensions.layout import _scale16_expr

    lo, hi = -(2**31), 2**31 - 1
    vals = [lo, lo // 2, -1, 0, 1, 40000, 2**30, hi - 1, hi]
    df = spark.createDataFrame([(v,) for v in vals], "v int").withColumn(
        "vmin", F.lit(lo).cast("int")
    ).withColumn("vmax", F.lit(hi).cast("int"))
    got = [
        (r.v, r.s)
        for r in df.select("v", F.expr(_scale16_expr("v", "vmin", "vmax")).alias("s"))
        .orderBy("v")
        .collect()
    ]
    for v, s in got:
        expected = ((v - lo) * 65535) // (hi - lo)  # exact python bigints
        assert s == expected, (v, s, expected)
        assert 0 <= s <= 65535
    scaled = [s for _, s in got]
    assert scaled == sorted(scaled)  # monotone, no wraparound
    assert scaled[0] == 0 and scaled[-1] == 65535


def test_zorder3d_buckets_bound_every_dimension(spark):
    """Top-6-bit buckets of the 30-bit 3-D Morton code pin each dim's top
    two bits: every bucket spans <= 1/4 (+1 quantum) of ALL THREE ranges."""
    from apache_hive_1_2_2_src_spark.registry import load_all

    reg = load_all()
    rows = reg["layout_zorder3d_clustering"].build(
        spark, "/root/testdata/sf0.001"
    ).collect()
    assert len(rows) > 1
    for r in rows:
        for dim in ("x_span_frac", "y_span_frac", "z_span_frac"):
            assert r[dim] <= 0.25 + 2 / 1023.0, (r["zbucket"], dim, r[dim])


def test_layout_recipes_refuse_int64_wrapping_ranges(spark):
    """ADVICE round 9: (v - vmin) * 65535 wraps int64 silently (ANSI off)
    once the column range exceeds (2^63-1) DIV 65535 (~2^47) — garbage
    curve codes with no error. The public write recipes collect the extent
    first and must RAISE on such ranges instead of clustering on noise;
    an all-NULL key column is refused the same way."""
    import pytest

    from apache_hive_1_2_2_src_spark.extensions.layout import (
        _check_scale_range,
        hilbert_layout,
    )

    wide = spark.createDataFrame(
        [(0, 0), ((1 << 62), 1)], "x long, y long"
    )
    with pytest.raises(ValueError, match="int64-safe limit"):
        zorder_layout(wide, "x", "y", 4)
    with pytest.raises(ValueError, match="int64-safe limit"):
        hilbert_layout(wide, "x", "y", 4)

    # boundary: exactly at the limit passes, one above raises
    limit = ((1 << 63) - 1) // 65535
    _check_scale_range({"xmin": 0, "xmax": limit, "ymin": 0, "ymax": 1}, 65535)
    with pytest.raises(ValueError, match="int64-safe limit"):
        _check_scale_range(
            {"xmin": 0, "xmax": limit + 1, "ymin": 0, "ymax": 1}, 65535
        )
    with pytest.raises(ValueError, match="all-NULL"):
        _check_scale_range({"xmin": None, "xmax": None, "ymin": 0, "ymax": 1}, 65535)

    # sanity: the safe path is unaffected (codes still produced)
    ok = spark.createDataFrame([(i, i * 3) for i in range(50)], "x long, y long")
    assert zorder_layout(ok, "x", "y", 2).count() == 50


def test_layout_recipes_refuse_non_integer_keys(spark):
    """The write recipes inline collected bounds as bare SQL literals, so
    only integer keys round-trip; a DATE key must raise a clear TypeError
    (ADVICE r10 low) instead of producing an unparseable/silently-wrong
    literal. The message tells the user the BIGINT-cast escape hatch."""
    import pytest

    from apache_hive_1_2_2_src_spark.extensions.layout import (
        hilbert_layout,
        zorder_layout,
    )
    from pyspark.sql import functions as F

    df = spark.range(100).select(
        F.col("id").alias("x"),
        F.date_add(F.lit("2024-01-01").cast("date"), F.col("id").cast("int")).alias("d"),
    )
    for recipe in (zorder_layout, hilbert_layout):
        with pytest.raises(TypeError, match="non-integer"):
            recipe(df, "x", "d", 4)
    # the documented escape hatch works
    ok = zorder_layout(
        df.withColumn("d", F.datediff("d", F.lit("1970-01-01"))), "x", "d", 4
    )
    assert ok.count() == 100
