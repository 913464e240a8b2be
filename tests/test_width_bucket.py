"""Native width_bucket vs the integer-cents emulation (round 9).

The registered query (agg_width_bucket_histogram) buckets with pure
integer math so Spark and DuckDB agree bit-for-bit; Spark's NATIVE
width_bucket computes the same partition in double arithmetic. This test
pins their equality over the exact bucket edges, off-by-one-cent
neighbours, and extremes — the places float width math could diverge.
"""

from __future__ import annotations

from pyspark.sql import functions as F

LO, HI, N = 200_000, 40_000_000, 8


def test_native_width_bucket_matches_integer_emulation(spark):
    w = (HI - LO) // N  # bucket width in cents (divides exactly: 4975000)
    edges = [LO + i * w for i in range(N + 1)]
    vals = sorted(
        {0, 1, LO - 1, LO, LO + 1, HI - 1, HI, HI + 1, 12_345_678, 39_999_999}
        | {e for e in edges}
        | {e - 1 for e in edges}
        | {e + 1 for e in edges}
    )
    df = spark.createDataFrame([(v,) for v in vals], "cents long")
    em = (
        F.when(F.col("cents") < LO, F.lit(0))
        .when(F.col("cents") >= HI, F.lit(N + 1))
        .otherwise(F.expr(f"1 + (cents - {LO}) * {N} DIV {HI - LO}"))
    )
    native = F.expr(f"width_bucket(CAST(cents AS DOUBLE), {LO}, {HI}, {N})")
    rows = df.select(
        "cents", em.cast("long").alias("em"), native.alias("nat")
    ).collect()
    for r in rows:
        assert r.em == r.nat, (r.cents, r.em, r.nat)
    # the full 0..N+1 bucket range is exercised
    assert {r.em for r in rows} == set(range(N + 2))
