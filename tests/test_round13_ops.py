"""Round-13 pins: the ADVICE r12 closures (ulp-proof DSIR ln, string
partition typing, validator extras check, cached iso sessions) and the
round's new compositions (tested in their own sections below as they
land)."""

from __future__ import annotations

import random

import duckdb
import pytest

from apache_hive_1_2_2_src_spark.extensions.sampling import _det_ln_floor_sql
from apache_hive_1_2_2_src_spark.sources import hive_bucketing as hb


# ---------------------------------------------------------------- det-ln


def _pairs_for_parity() -> list[tuple[int, int]]:
    rng = random.Random(13)
    pairs = [(1, 1), (2, 1), (1, 2), (3, 1), (1_000_000, 7), (7, 1_000_000)]
    # randomized magnitudes across the whole DSIR operating range
    for _ in range(400):
        num = rng.randrange(1, 10**12)
        den = rng.randrange(1, 10**12)
        pairs.append((num, den))
    # adversarial: num/den engineered so SCALE*ln(num/den) sits within
    # ~1e-9 of an integer — exactly the boundary a 1-ulp libm divergence
    # flips (the ADVICE r12 hazard this template exists to kill)
    import math

    for k in (1, 7, 51082, 109861, 1_186_960):
        den = 10**9
        num = round(den * math.exp(k / 100_000.0))
        for d in (-1, 0, 1):
            if num + d > 0:
                pairs.append((num + d, den))
    return pairs


def test_det_ln_floor_bit_parity_spark_vs_duckdb(spark):
    """The shared-arithmetic ln template must produce BIT-IDENTICAL
    pre-floor doubles (hence identical floors) in Spark and DuckDB for
    every (num, den) — including boundary-adversarial ratios."""
    pairs = _pairs_for_parity()
    expr = _det_ln_floor_sql("num", "den", 100_000)
    values = ", ".join(f"({n}, {d})" for n, d in pairs)
    q = (
        f"SELECT num, den, {expr} AS lb "
        f"FROM (VALUES {values}) AS t(num, den) ORDER BY num, den"
    )
    # Spark's VALUES wants explicit typing via a subquery alias; the same
    # text parses in both dialects.
    srows = [(r.num, r.den, r.lb) for r in spark.sql(q).collect()]
    drows = [tuple(r) for r in duckdb.connect().execute(q).fetchall()]
    assert srows == sorted(drows)
    # sanity: the template tracks true ln to well under the 1e-5 grid
    import math

    for n, d, lb in srows[:50]:
        true = math.floor(100_000 * math.log(n / d))
        assert abs(lb - true) <= 1, (n, d, lb, true)


# ------------------------------------------- partition values are strings


def test_partitioned_read_keeps_string_partition_values(spark, tmp_path):
    """Numeric/date-shaped partition values must come back as the EXACT
    path strings — '05' stays '05' (type inference would make it int 5,
    diverging from read_acid_table_partitioned and the parts-selection
    normalization; ADVICE r12)."""
    n = 2
    df = spark.createDataFrame(
        [(k, v, k * 2) for k, v in enumerate(["05", "7", "2024-01-02"] * 4)],
        "k long, pt string, x long",
    )
    out = str(tmp_path / "strparts")
    hb.write_hive_partitioned_bucketed(df, "pt", "k", n, out, kind="long")
    back = hb.read_hive_partitioned_bucketed(spark, out, "pt", n)
    assert dict(back.dtypes)["pt"] == "string"
    assert sorted({r.pt for r in back.collect()}) == ["05", "2024-01-02", "7"]
    # parts selection matches the zero-padded dir exactly
    one = hb.read_hive_partitioned_bucketed(spark, out, "pt", n, parts=["05"])
    assert {r.pt for r in one.collect()} == {"05"}
    assert one.count() == 4


def test_iso_sessions_are_cached_per_context(spark, tmp_path):
    """_iso_session returns the SAME session object per (context, purpose)
    — session state no longer accumulates per validation (ADVICE r12)."""
    a = hb._iso_session(spark, "string-partitions")
    b = hb._iso_session(spark, "string-partitions")
    c = hb._iso_session(spark, "sorted-scan")
    assert a is b
    assert a is not c
    assert a is not spark


# --------------------------------------- validator rejects extra files


def test_sorted_validator_rejects_extra_positional_file(spark, tmp_path):
    """A stray extra *_0 file must fail validate_hive_sorted_bucketed even
    when called directly (it would shift every later bucket under Hive's
    name-ordered file mapping; ADVICE r12 — the old path only caught it
    inside read_hive_bucketed)."""
    n = 4
    df = spark.createDataFrame([(k, k) for k in range(80)], "k long, x long")
    out = str(tmp_path / "sortedextra")
    hb.write_hive_bucketed(df, "k", n, out, kind="long", sorted_by="k")
    hb.validate_hive_sorted_bucketed(spark, out, n, "k")  # passes clean
    import shutil

    shutil.copy(f"{out}/000000_0", f"{out}/000009_0")
    with pytest.raises(ValueError, match="extra positional files"):
        hb.validate_hive_sorted_bucketed(spark, out, n, "k")


# ---------------------- composed streaming full-layout ACID delta writer


def test_full_layout_delta_writer_shape_retry_and_pruned_lookup(
    spark, tmp_path
):
    """write_partitioned_bucketed_delta must produce EXACTLY the
    part=v/delta_N_N/<n positional files> tree, replace its own delta on
    a same-batch_id retry (never double-append, never touch other
    batches), and the published tree must serve the triple-pruned
    read_acid_full_point lookup with one file per acid dir."""
    import os

    from apache_hive_1_2_2_src_spark.operators.acid import (
        read_acid_full_point,
        read_acid_table_partitioned,
    )
    from apache_hive_1_2_2_src_spark.streaming.windows import (
        write_partitioned_bucketed_delta,
    )

    n = 4
    tbl = str(tmp_path / "flretry")
    os.makedirs(tbl)

    def rows(ids, st):
        return spark.createDataFrame(
            [(f"g{k % 2}", k, st, k * 10, "U") for k in ids],
            "pt string, k long, st string, p long, op string",
        )

    write_partitioned_bucketed_delta(rows(range(8), "A"), tbl, "pt", "k", n, 0)
    write_partitioned_bucketed_delta(rows(range(3), "B"), tbl, "pt", "k", n, 1)
    # retry of batch 1 with corrected content
    write_partitioned_bucketed_delta(rows(range(4), "C"), tbl, "pt", "k", n, 1)

    layout = sorted(
        f"{d}/{x}/{f}"
        for d in os.listdir(tbl)
        if d.startswith("pt=")
        for x in os.listdir(os.path.join(tbl, d))
        if x.startswith("delta_")
        for f in os.listdir(os.path.join(tbl, d, x))
        if f.endswith("_0")
    )
    assert layout == sorted(
        f"pt=g{g}/delta_{v}_{v}/{b:06d}_0"
        for g in (0, 1)
        for v in (1, 2)
        for b in range(n)
    )
    got = {
        (r.pt, r.k): r.st
        for r in read_acid_table_partitioned(spark, tbl, "pt").collect()
    }
    expect = {(f"g{k % 2}", k): ("C" if k < 4 else "A") for k in range(8)}
    assert got == expect
    # triple-pruned point lookup: key 5 -> partition g1, ONE bucket file
    # in each of that partition's two deltas
    snap, n_files = read_acid_full_point(spark, tbl, "pt", "g1", n, 5)
    assert n_files == 2
    row = snap.collect()
    assert len(row) == 1 and row[0].st == "A" and row[0].p == 50
