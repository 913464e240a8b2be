"""Hive-vs-Spark bucketing interop pins (SCALE.md "Hive-bucketing interop").

Hive 1.2 places a row in bucket ``(ObjectInspectorUtils.hashCode(key) &
Integer.MAX_VALUE) % n`` — for an int key the hash IS the int value
(serde2/objectinspector/ObjectInspectorUtils.java anchor per SURVEY §1.1).
Spark places it in ``pmod(murmur3_hash(key, seed=42), n)`` (Spark's
``HashPartitioning.partitionIdExpression``; the SQL ``hash()`` builtin is
the same murmur3/seed-42). These tests pin that (a) the two placements
genuinely disagree — so declaring Spark bucket metadata over a
Hive-written layout would mis-prune and silently drop rows — and (b) the
supported interop path (read a foreign-bucketed layout as PLAIN files)
stays exact.
"""

from __future__ import annotations

import os
import tempfile

from pyspark.sql import functions as F


def test_spark_and_hive_bucket_placement_disagree(spark):
    """pmod(hash(id), 8) != id % 8 for most int keys: bucket metadata is
    not transferable between the engines in either direction."""
    n = 8
    df = spark.range(0, 1000).select(
        F.col("id").cast("int").alias("id"),
        F.pmod(F.hash(F.col("id").cast("int")), F.lit(n)).alias("spark_bucket"),
        # Hive 1.2 int hash == the int value; ids here are non-negative so
        # the & Integer.MAX_VALUE mask is the identity.
        (F.col("id") % n).cast("int").alias("hive_bucket"),
    )
    disagree = df.filter(F.col("spark_bucket") != F.col("hive_bucket")).count()
    # If the placements agreed, bucket pruning would transfer; pin that
    # they don't (murmur3 scatters ~7/8 of keys off the identity bucket).
    assert disagree > 500, f"only {disagree}/1000 keys moved buckets"


def test_hive_bucketed_layout_reads_exact_as_plain_files(spark):
    """A directory laid out by HIVE's bucket rule (one file per id%4
    bucket) must be read as plain unbucketed files: full row count and
    checksum survive, while a Spark-bucket-pruned read of the same
    layout would drop rows (previous test: the placements disagree)."""
    src = spark.range(0, 400).select(
        F.col("id").cast("int").alias("id"),
        (F.col("id") * 3).cast("long").alias("v"),
    )
    with tempfile.TemporaryDirectory() as d:
        # Simulate a Hive writer: rows routed to files by Hive's hash.
        for b in range(4):
            src.filter(F.col("id") % 4 == b).coalesce(1).write.mode("overwrite").parquet(
                os.path.join(d, f"bucket_{b:05d}")
            )
        back = spark.read.parquet(*[os.path.join(d, f"bucket_{b:05d}") for b in range(4)])
        got = back.agg(
            F.count("*").alias("n"), F.sum("v").cast("long").alias("s")
        ).first()
        assert got["n"] == 400
        assert got["s"] == 3 * (399 * 400) // 2

        # The trap the SCALE.md rule forbids, made concrete: a Spark
        # bucket-pruned scan for id=7 would look only in
        # pmod(hash(7), 4) — if that differs from Hive's 7%4=3 placement,
        # the row is invisible. Assert the mismatch exists for this key
        # set so the doc's "silently DROP rows" claim is literal.
        sb = spark.range(0, 400).select(
            F.pmod(F.hash(F.col("id").cast("int")), F.lit(4)).alias("sb"),
            (F.col("id") % 4).cast("int").alias("hb"),
        )
        assert sb.filter(F.col("sb") != F.col("hb")).count() > 0


def _java_hash(s: str) -> int:
    h = 0
    for ch in s:
        h = (h * 31 + ord(ch)) & 0xFFFFFFFF
    return h


def test_hive_string_hash_matches_java_spec(spark):
    """Round 8: hive_string_hash must equal Java String.hashCode (as
    unsigned mod 2^32) — pinned against hardcoded JVM values and a Python
    reimplementation, including the empty string and 31-overflow cases."""
    from apache_hive_1_2_2_src_spark.sources.hive_bucketing import (
        hive_bucket_id,
        hive_string_hash,
    )

    cases = ["", "a", "ab", "hello", "1-URGENT", "Customer#000000001",
             "a longer string that overflows int32 many times over"]
    df = spark.createDataFrame([(s,) for s in cases], "s string")
    got = {r.s: r.h for r in df.select("s", hive_string_hash("s").alias("h")).collect()}
    assert got[""] == 0
    assert got["ab"] == 3105  # "ab".hashCode()
    assert got["hello"] == 99162322  # "hello".hashCode()
    for s in cases:
        assert got[s] == _java_hash(s), s

    # bucket routing: (h & Integer.MAX_VALUE) % n == (h_u % 2^31) % n
    bid = {r.s: r.b for r in df.select("s", hive_bucket_id("s", 16).alias("b")).collect()}
    for s in cases:
        assert bid[s] == (_java_hash(s) % (1 << 31)) % 16, s


def test_write_hive_bucketed_layout_contract(spark, tmp_path):
    """write_hive_bucketed must produce exactly n positional files where
    file i contains precisely Hive's bucket-i rows (the CLUSTERED BY
    contract a Hive 1.2 reader assumes), losing nothing."""
    import glob as _glob

    from apache_hive_1_2_2_src_spark.sources.hive_bucketing import (
        write_hive_bucketed,
    )
    from apache_hive_1_2_2_src_spark.tables import load_table

    src = (
        load_table(spark, "/root/testdata/sf0.001", "documents")
        .select("doc_id", "source")
        .filter(F.col("doc_id") < 500)
    )
    out = str(tmp_path / "hive_bucketed")
    n = 8
    write_hive_bucketed(src, "source", n, out, kind="string")

    files = sorted(_glob.glob(out + "/*_0"))
    assert [os.path.basename(f) for f in files] == [f"{b:06d}_0" for b in range(n)]

    total = 0
    for b, f in enumerate(files):
        rows = spark.read.parquet(f).collect()
        total += len(rows)
        for r in rows:
            assert (_java_hash(r.source) % (1 << 31)) % n == b, (r.source, b)
    assert total == src.count()


def test_write_hive_bucketed_empty_buckets_still_materialize(spark, tmp_path):
    """With more buckets than distinct keys most buckets are EMPTY — Hive's
    reader still requires all n positional files; each empty file must
    carry the full row schema."""
    from apache_hive_1_2_2_src_spark.sources.hive_bucketing import (
        write_hive_bucketed,
    )

    src = spark.createDataFrame(
        [(i, f"src_{i % 3}") for i in range(60)], "doc_id long, source string"
    )
    out = str(tmp_path / "sparse_buckets")
    n = 16
    write_hive_bucketed(src, "source", n, out, kind="string")
    import glob as _glob

    files = sorted(_glob.glob(out + "/*_0"))
    assert len(files) == n
    total = 0
    occupied = 0
    for b, f in enumerate(files):
        df = spark.read.parquet(f)
        assert df.columns == ["doc_id", "source"]
        rows = df.collect()
        total += len(rows)
        occupied += bool(rows)
        for r in rows:
            assert (_java_hash(r.source) % (1 << 31)) % n == b
    assert total == 60
    assert occupied <= 3  # 3 distinct keys -> at most 3 non-empty buckets
