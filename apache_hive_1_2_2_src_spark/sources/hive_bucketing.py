"""Hive-1.2-compatible bucketing: compute Hive's bucket ids inside Spark,
and write flat bucketed layouts Hive 1.2 can read bucket-aware.

SURVEY §1.1 / SCALE.md §interop establish the hash mismatch: Spark's
``bucketBy`` routes rows by Murmur3 while Hive 1.2 buckets by
``ObjectInspectorUtils.hashCode`` (reference anchors:
``serde2/objectinspector/ObjectInspectorUtils.java`` — ``intValue`` for
ints, the Java ``String.hashCode`` 31-fold for strings;
``ql/exec/ReduceSinkOperator`` routes with ``(hash & Integer.MAX_VALUE) %
numBuckets``). Mixing the two layouts silently misplaces rows. This module
makes the boundary crossable in the Hive-ward direction:

- ``hive_string_hash(col)`` / ``hive_int_hash(col)`` — Hive's hash as pure
  Spark codegen expressions (the string fold runs as a higher-order
  ``aggregate`` over code points, mod-2^32 each step so the BIGINT
  accumulator never overflows; the low 31 bits of the unsigned value equal
  Java's ``hash & Integer.MAX_VALUE``).
- ``hive_bucket_id(col, n, kind)`` — the resulting bucket id.
- ``write_hive_bucketed(df, key, n, path)`` — a FLAT directory of exactly
  ``n`` files named ``000000_0 … 00000{n-1}_0`` where file *i* holds
  precisely the rows Hive assigns to bucket *i* (Hive 1.2 maps buckets to
  files by lexicographic name order) — i.e. a layout that satisfies the
  ``CLUSTERED BY`` contract, which tests/test_bucketing_interop.py proves
  Spark's own ``bucketBy`` does NOT.

Only ASCII/Latin-1-safe strings are exact: the Spark fold uses ``ascii()``
code points; Java hashes UTF-16 code units. They agree for all codepoints
< 128 (the tesdata corpus and typical key columns). The registered query
pins both hash families against a DuckDB ``list_reduce`` replica of the
same fold — two independent implementations of the Java spec.

Scale: the bucket id is one codegen expression; the write shuffles once
(repartition on the bucket id); migrating a 100 TB Hive table INTO Spark
``bucketBy`` (or out of it) stays a one-time rewrite either way — this
module just means the rewrite can go in either direction.
"""

from __future__ import annotations

import glob
import os
import shutil

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from apache_hive_1_2_2_src_spark.registry import register
from apache_hive_1_2_2_src_spark.tables import load_table

_2_32 = 4_294_967_296
_2_31 = 2_147_483_648


def hive_string_hash(col: str) -> Column:
    """Java ``String.hashCode`` (= Hive 1.2 Text hash) as unsigned mod 2^32.

    ``h = Σ s[i]·31^(n-1-i)`` with int32 wraparound — computed by folding
    ``acc·31 + codepoint`` mod 2^32 (keeps the BIGINT accumulator < 1.4e11,
    far from overflow). Exact for codepoints < 128 (ascii() = UTF-16 unit).
    """
    fold = (
        f"aggregate(transform(sequence(1, length({col})), "
        f"i -> ascii(substring({col}, i, 1))), "
        f"CAST(0 AS BIGINT), (acc, x) -> (acc * 31 + x) % {_2_32})"
    )
    # sequence(1, 0) is DESCENDING [1, 0] in Spark, not empty — guard "".
    return F.when(F.length(col) == 0, F.lit(0).cast("long")).otherwise(F.expr(fold))


def hive_int_hash(col: str) -> Column:
    """Hive 1.2 int/long hash: the value itself (IntWritable.hashCode),
    as unsigned mod 2^32 so the bucket math below is sign-correct."""
    return F.pmod(F.col(col).cast("long"), F.lit(_2_32))


def hive_bucket_id(col: str, n_buckets: int, kind: str = "string") -> Column:
    """Hive's ``(hash & Integer.MAX_VALUE) % numBuckets``: masking bit 31
    of the unsigned 32-bit value is exactly mod 2^31."""
    h = hive_string_hash(col) if kind == "string" else hive_int_hash(col)
    return ((h % _2_31) % n_buckets).cast("int")


def write_hive_bucketed(
    df: DataFrame, key: str, n_buckets: int, path: str, kind: str = "string"
) -> None:
    """Write a flat Hive-1.2-readable bucketed layout: n_buckets files,
    ``000000_0``-style names in bucket order, file i = Hive bucket i.

    partitionBy gives exact bucket→directory routing (a plain
    ``repartition(n, col)`` re-hashes the bucket id with Spark's hash, so
    file order would NOT be bucket order); the rename pass then flattens
    directories into Hive's positional file naming. Empty buckets still
    get a file (Hive's reader requires all n present)."""
    staging = path + ".__staging"
    (
        df.withColumn("__hb", hive_bucket_id(key, n_buckets, kind))
        .repartition(n_buckets, "__hb")
        .write.mode("overwrite")
        .partitionBy("__hb")
        .parquet(staging)
    )
    os.makedirs(path, exist_ok=True)
    for b in range(n_buckets):
        files = sorted(glob.glob(os.path.join(staging, f"__hb={b}", "*.parquet")))
        dest = os.path.join(path, f"{b:06d}_0")
        if files:
            # one file per bucket: partitionBy+repartition(n, __hb) puts the
            # whole bucket in one task's output file
            shutil.move(files[0], dest)
            for extra in files[1:]:  # defensive: merge would be needed
                raise RuntimeError(f"bucket {b} split across files: {extra}")
        else:
            # bucket files carry the full row schema (partitionBy strips
            # only __hb); an empty bucket still needs a schema-bearing file
            df.limit(0).write.mode("overwrite").parquet(
                os.path.join(staging, "__empty")
            )
            src = sorted(
                glob.glob(os.path.join(staging, "__empty", "*.parquet"))
            )[0]
            shutil.move(src, dest)
    shutil.rmtree(staging, ignore_errors=True)


@register(
    "hive_bucket_id_compat",
    # Independent DuckDB replica of the Java spec: the same 31-fold via
    # list_reduce (prepend-0 gives the explicit zero accumulator) — two
    # implementations of String.hashCode that must agree value-for-value.
    oracle=f"""
    WITH h AS (
      SELECT o_orderkey,
             CASE WHEN length(o_orderpriority) = 0 THEN 0
                  ELSE list_reduce(
                    list_prepend(CAST(0 AS BIGINT), list_transform(
                      range(1, length(o_orderpriority) + 1),
                      i -> CAST(ord(substr(o_orderpriority, i, 1)) AS BIGINT))),
                    (a, b) -> (a * 31 + b) % {_2_32})
             END AS sh,
             o_orderkey % {_2_32} AS ih
      FROM orders
    ),
    b AS (
      SELECT CAST((sh % {_2_31}) % 16 AS INT) AS str_bucket,
             CAST((ih % {_2_31}) % 16 AS INT) AS int_bucket,
             sh
      FROM h
    )
    SELECT str_bucket, int_bucket,
           CAST(COUNT(*) AS BIGINT) AS n,
           CAST(SUM(sh) AS BIGINT) AS hash_checksum
    FROM b GROUP BY str_bucket, int_bucket
    """,
    doc="Hive-1.2 bucket-id computation inside Spark (ObjectInspectorUtils."
    "hashCode parity): Java String.hashCode as a codegen aggregate fold "
    "over orders.o_orderpriority and the int identity hash over "
    "o_orderkey, both through Hive's (hash & Integer.MAX_VALUE) % 16 "
    "routing; output is the 2-D bucket histogram + an exact hash checksum "
    "so one wrong code point breaks the hash. The oracle recomputes the "
    "Java spec independently in DuckDB (list_reduce fold). This is the "
    "expression write_hive_bucketed() routes with — the Hive-ward half of "
    "the interop contract whose Spark-ward half (bucketBy mismatch) is "
    "pinned in tests/test_bucketing_interop.py.",
    tags=("source", "bucketing", "interop"),
)
def hive_bucket_id_compat(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_orderpriority")
    b = o.select(
        hive_bucket_id("o_orderpriority", 16, "string").alias("str_bucket"),
        hive_bucket_id("o_orderkey", 16, "int").alias("int_bucket"),
        hive_string_hash("o_orderpriority").alias("sh"),
    )
    return b.groupBy("str_bucket", "int_bucket").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("sh").cast("long").alias("hash_checksum"),
    )
