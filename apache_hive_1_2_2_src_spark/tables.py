"""Catalog layer: register the testdata parquet tables as temp views.

Hive analogue: the Metastore (``metastore/src/java/.../ObjectStore.java``)
holding Table + StorageDescriptor; at query time ``SemanticAnalyzer`` resolves
table names against it. Spark-first answer: `spark.read.parquet` + temp views
(or `enableHiveSupport()` + a real metastore on a cluster — same code path).

Scale note: each table is a directory-backed parquet source, so Catalyst
gets partition discovery, predicate pushdown, and column pruning for free;
at 100 TB the only change is the path (s3://...) and `partitionBy` layout.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

# Semantic confs every query depends on. session.get_session() sets these at
# build time, but an EXTERNAL caller (the correctness driver, a notebook, a
# cluster job) hands us its own SparkSession — so pin them at runtime too.
# All four are runtime-settable (verified: spark.conf.set then read works).
#   - nanosAsLong: testdata events.parquet stores ts as INT64 TIMESTAMP(NANOS)
#     which Spark rejects by default ([PARQUET_TYPE_ILLEGAL]).
#   - UTC + ANSI-off + CORRECTED parser: Hive 1.2.2 semantic parity
#     (TimestampWritable wall-clock reads; NULL-on-bad-cast).
_RUNTIME_CONFS = {
    "spark.sql.legacy.parquet.nanosAsLong": "true",
    "spark.sql.session.timeZone": "UTC",
    "spark.sql.ansi.enabled": "false",
    "spark.sql.legacy.timeParserPolicy": "CORRECTED",
}


def ensure_confs(spark: SparkSession) -> SparkSession:
    """Idempotently pin semantic confs on any SparkSession (driver-safe)."""
    for key, want in _RUNTIME_CONFS.items():
        try:
            if spark.conf.get(key, None) != want:
                spark.conf.set(key, want)
        except Exception:
            # Non-runtime-settable on some builds → best effort; the session
            # factory (session.py) still sets it at build time.
            pass
    return spark


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    ensure_confs(spark)
    df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
    if name == "events":
        # Normalize ts to TimestampType regardless of the physical parquet
        # type — the testdata generator has shipped both INT64 TIMESTAMP(NANOS)
        # (arrives as a nanos bigint under nanosAsLong) and plain
        # timestamp[us] (arrives as TIMESTAMP_NTZ). All downstream consumers,
        # including the streaming readers, depend on this single guard.
        ts_type = dict(df.dtypes).get("ts")
        if ts_type == "bigint":
            # nanos-since-epoch long; truncate to micros exactly like
            # DuckDB's TIMESTAMP_NS -> TIMESTAMP read path.
            df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
        elif ts_type is not None and ts_type != "timestamp":
            # TIMESTAMP_NTZ (or any future variant): wall-clock cast under the
            # pinned UTC session zone — identical values to DuckDB's read.
            df = df.withColumn("ts", F.col("ts").cast("timestamp"))
    return df


def register_tables(spark: SparkSession, sf_dir: str = DEFAULT_SF_DIR) -> dict[str, DataFrame]:
    """Register every testdata table as a temp view; returns name → DataFrame."""
    out: dict[str, DataFrame] = {}
    for name in TABLES:
        df = load_table(spark, sf_dir, name)
        df.createOrReplaceTempView(name)
        out[name] = df
    return out
