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


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
    if name == "events" and dict(df.dtypes).get("ts") == "bigint":
        # With spark.sql.legacy.parquet.nanosAsLong the TIMESTAMP(NANOS)
        # column arrives as a nanos-since-epoch long; truncate to micros
        # exactly like DuckDB's TIMESTAMP_NS -> TIMESTAMP read path so the
        # oracle sees identical values.
        df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    return df


def register_tables(spark: SparkSession, sf_dir: str = DEFAULT_SF_DIR) -> dict[str, DataFrame]:
    """Register every testdata table as a temp view; returns name → DataFrame."""
    out: dict[str, DataFrame] = {}
    for name in TABLES:
        df = load_table(spark, sf_dir, name)
        df.createOrReplaceTempView(name)
        out[name] = df
    return out
