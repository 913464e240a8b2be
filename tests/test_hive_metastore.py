"""Real-metastore parity: the same DDL/stats statements the engine runs
against the in-memory catalog (operators/catalog.py) must also run against
an actual Hive metastore (embedded Derby via enableHiveSupport) — the
literal ObjectStore.java code path a cluster deployment uses.

Runs in a subprocess with its own JVM (catalog impl is a startup conf) and
a temp cwd (Derby writes metastore_db/ + derby.log in the working dir).
"""

from __future__ import annotations

import subprocess
import sys
import tempfile

PROBE = r"""
import sys
sys.path.insert(0, %(repo)r)
from apache_hive_1_2_2_src_spark.session import get_session

spark = get_session("hms_test", shuffle_partitions=2, hive=True)
assert spark.conf.get("spark.sql.catalogImplementation") == "hive"
spark.sql("CREATE DATABASE hms_db")
spark.sql("CREATE TABLE hms_db.t (k INT, v STRING) USING PARQUET")
spark.sql("INSERT INTO hms_db.t VALUES (1, 'a'), (2, 'b')")
spark.sql("ANALYZE TABLE hms_db.t COMPUTE STATISTICS")
assert spark.table("hms_db.t").count() == 2
stats = [r.data_type for r in spark.sql("DESCRIBE TABLE EXTENDED hms_db.t").collect()
         if r.col_name == "Statistics"]
assert stats and "2 rows" in stats[0], stats
assert any(t.name == "t" for t in spark.catalog.listTables("hms_db"))
spark.sql("DROP DATABASE hms_db CASCADE")
assert not any(db.name == "hms_db" for db in spark.catalog.listDatabases())

# Literal Hive-format dialect (PARTITIONED BY (c T) STORED AS PARQUET): the
# registered query takes its hive branch under this catalog.
from apache_hive_1_2_2_src_spark.operators.catalog import ddl_stored_as_hive_dialect
row = ddl_stored_as_hive_dialect(spark, "/root/testdata/sf0.001").collect()[0]
assert row.n_rows > 0 and row.n_partitions == 3 and row.alter_ok, row

# RCFile (STORED AS RCFILE — ql/io/RCFile.java + ColumnarSerDe): Spark's
# bundled Hive client reads/writes the real RCFileInput/OutputFormat, so a
# reference user's RCFile tables keep working through this catalog. Values
# must survive the columnar roundtrip exactly.
spark.sql("CREATE DATABASE rc_db")
spark.sql(
    "CREATE TABLE rc_db.t_rc STORED AS RCFILE AS "
    "SELECT id AS k, CAST(id * 1.5 AS DOUBLE) AS x, "
    "CONCAT('s', CAST(id AS STRING)) AS s FROM RANGE(100)"
)
fmt = [r.data_type for r in spark.sql("DESCRIBE FORMATTED rc_db.t_rc").collect()
       if r.col_name == "InputFormat"]
assert fmt == ["org.apache.hadoop.hive.ql.io.RCFileInputFormat"], fmt
back = spark.sql(
    "SELECT COUNT(*) AS n, CAST(SUM(k) AS BIGINT) AS sk, "
    "CAST(SUM(CAST(x AS DECIMAL(18,2))) AS DOUBLE) AS sx, "
    "MIN(s) AS mn FROM rc_db.t_rc"
).collect()[0]
assert (back.n, back.sk, back.sx, back.mn) == (100, 4950, 7425.0, "s0"), back
spark.sql("DROP DATABASE rc_db CASCADE")

# SequenceFile (STORED AS SEQUENCEFILE — Hive's SequenceFileInput/
# OutputFormat + LazySimpleSerDe): this is the JVM-side scale path for the
# legacy format. Unlike the vanilla-session [Q] query
# `sequencefile_roundtrip_agg` (which must bridge through .rdd with
# per-row Python lambdas because PySpark has no DataFrame SequenceFile
# writer), the hive catalog route keeps write AND read entirely in the
# JVM — zero Python per-row cost, so it is the route a 100 TB deployment
# uses for SequenceFile tables.
spark.sql("CREATE DATABASE seq_db")
spark.sql(
    "CREATE TABLE seq_db.t_seq STORED AS SEQUENCEFILE AS "
    "SELECT id AS k, CAST(id * 2.5 AS DOUBLE) AS x, "
    "CONCAT('v', CAST(id AS STRING)) AS s FROM RANGE(100)"
)
fmt = [r.data_type for r in spark.sql("DESCRIBE FORMATTED seq_db.t_seq").collect()
       if r.col_name == "InputFormat"]
assert fmt == ["org.apache.hadoop.mapred.SequenceFileInputFormat"], fmt
back = spark.sql(
    "SELECT COUNT(*) AS n, CAST(SUM(k) AS BIGINT) AS sk, "
    "CAST(SUM(CAST(x AS DECIMAL(18,2))) AS DOUBLE) AS sx, "
    "MIN(s) AS mn FROM seq_db.t_seq"
).collect()[0]
assert (back.n, back.sk, back.sx, back.mn) == (100, 4950, 12375.0, "v0"), back
spark.sql("DROP DATABASE seq_db CASCADE")

# Hive bucketing DDL contract (SemanticAnalyzer.genBucketingSortingDest +
# ObjectStore StorageDescriptor persistence): an EXTERNAL table declared
# CLUSTERED BY (k) SORTED BY (k ASC) INTO 8 BUCKETS over a
# write_hive_bucketed layout. The metastore must carry the bucket
# metadata a Hive-1.2 reader keys its bucket-aware plans on (Num
# Buckets / Bucket Columns / Sort Columns survive DESCRIBE FORMATTED),
# and the rows served through the catalog must equal the source — the
# end-to-end artifact a real deployment hands to Hive.
import tempfile as _tf
from pyspark.sql import functions as F
from apache_hive_1_2_2_src_spark.sources.hive_bucketing import write_hive_bucketed

src = spark.range(1000).select(F.col("id").alias("k"), (F.col("id") %% 7).alias("v"))
loc = _tf.mkdtemp(prefix="hms_bkt_") + "/t"
write_hive_bucketed(src, "k", 8, loc, kind="long", sorted_by="k")
spark.sql("CREATE DATABASE bkt_db")
spark.sql(
    "CREATE EXTERNAL TABLE bkt_db.t_bkt (k BIGINT, v BIGINT) "
    "CLUSTERED BY (k) SORTED BY (k ASC) INTO 8 BUCKETS "
    "STORED AS PARQUET LOCATION '" + loc + "'"
)
desc = {r.col_name: r.data_type
        for r in spark.sql("DESCRIBE FORMATTED bkt_db.t_bkt").collect()}
assert desc.get("Num Buckets") == "8", desc.get("Num Buckets")
assert "k" in (desc.get("Bucket Columns") or ""), desc.get("Bucket Columns")
assert "k" in (desc.get("Sort Columns") or ""), desc.get("Sort Columns")
bkt = spark.sql(
    "SELECT COUNT(*) AS n, CAST(SUM(k) AS BIGINT) AS sk FROM bkt_db.t_bkt"
).collect()[0]
assert (bkt.n, bkt.sk) == (1000, 499500), bkt
spark.sql("DROP DATABASE bkt_db CASCADE")
print("HIVE_METASTORE_OK")
"""


def test_ddl_and_stats_against_real_metastore():
    import os

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    with tempfile.TemporaryDirectory(prefix="hms_test_") as cwd:
        out = subprocess.run(
            [sys.executable, "-c", PROBE % {"repo": repo}],
            capture_output=True,
            text=True,
            timeout=300,
            cwd=cwd,
        )
        assert "HIVE_METASTORE_OK" in out.stdout, out.stderr[-2000:]
