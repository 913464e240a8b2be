"""Avro SerDe parity (serde2/avro/AvroSerDe.java) — env-gated.

This container ships only the core avro jars, not the spark-avro datasource
module, so format('avro') raises FAILED_FIND_AVRO_DATA_SOURCE here (probed
round 3, COVERAGE.md 'Intentionally out'). On a real cluster with
org.apache.spark:spark-avro_2.13 on the classpath this test ACTIVATES and
certifies the roundtrip-aggregate parity for free — the csv_roundtrip_agg
pattern verbatim. The skip asserts the exact failure mode so a quietly
fixed environment flips the test on instead of rotting."""

from __future__ import annotations

import tempfile

import pytest
from pyspark.sql import functions as F


def _avro_available(spark) -> bool:
    try:
        with tempfile.TemporaryDirectory(prefix="avro_probe_") as d:
            spark.range(1).write.mode("overwrite").format("avro").save(f"{d}/p")
        return True
    except Exception as exc:
        assert "AVRO" in str(exc).upper(), f"unexpected avro failure: {exc!r}"
        return False


def test_avro_roundtrip_agg_parity(spark, oracle_con):
    from apache_hive_1_2_2_src_spark.tables import load_table
    from tests.conftest import SF_DIR

    if not _avro_available(spark):
        pytest.skip(
            "spark-avro datasource absent in this container "
            "(add org.apache.spark:spark-avro_2.13 on a cluster)"
        )
    n = load_table(spark, SF_DIR, "nation")
    with tempfile.TemporaryDirectory(prefix="avro_rt_") as d:
        n.write.mode("overwrite").format("avro").save(f"{d}/nation_avro")
        back = spark.read.format("avro").load(f"{d}/nation_avro")
        got = (
            back.groupBy("n_regionkey")
            .agg(F.count(F.lit(1)).alias("n"))
            .orderBy("n_regionkey")
            .collect()
        )
    want = oracle_con.execute(
        "SELECT n_regionkey, COUNT(*) AS n FROM nation GROUP BY 1 ORDER BY 1"
    ).fetchall()
    assert [(r.n_regionkey, r.n) for r in got] == [tuple(r) for r in want]
