"""Catalog/DDL/stats tests: managed-table lifecycle round-trip and
ANALYZE-driven statistics reaching the optimizer (StatsOptimizer /
CommonJoinTaskDispatcher parity — stats flip joins to broadcast)."""

from __future__ import annotations

import pytest

from apache_hive_1_2_2_src_spark.operators.catalog import _drop_db
from apache_hive_1_2_2_src_spark.plans import plan_text
from apache_hive_1_2_2_src_spark.tables import load_table
from tests.conftest import SF_DIR


def test_ddl_lifecycle_roundtrip(spark, registry):
    row = registry["ddl_lifecycle"].build(spark, SF_DIR).collect()[0]
    assert row.table_visible and row.dropped_ok
    assert row.n_rows == 25 and row.n_regions == 5


def test_analyze_table_stats_visible(spark, registry):
    row = registry["analyze_table_stats"].build(spark, SF_DIR).collect()[0]
    assert row.stats_rows_match and row.col_stats_present


def test_analyze_feeds_optimizer_rowcount(spark):
    """ANALYZE must surface an exact rowCount to Catalyst's cost model —
    without stats a parquet table only has a size-in-bytes estimate."""
    db = "hive_parity_test_stats"
    _drop_db(spark, db)
    spark.sql(f"CREATE DATABASE {db}")
    try:
        load_table(spark, SF_DIR, "supplier").createOrReplaceTempView("sup_src")
        tbl = f"{db}.sup"
        spark.sql(f"CREATE TABLE {tbl} USING PARQUET AS SELECT * FROM sup_src")

        def row_count_stat():
            plan = spark.table(tbl)._jdf.queryExecution().optimizedPlan()
            rc = plan.stats().rowCount()
            return None if rc.isEmpty() else int(str(rc.get()))

        # rowCount only reaches the cost model through CBO, as in Hive
        spark.conf.set("spark.sql.cbo.enabled", "true")
        try:
            assert row_count_stat() is None  # pre-ANALYZE: size-only estimate
            spark.sql(f"ANALYZE TABLE {tbl} COMPUTE STATISTICS")
            n = spark.table(tbl).count()
            assert row_count_stat() == n
        finally:
            spark.conf.set("spark.sql.cbo.enabled", "false")

        # ...and the analyzed small table broadcasts in a fact join
        orders = load_table(spark, SF_DIR, "orders")
        j = orders.join(spark.table(tbl), orders.o_custkey == spark.table(tbl).s_suppkey)
        assert "BroadcastHashJoin" in plan_text(j)
    finally:
        _drop_db(spark, db)
