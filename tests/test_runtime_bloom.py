"""Runtime bloom-filter join injection (Spark 3.3+): the row-level sibling
of dynamic partition pruning — a selective dimension filter becomes a
bloom_filter_agg built on the build side and pushed into the fact scan,
cutting shuffle volume for non-partition join keys. Hive 1.2 had no
analogue (its closest was the hand-written bloom in dedup_blocklist_bloom's
style); at 100 TB the DEFAULT thresholds (creationSideThreshold 10MB,
application side 10GB scan) fire on their own — the test lowers them only
because the toy fact side is far below 10GB. Semantics must be unchanged:
the bloom is a may-contain prefilter, the join still verifies."""

from __future__ import annotations

from pyspark.sql import functions as F

from apache_hive_1_2_2_src_spark.tables import load_table
from tests.conftest import SF_DIR


def test_runtime_bloom_filter_injected_and_result_identical(spark):
    li = load_table(spark, SF_DIR, "lineitem")
    o = load_table(spark, SF_DIR, "orders").filter(
        F.col("o_orderpriority") == "1-URGENT"
    )

    def run():
        j = li.join(o, li.l_orderkey == o.o_orderkey).groupBy("o_orderstatus").agg(
            F.count(F.lit(1)).alias("n")
        )
        plan = j._jdf.queryExecution().executedPlan().toString()
        return {(r.o_orderstatus, r.n) for r in j.collect()}, plan

    prev_bc = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        base, base_plan = run()
        assert "bloom_filter_agg" not in base_plan  # below default thresholds
        spark.conf.set(
            "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold", "10GB"
        )
        spark.conf.set(
            "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold",
            "0",
        )
        bloomed, bloom_plan = run()
        assert "bloom_filter_agg" in bloom_plan, "runtime filter not injected"
        assert bloomed == base, "bloom prefilter changed join semantics"
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev_bc)
        spark.conf.unset(
            "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold"
        )
        spark.conf.unset(
            "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold"
        )
