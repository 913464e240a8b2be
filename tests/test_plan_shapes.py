"""Physical-plan regression tests: the scale properties claimed in SCALE.md
must survive future edits. We assert on `.explain`-level plan text — filter
pushdown reaching the parquet scan, dimension broadcasts, no cartesian
products in the LSH path, partition pruning on partitioned reads, and top-k
compiling to TakeOrderedAndProject instead of a global sort."""

from __future__ import annotations

import pytest

from apache_hive_1_2_2_src_spark.plans import plan_text
from tests.conftest import SF_DIR


@pytest.fixture(scope="module")
def plans(spark, registry):
    def build(name):
        return plan_text(registry[name].build(spark, SF_DIR))

    return build


def test_q1_filter_pushdown(plans):
    p = plans("q1_pricing_summary")
    assert "PushedFilters: [IsNotNull(l_shipdate), LessThanOrEqual(l_shipdate" in p


def test_q1_column_pruning(plans):
    p = plans("q1_pricing_summary")
    # ReadSchema must not include unused lineitem columns.
    assert "l_partkey" not in p and "l_suppkey" not in p


def test_three_way_join_broadcasts_dims(plans):
    p = plans("join_three_way")
    assert "BroadcastHashJoin" in p
    assert "CartesianProduct" not in p


def test_minhash_lsh_no_cartesian(plans):
    p = plans("dedup_minhash_lsh")
    assert "CartesianProduct" not in p
    assert "BroadcastNestedLoopJoin" not in p


def test_topk_uses_take_ordered(plans):
    p = plans("order_by_limit_topk")
    assert "TakeOrderedAndProject" in p


def test_cosine_topk_broadcasts_queries(plans):
    p = plans("similarity_cosine_topk")
    assert "BroadcastNestedLoopJoin" in p  # inequality join, build side = queries
    assert "PushedFilters: [IsNotNull(vec_id), LessThan(vec_id,5)]" in p


def test_partitioned_windows_have_partitioning(spark, registry):
    # The scale-safe window variants must not fall into a single partition.
    p = plan_text(registry["window_ntile_partitioned"].build(spark, SF_DIR))
    assert "o_orderstatus" in p and "Window" in p


def test_asof_join_single_shuffle_no_range_join(plans):
    # union+window form: one hash partitioning on user_id, never a range
    # cross-join (BroadcastNestedLoopJoin/CartesianProduct would be the
    # naive per-pair formulations).
    p = plans("join_asof")
    assert "CartesianProduct" not in p and "BroadcastNestedLoopJoin" not in p
    assert "Window" in p


def test_mapjoin_hint_broadcasts(plans):
    p = plans("mapjoin_hint_sql")
    assert "BroadcastHashJoin" in p


def test_bucketed_smb_join_no_exchange_on_bucket_keys(spark, registry):
    # With broadcast disabled the bucketed layout must carry the join alone:
    # SortMergeJoin whose inputs come straight from the bucketed scans — no
    # Exchange on the bucket keys (the only allowed exchange is the
    # post-join groupBy on c_nationkey).
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        p = plan_text(registry["bucketed_smb_join"].build(spark, SF_DIR))
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
    assert "SortMergeJoin" in p
    for line in p.splitlines():
        if "Exchange" in line:
            assert "custkey" not in line, f"bucket key reshuffled: {line.strip()}"


def test_partitioned_write_prune_hits_partition_filters(plans):
    # The status filter must prune DIRECTORIES (PartitionFilters on the
    # partitioned layout), not scan-and-filter every partition.
    p = plans("partitioned_write_prune")
    assert "PartitionFilters" in p
    assert "o_orderstatus" in p.split("PartitionFilters", 1)[1][:200]


def test_ann_lsh_multiprobe_no_cartesian(plans):
    # 16-bit multi-probe LSH: candidate pairing is an EQUI-join on the probe
    # key — a cartesian or nested-loop here means the bucketing broke.
    p = plans("similarity_ann_lsh_signbits")
    assert "CartesianProduct" not in p
    assert "BroadcastNestedLoopJoin" not in p


def test_matchpath_windows_are_partitioned(plans):
    # The PTF emulation must stay per-user parallel: both window passes are
    # partitioned by user_id, never a single global Window.
    p = plans("ptf_matchpath_emulated")
    assert "Window" in p and "user_id" in p


def test_unigram_rarity_no_cartesian(plans):
    p = plans("text_unigram_rarity")
    assert "CartesianProduct" not in p
    assert "BroadcastNestedLoopJoin" not in p


def test_q21_subqueries_stay_equi_joins(plans):
    # EXISTS/NOT EXISTS compile to left_semi/left_anti keyed on l_orderkey
    # with a residual supplier inequality — never a cartesian/BNLJ.
    p = plans("workload_suppliers_kept_waiting")
    assert "CartesianProduct" not in p
    assert "BroadcastNestedLoopJoin" not in p


def test_partsupp_workloads_no_cartesian(plans):
    # Derived-partsupp TPC-H shapes (round 6): the only nested-loop joins
    # allowed are the 1-row scalar broadcasts (supplier count / global
    # total); a CartesianProduct anywhere means the derivation or a join
    # key broke.
    for name in (
        "workload_min_cost_supplier",
        "workload_important_stock",
        "workload_parts_supplier_cnt",
        "workload_promotion_suppliers",
    ):
        p = plans(name)
        assert "CartesianProduct" not in p, name
        assert "BroadcastHashJoin" in p, name


def test_min_cost_supplier_topk_and_window(plans):
    # Q2's correlated-MIN compiles to a per-partkey Window (partitioned,
    # never global) and the LIMIT to TakeOrderedAndProject.
    p = plans("workload_min_cost_supplier")
    assert "Window" in p and "ps_partkey" in p
    assert "TakeOrderedAndProject" in p


def test_multisym_matchpath_single_window_exchange(plans):
    # 'LOW HIGH+ LOW': row_number + running sum + lag + lead must all ride
    # ONE window spec, and the groupBy reuses its user_id partitioning —
    # exactly one Exchange in the whole plan.
    # formatted explain mentions each node twice (tree "Exchange (n)" +
    # detail "(n) Exchange"); count the tree form only.
    p = plans("ptf_matchpath_multisym")
    assert p.count("Exchange (") == 1, p.count("Exchange (")
