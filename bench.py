"""Benchmark harness: runs the headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints ONE
JSON line:

    {"metric": "headline_suite_sec", "value": N, "unit": "sec",
     "queries": {"q1_pricing_summary": s, ...}, "sf": 0.1}

Each query is executed to completion with a count() action (no driver
collect of payload rows). q1 runs twice — cold (first Spark action of the
session, includes scan+codegen warmup) and warm — mirroring BASELINE.md's
cold/warm rows.
"""

from __future__ import annotations

import json
import os
import re
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from apache_hive_1_2_2_src_spark.registry import load_all
from apache_hive_1_2_2_src_spark.session import get_session

HEADLINE = (
    "q1_pricing_summary",  # flagship: filter+groupBy+7 aggs+sort
    "join_three_way",  # customer ⋈ orders ⋈ lineitem + agg
    "window_row_number_topk",  # top-3 orders per customer
    "similarity_cosine_topk",  # brute-force cosine 5×N (extension)
    "dedup_minhash_lsh",  # MinHash-LSH near-dup (extension)
    "window_tumbling_agg",  # 1h tumbling window over events
    "lateral_view_word_count",  # explode + top-k agg over documents
    "workload_local_supplier_volume",  # TPC-H Q5: 6-table snowflake, broadcast chain
    "bucketed_smb_join",  # bucketed write + shuffle-free sort-merge join
    "pipeline_curate_corpus",  # end-to-end curation composite (r4)
    "dedup_clusters",  # connected components over near-dup pairs (r4→r5 star CC)
    "similarity_ann_lsh_signbits",  # 16-bit multi-probe LSH ANN (r5)
    "text_unigram_rarity",  # corpus-frequency-band quality score (r5)
    "ptf_matchpath_emulated",  # matchpath PTF via gaps-and-islands (r5)
    "workload_min_cost_supplier",  # TPC-H Q2: correlated-min over derived partsupp (r6)
    "workload_important_stock",  # TPC-H Q11: global-threshold HAVING (r6)
    "ptf_matchpath_multisym",  # multi-symbol 'LOW HIGH+ LOW' matchpath (r6)
    "text_tfidf_cosine",  # shingle TF-IDF cosine via capped inverted index (r6)
    "dedup_substring_spans",  # token-8-gram ExactSubstr span index (r6 cont.)
    "dedup_incremental_batch",  # probe-restricted LSH, daily-ingest shape (r6 cont.)
    "workload_scd2_dimension",  # SCD2 build, 3 window passes / 1 shuffle (r6 cont.)
    "workload_basket_pairs",  # market-basket pair mining, order-keyed self-join (r7)
    "events_dau_wau",  # DAU/WAU stickiness via the 7-day spread trick (r7)
    "timeseries_gap_fill",  # calendar densification, sequence+explode (r7)
    "events_attribution_last_touch",  # last-touch attribution, single window pass (r7)
    "dedup_span_trim",  # ExactSubstr APPLY, bounded 8x covered-position explode (r7)
    "dedup_blocklist_bloom",  # broadcast bloom pre-filter + exact verify (r7)
    "join_range_interval",  # day-bucketized point-in-interval range join (r7)
    "agg_hll_sketch_rollup",  # per-day HLL build + union-merge rollup (r7)
    "events_session_dynamic_gap",  # native session_window, per-event gap (r7)
    "dedup_embedding_near",  # embedding near-dup: LSH + exact verify scale path (r8)
    "layout_zorder_clustering",  # Morton-curve layout span metric (r8)
    "acid_read_compacted",  # base+delta merge-on-read over a real dir tree (r8/r9)
    "hive_bucketed_read_prune",  # Hive-bucketed write + 1-of-8-file pruned read (r9)
    "layout_zorder3d_clustering",  # 3-D Morton layout span metric (r9)
    "agg_width_bucket_histogram",  # integer-exact width_bucket histogram (r9)
    "hive_smb_merge_join",  # SMB merge over Hive SORTED layouts: 2 writes + 2 validations + cogroup (r11)
    "streaming_dedup_lsh_incremental",  # 3-drop foreachBatch LSH probe vs accumulated index (r11)
    "hive_part_bucket_prune",  # nested part=/bucket write + 1-of-40-file composed pruned read (r12)
    "dedup_semdedup_kmeans",  # 2 quantized Lloyd iterations + in-cell SemDeDup prune (r12)
    "streaming_acid_full_layout_ingest",  # micro-batches -> part=/delta/bucket tree + triple-pruned lookup (r13)
    "similarity_ivfpq_residual_search",  # 6 training chains + residual-code ADC (r13)
    "text_bpe_pack_chain",  # BPE train+apply -> per-(lang,shard) 2048-token bin packing (r13; steps trainer + shard windows r14)
    "similarity_ivf_two_level",  # coarse + 4 per-cell sub-quantizer chains, 2x2 probe search (r14)
    "dedup_video_phash",  # animated-GIF decode + per-frame integer-DCT pHash + inverted-index overlap (r15)
    "dedup_audio_contained",  # WAV decode + positional energy landmarks + one-sided offset voting (r15)
    "similarity_opq_rotate_pq",  # Hadamard pre-rotation + the 4-chain PQ-ADC pipeline (r16)
    "similarity_covariance_offdiag_audit",  # one-pass integer covariance block masses (r17)
    "sessionize_bucketed",  # hot-user split-and-stitch sessionize twin (r18)
    "streaming_dedup_compact_store",  # drain + FS-API store compaction + batch re-probe (r18)
    "dedup_collapse_prior_counts",  # exact-collapse near-dup counts, mega-cluster-flat (r18)
    "dedup_strategy_preflight",  # 2-shuffle duplication-mass diagnostic + strategy verdict (r19)
)

# All 22 TPC-H query shapes in query order — timed as ONE sequential suite
# (tpch_22_suite_sec) so a family-wide plan regression (e.g. a lost
# broadcast after a code motion) shows up as a suite-level jump even for
# shapes outside the headline set (VERDICT r6 item 6).
TPCH_22 = (
    "q1_pricing_summary",
    "workload_min_cost_supplier",
    "workload_shipping_priority",
    "workload_order_priority_check",
    "workload_local_supplier_volume",
    "workload_revenue_forecast",
    "workload_nation_volume_shipping",
    "workload_market_share",
    "workload_product_profit",
    "workload_returned_items",
    "workload_important_stock",
    "workload_shipmode_priority",
    "workload_customer_order_counts",
    "workload_part_type_share",
    "workload_top_supplier",
    "workload_parts_supplier_cnt",
    "workload_small_qty_revenue",
    "workload_large_volume_customer",
    "workload_disjunctive_revenue",
    "workload_promotion_suppliers",
    "workload_suppliers_kept_waiting",
    "workload_idle_customers",
)


def main() -> int:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    m = re.search(r"sf([0-9.]+)", sf_dir)
    sf = float(m.group(1)) if m else None
    spark = get_session("bench")
    reg = load_all()

    times: dict[str, float] = {}

    def run(name: str, label: str | None = None) -> None:
        t0 = time.time()
        reg[name].build(spark, sf_dir).count()
        times[label or name] = round(time.time() - t0, 3)

    run("q1_pricing_summary")  # cold: includes session/scan warmup
    run("q1_pricing_summary", "q1_pricing_summary_warm")
    for name in HEADLINE[1:]:
        run(name)

    # Warm-session sequential sweep of the 22 TPC-H shapes (Q1..Q22).
    tpch_times: dict[str, float] = {}
    for name in TPCH_22:
        t0 = time.time()
        reg[name].build(spark, sf_dir).count()
        tpch_times[name] = round(time.time() - t0, 3)

    # r20 (VERDICT r19 item 2): the driver failed to parse BENCH_r18's
    # output because its tail capture truncated the (long, still-growing)
    # JSON line mid-object. Emit the line COMPACT (no separators
    # whitespace, ~20% shorter) and flush both streams around it so the
    # line is an intact final write. Keys, values, and rounding are
    # unchanged — only serialization whitespace differs.
    sys.stderr.flush()
    sys.stdout.flush()
    print(
        json.dumps(
            {
                "metric": "headline_suite_sec",
                "value": round(sum(times.values()), 3),
                "unit": "sec",
                "queries": times,
                "tpch_22_suite_sec": round(sum(tpch_times.values()), 3),
                "tpch_22": tpch_times,
                "sf": sf,
            },
            separators=(",", ":"),
        ),
        flush=True,
    )
    return 0


if __name__ == "__main__":
    sys.exit(main())
