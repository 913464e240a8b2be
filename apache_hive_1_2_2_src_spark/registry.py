"""Declared-query registry: the executable form of SURVEY.md §2's contract.

Every operator/function marked **[Q]** in SURVEY.md §2 registers here a
(Spark builder, DuckDB oracle SQL) pair; **[R]** rows register a builder with
``oracle=None`` (rows-only check). ``__spark_entry__.queries()`` /
``oracle_sql()`` are thin views over this registry.

Determinism rules (SURVEY.md §5):
- alias every computed column identically in builder and oracle;
- aggregate DOUBLE columns through DECIMAL(18,2) so Spark's parallel sum and
  DuckDB's serial sum are bit-identical after the final cast back to DOUBLE;
- CAST every integer SUM (and list_sum) to BIGINT oracle-side: DuckDB
  returns SUM(BIGINT) as HUGEINT, which pandas materializes as float64
  (``300.0``) while Spark returns int64 (``300``) — the driver's
  canonicalizer distinguishes them (round-3 ddl_lifecycle/text_token_stats
  hash failures); never average parallel-summed doubles — express means as
  a single division of exact integer (or DECIMAL) sums;
- no raw TIMESTAMP output columns, and no bare DATE outputs either: cast
  date values all the way to STRING (oracle: ``CAST(CAST(x AS DATE) AS
  VARCHAR)``). DuckDB fetchdf materializes DATE as pandas Timestamp while
  Spark toPandas yields datetime.date — str() forms differ ("2024-01-01
  00:00:00" vs "2024-01-01"), a driver-shape hash mismatch that check.py's
  own canon masks (round-6 scd2/retention evidence);
- sort any collected array; never use rand()/current_* in a [Q] query.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession


@dataclass(frozen=True)
class Query:
    """One declared query: Spark-side builder + optional DuckDB oracle."""

    name: str
    build: Callable[[SparkSession, str], DataFrame]
    oracle: str | None = None
    doc: str = ""
    tags: tuple[str, ...] = field(default=())


REGISTRY: dict[str, Query] = {}


def register(
    name: str, oracle: str | None = None, doc: str = "", tags: tuple[str, ...] = ()
) -> Callable:
    """Decorator: add a (spark, sf_dir) -> DataFrame builder to the registry."""

    def deco(fn: Callable[[SparkSession, str], DataFrame]):
        if name in REGISTRY:
            raise ValueError(f"duplicate query name: {name}")
        REGISTRY[name] = Query(name, fn, oracle, doc or (fn.__doc__ or ""), tags)
        return fn

    return deco


# Every module that registers queries. Imported for side effects by
# load_all(); each name here MUST exist (a missing module is a hard error,
# not silently skipped — round 1 shipped phantom imports and lost the round).
QUERY_MODULES = (
    "apache_hive_1_2_2_src_spark.operators.aggregates",
    "apache_hive_1_2_2_src_spark.operators.joins",
    "apache_hive_1_2_2_src_spark.operators.relational",
    "apache_hive_1_2_2_src_spark.operators.windows",
    "apache_hive_1_2_2_src_spark.operators.matchpath",
    "apache_hive_1_2_2_src_spark.operators.workloads",
    "apache_hive_1_2_2_src_spark.operators.workloads_extra",
    "apache_hive_1_2_2_src_spark.operators.workloads_partsupp",
    "apache_hive_1_2_2_src_spark.operators.acid",
    "apache_hive_1_2_2_src_spark.operators.catalog",
    "apache_hive_1_2_2_src_spark.functions.scalar_conditional",
    "apache_hive_1_2_2_src_spark.functions.scalar_datetime",
    "apache_hive_1_2_2_src_spark.functions.scalar_math",
    "apache_hive_1_2_2_src_spark.functions.scalar_string",
    "apache_hive_1_2_2_src_spark.functions.extensibility",
    "apache_hive_1_2_2_src_spark.functions.generators",
    "apache_hive_1_2_2_src_spark.functions.scalar_collection",
    "apache_hive_1_2_2_src_spark.functions.types_compat",
    "apache_hive_1_2_2_src_spark.sources.io",
    "apache_hive_1_2_2_src_spark.streaming.windows",
    "apache_hive_1_2_2_src_spark.extensions.dedup",
    "apache_hive_1_2_2_src_spark.extensions.similarity",
    "apache_hive_1_2_2_src_spark.extensions.text",
    "apache_hive_1_2_2_src_spark.extensions.multimodal",
    "apache_hive_1_2_2_src_spark.extensions.layout",
    "apache_hive_1_2_2_src_spark.sources.hive_bucketing",
    "apache_hive_1_2_2_src_spark.extensions.sampling",
)


# Post-certification STABLE window (r11+; the rotating-prefix machinery of
# rounds 6-10 retired once CORRECTNESS_r10 certified all 293 registered
# queries driver-green — its schedule history lives in COVERAGE.md). A
# fixed breadth-first set that keeps every SURVEY §2 subsection plus the
# scale showcases under continuous external grading, ordered
# newest-/riskiest-code first so regressions in recent work surface
# immediately. One-two representatives per surface, all oracled;
# tests/test_registry.py guards the tuple (exists-in-registry, 50 unique,
# surface breadth). First substitutes if a slot ever retires:
# pipeline_release_gate, pipeline_curate. r11 swap: hive_smb_merge_join
# (new) in, bucketed_smb_join out (like-for-like SMB slot; the native
# no-Exchange plan stays pytest-guarded).
STABLE_WINDOW = (
    # flagship + TPC-H shapes
    "q1_pricing_summary",
    # r15: the streaming rep leads the stable tail — the 48-name FRESH
    # window (4 new registrations + the full 44-name rotation) leaves
    # exactly ONE tail slot, and the breadth guard requires a
    # streaming-tagged query in every graded window (the rotation covers
    # every other required tag)
    "streaming_acid_delta_ingest",
    "workload_product_profit",
    "flagship_sql_text",
    # newest machinery (r8-r9): ACID, Hive-bucket interop, curves, dedup
    "acid_read_compacted",
    # §2.9 UDTF and §2.2 source representatives ride high: FRESH
    # truncates the tail, and the breadth guard requires udtf- and
    # source-tagged queries in every window
    "lateral_view_sql",
    "hive_bucket_id_compat",
    "hive_bucketed_read_prune",
    "hive_bucket_map_join",
    "hive_smb_merge_join",
    "layout_hilbert_clustering",
    "layout_zorder_clustering",
    "dedup_semdedup_prune",
    "dedup_embedding_near",
    "pipeline_publish_shards",
    # §2.3 joins
    "join_three_way",
    "join_asof",
    "join_salted_skew",
    "subquery_not_in_null_trap",
    # §2.4 aggregates
    "agg_grouping_sets",
    "agg_percentile_approx",
    "agg_hll_sketch_rollup",
    "agg_regression_exact",
    # §2.5 windows/PTF
    "window_row_number_topk",
    "window_time_range_frame",
    "ptf_matchpath_grammar",
    "window_session_agg",
    # §2.6/2.7 sort/sample/set
    "sort_by_distribute_by",
    "tablesample_bucket",
    "set_ops_all_bag",
    # §2.8/2.9 functions/UDTF
    "str_advanced_suite",
    "date_format_suite",
    "collection_array_suite",
    "udf_pandas_scalar_demo",
    # §2.2 sources/sinks
    "csv_quoted_roundtrip",
    "json_permissive_parse",
    "partitioned_write_prune",
    "compact_small_files",
    # §2.10 streaming
    "streaming_watermark_window",
    "streaming_foreachbatch_upsert",
    # §2.12 catalog
    "ddl_lifecycle",
    "msck_repair_partitions",
    # LLM-pipeline showcases
    "dedup_minhash_lsh",
    "dedup_clusters",
    "dedup_substring_spans",
    "text_tfidf_cosine",
    "similarity_cosine_topk",
    "similarity_ann_lsh_signbits",
    "text_contamination_check",
    "sample_token_budget",
)

# This round's NEW registrations: they ride directly behind the flagship so
# every fresh query earns a driver-green CORRECTNESS row in its first round
# (the never-green guard in tests/test_registry.py makes forgetting this a
# hard test failure). The displaced STABLE_WINDOW tail returns next round
# when FRESH empties — stable names stay registered and check.py-covered
# either way. (r12's 18 FRESH names all certified in CORRECTNESS_r12 and
# rotated out; the displaced stable tail returns automatically.)
FRESH = (
    # r19 registrations ride first so each earns a driver-green row in its
    # first round (never-green guard): the strategy-selection pre-flight
    # for the four-strategy dedup family (VERDICT r18 item 3 — the
    # measured SCALE.md r18 crossovers as a registered, oracled verdict),
    # and the bucketed-state upsert twin (r19 scale audit: the flat
    # upsert's O(epochs x |users|) full-state rewrite becomes
    # touched-buckets-only; same fixpoint, same oracle).
    "dedup_strategy_preflight",
    "streaming_upsert_bucketed_state",
    # r19 rotation (VERDICT r18 item 1): the full 37-name r9 cohort — the
    # oldest-driver-green block (newest green row = r9 for each,
    # recomputed this round from CORRECTNESS_r01..r18 and matching the
    # r18-frozen list exactly). After this round the oldest driver-green
    # row anywhere is r10; r20 finishes the refresh cycle with the r10
    # cohort. All 37 re-verified by the local sf0.01 sweep before riding.
    # 2 new + 37 rotation + 1 breadth + flagship leaves 9 tail slots,
    # filled from STABLE_WINDOW in order (streaming_acid_delta_ingest ...
    # hive_smb_merge_join) — covering the source breadth tag the cohort
    # lacks (the cohort itself carries udtf via posexplode_words, and
    # the new upsert twin covers streaming from the FRESH block).
    "acid_major_compaction",
    "acid_minor_compaction",
    "agg_map_canonical",
    "agg_ratio_to_parent",
    "bucketed_smb_join",
    "ddl_lifecycle",
    "dedup_apply_keepers",
    "dedup_blocklist_bloom",
    "dedup_clusters",
    "dedup_cross_source_report",
    "dedup_keep_longest",
    "dedup_levenshtein_blocked",
    "dedup_minhash_lsh",
    "dedup_span_trim",
    "events_anomaly_exact",
    "events_churn_resurrection",
    "events_cohort_ltv",
    "events_funnel_windowed",
    "events_interarrival_stats",
    "events_markov_transitions",
    "events_peak_concurrency",
    "events_session_dynamic_gap",
    "multimodal_decode_wav",
    "pipeline_release_gate",
    "posexplode_words",
    "profile_columns_unpivot",
    "text_url_canonical_dedup",
    "timeseries_ohlc_bars",
    "window_tumbling_agg",
    "workload_cdc_merge",
    "workload_hierarchy_flatten",
    "workload_open_orders_asof",
    "workload_order_cycle_time",
    "workload_pareto_abc",
    "workload_rfm_segments",
    "workload_scd2_asof_query",
    "workload_yoy_growth",
    # breadth: the cohort carries no functions-tagged query and the
    # auto-filled tail truncates before reaching the STABLE_WINDOW
    # functions reps — ride one of the OLDEST-green functions queries
    # (r10), so the breadth slot also advances the refresh cadence
    # toward r20's r10-cohort finish.
    "date_tz_suite",
)

PRIORITY = (
    STABLE_WINDOW[0],
    *FRESH,
    *[n for n in STABLE_WINDOW[1:] if n not in FRESH][: 50 - 1 - len(FRESH)],
)


def load_all() -> dict[str, Query]:
    """Import every module that registers queries; return the registry in
    priority order (see PRIORITY) — prefix-stable for capped sweeps."""
    import importlib

    for mod in QUERY_MODULES:
        importlib.import_module(mod)
    missing = [n for n in PRIORITY if n not in REGISTRY]
    if missing:
        raise ValueError(f"PRIORITY names not registered: {missing}")
    rest = [n for n in REGISTRY if n not in PRIORITY]
    ordered = list(PRIORITY)
    ordered += [n for n in rest if REGISTRY[n].oracle is not None]
    ordered += [n for n in rest if REGISTRY[n].oracle is None]
    return {n: REGISTRY[n] for n in ordered}
