"""Window / analytic function surface (SURVEY.md §2.5, Hive PTF).

Hive parity targets: ``ql/parse/PTFTranslator.java`` + ``WindowingSpec.java``
(translation), ``ql/exec/PTFOperator.java`` + ``ql/udf/ptf/
WindowingTableFunction.java`` (runtime), per-function UDAFs
``ql/udf/generic/GenericUDAF{RowNumber,Rank,DenseRank,NTile,LeadLag,...}``.

Default frame with ORDER BY is RANGE UNBOUNDED PRECEDING → CURRENT ROW in
both Hive 1.2 and Spark — declared explicitly anyway for oracle clarity.

Scale note: a window partitioned by a key is one shuffle on that key; Hive
buffered whole partitions in PTFRowContainer (spill to disk), Spark's
WindowExec does the same with UnsafeExternalSorter. Skewed partition keys
(one giant customer) are the risk at 100 TB — mitigate by pre-aggregating
before windowing where semantics allow, as q window_topk_per_group does.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from apache_hive_1_2_2_src_spark.operators.helpers import DEC
from apache_hive_1_2_2_src_spark.registry import register
from apache_hive_1_2_2_src_spark.tables import load_table


@register(
    "window_row_number_topk",
    oracle="""
    SELECT c_custkey, o_orderkey, CAST(o_totalprice AS DOUBLE) AS o_totalprice, rn
    FROM (
      SELECT c.c_custkey, o.o_orderkey, o.o_totalprice,
             ROW_NUMBER() OVER (PARTITION BY c.c_custkey
                                ORDER BY o.o_totalprice DESC, o.o_orderkey) AS rn
      FROM customer c JOIN orders o ON c.c_custkey = o.o_custkey
    ) WHERE rn <= 3
    """,
    doc="row_number top-3 orders per customer (GenericUDAFRowNumber).",
    tags=("window", "flagship"),
)
def window_row_number_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    w = Window.partitionBy("c_custkey").orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey"))
    return (
        c.join(o, c.c_custkey == o.o_custkey)
        .select("c_custkey", "o_orderkey", F.col("o_totalprice").cast("double").alias("o_totalprice"))
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 3)
    )


@register(
    "window_rank_dense_rank",
    oracle="""
    SELECT p_partkey, p_brand, p_size,
           RANK() OVER (PARTITION BY p_brand ORDER BY p_size) AS rnk,
           DENSE_RANK() OVER (PARTITION BY p_brand ORDER BY p_size) AS drnk
    FROM part WHERE p_partkey <= 500
    """,
    doc="rank/dense_rank (GenericUDAFRank/DenseRank) — ties exercised via p_size.",
    tags=("window",),
)
def window_rank_dense_rank(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = load_table(spark, sf_dir, "part").filter(F.col("p_partkey") <= 500)
    w = Window.partitionBy("p_brand").orderBy("p_size")
    return p.select(
        "p_partkey",
        "p_brand",
        "p_size",
        F.rank().over(w).alias("rnk"),
        F.dense_rank().over(w).alias("drnk"),
    )


@register(
    "window_percent_rank_cume_dist",
    oracle="""
    SELECT s_suppkey,
           CAST(ROUND(PERCENT_RANK() OVER (ORDER BY s_acctbal, s_suppkey), 10) AS DOUBLE) AS pr,
           CAST(ROUND(CUME_DIST()   OVER (ORDER BY s_acctbal, s_suppkey), 10) AS DOUBLE) AS cd
    FROM supplier
    """,
    doc="percent_rank/cume_dist (GenericUDAFPercentRank/CumeDist); ordering "
    "made total with the key tiebreak.",
    tags=("window",),
)
def window_percent_rank_cume_dist(spark: SparkSession, sf_dir: str) -> DataFrame:
    s = load_table(spark, sf_dir, "supplier")
    w = Window.orderBy("s_acctbal", "s_suppkey")
    return s.select(
        "s_suppkey",
        F.round(F.percent_rank().over(w), 10).cast("double").alias("pr"),
        F.round(F.cume_dist().over(w), 10).cast("double").alias("cd"),
    )


@register(
    "window_ntile",
    oracle="""
    SELECT c_custkey, NTILE(4) OVER (ORDER BY c_acctbal DESC, c_custkey) AS quartile
    FROM customer
    """,
    doc="ntile(4) (GenericUDAFNTile).",
    tags=("window",),
)
def window_ntile(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer")
    w = Window.orderBy(F.col("c_acctbal").desc(), F.col("c_custkey"))
    return c.select("c_custkey", F.ntile(4).over(w).alias("quartile"))


@register(
    "window_lead_lag",
    oracle="""
    SELECT user_id, event_id,
           LAG(event_id, 1, -1)  OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_event,
           LEAD(event_id, 1, -1) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS next_event
    FROM events WHERE user_id <= 20
    """,
    doc="lead/lag with offset+default (GenericUDAFLeadLag).",
    tags=("window",),
)
def window_lead_lag(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events").filter(F.col("user_id") <= 20)
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    return e.select(
        "user_id",
        "event_id",
        F.lag("event_id", 1, -1).over(w).alias("prev_event"),
        F.lead("event_id", 1, -1).over(w).alias("next_event"),
    )


@register(
    "window_first_last_value",
    oracle="""
    SELECT user_id, event_id,
           FIRST_VALUE(event_type) OVER w AS first_type,
           LAST_VALUE(event_type)  OVER w AS last_type
    FROM events WHERE user_id <= 20
    WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
    """,
    doc="first_value/last_value (GenericUDAFFirst/LastValue) over an "
    "unbounded frame + named WINDOW clause (WindowingSpec aliases).",
    tags=("window",),
)
def window_first_last_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events").filter(F.col("user_id") <= 20)
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    )
    return e.select(
        "user_id",
        "event_id",
        F.first("event_type").over(w).alias("first_type"),
        F.last("event_type").over(w).alias("last_type"),
    )


@register(
    "window_running_sum_rows_frame",
    oracle="""
    SELECT user_id, event_id,
           CAST(SUM(CAST(value AS DECIMAL(18,2)))
                OVER (PARTITION BY user_id ORDER BY ts, event_id
                      ROWS BETWEEN 2 PRECEDING AND CURRENT ROW) AS DOUBLE) AS moving_sum,
           COUNT(*) OVER (PARTITION BY user_id ORDER BY ts, event_id
                          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS running_n
    FROM events WHERE user_id <= 20
    """,
    doc="Aggregates over ROWS frames (WindowingTableFunction streaming mode): "
    "3-row moving sum + running count.",
    tags=("window",),
)
def window_running_sum_rows_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events").filter(F.col("user_id") <= 20)
    order = Window.partitionBy("user_id").orderBy("ts", "event_id")
    w3 = order.rowsBetween(-2, Window.currentRow)
    wrun = order.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    return e.select(
        "user_id",
        "event_id",
        F.sum(F.col("value").cast(DEC)).over(w3).cast("double").alias("moving_sum"),
        F.count(F.lit(1)).over(wrun).alias("running_n"),
    )


@register(
    "window_agg_default_frame",
    oracle="""
    SELECT o_custkey, o_orderkey,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2)))
                OVER (PARTITION BY o_custkey ORDER BY o_orderkey
                      RANGE BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE)
             AS running_spend
    FROM orders WHERE o_custkey <= 50
    """,
    doc="Aggregate over the default ORDER BY frame (RANGE UNBOUNDED "
    "PRECEDING → CURRENT ROW, same default in Hive 1.2 and Spark).",
    tags=("window",),
)
def window_agg_default_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders").filter(F.col("o_custkey") <= 50)
    w = Window.partitionBy("o_custkey").orderBy("o_orderkey")
    return o.select(
        "o_custkey",
        "o_orderkey",
        F.sum(F.col("o_totalprice").cast(DEC)).over(w).cast("double").alias("running_spend"),
    )


# --------------------------------------------------------------------------
# Partitioned variants of the rank-family windows. The global forms above
# are exact Hive parity (Hive's PTF also single-reduced an unpartitioned
# OVER clause) but force every row through one task — a scale-killer at
# 100 TB (VERDICT r1 "What's wrong" #5). These are the forms a production
# query should use: the window shuffle is keyed by the partition column, so
# work spreads across the cluster.
# --------------------------------------------------------------------------


@register(
    "window_percent_rank_partitioned",
    oracle="""
    SELECT c_nationkey, c_custkey,
           CAST(ROUND(PERCENT_RANK() OVER (PARTITION BY c_nationkey
                                           ORDER BY c_acctbal, c_custkey), 10) AS DOUBLE) AS pr,
           CAST(ROUND(CUME_DIST()   OVER (PARTITION BY c_nationkey
                                          ORDER BY c_acctbal, c_custkey), 10) AS DOUBLE) AS cd
    FROM customer
    """,
    doc="percent_rank/cume_dist PARTITION BY nation — the scale-safe form: "
    "per-nation windows parallelize across executors instead of one task.",
    tags=("window",),
)
def window_percent_rank_partitioned(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer")
    w = Window.partitionBy("c_nationkey").orderBy("c_acctbal", "c_custkey")
    return c.select(
        "c_nationkey",
        "c_custkey",
        F.round(F.percent_rank().over(w), 10).cast("double").alias("pr"),
        F.round(F.cume_dist().over(w), 10).cast("double").alias("cd"),
    )


@register(
    "window_ntile_partitioned",
    oracle="""
    SELECT o_orderstatus, o_orderkey,
           NTILE(10) OVER (PARTITION BY o_orderstatus
                           ORDER BY o_totalprice DESC, o_orderkey) AS decile
    FROM orders
    """,
    doc="ntile(10) PARTITION BY status — scale-safe ntile (per-status "
    "windows, parallel across the cluster).",
    tags=("window",),
)
def window_ntile_partitioned(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_orderstatus").orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey"))
    return o.select("o_orderstatus", "o_orderkey", F.ntile(10).over(w).alias("decile"))


@register(
    "ptf_matchpath_emulated",
    oracle="""
    WITH flagged AS (
      SELECT user_id, ts, event_id, value,
             CASE WHEN value > 50.0 THEN 1 ELSE 0 END AS hi,
             ROW_NUMBER() OVER (PARTITION BY user_id
                                ORDER BY ts, event_id) AS rn
      FROM events
    ),
    islands AS (
      SELECT user_id, ts, event_id, value, hi,
             rn - ROW_NUMBER() OVER (PARTITION BY user_id, hi
                                     ORDER BY ts, event_id) AS grp
      FROM flagged
    )
    SELECT user_id,
           CAST(MIN(ts) AS VARCHAR) AS path_start,
           CAST(COUNT(*) AS BIGINT) AS path_len,
           CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS path_value
    FROM islands
    WHERE hi = 1
    GROUP BY user_id, grp
    HAVING COUNT(*) >= 2
    """,
    doc="matchpath PTF emulation (ql/udf/ptf/MatchPath.java — Hive's "
    "row-sequence pattern matcher, the one §2 row previously marked [-]). "
    "Pattern 'HIGH+' (HIGH := value > 50, runs of length >= 2) per user in "
    "event-time order, emitting MatchPath's tpath outputs (path start, "
    "length, aggregate) per maximal match — the canonical gaps-and-islands "
    "form: two ROW_NUMBERs whose difference is constant within a run. "
    "Multi-symbol patterns ('LATE.ONTIME') compose from lead/lag the same "
    "way; Spark has no MATCH_RECOGNIZE, so this window-algebra emulation IS "
    "the Spark-first answer. Scale: two window passes + one groupBy, all "
    "partitioned by user_id — no global ordering anywhere.",
    tags=("window", "ptf", "matchpath"),
)
def ptf_matchpath_emulated(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events")
    # Single window pass: for hi=1 rows, the running sum of hi over the
    # user window equals ROW_NUMBER() within (user_id, hi) — so both island
    # keys come from ONE Exchange on user_id instead of two (the oracle
    # keeps the textbook two-ROW_NUMBER form; results are identical).
    w_all = Window.partitionBy("user_id").orderBy("ts", "event_id")
    hi = F.when(F.col("value") > 50.0, 1).otherwise(0)
    flagged = e.select(
        "user_id",
        "ts",
        "event_id",
        "value",
        hi.alias("hi"),
        (F.row_number().over(w_all) - F.sum(hi).over(w_all)).alias("grp"),
    )
    return (
        flagged.filter(F.col("hi") == 1)
        .groupBy("user_id", "grp")
        .agg(
            F.min("ts").cast("string").alias("path_start"),
            F.count(F.lit(1)).alias("path_len"),
            F.sum(F.col("value").cast(DEC)).cast("double").alias("path_value"),
        )
        .filter(F.col("path_len") >= 2)
        .select("user_id", "path_start", "path_len", "path_value")
    )


@register(
    "ptf_matchpath_multisym",
    oracle="""
    WITH flagged AS (
      SELECT user_id, ts, event_id, value,
             CASE WHEN value > 50.0 THEN 1 ELSE 0 END AS hi,
             ROW_NUMBER() OVER w AS rn,
             COALESCE(LAG(CASE WHEN value > 50.0 THEN 1 ELSE 0 END) OVER w,
                      -1) AS lag_hi,
             LAG(ts) OVER w AS lag_ts,
             LAG(value) OVER w AS lag_val,
             COALESCE(LEAD(CASE WHEN value > 50.0 THEN 1 ELSE 0 END) OVER w,
                      -1) AS lead_hi,
             LEAD(value) OVER w AS lead_val
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ),
    islands AS (
      SELECT *, rn - SUM(hi) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                   ROWS UNBOUNDED PRECEDING) AS grp
      FROM flagged
    )
    SELECT user_id,
           CAST(arg_min(lag_ts, rn) AS VARCHAR) AS path_start,
           CAST(COUNT(*) + 2 AS BIGINT) AS path_len,
           CAST(SUM(CAST(value AS DECIMAL(18,2)))
                + CAST(arg_min(lag_val, rn) AS DECIMAL(18,2))
                + CAST(arg_max(lead_val, rn) AS DECIMAL(18,2)) AS DOUBLE)
             AS path_value
    FROM islands
    WHERE hi = 1
    GROUP BY user_id, grp
    HAVING arg_min(lag_hi, rn) = 0 AND arg_max(lead_hi, rn) = 0
    """,
    doc="matchpath PTF, multi-symbol pattern 'LOW HIGH+ LOW' "
    "(ql/udf/ptf/MatchPath.java — the general SymbolFunction chain, beyond "
    "the single-symbol 'HIGH+' of ptf_matchpath_emulated): a LOW row, a "
    "greedy run of one-or-more HIGHs, then a LOW, per user in event-time "
    "order, emitting MatchPath's tpath outputs (start ts of the opening "
    "LOW, matched-path length incl. both anchors, path value sum). "
    "Composition per the sketch in the single-symbol docstring: the HIGH "
    "islands come from the rn - running-sum(hi) trick, the LOW anchors "
    "from lag/lead carried on the SAME window spec (one Exchange on "
    "user_id serves row_number, running sum, lag and lead); min_by/max_by "
    "pull each island's boundary-row lag/lead values into the aggregate, "
    "and anchors are required via the sentinel-coalesced neighbor symbols "
    "(-1 = partition edge, so edge islands can never fake a LOW anchor). "
    "Greedy 'B+' makes matches non-overlapping, so one output row per "
    "qualifying island == MatchPath semantics. Decimal-cast value sums "
    "per the determinism rules. Scale: one window Exchange + one groupBy "
    "on (user_id, grp) — both partition-parallel, no global sort.",
    tags=("window", "ptf", "matchpath"),
)
def ptf_matchpath_multisym(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    hi = F.when(F.col("value") > 50.0, 1).otherwise(0)
    flagged = e.select(
        "user_id",
        "ts",
        "event_id",
        "value",
        hi.alias("hi"),
        F.row_number().over(w).alias("rn"),
        (F.row_number().over(w) - F.sum(hi).over(w)).alias("grp"),
        F.coalesce(F.lag(hi).over(w), F.lit(-1)).alias("lag_hi"),
        F.lag("ts").over(w).alias("lag_ts"),
        F.lag("value").over(w).alias("lag_val"),
        F.coalesce(F.lead(hi).over(w), F.lit(-1)).alias("lead_hi"),
        F.lead("value").over(w).alias("lead_val"),
    )
    return (
        flagged.filter(F.col("hi") == 1)
        .groupBy("user_id", "grp")
        .agg(
            F.min_by("lag_ts", "rn").cast("string").alias("path_start"),
            (F.count(F.lit(1)) + 2).alias("path_len"),
            (
                F.sum(F.col("value").cast(DEC))
                + F.min_by("lag_val", "rn").cast(DEC)
                + F.max_by("lead_val", "rn").cast(DEC)
            )
            .cast("double")
            .alias("path_value"),
            F.min_by("lag_hi", "rn").alias("open_sym"),
            F.max_by("lead_hi", "rn").alias("close_sym"),
        )
        .filter((F.col("open_sym") == 0) & (F.col("close_sym") == 0))
        .select("user_id", "path_start", "path_len", "path_value")
    )


@register(
    "window_range_frame",
    oracle="""
    SELECT o_orderkey, o_orderstatus, o_totalprice,
           CAST(COUNT(*) OVER (
             PARTITION BY o_orderstatus ORDER BY o_totalprice
             RANGE BETWEEN 1000.0 PRECEDING AND CURRENT ROW
           ) AS BIGINT) AS n_within_1000,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) OVER (
             PARTITION BY o_orderstatus ORDER BY o_totalprice
             RANGE BETWEEN 1000.0 PRECEDING AND CURRENT ROW
           ) AS DOUBLE) AS sum_within_1000
    FROM orders
    WHERE o_orderkey < 2000
    """,
    doc="RANGE value-frame window (WindowingSpec.WindowFrameSpec RANGE "
    "branch — the half of Hive's frame grammar the ROWS running-sum query "
    "does not cover): per-status count and sum over orders whose "
    "o_totalprice lies within 1000.0 BELOW the current row's price — a "
    "VALUE-based frame, so peer rows with equal prices share identical "
    "results regardless of tie order (what makes it hash-stable where a "
    "ROWS frame over ties would not be). Decimal-cast sum factors per the "
    "determinism rules; partitioned by status, so the window parallelizes "
    "across the cluster.",
    tags=("window", "frame"),
)
def window_range_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders").filter(F.col("o_orderkey") < 2000)
    # PySpark's Window.rangeBetween only takes integer row offsets; a
    # VALUE-typed (double) range bound needs the SQL frame syntax.
    frame = (
        "OVER (PARTITION BY o_orderstatus ORDER BY o_totalprice "
        "RANGE BETWEEN 1000.0 PRECEDING AND CURRENT ROW)"
    )
    return o.selectExpr(
        "o_orderkey",
        "o_orderstatus",
        "o_totalprice",
        f"COUNT(*) {frame} AS n_within_1000",
        f"CAST(SUM(CAST(o_totalprice AS {DEC})) {frame} AS DOUBLE)"
        " AS sum_within_1000",
    )


@register(
    "events_sessionize",
    oracle="""
    WITH e AS (
      SELECT user_id, event_id, epoch_us(ts) AS ts_us
      FROM events
    ),
    gapped AS (
      SELECT user_id, event_id, ts_us,
             CASE WHEN LAG(ts_us) OVER w IS NULL
                    OR ts_us - LAG(ts_us) OVER w > 43200000000
                  THEN 1 ELSE 0 END AS new_sess
      FROM e
      WINDOW w AS (PARTITION BY user_id ORDER BY ts_us, event_id)
    ),
    numbered AS (
      SELECT user_id, event_id, ts_us,
             SUM(new_sess) OVER (PARTITION BY user_id ORDER BY ts_us, event_id
                                 ROWS UNBOUNDED PRECEDING) AS session_id
      FROM gapped
    )
    SELECT user_id,
           CAST(session_id AS BIGINT) AS session_id,
           CAST(COUNT(*) AS BIGINT) AS n_events,
           CAST(MIN(ts_us) AS BIGINT) AS start_us,
           CAST(MAX(ts_us) AS BIGINT) AS end_us,
           CAST((MAX(ts_us) - MIN(ts_us)) // 1000000 AS BIGINT) AS duration_s
    FROM numbered
    GROUP BY user_id, session_id
    """,
    doc="Batch sessionization (time-gap gaps-and-islands — the classic "
    "clickstream shape Hive users build with lag + running sum, "
    "`GenericUDFLag.java` + windowing spec; the streaming twin is "
    "window_session_agg's native session window): a gap > 12 h between a "
    "user's consecutive events opens a new session; sessions get dense "
    "per-user ids from a running sum over the change flag, then one "
    "groupBy emits per-session stats. All time math is integer "
    "MICROSECONDS (unix_micros/epoch_us) so both engines compare and "
    "subtract exactly — no float seconds, no timestamp output columns. "
    "lag, running sum, and the session groupBy all ride ONE hash "
    "partitioning on user_id (plan-asserted) — at 100 TB this is a single "
    "shuffle of the event log. Per-user SEQUENTIAL semantics pin each "
    "user to one task, so a bot-grade user (10M events measured 9.6x "
    "the no-bot control, SCALE.md r17) stragglers this form; the "
    "answer-identical hot-user-splitting twin is sessionize_bucketed "
    "(time-bucket split-and-stitch, windows never partition on user_id "
    "alone, equivalence pinned in tests/test_round17_ops.py) — one "
    "extra shuffle, use it on bot-heavy corpora.",
    tags=("window", "session", "islands"),
)
def events_sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    gap_us = 12 * 3600 * 1_000_000
    e = load_table(spark, sf_dir, "events").select(
        "user_id", "event_id", F.unix_micros("ts").alias("ts_us")
    )
    w = Window.partitionBy("user_id").orderBy("ts_us", "event_id")
    gapped = e.withColumn(
        "new_sess",
        F.when(
            F.lag("ts_us").over(w).isNull()
            | (F.col("ts_us") - F.lag("ts_us").over(w) > gap_us),
            F.lit(1),
        ).otherwise(F.lit(0)),
    )
    numbered = gapped.withColumn(
        "session_id",
        F.sum("new_sess").over(w.rowsBetween(Window.unboundedPreceding, 0)),
    )
    return numbered.groupBy("user_id", "session_id").agg(
        F.count(F.lit(1)).cast("long").alias("n_events"),
        F.min("ts_us").cast("long").alias("start_us"),
        F.max("ts_us").cast("long").alias("end_us"),
        F.floor((F.max("ts_us") - F.min("ts_us")) / 1_000_000)
        .cast("long")
        .alias("duration_s"),
    ).select(
        "user_id",
        F.col("session_id").cast("long").alias("session_id"),
        "n_events",
        "start_us",
        "end_us",
        "duration_s",
    )


def sessionize_bucketed(
    e: DataFrame, gap_us: int, bucket_us: int = 86_400_000_000
) -> DataFrame:
    """Hot-user-splitting twin of events_sessionize — ANSWER-IDENTICAL
    (same (user_id, session_id, n_events, start_us, end_us, duration_s)
    rows, same dense per-user numbering), but no window ever partitions
    by user_id alone, so a bot user with 10^9 events splits across
    time buckets instead of pinning one task (SCALE.md r17 measured the
    naive form's single-task funnel at 9.6 s for a 10M-event user vs
    1.0 s without).

    Split-and-stitch: (1) sessionize LOCALLY within (user_id, tb) where
    tb = ts_us div bucket_us — the per-bucket windows partition on two
    columns; (2) reduce each bucket to ONE summary row (first_ts,
    last_ts, n_local sessions) and run the stitch arithmetic over the
    per-user bucket-summary frame — event-count-independent, ~|range|/
    bucket_us rows per user: merge flag m(tb) = first event continues
    the previous PRESENT bucket's last session (gap <= threshold; holds
    for non-adjacent buckets too, the direct timestamp comparison does
    not assume adjacency), base(tb) = running sum of (n_local - m) over
    earlier buckets; (3) renumber events: session_id = base + local - m
    uniformly (local session 1 with m=1 lands on base = the previous
    bucket's last global id — the continuation; every later local
    session shifts down by m). A session spanning many buckets chains
    through consecutive merges. Two shuffles on event-sized data
    ((user, tb) window + the final groupBy) vs the naive form's one —
    the price of splitting the hot key; use the naive registered form
    unless the corpus has bot-grade users.

    Input: (user_id, event_id, ts_us). Equivalence to the naive form is
    pinned in tests/test_round17_ops.py on random, boundary-crossing,
    and hot-user corpora."""
    tb = (F.col("ts_us") / bucket_us).cast("long").alias("tb")
    eb = e.select("user_id", "event_id", "ts_us", tb)
    wloc = Window.partitionBy("user_id", "tb").orderBy("ts_us", "event_id")
    local = eb.withColumn(
        "new_sess",
        F.when(
            F.lag("ts_us").over(wloc).isNull()
            | (F.col("ts_us") - F.lag("ts_us").over(wloc) > gap_us),
            F.lit(1),
        ).otherwise(F.lit(0)),
    ).withColumn(
        "local_sid",
        F.sum("new_sess").over(
            wloc.rowsBetween(Window.unboundedPreceding, 0)
        ),
    )
    summary = local.groupBy("user_id", "tb").agg(
        F.min("ts_us").alias("first_ts"),
        F.max("ts_us").alias("last_ts"),
        F.max("local_sid").alias("n_local"),
    )
    wsum = Window.partitionBy("user_id").orderBy("tb")
    stitched = summary.withColumn(
        "m",
        F.when(
            F.col("first_ts") - F.lag("last_ts").over(wsum) <= gap_us,
            F.lit(1),
        ).otherwise(F.lit(0)),
    ).withColumn(
        "base",
        F.coalesce(
            F.sum(F.col("n_local") - F.col("m")).over(
                wsum.rowsBetween(Window.unboundedPreceding, -1)
            ),
            F.lit(0),
        ),
    )
    renum = local.join(
        stitched.select("user_id", "tb", "m", "base"), ["user_id", "tb"]
    ).select(
        "user_id", "ts_us",
        (F.col("base") + F.col("local_sid") - F.col("m")).alias("session_id"),
    )
    return renum.groupBy("user_id", "session_id").agg(
        F.count(F.lit(1)).cast("long").alias("n_events"),
        F.min("ts_us").cast("long").alias("start_us"),
        F.max("ts_us").cast("long").alias("end_us"),
        F.floor((F.max("ts_us") - F.min("ts_us")) / 1_000_000)
        .cast("long")
        .alias("duration_s"),
    ).select(
        "user_id",
        F.col("session_id").cast("long").alias("session_id"),
        "n_events", "start_us", "end_us", "duration_s",
    )


@register(
    "sessionize_bucketed",
    oracle="""
    WITH e AS (
      SELECT user_id, event_id, epoch_us(ts) AS ts_us
      FROM events
    ),
    gapped AS (
      SELECT user_id, event_id, ts_us,
             CASE WHEN LAG(ts_us) OVER w IS NULL
                    OR ts_us - LAG(ts_us) OVER w > 43200000000
                  THEN 1 ELSE 0 END AS new_sess
      FROM e
      WINDOW w AS (PARTITION BY user_id ORDER BY ts_us, event_id)
    ),
    numbered AS (
      SELECT user_id, event_id, ts_us,
             SUM(new_sess) OVER (PARTITION BY user_id ORDER BY ts_us, event_id
                                 ROWS UNBOUNDED PRECEDING) AS session_id
      FROM gapped
    )
    SELECT user_id,
           CAST(session_id AS BIGINT) AS session_id,
           CAST(COUNT(*) AS BIGINT) AS n_events,
           CAST(MIN(ts_us) AS BIGINT) AS start_us,
           CAST(MAX(ts_us) AS BIGINT) AS end_us,
           CAST((MAX(ts_us) - MIN(ts_us)) // 1000000 AS BIGINT) AS duration_s
    FROM numbered
    GROUP BY user_id, session_id
    """,
    doc="Hot-user-splitting sessionization (the bot-corpus twin of "
    "events_sessionize — ANSWER-IDENTICAL by construction, so the oracle "
    "is the SAME naive islands SQL; DuckDB computes the single-key form, "
    "Spark computes the split-and-stitch form, and the hash match IS the "
    "external equivalence certificate on top of the pytest pins in "
    "tests/test_round17_ops.py). No window over event-sized data ever "
    "partitions on user_id alone: local sessionize runs within "
    "(user_id, day-bucket), each bucket reduces to ONE summary row, and "
    "the stitch window rides the bucket-summary frame (~|active days| "
    "rows per user, event-count-independent). A 10^9-event bot user "
    "therefore spreads across ~|days| tasks instead of pinning one "
    "(SCALE.md r17: 10M-event bot, naive 10.2 s -> 7.3 s even on "
    "local[32]; the gap widens with executor count because the straggler "
    "bounds the naive stage). Two event-sized shuffles vs the naive "
    "form's one — use events_sessionize on human-bounded corpora, this "
    "form when per-key cardinality is adversarial. The no-single-key-"
    "window property is plan-asserted in tests/test_round18_ops.py.",
    tags=("window", "session", "islands", "skew"),
)
def sessionize_bucketed_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events").select(
        "user_id", "event_id", F.unix_micros("ts").alias("ts_us")
    )
    return sessionize_bucketed(e, gap_us=12 * 3600 * 1_000_000)


@register(
    "events_session_dynamic_gap",
    oracle="""
    WITH e AS (
      SELECT user_id, ts,
             CASE WHEN event_type = 'purchase' THEN 1800 ELSE 600 END AS gap_s
      FROM events
    ),
    o AS (
      SELECT user_id, ts, gap_s,
             MAX(epoch_us(ts) + gap_s * 1000000) OVER (
               PARTITION BY user_id ORDER BY ts
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS prev_end_us
      FROM e
    ),
    s AS (
      SELECT *, CASE WHEN prev_end_us IS NULL
                       OR epoch_us(ts) >= prev_end_us THEN 1 ELSE 0 END AS brk
      FROM o
    ),
    g AS (
      SELECT *, SUM(brk) OVER (PARTITION BY user_id ORDER BY ts
                               ROWS UNBOUNDED PRECEDING) AS sid
      FROM s
    )
    SELECT user_id,
           CAST(MIN(ts) AS VARCHAR) AS session_start,
           CAST(MAX(ts + gap_s * INTERVAL 1 SECOND) AS VARCHAR) AS session_end,
           CAST(COUNT(*) AS BIGINT) AS n_events
    FROM g GROUP BY user_id, sid
    """,
    doc="DYNAMIC-gap sessionization via Spark's native session_window() "
    "with a per-event gap expression (purchases hold a session open 30 "
    "min, other events 10 min — the engagement-weighted session every "
    "product-analytics stack wants but fixed-gap islands can't express): "
    "each event spans [ts, ts+gap); overlapping spans merge; session end "
    "is the max covered instant. Complements events_sessionize (fixed-gap "
    "lag+cumsum islands) and window_session_agg (fixed-gap native): this "
    "is the one shape where the NATIVE operator beats the idiom — the "
    "islands rewrite needs a running MAX(ts+gap) over a preceding-rows "
    "frame (exactly what the oracle does in SQL), which Spark's "
    "session_window computes in one MergingSessionsExec pass with the "
    "same single user_id shuffle. Works identically in Structured "
    "Streaming with watermark-driven state eviction.",
    tags=("window", "session", "islands"),
)
def events_session_dynamic_gap(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events").select("user_id", "ts", "event_type")
    gap = F.when(F.col("event_type") == "purchase", "30 minutes").otherwise(
        "10 minutes"
    )
    return (
        e.groupBy(F.session_window("ts", gap).alias("w"), "user_id")
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            "user_id",
            F.col("w.start").cast("string").alias("session_start"),
            F.col("w.end").cast("string").alias("session_end"),
            F.col("n_events").cast("long").alias("n_events"),
        )
    )


@register(
    "window_time_range_frame",
    oracle="""
    SELECT event_id,
           CAST(COUNT(*) OVER tw AS BIGINT) AS n_1h,
           CAST(SUM(CAST(value AS DECIMAL(18,2))) OVER tw AS DOUBLE) AS sum_1h
    FROM events
    WINDOW tw AS (PARTITION BY user_id ORDER BY ts
                  RANGE BETWEEN INTERVAL 1 HOUR PRECEDING AND CURRENT ROW)
    """,
    doc="Time-interval RANGE frame (RANGE BETWEEN INTERVAL 1 HOUR "
    "PRECEDING): per event, the trailing-hour event count and exact "
    "decimal value sum for the same user — the rate-limiter / velocity "
    "feature every fraud and engagement model computes. RANGE (not ROWS) "
    "is the correctness point: the frame is defined by the TIME axis, so "
    "same-timestamp ties are all included and gaps shrink the frame — "
    "semantics a row-count frame cannot express (complements "
    "window_range_frame's numeric-range form). One user_id window "
    "Exchange; decimal partials keep the sum bit-exact cross-engine.",
    tags=("window", "frame", "range"),
)
def window_time_range_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events")
    return e.select(
        "event_id",
        F.expr(
            "COUNT(*) OVER (PARTITION BY user_id ORDER BY ts "
            "RANGE BETWEEN INTERVAL 1 HOUR PRECEDING AND CURRENT ROW)"
        ).cast("long").alias("n_1h"),
        F.expr(
            "SUM(CAST(value AS DECIMAL(18,2))) OVER (PARTITION BY user_id "
            "ORDER BY ts RANGE BETWEEN INTERVAL 1 HOUR PRECEDING AND CURRENT ROW)"
        ).cast("double").alias("sum_1h"),
    )
