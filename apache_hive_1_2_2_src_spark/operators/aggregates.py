"""Aggregation surface (SURVEY.md §2.4).

Hive parity targets: ``ql/exec/GroupByOperator.java`` (hash/sort agg,
map-side partials — automatic in Spark's partial/final Aggregate planning),
UDAF implementations under ``ql/udf/generic/GenericUDAF*.java``, grouping
sets in ``SemanticAnalyzer.processGroupingSetReduceSinkOperator``.

Scale notes: every query here is one shuffle wide (partial agg map-side,
final agg post-shuffle). count(DISTINCT x) plans as a two-phase expand in
Spark — same as Hive's ReduceSinkDeDuplication-optimized plan. Grouping
sets use Catalyst's Expand operator: rows × |sets| before the shuffle,
which is the same cost model as Hive's grouping-set ReduceSink fan-out.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from apache_hive_1_2_2_src_spark.operators.helpers import davg, dsum, sql_davg, sql_dsum
from apache_hive_1_2_2_src_spark.registry import register
from apache_hive_1_2_2_src_spark.tables import load_table


@register(
    "agg_basic_counts",
    oracle="""
    SELECT o_orderstatus,
           COUNT(*) AS n_all,
           COUNT(o_custkey) AS n_cust,
           COUNT(DISTINCT o_custkey) AS n_cust_distinct,
           COUNT(DISTINCT o_orderpriority) AS n_prio_distinct
    FROM orders GROUP BY o_orderstatus
    """,
    doc="count(*)/count(col)/multi-count(DISTINCT) (GenericUDAFCount; "
    "getDistinctFuncExprs multi-distinct planning).",
    tags=("agg",),
)
def agg_basic_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    return o.groupBy("o_orderstatus").agg(
        F.count(F.lit(1)).alias("n_all"),
        F.count("o_custkey").alias("n_cust"),
        F.countDistinct("o_custkey").alias("n_cust_distinct"),
        F.countDistinct("o_orderpriority").alias("n_prio_distinct"),
    )


@register(
    "agg_sum_avg_min_max",
    oracle="""
    SELECT l_returnflag,
           {s}, {a},
           CAST(MIN(l_extendedprice) AS DOUBLE) AS min_price,
           CAST(MAX(l_extendedprice) AS DOUBLE) AS max_price,
           MIN(l_linenumber) AS min_ln, MAX(l_linenumber) AS max_ln
    FROM lineitem GROUP BY l_returnflag
    """.format(s=sql_dsum("l_extendedprice", "sum_price"), a=sql_davg("l_extendedprice", "avg_price")),
    doc="sum/avg/min/max (GenericUDAFSum/Average/Min/Max).",
    tags=("agg",),
)
def agg_sum_avg_min_max(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        dsum("l_extendedprice", "sum_price"),
        davg("l_extendedprice", "avg_price"),
        F.min("l_extendedprice").cast("double").alias("min_price"),
        F.max("l_extendedprice").cast("double").alias("max_price"),
        F.min("l_linenumber").alias("min_ln"),
        F.max("l_linenumber").alias("max_ln"),
    )


@register(
    "agg_global_no_groupby",
    oracle="""
    SELECT COUNT(*) AS n_rows, COUNT(DISTINCT l_orderkey) AS n_orders,
           {s}
    FROM lineitem
    """.format(s=sql_dsum("l_quantity", "total_qty")),
    doc="Global aggregate without GROUP BY.",
    tags=("agg",),
)
def agg_global_no_groupby(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    return li.agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.countDistinct("l_orderkey").alias("n_orders"),
        dsum("l_quantity", "total_qty"),
    )


@register(
    "agg_variance_stddev",
    oracle="""
    SELECT l_linestatus,
           CAST(ROUND(var_pop(l_discount), 10) AS DOUBLE) AS var_pop_disc,
           CAST(ROUND(var_samp(l_discount), 10) AS DOUBLE) AS var_samp_disc,
           CAST(ROUND(stddev_pop(l_discount), 10) AS DOUBLE) AS std_pop_disc,
           CAST(ROUND(stddev_samp(l_discount), 10) AS DOUBLE) AS std_samp_disc
    FROM lineitem GROUP BY l_linestatus
    """,
    doc="variance family (GenericUDAFVariance/Std*). Rounded to 1e-10: both "
    "engines use single-pass covariance updates but different merge orders.",
    tags=("agg", "stats"),
)
def agg_variance_stddev(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    return li.groupBy("l_linestatus").agg(
        F.round(F.var_pop("l_discount"), 10).cast("double").alias("var_pop_disc"),
        F.round(F.var_samp("l_discount"), 10).cast("double").alias("var_samp_disc"),
        F.round(F.stddev_pop("l_discount"), 10).cast("double").alias("std_pop_disc"),
        F.round(F.stddev_samp("l_discount"), 10).cast("double").alias("std_samp_disc"),
    )


@register(
    "agg_covar_corr",
    oracle="""
    SELECT CAST(ROUND(covar_pop(l_quantity, l_extendedprice), 6) AS DOUBLE) AS cov_pop,
           CAST(ROUND(covar_samp(l_quantity, l_extendedprice), 6) AS DOUBLE) AS cov_samp,
           CAST(ROUND(corr(l_quantity, l_extendedprice), 10) AS DOUBLE) AS correlation
    FROM lineitem WHERE l_orderkey <= 10000
    """,
    doc="covar_pop/covar_samp/corr (GenericUDAFCovariance*/Correlation).",
    tags=("agg", "stats"),
)
def agg_covar_corr(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem").filter(F.col("l_orderkey") <= 10000)
    return li.agg(
        F.round(F.covar_pop("l_quantity", "l_extendedprice"), 6).cast("double").alias("cov_pop"),
        F.round(F.covar_samp("l_quantity", "l_extendedprice"), 6).cast("double").alias("cov_samp"),
        F.round(F.corr("l_quantity", "l_extendedprice"), 10).cast("double").alias("correlation"),
    )


@register(
    "agg_percentile_exact",
    oracle="""
    SELECT o_orderstatus,
           CAST(ROUND(quantile_cont(o_orderkey, 0.5), 6) AS DOUBLE) AS p50,
           CAST(ROUND(quantile_cont(o_orderkey, 0.9), 6) AS DOUBLE) AS p90
    FROM orders GROUP BY o_orderstatus
    """,
    doc="Exact percentile over bigint (ql/udf/UDAFPercentile.java) — Spark "
    "percentile() ≡ DuckDB quantile_cont (linear interpolation).",
    tags=("agg", "stats"),
)
def agg_percentile_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    return o.groupBy("o_orderstatus").agg(
        F.round(F.percentile("o_orderkey", F.lit(0.5)), 6).cast("double").alias("p50"),
        F.round(F.percentile("o_orderkey", F.lit(0.9)), 6).cast("double").alias("p90"),
    )


@register(
    "agg_collect_list_set",
    oracle="""
    SELECT n_regionkey,
           array_to_string(list_sort(list(n_name)), ',') AS nations,
           array_to_string(list_sort(list(DISTINCT CAST(n_regionkey + 0 AS VARCHAR))), ',')
               AS keys_set
    FROM nation GROUP BY n_regionkey
    """,
    doc="collect_list/collect_set (GenericUDAFCollect*), sorted for "
    "determinism (SURVEY §5 rule) and joined to a scalar string so any "
    "order-insensitive canonicalizer can hash the row.",
    tags=("agg", "collection"),
)
def agg_collect_list_set(spark: SparkSession, sf_dir: str) -> DataFrame:
    n = load_table(spark, sf_dir, "nation")
    return n.groupBy("n_regionkey").agg(
        F.array_join(F.sort_array(F.collect_list("n_name")), ",").alias("nations"),
        F.array_join(
            F.sort_array(F.collect_set((F.col("n_regionkey") + 0).cast("string"))), ","
        ).alias("keys_set"),
    )


@register(
    "agg_grouping_sets",
    oracle="""
    SELECT o_orderstatus, o_orderpriority,
           GROUPING(o_orderstatus, o_orderpriority) AS gid,
           COUNT(*) AS n, {s}
    FROM orders
    GROUP BY GROUPING SETS ((o_orderstatus, o_orderpriority), (o_orderstatus), ())
    """.format(s=sql_dsum("o_totalprice", "total_price")),
    doc="GROUPING SETS + GROUPING__ID (processGroupingSetReduceSinkOperator; "
    "grouping_id() bit order is ANSI in both Spark ≥3 and DuckDB).",
    tags=("agg", "groupingsets"),
)
def agg_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    o.createOrReplaceTempView("orders")
    return spark.sql(
        """
        SELECT o_orderstatus, o_orderpriority,
               GROUPING_ID(o_orderstatus, o_orderpriority) AS gid,
               COUNT(*) AS n,
               CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total_price
        FROM orders
        GROUP BY GROUPING SETS ((o_orderstatus, o_orderpriority), (o_orderstatus), ())
        """
    )


@register(
    "agg_rollup",
    oracle="""
    SELECT o_orderstatus, o_orderpriority, COUNT(*) AS n
    FROM orders
    GROUP BY ROLLUP (o_orderstatus, o_orderpriority)
    """,
    doc="ROLLUP (GroupByDesc.groupingSets).",
    tags=("agg", "groupingsets"),
)
def agg_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    return o.rollup("o_orderstatus", "o_orderpriority").agg(F.count(F.lit(1)).alias("n"))


@register(
    "agg_cube",
    oracle="""
    SELECT l_returnflag, l_linestatus, COUNT(*) AS n, {s}
    FROM lineitem
    GROUP BY CUBE (l_returnflag, l_linestatus)
    """.format(s=sql_dsum("l_quantity", "sum_qty")),
    doc="CUBE (GroupByDesc.groupingSets).",
    tags=("agg", "groupingsets"),
)
def agg_cube(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    return li.cube("l_returnflag", "l_linestatus").agg(
        F.count(F.lit(1)).alias("n"), dsum("l_quantity", "sum_qty")
    )


@register(
    "agg_having",
    oracle="""
    SELECT o_custkey, COUNT(*) AS n_orders
    FROM orders GROUP BY o_custkey HAVING COUNT(*) >= 15
    """,
    doc="HAVING (post-aggregation filter; FilterOperator above GroupBy).",
    tags=("agg",),
)
def agg_having(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    return (
        o.groupBy("o_custkey")
        .agg(F.count(F.lit(1)).alias("n_orders"))
        .filter(F.col("n_orders") >= 15)
    )


@register(
    "agg_approx_count_distinct",
    oracle="""
    SELECT COUNT(DISTINCT l_orderkey) AS exact_orderkey,
           COUNT(DISTINCT l_partkey) AS exact_partkey,
           TRUE AS ndv_orderkey_ok, TRUE AS ndv_partkey_ok
    FROM lineitem
    """,
    doc="compute_stats NDV (GenericUDAFComputeStats FM-sketch) → Spark "
    "approx_count_distinct (HLL++). The raw estimate is engine-specific, so "
    "the query outputs a bounds check instead: HLL++ at default rsd=0.05 "
    "must land within ±15%% of the exact NDV (3σ).",
    tags=("agg", "approx"),
)
def agg_approx_count_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    est = li.agg(
        F.approx_count_distinct("l_orderkey").alias("ndv_ok_est"),
        F.approx_count_distinct("l_partkey").alias("ndv_pk_est"),
        F.countDistinct("l_orderkey").alias("exact_orderkey"),
        F.countDistinct("l_partkey").alias("exact_partkey"),
    )
    def _within(estc: str, exactc: str):
        lo = F.col(exactc) * 0.85
        hi = F.col(exactc) * 1.15
        return (F.col(estc) >= lo) & (F.col(estc) <= hi)
    return est.select(
        "exact_orderkey",
        "exact_partkey",
        _within("ndv_ok_est", "exact_orderkey").alias("ndv_orderkey_ok"),
        _within("ndv_pk_est", "exact_partkey").alias("ndv_partkey_ok"),
    )


@register(
    "agg_percentile_approx",
    oracle="""
    SELECT l_returnflag, COUNT(*) AS n, TRUE AS approx_in_bounds
    FROM lineitem GROUP BY l_returnflag
    """,
    doc="percentile_approx (GenericUDAFPercentileApprox adaptive histogram "
    "vs Spark's GK quantile sketch — algorithms differ, so the query "
    "outputs a sandwich check: the approx p50 must lie between the exact "
    "p40 and p60 — far looser than the sketch's 1/accuracy rank guarantee.",
    tags=("agg", "approx"),
)
def agg_percentile_approx(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    g = li.groupBy("l_returnflag").agg(
        F.percentile_approx("l_extendedprice", F.lit(0.5), F.lit(10000)).alias("p50_est"),
        F.percentile("l_extendedprice", F.lit(0.4)).alias("p40"),
        F.percentile("l_extendedprice", F.lit(0.6)).alias("p60"),
        F.count(F.lit(1)).alias("n"),
    )
    return g.select(
        "l_returnflag",
        "n",
        ((F.col("p50_est") >= F.col("p40")) & (F.col("p50_est") <= F.col("p60"))).alias(
            "approx_in_bounds"
        ),
    )


@register(
    "agg_histogram_numeric",
    oracle="""
    SELECT 10 AS n_bins, COUNT(*) AS total_weight, TRUE AS centroids_in_range
    FROM lineitem
    """,
    doc="histogram_numeric (GenericUDAFHistogramNumeric / NumericHistogram "
    "~250 LoC) — Spark ≥3.3 builtin. Bin PLACEMENT is heuristic per engine, "
    "but the histogram invariants are not: exactly 10 bins, bin weights sum "
    "to the row count, every centroid inside [min, max] of the column.",
    tags=("agg", "approx"),
)
def agg_histogram_numeric(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    li.createOrReplaceTempView("lineitem_hist")
    return spark.sql(
        """
        SELECT size(hist) AS n_bins,
               CAST(round(aggregate(hist, 0D, (a, b) -> a + b.y)) AS BIGINT)
                   AS total_weight,
               forall(hist, b -> b.x >= lo AND b.x <= hi) AS centroids_in_range
        FROM (
          SELECT histogram_numeric(l_extendedprice, 10) AS hist,
                 MIN(l_extendedprice) AS lo, MAX(l_extendedprice) AS hi
          FROM lineitem_hist
        )
        """
    )


@register(
    "agg_percentile_array",
    oracle="""
    SELECT o_orderstatus,
           CAST(ROUND(quantile_cont(o_orderkey, 0.25), 6) AS DOUBLE) AS p25,
           CAST(ROUND(quantile_cont(o_orderkey, 0.50), 6) AS DOUBLE) AS p50,
           CAST(ROUND(quantile_cont(o_orderkey, 0.75), 6) AS DOUBLE) AS p75,
           CAST(ROUND(quantile_cont(o_orderkey, 0.99), 6) AS DOUBLE) AS p99
    FROM orders GROUP BY o_orderstatus
    """,
    doc="percentile(col, array(...)) — UDAFPercentile's ARRAY overload "
    "(ql/udf/UDAFPercentile.java: one pass computes every requested "
    "quantile from the same histogram, the form Hive users call for "
    "latency dashboards): Spark's percentile(col, array(..)) likewise "
    "returns array<double> from one aggregation buffer. The array is "
    "unpacked to one aliased column per quantile so the driver's "
    "canonicalizer sees scalar doubles (and DuckDB, which lacks the array "
    "overload, mirrors with per-quantile quantile_cont — same exact "
    "linear-interpolation definition). One shuffle, partial/final.",
    tags=("agg", "stats"),
)
def agg_percentile_array(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    pcts = F.percentile("o_orderkey", F.array(*[F.lit(p) for p in (0.25, 0.5, 0.75, 0.99)]))
    return (
        o.groupBy("o_orderstatus")
        .agg(pcts.alias("ps"))
        .select(
            "o_orderstatus",
            *[
                F.round(F.col("ps")[i], 6).cast("double").alias(a)
                for i, a in enumerate(("p25", "p50", "p75", "p99"))
            ],
        )
    )


@register(
    "agg_distinct_grouping_sets",
    oracle="""
    SELECT o_orderstatus, o_orderpriority,
           GROUPING(o_orderstatus, o_orderpriority) AS gid,
           COUNT(DISTINCT o_custkey) AS n_cust,
           COUNT(*) AS n
    FROM orders
    GROUP BY GROUPING SETS ((o_orderstatus, o_orderpriority), (o_orderstatus), ())
    """,
    doc="COUNT(DISTINCT) under GROUPING SETS — the SURVEY §7 watch-list "
    "interaction (Hive: GroupByOperator distinct-bitmap inside the "
    "grouping-sets Expand, `processGroupingSetReduceSinkOperator` + "
    "distinct columns in the ReduceSink key; a classic wrong-results "
    "minefield in 1.x). Spark plans Expand then a two-phase distinct "
    "aggregate per grouping set; each set's distinct count must be over "
    "the set's own group, not the expanded union. Literal SQL on both "
    "engines; the per-set counts certify the interaction.",
    tags=("agg", "groupingsets", "distinct", "sql"),
)
def agg_distinct_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    o.createOrReplaceTempView("orders_dgs")
    return spark.sql(
        """
        SELECT o_orderstatus, o_orderpriority,
               GROUPING_ID(o_orderstatus, o_orderpriority) AS gid,
               COUNT(DISTINCT o_custkey) AS n_cust,
               COUNT(*) AS n
        FROM orders_dgs
        GROUP BY GROUPING SETS ((o_orderstatus, o_orderpriority), (o_orderstatus), ())
        """
    )


@register(
    "agg_hll_sketch_rollup",
    # Invariant-bounds oracle (the approx-NDV pattern of
    # agg_approx_count_distinct): the estimates themselves are
    # sketch-implementation-specific, so the oracled projection is the
    # EXACT per-day NDV plus booleans pinning both the per-day estimates
    # and the rolled-up (union-merged) estimate inside a 5% band. A sketch
    # regression (wrong lgK, broken union, serialization bug) lands far
    # outside 5% on this data and flips a boolean.
    oracle="""
    SELECT CAST(CAST(ts AS DATE) AS VARCHAR) AS day,
           CAST(COUNT(DISTINCT user_id) AS BIGINT) AS exact_ndv,
           TRUE AS est_ok
    FROM events
    GROUP BY CAST(ts AS DATE)
    UNION ALL
    SELECT 'ALL' AS day,
           CAST(COUNT(DISTINCT user_id) AS BIGINT) AS exact_ndv,
           TRUE AS est_ok
    FROM events
    """,
    doc="HLL sketch build + lossless-rollup merge (Apache DataSketches via "
    "Spark's hll_sketch_agg/hll_union_agg — the pre-aggregation pattern "
    "every warehouse uses for distinct-count rollups): per-day sketches "
    "of distinct users are built ONCE, then the monthly NDV comes from "
    "hll_union_agg over the 30 day-sketches — never a rescan of raw "
    "events. At 100 TB this is THE distinct-count architecture: persist "
    "kilobyte sketches per (day, dimension) partition and answer any "
    "rollup by merging sketches (associative, re-aggregable), versus "
    "count-distinct's full shuffle per question. Note the merged estimate "
    "may differ slightly from a direct whole-corpus sketch (the union "
    "gadget densifies) — both are pinned within 5% of exact, which is "
    "~3x the expected lgK=12 standard error (0.8%), so flakiness would "
    "itself signal a sketch bug.",
    tags=("agg", "sketch", "approx"),
)
def agg_hll_sketch_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events").select(
        F.to_date("ts").alias("day"), F.col("user_id").cast("string").alias("uid")
    )
    per_day = e.groupBy("day").agg(
        F.expr("hll_sketch_agg(uid)").alias("sk"),
        F.countDistinct("uid").alias("exact_ndv"),
    )
    days = per_day.select(
        F.col("day").cast("string").alias("day"),
        F.col("exact_ndv").cast("long").alias("exact_ndv"),
        (
            F.abs(F.expr("hll_sketch_estimate(sk)") - F.col("exact_ndv"))
            <= 0.05 * F.col("exact_ndv")
        ).alias("est_ok"),
    )
    total_exact = e.agg(F.countDistinct("uid").alias("exact_ndv"))
    merged = (
        per_day.agg(F.expr("hll_sketch_estimate(hll_union_agg(sk))").alias("est"))
        .crossJoin(total_exact)
        .select(
            F.lit("ALL").alias("day"),
            F.col("exact_ndv").cast("long").alias("exact_ndv"),
            (F.abs(F.col("est") - F.col("exact_ndv")) <= 0.05 * F.col("exact_ndv")).alias(
                "est_ok"
            ),
        )
    )
    return days.unionByName(merged)


@register(
    "agg_weighted_median",
    oracle="""
    WITH vw AS (
      SELECT l_returnflag AS grp, l_extendedprice AS val,
             SUM(CAST(l_quantity AS BIGINT)) AS w
      FROM lineitem GROUP BY 1, 2
    ),
    c AS (
      SELECT grp, val, w,
             SUM(w) OVER (PARTITION BY grp ORDER BY val
                          ROWS UNBOUNDED PRECEDING) AS cumw,
             SUM(w) OVER (PARTITION BY grp) AS totw
      FROM vw
    )
    SELECT grp,
           MIN(val) AS weighted_median,
           CAST(MAX(totw) AS BIGINT) AS total_weight
    FROM c WHERE 2 * cumw >= totw
    GROUP BY grp
    """,
    doc="Exact WEIGHTED median per group (quantity-weighted median "
    "extended price per returnflag — the ops/pricing statistic neither "
    "Hive 1.2's percentile (unweighted) nor percentile_approx computes): "
    "collapse to (group, value, summed weight) first — this makes ties "
    "deterministic AND shrinks the window input to distinct values — "
    "then a running weight sum ordered by value picks the smallest value "
    "with 2*cum >= total (integer cross-multiplication, no halves, no "
    "interpolation; the value emitted is an actual data value so both "
    "engines agree bit-exactly). Two shuffles (pre-agg + per-group "
    "window); the window partitions by group, never global. At 100 TB "
    "the pre-agg collapse is the lever: the window runs over distinct "
    "values per group, not raw rows.",
    tags=("agg", "window", "stats"),
)
def agg_weighted_median(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    li = load_table(spark, sf_dir, "lineitem")
    vw = li.groupBy(
        F.col("l_returnflag").alias("grp"), F.col("l_extendedprice").alias("val")
    ).agg(F.sum(F.col("l_quantity").cast("bigint")).alias("w"))
    win = (
        Window.partitionBy("grp")
        .orderBy("val")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    c = vw.select(
        "grp",
        "val",
        F.sum("w").over(win).alias("cumw"),
        F.sum("w").over(Window.partitionBy("grp")).alias("totw"),
    )
    return (
        c.where(2 * F.col("cumw") >= F.col("totw"))
        .groupBy("grp")
        .agg(
            F.min("val").alias("weighted_median"),
            F.max("totw").cast("long").alias("total_weight"),
        )
    )


@register(
    "agg_mode_exact",
    oracle="""
    WITH c AS (
      SELECT o_orderpriority AS grp, o_orderstatus AS val, COUNT(*) AS n
      FROM orders GROUP BY 1, 2
    ),
    r AS (
      SELECT grp, val, n,
             ROW_NUMBER() OVER (PARTITION BY grp ORDER BY n DESC, val) AS rk
      FROM c
    )
    SELECT grp,
           val AS mode_val,
           CAST(n AS BIGINT) AS mode_count
    FROM r WHERE rk = 1
    """,
    doc="Exact MODE per group with a DETERMINISTIC tie-break (count DESC, "
    "value ASC): count-per-value pre-agg then a per-group row_number pick "
    "— the portable form. Spark 3.4+ ships mode() and DuckDB ships "
    "mode(), but their tie-breaks are implementation-defined and NEED NOT "
    "agree (the registry's nondeterminism rule), so the explicit "
    "two-stage form is what a cross-engine pipeline should run. Shuffles: "
    "one partial-agg groupBy (|groups x values|) + one window over the "
    "pre-agg — never over raw rows.",
    tags=("agg", "stats", "window"),
)
def agg_mode_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    c = (
        load_table(spark, sf_dir, "orders")
        .groupBy(
            F.col("o_orderpriority").alias("grp"),
            F.col("o_orderstatus").alias("val"),
        )
        .agg(F.count(F.lit(1)).alias("n"))
    )
    w = Window.partitionBy("grp").orderBy(F.col("n").desc(), F.col("val"))
    return (
        c.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") == 1)
        .select(
            "grp",
            F.col("val").alias("mode_val"),
            F.col("n").cast("long").alias("mode_count"),
        )
    )


@register(
    "agg_approx_top_k",
    # The sketch's counts are EXACT whenever distinct items fit inside
    # maxItemsTracked (5 values << the 10k default), so the full value
    # hash — not just an invariant — is checkable. The top-3 boundary is
    # tie-free at every shipped SF (verified: rank-3 vs rank-4 counts
    # differ at sf0.001/0.01/0.1); items are re-sorted deterministically
    # because the sketch's own output order on equal counts is undefined.
    oracle="""
    SELECT o_orderpriority AS item, CAST(COUNT(*) AS BIGINT) AS cnt
    FROM orders GROUP BY 1
    ORDER BY cnt DESC, item LIMIT 3
    """,
    doc="Approximate top-k heavy hitters (Spark 4's approx_top_k sketch — "
    "the frequency twin of the HLL rollup: one pass, mergeable partials, "
    "bounded memory regardless of cardinality): top-3 order priorities "
    "by count. On corpus-scale cardinalities the sketch bounds memory at "
    "maxItemsTracked while exact GROUP BY ORDER BY LIMIT must shuffle "
    "every distinct key; here distinct values fit the sketch, so counts "
    "are exact and fully hash-checked against the exact top-3.",
    tags=("agg", "sketch", "approx"),
)
def agg_approx_top_k(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    top = o.agg(F.expr("approx_top_k(o_orderpriority, 3)").alias("tk"))
    return (
        top.select(F.explode("tk").alias("e"))
        .select(
            F.col("e.item").alias("item"),
            F.col("e.count").cast("long").alias("cnt"),
        )
    )


@register(
    "agg_stats_merge_incremental",
    oracle="""
    WITH part AS (
      SELECT CASE WHEN doc_id % 7 = 0 THEN 'new' ELSE 'old' END AS p,
             n_chars
      FROM documents
    ),
    partials AS (
      SELECT p,
             COUNT(*) AS n,
             SUM(n_chars) AS s,
             SUM(n_chars * n_chars) AS sq,
             MIN(n_chars) AS mn,
             MAX(n_chars) AS mx
      FROM part GROUP BY p
    ),
    merged AS (
      SELECT SUM(n) AS n, SUM(s) AS s, SUM(sq) AS sq,
             MIN(mn) AS mn, MAX(mx) AS mx
      FROM partials
    ),
    direct AS (
      SELECT COUNT(*) AS n, SUM(n_chars) AS s,
             SUM(n_chars * n_chars) AS sq,
             MIN(n_chars) AS mn, MAX(n_chars) AS mx
      FROM documents
    )
    SELECT CAST(m.n AS BIGINT) AS n,
           CAST(m.s AS BIGINT) AS sum_chars,
           CAST(m.sq AS BIGINT) AS sum_sq,
           CAST(m.mn AS BIGINT) AS min_chars,
           CAST(m.mx AS BIGINT) AS max_chars,
           (m.n = d.n AND m.s = d.s AND m.sq = d.sq
            AND m.mn = d.mn AND m.mx = d.mx) AS merge_exact
    FROM merged m, direct d
    """,
    doc="Incremental statistics maintenance (ANALYZE TABLE without the "
    "rescan — StatsOptimizer.java's accumulate path, and the partial-"
    "stats merge every partitioned metastore performs): per-partition "
    "stat PARTIALS (count, sum, sum-of-squares, min, max — the mergeable "
    "quintuple from which count/mean/variance/extrema all derive) are "
    "combined by pure algebra (sums add, extrema fold), and merge_exact "
    "pins that the merged result EQUALS the direct whole-table "
    "computation bit-for-bit — true because every partial is an exact "
    "BIGINT, the property that makes stats incrementally maintainable at "
    "100 TB (re-analyze only changed partitions, fold into the stored "
    "partials; nothing approximate, nothing rescanned).",
    tags=("agg", "stats", "incremental"),
)
def agg_stats_merge_incremental(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents").select("doc_id", "n_chars")
    partials = (
        d.withColumn(
            "p", F.when(F.col("doc_id") % 7 == 0, "new").otherwise("old")
        )
        .groupBy("p")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("n_chars").alias("s"),
            F.sum(F.col("n_chars") * F.col("n_chars")).alias("sq"),
            F.min("n_chars").alias("mn"),
            F.max("n_chars").alias("mx"),
        )
    )
    merged = partials.agg(
        F.sum("n").alias("n"),
        F.sum("s").alias("s"),
        F.sum("sq").alias("sq"),
        F.min("mn").alias("mn"),
        F.max("mx").alias("mx"),
    )
    direct = d.agg(
        F.count(F.lit(1)).alias("dn"),
        F.sum("n_chars").alias("ds"),
        F.sum(F.col("n_chars") * F.col("n_chars")).alias("dsq"),
        F.min("n_chars").alias("dmn"),
        F.max("n_chars").alias("dmx"),
    )
    return merged.crossJoin(direct).select(
        F.col("n").cast("long").alias("n"),
        F.col("s").cast("long").alias("sum_chars"),
        F.col("sq").cast("long").alias("sum_sq"),
        F.col("mn").cast("long").alias("min_chars"),
        F.col("mx").cast("long").alias("max_chars"),
        (
            (F.col("n") == F.col("dn"))
            & (F.col("s") == F.col("ds"))
            & (F.col("sq") == F.col("dsq"))
            & (F.col("mn") == F.col("dmn"))
            & (F.col("mx") == F.col("dmx"))
        ).alias("merge_exact"),
    )


@register(
    "agg_ratio_to_parent",
    oracle="""
    WITH cell AS (
      SELECT o_orderpriority AS prio, o_orderstatus AS status,
             COUNT(*) AS n,
             SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS rev
      FROM orders GROUP BY 1, 2
    )
    SELECT prio, status,
           CAST(n AS BIGINT) AS n,
           CAST(rev AS DOUBLE) AS revenue,
           CAST(n * 10000 // SUM(n) OVER (PARTITION BY prio) AS BIGINT)
             AS share_of_prio_bp,
           CAST(n * 10000 // SUM(n) OVER () AS BIGINT) AS share_of_total_bp
    FROM cell
    """,
    doc="Ratio-to-parent report (the percent-of-parent rollup every BI "
    "report renders next to a CUBE: each (priority, status) cell's share "
    "of its priority parent AND of the grand total): one groupBy pass "
    "computes the cells, then two window sums over the METADATA-SIZED "
    "cell table (|prios|x|statuses| rows) derive both denominators — the "
    "raw table is scanned exactly once, the windows cost nothing at any "
    "scale. Shares as exact integer basis points (floor division both "
    "engines); revenue decimal-exact.",
    tags=("agg", "window", "report"),
)
def agg_ratio_to_parent(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    cell = (
        load_table(spark, sf_dir, "orders")
        .groupBy(
            F.col("o_orderpriority").alias("prio"),
            F.col("o_orderstatus").alias("status"),
        )
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col("o_totalprice").cast("decimal(18,2)")).alias("rev"),
        )
    )
    return cell.select(
        "prio",
        "status",
        F.col("n").cast("long").alias("n"),
        F.col("rev").cast("double").alias("revenue"),
        F.floor(F.col("n") * 10000 / F.sum("n").over(Window.partitionBy("prio")))
        .cast("long")
        .alias("share_of_prio_bp"),
        F.floor(F.col("n") * 10000 / F.sum("n").over(Window.partitionBy()))
        .cast("long")
        .alias("share_of_total_bp"),
    )


@register(
    "agg_regression_exact",
    oracle="""
    WITH pts AS (
      SELECT event_type,
             CAST(epoch_us(ts) // 3600000000 AS BIGINT) AS x,
             CAST(ROUND(value * 100) AS BIGINT) AS y_cents
      FROM events
    ),
    sums AS (
      SELECT event_type,
             COUNT(*) AS n, SUM(x) AS sx, SUM(y_cents) AS sy,
             SUM(x * y_cents) AS sxy, SUM(x * x) AS sxx
      FROM pts GROUP BY event_type
    )
    SELECT event_type,
           CAST(n AS BIGINT) AS n,
           CAST(ROUND(CAST(n * sxy - sx * sy AS DOUBLE)
                      / CAST(n * sxx - sx * sx AS DOUBLE), 9) AS DOUBLE)
             AS slope_cents_per_hour,
           CAST(ROUND((CAST(sy AS DOUBLE)
                       - CAST(n * sxy - sx * sy AS DOUBLE)
                         / CAST(n * sxx - sx * sx AS DOUBLE)
                         * CAST(sx AS DOUBLE)) / CAST(n AS DOUBLE), 6)
                AS DOUBLE) AS intercept_cents
    FROM sums
    """,
    doc="Least-squares regression per group from EXACT integer sums (the "
    "regr_slope/regr_intercept family — Hive added it only in 2.2, and "
    "float-accumulating implementations are parallelism-order-dependent): "
    "x = hour index, y = value in integer cents; n/Σx/Σy/Σxy/Σx² are "
    "exact BIGINTs (map-side partials, one shuffle), and slope/intercept "
    "are single IEEE divisions of those exact integers — bit-identical "
    "at any parallelism, unlike a running float covariance. The "
    "closed-form-from-sufficient-statistics shape is also the mergeable "
    "one: partials from different partitions/days fold by addition "
    "(agg_stats_merge_incremental's property, extended to regression).",
    tags=("agg", "stats", "regression"),
)
def agg_regression_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    pts = load_table(spark, sf_dir, "events").select(
        "event_type",
        F.floor(F.unix_micros("ts") / 3600000000).cast("long").alias("x"),
        F.round(F.col("value") * 100).cast("long").alias("y_cents"),
    )
    s = pts.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("x").alias("sx"),
        F.sum("y_cents").alias("sy"),
        F.sum(F.col("x") * F.col("y_cents")).alias("sxy"),
        F.sum(F.col("x") * F.col("x")).alias("sxx"),
    )
    num = (F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")).cast("double")
    den = (F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")).cast("double")
    slope = num / den
    return s.select(
        "event_type",
        F.col("n").cast("long").alias("n"),
        F.round(slope, 9).alias("slope_cents_per_hour"),
        F.round(
            (F.col("sy").cast("double") - slope * F.col("sx").cast("double"))
            / F.col("n").cast("double"),
            6,
        ).alias("intercept_cents"),
    )


@register(
    "agg_argmax_struct",
    oracle="""
    SELECT o_orderpriority AS prio,
           CAST(MAX({'p': CAST(o_totalprice AS DECIMAL(18,2)),
                     'k': o_orderkey}).p AS DOUBLE) AS top_price,
           CAST(MAX({'p': CAST(o_totalprice AS DECIMAL(18,2)),
                     'k': o_orderkey}).k AS BIGINT) AS top_orderkey
    FROM orders GROUP BY o_orderpriority
    """,
    doc="Argmax WITHOUT a window — the struct-max idiom (the scale answer "
    "to max_by/arg_max, whose tie behavior is implementation-defined): "
    "MAX over a (price, key) struct compares lexicographically in BOTH "
    "engines, so the winning row is the highest price with ties broken "
    "by highest key — fully deterministic, and it runs as an ordinary "
    "partial-aggregable MAX (map-side combine, one shuffle of one struct "
    "per group) instead of a per-group row_number window over all rows. "
    "This is the idiom to reach for when top-1-per-group feeds a "
    "100 TB aggregation; the window form (agg_mode_exact) is for "
    "top-N > 1. Price decimal-cast so struct comparison is exact.",
    tags=("agg", "argmax"),
)
def agg_argmax_struct(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    m = F.max(
        F.struct(
            F.col("o_totalprice").cast("decimal(18,2)").alias("p"),
            F.col("o_orderkey").alias("k"),
        )
    )
    return o.groupBy(F.col("o_orderpriority").alias("prio")).agg(
        m.getField("p").cast("double").alias("top_price"),
        m.getField("k").cast("long").alias("top_orderkey"),
    )


@register(
    "agg_filter_clause_sql",
    oracle="""
    SELECT o_orderpriority AS prio,
           CAST(COUNT(*) FILTER (WHERE o_orderstatus = 'F') AS BIGINT)
             AS n_f,
           CAST(COUNT(*) FILTER (WHERE o_orderstatus = 'O') AS BIGINT)
             AS n_o,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2)))
                  FILTER (WHERE o_orderstatus = 'F') AS DOUBLE) AS sum_f,
           CAST(SUM(CASE WHEN o_orderstatus = 'F'
                         THEN CAST(o_totalprice AS DECIMAL(18,2)) END)
             AS DOUBLE) AS sum_f_case,
           -- IS NOT DISTINCT FROM mirrors Spark's <=>: a group with no
           -- 'F' rows yields NULL sums on both sides and must agree TRUE
           (SUM(CAST(o_totalprice AS DECIMAL(18,2)))
              FILTER (WHERE o_orderstatus = 'F')
            IS NOT DISTINCT FROM
            SUM(CASE WHEN o_orderstatus = 'F'
                     THEN CAST(o_totalprice AS DECIMAL(18,2)) END))
             AS forms_agree
    FROM orders GROUP BY o_orderpriority
    """,
    doc="SQL-standard FILTER clause parity (agg FILTER (WHERE p) — absent "
    "in Hive 1.2, whose users wrote SUM(CASE WHEN p THEN x END); both "
    "engines now support the standard form and this query pins that the "
    "two spellings are EXACTLY equal on decimal sums, emitting both "
    "columns plus the equality bit): per-priority filtered counts and "
    "sums. FILTER compiles to the same conditional-aggregate plan as the "
    "CASE form — zero extra cost, purely dialect surface — which is "
    "exactly what a migrating Hive user needs to know.",
    tags=("agg", "sql", "dialect"),
)
def agg_filter_clause_sql(spark: SparkSession, sf_dir: str) -> DataFrame:
    load_table(spark, sf_dir, "orders").createOrReplaceTempView("fc_orders")
    return spark.sql(
        """
        SELECT o_orderpriority AS prio,
               CAST(COUNT(*) FILTER (WHERE o_orderstatus = 'F') AS BIGINT)
                 AS n_f,
               CAST(COUNT(*) FILTER (WHERE o_orderstatus = 'O') AS BIGINT)
                 AS n_o,
               CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2)))
                      FILTER (WHERE o_orderstatus = 'F') AS DOUBLE) AS sum_f,
               CAST(SUM(CASE WHEN o_orderstatus = 'F'
                             THEN CAST(o_totalprice AS DECIMAL(18,2)) END)
                 AS DOUBLE) AS sum_f_case,
               (SUM(CAST(o_totalprice AS DECIMAL(18,2)))
                  FILTER (WHERE o_orderstatus = 'F')
                <=> SUM(CASE WHEN o_orderstatus = 'F'
                             THEN CAST(o_totalprice AS DECIMAL(18,2)) END))
                 AS forms_agree
        FROM fc_orders GROUP BY o_orderpriority
        """
    )


@register(
    "agg_map_canonical",
    oracle="""
    WITH c AS (
      SELECT o_orderpriority AS prio, o_orderstatus AS st, COUNT(*) AS n
      FROM orders GROUP BY 1, 2
    )
    SELECT prio,
           string_agg(st || ':' || CAST(n AS VARCHAR), ','
                      ORDER BY st) AS status_counts,
           CAST(SUM(n) AS BIGINT) AS total
    FROM c GROUP BY prio
    """,
    doc="Map-typed aggregation with CANONICAL serialization (the "
    "status->count map per priority — Hive's map<string,bigint> UDAF "
    "result shape): counts pre-aggregate per (group, key), then the map "
    "is emitted as a KEY-SORTED 'k:v,...' string — map columns hash "
    "ENGINE-DEPENDENTLY (entry order is undefined in both engines), so "
    "the canonical-string projection is the only hashable contract; "
    "Spark builds it from sort_array over (key, n) structs (never "
    "encounter-ordered collect), DuckDB from ORDER BY string_agg. The "
    "total column reconciles map completeness. Same plan as a real "
    "map_from_entries output minus the unhashable type.",
    tags=("agg", "map", "collection"),
)
def agg_map_canonical(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = (
        load_table(spark, sf_dir, "orders")
        .groupBy(
            F.col("o_orderpriority").alias("prio"),
            F.col("o_orderstatus").alias("st"),
        )
        .agg(F.count(F.lit(1)).alias("n"))
    )
    return c.groupBy("prio").agg(
        F.array_join(
            F.transform(
                F.sort_array(
                    F.collect_list(F.struct(F.col("st"), F.col("n")))
                ),
                lambda s: F.concat_ws(
                    ":", s.getField("st"), s.getField("n").cast("string")
                ),
            ),
            ",",
        ).alias("status_counts"),
        F.sum("n").cast("long").alias("total"),
    )


@register(
    "agg_width_bucket_histogram",
    # Identical integer bucket math in both engines: cents are exact
    # BIGINTs, so 1 + (c - lo) * n DIV (hi - lo) is bit-reproducible
    # (never float width math, which drifts at bucket boundaries).
    oracle="""
    WITH c AS (
      SELECT CAST(ROUND(o_totalprice * 100) AS BIGINT) AS cents FROM orders
    ),
    b AS (
      SELECT CASE WHEN cents < 200000 THEN 0
                  WHEN cents >= 40000000 THEN 9
                  ELSE CAST(1 + (cents - 200000) * 8
                            // (40000000 - 200000) AS BIGINT)
             END AS bucket, cents
      FROM c
    )
    SELECT CAST(bucket AS INT) AS bucket,
           CAST(COUNT(*) AS BIGINT) AS n_orders,
           CAST(SUM(cents) AS BIGINT) AS sum_cents,
           CAST(MIN(cents) AS BIGINT) AS min_cents,
           CAST(MAX(cents) AS BIGINT) AS max_cents
    FROM b GROUP BY bucket
    """,
    doc="width_bucket histogram bucketing (post-1.2.2 SQL-standard fn, "
    "flipping a [-] COVERAGE row as an emulation): o_totalprice in exact "
    "integer cents routed into 8 equal-width buckets over [2000.00, "
    "400000.00) plus the standard underflow bucket 0 and overflow bucket "
    "n+1 — the formula 1 + (c-lo)*n DIV (hi-lo) is pure integer codegen, "
    "identical in both engines (Spark's NATIVE width_bucket computes the "
    "same partition in double math; equality with the emulation is "
    "pinned in tests/test_width_bucket.py over boundary values, where "
    "float width math is allowed to differ only at exact bucket edges "
    "that cents arithmetic avoids). One scan, one groupBy shuffle on a "
    "10-value key; per-bucket counts, exact sums, and extrema certify "
    "both boundary routings.",
    tags=("agg", "histogram", "beyond-reference"),
)
def agg_width_bucket_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    lo, hi, n = 200_000, 40_000_000, 8
    c = load_table(spark, sf_dir, "orders").select(
        F.round(F.col("o_totalprice") * 100).cast("long").alias("cents")
    )
    bucket = (
        F.when(F.col("cents") < lo, F.lit(0))
        .when(F.col("cents") >= hi, F.lit(n + 1))
        # integer DIV, not `/`: float division could round the quotient to
        # an adjacent representable at bucket edges; DuckDB's // is exact
        .otherwise(F.expr(f"1 + (cents - {lo}) * {n} DIV {hi - lo}"))
    )
    return (
        c.withColumn("bucket", bucket.cast("int"))
        .groupBy("bucket")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.sum("cents").cast("long").alias("sum_cents"),
            F.min("cents").cast("long").alias("min_cents"),
            F.max("cents").cast("long").alias("max_cents"),
        )
    )


@register(
    "grouping_id_hive12_compat",
    # DuckDB's grouping_id() is ANSI like Spark's, so the oracle applies
    # the IDENTICAL bit translation — two independent implementations of
    # the HIVE-12833 legacy encoding that must agree row-for-row.
    oracle="""
    SELECT o_orderstatus, o_orderpriority,
           CAST(grouping_id(o_orderstatus, o_orderpriority) AS BIGINT)
             AS ansi_gid,
           CAST((1 - ((grouping_id(o_orderstatus, o_orderpriority) >> 1) & 1))
                + 2 * (1 - (grouping_id(o_orderstatus, o_orderpriority) & 1))
             AS BIGINT) AS hive12_grouping__id,
           CAST(COUNT(*) AS BIGINT) AS n
    FROM orders
    GROUP BY GROUPING SETS ((o_orderstatus, o_orderpriority),
                            (o_orderstatus), (o_orderpriority), ())
    """,
    doc="Hive-1.2 GROUPING__ID encoding compat (HIVE-12833: before Hive "
    "2.3, GROUPING__ID set bit j (LSB = FIRST column in GROUP BY) to 1 "
    "when column j IS present in the grouping set — the exact INVERSE "
    "and REVERSE of the ANSI encoding Spark/DuckDB/Hive>=2.3 use, where "
    "the MSB is the first column and 1 means aggregated-away). A 1.2 "
    "user migrating queries that branch on GROUPING__ID needs the "
    "translation, not a silent renumbering: hive12 = sum over columns j "
    "of (1 - ansi_bit(j)) << j with j counted from the FIRST column at "
    "the LSB. Emitted alongside the ANSI id over a 4-set GROUPING SETS "
    "so every encoding value appears; the oracle recomputes the "
    "translation independently in DuckDB.",
    tags=("agg", "compat"),
)
def grouping_id_hive12_compat(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    gid = F.grouping_id()
    # 2 grouping columns: ANSI bit for col0 (o_orderstatus) is the MSB
    # (bit 1), col1 the LSB (bit 0); Hive-1.2 wants col0 at the LSB and
    # 1 = present: hive12 = (1 - ansi_bit1) * 1 + (1 - ansi_bit0) * 2.
    hive12 = (1 - F.shiftright(gid, 1).bitwiseAND(F.lit(1))) + 2 * (
        1 - gid.bitwiseAND(F.lit(1))
    )
    return o.cube("o_orderstatus", "o_orderpriority").agg(
        gid.cast("long").alias("ansi_gid"),
        hive12.cast("long").alias("hive12_grouping__id"),
        F.count(F.lit(1)).alias("n"),
    )
