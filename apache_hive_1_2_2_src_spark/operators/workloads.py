"""Composite analytical workloads: TPC-H-shaped multi-join + agg + top-k
queries, the end-to-end plans a real Hive 1.2.2 warehouse ran daily.

These compose the §2 primitives (scan pushdown → broadcast/shuffle joins →
partial/final agg → top-k) into the shapes the optimizer actually has to get
right: join ordering across 3-6 tables, dimension broadcast, revenue
decimal discipline, order-by-limit without a global sort.

Scale notes (100 TB): fact-fact joins (lineitem ⋈ orders) shuffle on the
join key; every dimension (region/nation/customer-filtered) rides a
broadcast; filters sit adjacent to scans so Catalyst pushes them into
parquet (verified via PushedFilters in .explain); final top-k is
TakeOrderedAndProject, never a global sort.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from apache_hive_1_2_2_src_spark.operators.helpers import dec, dsum_exact
from apache_hive_1_2_2_src_spark.registry import register
from apache_hive_1_2_2_src_spark.tables import load_table

_REVENUE_SQL = (
    "CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * "
    "(1 - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS revenue"
)


def _revenue():
    return dsum_exact(dec("l_extendedprice") * (F.lit(1) - dec("l_discount")), "revenue")


@register(
    "workload_shipping_priority",
    oracle=f"""
    SELECT l_orderkey,
           {_REVENUE_SQL},
           CAST(CAST(o_orderdate AS DATE) AS VARCHAR) AS order_date,
           o_orderpriority
    FROM customer
    JOIN orders   ON c_custkey = o_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    WHERE c_mktsegment = 'BUILDING'
      AND o_orderdate < TIMESTAMP '1997-01-01 00:00:00'
      AND l_shipdate  > TIMESTAMP '1997-01-01 00:00:00'
    GROUP BY l_orderkey, o_orderdate, o_orderpriority
    ORDER BY revenue DESC, l_orderkey
    LIMIT 10
    """,
    doc="TPC-H Q3 shape (shipping priority): segment-filtered customer "
    "broadcast ⋈ orders ⋈ lineitem, revenue agg, top-10 — the canonical "
    "mid-size star query (reference q-tests ran this plan family via "
    "SemanticAnalyzer join trees + TopNHash).",
    tags=("workload", "join", "agg"),
)
def workload_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer").filter(F.col("c_mktsegment") == "BUILDING")
    o = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") < F.lit("1997-01-01 00:00:00").cast("timestamp")
    )
    li = load_table(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") > F.lit("1997-01-01 00:00:00").cast("timestamp")
    )
    return (
        F.broadcast(c.select("c_custkey"))
        .join(o, F.col("c_custkey") == F.col("o_custkey"))
        .join(li, F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(_revenue())
        .select(
            "l_orderkey",
            "revenue",
            # string, not DATE: pandas-side canonicalizers represent Spark
            # dates (datetime.date) and DuckDB dates (datetime64) differently
            F.col("o_orderdate").cast("date").cast("string").alias("order_date"),
            "o_orderpriority",
        )
        .orderBy(F.col("revenue").desc(), F.col("l_orderkey"))
        .limit(10)
    )


@register(
    "workload_local_supplier_volume",
    oracle=f"""
    SELECT n_name,
           {_REVENUE_SQL}
    FROM region
    JOIN nation   ON n_regionkey = r_regionkey
    JOIN supplier ON s_nationkey = n_nationkey
    JOIN customer ON c_nationkey = s_nationkey
    JOIN orders   ON o_custkey = c_custkey
    JOIN lineitem ON l_orderkey = o_orderkey AND l_suppkey = s_suppkey
    WHERE r_name = 'ASIA'
      AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
    GROUP BY n_name
    ORDER BY revenue DESC
    """,
    doc="TPC-H Q5 shape (local supplier volume): 6-table snowflake — "
    "region→nation→supplier broadcast chain, customer co-nation "
    "constraint, fact join on (orderkey, suppkey). Exercises CBO join "
    "ordering + multi-broadcast; one fact shuffle.",
    tags=("workload", "join", "agg"),
)
def workload_local_supplier_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    r = load_table(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    n = load_table(spark, sf_dir, "nation")
    s = load_table(spark, sf_dir, "supplier")
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp")
    )
    li = load_table(spark, sf_dir, "lineitem")
    dims = (
        F.broadcast(r.select("r_regionkey"))
        .join(n, F.col("n_regionkey") == F.col("r_regionkey"))
        .join(s, F.col("s_nationkey") == F.col("n_nationkey"))
        .select("n_name", "s_suppkey", "s_nationkey")
    )
    return (
        c.join(o, F.col("o_custkey") == F.col("c_custkey"))
        .join(li, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(
            F.broadcast(dims),
            (F.col("l_suppkey") == F.col("s_suppkey"))
            & (F.col("c_nationkey") == F.col("s_nationkey")),
        )
        .groupBy("n_name")
        .agg(_revenue())
        .orderBy(F.col("revenue").desc())
    )


@register(
    "workload_returned_items",
    oracle=f"""
    SELECT c_custkey, c_name,
           {_REVENUE_SQL},
           CAST(c_acctbal AS DOUBLE) AS c_acctbal,
           n_name
    FROM customer
    JOIN orders   ON o_custkey = c_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    JOIN nation   ON n_nationkey = c_nationkey
    WHERE l_returnflag = 'R'
      AND o_orderdate >= TIMESTAMP '1997-01-01 00:00:00'
    GROUP BY c_custkey, c_name, c_acctbal, n_name
    ORDER BY revenue DESC, c_custkey
    LIMIT 20
    """,
    doc="TPC-H Q10 shape (returned items): returnflag-filtered fact joined "
    "up to customer + nation, revenue per customer, top-20 — the "
    "customer-churn report every Hive warehouse ran.",
    tags=("workload", "join", "agg"),
)
def workload_returned_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") >= F.lit("1997-01-01 00:00:00").cast("timestamp")
    )
    li = load_table(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    n = load_table(spark, sf_dir, "nation")
    return (
        c.join(o, F.col("o_custkey") == F.col("c_custkey"))
        .join(li, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(n), F.col("n_nationkey") == F.col("c_nationkey"))
        .groupBy("c_custkey", "c_name", "c_acctbal", "n_name")
        .agg(_revenue())
        .select(
            "c_custkey",
            "c_name",
            "revenue",
            F.col("c_acctbal").cast("double").alias("c_acctbal"),
            "n_name",
        )
        .orderBy(F.col("revenue").desc(), F.col("c_custkey"))
        .limit(20)
    )


@register(
    "workload_part_type_share",
    oracle="""
    WITH j AS (
      SELECT p_type,
             CAST(l_extendedprice AS DECIMAL(18,2)) *
               (1 - CAST(l_discount AS DECIMAL(18,2))) AS rev
      FROM lineitem JOIN part ON p_partkey = l_partkey
    )
    SELECT p_type,
           CAST(SUM(rev) AS DOUBLE) AS revenue,
           COUNT(*) AS n_items
    FROM j
    GROUP BY p_type
    ORDER BY revenue DESC
    """,
    doc="Part-type revenue share (Q14 family): fact ⋈ part dimension "
    "(broadcast), grouped by type — the promo-share building block.",
    tags=("workload", "join", "agg"),
)
def workload_part_type_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part")
    rev = dec("l_extendedprice") * (F.lit(1) - dec("l_discount"))
    return (
        li.join(F.broadcast(p), F.col("p_partkey") == F.col("l_partkey"))
        .groupBy("p_type")
        .agg(dsum_exact(rev, "revenue"), F.count(F.lit(1)).alias("n_items"))
        .orderBy(F.col("revenue").desc())
    )


@register(
    "workload_order_priority_check",
    oracle="""
    SELECT o_orderpriority, COUNT(*) AS order_count
    FROM orders
    WHERE o_orderdate >= TIMESTAMP '1996-07-01 00:00:00'
      AND o_orderdate <  TIMESTAMP '1996-10-01 00:00:00'
      AND EXISTS (SELECT 1 FROM lineitem
                  WHERE l_orderkey = o_orderkey
                    AND l_shipdate >= TIMESTAMP '1997-01-01 00:00:00')
    GROUP BY o_orderpriority
    ORDER BY o_orderpriority
    """,
    doc="TPC-H Q4 shape (order priority checking): date-windowed orders "
    "semi-joined to late-shipping lineitems (EXISTS → LeftSemi in "
    "Catalyst, Hive's genPlan LEFT SEMI JOIN rewrite; TPC-H's "
    "commitdate<receiptdate lateness re-expressed on the testdata schema "
    "as shipdate past a cutoff), grouped by priority. Exercises the "
    "EXISTS decorrelation path on a fact-fact semi-join: one shuffle on "
    "orderkey, map-side partial agg after.",
    tags=("workload", "join", "subquery", "agg"),
)
def workload_order_priority_check(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-07-01 00:00:00").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1996-10-01 00:00:00").cast("timestamp"))
    )
    late = load_table(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") >= F.lit("1997-01-01 00:00:00").cast("timestamp")
    )
    return (
        o.join(late, o.o_orderkey == late.l_orderkey, "left_semi")
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("order_count"))
        .orderBy("o_orderpriority")
    )


@register(
    "workload_shipmode_priority",
    oracle="""
    SELECT l_returnflag,
           COUNT(*) FILTER (WHERE o_orderpriority IN ('1-URGENT', '2-HIGH'))
               AS high_line_count,
           COUNT(*) FILTER (WHERE o_orderpriority NOT IN ('1-URGENT', '2-HIGH'))
               AS low_line_count
    FROM orders JOIN lineitem ON o_orderkey = l_orderkey
    WHERE l_returnflag IN ('R', 'A')
      AND l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND l_shipdate <  TIMESTAMP '1997-01-01 00:00:00'
    GROUP BY l_returnflag
    ORDER BY l_returnflag
    """,
    doc="TPC-H Q12 shape (shipping modes / order priority — the testdata "
    "schema has no l_shipmode, so returnflag plays the mode column; plan "
    "shape is identical): fact-fact join with an IN-list + date-window "
    "filter pushed to the lineitem scan, conditional (pivot-style) "
    "aggregation per group — Hive's hive.map.aggr conditional-sum idiom "
    "(SemanticAnalyzer genGroupByPlan).",
    tags=("workload", "join", "agg"),
)
def workload_shipmode_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem").filter(
        F.col("l_returnflag").isin("R", "A")
        & (F.col("l_shipdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-01-01 00:00:00").cast("timestamp"))
    )
    o = load_table(spark, sf_dir, "orders")
    hi = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        o.join(li, o.o_orderkey == li.l_orderkey)
        .groupBy("l_returnflag")
        .agg(
            F.count(F.when(hi, 1)).alias("high_line_count"),
            F.count(F.when(~hi, 1)).alias("low_line_count"),
        )
        .orderBy("l_returnflag")
    )
