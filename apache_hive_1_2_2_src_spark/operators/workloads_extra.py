"""Composite analytical workloads, part 2: the remaining TPC-H query shapes
expressible over this star schema. (No ``partsupp`` table ships in testdata;
the Q2/Q11/Q16/Q20 partsupp family lives in ``workloads_partsupp.py`` over a
deterministically DERIVED partsupp — each part x 4 suppliers by an integer
formula evaluated identically in Spark and the DuckDB oracle CTEs.)

Shapes covered here (Hive 1.2.2 ran these plan families through
SemanticAnalyzer join trees + map-side aggregation; reference layout anchors
``ql/src/test/queries/clientpositive/``):

- Q6  revenue forecast        — pure scan + pushed filters + global agg
- Q7  volume shipping         — fact ⋈ fact with two nation dimensions
- Q8  national market share   — 6-table star + conditional-sum ratio
- Q9  product profit          — 5-table join + LIKE pushdown + per-nation-year
                                agg (cost adapted: p_retailprice x quantity,
                                no partsupp/supplycost in this schema)
- Q13 customer order counts   — LEFT OUTER fact join + double aggregation
- Q15 top supplier            — agg view + scalar-max semi join
- Q17 small-quantity revenue  — per-part avg threshold (windowed correlate)
- Q18 large-volume customers  — HAVING-filtered fact agg joined back to dims
- Q19 disjunctive revenue     — OR-of-ANDs predicate across join
- Q21 suppliers kept waiting  — EXISTS + NOT EXISTS double correlate
                                (lateness adapted: shipdate > orderdate+90d,
                                no commit/receipt dates in this schema)
- Q22 idle customers          — global-avg threshold + anti join

Determinism: money maths through DECIMAL(18,2) factor casts (registry.py
rules); ratio columns are a single IEEE division of two exact-decimal sums
cast to double (no ROUND on parallel-summed doubles); integer thresholds are
compared multiplicatively (``5*qty*cnt < qsum``) so no engine ever divides.

Scale notes (100 TB): nation/region ride explicit broadcasts; customer /
supplier / part scale with the fact tables, so their joins stay shuffle
hash/SMJ and are left to Catalyst+AQE; every agg is partial/final; top-k is
TakeOrderedAndProject. Q15's scalar max is a 1-row broadcast join, and Q22's
corpus average is a 1-row broadcast — neither collects to the driver.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from apache_hive_1_2_2_src_spark.operators.helpers import dec, dsum_exact, sql_dec
from apache_hive_1_2_2_src_spark.registry import register
from apache_hive_1_2_2_src_spark.tables import load_table

_REVENUE_SQL = (
    "CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * "
    "(1 - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS revenue"
)


def _revenue():
    return dsum_exact(dec("l_extendedprice") * (F.lit(1) - dec("l_discount")), "revenue")


@register(
    "workload_revenue_forecast",
    oracle=f"""
    SELECT CAST(SUM({sql_dec('l_extendedprice')} * {sql_dec('l_discount')}) AS DOUBLE)
             AS revenue_delta,
           COUNT(*) AS n_lines
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND l_shipdate <  TIMESTAMP '1997-01-01 00:00:00'
      AND l_discount BETWEEN 0.05 AND 0.07
      AND l_quantity < 24
    """,
    doc="TPC-H Q6 shape (forecast revenue change): the purest pushdown "
    "benchmark — every predicate reaches the parquet scan (range on "
    "l_shipdate, band on l_discount, bound on l_quantity), then one global "
    "partial/final agg. At 100 TB this is scan-bound by design; no shuffle "
    "beyond the 1-row final combine.",
    tags=("workload", "agg"),
)
def workload_revenue_forecast(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-01-01 00:00:00").cast("timestamp"))
        & (F.col("l_discount").between(0.05, 0.07))
        & (F.col("l_quantity") < 24)
    )
    return li.agg(
        dsum_exact(dec("l_extendedprice") * dec("l_discount"), "revenue_delta"),
        F.count(F.lit(1)).alias("n_lines"),
    )


@register(
    "workload_nation_volume_shipping",
    oracle=f"""
    SELECT supp_nation, cust_nation, l_year, {_REVENUE_SQL}
    FROM (
      SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
             CAST(EXTRACT(YEAR FROM l_shipdate) AS INT) AS l_year,
             l_extendedprice, l_discount
      FROM supplier
      JOIN lineitem ON s_suppkey = l_suppkey
      JOIN orders   ON o_orderkey = l_orderkey
      JOIN customer ON c_custkey = o_custkey
      JOIN nation n1 ON s_nationkey = n1.n_nationkey
      JOIN nation n2 ON c_nationkey = n2.n_nationkey
      WHERE (n1.n_name IN ('NATION_1','NATION_2','NATION_3','NATION_4')
               AND n2.n_name IN ('NATION_5','NATION_6','NATION_7','NATION_8'))
         OR (n1.n_name IN ('NATION_5','NATION_6','NATION_7','NATION_8')
               AND n2.n_name IN ('NATION_1','NATION_2','NATION_3','NATION_4'))
    )
    GROUP BY supp_nation, cust_nation, l_year
    ORDER BY supp_nation, cust_nation, l_year
    """,
    doc="TPC-H Q7 shape (volume shipping between two nations): "
    "lineitem ⋈ orders fact-fact shuffle join, supplier/customer carrier "
    "joins, nation broadcast twice under different aliases, disjunctive "
    "nation-group filter (4x4 nation blocs instead of TPC-H's single pair "
    "so the query is non-vacuous at smoke-test SF), per-year revenue. "
    "Exercises self-join aliasing of one dimension — Hive's QBJoinTree "
    "handled n1/n2 as distinct vertices.",
    tags=("workload", "join", "agg"),
)
def workload_nation_volume_shipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    n1 = load_table(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("n1_key"), F.col("n_name").alias("supp_nation")
    )
    n2 = load_table(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("n2_key"), F.col("n_name").alias("cust_nation")
    )
    s = load_table(spark, sf_dir, "supplier")
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    bloc_a = ["NATION_1", "NATION_2", "NATION_3", "NATION_4"]
    bloc_b = ["NATION_5", "NATION_6", "NATION_7", "NATION_8"]
    pair = (
        F.col("supp_nation").isin(bloc_a) & F.col("cust_nation").isin(bloc_b)
    ) | (F.col("supp_nation").isin(bloc_b) & F.col("cust_nation").isin(bloc_a))
    return (
        li.join(o, F.col("o_orderkey") == F.col("l_orderkey"))
        .join(s, F.col("s_suppkey") == F.col("l_suppkey"))
        .join(c, F.col("c_custkey") == F.col("o_custkey"))
        .join(F.broadcast(n1), F.col("s_nationkey") == F.col("n1_key"))
        .join(F.broadcast(n2), F.col("c_nationkey") == F.col("n2_key"))
        .filter(pair)
        .withColumn("l_year", F.year("l_shipdate"))
        .groupBy("supp_nation", "cust_nation", "l_year")
        .agg(_revenue())
        .orderBy("supp_nation", "cust_nation", "l_year")
    )


@register(
    "workload_market_share",
    oracle="""
    WITH vol AS (
      SELECT CAST(EXTRACT(YEAR FROM o_orderdate) AS INT) AS o_year,
             CAST(l_extendedprice AS DECIMAL(18,2)) *
               (1 - CAST(l_discount AS DECIMAL(18,2))) AS volume,
             n2.n_name AS supp_nation
      FROM part
      JOIN lineitem ON p_partkey = l_partkey
      JOIN supplier ON s_suppkey = l_suppkey
      JOIN orders   ON o_orderkey = l_orderkey
      JOIN customer ON c_custkey = o_custkey
      JOIN nation n1 ON c_nationkey = n1.n_nationkey
      JOIN region    ON n1.n_regionkey = r_regionkey
      JOIN nation n2 ON s_nationkey = n2.n_nationkey
      WHERE r_name = 'EUROPE' AND p_type = 'PROMO'
    )
    SELECT o_year,
           CAST(SUM(CASE WHEN supp_nation = 'NATION_3' THEN volume
                         ELSE CAST(0 AS DECIMAL(18,2)) END) AS DOUBLE)
             / CAST(SUM(volume) AS DOUBLE) AS mkt_share,
           CAST(SUM(volume) AS DOUBLE) AS total_volume
    FROM vol
    GROUP BY o_year
    ORDER BY o_year
    """,
    doc="TPC-H Q8 shape (national market share): 7-table star — part filter, "
    "customer-side region restriction, supplier-side nation attribution, "
    "conditional-sum ratio per year. Determinism: the share is ONE IEEE "
    "division of two exact decimal sums cast to double (never ROUND of a "
    "parallel double sum). Scale: region/nation broadcast; part filter "
    "prunes the fact join ahead of the orders shuffle.",
    tags=("workload", "join", "agg"),
)
def workload_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = load_table(spark, sf_dir, "part").filter(F.col("p_type") == "PROMO")
    s = load_table(spark, sf_dir, "supplier")
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    li = load_table(spark, sf_dir, "lineitem")
    n1 = load_table(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("n1_key"), F.col("n_regionkey").alias("n1_region")
    )
    n2 = load_table(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("n2_key"), F.col("n_name").alias("supp_nation")
    )
    r = load_table(spark, sf_dir, "region").filter(F.col("r_name") == "EUROPE")
    vol = (
        li.join(p.select("p_partkey"), F.col("p_partkey") == F.col("l_partkey"))
        .join(o, F.col("o_orderkey") == F.col("l_orderkey"))
        .join(s, F.col("s_suppkey") == F.col("l_suppkey"))
        .join(c, F.col("c_custkey") == F.col("o_custkey"))
        .join(F.broadcast(n1), F.col("c_nationkey") == F.col("n1_key"))
        .join(F.broadcast(r.select("r_regionkey")), F.col("n1_region") == F.col("r_regionkey"))
        .join(F.broadcast(n2), F.col("s_nationkey") == F.col("n2_key"))
        .select(
            F.year("o_orderdate").alias("o_year"),
            (dec("l_extendedprice") * (F.lit(1) - dec("l_discount"))).alias("volume"),
            "supp_nation",
        )
    )
    zero = F.lit(0).cast("decimal(18,2)")
    return (
        vol.groupBy("o_year")
        .agg(
            (
                F.sum(F.when(F.col("supp_nation") == "NATION_3", F.col("volume")).otherwise(zero))
                .cast("double")
                / F.sum("volume").cast("double")
            ).alias("mkt_share"),
            F.sum("volume").cast("double").alias("total_volume"),
        )
        .orderBy("o_year")
    )


@register(
    "workload_customer_order_counts",
    oracle="""
    SELECT c_count, COUNT(*) AS custdist
    FROM (
      SELECT c_custkey, COUNT(o_orderkey) AS c_count
      FROM customer LEFT OUTER JOIN orders ON c_custkey = o_custkey
      GROUP BY c_custkey
    )
    GROUP BY c_count
    ORDER BY custdist DESC, c_count DESC
    """,
    doc="TPC-H Q13 shape (customer order-count distribution): LEFT OUTER "
    "join so zero-order customers survive with c_count=0, then a second "
    "aggregation over the first's output — the classic double-agg plan "
    "(Hive ran it as two MR stages; Spark as two exchanges, the second "
    "tiny). COUNT(col) null-skipping semantics are the point.",
    tags=("workload", "join", "agg"),
)
def workload_customer_order_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer").select("c_custkey")
    o = load_table(spark, sf_dir, "orders").select("o_custkey", "o_orderkey")
    per_cust = (
        c.join(o, F.col("c_custkey") == F.col("o_custkey"), "left_outer")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return (
        per_cust.groupBy("c_count")
        .agg(F.count(F.lit(1)).alias("custdist"))
        .orderBy(F.col("custdist").desc(), F.col("c_count").desc())
    )


@register(
    "workload_top_supplier",
    oracle=f"""
    WITH rev AS (
      SELECT l_suppkey, {_REVENUE_SQL}
      FROM lineitem
      WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
        AND l_shipdate <  TIMESTAMP '1996-04-01 00:00:00'
      GROUP BY l_suppkey
    )
    SELECT s_suppkey, s_name, revenue AS total_revenue
    FROM supplier JOIN rev ON s_suppkey = l_suppkey
    WHERE revenue = (SELECT MAX(revenue) FROM rev)
    ORDER BY s_suppkey
    """,
    doc="TPC-H Q15 shape (top supplier): quarterly per-supplier revenue "
    "view, then select the max-revenue supplier(s) — the scalar subquery "
    "becomes a 1-row broadcast equi-join, never a driver collect, so ties "
    "are preserved and the plan survives any supplier count.",
    tags=("workload", "join", "agg", "subquery"),
)
def workload_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1996-04-01 00:00:00").cast("timestamp"))
    )
    rev = li.groupBy("l_suppkey").agg(_revenue())
    top = rev.agg(F.max("revenue").alias("max_rev"))
    s = load_table(spark, sf_dir, "supplier")
    return (
        rev.join(F.broadcast(top), F.col("revenue") == F.col("max_rev"))
        .join(s, F.col("s_suppkey") == F.col("l_suppkey"))
        .select("s_suppkey", "s_name", F.col("revenue").alias("total_revenue"))
        .orderBy("s_suppkey")
    )


@register(
    "workload_small_qty_revenue",
    oracle="""
    WITH li AS (
      SELECT l_partkey, l_quantity, l_extendedprice
      FROM lineitem JOIN part ON p_partkey = l_partkey
      WHERE p_brand = 'Brand#3'
    ), w AS (
      SELECT l_extendedprice,
             CAST(l_quantity AS DECIMAL(18,2)) AS q,
             SUM(CAST(l_quantity AS DECIMAL(18,2)))
               OVER (PARTITION BY l_partkey) AS qsum,
             COUNT(*) OVER (PARTITION BY l_partkey) AS cnt
      FROM li
    )
    SELECT CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE)
             AS small_qty_revenue,
           COUNT(*) AS n_small_lines
    FROM w
    WHERE q * 5 * cnt < qsum
    """,
    doc="TPC-H Q17 shape (small-quantity-order revenue): lines whose "
    "quantity is below 20% of their part's average. The correlated "
    "per-part average is a window sum+count over the part key, and the "
    "threshold is compared multiplicatively (5·q·cnt < Σq) so neither "
    "engine ever divides — exact decimal arithmetic end to end. One "
    "shuffle on l_partkey serves both the window and the brand join.",
    tags=("workload", "join", "agg", "window"),
)
def workload_small_qty_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = load_table(spark, sf_dir, "part").filter(F.col("p_brand") == "Brand#3")
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_partkey", "l_quantity", "l_extendedprice"
    )
    w = Window.partitionBy("l_partkey")
    joined = li.join(F.broadcast(p.select("p_partkey")), F.col("p_partkey") == F.col("l_partkey"))
    flagged = joined.select(
        "l_extendedprice",
        dec("l_quantity").alias("q"),
        F.sum(dec("l_quantity")).over(w).alias("qsum"),
        F.count(F.lit(1)).over(w).alias("cnt"),
    )
    return flagged.filter(F.col("q") * 5 * F.col("cnt") < F.col("qsum")).agg(
        F.sum(dec("l_extendedprice")).cast("double").alias("small_qty_revenue"),
        F.count(F.lit(1)).alias("n_small_lines"),
    )


@register(
    "workload_large_volume_customer",
    oracle="""
    SELECT c_name, c_custkey, o_orderkey,
           CAST(CAST(o_orderdate AS DATE) AS VARCHAR) AS order_date,
           o_totalprice,
           CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty
    FROM customer
    JOIN orders   ON c_custkey = o_custkey
    JOIN lineitem ON o_orderkey = l_orderkey
    GROUP BY c_name, c_custkey, o_orderkey, o_orderdate, o_totalprice
    HAVING SUM(CAST(l_quantity AS DECIMAL(18,2))) > 300
    ORDER BY o_totalprice DESC, o_orderkey
    LIMIT 100
    """,
    doc="TPC-H Q18 shape (large-volume customers): orders whose total line "
    "quantity exceeds 300, joined back to customer. Spark plan aggregates "
    "lineitem by orderkey FIRST (HAVING as a post-agg filter cuts the fact "
    "early), then joins the surviving ~0.1% of orders to dims — the "
    "agg-before-join rewrite Hive's correlation optimizer did by hand.",
    tags=("workload", "join", "agg"),
)
def workload_large_volume_customer(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_quantity")
    big = (
        li.groupBy("l_orderkey")
        .agg(F.sum(dec("l_quantity")).alias("qsum"))
        .filter(F.col("qsum") > 300)
        .select("l_orderkey", F.col("qsum").cast("double").alias("sum_qty"))
    )
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer").select("c_custkey", "c_name")
    return (
        big.join(o, F.col("o_orderkey") == F.col("l_orderkey"))
        .join(c, F.col("c_custkey") == F.col("o_custkey"))
        .select(
            "c_name",
            "c_custkey",
            "o_orderkey",
            F.col("o_orderdate").cast("date").cast("string").alias("order_date"),
            "o_totalprice",
            "sum_qty",
        )
        .orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey"))
        .limit(100)
    )


@register(
    "workload_disjunctive_revenue",
    oracle=f"""
    SELECT {_REVENUE_SQL}, COUNT(*) AS n_lines
    FROM lineitem JOIN part ON p_partkey = l_partkey
    WHERE (p_brand = 'Brand#1' AND p_size BETWEEN 1 AND 15
           AND l_quantity BETWEEN 1 AND 11)
       OR (p_brand = 'Brand#2' AND p_size BETWEEN 1 AND 25
           AND l_quantity BETWEEN 10 AND 20)
       OR (p_brand = 'Brand#3' AND p_size BETWEEN 1 AND 35
           AND l_quantity BETWEEN 20 AND 30)
    """,
    doc="TPC-H Q19 shape (discounted revenue, disjunctive predicates): an "
    "OR-of-ANDs spanning both join sides. Catalyst factors the common "
    "per-table conjuncts out of the disjunction (brand/size IN-bounds push "
    "to the part scan, quantity bounds to lineitem) while the residual OR "
    "evaluates post-join — the predicate shape Hive's PPD walked by hand.",
    tags=("workload", "join", "agg"),
)
def workload_disjunctive_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part")
    j = li.join(p, F.col("p_partkey") == F.col("l_partkey"))
    cond = (
        (F.col("p_brand") == "Brand#1")
        & F.col("p_size").between(1, 15)
        & F.col("l_quantity").between(1, 11)
        | (F.col("p_brand") == "Brand#2")
        & F.col("p_size").between(1, 25)
        & F.col("l_quantity").between(10, 20)
        | (F.col("p_brand") == "Brand#3")
        & F.col("p_size").between(1, 35)
        & F.col("l_quantity").between(20, 30)
    )
    return j.filter(cond).agg(_revenue(), F.count(F.lit(1)).alias("n_lines"))


@register(
    "workload_idle_customers",
    oracle="""
    WITH pos AS (
      SELECT SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS s, COUNT(*) AS n
      FROM customer WHERE c_acctbal > 0.0
    )
    SELECT c_nationkey,
           COUNT(*) AS numcust,
           CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS totacctbal
    FROM customer, pos
    WHERE CAST(c_acctbal AS DECIMAL(18,2)) * n > s
      AND NOT EXISTS (SELECT 1 FROM orders
                      WHERE o_custkey = c_custkey
                        AND o_orderdate >= TIMESTAMP '1999-01-01 00:00:00')
    GROUP BY c_nationkey
    ORDER BY c_nationkey
    """,
    doc="TPC-H Q22 shape (idle high-balance customers): customers above the "
    "positive-balance average with no RECENT (post-1999) orders, grouped by "
    "nation. TPC-H's literal 'no orders at all' is vacuous on this testdata "
    "(every customer has orders), so the anti-join carries a date predicate "
    "— same plan shape, non-empty at smoke SF. The global average is a "
    "1-row broadcast compared multiplicatively (bal·n > Σbal — no division, "
    "exact decimals); the no-recent-orders test is a left_anti join, "
    "Spark's native NOT EXISTS physical form.",
    tags=("workload", "join", "agg", "subquery"),
)
def workload_idle_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer")
    o = (
        load_table(spark, sf_dir, "orders")
        .filter(F.col("o_orderdate") >= F.lit("1999-01-01 00:00:00").cast("timestamp"))
        .select("o_custkey")
    )
    pos = c.filter(F.col("c_acctbal") > 0.0).agg(
        F.sum(dec("c_acctbal")).alias("s"), F.count(F.lit(1)).alias("n")
    )
    rich = c.crossJoin(F.broadcast(pos)).filter(dec("c_acctbal") * F.col("n") > F.col("s"))
    idle = rich.join(o, F.col("o_custkey") == F.col("c_custkey"), "left_anti")
    return (
        idle.groupBy("c_nationkey")
        .agg(
            F.count(F.lit(1)).alias("numcust"),
            F.sum(dec("c_acctbal")).cast("double").alias("totacctbal"),
        )
        .orderBy("c_nationkey")
    )


@register(
    "workload_suppliers_kept_waiting",
    oracle="""
    WITH l1 AS (
      SELECT l_orderkey, l_suppkey
      FROM lineitem JOIN orders ON o_orderkey = l_orderkey
      WHERE l_shipdate > o_orderdate + INTERVAL 90 DAY AND o_orderstatus = 'F'
    )
    SELECT s_name, CAST(COUNT(*) AS BIGINT) AS numwait
    FROM l1 JOIN supplier ON s_suppkey = l1.l_suppkey
    WHERE EXISTS (SELECT 1 FROM lineitem l2
                  WHERE l2.l_orderkey = l1.l_orderkey
                    AND l2.l_suppkey <> l1.l_suppkey)
      AND NOT EXISTS (
        SELECT 1 FROM lineitem l3 JOIN orders o3 ON o3.o_orderkey = l3.l_orderkey
        WHERE l3.l_orderkey = l1.l_orderkey
          AND l3.l_suppkey <> l1.l_suppkey
          AND l3.l_shipdate > o3.o_orderdate + INTERVAL 90 DAY
      )
    GROUP BY s_name
    ORDER BY numwait DESC, s_name
    LIMIT 25
    """,
    doc="TPC-H Q21 shape (suppliers who kept orders waiting): late lineitems "
    "on finalized orders where the supplier was the ONLY late supplier on a "
    "multi-supplier order — the classic EXISTS + NOT EXISTS double "
    "correlated-subquery over the same fact table, the hardest subquery "
    "shape in the TPC-H suite (Hive's SemanticAnalyzer rewrote both to "
    "joins; Spark plans them natively as left_semi + left_anti). Lateness "
    "adapted to this schema (l_shipdate > o_orderdate + 90 days — no "
    "receipt/commit dates in the testdata). Both subqueries are equi-joins "
    "on l_orderkey with a residual supplier inequality — shuffle-keyed by "
    "order, never cartesian; at 100 TB both sides co-partition on orderkey.",
    tags=("workload", "join", "subquery"),
)
def workload_suppliers_kept_waiting(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders")
    s = load_table(spark, sf_dir, "supplier")
    late = (
        li.join(o, F.col("o_orderkey") == F.col("l_orderkey"))
        .filter(
            # INTERVAL add (not date_add) so time-of-day survives: the oracle
            # computes o_orderdate + INTERVAL 90 DAY timestamp-preservingly,
            # and a regenerated corpus with intraday order timestamps must not
            # silently diverge (round-5 advisor finding).
            (F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 90 DAYS"))
            & (F.col("o_orderstatus") == "F")
        )
        .select("l_orderkey", "l_suppkey")
    )
    l2 = li.select(
        F.col("l_orderkey").alias("o2"), F.col("l_suppkey").alias("s2")
    )
    has_other = late.join(
        l2,
        (F.col("o2") == F.col("l_orderkey")) & (F.col("s2") != F.col("l_suppkey")),
        "left_semi",
    )
    l3 = late.select(
        F.col("l_orderkey").alias("o3"), F.col("l_suppkey").alias("s3")
    ).distinct()
    sole_late = has_other.join(
        l3,
        (F.col("o3") == F.col("l_orderkey")) & (F.col("s3") != F.col("l_suppkey")),
        "left_anti",
    )
    return (
        sole_late.join(s, F.col("s_suppkey") == F.col("l_suppkey"))
        .groupBy("s_name")
        .agg(F.count(F.lit(1)).alias("numwait"))
        .orderBy(F.col("numwait").desc(), "s_name")
        .limit(25)
    )


@register(
    "workload_product_profit",
    oracle="""
    SELECT nation, o_year,
           CAST(SUM(amount) AS DOUBLE) AS sum_profit
    FROM (
      SELECT n_name AS nation,
             CAST(EXTRACT(YEAR FROM o_orderdate) AS INT) AS o_year,
             CAST(l_extendedprice AS DECIMAL(18,2))
               * (1 - CAST(l_discount AS DECIMAL(18,2)))
               - CAST(p_retailprice AS DECIMAL(18,2))
                 * CAST(l_quantity AS DECIMAL(18,2)) AS amount
      FROM part
      JOIN lineitem ON p_partkey = l_partkey
      JOIN supplier ON s_suppkey = l_suppkey
      JOIN orders   ON o_orderkey = l_orderkey
      JOIN nation   ON s_nationkey = n_nationkey
      WHERE p_name LIKE '%widget%'
    )
    GROUP BY nation, o_year
    ORDER BY nation, o_year DESC
    """,
    doc="TPC-H Q9 shape (product-type profit by nation and year): 5-table "
    "join graph (part ⋈ lineitem ⋈ supplier ⋈ orders ⋈ nation), LIKE "
    "filter on part name, per-(nation, year) profit. Cost side adapted to "
    "this schema: no partsupp/ps_supplycost ships, so cost = p_retailprice "
    "x quantity (profit goes negative — it is the join/agg SHAPE being "
    "certified, all money math in exact DECIMAL factors). Q9 is the "
    "classic join-order stress test: part and the LIKE filter must reach "
    "the scan (pushed), nation rides a broadcast, lineitem⋈orders stays "
    "the one big shuffle.",
    tags=("workload", "join", "agg"),
)
def workload_product_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = load_table(spark, sf_dir, "part").filter(F.col("p_name").like("%widget%"))
    li = load_table(spark, sf_dir, "lineitem")
    s = load_table(spark, sf_dir, "supplier")
    o = load_table(spark, sf_dir, "orders")
    n = load_table(spark, sf_dir, "nation")
    amount = dec("l_extendedprice") * (F.lit(1) - dec("l_discount")) - dec(
        "p_retailprice"
    ) * dec("l_quantity")
    return (
        li.join(p, F.col("p_partkey") == F.col("l_partkey"))
        .join(s, F.col("s_suppkey") == F.col("l_suppkey"))
        .join(o, F.col("o_orderkey") == F.col("l_orderkey"))
        .join(F.broadcast(n), F.col("s_nationkey") == F.col("n_nationkey"))
        .select(
            F.col("n_name").alias("nation"),
            F.year("o_orderdate").alias("o_year"),
            amount.alias("amount"),
        )
        .groupBy("nation", "o_year")
        .agg(dsum_exact(F.col("amount"), "sum_profit"))
        .orderBy("nation", F.col("o_year").desc())
    )


@register(
    "workload_scd2_dimension",
    oracle="""
    WITH ordered AS (
      SELECT o_custkey, o_orderstatus, o_orderdate, o_orderkey,
             LAG(o_orderstatus) OVER w AS prev_status
      FROM orders
      WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
    ),
    flagged AS (
      SELECT *, CASE WHEN prev_status IS NULL
                       OR prev_status <> o_orderstatus THEN 1 ELSE 0 END AS chg
      FROM ordered
    ),
    grouped AS (
      SELECT *, SUM(chg) OVER (PARTITION BY o_custkey
                               ORDER BY o_orderdate, o_orderkey
                               ROWS UNBOUNDED PRECEDING) AS grp
      FROM flagged
    ),
    islands AS (
      SELECT o_custkey, o_orderstatus AS status, grp,
             MIN(o_orderdate) AS valid_from_ts,
             COUNT(*) AS n_orders
      FROM grouped
      GROUP BY o_custkey, o_orderstatus, grp
    ),
    versioned AS (
      SELECT o_custkey, status, n_orders, valid_from_ts,
             LEAD(valid_from_ts) OVER (PARTITION BY o_custkey
                                       ORDER BY valid_from_ts, grp) AS valid_to_ts
      FROM islands
    )
    SELECT o_custkey AS c_custkey, status,
           CAST(CAST(valid_from_ts AS DATE) AS VARCHAR) AS valid_from,
           CAST(CAST(valid_to_ts AS DATE) AS VARCHAR) AS valid_to,
           valid_to_ts IS NULL AS is_current,
           CAST(n_orders AS BIGINT) AS n_orders
    FROM versioned
    """,
    doc="SCD Type-2 dimension build from a change log (the standard "
    "Hive-warehouse pattern users run as a multi-stage INSERT OVERWRITE — "
    "SemanticAnalyzer window path + `ql/udf/generic/GenericUDFLag.java`): "
    "collapse each customer's order-status stream into versioned validity "
    "ranges. Gaps-and-islands: lag() marks status changes, a running sum "
    "numbers the islands, per-island MIN(date) opens the version, lead() "
    "over versions closes it, NULL close = current row. All three window "
    "passes share ONE hash partitioning on o_custkey (no extra exchange "
    "between lag, running sum, and lead), then a groupBy on the same key — "
    "at 100 TB this is a single shuffle of the change log plus partial "
    "aggregation; nothing global, nothing on the driver.",
    tags=("workload", "window", "scd2"),
)
def workload_scd2_dimension(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    seq = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    flagged = o.select(
        "o_custkey", "o_orderstatus", "o_orderdate", "o_orderkey"
    ).withColumn(
        "chg",
        F.when(
            F.lag("o_orderstatus").over(seq).isNull()
            | (F.lag("o_orderstatus").over(seq) != F.col("o_orderstatus")),
            F.lit(1),
        ).otherwise(F.lit(0)),
    )
    grouped = flagged.withColumn(
        "grp", F.sum("chg").over(seq.rowsBetween(Window.unboundedPreceding, 0))
    )
    islands = grouped.groupBy(
        "o_custkey", F.col("o_orderstatus").alias("status"), "grp"
    ).agg(
        F.min("o_orderdate").alias("valid_from_ts"),
        F.count(F.lit(1)).alias("n_orders"),
    )
    ver = Window.partitionBy("o_custkey").orderBy("valid_from_ts", "grp")
    versioned = islands.withColumn(
        "valid_to_ts", F.lead("valid_from_ts").over(ver)
    )
    return versioned.select(
        F.col("o_custkey").alias("c_custkey"),
        "status",
        F.col("valid_from_ts").cast("date").cast("string").alias("valid_from"),
        F.col("valid_to_ts").cast("date").cast("string").alias("valid_to"),
        F.col("valid_to_ts").isNull().alias("is_current"),
        F.col("n_orders").cast("long").alias("n_orders"),
    )


@register(
    "events_funnel",
    oracle="""
    WITH e AS (
      SELECT user_id, event_type, epoch_us(ts) AS ts_us FROM events
    ),
    tv AS (
      SELECT user_id, MIN(ts_us) AS t_view FROM e
      WHERE event_type = 'view' GROUP BY user_id
    ),
    tc AS (
      SELECT e.user_id, MIN(e.ts_us) AS t_click
      FROM e JOIN tv ON e.user_id = tv.user_id
      WHERE e.event_type = 'click' AND e.ts_us > tv.t_view
      GROUP BY e.user_id
    ),
    tp AS (
      SELECT e.user_id, MIN(e.ts_us) AS t_purchase
      FROM e JOIN tc ON e.user_id = tc.user_id
      WHERE e.event_type = 'purchase' AND e.ts_us > tc.t_click
      GROUP BY e.user_id
    )
    SELECT CAST((SELECT COUNT(DISTINCT user_id) FROM e) AS BIGINT) AS n_users,
           CAST((SELECT COUNT(*) FROM tv) AS BIGINT) AS n_view,
           CAST((SELECT COUNT(*) FROM tc) AS BIGINT) AS n_view_click,
           CAST((SELECT COUNT(*) FROM tp) AS BIGINT) AS n_full_funnel
    """,
    doc="Ordered conversion funnel view -> click -> purchase (the standard "
    "clickstream workload Hive users express as staged self-joins; "
    "no reference operator — SemanticAnalyzer just sees joins+aggs): each "
    "step is the user's FIRST qualifying event strictly AFTER the prior "
    "step, so out-of-order events can't fake a conversion. Three "
    "min-aggregations chained by equi-joins, every shuffle keyed on "
    "user_id (AQE reuses the partitioning; nothing global until the final "
    "4-scalar summary). Integer-microsecond comparisons only. At 100 TB "
    "each stage is one partial-agg shuffle of the (already tiny) "
    "qualifying-event projection — the funnel SHAPE is fixed-cost no "
    "matter how long the event log is.",
    tags=("workload", "events", "funnel"),
)
def events_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events").select(
        "user_id", "event_type", F.unix_micros("ts").alias("ts_us")
    )
    tv = (
        e.where(F.col("event_type") == "view")
        .groupBy("user_id")
        .agg(F.min("ts_us").alias("t_view"))
    )
    tc = (
        e.where(F.col("event_type") == "click")
        .join(tv, "user_id")
        .where(F.col("ts_us") > F.col("t_view"))
        .groupBy("user_id")
        .agg(F.min("ts_us").alias("t_click"))
    )
    tp = (
        e.where(F.col("event_type") == "purchase")
        .join(tc, "user_id")
        .where(F.col("ts_us") > F.col("t_click"))
        .groupBy("user_id")
        .agg(F.min("ts_us").alias("t_purchase"))
    )
    n_users = e.agg(F.countDistinct("user_id").alias("n_users"))
    return (
        n_users.crossJoin(tv.agg(F.count(F.lit(1)).alias("n_view")))
        .crossJoin(tc.agg(F.count(F.lit(1)).alias("n_view_click")))
        .crossJoin(tp.agg(F.count(F.lit(1)).alias("n_full_funnel")))
    )


@register(
    "events_retention_cohorts",
    oracle="""
    WITH e AS (
      SELECT user_id, CAST(ts AS DATE) AS day FROM events
    ),
    cohort AS (
      SELECT user_id, MIN(day) AS cohort_day FROM e GROUP BY user_id
    )
    SELECT CAST(CAST(c.cohort_day AS DATE) AS VARCHAR) AS cohort_day,
           CAST(date_diff('day', c.cohort_day, e.day) AS BIGINT) AS day_offset,
           CAST(COUNT(DISTINCT e.user_id) AS BIGINT) AS n_active
    FROM e JOIN cohort c ON e.user_id = c.user_id
    GROUP BY c.cohort_day, day_offset
    """,
    doc="Retention cohort matrix (the second standard clickstream "
    "workload): users are cohorted by first-seen day; each (cohort_day, "
    "day_offset) cell counts distinct users active that many days later. "
    "Two shuffles — the per-user MIN (partial agg) and the cell count-"
    "distinct — both well-keyed; the cohort frame is |users| and joins "
    "back to events on user_id (at 100 TB it broadcast-joins or "
    "co-partitions; either way no skew since user_id is the key on both "
    "sides). Day arithmetic in whole days on DATE-cast values, identical "
    "in both engines.",
    tags=("workload", "events", "retention"),
)
def events_retention_cohorts(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events").select(
        "user_id", F.col("ts").cast("date").alias("day")
    )
    cohort = e.groupBy("user_id").agg(F.min("day").alias("cohort_day"))
    return (
        e.join(cohort, "user_id")
        .select(
            "user_id",
            "cohort_day",
            F.datediff("day", "cohort_day").cast("long").alias("day_offset"),
        )
        .groupBy(F.col("cohort_day").cast("string").alias("cohort_day"), F.col("day_offset"))
        .agg(F.countDistinct("user_id").cast("long").alias("n_active"))
    )


@register(
    "events_attribution_last_touch",
    oracle="""
    WITH e AS (
      SELECT user_id, event_id, event_type, value, epoch_us(ts) AS ts_us
      FROM events
    ),
    merged AS (
      SELECT user_id, ts_us, event_id,
             CASE WHEN event_type IN ('view', 'click') THEN 0 ELSE 1 END AS ord,
             CASE WHEN event_type IN ('view', 'click') THEN event_type END
               AS touch_type,
             CASE WHEN event_type IN ('view', 'click') THEN ts_us END
               AS touch_ts,
             CASE WHEN event_type = 'purchase' THEN value END AS purchase_value
      FROM e
      WHERE event_type IN ('view', 'click', 'purchase')
    ),
    carried AS (
      SELECT *,
             LAST_VALUE(touch_type IGNORE NULLS) OVER w AS last_touch,
             LAST_VALUE(touch_ts IGNORE NULLS) OVER w AS last_touch_ts
      FROM merged
      WINDOW w AS (PARTITION BY user_id ORDER BY ts_us, ord, event_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
    ),
    attributed AS (
      SELECT CASE WHEN last_touch IS NOT NULL
                    AND ts_us - last_touch_ts <= 604800000000
                  THEN last_touch ELSE 'unattributed' END AS channel,
             purchase_value
      FROM carried WHERE purchase_value IS NOT NULL
    )
    SELECT channel,
           CAST(COUNT(*) AS BIGINT) AS n_purchases,
           CAST(SUM(CAST(purchase_value AS DECIMAL(18,2))) AS DOUBLE)
             AS revenue
    FROM attributed GROUP BY channel
    """,
    doc="Last-touch marketing attribution (the AS-OF-join application "
    "shape): every purchase is attributed to the user's most recent "
    "view/click at-or-before it, provided the touch is within a 7-day "
    "window; otherwise 'unattributed'. Single-shuffle union+window form "
    "(same algebra as join_asof): touches and purchases merge into one "
    "per-user stream ordered by (ts, kind, event_id) — kind=0 sorts a "
    "same-microsecond touch before the purchase — and last_value(..., "
    "ignorenulls) carries the latest touch forward; no range join, no "
    "per-pair blow-up, one Exchange on user_id. Revenue sums ride "
    "DECIMAL(18,2) per the parallel-sum determinism rule. At 100 TB the "
    "event log shuffles once; the window never sees more state than one "
    "user's stream.",
    tags=("workload", "events", "asof", "attribution"),
)
def events_attribution_last_touch(spark: SparkSession, sf_dir: str) -> DataFrame:
    window_us = 7 * 24 * 3600 * 1_000_000
    e = load_table(spark, sf_dir, "events").select(
        "user_id",
        "event_id",
        "event_type",
        "value",
        F.unix_micros("ts").alias("ts_us"),
    ).where(F.col("event_type").isin("view", "click", "purchase"))
    is_touch = F.col("event_type").isin("view", "click")
    merged = e.select(
        "user_id",
        "ts_us",
        "event_id",
        F.when(is_touch, F.lit(0)).otherwise(F.lit(1)).alias("ord"),
        F.when(is_touch, F.col("event_type")).alias("touch_type"),
        F.when(is_touch, F.col("ts_us")).alias("touch_ts"),
        F.when(F.col("event_type") == "purchase", F.col("value")).alias(
            "purchase_value"
        ),
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts_us", "ord", "event_id")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    carried = merged.select(
        "*",
        F.last("touch_type", ignorenulls=True).over(w).alias("last_touch"),
        F.last("touch_ts", ignorenulls=True).over(w).alias("last_touch_ts"),
    )
    attributed = carried.where(F.col("purchase_value").isNotNull()).select(
        F.when(
            F.col("last_touch").isNotNull()
            & (F.col("ts_us") - F.col("last_touch_ts") <= window_us),
            F.col("last_touch"),
        )
        .otherwise("unattributed")
        .alias("channel"),
        "purchase_value",
    )
    return attributed.groupBy("channel").agg(
        F.count(F.lit(1)).cast("long").alias("n_purchases"),
        dsum_exact(dec("purchase_value"), "revenue"),
    )


@register(
    "timeseries_gap_fill",
    oracle="""
    WITH daily AS (
      SELECT o_orderstatus AS st, CAST(o_orderdate AS DATE) AS day,
             COUNT(*) AS n
      FROM orders GROUP BY st, day
    ),
    b AS (SELECT MIN(day) AS mn, MAX(day) AS mx FROM daily),
    cal AS (
      SELECT CAST(unnest(generate_series(mn, mx, INTERVAL 1 DAY)) AS DATE)
               AS day
      FROM b
    ),
    statuses AS (SELECT DISTINCT o_orderstatus AS st FROM orders),
    dense AS (
      SELECT s.st, c.day, COALESCE(d.n, 0) AS n
      FROM statuses s CROSS JOIN cal c
      LEFT JOIN daily d ON d.st = s.st AND d.day = c.day
    )
    SELECT st, CAST(day AS VARCHAR) AS day,
           CAST(n AS BIGINT) AS n,
           CAST(SUM(n) OVER (PARTITION BY st ORDER BY day
                             ROWS BETWEEN 6 PRECEDING AND CURRENT ROW)
                AS BIGINT) AS n_7d
    FROM dense
    """,
    doc="Calendar gap-filling + dense moving window (the sparse-to-dense "
    "time-series shape every warehouse report needs — Hive users build "
    "the calendar with a UDTF or a pre-materialized dim_date table; "
    "Spark-first it's sequence()+explode, zero I/O): per-status daily "
    "order counts are densified against the full min..max day calendar "
    "(missing days become explicit zeros) and a ROWS 6-PRECEDING window "
    "computes the trailing-7-day total — which is only CORRECT on the "
    "dense series (on the sparse one the frame silently spans gaps; "
    "that's the bug this op exists to prevent). The calendar derives "
    "from a 1-row bounds aggregate (no driver collect) and cross-joins "
    "the tiny status dim; the left join keys on (status, day) and the "
    "window partitions by status — at 100 TB with per-entity series you "
    "partition the window by entity and the calendar broadcast-joins. "
    "Integer counts and string days end to end.",
    tags=("workload", "timeseries", "window"),
)
def timeseries_gap_fill(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    daily = o.groupBy(
        F.col("o_orderstatus").alias("st"),
        F.col("o_orderdate").cast("date").alias("day"),
    ).agg(F.count(F.lit(1)).alias("n"))
    bounds = daily.agg(F.min("day").alias("mn"), F.max("day").alias("mx"))
    cal = bounds.select(
        F.explode(F.sequence("mn", "mx", F.expr("interval 1 day"))).alias("day")
    )
    statuses = o.select(F.col("o_orderstatus").alias("st")).distinct()
    dense = (
        statuses.crossJoin(cal)
        .join(daily, ["st", "day"], "left")
        .select("st", "day", F.coalesce("n", F.lit(0)).alias("n"))
    )
    w = (
        Window.partitionBy("st")
        .orderBy("day")
        .rowsBetween(-6, 0)
    )
    return dense.select(
        "st",
        F.col("day").cast("string").alias("day"),
        F.col("n").cast("long").alias("n"),
        F.sum("n").over(w).cast("long").alias("n_7d"),
    )


@register(
    "workload_basket_pairs",
    oracle="""
    WITH basket AS (
      -- DISTINCT must complete BEFORE the cap window: DuckDB evaluates a
      -- same-block QUALIFY against the pre-DISTINCT rows (verified r18),
      -- which would cap on raw line count while the Spark plan caps on
      -- distinct basket size — divergent exactly on duplicate-heavy
      -- wholesale orders (>64 lines, <=64 distinct parts). Subquery
      -- placement makes both engines cap on distinct (order, part) rows.
      SELECT * FROM (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem)
      QUALIFY COUNT(*) OVER (PARTITION BY l_orderkey) <= 64
    ),
    pairs AS (
      SELECT a.l_partkey AS part_a, b.l_partkey AS part_b,
             COUNT(*) AS n_baskets
      FROM basket a JOIN basket b
        ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
      GROUP BY part_a, part_b
    )
    SELECT part_a, part_b, CAST(n_baskets AS BIGINT) AS n_baskets
    FROM pairs
    ORDER BY n_baskets DESC, part_a, part_b
    LIMIT 20
    """,
    doc="Market-basket pair mining (co-occurrence within orders — the "
    "association-rules front half every retail warehouse runs; in Hive "
    "it's this exact self-join): distinct (order, part) pairs self-join "
    "on the order key with part_a < part_b, count baskets per pair, "
    "top-20 with a total-order tie-break. The self-join fan-out is "
    "quadratic in BASKET SIZE, not corpus size, so mega-baskets are "
    "capped IN PLAN at 64 items (r17; the shingle-df-cap algebra from "
    "the dedup ops — orders as documents, parts as terms; one window "
    "count keyed on the join's own shuffle key, mirrored by the "
    "oracle's QUALIFY stanza outside the DISTINCT subquery so both "
    "engines cap on DISTINCT basket size, not raw line count — r18 "
    "fix): measured at sf0.01, ONE synthetic "
    "5000-part wholesale/bot order adds 12.6M join rows — 106x the "
    "whole corpus's 119k — and its n_baskets=1 artifact pairs take ALL "
    "20 top-20 slots via the tie-break (SCALE.md r17); TPC-H baskets "
    "hold <= 7 items so the cap is invisible on the fixture. One "
    "shuffle on the order key, partial-agg on the pair, "
    "TakeOrderedAndProject for the top-k.",
    tags=("workload", "basket", "join"),
)
def workload_basket_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window

    li = load_table(spark, sf_dir, "lineitem")
    basket = (
        li.select("l_orderkey", "l_partkey")
        .distinct()
        .withColumn(
            "__bsz",
            F.count(F.lit(1)).over(Window.partitionBy("l_orderkey")),
        )
        .filter(F.col("__bsz") <= 64)
        .drop("__bsz")
    )
    a, b = basket.alias("a"), basket.alias("b")
    pairs = (
        a.join(
            b,
            (F.col("a.l_orderkey") == F.col("b.l_orderkey"))
            & (F.col("a.l_partkey") < F.col("b.l_partkey")),
        )
        .groupBy(
            F.col("a.l_partkey").alias("part_a"),
            F.col("b.l_partkey").alias("part_b"),
        )
        .agg(F.count(F.lit(1)).cast("long").alias("n_baskets"))
    )
    return pairs.orderBy(
        F.col("n_baskets").desc(), F.col("part_a"), F.col("part_b")
    ).limit(20)


@register(
    "events_dau_wau",
    oracle="""
    WITH ud AS (
      SELECT DISTINCT user_id, CAST(ts AS DATE) AS day FROM events
    ),
    dau AS (
      SELECT day, COUNT(*) AS dau FROM ud GROUP BY day
    ),
    spread AS (
      SELECT user_id, day + CAST(i AS INTEGER) AS wday
      FROM ud, UNNEST(range(0, 7)) AS t(i)
    ),
    wau AS (
      SELECT wday AS day, COUNT(DISTINCT user_id) AS wau
      FROM spread GROUP BY wday
    )
    SELECT CAST(d.day AS VARCHAR) AS day,
           CAST(d.dau AS BIGINT) AS dau,
           CAST(w.wau AS BIGINT) AS wau,
           CAST(d.dau * 100 // w.wau AS BIGINT) AS stickiness_pct
    FROM dau d JOIN wau w ON w.day = d.day
    """,
    doc="DAU / trailing-7-day WAU / stickiness (the growth-analytics "
    "staple): the hard part is COUNT(DISTINCT) over a sliding window, "
    "which window frames cannot express — solved with the SPREAD trick: "
    "each distinct (user, day) activity row is exploded to the 7 future "
    "days it keeps the user 'weekly active' for (sequence+explode, "
    "codegen), so WAU(day) is a plain per-day COUNT(DISTINCT) — two "
    "groupBy shuffles total and nothing quadratic; the 7x intermediate "
    "is the textbook space/shuffle trade for windowed distinct counts at "
    "scale (the approximate alternative is per-day HLL sketch merges). "
    "Stickiness = 100*DAU/WAU in integer floor division — exact both "
    "engines. Days reported only where DAU exists (inner join), dates as "
    "strings per the registry rule.",
    tags=("workload", "events", "window"),
)
def events_dau_wau(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events").select(
        "user_id", F.col("ts").cast("date").alias("day")
    )
    ud = e.distinct()
    dau = ud.groupBy("day").agg(F.count(F.lit(1)).alias("dau"))
    spread = ud.select(
        "user_id",
        F.explode(F.sequence(F.lit(0), F.lit(6))).alias("i"),
        "day",
    ).select("user_id", F.date_add("day", F.col("i")).alias("wday"))
    wau = spread.groupBy(F.col("wday").alias("day")).agg(
        F.countDistinct("user_id").alias("wau")
    )
    return dau.join(wau, "day").select(
        F.col("day").cast("string").alias("day"),
        F.col("dau").cast("long").alias("dau"),
        F.col("wau").cast("long").alias("wau"),
        F.floor(F.col("dau") * 100 / F.col("wau")).cast("long").alias("stickiness_pct"),
    )


@register(
    "workload_cdc_merge",
    oracle="""
    WITH batch AS (
      SELECT c_custkey AS k,
             CASE WHEN c_custkey % 10 = 0 THEN 'U'
                  WHEN c_custkey % 10 = 1 THEN 'D' END AS op,
             CAST(CAST(c_acctbal AS DECIMAL(18,2)) + 100 AS DECIMAL(18,2))
               AS new_bal
      FROM customer WHERE c_custkey % 10 IN (0, 1)
      UNION ALL
      SELECT c_custkey + 1000000 AS k, 'I' AS op,
             CAST(50.00 AS DECIMAL(18,2)) AS new_bal
      FROM customer WHERE c_custkey % 10 = 2
    ),
    merged AS (
      SELECT COALESCE(b.k, c.c_custkey) AS k,
             CASE WHEN b.op = 'I' THEN 'ins_batch'
                  ELSE c.c_mktsegment END AS seg,
             CASE WHEN b.op IN ('U', 'I') THEN b.new_bal
                  ELSE CAST(c.c_acctbal AS DECIMAL(18,2)) END AS bal
      FROM customer c FULL OUTER JOIN batch b ON b.k = c.c_custkey
      WHERE COALESCE(b.op, '') <> 'D'
    )
    SELECT seg,
           CAST(COUNT(*) AS BIGINT) AS n_rows,
           CAST(SUM(bal) AS DOUBLE) AS total_bal
    FROM merged
    GROUP BY seg
    """,
    doc="Batch CDC MERGE (the MERGE INTO every dimension-maintenance job "
    "runs; Hive 1.2's analogue was INSERT OVERWRITE from a full-outer "
    "reconciliation — real MERGE arrived with ACID later): a derived "
    "change batch (10% updates: +100 balance; 10% deletes; 10% inserts "
    "under fresh keys) applied to the customer snapshot in ONE full-outer "
    "join keyed on c_custkey + a CASE router — exactly the physical plan "
    "Delta/Iceberg MERGE compiles to. One shuffle on the join key, no "
    "iteration, insert/update/delete all in the same pass; the verdict "
    "aggregate (per-segment row count + exact decimal balance total) "
    "reconciles the merged table, so a dropped delete, double-applied "
    "update, or lost insert shifts a count or a cent. At 100 TB the "
    "snapshot side is bucketed on the key so the merge co-locates "
    "shuffle-free (the bucketed_smb_join layout).",
    tags=("workload", "cdc", "merge", "join"),
)
def workload_cdc_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer").select(
        "c_custkey", "c_mktsegment", "c_acctbal"
    )
    upd = c.filter(F.col("c_custkey") % 10 == 0).select(
        F.col("c_custkey").alias("k"),
        F.lit("U").alias("op"),
        (dec("c_acctbal") + 100).cast("decimal(18,2)").alias("new_bal"),
    )
    dele = c.filter(F.col("c_custkey") % 10 == 1).select(
        F.col("c_custkey").alias("k"),
        F.lit("D").alias("op"),
        F.lit(None).cast("decimal(18,2)").alias("new_bal"),
    )
    ins = c.filter(F.col("c_custkey") % 10 == 2).select(
        (F.col("c_custkey") + 1000000).alias("k"),
        F.lit("I").alias("op"),
        F.lit("50.00").cast("decimal(18,2)").alias("new_bal"),
    )
    batch = upd.unionByName(dele).unionByName(ins)
    merged = (
        c.join(batch, batch.k == c.c_custkey, "full_outer")
        .where(F.coalesce(F.col("op"), F.lit("")) != "D")
        .select(
            F.when(F.col("op") == "I", "ins_batch")
            .otherwise(F.col("c_mktsegment"))
            .alias("seg"),
            F.when(F.col("op").isin("U", "I"), F.col("new_bal"))
            .otherwise(dec("c_acctbal"))
            .alias("bal"),
        )
    )
    return merged.groupBy("seg").agg(
        F.count(F.lit(1)).cast("long").alias("n_rows"),
        F.sum("bal").cast("double").alias("total_bal"),
    )


@register(
    "events_funnel_windowed",
    oracle="""
    WITH e AS (
      SELECT user_id, event_type, epoch_us(ts) AS ts_us FROM events
    ),
    tv AS (
      SELECT user_id, MIN(ts_us) AS t_view FROM e
      WHERE event_type = 'view' GROUP BY user_id
    ),
    tc AS (
      SELECT e.user_id, MIN(e.ts_us) AS t_click
      FROM e JOIN tv ON e.user_id = tv.user_id
      WHERE e.event_type = 'click'
        AND e.ts_us > tv.t_view
        AND e.ts_us - tv.t_view <= 3600000000
      GROUP BY e.user_id
    ),
    tp AS (
      SELECT e.user_id, MIN(e.ts_us) AS t_purchase
      FROM e JOIN tc ON e.user_id = tc.user_id
      WHERE e.event_type = 'purchase'
        AND e.ts_us > tc.t_click
        AND e.ts_us - tc.t_click <= 86400000000
      GROUP BY e.user_id
    )
    SELECT CAST((SELECT COUNT(*) FROM tv) AS BIGINT) AS n_view,
           CAST((SELECT COUNT(*) FROM tc) AS BIGINT) AS n_click_1h,
           CAST((SELECT COUNT(*) FROM tp) AS BIGINT) AS n_purchase_24h,
           -- // is integer floor division: CAST would ROUND the quotient in
           -- DuckDB but TRUNCATE in Spark (the 666-vs-667 bp divergence)
           CAST((SELECT COUNT(*) FROM tc) * 10000
                // (SELECT COUNT(*) FROM tv) AS BIGINT) AS click_rate_bp,
           CAST((SELECT COUNT(*) FROM tp) * 10000
                // GREATEST((SELECT COUNT(*) FROM tc), 1) AS BIGINT)
             AS purchase_rate_bp
    """,
    doc="TIME-CONSTRAINED conversion funnel (the attribution-window "
    "variant of events_funnel: a click only converts within 1 h of the "
    "first view, a purchase within 24 h of the converting click — the "
    "definition ad-platform reporting actually uses, where an unbounded "
    "funnel overcounts): same staged min-agg chain keyed on user_id, "
    "each stage adding an integer-microsecond window predicate, so step "
    "N's clock starts at step N-1's qualifying instant (cascading, not "
    "anchored to the view). Conversion rates emitted as exact integer "
    "basis points — no float division. Cost identical to the unbounded "
    "funnel: the window predicate prunes rows before each partial agg.",
    tags=("workload", "events", "funnel"),
)
def events_funnel_windowed(spark: SparkSession, sf_dir: str) -> DataFrame:
    hour_us, day_us = 3600000000, 86400000000
    e = load_table(spark, sf_dir, "events").select(
        "user_id", "event_type", F.unix_micros("ts").alias("ts_us")
    )
    tv = (
        e.where(F.col("event_type") == "view")
        .groupBy("user_id")
        .agg(F.min("ts_us").alias("t_view"))
    )
    tc = (
        e.where(F.col("event_type") == "click")
        .join(tv, "user_id")
        .where(
            (F.col("ts_us") > F.col("t_view"))
            & (F.col("ts_us") - F.col("t_view") <= hour_us)
        )
        .groupBy("user_id")
        .agg(F.min("ts_us").alias("t_click"))
    )
    tp = (
        e.where(F.col("event_type") == "purchase")
        .join(tc, "user_id")
        .where(
            (F.col("ts_us") > F.col("t_click"))
            & (F.col("ts_us") - F.col("t_click") <= day_us)
        )
        .groupBy("user_id")
        .agg(F.min("ts_us").alias("t_purchase"))
    )
    counts = (
        tv.agg(F.count(F.lit(1)).alias("n_view"))
        .crossJoin(tc.agg(F.count(F.lit(1)).alias("n_click_1h")))
        .crossJoin(tp.agg(F.count(F.lit(1)).alias("n_purchase_24h")))
    )
    return counts.select(
        F.col("n_view").cast("long").alias("n_view"),
        F.col("n_click_1h").cast("long").alias("n_click_1h"),
        F.col("n_purchase_24h").cast("long").alias("n_purchase_24h"),
        F.floor(F.col("n_click_1h") * 10000 / F.col("n_view"))
        .cast("long")
        .alias("click_rate_bp"),
        F.floor(
            F.col("n_purchase_24h")
            * 10000
            / F.greatest(F.col("n_click_1h"), F.lit(1))
        )
        .cast("long")
        .alias("purchase_rate_bp"),
    )


def flatten_forest(
    nodes: DataFrame, parent: "F.Column", *, max_iters: int = 40,
    stats: dict | None = None
) -> DataFrame:
    """Pointer-doubling forest flatten over (node) rows with a parent
    expression (NULL = root): each round joins every node's ancestor
    pointer to that ancestor's pointer, doubling covered hop distance —
    ceil(log2(max_depth)) + 1 rounds to fixpoint (the +1 is the final
    all-done check round). ``stats`` receives {"rounds": r} so stress
    tests can pin the bound (same contract as connected_components)."""
    cur = nodes.select(
        F.col(nodes.columns[0]).alias("node"),
        F.coalesce(parent, F.col(nodes.columns[0])).alias("anc"),
        F.when(parent.isNull(), 0).otherwise(1).alias("d"),
        parent.isNull().alias("done"),
    ).localCheckpoint(eager=True)
    rounds = 0
    for _ in range(max_iters):
        if cur.filter(~F.col("done")).count() == 0:
            break
        rounds += 1
        ptr = cur.select(
            F.col("node").alias("anc"),
            F.col("anc").alias("anc2"),
            F.col("d").alias("d2"),
            F.col("done").alias("done2"),
        )
        cur = (
            cur.join(ptr, "anc")
            .select(
                "node",
                F.when(F.col("done"), F.col("anc")).otherwise(F.col("anc2")).alias("anc"),
                F.when(F.col("done"), F.col("d"))
                .otherwise(F.col("d") + F.col("d2"))
                .alias("d"),
                F.when(F.col("done"), F.lit(True)).otherwise(F.col("done2")).alias("done"),
            )
            .localCheckpoint(eager=True)
        )
    else:
        raise RuntimeError(f"hierarchy_flatten: no fixpoint within {max_iters} rounds")
    if stats is not None:
        stats["rounds"] = rounds
    remaining = cur.filter(~F.col("done")).count()
    if remaining:
        raise RuntimeError(f"hierarchy_flatten: {remaining} nodes unconverged")
    return cur.select(
        F.col("node").alias("doc_id"),
        F.col("anc").cast("long").alias("root_id"),
        F.col("d").cast("int").alias("depth"),
    )


@register(
    "workload_hierarchy_flatten",
    oracle="""
    WITH RECURSIVE walk AS (
      SELECT doc_id AS node, doc_id AS root_id, 0 AS depth
      FROM documents WHERE doc_id // 5 = 0
      UNION ALL
      SELECT d.doc_id, w.root_id, w.depth + 1
      FROM documents d
      JOIN walk w
        ON w.node = ((d.doc_id // 5 - 1) // 2) * 5 + d.doc_id % 5
      WHERE d.doc_id // 5 > 0
    )
    SELECT node AS doc_id,
           CAST(root_id AS BIGINT) AS root_id,
           CAST(depth AS INTEGER) AS depth
    FROM walk
    """,
    doc="Hierarchy flattening (root + depth per node) over a synthetic "
    "5-tree forest (tree = doc_id % 5, heap-shaped parents) — the "
    "recursive-CTE workload (org charts, BOMs, category trees) that "
    "Spark SQL cannot express declaratively (no WITH RECURSIVE) and "
    "Hive 1.2 could not either: the scale-correct Spark form is POINTER "
    "DOUBLING — each round joins every node's current ancestor pointer "
    "to that ancestor's pointer, doubling the hop distance covered, so "
    "an N-deep hierarchy flattens in ceil(log2(N)) self-joins instead of "
    "N sequential ones (the same iterate-with-localCheckpoint discipline "
    "as connected_components; a 1M-deep chain needs 20 rounds, not 1M). "
    "Converged state is asserted, never assumed. The DuckDB oracle walks "
    "the same forest with a real recursive CTE — two entirely different "
    "algorithms, one fixpoint.",
    tags=("workload", "graph", "iterative", "hierarchy"),
)
def workload_hierarchy_flatten(spark: SparkSession, sf_dir: str) -> DataFrame:
    nodes = load_table(spark, sf_dir, "documents").select("doc_id")
    parent = F.expr(
        "CASE WHEN doc_id div 5 = 0 THEN NULL "
        "ELSE ((doc_id div 5 - 1) div 2) * 5 + doc_id % 5 END"
    )
    return flatten_forest(nodes, parent)


@register(
    "events_anomaly_exact",
    oracle="""
    WITH daily AS (
      SELECT event_type, CAST(ts AS DATE) AS day, COUNT(*) AS n
      FROM events GROUP BY event_type, CAST(ts AS DATE)
    ),
    w AS (
      SELECT event_type, day, n,
             SUM(n) OVER tw AS s,
             SUM(n * n) OVER tw AS sq,
             COUNT(*) OVER tw AS k
      FROM daily
      WINDOW tw AS (PARTITION BY event_type ORDER BY day
                    ROWS BETWEEN 7 PRECEDING AND 1 PRECEDING)
    )
    SELECT event_type,
           CAST(day AS VARCHAR) AS day,
           CAST(n AS BIGINT) AS n,
           CAST(k AS BIGINT) AS n_baseline_days,
           (k >= 4 AND (n * k - s) * (n * k - s) > 4 * (k * sq - s * s))
             AS is_anomaly
    FROM w
    """,
    doc="Daily-volume anomaly flags with EXACT integer arithmetic (the "
    "ops-monitoring query every event pipeline runs; naive z-scores "
    "divide floats and diverge cross-engine in the last ulp): per "
    "(event_type, day) counts against a trailing 7-day baseline window; "
    "|x - mean| > 2*stddev is algebraically cross-multiplied to "
    "(x*k - s)^2 > 4*(k*sq - s^2) over BIGINT sums — no division, no "
    "sqrt, no float anywhere, so the flag is bit-identical at any "
    "parallelism (the same trick as diagnostics_key_skew). Days with "
    "fewer than 4 baseline days abstain. One groupBy shuffle + one "
    "per-type window over ~|days| rows; at 100 TB the daily pre-agg is "
    "the only pass over raw events.",
    tags=("workload", "events", "anomaly", "window"),
)
def events_anomaly_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    daily = (
        load_table(spark, sf_dir, "events")
        .groupBy("event_type", F.to_date("ts").alias("day"))
        .agg(F.count(F.lit(1)).alias("n"))
    )
    tw = (
        Window.partitionBy("event_type")
        .orderBy("day")
        .rowsBetween(-7, -1)
    )
    w = daily.select(
        "event_type",
        "day",
        "n",
        F.sum("n").over(tw).alias("s"),
        F.sum(F.col("n") * F.col("n")).over(tw).alias("sq"),
        F.count(F.lit(1)).over(tw).alias("k"),
    )
    dev = F.col("n") * F.col("k") - F.col("s")
    var4 = 4 * (F.col("k") * F.col("sq") - F.col("s") * F.col("s"))
    return w.select(
        "event_type",
        F.col("day").cast("string").alias("day"),
        F.col("n").cast("long").alias("n"),
        F.col("k").cast("long").alias("n_baseline_days"),
        ((F.col("k") >= 4) & (dev * dev > var4)).alias("is_anomaly"),
    )


@register(
    "events_markov_transitions",
    oracle="""
    WITH seq AS (
      SELECT user_id, event_type,
             LEAD(event_type) OVER (PARTITION BY user_id
                                    ORDER BY ts, event_id) AS next_type
      FROM events
    ),
    pairs AS (
      SELECT event_type AS from_type, next_type AS to_type, COUNT(*) AS n
      FROM seq WHERE next_type IS NOT NULL
      GROUP BY 1, 2
    )
    SELECT from_type, to_type,
           CAST(n AS BIGINT) AS n,
           CAST(n * 10000 // SUM(n) OVER (PARTITION BY from_type) AS BIGINT)
             AS p_bp
    FROM pairs
    """,
    doc="Event-type transition matrix (first-order Markov estimate of user "
    "behavior — the sequence-analytics summary behind next-action "
    "prediction and funnel design): per-user event streams ordered by "
    "(ts, event_id), LEAD pairs consecutive events, pair counts roll up "
    "per (from, to), and transition probabilities are emitted as exact "
    "integer BASIS POINTS (floor division — no float shares, the "
    "events_funnel_windowed discipline). One user_id window shuffle + "
    "one |types|^2-sized groupBy; the matrix is metadata-sized at any "
    "corpus scale.",
    tags=("workload", "events", "sequence", "window"),
)
def events_markov_transitions(spark: SparkSession, sf_dir: str) -> DataFrame:
    seq = load_table(spark, sf_dir, "events").select(
        "user_id",
        "event_type",
        F.lead("event_type")
        .over(Window.partitionBy("user_id").orderBy("ts", "event_id"))
        .alias("next_type"),
    )
    pairs = (
        seq.where(F.col("next_type").isNotNull())
        .groupBy(
            F.col("event_type").alias("from_type"),
            F.col("next_type").alias("to_type"),
        )
        .agg(F.count(F.lit(1)).alias("n"))
    )
    tot = Window.partitionBy("from_type")
    return pairs.select(
        "from_type",
        "to_type",
        F.col("n").cast("long").alias("n"),
        F.floor(F.col("n") * 10000 / F.sum("n").over(tot))
        .cast("long")
        .alias("p_bp"),
    )


@register(
    "timeseries_ohlc_bars",
    oracle="""
    WITH t AS (
      SELECT event_type,
             time_bucket(INTERVAL 6 HOUR, ts) AS bar,
             ts, event_id, value
      FROM events
    ),
    ranked AS (
      SELECT *,
             ROW_NUMBER() OVER (PARTITION BY event_type, bar
                                ORDER BY ts, event_id) AS rn_open,
             ROW_NUMBER() OVER (PARTITION BY event_type, bar
                                ORDER BY ts DESC, event_id DESC) AS rn_close
      FROM t
    )
    SELECT event_type,
           CAST(bar AS VARCHAR) AS bar_start,
           CAST(COUNT(*) AS BIGINT) AS n,
           CAST(MIN(CASE WHEN rn_open = 1 THEN value END) AS DOUBLE) AS open,
           CAST(MAX(value) AS DOUBLE) AS high,
           CAST(MIN(value) AS DOUBLE) AS low,
           CAST(MIN(CASE WHEN rn_close = 1 THEN value END) AS DOUBLE) AS close,
           CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS volume
    FROM ranked
    GROUP BY event_type, bar
    """,
    doc="OHLC bar aggregation (6-hour bars per event type — the "
    "time-series downsample every monitoring/market pipeline runs): "
    "open/close are the FIRST/LAST values by (ts, event_id) within the "
    "bar — a deterministic total order, not first()/last()'s "
    "encounter-order nondeterminism, which is the classic silent OHLC "
    "bug on parallel engines (both row_number passes ride the same "
    "(type, bar) Exchange); high/low/volume are plain min/max/decimal "
    "sums. Bars via timestamp floor (Spark window(); oracle "
    "time_bucket). One shuffle; bars are metadata-sized downstream.",
    tags=("workload", "timeseries", "window"),
)
def timeseries_ohlc_bars(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events").select(
        "event_type", "ts", "event_id", "value"
    )
    t = e.withColumn("bar", F.window("ts", "6 hours").start)
    w_open = Window.partitionBy("event_type", "bar").orderBy("ts", "event_id")
    w_close = Window.partitionBy("event_type", "bar").orderBy(
        F.col("ts").desc(), F.col("event_id").desc()
    )
    ranked = t.withColumn("rn_open", F.row_number().over(w_open)).withColumn(
        "rn_close", F.row_number().over(w_close)
    )
    return ranked.groupBy("event_type", "bar").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.min(F.when(F.col("rn_open") == 1, F.col("value")))
        .cast("double")
        .alias("open"),
        F.max("value").cast("double").alias("high"),
        F.min("value").cast("double").alias("low"),
        F.min(F.when(F.col("rn_close") == 1, F.col("value")))
        .cast("double")
        .alias("close"),
        F.sum(F.col("value").cast("decimal(18,2)")).cast("double").alias("volume"),
    ).select(
        "event_type",
        F.col("bar").cast("string").alias("bar_start"),
        "n", "open", "high", "low", "close", "volume",
    )


@register(
    "workload_open_orders_asof",
    oracle="""
    WITH fulfill AS (
      SELECT l_orderkey, MAX(l_shipdate) AS done_date
      FROM lineitem GROUP BY l_orderkey
    ),
    spans AS (
      SELECT o.o_orderkey, o.o_orderdate, o.o_totalprice, f.done_date
      FROM orders o JOIN fulfill f ON f.l_orderkey = o.o_orderkey
    ),
    asof_dates AS (
      SELECT CAST(y.y AS INTEGER) AS year_end,
             CAST(CAST(y.y AS VARCHAR) || '-12-31' AS DATE) AS d
      FROM UNNEST(range(1995, 2001)) AS y(y)
    )
    SELECT a.year_end,
           CAST(COUNT(s.o_orderkey) AS BIGINT) AS n_open,
           CAST(COALESCE(SUM(CAST(s.o_totalprice AS DECIMAL(18,2))), 0)
                AS DOUBLE) AS open_value
    FROM asof_dates a
    LEFT JOIN spans s
      ON s.o_orderdate <= a.d AND s.done_date > a.d
    GROUP BY a.year_end
    """,
    doc="Point-in-time snapshot reconstruction (orders IN FLIGHT as of "
    "each year-end — the time-travel/backlog query warehouses answer "
    "from effective-dated facts without storing snapshots): an order is "
    "open at D iff placed on-or-before D and not yet fully shipped "
    "(max l_shipdate per order > D). The as-of roster is a 6-row "
    "BROADCAST, so the interval predicate is a tiny nested-loop against "
    "metadata — the fact side is scanned once for the per-order fulfill "
    "date (one groupBy) and once for the probe, each linear; zero-open "
    "dates survive via the roster left join. The SCD2 build "
    "(workload_scd2_dimension) answers the same question for DIMENSION "
    "history; this is the FACT-side twin.",
    tags=("workload", "timeseries", "asof", "snapshot"),
)
def workload_open_orders_asof(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_shipdate")
    fulfill = li.groupBy("l_orderkey").agg(F.max("l_shipdate").alias("done_date"))
    o = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderdate", "o_totalprice"
    )
    spans = o.join(fulfill, F.col("l_orderkey") == F.col("o_orderkey"))
    asof = spark.range(1995, 2001).select(
        F.col("id").cast("int").alias("year_end"),
        F.to_date(F.concat(F.col("id").cast("string"), F.lit("-12-31"))).alias("d"),
    )
    joined = F.broadcast(asof).join(
        spans,
        (F.col("o_orderdate") <= F.col("d")) & (F.col("done_date") > F.col("d")),
        "left",
    )
    return joined.groupBy("year_end").agg(
        F.count("o_orderkey").cast("long").alias("n_open"),
        F.coalesce(
            F.sum(F.col("o_totalprice").cast("decimal(18,2)")),
            F.lit(0).cast("decimal(18,2)"),
        )
        .cast("double")
        .alias("open_value"),
    )


@register(
    "workload_pareto_abc",
    oracle="""
    WITH rev AS (
      SELECT o_custkey AS cust,
             SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS r
      FROM orders GROUP BY o_custkey
    ),
    ranked AS (
      SELECT cust, r,
             SUM(r) OVER (ORDER BY r DESC, cust
                          ROWS UNBOUNDED PRECEDING) AS cum,
             SUM(r) OVER () AS tot
      FROM rev
    ),
    classed AS (
      SELECT cust, r,
             CASE WHEN cum * 100 <= tot * 80 THEN 'A'
                  WHEN cum * 100 <= tot * 95 THEN 'B'
                  ELSE 'C' END AS klass
      FROM ranked
    )
    SELECT klass,
           CAST(COUNT(*) AS BIGINT) AS n_customers,
           CAST(SUM(r) AS DOUBLE) AS revenue
    FROM classed GROUP BY klass
    """,
    doc="Pareto / ABC customer classification (the 80/95 revenue-"
    "concentration report: class A = customers inside the first 80% of "
    "cumulative revenue, B to 95%, C the tail): per-customer decimal "
    "revenue, a deterministic running sum ordered by (revenue DESC, "
    "custkey), and class boundaries via exact integer-scaled "
    "cross-multiplication (cum*100 <= tot*80 — decimals compare exactly, "
    "no float shares). The global window is over the PRE-AGGREGATED "
    "customer table (|customers| rows, not |orders|); at 100 TB with "
    "billions of customers the same report computes from a histogram of "
    "revenue bands (two-pass: band counts, then classify bands) — the "
    "documented scale path; the per-customer form here is the exact "
    "small-dimension form.",
    tags=("workload", "window", "report"),
)
def workload_pareto_abc(spark: SparkSession, sf_dir: str) -> DataFrame:
    rev = (
        load_table(spark, sf_dir, "orders")
        .groupBy(F.col("o_custkey").alias("cust"))
        .agg(F.sum(F.col("o_totalprice").cast("decimal(18,2)")).alias("r"))
    )
    w_cum = (
        Window.orderBy(F.col("r").desc(), F.col("cust"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    ranked = rev.select(
        "cust",
        "r",
        F.sum("r").over(w_cum).alias("cum"),
        F.sum("r").over(Window.partitionBy()).alias("tot"),
    )
    classed = ranked.select(
        "r",
        F.when(F.col("cum") * 100 <= F.col("tot") * 80, "A")
        .when(F.col("cum") * 100 <= F.col("tot") * 95, "B")
        .otherwise("C")
        .alias("klass"),
    )
    return classed.groupBy("klass").agg(
        F.count(F.lit(1)).cast("long").alias("n_customers"),
        F.sum("r").cast("double").alias("revenue"),
    )


@register(
    "workload_order_cycle_time",
    oracle="""
    WITH cyc AS (
      SELECT o.o_orderpriority AS prio,
             CAST(MAX(l.l_shipdate) AS DATE) - CAST(o.o_orderdate AS DATE)
               AS days
      FROM orders o JOIN lineitem l ON l.l_orderkey = o.o_orderkey
      GROUP BY o.o_orderkey, o.o_orderpriority, o.o_orderdate
    )
    SELECT prio,
           CAST(COUNT(*) AS BIGINT) AS n_orders,
           CAST(MIN(days) AS BIGINT) AS min_days,
           CAST(MAX(days) AS BIGINT) AS max_days,
           CAST(SUM(days) AS BIGINT) AS total_days,
           CAST(SUM(days) // COUNT(*) AS BIGINT) AS mean_days_floor,
           CAST(SUM(CASE WHEN days > 90 THEN 1 ELSE 0 END) AS BIGINT)
             AS n_over_90d
    FROM cyc GROUP BY prio
    """,
    doc="Order cycle-time report (placement -> final shipment latency per "
    "priority — the fulfillment-SLA query an ops team tracks; pure "
    "Hive-1.2-expressible joins+aggs, included as the cycle-time "
    "companion to the as-of backlog snapshot): per-order duration = "
    "max(l_shipdate) - o_orderdate in integer DAYS (date subtraction — "
    "exact, no timestamp float), then per-priority extrema, exact total, "
    "floored mean, and an SLA-breach count (> 90 days). Two shuffles "
    "(per-order max rides the l_orderkey agg, report rides prio); all "
    "numbers integer-exact.",
    tags=("workload", "report", "datetime"),
)
def workload_order_cycle_time(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderpriority", "o_orderdate"
    )
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_shipdate")
    cyc = (
        o.join(li, F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy("o_orderkey", "o_orderpriority", "o_orderdate")
        .agg(F.max("l_shipdate").alias("done"))
        .select(
            F.col("o_orderpriority").alias("prio"),
            F.datediff(F.to_date("done"), F.to_date("o_orderdate")).alias("days"),
        )
    )
    return cyc.groupBy("prio").agg(
        F.count(F.lit(1)).cast("long").alias("n_orders"),
        F.min("days").cast("long").alias("min_days"),
        F.max("days").cast("long").alias("max_days"),
        F.sum("days").cast("long").alias("total_days"),
        F.floor(F.sum("days") / F.count(F.lit(1))).cast("long").alias(
            "mean_days_floor"
        ),
        F.sum(F.when(F.col("days") > 90, 1).otherwise(0))
        .cast("long")
        .alias("n_over_90d"),
    )


@register(
    "events_cohort_ltv",
    oracle="""
    WITH first_seen AS (
      SELECT user_id, MIN(CAST(ts AS DATE)) AS cohort_day
      FROM events GROUP BY user_id
    ),
    rev AS (
      SELECT e.user_id, f.cohort_day,
             CAST(e.ts AS DATE) - f.cohort_day AS offset_days,
             CAST(e.value AS DECIMAL(18,2)) AS v
      FROM events e JOIN first_seen f ON f.user_id = e.user_id
      WHERE e.event_type = 'purchase'
    ),
    weekly AS (
      SELECT cohort_day, offset_days // 7 AS offset_week, user_id, v
      FROM rev
    )
    SELECT CAST(cohort_day AS VARCHAR) AS cohort_day,
           CAST(offset_week AS BIGINT) AS offset_week,
           CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_buyers,
           CAST(SUM(v) AS DOUBLE) AS revenue,
           CAST(SUM(SUM(v)) OVER (PARTITION BY cohort_day
                                  ORDER BY offset_week
                                  ROWS UNBOUNDED PRECEDING) AS DOUBLE)
             AS cum_revenue
    FROM weekly
    GROUP BY cohort_day, offset_week
    """,
    doc="Cohort LTV curves (cumulative revenue per first-seen-day cohort "
    "by week offset — the lifetime-value matrix growth teams read next "
    "to the retention matrix events_retention_cohorts, which counts "
    "USERS where this sums REVENUE): first-seen day per user (one "
    "user_id agg), purchase revenue bucketed into integer week offsets, "
    "per-(cohort, week) buyer counts + decimal-exact revenue, and the "
    "running LTV via a window over the METADATA-SIZED cohort matrix "
    "(SUM(SUM(v)) OVER — the aggregate-then-window idiom, zero extra "
    "scan). Day arithmetic is integer date subtraction; revenue sums are "
    "decimal partials — both bit-exact cross-engine.",
    tags=("workload", "events", "retention", "window"),
)
def events_cohort_ltv(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events")
    first_seen = e.groupBy("user_id").agg(
        F.min(F.to_date("ts")).alias("cohort_day")
    )
    rev = (
        e.where(F.col("event_type") == "purchase")
        .join(first_seen, "user_id")
        .select(
            "user_id",
            "cohort_day",
            F.floor(
                F.datediff(F.to_date("ts"), F.col("cohort_day")) / 7
            ).alias("offset_week"),
            F.col("value").cast("decimal(18,2)").alias("v"),
        )
    )
    cell = rev.groupBy("cohort_day", "offset_week").agg(
        F.countDistinct("user_id").cast("long").alias("n_buyers"),
        F.sum("v").alias("rev"),
    )
    w = (
        Window.partitionBy("cohort_day")
        .orderBy("offset_week")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return cell.select(
        F.col("cohort_day").cast("string").alias("cohort_day"),
        F.col("offset_week").cast("long").alias("offset_week"),
        "n_buyers",
        F.col("rev").cast("double").alias("revenue"),
        F.sum("rev").over(w).cast("double").alias("cum_revenue"),
    )


@register(
    "events_interarrival_stats",
    oracle="""
    WITH gaps AS (
      SELECT event_type,
             epoch_us(ts) - LAG(epoch_us(ts)) OVER (
               PARTITION BY event_type ORDER BY ts, event_id) AS gap_us
      FROM events
    )
    SELECT event_type,
           CAST(COUNT(gap_us) AS BIGINT) AS n_gaps,
           CAST(MIN(gap_us) AS BIGINT) AS min_gap_us,
           CAST(MAX(gap_us) AS BIGINT) AS max_gap_us,
           CAST(SUM(gap_us) AS BIGINT) AS total_gap_us,
           CAST(SUM(gap_us) // COUNT(gap_us) AS BIGINT) AS mean_gap_us_floor
    FROM gaps
    GROUP BY event_type
    """,
    doc="Inter-arrival gap statistics per event type (the traffic-model "
    "numbers behind capacity planning and anomaly thresholds): LAG over "
    "(ts, event_id) — the registry's deterministic tie-break — yields "
    "integer-microsecond gaps; extrema, exact totals, floored means. "
    "Note total_gap_us telescopes to max(ts)-min(ts) per type ONLY when "
    "the stream has no same-microsecond ties breaking the LAG chain "
    "ordering by event_id — emitting the summed form keeps the oracle "
    "honest either way. One window + one agg, both keyed by event_type.",
    tags=("workload", "events", "window", "datetime"),
)
def events_interarrival_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events").select(
        "event_type", F.unix_micros("ts").alias("ts_us"), "event_id"
    )
    w = Window.partitionBy("event_type").orderBy("ts_us", "event_id")
    gaps = e.select(
        "event_type", (F.col("ts_us") - F.lag("ts_us").over(w)).alias("gap_us")
    )
    return gaps.groupBy("event_type").agg(
        F.count("gap_us").cast("long").alias("n_gaps"),
        F.min("gap_us").cast("long").alias("min_gap_us"),
        F.max("gap_us").cast("long").alias("max_gap_us"),
        F.sum("gap_us").cast("long").alias("total_gap_us"),
        F.floor(F.sum("gap_us") / F.count("gap_us")).cast("long").alias(
            "mean_gap_us_floor"
        ),
    )


@register(
    "events_peak_concurrency",
    oracle="""
    WITH e AS (
      SELECT user_id, epoch_us(ts) AS ts_us,
             ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY ts, event_id)
               AS rn
      FROM events
    ),
    sess AS (
      SELECT user_id, ts_us,
             CASE WHEN ts_us - LAG(ts_us) OVER (PARTITION BY user_id
                                                ORDER BY ts_us, rn)
                       > 43200000000
                  OR LAG(ts_us) OVER (PARTITION BY user_id
                                      ORDER BY ts_us, rn) IS NULL
                  THEN 1 ELSE 0 END AS brk
      FROM e
    ),
    grp AS (
      SELECT user_id, ts_us,
             SUM(brk) OVER (PARTITION BY user_id ORDER BY ts_us
                            ROWS UNBOUNDED PRECEDING) AS sid
      FROM sess
    ),
    spans AS (
      SELECT user_id, sid, MIN(ts_us) AS s, MAX(ts_us) AS t
      FROM grp GROUP BY user_id, sid
    ),
    pts AS (
      SELECT s AS at_us, 1 AS delta FROM spans
      UNION ALL
      SELECT t + 1 AS at_us, -1 AS delta FROM spans
    ),
    sweep AS (
      SELECT at_us,
             SUM(SUM(delta)) OVER (ORDER BY at_us
                                   ROWS UNBOUNDED PRECEDING) AS live
      FROM pts GROUP BY at_us
    )
    SELECT CAST((SELECT COUNT(*) FROM spans) AS BIGINT) AS n_sessions,
           CAST(MAX(live) AS BIGINT) AS peak_concurrent,
           CAST(MIN(live) AS BIGINT) AS min_running
    FROM sweep
    """,
    doc="Peak concurrent sessions via the SWEEP-LINE idiom (+1 at session "
    "start, -1 just after end, running sum, take the max — the interval-"
    "overlap counter that needs NO interval self-join: an O(n²) pair "
    "join is the naive form, the sweep is O(n log n) in one sort): "
    "12-hour-gap sessions per user (the events_sessionize islands), "
    "endpoint deltas merged per instant (the aggregate-then-window "
    "idiom), global running sum. The one global window runs over "
    "|session endpoints| rows — already aggregated, metadata-scale; at "
    "100 TB sweep per day-partition and carry the boundary offset, the "
    "standard segmented-scan trick (documented, not needed at this "
    "size). min_running pins the sweep's conservation: it must be >= 0.",
    tags=("workload", "events", "window", "sweep"),
)
def events_peak_concurrency(spark: SparkSession, sf_dir: str) -> DataFrame:
    gap_us = 43200000000
    e = load_table(spark, sf_dir, "events").select(
        "user_id", F.unix_micros("ts").alias("ts_us"), "event_id"
    )
    w = Window.partitionBy("user_id").orderBy("ts_us", "event_id")
    sess = e.withColumn(
        "brk",
        F.when(
            F.lag("ts_us").over(w).isNull()
            | (F.col("ts_us") - F.lag("ts_us").over(w) > gap_us),
            1,
        ).otherwise(0),
    )
    grp = sess.withColumn(
        "sid",
        F.sum("brk").over(
            Window.partitionBy("user_id")
            .orderBy("ts_us", "event_id")
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        ),
    )
    spans = grp.groupBy("user_id", "sid").agg(
        F.min("ts_us").alias("s"), F.max("ts_us").alias("t")
    )
    pts = spans.select(F.col("s").alias("at_us"), F.lit(1).alias("delta")).unionAll(
        spans.select((F.col("t") + 1).alias("at_us"), F.lit(-1).alias("delta"))
    )
    sweep = (
        pts.groupBy("at_us")
        .agg(F.sum("delta").alias("d"))
        .withColumn(
            "live",
            F.sum("d").over(
                Window.orderBy("at_us").rowsBetween(
                    Window.unboundedPreceding, Window.currentRow
                )
            ),
        )
    )
    n_sessions = spans.agg(F.count(F.lit(1)).alias("n_sessions"))
    return sweep.agg(
        F.max("live").cast("long").alias("peak_concurrent"),
        F.min("live").cast("long").alias("min_running"),
    ).crossJoin(n_sessions).select(
        F.col("n_sessions").cast("long").alias("n_sessions"),
        "peak_concurrent",
        "min_running",
    )


@register(
    "workload_yoy_growth",
    oracle="""
    WITH yearly AS (
      SELECT n.n_name AS nation,
             CAST(EXTRACT(YEAR FROM o.o_orderdate) AS INTEGER) AS yr,
             SUM(CAST(o.o_totalprice AS DECIMAL(18,2))) AS rev
      FROM orders o
      JOIN customer c ON c.c_custkey = o.o_custkey
      JOIN nation n ON n.n_nationkey = c.c_nationkey
      GROUP BY n.n_name, EXTRACT(YEAR FROM o.o_orderdate)
    )
    SELECT nation, yr,
           CAST(rev AS DOUBLE) AS revenue,
           -- divide as DOUBLE from exact decimal operands: decimal/decimal
           -- quotient ROUNDING differs between engines (5998-vs-5999 bp),
           -- IEEE division of identical inputs does not
           CAST(CASE WHEN LAG(rev) OVER w IS NULL
                      OR LAG(yr) OVER w <> yr - 1 THEN NULL
                ELSE FLOOR(CAST((rev - LAG(rev) OVER w) * 10000 AS DOUBLE)
                           / CAST(LAG(rev) OVER w AS DOUBLE))
                END AS BIGINT) AS yoy_growth_bp
    FROM yearly
    WINDOW w AS (PARTITION BY nation ORDER BY yr)
    """,
    doc="Year-over-year growth report (revenue per nation per year with "
    "the YoY delta in exact integer basis points — the board-deck query): "
    "broadcast dim chain into a (nation, year) agg, then LAG over the "
    "METADATA-SIZED yearly table; a missing prior year (gap) yields NULL "
    "growth rather than comparing across a hole (the LAG(yr) <> yr-1 "
    "guard — the subtle bug in naive YoY queries). Decimal revenue, "
    "floor-division bp on both engines.",
    tags=("workload", "window", "report", "datetime"),
)
def workload_yoy_growth(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    n = load_table(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    yearly = (
        o.join(F.broadcast(c.join(F.broadcast(n), c.c_nationkey == n.n_nationkey)),
               F.col("o_custkey") == F.col("c_custkey"))
        .groupBy(
            F.col("n_name").alias("nation"),
            F.year("o_orderdate").cast("int").alias("yr"),
        )
        .agg(F.sum(F.col("o_totalprice").cast("decimal(18,2)")).alias("rev"))
    )
    w = Window.partitionBy("nation").orderBy("yr")
    prev_rev, prev_yr = F.lag("rev").over(w), F.lag("yr").over(w)
    return yearly.select(
        "nation",
        "yr",
        F.col("rev").cast("double").alias("revenue"),
        F.when(
            prev_rev.isNull() | (prev_yr != F.col("yr") - 1), F.lit(None)
        )
        .otherwise(
            F.floor(
                ((F.col("rev") - prev_rev) * 10000).cast("double")
                / prev_rev.cast("double")
            )
        )
        .cast("long")
        .alias("yoy_growth_bp"),
    )


@register(
    "workload_rfm_segments",
    oracle="""
    WITH per_cust AS (
      SELECT c.c_mktsegment AS seg, o.o_custkey AS cust,
             MAX(o.o_orderdate) AS last_order,
             COUNT(*) AS freq,
             SUM(CAST(o.o_totalprice AS DECIMAL(18,2))) AS monetary
      FROM orders o JOIN customer c ON c.c_custkey = o.o_custkey
      GROUP BY c.c_mktsegment, o.o_custkey
    ),
    scored AS (
      SELECT seg, cust,
             NTILE(5) OVER (PARTITION BY seg
                            ORDER BY last_order DESC, cust) AS r_score,
             NTILE(5) OVER (PARTITION BY seg
                            ORDER BY freq DESC, cust) AS f_score,
             NTILE(5) OVER (PARTITION BY seg
                            ORDER BY monetary DESC, cust) AS m_score
      FROM per_cust
    )
    SELECT seg,
           CAST(r_score AS INTEGER) AS r_score,
           CAST(f_score AS INTEGER) AS f_score,
           CAST(m_score AS INTEGER) AS m_score,
           CAST(COUNT(*) AS BIGINT) AS n_customers
    FROM scored
    GROUP BY seg, r_score, f_score, m_score
    """,
    doc="RFM customer segmentation (recency/frequency/monetary quintiles "
    "— the marketing-analytics standard): per-customer last order date, "
    "order count, and decimal spend, then NTILE(5) per metric "
    "PARTITIONED BY market segment — the scale-safe form (each segment's "
    "quintiles run on its own executor partition; the GLOBAL-ntile form "
    "is this repo's documented weak-list shape, and partitioning by the "
    "reporting dimension is exactly how production avoids it). Every "
    "ordering carries the (metric, custkey) tie-break so quintile "
    "boundaries are deterministic; the 5x5x5 cell counts are the "
    "campaign-planning output.",
    tags=("workload", "window", "report"),
)
def workload_rfm_segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders").select(
        "o_custkey", "o_orderdate", "o_totalprice"
    )
    c = load_table(spark, sf_dir, "customer").select("c_custkey", "c_mktsegment")
    per_cust = (
        o.join(F.broadcast(c), F.col("c_custkey") == F.col("o_custkey"))
        .groupBy(F.col("c_mktsegment").alias("seg"), F.col("o_custkey").alias("cust"))
        .agg(
            F.max("o_orderdate").alias("last_order"),
            F.count(F.lit(1)).alias("freq"),
            F.sum(F.col("o_totalprice").cast("decimal(18,2)")).alias("monetary"),
        )
    )
    r_w = Window.partitionBy("seg").orderBy(F.col("last_order").desc(), "cust")
    f_w = Window.partitionBy("seg").orderBy(F.col("freq").desc(), "cust")
    m_w = Window.partitionBy("seg").orderBy(F.col("monetary").desc(), "cust")
    scored = per_cust.select(
        "seg",
        F.ntile(5).over(r_w).cast("int").alias("r_score"),
        F.ntile(5).over(f_w).cast("int").alias("f_score"),
        F.ntile(5).over(m_w).cast("int").alias("m_score"),
    )
    return scored.groupBy("seg", "r_score", "f_score", "m_score").agg(
        F.count(F.lit(1)).cast("long").alias("n_customers")
    )


@register(
    "workload_longest_streak",
    oracle="""
    WITH days AS (
      SELECT DISTINCT o_custkey AS cust, CAST(o_orderdate AS DATE) AS d
      FROM orders
    ),
    isl AS (
      SELECT cust, d,
             d - CAST(ROW_NUMBER() OVER (PARTITION BY cust ORDER BY d)
                      AS INTEGER) AS grp
      FROM days
    ),
    runs AS (
      SELECT cust, grp, COUNT(*) AS len FROM isl GROUP BY cust, grp
    ),
    best AS (SELECT cust, MAX(len) AS streak FROM runs GROUP BY cust)
    SELECT CAST(streak AS BIGINT) AS streak_days,
           CAST(COUNT(*) AS BIGINT) AS n_customers
    FROM best GROUP BY streak
    """,
    doc="Longest consecutive-day streak per customer, histogrammed (the "
    "'longest run' gaps-and-islands classic — login streaks, daily-active "
    "streaks, consecutive-order days): distinct (customer, day), the "
    "date-minus-row_number island key (consecutive days share a constant "
    "difference — the canonical O(n log n) streak algebra, no self-join, "
    "no recursion), run lengths per island, per-customer max, then the "
    "streak-length histogram. Two customer-keyed shuffles + one "
    "histogram-sized agg; all integer date arithmetic.",
    tags=("workload", "window", "islands", "datetime"),
)
def workload_longest_streak(spark: SparkSession, sf_dir: str) -> DataFrame:
    days = (
        load_table(spark, sf_dir, "orders")
        .select(F.col("o_custkey").alias("cust"), F.to_date("o_orderdate").alias("d"))
        .distinct()
    )
    w = Window.partitionBy("cust").orderBy("d")
    isl = days.withColumn(
        "grp", F.date_sub(F.col("d"), F.row_number().over(w))
    )
    runs = isl.groupBy("cust", "grp").agg(F.count(F.lit(1)).alias("len"))
    best = runs.groupBy("cust").agg(F.max("len").alias("streak"))
    return best.groupBy("streak").agg(
        F.count(F.lit(1)).cast("long").alias("n_customers")
    ).select(F.col("streak").cast("long").alias("streak_days"), "n_customers")


@register(
    "events_top_paths",
    oracle="""
    WITH seq AS (
      SELECT user_id, ts, event_id, event_type,
             ROW_NUMBER() OVER (PARTITION BY user_id
                                ORDER BY ts, event_id) AS rn
      FROM events
    ),
    paths AS (
      SELECT user_id,
             string_agg(event_type, '>' ORDER BY rn) AS path
      FROM seq WHERE rn <= 5
      GROUP BY user_id
    )
    SELECT path,
           CAST(COUNT(*) AS BIGINT) AS n_users
    FROM paths
    GROUP BY path
    ORDER BY n_users DESC, path
    LIMIT 15
    """,
    doc="User-path mining (top first-5-event journeys — the path analysis "
    "behind funnel design and onboarding audits): each user's first five "
    "events in deterministic (ts, event_id) order joined into a "
    "'view>click>...' path string, then the 15 most common journeys. "
    "Spark side builds the path with sort_array over (rn, type) structs "
    "+ transform + array_join — pure codegen, no ordered string_agg "
    "needed (collect_list is encounter-ordered, the classic parallel "
    "trap; the sort_array form is the deterministic idiom). One user_id "
    "window/agg + a TakeOrdered top-15.",
    tags=("workload", "events", "sequence", "window"),
)
def events_top_paths(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events").select(
        "user_id", F.unix_micros("ts").alias("ts_us"), "event_id", "event_type"
    )
    w = Window.partitionBy("user_id").orderBy("ts_us", "event_id")
    seq = e.withColumn("rn", F.row_number().over(w)).filter(F.col("rn") <= 5)
    paths = (
        seq.groupBy("user_id")
        .agg(
            F.sort_array(
                F.collect_list(F.struct(F.col("rn"), F.col("event_type").alias("t")))
            ).alias("steps")
        )
        .select(
            F.array_join(
                F.transform(F.col("steps"), lambda s: s.getField("t")), ">"
            ).alias("path")
        )
    )
    return (
        paths.groupBy("path")
        .agg(F.count(F.lit(1)).cast("long").alias("n_users"))
        .orderBy(F.col("n_users").desc(), "path")
        .limit(15)
    )


@register(
    "events_churn_resurrection",
    oracle="""
    WITH bounds AS (SELECT MAX(CAST(ts AS DATE)) AS corpus_end FROM events),
    per_user AS (
      SELECT user_id,
             MIN(CAST(ts AS DATE)) AS first_day,
             MAX(CAST(ts AS DATE)) AS last_day,
             COUNT(DISTINCT CAST(ts AS DATE)) AS active_days
      FROM events GROUP BY user_id
    ),
    lagged AS (
      SELECT user_id,
             d - LAG(d) OVER (PARTITION BY user_id ORDER BY d) AS gap
      FROM (SELECT DISTINCT user_id, CAST(ts AS DATE) AS d FROM events) t
    ),
    gaps AS (
      SELECT user_id, MAX(gap) AS max_gap_days FROM lagged GROUP BY user_id
    )
    SELECT CAST(COUNT(*) AS BIGINT) AS n_users,
           CAST(SUM(CASE WHEN b.corpus_end - p.last_day > 7
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_churned,
           CAST(SUM(CASE WHEN g.max_gap_days > 7 THEN 1 ELSE 0 END)
             AS BIGINT) AS n_resurrected,
           CAST(SUM(CASE WHEN b.corpus_end - p.last_day > 7
                          AND g.max_gap_days > 7
                         THEN 1 ELSE 0 END) AS BIGINT)
             AS n_churned_after_resurrection,
           CAST(SUM(p.active_days) AS BIGINT) AS total_active_days
    FROM per_user p JOIN gaps g USING (user_id), bounds b
    """,
    doc="Churn + resurrection accounting (the lifecycle states growth "
    "teams segment on: churned = silent for > 7 days at corpus end; "
    "resurrected = came back after a > 7-day gap at least once): "
    "per-user first/last/active-day aggregates + the max inter-day gap "
    "from a LAG over DISTINCT activity days (the distinct collapse keeps "
    "the window input at |user-days|, not |events|), then one global "
    "summary — every comparison in integer days against the corpus-end "
    "anchor (data-derived, so the query is reproducible on any "
    "snapshot). Two user-keyed shuffles + a 1-row broadcast.",
    tags=("workload", "events", "retention", "window"),
)
def events_churn_resurrection(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events").select(
        "user_id", F.to_date("ts").alias("d")
    )
    bounds = e.agg(F.max("d").alias("corpus_end"))
    per_user = e.groupBy("user_id").agg(
        F.min("d").alias("first_day"),
        F.max("d").alias("last_day"),
        F.countDistinct("d").alias("active_days"),
    )
    ud = e.distinct()
    w = Window.partitionBy("user_id").orderBy("d")
    gaps = (
        ud.withColumn("gap", F.datediff(F.col("d"), F.lag("d").over(w)))
        .groupBy("user_id")
        .agg(F.max("gap").alias("max_gap_days"))
    )
    j = per_user.join(gaps, "user_id").crossJoin(F.broadcast(bounds))
    churned = F.datediff(F.col("corpus_end"), F.col("last_day")) > 7
    resurrected = F.col("max_gap_days") > 7
    return j.agg(
        F.count(F.lit(1)).cast("long").alias("n_users"),
        F.sum(churned.cast("int")).cast("long").alias("n_churned"),
        F.sum(resurrected.cast("int")).cast("long").alias("n_resurrected"),
        F.sum((churned & resurrected).cast("int"))
        .cast("long")
        .alias("n_churned_after_resurrection"),
        F.sum("active_days").cast("long").alias("total_active_days"),
    )


@register(
    "workload_scd2_asof_query",
    oracle="""
    WITH ordered AS (
      SELECT o_custkey, o_orderstatus, o_orderdate, o_orderkey,
             LAG(o_orderstatus) OVER w AS prev_status
      FROM orders
      WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
    ),
    flagged AS (
      SELECT *, CASE WHEN prev_status IS NULL
                       OR prev_status <> o_orderstatus THEN 1 ELSE 0 END AS chg
      FROM ordered
    ),
    grouped AS (
      SELECT *, SUM(chg) OVER (PARTITION BY o_custkey
                               ORDER BY o_orderdate, o_orderkey
                               ROWS UNBOUNDED PRECEDING) AS grp
      FROM flagged
    ),
    islands AS (
      SELECT o_custkey, o_orderstatus AS status, grp,
             MIN(o_orderdate) AS valid_from
      FROM grouped GROUP BY o_custkey, o_orderstatus, grp
    ),
    dim AS (
      SELECT o_custkey, status, valid_from,
             LEAD(valid_from) OVER (PARTITION BY o_custkey
                                    ORDER BY valid_from, grp) AS valid_to
      FROM islands
    ),
    asof_dates AS (
      SELECT CAST(y.y AS INTEGER) AS yr,
             CAST(CAST(y.y AS VARCHAR) || '-07-01' AS TIMESTAMP) AS d
      FROM UNNEST(range(1996, 2001)) AS y(y)
    )
    SELECT a.yr, dm.status,
           CAST(COUNT(*) AS BIGINT) AS n_customers
    FROM asof_dates a
    JOIN dim dm
      ON dm.valid_from <= a.d
     AND (dm.valid_to IS NULL OR dm.valid_to > a.d)
    GROUP BY a.yr, dm.status
    """,
    doc="Point-in-time DIMENSION query over the SCD2 table (the "
    "consumption half of workload_scd2_dimension: 'what status did each "
    "customer carry on July 1 of each year?' — the as-of dimension "
    "lookup every historically-correct report performs): rebuild the "
    "versioned dim (same lag/island/lead algebra), then probe it with a "
    "5-row broadcast as-of roster on the half-open validity interval "
    "[valid_from, valid_to) — one version matches per (customer, date) "
    "BY CONSTRUCTION (the tiling invariant the SCD2 tests pin), so the "
    "join cannot fan out. Status census per as-of date is the output; "
    "at scale the dim is bucketed by the business key and the probe is "
    "a broadcast — zero fact-side shuffle.",
    tags=("workload", "scd2", "asof", "window"),
)
def workload_scd2_asof_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders").select(
        "o_custkey", "o_orderstatus", "o_orderdate", "o_orderkey"
    )
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    flagged = o.withColumn(
        "chg",
        F.when(
            F.lag("o_orderstatus").over(w).isNull()
            | (F.lag("o_orderstatus").over(w) != F.col("o_orderstatus")),
            1,
        ).otherwise(0),
    )
    grouped = flagged.withColumn(
        "grp",
        F.sum("chg").over(
            w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        ),
    )
    islands = grouped.groupBy(
        "o_custkey", F.col("o_orderstatus").alias("status"), "grp"
    ).agg(F.min("o_orderdate").alias("valid_from"))
    dim = islands.withColumn(
        "valid_to",
        F.lead("valid_from").over(
            Window.partitionBy("o_custkey").orderBy("valid_from", "grp")
        ),
    )
    asof = spark.range(1996, 2001).select(
        F.col("id").cast("int").alias("yr"),
        F.to_timestamp(F.concat(F.col("id").cast("string"), F.lit("-07-01"))).alias(
            "d"
        ),
    )
    probed = F.broadcast(asof).join(
        dim,
        (F.col("valid_from") <= F.col("d"))
        & (F.col("valid_to").isNull() | (F.col("valid_to") > F.col("d"))),
    )
    return probed.groupBy("yr", "status").agg(
        F.count(F.lit(1)).cast("long").alias("n_customers")
    )
