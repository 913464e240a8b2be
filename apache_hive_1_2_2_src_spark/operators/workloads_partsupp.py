"""Composite analytical workloads, part 3: the four TPC-H shapes that need a
``partsupp`` table (Q2 min-cost supplier, Q11 important stock, Q16
parts/supplier relationship, Q20 potential promotion).

The testdata ships no partsupp parquet, so these queries run over a
**derived partsupp**: each part crossed with 4 suppliers chosen by a pure
integer formula, with availqty/supplycost likewise pure integer hashes of
the keys. The identical formula is evaluated in Spark (``derived_partsupp``)
and in every DuckDB oracle (``PARTSUPP_SQL`` CTE), so the oracle check is a
real four-table-join check, not a fixture comparison. All partsupp money
flows as integer *cents* (bigint) and only becomes DOUBLE via a single
``CAST(.. AS DOUBLE)/100`` at the output edge — parallel integer sums are
exact in both engines, so no decimal-rounding divergence is possible.

Hive 1.2.2 ran these plan families through SemanticAnalyzer join trees
(reference layout anchors ``ql/src/test/queries/clientpositive/`` — the
q-test corpus exercises exactly these correlated-subquery and
global-threshold HAVING shapes). The Spark-first translations:

- Q2's correlated ``ps_supplycost = (SELECT MIN(..) WHERE ps_partkey =
  p_partkey)`` becomes a per-partkey window MIN + filter — one shuffle on
  partkey instead of a re-evaluated subquery per row.
- Q11's ``HAVING SUM(..) > (SELECT SUM(..) * fraction ..)`` becomes a
  1-row global-total broadcast joined against the per-part aggregate, with
  the fraction applied **multiplicatively on integer cents**
  (``part_value * 2000 > total_value``) so neither engine ever divides.
- Q16's ``NOT IN (SELECT s_suppkey ..)`` becomes a broadcast left_anti.
- Q20's correlated half-of-shipped-quantity threshold becomes an equi-join
  against a pre-aggregated (partkey, suppkey) quantity sum — co-partitioned
  at 100 TB, never a per-row subquery.

Scale notes (100 TB): partsupp is |part|x4 — it scales with the part
dimension, not the fact table, so its joins to supplier/nation/region ride
broadcasts of the small sides while lineitem joins shuffle-hash on the
(partkey, suppkey) keys they are already aggregated by. The derived table is
built lazily per query from the part scan — no materialization step to skew.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from apache_hive_1_2_2_src_spark.registry import register
from apache_hive_1_2_2_src_spark.tables import load_table

# Derived-partsupp formula, shared verbatim between both engines:
#   ps_suppkey    = (p_partkey + k * (n_supp DIV 4)) % n_supp,  k in 0..3
#   ps_availqty   = (p_partkey*37 + ps_suppkey*13) % 9999 + 1
#   ps_cost_cents = (p_partkey*7919 + ps_suppkey*104729) % 100000
# s_suppkey is contiguous 0..n-1 in every testdata sf (verified), and the
# four k-offsets are distinct mod n for any n >= 4, so each part gets 4
# distinct suppliers and supplycost spans $0.00-$999.99.
PARTSUPP_SQL = """
    nsup AS (SELECT COUNT(*) AS n FROM supplier),
    partsupp AS (
      SELECT ps_partkey, ps_suppkey,
             (ps_partkey*37 + ps_suppkey*13) % 9999 + 1 AS ps_availqty,
             (ps_partkey*7919 + ps_suppkey*104729) % 100000 AS ps_cost_cents
      FROM (
        SELECT p_partkey AS ps_partkey,
               (p_partkey + k * (n // 4)) % n AS ps_suppkey
        FROM part, nsup, (SELECT UNNEST([0,1,2,3]) AS k)
      )
    )
"""


def derived_partsupp(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(ps_partkey, ps_suppkey, ps_availqty, ps_cost_cents) — the Spark twin
    of PARTSUPP_SQL. Pure JVM expressions over the part scan (explode of a
    4-element literal array; the supplier count rides a 1-row broadcast), so
    the derivation adds no Python and no shuffle."""
    p = load_table(spark, sf_dir, "part").select("p_partkey")
    nsup = load_table(spark, sf_dir, "supplier").agg(F.count(F.lit(1)).alias("n"))
    ps = (
        p.crossJoin(F.broadcast(nsup))
        .select(
            F.col("p_partkey").alias("ps_partkey"),
            F.explode(F.array(*[F.lit(k) for k in range(4)])).alias("k"),
            "n",
        )
        .select(
            "ps_partkey",
            ((F.col("ps_partkey") + F.col("k") * F.expr("n DIV 4")) % F.col("n"))
            .cast("long")
            .alias("ps_suppkey"),
        )
        .select(
            "ps_partkey",
            "ps_suppkey",
            ((F.col("ps_partkey") * 37 + F.col("ps_suppkey") * 13) % 9999 + 1)
            .cast("long")
            .alias("ps_availqty"),
            ((F.col("ps_partkey") * 7919 + F.col("ps_suppkey") * 104729) % 100000)
            .cast("long")
            .alias("ps_cost_cents"),
        )
    )
    return ps


@register(
    "workload_min_cost_supplier",
    oracle=f"""
    WITH {PARTSUPP_SQL},
    europe_offer AS (
      SELECT ps_partkey, ps_suppkey, ps_cost_cents,
             s_acctbal, s_name, n_name
      FROM partsupp
      JOIN supplier ON s_suppkey = ps_suppkey
      JOIN nation   ON n_nationkey = s_nationkey
      JOIN region   ON r_regionkey = n_regionkey
      WHERE r_name = 'EUROPE'
    )
    SELECT s_acctbal, s_name, n_name, p_partkey, p_name,
           CAST(ps_cost_cents AS DOUBLE) / 100 AS ps_supplycost
    FROM europe_offer
    JOIN part ON p_partkey = ps_partkey
    WHERE p_size <= 15 AND p_type = 'LARGE'
      AND ps_cost_cents = (
        SELECT MIN(e2.ps_cost_cents) FROM europe_offer e2
        WHERE e2.ps_partkey = p_partkey
      )
    ORDER BY s_acctbal DESC, n_name, s_name, p_partkey
    LIMIT 100
    """,
    doc="TPC-H Q2 shape (minimum-cost supplier): the correlated-MIN scalar "
    "subquery, the canonical 'for each part, the best offer' pattern. "
    "Hive 1.2 rewrote it to a join against a grouped MIN "
    "(SemanticAnalyzer); the Spark-first form is a per-partkey window MIN "
    "over the region-filtered offers followed by cost == min — one shuffle "
    "on ps_partkey, then broadcast joins to part/nation/region. LIMIT 100 "
    "is TakeOrderedAndProject with a fully-deterministic 4-key tiebreak. "
    "supplycost stays integer cents until the output edge.",
    tags=("workload", "join", "subquery", "partsupp"),
)
def workload_min_cost_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    ps = derived_partsupp(spark, sf_dir)
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation")
    r = load_table(spark, sf_dir, "region").filter(F.col("r_name") == "EUROPE")
    p = load_table(spark, sf_dir, "part").filter(
        (F.col("p_size") <= 15) & (F.col("p_type") == "LARGE")
    )
    offers = (
        ps.join(s, F.col("s_suppkey") == F.col("ps_suppkey"))
        .join(F.broadcast(n), F.col("n_nationkey") == F.col("s_nationkey"))
        .join(F.broadcast(r), F.col("r_regionkey") == F.col("n_regionkey"))
        .select("ps_partkey", "ps_cost_cents", "s_acctbal", "s_name", "n_name")
    )
    w = Window.partitionBy("ps_partkey")
    best = offers.withColumn("min_cents", F.min("ps_cost_cents").over(w)).filter(
        F.col("ps_cost_cents") == F.col("min_cents")
    )
    return (
        best.join(p, F.col("p_partkey") == F.col("ps_partkey"))
        .select(
            "s_acctbal",
            "s_name",
            "n_name",
            "p_partkey",
            "p_name",
            (F.col("ps_cost_cents").cast("double") / 100).alias("ps_supplycost"),
        )
        .orderBy(F.col("s_acctbal").desc(), "n_name", "s_name", "p_partkey")
        .limit(100)
    )


@register(
    "workload_important_stock",
    oracle=f"""
    WITH {PARTSUPP_SQL},
    regional AS (
      SELECT ps_partkey, ps_cost_cents * ps_availqty AS value_cents
      FROM partsupp
      JOIN supplier ON s_suppkey = ps_suppkey
      JOIN nation   ON n_nationkey = s_nationkey
      JOIN region   ON r_regionkey = n_regionkey
      WHERE r_name = 'EUROPE'
    ),
    per_part AS (
      SELECT ps_partkey, CAST(SUM(value_cents) AS BIGINT) AS part_cents
      FROM regional GROUP BY ps_partkey
    ),
    total AS (SELECT CAST(SUM(part_cents) AS BIGINT) AS total_cents FROM per_part)
    SELECT ps_partkey, CAST(part_cents AS DOUBLE) / 100 AS stock_value
    FROM per_part, total
    WHERE part_cents * 2000 > total_cents
    """,
    doc="TPC-H Q11 shape (important stock identification): GROUP BY with a "
    "HAVING threshold computed from a GLOBAL aggregate over the same input "
    "— the nested-aggregate pattern Hive 1.2 planned as two MR jobs with a "
    "1-row cross join. Spark-first: one per-part partial/final agg plus a "
    "1-row global total broadcast-crossed in; the 1/2000 fraction is "
    "applied multiplicatively on exact integer cents (part*2000 > total) "
    "so neither engine divides or rounds. At 100 TB the only full shuffle "
    "is the per-part groupBy; the global total re-aggregates the per-part "
    "SUMS (not the joined frame), so the join subtree runs exactly once.",
    tags=("workload", "agg", "having", "partsupp"),
)
def workload_important_stock(spark: SparkSession, sf_dir: str) -> DataFrame:
    ps = derived_partsupp(spark, sf_dir)
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation")
    r = load_table(spark, sf_dir, "region").filter(F.col("r_name") == "EUROPE")
    regional = (
        ps.join(s, F.col("s_suppkey") == F.col("ps_suppkey"))
        .join(F.broadcast(n), F.col("n_nationkey") == F.col("s_nationkey"))
        .join(F.broadcast(r), F.col("r_regionkey") == F.col("n_regionkey"))
        .select(
            "ps_partkey",
            (F.col("ps_cost_cents") * F.col("ps_availqty")).alias("value_cents"),
        )
    )
    per_part = regional.groupBy("ps_partkey").agg(
        F.sum("value_cents").alias("part_cents")
    )
    # The global total re-aggregates the per-part sums. Spark executes the
    # shared subtree twice (no cross-branch exchange reuse without a
    # materialization — measured: rollup((ps_partkey),()) does NOT trigger
    # ReusedExchange here and doubles the shuffled rows instead), which is
    # exactly TPC-H Q11's own shape: the spec's inner subquery re-scans
    # partsupp, and partsupp is dimension-scale (|part|x4), so the second
    # pass is cheap at any SF. On a real cluster, persist per_part if the
    # part dimension is fact-sized.
    total = per_part.agg(F.sum("part_cents").alias("total_cents"))
    return (
        per_part.crossJoin(F.broadcast(total))
        .filter(F.col("part_cents") * 2000 > F.col("total_cents"))
        .select(
            "ps_partkey",
            (F.col("part_cents").cast("double") / 100).alias("stock_value"),
        )
    )


@register(
    "workload_parts_supplier_cnt",
    oracle=f"""
    WITH {PARTSUPP_SQL}
    SELECT p_brand, p_type, p_size,
           COUNT(DISTINCT ps_suppkey) AS supplier_cnt
    FROM partsupp
    JOIN part ON p_partkey = ps_partkey
    WHERE p_brand <> 'Brand#9'
      AND p_type <> 'MEDIUM'
      AND p_size IN (1, 5, 9, 13, 17, 21, 25, 29, 33, 37, 41, 45, 49)
      AND ps_suppkey NOT IN (
        SELECT s_suppkey FROM supplier WHERE s_acctbal < 0
      )
    GROUP BY p_brand, p_type, p_size
    """,
    doc="TPC-H Q16 shape (parts/supplier relationship): COUNT(DISTINCT) per "
    "3-column group with a NOT IN supplier exclusion. The exclusion list "
    "('complaints' suppliers in TPC-H; s_acctbal < 0 in this schema — the "
    "original's s_comment LIKE has no column here) is tiny, so the NOT IN "
    "becomes a broadcast left_anti — no shuffle for the exclusion, one "
    "shuffle for the distinct-count agg. Hive 1.2 planned the same NOT IN "
    "as a MapJoin-ed anti pattern after SemanticAnalyzer rewrite.",
    tags=("workload", "agg", "anti", "partsupp"),
)
def workload_parts_supplier_cnt(spark: SparkSession, sf_dir: str) -> DataFrame:
    ps = derived_partsupp(spark, sf_dir)
    p = load_table(spark, sf_dir, "part").filter(
        (F.col("p_brand") != "Brand#9")
        & (F.col("p_type") != "MEDIUM")
        & F.col("p_size").isin([1, 5, 9, 13, 17, 21, 25, 29, 33, 37, 41, 45, 49])
    )
    complainers = (
        load_table(spark, sf_dir, "supplier")
        .filter(F.col("s_acctbal") < 0)
        .select("s_suppkey")
    )
    return (
        ps.join(
            F.broadcast(complainers),
            F.col("ps_suppkey") == F.col("s_suppkey"),
            "left_anti",
        )
        .join(p, F.col("p_partkey") == F.col("ps_partkey"))
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.countDistinct("ps_suppkey").alias("supplier_cnt"))
    )


@register(
    "workload_promotion_suppliers",
    oracle=f"""
    WITH {PARTSUPP_SQL},
    shipped AS (
      SELECT l_partkey, l_suppkey,
             CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS qty_1996
      FROM lineitem
      WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
        AND l_shipdate <  TIMESTAMP '1997-01-01 00:00:00'
      GROUP BY l_partkey, l_suppkey
    )
    SELECT DISTINCT s_name, n_name
    FROM partsupp
    JOIN part ON p_partkey = ps_partkey AND p_name LIKE 'red%'
    JOIN shipped ON l_partkey = ps_partkey AND l_suppkey = ps_suppkey
    JOIN supplier ON s_suppkey = ps_suppkey
    JOIN nation   ON n_nationkey = s_nationkey
    JOIN region   ON r_regionkey = n_regionkey
    WHERE r_name = 'ASIA'
      AND ps_availqty * 2 > qty_1996
    """,
    doc="TPC-H Q20 shape (potential part promotion): suppliers in one "
    "region whose stock of 'red' parts exceeds half the quantity they "
    "shipped in 1996 — the correlated half-of-shipped-quantity scalar "
    "subquery. Spark-first: pre-aggregate lineitem to (partkey, suppkey) "
    "quantity sums (exact BIGINT — quantities are integer-valued) and "
    "equi-join partsupp against it; the x0.5 threshold is applied "
    "multiplicatively (availqty*2 > qty) so no engine divides. Pairs with "
    "no 1996 shipments drop in the join, matching the NULL-comparison "
    "semantics of the original correlated form. At 100 TB the lineitem "
    "pre-agg and the partsupp join share the (partkey, suppkey) shuffle "
    "key; part/supplier/nation/region ride broadcasts.",
    tags=("workload", "join", "subquery", "partsupp"),
)
def workload_promotion_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    ps = derived_partsupp(spark, sf_dir)
    li = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part").filter(F.col("p_name").like("red%"))
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation")
    r = load_table(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    shipped = (
        li.filter(
            (F.col("l_shipdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1997-01-01 00:00:00").cast("timestamp"))
        )
        .groupBy("l_partkey", "l_suppkey")
        .agg(F.sum(F.col("l_quantity").cast("long")).alias("qty_1996"))
    )
    return (
        ps.join(F.broadcast(p), F.col("p_partkey") == F.col("ps_partkey"))
        .join(
            shipped,
            (F.col("l_partkey") == F.col("ps_partkey"))
            & (F.col("l_suppkey") == F.col("ps_suppkey")),
        )
        .filter(F.col("ps_availqty") * 2 > F.col("qty_1996"))
        .join(s, F.col("s_suppkey") == F.col("ps_suppkey"))
        .join(F.broadcast(n), F.col("n_nationkey") == F.col("s_nationkey"))
        .join(F.broadcast(r), F.col("r_regionkey") == F.col("n_regionkey"))
        .select("s_name", "n_name")
        .distinct()
    )


@register(
    "workload_min_cost_supplier_sql",
    oracle=f"""
    WITH {PARTSUPP_SQL},
    europe_offer AS (
      SELECT ps_partkey, ps_suppkey, ps_cost_cents,
             s_acctbal, s_name, n_name
      FROM partsupp
      JOIN supplier ON s_suppkey = ps_suppkey
      JOIN nation   ON n_nationkey = s_nationkey
      JOIN region   ON r_regionkey = n_regionkey
      WHERE r_name = 'EUROPE'
    )
    SELECT s_acctbal, s_name, n_name, p_partkey, p_name,
           CAST(ps_cost_cents AS DOUBLE) / 100 AS ps_supplycost
    FROM europe_offer
    JOIN part ON p_partkey = ps_partkey
    WHERE p_size <= 15 AND p_type = 'LARGE'
      AND ps_cost_cents = (
        SELECT MIN(e2.ps_cost_cents) FROM europe_offer e2
        WHERE e2.ps_partkey = p_partkey
      )
    ORDER BY s_acctbal DESC, n_name, s_name, p_partkey
    LIMIT 100
    """,
    doc="TPC-H Q2, LITERAL SQL-text form (SURVEY §3 entry-point parity — "
    "the HiveQL a reference user actually types, correlated scalar "
    "subquery included): the same statement text the DuckDB oracle runs "
    "is executed via spark.sql over temp views, with the derived partsupp "
    "registered as a view so the correlated `ps_supplycost = (SELECT "
    "MIN(..) WHERE ps_partkey = p_partkey)` is planned by Catalyst's own "
    "scalar-subquery decorrelation (RewriteCorrelatedScalarSubquery -> "
    "an aggregate + join, the same shape the DSL twin "
    "workload_min_cost_supplier builds by hand with a window). Same "
    "result set as the DSL form — both graded.",
    tags=("workload", "join", "subquery", "partsupp", "sql"),
)
def workload_min_cost_supplier_sql(spark: SparkSession, sf_dir: str) -> DataFrame:
    derived_partsupp(spark, sf_dir).createOrReplaceTempView("partsupp_q2sql")
    for t in ("part", "supplier", "nation", "region"):
        load_table(spark, sf_dir, t).createOrReplaceTempView(f"{t}_q2sql")
    return spark.sql(
        """
        WITH europe_offer AS (
          SELECT ps_partkey, ps_suppkey, ps_cost_cents,
                 s_acctbal, s_name, n_name
          FROM partsupp_q2sql
          JOIN supplier_q2sql ON s_suppkey = ps_suppkey
          JOIN nation_q2sql   ON n_nationkey = s_nationkey
          JOIN region_q2sql   ON r_regionkey = n_regionkey
          WHERE r_name = 'EUROPE'
        )
        SELECT s_acctbal, s_name, n_name, p_partkey, p_name,
               CAST(ps_cost_cents AS DOUBLE) / 100 AS ps_supplycost
        FROM europe_offer
        JOIN part_q2sql ON p_partkey = ps_partkey
        WHERE p_size <= 15 AND p_type = 'LARGE'
          AND ps_cost_cents = (
            SELECT MIN(e2.ps_cost_cents) FROM europe_offer e2
            WHERE e2.ps_partkey = p_partkey
          )
        ORDER BY s_acctbal DESC, n_name, s_name, p_partkey
        LIMIT 100
        """
    )
