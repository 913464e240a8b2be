"""Core relational operators: scan, filter, project, sort, limit, distinct,
set operations, sampling (SURVEY.md §2.1, §2.6, §2.7).

Hive parity targets:
- TableScan/Filter/Select: ``ql/exec/TableScanOperator.java``,
  ``FilterOperator.java``, ``SelectOperator.java`` — pure DataFrame ops;
  Catalyst pushes the filter and the projection into the parquet scan
  (PushedFilters / ReadSchema in .explain), which Hive 1.2 only had for ORC
  SARGs (``ql/io/sarg/SearchArgument.java``).
- ORDER BY: ``SemanticAnalyzer.genOrderByPlan`` forced a single reducer in
  Hive; Spark's range-partitioned global sort scales to any cluster width.
- ORDER BY + LIMIT: Hive's top-k hash (``ql/exec/TopNHash.java``) ≡ Spark's
  TakeOrderedAndProject — no full sort is executed.
- UNION ALL / UNION: ``ql/exec/UnionOperator.java``; Hive 1.2 rewrites
  UNION DISTINCT to UNION ALL + group-by-all-cols
  (``SemanticAnalyzer.genUnionPlan``) — Spark `union().distinct()`.
- SELECT DISTINCT: compiled to group-by in Hive; `df.distinct()` here.
- TABLESAMPLE: ``ql/parse/SplitSample`` / ``SemanticAnalyzer
  .genSamplePredicate``; deterministic bucket form expressed as a
  hash-mod filter (pmod(hash(col), y) == x-1), which is exactly Hive's
  bucket-sample semantics without requiring a bucketed layout.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from apache_hive_1_2_2_src_spark.operators.helpers import (
    davg,
    dec,
    dsum,
    dsum_exact,
    sql_davg,
    sql_dsum,
)
from apache_hive_1_2_2_src_spark.registry import register
from apache_hive_1_2_2_src_spark.tmputil import scratch_dir
from apache_hive_1_2_2_src_spark.tables import load_table

# --------------------------------------------------------------------------
# Flagship: TPC-H Q1-style pricing summary.
# Exercises scan → pushed filter → project → partial/final hash agg → sort
# in one plan. At 100 TB this is a single shuffle of ~|groups| rows per
# partition thanks to map-side partial aggregation (Hive needed
# hive.map.aggr for the same; GroupByOperator.java).
# --------------------------------------------------------------------------


@register(
    "q1_pricing_summary",
    oracle="""
    SELECT l_returnflag, l_linestatus,
           {sum_qty}, {sum_base_price}, {sum_disc_price}, {sum_charge},
           {avg_qty}, {avg_price}, {avg_disc},
           COUNT(*) AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
    GROUP BY l_returnflag, l_linestatus
    """.format(
        sum_qty=sql_dsum("l_quantity", "sum_qty"),
        sum_base_price=sql_dsum("l_extendedprice", "sum_base_price"),
        sum_disc_price=(
            "CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * "
            "(1 - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS sum_disc_price"
        ),
        sum_charge=(
            "CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * "
            "(1 - CAST(l_discount AS DECIMAL(18,2))) * "
            "(1 + CAST(l_tax AS DECIMAL(18,2)))) AS DOUBLE) AS sum_charge"
        ),
        avg_qty=sql_davg("l_quantity", "avg_qty"),
        avg_price=sql_davg("l_extendedprice", "avg_price"),
        avg_disc=sql_davg("l_discount", "avg_disc"),
    ),
    doc="Filter + groupBy(2) + 7 aggregates + sort (TPC-H Q1 shape).",
    tags=("flagship", "agg"),
)
def q1_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    # Cast each *factor* to exact decimal before multiplying: the product is
    # then exact in both engines; casting the double product instead rounds
    # engine-dependently at the last decimal (round-1 mismatch).
    disc_price = dec("l_extendedprice") * (F.lit(1) - dec("l_discount"))
    charge = disc_price * (F.lit(1) + dec("l_tax"))
    return (
        li.filter(F.col("l_shipdate") <= F.lit("1998-09-02 00:00:00").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            dsum("l_quantity", "sum_qty"),
            dsum("l_extendedprice", "sum_base_price"),
            dsum_exact(disc_price, "sum_disc_price"),
            dsum_exact(charge, "sum_charge"),
            davg("l_quantity", "avg_qty"),
            davg("l_extendedprice", "avg_price"),
            davg("l_discount", "avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
        .orderBy("l_returnflag", "l_linestatus")
    )


@register(
    "scan_filter_project",
    oracle="""
    SELECT o_orderkey, o_custkey, o_orderpriority,
           CAST(o_totalprice * 1.1 AS DOUBLE) AS uplifted
    FROM orders
    WHERE o_orderstatus = 'F' AND o_totalprice > 100000.0
    """,
    doc="TableScan+Filter+Select (ql/exec/{TableScan,Filter,Select}Operator.java); "
    "filter and 4-column projection both reach the parquet scan.",
    tags=("scan",),
)
def scan_filter_project(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    return o.filter((F.col("o_orderstatus") == "F") & (F.col("o_totalprice") > 100000.0)).select(
        "o_orderkey",
        "o_custkey",
        "o_orderpriority",
        (F.col("o_totalprice") * 1.1).cast("double").alias("uplifted"),
    )


@register(
    "order_by_limit_topk",
    oracle="""
    SELECT o_orderkey, o_custkey, o_totalprice
    FROM orders
    ORDER BY o_totalprice DESC, o_orderkey ASC
    LIMIT 25
    """,
    doc="Top-k: Hive TopNHash ≡ Spark TakeOrderedAndProject (no global sort).",
    tags=("sort", "limit"),
)
def order_by_limit_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    return (
        o.select("o_orderkey", "o_custkey", "o_totalprice")
        .orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey").asc())
        .limit(25)
    )


@register(
    "global_order_by",
    oracle="""
    SELECT c_custkey, c_name, CAST(c_acctbal AS DOUBLE) AS c_acctbal
    FROM customer
    ORDER BY c_acctbal DESC NULLS LAST, c_custkey
    LIMIT 100
    """,
    doc="Global ORDER BY (genOrderByPlan) — range-partitioned sort in Spark.",
    tags=("sort",),
)
def global_order_by(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer")
    return (
        c.select("c_custkey", "c_name", F.col("c_acctbal").cast("double").alias("c_acctbal"))
        .orderBy(F.col("c_acctbal").desc_nulls_last(), F.col("c_custkey"))
        .limit(100)
    )


@register(
    "select_distinct",
    oracle="SELECT DISTINCT o_orderstatus, o_orderpriority FROM orders",
    doc="SELECT DISTINCT compiled to group-by (SemanticAnalyzer.genSelectPlan).",
    tags=("distinct",),
)
def select_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    return load_table(spark, sf_dir, "orders").select("o_orderstatus", "o_orderpriority").distinct()


@register(
    "union_all",
    oracle="""
    SELECT c_custkey AS key, c_name AS name FROM customer WHERE c_custkey <= 100
    UNION ALL
    SELECT s_suppkey AS key, s_name AS name FROM supplier WHERE s_suppkey <= 100
    """,
    doc="UNION ALL bag union (ql/exec/UnionOperator.java).",
    tags=("setop",),
)
def union_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer")
    s = load_table(spark, sf_dir, "supplier")
    a = c.filter(F.col("c_custkey") <= 100).select(
        F.col("c_custkey").alias("key"), F.col("c_name").alias("name")
    )
    b = s.filter(F.col("s_suppkey") <= 100).select(
        F.col("s_suppkey").alias("key"), F.col("s_name").alias("name")
    )
    return a.unionAll(b)


@register(
    "union_distinct",
    oracle="""
    SELECT c_nationkey AS nk FROM customer
    UNION
    SELECT s_nationkey AS nk FROM supplier
    """,
    doc="UNION [DISTINCT] (HIVE-9039: rewritten to UNION ALL + group-by-all).",
    tags=("setop",),
)
def union_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer").select(F.col("c_nationkey").alias("nk"))
    s = load_table(spark, sf_dir, "supplier").select(F.col("s_nationkey").alias("nk"))
    return c.union(s).distinct()


@register(
    "tablesample_bucket",
    oracle="""
    SELECT COUNT(*) AS n_sampled, COUNT(DISTINCT o_custkey) AS n_cust
    FROM orders
    WHERE o_orderkey % 16 = 3
    """,
    doc="TABLESAMPLE(BUCKET 4 OUT OF 16 ON o_orderkey) ≡ deterministic "
    "hash-mod filter (SemanticAnalyzer.genSamplePredicate); modulo on the "
    "key itself so Spark and the oracle agree (Hive/Spark hash fns differ).",
    tags=("sample",),
)
def tablesample_bucket(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    return o.filter(F.col("o_orderkey") % 16 == 3).agg(
        F.count(F.lit(1)).alias("n_sampled"),
        F.countDistinct("o_custkey").alias("n_cust"),
    )


def _per_partition_sorted(df: DataFrame, cols: list[str]) -> DataFrame:
    """One row per physical partition: (n bigint, sorted_ok boolean) where
    ``sorted_ok`` means the partition's rows arrive in non-decreasing
    lexicographic ``cols`` order.

    Implemented with mapInPandas so the physical row order is observed AT
    EXECUTION TIME, inside the same stage as the sort. The previous
    monotonically_increasing_id + window formulation measured an optimizer
    artifact: Spark is allowed (EliminateSorts / AQE) to drop a local Sort
    that a downstream window would subsume, legally flipping the flag. An
    order-sensitive Python map cannot have its upstream sort elided.
    Verification-plane only — not a data-path pattern.
    """

    def check(batches):
        import pandas as pd

        n, ok, last = 0, True, None
        for pdf in batches:
            if not len(pdf):
                continue
            rows = list(pdf[cols].itertuples(index=False, name=None))
            ok = ok and all(a <= b for a, b in zip(rows, rows[1:]))
            if last is not None and rows[0] < last:
                ok = False
            last = rows[-1]
            n += len(rows)
        yield pd.DataFrame({"n": [n], "sorted_ok": [ok]})

    return df.mapInPandas(check, "n bigint, sorted_ok boolean")


@register(
    "sort_by_distribute_by",
    oracle="""
    SELECT COUNT(*) AS n_rows, TRUE AS all_sorted, TRUE AS dist_ok
    FROM orders
    """,
    doc="DISTRIBUTE BY + SORT BY (genReduceSinkPlan): repartition(col)."
    "sortWithinPartitions — Hive's per-reducer sort. The raw row order is "
    "partition-dependent, so the query PROJECTS the contract instead: "
    "all_sorted = every partition is internally ordered by (custkey, date), "
    "observed per-partition at execution time (_per_partition_sorted); "
    "dist_ok = no custkey spans two partitions. Both are order-insensitive "
    "and oracle-checkable.",
    tags=("sort",),
)
def sort_by_distribute_by(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    clustered = o.repartition(8, "o_custkey").sortWithinPartitions(
        "o_custkey", "o_orderdate"
    )
    sorted_flags = _per_partition_sorted(
        clustered.select("o_custkey", "o_orderdate"), ["o_custkey", "o_orderdate"]
    ).agg(
        F.sum("n").alias("n_rows"), (F.min(F.col("sorted_ok").cast("int")) == 1).alias("all_sorted")
    )
    dist = (
        clustered.select("o_custkey", F.spark_partition_id().alias("pid"))
        .groupBy("o_custkey")
        .agg(F.countDistinct("pid").alias("n_pids"))
        .agg((F.max("n_pids") == 1).alias("dist_ok"))
    )
    return sorted_flags.crossJoin(dist)


@register(
    "multi_insert_fanout",
    oracle="""
    SELECT COUNT(*) AS n_rows,
           COUNT(*) FILTER (WHERE o_totalprice > 200000) AS n_hi,
           COUNT(*) FILTER (WHERE o_totalprice <= 200000) AS n_lo,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_price
    FROM orders
    """,
    doc="Multi-insert (FROM t INSERT ... INSERT ...; SemanticAnalyzer.genPlan "
    "fan-out): one cached scan feeding N sinks; oracled by re-reading both "
    "sinks and reconciling counts + an exact-decimal price sum against the "
    "source table.",
    tags=("sink",),
)
def multi_insert_fanout(spark: SparkSession, sf_dir: str) -> DataFrame:
    import tempfile

    o = load_table(spark, sf_dir, "orders").cache()
    base = scratch_dir("multiins")
    hi = o.filter(F.col("o_totalprice") > 200000).select("o_orderkey", "o_totalprice")
    lo = o.filter(F.col("o_totalprice") <= 200000).select("o_orderkey", "o_totalprice")
    hi.write.mode("overwrite").parquet(f"{base}/hi")
    lo.write.mode("overwrite").parquet(f"{base}/lo")
    hi_back = spark.read.parquet(f"{base}/hi").withColumn("sink", F.lit("hi"))
    lo_back = spark.read.parquet(f"{base}/lo").withColumn("sink", F.lit("lo"))
    out = hi_back.unionAll(lo_back)
    o.unpersist()
    return out.agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.count(F.when(F.col("sink") == "hi", 1)).alias("n_hi"),
        F.count(F.when(F.col("sink") == "lo", 1)).alias("n_lo"),
        F.sum(F.col("o_totalprice").cast("decimal(18,2)")).cast("double").alias("sum_price"),
    )


@register(
    "virtual_columns_invariants",
    oracle="""
    SELECT COUNT(*) AS n_rows, TRUE AS has_files, TRUE AS has_partitions,
           TRUE AS rids_unique, TRUE AS fnames_resolve
    FROM orders
    """,
    doc="Virtual columns (ql/metadata/VirtualColumn.java): INPUT__FILE__NAME "
    "→ input_file_name(), plus spark_partition_id + monotonically_"
    "increasing_id as the Spark-native row-address analogues of "
    "BLOCK__OFFSET__INSIDE__FILE / ROW__ID. Raw values are engine-specific, "
    "so the query projects their invariants: every row has a parquet file "
    "name, ≥1 file and partition, and row ids are globally unique.",
    tags=("scan", "virtual"),
)
def virtual_columns_invariants(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    return (
        o.select(
            F.input_file_name().alias("fname"),
            F.spark_partition_id().alias("pid"),
            F.monotonically_increasing_id().alias("rid"),
        )
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            (F.countDistinct("fname") >= 1).alias("has_files"),
            (F.countDistinct("pid") >= 1).alias("has_partitions"),
            (F.countDistinct("rid") == F.count(F.lit(1))).alias("rids_unique"),
            (F.sum(F.when(F.col("fname").contains(".parquet"), 0).otherwise(1)) == 0).alias(
                "fnames_resolve"
            ),
        )
    )


@register(
    "insert_overwrite_directory",
    oracle="""
    SELECT COUNT(*) AS n_rows, MIN(n_regionkey) AS min_rk
    FROM nation WHERE n_regionkey > 2
    """,
    doc="INSERT OVERWRITE [LOCAL] DIRECTORY (SemanticAnalyzer."
    "genFileSinkPlan): overwrite-mode write of a query result to a plain "
    "directory, verified by re-read. Second overwrite replaces (not "
    "appends) — the Hive overwrite contract; the oracle sees only the "
    "second write's predicate.",
    tags=("sink",),
)
def insert_overwrite_directory(spark: SparkSession, sf_dir: str) -> DataFrame:
    import tempfile

    path = scratch_dir("iod") + "/out"
    n = load_table(spark, sf_dir, "nation")
    n.filter(F.col("n_regionkey") <= 2).write.mode("overwrite").parquet(path)
    n.filter(F.col("n_regionkey") > 2).write.mode("overwrite").parquet(path)  # replaces
    back = spark.read.parquet(path)
    return back.agg(
        F.count(F.lit(1)).alias("n_rows"), F.min("n_regionkey").alias("min_rk")
    )


@register(
    "intersect_emulated",
    oracle="""
    SELECT DISTINCT c.c_nationkey AS nk
    FROM customer c
    WHERE EXISTS (SELECT 1 FROM supplier s WHERE s.s_nationkey = c.c_nationkey)
    """,
    doc="INTERSECT emulation (absent in Hive 1.2.2 — arrives 2.2; users "
    "wrote the semi-join form): DISTINCT + LEFT SEMI JOIN. Declared as the "
    "join-emulation surface per SURVEY §2.7; Spark's native intersect() "
    "compiles to the same plan.",
    tags=("setop",),
)
def intersect_emulated(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer").select(F.col("c_nationkey").alias("nk"))
    s = load_table(spark, sf_dir, "supplier").select(F.col("s_nationkey").alias("nk"))
    return c.join(s, "nk", "left_semi").distinct()


@register(
    "except_emulated",
    oracle="""
    SELECT DISTINCT o.o_custkey AS ck
    FROM orders o
    WHERE NOT EXISTS (SELECT 1 FROM customer c
                      WHERE c.c_custkey = o.o_custkey AND c.c_acctbal > 0)
    """,
    doc="EXCEPT/MINUS emulation (absent in 1.2.2): DISTINCT + LEFT ANTI "
    "JOIN — customers with orders whose account balance is not positive.",
    tags=("setop",),
)
def except_emulated(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders").select(F.col("o_custkey").alias("ck"))
    c = (
        load_table(spark, sf_dir, "customer")
        .filter(F.col("c_acctbal") > 0)
        .select(F.col("c_custkey").alias("ck"))
    )
    return o.join(c, "ck", "left_anti").distinct()


@register(
    "tablesample_percent_rows",
    oracle="""
    SELECT COUNT(*) AS n_rows_form,
           (SELECT COUNT(*) FROM (SELECT * FROM orders LIMIT 500)) AS n_limited
    FROM orders
    WHERE o_orderkey % 100 < 10
    """,
    doc="TABLESAMPLE(n PERCENT) as a deterministic 10%% key-mod filter plus "
    "TABLESAMPLE(n ROWS) as LIMIT (SplitSample percent/row forms). The "
    "random df.sample() exists but is excluded from [Q] (nondeterministic).",
    tags=("sample",),
)
def tablesample_percent_rows(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    pct = o.filter(F.col("o_orderkey") % 100 < 10).agg(F.count(F.lit(1)).alias("n_rows_form"))
    lim = o.limit(500).agg(F.count(F.lit(1)).alias("n_limited"))
    return pct.crossJoin(lim)


@register(
    "flagship_sql_text",
    oracle="""
    SELECT l_returnflag, l_linestatus,
           CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
           COUNT(*) AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
    GROUP BY l_returnflag, l_linestatus
    ORDER BY l_returnflag, l_linestatus
    """,
    doc="The flagship executed as pure SQL TEXT through spark.sql — the "
    "HiveServer2/CLI entry-point parity path (SURVEY §3 Entries A/B: "
    "Driver.run(sql) ≡ spark.sql(sql)); same Catalyst plan as the "
    "DataFrame form of q1_pricing_summary.",
    tags=("flagship", "sql"),
)
def flagship_sql_text(spark: SparkSession, sf_dir: str) -> DataFrame:
    load_table(spark, sf_dir, "lineitem").createOrReplaceTempView("lineitem_sqltext")
    return spark.sql(
        """
        SELECT l_returnflag, l_linestatus,
               CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
               COUNT(*) AS count_order
        FROM lineitem_sqltext
        WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
        GROUP BY l_returnflag, l_linestatus
        ORDER BY l_returnflag, l_linestatus
        """
    )


@register(
    "cluster_by_sql",
    oracle="""
    SELECT COUNT(*) AS n_rows, TRUE AS all_sorted
    FROM orders
    """,
    doc="Literal CLUSTER BY SQL (genReduceSinkPlan grammar forms — Spark SQL "
    "accepts DISTRIBUTE BY / SORT BY / CLUSTER BY verbatim), then projects "
    "the clustering contract as an order-insensitive flag: within every "
    "physical partition the custkey sequence is non-decreasing, observed "
    "per-partition at execution time (_per_partition_sorted — immune to "
    "the optimizer legally eliding a local Sort under a window).",
    tags=("sort", "sql"),
)
def cluster_by_sql(spark: SparkSession, sf_dir: str) -> DataFrame:
    load_table(spark, sf_dir, "orders").createOrReplaceTempView("orders_cb")
    clustered = spark.sql(
        """
        SELECT o_orderkey, o_custkey, o_orderstatus
        FROM orders_cb
        CLUSTER BY o_custkey
        """
    )
    return _per_partition_sorted(clustered.select("o_custkey"), ["o_custkey"]).agg(
        F.sum("n").alias("n_rows"),
        (F.min(F.col("sorted_ok").cast("int")) == 1).alias("all_sorted"),
    )


@register(
    "cte_with_clause_sql",
    oracle="""
    WITH active_cust AS (
        SELECT c_custkey, c_mktsegment
        FROM customer
        WHERE c_acctbal > 0
    ),
    seg_revenue AS (
        SELECT a.c_mktsegment,
               COUNT(*) AS n_orders,
               CAST(SUM(CAST(o.o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
                   AS revenue
        FROM active_cust a JOIN orders o ON o.o_custkey = a.c_custkey
        GROUP BY a.c_mktsegment
    )
    SELECT c_mktsegment, n_orders, revenue
    FROM seg_revenue
    ORDER BY c_mktsegment
    """,
    doc="Common Table Expressions — literal `WITH x AS (...), y AS (...)` "
    "HiveQL (HIVE-1180; `ql/parse/SemanticAnalyzer` gathers CTE subqueries "
    "and inlines them at plan time — 1.2 CTEs are pure plan-time macros, "
    "never materialized). Spark SQL accepts the clause verbatim and "
    "Catalyst likewise inlines the CTE bodies, so the second CTE "
    "referencing the first (a chained CTE) collapses into one join+agg "
    "plan with the filter pushed into the customer scan. Decimal-exact "
    "revenue per the registry's parallel-sum determinism rule.",
    tags=("relational", "sql", "cte"),
)
def cte_with_clause_sql(spark: SparkSession, sf_dir: str) -> DataFrame:
    load_table(spark, sf_dir, "customer").createOrReplaceTempView("customer_cte")
    load_table(spark, sf_dir, "orders").createOrReplaceTempView("orders_cte")
    return spark.sql(
        """
        WITH active_cust AS (
            SELECT c_custkey, c_mktsegment
            FROM customer_cte
            WHERE c_acctbal > 0
        ),
        seg_revenue AS (
            SELECT a.c_mktsegment,
                   COUNT(*) AS n_orders,
                   CAST(SUM(CAST(o.o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
                       AS revenue
            FROM active_cust a JOIN orders_cte o ON o.o_custkey = a.c_custkey
            GROUP BY a.c_mktsegment
        )
        SELECT c_mktsegment, n_orders, revenue
        FROM seg_revenue
        ORDER BY c_mktsegment
        """
    )


@register(
    "order_nulls_suite",
    oracle="""
    WITH v AS (
      SELECT CASE WHEN c_acctbal < 500 THEN NULL
                  ELSE CAST(c_acctbal AS DOUBLE) END AS val,
             c_custkey
      FROM customer
    )
    SELECT * FROM (
      SELECT 'asc_default' AS phase, val, c_custkey
      FROM v ORDER BY val ASC NULLS FIRST, c_custkey LIMIT 30
    )
    UNION ALL
    SELECT * FROM (
      SELECT 'desc_default' AS phase, val, c_custkey
      FROM v ORDER BY val DESC NULLS LAST, c_custkey LIMIT 30
    )
    """,
    doc="NULL ordering contract (SemanticAnalyzer sort spec; Hive 1.2 has "
    "no NULLS FIRST/LAST syntax — the FIXED rule is ASC => NULLs first, "
    "DESC => NULLs last, `ReduceSinkOperator` key comparators): Spark's "
    "DEFAULT sort directions implement exactly Hive's rule, so the Spark "
    "side uses plain .asc()/ordinal DESC with no null-ordering clause and "
    "the oracle must OPT IN explicitly (DuckDB defaults to NULLS LAST on "
    "ASC — the divergence this suite pins). The asc half selects the "
    "top-30 under a null-heavy column: its row SET certifies nulls sorted "
    "first; both halves are ORDER BY+LIMIT => TakeOrderedAndProject "
    "(scale-safe top-k, no global sort). The desc half runs as literal "
    "SQL with POSITIONAL `ORDER BY 2 DESC, 3` (the "
    "hive.orderby.position.alias dialect, on by default in Spark).",
    tags=("sort", "nulls", "sql"),
)
def order_nulls_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer")
    v = c.select(
        F.when(F.col("c_acctbal") < 500, F.lit(None))
        .otherwise(F.col("c_acctbal"))
        .cast("double")
        .alias("val"),
        "c_custkey",
    )
    asc_half = (
        v.select(F.lit("asc_default").alias("phase"), "val", "c_custkey")
        # Spark/Hive default: ASC sorts NULLs FIRST — no explicit clause.
        .orderBy(F.col("val").asc(), F.col("c_custkey"))
        .limit(30)
    )
    v.createOrReplaceTempView("order_nulls_v")
    desc_half = spark.sql(
        """
        SELECT 'desc_default' AS phase, val, c_custkey
        FROM order_nulls_v
        ORDER BY 2 DESC, 3
        LIMIT 30
        """
    )
    return asc_half.unionAll(desc_half)


@register(
    "diagnostics_key_skew",
    oracle="""
    WITH k AS (
      SELECT l_orderkey AS key, COUNT(*) AS cnt
      FROM lineitem GROUP BY l_orderkey
    ),
    stats AS (
      SELECT COUNT(*) AS n_keys,
             CAST(MAX(cnt) AS BIGINT) AS max_cnt,
             CAST(SUM(cnt) AS BIGINT) AS n_rows
      FROM k
    ),
    heavy AS (
      -- cnt > 4 * mean, as exact integer cross-multiplication
      SELECT CAST(COUNT(*) AS BIGINT) AS n_heavy
      FROM k, stats WHERE k.cnt * stats.n_keys > 4 * stats.n_rows
    )
    SELECT s.n_keys, s.max_cnt, s.n_rows, h.n_heavy,
           s.max_cnt * s.n_keys >= 4 * s.n_rows AS skew_flag
    FROM stats s, heavy h
    """,
    doc="Join-key skew diagnostics (operational pre-flight for the skew "
    "mitigations this repo ships — manual salting in join_salted_skew, "
    "AQE splitting in tests/test_plan_shapes.py: you run THIS first to "
    "decide): per-key cardinality profile of lineitem.l_orderkey — key "
    "count, max per-key multiplicity, heavy-hitter count (> 4x the MEAN "
    "multiplicity), and the skew verdict bit — every comparison an exact "
    "integer CROSS-MULTIPLICATION (cnt * n_keys > 4 * n_rows), no "
    "division, no median interpolation, so no engine can disagree by an "
    "ulp. One partial-agg shuffle on the key plus a 1-row reduction "
    "broadcast back over the per-key frame. At 100 TB this runs as a "
    "sampled or "
    "sketch-based profile; the SHAPE (groupBy key -> tiny stats frame) "
    "is identical.",
    tags=("diagnostics", "skew"),
)
def diagnostics_key_skew(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    k = li.groupBy(F.col("l_orderkey").alias("key")).agg(
        F.count(F.lit(1)).alias("cnt")
    )
    stats = k.agg(
        F.count(F.lit(1)).alias("n_keys"),
        F.max("cnt").cast("long").alias("max_cnt"),
        F.sum("cnt").cast("long").alias("n_rows"),
    )
    heavy = (
        k.crossJoin(F.broadcast(stats.select("n_keys", "n_rows")))
        .where(F.col("cnt") * F.col("n_keys") > 4 * F.col("n_rows"))
        .agg(F.count(F.lit(1)).cast("long").alias("n_heavy"))
    )
    return stats.crossJoin(heavy).select(
        "n_keys",
        "max_cnt",
        "n_rows",
        "n_heavy",
        (F.col("max_cnt") * F.col("n_keys") >= 4 * F.col("n_rows")).alias("skew_flag"),
    )


@register(
    "set_ops_all_bag",
    oracle="""
    WITH a AS (
      SELECT o_orderstatus AS st, o_orderpriority AS pr
      FROM orders WHERE o_orderkey % 3 <> 0
    ),
    b AS (
      SELECT o_orderstatus AS st, o_orderpriority AS pr
      FROM orders WHERE o_orderkey % 2 <> 0
    ),
    i AS (SELECT * FROM a INTERSECT ALL SELECT * FROM b),
    e AS (SELECT * FROM a EXCEPT ALL SELECT * FROM b)
    SELECT st,
           CAST((SELECT COUNT(*) FROM i i2 WHERE i2.st = s.st) AS BIGINT)
             AS n_intersect_all,
           CAST((SELECT COUNT(*) FROM e e2 WHERE e2.st = s.st) AS BIGINT)
             AS n_except_all
    FROM (SELECT DISTINCT st FROM a) s
    """,
    doc="BAG-semantics set operations (INTERSECT ALL / EXCEPT ALL — "
    "Hive 1.2 had NEITHER; even its UNION was ALL-only, and the DISTINCT "
    "set-op emulations (intersect_emulated/except_emulated) lose "
    "multiplicities, which matters whenever rows are events rather than "
    "entities): two overlapping order multisets (keys % 3 != 0 vs "
    "% 2 != 0 — the shared keys appear in both with real multiplicity) "
    "through Spark's native intersectAll/exceptAll, counted per status. "
    "Bag semantics compile to a count-compare aggregation — ONE shuffle "
    "per operand keyed on the full row, no join explosion; min/差-of-"
    "counts math is exactly what the SQL-standard ALL forms specify.",
    tags=("setop", "sql"),
)
def set_ops_all_bag(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders").select(
        "o_orderkey",
        F.col("o_orderstatus").alias("st"),
        F.col("o_orderpriority").alias("pr"),
    )
    a = o.filter(F.col("o_orderkey") % 3 != 0).select("st", "pr")
    b = o.filter(F.col("o_orderkey") % 2 != 0).select("st", "pr")
    i = a.intersectAll(b).groupBy("st").agg(
        F.count(F.lit(1)).cast("long").alias("n_intersect_all")
    )
    e = a.exceptAll(b).groupBy("st").agg(
        F.count(F.lit(1)).cast("long").alias("n_except_all")
    )
    base = a.select("st").distinct()
    return (
        base.join(i, "st", "left")
        .join(e, "st", "left")
        .select(
            "st",
            F.coalesce("n_intersect_all", F.lit(0)).alias("n_intersect_all"),
            F.coalesce("n_except_all", F.lit(0)).alias("n_except_all"),
        )
    )


@register(
    "profile_columns_unpivot",
    oracle="""
    WITH cells AS (
      SELECT 'o_orderstatus' AS col, o_orderstatus AS val FROM orders
      UNION ALL
      SELECT 'o_orderpriority', o_orderpriority FROM orders
      UNION ALL
      SELECT 'o_custkey', CAST(o_custkey AS VARCHAR) FROM orders
      UNION ALL
      SELECT 'o_clerk_sim',
             CASE WHEN o_orderkey % 50 = 0 THEN NULL
                  ELSE 'clerk_' || CAST(o_orderkey % 11 AS VARCHAR) END
      FROM orders
    )
    SELECT col,
           CAST(COUNT(*) AS BIGINT) AS n_rows,
           CAST(COUNT(val) AS BIGINT) AS n_not_null,
           CAST(COUNT(*) - COUNT(val) AS BIGINT) AS n_nulls,
           CAST(COUNT(DISTINCT val) AS BIGINT) AS n_distinct,
           MIN(val) AS min_val,
           MAX(val) AS max_val
    FROM cells GROUP BY col
    """,
    doc="One-pass column profile via UNPIVOT (the data-profiling query "
    "behind every 'describe my table' tool, and what ANALYZE ... FOR "
    "COLUMNS computes per column): columns stack into (col, val) rows "
    "with stack() — one scan profiles them all, versus one scan per "
    "column for the naive loop — then null counts, NDV, and extrema per "
    "column name (values stringified so heterogeneous columns share one "
    "frame; a derived nullable column is planted since orders has no "
    "native NULLs). The explode multiplies rows by |columns|, but each "
    "output row is 2 narrow strings and the downstream agg partial-"
    "aggregates — profile cost stays ~|columns| x scan, the standard "
    "profiling trade.",
    tags=("relational", "profile", "udtf"),
)
def profile_columns_unpivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders").select(
        "o_orderkey",
        "o_orderstatus",
        "o_orderpriority",
        F.col("o_custkey").cast("string").alias("o_custkey_s"),
        F.when(F.col("o_orderkey") % 50 == 0, F.lit(None))
        .otherwise(F.concat(F.lit("clerk_"), (F.col("o_orderkey") % 11).cast("string")))
        .alias("o_clerk_sim"),
    )
    cells = o.select(
        F.expr(
            "stack(4, 'o_orderstatus', o_orderstatus, "
            "'o_orderpriority', o_orderpriority, "
            "'o_custkey', o_custkey_s, "
            "'o_clerk_sim', o_clerk_sim) AS (col, val)"
        )
    )
    return cells.groupBy("col").agg(
        F.count(F.lit(1)).cast("long").alias("n_rows"),
        F.count("val").cast("long").alias("n_not_null"),
        (F.count(F.lit(1)) - F.count("val")).cast("long").alias("n_nulls"),
        F.countDistinct("val").cast("long").alias("n_distinct"),
        F.min("val").alias("min_val"),
        F.max("val").alias("max_val"),
    )


@register(
    "tablesample_bucket_rand",
    # rand() output is engine/instant-specific by definition, so the query
    # projects the sampling CONTRACT into oracle-checkable values
    # (nondeterministic_fns_invariants pattern): the exact total row count,
    # plus a binomial plausibility bound on the sampled fraction. p=1/16,
    # |6 sigma| tolerance: P(fail) < 2e-9 per run — a real routing bug
    # (empty sample, all rows, p off by 2x) trips it deterministically.
    oracle="""
    SELECT CAST(COUNT(*) AS BIGINT) AS n_total,
           TRUE AS sampled_frac_ok,
           TRUE AS sample_is_filter
    FROM orders
    """,
    doc="TABLESAMPLE(BUCKET 1 OUT OF 16 ON rand()) — the NONdeterministic "
    "sample form (SemanticAnalyzer.genSamplePredicate builds "
    "((hash(rand()) & Integer.MAX_VALUE) % 16) == 0 when the ON clause "
    "is rand(); the deterministic ON-column twin is tablesample_bucket): "
    "emulated with the same predicate shape over Spark's rand(). One "
    "pass: each row computes its bucket-0 membership bit, a single "
    "aggregate counts total and sampled, and the sampled count is "
    "checked against the 6-sigma binomial envelope around n/16. Scale: "
    "a codegen filter with NO shuffle and no materialization — the "
    "sample predicate pushes into the scan exactly like Hive's; at "
    "100 TB prefer the ON-column form for reproducibility (documented "
    "in the reference too: rand() samples are not repeatable).",
    tags=("sample", "functions"),
)
def tablesample_bucket_rand(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    # Hive's predicate shape: ((hash(rand()) & MAX_INT) % 16) == 0. One
    # aggregate consumes the membership bit so rand() is evaluated exactly
    # once per row in a single action (re-evaluation across actions would
    # give a DIFFERENT sample — which is why every derived output here is
    # computed from the same pass).
    p = 1.0 / 16.0
    # Projected BEFORE the aggregate: Spark (correctly) refuses rand()
    # inside an aggregate function, and the projection also guarantees one
    # evaluation per row feeding both counters.
    bits = o.select(
        (F.pmod(F.hash(F.rand()), F.lit(16)) == 0).cast("int").alias("in_bucket")
    )
    agg = bits.agg(
        F.count(F.lit(1)).alias("n_total"), F.sum("in_bucket").alias("n_sampled")
    )
    mean = F.col("n_total") * F.lit(p)
    sigma = F.sqrt(F.col("n_total") * F.lit(p * (1 - p)))
    return agg.select(
        F.col("n_total").cast("long").alias("n_total"),
        (F.abs(F.col("n_sampled") - mean) <= sigma * 6).alias("sampled_frac_ok"),
        # a filter can never invent rows: sampled <= total, trivially true
        # for this plan shape but load-bearing if the emulation ever drifts
        (F.col("n_sampled") <= F.col("n_total")).alias("sample_is_filter"),
    )
