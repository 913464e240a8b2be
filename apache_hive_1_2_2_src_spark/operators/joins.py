"""Join surface (SURVEY.md §2.3).

Hive parity targets: ``ql/exec/CommonJoinOperator.java`` (join-type matrix,
null padding), ``JoinOperator.java`` (reduce-side sort-merge),
``MapJoinOperator.java`` + ``ql/optimizer/MapJoinProcessor.java`` (broadcast
hash join), ``ql/parse/SemanticAnalyzer.genJoinTree`` (syntax/type matrix),
``ql/parse/SubQueryUtils.java`` (IN/EXISTS → semi-join rewrite; NOT IN →
left-outer + IS NULL rewrite — Hive 1.2 has no anti-join syntax).

Scale notes:
- dim tables (region/nation/supplier/part at TPC-H ratios) are broadcast —
  explicitly hinted where the optimizer might not know sizes; fact⋈fact
  (orders⋈lineitem) shuffles on the join key, which AQE rebalance/skew-split
  keeps healthy at 100 TB.
- Catalyst reorders the 3-way chain by size/stats — Hive needed Calcite CBO
  (``ql/parse/CalcitePlanner.java``) for the same.
- the theta join compiles to BroadcastNestedLoopJoin only because one side
  is pre-filtered tiny; an unbounded theta join at 100 TB is a design error
  in any engine.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.functions import broadcast

from apache_hive_1_2_2_src_spark.operators.helpers import dec, dsum, dsum_exact, sql_dsum
from apache_hive_1_2_2_src_spark.registry import register
from apache_hive_1_2_2_src_spark.tables import load_table


@register(
    "join_inner",
    oracle="""
    SELECT n.n_name, COUNT(*) AS n_customers,
           {bal}
    FROM customer c JOIN nation n ON c.c_nationkey = n.n_nationkey
    GROUP BY n.n_name
    """.format(bal=sql_dsum("c.c_acctbal", "total_acctbal")),
    doc="INNER equi-join + agg; nation is broadcast (MapJoinOperator parity).",
    tags=("join",),
)
def join_inner(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer")
    n = load_table(spark, sf_dir, "nation")
    return (
        c.join(broadcast(n), c.c_nationkey == n.n_nationkey, "inner")
        .groupBy("n_name")
        .agg(F.count(F.lit(1)).alias("n_customers"), dsum("c_acctbal", "total_acctbal"))
    )


@register(
    "join_left_outer",
    oracle="""
    SELECT c.c_custkey, COUNT(o.o_orderkey) AS n_orders
    FROM customer c LEFT JOIN orders o ON c.c_custkey = o.o_custkey
    GROUP BY c.c_custkey
    """,
    doc="LEFT OUTER join null-padding (CommonJoinOperator.checkAndGenObject); "
    "count(col) skips the padded NULLs, so customers without orders show 0.",
    tags=("join",),
)
def join_left_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    return (
        c.join(o, c.c_custkey == o.o_custkey, "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("n_orders"))
    )


@register(
    "join_right_outer",
    oracle="""
    SELECT o.o_orderkey, c.c_name
    FROM customer c RIGHT JOIN orders o ON c.c_custkey = o.o_custkey AND c.c_acctbal > 9000
    WHERE o.o_orderkey <= 500
    """,
    doc="RIGHT OUTER with residual ON-predicate (AND-ed non-key condition "
    "evaluated pre-padding, as in CommonJoinOperator residual filters).",
    tags=("join",),
)
def join_right_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    return (
        c.join(o, (c.c_custkey == o.o_custkey) & (c.c_acctbal > 9000), "right")
        .filter(o.o_orderkey <= 500)
        .select("o_orderkey", "c_name")
    )


@register(
    "join_full_outer",
    oracle="""
    WITH cust_n AS (SELECT c_nationkey AS nk, COUNT(*) AS n_cust
                    FROM customer GROUP BY c_nationkey),
         supp_n AS (SELECT s_nationkey AS nk, COUNT(*) AS n_supp
                    FROM supplier GROUP BY s_nationkey)
    SELECT COALESCE(c.nk, s.nk) AS nationkey,
           COALESCE(c.n_cust, 0) AS n_cust,
           COALESCE(s.n_supp, 0) AS n_supp
    FROM cust_n c FULL OUTER JOIN supp_n s ON c.nk = s.nk
    """,
    doc="FULL OUTER join with both-side padding.",
    tags=("join",),
)
def join_full_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = (
        load_table(spark, sf_dir, "customer")
        .groupBy(F.col("c_nationkey").alias("nk"))
        .agg(F.count(F.lit(1)).alias("n_cust"))
    )
    s = (
        load_table(spark, sf_dir, "supplier")
        .groupBy(F.col("s_nationkey").alias("nk"))
        .agg(F.count(F.lit(1)).alias("n_supp"))
    )
    return c.join(s, c.nk == s.nk, "full").select(
        F.coalesce(c.nk, s.nk).alias("nationkey"),
        F.coalesce(F.col("n_cust"), F.lit(0)).alias("n_cust"),
        F.coalesce(F.col("n_supp"), F.lit(0)).alias("n_supp"),
    )


@register(
    "join_left_semi",
    oracle="""
    SELECT c.c_custkey, c.c_name
    FROM customer c
    WHERE c.c_custkey IN (SELECT o_custkey FROM orders WHERE o_totalprice > 300000)
    """,
    doc="LEFT SEMI JOIN (KW_SEMI; dedups right side) ≡ IN-subquery form.",
    tags=("join", "subquery"),
)
def join_left_semi(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders").filter(F.col("o_totalprice") > 300000)
    return c.join(o, c.c_custkey == o.o_custkey, "left_semi").select("c_custkey", "c_name")


@register(
    "join_left_anti",
    oracle="""
    SELECT c.c_custkey, c.c_name
    FROM customer c
    LEFT JOIN (SELECT * FROM orders WHERE o_totalprice > 300000) o
      ON c.c_custkey = o.o_custkey
    WHERE o.o_custkey IS NULL
    """,
    doc="Anti join via Hive 1.2's rewrite pattern (SubQueryUtils: NOT IN → "
    "left outer + IS NULL); Spark left_anti is the direct form. The right "
    "side is the >300k orders subset (the left_semi query's complement) so "
    "the result is non-empty at every sf — an unfiltered orders anti join "
    "is empty at sf>=0.01 (every customer has an order), which would make "
    "the oracle check vacuous at the driver's grading scale.",
    tags=("join", "subquery"),
)
def join_left_anti(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders").filter(F.col("o_totalprice") > 300000)
    return c.join(o, c.c_custkey == o.o_custkey, "left_anti").select("c_custkey", "c_name")


@register(
    "join_cross",
    oracle="""
    SELECT r1.r_name AS from_region, r2.r_name AS to_region
    FROM region r1 CROSS JOIN region r2
    WHERE r1.r_regionkey <> r2.r_regionkey
    """,
    doc="CROSS JOIN cartesian (KW_CROSS; CrossProductCheck warns in Hive).",
    tags=("join",),
)
def join_cross(spark: SparkSession, sf_dir: str) -> DataFrame:
    r1 = load_table(spark, sf_dir, "region").select(F.col("r_regionkey").alias("k1"), F.col("r_name").alias("from_region"))
    r2 = load_table(spark, sf_dir, "region").select(F.col("r_regionkey").alias("k2"), F.col("r_name").alias("to_region"))
    return r1.crossJoin(r2).filter(F.col("k1") != F.col("k2")).select("from_region", "to_region")


@register(
    "join_theta_range",
    oracle="""
    SELECT p.p_partkey, p.p_size, b.bucket_lo
    FROM part p
    JOIN (SELECT 1 AS bucket_lo, 10 AS bucket_hi
          UNION ALL SELECT 11, 25 UNION ALL SELECT 26, 50) b
      ON p.p_size >= b.bucket_lo AND p.p_size <= b.bucket_hi
    WHERE p.p_partkey <= 200
    """,
    doc="Theta/range join (Hive 1.2: cross join + WHERE only; Spark BNLJ with "
    "a broadcast tiny side is strictly more capable).",
    tags=("join",),
)
def join_theta_range(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = load_table(spark, sf_dir, "part").filter(F.col("p_partkey") <= 200)
    buckets = spark.createDataFrame(
        [(1, 10), (11, 25), (26, 50)], ["bucket_lo", "bucket_hi"]
    )
    return p.join(
        broadcast(buckets),
        (p.p_size >= buckets.bucket_lo) & (p.p_size <= buckets.bucket_hi),
    ).select("p_partkey", "p_size", "bucket_lo")


@register(
    "join_three_way",
    oracle="""
    SELECT n.n_name AS nation, COUNT(*) AS n_lineitems,
           {rev}
    FROM customer c
    JOIN orders o ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON o.o_orderkey = l.l_orderkey
    JOIN nation n ON c.c_nationkey = n.n_nationkey
    WHERE o.o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
    GROUP BY n.n_name
    """.format(
        rev="CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(18,2)) * "
        "(1 - CAST(l.l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS revenue"
    ),
    doc="N-way join chain (CommonJoinOperator multi-tag ≡ chained 2-way joins; "
    "Catalyst/CBO reorders). Fact⋈fact shuffles; dims broadcast.",
    tags=("join", "flagship"),
)
def join_three_way(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp")
    )
    l = load_table(spark, sf_dir, "lineitem")
    n = load_table(spark, sf_dir, "nation")
    return (
        c.join(o, c.c_custkey == o.o_custkey)
        .join(l, o.o_orderkey == l.l_orderkey)
        .join(broadcast(n), c.c_nationkey == n.n_nationkey)
        .groupBy(F.col("n_name").alias("nation"))
        .agg(
            F.count(F.lit(1)).alias("n_lineitems"),
            dsum_exact(
                dec("l_extendedprice") * (F.lit(1) - dec("l_discount")), "revenue"
            ),
        )
    )


@register(
    "subquery_in_where",
    oracle="""
    SELECT o_orderkey, o_totalprice
    FROM orders
    WHERE o_custkey IN (SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING')
      AND o_orderkey <= 2000
    """,
    doc="Uncorrelated IN subquery (QBSubQuery → semi-join at analysis time).",
    tags=("subquery",),
)
def subquery_in_where(spark: SparkSession, sf_dir: str) -> DataFrame:
    spark_tables(spark, sf_dir, "orders", "customer")
    return spark.sql(
        """
        SELECT o_orderkey, o_totalprice
        FROM orders
        WHERE o_custkey IN (SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING')
          AND o_orderkey <= 2000
        """
    )


@register(
    "subquery_exists_correlated",
    oracle="""
    SELECT c_custkey, c_name
    FROM customer c
    WHERE EXISTS (SELECT 1 FROM orders o
                  WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 400000)
    """,
    doc="Correlated EXISTS (QBSubQuery 0.13 semantics, one level).",
    tags=("subquery",),
)
def subquery_exists_correlated(spark: SparkSession, sf_dir: str) -> DataFrame:
    spark_tables(spark, sf_dir, "customer", "orders")
    return spark.sql(
        """
        SELECT c_custkey, c_name
        FROM customer c
        WHERE EXISTS (SELECT 1 FROM orders o
                      WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 400000)
        """
    )


@register(
    "subquery_not_in",
    oracle="""
    SELECT n_nationkey, n_name
    FROM nation
    WHERE n_nationkey NOT IN (SELECT c_nationkey FROM customer WHERE c_acctbal > 9990)
    """,
    doc="NOT IN (SubQueryUtils rewrite → left outer + null check in Hive; "
    "native null-aware anti join in Spark).",
    tags=("subquery",),
)
def subquery_not_in(spark: SparkSession, sf_dir: str) -> DataFrame:
    spark_tables(spark, sf_dir, "nation", "customer")
    return spark.sql(
        """
        SELECT n_nationkey, n_name
        FROM nation
        WHERE n_nationkey NOT IN (SELECT c_nationkey FROM customer WHERE c_acctbal > 9990)
        """
    )


def spark_tables(spark: SparkSession, sf_dir: str, *names: str) -> None:
    """Register the named testdata tables as temp views for spark.sql use."""
    for name in names:
        load_table(spark, sf_dir, name).createOrReplaceTempView(name)


@register(
    "join_salted_skew",
    oracle="""
    SELECT o_orderstatus,
           COUNT(*) AS n,
           CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty
    FROM lineitem JOIN orders ON l_orderkey = o_orderkey
    GROUP BY o_orderstatus
    """,
    doc="Skew-mitigation by salting (Hive compile-time skew join: "
    "ql/optimizer/SkewJoinOptimizer.java; runtime: GenMRSkewJoinProcessor)."
    " The big side adds a per-ROW salt that varies within a join key "
    "(linenumber-derived — deterministic, so the oracle stays exact; "
    "production uses rand()); the small side explodes 8 salt replicas; "
    "the join key becomes "
    "(key, salt), splitting any hot key across 8 reducers. Result is "
    "IDENTICAL to the plain join — verified by the unsalted oracle. On "
    "real skew you'd use AQE's skew split first; salting is the manual "
    "fallback for aggregation-free pipelines.",
    tags=("join", "skew"),
)
def join_salted_skew(spark: SparkSession, sf_dir: str) -> DataFrame:
    n_salt = 8
    li = load_table(spark, sf_dir, "lineitem").withColumn(
        "salt", (F.col("l_linenumber") % n_salt).cast("int")
    )
    o = load_table(spark, sf_dir, "orders").withColumn(
        "salt", F.explode(F.array(*[F.lit(i) for i in range(n_salt)]))
    )
    return (
        li.join(o, (F.col("l_orderkey") == F.col("o_orderkey")) & (li.salt == o.salt))
        .groupBy("o_orderstatus")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col("l_quantity").cast("decimal(18,2)")).cast("double").alias("sum_qty"),
        )
    )


@register(
    "join_asof",
    oracle="""
    WITH v AS (
      SELECT user_id, ts, event_id AS view_event_id, value AS view_value
      FROM (
        SELECT user_id, ts, event_id, value,
               ROW_NUMBER() OVER (PARTITION BY user_id, ts
                                  ORDER BY event_id DESC) AS rn
        FROM events WHERE event_type = 'view'
      ) WHERE rn = 1
    ),
    p AS (SELECT event_id, user_id, ts FROM events WHERE event_type = 'purchase')
    SELECT p.event_id, p.user_id, CAST(p.ts AS VARCHAR) AS purchase_ts,
           v.view_event_id,
           CAST(ROUND(v.view_value, 6) AS DOUBLE) AS view_value
    FROM p ASOF LEFT JOIN v ON p.user_id = v.user_id AND p.ts >= v.ts
    """,
    doc="AS-OF join (no Hive or stock-Spark operator — the canonical "
    "time-series/training-pipeline op: each purchase event picks up the "
    "most recent prior-or-equal view event of the same user). Spark-first "
    "implementation is the single-shuffle union+window pattern: tag both "
    "sides, union, window per user ordered by (ts, side), "
    "last(right-struct, ignorenulls) — O(n log n) per user, NO range "
    "cross-join, no per-key explosion. The oracle is DuckDB's native "
    "ASOF LEFT JOIN; right-side (user, ts) duplicates are pre-reduced so "
    "both engines pick the identical match.",
    tags=("join", "asof", "window"),
)
def join_asof(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window

    e = load_table(spark, sf_dir, "events")
    dedup_w = Window.partitionBy("user_id", "ts").orderBy(F.col("event_id").desc())
    v = (
        e.filter(F.col("event_type") == "view")
        .withColumn("rn", F.row_number().over(dedup_w))
        .filter(F.col("rn") == 1)
        .select(
            "user_id",
            "ts",
            F.struct(
                F.col("event_id").alias("vid"), F.col("value").alias("vval")
            ).alias("vrec"),
            F.lit(0).alias("side"),
            F.lit(None).cast("bigint").alias("event_id"),
        )
    )
    p = e.filter(F.col("event_type") == "purchase").select(
        "user_id",
        "ts",
        F.lit(None).cast("struct<vid:bigint,vval:double>").alias("vrec"),
        F.lit(1).alias("side"),
        "event_id",
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "side")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    merged = v.unionByName(p).withColumn(
        "matched", F.last("vrec", ignorenulls=True).over(w)
    )
    return merged.filter(F.col("side") == 1).select(
        "event_id",
        "user_id",
        F.col("ts").cast("string").alias("purchase_ts"),
        F.col("matched.vid").alias("view_event_id"),
        F.round(F.col("matched.vval"), 6).cast("double").alias("view_value"),
    )


@register(
    "join_asof_forward",
    oracle="""
    WITH v AS (
      SELECT user_id, ts, event_id AS view_event_id
      FROM (
        SELECT user_id, ts, event_id,
               ROW_NUMBER() OVER (PARTITION BY user_id, ts
                                  ORDER BY event_id) AS rn
        FROM events WHERE event_type = 'view'
      ) WHERE rn = 1
    ),
    p AS (SELECT event_id, user_id, ts FROM events WHERE event_type = 'purchase')
    SELECT p.event_id, p.user_id, CAST(p.ts AS VARCHAR) AS purchase_ts,
           v.view_event_id,
           CAST(CASE WHEN v.ts IS NULL THEN NULL
                ELSE epoch_us(v.ts) - epoch_us(p.ts) END AS BIGINT)
             AS wait_us
    FROM p ASOF LEFT JOIN v ON p.user_id = v.user_id AND p.ts <= v.ts
    """,
    doc="FORWARD AS-OF join (the 'next event at-or-after' direction: each "
    "purchase picks the user's EARLIEST view at-or-after it — the "
    "time-to-next-touch / label-lookahead query; join_asof is the "
    "backward twin). Same single-shuffle union+window algebra with the "
    "frame reversed: rows between CURRENT ROW AND UNBOUNDED FOLLOWING, "
    "first_value(right-struct, ignorenulls), side ordered so a view AT "
    "the purchase instant matches (ts, side desc puts views after "
    "purchases at equal ts inside a following frame). Oracle: DuckDB "
    "native ASOF LEFT JOIN with the <= comparator. Also emits the "
    "integer-microsecond wait — the labeling pipeline's lookahead gap.",
    tags=("join", "asof", "window"),
)
def join_asof_forward(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window

    e = load_table(spark, sf_dir, "events")
    # Forward ties: the EARLIEST view per (user, ts) is the match target.
    dedup_w = Window.partitionBy("user_id", "ts").orderBy(F.col("event_id"))
    v = (
        e.filter(F.col("event_type") == "view")
        .withColumn("rn", F.row_number().over(dedup_w))
        .filter(F.col("rn") == 1)
        .select(
            "user_id",
            "ts",
            F.struct(
                F.col("event_id").alias("vid"),
                F.unix_micros("ts").alias("vts_us"),
            ).alias("vrec"),
            F.lit(1).alias("side"),
            F.lit(None).cast("bigint").alias("event_id"),
        )
    )
    p = e.filter(F.col("event_type") == "purchase").select(
        "user_id",
        "ts",
        F.lit(None).cast("struct<vid:bigint,vts_us:bigint>").alias("vrec"),
        F.lit(0).alias("side"),
        "event_id",
    )
    # side: purchase=0 sorts BEFORE view=1 at equal ts, so an equal-ts view
    # sits inside the purchase's following frame (at-or-after semantics).
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "side")
        .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    )
    merged = v.unionByName(p).withColumn(
        "matched", F.first("vrec", ignorenulls=True).over(w)
    )
    return merged.filter(F.col("side") == 0).select(
        "event_id",
        "user_id",
        F.col("ts").cast("string").alias("purchase_ts"),
        F.col("matched.vid").alias("view_event_id"),
        (F.col("matched.vts_us") - F.unix_micros("ts"))
        .cast("long")
        .alias("wait_us"),
    )


@register(
    "mapjoin_hint_sql",
    oracle="""
    SELECT r_name, COUNT(*) AS n_nations, COUNT(DISTINCT n_nationkey) AS n_keys
    FROM region JOIN nation ON n_regionkey = r_regionkey
    GROUP BY r_name
    """,
    doc="Literal HiveQL /*+ MAPJOIN(t) */ hint (SemanticAnalyzer hint token "
    "MAPJOIN → MapJoinOperator.java): Spark SQL accepts Hive's hint NAME "
    "verbatim as a broadcast-join hint — the dialect-parity point — and the "
    "plan gets a BroadcastHashJoin (asserted in tests/test_plan_shapes.py).",
    tags=("join", "sql", "hint"),
)
def mapjoin_hint_sql(spark: SparkSession, sf_dir: str) -> DataFrame:
    for name in ("region", "nation"):
        load_table(spark, sf_dir, name).createOrReplaceTempView(f"{name}_mj")
    return spark.sql(
        """
        SELECT /*+ MAPJOIN(region_mj) */ r_name,
               COUNT(*) AS n_nations,
               COUNT(DISTINCT n_nationkey) AS n_keys
        FROM region_mj JOIN nation_mj ON n_regionkey = r_regionkey
        GROUP BY r_name
        """
    )


@register(
    "pivot_case_when",
    oracle="""
    SELECT o_orderpriority,
           COUNT(*) FILTER (WHERE o_orderstatus = 'F') AS n_f,
           COUNT(*) FILTER (WHERE o_orderstatus = 'O') AS n_o,
           COUNT(*) FILTER (WHERE o_orderstatus = 'P') AS n_p,
           CAST(SUM(CASE WHEN o_orderstatus = 'F'
                         THEN CAST(o_totalprice AS DECIMAL(18,2)) END)
                AS DOUBLE) AS sum_f
    FROM orders GROUP BY o_orderpriority
    """,
    doc="Manual pivot via sum(CASE WHEN ...) — THE Hive 1.2 idiom for "
    "pivoting (no PIVOT syntax until much later; q-tests groupby_ppd.q "
    "family). Spark's native df.groupBy().pivot() compiles to the same "
    "conditional-aggregate plan; the case-when form is written here so the "
    "SQL is portable to both engines verbatim.",
    tags=("agg", "pivot"),
)
def pivot_case_when(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    return o.groupBy("o_orderpriority").agg(
        F.count(F.when(F.col("o_orderstatus") == "F", 1)).alias("n_f"),
        F.count(F.when(F.col("o_orderstatus") == "O", 1)).alias("n_o"),
        F.count(F.when(F.col("o_orderstatus") == "P", 1)).alias("n_p"),
        F.sum(
            F.when(
                F.col("o_orderstatus") == "F",
                F.col("o_totalprice").cast("decimal(18,2)"),
            )
        )
        .cast("double")
        .alias("sum_f"),
    )


@register(
    "join_range_interval",
    oracle="""
    WITH promos AS (
      SELECT CAST(i.i AS INTEGER) AS promo_id,
             TIMESTAMP '2024-01-01 00:00:00' + i.i * INTERVAL 60 HOUR AS start_ts,
             TIMESTAMP '2024-01-01 00:00:00' + i.i * INTERVAL 60 HOUR
               + (36 + (i.i % 5) * 12) * INTERVAL 1 HOUR AS end_ts
      FROM UNNEST(range(0, 12)) AS i(i)
    )
    SELECT p.promo_id,
           CAST(p.start_ts AS VARCHAR) AS start_ts,
           CAST(COUNT(e.event_id) AS BIGINT) AS n_events,
           CAST(COALESCE(SUM(CAST(e.value AS DECIMAL(18,2))), 0) AS DOUBLE)
             AS sum_value
    FROM promos p
    LEFT JOIN events e ON e.ts >= p.start_ts AND e.ts < p.end_ts
    GROUP BY p.promo_id, p.start_ts
    """,
    doc="Point-in-interval RANGE join via day-bucketization (the classic "
    "operator Hive 1.2 could only run as a reducer-side theta join — "
    "ql/exec/CommonJoinOperator.java residual-filter path — and naive "
    "Spark runs as BroadcastNestedLoopJoin): 12 overlapping promotion "
    "windows (60 h cadence, 36-84 h spans, so events match 0..2 promos) "
    "joined to events on ts IN [start, end). Scale plan: each interval "
    "EXPLODES into its covered calendar days (sequence(), bounded fan-out "
    "= interval length in days), the join becomes an EQUI-join on the day "
    "bucket with the range predicate left as a residual filter — shuffle "
    "keyed by day, never a cartesian (plan-asserted in "
    "tests/test_plan_shapes.py). A promo with zero events survives via "
    "the final left join from the promo roster. At 100 TB the same shape "
    "handles billions of points against thousands of intervals; for "
    "long intervals bucket by week instead (fan-out/selectivity dial).",
    tags=("join", "range", "interval"),
)
def join_range_interval(spark: SparkSession, sf_dir: str) -> DataFrame:
    promos = (
        spark.range(12)
        .select(F.col("id").cast("int").alias("promo_id"))
        .select(
            "promo_id",
            F.expr(
                "timestamp'2024-01-01 00:00:00'"
                " + make_interval(0, 0, 0, 0, promo_id * 60, 0, 0)"
            ).alias("start_ts"),
            F.expr(
                "timestamp'2024-01-01 00:00:00'"
                " + make_interval(0, 0, 0, 0, promo_id * 60 + 36 + (promo_id % 5) * 12, 0, 0)"
            ).alias("end_ts"),
        )
    )
    # Bucketize: one row per (promo, covered day). Fan-out per interval is
    # ceil(span/1d)+1 <= 5 here — bounded by interval length, not data.
    promo_days = promos.select(
        "promo_id",
        "start_ts",
        "end_ts",
        F.explode(
            F.sequence(
                F.to_date("start_ts"), F.to_date("end_ts"), F.expr("interval 1 day")
            )
        ).alias("day"),
    )
    e = load_table(spark, sf_dir, "events").select("event_id", "ts", "value")
    matched = e.join(
        broadcast(promo_days),
        (F.to_date(F.col("ts")) == F.col("day"))
        & (F.col("ts") >= F.col("start_ts"))
        & (F.col("ts") < F.col("end_ts")),
    )
    per_promo = matched.groupBy("promo_id").agg(
        F.count(F.lit(1)).alias("n_ev"), F.sum(dec("value")).alias("sv")
    )
    return (
        promos.join(per_promo, "promo_id", "left")
        .select(
            "promo_id",
            F.col("start_ts").cast("string").alias("start_ts"),
            F.coalesce("n_ev", F.lit(0)).cast("long").alias("n_events"),
            F.coalesce(F.col("sv"), F.lit(0).cast("decimal(18,2)"))
            .cast("double")
            .alias("sum_value"),
        )
    )


@register(
    "subquery_not_in_null_trap",
    oracle="""
    WITH probe AS (
      SELECT c_custkey, c_mktsegment FROM customer
    ),
    sub_with_null AS (
      SELECT CASE WHEN o_orderkey % 100 = 0 THEN NULL
                  ELSE o_custkey END AS k
      FROM orders
    ),
    sub_no_null AS (SELECT k FROM sub_with_null WHERE k IS NOT NULL)
    SELECT
      CAST((SELECT COUNT(*) FROM probe
            WHERE c_custkey NOT IN (SELECT k FROM sub_with_null))
        AS BIGINT) AS n_not_in_with_null,
      CAST((SELECT COUNT(*) FROM probe
            WHERE c_custkey NOT IN (SELECT k FROM sub_no_null))
        AS BIGINT) AS n_not_in_no_null,
      CAST((SELECT COUNT(*) FROM probe p
            WHERE NOT EXISTS (SELECT 1 FROM sub_with_null s
                              WHERE s.k = p.c_custkey))
        AS BIGINT) AS n_not_exists
    """,
    doc="The NOT IN null trap, pinned as a query (the single most common "
    "silent-wrong-answer in SQL migrations, and a real Hive-parity "
    "semantic: three-valued logic makes `x NOT IN (subquery)` yield ZERO "
    "rows the moment the subquery contains one NULL, because x <> NULL "
    "is UNKNOWN for every x): the same probe evaluated three ways — "
    "NOT IN against a null-bearing subquery (must be 0), NOT IN against "
    "the null-filtered subquery, and NOT EXISTS (null-immune; must equal "
    "the filtered NOT IN). Spark compiles the null-bearing form to a "
    "null-aware anti join (the expensive one) — which is WHY the "
    "migration guidance is 'use NOT EXISTS': identical answers when the "
    "key is non-nullable, a plain LeftAnti plan, and no surprise empty "
    "result.",
    tags=("join", "subquery", "nulls", "sql"),
)
def subquery_not_in_null_trap(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer").select("c_custkey")
    o = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    c.createOrReplaceTempView("nt_probe")
    o.selectExpr(
        "CASE WHEN o_orderkey % 100 = 0 THEN NULL ELSE o_custkey END AS k"
    ).createOrReplaceTempView("nt_sub")
    return spark.sql(
        """
        SELECT
          CAST((SELECT COUNT(*) FROM nt_probe
                WHERE c_custkey NOT IN (SELECT k FROM nt_sub))
            AS BIGINT) AS n_not_in_with_null,
          CAST((SELECT COUNT(*) FROM nt_probe
                WHERE c_custkey NOT IN (SELECT k FROM nt_sub
                                        WHERE k IS NOT NULL))
            AS BIGINT) AS n_not_in_no_null,
          CAST((SELECT COUNT(*) FROM nt_probe p
                WHERE NOT EXISTS (SELECT 1 FROM nt_sub s
                                  WHERE s.k = p.c_custkey))
            AS BIGINT) AS n_not_exists
        """
    )


@register(
    "join_dynamic_partition_pruning",
    oracle="""
    SELECT n.n_name,
           CAST(COUNT(*) AS BIGINT) AS n_items,
           CAST(SUM(CAST(FLOOR(l.l_extendedprice * 100) AS BIGINT))
             AS BIGINT) AS price_cents,
           TRUE AS dpp_in_plan
    FROM lineitem l
    JOIN supplier s ON l.l_suppkey = s.s_suppkey
    JOIN nation n ON s.s_nationkey = n.n_nationkey
    WHERE n.n_regionkey = 1
    GROUP BY n.n_name
    """,
    doc="DYNAMIC partition pruning — the runtime completion of Hive 1.2's "
    "static PartitionPruner.java (1.2 could prune `WHERE part_col = lit` "
    "at compile time but re-scanned every partition when the partition "
    "keys came from a JOIN; users hand-inlined the key list): the fact "
    "side is written partitionBy(s_nationkey), the dimension filter "
    "(region 1 nations) is only known at runtime, and Spark's DPP turns "
    "the broadcast dim into a partition filter — the scan's plan carries "
    "`dynamicpruningexpression(s_nationkey IN dynamicpruning#N)`, "
    "asserted IN-QUERY as the dpp_in_plan flag (same self-certifying "
    "style as hive_bucketed_read_prune's files_opened). At 100 TB this "
    "is the difference between scanning 5/25 nation partitions and all "
    "of them whenever the partition predicate arrives through a "
    "dimension table — the single biggest practical win of moving a "
    "Hive-1.2 star-schema workload onto Spark.",
    tags=("join", "partition", "source"),
)
def join_dynamic_partition_pruning(spark: SparkSession, sf_dir: str) -> DataFrame:
    from apache_hive_1_2_2_src_spark.sources.io import _tmp

    fact_dir = _tmp("dpp_fact")
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_extendedprice", "l_suppkey"
    )
    s = load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    li.join(s, li.l_suppkey == s.s_suppkey).write.mode("overwrite").partitionBy(
        "s_nationkey"
    ).parquet(fact_dir)
    fact = spark.read.parquet(fact_dir)
    dim = (
        load_table(spark, sf_dir, "nation")
        .filter(F.col("n_regionkey") == 1)
        .select("n_nationkey", "n_name")
    )
    joined = fact.join(broadcast(dim), fact.s_nationkey == dim.n_nationkey)
    out = joined.groupBy("n_name").agg(
        F.count(F.lit(1)).alias("n_items"),
        F.sum(F.floor(F.col("l_extendedprice") * 100).cast("long"))
        .cast("long")
        .alias("price_cents"),
    )
    plan = out._jdf.queryExecution().executedPlan().toString()
    dpp = "dynamicpruningexpression" in plan.lower()
    return out.withColumn("dpp_in_plan", F.lit(dpp))
