"""Conditional / null-handling / cast inventory (SURVEY.md §2.8).

Hive sources: ``GenericUDFIf``, ``GenericUDFCase``/``GenericUDFWhen``,
``GenericUDFCoalesce``, ``GenericUDFNvl``, ``GenericUDFOPNull/NotNull``,
per-type casts ``GenericUDFTo*``/``UDFTo*``.

Hive 1.2 NULL-on-bad-cast semantics (``LazyPrimitive.parse``) are Spark's
non-ANSI cast behavior — `session.py` pins spark.sql.ansi.enabled=false.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from apache_hive_1_2_2_src_spark.registry import register
from apache_hive_1_2_2_src_spark.tables import load_table


@register(
    "cond_if_case_coalesce",
    oracle="""
    SELECT o_orderkey,
           CASE WHEN o_totalprice > 200000 THEN 'big' ELSE 'small' END AS if_tag,
           CASE o_orderstatus WHEN 'F' THEN 'finished' WHEN 'O' THEN 'open'
                ELSE 'other' END AS status_word,
           CASE WHEN o_totalprice > 300000 THEN 3
                WHEN o_totalprice > 150000 THEN 2 ELSE 1 END AS tier,
           COALESCE(NULLIF(o_orderpriority, '1-URGENT'), 'URGENT!') AS prio_swap,
           COALESCE(NULL, NULL, o_orderstatus) AS first_nonnull,
           (CASE WHEN o_orderkey % 10 = 0 THEN NULL ELSE o_orderkey END IS NULL) AS isn,
           COALESCE(CASE WHEN o_orderkey % 10 = 0 THEN NULL ELSE o_orderkey END, -1) AS nvl_key
    FROM orders WHERE o_orderkey <= 1000
    """,
    doc="if/CASE-simple/CASE-searched/coalesce/nvl/isnull (GenericUDFIf/"
    "Case/When/Coalesce/Nvl). NULLs manufactured via key%10.",
    tags=("functions", "conditional"),
)
def cond_if_case_coalesce(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders").filter(F.col("o_orderkey") <= 1000)
    nullable_key = F.when(F.col("o_orderkey") % 10 == 0, None).otherwise(F.col("o_orderkey"))
    return o.select(
        "o_orderkey",
        F.when(F.col("o_totalprice") > 200000, "big").otherwise("small").alias("if_tag"),
        F.when(F.col("o_orderstatus") == "F", "finished")
        .when(F.col("o_orderstatus") == "O", "open")
        .otherwise("other")
        .alias("status_word"),
        F.when(F.col("o_totalprice") > 300000, 3)
        .when(F.col("o_totalprice") > 150000, 2)
        .otherwise(1)
        .alias("tier"),
        F.coalesce(
            F.nullif(F.col("o_orderpriority"), F.lit("1-URGENT")), F.lit("URGENT!")
        ).alias("prio_swap"),
        F.coalesce(F.lit(None), F.lit(None), F.col("o_orderstatus")).alias("first_nonnull"),
        nullable_key.isNull().alias("isn"),
        F.coalesce(nullable_key, F.lit(-1)).alias("nvl_key"),
    )


@register(
    "cast_suite",
    oracle="""
    SELECT o_orderkey,
           CAST(trunc(o_totalprice) AS BIGINT) AS price_int,
           CAST(CAST(o_totalprice AS DECIMAL(18,2)) AS VARCHAR) AS price_dec,
           CAST(o_totalprice AS VARCHAR) AS price_str,
           CAST(o_orderkey AS DOUBLE) AS key_dbl,
           CAST(CAST(o_orderkey AS VARCHAR) AS BIGINT) AS key_roundtrip,
           TRY_CAST('not-a-number' AS BIGINT) AS bad_cast,
           CAST(o_orderkey % 2 AS BOOLEAN) AS as_bool,
           CAST(strftime(o_orderdate, '%Y-%m-%d') AS VARCHAR) AS date_str,
           CAST(CAST(o_orderdate AS DATE) AS VARCHAR) AS date_cast_str
    FROM orders WHERE o_orderkey <= 1000
    """,
    doc="cast matrix (GenericUDFTo*/UDFTo*): double→bigint truncation, "
    "decimal, string roundtrip, NULL-on-bad-cast (Hive LazyPrimitive "
    "semantics ≡ Spark non-ANSI cast ≡ DuckDB TRY_CAST), int→boolean.",
    tags=("functions", "cast"),
)
def cast_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders").filter(F.col("o_orderkey") <= 1000)
    return o.select(
        "o_orderkey",
        F.col("o_totalprice").cast("bigint").alias("price_int"),
        # decimal → string: pandas-side harnesses read Spark decimals as
        # Decimal objects but DuckDB decimals as float64 ('100.50' vs '100.5')
        F.col("o_totalprice").cast("decimal(18,2)").cast("string").alias("price_dec"),
        F.col("o_totalprice").cast("string").alias("price_str"),
        F.col("o_orderkey").cast("double").alias("key_dbl"),
        F.col("o_orderkey").cast("string").cast("bigint").alias("key_roundtrip"),
        F.lit("not-a-number").cast("bigint").alias("bad_cast"),
        (F.col("o_orderkey") % 2).cast("boolean").alias("as_bool"),
        F.date_format("o_orderdate", "yyyy-MM-dd").alias("date_str"),
        F.col("o_orderdate").cast("date").cast("string").alias("date_cast_str"),
    )


@register(
    "null_semantics_suite",
    oracle="""
    WITH t AS (
      SELECT c_custkey,
             CASE WHEN c_custkey % 3 = 0 THEN NULL ELSE c_acctbal END AS b
      FROM customer WHERE c_custkey <= 300
    )
    SELECT c_custkey,
           b IS NULL AS is_n,
           b IS NOT DISTINCT FROM NULL AS nse_null,
           b IS NOT DISTINCT FROM b AS nse_self,
           CAST(NULL = 1 AS BOOLEAN) AS cmp_null,
           COALESCE(CAST(b AS DOUBLE), -1) AS coalesced,
           CASE WHEN b IS NULL THEN 'missing' ELSE 'present' END AS tagged,
           (CAST(b AS DOUBLE) > 0 AND NULL) IS NULL AS threeval_and
    FROM t
    """,
    doc="NULL semantics (Hive three-valued logic; GenericUDFOPEqualNS "
    "null-safe <=>, udf_isnull.q, udf_coalesce.q): IS NULL, the null-safe "
    "equality operator <=> (literal HiveQL token, Spark parses it "
    "verbatim; ≡ DuckDB IS NOT DISTINCT FROM), NULL-propagating "
    "comparisons, COALESCE defaults, CASE-on-null, and three-valued AND "
    "(x AND NULL is NULL unless x is FALSE — checked where x is TRUE).",
    tags=("functions", "conditional", "null", "sql"),
)
def null_semantics_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    load_table(spark, sf_dir, "customer").filter(
        F.col("c_custkey") <= 300
    ).createOrReplaceTempView("customer_nulls")
    return spark.sql(
        """
        WITH t AS (
          SELECT c_custkey,
                 CASE WHEN c_custkey % 3 = 0 THEN NULL ELSE c_acctbal END AS b
          FROM customer_nulls
        )
        SELECT c_custkey,
               b IS NULL AS is_n,
               b <=> NULL AS nse_null,
               b <=> b AS nse_self,
               CAST(NULL = 1 AS BOOLEAN) AS cmp_null,
               COALESCE(CAST(b AS DOUBLE), -1) AS coalesced,
               CASE WHEN b IS NULL THEN 'missing' ELSE 'present' END AS tagged,
               (CAST(b AS DOUBLE) > 0 AND NULL) IS NULL AS threeval_and
        FROM t
        """
    )
