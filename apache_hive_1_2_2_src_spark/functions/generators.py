"""UDTF / generator functions: explode, posexplode, inline, stack, json_tuple
and LATERAL-VIEW-style query shapes (SURVEY.md §2.9).

Hive parity targets:
- ``ql/udf/generic/GenericUDTFExplode.java`` / ``GenericUDTFPosExplode.java``:
  array/map explosion — Spark ``F.explode`` / ``F.posexplode`` (generators run
  inside whole-stage codegen; Hive's ``UDTFOperator.java`` forwarded row
  objects one at a time).
- ``LateralViewForwardOperator.java`` + ``LateralViewJoinOperator.java``:
  LATERAL VIEW [OUTER] joins each input row with the UDTF output — Spark
  ``select(cols..., explode(...))`` / ``explode_outer`` keeps the exact
  semantics including null-row preservation for OUTER.
- ``GenericUDTFInline.java`` (inline(array<struct>)), ``GenericUDTFStack.java``
  (stack(n, ...)), ``GenericUDTFJSONTuple.java`` (json_tuple).

Scale notes: explode is a per-partition flatMap — no shuffle; the only shuffle
in these queries is the final groupBy/orderBy where declared. At 100 TB the
explode fan-out multiplies rows ~40× here, so the downstream agg relies on
map-side partial aggregation to keep shuffle volume at ~|distinct words|.

q-test parity: lateral_view.q, udf_explode.q, udtf_stack.q, udtf_json_tuple.q.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from apache_hive_1_2_2_src_spark.registry import register
from apache_hive_1_2_2_src_spark.tables import load_table


def _words(col: str = "text"):
    """Whitespace tokens with empties dropped (both engines agree)."""
    return F.filter(F.split(F.col(col), " "), lambda x: x != "")


_SQL_WORDS = "list_filter(string_split(text, ' '), x -> x <> '')"


@register(
    "explode_words",
    oracle=f"""
    SELECT doc_id, unnest({_SQL_WORDS}) AS word
    FROM documents
    WHERE doc_id < 50
    """,
    doc="explode(array) — GenericUDTFExplode.java; LATERAL VIEW shape "
    "(LateralViewJoinOperator.java, q-test lateral_view.q).",
    tags=("udtf",),
)
def explode_words(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") < 50)
    return d.select("doc_id", F.explode(_words()).alias("word"))


@register(
    "posexplode_words",
    oracle=f"""
    SELECT doc_id,
           unnest(range(len({_SQL_WORDS}))) AS pos,
           unnest({_SQL_WORDS}) AS word
    FROM documents
    WHERE doc_id < 30
    """,
    doc="posexplode(array) — GenericUDTFPosExplode.java; 0-based position "
    "column exactly as Hive emits.",
    tags=("udtf",),
)
def posexplode_words(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") < 30)
    return d.select("doc_id", F.posexplode(_words()).alias("pos", "word"))


@register(
    "explode_map_kv",
    oracle="""
    SELECT event_id, 'type' AS k, event_type AS v FROM events WHERE event_id < 200
    UNION ALL
    SELECT event_id, 'uid' AS k, CAST(user_id AS VARCHAR) AS v FROM events WHERE event_id < 200
    """,
    doc="explode(map) → (key, value) rows — GenericUDTFExplode.java map "
    "branch; map built inline (GenericUDFMap).",
    tags=("udtf", "map"),
)
def explode_map_kv(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events").filter(F.col("event_id") < 200)
    m = F.create_map(
        F.lit("type"), F.col("event_type"), F.lit("uid"), F.col("user_id").cast("string")
    )
    return e.select("event_id", F.explode(m).alias("k", "v"))


@register(
    "lateral_view_outer_nulls",
    oracle=f"""
    SELECT doc_id, unnest({_SQL_WORDS}) AS word
    FROM documents WHERE doc_id < 40 AND lang = 'en'
    UNION ALL
    SELECT doc_id, NULL AS word
    FROM documents WHERE doc_id < 40 AND lang <> 'en'
    """,
    doc="LATERAL VIEW OUTER: explode_outer keeps rows whose array is NULL "
    "(LateralViewJoinOperator.java outer branch; q-test lateral_view_outer.q). "
    "Non-en docs get a NULL word row instead of disappearing.",
    tags=("udtf",),
)
def lateral_view_outer_nulls(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") < 40)
    arr = F.when(F.col("lang") == "en", _words())  # else NULL array
    return d.select("doc_id", F.explode_outer(arr).alias("word"))


@register(
    "inline_structs",
    oracle="""
    SELECT s_suppkey, s_name AS label, CAST(s_acctbal AS DOUBLE) AS amount FROM supplier
    UNION ALL
    SELECT s_suppkey, 'flat' AS label, 0.0 AS amount FROM supplier
    """,
    doc="inline(array<struct>) — GenericUDTFInline.java: each struct becomes "
    "a row with the struct fields as columns.",
    tags=("udtf", "struct"),
)
def inline_structs(spark: SparkSession, sf_dir: str) -> DataFrame:
    s = load_table(spark, sf_dir, "supplier")
    arr = F.array(
        F.struct(F.col("s_name").alias("label"), F.col("s_acctbal").cast("double").alias("amount")),
        F.struct(F.lit("flat").alias("label"), F.lit(0.0).alias("amount")),
    )
    return s.select("s_suppkey", F.inline(arr))


@register(
    "stack_unpivot",
    oracle="""
    SELECT c_custkey, 'acctbal' AS metric, CAST(c_acctbal AS DOUBLE) AS val
    FROM customer WHERE c_custkey <= 300
    UNION ALL
    SELECT c_custkey, 'nationkey' AS metric, CAST(c_nationkey AS DOUBLE) AS val
    FROM customer WHERE c_custkey <= 300
    """,
    doc="stack(n, ...) — GenericUDTFStack.java; the Hive-1.2 unpivot idiom "
    "(no UNPIVOT syntax existed).",
    tags=("udtf",),
)
def stack_unpivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer").filter(F.col("c_custkey") <= 300)
    return c.select(
        "c_custkey",
        F.expr(
            "stack(2, 'acctbal', CAST(c_acctbal AS DOUBLE), "
            "'nationkey', CAST(c_nationkey AS DOUBLE))"
        ).alias("metric", "val"),
    )


@register(
    "json_tuple_extract",
    oracle="""
    SELECT event_id, json_extract_string(props, '$.k') AS k
    FROM events WHERE event_id < 500
    """,
    doc="json_tuple(props, 'k') — GenericUDTFJSONTuple.java (single-pass "
    "multi-key JSON extraction; q-test udtf_json_tuple.q).",
    tags=("udtf", "json"),
)
def json_tuple_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events").filter(F.col("event_id") < 500)
    return e.select("event_id", F.json_tuple(F.col("props"), "k").alias("k"))


@register(
    "lateral_view_word_count",
    oracle=f"""
    SELECT word, COUNT(*) AS n
    FROM (SELECT unnest({_SQL_WORDS}) AS word FROM documents)
    GROUP BY word
    ORDER BY n DESC, word
    LIMIT 20
    """,
    doc="LATERAL VIEW + GROUP BY: the canonical word-count over an exploded "
    "column. explode is per-partition (no shuffle); the groupBy shuffles "
    "only ~|vocab| rows thanks to map-side partial agg.",
    tags=("udtf", "agg"),
)
def lateral_view_word_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    return (
        d.select(F.explode(_words()).alias("word"))
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy(F.col("n").desc(), F.col("word"))
        .limit(20)
    )


@register(
    "lateral_view_sql",
    oracle=f"""
    SELECT doc_id, unnest({_SQL_WORDS}) AS word
    FROM documents
    WHERE doc_id < 20
    """,
    doc="Literal LATERAL VIEW syntax (grammar lateralView; q-test "
    "lateral_view.q): Spark SQL parses the exact HiveQL text — proof the "
    "SQL entry point (SURVEY §3 Entry B ≡ spark.sql) accepts the dialect, "
    "not just the DataFrame DSL.",
    tags=("udtf", "sql"),
)
def lateral_view_sql(spark: SparkSession, sf_dir: str) -> DataFrame:
    load_table(spark, sf_dir, "documents").createOrReplaceTempView("documents_lv")
    return spark.sql(
        """
        SELECT doc_id, word
        FROM documents_lv
        LATERAL VIEW explode(filter(split(text, ' '), x -> x != '')) t AS word
        WHERE doc_id < 20
        """
    )


@register(
    "parse_url_tuple",
    oracle="""
    WITH u AS (
      SELECT c_custkey,
             'http://shop.example.com/c/' || CAST(c_custkey AS VARCHAR)
             || '?seg=' || c_mktsegment || '&v=1' AS url
      FROM customer WHERE c_custkey <= 100)
    SELECT c_custkey,
           regexp_extract(url, '^[a-z]+://([^/?#]+)', 1) AS host,
           regexp_extract(url, '^[a-z]+://[^/?#]+([^?#]*)', 1) AS path,
           regexp_extract(url, '\\?(.*)$', 1) AS query,
           regexp_extract(url, '[?&]seg=([^&]*)', 1) AS seg
    FROM u
    """,
    doc="parse_url_tuple(url, 'HOST','PATH','QUERY','QUERY:seg') — the UDTF "
    "form (GenericUDTFParseUrlTuple.java: one pass over the URL emitting N "
    "columns; q-test udtf_parse_url_tuple.q). Spark-first: a single struct "
    "projection expanded with s.* — one codegen pass, N columns, the same "
    "single-parse contract as the Hive UDTF (vs N scalar parse_url calls).",
    tags=("udtf", "string"),
)
def parse_url_tuple(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer").filter(F.col("c_custkey") <= 100)
    u = c.select(
        "c_custkey",
        F.concat(
            F.lit("http://shop.example.com/c/"),
            F.col("c_custkey").cast("string"),
            F.lit("?seg="),
            F.col("c_mktsegment"),
            F.lit("&v=1"),
        ).alias("url"),
    )
    parts = F.struct(
        F.parse_url("url", F.lit("HOST")).alias("host"),
        F.parse_url("url", F.lit("PATH")).alias("path"),
        F.parse_url("url", F.lit("QUERY")).alias("query"),
        F.parse_url("url", F.lit("QUERY"), F.lit("seg")).alias("seg"),
    )
    return u.select("c_custkey", parts.alias("t")).select("c_custkey", "t.*")
