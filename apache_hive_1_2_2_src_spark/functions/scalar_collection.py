"""Collection (complex-type) functions: array / map / struct constructors and
accessors (SURVEY.md §2.8 "Collection").

Hive parity targets (``ql/udf/generic/``): GenericUDFArray, GenericUDFMap,
GenericUDFStruct/NamedStruct, GenericUDFSize, GenericUDFArrayContains,
GenericUDFSortArray, GenericUDFMapKeys/MapValues, GenericUDFIndex (a[i],
m['k'], s.field). q-test parity: udf_array.q, udf_map.q, udf_struct.q,
udf_size.q, udf_sort_array.q, udf_array_contains.q.

Determinism: raw MAP/STRUCT columns are never returned (Python client
representations differ between Spark and DuckDB); every query projects
scalars or sorted arrays extracted from them instead.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from apache_hive_1_2_2_src_spark.registry import register
from apache_hive_1_2_2_src_spark.tables import load_table

_SQL_WORDS = "list_filter(string_split(text, ' '), x -> x <> '')"


@register(
    "collection_array_suite",
    oracle=f"""
    WITH d AS (SELECT doc_id, {_SQL_WORDS} AS w FROM documents WHERE doc_id < 200)
    SELECT doc_id,
           len(w) AS n_tokens,
           array_to_string(list_sort(w[1:5]), ',') AS first5_sorted,
           list_contains(w, 'spark') AS has_spark,
           w[1] AS first_word,
           len(list_distinct(w)) AS n_distinct,
           array_to_string(w[1:3], '-') AS joined3
    FROM d
    """,
    doc="array fns: size/sort_array/array_contains/index/array_distinct/"
    "concat_ws (GenericUDFSize, GenericUDFSortArray, GenericUDFArrayContains, "
    "GenericUDFIndex). slice+sort output is deterministic.",
    tags=("functions", "collection"),
)
def collection_array_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") < 200)
    w = F.filter(F.split(F.col("text"), " "), lambda x: x != "")
    d = d.select("doc_id", w.alias("w"))
    return d.select(
        "doc_id",
        F.size("w").alias("n_tokens"),
        F.array_join(F.sort_array(F.slice("w", 1, 5)), ",").alias("first5_sorted"),
        F.array_contains("w", "spark").alias("has_spark"),
        F.element_at("w", 1).alias("first_word"),
        F.size(F.array_distinct("w")).alias("n_distinct"),
        F.array_join(F.slice("w", 1, 3), "-").alias("joined3"),
    )


@register(
    "collection_map_suite",
    oracle="""
    WITH e AS (
      SELECT event_id,
             map(['type','uid'], [event_type, CAST(user_id AS VARCHAR)]) AS m
      FROM events WHERE event_id < 300
    )
    SELECT event_id,
           cardinality(m) AS m_size,
           array_to_string(list_sort(map_keys(m)), ',') AS keys_sorted,
           array_to_string(list_sort(map_values(m)), ',') AS vals_sorted,
           map_extract(m, 'type')[1] AS type_val
    FROM e
    """,
    doc="map fns: map()/size/map_keys/map_values/m['k'] (GenericUDFMap, "
    "GenericUDFMapKeys, GenericUDFMapValues, GenericUDFIndex map branch).",
    tags=("functions", "collection"),
)
def collection_map_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events").filter(F.col("event_id") < 300)
    m = F.create_map(
        F.lit("type"), F.col("event_type"), F.lit("uid"), F.col("user_id").cast("string")
    )
    e = e.select("event_id", m.alias("m"))
    return e.select(
        "event_id",
        F.size("m").alias("m_size"),
        F.array_join(F.sort_array(F.map_keys("m")), ",").alias("keys_sorted"),
        F.array_join(F.sort_array(F.map_values("m")), ",").alias("vals_sorted"),
        F.element_at("m", F.lit("type")).alias("type_val"),
    )


@register(
    "collection_struct_suite",
    oracle="""
    WITH s AS (
      SELECT struct_pack(name := c_name, bal := CAST(c_acctbal AS DOUBLE),
                         seg := c_mktsegment) AS st
      FROM customer WHERE c_custkey <= 400
    )
    SELECT st.name AS name, st.bal AS bal, upper(st.seg) AS seg_up
    FROM s
    """,
    doc="struct/named_struct + s.field access (GenericUDFStruct, "
    "GenericUDFNamedStruct, GenericUDFIndex struct branch).",
    tags=("functions", "collection"),
)
def collection_struct_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer").filter(F.col("c_custkey") <= 400)
    st = F.struct(
        F.col("c_name").alias("name"),
        F.col("c_acctbal").cast("double").alias("bal"),
        F.col("c_mktsegment").alias("seg"),
    )
    c = c.select(st.alias("st"))
    return c.select(
        F.col("st.name").alias("name"),
        F.col("st.bal").alias("bal"),
        F.upper(F.col("st.seg")).alias("seg_up"),
    )


@register(
    "collection_array_hof_suite",
    oracle=f"""
    WITH d AS (SELECT doc_id, {_SQL_WORDS} AS w FROM documents WHERE doc_id < 150)
    SELECT doc_id,
           len(list_filter(w, x -> len(x) > 4)) AS n_long,
           array_to_string(list_transform(w[1:4], x -> upper(x)), ',') AS up4,
           CAST(list_sum(list_transform(w, x -> len(x))) AS BIGINT) AS total_chars
    FROM d
    """,
    doc="Higher-order array fns (filter/transform/aggregate) — the Spark-"
    "native replacement for Hive's per-element UDF loops; stays in codegen "
    "instead of row-at-a-time Java calls (GenericUDF*.evaluate).",
    tags=("functions", "collection", "hof"),
)
def collection_array_hof_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") < 150)
    w = F.filter(F.split(F.col("text"), " "), lambda x: x != "")
    d = d.select("doc_id", w.alias("w"))
    return d.select(
        "doc_id",
        F.size(F.filter("w", lambda x: F.length(x) > 4)).alias("n_long"),
        F.array_join(F.transform(F.slice("w", 1, 4), lambda x: F.upper(x)), ",").alias("up4"),
        F.aggregate(
            F.transform("w", lambda x: F.length(x).cast("bigint")),
            F.lit(0).cast("bigint"),
            lambda acc, x: acc + x,
        ).alias("total_chars"),
    )
