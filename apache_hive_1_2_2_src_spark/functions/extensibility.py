"""UDF/UDTF/script extensibility surface + leftover misc functions
(SURVEY.md §2.9, §2.8 type/misc).

Hive parity targets:
- Custom scalar UDF (``ql/exec/UDF.java`` / ``GenericUDF.java`` +
  ``CREATE TEMPORARY FUNCTION``, ``FunctionTask.java``) → a registered
  ``pandas_udf``: Arrow-vectorized batches, the Spark-native answer to
  Hive's row-at-a-time ``evaluate()`` calls (~10-100× less Python overhead
  than plain ``udf``).
- ``TRANSFORM ... USING 'script'`` (``ql/exec/ScriptOperator.java``, ~700
  LoC of subprocess piping) → ``mapInPandas``: the rows-through-user-code
  contract without process-per-task overhead.
- Named windows (``WINDOW w AS (...)``, ``ql/parse/WindowingSpec`` aliases)
  → Spark SQL WINDOW clause, verbatim syntax.
- ``sentences()`` (``GenericUDFSentences.java``) — text → array<array<
  string>>; no DuckDB twin → rows-only.
- xpath family (``ql/udf/xml/*.java``) — Spark keeps the same names;
  no DuckDB twin → rows-only.
- ``hash()`` (``GenericUDFHash`` — Hive's Java hash ≠ Spark murmur3) and
  ``crc32`` — engine-specific values → rows-only.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf

from apache_hive_1_2_2_src_spark.registry import register
from apache_hive_1_2_2_src_spark.tmputil import scratch_dir
from apache_hive_1_2_2_src_spark.tables import load_table


@register(
    "udf_pandas_scalar_demo",
    oracle="""
    SELECT o_orderkey,
           CAST(floor((o_totalprice * 0.07 +
                       CASE WHEN o_orderpriority LIKE '1%' THEN 5.0 ELSE 0.0 END)
                      * 100 + 0.5) / 100 AS DOUBLE) AS fee
    FROM orders
    WHERE o_orderkey < 2000
    """,
    doc="CREATE TEMPORARY FUNCTION parity: a custom scalar fn as an Arrow-"
    "vectorized pandas_udf (UDF.java / GenericUDF.evaluate → batched "
    "numpy math). Deterministic, so fully oracled — the [Q] proof that "
    "custom Python kernels can still be verified.",
    tags=("udf", "pandas_udf"),
)
def udf_pandas_scalar_demo(spark: SparkSession, sf_dir: str) -> DataFrame:
    @pandas_udf("double")
    def fee(price: pd.Series, priority: pd.Series) -> pd.Series:
        import numpy as np

        raw = price * 0.07 + priority.str.startswith("1") * 5.0
        # Half-up on the identical double math as the oracle (pandas .round
        # is banker's rounding — diverges on exact .xx5 values).
        return np.floor(raw * 100 + 0.5) / 100

    spark.udf.register("order_fee", fee)  # CREATE TEMPORARY FUNCTION analogue
    o = load_table(spark, sf_dir, "orders").filter(F.col("o_orderkey") < 2000)
    return o.select("o_orderkey", fee("o_totalprice", "o_orderpriority").alias("fee"))


@register(
    "script_transform_mapinpandas",
    oracle="""
    SELECT c_custkey,
           upper(c_mktsegment) AS seg,
           CAST(ROUND(c_acctbal * 2.0, 2) AS DOUBLE) AS doubled
    FROM customer
    WHERE c_custkey <= 500
    """,
    doc="TRANSFORM ... USING 'script' (ScriptOperator.java) re-expressed as "
    "mapInPandas: rows stream through user Python per Arrow batch — same "
    "contract as Hive's stdin/stdout script piping, minus the subprocess. "
    "Deterministic transform → fully oracled.",
    tags=("udf", "transform"),
)
def script_transform_mapinpandas(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer").filter(F.col("c_custkey") <= 500)
    c = c.select("c_custkey", "c_mktsegment", "c_acctbal")

    def transform(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield pd.DataFrame(
                {
                    "c_custkey": pdf["c_custkey"],
                    "seg": pdf["c_mktsegment"].str.upper(),
                    "doubled": (pdf["c_acctbal"] * 2.0).round(2),
                }
            )

    return c.mapInPandas(transform, "c_custkey bigint, seg string, doubled double")


@register(
    "window_named_sql",
    oracle="""
    SELECT s_suppkey,
           RANK() OVER w AS rk,
           CAST(SUM(CAST(s_acctbal AS DECIMAL(18,2))) OVER w AS DOUBLE) AS run_bal
    FROM supplier
    WINDOW w AS (PARTITION BY s_nationkey ORDER BY s_acctbal DESC, s_suppkey)
    """,
    doc="Named windows (WINDOW w AS ...; WindowingSpec aliases) — Spark SQL "
    "keeps the exact HiveQL syntax; one window definition shared by "
    "multiple functions compiles to a single Window exec.",
    tags=("window", "sql"),
)
def window_named_sql(spark: SparkSession, sf_dir: str) -> DataFrame:
    load_table(spark, sf_dir, "supplier").createOrReplaceTempView("supplier_v")
    return spark.sql(
        """
        SELECT s_suppkey,
               RANK() OVER w AS rk,
               CAST(SUM(CAST(s_acctbal AS DECIMAL(18,2))) OVER w AS DOUBLE) AS run_bal
        FROM supplier_v
        WINDOW w AS (PARTITION BY s_nationkey ORDER BY s_acctbal DESC, s_suppkey)
        """
    )


@register(
    "regex_serde_read",
    oracle="""
    SELECT n_nationkey, n_name, n_regionkey
    FROM nation
    """,
    doc="RegexSerDe (contrib/.../RegexSerDe.java): raw text lines parsed "
    "into columns with regexp_extract at read time — write '|'-delimited "
    "lines, read as text, extract the three fields by pattern.",
    tags=("source", "serde"),
)
def regex_serde_read(spark: SparkSession, sf_dir: str) -> DataFrame:
    n = load_table(spark, sf_dir, "nation")
    path = scratch_dir("regexserde") + "/nation_txt"
    n.select(
        F.concat_ws("|", F.col("n_nationkey"), F.col("n_name"), F.col("n_regionkey")).alias("value")
    ).write.mode("overwrite").text(path)
    raw = spark.read.text(path)
    pat = r"^([^|]*)\|([^|]*)\|([^|]*)$"
    return raw.select(
        F.regexp_extract("value", pat, 1).cast("bigint").alias("n_nationkey"),
        F.regexp_extract("value", pat, 2).alias("n_name"),
        F.regexp_extract("value", pat, 3).cast("bigint").alias("n_regionkey"),
    )


@register(
    "sentences_tokenize",
    # Round-5 [R]->[Q] flip: DuckDB has no sentences(), but the documents
    # corpus is punctuation-free space-separated words, so BreakIterator
    # word segmentation provably equals the whitespace tokenizer — both
    # counts reduce to the same relational expression. (If a regenerated
    # corpus ever adds punctuation, this mismatches loudly — by design.)
    oracle="""
    SELECT doc_id,
           CAST(len(list_filter(string_split(text, ' '), x -> x <> '')) AS INT)
             AS n_sentence_tokens,
           CAST(len(list_filter(string_split(text, ' '), x -> x <> '')) AS INT)
             AS n_ws_tokens
    FROM documents WHERE doc_id < 100
    """,
    doc="sentences(text) (GenericUDFSentences.java): locale-aware sentence/"
    "word segmentation to array<array<string>>; flattened token count "
    "compared row-wise against the whitespace tokenizer (equal on this "
    "punctuation-free corpus, which is what the oracle certifies).",
    tags=("functions", "text"),
)
def sentences_tokenize(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") < 100)
    return d.select(
        "doc_id",
        F.size(F.flatten(F.sentences("text"))).alias("n_sentence_tokens"),
        F.size(F.filter(F.split("text", " "), lambda x: x != "")).alias("n_ws_tokens"),
    )


@register(
    "xpath_suite",
    oracle="""
    SELECT n_nationkey,
           n_name AS x_name,
           n_nationkey AS x_key,
           TRUE AS has_r,
           n_nationkey || ',' || n_name || ',' || n_regionkey AS all_texts
    FROM nation
    """,
    doc="xpath family (ql/udf/xml/*.java): xpath_string/xpath_int/"
    "xpath_boolean/xpath(list) over XML synthesized from columns — Spark "
    "kept Hive's exact function names. DuckDB has no xpath, but because "
    "the XML is synthesized from table columns every extraction is "
    "reconstructible relationally, making the suite fully oracle-checkable "
    "(the list form is comma-joined in document order k,name,r).",
    tags=("functions", "xml"),
)
def xpath_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    n = load_table(spark, sf_dir, "nation")
    xml = (
        "concat('<n><k>', n_nationkey, '</k><name>', n_name, "
        "'</name><r>', n_regionkey, '</r></n>')"
    )
    return n.withColumn("xml", F.expr(xml)).select(
        "n_nationkey",
        F.expr("xpath_string(xml, '/n/name')").alias("x_name"),
        F.expr("xpath_int(xml, '/n/k')").alias("x_key"),
        F.expr("xpath_boolean(xml, '/n/r')").alias("has_r"),
        F.array_join(F.expr("xpath(xml, '/n/*/text()')"), ",").alias("all_texts"),
    )


@register(
    "hash_misc_rows_only",
    # Round-5 [R]->[Q] flip via invariant projection: hash VALUES are
    # engine-specific by design (Hive Java hashCode != Spark murmur3 !=
    # DuckDB hash), but the CONTRACT of a hash function is oracle-checkable:
    # determinism (equal inputs -> equal hashes, so #distinct hashes <=
    # #distinct inputs) plus, on this fixed 101-name corpus, injectivity
    # (no collisions — deterministic for a fixed corpus) and output ranges.
    oracle="""
    SELECT CAST(COUNT(*) AS BIGINT) AS n_rows,
           CAST(COUNT(DISTINCT c_name) AS BIGINT) AS n_names,
           TRUE AS murmur3_injective_here,
           TRUE AS xx64_injective_here,
           TRUE AS crc32_in_uint32_range
    FROM customer WHERE c_custkey <= 100
    """,
    doc="hash()/crc32/xxhash64 (GenericUDFHash, UDFCrc32): engine-specific "
    "values by design (Hive used Java's hashCode, Spark uses murmur3), so "
    "the oracle checks the hash-function CONTRACT instead of values: "
    "per-name determinism + collision-freedom on the fixed test corpus + "
    "crc32 uint32 range.",
    tags=("functions", "misc"),
)
def hash_misc_rows_only(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer").filter(F.col("c_custkey") <= 100)
    h = c.select(
        "c_name",
        "c_mktsegment",
        F.hash("c_name", "c_mktsegment").alias("h_murmur3"),
        F.crc32(F.col("c_name").cast("binary")).alias("h_crc32"),
        F.xxhash64("c_name").alias("h_xx64"),
    )
    return h.agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.countDistinct("c_name").alias("n_names"),
        (F.countDistinct("h_murmur3") == F.countDistinct("c_name", "c_mktsegment")).alias(
            "murmur3_injective_here"
        ),
        (F.countDistinct("h_xx64") == F.countDistinct("c_name")).alias(
            "xx64_injective_here"
        ),
        ((F.min("h_crc32") >= 0) & (F.max("h_crc32") <= F.lit(4294967295))).alias(
            "crc32_in_uint32_range"
        ),
    )


@register(
    "str_leftover_fns",
    oracle="""
    SELECT c_custkey,
           strpos(c_name, 'er') AS pos_er,
           decode(from_base64(to_base64(encode(c_mktsegment)))) AS seg_rt,
           c_custkey >> 2 AS srlu,
           c_name IS NOT NULL AS nn
    FROM customer
    WHERE c_custkey <= 200
    """,
    doc="Inventory stragglers: locate (GenericUDFLocate), unbase64 "
    "(GenericUDFUnbase64) via a base64 roundtrip, shiftrightunsigned "
    "(UDFOPBitShift; == >> on non-negative keys), isnotnull.",
    tags=("functions", "string"),
)
def str_leftover_fns(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer").filter(F.col("c_custkey") <= 200)
    return c.select(
        "c_custkey",
        F.locate("er", "c_name").alias("pos_er"),
        F.expr("CAST(unbase64(base64(CAST(c_mktsegment AS BINARY))) AS STRING)").alias("seg_rt"),
        F.expr("shiftrightunsigned(c_custkey, 2)").alias("srlu"),
        F.expr("isnotnull(c_name)").alias("nn"),
    )


@register(
    "script_transform_sql",
    oracle="""
    SELECT CAST(n_nationkey AS VARCHAR) AS k, n_name AS name
    FROM nation
    """,
    doc="Literal TRANSFORM ... USING 'cat' (ScriptOperator.java + grammar "
    "trfmClause): Spark SQL runs the exact HiveQL script-transform syntax "
    "— rows serialized to the child process stdin, stdout parsed back by "
    "the declared AS schema. 'cat' is the identity script, so the result "
    "is the string-typed projection and fully oracled.",
    tags=("udf", "transform", "sql"),
)
def script_transform_sql(spark: SparkSession, sf_dir: str) -> DataFrame:
    load_table(spark, sf_dir, "nation").createOrReplaceTempView("nation_scr")
    return spark.sql(
        """
        SELECT TRANSFORM(n_nationkey, n_name)
               USING 'cat' AS (k STRING, name STRING)
        FROM nation_scr
        """
    )


@register(
    "udaf_pandas_grouped_demo",
    oracle="""
    SELECT o_orderstatus,
           CAST(floor(SUM(o_totalprice * (o_orderkey % 7 + 1)) /
                      SUM(o_orderkey % 7 + 1) * 100 + 0.5) / 100 AS DOUBLE)
             AS wmean_price
    FROM orders
    GROUP BY o_orderstatus
    """,
    doc="Custom aggregate (GenericUDAFEvaluator / UDAF protocol) as an "
    "Arrow-vectorized GROUPED_AGG pandas_udf: a weighted mean no builtin "
    "provides, computed per group from numpy batches. Hive's "
    "PARTIAL1/PARTIAL2/FINAL evaluator modes map onto Spark's "
    "partial/merge/final aggregate planning automatically. Half-up "
    "rounding pinned as in the scalar UDF demo.",
    tags=("udf", "pandas_udf", "agg"),
)
def udaf_pandas_grouped_demo(spark: SparkSession, sf_dir: str) -> DataFrame:
    import numpy as np

    @pandas_udf("double")
    def wmean(price: pd.Series, weight: pd.Series) -> float:
        return float(np.floor((price * weight).sum() / weight.sum() * 100 + 0.5) / 100)

    o = load_table(spark, sf_dir, "orders").withColumn(
        "wt", (F.col("o_orderkey") % 7 + 1).cast("double")
    )
    return o.groupBy("o_orderstatus").agg(
        wmean("o_totalprice", "wt").alias("wmean_price")
    )


@register(
    "script_reduce_sql",
    oracle="""
    SELECT CAST(o_custkey AS VARCHAR) AS custkey,
           CAST(o_orderkey AS VARCHAR) AS orderkey
    FROM orders
    WHERE o_totalprice >= 100000
    """,
    doc="The canonical Hive 'custom reducer' idiom — literal "
    "`FROM (... DISTRIBUTE BY k SORT BY k, s) t SELECT TRANSFORM(...) "
    "USING 'script'` (ScriptOperator.java downstream of genReduceSinkPlan: "
    "the distribute/sort clause hands the script per-key ordered groups, "
    "exactly how pre-UDAF Hive users wrote sessionizers and "
    "state-machines in Python/awk). Spark SQL accepts the nested form "
    "verbatim: the inner clause compiles to a hash Exchange + "
    "per-partition Sort, the TRANSFORM to ScriptTransformation over it — "
    "each script instance sees its keys contiguous and ordered, the "
    "contract custom reducers rely on. 'cat' keeps it oracled (identity "
    "over the distributed rows == the plain filtered projection, "
    "order-insensitive compare).",
    tags=("udf", "transform", "sql", "sort"),
)
def script_reduce_sql(spark: SparkSession, sf_dir: str) -> DataFrame:
    load_table(spark, sf_dir, "orders").createOrReplaceTempView("orders_scrr")
    return spark.sql(
        """
        FROM (
          SELECT o_custkey, o_orderkey
          FROM orders_scrr
          WHERE o_totalprice >= 100000
          DISTRIBUTE BY o_custkey SORT BY o_custkey, o_orderkey
        ) t
        SELECT TRANSFORM(t.o_custkey, t.o_orderkey)
               USING 'cat' AS (custkey STRING, orderkey STRING)
        """
    )


@register(
    "sql_variable_substitution",
    oracle="""
    SELECT o_orderstatus,
           COUNT(*) AS n,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total
    FROM orders
    WHERE o_totalprice < 150000 AND o_orderstatus = 'F'
    GROUP BY o_orderstatus
    """,
    doc="Hive variable substitution (`hivevar`/`hiveconf` namespaces, "
    "`${...}` expansion — `common/.../VariableSubstitution.java`, wired "
    "into CliDriver/Driver preprocessing): Spark SQL implements the same "
    "preprocessor (`spark.sql.variable.substitute`, on by default) with "
    "the same namespaces, so `SET hivevar:cutoff=...` then "
    "`WHERE x < ${hivevar:cutoff}` runs verbatim — the parameterized-"
    "script idiom every production Hive job uses. Substitution is pure "
    "TEXT expansion before parsing (exactly Hive's semantics), so the "
    "oracle is the query with the values inlined.",
    tags=("sql", "dialect", "variables"),
)
def sql_variable_substitution(spark: SparkSession, sf_dir: str) -> DataFrame:
    load_table(spark, sf_dir, "orders").createOrReplaceTempView("orders_vsub")
    spark.sql("SET hivevar:cutoff=150000")
    spark.sql("SET hivevar:status=F")
    return spark.sql(
        """
        SELECT o_orderstatus,
               COUNT(*) AS n,
               CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total
        FROM orders_vsub
        WHERE o_totalprice < ${hivevar:cutoff}
          AND o_orderstatus = '${hivevar:status}'
        GROUP BY o_orderstatus
        """
    )


@register(
    "xpath_typed_suite",
    # Every extraction is reconstructible relationally because the XML is
    # synthesized from nation columns (same certification trick as
    # xpath_suite), INCLUDING the Hive edge semantics pinned here: a
    # missing node is 0 for the integer variants, NaN for the double
    # variants (projected through isnan — NaN never crosses the driver
    # compare), and xpath_short narrows through int16 truncation
    # ((nk + 70000) mod 2^16 = nk + 4464 on this 0..24 key range).
    oracle="""
    SELECT n_nationkey,
           CAST(n_nationkey AS SMALLINT) AS x_short,
           CAST(n_nationkey + 4464 AS SMALLINT) AS x_short_wrap,
           CAST(n_nationkey * 100000000000 AS BIGINT) AS x_long,
           CAST(n_regionkey || '.5' AS REAL) AS x_float,
           CAST(n_nationkey || '.25' AS DOUBLE) AS x_double,
           CAST(n_nationkey + n_regionkey AS INT) AS x_union_sum,
           CAST(3 AS INT) AS x_count,
           CAST(0 AS INT) AS x_missing_int,
           TRUE AS x_missing_double_is_nan,
           n_nationkey > 10 AS x_pred_gt10,
           '' AS x_missing_str
    FROM nation
    """,
    doc="xpath typed variants (ql/udf/xml/UDFXPathShort/Long/Float/Double"
    ".java — the [R]->[Q] completion of the xpath family): xpath_short/"
    "xpath_long/xpath_float/xpath_double over per-row synthesized XML, "
    "plus real XPath 1.0 EXPRESSION evaluation (sum() over a node-set "
    "union, count(), a comparison predicate through xpath_boolean) and "
    "the Hive edge contract — missing node -> 0 (integer variants) / "
    "NaN (double variants, projected via isnan) / '' (string) / false "
    "(boolean), and short narrowing = int16 truncation. All codegen-side "
    "JVM evaluation; nothing leaves the executor.",
    tags=("functions", "xml"),
)
def xpath_typed_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    n = load_table(spark, sf_dir, "nation")
    xml = (
        "concat('<n><k>', n_nationkey, '</k><kw>', n_nationkey + 70000, "
        "'</kw><kl>', n_nationkey * 100000000000, '</kl><f>', n_regionkey, "
        "'.5</f><d>', n_nationkey, '.25</d><r>', n_regionkey, "
        "'</r><name>', n_name, '</name></n>')"
    )
    return n.withColumn("xml", F.expr(xml)).select(
        "n_nationkey",
        F.expr("xpath_short(xml, '/n/k')").alias("x_short"),
        F.expr("xpath_short(xml, '/n/kw')").alias("x_short_wrap"),
        F.expr("xpath_long(xml, '/n/kl')").alias("x_long"),
        F.expr("xpath_float(xml, '/n/f')").alias("x_float"),
        F.expr("xpath_double(xml, '/n/d')").alias("x_double"),
        F.expr("xpath_int(xml, 'sum(/n/k | /n/r)')").alias("x_union_sum"),
        F.expr("xpath_int(xml, 'count(/n/k | /n/r | /n/name)')").alias("x_count"),
        F.expr("xpath_int(xml, '/n/zz')").alias("x_missing_int"),
        F.isnan(F.expr("xpath_double(xml, '/n/zz')")).alias(
            "x_missing_double_is_nan"
        ),
        F.expr("xpath_boolean(xml, '/n/k > 10')").alias("x_pred_gt10"),
        F.expr("xpath_string(xml, '/n/zz')").alias("x_missing_str"),
    )


@register(
    "sentences_locale_suite",
    # Same provable-equality trick as sentences_tokenize: the documents
    # corpus is punctuation-free, so BreakIterator segmentation under an
    # EXPLICIT locale equals the whitespace tokenizer; the locale-arg
    # machinery itself is certified on a constant two-sentence phrase
    # (punctuation present) whose segmentation is locale-independent
    # among the locales exercised — projected to counts and booleans.
    oracle="""
    SELECT doc_id,
           CAST(len(list_filter(string_split(text, ' '), x -> x <> ''))
             AS INT) AS n_tokens_en_us,
           TRUE AS locale_matches_default,
           CAST(2 AS INT) AS n_const_sentences,
           CAST(4 AS INT) AS n_const_tokens
    FROM documents WHERE doc_id < 100
    """,
    doc="sentences(text, lang, country) locale-argument parity "
    "(GenericUDFSentences.java takes optional lang/country and builds the "
    "BreakIterator for that java.util.Locale — Spark kept the exact "
    "3-arg signature): explicit 'en','US' segmentation vs the default-"
    "locale form on the corpus (must agree token-for-token, projected as "
    "a boolean), plus a constant punctuated phrase proving the sentence "
    "split actually runs (2 sentences / 4 words).",
    tags=("functions", "text"),
)
def sentences_locale_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") < 100)
    const = F.expr("sentences('Customer record. Is complete?', 'en', 'US')")
    return d.select(
        "doc_id",
        F.size(F.flatten(F.expr("sentences(text, 'en', 'US')"))).alias(
            "n_tokens_en_us"
        ),
        (
            F.expr("sentences(text, 'en', 'US')") == F.sentences(F.col("text"))
        ).alias("locale_matches_default"),
        F.size(const).alias("n_const_sentences"),
        F.size(F.flatten(const)).alias("n_const_tokens"),
    )


@register(
    "in_file_membership",
    # The file's contents are DERIVED deterministically from the nation
    # table (names of regions 0-1), so the oracle can recompute membership
    # relationally without seeing the run-specific tmp path.
    oracle="""
    SELECT n.n_name,
           n.n_regionkey <= 1 AS in_blocklist,
           CAST(COUNT(*) AS BIGINT) AS n_customers
    FROM customer c JOIN nation n ON c.c_nationkey = n.n_nationkey
    GROUP BY n.n_name, n.n_regionkey
    """,
    doc="in_file(str, filename) (GenericUDFInFile.java: loads the file's "
    "lines into an in-memory set, returns line membership — Hive's "
    "blocklist idiom): emulated Spark-first as a BROADCAST left-semi "
    "membership flag against spark.read.text over the same file — "
    "distributed-safe where Hive's driver-side HashSet caps at heap, and "
    "identical semantics for the line-per-value contract (exact match, "
    "no trimming beyond the newline). The file is staged from nation "
    "names of regions 0-1, and the oracle recomputes membership "
    "relationally. At 100 TB the broadcast form is the right one: the "
    "'file' is a dimension table, and membership is a broadcast hash "
    "join, not |rows| file reads.",
    tags=("functions", "misc", "source"),
)
def in_file_membership(spark: SparkSession, sf_dir: str) -> DataFrame:
    import os

    n = load_table(spark, sf_dir, "nation")
    path = os.path.join(scratch_dir("infile"), "blocklist.txt")
    names = [
        r.n_name
        for r in n.filter(F.col("n_regionkey") <= 1).select("n_name").collect()
    ]
    with open(path, "w") as f:
        f.write("\n".join(names) + "\n")
    blocklist = spark.read.text(path).select(F.col("value").alias("bl_name"))
    c = load_table(spark, sf_dir, "customer")
    joined = c.join(n, c.c_nationkey == n.n_nationkey)
    flagged = joined.join(
        F.broadcast(blocklist),
        F.col("n_name") == F.col("bl_name"),
        "left",
    ).select("n_name", F.col("bl_name").isNotNull().alias("in_blocklist"))
    return flagged.groupBy("n_name", "in_blocklist").agg(
        F.count(F.lit(1)).alias("n_customers")
    )


@register(
    "sql_macro_functions",
    # Macro bodies are integer/decimal-exact so both engines inline the
    # same arithmetic (no libm calls — exp/log differ in last-ulp across
    # engines and have no place in a hash-compared oracle).
    oracle="""
    SELECT o_orderkey,
           CAST(CAST(FLOOR(o_totalprice * 100) AS BIGINT) * 107 // 100
             AS BIGINT) AS taxed_cents,
           CASE WHEN o_totalprice < 50000 THEN 'small'
                WHEN o_totalprice < 200000 THEN 'medium'
                ELSE 'large' END AS size_band
    FROM orders WHERE o_orderkey <= 200
    """,
    doc="CREATE TEMPORARY MACRO parity (GenericUDFMacro / HIVE-2655, new "
    "in 0.12 — a named SQL expression inlined at plan time): Spark 4's "
    "SQL UDFs (CREATE TEMPORARY FUNCTION ... RETURNS ... RETURN expr) "
    "are the exact analogue — the body is inlined into the plan by "
    "Catalyst, stays whole-stage-codegen (NO Python boundary, unlike "
    "spark.udf.register), and composes with any expression. Two macros "
    "exercised: an integer-exact tax computation and a CASE banding — "
    "both applied per-row over orders and recomputed inline by the "
    "oracle.",
    tags=("functions", "extensibility"),
)
def sql_macro_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    from apache_hive_1_2_2_src_spark.tables import register_tables

    register_tables(spark, sf_dir)
    spark.sql(
        "CREATE OR REPLACE TEMPORARY FUNCTION taxed_cents(p DOUBLE) "
        "RETURNS BIGINT RETURN CAST(FLOOR(p * 100) * 107 DIV 100 AS BIGINT)"
    )
    spark.sql(
        "CREATE OR REPLACE TEMPORARY FUNCTION size_band(p DOUBLE) "
        "RETURNS STRING RETURN CASE WHEN p < 50000 THEN 'small' "
        "WHEN p < 200000 THEN 'medium' ELSE 'large' END"
    )
    return spark.sql(
        """
        SELECT o_orderkey, taxed_cents(o_totalprice) AS taxed_cents,
               size_band(o_totalprice) AS size_band
        FROM orders WHERE o_orderkey <= 200
        """
    )
