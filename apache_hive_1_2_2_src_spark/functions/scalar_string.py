"""String function inventory (SURVEY.md §2.8 "String").

Hive sources: ``ql/udf/UDFSubstr.java``, ``UDFTrim*.java``, ``UDFLpad/Rpad``,
``GenericUDFConcatWS``, ``GenericUDFSplit``, ``GenericUDFInstr``,
``GenericUDFLevenshtein`` (1.2), ``GenericUDFInitCap`` (1.2),
``UDFRegExpExtract/Replace``, ``ql/udf/UDFJson.java`` (get_json_object),
``UDFParseUrl``, ``GenericUDFStringToMap``, etc.

All functions run JVM-side (whole-stage codegen) — no Python in the path.
Oracles re-express each function in DuckDB's dialect where names differ
(instr→strpos, split→string_split, find_in_set→list_position, ...).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from apache_hive_1_2_2_src_spark.registry import register
from apache_hive_1_2_2_src_spark.tables import load_table


@register(
    "str_basic_suite",
    oracle="""
    SELECT c_custkey,
           concat(c_name, '#', c_mktsegment) AS cat,
           concat_ws('-', c_name, c_mktsegment, 'X') AS cat_ws,
           substr(c_name, 1, 8) AS sub8,
           upper(c_mktsegment) AS up, lower(c_mktsegment) AS lo,
           trim('  ' || c_mktsegment || ' ') AS trimmed,
           ltrim('  ' || c_mktsegment) AS ltrimmed,
           rtrim(c_mktsegment || '  ') AS rtrimmed,
           length(c_name) AS len_name,
           reverse(c_mktsegment) AS rev,
           repeat(c_mktsegment, 2) AS rep2,
           ascii(c_mktsegment) AS asc1,
           lpad(CAST(c_custkey AS VARCHAR), 12, '0') AS lpadded,
           rpad(c_mktsegment, 12, '.') AS rpadded,
           CAST(strpos(c_name, '#') AS INT) AS pos_hash,
           string_split(c_name, '#')[1] AS name_head,
           string_split(c_name, '#')[2] AS name_tail
    FROM customer WHERE c_custkey <= 200
    """,
    doc="concat/concat_ws/substr/upper/lower/trim*/length/reverse/repeat/"
    "ascii/lpad/rpad/instr/split (UDF*.java, GenericUDFConcatWS/Split/Instr).",
    tags=("functions", "string"),
)
def str_basic_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer").filter(F.col("c_custkey") <= 200)
    return c.select(
        "c_custkey",
        F.concat(F.col("c_name"), F.lit("#"), F.col("c_mktsegment")).alias("cat"),
        F.concat_ws("-", "c_name", "c_mktsegment", F.lit("X")).alias("cat_ws"),
        F.substring("c_name", 1, 8).alias("sub8"),
        F.upper("c_mktsegment").alias("up"),
        F.lower("c_mktsegment").alias("lo"),
        F.trim(F.concat(F.lit("  "), F.col("c_mktsegment"), F.lit(" "))).alias("trimmed"),
        F.ltrim(F.concat(F.lit("  "), F.col("c_mktsegment"))).alias("ltrimmed"),
        F.rtrim(F.concat(F.col("c_mktsegment"), F.lit("  "))).alias("rtrimmed"),
        F.length("c_name").alias("len_name"),
        F.reverse("c_mktsegment").alias("rev"),
        F.repeat("c_mktsegment", 2).alias("rep2"),
        F.ascii("c_mktsegment").alias("asc1"),
        F.lpad(F.col("c_custkey").cast("string"), 12, "0").alias("lpadded"),
        F.rpad("c_mktsegment", 12, ".").alias("rpadded"),
        F.instr("c_name", "#").alias("pos_hash"),
        F.split("c_name", "#").getItem(0).alias("name_head"),
        F.split("c_name", "#").getItem(1).alias("name_tail"),
    )


@register(
    "str_regex_suite",
    oracle="""
    SELECT c_custkey,
           regexp_extract(c_name, 'Customer#(\\d+)', 1) AS cust_digits,
           regexp_replace(c_name, '0+', '0', 'g') AS squeezed,
           (c_name LIKE 'Customer#%') AS like_prefix,
           regexp_matches(c_name, '^Customer#0*1?\\d*$') AS rlike_m,
           CASE WHEN c_mktsegment = 'BUILDING' THEN 'b' ELSE 'x' END AS tag
    FROM customer WHERE c_custkey <= 200
    """,
    doc="regexp_extract/regexp_replace/LIKE/RLIKE (UDFRegExpExtract/Replace, "
    "UDFLike, UDFRegExp).",
    tags=("functions", "string"),
)
def str_regex_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer").filter(F.col("c_custkey") <= 200)
    return c.select(
        "c_custkey",
        F.regexp_extract("c_name", r"Customer#(\d+)", 1).alias("cust_digits"),
        F.regexp_replace("c_name", "0+", "0").alias("squeezed"),
        F.col("c_name").like("Customer#%").alias("like_prefix"),
        F.col("c_name").rlike(r"^Customer#0*1?\d*$").alias("rlike_m"),
        F.when(F.col("c_mktsegment") == "BUILDING", "b").otherwise("x").alias("tag"),
    )


@register(
    "str_advanced_suite",
    oracle="""
    SELECT c_custkey,
           levenshtein(c_mktsegment, 'BUILDING') AS lev,
           translate(c_mktsegment, 'AEIOU', 'aeiou') AS transl,
           concat(upper(substr(lower(c_mktsegment), 1, 1)),
                  substr(lower(c_mktsegment), 2)) AS initcapped,
           to_base64(encode(c_mktsegment)) AS b64,
           md5(c_name) AS md5_hex,
           sha256(c_name) AS sha2_hex,
           COALESCE(list_position(string_split('AUTOMOBILE,BUILDING,FURNITURE,HOUSEHOLD,MACHINERY', ','),
                                  c_mktsegment), 0) AS fis,
           CASE 2 WHEN 1 THEN 'a' WHEN 2 THEN 'b' ELSE 'c' END AS elt2,
           CASE c_mktsegment WHEN 'AUTOMOBILE' THEN 1 WHEN 'BUILDING' THEN 2
                WHEN 'FURNITURE' THEN 3 WHEN 'HOUSEHOLD' THEN 4
                WHEN 'MACHINERY' THEN 5 ELSE 0 END AS seg_field,
           printf('%d-%s', c_custkey, c_mktsegment) AS fmt,
           format('{:,}', c_custkey * 1000) || '.00' AS fmt_num,
           repeat(' ', 3) || c_mktsegment AS spaced
    FROM customer WHERE c_custkey <= 200
    """,
    doc="levenshtein/translate/initcap/base64/md5/sha2/find_in_set/elt/field/"
    "printf/format_number/space (GenericUDFLevenshtein/Translate/InitCap/"
    "Base64, UDFFindInSet, GenericUDFElt/Field/Printf/FormatNumber).",
    tags=("functions", "string"),
)
def str_advanced_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer").filter(F.col("c_custkey") <= 200)
    segs = "AUTOMOBILE,BUILDING,FURNITURE,HOUSEHOLD,MACHINERY"
    return c.select(
        "c_custkey",
        F.levenshtein("c_mktsegment", F.lit("BUILDING")).alias("lev"),
        F.translate("c_mktsegment", "AEIOU", "aeiou").alias("transl"),
        F.initcap(F.lower("c_mktsegment")).alias("initcapped"),
        F.base64(F.encode("c_mktsegment", "UTF-8")).alias("b64"),
        F.md5(F.col("c_name").cast("binary")).alias("md5_hex"),
        F.sha2(F.col("c_name").cast("binary"), 256).alias("sha2_hex"),
        F.expr(f"find_in_set(c_mktsegment, '{segs}')").alias("fis"),
        F.expr("elt(2, 'a', 'b', 'c')").alias("elt2"),
        # Hive field() (GenericUDFField) has no Spark builtin; array_position
        # returns the 1-based index or 0 when absent — identical semantics.
        F.expr(
            "cast(array_position(array('AUTOMOBILE', 'BUILDING', 'FURNITURE', "
            "'HOUSEHOLD', 'MACHINERY'), c_mktsegment) as int)"
        ).alias("seg_field"),
        F.format_string("%d-%s", "c_custkey", "c_mktsegment").alias("fmt"),
        # int input: avoids HALF_EVEN float edge cases that DuckDB's fmt-based
        # format() cannot reproduce (no grouping for floats).
        F.format_number(F.col("c_custkey") * 1000, 2).alias("fmt_num"),
        F.concat(F.lit("   "), F.col("c_mktsegment")).alias("spaced"),
    )


@register(
    "str_json_suite",
    oracle="""
    SELECT event_id,
           json_extract_string(props, '$.k') AS k_str,
           CAST(json_extract_string(props, '$.k') AS BIGINT) AS k_int
    FROM events WHERE event_id <= 500
    """,
    doc="get_json_object (ql/udf/UDFJson.java) over events.props JSON.",
    tags=("functions", "json"),
)
def str_json_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events").filter(F.col("event_id") <= 500)
    return e.select(
        "event_id",
        F.get_json_object("props", "$.k").alias("k_str"),
        F.get_json_object("props", "$.k").cast("bigint").alias("k_int"),
    )


@register(
    "str_parse_url",
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
    doc="parse_url HOST/PATH/QUERY/QUERY:key (UDFParseUrl) — oracle uses "
    "the same regexes RFC-wise.",
    tags=("functions", "string"),
)
def str_parse_url(spark: SparkSession, sf_dir: str) -> DataFrame:
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
    return u.select(
        "c_custkey",
        F.parse_url("url", F.lit("HOST")).alias("host"),
        F.parse_url("url", F.lit("PATH")).alias("path"),
        F.parse_url("url", F.lit("QUERY")).alias("query"),
        F.parse_url("url", F.lit("QUERY"), F.lit("seg")).alias("seg"),
    )


@register(
    "str_to_map_extract",
    oracle="""
    WITH m AS (
      SELECT c_custkey,
             'seg=' || c_mktsegment || '|bal=' || CAST(CAST(c_acctbal AS DECIMAL(18,2)) AS VARCHAR) AS kv
      FROM customer WHERE c_custkey <= 100)
    SELECT c_custkey,
           regexp_extract(kv, 'seg=([^|]*)', 1) AS seg,
           regexp_extract(kv, 'bal=([^|]*)', 1) AS bal
    FROM m
    """,
    doc="str_to_map (GenericUDFStringToMap) — map built Spark-side, values "
    "extracted by key; oracle extracts the same via regex.",
    tags=("functions", "string"),
)
def str_to_map_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer").filter(F.col("c_custkey") <= 100)
    kv = F.concat(
        F.lit("seg="),
        F.col("c_mktsegment"),
        F.lit("|bal="),
        F.col("c_acctbal").cast("decimal(18,2)").cast("string"),
    )
    m = F.str_to_map(kv, F.lit(r"\|"), F.lit("="))
    return c.select(
        "c_custkey",
        m.getItem("seg").alias("seg"),
        m.getItem("bal").alias("bal"),
    )


@register(
    "str_misc_rows_only",
    # Round-5 [R]->[Q] flip via invariant projection: DuckDB has no
    # soundex/sentences/crc32/sha1/xpath, but every output here is either
    # (a) a deterministic function of a 5-value segment column (soundex ->
    # CASE lookup, values from the public US-census algorithm), (b) a
    # constant of the fixed c_name shape 'Customer#NNNNNNNNN' (sentence/
    # token counts of '<name> is here. Next one?'), (c) an exact identity
    # (encode/decode roundtrip), or (d) a checkable shape bound (crc32 in
    # uint32 range, sha1 is 40 lowercase hex chars).
    oracle="""
    SELECT c_custkey,
           CASE c_mktsegment
             WHEN 'AUTOMOBILE' THEN 'A351'
             WHEN 'BUILDING'   THEN 'B435'
             WHEN 'FURNITURE'  THEN 'F653'
             WHEN 'HOUSEHOLD'  THEN 'H243'
             WHEN 'MACHINERY'  THEN 'M256'
           END AS sndx,
           2 AS n_sentences,
           5 AS n_sent_tokens,
           TRUE AS crc_in_range,
           TRUE AS sha1_is_hex40,
           c_name AS codec_roundtrip,
           'bb' AS xp_str,
           7 AS xp_int,
           '1,2' AS xp_texts
    FROM customer WHERE c_custkey <= 100
    """,
    doc="Former rows-only remainder, now invariant-projected: soundex "
    "(UDFSoundex), sentences (GenericUDFSentences; 'Customer#000000042 is "
    "here. Next one?' always splits into 2 sentences / 5 word tokens — "
    "BreakIterator keeps 'Customer#000000042' together but yields "
    "Customer..., is, here / Next, one), crc32/sha1 (UDFCrc32/UDFSha1; "
    "range and hex-shape "
    "invariants since DuckDB lacks both), encode/decode roundtrip "
    "(GenericUDFEncode/Decode; exact identity), xpath_* (constant XML -> "
    "constant extractions).",
    tags=("functions", "string"),
)
def str_misc_rows_only(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer").filter(F.col("c_custkey") <= 100)
    sents = F.sentences(F.concat(F.col("c_name"), F.lit(" is here. Next one?")))
    crc = F.crc32(F.col("c_name").cast("binary"))
    sha = F.sha1(F.col("c_name").cast("binary"))
    return c.select(
        "c_custkey",
        F.soundex("c_mktsegment").alias("sndx"),
        F.size(sents).alias("n_sentences"),
        F.size(F.flatten(sents)).alias("n_sent_tokens"),
        ((crc >= 0) & (crc <= F.lit(4294967295))).alias("crc_in_range"),
        sha.rlike("^[0-9a-f]{40}$").alias("sha1_is_hex40"),
        F.decode(F.encode("c_name", "UTF-8"), "UTF-8").alias("codec_roundtrip"),
        F.expr("xpath_string('<a><b>bb</b></a>', 'a/b')").alias("xp_str"),
        F.expr("xpath_int('<a><b>7</b></a>', 'a/b')").alias("xp_int"),
        F.array_join(F.expr("xpath('<a><b>1</b><b>2</b></a>', 'a/b/text()')"), ",").alias(
            "xp_texts"
        ),
    )


@register(
    "json_typed_projection",
    oracle="""
    SELECT CAST(CAST(props->>'$.k' AS INTEGER) // 10 AS BIGINT) AS k_band,
           CAST(COUNT(*) AS BIGINT) AS n_events,
           CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value,
           CAST(MIN(CAST(props->>'$.k' AS INTEGER)) AS BIGINT) AS k_min,
           CAST(MAX(CAST(props->>'$.k' AS INTEGER)) AS BIGINT) AS k_max
    FROM events
    GROUP BY k_band
    """,
    doc="Typed JSON projection — the Spark-native step beyond Hive 1.2's "
    "string-in/string-out JSON functions (`GenericUDFGetJsonObject`, "
    "`GenericUDTFJSONTuple`, both covered elsewhere): from_json(props, "
    "'k INT') parses ONCE into a typed struct at the scan edge, after "
    "which banding, filters, and aggs are plain codegen INT arithmetic — "
    "no re-parse per access, the 100 TB reason to type JSON early. "
    "Per-band event counts + decimal-exact value sums; DuckDB types the "
    "same field via ->> with an INT cast, and integer // 10 banding is "
    "exact in both engines.",
    tags=("string", "json", "sql"),
)
def json_typed_projection(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events")
    typed = e.select(
        F.from_json("props", "k INT").alias("p"), F.col("value")
    ).select(F.col("p.k").alias("k"), "value")
    return (
        typed.withColumn("k_band", F.floor(F.col("k") / 10).cast("long"))
        .groupBy("k_band")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_events"),
            F.sum(F.col("value").cast("decimal(18,2)")).cast("double").alias("sum_value"),
            F.min("k").cast("long").alias("k_min"),
            F.max("k").cast("long").alias("k_max"),
        )
    )


@register(
    "json_permissive_parse",
    oracle="""
    WITH raw AS (
      SELECT doc_id,
             CASE WHEN doc_id % 13 = 0
                  THEN '{"k": ' || CAST(doc_id % 97 AS VARCHAR)
                  WHEN doc_id % 13 = 1
                  THEN 'not json at all'
                  ELSE '{"k": ' || CAST(doc_id % 97 AS VARCHAR)
                       || ', "tag": "t' || CAST(doc_id % 5 AS VARCHAR) || '"}'
             END AS j
      FROM documents
    ),
    parsed AS (
      SELECT doc_id, j,
             CASE WHEN json_valid(j) THEN CAST(j AS JSON) END AS pj
      FROM raw
    )
    SELECT CAST(COUNT(*) AS BIGINT) AS n_rows,
           CAST(SUM(CASE WHEN pj IS NULL THEN 1 ELSE 0 END) AS BIGINT)
             AS n_corrupt,
           CAST(SUM(CASE WHEN pj IS NOT NULL
                         THEN CAST(pj ->> 'k' AS BIGINT) ELSE 0 END)
             AS BIGINT) AS sum_k,
           CAST(COUNT(CASE WHEN pj IS NOT NULL THEN pj ->> 'tag' END)
             AS BIGINT) AS n_with_tag
    FROM parsed
    """,
    doc="PERMISSIVE JSON parsing with corrupt-record accounting (the "
    "ingestion behavior that separates a pipeline that survives dirty "
    "feeds from one that dies at row 3: Hive's JSON SerDe threw or "
    "nulled silently; Spark's from_json in PERMISSIVE mode yields NULL "
    "rows you must COUNT, not ignore): a derived feed where ~1/13 of "
    "payloads are truncated JSON and another 1/13 are garbage; from_json "
    "against the typed schema, corrupt rows surface as NULL structs, "
    "and the audit reports total/corrupt counts plus exact sums over "
    "the valid rows — the reconciliation that catches silent data loss. "
    "Per-row codegen parse, one global agg; FAILFAST is one option "
    "away when corruption should abort instead.",
    tags=("functions", "json", "sql"),
)
def json_permissive_parse(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents").select("doc_id")
    j = (
        F.when(
            F.col("doc_id") % 13 == 0,
            F.concat(F.lit('{"k": '), (F.col("doc_id") % 97).cast("string")),
        )
        .when(F.col("doc_id") % 13 == 1, F.lit("not json at all"))
        .otherwise(
            F.concat(
                F.lit('{"k": '),
                (F.col("doc_id") % 97).cast("string"),
                F.lit(', "tag": "t'),
                (F.col("doc_id") % 5).cast("string"),
                F.lit('"}'),
            )
        )
    )
    parsed = d.select(
        "doc_id",
        F.from_json(j, "k bigint, tag string").alias("pj"),
    )
    return parsed.agg(
        F.count(F.lit(1)).cast("long").alias("n_rows"),
        # PERMISSIVE from_json yields a struct of NULL FIELDS (not a NULL
        # struct) for corrupt input; `k` is present in every valid
        # variant, so k IS NULL <=> corrupt — mirrored by the oracle's
        # json_valid guard.
        F.sum(F.when(F.col("pj.k").isNull(), 1).otherwise(0))
        .cast("long")
        .alias("n_corrupt"),
        F.sum(F.coalesce(F.col("pj.k"), F.lit(0))).cast("long").alias("sum_k"),
        F.count(F.col("pj.tag")).cast("long").alias("n_with_tag"),
    )
