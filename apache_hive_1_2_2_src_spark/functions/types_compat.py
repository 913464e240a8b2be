"""Hive 1.2 type-semantics parity: CHAR(n)/VARCHAR(n) length rules and
HiveDecimal arithmetic scale rules.

Reference anchors (public apache-hive-1.2.2-src layout):
- ``serde2/typeinfo/VarcharTypeInfo.java`` + ``BaseCharUtils`` — VARCHAR(n)
  truncates to n characters on write/cast.
- ``serde2/typeinfo/CharTypeInfo.java`` + ``HiveChar`` — CHAR(n) is
  blank-padded to n; comparison and ``length()`` operate on the rtrimmed
  value (``HiveChar.getStrippedValue``).
- ``common/src/java/org/apache/hadoop/hive/common/type/HiveDecimal.java`` +
  ``GenericUDFOPDivide/Multiply/Plus`` decimal type inference: for
  DECIMAL(p1,s1) op DECIMAL(p2,s2):
    divide:   scale = max(6, s1 + p2 + 1),  precision = p1 - s1 + s2 + scale
    multiply: scale = s1 + s2
    add:      scale = max(s1, s2)
  and ROUND is HALF_UP.

Spark parity notes (why these are *implemented* rather than free):
- Spark's ``CAST(x AS VARCHAR(3))`` does NOT truncate (char/varchar length
  is enforced only at table-write boundaries since SPARK-33480, and reads
  as plain string otherwise). The Hive semantics are therefore expressed
  as explicit JVM expressions — ``substring`` for VARCHAR truncation,
  ``rpad(substring(..))`` for CHAR padding, ``rtrim`` for CHAR comparison —
  which is the honest Spark-first translation and works identically on any
  engine, including the DuckDB oracle (DuckDB's VARCHAR(3) cast doesn't
  truncate either; both oracles mirror the same substr/rpad/rtrim).
- Spark inherited Hive's decimal-division scale formula verbatim
  (``DecimalPrecision`` with ``spark.sql.decimalOperations.allowPrecisionLoss``
  default true == HiveDecimal's rules for these precisions), so
  DECIMAL(18,2)/DECIMAL(10,0) is DECIMAL(29,13) in both systems — the
  builder ASSERTS that result type, so a Spark-version drift in the scale
  rule fails loudly instead of silently changing rounded values. DuckDB
  divides decimals as DOUBLE, so the graded division column is rounded to
  6 dp (ties impossible: quotients of 2-dp cents by small ints either
  terminate below 6 dp or repeat forever, and the ≥7e-8 gap to any 7-dp
  boundary dwarfs double error) and cast to DOUBLE on both sides.

Everything is whole-stage-codegen JVM expressions over a 1000-row slice —
zero shuffle beyond the scan; scales to any corpus as a pure map.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import DecimalType

from apache_hive_1_2_2_src_spark.registry import register
from apache_hive_1_2_2_src_spark.tables import load_table


def hive_varchar(col: Column, n: int) -> Column:
    """VARCHAR(n) write/cast semantics: truncate to n characters."""
    return F.substring(col, 1, n)


def hive_char(col: Column, n: int) -> Column:
    """CHAR(n) storage semantics: truncate then blank-pad to n."""
    return F.rpad(F.substring(col, 1, n), n, " ")


def hive_char_eq(a: Column, b: Column) -> Column:
    """CHAR comparison ignores trailing pad (HiveChar.getStrippedValue)."""
    return F.rtrim(a) == F.rtrim(b)


@register(
    "types_char_varchar_suite",
    oracle="""
    SELECT p_partkey,
           substr(p_name, 1, 8) AS vc8,
           length(substr(p_name, 1, 8)) AS vc8_len,
           rpad(substr(p_name, 1, 12), 12, ' ') AS ch12,
           length(rpad(substr(p_name, 1, 12), 12, ' ')) AS ch12_stored_len,
           length(rtrim(rpad(substr(p_name, 1, 12), 12, ' '))) AS ch12_len,
           rtrim(rpad(substr(p_name, 1, 12), 12, ' ')) = p_name AS ch12_eq_orig,
           rpad(substr(p_name, 1, 12), 12, ' ') = p_name AS ch12_raw_eq,
           substr(p_name, 1, 8) = p_name AS vc8_eq_orig,
           concat(rtrim(rpad(substr(p_brand, 1, 10), 10, ' ')), '|') AS ch_concat
    FROM part WHERE p_partkey < 1000
    """,
    doc="CHAR(n)/VARCHAR(n) length semantics (serde2/typeinfo/"
    "{Varchar,Char}TypeInfo.java, HiveChar/HiveVarchar; q-tests "
    "char_cast.q, varchar_2.q): VARCHAR(8) truncation and its length; "
    "CHAR(12) blank-pad storage (stored length always 12) vs logical "
    "length (rtrimmed, per HiveChar.getStrippedValue); pad-insensitive "
    "CHAR equality vs raw byte equality (they differ exactly on short "
    "names — both columns graded); CHAR-to-string concat strips pad as "
    "Hive does. Expressed as explicit substr/rpad/rtrim JVM expressions "
    "because Spark (like DuckDB) only enforces char/varchar length at "
    "table-write boundaries — see module doc.",
    tags=("functions", "types", "char"),
)
def types_char_varchar_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = load_table(spark, sf_dir, "part").filter(F.col("p_partkey") < 1000)
    name, brand = F.col("p_name"), F.col("p_brand")
    vc8 = hive_varchar(name, 8)
    ch12 = hive_char(name, 12)
    return p.select(
        "p_partkey",
        vc8.alias("vc8"),
        F.length(vc8).alias("vc8_len"),
        ch12.alias("ch12"),
        F.length(ch12).alias("ch12_stored_len"),
        F.length(F.rtrim(ch12)).alias("ch12_len"),
        hive_char_eq(ch12, name).alias("ch12_eq_orig"),
        (ch12 == name).alias("ch12_raw_eq"),
        (vc8 == name).alias("vc8_eq_orig"),
        F.concat(F.rtrim(hive_char(brand, 10)), F.lit("|")).alias("ch_concat"),
    )


@register(
    "decimal_scale_suite",
    oracle="""
    WITH t AS (
      SELECT o_orderkey,
             CAST(o_totalprice AS DECIMAL(18,2)) AS d1,
             CAST(o_orderkey % 7 + 1 AS DECIMAL(10,0)) AS d2,
             CAST(o_orderkey % 1000 AS DECIMAL(10,3)) / 1000 AS d3
      FROM orders WHERE o_orderkey < 1000
    )
    SELECT o_orderkey,
           CAST(d1 * d1 AS VARCHAR) AS mul_str,
           CAST(d1 + CAST(d3 AS DECIMAL(10,3)) AS VARCHAR) AS add_str,
           CAST(ROUND(d1 / d2, 6) AS DOUBLE) AS div6_dbl,
           -- DuckDB divides decimals as DOUBLE; cast the rounded value back
           -- to DECIMAL(18,2) so the string keeps Hive's 2-dp scale.
           CAST(CAST(ROUND(d1 / 3, 2) AS DECIMAL(18,2)) AS VARCHAR) AS round_half_up,
           -- DuckDB's decimal->decimal cast TRUNCATES; Hive/Spark rescale
           -- rounds HALF_UP, so the oracle mirrors with an explicit ROUND.
           CAST(CAST(ROUND(d1, 0) AS DECIMAL(18,0)) AS VARCHAR) AS rescale_round0
    FROM t
    """,
    doc="HiveDecimal arithmetic scale rules (HiveDecimal.java, "
    "GenericUDFOPDivide/Multiply/Plus; q-tests decimal_udf.q, "
    "decimal_precision.q): multiply scale s1+s2 (trailing zeros preserved "
    "in the string — '3.7500' not '3.75'), add scale max(s1,s2), HALF_UP "
    "ROUND (both when rounding a division to 2 dp and when rescaling to "
    "scale 0 — Hive/Spark rescale rounds HALF_UP where DuckDB's cast "
    "truncates, so the oracle carries an explicit ROUND), and "
    "the division result type DECIMAL(29,13) = (p1-s1+s2+scale, "
    "max(6, s1+p2+1)) which the builder asserts on the Spark schema so a "
    "rule drift fails loudly. Division VALUES are graded at 6 dp as "
    "DOUBLE because DuckDB divides decimals in floating point (module "
    "doc shows ties are impossible at these scales).",
    tags=("functions", "types", "decimal"),
)
def decimal_scale_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders").filter(F.col("o_orderkey") < 1000)
    t = o.select(
        "o_orderkey",
        F.col("o_totalprice").cast("decimal(18,2)").alias("d1"),
        ((F.col("o_orderkey") % 7) + 1).cast("decimal(10,0)").alias("d2"),
        ((F.col("o_orderkey") % 1000).cast("decimal(10,3)") / 1000).alias("d3"),
    )
    div = F.col("d1") / F.col("d2")
    # Pin Hive's division type rule on the actual Spark plan: DECIMAL(18,2)
    # / DECIMAL(10,0) must resolve to DECIMAL(29,13). A Spark upgrade that
    # changed DecimalPrecision would silently shift every rounded quotient;
    # this assert turns that into a hard error at build time.
    div_type = t.select(div.alias("q")).schema["q"].dataType
    if div_type != DecimalType(29, 13):
        raise AssertionError(
            f"decimal division type drifted: got {div_type}, expected "
            "DECIMAL(29,13) per HiveDecimal scale = max(6, s1+p2+1)"
        )
    return t.select(
        "o_orderkey",
        (F.col("d1") * F.col("d1")).cast("string").alias("mul_str"),
        (F.col("d1") + F.col("d3").cast("decimal(10,3)")).cast("string").alias("add_str"),
        F.round(div, 6).cast("double").alias("div6_dbl"),
        F.round(F.col("d1") / 3, 2).cast("string").alias("round_half_up"),
        F.col("d1").cast("decimal(18,0)").cast("string").alias("rescale_round0"),
    )


@register(
    "uniontype_emulated",
    oracle="""
    WITH u AS (
      SELECT o_orderkey,
             CAST(o_orderkey % 2 AS INT) AS tag,
             CASE WHEN o_orderkey % 2 = 0 THEN o_totalprice END AS f0,
             CASE WHEN o_orderkey % 2 = 1 THEN o_orderstatus END AS f1
      FROM orders WHERE o_orderkey < 2000
    )
    SELECT tag,
           COUNT(*) AS n,
           CAST(SUM(CAST(f0 AS DECIMAL(18,2))) AS DOUBLE) AS sum_f0,
           COUNT(f0) AS n_f0, COUNT(f1) AS n_f1,
           MIN(CASE WHEN tag = 1 THEN f1 END) AS min_status,
           BOOL_AND((f0 IS NULL) <> (f1 IS NULL)) AS exactly_one_set
    FROM u GROUP BY tag
    """,
    doc="UNIONTYPE<double,string> emulation (serde2/typeinfo/"
    "UnionTypeInfo.java + the create_union/GenericUDFUnion UDF family; "
    "q-test union_type.q): Spark has no union type, so the documented "
    "strategy (SURVEY §1.3 type table) is tag + one nullable field per "
    "alternative, with exactly one field set per row — here built with "
    "create_union semantics (tag selects the populated branch) and "
    "consumed with CASE-on-tag dispatch, the relational equivalent of "
    "Hive's extract-by-tag. The exactly_one_set invariant is graded, so "
    "the emulation's core contract (a union is never 0 or 2 branches) is "
    "oracle-certified, alongside per-tag aggregates over each branch. "
    "Pure codegen projection + one groupBy.",
    tags=("functions", "types", "uniontype"),
)
def uniontype_emulated(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders").filter(F.col("o_orderkey") < 2000)
    even = F.col("o_orderkey") % 2 == 0
    u = o.select(
        "o_orderkey",
        (F.col("o_orderkey") % 2).cast("int").alias("tag"),
        F.when(even, F.col("o_totalprice")).alias("f0"),
        F.when(~even, F.col("o_orderstatus")).alias("f1"),
    )
    return u.groupBy("tag").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.col("f0").cast("decimal(18,2)")).cast("double").alias("sum_f0"),
        F.count("f0").alias("n_f0"),
        F.count("f1").alias("n_f1"),
        F.min(F.when(F.col("tag") == 1, F.col("f1"))).alias("min_status"),
        F.bool_and(F.col("f0").isNull() != F.col("f1").isNull()).alias(
            "exactly_one_set"
        ),
    )


@register(
    "coercion_lattice_suite",
    oracle="""
    SELECT o_orderkey,
           o_orderkey / 4 AS int_div_double,
           o_orderkey // 4 AS int_div_floor,
           CAST(o_orderkey AS VARCHAR) = CAST(o_orderkey AS VARCHAR) AS str_self_eq,
           CAST(CAST(o_orderkey AS VARCHAR) AS DOUBLE) = CAST(o_orderkey AS DOUBLE)
             AS str_num_eq,
           CAST(CAST(o_orderkey AS VARCHAR) AS DOUBLE) + 1 AS str_plus_int,
           (CAST(o_orderkey AS SMALLINT) + CAST(1 AS TINYINT)) IS NOT NULL
             AS small_plus_tiny,
           CAST(o_orderkey AS DOUBLE) = o_orderkey AS widen_eq
    FROM orders WHERE o_orderkey < 500
    """,
    doc="Implicit-cast lattice parity (FunctionRegistry."
    "getCommonClassForComparison / getCommonClassForUnionAll — SURVEY "
    "§1.3's divergence watch-list): int/int division yields DOUBLE in "
    "Hive, Spark AND DuckDB (0.5, not 0) while DIV/// is the integer "
    "form; string-vs-number comparison coerces THROUGH DOUBLE in Hive "
    "(GenericUDFOPEqual common class) — expressed with the explicit "
    "double casts the SURVEY prescribes so all engines agree by "
    "construction; string+int arithmetic likewise coerces via double; "
    "small integer types widen under arithmetic. Every coercion is "
    "written with its explicit-cast normal form — the module's rule that "
    "declared queries pin lattice divergences with casts instead of "
    "trusting engine defaults.",
    tags=("functions", "types", "cast"),
)
def coercion_lattice_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders").filter(F.col("o_orderkey") < 500)
    k = F.col("o_orderkey")
    ks = k.cast("string")
    return o.select(
        "o_orderkey",
        (k / 4).alias("int_div_double"),
        F.expr("o_orderkey DIV 4").alias("int_div_floor"),
        (ks == ks).alias("str_self_eq"),
        (ks.cast("double") == k.cast("double")).alias("str_num_eq"),
        (ks.cast("double") + 1).alias("str_plus_int"),
        (k.cast("smallint") + F.lit(1).cast("tinyint")).isNotNull().alias(
            "small_plus_tiny"
        ),
        (k.cast("double") == k).alias("widen_eq"),
    )
