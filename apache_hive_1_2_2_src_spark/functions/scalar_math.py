"""Math function inventory (SURVEY.md §2.8 "Math").

Hive sources: ``ql/udf/UDF{Exp,Ln,Log,Pow,Sqrt,...}.java``,
``GenericUDFRound`` (HALF_UP), ``GenericUDFPosMod``, ``GenericUDFAbs``,
``GenericUDFFactorial`` (1.2), ``UDFOPBitShift*`` (1.2),
``GenericUDFGreatest/Least`` (1.2), arithmetic/comparison operators
``GenericUDFOP*``.

Oracle dialect notes: DuckDB log(x) is log10 — use ln/log2/log explicitly;
pmod is spelled ((x % y) + y) % y; bit shifts are << / >>.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from apache_hive_1_2_2_src_spark.registry import register
from apache_hive_1_2_2_src_spark.tables import load_table


@register(
    "math_basic_suite",
    oracle="""
    SELECT p_partkey,
           CAST(round(p_retailprice, 1) AS DOUBLE) AS rounded1,
           CAST(round(p_retailprice) AS DOUBLE) AS rounded0,
           CAST(floor(p_retailprice) AS BIGINT) AS fl,
           CAST(ceil(p_retailprice) AS BIGINT) AS ce,
           CAST(round(exp(p_size * 0.01), 10) AS DOUBLE) AS ex,
           CAST(round(ln(p_retailprice), 10) AS DOUBLE) AS lnx,
           CAST(round(log10(p_retailprice), 10) AS DOUBLE) AS l10,
           CAST(round(log2(p_size), 10) AS DOUBLE) AS l2,
           CAST(round(log(3, p_size), 10) AS DOUBLE) AS l3,
           CAST(round(pow(p_size, 2), 6) AS DOUBLE) AS p2,
           CAST(round(sqrt(p_retailprice), 10) AS DOUBLE) AS sq,
           CAST(round(cbrt(p_retailprice), 10) AS DOUBLE) AS cb,
           abs(p_size - 25) AS ab,
           ((p_size - 25) % 7 + 7) % 7 AS pm,
           sign(p_size - 25) AS sg
    FROM part WHERE p_partkey <= 300
    """,
    doc="round/floor/ceil/exp/ln/log10/log2/log(b,x)/pow/sqrt/cbrt/abs/pmod/"
    "sign (UDF*.java; GenericUDFRound/PosMod).",
    tags=("functions", "math"),
)
def math_basic_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = load_table(spark, sf_dir, "part").filter(F.col("p_partkey") <= 300)
    return p.select(
        "p_partkey",
        F.round("p_retailprice", 1).cast("double").alias("rounded1"),
        F.round("p_retailprice", 0).cast("double").alias("rounded0"),
        F.floor("p_retailprice").alias("fl"),
        F.ceil("p_retailprice").alias("ce"),
        F.round(F.exp(F.col("p_size") * 0.01), 10).cast("double").alias("ex"),
        F.round(F.log("p_retailprice"), 10).cast("double").alias("lnx"),
        F.round(F.log10("p_retailprice"), 10).cast("double").alias("l10"),
        F.round(F.log2("p_size"), 10).cast("double").alias("l2"),
        F.round(F.log(3.0, "p_size"), 10).cast("double").alias("l3"),
        F.round(F.pow("p_size", F.lit(2)), 6).cast("double").alias("p2"),
        F.round(F.sqrt("p_retailprice"), 10).cast("double").alias("sq"),
        F.round(F.cbrt("p_retailprice"), 10).cast("double").alias("cb"),
        F.abs(F.col("p_size") - 25).alias("ab"),
        F.pmod(F.col("p_size") - 25, F.lit(7)).alias("pm"),
        F.signum(F.col("p_size") - 25).cast("int").alias("sg"),
    )


@register(
    "math_trig_suite",
    oracle="""
    SELECT p_partkey,
           CAST(round(sin(p_size * 0.1), 10) AS DOUBLE) AS sn,
           CAST(round(cos(p_size * 0.1), 10) AS DOUBLE) AS cs,
           CAST(round(tan(p_size * 0.05), 10) AS DOUBLE) AS tn,
           CAST(round(asin(1.0 / (p_size + 2)), 10) AS DOUBLE) AS asn,
           CAST(round(acos(1.0 / (p_size + 2)), 10) AS DOUBLE) AS acs,
           CAST(round(atan(p_size * 0.1), 10) AS DOUBLE) AS atn,
           CAST(round(degrees(p_size * 0.01), 10) AS DOUBLE) AS dg,
           CAST(round(radians(p_size * 1.0), 10) AS DOUBLE) AS rd,
           CAST(round(pi(), 10) AS DOUBLE) AS pi_v,
           CAST(round(exp(1), 10) AS DOUBLE) AS e_v
    FROM part WHERE p_partkey <= 300
    """,
    doc="sin/cos/tan/asin/acos/atan/degrees/radians/pi/e (UDF*.java).",
    tags=("functions", "math"),
)
def math_trig_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = load_table(spark, sf_dir, "part").filter(F.col("p_partkey") <= 300)
    z = F.col("p_size") * 0.1
    return p.select(
        "p_partkey",
        F.round(F.sin(z), 10).cast("double").alias("sn"),
        F.round(F.cos(z), 10).cast("double").alias("cs"),
        F.round(F.tan(F.col("p_size") * 0.05), 10).cast("double").alias("tn"),
        F.round(F.asin(1.0 / (F.col("p_size") + 2)), 10).cast("double").alias("asn"),
        F.round(F.acos(1.0 / (F.col("p_size") + 2)), 10).cast("double").alias("acs"),
        F.round(F.atan(z), 10).cast("double").alias("atn"),
        F.round(F.degrees(F.col("p_size") * 0.01), 10).cast("double").alias("dg"),
        F.round(F.radians(F.col("p_size") * 1.0), 10).cast("double").alias("rd"),
        F.round(F.lit(3.141592653589793), 10).cast("double").alias("pi_v"),
        F.round(F.exp(F.lit(1)), 10).cast("double").alias("e_v"),
    )


@register(
    "math_int_bits_suite",
    oracle="""
    SELECT p_partkey,
           bin(p_size) AS binrep,
           hex(p_size) AS hexrep,
           (p_size << 2) AS shl,
           (p_size >> 1) AS shr,
           (p_size & 12) AS band,
           (p_size | 3) AS bor,
           xor(p_size, 5) AS bxor,
           greatest(p_size, 25, 10) AS grt,
           least(p_size, 25, 10) AS lst,
           CAST(p_size // 7 AS BIGINT) AS intdiv,
           p_size % 7 AS modulo,
           CAST(factorial(CAST(LEAST(p_size % 10, 9) AS INTEGER)) AS BIGINT) AS fact
    FROM part WHERE p_partkey <= 300
    """,
    doc="bin/hex/shiftleft/shiftright/bitwise ops/greatest/least/div/mod/"
    "factorial (UDFOPBitShift*, GenericUDFGreatest/Least/Factorial).",
    tags=("functions", "math"),
)
def math_int_bits_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = load_table(spark, sf_dir, "part").filter(F.col("p_partkey") <= 300)
    return p.select(
        "p_partkey",
        F.bin("p_size").alias("binrep"),
        F.hex("p_size").alias("hexrep"),
        F.shiftleft("p_size", 2).alias("shl"),
        F.shiftright("p_size", 1).alias("shr"),
        (F.col("p_size").bitwiseAND(12)).alias("band"),
        (F.col("p_size").bitwiseOR(3)).alias("bor"),
        (F.col("p_size").bitwiseXOR(5)).alias("bxor"),
        F.greatest("p_size", F.lit(25), F.lit(10)).alias("grt"),
        F.least("p_size", F.lit(25), F.lit(10)).alias("lst"),
        F.expr("CAST(p_size DIV 7 AS BIGINT)").alias("intdiv"),
        (F.col("p_size") % 7).alias("modulo"),
        F.factorial(F.least(F.col("p_size") % 10, F.lit(9))).alias("fact"),
    )


@register(
    "math_compare_ops",
    oracle="""
    SELECT p_partkey,
           (p_size = 25) AS eq, (p_size <> 25) AS ne,
           (p_size < 25) AS lt, (p_size <= 25) AS le,
           (p_size > 25) AS gt, (p_size >= 25) AS ge,
           (p_size IS NOT DISTINCT FROM 25) AS eq_ns,
           (p_size BETWEEN 10 AND 40) AS btw,
           (p_size IN (1, 25, 50)) AS inlist,
           (p_size IS NULL) AS isn, (p_size IS NOT NULL) AS isnn
    FROM part WHERE p_partkey <= 300
    """,
    doc="Comparison operators incl. <=> null-safe (GenericUDFOPEqualNS), "
    "BETWEEN (GenericUDFBetween), IN (GenericUDFIn).",
    tags=("functions", "operators"),
)
def math_compare_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = load_table(spark, sf_dir, "part").filter(F.col("p_partkey") <= 300)
    s = F.col("p_size")
    return p.select(
        "p_partkey",
        (s == 25).alias("eq"),
        (s != 25).alias("ne"),
        (s < 25).alias("lt"),
        (s <= 25).alias("le"),
        (s > 25).alias("gt"),
        (s >= 25).alias("ge"),
        s.eqNullSafe(25).alias("eq_ns"),
        s.between(10, 40).alias("btw"),
        s.isin(1, 25, 50).alias("inlist"),
        s.isNull().alias("isn"),
        s.isNotNull().alias("isnn"),
    )


@register(
    "math_conv_suite",
    oracle="""
    SELECT p_partkey,
           to_base(p_size, 16) AS conv16,
           bin(p_size) AS conv2,
           p_brand AS unhex_roundtrip,
           p_size AS pos,
           -p_size AS neg
    FROM part WHERE p_partkey <= 100
    """,
    doc="conv(n,b1,b2) base conversion (UDFConv), hex/unhex roundtrip "
    "(UDFHex/UDFUnhex), positive/negative (UDFOPPositive/Negative). "
    "rand(seed) is excluded from [Q] per SURVEY §5 (engine-specific PRNG) — "
    "covered by nondeterministic_fns_invariants instead.",
    tags=("functions", "math"),
)
def math_conv_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = load_table(spark, sf_dir, "part").filter(F.col("p_partkey") <= 100)
    return p.select(
        "p_partkey",
        F.conv(F.col("p_size").cast("string"), 10, 16).alias("conv16"),
        F.conv(F.col("p_size").cast("string"), 10, 2).alias("conv2"),
        F.unhex(F.hex("p_brand")).cast("string").alias("unhex_roundtrip"),
        F.expr("positive(p_size)").alias("pos"),
        F.expr("negative(p_size)").alias("neg"),
    )
