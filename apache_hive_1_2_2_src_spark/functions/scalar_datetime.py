"""Date/time function inventory (SURVEY.md §2.8 "Date/time").

Hive sources: ``GenericUDFUnixTimeStamp``, ``UDFFromUnixTime``, ``UDFDate*``,
``UDFYear/Month/Day/Hour/Minute/Second/WeekOfYear``, ``UDFDateDiff``,
``UDFDateAdd/Sub``, ``GenericUDFAddMonths/LastDay/NextDay/Trunc/DateFormat``
(all new in 1.2), ``GenericUDFFromUtcTimestamp``.

Semantics pinned: session TZ = UTC on the Spark side; oracles avoid any
TZ-dependent DuckDB function (epoch()/make_timestamp() are TZ-naive-UTC).
Hive 1.2 ``to_date`` returns STRING — the shim here is an explicit
date_format to match that documented divergence.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from apache_hive_1_2_2_src_spark.registry import register
from apache_hive_1_2_2_src_spark.tables import load_table


@register(
    "date_extract_suite",
    oracle="""
    SELECT o_orderkey,
           year(o_orderdate) AS yr,
           month(o_orderdate) AS mon,
           day(o_orderdate) AS dom,
           hour(o_orderdate) AS hh,
           minute(o_orderdate) AS mi,
           second(o_orderdate) AS ss,
           weekofyear(o_orderdate) AS woy,
           CAST(strftime(o_orderdate, '%Y-%m-%d') AS VARCHAR) AS to_date_str
    FROM orders WHERE o_orderkey <= 1000
    """,
    doc="year/month/day/hour/minute/second/weekofyear + to_date (Hive 1.2 "
    "returns STRING — UDFDate.java; declared as the string form).",
    tags=("functions", "datetime"),
)
def date_extract_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders").filter(F.col("o_orderkey") <= 1000)
    return o.select(
        "o_orderkey",
        F.year("o_orderdate").alias("yr"),
        F.month("o_orderdate").alias("mon"),
        F.dayofmonth("o_orderdate").alias("dom"),
        F.hour("o_orderdate").alias("hh"),
        F.minute("o_orderdate").alias("mi"),
        F.second("o_orderdate").alias("ss"),
        F.weekofyear("o_orderdate").alias("woy"),
        F.date_format("o_orderdate", "yyyy-MM-dd").alias("to_date_str"),
    )


@register(
    "date_arith_suite",
    oracle="""
    SELECT o_orderkey,
           CAST(strftime(o_orderdate + INTERVAL 5 DAY, '%Y-%m-%d') AS VARCHAR) AS plus5,
           CAST(strftime(o_orderdate - INTERVAL 3 DAY, '%Y-%m-%d') AS VARCHAR) AS minus3,
           date_diff('day', TIMESTAMP '1995-01-01 00:00:00', o_orderdate) AS dd_from_epoch_start,
           CAST(strftime(o_orderdate + INTERVAL 2 MONTH, '%Y-%m-%d') AS VARCHAR) AS plus2mo,
           CAST(strftime(last_day(CAST(o_orderdate AS DATE)), '%Y-%m-%d') AS VARCHAR) AS month_end,
           CAST(strftime(CAST(o_orderdate AS DATE)
                         + (8 - isodow(o_orderdate)) * INTERVAL '1 day', '%Y-%m-%d') AS VARCHAR)
             AS next_monday,
           CAST(strftime(date_trunc('month', o_orderdate), '%Y-%m-%d') AS VARCHAR) AS mon_trunc,
           CAST(epoch(o_orderdate) AS BIGINT) AS unix_ts
    FROM orders WHERE o_orderkey <= 1000
    """,
    doc="date_add/date_sub/datediff/add_months/last_day/next_day/trunc/"
    "unix_timestamp (UDFDateAdd/Sub/DateDiff, GenericUDFAddMonths/LastDay/"
    "NextDay/Trunc/UnixTimeStamp). String-ified for cross-engine compare.",
    tags=("functions", "datetime"),
)
def date_arith_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders").filter(F.col("o_orderkey") <= 1000)
    d = F.col("o_orderdate")
    return o.select(
        "o_orderkey",
        F.date_format(F.date_add(d, 5), "yyyy-MM-dd").alias("plus5"),
        F.date_format(F.date_sub(d, 3), "yyyy-MM-dd").alias("minus3"),
        F.datediff(d, F.lit("1995-01-01").cast("date")).alias("dd_from_epoch_start"),
        F.date_format(F.add_months(d, 2), "yyyy-MM-dd").alias("plus2mo"),
        F.date_format(F.last_day(d), "yyyy-MM-dd").alias("month_end"),
        F.date_format(F.next_day(d, "MON"), "yyyy-MM-dd").alias("next_monday"),
        F.date_format(F.trunc(d, "MM"), "yyyy-MM-dd").alias("mon_trunc"),
        F.unix_timestamp(d).alias("unix_ts"),
    )


@register(
    "date_format_suite",
    oracle="""
    SELECT event_id,
           strftime(ts, '%Y-%m-%d %H:%M:%S') AS fmt_full,
           strftime(ts, '%Y/%m') AS fmt_ym,
           strftime(make_timestamp(CAST(floor(epoch(ts)) AS BIGINT) * 1000000), '%Y-%m-%d %H:%M:%S')
             AS from_unix_roundtrip,
           date_diff('day', TIMESTAMP '2024-01-01 00:00:00', ts) AS days_into_2024
    FROM events WHERE event_id <= 500
    """,
    doc="date_format (GenericUDFDateFormat, 1.2) + from_unixtime "
    "(UDFFromUnixTime) roundtrip; Java patterns mapped to strftime in oracle.",
    tags=("functions", "datetime"),
)
def date_format_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events").filter(F.col("event_id") <= 500)
    return e.select(
        "event_id",
        F.date_format("ts", "yyyy-MM-dd HH:mm:ss").alias("fmt_full"),
        F.date_format("ts", "yyyy/MM").alias("fmt_ym"),
        F.from_unixtime(F.unix_timestamp("ts"), "yyyy-MM-dd HH:mm:ss").alias(
            "from_unix_roundtrip"
        ),
        F.datediff(F.col("ts"), F.lit("2024-01-01").cast("date")).alias("days_into_2024"),
    )


@register(
    "date_tz_suite",
    oracle="""
    SELECT event_id,
           CAST((ts AT TIME ZONE 'UTC') AT TIME ZONE 'America/Los_Angeles'
                AS VARCHAR) AS la_time,
           CAST((ts AT TIME ZONE 'Asia/Tokyo') AT TIME ZONE 'UTC'
                AS VARCHAR) AS from_tokyo,
           CAST(ts + INTERVAL 1 DAY AS VARCHAR) AS plus_1d_interval,
           CAST(ts - INTERVAL 90 MINUTE AS VARCHAR) AS minus_90m
    FROM events WHERE event_id <= 100
    """,
    doc="from_utc_timestamp/to_utc_timestamp (UDFFromUtcTimestamp/"
    "UDFToUtcTimestamp; both engines share the IANA tz database) and "
    "interval arithmetic. Timestamps are stringified — the oracle uses "
    "explicit AT TIME ZONE chains so neither engine's session TZ matters. "
    "current_date/current_timestamp live in nondeterministic_fns_invariants.",
    tags=("functions", "datetime"),
)
def date_tz_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events").filter(F.col("event_id") <= 100)
    return e.select(
        "event_id",
        F.from_utc_timestamp("ts", "America/Los_Angeles").cast("string").alias("la_time"),
        F.to_utc_timestamp("ts", "Asia/Tokyo").cast("string").alias("from_tokyo"),
        (F.col("ts") + F.expr("INTERVAL 1 DAY")).cast("string").alias("plus_1d_interval"),
        (F.col("ts") - F.expr("INTERVAL 90 MINUTE")).cast("string").alias("minus_90m"),
    )


@register(
    "nondeterministic_fns_invariants",
    oracle="""
    SELECT COUNT(*) AS n, TRUE AS rnd_in_range, TRUE AS today_plausible,
           TRUE AS now_after_2020, TRUE AS uuids_wellformed
    FROM part WHERE p_partkey <= 100
    """,
    doc="Nondeterministic fns (UDFRand, GenericUDFCurrentDate/Timestamp, "
    "GenericUDFUuid): values are engine/instant-specific by definition, so "
    "the query projects their CONTRACTS — rand(seed) ∈ [0,1), current_date "
    "within a sane window, current_timestamp after 2020, uuid() matching "
    "the 8-4-4-4-12 hex shape — into oracle-checkable booleans.",
    tags=("functions", "misc"),
)
def nondeterministic_fns_invariants(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = load_table(spark, sf_dir, "part").filter(F.col("p_partkey") <= 100)
    rows = p.select(
        F.rand(42).alias("rnd"),
        F.current_date().alias("today"),
        F.current_timestamp().alias("now_ts"),
        F.expr("uuid()").alias("uid"),
    )
    uuid_re = "^[0-9a-f]{8}-[0-9a-f]{4}-[0-9a-f]{4}-[0-9a-f]{4}-[0-9a-f]{12}$"
    return rows.agg(
        F.count(F.lit(1)).alias("n"),
        (F.sum(F.when((F.col("rnd") >= 0) & (F.col("rnd") < 1), 0).otherwise(1)) == 0).alias(
            "rnd_in_range"
        ),
        (F.min("today") >= F.lit("2020-01-01").cast("date")).alias("today_plausible"),
        (F.min("now_ts") >= F.lit("2020-01-01 00:00:00").cast("timestamp")).alias(
            "now_after_2020"
        ),
        (F.sum(F.when(F.col("uid").rlike(uuid_re), 0).otherwise(1)) == 0).alias(
            "uuids_wellformed"
        ),
    )
