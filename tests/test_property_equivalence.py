"""Property-based Spark ↔ DuckDB equivalence: randomized filter predicates
and aggregations over orders must agree between engines (a test dimension
the reference's golden-file q-tests never had — SURVEY.md §5.4)."""

from __future__ import annotations

import duckdb
import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from apache_hive_1_2_2_src_spark.tables import load_table
from tests.conftest import SF_DIR

STATUSES = ["F", "O", "P"]


@pytest.fixture(scope="module")
def orders_con():
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW orders AS SELECT * FROM read_parquet('{SF_DIR}/orders.parquet')"
    )
    return con


@settings(
    max_examples=15,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    lo=st.integers(min_value=0, max_value=300_000),
    width=st.integers(min_value=1, max_value=200_000),
    status=st.sampled_from(STATUSES),
    use_or=st.booleans(),
)
def test_random_filter_agg_equivalence(spark, orders_con, lo, width, status, use_or):
    hi = lo + width
    spark_pred = (F.col("o_totalprice") >= lo) & (F.col("o_totalprice") < hi)
    sql_pred = f"(o_totalprice >= {lo} AND o_totalprice < {hi})"
    if use_or:
        spark_pred = spark_pred | (F.col("o_orderstatus") == status)
        sql_pred = f"({sql_pred} OR o_orderstatus = '{status}')"

    got = (
        load_table(spark, SF_DIR, "orders")
        .filter(spark_pred)
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col("o_totalprice").cast("decimal(18,2)")).cast("double").alias("s"),
            F.min("o_orderkey").alias("mn"),
            F.max("o_orderkey").alias("mx"),
        )
        .collect()[0]
    )
    want = orders_con.execute(
        f"""
        SELECT COUNT(*),
               CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE),
               MIN(o_orderkey), MAX(o_orderkey)
        FROM orders WHERE {sql_pred}
        """
    ).fetchone()
    assert (got["n"], got["s"], got["mn"], got["mx"]) == want


@pytest.fixture(scope="module")
def join_con():
    con = duckdb.connect()
    for t in ("orders", "customer", "lineitem"):
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF_DIR}/{t}.parquet')"
        )
    return con


@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    bal=st.integers(min_value=-1000, max_value=9000),
    status=st.sampled_from(STATUSES),
    join_type=st.sampled_from(["inner", "left", "left_semi", "left_anti"]),
)
def test_random_join_equivalence(spark, join_con, bal, status, join_type):
    """Randomized join: orders(status filter) ⋈ customer(acctbal filter) must
    agree with DuckDB across join types — exercises Catalyst's join-type
    rewrites (semi/anti pushdowns) against an independent engine."""
    o = load_table(spark, SF_DIR, "orders").filter(F.col("o_orderstatus") == status)
    c = load_table(spark, SF_DIR, "customer").filter(F.col("c_acctbal") > bal)
    j = o.join(c, o.o_custkey == c.c_custkey, join_type)
    got = j.agg(
        F.count(F.lit(1)).alias("n"), F.countDistinct("o_custkey").alias("d")
    ).collect()[0]

    exists = (
        f"EXISTS (SELECT 1 FROM customer c "
        f"WHERE c.c_custkey = o.o_custkey AND c.c_acctbal > {bal})"
    )
    from_clause, has_where = {
        "inner": (
            f"orders o JOIN customer c "
            f"ON o.o_custkey = c.c_custkey AND c.c_acctbal > {bal}",
            False,
        ),
        "left": (
            f"orders o LEFT JOIN (SELECT * FROM customer WHERE c_acctbal > {bal}) c "
            f"ON o.o_custkey = c.c_custkey",
            False,
        ),
        "left_semi": (f"orders o WHERE {exists}", True),
        "left_anti": (f"orders o WHERE NOT {exists}", True),
    }[join_type]
    conj = "AND" if has_where else "WHERE"
    want = join_con.execute(
        f"SELECT COUNT(*), COUNT(DISTINCT o_custkey) FROM {from_clause} "
        f"{conj} o.o_orderstatus = '{status}'"
    ).fetchone()
    assert (got["n"], got["d"]) == want
