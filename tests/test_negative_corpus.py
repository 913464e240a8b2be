"""Negative-corpus parity (SURVEY §5: the reference ships
``ql/src/test/queries/clientnegative/`` — ~800 q-scripts asserting that bad
SQL FAILS, with the error class golden-filed). The Spark-first analogue:
each case pins that the engine rejects (or NULL-yields, where Hive 1.2's
non-ANSI semantics say so) the same inputs Hive rejected, so a reference
user's error expectations survive the migration.

Two families:
- **analysis errors** — bad SQL must raise AnalysisException at plan time
  (missing table/column, ambiguous reference, wrong arity, grouping
  violations) exactly like Hive's SemanticAnalyzer errors
  (clientnegative/invalid_t_column.q, ambiguous_col.q,
  groupby_key.q, udf_assert_true.q...);
- **NULL-not-error runtime semantics** — Hive 1.2 (LazyPrimitive parse,
  GenericUDFOPDivide) yields NULL for bad casts / div-by-zero / bad dates
  where ANSI engines raise; the engine session pins ansi=false, and these
  cases prove the semantics hold (the positive halves live in cast_suite /
  null_semantics_suite — here we pin the NON-error-ness itself).
"""

from __future__ import annotations

import pytest
from pyspark.errors import AnalysisException

from apache_hive_1_2_2_src_spark.tables import load_table
from tests.conftest import SF_DIR


@pytest.fixture(scope="module", autouse=True)
def _views(spark):
    load_table(spark, SF_DIR, "orders").createOrReplaceTempView("neg_orders")
    load_table(spark, SF_DIR, "customer").createOrReplaceTempView("neg_customer")
    yield
    spark.catalog.dropTempView("neg_orders")
    spark.catalog.dropTempView("neg_customer")


ANALYSIS_ERRORS = {
    # clientnegative analogue            bad SQL
    "missing_table": "SELECT * FROM no_such_table_xyz",
    "missing_column": "SELECT o_nope FROM neg_orders",
    "ambiguous_column": (
        "SELECT o_custkey FROM neg_orders a JOIN neg_orders b "
        "ON a.o_orderkey = b.o_orderkey"
    ),
    "wrong_arity_fn": "SELECT substr() FROM neg_orders",
    "nonagg_column_in_groupby": (
        "SELECT o_orderstatus, o_totalprice FROM neg_orders GROUP BY o_orderstatus"
    ),
    "where_on_alias_of_agg": (
        "SELECT COUNT(*) AS c FROM neg_orders WHERE c > 1"
    ),
    "unknown_function": "SELECT definitely_not_a_function(1) FROM neg_orders",
    "star_in_function": "SELECT abs(*) FROM neg_orders",
}


@pytest.mark.parametrize("name", sorted(ANALYSIS_ERRORS))
def test_bad_sql_raises_analysis_error(spark, name):
    with pytest.raises(AnalysisException):
        spark.sql(ANALYSIS_ERRORS[name]).collect()


NULL_NOT_ERROR = {
    # Hive 1.2 non-ANSI semantics: these yield NULL, never an exception.
    "bad_cast_string_to_int": "CAST('abc' AS INT)",
    "div_by_zero": "CAST(1 AS DOUBLE) / 0",
    "int_div_by_zero": "1 DIV 0",
    "mod_by_zero": "1 % 0",
    "bad_date_parse": "CAST('not-a-date' AS DATE)",
    "array_index_oob": "array(1, 2)[5]",
    "map_missing_key": "map('a', 1)['b']",
}


@pytest.mark.parametrize("name", sorted(NULL_NOT_ERROR))
def test_hive_null_semantics_not_errors(spark, name):
    # All of these yield NULL in Hive 1.2 — including x/0, which
    # GenericUDFOPDivide nulls rather than producing IEEE Infinity.
    row = spark.sql(f"SELECT ({NULL_NOT_ERROR[name]}) AS v").collect()[0]
    assert row.v is None, (name, row.v)


def test_overflow_cast_wraps_not_errors(spark):
    """Numeric overflow on cast is engine-defined wraparound/saturation in
    non-ANSI mode (Hive used Java primitive-cast semantics) — the pinned
    property is that it NEVER raises."""
    row = spark.sql(
        "SELECT CAST(9999999999999999999.0 AS INT) AS a, CAST(1e30 AS INT) AS b"
    ).collect()[0]
    assert isinstance(row.a, int) and isinstance(row.b, int)
