"""Plan auditing: programmatic access to Spark physical plans.

Hive's EXPLAIN lived in ``ql/exec/ExplainTask.java``; the Spark-native
equivalent is `df.explain(...)`. This module exposes the formatted plan as a
string plus assertion helpers so tests (and users) can pin the scale
properties that matter — filter pushdown reaching the scan, broadcasts on
dimension joins, absence of cartesian products — instead of eyeballing
EXPLAIN output.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

from apache_hive_1_2_2_src_spark.plans.audit import (  # noqa: F401
    assert_broadcasts,
    assert_no_cartesian,
    assert_pushed_filter,
    plan_text,
)

__all__ = ["plan_text", "assert_no_cartesian", "assert_broadcasts", "assert_pushed_filter"]


def explain_str(df: DataFrame, mode: str = "formatted") -> str:
    return plan_text(df, mode)
