"""Driver contract for the spark-graft builder (PySpark target).

``queries()`` / ``oracle_sql()`` are thin views over the declared-query
registry (``apache_hive_1_2_2_src_spark.registry``) — every operator from
SURVEY.md §2 registers a (Spark builder, DuckDB oracle) pair there.
``entry()`` runs the flagship TPC-H-Q1-style pricing summary at sf0.001.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

# Import must work regardless of the driver's cwd.
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from apache_hive_1_2_2_src_spark.registry import load_all  # noqa: E402


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    q = load_all()["q1_pricing_summary"]
    return q.build(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return {name: q.build for name, q in load_all().items()}


def oracle_sql() -> dict[str, str]:
    """DuckDB-equivalent SQL for every [Q] query; [R] rows omit theirs."""
    return {name: q.oracle for name, q in load_all().items() if q.oracle is not None}
