"""Declared-query registry: the executable form of SURVEY.md §2's contract.

Every operator/function marked **[Q]** in SURVEY.md §2 registers here a
(Spark builder, DuckDB oracle SQL) pair; **[R]** rows register a builder with
``oracle=None`` (rows-only check). ``__spark_entry__.queries()`` /
``oracle_sql()`` are thin views over this registry.

Determinism rules (SURVEY.md §5):
- alias every computed column identically in builder and oracle;
- aggregate DOUBLE columns through DECIMAL(18,2) so Spark's parallel sum and
  DuckDB's serial sum are bit-identical after the final cast back to DOUBLE;
- no raw TIMESTAMP output columns (cast to DATE or format to string);
- sort any collected array; never use rand()/current_* in a [Q] query.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession


@dataclass(frozen=True)
class Query:
    """One declared query: Spark-side builder + optional DuckDB oracle."""

    name: str
    build: Callable[[SparkSession, str], DataFrame]
    oracle: str | None = None
    doc: str = ""
    tags: tuple[str, ...] = field(default=())


REGISTRY: dict[str, Query] = {}


def register(
    name: str, oracle: str | None = None, doc: str = "", tags: tuple[str, ...] = ()
) -> Callable:
    """Decorator: add a (spark, sf_dir) -> DataFrame builder to the registry."""

    def deco(fn: Callable[[SparkSession, str], DataFrame]):
        if name in REGISTRY:
            raise ValueError(f"duplicate query name: {name}")
        REGISTRY[name] = Query(name, fn, oracle, doc or (fn.__doc__ or ""), tags)
        return fn

    return deco


# Every module that registers queries. Imported for side effects by
# load_all(); each name here MUST exist (a missing module is a hard error,
# not silently skipped — round 1 shipped phantom imports and lost the round).
QUERY_MODULES = (
    "apache_hive_1_2_2_src_spark.operators.aggregates",
    "apache_hive_1_2_2_src_spark.operators.joins",
    "apache_hive_1_2_2_src_spark.operators.relational",
    "apache_hive_1_2_2_src_spark.operators.windows",
    "apache_hive_1_2_2_src_spark.operators.workloads",
    "apache_hive_1_2_2_src_spark.functions.scalar_conditional",
    "apache_hive_1_2_2_src_spark.functions.scalar_datetime",
    "apache_hive_1_2_2_src_spark.functions.scalar_math",
    "apache_hive_1_2_2_src_spark.functions.scalar_string",
    "apache_hive_1_2_2_src_spark.functions.extensibility",
    "apache_hive_1_2_2_src_spark.functions.generators",
    "apache_hive_1_2_2_src_spark.functions.scalar_collection",
    "apache_hive_1_2_2_src_spark.sources.io",
    "apache_hive_1_2_2_src_spark.streaming.windows",
    "apache_hive_1_2_2_src_spark.extensions.dedup",
    "apache_hive_1_2_2_src_spark.extensions.similarity",
    "apache_hive_1_2_2_src_spark.extensions.text",
    "apache_hive_1_2_2_src_spark.extensions.multimodal",
)


def load_all() -> dict[str, Query]:
    """Import every module that registers queries; return the full registry."""
    import importlib

    for mod in QUERY_MODULES:
        importlib.import_module(mod)
    return REGISTRY
