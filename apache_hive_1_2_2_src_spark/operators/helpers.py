"""Shared builder helpers enforcing the determinism rules of registry.py."""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

DEC = "decimal(18,2)"


def dsum(col: Column | str, alias: str) -> Column:
    """Cross-engine-exact SUM of a double column (via decimal)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.sum(c.cast(DEC)).cast("double").alias(alias)


def davg(col: Column | str, alias: str, scale: int = 6) -> Column:
    """Cross-engine-exact AVG of a double column: decimal sum / count, rounded."""
    c = F.col(col) if isinstance(col, str) else col
    return F.round(F.sum(c.cast(DEC)) / F.count(c), scale).cast("double").alias(alias)


def dec(col: Column | str) -> Column:
    """Cast a 2-dp-valued double column to exact decimal."""
    c = F.col(col) if isinstance(col, str) else col
    return c.cast(DEC)


def dsum_exact(col: Column, alias: str) -> Column:
    """SUM of an already-exact decimal expression (no re-rounding), as double.

    Use for products of dec() factors: casting each *factor* to decimal makes
    the product exact in both engines, whereas casting a double *product*
    rounds differently (Spark HALF_UP on the binary expansion vs DuckDB's
    shortest-repr rounding) and diverges at the last decimal.
    """
    return F.sum(col).cast("double").alias(alias)


def sql_dec(expr: str) -> str:
    return f"CAST({expr} AS DECIMAL(18,2))"


def sql_dsum(expr: str, alias: str) -> str:
    return f"CAST(SUM(CAST({expr} AS DECIMAL(18,2))) AS DOUBLE) AS {alias}"


def sql_davg(expr: str, alias: str, scale: int = 6) -> str:
    return (
        f"CAST(ROUND(SUM(CAST({expr} AS DECIMAL(18,2))) / COUNT({expr}), {scale})"
        f" AS DOUBLE) AS {alias}"
    )


def cap_partitions(df, part_cols: list[str], order_col: str, cap: int):
    """Deterministic hot-bucket skew guard shared by the LSH family
    (SimHash bands, sign-bit ANN buckets): keep only the first ``cap`` rows
    per partition in ``order_col`` order, so a degenerate bucket can never
    drive a quadratic within-bucket self-join. Mirror the identical
    row_number cap in any paired DuckDB oracle (the SQL dialects differ, so
    the mirrors stay inline at each oracle)."""
    from pyspark.sql import Window

    w = Window.partitionBy(*part_cols).orderBy(order_col)
    return (
        df.withColumn("__rk", F.row_number().over(w))
        .filter(F.col("__rk") <= cap)
        .drop("__rk")
    )
