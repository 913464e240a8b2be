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
