"""Assertion helpers over `.explain("formatted")` text (see package doc)."""

from __future__ import annotations

from pyspark.sql import DataFrame


def plan_text(df: DataFrame, mode: str = "formatted") -> str:
    """The physical plan as a string (what .explain prints)."""
    return df._sc._jvm.PythonSQLUtils.explainString(  # noqa: SLF001
        df._jdf.queryExecution(), mode
    )


def assert_no_cartesian(df: DataFrame) -> None:
    """Fail if the plan contains an all-pairs stage.

    CartesianProduct (and an un-hinted BroadcastNestedLoopJoin on a large
    build side) is the plan shape that cannot survive a 100 TB input.
    """
    p = plan_text(df)
    assert "CartesianProduct" not in p, "plan contains CartesianProduct:\n" + p


def assert_broadcasts(df: DataFrame, at_least: int = 1) -> None:
    """Fail unless >= at_least broadcast joins are present (dimension sides)."""
    p = plan_text(df)
    n = p.count("BroadcastHashJoin") + p.count("BroadcastNestedLoopJoin")
    assert n >= at_least, f"expected >= {at_least} broadcast joins, found {n}:\n" + p


def assert_pushed_filter(df: DataFrame, fragment: str) -> None:
    """Fail unless `fragment` appears in a PushedFilters clause of a scan."""
    p = plan_text(df)
    pushed = [ln for ln in p.splitlines() if "PushedFilters" in ln]
    assert any(fragment in ln for ln in pushed), (
        f"filter fragment {fragment!r} not pushed to any scan; pushed lines: {pushed}"
    )
