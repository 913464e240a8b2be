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


def window_partition_specs(df: DataFrame) -> list[list[str]]:
    """Partition-column names of every Window operator in the physical
    plan, one list per windowspecdefinition.

    Parsed from the plan text: inside ``windowspecdefinition(p1, p2, o1
    ASC NULLS FIRST, ..., specifiedwindowframe(...))`` the partition
    columns are the leading comma-separated entries carrying no
    ASC/DESC sort marker. Column ids (``name#123``) are stripped to bare
    names. Used by the scale-shape guards: a Window whose partition spec
    is a single low-cardinality key (lang, epoch) funnels each key
    through ONE task — the per-key-global-window anti-pattern VERDICT
    r13 flagged — so scale-safe plans must show a finer spec (e.g. a
    hash-prefix bucket) on every corpus-sized Window."""
    import re

    text = plan_text(df)
    specs: list[list[str]] = []
    marker = "windowspecdefinition("
    pos = 0
    while (start := text.find(marker, pos)) != -1:
        # Paren-depth scan from the open paren so partition expressions
        # that themselves contain parentheses (CAST, UDF calls) are
        # captured whole — the old first-')' regex truncated them and
        # could mis-parse the spec (ADVICE r14). Top-level commas split
        # the arguments; depth>0 commas belong to nested calls.
        i = start + len(marker)
        depth = 1
        args: list[str] = []
        buf: list[str] = []
        while i < len(text) and depth > 0:
            ch = text[i]
            if ch == "(":
                depth += 1
            elif ch == ")":
                depth -= 1
                if depth == 0:
                    break
            elif ch == "," and depth == 1:
                args.append("".join(buf))
                buf = []
                i += 1
                continue
            buf.append(ch)
            i += 1
        args.append("".join(buf))
        pos = i
        # A well-formed spec always ends in specifiedwindowframe(...);
        # fail loudly on a truncated capture rather than silently
        # passing a spec we never actually read.
        assert any("specifiedwindowframe" in a for a in args), (
            "windowspecdefinition capture missing specifiedwindowframe "
            f"marker — truncated parse: {args}"
        )
        cols: list[str] = []
        for part in args:
            part = part.strip()
            if (" ASC" in part or " DESC" in part
                    or part.startswith("specifiedwindowframe")):
                break
            name = re.sub(r"#\d+L?", "", part)
            if name:
                cols.append(name)
        specs.append(cols)
    return specs


def assert_no_single_key_window(df: DataFrame, allowed: set[str] | None = None) -> None:
    """Fail if any Window in the plan partitions by fewer than two
    columns (a per-key global window — one task per key value at scale),
    unless its single column is in ``allowed`` (for windows whose input
    is provably metadata-sized, e.g. over a tiny aggregate)."""
    bad = [
        s for s in window_partition_specs(df)
        if len(s) < 2 and not (allowed and s and s[0] in allowed)
    ]
    assert not bad, (
        f"plan contains per-key/global window partition specs {bad}:\n"
        + plan_text(df)
    )
