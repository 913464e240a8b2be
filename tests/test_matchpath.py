"""match_path() compiler semantics on hand-built sequences: boundary
un-quantified elements consume one row off their run's edge, middle
un-quantified elements require exact run length 1, and invalid patterns
fail at compile time (never silently empty)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from apache_hive_1_2_2_src_spark.operators.matchpath import match_path

SYMBOLS = lambda: {  # noqa: E731
    "HIGH": F.col("v") > 60.0,
    "LOW": F.col("v") < 30.0,
    "MID": F.lit(True),
}


def _seq(spark, vals):
    return spark.createDataFrame(
        [(1, i, float(v)) for i, v in enumerate(vals)], "u long, t long, v double"
    )


def _run(spark, vals, pattern):
    out = match_path(
        _seq(spark, vals), "u", ["t"], SYMBOLS(), pattern, F.col("v")
    ).collect()
    return sorted((r.path_start, r.path_len, r.path_value) for r in out)


def test_boundary_unquantified_consume_run_edges(spark):
    # runs: LOW[10,20] HIGH[70,80] LOW[15] HIGH[90] LOW[12]
    got = _run(spark, [10, 20, 70, 80, 15, 90, 12], "LOW HIGH+ LOW")
    assert got == [
        ("1", 4, 20 + 70 + 80 + 15.0),  # first LOW consumes its run's LAST row
        ("4", 3, 15 + 90 + 12.0),
    ]


def test_middle_unquantified_requires_len_1(spark):
    assert _run(spark, [70, 10, 80], "HIGH+ LOW HIGH+") == [("0", 3, 160.0)]
    # two-row dip: middle un-quantified LOW cannot match
    assert _run(spark, [70, 10, 20, 80], "HIGH+ LOW HIGH+") == []


def test_unclassified_rows_break_runs(spark):
    # MID row (45) between the HIGHs breaks adjacency when MID is not a
    # pattern symbol position.
    assert _run(spark, [70, 10, 45, 80], "HIGH+ LOW HIGH+") == []


def test_partition_edge_does_not_match(spark):
    # pattern hangs off the end: HIGH+ LOW HIGH+ needs a trailing HIGH run
    assert _run(spark, [70, 10], "HIGH+ LOW HIGH+") == []


def test_plus_consumes_whole_runs(spark):
    got = _run(spark, [70, 80, 90, 10, 65], "HIGH+ LOW HIGH+")
    assert got == [("0", 5, 70 + 80 + 90 + 10 + 65.0)]


def test_invalid_patterns_raise(spark):
    d = _seq(spark, [1.0])
    with pytest.raises(ValueError, match="adjacent"):
        match_path(d, "u", ["t"], SYMBOLS(), "HIGH HIGH+", F.col("v"))
    with pytest.raises(ValueError, match="not in symbols"):
        match_path(d, "u", ["t"], SYMBOLS(), "HIGH+ NOPE", F.col("v"))


# ---------------------------------------------------------------------------
# Property: match_path() agrees with a direct Python reference matcher on
# random symbol sequences and random valid patterns. The reference walks the
# run-compressed sequence exactly as the module doc specifies (greedy '+'
# consumes whole runs; un-quantified elements consume one edge row at
# pattern boundaries and require len==1 in the middle).
# ---------------------------------------------------------------------------

from hypothesis import HealthCheck, given, settings  # noqa: E402
from hypothesis import strategies as st  # noqa: E402

SYM_OF = lambda v: "HIGH" if v > 60 else ("LOW" if v < 30 else "MID")  # noqa: E731
VALS = {"HIGH": 70.0, "LOW": 10.0, "MID": 45.0}


def _ref_matches(vals, pattern_elems):
    """Reference matcher over one partition: returns sorted
    (start_t, path_len, path_value) triples."""
    runs = []  # (sym, [indices])
    for i, v in enumerate(vals):
        s = SYM_OF(v)
        if runs and runs[-1][0] == s:
            runs[-1][1].append(i)
        else:
            runs.append((s, [i]))
    k = len(pattern_elems)
    out = []
    for r0 in range(len(runs) - k + 1):
        window = runs[r0 : r0 + k]
        ok = True
        consumed = []
        for j, (sym, plus) in enumerate(pattern_elems):
            rsym, idxs = window[j]
            if rsym != sym:
                ok = False
                break
            if plus:
                consumed.append(idxs)
            elif j == 0:
                consumed.append(idxs[-1:])
            elif j == k - 1:
                consumed.append(idxs[:1])
            else:
                if len(idxs) != 1:
                    ok = False
                    break
                consumed.append(idxs)
        if ok:
            flat = [i for c in consumed for i in c]
            out.append(
                (str(consumed[0][0]), len(flat), float(sum(vals[i] for i in flat)))
            )
    return sorted(out)


@settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    syms=st.lists(st.sampled_from(["HIGH", "LOW", "MID"]), min_size=1, max_size=24),
    pat=st.sampled_from(
        [
            [("HIGH", True), ("LOW", False), ("HIGH", True)],
            [("LOW", False), ("HIGH", True), ("LOW", False)],
            [("LOW", True), ("MID", True)],
            [("MID", False), ("HIGH", True)],
            [("HIGH", True), ("MID", False), ("LOW", True), ("MID", True)],
        ]
    ),
)
def test_match_path_agrees_with_reference(spark, syms, pat):
    vals = [VALS[s] for s in syms]
    pattern = " ".join(s + ("+" if p else "") for s, p in pat)
    got = sorted(
        (r.path_start, r.path_len, r.path_value)
        for r in match_path(
            _seq(spark, vals), "u", ["t"], SYMBOLS(), pattern, F.col("v")
        ).collect()
    )
    assert got == _ref_matches(vals, pat)


def test_optional_question_quantifier(spark):
    # HIGH+ LOW? MID: matches both with and without the dip row.
    # seq A: H H M      -> variant 'HIGH+ MID' (LOW absent)
    # seq B: H L M      -> variant 'HIGH+ LOW MID' (LOW present, 1 row)
    assert _run(spark, [70, 80, 45], "HIGH+ LOW? MID") == [("0", 3, 195.0)]
    assert _run(spark, [70, 10, 45], "HIGH+ LOW? MID") == [("0", 3, 125.0)]
    # two-row dip: '?' means at most one row -> no match
    assert _run(spark, [70, 10, 20, 45], "HIGH+ LOW? MID") == []


def test_optional_star_quantifier(spark):
    # HIGH+ LOW* MID: any-length dip, including none.
    assert _run(spark, [70, 80, 45], "HIGH+ LOW* MID") == [("0", 3, 195.0)]
    assert _run(spark, [70, 10, 20, 45], "HIGH+ LOW* MID") == [("0", 4, 145.0)]


def test_star_collapse_variant_skipped(spark):
    # HIGH+ LOW* HIGH+ with LOW absent collapses to HIGH+ HIGH+
    # (unsatisfiable) — only the LOW-present variant runs.
    assert _run(spark, [70, 10, 20, 80], "HIGH+ LOW* HIGH+") == [("0", 4, 180.0)]
    assert _run(spark, [70, 80], "HIGH+ LOW* HIGH+") == []


def test_all_variants_invalid_raises(spark):
    with pytest.raises(ValueError, match="no satisfiable variant"):
        match_path(_seq(spark, [1.0]), "u", ["t"], SYMBOLS(), "HIGH HIGH+",
                   F.col("v"))
