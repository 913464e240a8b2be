"""Round-7 operator checks beyond the DuckDB oracles: plain-Python
reference walks (the test_events_workloads_reference pattern) for the
dynamic-gap session window and the time-constrained funnel, and
hand-computed edge cases for the exact weighted median — the oracles prove
engine parity, these prove the algebra from first principles."""

from __future__ import annotations

from collections import defaultdict

from pyspark.sql import functions as F

from apache_hive_1_2_2_src_spark.tables import load_table
from tests.conftest import SF_DIR

HOUR_US = 3600 * 1_000_000
DAY_US = 24 * HOUR_US


def _events(spark):
    rows = (
        load_table(spark, SF_DIR, "events")
        .select("user_id", "event_id", "event_type", F.unix_micros("ts").alias("ts_us"))
        .collect()
    )
    per_user = defaultdict(list)
    for r in rows:
        per_user[r.user_id].append(r)
    for evs in per_user.values():
        evs.sort(key=lambda r: (r.ts_us, r.event_id))
    return per_user


def test_dynamic_gap_session_matches_python_reference(spark, registry):
    """session_window semantics from first principles: each event covers
    [ts, ts+gap); overlapping coverage merges; session end is the max
    covered instant (NOT last-event ts + its gap necessarily — an earlier
    purchase's 30-min span can outlast a later view's 10-min span)."""
    per_user = _events(spark)
    expected = set()
    for u, evs in per_user.items():
        cur = None  # [start, end)
        for r in evs:
            gap = 30 * 60 * 1_000_000 if r.event_type == "purchase" else 10 * 60 * 1_000_000
            if cur is None or r.ts_us >= cur[1]:
                if cur is not None:
                    expected.add((u, cur[0], cur[1], cur[2]))
                cur = [r.ts_us, r.ts_us + gap, 1]
            else:
                cur[1] = max(cur[1], r.ts_us + gap)
                cur[2] += 1
        if cur is not None:
            expected.add((u, cur[0], cur[1], cur[2]))
    got = set()
    df = registry["events_session_dynamic_gap"].build(spark, SF_DIR)
    for r in df.select(
        "user_id",
        F.unix_micros(F.to_timestamp("session_start")).alias("s"),
        F.unix_micros(F.to_timestamp("session_end")).alias("e"),
        "n_events",
    ).collect():
        got.add((r.user_id, r.s, r.e, r.n_events))
    assert got == expected


def test_windowed_funnel_matches_python_reference(spark, registry):
    per_user = _events(spark)
    n_view = n_click = n_purchase = 0
    for evs in per_user.values():
        t_view = next((r.ts_us for r in evs if r.event_type == "view"), None)
        if t_view is None:
            continue
        n_view += 1
        t_click = next(
            (
                r.ts_us
                for r in evs
                if r.event_type == "click"
                and t_view < r.ts_us <= t_view + HOUR_US
            ),
            None,
        )
        if t_click is None:
            continue
        n_click += 1
        if any(
            r.event_type == "purchase" and t_click < r.ts_us <= t_click + DAY_US
            for r in evs
        ):
            n_purchase += 1
    row = registry["events_funnel_windowed"].build(spark, SF_DIR).collect()[0]
    assert (row.n_view, row.n_click_1h, row.n_purchase_24h) == (
        n_view,
        n_click,
        n_purchase,
    )
    assert row.click_rate_bp == n_click * 10000 // n_view
    assert row.purchase_rate_bp == n_purchase * 10000 // max(n_click, 1)


def test_weighted_median_hand_cases(spark):
    """Edge cases the TPC-H data can't pin: ties on the value (must
    collapse before the running sum), even/odd total weight, and a single
    dominant weight."""
    from apache_hive_1_2_2_src_spark.registry import REGISTRY  # noqa: F401

    def wmedian(rows):
        df = spark.createDataFrame(rows, "grp string, val double, w long")
        vw = df.groupBy("grp", "val").agg(F.sum("w").alias("w"))
        from pyspark.sql import Window

        win = (
            Window.partitionBy("grp")
            .orderBy("val")
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )
        c = vw.select(
            "grp",
            "val",
            F.sum("w").over(win).alias("cumw"),
            F.sum("w").over(Window.partitionBy("grp")).alias("totw"),
        )
        out = (
            c.where(2 * F.col("cumw") >= F.col("totw"))
            .groupBy("grp")
            .agg(F.min("val").alias("m"))
            .collect()
        )
        return {r.grp: r.m for r in out}

    # Dominant weight: one value holds >= half the mass.
    assert wmedian(
        [("a", 1.0, 1), ("a", 2.0, 10), ("a", 3.0, 1)]
    ) == {"a": 2.0}
    # Tie rows on the same value must merge: (2.0, 1) + (2.0, 1) == (2.0, 2).
    assert wmedian(
        [("a", 1.0, 1), ("a", 2.0, 1), ("a", 2.0, 1), ("a", 3.0, 1)]
    ) == {"a": 2.0}
    # Even split: 2*cum >= tot first holds at the LOWER middle value.
    assert wmedian([("a", 1.0, 1), ("a", 2.0, 1)]) == {"a": 1.0}
    # Weight skewed to the last value.
    assert wmedian([("a", 1.0, 1), ("a", 2.0, 1), ("a", 9.0, 5)]) == {"a": 9.0}


def test_url_canonical_dedup_collapses_all_variant_classes(spark, registry):
    """Oracle parity can't catch a MIRRORED normalization bug (both engines
    computing the same wrong canon — the round-7 case-sensitive-scheme bug
    collapsed every HTTP:// variant into one '://?id=' key on both sides).
    Pin the structural truth: 500 docs spell 7 sites x 13 pages x 2 schemes
    = 182 logical URLs, every canonical key merges >= 2 spellings, every
    key parses as scheme://host/path, and no key contains a utm_ param, an
    uppercase host, a default port, or a trailing slash."""
    rows = registry["text_url_canonical_dedup"].build(
        spark, SF_DIR
    ).collect()
    assert len(rows) == 182
    assert all(r.n_variants >= 2 for r in rows)
    import re

    for r in rows:
        key = r.curl
        assert re.match(r"^https?://site\d\.example\.com/A/Path\d+\?id=\d+$", key), key
        assert "utm_" not in key and ":80" not in key and ":443" not in key
