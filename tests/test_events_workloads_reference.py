"""Independent-formulation checks for the event-log workloads: recompute
sessionization, the funnel, and last-touch attribution with a plain-Python
reference over the (tiny) sf0.001 event log and compare to the Spark
operators. The DuckDB oracles mirror the same window algebra, so they prove
engine parity but not algebraic correctness; these references derive the
answers from first principles (sort a user's events in a list and walk
them), closing that gap the same way test_matchpath.py does for match_path."""

from __future__ import annotations

from collections import defaultdict

from pyspark.sql import functions as F

from tests.conftest import SF_DIR

GAP_US = 12 * 3600 * 1_000_000
ATTR_WINDOW_US = 7 * 24 * 3600 * 1_000_000


def _events(spark):
    from apache_hive_1_2_2_src_spark.tables import load_table

    rows = (
        load_table(spark, SF_DIR, "events")
        .select(
            "user_id",
            "event_id",
            "event_type",
            "value",
            F.unix_micros("ts").alias("ts_us"),
        )
        .collect()
    )
    per_user = defaultdict(list)
    for r in rows:
        per_user[r.user_id].append(r)
    for evs in per_user.values():
        # Same tie-break as the operators/oracles (ts_us, ord, event_id):
        # a same-microsecond touch sorts BEFORE a purchase, so the
        # reference walk cannot diverge on a regenerated fixture with
        # equal-timestamp touch+purchase pairs (ADVICE r6 item 1).
        evs.sort(
            key=lambda r: (
                r.ts_us,
                0 if r.event_type in ("view", "click") else 1,
                r.event_id,
            )
        )
    return per_user


def test_sessionize_matches_python_reference(spark, registry):
    per_user = _events(spark)
    expected = {}  # (user, session_id) -> (n, start, end)
    for u, evs in per_user.items():
        sid = 0
        prev = None
        for r in evs:
            if prev is None or r.ts_us - prev > GAP_US:
                sid += 1
                expected[(u, sid)] = [0, r.ts_us, r.ts_us]
            cell = expected[(u, sid)]
            cell[0] += 1
            cell[2] = r.ts_us
            prev = r.ts_us
    got = {
        (r.user_id, r.session_id): [r.n_events, r.start_us, r.end_us]
        for r in registry["events_sessionize"].build(spark, SF_DIR).collect()
    }
    assert got == expected


def test_funnel_matches_python_reference(spark, registry):
    per_user = _events(spark)
    n_view = n_click = n_purchase = 0
    for evs in per_user.values():
        t_view = next((r.ts_us for r in evs if r.event_type == "view"), None)
        if t_view is None:
            continue
        n_view += 1
        t_click = next(
            (r.ts_us for r in evs if r.event_type == "click" and r.ts_us > t_view),
            None,
        )
        if t_click is None:
            continue
        n_click += 1
        if any(r.event_type == "purchase" and r.ts_us > t_click for r in evs):
            n_purchase += 1
    row = registry["events_funnel"].build(spark, SF_DIR).collect()[0]
    assert (row.n_users, row.n_view, row.n_view_click, row.n_full_funnel) == (
        len(per_user),
        n_view,
        n_click,
        n_purchase,
    )


def test_attribution_matches_python_reference(spark, registry):
    per_user = _events(spark)
    by_channel = defaultdict(lambda: [0, 0.0])
    for evs in per_user.items():
        last_touch = None  # (ts_us, type)
        for r in evs[1]:
            if r.event_type in ("view", "click"):
                last_touch = (r.ts_us, r.event_type)
            elif r.event_type == "purchase":
                if last_touch is not None and r.ts_us - last_touch[0] <= ATTR_WINDOW_US:
                    ch = last_touch[1]
                else:
                    ch = "unattributed"
                by_channel[ch][0] += 1
                by_channel[ch][1] += r.value
    got = {
        r.channel: (r.n_purchases, r.revenue)
        for r in registry["events_attribution_last_touch"]
        .build(spark, SF_DIR)
        .collect()
    }
    assert set(got) == set(by_channel)
    for ch, (n, rev) in by_channel.items():
        assert got[ch][0] == n
        # revenue is decimal(18,2)-exact per addend; the python float sum is
        # the reference within a loose epsilon
        assert abs(got[ch][1] - round(rev, 2)) < 0.05, ch


def test_dau_wau_matches_python_reference(spark, registry):
    """The spread trick must equal the direct definition: WAU(d) = distinct
    users with any activity in [d-6, d]."""
    from apache_hive_1_2_2_src_spark.tables import load_table

    rows = (
        load_table(spark, SF_DIR, "events")
        .select("user_id", F.col("ts").cast("date").alias("day"))
        .distinct()
        .collect()
    )
    days = defaultdict(set)
    for r in rows:
        days[r.day].add(r.user_id)
    got = {r.day: (r.dau, r.wau) for r in registry["events_dau_wau"].build(spark, SF_DIR).collect()}
    import datetime as dt

    for day, users in days.items():
        wau = set()
        for off in range(7):
            wau |= days.get(day - dt.timedelta(days=off), set())
        d = day.isoformat()
        assert got[d] == (len(users), len(wau)), d
    assert set(got) == {d.isoformat() for d in days}


def test_basket_pairs_matches_python_reference(spark, registry):
    """Top-20 co-occurring part pairs vs brute-force counting."""
    from itertools import combinations

    from apache_hive_1_2_2_src_spark.tables import load_table

    rows = (
        load_table(spark, SF_DIR, "lineitem")
        .select("l_orderkey", "l_partkey")
        .distinct()
        .collect()
    )
    baskets = defaultdict(set)
    for r in rows:
        baskets[r.l_orderkey].add(r.l_partkey)
    counts = defaultdict(int)
    for parts in baskets.values():
        for a, b in combinations(sorted(parts), 2):
            counts[(a, b)] += 1
    expected = sorted(
        ((n, a, b) for (a, b), n in counts.items()),
        key=lambda t: (-t[0], t[1], t[2]),
    )[:20]
    got = [
        (r.n_baskets, r.part_a, r.part_b)
        for r in registry["workload_basket_pairs"].build(spark, SF_DIR).collect()
    ]
    assert got == expected
