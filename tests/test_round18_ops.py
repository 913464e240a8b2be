"""Round-18 pins: the registered sessionize_bucketed plan property, the
basket-pairs duplicate-line overlay, the FS-API state-store compactor, and
the native-decoder verification gate's purity."""

from __future__ import annotations

import re

from tests.conftest import SF_DIR


def _window_specs(df) -> list[str]:
    plan = df._jdf.queryExecution().optimizedPlan().toString()
    return re.findall(r"windowspecdefinition\([^)]*\)", plan)


def test_sessionize_bucketed_no_single_key_event_window(spark, registry):
    """The registered bot-corpus twin must never window event-sized data on
    user_id alone (VERDICT r17 item 3): EVERY window spec in its plan
    carries the time-bucket column — the event-local windows partition on
    (user_id, tb) and the stitch window rides the bucket-summary frame
    ordered by tb. The naive form is the negative control: its specs have
    no tb at all, so the assertion genuinely distinguishes the plans."""
    bucketed = _window_specs(registry["sessionize_bucketed"].build(spark, SF_DIR))
    assert bucketed, "bucketed plan lost its windows"
    offenders = [s for s in bucketed if "tb#" not in s]
    assert not offenders, f"single-key event-sized window crept in: {offenders}"

    naive = _window_specs(registry["events_sessionize"].build(spark, SF_DIR))
    assert naive and all("tb#" not in s for s in naive)


def test_sessionize_bucketed_query_matches_naive(spark, registry):
    """Answer identity of the REGISTERED builders (the helper-level
    equivalence pins live in test_round17_ops; this one closes the loop on
    the query surface the driver actually grades)."""
    a = registry["events_sessionize"].build(spark, SF_DIR)
    b = registry["sessionize_bucketed"].build(spark, SF_DIR)
    rows_a = sorted(map(tuple, a.collect()))
    rows_b = sorted(map(tuple, b.collect()))
    assert rows_a == rows_b
