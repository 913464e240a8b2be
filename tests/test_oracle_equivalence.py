"""Spark ↔ DuckDB oracle equivalence at sf0.001 for a representative sample
of [Q] queries (the full sweep runs in tools/check.py at sf0.01; this keeps
pytest fast while still exercising the comparison machinery end-to-end)."""

from __future__ import annotations

import math

import pytest

from tests.conftest import SF_DIR

SAMPLE = [
    "q1_pricing_summary",
    "join_three_way",
    "agg_grouping_sets",
    "window_row_number_topk",
    "explode_words",
    "collection_array_suite",
    "dedup_exact",
    "similarity_cosine_topk",
    "text_token_stats",
    "window_tumbling_agg",
    "csv_roundtrip_agg",
    "multimodal_metadata",
]


def norm_cell(v):
    if v is None:
        return "\x00NULL"
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return f"{v:.9g}"
    if isinstance(v, bytes):
        return v.hex()
    if isinstance(v, (list, tuple)):
        return "[" + ",".join(norm_cell(x) for x in v) + "]"
    if isinstance(v, dict):
        return "{" + ",".join(f"{k}:{norm_cell(x)}" for k, x in sorted(v.items())) + "}"
    return str(v)


def norm_rows(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    return sorted(tuple(norm_cell(r[i]) for i in order) for r in rows)


@pytest.mark.parametrize("name", SAMPLE)
def test_oracle_match(spark, registry, oracle_con, name):
    q = registry[name]
    assert q.oracle is not None, f"{name} has no oracle"
    sdf = q.build(spark, SF_DIR)
    srows = [tuple(r) for r in sdf.collect()]
    ores = oracle_con.execute(q.oracle).fetchall()
    ocols = [d[0] for d in oracle_con.description]
    assert sorted(sdf.columns) == sorted(ocols), f"{name}: column mismatch"
    assert len(srows) == len(ores), f"{name}: rowcount {len(srows)} vs {len(ores)}"
    assert norm_rows(sdf.columns, srows) == norm_rows(ocols, ores), f"{name}: values differ"
