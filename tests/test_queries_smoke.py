"""Per-query smoke tests at sf0.001: every registered query builds, executes,
and returns a stable non-degenerate schema. Mirrors the granularity of the
reference's per-function q-tests (udf_*.q; SURVEY.md §5)."""

from __future__ import annotations

import pytest

from apache_hive_1_2_2_src_spark.registry import load_all
from tests.conftest import SF_DIR

# Queries whose row count may legitimately be 0 at sf0.001 (tiny data →
# no near-dup pairs / empty anti-join results).
MAY_BE_EMPTY = {
    "join_left_anti",
    "dedup_ngram_jaccard",
    "dedup_minhash_lsh",
    "dedup_simhash",
    "similarity_cosine_threshold",
    "text_context_ngrams",
}

_ALL = sorted(load_all())


@pytest.mark.parametrize("name", _ALL)
def test_query_executes(spark, registry, name):
    q = registry[name]
    df = q.build(spark, SF_DIR)
    assert len(df.schema.fields) > 0, f"{name}: empty schema"
    n = df.count()
    if name not in MAY_BE_EMPTY:
        assert n > 0, f"{name}: returned 0 rows at sf0.001"


@pytest.mark.parametrize("name", sorted(MAY_BE_EMPTY))
def test_may_be_empty_nonempty_at_grading_sf(spark, registry, name):
    """The sf0.001 exemption must not let an oracle silently certify an
    empty result at the driver's grading scale: every MAY_BE_EMPTY query
    must return rows at sf0.01 (VERDICT r5 polish item — an exemption that
    also held at sf0.01 would make 'oracle matches' vacuously true)."""
    n = registry[name].build(spark, "/root/testdata/sf0.01").count()
    assert n > 0, f"{name}: empty at sf0.01 — its oracle check is vacuous"
