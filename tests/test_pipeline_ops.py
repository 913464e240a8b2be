"""Property tests for the round-4 pipeline operators: contamination check,
temperature mix, reservoir sampling, shard assignment, int8 quantization,
and embedding-cosine dedup. The oracle sweep certifies cross-engine
equality; these tests certify the SEMANTICS (the invariants a pipeline
relies on) and the plan shapes (the scale claims in each docstring)."""

from __future__ import annotations

import pytest

from apache_hive_1_2_2_src_spark.plans import plan_text
from tests.conftest import SF_DIR


@pytest.fixture(scope="module")
def run(spark, registry):
    def _run(name):
        return registry[name].build(spark, SF_DIR)

    return _run


def test_contamination_flags_only_train_docs(run):
    rows = run("text_contamination_check").collect()
    assert rows, "4-gram probe must produce hits on this corpus"
    for r in rows:
        assert r.doc_id % 97 != 0, "eval docs must never be flagged"
        assert 0 < r.n_contaminated <= r.n_grams
        assert 0.0 < r.contamination_ratio <= 1.0


def test_contamination_probe_is_broadcast(spark, registry):
    p = plan_text(registry["text_contamination_check"].build(spark, SF_DIR))
    assert "BroadcastHashJoin" in p, "eval gram set must broadcast"
    assert "CartesianProduct" not in p


def test_temperature_mix_boosts_low_resource_langs(run):
    rows = {r.lang: r for r in run("sample_temperature_mix").collect()}
    assert abs(sum(r.temp_share for r in rows.values()) - 1.0) < 1e-4
    assert abs(sum(r.raw_share for r in rows.values()) - 1.0) < 1e-4
    lo = min(rows.values(), key=lambda r: r.n_docs)
    hi = max(rows.values(), key=lambda r: r.n_docs)
    if lo.n_docs < hi.n_docs:  # corpus actually imbalanced
        assert lo.temp_share > lo.raw_share, "low-resource lang up-sampled"
        assert hi.temp_share < hi.raw_share, "high-resource lang down-sampled"


def test_reservoir_sample_fixed_size_and_deterministic(run):
    rows = run("sample_reservoir_per_source").collect()
    per_source: dict[str, list[int]] = {}
    for r in rows:
        per_source.setdefault(r.source, []).append(r.doc_id)
        assert 1 <= r.rk <= 5
    assert all(len(v) <= 5 for v in per_source.values())
    # deterministic: a second build returns the identical sample
    again = {(r.source, r.doc_id, r.rk) for r in run("sample_reservoir_per_source").collect()}
    assert {(r.source, r.doc_id, r.rk) for r in rows} == again


def test_shard_assignment_covers_corpus_and_balances(run, spark):
    from apache_hive_1_2_2_src_spark.tables import load_table

    rows = run("pipeline_shard_assign").collect()
    assert {r.shard_id for r in rows} <= set(range(32))
    total = sum(r.n_docs for r in rows)
    assert total == load_table(spark, SF_DIR, "documents").count()
    # md5 uniformity: no shard holds more than 4x its fair share
    assert max(r.n_docs for r in rows) <= 4 * total / 32


def test_quantize_audit_error_bound(run):
    rows = run("embedding_quantize_audit").collect()
    assert rows
    for r in rows:
        assert r.n_sat >= 1, "the absmax element must saturate to ±127"
        # per-element |err| <= 0.5/scale = max_abs/254; mean must obey it
        assert r.mean_abs_qerr <= r.max_abs / 254 + 1e-9
        assert r.l2_norm == pytest.approx(1.0, abs=1e-3)  # corpus is unit-norm


def test_embedding_dedup_clusters_are_disjoint_keepers(run):
    rows = run("dedup_embedding_cosine").collect()
    keepers = [r.keeper_id for r in rows]
    assert len(keepers) == len(set(keepers))
    for r in rows:
        assert r.cluster_size >= 2, "a cluster is at least one pair"
        assert r.keeper_id == r.cluster_id, "min-label keeper == min-id label"


def test_pack_sequences_bins_are_contiguous(run):
    rows = run("pipeline_pack_sequences").collect()
    by_lang: dict[str, list] = {}
    for r in rows:
        by_lang.setdefault(r.lang, []).append(r)
    for lang, bins in by_lang.items():
        ids = sorted(b.bin_id for b in bins)
        assert ids == list(range(len(ids))), f"{lang}: bin ids must be dense"
        # every bin except possibly the last holds >= 2048 tokens worth of
        # docs only if docs straddle; weaker invariant: all bins non-empty
        assert all(b.n_docs >= 1 for b in bins)


def test_chunk_windows_invariants(spark, registry):
    """Chunking contract on real docs: chunks tile every token (first chunk
    starts at 0, consecutive chunks overlap by exactly context-stride except
    a possibly-shorter last, last chunk ends at n), per doc."""
    from tests.conftest import SF_DIR

    rows = (
        registry["text_chunk_windows"]
        .build(spark, SF_DIR)
        .collect()
    )
    by_doc: dict[int, list] = {}
    for r in rows:
        by_doc.setdefault(r.doc_id, []).append(r)
    assert by_doc
    context, stride = 32, 24
    for doc, chunks in by_doc.items():
        chunks.sort(key=lambda r: r.chunk_no)
        assert [c.chunk_no for c in chunks] == list(range(len(chunks)))
        assert chunks[0].start_tok == 0
        n = chunks[-1].start_tok + chunks[-1].chunk_len  # is_last ends at n
        assert chunks[-1].is_last
        for c in chunks[:-1]:
            assert not c.is_last
            assert c.chunk_len == min(context, n - c.start_tok)
        for a, b in zip(chunks, chunks[1:]):
            assert b.start_tok - a.start_tok == stride
        # full coverage: every token index < n falls in some chunk
        covered = max(c.start_tok + c.chunk_len for c in chunks)
        assert covered == n
