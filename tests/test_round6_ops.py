"""Invariant tests for the round-6-continuation operators: SCD2 version
tiling, exact-substring span detection on planted duplicates, and the
token-budget greedy-prefix contract. Complements the oracle checks with
properties the value-hash can't see (e.g. 'versions tile with no overlap'
is true of the CORRECT answer but also worth asserting structurally so a
future edit can't trade it away while still matching a weakened oracle)."""

from __future__ import annotations

from pyspark.sql import functions as F

from tests.conftest import SF_DIR


def test_scd2_versions_tile(spark, registry):
    """Per customer: exactly one current row; valid ranges are disjoint,
    ordered, and each closed version's valid_to equals the next version's
    valid_from (no gaps, no overlaps) when collapsed to day grain."""
    df = registry["workload_scd2_dimension"].build(spark, SF_DIR)
    # one is_current per customer
    cur = (
        df.groupBy("c_custkey")
        .agg(F.sum(F.col("is_current").cast("int")).alias("n_cur"))
        .where(F.col("n_cur") != 1)
        .count()
    )
    assert cur == 0
    # tiling: lead(valid_from) over version order == valid_to
    from pyspark.sql import Window

    # Deterministic tie-break for same-day version flips: an open
    # (valid_to IS NULL) version must sort last among equal valid_from,
    # mirroring the operator's (valid_from_ts, grp) ordering (ADVICE r6).
    w = Window.partitionBy("c_custkey").orderBy(
        "valid_from", F.col("valid_to").isNull(), "status"
    )
    bad = (
        df.withColumn("next_from", F.lead("valid_from").over(w))
        .where(
            (F.col("valid_to").isNotNull() & (F.col("valid_to") != F.col("next_from")))
            | (F.col("valid_to").isNull() & F.col("next_from").isNotNull())
        )
        .count()
    )
    assert bad == 0
    # no zero-or-negative spans
    assert df.where(
        F.col("valid_to").isNotNull() & (F.col("valid_to") < F.col("valid_from"))
    ).count() == 0


def test_substring_spans_detects_planted_duplicate(spark, registry):
    """Plant a verbatim 12-token span into two otherwise-distinct docs: both
    must be flagged with >= 12-8+1 = 5 duplicated gram positions; a doc of
    unique tokens must report zero; a short doc (< 8 tokens) must surface
    with n_grams = 0."""
    import apache_hive_1_2_2_src_spark.extensions.dedup as dedup

    span = "alpha bravo charlie delta echo foxtrot golf hotel india juliett kilo lima"
    rows = [
        (1, f"one unique opening {span} tail one", "en", "s", 0),
        (2, f"completely different head words {span} other ending", "en", "s", 0),
        (3, "every token here appears exactly once nowhere else repeated at all today", "en", "s", 0),
        (4, "too short", "en", "s", 0),
    ]
    planted = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    )
    # dedup.py binds load_table at import time — patch the module-local name.
    orig = dedup.load_table
    try:
        dedup.load_table = lambda sp, sf, t, _o=orig: (
            planted if t == "documents" else _o(sp, sf, t)
        )
        out = {
            r.doc_id: r
            for r in dedup.dedup_substring_spans(spark, SF_DIR).collect()
        }
    finally:
        dedup.load_table = orig
    assert out[1].n_dup_grams >= 5 and out[2].n_dup_grams >= 5
    assert out[3].n_dup_grams == 0 and not out[3].half_duplicated
    assert out[4].n_grams == 0 and out[4].n_dup_grams == 0


def test_token_budget_greedy_prefix(spark, registry):
    """Selection is the maximal greedy prefix: every selected source stays
    within budget, and adding the FIRST unselected doc (in ranking order)
    would exceed it."""
    from pyspark.sql import Window

    from apache_hive_1_2_2_src_spark.tables import load_table

    budget = 200
    sel = registry["sample_token_budget"].build(spark, SF_DIR)
    audit = {r.source: r for r in sel.collect()}
    assert all(r.within_budget for r in audit.values())
    d = load_table(spark, SF_DIR, "documents").select(
        "doc_id",
        "source",
        "n_chars",
        F.size(F.filter(F.split("text", " "), lambda x: x != "")).alias("n_tok"),
    )
    w = (
        Window.partitionBy("source")
        .orderBy(F.col("n_chars").desc(), F.col("doc_id"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    ranked = d.withColumn("cum", F.sum("n_tok").over(w))
    first_out = (
        ranked.where(F.col("cum") > budget)
        .groupBy("source")
        .agg(F.min("cum").alias("first_excluded_cum"))
        .collect()
    )
    for r in first_out:
        # the first excluded doc really would not have fit
        assert r.first_excluded_cum > budget
        if r.source in audit:
            assert audit[r.source].tokens_selected <= budget


def test_incremental_lsh_equals_restricted_full(spark):
    """The incremental candidate restriction must lose nothing: pairs from
    is_new-mode LSH == full-corpus LSH pairs restricted to those involving
    a new doc. (Materialize the first result before the second call — the
    pinned-index contract releases the previous index.)"""
    from pyspark.sql import functions as F

    from apache_hive_1_2_2_src_spark.extensions.dedup import (
        _words,
        minhash_lsh_pairs,
    )
    from apache_hive_1_2_2_src_spark.tables import load_table

    d = load_table(spark, SF_DIR, "documents").select("doc_id", _words().alias("w"))
    full = {
        (r.doc_a, r.doc_b)
        for r in minhash_lsh_pairs(d).collect()
        if r.doc_a % 7 == 0 or r.doc_b % 7 == 0
    }
    inc = {
        (r.doc_a, r.doc_b)
        for r in minhash_lsh_pairs(d, is_new=F.col("doc_id") % 7 == 0).collect()
    }
    assert inc == full
