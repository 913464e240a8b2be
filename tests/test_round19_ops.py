"""Round-19 pins: the dedup strategy-selection pre-flight (verdict
sensitivity on the SCALE.md r18 pathology corpora + exact diagnostics on a
crafted corpus) and the Hadoop-FS upsert state swap."""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest

from tests.conftest import SF_DIR


# ---------------- dedup strategy pre-flight (VERDICT r18 item 3) ----------


def _diag(spark, rows):
    from apache_hive_1_2_2_src_spark.extensions.dedup import (
        strategy_preflight_diagnostics,
    )

    d = spark.createDataFrame(rows, "doc_id long, text string")
    return strategy_preflight_diagnostics(d).first()


def test_preflight_clean_corpus_picks_plain_probe(spark):
    """Distinct texts, no hot shingle: the direct probe wins (measured
    22.7 s vs the collapse's 37 s on the clean sf0.1 corpus — SCALE.md
    r18), so the verdict must be plain-probe."""
    rows = [(i, f"alpha{i} beta{i} gamma{i} delta{i} eps{i}") for i in range(500)]
    r = _diag(spark, rows)
    assert r["strategy"] == "plain-probe"
    assert r["n_docs"] == 500
    assert r["n_distinct_content"] == 500
    assert r["max_content_group"] == 1
    assert r["identical_pair_mass"] == 0
    assert r["max_rep_shingle_df"] == 1


def test_preflight_clone_mass_picks_exact_collapse(spark):
    """A byte-identical mega-cluster big enough that Sum C(m,2) crosses the
    3e6 crossover (the plain probe pays ~4.6 us per candidate pair —
    SCALE.md r18 measured 51.2 s plain vs 11.9 s collapsed at 8M pairs)
    must flip the verdict to exact-collapse."""
    clones = [(i, "identical boilerplate text repeated verbatim everywhere")
              for i in range(2500)]
    uniques = [(10_000 + i, f"unique{i} doc{i} text{i} body{i} tail{i}")
               for i in range(100)]
    r = _diag(spark, clones + uniques)
    assert r["strategy"] == "exact-collapse"
    assert r["max_content_group"] == 2500
    assert r["identical_pair_mass"] == 2500 * 2499 // 2
    # clones collapse to ONE representative, so no rep-level shingle is hot
    assert r["max_rep_shingle_df"] < 2048


def test_preflight_hot_template_picks_collapse_prefix(spark):
    """DISTINCT texts sharing TEMPLATE shingles (the spam-variant corpus
    that defeated plain collapse: C(df,2) materialized candidates, 343 s
    at df=8,000 — SCALE.md r18) must pick collapse+prefix, and it takes
    precedence over the clone rule because prefix filtering is the only
    strategy that survives both pathologies."""
    spam = [(i, f"click here now to claim offer number {i} today")
            for i in range(2100)]
    r = _diag(spark, spam)
    assert r["strategy"] == "collapse+prefix"
    assert r["max_rep_shingle_df"] >= 2048
    assert r["n_distinct_content"] == 2100  # no identical clones involved

    # precedence: add a qualifying clone mass on top — verdict must stay
    clones = [(100_000 + i, "same same same same boilerplate")
              for i in range(2500)]
    r2 = _diag(spark, spam + clones)
    assert r2["strategy"] == "collapse+prefix"
    assert r2["identical_pair_mass"] >= 3_000_000


def test_preflight_exact_diagnostics_crafted(spark):
    """Exact diagnostic values on a hand-checkable corpus: two clone
    groups (3 + 2), one unique, one short (zero-shingle) doc."""
    rows = [
        (1, "a b c d"), (2, "a b c d"), (3, "a b c d"),   # group of 3
        (4, "e f g h"), (5, "e f g h"),                     # group of 2
        (6, "i j k l"),                                     # unique
        (7, "m n"),                                         # zero shingles
    ]
    r = _diag(spark, rows)
    assert r["n_docs"] == 7
    assert r["n_distinct_content"] == 4
    assert r["max_content_group"] == 3
    assert r["identical_pair_mass"] == 3 + 1  # C(3,2) + C(2,2)
    # reps: "a b c d" -> {a b c, b c d}, each df 1; zero-shingle doc adds 0
    assert r["max_rep_shingle_df"] == 1
    assert r["strategy"] == "plain-probe"


# ------- Hadoop-FS upsert state swap (VERDICT r18 item 2) -----------------


def _mk_state(spark, state):
    spark.createDataFrame(
        [(1, "a"), (2, "b")], "user_id long, v string"
    ).write.parquet(state)
    return sorted(map(tuple, spark.read.parquet(state).collect()))


def test_upsert_reclaim_deletes_stale_sidecars(spark, tmp_path):
    import os

    from apache_hive_1_2_2_src_spark.streaming.windows import (
        reclaim_state_generation,
    )

    state = str(tmp_path / "state")
    rows = _mk_state(spark, state)
    os.makedirs(state + "__old")
    spark.range(3).write.parquet(state + "__next")

    reclaim_state_generation(spark, state)
    assert not os.path.exists(state + "__old")
    assert not os.path.exists(state + "__next")
    assert sorted(map(tuple, spark.read.parquet(state).collect())) == rows


def test_upsert_reclaim_promotes_validated_next(spark, tmp_path):
    """Crash between the two renames: state absent, __old = previous
    generation, __next = validated new generation. The NEW generation must
    win (it carries the interrupted batch's merge; re-delivery
    re-converges by idempotence)."""
    import os

    from apache_hive_1_2_2_src_spark.streaming.windows import (
        reclaim_state_generation,
    )

    state = str(tmp_path / "state")
    _mk_state(spark, state)
    spark.createDataFrame(
        [(1, "a2"), (2, "b"), (3, "c")], "user_id long, v string"
    ).write.parquet(state + "__next")
    os.rename(state, state + "__old")

    reclaim_state_generation(spark, state)
    assert not os.path.exists(state + "__old")
    assert not os.path.exists(state + "__next")
    got = sorted(map(tuple, spark.read.parquet(state).collect()))
    assert got == [(1, "a2"), (2, "b"), (3, "c")]


def test_upsert_reclaim_restores_old_without_next(spark, tmp_path):
    import os

    from apache_hive_1_2_2_src_spark.streaming.windows import (
        reclaim_state_generation,
    )

    state = str(tmp_path / "state")
    rows = _mk_state(spark, state)
    os.rename(state, state + "__old")

    reclaim_state_generation(spark, state)
    assert sorted(map(tuple, spark.read.parquet(state).collect())) == rows
    assert not os.path.exists(state + "__old")


def test_upsert_commit_validates_before_rename(spark, tmp_path):
    """A generation whose row count diverges from the expectation must be
    rejected with the CURRENT state untouched and no sidecars left — the
    validate-before-rename contract that makes promote-__next safe."""
    import os

    from apache_hive_1_2_2_src_spark.streaming.windows import (
        commit_state_generation,
    )

    state = str(tmp_path / "state")
    rows = _mk_state(spark, state)
    bad = spark.createDataFrame([(9, "x")], "user_id long, v string")

    with pytest.raises(RuntimeError, match="untouched"):
        commit_state_generation(spark, state, bad, expected_rows=5)
    assert sorted(map(tuple, spark.read.parquet(state).collect())) == rows
    assert not os.path.exists(state + "__old")
    assert not os.path.exists(state + "__next")


def test_upsert_commit_swaps_good_generation(spark, tmp_path):
    import os

    from apache_hive_1_2_2_src_spark.streaming.windows import (
        commit_state_generation,
    )

    state = str(tmp_path / "state")
    _mk_state(spark, state)
    gen = spark.createDataFrame(
        [(1, "a2"), (2, "b"), (3, "c")], "user_id long, v string"
    )
    commit_state_generation(spark, state, gen, expected_rows=3)
    got = sorted(map(tuple, spark.read.parquet(state).collect()))
    assert got == [(1, "a2"), (2, "b"), (3, "c")]
    assert not os.path.exists(state + "__old")
    assert not os.path.exists(state + "__next")


# ------- hot-prefix salting knob (VERDICT r18 item 4) ---------------------


def test_collapse_prefix_salt_answer_identical(spark):
    """prefix_salt=S must be ANSWER-IDENTICAL to the unsalted probe on a
    corpus that mixes template spam (the hot prefix key the knob exists
    for), true near-dups, identical clones, and uniques."""
    from apache_hive_1_2_2_src_spark.extensions.dedup import (
        exact_collapse_prior_dup_counts,
    )

    rows = (
        # template spam: shared hot shingles, pairwise J below threshold
        [(i, f"click here now to claim offer number {i} today")
         for i in range(200)]
        # identical clones
        + [(1000 + i, "same boilerplate text body repeated") for i in range(30)]
        # true near-dup pair (J >= 0.7)
        + [(2000, "w1 w2 w3 w4 w5 w6 w7 w8 w9 w10"),
           (2001, "w1 w2 w3 w4 w5 w6 w7 w8 w9 w11")]
        # uniques + a zero-shingle doc
        + [(3000 + i, f"u{i} v{i} x{i} y{i} z{i}") for i in range(20)]
        + [(4000, "two words")]
    )
    d = spark.createDataFrame(rows, "doc_id long, text string")
    plain = sorted(map(tuple,
                       exact_collapse_prior_dup_counts(d).collect()))
    salted = sorted(map(tuple,
                        exact_collapse_prior_dup_counts(
                            d, prefix_salt=4).collect()))
    assert salted == plain
    assert sum(r[1] for r in plain) > 0  # the corpus genuinely has dups


def test_collapse_prefix_salt_splits_join_key(spark):
    """The salted plan must carry the salt column as an equi-join key (so
    the hot shingle key hash-partitions S ways) — and the default S=1
    plan must NOT change shape (no salt column anywhere)."""
    from apache_hive_1_2_2_src_spark.extensions.dedup import (
        exact_collapse_prior_dup_counts,
    )

    d = spark.createDataFrame(
        [(i, f"a b c d e f{i}") for i in range(50)],
        "doc_id long, text string",
    )
    salted_plan = exact_collapse_prior_dup_counts(
        d, prefix_salt=16
    )._jdf.queryExecution().optimizedPlan().toString()
    assert "psalt" in salted_plan and "qsalt" in salted_plan
    plain_plan = exact_collapse_prior_dup_counts(
        d
    )._jdf.queryExecution().optimizedPlan().toString()
    assert "salt" not in plain_plan


# ------- sources/0 ledger retention recipe (VERDICT r18 item 6) -----------


def test_file_source_ledger_retention_recipe(spark, tmp_path):
    """SCALE.md r18 named the file-source checkpoint's sources/0 ledger as
    the one unbounded checkpoint resource and recorded the retention rule
    as prose; r19 makes it code. Drain 65 one-file epochs through the ACID
    ingest shape WITH file_source_ledger_retention_confs applied: the
    sources/0 dir must stay bounded at ~compactInterval files (the engine
    cleans superseded entry files and old .compact ledgers immediately at
    cleanupDelay=0), where the unconfigured run holds 2 files per epoch.
    """
    import os

    from apache_hive_1_2_2_src_spark.streaming.windows import (
        file_source_ledger_retention_confs,
    )

    epochs = 65
    base = str(tmp_path / "ledger")
    inbox, table, ckpt = f"{base}/inbox", f"{base}/table", f"{base}/ckpt"
    os.makedirs(inbox)
    os.makedirs(table)
    for b in range(epochs):
        stage = f"{base}/stage"
        spark.range(b * 10, b * 10 + 10).selectExpr(
            "id as k", "'U' as op"
        ).coalesce(1).write.mode("overwrite").parquet(stage)
        part = next(f for f in os.listdir(stage) if f.endswith(".parquet"))
        dest = f"{inbox}/drop_{b:04d}.parquet"
        os.rename(f"{stage}/{part}", dest)
        os.utime(dest, (1_600_000_000 + 60 * b,) * 2)

    confs = file_source_ledger_retention_confs()
    old = {k: spark.conf.get(k, None) for k in confs}
    try:
        for k, v in confs.items():
            spark.conf.set(k, v)

        def write_delta(batch_df, batch_id):
            if batch_df.isEmpty():
                return
            batch_df.write.mode("overwrite").parquet(
                f"{table}/delta_{batch_id + 1}_{batch_id + 1}"
            )

        q = (
            spark.readStream.schema("k bigint, op string")
            .option("maxFilesPerTrigger", 1)
            .parquet(inbox)
            .writeStream.foreachBatch(write_delta)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        assert q.awaitTermination(420), "drain did not finish"
    finally:
        for k, v in old.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)

    srcdir = f"{ckpt}/sources/0"
    names = [n for n in os.listdir(srcdir) if not n.startswith(".")]
    compacts = [n for n in names if n.endswith(".compact")]
    # bounded at a compactInterval-sized steady state: the live ledger
    # (+ the previous one — minBatchesToRetain keeps it until the next
    # compaction) and at most ~2x compactInterval entry files (entries
    # between the last two compacts are deleted AT the next compaction,
    # so they linger one interval). The r18 measurement without the
    # recipe held 120 entry files + every .compact ever written; the
    # bound here is epoch-count-independent.
    assert len(compacts) <= 2, compacts
    assert len(names) <= 22, sorted(names)
    # offsets/commits purge to the retention floor through the same recipe
    assert len(os.listdir(f"{ckpt}/offsets")) <= 24
    assert len(os.listdir(f"{ckpt}/commits")) <= 24
    # and every epoch genuinely landed (retention must not eat data)
    deltas = [n for n in os.listdir(table) if n.startswith("delta_")]
    assert len(deltas) == epochs


# ------- bucketed upsert state (r19 scale audit) --------------------------


def test_bucketed_upsert_rewrites_only_touched_buckets(spark, tmp_path):
    """The whole point of the bucketed state: an epoch whose users hash
    into ONE bucket must rewrite that bucket alone — every other bucket
    dir's files stay byte-for-byte identical (same names, same sizes,
    untouched)."""
    import os

    import pyspark.sql.functions as F

    from apache_hive_1_2_2_src_spark.streaming.windows import (
        LAST_BUCKETED_UPSERT,
        _assert_stream_schema,
        _bucketed_upsert_drain,
    )

    n_buckets = 8
    base = str(tmp_path / "bu")
    inbox, state, ckpt = f"{base}/inbox", f"{base}/state", f"{base}/ckpt"
    os.makedirs(inbox)

    def stage(drop, rows):
        df = (
            spark.createDataFrame(
                rows,
                "event_id long, user_id long, event_type string, value double",
            )
            .withColumn("ts_us", F.lit(1_600_000_000_000_000 + drop))
            .withColumn("props", F.lit(None).cast("string"))
        )
        _assert_stream_schema(df)
        stage_dir = f"{base}/stage"
        df.coalesce(1).write.mode("overwrite").parquet(stage_dir)
        part = next(f for f in os.listdir(stage_dir) if f.endswith(".parquet"))
        dest = f"{inbox}/drop_{drop}.parquet"
        os.rename(f"{stage_dir}/{part}", dest)
        os.utime(dest, (1_600_000_000 + 60 * drop,) * 2)

    # drop 0: 64 users spread over all buckets; drop 1: ONE user
    stage(0, [(i, i, "click", float(i)) for i in range(64)])
    stage(1, [(1000, 7, "click", 99.0)])

    _bucketed_upsert_drain(
        spark, inbox, state, ckpt, n_buckets, max_files_per_trigger=1
    )
    touched = LAST_BUCKETED_UPSERT["touched"]
    assert len(touched) == 2
    assert len(touched[0]) == n_buckets  # 64 spread users hit every bucket
    assert len(touched[1]) == 1  # the single-user epoch rewrote ONE bucket

    # the untouched bucket dirs' files carry epoch-0 mtimes only
    lone = touched[1][0]
    for j in range(n_buckets):
        bdir = f"{state}/b{j:05d}"
        files = sorted(os.listdir(bdir))
        assert files, bdir
        if j != lone:
            # parquet part files written in epoch 0 survive untouched
            newest = max(
                os.path.getmtime(os.path.join(bdir, f)) for f in files
            )
            oldest_lone = min(
                os.path.getmtime(os.path.join(f"{state}/b{lone:05d}", f))
                for f in os.listdir(f"{state}/b{lone:05d}")
            )
            assert newest < oldest_lone

    # and the final state is the argmax across both drops
    import glob as _glob

    got = {
        (r["user_id"], r["value"])
        for r in spark.read.parquet(
            *_glob.glob(f"{state}/b0*")
        ).collect()
    }
    want = {(i, float(i)) for i in range(64) if i != 7} | {(7, 99.0)}
    assert got == want


def test_bucketed_upsert_matches_flat_and_argmax(spark):
    """Same fixpoint as the flat upsert and the batch argmax — bucketing
    the state changes nothing about the answer."""
    from apache_hive_1_2_2_src_spark.streaming.windows import (
        streaming_upsert_bucketed_state,
    )
    from tests.test_streaming_upsert import _batch_argmax

    want = _batch_argmax(spark)
    got = {
        tuple(r)
        for r in streaming_upsert_bucketed_state(spark, SF_DIR).collect()
    }
    assert got == want
