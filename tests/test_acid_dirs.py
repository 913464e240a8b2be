"""AcidUtils.getAcidState directory-resolution pins (round 9).

The registered acid_* queries exercise resolution end-to-end over the
derived orders history; these tests isolate each resolution RULE on tiny
hand-built trees — the part of ql/io/AcidUtils.java with historical bugs:
stale-base leaks after major compaction, double-reads of narrow deltas
beside the wide delta minor compaction produced, and junk directories
polluting the merge.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from apache_hive_1_2_2_src_spark.operators.acid import (
    read_acid_table,
    resolve_acid_state,
)


def _rows(spark, triples):
    """(k, st, p, op) rows with the acid file schema."""
    from decimal import Decimal

    data = [(k, st, Decimal(p).quantize(Decimal("0.01")), op) for (k, st, p, op) in triples]
    return spark.createDataFrame(
        data, "k long, st string, p decimal(18,2), op string"
    )


def test_highest_base_wins_and_stale_base_ignored(spark, tmp_path):
    """After major compaction base_0 and the covered deltas linger until
    the cleaner runs — resolution must read ONLY the new base_5."""
    t = str(tmp_path / "acid")
    _rows(spark, [(1, "O", 10, "U"), (2, "O", 20, "U")]).write.parquet(f"{t}/base_0")
    _rows(spark, [(1, "F", 11, "U")]).write.parquet(f"{t}/delta_3_3")
    # the compacted snapshot: k=1 updated, k=2 untouched, k=3 inserted later? no —
    # base_5 covers txns <= 5, so it already contains the delta_3_3 edit.
    _rows(spark, [(1, "F", 11, "U"), (2, "O", 20, "U")]).write.parquet(f"{t}/base_5")

    base_dir, base_txn, deltas = resolve_acid_state(spark, t)
    assert (base_dir, base_txn) == ("base_5", 5)
    assert deltas == []  # delta_3_3 is covered by base_5

    got = {r.k: (r.st, float(r.p)) for r in read_acid_table(spark, t).collect()}
    assert got == {1: ("F", 11.0), 2: ("O", 20.0)}


def test_delta_after_base_still_applies(spark, tmp_path):
    """A delta with txns ABOVE the chosen base must still merge on top."""
    t = str(tmp_path / "acid")
    _rows(spark, [(1, "O", 10, "U"), (2, "O", 20, "U")]).write.parquet(f"{t}/base_5")
    _rows(spark, [(2, "X", 99, "U"), (1, "O", 10, "D")]).write.parquet(f"{t}/delta_6_6")

    base_dir, base_txn, deltas = resolve_acid_state(spark, t)
    assert base_dir == "base_5"
    assert [d[2] for d in deltas] == ["delta_6_6"]

    got = {r.k: (r.st, float(r.p)) for r in read_acid_table(spark, t).collect()}
    assert got == {2: ("X", 99.0)}  # k=1 tombstoned by the live delta


def test_wide_delta_preferred_over_contained_narrow_deltas(spark, tmp_path):
    """Minor compaction leaves delta_1_1 + delta_2_2 beside delta_1_2:
    reading narrow+wide together would double-apply every edit — the
    resolver must select ONLY the widest range."""
    t = str(tmp_path / "acid")
    _rows(spark, [(1, "O", 10, "U")]).write.parquet(f"{t}/base_0")
    _rows(spark, [(1, "A", 11, "U")]).write.parquet(f"{t}/delta_1_1")
    _rows(spark, [(1, "B", 12, "U")]).write.parquet(f"{t}/delta_2_2")
    _rows(spark, [(1, "B", 12, "U")]).write.parquet(f"{t}/delta_1_2")

    _, _, deltas = resolve_acid_state(spark, t)
    assert [d[2] for d in deltas] == ["delta_1_2"]

    got = {r.k: r.st for r in read_acid_table(spark, t).collect()}
    assert got == {1: "B"}


def test_junk_dirs_ignored_and_delta_only_table_reads(spark, tmp_path):
    """Non-acid directory names (staging, _tmp) never reach the merge —
    the junk here has an incompatible schema, so leaking it would throw —
    and a table with deltas but no base yet (streaming ingest) resolves."""
    t = str(tmp_path / "acid")
    _rows(spark, [(7, "O", 70, "U")]).write.parquet(f"{t}/delta_1_1")
    spark.range(3).write.parquet(f"{t}/_tmp_junk")
    spark.range(2).write.parquet(f"{t}/.hive-staging_0")

    base_dir, base_txn, deltas = resolve_acid_state(spark, t)
    assert base_dir is None and base_txn == -1
    assert [d[2] for d in deltas] == ["delta_1_1"]
    got = {r.k: r.st for r in read_acid_table(spark, t).collect()}
    assert got == {7: "O"}


def test_missing_or_empty_table_raises(spark, tmp_path):
    with pytest.raises(FileNotFoundError):
        resolve_acid_state(spark, str(tmp_path / "nope"))
    empty = tmp_path / "empty_table"
    empty.mkdir()
    with pytest.raises(FileNotFoundError, match="no base"):
        read_acid_table(spark, str(empty))


def test_tombstone_survives_minor_compaction_semantics(spark, tmp_path):
    """The resurrect-deleted-keys bug, on disk: a compacted delta that
    KEEPS its tombstone must still mask the base row after resolution."""
    t = str(tmp_path / "acid")
    _rows(spark, [(1, "O", 10, "U"), (2, "O", 20, "U")]).write.parquet(f"{t}/base_0")
    _rows(spark, [(1, "O", 10, "D"), (2, "Z", 21, "U")]).write.parquet(f"{t}/delta_1_2")

    got = {r.k: r.st for r in read_acid_table(spark, t).collect()}
    assert got == {2: "Z"}


def test_streaming_acid_redrain_adds_no_deltas(spark, tmp_path):
    """Exactly-once for the delta-tree ingest: a second availableNow drain
    against the SAME checkpoint (no new inbox files) must write ZERO new
    delta directories, and the resolved merge must be unchanged."""
    import os

    from pyspark.sql import functions as F

    from apache_hive_1_2_2_src_spark.streaming.windows import (
        _read_events_stream,
        _stage_events_inbox,
    )

    sf = "/root/testdata/sf0.001"
    inbox = _stage_events_inbox(spark, sf)
    table = str(tmp_path / "acid_stream")
    ckpt = str(tmp_path / "ckpt")
    os.makedirs(table, exist_ok=True)

    def write_delta(batch_df, batch_id):
        (
            batch_df.select(
                F.col("event_id").alias("k"),
                F.col("event_type").alias("st"),
                F.floor(F.col("value") * 100).cast("long").alias("p"),
                F.lit("U").alias("op"),
            ).write.parquet(f"{table}/delta_{batch_id + 1}_{batch_id + 1}")
        )

    def drain():
        q = (
            _read_events_stream(spark, inbox, max_files_per_trigger=8)
            .writeStream.foreachBatch(write_delta)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)

    drain()
    deltas_after_first = sorted(
        d for d in os.listdir(table) if d.startswith("delta_")
    )
    total_first = read_acid_table(spark, table).count()

    drain()  # same checkpoint, no new files: must be a no-op
    deltas_after_second = sorted(
        d for d in os.listdir(table) if d.startswith("delta_")
    )
    assert deltas_after_second == deltas_after_first
    assert read_acid_table(spark, table).count() == total_first


def test_resolution_matches_python_replay_on_random_trees(spark, tmp_path):
    """Hypothesis-style randomized trees (deterministic seed): resolution
    over arbitrary base/delta layouts must equal a Python replay of the
    AcidUtils rules — highest base, live deltas sorted (min ASC, max
    DESC), skip ranges covered by the running max."""
    import random

    rng = random.Random(42)
    for trial in range(12):
        t = str(tmp_path / f"acid_{trial}")
        n_bases = rng.randrange(0, 3)
        bases = sorted(rng.sample(range(0, 20, 2), n_bases)) if n_bases else []
        deltas = set()
        for _ in range(rng.randrange(1, 6)):
            lo = rng.randrange(1, 22)
            hi = lo + rng.randrange(0, 4)
            deltas.add((lo, hi))
        for bn in bases:
            _rows(spark, [(1, f"b{bn}", bn, "U")]).write.parquet(f"{t}/base_{bn}")
        for lo, hi in deltas:
            _rows(spark, [(1, f"d{lo}_{hi}", hi, "U")]).write.parquet(
                f"{t}/delta_{lo}_{hi}"
            )

        # python replay of the documented rules
        base_txn = max(bases) if bases else -1
        live = sorted(
            (d for d in deltas if d[1] > base_txn), key=lambda d: (d[0], -d[1])
        )
        chosen, covered = [], base_txn
        for lo, hi in live:
            if hi <= covered:
                continue
            chosen.append((lo, hi))
            covered = hi

        base_dir, got_txn, got_deltas = resolve_acid_state(spark, t)
        assert got_txn == base_txn, (trial, bases, deltas)
        assert [(a, b) for a, b, _ in got_deltas] == chosen, (trial, bases, deltas)
        if bases:
            assert base_dir == f"base_{base_txn}"


def test_many_delta_read_is_single_relation(spark, tmp_path):
    """A streaming-ingested table holds hundreds of delta dirs between
    compactions; the reader must NOT grow a plan node pair per delta
    (measured pre-fix: 611 plan lines / 20.6 s build at 300 deltas). One
    relation over all surviving deltas with the version derived from the
    directory name must produce the identical merge."""
    from pyspark.sql import functions as F

    from apache_hive_1_2_2_src_spark.operators.acid import read_acid_table

    tbl = str(tmp_path / "many")
    spark.range(100).select(
        F.col("id").alias("k"), F.lit("A").alias("st"),
        F.lit("1.00").cast("decimal(18,2)").alias("p"), F.lit("U").alias("op"),
    ).write.parquet(f"{tbl}/base_10")
    for i in range(11, 51):  # 40 deltas, overlapping key ranges
        spark.range(i % 7, i % 7 + 3).select(
            F.col("id").alias("k"), F.lit(f"B{i}").alias("st"),
            F.lit("2.00").cast("decimal(18,2)").alias("p"), F.lit("U").alias("op"),
        ).coalesce(1).write.parquet(f"{tbl}/delta_{i}_{i}")
    df = read_acid_table(spark, tbl)
    plan_lines = df._jdf.queryExecution().executedPlan().toString().count("\n")
    assert plan_lines < 40, f"plan grew with delta count: {plan_lines} lines"
    got = {r.k: r.st for r in df.collect()}
    assert len(got) == 100
    # highest txn wins per key: key k's last writer is the max i with
    # i % 7 <= k <= i % 7 + 2
    for k in range(10):
        writers = [i for i in range(11, 51) if i % 7 <= k <= i % 7 + 2]
        expect = f"B{max(writers)}" if writers else "A"
        assert got[k] == expect, (k, got[k], expect)


def test_unparseable_delta_file_path_raises_loudly(spark, tmp_path):
    """A data file NOT directly under its delta_M1_M2 dir (nested subdir)
    defeats the input_file_name() version regex; the old cast-to-NULL
    behavior silently dropped that delta's updates from the
    highest-version-wins merge (ADVICE r11). The reader must raise at scan
    time instead."""
    from pyspark.sql import functions as F

    tbl = str(tmp_path / "nested")
    spark.range(5).select(
        F.col("id").alias("k"), F.lit("A").alias("st"),
        F.lit("1.00").cast("decimal(18,2)").alias("p"), F.lit("U").alias("op"),
    ).write.parquet(f"{tbl}/base_1")
    # the delta's files live one level too deep, under a k=v dir that
    # partition discovery accepts AND whose name shadows the reader's own
    # ver column — the one nesting shape that reads with a matching schema
    # (non-k=v nesting fails Spark's schema inference; other k=v names
    # fail the union arity check — both already loud). Pre-fix this shape
    # was SILENT: regexp_extract yielded '', cast made ver NULL, and the
    # highest-version-wins merge quietly dropped the delta's updates.
    spark.range(2).select(
        F.col("id").alias("k"), F.lit("B").alias("st"),
        F.lit("2.00").cast("decimal(18,2)").alias("p"), F.lit("U").alias("op"),
    ).coalesce(1).write.parquet(f"{tbl}/delta_2_2/ver=9")
    df = read_acid_table(spark, tbl)
    with pytest.raises(Exception, match="cannot derive delta version"):
        df.collect()


def test_partitioned_acid_per_partition_state_and_escaping(spark, tmp_path):
    """Partitioned ACID resolution is PER PARTITION: a partition holding a
    fresh base_2 must ignore ITS stale base_0+deltas while sibling
    partitions still merge theirs; junk dirs at both levels are ignored;
    escaped partition values (space, percent, equals) round-trip through
    the input_file_name() derivation."""
    from pyspark.sql import functions as F

    from apache_hive_1_2_2_src_spark.operators.acid import (
        read_acid_table_partitioned,
    )

    tbl = str(tmp_path / "pacid")

    def rows(pairs, st, p):
        from decimal import Decimal

        return spark.createDataFrame(
            [(k, st, Decimal(p), "U") for k in pairs],
            "k long, st string, p decimal(18,2), op string",
        )

    # partition 'a b' (space): base_0 + delta_1_1 updating k=1
    rows([0, 1], "A", "1.00").write.parquet(f"{tbl}/pt=a b/base_0")
    rows([1], "B", "2.00").write.parquet(f"{tbl}/pt=a b/delta_1_1")
    # partition 'x%y=z' (escaped chars): stale base_0 + delta SHADOWED by base_2
    enc = "x%25y%3Dz"  # Hive escapePathName form of x%y=z
    rows([5, 6], "OLD", "9.00").write.parquet(f"{tbl}/pt={enc}/base_0")
    rows([5], "OLDER", "9.50").write.parquet(f"{tbl}/pt={enc}/delta_1_1")
    rows([5, 6], "NEW", "3.00").write.parquet(f"{tbl}/pt={enc}/base_2")
    # junk: inside a partition and at the root
    spark.range(2).write.parquet(f"{tbl}/pt=a b/_tmp_junk")
    spark.range(2).write.parquet(f"{tbl}/random_dir")

    snap = read_acid_table_partitioned(spark, tbl, "pt")
    got = {(r.pt, r.k): (r.st, str(r.p)) for r in snap.collect()}
    assert got[("a b", 0)] == ("A", "1.00")
    assert got[("a b", 1)] == ("B", "2.00")  # delta applied
    assert got[("x%y=z", 5)] == ("NEW", "3.00")  # stale base+delta ignored
    assert got[("x%y=z", 6)] == ("NEW", "3.00")
    assert len(got) == 4


def test_partitioned_delta_writer_retry_is_idempotent(spark, tmp_path):
    """A foreachBatch retry re-invokes with the SAME batch_id: the
    partitioned delta writer must REPLACE its own per-partition delta
    dirs (possibly with different content after an upstream fix), never
    double-append — and must not touch other batches' deltas."""
    import os

    from pyspark.sql import functions as F

    from apache_hive_1_2_2_src_spark.operators.acid import (
        read_acid_table_partitioned,
    )
    from apache_hive_1_2_2_src_spark.streaming.windows import (
        write_partitioned_delta,
    )

    tbl = str(tmp_path / "retry")
    os.makedirs(tbl)

    def rows(ids, st):
        return spark.createDataFrame(
            [(f"g{k % 2}", k, st, k * 10, "U") for k in ids],
            "pt string, k long, st string, p long, op string",
        )

    write_partitioned_delta(rows(range(6), "A"), tbl, "pt", 0)
    write_partitioned_delta(rows(range(3), "B"), tbl, "pt", 1)
    # retry of batch 1 with corrected content
    write_partitioned_delta(rows(range(4), "C"), tbl, "pt", 1)

    deltas = sorted(
        f"{d}/{x}"
        for d in os.listdir(tbl)
        if d.startswith("pt=")
        for x in os.listdir(os.path.join(tbl, d))
        if x.startswith("delta_")
    )
    assert deltas == [
        "pt=g0/delta_1_1", "pt=g0/delta_2_2",
        "pt=g1/delta_1_1", "pt=g1/delta_2_2",
    ]
    got = {
        (r.pt, r.k): r.st
        for r in read_acid_table_partitioned(spark, tbl, "pt").collect()
    }
    expect = {(f"g{k % 2}", k): ("C" if k < 4 else "A") for k in range(6)}
    assert got == expect


def test_valid_txn_list_filters_aborted_and_open(spark, tmp_path):
    """r14 ValidTxnList rules in isolation: an aborted txn's delta and an
    open txn's delta (above the watermark) are invisible; the same tree
    read WITHOUT a txn list applies both — the differentiating pair that
    proves the filter, not the fixture, changes the answer."""
    from apache_hive_1_2_2_src_spark.operators.acid import ValidTxnList

    t = str(tmp_path / "acid_txn")
    _rows(spark, [(1, "O", 10, "U"), (2, "O", 20, "U")]).write.parquet(f"{t}/base_0")
    _rows(spark, [(1, "F", 11, "U")]).write.parquet(f"{t}/delta_1_1")
    _rows(spark, [(2, "X", 99, "U")]).write.parquet(f"{t}/delta_2_2")   # aborted
    _rows(spark, [(3, "P", 30, "U")]).write.parquet(f"{t}/delta_3_3")
    _rows(spark, [(1, "D", 0, "D")]).write.parquet(f"{t}/delta_4_4")    # open
    snap = ValidTxnList(high_watermark=3, exceptions=frozenset({2}))

    base_dir, base_txn, deltas = resolve_acid_state(spark, t, snap)
    assert base_dir == "base_0"
    assert [d[2] for d in deltas] == ["delta_1_1", "delta_3_3"]

    got = {
        (r.k, r.st, str(r.p))
        for r in read_acid_table(spark, t, snap).collect()
    }
    assert got == {(1, "F", "11.00"), (2, "O", "20.00"), (3, "P", "30.00")}

    # without the list every delta applies: k=2 flips to X, k=1 deleted
    full = {
        (r.k, r.st) for r in read_acid_table(spark, t).collect()
    }
    assert full == {(2, "X"), (3, "P")}


def test_valid_txn_list_base_and_range_rules(spark, tmp_path):
    """A base from an invalid txn may not be selected (fall back to the
    older valid base); a compacted range delta survives if ANY txn in
    its range is valid (isTxnRangeValid != NONE) and dies if none is."""
    from apache_hive_1_2_2_src_spark.operators.acid import ValidTxnList

    t = str(tmp_path / "acid_txn_base")
    _rows(spark, [(1, "O", 10, "U")]).write.parquet(f"{t}/base_0")
    _rows(spark, [(1, "B", 50, "U")]).write.parquet(f"{t}/base_6")  # above hwm
    _rows(spark, [(1, "C", 12, "U"), (2, "N", 7, "U")]).write.parquet(
        f"{t}/delta_1_3"
    )  # range contains aborted 2 but valid 1,3 -> SOME -> visible
    _rows(spark, [(2, "Z", 99, "U")]).write.parquet(f"{t}/delta_4_5")
    snap = ValidTxnList(high_watermark=3, exceptions=frozenset({2}))
    base_dir, _txn, deltas = resolve_acid_state(spark, t, snap)
    assert base_dir == "base_0"
    assert [d[2] for d in deltas] == ["delta_1_3"]
    got = {(r.k, r.st) for r in read_acid_table(spark, t, snap).collect()}
    assert got == {(1, "C"), (2, "N")}


def test_valid_txn_range_arithmetic_wide_and_covered():
    """is_range_valid answers arithmetically (ADVICE r14): a compacted
    delta spanning millions of txn ids must not cost an O(range-width)
    loop, and a range whose visible ids are ALL exceptions is NONE."""
    import time

    from apache_hive_1_2_2_src_spark.operators.acid import ValidTxnList

    snap = ValidTxnList(high_watermark=50_000_000, exceptions=frozenset({7}))
    t0 = time.perf_counter()
    assert snap.is_range_valid(1, 40_000_000)          # huge range, instant
    assert not snap.is_range_valid(60_000_000, 99_000_000)  # above hwm
    assert snap.is_range_valid(40_000_000, 99_000_000)  # clipped at hwm
    assert time.perf_counter() - t0 < 0.5

    # every id in [2,4] is an exception -> NONE; widen by one -> SOME
    cov = ValidTxnList(high_watermark=10, exceptions=frozenset({2, 3, 4}))
    assert not cov.is_range_valid(2, 4)
    assert cov.is_range_valid(2, 5)
    # exceptions outside the clipped range don't count against it
    assert cov.is_range_valid(5, 9)
    # single-txn forms agree with is_valid
    assert not cov.is_range_valid(3, 3)
    assert cov.is_range_valid(5, 5)


def test_lock_manager_compatibility_matrix():
    """TxnHandler.checkLock jump table: SR/SW are mutually compatible
    (concurrent writers are LEGAL in Hive ACID — ordering is resolved at
    read time), EXCLUSIVE conflicts with everything."""
    from apache_hive_1_2_2_src_spark.operators.acid import AcidLockManager

    grants = {}
    for held in ("SR", "SW", "X"):
        for req in ("SR", "SW", "X"):
            lm = AcidLockManager()
            assert lm.request(1, held, "db.t") == "ACQUIRED"
            grants[(req, held)] = lm.request(2, req, "db.t")
    acquired = {k for k, v in grants.items() if v == "ACQUIRED"}
    assert acquired == {("SR", "SR"), ("SR", "SW"), ("SW", "SR"), ("SW", "SW")}


def test_lock_manager_fifo_no_barging():
    """checkLock is FIFO: an EXCLUSIVE waiter behind two shared locks
    blocks LATER shared requests (no starvation by a compatible stream),
    and releases promote strictly in queue order."""
    from apache_hive_1_2_2_src_spark.operators.acid import AcidLockManager

    lm = AcidLockManager()
    assert lm.request(1, "SW", "db.t") == "ACQUIRED"
    assert lm.request(2, "SR", "db.t") == "ACQUIRED"
    assert lm.request(3, "X", "db.t") == "WAITING"
    # a later SR would be compatible with the GRANTED locks but must
    # queue behind the waiting X
    assert lm.request(4, "SR", "db.t") == "WAITING"
    lm.release(1)
    assert lm.state(3, "db.t") == "WAITING"  # SR(2) still held
    lm.release(2)
    assert lm.state(3, "db.t") == "ACQUIRED"  # X at queue head
    assert lm.state(4, "db.t") == "WAITING"   # SR still behind the X
    lm.release(3)
    assert lm.state(4, "db.t") == "ACQUIRED"


def test_lock_manager_per_resource_isolation():
    """Locks on different resources never interact (DbLockManager keys
    the queue by (db, table, partition))."""
    from apache_hive_1_2_2_src_spark.operators.acid import AcidLockManager

    lm = AcidLockManager()
    assert lm.request(1, "X", "db.a") == "ACQUIRED"
    assert lm.request(2, "X", "db.b") == "ACQUIRED"
    assert lm.request(3, "SW", "db.a") == "WAITING"
    lm.release(1, "db.a")
    assert lm.state(3, "db.a") == "ACQUIRED"


def test_concurrent_snapshot_isolation_from_events():
    """The per-reader ValidTxnList derivation over the interleaved
    two-writer log: mid-flight invisible, aborted never visible,
    committed exactly-once — the snapshot semantics the lock matrix
    makes necessary (SW||SW means readers MUST filter by txn state)."""
    from apache_hive_1_2_2_src_spark.operators.acid import (
        _CONC_LOG,
        valid_txn_list_from_events,
    )

    s5 = valid_txn_list_from_events(_CONC_LOG, 5)
    assert (s5.high_watermark, s5.exceptions) == (3, frozenset({2, 3}))
    s7 = valid_txn_list_from_events(_CONC_LOG, 7)
    assert (s7.high_watermark, s7.exceptions) == (3, frozenset({3}))
    s9 = valid_txn_list_from_events(_CONC_LOG, 9)
    assert (s9.high_watermark, s9.exceptions) == (4, frozenset({3, 4}))
    # before anything was allocated: empty snapshot, nothing visible
    s0 = valid_txn_list_from_events(_CONC_LOG, 0)
    assert s0.high_watermark == 0 and not s0.is_valid(1)
