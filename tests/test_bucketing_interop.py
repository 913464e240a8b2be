"""Hive-vs-Spark bucketing interop pins (SCALE.md "Hive-bucketing interop").

Hive 1.2 places a row in bucket ``(ObjectInspectorUtils.hashCode(key) &
Integer.MAX_VALUE) % n`` — for an int key the hash IS the int value
(serde2/objectinspector/ObjectInspectorUtils.java anchor per SURVEY §1.1).
Spark places it in ``pmod(murmur3_hash(key, seed=42), n)`` (Spark's
``HashPartitioning.partitionIdExpression``; the SQL ``hash()`` builtin is
the same murmur3/seed-42). These tests pin that (a) the two placements
genuinely disagree — so declaring Spark bucket metadata over a
Hive-written layout would mis-prune and silently drop rows — and (b) the
supported interop path (read a foreign-bucketed layout as PLAIN files)
stays exact.
"""

from __future__ import annotations

import os
import tempfile

from pyspark.sql import functions as F


def test_spark_and_hive_bucket_placement_disagree(spark):
    """pmod(hash(id), 8) != id % 8 for most int keys: bucket metadata is
    not transferable between the engines in either direction."""
    n = 8
    df = spark.range(0, 1000).select(
        F.col("id").cast("int").alias("id"),
        F.pmod(F.hash(F.col("id").cast("int")), F.lit(n)).alias("spark_bucket"),
        # Hive 1.2 int hash == the int value; ids here are non-negative so
        # the & Integer.MAX_VALUE mask is the identity.
        (F.col("id") % n).cast("int").alias("hive_bucket"),
    )
    disagree = df.filter(F.col("spark_bucket") != F.col("hive_bucket")).count()
    # If the placements agreed, bucket pruning would transfer; pin that
    # they don't (murmur3 scatters ~7/8 of keys off the identity bucket).
    assert disagree > 500, f"only {disagree}/1000 keys moved buckets"


def test_hive_bucketed_layout_reads_exact_as_plain_files(spark):
    """A directory laid out by HIVE's bucket rule (one file per id%4
    bucket) must be read as plain unbucketed files: full row count and
    checksum survive, while a Spark-bucket-pruned read of the same
    layout would drop rows (previous test: the placements disagree)."""
    src = spark.range(0, 400).select(
        F.col("id").cast("int").alias("id"),
        (F.col("id") * 3).cast("long").alias("v"),
    )
    with tempfile.TemporaryDirectory() as d:
        # Simulate a Hive writer: rows routed to files by Hive's hash.
        for b in range(4):
            src.filter(F.col("id") % 4 == b).coalesce(1).write.mode("overwrite").parquet(
                os.path.join(d, f"bucket_{b:05d}")
            )
        back = spark.read.parquet(*[os.path.join(d, f"bucket_{b:05d}") for b in range(4)])
        got = back.agg(
            F.count("*").alias("n"), F.sum("v").cast("long").alias("s")
        ).first()
        assert got["n"] == 400
        assert got["s"] == 3 * (399 * 400) // 2

        # The trap the SCALE.md rule forbids, made concrete: a Spark
        # bucket-pruned scan for id=7 would look only in
        # pmod(hash(7), 4) — if that differs from Hive's 7%4=3 placement,
        # the row is invisible. Assert the mismatch exists for this key
        # set so the doc's "silently DROP rows" claim is literal.
        sb = spark.range(0, 400).select(
            F.pmod(F.hash(F.col("id").cast("int")), F.lit(4)).alias("sb"),
            (F.col("id") % 4).cast("int").alias("hb"),
        )
        assert sb.filter(F.col("sb") != F.col("hb")).count() > 0


def _java_hash(s: str) -> int:
    """String.hashCode over UTF-16 code units (what Java actually folds —
    ord() would diverge on supplementary characters), unsigned mod 2^32."""
    data = s.encode("utf-16-be")
    h = 0
    for i in range(0, len(data), 2):
        h = (h * 31 + int.from_bytes(data[i : i + 2], "big")) & 0xFFFFFFFF
    return h


def test_hive_string_hash_matches_java_spec(spark):
    """Round 8: hive_string_hash must equal Java String.hashCode (as
    unsigned mod 2^32) — pinned against hardcoded JVM values and a Python
    reimplementation, including the empty string and 31-overflow cases."""
    from apache_hive_1_2_2_src_spark.sources.hive_bucketing import (
        hive_bucket_id,
        hive_string_hash,
    )

    cases = ["", "a", "ab", "hello", "1-URGENT", "Customer#000000001",
             "a longer string that overflows int32 many times over"]
    df = spark.createDataFrame([(s,) for s in cases], "s string")
    got = {r.s: r.h for r in df.select("s", hive_string_hash("s").alias("h")).collect()}
    assert got[""] == 0
    assert got["ab"] == 3105  # "ab".hashCode()
    assert got["hello"] == 99162322  # "hello".hashCode()
    for s in cases:
        assert got[s] == _java_hash(s), s

    # bucket routing: (h & Integer.MAX_VALUE) % n == (h_u % 2^31) % n
    bid = {r.s: r.b for r in df.select("s", hive_bucket_id("s", 16).alias("b")).collect()}
    for s in cases:
        assert bid[s] == (_java_hash(s) % (1 << 31)) % 16, s


def test_write_hive_bucketed_layout_contract(spark, tmp_path):
    """write_hive_bucketed must produce exactly n positional files where
    file i contains precisely Hive's bucket-i rows (the CLUSTERED BY
    contract a Hive 1.2 reader assumes), losing nothing."""
    import glob as _glob

    from apache_hive_1_2_2_src_spark.sources.hive_bucketing import (
        write_hive_bucketed,
    )
    from apache_hive_1_2_2_src_spark.tables import load_table

    src = (
        load_table(spark, "/root/testdata/sf0.001", "documents")
        .select("doc_id", "source")
        .filter(F.col("doc_id") < 500)
    )
    out = str(tmp_path / "hive_bucketed")
    n = 8
    write_hive_bucketed(src, "source", n, out, kind="string")

    files = sorted(_glob.glob(out + "/*_0"))
    assert [os.path.basename(f) for f in files] == [f"{b:06d}_0" for b in range(n)]

    total = 0
    for b, f in enumerate(files):
        rows = spark.read.parquet(f).collect()
        total += len(rows)
        for r in rows:
            assert (_java_hash(r.source) % (1 << 31)) % n == b, (r.source, b)
    assert total == src.count()


def test_write_hive_bucketed_empty_buckets_still_materialize(spark, tmp_path):
    """With more buckets than distinct keys most buckets are EMPTY — Hive's
    reader still requires all n positional files; each empty file must
    carry the full row schema."""
    from apache_hive_1_2_2_src_spark.sources.hive_bucketing import (
        write_hive_bucketed,
    )

    src = spark.createDataFrame(
        [(i, f"src_{i % 3}") for i in range(60)], "doc_id long, source string"
    )
    out = str(tmp_path / "sparse_buckets")
    n = 16
    write_hive_bucketed(src, "source", n, out, kind="string")
    import glob as _glob

    files = sorted(_glob.glob(out + "/*_0"))
    assert len(files) == n
    total = 0
    occupied = 0
    for b, f in enumerate(files):
        df = spark.read.parquet(f)
        assert df.columns == ["doc_id", "source"]
        rows = df.collect()
        total += len(rows)
        occupied += bool(rows)
        for r in rows:
            assert (_java_hash(r.source) % (1 << 31)) % n == b
    assert total == 60
    assert occupied <= 3  # 3 distinct keys -> at most 3 non-empty buckets


def test_hive_string_hash_utf16_exact_beyond_latin1(spark):
    """Round 9: the fold runs over UTF-16BE code units, so non-Latin keys
    hash identically to Java — including a supplementary character whose
    surrogate PAIR must contribute two units (ord()-based folds get this
    wrong). Java ground truth values are hardcoded for the first three."""
    from apache_hive_1_2_2_src_spark.sources.hive_bucketing import hive_string_hash

    cases = [
        "é",            # U+00E9: "é".hashCode() == 233
        "日本語",        # "日本語".hashCode() == 25921943
        "𝄞",            # U+1D11E: surrogate pair D834 DD1E -> 3624867
        "naïve café",
        "ключ-значение",
        "中文分桶键",
        "mixed ascii + ünïcode + 絵文字 + 🚀",
    ]
    df = spark.createDataFrame([(s,) for s in cases], "s string")
    got = {r.s: r.h for r in df.select("s", hive_string_hash("s").alias("h")).collect()}
    assert got["é"] == 233
    assert got["日本語"] == 25921943  # ((0x65E5*31)+0x672C)*31+0x8A9E
    assert got["𝄞"] == (0xD834 * 31 + 0xDD1E) & 0xFFFFFFFF
    for s in cases:
        assert got[s] == _java_hash(s), s


def test_hive_long_hash_matches_longwritable(spark):
    """LongWritable.hashCode == (int)(v ^ (v >>> 32)): exact for values
    beyond int32 and for negative longs — where the int identity hash
    would silently mis-route (Long(-5) hashes to 4, Int(-5) to -5)."""
    from apache_hive_1_2_2_src_spark.sources.hive_bucketing import (
        hive_bucket_id,
        hive_hash_value,
        hive_long_hash,
    )

    vals = [0, 1, -1, -5, 2**31 - 1, 2**31, 2**32, 2**32 + 7,
            -(2**31) - 1, 2**62 + 12345, -(2**62) - 9876]
    df = spark.createDataFrame([(v,) for v in vals], "v long")
    got = {r.v: r.h for r in df.select("v", hive_long_hash("v").alias("h")).collect()}

    def java_long_hash(v: int) -> int:
        return (v ^ ((v & 0xFFFFFFFFFFFFFFFF) >> 32)) & 0xFFFFFFFF

    assert java_long_hash(-5) == 4  # the Int-vs-Long divergence, literal
    for v in vals:
        assert got[v] == java_long_hash(v) == hive_hash_value(v, "long"), v

    bid = {r.v: r.b for r in df.select("v", hive_bucket_id("v", 16, "long").alias("b")).collect()}
    for v in vals:
        assert bid[v] == (java_long_hash(v) % (1 << 31)) % 16, v


def test_hive_int_hash_rejects_out_of_range(spark):
    """A BIGINT value outside int32 passed as kind='int' must raise, not
    silently route to a wrong bucket (ADVICE round 8)."""
    import pytest
    from pyspark.errors.exceptions.captured import SparkRuntimeException

    from apache_hive_1_2_2_src_spark.sources.hive_bucketing import hive_int_hash

    df = spark.createDataFrame([(2**32 + 3,)], "v long")
    with pytest.raises(SparkRuntimeException, match="int32 range"):
        df.select(hive_int_hash("v").alias("h")).collect()
    # in-range values (incl. negatives) still hash as the identity
    ok = spark.createDataFrame([(7,), (-7,)], "v long")
    got = sorted(r.h for r in ok.select(hive_int_hash("v").alias("h")).collect())
    assert got == [7, (1 << 32) - 7]


def test_write_hive_bucketed_null_keys_route_to_bucket_zero(spark, tmp_path):
    """Hive hashes a NULL key to 0 -> bucket 0. The round-8 writer dropped
    NULL-key rows (partitionBy sent them to __HIVE_DEFAULT_PARTITION__,
    which the flatten never collected); now they must land in file 0."""
    from apache_hive_1_2_2_src_spark.sources.hive_bucketing import (
        read_hive_bucketed,
        write_hive_bucketed,
    )

    src = spark.createDataFrame(
        [(1, "alpha"), (2, None), (3, "beta"), (4, None), (5, "gamma")],
        "id long, k string",
    )
    out = str(tmp_path / "null_buckets")
    n = 4
    write_hive_bucketed(src, "k", n, out, kind="string")
    back = read_hive_bucketed(spark, out, n)
    assert back.count() == 5  # nothing dropped
    bucket0 = read_hive_bucketed(spark, out, n, buckets=[0])
    null_ids = sorted(r.id for r in bucket0.filter(F.col("k").isNull()).collect())
    assert null_ids == [2, 4]
    for b in range(1, n):
        rows = read_hive_bucketed(spark, out, n, buckets=[b]).filter(
            F.col("k").isNull()
        )
        assert rows.count() == 0, f"NULL key leaked into bucket {b}"


def test_read_hive_bucketed_prunes_to_one_file(spark, tmp_path):
    """The read-side contract: a single-bucket read opens exactly ONE of
    the n positional files (inputFiles() is the proof), and its contents
    are precisely the rows whose Java-hash bucket matches."""
    from apache_hive_1_2_2_src_spark.sources.hive_bucketing import (
        hive_bucket_of,
        read_hive_bucketed,
        write_hive_bucketed,
    )
    from apache_hive_1_2_2_src_spark.tables import load_table

    src = (
        load_table(spark, "/root/testdata/sf0.001", "documents")
        .select("doc_id", "source")
        .filter(F.col("doc_id") < 500)
    )
    out = str(tmp_path / "pruned_read")
    n = 8
    write_hive_bucketed(src, "source", n, out, kind="string")

    some_key = src.select("source").first().source
    kb = hive_bucket_of(some_key, n, "string")
    pruned = read_hive_bucketed(spark, out, n, buckets=[kb])
    assert len(pruned.inputFiles()) == 1  # 1 of 8 files touched
    assert pruned.inputFiles()[0].endswith(f"{kb:06d}_0")

    # bucket contents == the hash-derived membership, and the key's rows
    # are ALL there (pruning lost nothing)
    expected_key_rows = src.filter(F.col("source") == some_key).count()
    got_key_rows = pruned.filter(F.col("source") == some_key).count()
    assert got_key_rows == expected_key_rows
    for r in pruned.select("source").distinct().collect():
        assert hive_bucket_of(r.source, n, "string") == kb

    # full read opens all n files and loses nothing
    full = read_hive_bucketed(spark, out, n)
    assert len(full.inputFiles()) == n
    assert full.count() == src.count()

    import pytest

    with pytest.raises(ValueError, match="out of range"):
        read_hive_bucketed(spark, out, n, buckets=[n])


def test_hive_string_hash_property_full_unicode(spark):
    """Hypothesis property: for ARBITRARY unicode strings (surrogate pairs,
    astral planes, combining marks), the Spark fold equals the Python
    String.hashCode replica over UTF-16 code units. One batched Spark job
    for the whole corpus."""
    from hypothesis import given, settings, strategies as st

    from apache_hive_1_2_2_src_spark.sources.hive_bucketing import (
        hive_hash_value,
        hive_string_hash,
    )

    corpus: list[str] = []

    @settings(max_examples=60, deadline=None)
    @given(
        st.text(
            # exclude lone surrogates (Cs): not encodable as real strings;
            # PAIRED surrogates still appear via astral-plane codepoints
            alphabet=st.characters(
                min_codepoint=0x80,
                max_codepoint=0x10FFFF,
                exclude_categories=("Cs",),
            ),
            min_size=1,
            max_size=24,
        )
    )
    def collect(s: str) -> None:
        corpus.append(s)

    collect()
    corpus = sorted(set(corpus))
    assert corpus
    df = spark.createDataFrame([(s,) for s in corpus], "s string")
    got = {r.s: r.h for r in df.select("s", hive_string_hash("s").alias("h")).collect()}
    for s in corpus:
        assert got[s] == _java_hash(s) == hive_hash_value(s, "string"), repr(s)


def test_bucket_map_join_plan_has_no_key_shuffle(spark, tmp_path):
    """The bucket-map join must be a union of per-bucket BROADCAST joins:
    no SortMergeJoin and no Exchange hash-partitioned on the join key
    anywhere in the join subtree (the fact side never shuffles) — Hive's
    hive.optimize.bucketmapjoin plan shape."""
    from apache_hive_1_2_2_src_spark.sources.hive_bucketing import (
        hive_bucket_map_join,
        write_hive_bucketed,
    )
    from apache_hive_1_2_2_src_spark.tables import load_table

    sf = "/root/testdata/sf0.001"
    n = 4
    op, cp = str(tmp_path / "o"), str(tmp_path / "c")
    o = load_table(spark, sf, "orders").select("o_custkey", "o_totalprice")
    c = load_table(spark, sf, "customer").select("c_custkey", "c_mktsegment")
    write_hive_bucketed(o, "o_custkey", n, op, kind="long")
    write_hive_bucketed(c, "c_custkey", n, cp, kind="long")

    joined = hive_bucket_map_join(spark, op, cp, n, "o_custkey", "c_custkey")
    plan = joined._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan
    assert "hashpartitioning(o_custkey" not in plan
    assert "hashpartitioning(c_custkey" not in plan

    # and the result is exactly the plain join
    expected = o.join(c, F.col("o_custkey") == F.col("c_custkey")).count()
    assert joined.count() == expected


def test_write_hive_bucketed_routes_non_ascii_keys(spark, tmp_path):
    """End-to-end writer check on a non-Latin corpus: every row lands in
    the file its UTF-16 Java hash demands (the round-8 ascii() fold would
    misroute ALL of these keys)."""
    from apache_hive_1_2_2_src_spark.sources.hive_bucketing import (
        read_hive_bucketed,
        write_hive_bucketed,
    )

    keys = ["日本語", "中文分桶键", "ключ", "naïve", "café", "𝄞clef",
            "ünïcode", "絵文字🚀", "한국어", "ελληνικά"]
    src = spark.createDataFrame(
        [(i, keys[i % len(keys)]) for i in range(200)], "id long, k string"
    )
    out = str(tmp_path / "unicode_buckets")
    n = 8
    write_hive_bucketed(src, "k", n, out, kind="string")

    total = 0
    for b in range(n):
        rows = read_hive_bucketed(spark, out, n, buckets=[b]).collect()
        total += len(rows)
        for r in rows:
            assert (_java_hash(r.k) % (1 << 31)) % n == b, (r.k, b)
    assert total == 200


def test_multi_bucket_pruned_read_and_sparse_bucket_map_join(spark, tmp_path):
    """Edge coverage for the interop read path: (a) a multi-bucket pruned
    read opens exactly the requested files with exact membership; (b) the
    bucket-map join stays exact when n_buckets exceeds the distinct key
    count (most per-bucket joins run over EMPTY schema-bearing files)."""
    from apache_hive_1_2_2_src_spark.sources.hive_bucketing import (
        hive_bucket_map_join,
        hive_bucket_of,
        read_hive_bucketed,
        write_hive_bucketed,
    )

    n = 8
    left = spark.createDataFrame(
        [(i, i % 3, f"L{i}") for i in range(60)], "id long, k long, tag string"
    )
    right = spark.createDataFrame(
        [(j, f"R{j}") for j in range(3)], "rk long, rtag string"
    )
    lp, rp = str(tmp_path / "l"), str(tmp_path / "r")
    write_hive_bucketed(left, "k", n, lp, kind="long")
    write_hive_bucketed(right, "rk", n, rp, kind="long")

    # (a) multi-bucket read: exactly 2 files, only keys hashing there
    bsel = sorted({hive_bucket_of(0, n, "long"), hive_bucket_of(1, n, "long")})
    pruned = read_hive_bucketed(spark, lp, n, buckets=bsel)
    assert len(pruned.inputFiles()) == len(bsel)
    for r in pruned.select("k").distinct().collect():
        assert hive_bucket_of(r.k, n, "long") in bsel

    # (b) sparse join: 3 distinct keys over 8 buckets — empty buckets must
    # contribute nothing and lose nothing
    joined = hive_bucket_map_join(spark, lp, rp, n, "k", "rk")
    assert joined.count() == 60  # every left row matches its dimension row
    got = {(r.id, r.rtag) for r in joined.select("id", "rtag").collect()}
    assert got == {(i, f"R{i % 3}") for i in range(60)}


def test_bucket_map_join_rejects_mismatched_bucket_counts(spark, tmp_path):
    """Joining an m-bucketed layout as n-bucketed silently loses pairs —
    the join must refuse a layout whose positional file count disagrees."""
    import pytest

    from apache_hive_1_2_2_src_spark.sources.hive_bucketing import (
        hive_bucket_map_join,
        write_hive_bucketed,
    )

    a = spark.createDataFrame([(i, i) for i in range(20)], "k long, v long")
    b = spark.createDataFrame([(i, i) for i in range(4)], "rk long, w long")
    ap, bp = str(tmp_path / "a"), str(tmp_path / "b")
    write_hive_bucketed(a, "k", 8, ap, kind="long")
    write_hive_bucketed(b, "rk", 4, bp, kind="long")  # DIFFERENT n
    with pytest.raises(ValueError, match="not 8-bucketed"):
        hive_bucket_map_join(spark, ap, bp, 8, "k", "rk")


def test_bucket_map_join_same_key_column_name(spark, tmp_path):
    """The common CLUSTERED BY setup uses the SAME key column name on both
    sides; the per-bucket join condition must resolve via the side aliases
    instead of raising AnalysisException on the ambiguous bare column
    (round-9 ADVICE item — public-API surface only, so pinned here)."""
    from apache_hive_1_2_2_src_spark.sources.hive_bucketing import (
        hive_bucket_map_join,
        write_hive_bucketed,
    )

    n = 4
    left = spark.createDataFrame(
        [(i % 5, f"L{i}") for i in range(40)], "k long, tag string"
    )
    right = spark.createDataFrame([(j, f"R{j}") for j in range(5)], "k long, rtag string")
    lp, rp = str(tmp_path / "same_l"), str(tmp_path / "same_r")
    write_hive_bucketed(left, "k", n, lp, kind="long")
    write_hive_bucketed(right, "k", n, rp, kind="long")

    joined = hive_bucket_map_join(spark, lp, rp, n, "k", "k")
    assert joined.count() == 40
    got = {(r.tag, r.rtag) for r in joined.select("tag", "rtag").collect()}
    assert got == {(f"L{i}", f"R{i % 5}") for i in range(40)}


def test_bucket_map_join_chunked_matches_per_bucket(spark, tmp_path):
    """chunk_buckets>1 reads c buckets per side per join and joins on the
    key alone — correct because the key determines the bucket, so no pair
    spans chunks and each appears exactly once. The chunked result must be
    row-identical to the strict per-bucket (c=1) form, including over
    chunk sizes that don't divide n. chunk_buckets=n degenerates to a
    single whole-table broadcast join and must also agree."""
    from apache_hive_1_2_2_src_spark.sources.hive_bucketing import (
        hive_bucket_map_join,
        write_hive_bucketed,
    )

    n = 8
    left = spark.createDataFrame(
        [(i % 13, f"L{i}") for i in range(80)], "k long, tag string"
    )
    right = spark.createDataFrame(
        [(j, f"R{j}") for j in range(13)], "rk long, rtag string"
    )
    lp, rp = str(tmp_path / "ch_l"), str(tmp_path / "ch_r")
    write_hive_bucketed(left, "k", n, lp, kind="long")
    write_hive_bucketed(right, "rk", n, rp, kind="long")

    def rows(c):
        df = hive_bucket_map_join(spark, lp, rp, n, "k", "rk", chunk_buckets=c)
        return sorted((r.tag, r.rtag) for r in df.select("tag", "rtag").collect())

    expect = rows(1)
    assert len(expect) == 80
    for c in (3, 4, 8):
        assert rows(c) == expect, f"chunk_buckets={c} diverges from per-bucket"
    import pytest

    with pytest.raises(ValueError, match="chunk_buckets"):
        hive_bucket_map_join(spark, lp, rp, n, "k", "rk", chunk_buckets=0)
    with pytest.raises(ValueError, match="chunk_buckets"):
        hive_bucket_map_join(spark, lp, rp, n, "k", "rk", chunk_buckets=9)


def test_smb_merge_join_over_sorted_hive_layouts(spark, tmp_path):
    """SORT MERGE BUCKET join parity (SortedMergeBucketMapJoinOptimizer):
    write both layouts with sorted_by (SORTED BY key ASC files), validate,
    and merge-join via the single cogroup plan. Result must equal the
    plain join — one misrouted or mis-merged row shifts the pair set.
    Sparse layouts (empty buckets) and distinct key names exercised."""
    from apache_hive_1_2_2_src_spark.sources.hive_bucketing import (
        hive_smb_merge_join,
        write_hive_bucketed,
    )

    n = 8
    # keys 0..6 only -> some of the 8 buckets are empty on both sides
    left = spark.createDataFrame(
        [((i * 7) % 7, f"L{i}") for i in range(120)], "k long, tag string"
    )
    right = spark.createDataFrame(
        [(j % 7, f"R{j}") for j in range(21)], "rk long, rtag string"
    )
    lp, rp = str(tmp_path / "smb_l"), str(tmp_path / "smb_r")
    write_hive_bucketed(left, "k", n, lp, kind="long", sorted_by="k")
    write_hive_bucketed(right, "rk", n, rp, kind="long", sorted_by="rk")

    out = hive_smb_merge_join(spark, lp, rp, n, "k", "rk", kind="long")
    got = sorted((r.tag, r.rtag) for r in out.select("tag", "rtag").collect())
    expect = sorted(
        (r.tag, r.rtag)
        for r in left.join(right, left.k == right.rk).select("tag", "rtag").collect()
    )
    assert got == expect and len(got) == 120 * 3


def test_smb_merge_join_same_key_name_and_clash_rejection(spark, tmp_path):
    """Same-named keys keep one copy (CLUSTERED BY usual case); same-named
    NON-key columns are refused up front instead of silently suffixed."""
    import pytest

    from apache_hive_1_2_2_src_spark.sources.hive_bucketing import (
        hive_smb_merge_join,
        write_hive_bucketed,
    )

    n = 4
    left = spark.createDataFrame(
        [(i % 5, f"L{i}") for i in range(40)], "k long, tag string"
    )
    right = spark.createDataFrame([(j, f"R{j}") for j in range(5)], "k long, rtag string")
    lp, rp = str(tmp_path / "smbs_l"), str(tmp_path / "smbs_r")
    write_hive_bucketed(left, "k", n, lp, kind="long", sorted_by="k")
    write_hive_bucketed(right, "k", n, rp, kind="long", sorted_by="k")
    out = hive_smb_merge_join(spark, lp, rp, n, "k", "k", kind="long")
    assert out.columns.count("k") == 1
    assert out.count() == 40

    clash = spark.createDataFrame([(j, f"X{j}") for j in range(5)], "rk long, tag string")
    cp = str(tmp_path / "smbs_c")
    write_hive_bucketed(clash, "rk", n, cp, kind="long", sorted_by="rk")
    with pytest.raises(ValueError, match="disjoint"):
        hive_smb_merge_join(spark, lp, cp, n, "k", "rk", kind="long")


def test_smb_merge_join_refuses_unsorted_layout(spark, tmp_path):
    """Hive's SMB silently mis-joins over files that violate SORTED BY;
    validate_hive_sorted_bucketed must catch an unsorted bucket file and
    hive_smb_merge_join(validate=True) must refuse the layout."""
    import pytest

    from apache_hive_1_2_2_src_spark.sources.hive_bucketing import (
        hive_smb_merge_join,
        validate_hive_sorted_bucketed,
        write_hive_bucketed,
    )

    n = 4
    # written WITHOUT sorted_by: multi-row buckets land in arbitrary order;
    # force a guaranteed inversion by seeding many distinct keys per bucket
    left = spark.createDataFrame(
        [((i * 37) % 101, f"L{i}") for i in range(101)], "k long, tag string"
    )
    lp = str(tmp_path / "uns_l")
    write_hive_bucketed(left, "k", n, lp, kind="long")
    sorted_ok = True
    try:
        validate_hive_sorted_bucketed(spark, lp, n, "k")
    except ValueError:
        sorted_ok = False
    if sorted_ok:
        # astronomically unlikely (101 keys landing sorted in all 4 files),
        # but don't let a fluke turn this into a flake
        import pytest as _p

        _p.skip("unsorted write happened to produce sorted files")
    rp = str(tmp_path / "uns_r")
    right = spark.createDataFrame([(j, f"R{j}") for j in range(101)], "rk long, rtag string")
    write_hive_bucketed(right, "rk", n, rp, kind="long", sorted_by="rk")
    with pytest.raises(ValueError, match="not SORTED BY"):
        hive_smb_merge_join(spark, lp, rp, n, "k", "rk", kind="long")
    # validate=False is the documented escape hatch for layouts known-sorted
    out = hive_smb_merge_join(spark, lp, rp, n, "k", "rk", kind="long", validate=False)
    assert out.count() == 101


def test_smb_merge_join_sub_split_equivalence(spark, tmp_path):
    """sub_split=k refines the cogroup key to (bucket, xxhash64(key) mod k)
    so each merge task holds ~1/k of a bucket pair — the per-task memory
    bound for buckets too big for one pandas frame. Matching rows agree on
    the key, hence on both components, so the finer tiling must produce
    EXACTLY the plain-join pair set: one pair lost to a sub-bucket
    disagreement or doubled across tiles shifts the multiset."""
    import pytest

    from apache_hive_1_2_2_src_spark.sources.hive_bucketing import (
        hive_smb_merge_join,
        write_hive_bucketed,
    )

    n = 4
    # heavy key skew: key 3 repeats 60x on the left, 5x on the right, so
    # sub-splitting actually splits work inside its bucket
    left = spark.createDataFrame(
        [(3 if i % 2 else i % 13, f"L{i}") for i in range(120)], "k long, tag string"
    )
    right = spark.createDataFrame(
        [(j % 13, f"R{j}") for j in range(65)], "rk long, rtag string"
    )
    lp, rp = str(tmp_path / "sub_l"), str(tmp_path / "sub_r")
    write_hive_bucketed(left, "k", n, lp, kind="long", sorted_by="k")
    write_hive_bucketed(right, "rk", n, rp, kind="long", sorted_by="rk")

    expect = sorted(
        (r.tag, r.rtag)
        for r in left.join(right, left.k == right.rk).select("tag", "rtag").collect()
    )
    for k in (1, 4, 7):
        out = hive_smb_merge_join(
            spark, lp, rp, n, "k", "rk", kind="long", sub_split=k
        )
        got = sorted((r.tag, r.rtag) for r in out.select("tag", "rtag").collect())
        assert got == expect, f"sub_split={k} diverged"
        assert "__sub" not in out.columns and "__hb" not in out.columns

    with pytest.raises(ValueError, match="sub_split"):
        hive_smb_merge_join(spark, lp, rp, n, "k", "rk", kind="long", sub_split=0)


def test_smb_merge_join_null_keys_drop(spark, tmp_path):
    """NULL join keys must produce NO output rows (inner equi-join). This
    is a real trap in the cogroup form: nullable long keys reach
    applyInPandas as float64 NaN and pd.merge MATCHES NaN keys, so without
    the Spark-side isNotNull filter the merge fabricates NULL=NULL pairs
    that Spark/Hive/hive_bucket_map_join never produce (ADVICE r10 high)."""
    from apache_hive_1_2_2_src_spark.sources.hive_bucketing import (
        hive_smb_merge_join,
        write_hive_bucketed,
    )

    n = 4
    left = spark.createDataFrame(
        [(None, "Lnull_a"), (None, "Lnull_b")]
        + [(i % 5, f"L{i}") for i in range(40)],
        "k long, tag string",
    )
    right = spark.createDataFrame(
        [(None, "Rnull_a"), (None, "Rnull_b"), (None, "Rnull_c")]
        + [(j, f"R{j}") for j in range(5)],
        "rk long, rtag string",
    )
    lp, rp = str(tmp_path / "null_l"), str(tmp_path / "null_r")
    write_hive_bucketed(left, "k", n, lp, kind="long", sorted_by="k")
    write_hive_bucketed(right, "rk", n, rp, kind="long", sorted_by="rk")

    out = hive_smb_merge_join(spark, lp, rp, n, "k", "rk", kind="long")
    got = sorted((r.tag, r.rtag) for r in out.select("tag", "rtag").collect())
    expect = sorted(
        (r.tag, r.rtag)
        for r in left.join(right, left.k == right.rk).select("tag", "rtag").collect()
    )
    assert got == expect and len(got) == 40  # 2x3 NULL pairs NOT fabricated
    assert out.where(F.col("k").isNull()).count() == 0
    # same must hold with sub_split active (NaN also hashes somewhere)
    out2 = hive_smb_merge_join(spark, lp, rp, n, "k", "rk", kind="long", sub_split=3)
    assert sorted((r.tag, r.rtag) for r in out2.select("tag", "rtag").collect()) == expect


def test_smb_merge_join_sub_split_mixed_physical_key_types(spark, tmp_path):
    """kind='long' admits INT and BIGINT physical key columns (both cast
    through hive_long_hash for bucket routing), but xxhash64 is
    TYPE-sensitive — xxhash64(INT 7) != xxhash64(BIGINT 7) — so the
    sub_split hash must cast both sides to the canonical BIGINT or
    matching pairs silently vanish whenever sub_split>1 (ADVICE r10
    medium)."""
    from apache_hive_1_2_2_src_spark.sources.hive_bucketing import (
        hive_smb_merge_join,
        write_hive_bucketed,
    )

    n = 4
    left = spark.createDataFrame(
        [(i % 9, f"L{i}") for i in range(72)], "k int, tag string"
    )
    right = spark.createDataFrame(
        [(j % 9, f"R{j}") for j in range(18)], "rk long, rtag string"
    )
    lp, rp = str(tmp_path / "mix_l"), str(tmp_path / "mix_r")
    write_hive_bucketed(left, "k", n, lp, kind="long", sorted_by="k")
    write_hive_bucketed(right, "rk", n, rp, kind="long", sorted_by="rk")

    expect = sorted(
        (r.tag, r.rtag)
        for r in left.join(right, left.k == right.rk).select("tag", "rtag").collect()
    )
    assert len(expect) == 72 * 2
    for k in (1, 4):
        out = hive_smb_merge_join(spark, lp, rp, n, "k", "rk", kind="long", sub_split=k)
        got = sorted((r.tag, r.rtag) for r in out.select("tag", "rtag").collect())
        assert got == expect, f"sub_split={k} dropped pairs across INT/BIGINT sides"


def test_validator_catches_violation_straddling_file_splits(spark, tmp_path):
    """validate_hive_sorted_bucketed's carry dict is per-task, so a big
    bucket file split across input partitions could hide an inversion at
    the split boundary — exactly the regime SMB targets (ADVICE r10
    medium). The validator now forces one split per file by raising
    spark.sql.files.maxPartitionBytes for its one scan. Construct the
    failure deliberately: two internally-sorted row groups with the ONLY
    inversion at the row-group boundary, and an ambient split size small
    enough that the row groups would land in different tasks."""
    import pyarrow as pa
    import pyarrow.parquet as pq
    import pytest

    from apache_hive_1_2_2_src_spark.sources.hive_bucketing import (
        validate_hive_sorted_bucketed,
    )

    d = tmp_path / "straddle"
    d.mkdir()
    vals = list(range(50_000, 100_000)) + list(range(50_000))
    pq.write_table(pa.table({"k": vals}), str(d / "000000_0"), row_group_size=50_000)

    conf_key = "spark.sql.files.maxPartitionBytes"
    prev = spark.conf.get(conf_key)
    spark.conf.set(conf_key, "65536")  # would split the file ~10 ways
    try:
        with pytest.raises(ValueError, match="not SORTED BY"):
            validate_hive_sorted_bucketed(spark, str(d), 1, "k")
        # the validator restored the AMBIENT conf, not its own override
        assert spark.conf.get(conf_key) == "65536"
    finally:
        spark.conf.set(conf_key, prev)


def test_full_layout_read_refuses_missing_bucket_file(spark, tmp_path):
    """The glob-listing full read must keep the per-path form's loud
    failure: a layout missing one positional file silently served fewer
    buckets through a bare glob (wrong rows, no error)."""
    import os

    import pytest

    from apache_hive_1_2_2_src_spark.sources.hive_bucketing import (
        read_hive_bucketed,
        write_hive_bucketed,
    )

    n = 4
    df = spark.createDataFrame([(i, f"v{i}") for i in range(40)], "k long, v string")
    p = str(tmp_path / "missing_l")
    write_hive_bucketed(df, "k", n, p, kind="long")
    os.remove(os.path.join(p, "000002_0"))
    with pytest.raises(ValueError, match="not 4-bucketed"):
        read_hive_bucketed(spark, p, n)
    # pruned reads of the surviving buckets still work
    assert read_hive_bucketed(spark, p, n, buckets=[0, 1, 3]).count() > 0


def test_smb_merge_join_left_outer(spark, tmp_path):
    """how='left' (SMBMapJoinOperator executes outer joins over the same
    co-bucketed layout): every left row survives — unmatched non-null
    keys AND null-key rows (routed around the cogroup) carry NULL right
    columns; must equal Spark's left join row-for-row, under sub_split
    too."""
    from apache_hive_1_2_2_src_spark.sources.hive_bucketing import (
        hive_smb_merge_join,
        write_hive_bucketed,
    )

    n = 4
    left = spark.createDataFrame(
        [(None, "Lnull")] + [(i % 11, f"L{i}") for i in range(44)],
        "k long, tag string",
    )
    right = spark.createDataFrame(  # keys 0..6 only -> 7..10 unmatched
        [(j % 7, f"R{j}") for j in range(14)], "rk long, rtag string"
    )
    lp, rp = str(tmp_path / "lo_l"), str(tmp_path / "lo_r")
    write_hive_bucketed(left, "k", n, lp, kind="long", sorted_by="k")
    write_hive_bucketed(right, "rk", n, rp, kind="long", sorted_by="rk")

    expect = sorted(
        (r.tag, r.rtag)
        for r in left.join(right, left.k == right.rk, "left")
        .select("tag", "rtag")
        .collect()
    )
    for k in (1, 3):
        out = hive_smb_merge_join(
            spark, lp, rp, n, "k", "rk", kind="long", how="left", sub_split=k
        )
        got = sorted(
            (r.tag, r.rtag) for r in out.select("tag", "rtag").collect()
        )
        assert got == expect, f"left outer diverged at sub_split={k}"
        # the null-key row survives with NULL right side
        nullrow = out.where(F.col("k").isNull()).collect()
        assert len(nullrow) == 1 and nullrow[0].rtag is None

    import pytest

    with pytest.raises(ValueError, match="how"):
        hive_smb_merge_join(spark, lp, rp, n, "k", "rk", kind="long", how="cross")


def test_smb_merge_join_full_outer(spark, tmp_path):
    """how='full' (the last cell of the SMB join-type matrix): every row
    of BOTH sides survives — unmatched non-null keys and NULL-key rows of
    either side (both routed around the cogroup, where they would
    NaN-match) carry NULL opposite columns; must equal Spark's full join
    row-for-row, under sub_split too."""
    from apache_hive_1_2_2_src_spark.sources.hive_bucketing import (
        hive_smb_merge_join,
        write_hive_bucketed,
    )

    n = 4
    left = spark.createDataFrame(
        [(None, "Lnull1"), (None, "Lnull2")]
        + [(i % 11, f"L{i}") for i in range(44)],  # keys 0..10
        "k long, tag string",
    )
    right = spark.createDataFrame(  # keys 5..12 -> 11,12 right-only
        [(None, "Rnull")] + [(5 + j % 8, f"R{j}") for j in range(16)],
        "rk long, rtag string",
    )
    lp, rp = str(tmp_path / "fo_l"), str(tmp_path / "fo_r")
    write_hive_bucketed(left, "k", n, lp, kind="long", sorted_by="k")
    write_hive_bucketed(right, "rk", n, rp, kind="long", sorted_by="rk")

    def skey(t):
        return (t[0] is None, t[0] or "", t[1] is None, t[1] or "")

    expect = sorted(
        (
            (r.tag, r.rtag)
            for r in left.join(right, left.k == right.rk, "full")
            .select("tag", "rtag")
            .collect()
        ),
        key=skey,
    )
    for k in (1, 3):
        out = hive_smb_merge_join(
            spark, lp, rp, n, "k", "rk", kind="long", how="full", sub_split=k
        )
        got = sorted(
            ((r.tag, r.rtag) for r in out.select("tag", "rtag").collect()), key=skey
        )
        assert got == expect, f"full outer diverged at sub_split={k}"
        # NULL-key rows of BOTH sides survive, never matched to each other
        lnull = out.where(F.col("k").isNull() & F.col("tag").isNotNull()).collect()
        assert sorted(r.tag for r in lnull) == ["Lnull1", "Lnull2"]
        assert all(r.rtag is None for r in lnull)
        rnull = out.where(F.col("rk").isNull() & F.col("rtag").isNotNull()).collect()
        assert [r.rtag for r in rnull] == ["Rnull"] and rnull[0].tag is None


def test_smb_merge_join_full_outer_same_key_name(spark, tmp_path):
    """Same-named keys under how='full': the single kept key column is
    populated from WHICHEVER side the row came from (right-only rows keep
    their key; right NULL-key rows keep NULL)."""
    from apache_hive_1_2_2_src_spark.sources.hive_bucketing import (
        hive_smb_merge_join,
        write_hive_bucketed,
    )

    n = 4
    left = spark.createDataFrame(
        [(i, f"L{i}") for i in range(6)], "k long, tag string"
    )
    right = spark.createDataFrame(
        [(None, "Rnull")] + [(j, f"R{j}") for j in range(4, 10)],
        "k long, rtag string",
    )
    lp, rp = str(tmp_path / "fos_l"), str(tmp_path / "fos_r")
    write_hive_bucketed(left, "k", n, lp, kind="long", sorted_by="k")
    write_hive_bucketed(right, "k", n, rp, kind="long", sorted_by="k")
    out = hive_smb_merge_join(
        spark, lp, rp, n, "k", "k", kind="long", how="full"
    ).collect()
    by_tag = {(r.tag, r.rtag): r.k for r in out}
    assert len(out) == 6 + 6 + 1 - 2  # 2 matches (k=4,5)
    assert by_tag[("L4", "R4")] == 4 and by_tag[("L5", "R5")] == 5
    assert by_tag[(None, "R9")] == 9  # right-only row keeps its key
    assert by_tag[(None, "Rnull")] is None
    assert by_tag[("L0", None)] == 0


def test_bucket_map_join_left_outer(spark, tmp_path):
    """how='left' on the bucket-map form (MapJoinOperator LEFT OUTER):
    unmatched and NULL-key fact rows survive with NULL dim columns; must
    equal Spark's left join under chunking too."""
    from apache_hive_1_2_2_src_spark.sources.hive_bucketing import (
        hive_bucket_map_join,
        write_hive_bucketed,
    )

    n = 4
    fact = spark.createDataFrame(
        [(None, "Fnull")] + [(i % 9, f"F{i}") for i in range(36)],
        "k long, tag string",
    )
    dim = spark.createDataFrame(  # keys 0..5 only -> 6..8 unmatched
        [(j, f"D{j}") for j in range(6)], "rk long, rtag string"
    )
    fp, dp = str(tmp_path / "bmlo_f"), str(tmp_path / "bmlo_d")
    write_hive_bucketed(fact, "k", n, fp, kind="long")
    write_hive_bucketed(dim, "rk", n, dp, kind="long")

    expect = sorted(
        (r.tag, r.rtag)
        for r in fact.join(dim, fact.k == dim.rk, "left")
        .select("tag", "rtag")
        .collect()
    )
    for c in (1, 3):
        out = hive_bucket_map_join(
            spark, fp, dp, n, "k", "rk", chunk_buckets=c, how="left"
        )
        got = sorted((r.tag, r.rtag) for r in out.select("tag", "rtag").collect())
        assert got == expect, f"left outer diverged at chunk_buckets={c}"


# ---------------------------------------------------------------------------
# Partitioned + bucketed nested layouts (round 12)
# ---------------------------------------------------------------------------


def _pb_mod():
    from apache_hive_1_2_2_src_spark.sources import hive_bucketing as hb

    return hb


def test_partitioned_bucketed_layout_structure(spark, tmp_path):
    """Every partition dir holds exactly n positional files; file i of a
    partition holds precisely that partition's Hive-bucket-i rows; empty
    (partition, bucket) pairs still get a schema-bearing file; the
    partition column lives ONLY in the directory name (virtual-column
    contract)."""
    import os

    hb = _pb_mod()
    n = 4
    df = spark.createDataFrame(
        [(k, f"p{k % 3}", f"v{k}") for k in range(60)],
        "k long, part string, v string",
    )
    out = str(tmp_path / "pb")
    hb.write_hive_partitioned_bucketed(df, "part", "k", n, out, kind="long")
    parts = sorted(os.listdir(out))
    assert parts == ["part=p0", "part=p1", "part=p2"]
    import pyarrow.parquet as pq

    for pd_ in parts:
        # ignore Hadoop LocalFileSystem .crc sidecars (hidden files)
        files = sorted(
            f for f in os.listdir(os.path.join(out, pd_)) if not f.startswith(".")
        )
        assert files == [f"{b:06d}_0" for b in range(n)]
        pval = pd_.split("=", 1)[1]
        for b, fname in enumerate(files):
            t = pq.read_table(os.path.join(out, pd_, fname)).to_pydict()
            assert set(t.keys()) == {"k", "v"}  # part col is virtual
            for k in t["k"]:
                assert hb.hive_bucket_of(k, n, "long") == b
                assert f"p{k % 3}" == pval


def test_partitioned_bucketed_roundtrip_and_null_partition(spark, tmp_path):
    """Full read reproduces the input exactly — including rows whose
    partition value is NULL (__HIVE_DEFAULT_PARTITION__ dir) and rows
    whose BUCKET key is NULL (routed to bucket 0 within their
    partition)."""
    hb = _pb_mod()
    n = 4
    rows = [(k, f"p{k % 2}", f"v{k}") for k in range(40)]
    rows += [(100, None, "vnullpart"), (None, "p0", "vnullkey")]
    df = spark.createDataFrame(rows, "k long, part string, v string")
    out = str(tmp_path / "pbnull")
    hb.write_hive_partitioned_bucketed(df, "part", "k", n, out, kind="long")
    back = hb.read_hive_partitioned_bucketed(spark, out, "part", n)
    got = sorted(
        ((r.k, r.part, r.v) for r in back.collect()),
        key=lambda t: (t[0] is None, t[0], str(t[1])),
    )
    expect = sorted(rows, key=lambda t: (t[0] is None, t[0], str(t[1])))
    assert got == expect
    # the NULL-key row sits in bucket 0 of its partition
    pruned0 = hb.read_hive_partitioned_bucketed(
        spark, out, "part", n, parts=["p0"], buckets=[0]
    )
    assert any(r.v == "vnullkey" for r in pruned0.collect())


def test_partitioned_bucketed_composed_pruning_files(spark, tmp_path):
    """Partition pruning composes with bucket pruning: |parts|·|buckets|
    of the p·n files are opened, and the pruned scan's rows are exactly
    the matching (partition, bucket) slices."""
    hb = _pb_mod()
    n = 8
    df = spark.createDataFrame(
        [(k, f"d{k % 5}", k * 10) for k in range(400)],
        "k long, dt string, x long",
    )
    out = str(tmp_path / "pbprune")
    hb.write_hive_partitioned_bucketed(df, "dt", "k", n, out, kind="long")
    target = 123
    b = hb.hive_bucket_of(target, n, "long")
    pruned = hb.read_hive_partitioned_bucketed(
        spark, out, "dt", n, parts=[f"d{target % 5}"], buckets=[b]
    )
    assert len(pruned.inputFiles()) == 1  # 1 of 40
    hit = [r for r in pruned.collect() if r.k == target]
    assert len(hit) == 1 and hit[0].x == target * 10
    # two partitions, all buckets -> 2*n files
    two = hb.read_hive_partitioned_bucketed(spark, out, "dt", n, parts=["d0", "d1"])
    assert len(two.inputFiles()) == 2 * n
    assert two.count() == sum(1 for k in range(400) if k % 5 in (0, 1))


def test_partitioned_bucketed_read_refuses_bad_layout(spark, tmp_path):
    """A partition dir missing one positional file must refuse loudly
    (silently serving fewer buckets = wrong rows, no error); unknown
    partition values and out-of-range buckets refuse too."""
    import os

    import pytest

    hb = _pb_mod()
    n = 4
    df = spark.createDataFrame(
        [(k, f"p{k % 2}") for k in range(40)], "k long, part string"
    )
    out = str(tmp_path / "pbbad")
    hb.write_hive_partitioned_bucketed(df, "part", "k", n, out, kind="long")
    with pytest.raises(ValueError, match="not present"):
        hb.read_hive_partitioned_bucketed(spark, out, "part", n, parts=["nope"])
    with pytest.raises(ValueError, match="out of range"):
        hb.read_hive_partitioned_bucketed(spark, out, "part", n, buckets=[n])
    os.remove(os.path.join(out, "part=p1", "000002_0"))
    with pytest.raises(ValueError, match="not 4-bucketed"):
        hb.read_hive_partitioned_bucketed(spark, out, "part", n, parts=["p1"])


def test_part_bucket_map_join_parity_and_plan(spark, tmp_path):
    """hive_part_bucket_map_join == plain join restricted to the selected
    partitions, row-for-row; the fact side opens only |parts|·n files and
    the plan has no Exchange on the join key (broadcast per chunk)."""
    hb = _pb_mod()
    n = 4
    fact = spark.createDataFrame(
        [(k % 50, f"d{k % 3}", k) for k in range(300)],
        "fk long, dt string, x long",
    )
    dim = spark.createDataFrame(
        [(k, f"name{k}") for k in range(50)], "dk long, nm string"
    )
    fp, dp = str(tmp_path / "fact"), str(tmp_path / "dim")
    hb.write_hive_partitioned_bucketed(fact, "dt", "fk", n, fp, kind="long")
    hb.write_hive_bucketed(dim, "dk", n, dp, kind="long")
    joined = hb.hive_part_bucket_map_join(
        spark, fp, "dt", dp, n, "fk", "dk", parts=["d0", "d2"], chunk_buckets=2
    )
    expect = sorted(
        (r.fk, r.dt, r.x, r.nm)
        for r in fact.where("dt IN ('d0','d2')")
        .join(dim, fact.fk == dim.dk)
        .collect()
    )
    got = sorted((r.fk, r.dt, r.x, r.nm) for r in joined.collect())
    assert got == expect

    # LEFT OUTER parity over the same pruned layout (fk 40..49 unmatched)
    lj = hb.hive_part_bucket_map_join(
        spark, fp, "dt", dp, n, "fk", "dk", parts=["d0", "d2"],
        chunk_buckets=2, how="left",
    )
    lexpect = sorted(
        ((r.fk, r.x, r.nm or "") for r in fact.where("dt IN ('d0','d2')")
         .join(dim, fact.fk == dim.dk, "left").select("fk", "x", "nm").collect())
    )
    lgot = sorted(
        ((r.fk, r.x, r.nm or "") for r in lj.select("fk", "x", "nm").collect())
    )
    assert lgot == lexpect
    fact_files = [f for f in joined.inputFiles() if "/fact" in f or "fact/" in f]
    assert len([f for f in fact_files if "dt=" in f]) == 2 * n  # pruned: 2 of 3 parts
    plan = joined._jdf.queryExecution().executedPlan().toString()
    assert "Exchange hashpartitioning(fk" not in plan
    assert "BroadcastHashJoin" in plan


def test_part_smb_merge_join_parity_pruning_and_validation(spark, tmp_path):
    """hive_part_smb_merge_join == plain join restricted to the selected
    partitions (inner and full outer, with NULL fact keys routed); the
    nested validator catches an unsorted bucket file inside ONE partition
    dir; partition selection prunes the fact read."""
    import os

    import pyarrow as pa
    import pyarrow.parquet as pq
    import pytest

    from apache_hive_1_2_2_src_spark.sources.hive_bucketing import (
        hive_part_smb_merge_join,
        validate_hive_sorted_partitioned_bucketed,
        write_hive_bucketed,
        write_hive_partitioned_bucketed,
    )

    n = 4
    fact = spark.createDataFrame(
        [(None, "d0", -1)] + [(k % 40, f"d{k % 3}", k) for k in range(240)],
        "fk long, dt string, x long",
    )
    dim = spark.createDataFrame(  # keys 0..29 -> 30..39 fact-unmatched
        [(k, f"nm{k}") for k in range(30)], "dk long, nm string"
    )
    fp, dp = str(tmp_path / "pf"), str(tmp_path / "pd")
    write_hive_partitioned_bucketed(
        fact, "dt", "fk", n, fp, kind="long", sorted_by="fk"
    )
    write_hive_bucketed(dim, "dk", n, dp, kind="long", sorted_by="dk")

    def skey(r):
        return tuple((c is None, c if c is not None else 0) for c in r)

    for how in ("inner", "full"):
        out = hive_part_smb_merge_join(
            spark, fp, "dt", dp, n, "fk", "dk", kind="long",
            parts=["d0", "d2"], sub_split=2, how=how,
        )
        expect = sorted(
            (
                (r.fk, r.x, r.dk, r.nm)
                for r in fact.where("dt IN ('d0','d2')")
                .join(dim, fact.fk == dim.dk, how)
                .select("fk", "x", "dk", "nm")
                .collect()
            ),
            key=skey,
        )
        got = sorted(
            ((r.fk, r.x, r.dk, r.nm) for r in out.select("fk", "x", "dk", "nm").collect()),
            key=skey,
        )
        assert got == expect, f"partitioned SMB diverged for how={how}"

    # validator: corrupt ONE bucket file inside ONE partition dir
    bad = os.path.join(fp, "dt=d1", "000001_0")
    t = pq.read_table(bad)
    if t.num_rows >= 2:
        ks = list(t.column("fk").to_pylist())[::-1]  # reverse = unsorted
        cols = {name: t.column(name).to_pylist() for name in t.column_names}
        cols["fk"] = ks
        pq.write_table(pa.table(cols), bad)
        # drop the Hadoop LocalFileSystem checksum sidecar — the rewrite
        # invalidates it and the read would fail on CRC, not sortedness
        crc = os.path.join(fp, "dt=d1", ".000001_0.crc")
        if os.path.exists(crc):
            os.remove(crc)
        with pytest.raises(ValueError, match="not SORTED BY"):
            validate_hive_sorted_partitioned_bucketed(spark, fp, "dt", n, "fk")
        # the corrupted partition excluded -> validation passes
        validate_hive_sorted_partitioned_bucketed(
            spark, fp, "dt", n, "fk", parts=["d0", "d2"]
        )


def test_partitioned_bucketed_special_char_partition_values(spark, tmp_path):
    """Partition values that need escapePathName encoding (%, =, /, :,
    space, unicode) must round-trip: the writer inherits Spark's Hive-
    compatible dir escaping, list_hive_partitions unescapes, and the
    pruned read selects by RAW value."""
    hb = _pb_mod()
    n = 2
    vals = ["plain", "a b", "x%y", "k=v", "a/b", "c:d", "naïve", None]
    rows = [(i * 8 + j, v) for i, v in enumerate(vals) for j in range(3)]
    df = spark.createDataFrame(rows, "k long, part string")
    out = str(tmp_path / "pbspecial")
    hb.write_hive_partitioned_bucketed(df, "part", "k", n, out, kind="long")
    by_val = hb.list_hive_partitions(spark, out, "part")
    assert set(by_val) == set(vals)
    # full read round-trips every (k, part) pair
    back = hb.read_hive_partitioned_bucketed(spark, out, "part", n)
    got = sorted((r.k, r.part) for r in back.collect())
    assert got == sorted(rows)
    # pruned read by RAW value, one partition at a time
    for v in vals:
        if v is None:
            continue
        one = hb.read_hive_partitioned_bucketed(spark, out, "part", n, parts=[v])
        assert sorted(r.k for r in one.collect()) == sorted(
            k for k, p in rows if p == v
        ), v
