"""Round-13 pins: the ADVICE r12 closures (ulp-proof DSIR ln, string
partition typing, validator extras check, cached iso sessions) and the
round's new compositions (tested in their own sections below as they
land)."""

from __future__ import annotations

import random

import duckdb
import pytest

from apache_hive_1_2_2_src_spark.extensions.sampling import _det_ln_floor_sql
from apache_hive_1_2_2_src_spark.sources import hive_bucketing as hb


# ---------------------------------------------------------------- det-ln


def _pairs_for_parity() -> list[tuple[int, int]]:
    rng = random.Random(13)
    pairs = [(1, 1), (2, 1), (1, 2), (3, 1), (1_000_000, 7), (7, 1_000_000)]
    # randomized magnitudes across the whole DSIR operating range
    for _ in range(400):
        num = rng.randrange(1, 10**12)
        den = rng.randrange(1, 10**12)
        pairs.append((num, den))
    # adversarial: num/den engineered so SCALE*ln(num/den) sits within
    # ~1e-9 of an integer — exactly the boundary a 1-ulp libm divergence
    # flips (the ADVICE r12 hazard this template exists to kill)
    import math

    for k in (1, 7, 51082, 109861, 1_186_960):
        den = 10**9
        num = round(den * math.exp(k / 100_000.0))
        for d in (-1, 0, 1):
            if num + d > 0:
                pairs.append((num + d, den))
    return pairs


def test_det_ln_floor_bit_parity_spark_vs_duckdb(spark):
    """The shared-arithmetic ln template must produce BIT-IDENTICAL
    pre-floor doubles (hence identical floors) in Spark and DuckDB for
    every (num, den) — including boundary-adversarial ratios."""
    pairs = _pairs_for_parity()
    expr = _det_ln_floor_sql("num", "den", 100_000)
    values = ", ".join(f"({n}, {d})" for n, d in pairs)
    q = (
        f"SELECT num, den, {expr} AS lb "
        f"FROM (VALUES {values}) AS t(num, den) ORDER BY num, den"
    )
    # Spark's VALUES wants explicit typing via a subquery alias; the same
    # text parses in both dialects.
    srows = [(r.num, r.den, r.lb) for r in spark.sql(q).collect()]
    drows = [tuple(r) for r in duckdb.connect().execute(q).fetchall()]
    assert srows == sorted(drows)
    # sanity: the template tracks true ln to well under the 1e-5 grid
    import math

    for n, d, lb in srows[:50]:
        true = math.floor(100_000 * math.log(n / d))
        assert abs(lb - true) <= 1, (n, d, lb, true)


# ------------------------------------------- partition values are strings


def test_partitioned_read_keeps_string_partition_values(spark, tmp_path):
    """Numeric/date-shaped partition values must come back as the EXACT
    path strings — '05' stays '05' (type inference would make it int 5,
    diverging from read_acid_table_partitioned and the parts-selection
    normalization; ADVICE r12)."""
    n = 2
    df = spark.createDataFrame(
        [(k, v, k * 2) for k, v in enumerate(["05", "7", "2024-01-02"] * 4)],
        "k long, pt string, x long",
    )
    out = str(tmp_path / "strparts")
    hb.write_hive_partitioned_bucketed(df, "pt", "k", n, out, kind="long")
    back = hb.read_hive_partitioned_bucketed(spark, out, "pt", n)
    assert dict(back.dtypes)["pt"] == "string"
    assert sorted({r.pt for r in back.collect()}) == ["05", "2024-01-02", "7"]
    # parts selection matches the zero-padded dir exactly
    one = hb.read_hive_partitioned_bucketed(spark, out, "pt", n, parts=["05"])
    assert {r.pt for r in one.collect()} == {"05"}
    assert one.count() == 4


def test_iso_sessions_are_cached_per_context(spark, tmp_path):
    """_iso_session returns the SAME session object per (context, purpose)
    — session state no longer accumulates per validation (ADVICE r12)."""
    a = hb._iso_session(spark, "string-partitions")
    b = hb._iso_session(spark, "string-partitions")
    c = hb._iso_session(spark, "sorted-scan")
    assert a is b
    assert a is not c
    assert a is not spark


# --------------------------------------- validator rejects extra files


def test_sorted_validator_rejects_extra_positional_file(spark, tmp_path):
    """A stray extra *_0 file must fail validate_hive_sorted_bucketed even
    when called directly (it would shift every later bucket under Hive's
    name-ordered file mapping; ADVICE r12 — the old path only caught it
    inside read_hive_bucketed)."""
    n = 4
    df = spark.createDataFrame([(k, k) for k in range(80)], "k long, x long")
    out = str(tmp_path / "sortedextra")
    hb.write_hive_bucketed(df, "k", n, out, kind="long", sorted_by="k")
    hb.validate_hive_sorted_bucketed(spark, out, n, "k")  # passes clean
    import shutil

    shutil.copy(f"{out}/000000_0", f"{out}/000009_0")
    with pytest.raises(ValueError, match="extra positional files"):
        hb.validate_hive_sorted_bucketed(spark, out, n, "k")


# ---------------------- composed streaming full-layout ACID delta writer


def test_full_layout_delta_writer_shape_retry_and_pruned_lookup(
    spark, tmp_path
):
    """write_partitioned_bucketed_delta must produce EXACTLY the
    part=v/delta_N_N/<n positional files> tree, replace its own delta on
    a same-batch_id retry (never double-append, never touch other
    batches), and the published tree must serve the triple-pruned
    read_acid_full_point lookup with one file per acid dir."""
    import os

    from apache_hive_1_2_2_src_spark.operators.acid import (
        read_acid_full_point,
        read_acid_table_partitioned,
    )
    from apache_hive_1_2_2_src_spark.streaming.windows import (
        write_partitioned_bucketed_delta,
    )

    n = 4
    tbl = str(tmp_path / "flretry")
    os.makedirs(tbl)

    def rows(ids, st):
        return spark.createDataFrame(
            [(f"g{k % 2}", k, st, k * 10, "U") for k in ids],
            "pt string, k long, st string, p long, op string",
        )

    write_partitioned_bucketed_delta(rows(range(8), "A"), tbl, "pt", "k", n, 0)
    write_partitioned_bucketed_delta(rows(range(3), "B"), tbl, "pt", "k", n, 1)
    # retry of batch 1 with corrected content
    write_partitioned_bucketed_delta(rows(range(4), "C"), tbl, "pt", "k", n, 1)

    layout = sorted(
        f"{d}/{x}/{f}"
        for d in os.listdir(tbl)
        if d.startswith("pt=")
        for x in os.listdir(os.path.join(tbl, d))
        if x.startswith("delta_")
        for f in os.listdir(os.path.join(tbl, d, x))
        if f.endswith("_0")
    )
    assert layout == sorted(
        f"pt=g{g}/delta_{v}_{v}/{b:06d}_0"
        for g in (0, 1)
        for v in (1, 2)
        for b in range(n)
    )
    got = {
        (r.pt, r.k): r.st
        for r in read_acid_table_partitioned(spark, tbl, "pt").collect()
    }
    expect = {(f"g{k % 2}", k): ("C" if k < 4 else "A") for k in range(8)}
    assert got == expect
    # triple-pruned point lookup: key 5 -> partition g1, ONE bucket file
    # in each of that partition's two deltas
    snap, n_files = read_acid_full_point(spark, tbl, "pt", "g1", n, 5)
    assert n_files == 2
    row = snap.collect()
    assert len(row) == 1 and row[0].st == "A" and row[0].p == 50


# --------------------------------------------- residual IVF+PQ recall


def test_ivfpq_residual_encoding_improves_recall(spark):
    """The full IndexIVFPQ recipe (Jégou et al. §IV): encoding the
    RESIDUAL x − coarse_centroid must beat raw-subvector encoding at the
    SAME 4-byte code budget on data with coarse structure — the regime
    IVF exists for (8 well-separated Gaussian blobs; on unstructured
    noise the coarse quantizer captures nothing and the two collapse
    together, which is why the pin lives on constructed blobs, not the
    near-uniform synthetic testdata). Recall@3 against exact dot-product
    top-3, same trained coarse quantizer, same nprobe=2 cells."""
    import numpy as np
    from pyspark.sql import functions as F
    from pyspark.sql.window import Window

    import apache_hive_1_2_2_src_spark.extensions.similarity as sim

    rng = np.random.default_rng(7)
    k, dim, n, qmin = 8, 64, 320, 296
    centers = rng.normal(0, 4.0, (k, dim))
    vecs = np.array([centers[i % k] + rng.normal(0, 1.0, dim) for i in range(n)])
    e = spark.createDataFrame(
        [(i, [float(x) for x in vecs[i]]) for i in range(n)],
        "vec_id long, embedding array<double>",
    )
    q = e.filter(F.col("vec_id") >= qmin).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("qe")
    )
    cand = e.select(
        F.col("vec_id").alias("cand_id"), F.col("embedding").alias("cde")
    )
    d = (
        q.crossJoin(cand)
        .filter("cand_id != query_id")
        .select(
            "query_id", "cand_id",
            sim._dot(F.col("qe"), F.col("cde")).alias("s"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.col("s").desc(), F.col("cand_id"))
    exact = {
        (r.query_id, r.cand_id)
        for r in d.withColumn("rk", F.row_number().over(w))
        .filter("rk <= 3")
        .collect()
    }
    raw = {
        (r.query_id, r.cand_id)
        for r in sim.ivfpq_raw_topk(spark, e, probe_min_vec=qmin).collect()
    }
    res = {
        (r.query_id, r.cand_id)
        for r in sim.ivfpq_residual_topk(spark, e, probe_min_vec=qmin).collect()
    }
    raw_hits, res_hits = len(raw & exact), len(res & exact)
    assert res_hits > raw_hits, (res_hits, raw_hits, len(exact))
    # two-stage rerank: exact-dot rescoring of the ADC top-10 shortlist.
    # Guaranteed >= the ADC-only top-3 (ADC top-3 ⊆ shortlist and exact
    # scoring surfaces every true-top-3 member the shortlist contains);
    # strictly better here.
    rer = {
        (r.query_id, r.cand_id)
        for r in sim.ivfpq_rerank_topk(spark, e, probe_min_vec=qmin).collect()
    }
    rer_hits = len(rer & exact)
    assert rer_hits >= res_hits, (rer_hits, res_hits)
    assert rer_hits > raw_hits, (rer_hits, raw_hits)


# ------------------------------------------------ BPE -> packing chain


def test_bpe_pack_chain_matches_python_reference(spark):
    """The tokenize→pack composition must equal a straight Python replay:
    train k=4 BPE merges (the round-8 reference algorithm), tokenize each
    doc by summing its words' post-merge token counts, pack per
    (lang, shard = doc_id % 4) in doc_id order into 2048-token bins —
    the r14 scale-safe shard-keyed packing; multiple bins exercised,
    'banana'-class overlap words included. Pins BOTH routes: the
    single-statement template (the oracle's form) and the registered
    steps-trainer route (checkpointed state + tail) must agree with the
    replay and each other."""
    from collections import Counter

    from apache_hive_1_2_2_src_spark.extensions.text import (
        _BPE_BASE_SPARK,
        _BPE_DOCC_SPARK,
        _BPE_STEPS,
        _PACK_SHARDS,
        _bpe_pack_sql,
        _bpe_pack_tail,
        bpe_final_state_steps,
    )

    rng = __import__("random").Random(13)
    vocab = ["banana", "aaaa", "bandana", "anna", "ban", "nab", "ana", "bb"]
    docs = []
    for d in range(24):
        lang = "en" if d % 3 else "de"
        words = [vocab[rng.randrange(len(vocab))] for _ in range(rng.randrange(150, 450))]
        docs.append((d, lang, " ".join(words)))
    spark.createDataFrame(docs, "doc_id long, lang string, text string").createOrReplaceTempView("bpe_docs")

    def rows(df):
        return sorted(
            (r.lang, r.shard_id, r.bin_id, r.n_docs, r.bin_tokens, r.docid_sum)
            for r in df.collect()
        )

    got = rows(spark.sql(_bpe_pack_sql(_BPE_BASE_SPARK, _BPE_DOCC_SPARK)))
    state, _ = bpe_final_state_steps(spark, _BPE_STEPS)
    state.createOrReplaceTempView("bpe_state_final")
    got_steps = rows(
        spark.sql("WITH " + _bpe_pack_tail("bpe_state_final", _BPE_DOCC_SPARK))
    )
    assert got_steps == got

    # ---- independent Python replay ----
    words = Counter(w for _d, _l, t in docs for w in t.split(" ") if w)
    symtab = {w: list(w) for w in words}
    for _step in range(_BPE_STEPS):
        pairs: Counter = Counter()
        for w, cnt in words.items():
            s = symtab[w]
            for i in range(len(s) - 1):
                pairs[(s[i], s[i + 1])] += cnt
        (pa, pb), _f = min(pairs.items(), key=lambda kv: (-kv[1], kv[0]))
        for w in symtab:
            s, out, i = symtab[w], [], 0
            while i < len(s):
                if i + 1 < len(s) and (s[i], s[i + 1]) == (pa, pb):
                    out.append(pa + pb)
                    i += 2
                else:
                    out.append(s[i])
                    i += 1
            symtab[w] = out
    wtok = {w: len(s) for w, s in symtab.items()}
    per_doc = [
        (d, lang, sum(wtok[w] for w in t.split(" ") if w))
        for d, lang, t in docs
    ]
    bins: dict = {}
    for lang, shard in {(l, d % _PACK_SHARDS) for d, l, _t in per_doc}:
        cum = 0
        for d, lg, n in sorted(
            p for p in per_doc if p[1] == lang and p[0] % _PACK_SHARDS == shard
        ):
            b = cum // 2048
            nd, nt, ds = bins.get((lang, shard, b), (0, 0, 0))
            bins[(lang, shard, b)] = (nd + 1, nt + n, ds + d)
            cum += n
    expect = sorted(
        (lang, sh, b, nd, nt, ds)
        for (lang, sh, b), (nd, nt, ds) in bins.items()
    )
    assert got == expect
    # multiple bins per (lang, shard) actually exercised
    assert max(b for _l, _s, b, *_ in expect) >= 1
    # ...and more than one shard per lang
    assert len({(l, s) for l, s, *_ in expect}) >= 4


# ------------------------------------- scalable driver-loop BPE trainer


def test_bpe_steps_trainer_matches_template_and_python_reference(spark):
    """bpe_train_merges_steps (the O(k) production twin of the
    exponential-plan single-statement template — SCALE.md r13) must make
    byte-identical merge decisions: == the template at k=4, == the
    Python greedy-non-overlap reference at k=10 (past the template's
    feasible range)."""
    from collections import Counter

    from apache_hive_1_2_2_src_spark.extensions.text import (
        _BPE_BASE_SPARK,
        _bpe_sql,
        bpe_train_merges_steps,
    )

    corpus = (
        ["banana"] * 5 + ["aaaa"] * 3 + ["bandana"] * 2 + ["anna"] * 4
        + ["ban"] * 6 + ["nab"] * 6 + ["nanananas"] * 2 + ["abba"] * 3
    )
    spark.createDataFrame(
        [(" ".join(corpus),)], "text string"
    ).createOrReplaceTempView("bpe_docs")

    def rows(df):
        return [
            (r.step, r.pair_a, r.pair_b, r.pair_freq, r.tokens_after)
            for r in df.orderBy("step").collect()
        ]

    got4 = rows(bpe_train_merges_steps(spark, 4))
    template4 = rows(spark.sql(_bpe_sql(_BPE_BASE_SPARK)))
    assert got4 == template4

    got10 = rows(bpe_train_merges_steps(spark, 10))
    words = Counter(corpus)
    symtab = {w: list(w) for w in words}
    expect = []
    for step in range(1, 11):
        pairs: Counter = Counter()
        for w, cnt in words.items():
            s = symtab[w]
            for i in range(len(s) - 1):
                pairs[(s[i], s[i + 1])] += cnt
        (pa, pb), freq = min(pairs.items(), key=lambda kv: (-kv[1], kv[0]))
        for w in symtab:
            s, out, i = symtab[w], [], 0
            while i < len(s):
                if i + 1 < len(s) and (s[i], s[i + 1]) == (pa, pb):
                    out.append(pa + pb)
                    i += 2
                else:
                    out.append(s[i])
                    i += 1
            symtab[w] = out
        tokens = sum(len(symtab[w]) * cnt for w, cnt in words.items())
        expect.append((step, pa, pb, freq, tokens))
    assert got10 == expect


# ------------------------------------------- scale-regression harness


def test_scale_harness_measures_partition_pruning(spark, tmp_path):
    """tools/scale_harness.py: the pruned probe of a hash-partitioned
    store must open only the selected partitions' bytes (execution
    ground truth via input_file_name — df.inputFiles() ignores
    filter-based partition pruning and would lie here), the full scan
    must report ~100%, and the regression gate must trip when pruning
    is broken."""
    import pytest
    from pyspark.sql import functions as F

    import tools.scale_harness as sh

    k = 16
    store = str(tmp_path / "store")
    rows = spark.range(50_000).select(
        F.col("id").alias("doc_id"),
        (F.col("id") % 997).cast("string").alias("sh"),
    )
    sh.build_hash_partitioned_store(spark, rows, F.xxhash64("doc_id"), k, store)
    pruned = spark.read.parquet(store).where(F.col("pb").isin([0, 3]))
    r = sh.assert_prune_ratio("pytest probe 2/16", pruned, store, 4 / k)
    assert r["files"] == 2
    full = spark.read.parquet(store)
    assert sh.prune_report("pytest full scan", full, store)["ratio"] > 0.99
    with pytest.raises(AssertionError, match="regressed to a scan"):
        sh.assert_prune_ratio("pytest gate", full, store, 4 / k)


def test_real_lsh_state_store_probes_stay_pruned(spark):
    """The scale-harness gate on the REAL streaming-LSH state stores (not
    a synthetic replica): after a 3-batch drain, a signature-bucket probe
    and a partner-partition verify read must open only their partitions'
    bytes — the exact reads _lsh_probe_dedup issues per micro-batch. A
    regression that loses the PartitionFilters (e.g. a cast on the
    partition column) turns these into corpus-sized scans and fails
    here on bytes, not just plan shape."""
    from pyspark.sql import functions as F

    import tools.scale_harness as sh
    from apache_hive_1_2_2_src_spark.streaming.windows import (
        LAST_LSH_STORES,
        _lsh_probe_dedup,
    )
    from tests.conftest import SF_DIR

    _lsh_probe_dedup(spark, SF_DIR, n_batches=3, store_buckets=8).count()
    sig_dir = LAST_LSH_STORES["sig"]
    sh_dir = LAST_LSH_STORES["shingle"]
    # the per-batch signature probe: batch sigs -> their sb buckets only
    sig_probe = spark.read.parquet(sig_dir).where(F.col("sb").isin([0]))
    sh.assert_prune_ratio("real sig store 1/8", sig_probe, sig_dir, 2 / 8)
    # the verify stage: partner docs' db partitions only
    verify = spark.read.parquet(sh_dir).where(F.col("db").isin([0, 1]))
    sh.assert_prune_ratio("real shingle store 2/8", verify, sh_dir, 2 * 2 / 8)


# ------------------------------------------------- baseline JPEG codec


def test_jpeg_general_coefficients_match_direct_idct():
    """The JPEG decoder's general entropy path (nonzero ACs, zero runs,
    ZRL, EOB mid-block, non-trivial quant table, DC prediction across
    blocks) must reproduce an INDEPENDENT direct-form IDCT of the same
    coefficients — the decoder uses the separable matrix form, the
    reference below the textbook double sum, so a transform bug can't
    hide in shared code."""
    import math
    import random

    import numpy as np

    from apache_hive_1_2_2_src_spark.extensions import multimodal as mm

    rng = random.Random(99)
    quant = [1 + (i * 7) % 9 for i in range(64)]  # non-trivial table
    w, h = 21, 14  # 3x2 MCU grid, cropped
    bw, bh = (w + 7) // 8, (h + 7) // 8
    blocks = {}
    for by in range(bh):
        for bx in range(bw):
            coefs = [0] * 64
            coefs[0] = rng.randrange(-200, 201)
            for pos in sorted(rng.sample(range(1, 64), 4)):
                coefs[pos] = rng.randrange(-40, 41) or 7
            blocks[(bx, by)] = coefs
    # deterministic corner cases in designated blocks:
    # (0,0): run of 19 zeros => ZRL + run-3 symbol; last coef at 63 => NO
    # EOB emitted for this block (the k==64 exit path)
    blocks[(0, 0)] = [0] * 64
    blocks[(0, 0)][0] = 77
    blocks[(0, 0)][1] = 9
    blocks[(0, 0)][21] = -7
    blocks[(0, 0)][63] = 5
    # (1,1): DC-only block mid-stream (immediate EOB, DC diff negative)
    blocks[(1, 1)] = [-130] + [0] * 63
    buf = mm.encode_jpeg_gray(w, h, lambda bx, by: blocks[(bx, by)], quant=quant)
    dw, dh, got_sum = mm.decode_jpeg_gray(buf)
    assert (dw, dh) == (w, h)

    # independent direct-form IDCT reference
    def c(u):
        return 1 / math.sqrt(2) if u == 0 else 1.0

    img = np.zeros((bh * 8, bw * 8))
    for (bx, by), coefs in blocks.items():
        s = np.zeros((8, 8))
        for i, (r_, c_) in enumerate(mm._JPEG_ZIGZAG):
            s[r_, c_] = coefs[i] * quant[i]
        for y in range(8):
            for x in range(8):
                acc = 0.0
                for u in range(8):
                    for v in range(8):
                        acc += (
                            c(u) * c(v) * s[v, u]
                            * math.cos((2 * x + 1) * u * math.pi / 16)
                            * math.cos((2 * y + 1) * v * math.pi / 16)
                        )
                img[by * 8 + y, bx * 8 + x] = acc / 4 + 128
    expect = int(np.clip(np.round(img), 0, 255)[:h, :w].sum())
    assert got_sum == expect


def test_jpeg_decoder_refuses_unsupported_streams():
    """Progressive/multi-component/garbage streams refuse loudly."""
    import struct

    import pytest

    from apache_hive_1_2_2_src_spark.extensions import multimodal as mm

    with pytest.raises(ValueError, match="missing SOI"):
        mm.decode_jpeg_gray(b"\x00\x01")
    good = mm.encode_jpeg_gray(8, 8, mm._jpeg_fixture_block(3))
    # flip SOF0 -> SOF2 (progressive)
    prog = good.replace(b"\xff\xc0", b"\xff\xc2", 1)
    with pytest.raises(ValueError, match="baseline SOF0"):
        mm.decode_jpeg_gray(prog)


def test_full_layout_delta_writer_null_partition(spark, tmp_path):
    """A NULL partition value routes to __HIVE_DEFAULT_PARTITION__ inside
    the streamed delta tree (Hive's contract), and the partitioned ACID
    read surfaces it back as NULL."""
    import os

    from apache_hive_1_2_2_src_spark.operators.acid import (
        read_acid_table_partitioned,
    )
    from apache_hive_1_2_2_src_spark.streaming.windows import (
        write_partitioned_bucketed_delta,
    )

    n = 2
    tbl = str(tmp_path / "flnull")
    os.makedirs(tbl)
    rows = spark.createDataFrame(
        [("g0", 1, "a", 10, "U"), (None, 2, "b", 20, "U")],
        "pt string, k long, st string, p long, op string",
    )
    write_partitioned_bucketed_delta(rows, tbl, "pt", "k", n, 0)
    assert sorted(os.listdir(tbl)) == [
        "pt=__HIVE_DEFAULT_PARTITION__", "pt=g0",
    ]
    assert sorted(
        f
        for f in os.listdir(
            os.path.join(tbl, "pt=__HIVE_DEFAULT_PARTITION__", "delta_1_1")
        )
        if f.endswith("_0") and not f.startswith(".")
    ) == [f"{b:06d}_0" for b in range(n)]
    got = {
        (r.pt, r.k, r.p)
        for r in read_acid_table_partitioned(spark, tbl, "pt").collect()
    }
    assert got == {("g0", 1, 10), (None, 2, 20)}
