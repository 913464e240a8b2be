"""Round-16 additions: the hot-landmark df cap is ACTIVE in the six
containment/temporal dedup plans (VERDICT r15 item 1). SCALE.md's r15
overlays measured the uncapped inverted-index self-join at 953x
(corpus-wide static frame) and ~449,000x (silence span) candidate blow-up;
these tests pin that the shipped plans carry the cap, that the cap sheds
exactly the hot bucket while keeping every content match, and that the
cap's window shows up in the executed plan.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from apache_hive_1_2_2_src_spark.extensions.dedup import (
    _LANDMARK_DF_CAP,
    _cap_hot_landmarks,
    _containment_pairs,
)
from apache_hive_1_2_2_src_spark.plans import plan_text


def _hot_overlay_frame(spark, n_hot_keys: int = 80):
    """A landmark corpus with one corpus-wide hot landmark: keys 1 and 2
    share six aligned content landmarks (key 2 shifted +3); ``n_hot_keys``
    filler keys carry ONLY the hot landmark plus one unique noise
    landmark. Every key also carries 'HOT', so df('HOT') = n_hot_keys + 2
    > cap."""
    rows = []
    for t in range(6):
        rows.append((1, 100, "orig", t, f"c{t}"))
        rows.append((2, 200, "clip", t + 3, f"c{t}"))
    rows.append((1, 100, "orig", 90, "HOT"))
    rows.append((2, 200, "clip", 91, "HOT"))
    for k in range(n_hot_keys):
        rows.append((1000 + k, 1000 + k, "orig", 0, "HOT"))
        rows.append((1000 + k, 1000 + k, "orig", 1, f"noise{k}"))
    return spark.createDataFrame(
        rows, "key bigint, doc_id bigint, variant string, t int, shingle string"
    )


def test_cap_drops_hot_bucket_keeps_content(spark):
    sh = _hot_overlay_frame(spark)
    kept = _containment_pairs(sh, ("t",), ("off",)).collect()
    # The ONLY surviving pair is the content pair — every hot-only pair
    # (C(82, 2) of them uncapped) is shed with the hot bucket.
    assert len(kept) == 1
    r = kept[0]
    assert (r["ka"], r["kb"]) == (1, 2)
    # All six content landmarks matched; denominators count informative
    # (cool) landmarks only, so the pair is a full neardup at offset -3.
    assert (r["n_match"], r["nsa"], r["nsb"]) == (6, 6, 6)
    assert r["best_off"] == -3
    assert r["relation"] == "neardup"


def test_uncapped_overlay_reproduces_the_blowup(spark):
    # Control: with the cap lifted, the same corpus floods — every pair of
    # hot-only keys shares 'HOT' (n_match=1, nsa=nsb=2 clears the
    # one-sided rule), exactly the measured SCALE.md failure shape.
    sh = _hot_overlay_frame(spark)
    kept = _containment_pairs(sh, ("t",), ("off",), cap=10**9)
    n = kept.count()
    assert n > 3000  # C(80,2) hot-only pairs + hot<->content pairs


def test_cap_window_in_containment_plan(spark):
    sh = _hot_overlay_frame(spark)
    # The df cap is one window count partitioned by the landmark. Since
    # r17 the capped frame is localCheckpoint-ed (ADVICE r16: materialize
    # the window ONCE instead of recomputing it for nsh plus both
    # self-join branches), so the window executes at build time and the
    # downstream plan reads the checkpointed RDD: pin the window in the
    # cap stage's own plan — the exact frame _containment_pairs
    # checkpoints — and the checkpoint scan in the verdict plan.
    p_cap = plan_text(_cap_hot_landmarks(sh))
    assert "windowspecdefinition(shingle" in p_cap
    p = plan_text(_containment_pairs(sh, ("t",), ("off",)))
    assert "windowspecdefinition(shingle" not in p  # moved into build time
    assert "ExistingRDD" in p  # joins read the materialized capped frame


def test_cap_helper_threshold_boundary(spark):
    # df == cap stays; df == cap + 1 drops.
    rows = [(k, "at_cap") for k in range(_LANDMARK_DF_CAP)] + [
        (k, "over_cap") for k in range(_LANDMARK_DF_CAP + 1)
    ]
    df = spark.createDataFrame(rows, "key bigint, shingle string")
    out = _cap_hot_landmarks(df)
    got = {r["shingle"] for r in out.select("shingle").distinct().collect()}
    assert got == {"at_cap"}


def test_registered_audio_containment_plan_carries_cap(spark, registry):
    from tests.conftest import SF_DIR

    df = registry["dedup_audio_contained"].build(spark, SF_DIR)
    # build() runs the recall pins (67/40/29 with the cap active) and
    # returns the verdict frame. Since r17 the capped landmark frame is
    # localCheckpoint-ed inside _containment_pairs (window materialized
    # once), so the verdict plan reads the checkpointed RDD rather than
    # re-deriving the window: pin the checkpoint scan and the absence of
    # a recomputed cap window. That the cap EXECUTED is pinned by the
    # hash oracle (its QUALIFY df<=64 stanza) and the recall pins.
    p = plan_text(df)
    assert "ExistingRDD" in p
    assert "windowspecdefinition(shingle" not in p


def test_fixture_variant_counts_match_oracle_formulas():
    # The DuckDB oracles carry SQL mirrors of the variant-membership
    # predicates (doc_id % 3 = 0, ...); they cannot share the Python
    # lambdas, so pin the implied counts HERE (magic numbers belong in
    # tests, not registered query bodies — the queries derive theirs
    # from fixture_variant_count).
    from apache_hive_1_2_2_src_spark.extensions.multimodal import (
        fixture_variant_count,
    )

    expected = {
        ("phash", "reenc"): 67, ("phash", "pert"): 24,
        ("audiofp", "amp"): 67, ("audiofp", "junk"): 40,
        ("audiofp", "noise"): 29,
        ("video", "reenc"): 67, ("video", "trim"): 50,
        ("vtemporal", "shift"): 50, ("vtemporal", "loop"): 34,
        ("vclip", "clip"): 67, ("vclip", "mut"): 40,
        ("vclip", "steal"): 29,
        ("aclip", "clip"): 67, ("aclip", "mut"): 40,
        ("aclip", "steal"): 29,
        ("crop", "crop"): 67, ("crop", "mut"): 40,
        ("crop", "steal"): 29,
    }
    for (corpus, variant), n in expected.items():
        assert fixture_variant_count(corpus, variant) == n, (corpus, variant)


def test_native_decoder_seam_dispatches_and_byte_matches():
    # A fake "native" decoder (pure-Python codec + call counter) must
    # take the dispatch path and produce byte-identical downstream
    # results — the contract a real libjpeg-turbo/libvips swap must hold.
    from apache_hive_1_2_2_src_spark.extensions import multimodal as mm

    w, h = mm._bmp_fixture_dims(7)
    bmp = mm.encode_bmp24(w, h, mm._phash_fixture_pixel(7))
    wav = mm.encode_wav_pcm16(
        8000, 1, [(mm._wav_fixture_sample(7, j, 0),) for j in range(40)]
    )
    gif = mm.encode_gif89a_anim(
        w, h, mm._gif_palette, lambda t: mm._vid_fixture_index(7, t), 4
    )

    base_phash = mm.phash64_bands(bmp)
    base_wav = mm._wav_samples(wav)
    base_frames = mm.video_frame_phashes(gif)

    calls = {"bmp": 0, "wav": 0, "gif_frames": 0}

    def fake_bmp(buf):
        calls["bmp"] += 1
        return mm._bmp_pixels(buf)

    def fake_wav(buf):
        calls["wav"] += 1
        import struct as s

        n = (len(buf) - 44) // 2
        rate, ch = 8000, 1
        return rate, ch, s.unpack(f"<{n}h", buf[44 : 44 + 2 * n])

    def fake_gif_frames(buf):
        calls["gif_frames"] += 1
        mm.unregister_native_decoder("gif_frames")
        try:
            return mm.decode_gif_frames(buf)
        finally:
            mm.register_native_decoder("gif_frames", fake_gif_frames)

    try:
        mm.register_native_decoder("bmp", fake_bmp)
        mm.register_native_decoder("wav", fake_wav)
        mm.register_native_decoder("gif_frames", fake_gif_frames)
        assert mm.phash64_bands(bmp) == base_phash
        assert mm._wav_samples(wav) == base_wav
        assert mm.video_frame_phashes(gif) == base_frames
        assert calls == {"bmp": 1, "wav": 1, "gif_frames": 1}
    finally:
        for fmt in ("bmp", "wav", "gif_frames"):
            mm.unregister_native_decoder(fmt)


def test_native_decoder_env_hook_loads_module(tmp_path, monkeypatch):
    # The cluster path: SPARK_GRAFT_NATIVE_DECODERS names a module:attr
    # hook that runs at import in every Python process (executors too).
    import sys

    from apache_hive_1_2_2_src_spark.extensions import multimodal as mm

    mod = tmp_path / "fake_native_codecs.py"
    mod.write_text(
        "def install(register):\n"
        "    register('ppm', lambda buf: ('fake', 'native', 'ppm'))\n"
    )
    monkeypatch.syspath_prepend(str(tmp_path))
    monkeypatch.setenv(
        "SPARK_GRAFT_NATIVE_DECODERS", "fake_native_codecs:install"
    )
    try:
        mm._load_native_decoders_from_env()
        assert mm.image_pixels(b"P6 1 1 255 \x00\x00\x00") == (
            "fake", "native", "ppm",
        )
    finally:
        mm.unregister_native_decoder("ppm")
        sys.modules.pop("fake_native_codecs", None)


def test_streaming_counts_join_never_forces_counts_broadcast(spark, tmp_path):
    # The streaming containment store keeps ONE counts row per key
    # forever, so at corpus scale the counts frame outgrows any broadcast
    # threshold. The probe's verdict join must not hard-code a broadcast
    # of the counts side: with broadcasting disabled (emulating
    # corpus-scale stats) the same join shape must compile AND execute as
    # a shuffle join, and the production code must carry no F.broadcast
    # hint on the counts path.
    import inspect

    from pyspark.sql import functions as F2

    from apache_hive_1_2_2_src_spark.streaming import windows as sw

    src = inspect.getsource(sw._landmark_probe_contained)
    assert "broadcast" not in src  # stats-driven join choice only

    counts_path = str(tmp_path / "counts_overlay")
    # 10M keys: the 100x-and-then-some key-count overlay (fixture corpus
    # stages ~800 keys; a year of drops at production rates lands here)
    spark.range(10_000_000).select(
        F2.col("id").alias("key"), (F2.col("id") % 37 + 1).alias("n_sh")
    ).write.mode("overwrite").parquet(counts_path)
    batch = spark.range(1000).select(
        (F2.col("id") * 7919 % 10_000_000).alias("ka"),
        F2.col("id").alias("n_match"),
    )
    all_counts = spark.read.parquet(counts_path)
    joined = batch.join(
        all_counts.select(F2.col("key").alias("ka"), F2.col("n_sh").alias("nsa")),
        "ka",
    ).filter(2 * F2.col("n_match") >= F2.col("nsa"))
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        p = plan_text(joined)
        assert "BroadcastExchange" not in p
        assert "SortMergeJoin" in p or "ShuffledHashJoin" in p
        # and it actually runs distributed at 10M counts rows
        assert joined.count() > 0
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)


def test_opq_rotation_orthonormal_and_dot_preserving(spark):
    # The sign-twisted Hadamard matrix must be exactly orthonormal
    # (every entry +-0.125, an exact binary float) and therefore
    # preserve dot products — the property that makes the OPQ query's
    # exact-search geometry invariant under the rotation.
    import random

    from apache_hive_1_2_2_src_spark.extensions.similarity import (
        _OPQ_DIM,
        _dot,
        opq_rotate,
    )

    def coef(u, v):
        return (1 - 2 * (((u & v).bit_count() + v.bit_count()) % 2)) * 0.125

    for a in range(_OPQ_DIM):
        for b in range(a, _OPQ_DIM):
            s = sum(coef(a, v) * coef(b, v) for v in range(_OPQ_DIM))
            assert abs(s - (1.0 if a == b else 0.0)) < 1e-12

    rng = random.Random(16)
    x = [rng.uniform(-1, 1) for _ in range(_OPQ_DIM)]
    y = [rng.uniform(-1, 1) for _ in range(_OPQ_DIM)]
    df = spark.createDataFrame(
        [(x, y)], "x array<float>, y array<float>"
    ).select(
        _dot(F.col("x"), F.col("y")).alias("d"),
        _dot(opq_rotate(F.col("x")), opq_rotate(F.col("y"))).alias("rd"),
    )
    r = df.collect()[0]
    assert abs(r["d"] - r["rd"]) < 1e-9


def _concentrated_corpus(spark, n=500):
    import random

    rng = random.Random(42)
    centers = [[rng.uniform(-1, 1) for _ in range(16)] for _ in range(32)]
    rows = []
    for i in range(n):
        c = centers[rng.randrange(32)]
        sig = [v + rng.gauss(0, 0.08) for v in c]
        noise = [rng.gauss(0, 0.01) for _ in range(48)]
        rows.append((i, [float(x) for x in sig + noise]))
    return spark.createDataFrame(rows, "vec_id bigint, embedding array<float>")


def test_opq_learned_rotation_matrix_properties(spark):
    # Orthonormal rows (rotation, not just projection) and balanced
    # eigen-allocation: 16 directions per subspace bucket.
    import numpy as np

    from apache_hive_1_2_2_src_spark.extensions.similarity import (
        opq_learned_rotation,
    )

    e = _concentrated_corpus(spark).cache()
    e.count()
    r = np.array(opq_learned_rotation(e))
    assert r.shape == (64, 64)
    assert np.abs(r @ r.T - np.eye(64)).max() < 1e-9


def test_opq_rotations_rescue_concentrated_corpus(spark):
    # The measured SCALE.md r16 story, pinned with robust margins: on a
    # corpus whose signal lives in one PQ subspace, plain PQ recall@3 is
    # ZERO and both rotations recover it (structured 0.133, learned
    # 0.100 on this container — the pin asserts only the inequalities so
    # a different LAPACK build cannot flake it).
    from pyspark.sql.window import Window

    from apache_hive_1_2_2_src_spark.extensions.similarity import (
        _dot,
        _pq_adc_report,
        apply_rotation,
        opq_learned_rotation,
        opq_rotate,
    )

    e = _concentrated_corpus(spark).cache()
    e.count()
    q = e.filter(F.col("vec_id") >= 490).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("qe")
    )
    exact = (
        q.crossJoin(e.select(F.col("vec_id").alias("cand_id"), "embedding"))
        .filter(F.col("cand_id") != F.col("query_id"))
        .select(
            "query_id", "cand_id",
            _dot(F.col("qe"), F.col("embedding")).alias("d"),
        )
        .withColumn(
            "rk",
            F.row_number().over(
                Window.partitionBy("query_id").orderBy(
                    F.col("d").desc(), "cand_id"
                )
            ),
        )
        .filter(F.col("rk") <= 3)
        .select("query_id", "cand_id")
    )
    exact_set = {(r["query_id"], r["cand_id"]) for r in exact.collect()}

    def recall(df):
        got = {(r["query_id"], r["cand_id"]) for r in df.collect()}
        return len(got & exact_set) / len(exact_set)

    plain = recall(_pq_adc_report(e))
    structured = recall(
        _pq_adc_report(
            e.select("vec_id", opq_rotate(F.col("embedding")).alias("embedding"))
        )
    )
    learned = recall(_pq_adc_report(apply_rotation(e, opq_learned_rotation(e))))
    assert plain == 0.0
    assert structured > plain
    assert learned > plain


def test_streaming_cap_drops_hot_silence_keeps_content(spark, tmp_path):
    # The streaming form of the hot-landmark cap, exercised on a corpus
    # that actually HAS a hot landmark (the registered fixtures are
    # silence-free, so there the cap filter never drops a row): 90
    # tracks all open with a silence span (the corpus-wide '0:0:0'
    # 3-gram, df=360 >> 64); tracks 0 and 1 share real content at a
    # 2-frame offset; every other track is unique. Uncapped, every one
    # of the C(90,2)=4005 pairs clears the one-sided rule on silence
    # votes alone; capped, exactly the content pair survives — and the
    # landmark STORE must still retain the hot rows (later batches need
    # true prefix df).
    import glob

    from apache_hive_1_2_2_src_spark.extensions.multimodal import (
        encode_wav_pcm16,
    )
    from apache_hive_1_2_2_src_spark.streaming.windows import (
        LAST_LMK_STORE,
        _landmark_probe_contained,
    )

    def wav(samples):
        return encode_wav_pcm16(8000, 1, [(s,) for s in samples])

    silence = [0] * 12  # 6 zero-energy frames -> four '0:0:0' shingles
    content = [100 + j for j in range(16)]  # 8 shared content frames
    rows = []
    for k in range(90):
        if k == 0:
            samples = silence + content
        elif k == 1:
            samples = silence + [9001, 9002, 9003, 9004] + content
        else:
            samples = silence + [1000 + 17 * k + j for j in range(16)]
        rows.append((k, "orig", bytearray(wav(samples))))
    pay_path = str(tmp_path / "hot_payloads")
    spark.createDataFrame(
        rows, "doc_id bigint, variant string, payload binary"
    ).coalesce(1).write.mode("overwrite").parquet(pay_path)

    out = _landmark_probe_contained(
        spark, "unused", n_batches=3, payloads_path=pay_path, n_docs=90
    ).collect()
    assert len(out) == 1, out
    r = out[0]
    assert (r["ka"], r["kb"]) == (0, 10)  # key = doc_id * 10 + vcode
    # 6 shared content 3-grams, all voting offset a.t - b.t = -2;
    # cool-landmark denominators: 8 (track 0) vs 10 (track 1)
    assert (r["n_match"], r["best_off"]) == (6, -2)
    assert r["relation"] == "neardup" and not r["full"]
    # the store keeps the hot rows: 4 silence shingles x 90 tracks
    store_files = glob.glob(LAST_LMK_STORE["store"] + "/epoch=*/pb=*/*.parquet")
    assert store_files
    n_hot = (
        spark.read.parquet(LAST_LMK_STORE["store"])
        .filter(F.col("shingle") == "0:0:0")
        .count()
    )
    assert n_hot == 360
