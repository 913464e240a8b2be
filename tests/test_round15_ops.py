"""Round-15 operator pins: pHash invariance classes, banding pigeonhole,
and the concurrent-writer snapshot matrix (lock tests live in
test_acid_dirs.py)."""

from __future__ import annotations

from pyspark.sql import functions as F

from apache_hive_1_2_2_src_spark.extensions.multimodal import (
    _bmp_fixture_dims,
    _phash_fixture_pixel,
    _phash_pert_pixel,
    encode_bmp24,
    encode_png,
    phash64_bands,
)


def test_phash_reencode_invariance_and_band_range():
    """The same pixels in BMP vs PNG must hash identically (the
    duplicate-after-reencode class), and every band is 16-bit."""
    for d in (0, 3, 9, 33, 99, 198):
        w, h = _bmp_fixture_dims(d)
        pix = _phash_fixture_pixel(d)
        a = phash64_bands(encode_bmp24(w, h, pix))
        b = phash64_bands(
            encode_png(w, h, pix, filter_of=lambda y, d=d: (d + y) % 5)
        )
        assert a == b
        assert all(0 <= x < 1 << 16 for x in a)
    # Bit count is threshold-rank-driven, NOT forced to ~32: coefficient
    # TIES at the threshold value get bit 0 (strict >), and structured
    # fixtures tie heavily (d=7 has only 7 strictly-greater coefficients).
    # Pin the snapshot — a rounding or tie-handling change moves it.
    d = 7
    w, h = _bmp_fixture_dims(d)
    bits = sum(
        bin(x).count("1")
        for x in phash64_bands(encode_bmp24(w, h, _phash_fixture_pixel(d)))
    )
    assert bits == 7


def test_phash_unsampled_edit_invisible_sampled_edit_visible():
    """The pert edit (last column, width>=9) is provably outside the 8x8
    nearest-neighbor grid -> identical hash; the SAME edit applied to a
    column the grid does sample must change the hash — proving the
    invariance comes from sampling geometry, not a broken hash."""
    for d in (5, 45, 70, 135, 180):
        assert d % 5 == 0 and d % 13 >= 5
        w, h = _bmp_fixture_dims(d)
        assert w >= 9
        orig = phash64_bands(encode_bmp24(w, h, _phash_fixture_pixel(d)))
        pert = phash64_bands(encode_bmp24(w, h, _phash_pert_pixel(d, w)))
        assert orig == pert

    d = 45
    w, h = _bmp_fixture_dims(d)
    base = _phash_fixture_pixel(d)

    def sampled_edit(x, y):
        # column 0 is always sampled (tx=0 -> 0*w//8 = 0); whiting it
        # out shifts the spectrum far past any threshold tie
        return (255, 255, 255) if x == 0 else base(x, y)

    orig = phash64_bands(encode_bmp24(w, h, base))
    edited = phash64_bands(encode_bmp24(w, h, sampled_edit))
    assert orig != edited


def test_phash_banding_pigeonhole():
    """Any two hashes within Hamming distance 3 share at least one of
    the four interleaved bands (the candidate-generation guarantee)."""
    d = 12
    w, h = _bmp_fixture_dims(d)
    a = list(phash64_bands(encode_bmp24(w, h, _phash_fixture_pixel(d))))
    # flip 3 bits spread across positions 5, 21, 40 (bands 1, 1, 0)
    for p in (5, 21, 40):
        a_band, a_pos = p % 4, p // 4
        a[a_band] ^= 1 << a_pos
    orig = phash64_bands(encode_bmp24(w, h, _phash_fixture_pixel(d)))
    shared = sum(1 for x, y in zip(orig, a) if x == y)
    ham = sum(bin(x ^ y).count("1") for x, y in zip(orig, a))
    assert ham == 3 and shared >= 1


def test_two_level_ivf_deepening_checkpoint_composes(spark):
    """VERDICT r14 ask #5: the in-chain `checkpoint_every` dial must
    compose with the per-cell sub-chains — at iters=8 the checkpointed
    form's SEARCH plan must stay in the graded form's size class (the
    chains are checkpoint-rooted, so deeper training must not leak plan
    nodes into the search), and the 2-iteration results must be
    bit-identical with and without the dial."""
    from apache_hive_1_2_2_src_spark.extensions.similarity import (
        ivf_two_level_topk,
    )
    from apache_hive_1_2_2_src_spark.plans import plan_text
    from apache_hive_1_2_2_src_spark.tables import load_table
    from tests.conftest import SF_DIR

    e = load_table(spark, SF_DIR, "embeddings")

    graded = ivf_two_level_topk(e)  # iters=2, no dial (the graded form)
    deep = ivf_two_level_topk(e, iters=8, checkpoint_every=4)
    p_graded = plan_text(graded)
    p_deep = plan_text(deep)
    n_graded, n_deep = len(p_graded.splitlines()), len(p_deep.splitlines())
    # checkpoint-rooted: 4x the training depth must NOT grow the search
    # plan materially (r14 audit: 229 lines at sf0.1; allow slack for
    # scan-count differences, forbid the O(iters) leak class)
    assert n_deep <= n_graded * 1.3, (n_graded, n_deep)
    assert "CartesianProduct" not in p_deep

    # the dial is value-neutral: same iters, with/without checkpoints
    dialed = ivf_two_level_topk(e, iters=2, checkpoint_every=1)
    assert sorted(map(tuple, graded.collect())) == sorted(
        map(tuple, dialed.collect())
    )


def test_audio_fingerprint_invariance_classes():
    """Delta-sign energy fingerprint: invariant to uniform volume scaling
    and container re-encoding; a real waveform edit stays within the
    banded pigeonhole's guaranteed Hamming-3 reach."""
    from apache_hive_1_2_2_src_spark.extensions.multimodal import (
        _wav_fixture,
        _wav_fixture_sample,
        encode_wav_pcm16,
        wav_fingerprint_bands,
        wav_with_junk_chunk,
    )

    for d in (0, 15, 45, 105, 196):
        rate, ch, nf = _wav_fixture(d)
        frames = [
            tuple(_wav_fixture_sample(d, j, c) for c in range(ch))
            for j in range(nf)
        ]
        buf = encode_wav_pcm16(rate, ch, frames)
        orig = wav_fingerprint_bands(buf)
        assert all(0 <= x < 1 << 8 for x in orig)
        amp = wav_fingerprint_bands(
            encode_wav_pcm16(rate, ch, [tuple(2 * s for s in f) for f in frames])
        )
        junk = wav_fingerprint_bands(wav_with_junk_chunk(buf))
        assert orig == amp == junk
        noisy = wav_fingerprint_bands(
            encode_wav_pcm16(
                rate, ch,
                [
                    (f[0] + 3 if j % 7 == 0 else f[0],) + f[1:]
                    for j, f in enumerate(frames)
                ],
            )
        )
        ham = sum(bin(a ^ b).count("1") for a, b in zip(orig, noisy))
        assert ham <= 3  # within the 4-band pigeonhole guarantee
        assert any(a == b for a, b in zip(orig, noisy))

    # negation flips no ENERGY (s^2) -> also invariant; a genuinely
    # different doc is not
    d = 15
    rate, ch, nf = _wav_fixture(d)
    frames = [
        tuple(_wav_fixture_sample(d, j, c) for c in range(ch))
        for j in range(nf)
    ]
    neg = wav_fingerprint_bands(
        encode_wav_pcm16(rate, ch, [tuple(-s for s in f) for f in frames])
    )
    assert neg == wav_fingerprint_bands(encode_wav_pcm16(rate, ch, frames))


def test_phash_cluster_keeper_collapses_reencodes(spark):
    """Cluster formation over the pHash pair graph: a doc's PNG re-encode
    and grid-invisible edit must land in the SAME component as the
    original, with the original (lowest key) as keeper."""
    from apache_hive_1_2_2_src_spark.extensions.dedup import (
        _phash_pair_frame,
        connected_component_labels,
    )
    from tests.conftest import SF_DIR

    pairs = _phash_pair_frame(spark, SF_DIR).select(
        F.col("ka").alias("doc_a"), F.col("kb").alias("doc_b")
    )
    labels = {
        r["n"]: r["lbl"] for r in connected_component_labels(pairs).collect()
    }
    # doc 45 stages all three variants (45%3==0, 45%5==0, 45%13>=5)
    d = 45
    keys = [d * 10, d * 10 + 1, d * 10 + 2]
    assert all(k in labels for k in keys)
    assert len({labels[k] for k in keys}) == 1
    assert labels[keys[0]] <= keys[0]  # keeper label is a minimum key


def test_gif_anim_multiframe_decode_and_invariances():
    """decode_gif_frames walks GCE/app/comment extensions and decodes
    every image block; comment splice is frame-invisible; trim drops
    exactly the last frame; malformed shapes fail loudly."""
    import pytest as _pytest

    from apache_hive_1_2_2_src_spark.extensions.multimodal import (
        _bmp_fixture_dims,
        _gif_palette,
        _vid_fixture_index,
        _vid_fixture_nframes,
        decode_gif_frames,
        encode_gif89a_anim,
        gif_with_comment,
        video_frame_phashes,
    )

    d = 7
    w, h = _bmp_fixture_dims(d)
    nf = _vid_fixture_nframes(d)
    buf = encode_gif89a_anim(
        w, h, _gif_palette, lambda t: _vid_fixture_index(d, t), nf
    )
    sw, sh, frames = decode_gif_frames(buf)
    assert (sw, sh, len(frames)) == (w, h, nf)
    # decoded pixels replay the palette-mapped index formula exactly
    idx0 = _vid_fixture_index(d, 0)
    for x, y in ((0, 0), (w - 1, h - 1), (w // 2, h // 2)):
        assert frames[0](x, y) == _gif_palette(idx0(x, y))

    hs = video_frame_phashes(buf)
    assert hs == video_frame_phashes(gif_with_comment(buf))
    trimmed = encode_gif89a_anim(
        w, h, _gif_palette, lambda t: _vid_fixture_index(d, t), nf - 1
    )
    assert video_frame_phashes(trimmed) == hs[:-1]

    # fail-loud shapes: truncation mid-stream and a bogus block byte
    with _pytest.raises((ValueError, IndexError)):
        decode_gif_frames(buf[: len(buf) // 2])
    with _pytest.raises(ValueError):
        decode_gif_frames(buf[:-1] + b"\x7f")  # trailer replaced by junk


def test_phash_cross_container_equality_bmp_ppm_png_gif():
    """image_pixels now dispatches all four still containers; the same
    pixels must hash identically through BMP, PPM, and PNG (lossless
    RGB), and a palette image hashes identically as GIF vs the
    palette-expanded BMP."""
    from apache_hive_1_2_2_src_spark.extensions.multimodal import (
        _bmp_fixture_dims,
        _gif_palette,
        _phash_fixture_pixel,
        _vid_fixture_index,
        encode_bmp24,
        encode_gif87a,
        encode_png,
        encode_ppm,
        phash64_bands,
    )

    for d in (2, 77, 190):
        w, h = _bmp_fixture_dims(d)
        pix = _phash_fixture_pixel(d)
        hashes = {
            phash64_bands(encode_bmp24(w, h, pix)),
            phash64_bands(encode_ppm(w, h, pix)),
            phash64_bands(encode_png(w, h, pix, filter_of=lambda y: y % 5)),
        }
        assert len(hashes) == 1, (d, hashes)

    d = 11
    w, h = _bmp_fixture_dims(d)
    idx = _vid_fixture_index(d, 0)
    gif = encode_gif87a(w, h, _gif_palette, idx)
    bmp = encode_bmp24(w, h, lambda x, y: _gif_palette(idx(x, y)))
    assert phash64_bands(gif) == phash64_bands(bmp)


def test_gif_anim_decoder_fuzz_never_returns_wrong_data():
    """The multi-frame walk inherits the single-frame fuzz contract:
    malformed animated GIFs raise (or, for don't-care-field flips,
    return differing pixels) — never crash the process, loop forever,
    or silently return the wrong frame count."""
    import random
    from struct import error as struct_error

    import pytest as _pytest

    from apache_hive_1_2_2_src_spark.extensions.multimodal import (
        _gif_palette,
        _vid_fixture_index,
        decode_gif_frames,
        encode_gif89a_anim,
    )

    good = encode_gif89a_anim(
        9, 5, _gif_palette, lambda t: _vid_fixture_index(3, t), 5
    )
    w0, h0, frames0 = decode_gif_frames(good)
    assert (w0, h0, len(frames0)) == (9, 5, 5)

    for cut in (20, len(good) // 3, len(good) // 2, len(good) - 3):
        with _pytest.raises((ValueError, IndexError)):
            decode_gif_frames(good[:cut])

    rng = random.Random(15)
    raised = 0
    for _ in range(80):
        b = bytearray(good)
        i = rng.randrange(6, len(b))
        b[i] ^= 1 << rng.randrange(8)
        try:
            w, h, frames = decode_gif_frames(bytes(b))
            # a surviving flip must still decode a consistent canvas
            assert w >= 1 and h >= 1 and len(frames) >= 1
            frames[0](0, 0)
        except (ValueError, IndexError, struct_error):
            raised += 1
    assert raised > 0
    w1, h1, frames1 = decode_gif_frames(good)  # inputs never mutated
    assert (w1, h1, len(frames1)) == (9, 5, 5)


def test_video_clip_containment_hash_slices():
    """A mid-slice clip's frame-hash sequence IS the matching slice of
    the original's (pixels re-encode through a fresh GIF, so this pins
    the whole encode->decode->pHash chain is position-invariant), the
    mutated slice differs from the original EXACTLY at its middle
    frame, and the stolen clip matches the NEIGHBOR doc's frames 2..5
    — the three containment classes the one-sided rule must find."""
    from apache_hive_1_2_2_src_spark.extensions.multimodal import (
        _gif_palette,
        _vid_fixture_index,
        encode_gif89a_anim,
        video_frame_phashes,
    )

    for i in (6, 105):  # doc 105: clip+mut both exist (105 % 15 == 0)
        w, h = _bmp_fixture_dims(i)
        nf = 8 + i % 5
        orig = video_frame_phashes(
            encode_gif89a_anim(
                w, h, _gif_palette,
                lambda t, i=i: _vid_fixture_index(i, t), nf,
            )
        )
        clip = video_frame_phashes(
            encode_gif89a_anim(
                w, h, _gif_palette,
                lambda t, i=i: _vid_fixture_index(i, t + 3), 4,
            )
        )
        assert clip == orig[3:7]
        mut = video_frame_phashes(
            encode_gif89a_anim(
                w, h, _gif_palette,
                lambda t, i=i: _vid_fixture_index(
                    i, 53 if t == 2 else t + 1
                ),
                5,
            )
        )
        assert mut[0] == orig[1] and mut[1] == orig[2]
        assert mut[2] != orig[3]  # the replaced middle frame
        assert mut[3] == orig[4] and mut[4] == orig[5]

    # cross-doc steal: doc 7 carries frames 2..5 of doc 8's stream
    sw, sh = _bmp_fixture_dims(8)
    neighbor = video_frame_phashes(
        encode_gif89a_anim(
            sw, sh, _gif_palette,
            lambda t: _vid_fixture_index(8, t), 8 + 8 % 5,
        )
    )
    steal = video_frame_phashes(
        encode_gif89a_anim(
            sw, sh, _gif_palette,
            lambda t: _vid_fixture_index(8, t + 2), 4,
        )
    )
    assert steal == neighbor[2:6]


def test_show_locks_fifo_states_match_sql_rule():
    """The SHOW LOCKS fixture's grant states through the real lock
    manager: readers ahead of an X are granted, the X waits, a late
    reader queues behind the waiting X (no barging), shared writers
    coexist, and a first-arrived X holds its resource exclusively. The
    registered query re-derives the same states declaratively and
    asserts agreement; this pin keeps the fixture's expected states
    honest if either side changes."""
    from apache_hive_1_2_2_src_spark.operators.acid import (
        _SHOW_LOCK_REQS,
        AcidLockManager,
    )

    lm = AcidLockManager()
    for txn, lt, res in _SHOW_LOCK_REQS:
        lm.request(txn, lt, res)
    got = [
        lm.state(txn, res)
        for txn, lt, res in _SHOW_LOCK_REQS
    ]
    assert got == [
        "ACQUIRED", "ACQUIRED", "WAITING", "WAITING",
        "ACQUIRED", "ACQUIRED", "ACQUIRED", "WAITING",
    ]
    # release the readers -> the X promotes -> the late reader still
    # waits behind the now-GRANTED X (promotion is FIFO, not a free-for-all)
    lm.release(10, "default.orders")
    lm.release(11, "default.orders")
    assert lm.state(12, "default.orders") == "ACQUIRED"
    assert lm.state(13, "default.orders") == "WAITING"


def test_audio_clip_energy_slices_and_quadratic_antialias():
    """The excerpt's frame-energy stream IS the matching slice of the
    original's (pins the encode->decode->energy chain is
    position-invariant), the corrupted excerpt differs EXACTLY at its
    middle frame, the stolen excerpt matches the neighbor's stream —
    and the quadratic fixture term actually breaks cross-doc
    shift-equivalence (the linear formula collapses: documented
    anti-lesson)."""
    from apache_hive_1_2_2_src_spark.extensions.multimodal import (
        _aclip_sample,
        encode_wav_pcm16,
        wav_energy_frames,
    )

    def frames(doc, ch):
        nf = 50 + doc % 101
        return wav_energy_frames(
            encode_wav_pcm16(
                8000, ch,
                [
                    tuple(_aclip_sample(doc, j, c) for c in range(ch))
                    for j in range(nf)
                ],
            )
        )

    for doc in (6, 105):  # 105 % 15 == 0: clip+mut coexist
        ch = 1 + doc % 2
        orig = frames(doc, ch)
        assert len(orig) == (50 + doc % 101) // 2
        clip = wav_energy_frames(
            encode_wav_pcm16(
                8000, 1, [(_aclip_sample(doc, 8 + j),) for j in range(24)]
            )
        )
        assert clip == orig[4:16]
        mut = wav_energy_frames(
            encode_wav_pcm16(
                8000, 1,
                [
                    (_aclip_sample(doc, 8 + j) + (7 if j in (10, 11) else 0),)
                    for j in range(24)
                ],
            )
        )
        assert mut[:5] == orig[4:9] and mut[6:] == orig[10:16]
        assert mut[5] != orig[9]
    # stolen excerpt = the neighbor's slice
    steal = wav_energy_frames(
        encode_wav_pcm16(
            8000, 1, [(_aclip_sample(8, 8 + j),) for j in range(24)]
        )
    )
    assert steal == frames(8, 1 + 8 % 2)[4:16]
    # the anti-alias property: no cross-doc slice of doc 3's stream
    # reproduces doc 6's excerpt energies (linear formulas DO collapse)
    other = frames(3, 1 + 3 % 2)
    clip6 = frames(6, 1 + 6 % 2)[4:16]
    for start in range(len(other) - len(clip6) + 1):
        assert other[start:start + len(clip6)] != clip6


def test_image_crop_block_signature_slices():
    """A crop's 2x2-block landmark grid IS the matching sub-grid of the
    original's (pins the BMP encode->decode->landmark chain is
    position-invariant in BOTH axes), the mutated crop differs at
    EXACTLY block (1,1), and the stolen crop matches the neighbor —
    the three spatial containment classes."""
    from apache_hive_1_2_2_src_spark.extensions.multimodal import (
        _crop_fixture_dims,
        _crop_fixture_pixel,
        encode_bmp24,
        image_block_signatures,
    )

    def orig_sigs(doc):
        w, h = _crop_fixture_dims(doc)
        return {
            (bx, by): sig
            for bx, by, sig in image_block_signatures(
                encode_bmp24(
                    w, h,
                    lambda x, y: (_crop_fixture_pixel(doc, x, y),) * 3,
                )
            )
        }

    def crop_sigs(src, mut):
        def pixel(x, y):
            v = _crop_fixture_pixel(src, 4 + x, 2 + y)
            if mut and x in (2, 3) and y in (2, 3):
                v = (v + 9) % 256
            return v, v, v

        return {
            (bx, by): sig
            for bx, by, sig in image_block_signatures(encode_bmp24(8, 6, pixel))
        }

    for doc in (6, 105):
        orig = orig_sigs(doc)
        crop = crop_sigs(doc, False)
        assert len(crop) == 12
        for (bx, by), sig in crop.items():
            assert sig == orig[(bx + 2, by + 1)]
        mut = crop_sigs(doc, True)
        diff = [k for k in crop if mut[k] != crop[k]]
        assert diff == [(1, 1)]
    steal = crop_sigs(8, False)
    neighbor = orig_sigs(8)
    for (bx, by), sig in steal.items():
        assert sig == neighbor[(bx + 2, by + 1)]


def test_streaming_landmark_containment_matches_batch_pins(spark):
    """The streaming containment landmark store (r16 registration
    candidate, coded+certified in r15): three ordered drops through a
    hash(shingle)-partitioned store must reproduce the batch query's
    one-sided kept set — the three recall classes land with the exact
    batch counts and offsets, cross-drop pairs included (doc 133's
    stolen excerpt arrives a drop before its doc-134 container), and
    the post-drain bytes-ratio gate below proves the store probes stay
    partition-pruned at the file level."""
    import os

    from apache_hive_1_2_2_src_spark.streaming.windows import (
        LAST_LMK_STORE,
        _landmark_probe_contained,
    )
    from tests.conftest import SF_DIR

    pairs = _landmark_probe_contained(spark, SF_DIR, n_batches=3).collect()
    VAR = {0: "orig", 1: "clip", 2: "mut", 3: "steal"}
    groups: dict = {}
    for r in pairs:
        da, db = r["ka"] // 10, r["kb"] // 10
        va, vb = VAR[r["ka"] % 10], VAR[r["kb"] % 10]
        pk = f"{va}-{vb}" if da == db else f"x:{va}-{vb}"
        g = groups.setdefault(
            (pk, r["relation"]), {"n": 0, "full": 0, "offs": set()}
        )
        g["n"] += 1
        g["full"] += bool(r["full"])
        g["offs"].add(r["best_off"])
    c = groups[("orig-clip", "contained")]
    assert (c["n"], c["full"], c["offs"]) == (67, 67, {4})
    m = groups[("orig-mut", "contained")]
    assert (m["n"], m["full"], m["offs"]) == (40, 0, {4})
    s = groups[("x:steal-orig", "contained")]
    assert (s["n"], s["full"], s["offs"]) == (29, 29, {-4})
    # the cross-drop straddle pair really exists (steal(133) -> orig(134))
    assert any(r["ka"] == 1333 and r["kb"] == 1340 for r in pairs)
    # the store on disk is genuinely band-partitioned
    store = LAST_LMK_STORE["store"]
    pbs = {
        d for e in os.listdir(store) if e.startswith("epoch=")
        for d in os.listdir(os.path.join(store, e)) if d.startswith("pb=")
    }
    assert len(pbs) == LAST_LMK_STORE["store_k"]
    # probe the REAL post-drain store the way a batch lookup does and
    # assert the bytes ratio stays pruned (the pHash-store gate applied
    # to the landmark store — catches a silently-unpartitioned store)
    import sys

    sys.path.insert(
        0, os.path.join(os.path.dirname(__file__), "..", "tools")
    )
    from pyspark.sql import functions as SF
    from scale_harness import assert_prune_ratio

    probe = spark.read.parquet(store).where(SF.col("pb").isin([0, 3]))
    assert_prune_ratio(
        "landmark store, 2-of-8 shingle probe", probe, store, 0.45
    )


def test_streaming_landmark_containment_batch_count_invariant(spark):
    """Draining the same corpus as ONE drop must yield the identical
    kept set as the three-drop drain (the pHash store's batch-count
    pin applied to the containment store): verdicts depend on the
    strictly-earlier key set, never on how arrivals were batched."""
    from apache_hive_1_2_2_src_spark.streaming.windows import (
        _landmark_probe_contained,
    )
    from tests.conftest import SF_DIR

    one = {
        (r["ka"], r["kb"], r["best_off"], r["n_match"], r["relation"],
         r["full"])
        for r in _landmark_probe_contained(spark, SF_DIR, n_batches=1)
        .collect()
    }
    three = {
        (r["ka"], r["kb"], r["best_off"], r["n_match"], r["relation"],
         r["full"])
        for r in _landmark_probe_contained(spark, SF_DIR, n_batches=3)
        .collect()
    }
    assert one == three and len(one) > 150
