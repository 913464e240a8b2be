"""Round-14 operator pins: two-level IVF recall, distributed-NTILE helper
equivalence, and the steps-trainer k>=8 smoke."""

from __future__ import annotations

from pyspark.sql import functions as F

from tests.conftest import SF_DIR


def test_two_level_ivf_recall_at_equal_probe_budget(spark):
    """The two-level index (4 coarse x 4 sub, probe 2x2 -> ~N/4 scanned)
    must recall at least as much of the exact top-3 as the flat trained
    IVF (k=8, nprobe=2 -> ~N/4 scanned) it shares its budget with."""
    from pyspark.sql.window import Window

    from apache_hive_1_2_2_src_spark.extensions.similarity import (
        _KMQ_ITERS,
        _KMQ_K,
        _TL_Q_MIN,
        _cos,
        _ivf_probe2_report,
        ivf_two_level_topk,
        kmeans_centroids_quantized,
    )
    from apache_hive_1_2_2_src_spark.tables import load_table

    e = load_table(spark, SF_DIR, "embeddings")
    q = e.filter(F.col("vec_id") >= _TL_Q_MIN).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("qe")
    )
    w = Window.partitionBy("query_id").orderBy(
        _cos(F.col("qe"), F.col("embedding")).desc(), F.col("vec_id")
    )
    exact = {
        (r.query_id, r.vec_id)
        for r in F.broadcast(q)
        .join(e, F.col("vec_id") != F.col("query_id"))
        .withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= 3)
        .collect()
    }
    assert len(exact) == 30

    flat_cent = kmeans_centroids_quantized(e, _KMQ_K, _KMQ_ITERS)
    flat = {
        (r.query_id, r.cand_id)
        for r in _ivf_probe2_report(e, F.broadcast(flat_cent)).collect()
    }
    tl = {
        (r.query_id, r.cand_id) for r in ivf_two_level_topk(e).collect()
    }
    tl_hits, flat_hits = len(tl & exact), len(flat & exact)
    assert tl_hits >= flat_hits, (tl_hits, flat_hits)
    assert tl_hits > 0


# --------------------------------------------------- GIF / LZW codec


def test_gif_lzw_roundtrip_property():
    """Variable-width LZW survives: tiny streams, width growth past 9/10
    bits, and the 4096-entry table-full clear-and-reset."""
    import random

    from apache_hive_1_2_2_src_spark.extensions.multimodal import (
        _gif_lzw_decode,
        _gif_lzw_encode,
    )

    rng = random.Random(7)
    for _trial in range(25):
        n = rng.choice([1, 2, 5, 100, 1000, 6000])
        ms = rng.choice([2, 4, 8])
        seq = [rng.randrange(1 << ms) for _ in range(n)]
        assert _gif_lzw_decode(_gif_lzw_encode(seq, ms), ms, n) == seq


def test_gif_decoder_matches_canonical_spec_bytes():
    """Spec parity: the canonical hand-packed 1x1 GIF89a (clear, index 0,
    EOI at 3 bits, LSB-first — the widely published byte string) must
    decode through OUR bit-unpacker to the single white pixel."""
    from apache_hive_1_2_2_src_spark.extensions.multimodal import (
        decode_gif87a,
    )

    canon = (
        b"GIF89a\x01\x00\x01\x00\x80\x00\x00\xff\xff\xff\x00\x00\x00"
        b"\x2c\x00\x00\x00\x00\x01\x00\x01\x00\x00\x02\x02\x44\x01\x00\x3b"
    )
    assert decode_gif87a(canon) == (1, 1, 1, 255, 255, 255)


def test_gif_roundtrip_matches_formula_and_kwkwk():
    """encode->decode equals the per-pixel formula (incl. the 1200-px
    width-growth fixture), and a KwKwK-forcing stream (aaa... from a
    1-symbol alphabet slice) survives."""
    from apache_hive_1_2_2_src_spark.extensions.multimodal import (
        _gif_fixture_dims,
        _gif_fixture_index,
        _gif_lzw_decode,
        _gif_lzw_encode,
        _gif_palette,
        decode_gif87a,
        encode_gif87a,
    )

    for doc_id in (0, 3, 10, 47, 123):
        w, h = _gif_fixture_dims(doc_id)
        idx = _gif_fixture_index(doc_id)
        blob = encode_gif87a(w, h, _gif_palette, idx)
        expect = [
            sum(
                _gif_palette(idx(x, y))[c]
                for y in range(h)
                for x in range(w)
            )
            for c in range(3)
        ]
        assert decode_gif87a(blob) == (w, h, 8, *expect)
    # KwKwK: runs of one repeated symbol produce code == next table slot
    seq = [5] * 50
    assert _gif_lzw_decode(_gif_lzw_encode(seq, 4), 4, 50) == seq


def test_gif_decoder_rejects_unsupported_variants():
    import pytest as _pytest

    from apache_hive_1_2_2_src_spark.extensions.multimodal import (
        decode_gif87a,
    )

    with _pytest.raises(ValueError):
        decode_gif87a(b"GIF87a" + b"\x00" * 4)  # truncated
    with _pytest.raises(ValueError):
        decode_gif87a(b"NOTGIF" + b"\x00" * 20)


# ------------------------------------------- distributed NTILE helper


def test_ntile_over_buckets_equals_window_ntile(spark):
    """ntile_over_buckets must equal NTILE(k) OVER (PARTITION BY part
    ORDER BY ...) exactly — including n < k, n == k, n % k != 0, skewed
    parts, and single-row parts."""
    import random

    from pyspark.sql import functions as F
    from pyspark.sql.window import Window

    from apache_hive_1_2_2_src_spark.extensions.sampling import (
        ntile_over_buckets,
    )

    rng = random.Random(41)
    rows = []
    rid = 0
    for part, n in (("a", 1), ("b", 2), ("c", 3), ("d", 7), ("e", 100),
                    ("f", 97), ("g", 5)):
        for _ in range(n):
            rows.append((part, rid, rng.randrange(1000)))
            rid += 1
    df = spark.createDataFrame(rows, "part string, rid long, s long")
    for k in (1, 2, 3, 8):
        w = Window.partitionBy("part").orderBy("s", "rid")
        expect = {
            (r.part, r.rid): r.t
            for r in df.withColumn("t", F.ntile(k).over(w)).collect()
        }
        got = {
            (r.part, r.rid): r.tile
            for r in ntile_over_buckets(
                # bucket = s div 100: coarse, monotone, deliberately
                # collapses many rows per bucket AND leaves some buckets
                # singleton — both offset paths exercised
                df.withColumn("qs", F.expr("CAST(s div 100 AS INT)")),
                ["part"],
                "qs",
                [F.col("s"), F.col("rid")],
                k,
            ).collect()
        }
        assert got == expect, f"k={k}"


def test_gif_decoder_fuzz_never_returns_wrong_data():
    """Malformed GIFs must raise, never return plausible-but-wrong
    feature rows: truncated sub-blocks, a corrupted LZW stream (codes
    beyond the table), pixel-count mismatch, missing trailer byte, and
    random byte flips across the whole buffer."""
    import random

    import pytest as _pytest

    from apache_hive_1_2_2_src_spark.extensions.multimodal import (
        _gif_fixture_index,
        _gif_palette,
        decode_gif87a,
        encode_gif87a,
    )

    good = encode_gif87a(9, 5, _gif_palette, _gif_fixture_index(3))
    baseline = decode_gif87a(good)

    # truncated anywhere inside the data section
    for cut in (20, len(good) // 2, len(good) - 3):
        with _pytest.raises((ValueError, IndexError)):
            decode_gif87a(good[:cut])

    # flip bytes: decoder must either raise or (for flips confined to
    # don't-care header fields like background/aspect or the palette)
    # return a row that differs only in channel sums — never crash the
    # process or loop forever
    from struct import error as struct_error

    rng = random.Random(5)
    raised = 0
    for _ in range(60):
        b = bytearray(good)
        i = rng.randrange(6, len(b))
        b[i] ^= 1 << rng.randrange(8)
        try:
            decode_gif87a(bytes(b))
        except (ValueError, IndexError, struct_error):
            raised += 1
    assert raised > 0  # the structural flips must be caught
    assert decode_gif87a(good) == baseline  # inputs never mutated
