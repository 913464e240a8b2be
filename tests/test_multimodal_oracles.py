"""Gates for the multimodal kernels' byte-math oracles.

Both multimodal oracles recompute Python byte arithmetic
(``sum(utf8_bytes[...])``) as SQL ``ord()`` over characters — valid iff the
corpus is pure ASCII (byte i == codepoint of char i). This asserts that
assumption per test SF so a regenerated non-ASCII corpus fails loudly here
with the remedy (switch the oracle to rows-only) instead of hash-failing at
the driver.
"""

from __future__ import annotations

from tests.conftest import SF_DIR


def test_documents_are_pure_ascii(oracle_con):
    non_ascii, empty = oracle_con.execute(
        """
        SELECT COUNT(*) FILTER (octet_length(encode(text)) <> length(text)),
               COUNT(*) FILTER (length(text) = 0)
        FROM documents
        """
    ).fetchone()
    assert non_ascii == 0, (
        f"{SF_DIR}: {non_ascii} non-ASCII documents — the multimodal ord()-based "
        "oracles are unsound for this corpus; demote them to rows-only"
    )
    assert empty == 0  # ceil(0/128)=0 frames is handled, but keep the gate tight


def test_decode_stub_matches_oracle(spark, registry, oracle_con):
    q = registry["multimodal_decode_stub"]
    srows = sorted(tuple(r) for r in q.build(spark, SF_DIR).collect())
    orows = sorted(tuple(r) for r in oracle_con.execute(q.oracle).fetchall())
    assert srows == orows


def test_frame_sample_matches_oracle(spark, registry, oracle_con):
    q = registry["multimodal_frame_sample"]
    srows = sorted(tuple(r) for r in q.build(spark, SF_DIR).collect())
    orows = sorted(tuple(r) for r in oracle_con.execute(q.oracle).fetchall())
    assert srows == orows


def test_decode_stub_with_pil_present_never_raises(monkeypatch):
    """Round-7 verdict fix: the kernel used to `raise NotImplementedError`
    when PIL *imported* — the presence of a decoder library must route to
    the real decode (or fall back per-buffer), never crash. Simulate a
    PIL whose open() rejects non-image bytes (exactly what real PIL does
    on this text corpus) and one that decodes, via sys.modules stubs."""
    import sys
    import types

    from apache_hive_1_2_2_src_spark.extensions.multimodal import (
        decode_stub_with_fallback,
    )

    # (a) PIL present, buffer not an image -> deterministic fake, no raise.
    rejecting_image = types.SimpleNamespace(
        open=lambda fp: (_ for _ in ()).throw(OSError("cannot identify image"))
    )
    pil = types.ModuleType("PIL")
    pil.Image = rejecting_image
    monkeypatch.setitem(sys.modules, "PIL", pil)
    monkeypatch.setitem(sys.modules, "PIL.Image", rejecting_image)
    buf = b"just some document text, definitely not an image"
    w, h, fmt = decode_stub_with_fallback(buf)
    assert (w, h, fmt) == (64 + len(buf) % 577, 64 + sum(buf[:16]) % 421, "fake-rgb8")

    # (b) PIL present, buffer decodable -> real dimensions flow through.
    class _Im:
        width, height, mode = 640, 480, "RGB"

        def __enter__(self):
            return self

        def __exit__(self, *a):
            return False

    pil.Image = types.SimpleNamespace(open=lambda fp: _Im())
    monkeypatch.setitem(sys.modules, "PIL.Image", pil.Image)
    assert decode_stub_with_fallback(b"\x89PNG...") == (640, 480, "rgb")


def test_bmp24_codec_roundtrip_hand_computed():
    """decode_bmp24 must recover dims + per-channel sums from real BMP
    bytes for a hand-checkable 2x2 image, across padding residues and for
    the top-down (negative height) layout."""
    from apache_hive_1_2_2_src_spark.extensions.multimodal import (
        decode_bmp24,
        encode_bmp24,
    )

    # 2x2 image with distinct channel values per pixel.
    px = {(0, 0): (10, 20, 30), (1, 0): (40, 50, 60),
          (0, 1): (70, 80, 90), (1, 1): (100, 110, 120)}
    buf = encode_bmp24(2, 2, lambda x, y: px[(x, y)])
    assert buf[:2] == b"BM"
    # 2 px * 3 B = 6 B/row -> padded to 8; 54-byte header + 16 pixel bytes.
    assert len(buf) == 54 + 16
    assert decode_bmp24(buf) == (2, 2, 24, 10 + 40 + 70 + 100,
                                 20 + 50 + 80 + 110, 30 + 60 + 90 + 120)

    # Every row-padding residue: widths 4,5,6,7 give 3w % 4 = 0,3,2,1.
    for w in (4, 5, 6, 7):
        buf = encode_bmp24(w, 3, lambda x, y: ((x + y) % 256, x % 256, y % 256))
        dw, dh, bpp, sr, sg, sb = decode_bmp24(buf)
        assert (dw, dh, bpp) == (w, 3, 24)
        assert sr == sum((x + y) % 256 for x in range(w) for y in range(3))
        assert sg == sum(x % 256 for x in range(w) for y in range(3))
        assert sb == sum(y % 256 for x in range(w) for y in range(3))

    # Top-down variant (negative height in the info header): same sums.
    buf = bytearray(encode_bmp24(5, 4, lambda x, y: (x * 2, y * 3, x + y)))
    import struct

    struct.pack_into("<i", buf, 22, -4)  # flip height sign; rows now top-down
    dw, dh, bpp, sr, sg, sb = decode_bmp24(bytes(buf))
    assert (dw, dh) == (5, 4)
    assert sr == sum(x * 2 for x in range(5) for y in range(4))


def test_bmp24_decode_rejects_malformed():
    import pytest as _pytest

    from apache_hive_1_2_2_src_spark.extensions.multimodal import (
        decode_bmp24,
        encode_bmp24,
    )

    with _pytest.raises(ValueError):
        decode_bmp24(b"PNG not a bmp at all .......................................")
    good = encode_bmp24(4, 4, lambda x, y: (1, 2, 3))
    with _pytest.raises(ValueError):
        decode_bmp24(good[:60])  # truncated pixel data
    bad = bytearray(good)
    bad[28] = 8  # bpp = 8 (paletted) — unsupported variant must fail loudly
    with _pytest.raises(ValueError):
        decode_bmp24(bytes(bad))


def test_ppm_codec_and_sniff_dispatch():
    from apache_hive_1_2_2_src_spark.extensions.multimodal import (
        decode_image,
        decode_ppm,
        encode_bmp24,
        encode_ppm,
    )

    px = {(0, 0): (10, 20, 30), (1, 0): (40, 50, 60),
          (0, 1): (70, 80, 90), (1, 1): (100, 110, 120)}
    buf = encode_ppm(2, 2, lambda x, y: px[(x, y)])
    assert buf.startswith(b"P6\n2 2\n255\n")
    assert decode_ppm(buf) == (2, 2, 24, 220, 260, 300)
    # Header comments + extra whitespace must parse (real-world PPMs).
    commented = b"P6\n# made by hand\n 2  2 \n# another\n255\n" + buf[11:]
    assert decode_ppm(commented) == (2, 2, 24, 220, 260, 300)
    # Sniff dispatch: same pixels through either container decode equal.
    bmp = encode_bmp24(2, 2, lambda x, y: px[(x, y)])
    assert decode_image(bmp)[3:] == decode_image(buf)[3:]

    import pytest as _pytest

    with _pytest.raises(ValueError):
        decode_ppm(b"P3\n2 2\n255\n1 2 3")  # ASCII PPM unsupported
    with _pytest.raises(ValueError):
        decode_ppm(b"P6\n2 2\n65535\n" + b"\x00" * 24)  # 16-bit maxval
    with _pytest.raises(ValueError):
        decode_ppm(buf[:14])  # truncated pixels
    with _pytest.raises(ValueError):
        decode_image(b"GIF89a....")  # unknown magic fails loudly


def test_wav_codec_roundtrip_hand_computed():
    """encode/decode WAV PCM16 must recover rate/channels/frames and exact
    integer sample stats for a hand-checkable fixture, survive foreign
    chunks (word-aligned walk), and reject non-PCM input loudly."""
    import struct

    from apache_hive_1_2_2_src_spark.extensions.multimodal import (
        decode_wav_pcm16,
        encode_wav_pcm16,
    )

    frames = [(100, -200), (-32768, 32767), (0, 5)]
    buf = encode_wav_pcm16(16000, 2, frames)
    rate, ch, nf, sum_abs, peak = decode_wav_pcm16(buf)
    assert (rate, ch, nf) == (16000, 2, 3)
    assert sum_abs == 100 + 200 + 32768 + 32767 + 0 + 5
    assert peak == 32768

    # Foreign odd-sized chunk between fmt and data: the walker must skip it
    # word-aligned (RIFF pads odd chunks) and still find data.
    fmt_end = 12 + 8 + 16
    foreign = b"LIST" + struct.pack("<I", 3) + b"abc" + b"\x00"
    buf2 = buf[:fmt_end] + foreign + buf[fmt_end:]
    # fix the RIFF size field
    buf2 = buf2[:4] + struct.pack("<I", len(buf2) - 8) + buf2[8:]
    assert decode_wav_pcm16(buf2) == (16000, 2, 3, sum_abs, 32768)

    # Mono path + empty data.
    r, c, n, s, p = decode_wav_pcm16(encode_wav_pcm16(8000, 1, []))
    assert (r, c, n, s, p) == (8000, 1, 0, 0, 0)

    import pytest as _pytest

    with _pytest.raises(ValueError):
        decode_wav_pcm16(b"not a wav at all....")
    # 8-bit / non-PCM formats must fail loudly, not emit fake stats.
    bad_fmt = struct.pack("<HHIIHH", 7, 1, 8000, 8000, 1, 8)  # mu-law, 8-bit
    bad = (
        b"RIFF" + struct.pack("<I", 4 + 24 + 8) + b"WAVE"
        + b"fmt " + struct.pack("<I", 16) + bad_fmt
        + b"data" + struct.pack("<I", 0)
    )
    with _pytest.raises(ValueError):
        decode_wav_pcm16(bad)


def test_codecs_fail_loudly_on_corrupt_payloads():
    """The decode kernels must never pass fake stats for bytes they cannot
    parse: truncated/garbled payloads raise ValueError (pure-Python check,
    same functions the mapInPandas kernels call)."""
    import pytest

    from apache_hive_1_2_2_src_spark.extensions.multimodal import (
        decode_bmp24,
        decode_image,
        decode_ppm,
        decode_wav_pcm16,
        encode_bmp24,
        encode_wav_pcm16,
    )

    with pytest.raises(ValueError):
        decode_image(b"GIF89a....")  # unsupported magic
    with pytest.raises(ValueError):
        decode_wav_pcm16(b"RIFF\x00\x00\x00\x00NOPE")  # not WAVE
    with pytest.raises(ValueError):
        decode_ppm(b"P6\n4 4\n65535\n" + b"\x00" * 48)  # bad maxval
    with pytest.raises(ValueError):
        decode_ppm(b"P6\n100 100\n255\n\x00\x00")  # truncated pixels
    good_bmp = encode_bmp24(4, 3, lambda x, y: (1, 2, 3))
    with pytest.raises(ValueError):
        decode_bmp24(good_bmp[:20])  # truncated header
    wav = encode_wav_pcm16(8000, 1, [(0,), (5,)])
    # fmt chunk advertising 8-bit audio must be rejected, not misread
    broken = bytearray(wav)
    broken[34] = 8  # bits-per-sample field inside fmt
    with pytest.raises(ValueError):
        decode_wav_pcm16(bytes(broken))


def test_png_decode_of_independently_constructed_bytes():
    """Decode a PNG the TEST builds directly with struct+zlib (filter 0,
    known pixels) — independent of encode_png, so a symmetric
    encode/decode bug cannot cancel."""
    import struct
    import zlib

    from apache_hive_1_2_2_src_spark.extensions.multimodal import decode_png

    # 2x2 RGB: (1,2,3) (4,5,6) / (7,8,9) (250,251,252)
    raw = bytes([0, 1, 2, 3, 4, 5, 6]) + bytes([0, 7, 8, 9, 250, 251, 252])

    def chunk(typ, data):
        return (
            struct.pack(">I", len(data)) + typ + data
            + struct.pack(">I", zlib.crc32(typ + data) & 0xFFFFFFFF)
        )

    buf = (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", struct.pack(">IIBBBBB", 2, 2, 8, 2, 0, 0, 0))
        + chunk(b"IDAT", zlib.compress(raw))
        + chunk(b"IEND", b"")
    )
    assert decode_png(buf) == (2, 2, 24, 1 + 4 + 7 + 250, 2 + 5 + 8 + 251,
                               3 + 6 + 9 + 252)


def test_png_all_filters_roundtrip_and_sniff():
    """Each filter type (None/Sub/Up/Average/Paeth) round-trips to the
    same channel sums; the magic-byte sniffer dispatches PNG."""
    from apache_hive_1_2_2_src_spark.extensions.multimodal import (
        decode_image,
        decode_png,
        encode_png,
    )

    w, h = 7, 5

    def pix(x, y):
        return ((x * 37 + y * 11) % 256, (x + y * 91) % 256, (x * 3 + y) % 256)

    expect = tuple(
        sum(pix(x, y)[c] for x in range(w) for y in range(h)) for c in range(3)
    )
    for f in range(5):
        buf = encode_png(w, h, pix, filter_of=lambda y, f=f: f)
        assert decode_png(buf) == (w, h, 24, *expect), f"filter {f}"
    mixed = encode_png(w, h, pix, filter_of=lambda y: y % 5)
    assert decode_image(mixed) == (w, h, 24, *expect)


def test_png_rejects_unsupported_and_corrupt():
    """Palette/16-bit/interlaced variants and CRC corruption fail loudly
    — never fake stats from unparseable media."""
    import pytest

    from apache_hive_1_2_2_src_spark.extensions.multimodal import (
        decode_png,
        encode_png,
    )

    good = encode_png(3, 3, lambda x, y: (x, y, 0))
    with pytest.raises(ValueError, match="not a PNG"):
        decode_png(b"BM" + good)
    corrupt = bytearray(good)
    corrupt[40] ^= 0xFF  # inside IDAT payload -> CRC mismatch
    with pytest.raises(ValueError, match="CRC mismatch"):
        decode_png(bytes(corrupt))
    import struct
    import zlib

    def chunk(typ, data):
        return (
            struct.pack(">I", len(data)) + typ + data
            + struct.pack(">I", zlib.crc32(typ + data) & 0xFFFFFFFF)
        )

    palette = (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", struct.pack(">IIBBBBB", 2, 2, 8, 3, 0, 0, 0))
        + chunk(b"IEND", b"")
    )
    with pytest.raises(ValueError, match="unsupported PNG variant"):
        decode_png(palette)


def test_png_rejects_truncated_scanlines():
    """An IDAT stream that inflates to fewer bytes than (stride+1)*height
    must fail loudly (a permissive decoder would return partial sums)."""
    import struct
    import zlib

    import pytest

    from apache_hive_1_2_2_src_spark.extensions.multimodal import decode_png

    def chunk(typ, data):
        return (
            struct.pack(">I", len(data)) + typ + data
            + struct.pack(">I", zlib.crc32(typ + data) & 0xFFFFFFFF)
        )

    raw = bytes([0, 1, 2, 3])  # one short scanline for a 2x2 RGB image
    buf = (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", struct.pack(">IIBBBBB", 2, 2, 8, 2, 0, 0, 0))
        + chunk(b"IDAT", zlib.compress(raw))
        + chunk(b"IEND", b"")
    )
    with pytest.raises(ValueError, match="truncated PNG"):
        decode_png(buf)
