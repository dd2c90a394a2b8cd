"""Real uncompressed-format decoders (BMP / PPM / WAV-PCM) + the stub
plumbing contract. The oracle queries prove encode→decode roundtrips at
pixel/sample granularity; these tests pin the decoders against
HANDCRAFTED byte fixtures (independent of the repo's own encoders) and
the fail-closed quarantine paths."""

from __future__ import annotations

import struct

from beholder_spark.operators import multimodal as mm


def _bmp_2x1() -> bytes:
    # handcrafted 2x1 24-bit BMP: pixel(0,0)=BGR(1,2,3), pixel(1,0)=BGR(4,5,6)
    raster = bytes([1, 2, 3, 4, 5, 6, 0, 0])  # row padded to 8 bytes
    return (
        b"BM" + struct.pack("<IHHI", 54 + len(raster), 0, 0, 54)
        + struct.pack("<IiiHHIIiiII", 40, 2, 1, 1, 24, 0, len(raster), 2835, 2835, 0, 0)
        + raster
    )


def test_bmp_decode_handcrafted_bytes():
    w, h, fmt, sr, sg, sb, ok = mm.decode_bmp_bytes(_bmp_2x1())
    assert (w, h, fmt, ok) == (2, 1, "bmp24", True)
    assert (sr, sg, sb) == (3 + 6, 2 + 5, 1 + 4)  # stored BGR → logical RGB


def test_bmp_decode_top_down_and_failures():
    # top-down variant (negative height) decodes identically
    b = bytearray(_bmp_2x1())
    b[22:26] = struct.pack("<i", -1)
    assert mm.decode_bmp_bytes(bytes(b))[:2] == (2, 1)
    # fail-closed: wrong magic, truncation, unsupported bpp/compression
    assert mm.decode_bmp_bytes(b"XX" + _bmp_2x1()[2:])[-1] is False
    assert mm.decode_bmp_bytes(_bmp_2x1()[:-3])[-1] is False
    bpp8 = bytearray(_bmp_2x1())
    bpp8[28:30] = struct.pack("<H", 8)
    assert mm.decode_bmp_bytes(bytes(bpp8))[-1] is False
    # fail-closed: data offset pointing INTO the headers must not decode
    # header bytes as raster with parse_ok=True
    hdr_off = bytearray(_bmp_2x1())
    hdr_off[10:14] = struct.pack("<I", 40)
    assert mm.decode_bmp_bytes(bytes(hdr_off) + bytes(64))[-1] is False
    assert mm.decode_image_bytes(b"\x89PNG\r\n")[-1] is False  # truncated PNG signature


def test_ppm_decode_handcrafted_bytes():
    ppm = b"P6\n# comment\n2 2\n255\n" + bytes(range(12))
    w, h, fmt, sr, sg, sb, ok = mm.decode_ppm_bytes(ppm)
    assert (w, h, fmt, ok) == (2, 2, "ppm", True)
    assert (sr, sg, sb) == (0 + 3 + 6 + 9, 1 + 4 + 7 + 10, 2 + 5 + 8 + 11)
    assert mm.decode_ppm_bytes(b"P6\n2 2\n255\n" + bytes(5))[-1] is False  # truncated
    assert mm.decode_ppm_bytes(b"P6\n2 2\n65535\n" + bytes(24))[-1] is False  # 16-bit maxval


def test_wav_decode_stereo_and_failures():
    import io
    import wave

    buf = io.BytesIO()
    with wave.open(buf, "wb") as wf:
        wf.setnchannels(2)
        wf.setsampwidth(2)
        wf.setframerate(44100)
        wf.writeframes(struct.pack("<6h", 10, -10, 20, -20, 5, 5))
    nch, rate, n, total, ok = mm.decode_wav_bytes(buf.getvalue())
    assert (nch, rate, n, total, ok) == (2, 44100, 3, 10, True)
    assert mm.decode_wav_bytes(b"RIFFjunk")[-1] is False
    # 8-bit PCM: parses as WAV but violates the 16-bit SPEC → fail-closed
    b8 = io.BytesIO()
    with wave.open(b8, "wb") as wf:
        wf.setnchannels(1)
        wf.setsampwidth(1)
        wf.setframerate(8000)
        wf.writeframes(bytes(4))
    assert mm.decode_wav_bytes(b8.getvalue())[-1] is False


def test_decode_image_spark_path_quarantines_mixed_batch(spark):
    """Spark-side decode over a mixed batch: valid BMP rows decode, junk
    rows quarantine with parse_ok False — one Arrow pass, no poison."""
    rows = [
        (1, bytearray(mm.make_bmp_bytes(4, 3, 9))),
        (2, bytearray(b"not an image")),
        (3, None),
    ]
    df = spark.createDataFrame(rows, "id long, payload binary")
    got = {r.id: (r.dec_width, r.dec_height, r.dec_sum_g, r.dec_parse_ok)
           for r in mm.decode_image(df, "payload").collect()}
    assert got[1] == (4, 3, 4 * 3 * 9, True)
    assert got[2] == (None, None, None, False)
    assert got[3] == (None, None, None, False)


def _png_forward_filter(pixels, f, ch):
    """Independent FORWARD filter implementation (the test-side inverse
    of the decoder's defilter): pixels is h×(w·ch) raw bytes."""
    h = len(pixels)
    out = bytearray()
    prev = [0] * len(pixels[0])
    for y in range(h):
        row = pixels[y]
        out.append(f)
        for x in range(len(row)):
            a = row[x - ch] if x >= ch else 0
            b = prev[x]
            c = prev[x - ch] if (x >= ch and y > 0) else 0
            b = b if y > 0 else 0
            if f == 0:
                v = row[x]
            elif f == 1:
                v = (row[x] - a) & 0xFF
            elif f == 2:
                v = (row[x] - b) & 0xFF
            elif f == 3:
                v = (row[x] - (a + b) // 2) & 0xFF
            else:  # paeth
                p = a + b - c
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                pred = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
                v = (row[x] - pred) & 0xFF
            out.append(v)
        prev = row
    return bytes(out)


def _png_wrap(raw, w, h, color):
    import struct
    import zlib

    def chunk(typ, data):
        return (
            struct.pack(">I", len(data)) + typ + data
            + struct.pack(">I", zlib.crc32(typ + data) & 0xFFFFFFFF)
        )

    ihdr = struct.pack(">IIBBBBB", w, h, 8, color, 0, 0, 0)
    return (
        b"\x89PNG\r\n\x1a\n" + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(raw)) + chunk(b"IEND", b"")
    )


def test_png_every_filter_type_defilters_exactly():
    """Each PNG filter type (0–4) round-trips: the test FORWARD-filters a
    known 3×2 RGB raster with its own independent implementation; the
    decoder must recover the exact channel sums."""
    pixels = [
        [10, 200, 30, 250, 5, 60, 90, 130, 170],
        [15, 25, 35, 45, 55, 65, 75, 85, 95],
    ]
    exp = tuple(sum(row[i::3][j] for row in pixels for j in range(3)) for i in range(3))
    for f in range(5):
        raw = _png_forward_filter(pixels, f, 3)
        got = mm.decode_png_bytes(_png_wrap(raw, 3, 2, 2))
        assert got == (3, 2, "png8-rgb", *exp, True), f"filter {f}"


def test_png_gray_rgba_and_failures():
    import struct
    import zlib

    # gray: sum reported in all three channels
    raw = bytes([0, 1, 2, 0, 3, 4])  # 2×2 gray, filter 0 rows
    assert mm.decode_png_bytes(_png_wrap(raw, 2, 2, 0)) == (2, 2, "png8-gray", 10, 10, 10, True)
    # RGBA: alpha excluded from sums
    raw = bytes([0, 1, 2, 3, 255, 4, 5, 6, 255])
    assert mm.decode_png_bytes(_png_wrap(raw, 2, 1, 6)) == (2, 1, "png8-rgba", 5, 7, 9, True)
    # corrupted CRC fails closed
    good = bytearray(mm.make_png_bytes(3, 2, 9))
    good[-5] ^= 0xFF  # flip a byte inside IEND's CRC
    assert mm.decode_png_bytes(bytes(good))[-1] is False
    # 16-bit depth unsupported → fail-closed
    ihdr16 = struct.pack(">IIBBBBB", 2, 2, 16, 2, 0, 0, 0)
    def chunk(typ, data):
        return struct.pack(">I", len(data)) + typ + data + struct.pack(">I", zlib.crc32(typ + data) & 0xFFFFFFFF)
    bad = b"\x89PNG\r\n\x1a\n" + chunk(b"IHDR", ihdr16) + chunk(b"IDAT", zlib.compress(b"\x00" * 13)) + chunk(b"IEND", b"")
    assert mm.decode_png_bytes(bad)[-1] is False


# ---------------------------------------------------------------------------
# baseline JPEG (r4): analytic coefficient-domain fixtures → bit-exact
# reconstruction through the real marker/Huffman/IDCT pipeline
# ---------------------------------------------------------------------------


def test_jpeg_decode_solid_blocks_closed_form():
    w, h, base, step = 24, 16, 40, 33
    got = mm.decode_jpeg_bytes(mm.make_jpeg_bytes(w, h, base, step))
    exp = sum(64 * ((base + i * step) % 256) for i in range((w // 8) * (h // 8)))
    assert got == (w, h, "jpeg-baseline", exp, exp, exp, True)


def test_jpeg_decode_ac_checkerboard_exact_and_clipping():
    # symmetric checkerboard: ±ac44 cancels in the sum
    got = mm.decode_jpeg_bytes(mm.make_jpeg_bytes(16, 8, 100, 7, ac44=3))
    exp = sum(64 * ((100 + i * 7) % 256) for i in range(2))
    assert got[3:] == (exp, exp, exp, True)
    # clipping breaks the symmetry DETERMINISTICALLY: v=254, +3 clips to
    # 255 (each +1 instead of +3), -3 stays 251 → per block 32*1 + 32*(-3)
    got2 = mm.decode_jpeg_bytes(mm.make_jpeg_bytes(8, 8, 254, 0, ac44=3))
    exp2 = 64 * 254 + 32 * 1 + 32 * (-3)
    assert got2[3:] == (exp2, exp2, exp2, True)  # proves AC hits the pixels


def test_jpeg_decode_420_gray_and_restarts():
    # 4:2:0: chroma subsampled + pixel-replication upsample
    vals = [(10 + i * 5) % 256 for i in range(8)]
    got = mm.decode_jpeg_bytes(mm.make_jpeg_bytes(32, 16, 10, 5, subsample=True))
    assert got == (32, 16, "jpeg-baseline", *([sum(64 * v for v in vals)] * 3), True)
    # grayscale single-component frame
    gexp = sum(64 * ((77 + i * 13) % 256) for i in range(2))
    assert mm.decode_jpeg_bytes(mm.make_jpeg_bytes(16, 8, 77, 13, gray=True)) == (
        16, 8, "jpeg-baseline-gray", gexp, gexp, gexp, True
    )
    # restart markers: DC predictors reset per RST segment
    rexp = sum(64 * ((200 + i * 90) % 256) for i in range(5))
    assert mm.decode_jpeg_bytes(mm.make_jpeg_bytes(40, 8, 200, 90, restart_interval=2)) == (
        40, 8, "jpeg-baseline", rexp, rexp, rexp, True
    )


def test_jpeg_decode_fail_closed():
    good = mm.make_jpeg_bytes(16, 8, 50, 3)
    assert mm.decode_jpeg_bytes(good[: len(good) // 2])[-1] is False  # truncated
    prog = bytearray(good)
    prog[prog.index(b"\xff\xc0") + 1] = 0xC2  # progressive frame marker
    assert mm.decode_jpeg_bytes(bytes(prog))[-1] is False
    # corrupt a Huffman table id in SOS → undefined table
    bad = bytearray(good)
    sos = bad.index(b"\xff\xda")
    bad[sos + 6] = 0x57  # Y component now names tables 5/7 (never defined)
    assert mm.decode_jpeg_bytes(bytes(bad))[-1] is False
    assert mm.decode_jpeg_bytes(b"\xff\xd8\xff\xe0")[-1] is False  # header only
    # dispatcher: JPEG magic routes to the real decoder
    assert mm.decode_image_bytes(good)[2] == "jpeg-baseline"
