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


# ---------------------------------------------------------------------------
# REAL GIF decode (r4): strict LZW + palette mapping, handcrafted bytes
# independent of the fixture encoder, and the fail-closed paths
# ---------------------------------------------------------------------------


def _gif_handcrafted_2x1() -> bytes:
    # 2x1 GIF87a, 4-entry global palette, mcs=2; pixels = indices 1, 2.
    # LZW (width 3, LSB-first): CLEAR(100) 001 010 END(101)
    # bits: 100 001 010 101 -> bytes LSB-first: 0b10001100=0x8C, 0b1010=0x0A
    pal = bytes((10, 20, 30,  1, 2, 3,  4, 5, 6,  7, 8, 9))
    return (
        b"GIF87a" + struct.pack("<HHBBB", 2, 1, 0x81, 0, 0) + pal
        + bytes((0x2C,)) + struct.pack("<HHHHB", 0, 0, 2, 1, 0)
        + bytes((2, 2, 0x8C, 0x0A, 0x00, 0x3B))
    )


def test_gif_decode_handcrafted_bytes():
    w, h, fmt, sr, sg, sb, ok = mm.decode_gif_bytes(_gif_handcrafted_2x1())
    assert (w, h, fmt, ok) == (2, 1, "gif", True)
    assert (sr, sg, sb) == (1 + 4, 2 + 5, 3 + 6)  # palette entries 1 and 2


def test_gif_fixture_roundtrip_closed_form_and_interlace():
    for w, h, g in [(4, 2, 0), (20, 9, 255), (40, 30, 7)]:  # 1200 px forces width growth
        want = (w, h, "gif", w * h * (w + h - 2) // 2, w * h * g, 7 * w * h, True)
        assert mm.decode_gif_bytes(mm.make_gif_bytes(w, h, g)) == want
        assert mm.decode_gif_bytes(mm.make_gif_bytes(w, h, g, interlace=True)) == want
    # dispatch reaches the GIF path
    assert mm.decode_image_bytes(mm.make_gif_bytes(4, 2, 9))[2] == "gif"


def test_gif_lzw_real_compression_and_kwkwk():
    # A REAL LZW stream the literal-only encoder never emits: 'aabbb'-style
    # repeats force dictionary hits including the KwKwK corner (code ==
    # next free slot). mcs=2: CLEAR=4 END=5, width 3.
    # pixels 0 0 1 1 1: codes CLEAR 0 6(KwKwK: 00) ... build directly:
    #   CLEAR, 0, 6?  table after '0': {6:'00'} pending — decoder: code 6
    #   == len(table) uses prev+prev[0] = '00' -> pixels 0,0,0. Use target
    #   pixels 0 0 0 1 1 1: codes CLEAR 0 6 1 8; after 6: table 6='00',
    #   prev='00'; code 1 -> out '1', table 7='000'... wait 7='0'+'1'? no:
    #   append prev+entry[0] = '00'+'1' -> 7='001'; code 8 == len(table)
    #   -> prev+prev[0] = '1'+'1' = '11' -> pixels ...1,1,1 total 000111.
    bits = [(4, 3), (0, 3), (6, 3), (1, 3), (8, 4)]  # width grows to 4 after 8 entries
    acc = 0
    nbits = 0
    data = bytearray()
    for code, width in bits:
        acc |= code << nbits
        nbits += width
        while nbits >= 8:
            data.append(acc & 0xFF)
            acc >>= 8
            nbits -= 8
    if nbits:
        data.append(acc & 0xFF)
    out = mm._gif_lzw_decode(bytes(data), 2, 6)
    assert out == bytes((0, 0, 0, 1, 1, 1))


def test_gif_decode_fail_closed():
    good = mm.make_gif_bytes(6, 4, 50)
    assert mm.decode_gif_bytes(good[:20])[-1] is False  # truncated in palette
    assert mm.decode_gif_bytes(good[:-10])[-1] is False  # truncated in data
    assert mm.decode_gif_bytes(b"GIF90a" + good[6:])[-1] is False  # bad version
    # no color table anywhere (GCT flag cleared; palette bytes parse as junk)
    nogct = bytearray(good)
    nogct[10] &= 0x7F
    assert mm.decode_gif_bytes(bytes(nogct))[-1] is False
    # index beyond palette: 2-entry local palette, literal code 3 in stream
    # width-3 codes LSB-first: CLEAR(100) then 3(011) -> bits 011100 = 0x1C
    bad_idx = (
        b"GIF89a" + struct.pack("<HHBBB", 1, 1, 0, 0, 0)
        + bytes((0x2C,)) + struct.pack("<HHHHB", 0, 0, 1, 1, 0x80)  # LCT size 0 -> 2 entries
        + bytes((10, 20, 30, 1, 2, 3))
        + bytes((2, 1, 0x1C, 0x00, 0x3B))
    )
    assert mm.decode_gif_bytes(bad_idx)[-1] is False
    # EOI before all pixels decoded fails closed:
    # bits CLEAR(100) END(101) -> 101100 = 0x2C
    short = (
        b"GIF87a" + struct.pack("<HHBBB", 2, 1, 0x80, 0, 0)
        + bytes((10, 20, 30, 1, 2, 3))
        + bytes((0x2C,)) + struct.pack("<HHHHB", 0, 0, 2, 1, 0)
        + bytes((2, 1, 0x2C, 0x00, 0x3B))
    )
    assert mm.decode_gif_bytes(short)[-1] is False
    # trailer before any image descriptor
    noimg = b"GIF89a" + struct.pack("<HHBBB", 1, 1, 0, 0, 0) + bytes((0x3B,))
    assert mm.decode_gif_bytes(noimg)[-1] is False
    # bad LZW min code size
    badmcs = bytearray(good)
    # mcs byte sits right after the image descriptor (6+7 header, 768 GCT,
    # 8 GCE extension, 10 descriptor)
    pos = 6 + 7 + 768 + 8 + 10
    assert good[pos] == 8
    badmcs[pos] = 12
    assert mm.decode_gif_bytes(bytes(badmcs))[-1] is False


# ---------------------------------------------------------------------------
# REAL AVI/MJPEG frame sampling (r4)
# ---------------------------------------------------------------------------


def test_avi_rec_list_nesting_and_stream_numbers():
    f0 = mm.make_jpeg_bytes(8, 8, 10, 0)
    f1 = mm.make_jpeg_bytes(8, 8, 20, 0)
    # frames wrapped in a LIST 'rec ' group + an audio chunk to skip
    def chunk(fourcc, body):
        return fourcc + struct.pack("<I", len(body)) + body + (b"\x00" if len(body) & 1 else b"")
    rec = chunk(b"LIST", b"rec " + chunk(b"00dc", f0) + chunk(b"01wb", b"\x00" * 10) + chunk(b"01dc", f1))
    body = b"AVI " + chunk(b"LIST", b"movi" + rec)
    avi = b"RIFF" + struct.pack("<I", len(body)) + body
    got = mm._avi_video_chunks(avi)
    assert got == [f0, f1]  # both video streams, audio skipped


def test_avi_sampler_spark_rows_and_quarantine(spark):
    import pandas as pd

    good = mm.make_avi_bytes([mm.make_jpeg_bytes(8, 8, (5 + 7 * i) % 256, 0) for i in range(5)])
    badframe = mm.make_avi_bytes([b"not a jpeg at all!"])
    pdf = pd.DataFrame({"doc_id": [1, 2, 3], "payload": [good, b"garbage", badframe]})
    df = spark.createDataFrame(pdf)
    rows = {
        (r["id"], r["frame_no"]): r
        for r in mm.sample_video_frames(df, "payload", "doc_id", every_n=2).collect()
    }
    # doc 1: frames 0, 2, 4 sampled and decoded
    for i in (0, 2, 4):
        v = (5 + 7 * i) % 256
        r = rows[(1, i)]
        assert (r["width"], r["sum_r"], r["parse_ok"]) == (8, 64 * v, True)
    assert (1, 1) not in rows and (1, 3) not in rows  # skipped frames never appear
    # doc 2: malformed container -> ONE quarantine row
    assert rows[(2, None)]["parse_ok"] is False
    # doc 3: container fine, frame 0 sampled but fails its decode
    r3 = rows[(3, 0)]
    assert r3["parse_ok"] is False and r3["width"] is None
    assert len(rows) == 5


# ---------------------------------------------------------------------------
# REAL MP3 frame-header walk (r4)
# ---------------------------------------------------------------------------


def test_mp3_walk_handcrafted_single_frame():
    # one 128 kbps 44.1 kHz frame, padding bit SET: 144000*128//44100+1 = 418
    hdr = bytes((0xFF, 0xFB, (9 << 4) | (0 << 2) | 2, 0x00))
    frame = hdr + b"\x00" * (418 - 4)
    assert mm.parse_mp3_meta_bytes(frame) == (1, 44100, 128, 1152 * 1000 // 44100, True)


def test_mp3_walk_vbr_id3_tags_and_failures():
    b = mm.make_mp3_bytes(9, 5)
    sb = sum(mm.MP3_BITRATES[(5 + i) % 14] for i in range(9))
    assert mm.parse_mp3_meta_bytes(b) == (9, 44100, sb, 9 * 1152 * 1000 // 44100, True)
    # ID3v1 trailer is skipped
    assert mm.parse_mp3_meta_bytes(b + b"TAG" + b"\x00" * 125)[0] == 9
    # strict walk failures: truncated frame, trailing junk, mixed samplerate,
    # free-format bitrate, MPEG-2 version bits, non-syncsafe ID3 size
    assert mm.parse_mp3_meta_bytes(b[:-5])[-1] is False
    assert mm.parse_mp3_meta_bytes(b + b"xx")[-1] is False
    mix = mm.make_mp3_bytes(1, 0, sr_idx=0, with_id3=False) + mm.make_mp3_bytes(
        1, 0, sr_idx=1, with_id3=False
    )
    assert mm.parse_mp3_meta_bytes(mix)[-1] is False
    free = bytes((0xFF, 0xFB, 0x00, 0x00)) + b"\x00" * 100
    assert mm.parse_mp3_meta_bytes(free)[-1] is False
    v2 = bytearray(mm.make_mp3_bytes(1, 0, with_id3=False))
    v2[1] = 0xF3  # MPEG-2 version bits
    assert mm.parse_mp3_meta_bytes(bytes(v2))[-1] is False
    badid3 = b"ID3\x04\x00\x00" + bytes((0, 0, 0x80, 0)) + b"\x00" * 20
    assert mm.parse_mp3_meta_bytes(badid3)[-1] is False


def test_mp3_meta_spark_path_quarantines_mixed_batch(spark):
    import pandas as pd

    pdf = pd.DataFrame(
        {"doc_id": [1, 2], "payload": [mm.make_mp3_bytes(3, 0), b"not audio"]}
    )
    out = {
        r["doc_id"]: r
        for r in mm.parse_mp3_meta(spark.createDataFrame(pdf), "payload").collect()
    }
    assert out[1]["mp3_n_frames"] == 3 and out[1]["mp3_parse_ok"] is True
    assert out[2]["mp3_parse_ok"] is False and out[2]["mp3_n_frames"] is None


# ---------------------------------------------------------------------------
# REAL progressive-JPEG decode (r4): multi-scan accumulation,
# successive-approximation refinement, EOB-runs
# ---------------------------------------------------------------------------


def test_progressive_dc_only_closed_form():
    w, h, base, step = 24, 16, 40, 33
    got = mm.decode_jpeg_bytes(mm.make_jpeg_progressive_bytes(w, h, base, step))
    exp = sum(64 * ((base + i * step) % 256) for i in range(6))
    assert got == (w, h, "jpeg-progressive", exp, exp, exp, True)


def test_progressive_refinement_ladder_equals_direct_coding():
    # the Al=1 ladder (DC first + AC first + DC refine + AC refine) must
    # reconstruct EXACTLY what single full-precision scans produce,
    # across even/odd/newval(+/-1)/negative AC amplitudes
    for acv in (0, 1, -1, 6, 24, 25, -7):
        ladder = mm.decode_jpeg_bytes(mm.make_jpeg_progressive_bytes(32, 24, 17, 29, acval=acv, al=1))
        direct = mm.decode_jpeg_bytes(mm.make_jpeg_progressive_bytes(32, 24, 17, 29, acval=acv, al=0))
        assert ladder == direct and ladder[-1] is True, (acv, ladder, direct)


def test_progressive_matches_baseline_same_coefficients():
    # same analytic coefficients through the two entropy pipelines
    prog = mm.decode_jpeg_bytes(mm.make_jpeg_progressive_bytes(24, 16, 40, 33, acval=24))
    base = mm.decode_jpeg_bytes(mm.make_jpeg_bytes(24, 16, 40, 33, ac44=3))
    assert prog[3:] == base[3:] and prog[:2] == base[:2]


def test_progressive_gray_and_odd_acval_correction_bits():
    gexp = sum(64 * ((77 + i * 13) % 256) for i in range(2))
    assert mm.decode_jpeg_bytes(mm.make_jpeg_progressive_bytes(16, 8, 77, 13, gray=True)) == (
        16, 8, "jpeg-progressive-gray", gexp, gexp, gexp, True
    )
    # odd amplitude: the refinement scan's correction bit carries the LSB
    exp = sum(64 * ((90 + i * 11) % 256) for i in range(2))
    got = mm.decode_jpeg_bytes(mm.make_jpeg_progressive_bytes(16, 8, 90, 11, acval=25))
    assert got[3:] == (exp, exp, exp, True)


def test_progressive_fail_closed():
    good = mm.make_jpeg_progressive_bytes(16, 8, 50, 3, acval=24)
    assert mm.decode_jpeg_bytes(good[: len(good) // 2])[-1] is False  # truncated mid-scan
    assert mm.decode_jpeg_bytes(good[:-2])[-1] is False  # missing EOI
    # corrupt the successive-approximation descent (refinement must step
    # exactly one bit plane: Al == Ah - 1)
    bad = bytearray(good)
    # find the DC refinement SOS (Ss=0 Se=0 Ah<<4|Al == 0x10) and break it
    idx = bad.find(bytes((0x00, 0x00, 0x10)))
    assert idx > 0
    bad[idx + 2] = 0x31  # Ah=3, Al=1: skips a bit plane
    assert mm.decode_jpeg_bytes(bytes(bad))[-1] is False


# ---------------------------------------------------------------------------
# Adversarial-payload regressions (r4 review): resource bombs fail closed
# BEFORE allocation, structural lies quarantine, encoder conformance
# ---------------------------------------------------------------------------


def test_huge_claimed_rasters_fail_closed_without_allocating():
    # ~90-byte payloads claiming 65535x65535 frames must quarantine, not
    # allocate. (Before the MAX_DECODE_PIXELS guard these raised
    # MemoryError inside the executor UDF and failed the whole task.)
    def seg(marker, body):
        return bytes((0xFF, marker)) + struct.pack(">H", len(body) + 2) + body

    for sof_marker in (0xC0, 0xC2):  # baseline and progressive
        bomb = (
            b"\xff\xd8"
            + seg(0xDB, bytes([0x00]) + bytes([1] * 64))
            + seg(sof_marker, struct.pack(">BHHB", 8, 65535, 65535, 1) + bytes((1, 0x11, 0)))
            + b"\xff\xd9"
        )
        assert mm.decode_jpeg_bytes(bomb)[-1] is False
    # GIF claiming a 65535x65535 frame over a 2-entry palette
    gif_bomb = (
        b"GIF89a" + struct.pack("<HHBBB", 1, 1, 0x80, 0, 0)
        + bytes((10, 20, 30, 1, 2, 3))
        + bytes((0x2C,)) + struct.pack("<HHHHB", 0, 0, 65535, 65535, 0)
        + bytes((2, 1, 0x2C, 0x00, 0x3B))
    )
    assert mm.decode_gif_bytes(gif_bomb)[-1] is False


def test_png_inflate_is_bounded_by_claimed_raster():
    import zlib

    # valid 2x2 gray IHDR but IDAT inflates to 1 MB: the bounded inflate
    # must stop at the claimed raster size and fail closed
    def chunk(typ, data):
        return struct.pack(">I", len(data)) + typ + data + struct.pack(
            ">I", zlib.crc32(typ + data) & 0xFFFFFFFF
        )

    ihdr = struct.pack(">IIBBBBB", 2, 2, 8, 0, 0, 0, 0)
    bomb_idat = zlib.compress(b"\x00" * (1 << 20))
    png = (
        b"\x89PNG\r\n\x1a\n" + chunk(b"IHDR", ihdr) + chunk(b"IDAT", bomb_idat) + chunk(b"IEND", b"")
    )
    assert mm.decode_png_bytes(png)[-1] is False
    # and the honest payload still decodes
    assert mm.decode_png_bytes(mm.make_png_bytes(4, 3, 9))[-1] is True


def test_progressive_scanless_file_fails_closed():
    def seg(marker, body):
        return bytes((0xFF, marker)) + struct.pack(">H", len(body) + 2) + body

    scanless = (
        b"\xff\xd8"
        + seg(0xDB, bytes([0x00]) + bytes([1] * 64))
        + seg(0xC2, struct.pack(">BHHB", 8, 8, 8, 1) + bytes((1, 0x11, 0)))
        + b"\xff\xd9"
    )
    assert mm.decode_jpeg_bytes(scanless)[-1] is False


def test_avi_zero_video_frames_is_countable_quarantine(spark):
    import pandas as pd

    def chunk(fourcc, body):
        return fourcc + struct.pack("<I", len(body)) + body + (b"\x00" if len(body) & 1 else b"")

    empty_movi = b"RIFF" + struct.pack("<I", 4 + 12) + b"AVI " + chunk(b"LIST", b"movi")
    audio_only = b"RIFF" + struct.pack("<I", 4 + 26) + b"AVI " + chunk(
        b"LIST", b"movi" + chunk(b"01wb", b"\x00" * 6)
    )
    pdf = pd.DataFrame({"doc_id": [1, 2], "payload": [empty_movi, audio_only]})
    rows = mm.sample_video_frames(spark.createDataFrame(pdf), "payload", "doc_id").collect()
    assert len(rows) == 2  # ids never vanish silently
    assert all(r["parse_ok"] is False and r["frame_no"] is None for r in rows)


def test_progressive_ladder_conformant_for_negative_acval_under_clipping():
    # clipping breaks the +/- checkerboard symmetry, so a magnitude error
    # in the successive-approximation split (floor-shift vs point
    # transform) becomes visible in the channel sums
    for acv in (-25, -24, -7, 25):
        ladder = mm.decode_jpeg_bytes(
            mm.make_jpeg_progressive_bytes(16, 8, 254, 0, acval=acv, al=1)
        )
        direct = mm.decode_jpeg_bytes(
            mm.make_jpeg_progressive_bytes(16, 8, 254, 0, acval=acv, al=0)
        )
        assert ladder == direct and ladder[-1] is True, (acv, ladder, direct)


def test_progressive_420_subsampled_matches_baseline_and_closed_form():
    # interleaved DC scans carry 2x2 luma blocks per MCU; AC scans run
    # over each component's own (subsampled) block grid
    vals = [(10 + i * 5) % 256 for i in range(8)]
    exp = sum(64 * v for v in vals)
    prog = mm.decode_jpeg_bytes(mm.make_jpeg_progressive_bytes(32, 16, 10, 5, subsample=True))
    assert prog == (32, 16, "jpeg-progressive", exp, exp, exp, True)
    base = mm.decode_jpeg_bytes(mm.make_jpeg_bytes(32, 16, 10, 5, subsample=True))
    assert prog[3:] == base[3:]
    # the full refinement ladder reconstructs exactly at 4:2:0 too
    for acv in (24, 25, -7):
        ladder = mm.decode_jpeg_bytes(
            mm.make_jpeg_progressive_bytes(32, 32, 17, 29, acval=acv, al=1, subsample=True)
        )
        direct = mm.decode_jpeg_bytes(
            mm.make_jpeg_progressive_bytes(32, 32, 17, 29, acval=acv, al=0, subsample=True)
        )
        assert ladder == direct and ladder[-1] is True, acv


# ---------------------------------------------------------------------------
# Codec injection seam (VERDICT r4 item 3): decode_image's `decoder`
# parameter is the swap point for a C decoder (libjpeg-turbo / PIL
# adapter). These tests are the CONFORMANCE HARNESS a swapped decoder
# must pass: same mapInPandas slot, same oracle fixture families,
# bit-identical output vs the pure-Python reference.
# ---------------------------------------------------------------------------


def _make_sentinel_decoder():
    """Closure (not a module-level function) so cloudpickle serializes it
    BY VALUE — executors cannot import the test module. A real adapter
    ships its module via --py-files / ship_package instead."""

    def sentinel(payload):
        return (1, 1, "turbo-sentinel", 0, 0, 0, True)

    return sentinel


def _make_mock_fast_decoder():
    """Mock 'fast decoder' shaped like a real adapter: independent fast
    paths for the formats the fast library covers (pure-bytes BMP/PPM —
    genuinely different implementations from the reference's numpy
    path), reference fallback for the rest — exactly how a
    libjpeg-turbo adapter that only speaks JFIF composes with the
    pure-Python reference. Built as a closure so cloudpickle ships it
    by value."""
    from beholder_spark.operators.multimodal import _FAIL, decode_image_bytes

    def bmp_bytes_only(payload):
        if payload is None or len(payload) < 54 or payload[:2] != b"BM":
            return _FAIL
        off = int.from_bytes(payload[10:14], "little")
        hdr = int.from_bytes(payload[14:18], "little")
        w = int.from_bytes(payload[18:22], "little", signed=True)
        h = int.from_bytes(payload[22:26], "little", signed=True)
        planes = int.from_bytes(payload[26:28], "little")
        bpp = int.from_bytes(payload[28:30], "little")
        comp = int.from_bytes(payload[30:34], "little")
        if hdr < 40 or planes != 1 or bpp != 24 or comp != 0 or w <= 0 or h == 0:
            return _FAIL
        if off < 14 + hdr:
            return _FAIL
        h_abs = abs(h)
        stride = (w * 3 + 3) & ~3
        if len(payload) < off + stride * h_abs:
            return _FAIL
        sb = sg = sr = 0
        for y in range(h_abs):
            row = payload[off + y * stride : off + y * stride + w * 3]
            sb += sum(row[0::3])
            sg += sum(row[1::3])
            sr += sum(row[2::3])
        return (w, h_abs, "bmp24", sr, sg, sb, True)

    def ppm_bytes_only(payload):
        import re

        if payload is None or not payload.startswith(b"P6"):
            return _FAIL
        m = re.match(rb"P6\s+(?:#[^\n]*\n\s*)*(\d+)\s+(\d+)\s+(\d+)\s", payload)
        if m is None:
            return _FAIL
        w, h, maxval = int(m.group(1)), int(m.group(2)), int(m.group(3))
        if maxval != 255 or w <= 0 or h <= 0:
            return _FAIL
        off = m.end()
        raster = payload[off : off + w * h * 3]
        if len(raster) < w * h * 3:
            return _FAIL
        return (w, h, "ppm", sum(raster[0::3]), sum(raster[1::3]), sum(raster[2::3]), True)

    def mock_fast(payload):
        if payload is not None and payload[:2] == b"BM":
            return bmp_bytes_only(bytes(payload))
        if payload is not None and payload[:2] == b"P6":
            return ppm_bytes_only(bytes(payload))
        return decode_image_bytes(payload)

    return mock_fast


def test_decode_image_seam_injected_callable_runs_on_executors(spark):
    rows = [(1, bytearray(mm.make_bmp_bytes(4, 3, 9))), (2, None)]
    df = spark.createDataFrame(rows, "id long, payload binary")
    got = mm.decode_image(df, "payload", decoder=_make_sentinel_decoder()).collect()
    assert {r.dec_fmt for r in got} == {"turbo-sentinel"}  # not the default codec


def test_decode_image_seam_keeps_zero_exchange_plan(spark):
    rows = [(1, bytearray(mm.make_bmp_bytes(4, 3, 9)))]
    df = spark.createDataFrame(rows, "id long, payload binary")
    plan = (
        mm.decode_image(df, "payload", decoder=_make_mock_fast_decoder())
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "Exchange" not in plan  # the swap point never changes the plan


def test_decode_image_seam_conformance_on_oracle_fixtures(spark):
    """The mock fast decoder must match the reference BIT-FOR-BIT over
    the same fixture families the driver oracles use (the derivations
    below mirror multimodal_bmp_decode / multimodal_jpeg_decode in
    beholder_spark/queries.py), including quarantine rows."""
    from pyspark.sql import functions as F

    ids = spark.range(60).select(F.col("id").alias("doc_id"))
    bmp = mm.with_bmp_payload(
        ids.select(
            "doc_id",
            (F.col("doc_id") % 17 + 1).alias("w"),
            (F.col("doc_id") % 9 + 1).alias("h"),
            (F.col("doc_id") % 256).alias("g"),
        ),
        "w", "h", "g",
    )
    jpg = mm.with_jpeg_payload(
        ids.select(
            "doc_id",
            (8 * (F.col("doc_id") % 3 + 1)).alias("w"),
            (8 * (F.col("doc_id") % 2 + 1)).alias("h"),
            (F.col("doc_id") % 256).alias("base"),
            (F.col("doc_id") % 97 + 1).alias("step"),
        ),
        "w", "h", "base", "step",
    )
    hostile = spark.createDataFrame(
        [(1000, bytearray(b"not an image")), (1001, None)], "doc_id long, payload binary"
    )
    for fixture in (bmp, jpg.unionByName(hostile, allowMissingColumns=True)):
        cols = [c for c in fixture.columns if c != "payload"]
        ref = {
            tuple(r[c] for c in cols): r
            for r in mm.decode_image(fixture, "payload").collect()
        }
        fast = {
            tuple(r[c] for c in cols): r
            for r in mm.decode_image(fixture, "payload", decoder=_make_mock_fast_decoder()).collect()
        }
        assert ref.keys() == fast.keys()
        for k in ref:
            assert tuple(ref[k]) == tuple(fast[k]), k
