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
    assert mm.decode_image_bytes(b"\x89PNG\r\n")[-1] is False  # compressed → stub domain


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
