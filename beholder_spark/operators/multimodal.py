"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Images/audio/video ride as ``binary`` columns with a metadata struct.
The Spark-side plumbing (schema, Arrow batch shape, mapInPandas
signature, partitioning) is real and tested. Decode is REAL (pure
Python/numpy, no codec libs) for every image format a crawl actually
carries — baseline AND progressive JPEG, PNG, GIF, BMP, PPM — plus
WAV-PCM audio, MP3 frame-header metadata, and AVI/MJPEG video frame
sampling. Only full audio/video DSP decode (MP3 synthesis, modern video
codecs) stays behind ``_decode_stub`` (deterministic fake metadata so
oracles stay exact); swap it for ffmpeg in production, nothing else
changes.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

DECODED_SCHEMA = T.StructType(
    [
        T.StructField("n_bytes", T.LongType(), True),
        T.StructField("width", T.LongType(), True),
        T.StructField("height", T.LongType(), True),
        T.StructField("format", T.StringType(), True),
    ]
)


def _decode_stub(payload: bytes | None) -> tuple:
    """Deterministic fake decode: metadata derived from byte length/content.

    Real implementation would be e.g. PIL.Image.open(BytesIO(payload));
    raise NotImplementedError there if codecs are mandatory. The stub
    keeps the full Arrow round-trip testable without codec libs.
    """
    if payload is None or len(payload) == 0:
        return (0 if payload is not None else None, None, None, None)
    n = len(payload)
    return (n, n % 640 + 1, (n * 7) % 480 + 1, "stub/raw")


def decode_binary(df: DataFrame, bin_col: str, out_prefix: str = "img_") -> DataFrame:
    """Decode/feature-extract over binary column via mapInPandas.

    mapInPandas (not a scalar UDF) because real decoders want batch-level
    amortization (shared codec contexts) and may change row multiplicity
    (e.g. video frame sampling). Arrow batches bound worker memory.
    """
    in_schema = df.schema
    out_schema = T.StructType(
        list(in_schema.fields)
        + [T.StructField(out_prefix + f.name, f.dataType, True) for f in DECODED_SCHEMA.fields]
    )

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            decoded = pdf[bin_col].map(_decode_stub)
            for i, f in enumerate(DECODED_SCHEMA.fields):
                pdf[out_prefix + f.name] = decoded.map(lambda t, i=i: t[i])
            yield pdf

    return df.mapInPandas(batches, out_schema)


def resize_stub(
    df: DataFrame,
    width_col: str,
    height_col: str,
    max_dim: int = 224,
    out_prefix: str = "rs_",
) -> DataFrame:
    """Resize planning (stubbed codec): compute the aspect-preserving
    target dims for a max_dim bounding box — integer arithmetic on the
    decoded metadata, entirely JVM-side (no pixels exist in the sandbox;
    a real resize plugs into :func:`decode_binary`'s mapInPandas with the
    same column contract).

    floor-scaling SPEC: scale = max_dim / max(w, h) applied as
    ``dim * max_dim / max(w, h)`` in integer division; images already
    inside the box pass through unchanged.
    """
    w, h = F.col(width_col), F.col(height_col)
    big = F.greatest(w, h)
    needs = big > max_dim
    new_w = F.when(needs, (w * max_dim / big).cast("long")).otherwise(w)
    new_h = F.when(needs, (h * max_dim / big).cast("long")).otherwise(h)
    return df.withColumn(out_prefix + "width", new_w).withColumn(out_prefix + "height", new_h)


EMBED_STUB_DIM = 8


def feature_stub(df: DataFrame, bin_col: str, out_col: str = "features") -> DataFrame:
    """Feature-extraction plumbing (stubbed model): deterministic
    pseudo-embedding array<long> derived from payload length — the real
    version swaps the arithmetic for a model forward pass inside the same
    mapInPandas batch loop (shared model context per batch, Arrow-bounded
    memory). feature[i] = (n_bytes * (i + 3)) % 17 - 8.
    """
    in_schema = df.schema
    out_schema = T.StructType(
        list(in_schema.fields) + [T.StructField(out_col, T.ArrayType(T.LongType()), True)]
    )

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            ns = pdf[bin_col].map(lambda b: len(b) if b is not None else None)
            pdf[out_col] = ns.map(
                lambda n: None
                if n is None
                else [(n * (i + 3)) % 17 - 8 for i in range(EMBED_STUB_DIM)]
            )
            yield pdf

    return df.mapInPandas(batches, out_schema)


def sample_frames(df: DataFrame, bin_col: str, id_col: str, every_n_bytes: int = 1000) -> DataFrame:
    """Frame-sampling shape: one input row → N output rows (one per fake
    'frame' = every_n_bytes chunk). Demonstrates multiplicity-changing
    mapInPandas; a real video sampler has the same signature.

    The row expansion is vectorized (np.repeat over the batch — the shape
    a real implementer should copy); only the byte-length probe touches
    the payload objects. A real sampler replaces the arithmetic with
    per-payload frame extraction inside the same batch loop.
    """
    out_schema = T.StructType(
        [
            T.StructField("id", T.LongType(), False),
            T.StructField("frame_no", T.LongType(), False),
            T.StructField("frame_bytes", T.LongType(), False),
        ]
    )

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        for pdf in it:
            ns = pdf[bin_col].map(lambda b: len(b) if b is not None else 0).to_numpy()
            n_frames = np.where(ns > 0, np.maximum(1, ns // every_n_bytes), 0)
            idx = np.repeat(np.arange(len(pdf)), n_frames)  # row i appears n_frames[i]×
            # frame_no = position within each row's run: global arange minus
            # the (repeated) start offset of that row's run
            starts = np.concatenate(([0], np.cumsum(n_frames)[:-1]))
            frame_no = np.arange(len(idx)) - np.repeat(starts, n_frames)
            yield pd.DataFrame(
                {
                    "id": pdf[id_col].to_numpy()[idx],
                    "frame_no": frame_no,
                    "frame_bytes": np.minimum(every_n_bytes, ns[idx] - frame_no * every_n_bytes),
                }
            )

    return df.mapInPandas(batches, out_schema)


# ---------------------------------------------------------------------------
# REAL decoders for uncompressed formats (r3). The container has no
# image/audio libs, but BMP/PPM/WAV-PCM need none: BMP and PPM are
# length-prefixed raster dumps and WAV-PCM is parsed by the stdlib
# `wave` module. PNG (r3), baseline+progressive JPEG, GIF, AVI/MJPEG
# frame sampling and MP3 metadata (r4) are decoded for real further
# below; only full audio/video DSP decode remains behind the documented
# stub. Decode SPEC, pinned here:
#   - BMP: 'BM' magic, BITMAPINFOHEADER, 24-bit, uncompressed only;
#     rows bottom-up, padded to 4 bytes; stored channel order is BGR,
#     outputs are LOGICAL RGB channel sums (integer-exact → DuckDB
#     oracle reproducible).
#   - PPM: binary 'P6', maxval 255.
#   - WAV: stdlib wave; mono/stereo 16-bit PCM; outputs n_channels,
#     sample_rate, n_samples, and the integer sum of samples.
#   Any violation → parse_ok False, other fields NULL (P7 contract).
# ---------------------------------------------------------------------------

# Resource-bomb guard (SPEC): decoder headers are UNTRUSTED. Any decode
# whose claimed raster exceeds this pixel count fails closed BEFORE any
# allocation proportional to the claim (a ~90-byte payload can otherwise
# declare a 65535x65535 frame and kill the executor with an allocation,
# or a GIF/PNG compression bomb can inflate a few MB thousands-fold).
# 64 MP is far beyond real crawled images; production knob, raise as
# needed (worst-case transient at the cap is ~1.5 GB in the progressive
# JPEG finish pass).
MAX_DECODE_PIXELS = 64_000_000

IMAGE_DECODED_SCHEMA = T.StructType(
    [
        T.StructField("width", T.LongType(), True),
        T.StructField("height", T.LongType(), True),
        T.StructField("fmt", T.StringType(), True),
        T.StructField("sum_r", T.LongType(), True),
        T.StructField("sum_g", T.LongType(), True),
        T.StructField("sum_b", T.LongType(), True),
        T.StructField("parse_ok", T.BooleanType(), True),
    ]
)

_FAIL = (None, None, None, None, None, None, False)


def decode_bmp_bytes(payload: bytes | None) -> tuple:
    """Parse a 24-bit uncompressed BMP: header fields + per-channel pixel
    sums (numpy over the raster; padding stripped, bottom-up respected)."""
    import struct

    import numpy as np

    if payload is None or len(payload) < 54 or payload[:2] != b"BM":
        return _FAIL
    data_off = struct.unpack_from("<I", payload, 10)[0]
    hdr_size, w, h = struct.unpack_from("<Iii", payload, 14)
    planes, bpp = struct.unpack_from("<HH", payload, 26)
    compression = struct.unpack_from("<I", payload, 30)[0]
    if hdr_size < 40 or planes != 1 or bpp != 24 or compression != 0 or w <= 0 or h == 0:
        return _FAIL
    # fail-closed: a data offset pointing INTO the headers (< 14-byte file
    # header + DIB header) would decode header bytes as raster with
    # parse_ok=True — that violates the P7 contract above
    if data_off < 14 + hdr_size:
        return _FAIL
    bottom_up = h > 0
    h_abs = abs(h)
    row_stride = (w * 3 + 3) & ~3  # rows padded to 4-byte multiples
    need = data_off + row_stride * h_abs
    if len(payload) < need:
        return _FAIL
    raster = np.frombuffer(payload, dtype=np.uint8, count=row_stride * h_abs, offset=data_off)
    rows = raster.reshape(h_abs, row_stride)[:, : w * 3].reshape(h_abs, w, 3)
    if bottom_up:
        rows = rows[::-1]
    sums = rows.reshape(-1, 3).astype(np.int64).sum(axis=0)
    # stored BGR → logical RGB
    return (w, h_abs, "bmp24", int(sums[2]), int(sums[1]), int(sums[0]), True)


def decode_ppm_bytes(payload: bytes | None) -> tuple:
    """Parse binary PPM ('P6', maxval 255): dims + RGB channel sums."""
    import re as _re

    import numpy as np

    if payload is None or not payload.startswith(b"P6"):
        return _FAIL
    # header: P6 <ws> width <ws> height <ws> maxval <single ws> raster
    m = _re.match(rb"P6\s+(?:#[^\n]*\n\s*)*(\d+)\s+(\d+)\s+(\d+)\s", payload)
    if m is None:
        return _FAIL
    w, h, maxval = int(m.group(1)), int(m.group(2)), int(m.group(3))
    if maxval != 255 or w <= 0 or h <= 0:
        return _FAIL
    off = m.end()
    if len(payload) < off + w * h * 3:
        return _FAIL
    px = np.frombuffer(payload, dtype=np.uint8, count=w * h * 3, offset=off)
    sums = px.reshape(-1, 3).astype(np.int64).sum(axis=0)
    return (w, h, "ppm", int(sums[0]), int(sums[1]), int(sums[2]), True)


def decode_image_bytes(payload: bytes | None) -> tuple:
    """Magic-byte dispatch: real decode for BMP/PPM/PNG/JPEG (baseline
    AND progressive)/GIF, fail-closed else (full audio/video DSP decode
    stays in the documented stub domain)."""
    if payload is None:
        return _FAIL
    if payload[:2] == b"BM":
        return decode_bmp_bytes(payload)
    if payload[:2] == b"P6":
        return decode_ppm_bytes(payload)
    if bytes(payload[:8]) == _PNG_SIG:
        return decode_png_bytes(payload)
    if bytes(payload[:3]) == b"\xff\xd8\xff":
        return decode_jpeg_bytes(payload)
    if bytes(payload[:6]) in (b"GIF87a", b"GIF89a"):
        return decode_gif_bytes(payload)
    return _FAIL


def decode_image(
    df: DataFrame,
    bin_col: str,
    out_prefix: str = "dec_",
    decoder=None,
) -> DataFrame:
    """REAL image decode over a binary column (BMP/PPM/PNG/JPEG/GIF —
    see module SPEC) via the same mapInPandas shape as
    :func:`decode_binary`; a compressed or malformed payload quarantines
    with parse_ok False.

    ``decoder`` is the CODEC INJECTION SEAM (VERDICT r4 item 3): any
    callable ``bytes|None -> 7-tuple`` matching IMAGE_DECODED_SCHEMA
    (w, h, fmt, sum_r, sum_g, sum_b, parse_ok) slots into the identical
    zero-exchange plan — this is how a production deployment swaps the
    pure-Python reference codec for a C decoder (e.g. a
    PIL/libjpeg-turbo adapter) without touching the plan. The callable
    is cloudpickled to executors, so module-level functions and
    closures over picklable state both work. Conformance contract: a
    swapped decoder must match the reference bit-for-bit on the oracle
    fixture families (test_multimodal.py::test_decode_image_decoder_
    seam_* is the harness). Defaults to :func:`decode_image_bytes`.
    """
    dec = decode_image_bytes if decoder is None else decoder
    in_schema = df.schema
    out_schema = T.StructType(
        list(in_schema.fields)
        + [T.StructField(out_prefix + f.name, f.dataType, True) for f in IMAGE_DECODED_SCHEMA.fields]
    )

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            decoded = pdf[bin_col].map(dec)
            for i, f in enumerate(IMAGE_DECODED_SCHEMA.fields):
                pdf[out_prefix + f.name] = decoded.map(lambda t, i=i: t[i])
            yield pdf

    return df.mapInPandas(batches, out_schema)


AUDIO_DECODED_SCHEMA = T.StructType(
    [
        T.StructField("n_channels", T.LongType(), True),
        T.StructField("sample_rate", T.LongType(), True),
        T.StructField("n_samples", T.LongType(), True),
        T.StructField("sum_samples", T.LongType(), True),
        T.StructField("parse_ok", T.BooleanType(), True),
    ]
)


def decode_wav_bytes(payload: bytes | None) -> tuple:
    """Parse WAV 16-bit PCM via the stdlib wave module: header fields +
    integer sample sum (numpy int16 view of the frame bytes)."""
    import io
    import wave

    import numpy as np

    if payload is None:
        return (None, None, None, None, False)
    try:
        with wave.open(io.BytesIO(bytes(payload)), "rb") as wf:
            if wf.getsampwidth() != 2:
                return (None, None, None, None, False)
            nch, rate, n = wf.getnchannels(), wf.getframerate(), wf.getnframes()
            frames = wf.readframes(n)
    except (wave.Error, EOFError):
        return (None, None, None, None, False)
    samples = np.frombuffer(frames, dtype="<i2")
    return (nch, rate, n, int(samples.astype(np.int64).sum()), True)


def decode_audio(df: DataFrame, bin_col: str, out_prefix: str = "au_") -> DataFrame:
    """REAL audio decode (WAV 16-bit PCM) over a binary column."""
    in_schema = df.schema
    out_schema = T.StructType(
        list(in_schema.fields)
        + [T.StructField(out_prefix + f.name, f.dataType, True) for f in AUDIO_DECODED_SCHEMA.fields]
    )

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            decoded = pdf[bin_col].map(decode_wav_bytes)
            for i, f in enumerate(AUDIO_DECODED_SCHEMA.fields):
                pdf[out_prefix + f.name] = decoded.map(lambda t, i=i: t[i])
            yield pdf

    return df.mapInPandas(batches, out_schema)


def make_bmp_bytes(w: int, h: int, g: int) -> bytes:
    """Deterministic 24-bit BMP fixture: pixel (x, y) = RGB((x+y) % 256,
    g, 7), rows bottom-up with standard padding. Used by tests and the
    oracle roundtrip query (sums have closed forms for small dims)."""
    import struct

    row_stride = (w * 3 + 3) & ~3
    raster = bytearray()
    for y_file in range(h):  # file order is bottom-up
        y = h - 1 - y_file
        row = bytearray()
        for x in range(w):
            r = (x + y) % 256
            row += bytes((7, g, r))  # stored BGR
        row += b"\x00" * (row_stride - len(row))
        raster += row
    size = 54 + len(raster)
    header = (
        b"BM" + struct.pack("<IHHI", size, 0, 0, 54)
        + struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0, len(raster), 2835, 2835, 0, 0)
    )
    return bytes(header + raster)


def make_wav_bytes(n: int) -> bytes:
    """Deterministic mono 16-bit PCM WAV fixture: sample i = (i % 97) - 48
    at 8000 Hz — the sum has a closed form for n <= 97."""
    import io
    import struct
    import wave

    buf = io.BytesIO()
    with wave.open(buf, "wb") as wf:
        wf.setnchannels(1)
        wf.setsampwidth(2)
        wf.setframerate(8000)
        wf.writeframes(struct.pack(f"<{n}h", *(((i % 97) - 48) for i in range(n))))
    return buf.getvalue()


@F.pandas_udf(T.BinaryType())
def _make_bmp_udf(cols: pd.DataFrame) -> pd.Series:
    return pd.Series(
        [make_bmp_bytes(int(w), int(h), int(g)) for w, h, g in cols.itertuples(index=False)]
    )


@F.pandas_udf(T.BinaryType())
def _make_wav_udf(n: pd.Series) -> pd.Series:
    return pd.Series([make_wav_bytes(int(v)) for v in n])


def with_bmp_payload(df: DataFrame, w_col: str, h_col: str, g_col: str, out: str = "payload") -> DataFrame:
    """Deterministic BMP fixture column (see :func:`make_bmp_bytes`)."""
    return df.withColumn(out, _make_bmp_udf(F.struct(w_col, h_col, g_col)))


def with_wav_payload(df: DataFrame, n_col: str, out: str = "payload") -> DataFrame:
    """Deterministic WAV fixture column (see :func:`make_wav_bytes`)."""
    return df.withColumn(out, _make_wav_udf(F.col(n_col)))


def _png_defilter(data: bytes, w: int, h: int, ch: int):
    """Reverse PNG scanline filtering (types 0–4). Up/Sub vectorize
    (uint8 wraparound / per-lane cumsum); Average/Paeth are inherently
    sequential per byte — fine for fixture-scale rasters, and at corpus
    scale each image is one row's work inside an Arrow batch anyway."""
    import numpy as np

    stride = w * ch
    out = np.zeros((h, stride), dtype=np.uint8)
    pos = 0
    for y in range(h):
        if pos >= len(data):
            raise ValueError("truncated raster")
        f = data[pos]
        pos += 1
        if pos + stride > len(data):
            raise ValueError("truncated raster")
        row = np.frombuffer(data, np.uint8, stride, pos).copy()
        pos += stride
        prev = out[y - 1] if y > 0 else np.zeros(stride, np.uint8)
        if f == 0:
            out[y] = row
        elif f == 1:  # Sub: per-channel-lane prefix sum mod 256
            r = row.reshape(w, ch).astype(np.uint32)
            out[y] = (np.cumsum(r, axis=0) % 256).astype(np.uint8).reshape(stride)
        elif f == 2:  # Up: uint8 addition wraps mod 256
            out[y] = row + prev
        elif f == 3:  # Average
            o = out[y]
            for x in range(stride):
                a = int(o[x - ch]) if x >= ch else 0
                o[x] = (int(row[x]) + (a + int(prev[x])) // 2) & 0xFF
        elif f == 4:  # Paeth
            o = out[y]
            for x in range(stride):
                a = int(o[x - ch]) if x >= ch else 0
                b = int(prev[x])
                c = int(prev[x - ch]) if x >= ch else 0
                p = a + b - c
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                pred = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
                o[x] = (int(row[x]) + pred) & 0xFF
        else:
            raise ValueError(f"unknown filter {f}")
    return out


_PNG_SIG = b"\x89PNG\r\n\x1a\n"
_PNG_CHANNELS = {0: 1, 2: 3, 6: 4}  # gray, RGB, RGBA (8-bit, non-interlaced)


def decode_png_bytes(payload: bytes | None) -> tuple:
    """REAL PNG decode (stdlib zlib + numpy defilter): 8-bit gray/RGB/
    RGBA, non-interlaced, all five filter types, chunk CRCs verified.
    Output matches the BMP/PPM shape; gray images report the gray sum in
    all three channels; RGBA alpha is excluded from the sums (SPEC)."""
    import struct
    import zlib

    import numpy as np

    if payload is None or not bytes(payload).startswith(_PNG_SIG):
        return _FAIL
    buf = bytes(payload)
    pos = len(_PNG_SIG)
    ihdr = None
    idat = bytearray()
    try:
        while pos + 8 <= len(buf):
            length, typ = struct.unpack_from(">I4s", buf, pos)
            data = buf[pos + 8 : pos + 8 + length]
            if len(data) != length or pos + 12 + length > len(buf):
                return _FAIL
            (crc,) = struct.unpack_from(">I", buf, pos + 8 + length)
            if zlib.crc32(typ + data) & 0xFFFFFFFF != crc:
                return _FAIL
            pos += 12 + length
            if typ == b"IHDR":
                ihdr = struct.unpack(">IIBBBBB", data)
            elif typ == b"IDAT":
                idat += data
            elif typ == b"IEND":
                break
        if ihdr is None or not idat:
            return _FAIL
        w, h, depth, color, comp, filt, interlace = ihdr
        ch = _PNG_CHANNELS.get(color)
        if depth != 8 or ch is None or comp != 0 or filt != 0 or interlace != 0 or w == 0 or h == 0:
            return _FAIL
        if w * h > MAX_DECODE_PIXELS:
            return _FAIL
        # bounded inflate: a zlib bomb must not expand past the raster the
        # header promises (exact length is re-checked by the defilter)
        dec = zlib.decompressobj()
        expected = h * (1 + w * ch)
        inflated = dec.decompress(bytes(idat), expected)
        if len(inflated) != expected or dec.unconsumed_tail or dec.decompress(b"", 1):
            return _FAIL
        raster = _png_defilter(inflated, w, h, ch)
    except (struct.error, zlib.error, ValueError):
        return _FAIL
    px = raster.reshape(h, w, ch).astype(np.int64)
    if ch == 1:
        s = int(px.sum())
        return (w, h, "png8-gray", s, s, s, True)
    sums = px.reshape(-1, ch).sum(axis=0)
    fmt = "png8-rgb" if ch == 3 else "png8-rgba"
    return (w, h, fmt, int(sums[0]), int(sums[1]), int(sums[2]), True)


def make_png_bytes(w: int, h: int, g: int) -> bytes:
    """Deterministic 8-bit RGB PNG fixture (filter-0 rows, same pixel
    formula as :func:`make_bmp_bytes` → same closed-form sums)."""
    import struct
    import zlib

    raw = bytearray()
    for y in range(h):
        raw.append(0)  # filter type 0
        for x in range(w):
            raw += bytes((((x + y) % 256), g, 7))

    def chunk(typ: bytes, data: bytes) -> bytes:
        return (
            struct.pack(">I", len(data)) + typ + data
            + struct.pack(">I", zlib.crc32(typ + data) & 0xFFFFFFFF)
        )

    ihdr = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)
    return (
        _PNG_SIG + chunk(b"IHDR", ihdr) + chunk(b"IDAT", zlib.compress(bytes(raw)))
        + chunk(b"IEND", b"")
    )


@F.pandas_udf(T.BinaryType())
def _make_png_udf(cols: pd.DataFrame) -> pd.Series:
    return pd.Series(
        [make_png_bytes(int(w), int(h), int(g)) for w, h, g in cols.itertuples(index=False)]
    )


def with_png_payload(df: DataFrame, w_col: str, h_col: str, g_col: str, out: str = "payload") -> DataFrame:
    return df.withColumn(out, _make_png_udf(F.struct(w_col, h_col, g_col)))


# ---------------------------------------------------------------------------
# REAL baseline-JPEG decode (r4) — the dominant real-CC image format out
# of the stub, the PNG playbook applied to a lossy codec: pure Python
# marker/Huffman parse + numpy dequant/IDCT. Decode SPEC, pinned here:
#   - baseline DCT only (SOF0), 8-bit precision, 1 or 3 components,
#     component sampling factors in {1, 2} (4:4:4 / 4:2:2 / 4:2:0),
#     8-bit DQT tables, restart markers honored (DC predictors reset).
#   - chroma upsampling is PIXEL REPLICATION (nearest neighbor);
#     YCbCr→RGB is the JFIF formula, each stage np.round + clip 0..255.
#   - progressive (SOF2) / arithmetic / 12-bit / hierarchical frames,
#     truncated streams, undefined Huffman codes, bad marker structure:
#     parse_ok False, fields NULL (P7 fail-closed contract).
# Per-image work is a pure-Python Huffman bit loop + numpy IDCT — the
# CORRECTNESS implementation for this engine; a production deployment
# swaps libjpeg-turbo into the same mapInPandas slot (decode_image),
# nothing else changes.
# ---------------------------------------------------------------------------

_JPEG_ZIGZAG = [
    0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63,
]


def _jpeg_idct_matrix():
    import numpy as np

    a = np.zeros((8, 8))
    for u in range(8):
        c = (1.0 / np.sqrt(2.0)) if u == 0 else 1.0
        for x in range(8):
            a[u, x] = (c / 2.0) * np.cos((2 * x + 1) * u * np.pi / 16.0)
    return a


class _JpegBitReader:
    """MSB-first bit reader over an UNSTUFFED entropy segment."""

    def __init__(self, data: bytes):
        self.data = data
        self.pos = 0
        self.bit = 0

    def read_bit(self) -> int:
        if self.pos >= len(self.data):
            raise ValueError("entropy data exhausted")
        b = (self.data[self.pos] >> (7 - self.bit)) & 1
        self.bit += 1
        if self.bit == 8:
            self.bit = 0
            self.pos += 1
        return b

    def read_bits(self, n: int) -> int:
        v = 0
        for _ in range(n):
            v = (v << 1) | self.read_bit()
        return v


def _jpeg_build_huffman(bits: list[int], vals: bytes) -> dict:
    """Canonical JPEG Huffman table: {(length, code): symbol}."""
    table = {}
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            table[(length, code)] = vals[k]
            code += 1
            k += 1
        code <<= 1
    return table


def _jpeg_huff_decode(reader: _JpegBitReader, table: dict) -> int:
    code = 0
    for length in range(1, 17):
        code = (code << 1) | reader.read_bit()
        sym = table.get((length, code))
        if sym is not None:
            return sym
    raise ValueError("undefined Huffman code")


def _jpeg_extend(v: int, size: int) -> int:
    if size == 0:
        return 0
    return v if v >= (1 << (size - 1)) else v - (1 << size) + 1


def _jpeg_unstuff(buf: bytes, pos: int) -> tuple[list[bytes], int]:
    """Split the entropy-coded stream into restart segments with 0xFF00
    stuffing removed; returns (segments, position of the terminating
    marker's 0xFF)."""
    segs: list[bytearray] = [bytearray()]
    while pos < len(buf):
        b = buf[pos]
        if b != 0xFF:
            segs[-1].append(b)
            pos += 1
            continue
        if pos + 1 >= len(buf):
            raise ValueError("dangling 0xFF at stream end")
        m = buf[pos + 1]
        if m == 0x00:
            segs[-1].append(0xFF)
            pos += 2
        elif 0xD0 <= m <= 0xD7:  # RSTn: segment boundary
            segs.append(bytearray())
            pos += 2
        else:
            return [bytes(s) for s in segs], pos
    raise ValueError("entropy stream missing terminating marker")


def _jpeg_parse_dqt(body: bytes, qt: dict) -> None:
    """Parse a DQT segment into `qt` (shared by the baseline and
    progressive marker walks — keep them on ONE parser)."""
    import numpy as np

    bp = 0
    while bp < len(body):
        pq, tq = body[bp] >> 4, body[bp] & 0xF
        if pq != 0:
            raise ValueError("16-bit quant tables unsupported")
        if bp + 65 > len(body):
            raise ValueError("truncated DQT")
        tbl = np.zeros(64, dtype=np.int64)
        for i in range(64):
            tbl[_JPEG_ZIGZAG[i]] = body[bp + 1 + i]
        qt[tq] = tbl.reshape(8, 8)
        bp += 65


def _jpeg_parse_dht(body: bytes, huff_dc: dict, huff_ac: dict) -> None:
    """Parse a DHT segment into the DC/AC table dicts (shared walker)."""
    bp = 0
    while bp < len(body):
        tc, th = body[bp] >> 4, body[bp] & 0xF
        bits = list(body[bp + 1 : bp + 17])
        nv = sum(bits)
        vals = body[bp + 17 : bp + 17 + nv]
        if len(bits) != 16 or len(vals) != nv:
            raise ValueError("truncated DHT")
        (huff_dc if tc == 0 else huff_ac)[th] = _jpeg_build_huffman(bits, vals)
        bp += 17 + nv


def decode_jpeg_bytes(payload: bytes | None) -> tuple:
    """REAL baseline-JPEG decode (see SPEC block above). Output matches
    the BMP/PPM/PNG shape: (w, h, fmt, sum_r, sum_g, sum_b, parse_ok);
    grayscale reports the gray sum in all three channels."""
    import struct

    import numpy as np

    if payload is None or bytes(payload[:3]) != b"\xff\xd8\xff":
        return _FAIL
    buf = bytes(payload)
    try:
        pos = 2
        qt: dict[int, np.ndarray] = {}
        huff_dc: dict[int, dict] = {}
        huff_ac: dict[int, dict] = {}
        frame = None  # (w, h, [(cid, hi, vi, tq), ...])
        restart_interval = 0
        scan = None
        while pos + 4 <= len(buf):
            if buf[pos] != 0xFF:
                raise ValueError("expected marker")
            marker = buf[pos + 1]
            pos += 2
            if marker in (0xD8, 0x01) or 0xD0 <= marker <= 0xD7:
                continue
            (seglen,) = struct.unpack_from(">H", buf, pos)
            body = buf[pos + 2 : pos + seglen]
            if len(body) != seglen - 2:
                raise ValueError("truncated segment")
            if marker == 0xDB:  # DQT
                _jpeg_parse_dqt(body, qt)
            elif marker == 0xC0:  # SOF0 baseline
                prec, h, w, nc = body[0], *struct.unpack_from(">HH", body, 1), body[5]
                if prec != 8 or nc not in (1, 3) or w == 0 or h == 0:
                    raise ValueError("unsupported frame")
                if w * h > MAX_DECODE_PIXELS:
                    raise ValueError("claimed raster exceeds decode cap")
                comps = []
                for i in range(nc):
                    cid, hv, tq = body[6 + 3 * i], body[7 + 3 * i], body[8 + 3 * i]
                    hi, vi = hv >> 4, hv & 0xF
                    if hi not in (1, 2) or vi not in (1, 2):
                        raise ValueError("sampling factor out of supported range")
                    comps.append((cid, hi, vi, tq))
                frame = (w, h, comps)
            elif marker == 0xC2:  # SOF2 progressive: scan-accumulating path (r4)
                return _decode_jpeg_progressive(buf)
            elif marker in (0xC1, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF):
                raise ValueError("unsupported frame type")  # fail-closed
            elif marker == 0xC4:  # DHT
                _jpeg_parse_dht(body, huff_dc, huff_ac)
            elif marker == 0xDD:  # DRI
                (restart_interval,) = struct.unpack_from(">H", body, 0)
            elif marker == 0xDA:  # SOS
                ns = body[0]
                scomps = []
                for i in range(ns):
                    cs, tbl = body[1 + 2 * i], body[2 + 2 * i]
                    scomps.append((cs, tbl >> 4, tbl & 0xF))
                ss, se = body[1 + 2 * ns], body[2 + 2 * ns]
                if ss != 0 or se != 63:
                    raise ValueError("partial spectral selection (progressive?)")
                scan = scomps
                pos += seglen
                break
            pos += seglen
        if frame is None or scan is None:
            raise ValueError("missing SOF0/SOS")
        w, h, comps = frame
        if len(scan) != len(comps):
            raise ValueError("scan/frame component mismatch")

        segments, _ = _jpeg_unstuff(buf, pos)
        hmax = max(c[1] for c in comps)
        vmax = max(c[2] for c in comps)
        mcux = (w + 8 * hmax - 1) // (8 * hmax)
        mcuy = (h + 8 * vmax - 1) // (8 * vmax)
        planes = []
        for cid, hi, vi, tq in comps:
            planes.append(np.zeros((mcuy * vi * 8, mcux * hi * 8), dtype=np.float64))
        idct = _jpeg_idct_matrix()
        dc_tbl, ac_tbl, qtbl = [], [], []
        for (cid, hi, vi, tq), (cs, td, ta) in zip(comps, scan):
            if cs != cid:
                raise ValueError("scan order differs from frame order")
            dc_tbl.append(huff_dc[td])
            ac_tbl.append(huff_ac[ta])
            qtbl.append(qt[tq])

        n_mcus = mcux * mcuy
        mcu_idx = 0
        seg_i = 0
        reader = _JpegBitReader(segments[0])
        pred = [0] * len(comps)
        while mcu_idx < n_mcus:
            if restart_interval and mcu_idx and mcu_idx % restart_interval == 0:
                seg_i += 1
                if seg_i >= len(segments):
                    raise ValueError("missing restart segment")
                reader = _JpegBitReader(segments[seg_i])
                pred = [0] * len(comps)
            my, mx = divmod(mcu_idx, mcux)
            for ci, (cid, hi, vi, tq) in enumerate(comps):
                for by in range(vi):
                    for bx in range(hi):
                        coef = np.zeros(64, dtype=np.int64)
                        s = _jpeg_huff_decode(reader, dc_tbl[ci])
                        if s > 11:
                            raise ValueError("DC size out of range")
                        diff = _jpeg_extend(reader.read_bits(s), s)
                        pred[ci] += diff
                        coef[0] = pred[ci]
                        k = 0
                        while k < 63:
                            sym = _jpeg_huff_decode(reader, ac_tbl[ci])
                            r, sz = sym >> 4, sym & 0xF
                            if sz == 0:
                                if sym == 0xF0:
                                    k += 16
                                    continue
                                break  # EOB
                            k += r + 1
                            if k > 63:
                                raise ValueError("AC index overflow")
                            coef[_JPEG_ZIGZAG[k]] = _jpeg_extend(reader.read_bits(sz), sz)
                        block = coef.reshape(8, 8) * qtbl[ci]
                        px = idct.T @ block @ idct
                        px = np.clip(np.round(px + 128.0), 0, 255)
                        y0 = (my * vi + by) * 8
                        x0 = (mx * hi + bx) * 8
                        planes[ci][y0 : y0 + 8, x0 : x0 + 8] = px
            mcu_idx += 1

        # upsample to full resolution (pixel replication) and crop
        full = []
        for (cid, hi, vi, tq), plane in zip(comps, planes):
            up = np.repeat(np.repeat(plane, vmax // vi, axis=0), hmax // hi, axis=1)
            full.append(up[:h, :w])
        if len(comps) == 1:
            sgray = int(full[0].astype(np.int64).sum())
            return (w, h, "jpeg-baseline-gray", sgray, sgray, sgray, True)
        y, cb, cr = full
        r = np.clip(np.round(y + 1.402 * (cr - 128.0)), 0, 255)
        g = np.clip(np.round(y - 0.344136 * (cb - 128.0) - 0.714136 * (cr - 128.0)), 0, 255)
        b = np.clip(np.round(y + 1.772 * (cb - 128.0)), 0, 255)
        return (
            w, h, "jpeg-baseline",
            int(r.astype(np.int64).sum()),
            int(g.astype(np.int64).sum()),
            int(b.astype(np.int64).sum()),
            True,
        )
    except (ValueError, IndexError, KeyError, struct.error):
        return _FAIL


class _JpegBitWriter:
    """MSB-first bit writer with 0xFF byte stuffing (fixture encoder)."""

    def __init__(self):
        self.out = bytearray()
        self.acc = 0
        self.n = 0

    def write(self, val: int, bits: int) -> None:
        for i in range(bits - 1, -1, -1):
            self.acc = (self.acc << 1) | ((val >> i) & 1)
            self.n += 1
            if self.n == 8:
                self.out.append(self.acc)
                if self.acc == 0xFF:
                    self.out.append(0x00)
                self.acc = 0
                self.n = 0

    def flush(self) -> None:
        if self.n:
            pad = 8 - self.n
            self.acc = (self.acc << pad) | ((1 << pad) - 1)
            self.out.append(self.acc)
            if self.acc == 0xFF:
                self.out.append(0x00)
            self.acc = 0
            self.n = 0

    def marker(self, m: int) -> None:
        self.flush()
        self.out += bytes((0xFF, m))


# Fixture Huffman specs (canonical bits/values — NOT the Annex K tables;
# minimal tables covering exactly the symbols the analytic encoder emits:
# DC sizes 0..11 at length 4, AC EOB/ZRL/(run<=6, size<=10) at length 7).
_JFIX_DC_BITS = [0, 0, 0, 12, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0]
_JFIX_DC_VALS = bytes(range(12))
_JFIX_AC_VALS = bytes(
    [0x00, 0xF0]
    + [(r << 4) | s for r in range(7) for s in range(1, 11)]
    + [r << 4 for r in range(1, 7)]  # EOBn run symbols (progressive scans)
)
_JFIX_AC_BITS = [0, 0, 0, 0, 0, 0, len(_JFIX_AC_VALS), 0, 0, 0, 0, 0, 0, 0, 0, 0]


def _jfix_codes(bits: list[int], vals: bytes) -> dict:
    codes = {}
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            codes[vals[k]] = (length, code)
            code += 1
            k += 1
        code <<= 1
    return codes


_JFIX_DC_CODES = _jfix_codes(_JFIX_DC_BITS, _JFIX_DC_VALS)
_JFIX_AC_CODES = _jfix_codes(_JFIX_AC_BITS, _JFIX_AC_VALS)
# zigzag index of natural coefficient (4,4) — the one AC basis function
# whose IDCT is exactly ±coef/8 (a 2x2 checkerboard), kept bit-exact
_JFIX_AC44_ZZ = _JPEG_ZIGZAG.index(36)


def _jfix_write_coef(bw: _JpegBitWriter, codes: dict, sym_size: int, value: int, run: int = -1) -> None:
    """Huffman symbol + magnitude bits for one coefficient."""
    sym = sym_size if run < 0 else ((run << 4) | sym_size)
    length, code = codes[sym]
    bw.write(code, length)
    if sym_size:
        bits = value if value > 0 else value + (1 << sym_size) - 1
        bw.write(bits, sym_size)


def make_jpeg_bytes(
    w: int,
    h: int,
    base: int,
    step: int,
    ac44: int = 0,
    subsample: bool = False,
    restart_interval: int = 0,
    gray: bool = False,
) -> bytes:
    """Deterministic baseline-JFIF fixture, composed ANALYTICALLY in the
    coefficient domain (no forward DCT): all-ones quant tables, neutral
    chroma (Cb=Cr=128), luma block i solid at v_i = (base + i*step) % 256
    (i = raster index over the padded block grid), plus an optional
    F(4,4) coefficient 8*ac44 (an exact ±ac44 2x2 checkerboard). With
    the decoder's float64 IDCT these reconstruct BIT-EXACTLY, which is
    what makes a LOSSY codec oracle-checkable: decoded r=g=b=v_i, so
    channel sums have the closed form Σ 64*v_i (ac44 sums to zero).

    ``subsample=True`` emits 4:2:0 (luma 2x2, chroma 1x1 — w, h must be
    multiples of 16); default is 4:4:4 (multiples of 8). ``gray=True``
    emits a 1-component frame. ``restart_interval`` emits DRI + RSTn
    markers every N MCUs.
    """
    import struct

    if gray and subsample:
        raise ValueError("gray fixtures are single-component (no subsampling)")
    if subsample:
        if w % 16 or h % 16:
            raise ValueError("4:2:0 fixture needs w, h multiples of 16")
        luma_hv, mcu_w, mcu_h = (2, 2), 16, 16
    else:
        if w % 8 or h % 8:
            raise ValueError("4:4:4 fixture needs w, h multiples of 8")
        luma_hv, mcu_w, mcu_h = (1, 1), 8, 8
    mcux, mcuy = w // mcu_w, h // mcu_h
    blocks_per_row = mcux * luma_hv[0]

    def seg(marker: int, body: bytes) -> bytes:
        return bytes((0xFF, marker)) + struct.pack(">H", len(body) + 2) + body

    out = bytearray(b"\xff\xd8")  # SOI
    out += seg(0xE0, b"JFIF\x00\x01\x01\x00" + struct.pack(">HH", 1, 1) + b"\x00\x00")
    out += seg(0xDB, bytes([0x00]) + bytes([1] * 64))  # DQT 0: all ones
    ncomp = 1 if gray else 3
    sof = struct.pack(">BHHB", 8, h, w, ncomp)
    sof += bytes((1, (luma_hv[0] << 4) | luma_hv[1], 0))  # Y
    if not gray:
        sof += bytes((2, 0x11, 0)) + bytes((3, 0x11, 0))  # Cb, Cr
    out += seg(0xC0, sof)
    out += seg(0xC4, bytes([0x00]) + bytes(_JFIX_DC_BITS) + _JFIX_DC_VALS)
    out += seg(0xC4, bytes([0x10]) + bytes(_JFIX_AC_BITS) + _JFIX_AC_VALS)
    if restart_interval:
        out += seg(0xDD, struct.pack(">H", restart_interval))
    if gray:
        out += seg(0xDA, bytes((1, 1, 0x00, 0, 63, 0)))
    else:
        out += seg(0xDA, bytes((3, 1, 0x00, 2, 0x00, 3, 0x00, 0, 63, 0)))

    bw = _JpegBitWriter()
    pred = [0, 0, 0]
    rst = 0
    for mcu in range(mcux * mcuy):
        if restart_interval and mcu and mcu % restart_interval == 0:
            bw.marker(0xD0 + rst)
            rst = (rst + 1) & 7
            pred = [0, 0, 0]
        my, mx = divmod(mcu, mcux)
        # luma blocks of this MCU
        for by in range(luma_hv[1]):
            for bx in range(luma_hv[0]):
                i = (my * luma_hv[1] + by) * blocks_per_row + (mx * luma_hv[0] + bx)
                v = (base + i * step) % 256
                dc = 8 * (v - 128)
                diff = dc - pred[0]
                pred[0] = dc
                s = abs(diff).bit_length()
                _jfix_write_coef(bw, _JFIX_DC_CODES, s, diff)
                if ac44:
                    # 38 zeros to zigzag index 39: two ZRL then run 6
                    la, ca = _JFIX_AC_CODES[0xF0]
                    bw.write(ca, la)
                    bw.write(ca, la)
                    _jfix_write_coef(
                        bw, _JFIX_AC_CODES, abs(8 * ac44).bit_length(), 8 * ac44, run=6
                    )
                la, ca = _JFIX_AC_CODES[0x00]
                bw.write(ca, la)  # EOB
        if not gray:
            for ci in (1, 2):  # neutral chroma: DC diff 0, EOB
                _jfix_write_coef(bw, _JFIX_DC_CODES, 0, 0)
                la, ca = _JFIX_AC_CODES[0x00]
                bw.write(ca, la)
    bw.flush()
    out += bw.out
    out += b"\xff\xd9"  # EOI
    return bytes(out)


@F.pandas_udf(T.BinaryType())
def _make_jpeg_udf(cols: pd.DataFrame) -> pd.Series:
    return pd.Series(
        [
            make_jpeg_bytes(int(w), int(h), int(base), int(step))
            for w, h, base, step in cols.itertuples(index=False)
        ]
    )


def with_jpeg_payload(
    df: DataFrame, w_col: str, h_col: str, base_col: str, step_col: str, out: str = "payload"
) -> DataFrame:
    """Deterministic baseline-JPEG fixture column (see :func:`make_jpeg_bytes`)."""
    return df.withColumn(out, _make_jpeg_udf(F.struct(w_col, h_col, base_col, step_col)))


# ---------------------------------------------------------------------------
# REAL GIF decode (r4). After JPEG, GIF is the web's other ubiquitous
# legacy image format, and its LZW stream needs no codec libs. Decode
# SPEC, pinned here (change this comment, not behavior):
#   - GIF87a/GIF89a magic; logical screen descriptor; the FIRST image
#     frame only is decoded (animation frames after it are ignored);
#     extensions before it are skipped structurally (sub-block walk).
#   - Color table: local table overrides global; no table at all is a
#     violation. Reported dims are the first frame's (not the screen's).
#   - LZW: variable-width codes (min-code-size 2..8 -> widths 3..12),
#     strict: a code beyond the table, data exhausted before w*h pixels,
#     an index >= palette size, or EOI before w*h pixels all fail
#     closed. Bits after the w*h-th pixel are ignored (real encoders
#     sometimes omit EOI). Dictionary caps at 4096 per the spec.
#   - Interlace flag honored (4-pass row order). GIF89a transparency is
#     IGNORED for channel sums: every pixel sums its palette RGB.
#   Any violation -> parse_ok False, other fields NULL (P7 contract).
# ---------------------------------------------------------------------------


def _gif_skip_subblocks(payload: bytes, pos: int):
    """Walk a sub-block chain; return position after its terminator or
    None if it runs off the end."""
    while True:
        if pos >= len(payload):
            return None
        ln = payload[pos]
        pos += 1
        if ln == 0:
            return pos
        pos += ln


def _gif_lzw_decode(data: bytes, mcs: int, n_pixels: int):
    """Strict GIF-flavor LZW: LSB-first packed variable-width codes.
    Returns exactly n_pixels index bytes, or None on any violation."""
    clear = 1 << mcs
    end = clear + 1
    base = [bytes((i,)) for i in range(clear)] + [b"", b""]
    table = list(base)
    width = mcs + 1
    out = bytearray()
    prev = None
    bitpos = 0
    total_bits = len(data) * 8
    while len(out) < n_pixels:
        if bitpos + width > total_bits:
            return None
        byte_i = bitpos >> 3
        window = int.from_bytes(data[byte_i : byte_i + 3], "little")
        code = (window >> (bitpos & 7)) & ((1 << width) - 1)
        bitpos += width
        if code == clear:
            table = list(base)
            width = mcs + 1
            prev = None
            continue
        if code == end:
            return None  # EOI before all pixels decoded
        if code < len(table) and (code < clear or len(table[code])):
            entry = table[code]
        elif code == len(table) and prev is not None:
            entry = prev + prev[:1]  # the KwKwK case
        else:
            return None
        out += entry
        if prev is not None and len(table) < 4096:
            table.append(prev + entry[:1])
            if len(table) == (1 << width) and width < 12:
                width += 1
        prev = entry
    return bytes(out[:n_pixels])


def decode_gif_bytes(payload: bytes | None) -> tuple:
    """REAL GIF decode (see SPEC block above): header/descriptor parse,
    strict LZW inflate of the first frame, palette-mapped RGB channel
    sums via numpy. Output matches IMAGE_DECODED_SCHEMA."""
    import struct

    import numpy as np

    if payload is None or len(payload) < 13 or bytes(payload[:6]) not in (b"GIF87a", b"GIF89a"):
        return _FAIL
    _sw, _sh, packed, _bg, _par = struct.unpack_from("<HHBBB", payload, 6)
    pos = 13
    gct = None
    if packed & 0x80:
        n = 2 << (packed & 7)
        if len(payload) < pos + 3 * n:
            return _FAIL
        gct = np.frombuffer(payload, np.uint8, 3 * n, pos).reshape(n, 3)
        pos += 3 * n
    while True:  # walk to the first image descriptor
        if pos >= len(payload):
            return _FAIL
        block = payload[pos]
        pos += 1
        if block == 0x2C:
            break
        if block == 0x21:  # extension: label byte + sub-block chain
            pos = _gif_skip_subblocks(payload, pos + 1)
            if pos is None:
                return _FAIL
            continue
        return _FAIL  # trailer (0x3B) or junk before any frame
    if len(payload) < pos + 9:
        return _FAIL
    _left, _top, w, h, ipacked = struct.unpack_from("<HHHHB", payload, pos)
    pos += 9
    if w == 0 or h == 0 or w * h > MAX_DECODE_PIXELS:
        return _FAIL
    ct = gct
    if ipacked & 0x80:  # local color table overrides
        n = 2 << (ipacked & 7)
        if len(payload) < pos + 3 * n:
            return _FAIL
        ct = np.frombuffer(payload, np.uint8, 3 * n, pos).reshape(n, 3)
        pos += 3 * n
    if ct is None or pos >= len(payload):
        return _FAIL
    mcs = payload[pos]
    pos += 1
    if mcs < 2 or mcs > 8:
        return _FAIL
    chunks = []
    while True:  # image data sub-block chain
        if pos >= len(payload):
            return _FAIL
        ln = payload[pos]
        pos += 1
        if ln == 0:
            break
        if len(payload) < pos + ln:
            return _FAIL
        chunks.append(payload[pos : pos + ln])
        pos += ln
    idx = _gif_lzw_decode(b"".join(chunks), mcs, w * h)
    if idx is None:
        return _FAIL
    arr = np.frombuffer(idx, np.uint8)
    if int(arr.max(initial=0)) >= len(ct):
        return _FAIL
    if ipacked & 0x40:  # interlaced: rows stored in 4-pass order
        order = np.concatenate(
            [np.arange(0, h, 8), np.arange(4, h, 8), np.arange(2, h, 4), np.arange(1, h, 2)]
        )
        rows = np.empty((h, w), np.uint8)
        rows[order] = arr.reshape(h, w)
        arr = rows.reshape(-1)
    sums = ct[arr].astype(np.int64).sum(axis=0)
    return (int(w), int(h), "gif", int(sums[0]), int(sums[1]), int(sums[2]), True)


def _gif_lzw_encode_literals(indices: bytes, mcs: int) -> bytes:
    """Minimal valid LZW stream: CLEAR then one literal code per pixel,
    tracking the decoder's table growth so each code is emitted at the
    width the decoder will read it with (the classic 'uncompressed GIF'
    technique — correctness over ratio; the DECODER handles real
    compression)."""
    clear = 1 << mcs
    end = clear + 1
    width = mcs + 1
    acc = 0
    nbits = 0
    out = bytearray()

    def emit(code: int, w: int):
        nonlocal acc, nbits
        acc |= code << nbits
        nbits += w
        while nbits >= 8:
            out.append(acc & 0xFF)
            acc >>= 8
            nbits -= 8

    emit(clear, width)
    table_len = clear + 2
    first = True
    for v in indices:
        emit(v, width)
        if not first and table_len < 4096:
            table_len += 1
            if table_len == (1 << width) and width < 12:
                width += 1
        first = False
    emit(end, width)
    if nbits:
        out.append(acc & 0xFF)
    return bytes(out)


def make_gif_bytes(w: int, h: int, g: int, interlace: bool = False) -> bytes:
    """Deterministic GIF89a fixture: 256-entry global palette with entry
    i = (i, g, 7); pixel (x, y) uses index (x + y) % 256. For w + h <= 257
    the channel sums have the same closed form as the PNG fixture:
    sum_r = w*h*(w+h-2)/2, sum_g = w*h*g, sum_b = 7*w*h. A GCE extension
    block is included so decode exercises the extension-skip path."""
    import struct

    if w <= 0 or h <= 0 or w + h > 257:
        raise ValueError("fixture needs 0 < w, h with w + h <= 257")
    out = bytearray(b"GIF89a")
    out += struct.pack("<HHBBB", w, h, 0xF7, 0, 0)  # GCT present, 256 entries
    pal = bytearray()
    for i in range(256):
        pal += bytes((i, g % 256, 7))
    out += pal
    out += bytes((0x21, 0xF9, 4, 0, 0, 0, 0, 0))  # GCE: no transparency, then terminator
    out += bytes((0x2C,)) + struct.pack("<HHHHB", 0, 0, w, h, 0x40 if interlace else 0)
    if interlace:
        row_order = (
            list(range(0, h, 8)) + list(range(4, h, 8)) + list(range(2, h, 4)) + list(range(1, h, 2))
        )
    else:
        row_order = range(h)
    idx = bytearray()
    for y in row_order:
        for x in range(w):
            idx.append((x + y) % 256)
    out.append(8)  # LZW min code size
    stream = _gif_lzw_encode_literals(bytes(idx), 8)
    for off in range(0, len(stream), 255):
        chunk = stream[off : off + 255]
        out.append(len(chunk))
        out += chunk
    out += bytes((0x00, 0x3B))  # block terminator + trailer
    return bytes(out)


@F.pandas_udf(T.BinaryType())
def _make_gif_udf(cols: pd.DataFrame) -> pd.Series:
    return pd.Series([make_gif_bytes(int(w), int(h), int(g)) for w, h, g in cols.itertuples(index=False)])


def with_gif_payload(df: DataFrame, w_col: str, h_col: str, g_col: str, out: str = "payload") -> DataFrame:
    """Deterministic GIF fixture column (see :func:`make_gif_bytes`)."""
    return df.withColumn(out, _make_gif_udf(F.struct(w_col, h_col, g_col)))


# ---------------------------------------------------------------------------
# REAL video frame sampling (r4): AVI/MJPEG. The brief's video slot
# (`sample_frames` above is the byte-stride stub) becomes real for the
# one video container that needs no codec libs beyond the JPEG decoder
# already in this module: RIFF/AVI carrying MJPEG, where every frame is
# a complete JFIF image. Container SPEC, pinned here:
#   - 'RIFF' <size> 'AVI ' magic; top-level chunks walked with RIFF
#     even-byte padding; the LIST 'movi' chunk holds the frames.
#   - Video frames are chunks whose fourcc matches [0-9][0-9]d[bc]
#     ('00dc' compressed / '00db' uncompressed naming), in file order;
#     LIST 'rec ' groups are descended into (one level, as interleaved
#     AVIs write them). Other chunks (audio '01wb', index 'idx1') skip.
#   - hdrl/avih is NOT enforced (real muxers write wrong dwTotalFrames);
#     frame count is what the movi list actually carries.
#   - Sampling: every_n-th frame (frame_no % every_n == 0) is DECODED
#     through decode_image_bytes; a sampled frame that fails its decode
#     emits its row with parse_ok False. A malformed container, OR a
#     container carrying zero video frames (audio-only / movi missing /
#     truncated before movi), emits ONE row (frame_no NULL, parse_ok
#     False) so quarantine is countable (P7 contract). Skipped frames
#     cost zero decode work.
# ---------------------------------------------------------------------------

VIDEO_FRAME_SCHEMA = T.StructType(
    [
        T.StructField("id", T.LongType(), True),
        T.StructField("frame_no", T.LongType(), True),
        T.StructField("width", T.LongType(), True),
        T.StructField("height", T.LongType(), True),
        T.StructField("sum_r", T.LongType(), True),
        T.StructField("sum_g", T.LongType(), True),
        T.StructField("sum_b", T.LongType(), True),
        T.StructField("parse_ok", T.BooleanType(), True),
    ]
)


def _avi_video_chunks(payload: bytes):
    """Walk a RIFF/AVI container; yield the raw bytes of each video
    frame chunk in file order. Returns None on container violations."""
    import struct

    if payload is None or len(payload) < 12 or payload[:4] != b"RIFF" or payload[8:12] != b"AVI ":
        return None
    riff_size = struct.unpack_from("<I", payload, 4)[0]
    end = min(len(payload), 8 + riff_size)
    frames = []

    def walk(pos: int, stop: int, in_movi: bool, depth: int):
        while pos + 8 <= stop:
            fourcc = payload[pos : pos + 4]
            csize = struct.unpack_from("<I", payload, pos + 4)[0]
            body, nxt = pos + 8, pos + 8 + csize + (csize & 1)
            if body + csize > stop:
                return None
            if fourcc == b"LIST":
                if csize < 4:
                    return None
                ltype = payload[body : body + 4]
                if (not in_movi and ltype == b"movi") or (
                    in_movi and ltype == b"rec " and depth < 1
                ):
                    if walk(body + 4, body + csize, True, depth + (1 if in_movi else 0)) is None:
                        return None
            elif in_movi and (
                fourcc[:2].isdigit() and fourcc[2:2 + 1] == b"d" and fourcc[3:4] in (b"b", b"c")
            ):
                frames.append(payload[body : body + csize])
            pos = nxt
        return pos

    if walk(12, end, False, 0) is None:
        return None
    return frames


def sample_video_frames(
    df: DataFrame, bin_col: str, id_col: str, every_n: int = 2, out_schema: T.StructType = VIDEO_FRAME_SCHEMA
) -> DataFrame:
    """REAL video frame sampling over AVI/MJPEG payloads (see container
    SPEC above): one output row per SAMPLED frame, decoded through
    :func:`decode_image_bytes`. Same multiplicity-changing mapInPandas
    shape as the stub :func:`sample_frames`; at 100 TB the decode rides
    the scan, per-payload work is Arrow-batch bounded, and skipped
    frames are never decoded."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows = []
            for rid, payload in zip(pdf[id_col], pdf[bin_col]):
                rid = int(rid)
                frames = _avi_video_chunks(payload)
                if not frames:  # malformed container OR zero video frames
                    rows.append((rid, None, None, None, None, None, None, False))
                    continue
                for i in range(0, len(frames), every_n):
                    w, h, _fmt, sr, sg, sb, ok = decode_image_bytes(frames[i])
                    rows.append((rid, i, w, h, sr, sg, sb, ok))
            yield pd.DataFrame(rows, columns=[f.name for f in out_schema.fields])

    return df.mapInPandas(batches, out_schema)


def make_avi_bytes(frames: list[bytes], w: int = 8, h: int = 8) -> bytes:
    """Deterministic AVI/MJPEG fixture: minimal hdrl (avih) + movi list
    of '00dc' chunks, RIFF even-padding respected."""
    import struct

    def chunk(fourcc: bytes, body: bytes) -> bytes:
        return fourcc + struct.pack("<I", len(body)) + body + (b"\x00" if len(body) & 1 else b"")

    avih = struct.pack("<14I", 33367, 0, 0, 0x10, len(frames), 0, 1, 0, w, h, 0, 0, 0, 0)
    hdrl = chunk(b"LIST", b"hdrl" + chunk(b"avih", avih))
    movi_body = b"movi" + b"".join(chunk(b"00dc", f) for f in frames)
    movi = chunk(b"LIST", movi_body)
    body = b"AVI " + hdrl + movi
    return b"RIFF" + struct.pack("<I", len(body)) + body


@F.pandas_udf(T.BinaryType())
def _make_avi_udf(cols: pd.DataFrame) -> pd.Series:
    out = []
    for nf, base, step in cols.itertuples(index=False):
        frames = [make_jpeg_bytes(8, 8, (int(base) + i * int(step)) % 256, 0) for i in range(int(nf))]
        out.append(make_avi_bytes(frames))
    return pd.Series(out)


def with_avi_payload(
    df: DataFrame, nf_col: str, base_col: str, step_col: str, out: str = "payload"
) -> DataFrame:
    """Deterministic AVI/MJPEG fixture column: nf single-block 8x8
    analytic JPEG frames, frame i solid value (base + i*step) mod 256."""
    return df.withColumn(out, _make_avi_udf(F.struct(nf_col, base_col, step_col)))


# ---------------------------------------------------------------------------
# REAL MP3 frame-header walk (r4): audio METADATA parse without a DSP
# decode (full MDCT synthesis stays behind the documented stub; curation
# pipelines overwhelmingly need duration/bitrate/samplerate screening,
# which the frame walk gives exactly). Parse SPEC, pinned here:
#   - Optional ID3v2 tag at byte 0 ('ID3', 10-byte header, syncsafe
#     size) is skipped; ID3v1 ('TAG', 128 bytes) at EOF is skipped.
#   - Frames: MPEG-1 Layer III only (sync 0xFFE, version 11, layer 01);
#     bitrate index 1..14, samplerate index 0..2, no free-format.
#     frame_len = 144000 * bitrate_kbps // samplerate + padding.
#   - STRICT walk: frames must tile the payload exactly (after tag
#     skips); any gap, truncated frame, or header violation fails
#     closed. Samplerate must be constant across frames; bitrate may
#     vary (VBR) and is reported as the exact integer sum.
#   - duration_ms = n_frames * 1152 * 1000 // samplerate (integer, so
#     the DuckDB oracle reproduces it bit-for-bit).
# ---------------------------------------------------------------------------

MP3_BITRATES = (32, 40, 48, 56, 64, 80, 96, 112, 128, 160, 192, 224, 256, 320)
MP3_SAMPLERATES = (44100, 48000, 32000)

MP3_META_SCHEMA = T.StructType(
    [
        T.StructField("n_frames", T.LongType(), True),
        T.StructField("sample_rate", T.LongType(), True),
        T.StructField("sum_bitrate_kbps", T.LongType(), True),
        T.StructField("duration_ms", T.LongType(), True),
        T.StructField("parse_ok", T.BooleanType(), True),
    ]
)

_MP3_FAIL = (None, None, None, None, False)


def parse_mp3_meta_bytes(payload: bytes | None) -> tuple:
    """Walk MPEG-1 Layer III frame headers (see SPEC above): returns
    (n_frames, sample_rate, sum_bitrate_kbps, duration_ms, parse_ok)."""
    if payload is None or len(payload) < 4:
        return _MP3_FAIL
    pos = 0
    end = len(payload)
    if payload[:3] == b"ID3":
        if end < 10:
            return _MP3_FAIL
        sz = payload[6:10]
        if any(b & 0x80 for b in sz):
            return _MP3_FAIL  # syncsafe bytes must have bit 7 clear
        pos = 10 + ((sz[0] << 21) | (sz[1] << 14) | (sz[2] << 7) | sz[3])
    if end - pos >= 128 and payload[end - 128 : end - 125] == b"TAG":
        end -= 128
    n_frames = 0
    samplerate = None
    sum_bitrate = 0
    while pos < end:
        if pos + 4 > end:
            return _MP3_FAIL
        b0, b1, b2 = payload[pos], payload[pos + 1], payload[pos + 2]
        # sync (11 bits) + version 11 (MPEG-1) + layer 01 (III): 0xFF 0xFB/0xFA
        if b0 != 0xFF or (b1 & 0xFE) != 0xFA:
            return _MP3_FAIL
        br_idx = b2 >> 4
        sr_idx = (b2 >> 2) & 3
        padding = (b2 >> 1) & 1
        if br_idx == 0 or br_idx == 15 or sr_idx == 3:
            return _MP3_FAIL  # free-format / reserved
        sr = MP3_SAMPLERATES[sr_idx]
        if samplerate is None:
            samplerate = sr
        elif sr != samplerate:
            return _MP3_FAIL
        kbps = MP3_BITRATES[br_idx - 1]
        flen = 144000 * kbps // sr + padding
        if pos + flen > end:
            return _MP3_FAIL  # truncated frame
        n_frames += 1
        sum_bitrate += kbps
        pos += flen
    if n_frames == 0:
        return _MP3_FAIL
    return (n_frames, samplerate, sum_bitrate, n_frames * 1152 * 1000 // samplerate, True)


def parse_mp3_meta(df: DataFrame, bin_col: str, out_prefix: str = "mp3_") -> DataFrame:
    """MP3 metadata over a binary column via the same mapInPandas shape
    as :func:`decode_audio`; violations quarantine with parse_ok False."""
    in_schema = df.schema
    out_schema = T.StructType(
        list(in_schema.fields)
        + [T.StructField(out_prefix + f.name, f.dataType, True) for f in MP3_META_SCHEMA.fields]
    )

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            meta = pdf[bin_col].map(parse_mp3_meta_bytes)
            for i, f in enumerate(MP3_META_SCHEMA.fields):
                pdf[out_prefix + f.name] = meta.map(lambda t, i=i: t[i])
            yield pdf

    return df.mapInPandas(batches, out_schema)


def make_mp3_bytes(n_frames: int, br_start: int, sr_idx: int = 0, with_id3: bool = True) -> bytes:
    """Deterministic MP3 fixture: n_frames MPEG-1 Layer III headers with
    zeroed payloads; frame i uses bitrate index ((br_start + i) % 14) + 1
    (VBR), padding bit off. Optionally prefixed with a minimal ID3v2 tag."""
    out = bytearray()
    if with_id3:
        body = b"\x00" * 17
        out += b"ID3\x04\x00\x00" + bytes((0, 0, 0, len(body))) + body
    sr = MP3_SAMPLERATES[sr_idx]
    for i in range(n_frames):
        br_idx = (br_start + i) % 14 + 1
        kbps = MP3_BITRATES[br_idx - 1]
        flen = 144000 * kbps // sr
        hdr = bytes((0xFF, 0xFB, (br_idx << 4) | (sr_idx << 2), 0x00))
        out += hdr + b"\x00" * (flen - 4)
    return bytes(out)


@F.pandas_udf(T.BinaryType())
def _make_mp3_udf(cols: pd.DataFrame) -> pd.Series:
    return pd.Series(
        [make_mp3_bytes(int(n), int(b)) for n, b in cols.itertuples(index=False)]
    )


def with_mp3_payload(df: DataFrame, nf_col: str, br_col: str, out: str = "payload") -> DataFrame:
    """Deterministic MP3 fixture column (see :func:`make_mp3_bytes`)."""
    return df.withColumn(out, _make_mp3_udf(F.struct(nf_col, br_col)))


# ---------------------------------------------------------------------------
# REAL progressive-JPEG decode (r4). SOF2 is how large web JPEGs
# actually ship; with it, NO image format remains behind the stub.
# Decode SPEC, pinned here (ITU T.81 Annex G.1/G.2 semantics):
#   - Multiple SOS scans accumulate into per-component coefficient
#     stores; DQT/DHT may be redefined between scans; EOI finishes.
#   - DC scans: Ss=Se=0; first pass (Ah=0) is DPCM of DC>>Al, may be
#     MCU-interleaved (ns>1); refinement (Ah>0) reads one bit per block
#     (coef |= 1<<Al). AC scans: single-component, Ss>=1, EOB-run and
#     ZRL symbols per G.1.2.2; refinement per G.1.2.3 (correction bits
#     for nonzero history, size-1 newval insertion, EOB-runs consume
#     correction bits). Restart markers reset predictors AND EOB-run.
#   - Same support envelope as the baseline path: 8-bit, 1 or 3
#     components, sampling factors 1..2, 8-bit quant tables. Dequant +
#     float64 IDCT + replication upsample + JFIF color convert happen
#     ONCE after all scans. Any violation -> parse_ok False (P7).
# ---------------------------------------------------------------------------


def _jpeg_ac_scan_block(reader, table, blk, ss: int, se: int, ah: int, al: int, eobrun: int) -> int:
    """Decode one block's slice of an AC scan (first pass or refinement);
    returns the updated EOB-run counter."""
    if ah == 0:  # G.1.2.2: first pass for this band
        if eobrun > 0:
            return eobrun - 1
        k = ss
        while k <= se:
            sym = _jpeg_huff_decode(reader, table)
            r, s = sym >> 4, sym & 0xF
            if s == 0:
                if r == 15:
                    k += 16
                    continue
                eobrun = (1 << r) - 1
                if r:
                    eobrun += reader.read_bits(r)
                break
            k += r
            if k > se:
                raise ValueError("AC index overflow")
            blk[_JPEG_ZIGZAG[k]] = _jpeg_extend(reader.read_bits(s), s) << al
            k += 1
        return eobrun
    # G.1.2.3: refinement
    p1, m1 = 1 << al, -(1 << al)
    k = ss
    if eobrun == 0:
        while k <= se:
            sym = _jpeg_huff_decode(reader, table)
            r, s = sym >> 4, sym & 0xF
            if s == 0:
                if r != 15:
                    eobrun = 1 << r
                    if r:
                        eobrun += reader.read_bits(r)
                    break
                newval = 0  # ZRL: pass 16 zero-history coefficients
            elif s == 1:
                newval = p1 if reader.read_bit() else m1
            else:
                raise ValueError("refinement coefficient size must be 1")
            while k <= se:
                zk = _JPEG_ZIGZAG[k]
                c = int(blk[zk])
                if c != 0:  # nonzero history: correction bit, doesn't count toward r
                    if reader.read_bit() and (c & p1) == 0:
                        blk[zk] = c + (p1 if c >= 0 else m1)
                else:
                    if r == 0:
                        break
                    r -= 1
                k += 1
            if newval != 0:
                if k > se:
                    raise ValueError("refinement newval overflow")
                blk[_JPEG_ZIGZAG[k]] = newval
            k += 1
    if eobrun > 0:  # remaining coefficients of this block ride the EOB-run
        while k <= se:
            zk = _JPEG_ZIGZAG[k]
            c = int(blk[zk])
            if c != 0 and reader.read_bit() and (c & p1) == 0:
                blk[zk] = c + (p1 if c >= 0 else m1)
            k += 1
        eobrun -= 1
    return eobrun


def _jpeg_progressive_scan(frame, coef, huff_dc, huff_ac, restart_interval, segments, scomps, ss, se, ah, al):
    """Apply one SOS scan's entropy data onto the coefficient stores."""
    w, h, comps = frame
    cidx = {c[0]: i for i, c in enumerate(comps)}
    idxs = []
    for cs, td, ta in scomps:
        if cs not in cidx:
            raise ValueError("scan names unknown component")
        idxs.append((cidx[cs], td, ta))
    hmax = max(c[1] for c in comps)
    vmax = max(c[2] for c in comps)
    mcux = (w + 8 * hmax - 1) // (8 * hmax)
    is_dc = ss == 0
    if is_dc and se != 0:
        raise ValueError("DC scan must have Se=0")
    if not is_dc and (len(idxs) != 1 or se > 63 or ss > se):
        raise ValueError("bad AC scan header")
    if ah and al != ah - 1:
        raise ValueError("successive approximation must descend one bit")
    if len(idxs) > 1:  # interleaved (DC only)
        mcuy = (h + 8 * vmax - 1) // (8 * vmax)
        units = mcux * mcuy
    else:
        ci0, hi0, vi0 = idxs[0][0], comps[idxs[0][0]][1], comps[idxs[0][0]][2]
        cbw = (-(-(w * hi0) // hmax) + 7) // 8  # ceil(ceil(w*hi/hmax)/8)
        cbh = (-(-(h * vi0) // vmax) + 7) // 8
        units = cbw * cbh

    seg_i = 0
    reader = _JpegBitReader(segments[0])
    pred = [0] * len(comps)
    eobrun = 0
    for u in range(units):
        if restart_interval and u and u % restart_interval == 0:
            seg_i += 1
            if seg_i >= len(segments):
                raise ValueError("missing restart segment")
            reader = _JpegBitReader(segments[seg_i])
            pred = [0] * len(comps)
            eobrun = 0
        if len(idxs) > 1:
            my, mx = divmod(u, mcux)
            blocks = []
            for ci, td, ta in idxs:
                _, hi, vi, _ = comps[ci]
                for byy in range(vi):
                    for bxx in range(hi):
                        blocks.append((ci, td, ta, my * vi + byy, mx * hi + bxx))
        else:
            ci, td, ta = idxs[0]
            by, bx = divmod(u, cbw)
            blocks = [(ci, td, ta, by, bx)]
        for ci, td, ta, by, bx in blocks:
            blk = coef[ci][by, bx]
            if is_dc:
                if ah == 0:
                    s = _jpeg_huff_decode(reader, huff_dc[td])
                    if s > 11:
                        raise ValueError("DC size out of range")
                    pred[ci] += _jpeg_extend(reader.read_bits(s), s)
                    blk[0] = pred[ci] << al
                else:
                    if reader.read_bit():
                        blk[0] = int(blk[0]) | (1 << al)
            else:
                eobrun = _jpeg_ac_scan_block(reader, huff_ac[ta], blk, ss, se, ah, al, eobrun)


def _decode_jpeg_progressive(buf: bytes) -> tuple:
    """Progressive (SOF2) decode — see SPEC block above. Raises on any
    violation; `decode_jpeg_bytes` turns that into the quarantine row."""
    import struct

    import numpy as np

    pos = 2
    qt: dict[int, "np.ndarray"] = {}
    huff_dc: dict[int, dict] = {}
    huff_ac: dict[int, dict] = {}
    frame = None
    restart_interval = 0
    coef: list = []
    saw_eoi = False
    n_scans = 0
    while pos + 2 <= len(buf):
        if buf[pos] != 0xFF:
            raise ValueError("expected marker")
        marker = buf[pos + 1]
        pos += 2
        if marker == 0xD9:  # EOI
            saw_eoi = True
            break
        if marker in (0xD8, 0x01) or 0xD0 <= marker <= 0xD7:
            continue
        (seglen,) = struct.unpack_from(">H", buf, pos)
        body = buf[pos + 2 : pos + seglen]
        if len(body) != seglen - 2:
            raise ValueError("truncated segment")
        if marker == 0xDB:  # DQT
            _jpeg_parse_dqt(body, qt)
        elif marker == 0xC2:  # SOF2
            if frame is not None:
                raise ValueError("multiple frames")
            prec, h, w, nc = body[0], *struct.unpack_from(">HH", body, 1), body[5]
            if prec != 8 or nc not in (1, 3) or w == 0 or h == 0:
                raise ValueError("unsupported frame")
            if w * h > MAX_DECODE_PIXELS:
                raise ValueError("claimed raster exceeds decode cap")
            comps = []
            for i in range(nc):
                cid, hv, tq = body[6 + 3 * i], body[7 + 3 * i], body[8 + 3 * i]
                hi, vi = hv >> 4, hv & 0xF
                if hi not in (1, 2) or vi not in (1, 2):
                    raise ValueError("sampling factor out of supported range")
                comps.append((cid, hi, vi, tq))
            frame = (w, h, comps)
            hmax = max(c[1] for c in comps)
            vmax = max(c[2] for c in comps)
            mcux = (w + 8 * hmax - 1) // (8 * hmax)
            mcuy = (h + 8 * vmax - 1) // (8 * vmax)
            for _cid, hi, vi, _tq in comps:
                coef.append(np.zeros((mcuy * vi, mcux * hi, 64), dtype=np.int64))
        elif marker in (0xC0, 0xC1, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF):
            raise ValueError("unsupported frame type")
        elif marker == 0xC4:  # DHT
            _jpeg_parse_dht(body, huff_dc, huff_ac)
        elif marker == 0xDD:  # DRI
            (restart_interval,) = struct.unpack_from(">H", body, 0)
        elif marker == 0xDA:  # SOS: one scan of entropy data follows
            if frame is None:
                raise ValueError("SOS before SOF2")
            ns = body[0]
            scomps = [(body[1 + 2 * i], body[2 + 2 * i] >> 4, body[2 + 2 * i] & 0xF) for i in range(ns)]
            ss, se = body[1 + 2 * ns], body[2 + 2 * ns]
            ahal = body[3 + 2 * ns]
            pos += seglen
            segments, pos = _jpeg_unstuff(buf, pos)
            _jpeg_progressive_scan(
                frame, coef, huff_dc, huff_ac, restart_interval,
                segments, scomps, ss, se, ahal >> 4, ahal & 0xF,
            )
            n_scans += 1
            continue
        pos += seglen
    if frame is None or not saw_eoi or n_scans == 0:
        raise ValueError("missing SOF2, scans, or EOI")
    w, h, comps = frame
    hmax = max(c[1] for c in comps)
    vmax = max(c[2] for c in comps)
    idct = _jpeg_idct_matrix()
    full = []
    for (cid, hi, vi, tq), arr in zip(comps, coef):
        if tq not in qt:
            raise ValueError("undefined quant table")
        bv, bh, _ = arr.shape
        blocks = arr.reshape(bv, bh, 8, 8).astype(np.float64) * qt[tq][None, None]
        px = np.einsum("ux,ijuv,vz->ijxz", idct, blocks, idct)
        plane = np.clip(np.round(px + 128.0), 0, 255).transpose(0, 2, 1, 3).reshape(bv * 8, bh * 8)
        up = np.repeat(np.repeat(plane, vmax // vi, axis=0), hmax // hi, axis=1)
        full.append(up[:h, :w])
    if len(comps) == 1:
        sgray = int(full[0].astype(np.int64).sum())
        return (w, h, "jpeg-progressive-gray", sgray, sgray, sgray, True)
    y, cb, cr = full
    r = np.clip(np.round(y + 1.402 * (cr - 128.0)), 0, 255)
    g = np.clip(np.round(y - 0.344136 * (cb - 128.0) - 0.714136 * (cr - 128.0)), 0, 255)
    b = np.clip(np.round(y + 1.772 * (cb - 128.0)), 0, 255)
    return (
        w, h, "jpeg-progressive",
        int(r.astype(np.int64).sum()),
        int(g.astype(np.int64).sum()),
        int(b.astype(np.int64).sum()),
        True,
    )


def _jfix_flush_eobrun(bw: _JpegBitWriter, pending: list) -> None:
    """Emit accumulated EOB-runs: EOBn symbol + extension bits, then the
    covered blocks' buffered correction bits (refinement scans only)."""
    while pending:
        take = min(len(pending), 127)
        r = take.bit_length() - 1
        length, code = _JFIX_AC_CODES[r << 4]
        bw.write(code, length)
        if r:
            bw.write(take - (1 << r), r)
        for bits in pending[:take]:
            for b in bits:
                bw.write(b, 1)
        del pending[:take]


def make_jpeg_progressive_bytes(
    w: int,
    h: int,
    base: int,
    step: int,
    acval: int = 0,
    gray: bool = False,
    al: int = 1,
    subsample: bool = False,
) -> bytes:
    """Deterministic progressive JFIF fixture (SOF2): solid 8x8 luma
    blocks of value (base + i*step) mod 256 (neutral chroma), optionally
    one AC coefficient `acval` at natural position (4,4) per block — the
    exact 2x2-checkerboard basis the baseline fixture uses, so channel
    sums keep the closed form sum(64*v_i) (the +/- acval/8 halves cancel
    under symmetric rounding). al=1 (default) encodes the successive-
    approximation ladder: DC first at Al=1 (interleaved), per-component
    AC first at Al=1 (EOB-run coded), DC refinement, AC refinement
    (correction bits / newval insertion when acval>>1 == 0). al=0
    encodes single full-precision scans (no refinement). subsample=True
    emits a 4:2:0 frame (w, h multiples of 16): the interleaved DC scans
    carry 2x2 luma blocks per MCU and the per-component AC scans run
    over each component's OWN block grid — the geometry the decoder must
    get right for subsampled progressive files."""
    import struct

    if subsample and (gray or w % 16 or h % 16):
        raise ValueError("4:2:0 fixture needs color and w, h multiples of 16")
    if w % 8 or h % 8:
        raise ValueError("progressive fixture needs w, h multiples of 8")
    if al not in (0, 1):
        raise ValueError("fixture supports Al in {0, 1}")
    ncomp = 1 if gray else 3
    bw_, bh_ = w // 8, h // 8
    nblocks = bw_ * bh_
    vals = [(base + i * step) % 256 for i in range(nblocks)]
    dcs = [8 * (v - 128) for v in vals]

    # luma-block raster indices in DC-SCAN (MCU-interleaved) order
    if subsample:
        mcux, mcuy = w // 16, h // 16
        mcu_luma = [
            [(my * 2 + byy) * bw_ + (mx * 2 + bxx) for byy in range(2) for bxx in range(2)]
            for my in range(mcuy)
            for mx in range(mcux)
        ]
        chroma_blocks = mcux * mcuy
    else:
        mcu_luma = [[i] for i in range(nblocks)]
        chroma_blocks = nblocks
    comp_blocks = [nblocks] + [chroma_blocks] * (ncomp - 1)

    def seg(marker: int, body: bytes) -> bytes:
        return bytes((0xFF, marker)) + struct.pack(">H", len(body) + 2) + body

    def sos(comp_ids: list[int], ss: int, se: int, ah: int, al_: int) -> bytes:
        body = bytes((len(comp_ids),))
        for cid in comp_ids:
            body += bytes((cid, 0x00))  # Td=0, Ta=0 (the fixture's only tables)
        body += bytes((ss, se, (ah << 4) | al_))
        return seg(0xDA, body)

    out = bytearray(b"\xff\xd8")
    out += seg(0xE0, b"JFIF\x00\x01\x01\x00" + struct.pack(">HH", 1, 1) + b"\x00\x00")
    out += seg(0xDB, bytes([0x00]) + bytes([1] * 64))
    sof = struct.pack(">BHHB", 8, h, w, ncomp)
    sof += bytes((1, 0x22 if subsample else 0x11, 0))
    if not gray:
        sof += bytes((2, 0x11, 0)) + bytes((3, 0x11, 0))
    out += seg(0xC2, sof)
    out += seg(0xC4, bytes([0x00]) + bytes(_JFIX_DC_BITS) + _JFIX_DC_VALS)
    out += seg(0xC4, bytes([0x10]) + bytes(_JFIX_AC_BITS) + _JFIX_AC_VALS)
    comp_ids = [1] if gray else [1, 2, 3]

    # scan 1: DC first pass, interleaved (MCU order), Al=al
    bw = _JpegBitWriter()
    pred = 0
    for blocks in mcu_luma:
        for i in blocks:
            d = dcs[i] >> al
            diff = d - pred
            pred = d
            _jfix_write_coef(bw, _JFIX_DC_CODES, abs(diff).bit_length(), diff)
        if not gray:
            for _ in (1, 2):
                _jfix_write_coef(bw, _JFIX_DC_CODES, 0, 0)
    bw.flush()
    out += sos(comp_ids, 0, 0, 0, al) + bw.out

    # AC first pass per component, Al=al. Successive approximation
    # shifts the MAGNITUDE (T.81 G.1.2.2 point transform), not the
    # two's-complement value: floor-shifting a negative coefficient
    # would make the ladder reconstruct acval-2 instead of acval.
    v1 = (abs(acval) >> al) * (1 if acval >= 0 else -1) if acval else 0
    for cn, cid in enumerate(comp_ids):
        bw = _JpegBitWriter()
        pending: list = []
        for _i in range(comp_blocks[cn]):
            if cn == 0 and v1:
                _jfix_flush_eobrun(bw, pending)
                la, ca = _JFIX_AC_CODES[0xF0]
                bw.write(ca, la)
                bw.write(ca, la)  # 32 zeros to zigzag 33
                _jfix_write_coef(bw, _JFIX_AC_CODES, abs(v1).bit_length(), v1, run=6)
                pending.append([])  # EOB for the rest of this block
            else:
                pending.append([])
        _jfix_flush_eobrun(bw, pending)
        bw.flush()
        out += sos([cid], 1, 63, 0, al) + bw.out

    if al:
        # DC refinement: one raw bit per block, MCU-interleaved order
        bw = _JpegBitWriter()
        for blocks in mcu_luma:
            for i in blocks:
                bw.write(dcs[i] & 1, 1)
            if not gray:
                bw.write(0, 2)
        bw.flush()
        out += sos(comp_ids, 0, 0, al, 0) + bw.out
        # AC refinement per component
        for cn, cid in enumerate(comp_ids):
            bw = _JpegBitWriter()
            pending = []
            for _i in range(comp_blocks[cn]):
                if cn == 0 and acval and v1 == 0:
                    # coefficient appears FIRST here: newval +/-1 after 38
                    # zero-history positions (ZRL, ZRL, run 6)
                    _jfix_flush_eobrun(bw, pending)
                    la, ca = _JFIX_AC_CODES[0xF0]
                    bw.write(ca, la)
                    bw.write(ca, la)
                    la, ca = _JFIX_AC_CODES[(6 << 4) | 1]
                    bw.write(ca, la)
                    bw.write(1 if acval > 0 else 0, 1)
                    pending.append([])
                elif cn == 0 and v1:
                    pending.append([abs(acval) & 1])  # correction bit for (4,4)
                else:
                    pending.append([])
            _jfix_flush_eobrun(bw, pending)
            bw.flush()
            out += sos([cid], 1, 63, al, 0) + bw.out

    out += b"\xff\xd9"
    return bytes(out)


@F.pandas_udf(T.BinaryType())
def _make_jpeg_prog_udf(cols: pd.DataFrame) -> pd.Series:
    return pd.Series(
        [
            make_jpeg_progressive_bytes(int(w), int(h), int(base), int(step))
            for w, h, base, step in cols.itertuples(index=False)
        ]
    )


def with_jpeg_progressive_payload(
    df: DataFrame, w_col: str, h_col: str, base_col: str, step_col: str, out: str = "payload"
) -> DataFrame:
    """Deterministic progressive-JPEG fixture column."""
    return df.withColumn(out, _make_jpeg_prog_udf(F.struct(w_col, h_col, base_col, step_col)))
