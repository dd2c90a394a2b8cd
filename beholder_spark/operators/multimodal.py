"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Images/audio/video ride as ``binary`` columns with a metadata struct.
The Spark-side plumbing (schema, Arrow batch shape, mapInPandas
signature, partitioning) is real and tested; the actual codec decode is
STUBBED — the container has no image/audio libs — behind
``_decode_stub`` which derives deterministic fake metadata from the
bytes themselves, so oracles and tests stay exact. Swap ``_decode_stub``
for a real decoder (PIL/ffmpeg) in production; nothing else changes.
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
# `wave` module. Only COMPRESSED codecs (JPEG/PNG pixels, MP3, video)
# remain behind the documented stub. Decode SPEC, pinned here:
#   - BMP: 'BM' magic, BITMAPINFOHEADER, 24-bit, uncompressed only;
#     rows bottom-up, padded to 4 bytes; stored channel order is BGR,
#     outputs are LOGICAL RGB channel sums (integer-exact → DuckDB
#     oracle reproducible).
#   - PPM: binary 'P6', maxval 255.
#   - WAV: stdlib wave; mono/stereo 16-bit PCM; outputs n_channels,
#     sample_rate, n_samples, and the integer sum of samples.
#   Any violation → parse_ok False, other fields NULL (P7 contract).
# ---------------------------------------------------------------------------

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
    """Magic-byte dispatch: real decode for BMP/PPM/PNG, fail-closed
    else (JPEG and friends stay in the documented stub domain)."""
    if payload is None:
        return _FAIL
    if payload[:2] == b"BM":
        return decode_bmp_bytes(payload)
    if payload[:2] == b"P6":
        return decode_ppm_bytes(payload)
    if bytes(payload[:8]) == _PNG_SIG:
        return decode_png_bytes(payload)
    return _FAIL


def decode_image(df: DataFrame, bin_col: str, out_prefix: str = "dec_") -> DataFrame:
    """REAL image decode over a binary column (BMP/PPM — see module
    SPEC) via the same mapInPandas shape as :func:`decode_binary`; a
    compressed or malformed payload quarantines with parse_ok False."""
    in_schema = df.schema
    out_schema = T.StructType(
        list(in_schema.fields)
        + [T.StructField(out_prefix + f.name, f.dataType, True) for f in IMAGE_DECODED_SCHEMA.fields]
    )

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            decoded = pdf[bin_col].map(decode_image_bytes)
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
        raster = _png_defilter(zlib.decompress(bytes(idat)), w, h, ch)
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
