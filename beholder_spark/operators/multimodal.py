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
