"""Similarity search over embedding columns (array<float>).

Two paths:
- ``cosine_topk`` — brute-force exact top-k, the correctness baseline.
  Vectors are quantized to int (round(x*1000)) so dot products are exact
  integer arithmetic → the DuckDB oracle matches bit-for-bit, and the
  JVM does the math (zip_with + aggregate, no Python).
- ``lsh_cosine_topk`` — the scale path: sign-random-projection LSH
  buckets candidates first, exact rerank only within buckets. At 10^9
  vectors the brute force is O(n·q); LSH makes candidate generation a
  bucket-join.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

QUANT = 1000  # fixed-point scale for deterministic integer dot products


def quantize(col: Column) -> Column:
    """array<float> → array<long> fixed-point (deterministic both engines:
    round-half-away-from-zero on identical doubles)."""
    return F.transform(col, lambda x: F.round(x * QUANT, 0).cast("long"))


def _int_dot(a: Column, b: Column) -> Column:
    return F.aggregate(F.zip_with(a, b, lambda x, y: x * y), F.lit(0).cast("long"), lambda acc, x: acc + x)


def _int_norm2(a: Column) -> Column:
    return F.aggregate(F.transform(a, lambda x: x * x), F.lit(0).cast("long"), lambda acc, x: acc + x)


def cosine_topk(
    vectors: DataFrame,
    id_col: str,
    vec_col: str,
    query_ids_max: int,
    k: int = 3,
) -> DataFrame:
    """Exact top-k cosine neighbors for queries (id < query_ids_max).

    Broadcast the (small) query set against all vectors — the big side
    never shuffles for the join; only the per-query top-k window shuffles
    (q_id, candidate) rows. Ties break on neighbor id ascending.
    """
    from pyspark.sql import Window

    q = vectors.filter(F.col(id_col) < query_ids_max).select(
        F.col(id_col).alias("qid"), quantize(F.col(vec_col)).alias("qv")
    )
    c = vectors.select(F.col(id_col).alias("nid"), quantize(F.col(vec_col)).alias("cv"))
    pairs = c.crossJoin(F.broadcast(q)).filter(F.col("nid") != F.col("qid"))
    scored = pairs.select(
        "qid",
        "nid",
        F.round(
            _int_dot(F.col("qv"), F.col("cv"))
            / (F.sqrt(_int_norm2(F.col("qv"))) * F.sqrt(_int_norm2(F.col("cv")))),
            4,
        ).alias("cosine"),
    )
    w = Window.partitionBy("qid").orderBy(F.desc("cosine"), F.asc("nid"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("qid", "nid", "cosine", "rank")
    )


def lsh_cosine_topk(
    vectors: DataFrame,
    id_col: str,
    vec_col: str,
    query_ids_max: int,
    k: int = 3,
    n_planes: int = 6,
    dim: int = 64,
) -> DataFrame:
    """Scale path: sign-LSH bucket join, exact rerank within bucket.

    Hyperplanes are deterministic pseudo-random (md5-nibble derived), so
    reruns produce identical buckets — required for resume/lineage.
    Approximate by construction: recall < 1 (neighbors in other buckets
    are missed) — registered as a rows-only check, judged as the scale
    variant of ``cosine_topk``.
    """
    from pyspark.sql import Window

    import hashlib

    def plane(j: int) -> list[float]:
        vals = []
        i = 0
        while len(vals) < dim:
            h = hashlib.md5(f"plane:{j}:{i}".encode()).hexdigest()
            vals.extend((int(ch, 16) - 7.5) / 7.5 for ch in h)
            i += 1
        return vals[:dim]

    planes = [plane(j) for j in range(n_planes)]

    def bucket_expr(vc: Column) -> Column:
        acc = F.lit(0)
        for j, p in enumerate(planes):
            arr = F.array(*[F.lit(v) for v in p])
            dot = F.aggregate(
                F.zip_with(vc, arr, lambda x, y: x * y), F.lit(0.0), lambda a, x: a + x
            )
            acc = acc + F.when(dot > 0, F.lit(1 << j)).otherwise(F.lit(0))
        return acc

    vb = vectors.select(
        F.col(id_col), quantize(F.col(vec_col)).alias("qv"), bucket_expr(F.col(vec_col)).alias("bucket")
    )
    q = vb.filter(F.col(id_col) < query_ids_max).select(
        F.col(id_col).alias("qid"), F.col("qv").alias("qvec"), "bucket"
    )
    c = vb.select(F.col(id_col).alias("nid"), F.col("qv").alias("cvec"), "bucket")
    pairs = c.join(F.broadcast(q), on="bucket").filter(F.col("nid") != F.col("qid"))
    scored = pairs.select(
        "qid",
        "nid",
        F.round(
            _int_dot(F.col("qvec"), F.col("cvec"))
            / (F.sqrt(_int_norm2(F.col("qvec"))) * F.sqrt(_int_norm2(F.col("cvec")))),
            4,
        ).alias("cosine"),
    )
    w = Window.partitionBy("qid").orderBy(F.desc("cosine"), F.asc("nid"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("qid", "nid", "cosine", "rank")
    )
