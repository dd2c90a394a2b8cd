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


def _det_planes(n: int, dim: int, tag: str = "plane") -> list[list[float]]:
    """Deterministic pseudo-random unit-free vectors (md5-nibble derived) —
    reruns produce identical buckets, required for resume/lineage."""
    import hashlib

    out = []
    for j in range(n):
        vals: list[float] = []
        i = 0
        while len(vals) < dim:
            h = hashlib.md5(f"{tag}:{j}:{i}".encode()).hexdigest()
            vals.extend((int(ch, 16) - 7.5) / 7.5 for ch in h)
            i += 1
        out.append(vals[:dim])
    return out


def ivf_cosine_topk(
    vectors: DataFrame,
    id_col: str,
    vec_col: str,
    query_ids_max: int,
    k: int = 3,
    n_centroids: int = 8,
    n_probe: int = 2,
    dim: int = 64,
) -> DataFrame:
    """IVF-style ANN: assign every vector to its nearest pseudo-centroid
    (deterministic md5-derived centroids — a stand-in for a trained
    k-means codebook, same plumbing), queries probe their `n_probe`
    nearest cells, exact rerank within probed cells only.

    Scale shape: centroid assignment is a narrow map (JVM expressions);
    the probe join keys on cell id — shuffle bytes ∝ cells probed, never
    O(n·q). Approximate by construction → rows-only check; the exact twin
    is :func:`cosine_topk`.
    """
    from pyspark.sql import Window

    cents = _det_planes(n_centroids, dim, tag="ivf")

    def cell_scores(vc: Column) -> Column:
        scores = []
        for ci, c in enumerate(cents):
            arr = F.array(*[F.lit(v) for v in c])
            dot = F.aggregate(
                F.zip_with(vc, arr, lambda x, y: x * y), F.lit(0.0), lambda a, x: a + x
            )
            scores.append(F.struct(dot.alias("s"), F.lit(ci).alias("cell")))
        return F.reverse(F.array_sort(F.array(*scores)))

    scored_cells = vectors.select(
        F.col(id_col),
        quantize(F.col(vec_col)).alias("qv"),
        cell_scores(F.col(vec_col)).alias("cells"),
    )
    data = scored_cells.select(
        F.col(id_col).alias("nid"),
        F.col("qv").alias("cvec"),
        F.element_at("cells", 1).getField("cell").alias("cell"),
    )
    probes = (
        scored_cells.filter(F.col(id_col) < query_ids_max)
        .select(
            F.col(id_col).alias("qid"),
            F.col("qv").alias("qvec"),
            F.explode(F.slice("cells", 1, n_probe)).alias("probe"),
        )
        .select("qid", "qvec", F.col("probe.cell").alias("cell"))
    )
    pairs = data.join(F.broadcast(probes), on="cell").filter(F.col("nid") != F.col("qid"))
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


def cosine_near_dup_pairs(
    vectors: DataFrame,
    id_col: str,
    vec_col: str,
    threshold: float = 0.42,
) -> DataFrame:
    """Embedding-cosine near-duplicate pairs: (a < b) with cosine ≥ threshold.

    The dedup twin of :func:`cosine_topk` — same quantized-int arithmetic
    so the DuckDB oracle matches exactly. Shape: broadcast self-join
    (small side replicated, big side never shuffles); at 10^9 vectors the
    candidate generator switches to the sign-LSH bucket join of
    :func:`lsh_cosine_topk` and reranks within buckets only.
    """
    a = vectors.select(F.col(id_col).alias("doc_a"), quantize(F.col(vec_col)).alias("va"))
    b = vectors.select(F.col(id_col).alias("doc_b"), quantize(F.col(vec_col)).alias("vb"))
    pairs = a.crossJoin(F.broadcast(b)).filter(F.col("doc_a") < F.col("doc_b"))
    scored = pairs.select(
        "doc_a",
        "doc_b",
        F.round(
            _int_dot(F.col("va"), F.col("vb"))
            / (F.sqrt(_int_norm2(F.col("va"))) * F.sqrt(_int_norm2(F.col("vb")))),
            4,
        ).alias("cosine"),
    )
    return scored.filter(F.col("cosine") >= threshold)


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

    planes = _det_planes(n_planes, dim)

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
