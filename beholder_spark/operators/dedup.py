"""Near-duplicate detection sketches: MinHash+LSH, SimHash, n-gram Jaccard.

Scale design (the reason these aren't naive pair comparisons): candidate
generation is shingle→minhash→band→bucket-join, so the self-join runs on
small band-signature keys, never on O(n²) document pairs. Every hash is
md5-derived (not Spark's xxhash64) precisely so the DuckDB oracle can
reproduce signatures bit-for-bit.

PRODUCTION HASH KNOB: md5 is the oracle-reproducibility choice, not a
similarity requirement — any uniform hash gives statistically identical
sketches. A throughput-bound deployment can swap the ``F.md5(...)``
digests here (and in textstats/webtext fingerprints) for ``xxhash64``:
~3-5× cheaper per hash, all-JVM, and the signature/band/bucket shapes
below are unchanged. The trade is losing bit-exact DuckDB twins (the
correctness gate would drop to rows-only), which is why this repo pins
md5 everywhere tested paths hash.

At 100 TB: the explode(shingles) stage is a generator (no shuffle); the
signature groupBy shuffles (doc_id → K minhash strings) ≈ K·32 bytes/doc;
the band self-join shuffles band keys only. Skewed buckets (boilerplate
documents) are bounded: MinHash caps per-(band,bucket) membership at
``max_bucket_size`` via a deterministic row_number window (pairs per
bucket ≤ cap², never O(members²) on one hot key), and n-gram Jaccard
drops stop-shingles whose document frequency exceeds ``max_doc_freq``
(boilerplate shingles carry no similarity signal and would otherwise
explode the shingle self-join on one key). Both caps are deterministic
(ordered by doc id / exact frequency), so the DuckDB oracle reproduces
the capped result exactly — no silent truncation: the capped variants
are their own oracle-checked queries.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

DEFAULT_K = 8  # minhash permutations
DEFAULT_BANDS = 4  # LSH bands (rows per band = K / BANDS)
# skew bounds — generous enough to be exact on healthy corpora, hard
# enough that one boilerplate key cannot produce an O(n²) pair explosion
DEFAULT_MAX_BUCKET = 10_000
DEFAULT_MAX_DOC_FREQ = 10_000


def word_shingles(df: DataFrame, id_col: str, text_col: str, n: int = 3) -> DataFrame:
    """Distinct n-word shingles per document — generator, no shuffle.

    ``transform(sequence(...))`` builds the shingle array JVM-side; explode
    emits (id, shingle) rows.
    """
    toks = F.split(F.col(text_col), " ")
    count = F.size(toks) - (n - 1)
    # sequence(1, 0) would yield a DESCENDING [1,0] in Spark — guard short docs
    idx = F.when(count >= 1, F.sequence(F.lit(1), count)).otherwise(
        F.array().cast("array<int>")
    )
    shingles = F.transform(idx, lambda i: F.array_join(F.slice(toks, i, n), " "))
    return df.select(
        F.col(id_col), F.explode(F.array_distinct(shingles)).alias("shingle")
    )


LANES_PER_DIGEST = 4  # 4 × 32-bit (8 hex chars) lanes per 128-bit md5


def minhash_signatures(shingles: DataFrame, id_col: str, k: int = DEFAULT_K) -> DataFrame:
    """K minhashes per doc in ONE hash aggregate (k min() columns), not k
    passes — and only ceil(k/4) md5 invocations per shingle, not k: each
    128-bit digest yields four independent 32-bit lanes
    (h_j = min(substr(md5('<salt>:'||shingle), lane*8+1, 8))), the
    standard few-hash minhash trick. Cuts the dominant cost of LSH
    (per-shingle hashing) 4× with identical banding math; the oracle SQL
    slices the same digests, so signatures stay bit-reproducible.
    """
    digests = {}
    for j in range(k):
        salt = j // LANES_PER_DIGEST
        if salt not in digests:
            digests[salt] = F.md5(F.concat(F.lit(f"{salt}:"), F.col("shingle")))
    aggs = [
        F.min(
            F.substring(digests[j // LANES_PER_DIGEST], (j % LANES_PER_DIGEST) * 8 + 1, 8)
        ).alias(f"h{j}")
        for j in range(k)
    ]
    return shingles.groupBy(id_col).agg(*aggs)


def lsh_band_buckets(sig: DataFrame, id_col: str, k: int = DEFAULT_K, bands: int = DEFAULT_BANDS) -> DataFrame:
    """Band signature = md5(concat of the band's minhashes); one row per
    (doc, band)."""
    rows = k // bands
    band_cols = []
    for b in range(bands):
        parts = [F.col(f"h{b * rows + r}") for r in range(rows)]
        band_cols.append(F.struct(F.lit(b).alias("band"), F.md5(F.concat(*parts)).alias("bucket")))
    return sig.select(
        F.col(id_col), F.explode(F.array(*band_cols)).alias("bb")
    ).select(id_col, "bb.band", "bb.bucket")


def _cap_buckets(bb: DataFrame, id_col: str, max_bucket_size: int | None) -> DataFrame:
    """Deterministic per-(band, bucket) membership cap (lowest ids kept,
    row_number ordered by id) — ONE definition shared by the self-join and
    cross-snapshot candidate generators so the QUALIFY oracle semantics
    can't desynchronize between them. ``None`` disables."""
    if max_bucket_size is None:
        return bb
    w = Window.partitionBy("band", "bucket").orderBy(F.col(id_col))
    return (
        bb.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") <= max_bucket_size)
        .drop("_rn")
    )


def minhash_candidate_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    shingle_n: int = 3,
    k: int = DEFAULT_K,
    bands: int = DEFAULT_BANDS,
    max_bucket_size: int | None = DEFAULT_MAX_BUCKET,
) -> DataFrame:
    """MinHash+LSH near-dup candidates: distinct (doc_a < doc_b) sharing
    ≥1 band bucket. The join key is (band, bucket) — tiny and uniform on
    healthy corpora; boilerplate collapses many docs into one bucket, so
    membership per (band, bucket) is capped at ``max_bucket_size``
    (deterministic: lowest ids kept, via row_number ordered by id) —
    pairs per bucket ≤ cap·(cap−1)/2 instead of O(members²) on one hot
    key. SEMANTICS under the cap: docs beyond it in an over-full bucket
    lose that band's candidacy (they usually share other bands; genuine
    boilerplate buckets carry no near-dup signal worth O(n²) anyway).
    ``None`` disables. The cap is exact and engine-reproducible — the
    capped variant has its own DuckDB oracle (QUALIFY row_number()).
    """
    sh = word_shingles(df, id_col, text_col, shingle_n)
    sig = minhash_signatures(sh, id_col, k)
    bb = _cap_buckets(lsh_band_buckets(sig, id_col, k, bands), id_col, max_bucket_size)
    a = bb.select(F.col(id_col).alias("doc_a"), "band", "bucket")
    b = bb.select(F.col(id_col).alias("doc_b"), "band", "bucket")
    return (
        a.join(b, on=["band", "bucket"])
        .filter(F.col("doc_a") < F.col("doc_b"))
        .select("doc_a", "doc_b")
        .distinct()
    )


def ngram_jaccard_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    shingle_n: int = 5,
    threshold: float = 0.5,
    max_doc_freq: int | None = DEFAULT_MAX_DOC_FREQ,
) -> DataFrame:
    """Exact n-gram Jaccard for pairs sharing ≥1 shingle.

    shared/(|A|+|B|-shared) on distinct shingle sets — exact rational of
    ints, so the oracle matches bit-for-bit. The shingle self-join is the
    candidate generator; a shingle appearing in m docs contributes m²
    join rows, so stop-shingles (document frequency > ``max_doc_freq``:
    headers, navigation, licence boilerplate) are excluded from the
    shingle SETS themselves (join AND sizes — Jaccard stays an exact
    ratio over the filtered space). The hot set is tiny by construction →
    broadcast anti-join; ``None`` disables. Deterministic (exact
    frequencies), so the filtered variant has its own DuckDB oracle.
    """
    sh = word_shingles(df, id_col, text_col, shingle_n)
    if max_doc_freq is not None:
        hot = (
            sh.groupBy("shingle")
            .agg(F.count(F.lit(1)).alias("_df"))
            .filter(F.col("_df") > max_doc_freq)
            .select("shingle")
        )
        sh = sh.join(F.broadcast(hot), "shingle", "left_anti")
    sizes = sh.groupBy(id_col).agg(F.count(F.lit(1)).alias("n_sh"))
    a = sh.select(F.col(id_col).alias("doc_a"), "shingle")
    b = sh.select(F.col(id_col).alias("doc_b"), "shingle")
    shared = (
        a.join(b, on="shingle")
        .filter(F.col("doc_a") < F.col("doc_b"))
        .groupBy("doc_a", "doc_b")
        .agg(F.count(F.lit(1)).alias("shared"))
    )
    sa = sizes.select(F.col(id_col).alias("doc_a"), F.col("n_sh").alias("na"))
    sb = sizes.select(F.col(id_col).alias("doc_b"), F.col("n_sh").alias("nb"))
    jac = (
        shared.join(F.broadcast(sa), "doc_a")
        .join(F.broadcast(sb), "doc_b")
        .withColumn("jaccard", F.round(F.col("shared") / (F.col("na") + F.col("nb") - F.col("shared")), 4))
    )
    return jac.filter(F.col("jaccard") >= threshold).select("doc_a", "doc_b", "jaccard")


def simhash(
    df: DataFrame, id_col: str, text_col: str, out_col: str = "simhash", bits: int = 16
) -> DataFrame:
    """``bits``-bit SimHash over whitespace tokens (md5-nibble bits).

    bit_j(tok) = (hex_nibble(md5(tok), j//4) >> (3 - j%4)) & 1;
    s_j = Σ_tokens (2·bit_j − 1);  simhash = Σ_j (s_j > 0)·2^j.
    One explode + one hash aggregate; everything md5-based → oracle-exact
    at ANY width (the oracle SQL is generated for the same ``bits``).
    md5 yields 128 independent bits; the long-typed assembly allows 62
    (sign-safe). Wider hashes lower collision rates on large corpora —
    production near-dup banding typically slices a 64-bit simhash.
    """
    if not 1 <= bits <= 62:
        raise ValueError(f"bits must be in [1, 62], got {bits}")
    toks = df.select(F.col(id_col), F.explode(F.split(F.col(text_col), " ")).alias("tok"))
    h = F.md5(F.col("tok"))
    aggs = []
    for j in range(bits):
        nib = F.instr(F.lit("0123456789abcdef"), F.substring(h, j // 4 + 1, 1)) - 1
        bit = F.shiftright(nib, 3 - j % 4).bitwiseAND(F.lit(1))
        aggs.append(F.sum(bit * 2 - 1).alias(f"s{j}"))
    sums = toks.groupBy(id_col).agg(*aggs)
    sim = None
    for j in range(bits):
        term = F.when(F.col(f"s{j}") > 0, F.lit(1 << j).cast("long")).otherwise(F.lit(0).cast("long"))
        sim = term if sim is None else sim + term
    return sums.select(F.col(id_col), sim.cast("long").alias(out_col))


def simhash16(df: DataFrame, id_col: str, text_col: str, out_col: str = "simhash") -> DataFrame:
    """16-bit SimHash (compact oracle-demo width; see :func:`simhash`)."""
    return simhash(df, id_col, text_col, out_col, bits=16)


def winnow_overlap_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    k: int = 3,
    window: int = 4,
    min_shared: int = 2,
    max_fp_freq: int | None = DEFAULT_MAX_DOC_FREQ,
) -> DataFrame:
    """Partial-overlap candidate pairs: documents sharing ≥ ``min_shared``
    MOSS winnowing fingerprints — the COPIED-SPAN detector (a paragraph
    lifted into an otherwise-different page), which whole-document
    fingerprints miss entirely and whole-document minhash dilutes.

    Same scale discipline as the shingle generators: the join key is the
    32-byte fingerprint hash (never text), fingerprints hotter than
    ``max_fp_freq`` documents are dropped via broadcast anti-join
    (boilerplate spans carry no overlap signal worth O(m²) join rows),
    and ``shared_fp`` is an exact count over the filtered space — the
    oracle reproduces pairs and counts bit-for-bit.
    """
    from beholder_spark.operators.textstats import with_winnow_fingerprints

    fps = with_winnow_fingerprints(
        df.select(id_col, text_col), text_col, k, window
    ).select(F.col(id_col), F.explode("winnow").alias("fp"))
    if max_fp_freq is not None:
        hot = (
            fps.groupBy("fp")
            .agg(F.count(F.lit(1)).alias("_df"))
            .filter(F.col("_df") > max_fp_freq)
            .select("fp")
        )
        fps = fps.join(F.broadcast(hot), "fp", "left_anti")
    a = fps.select(F.col(id_col).alias("doc_a"), "fp")
    b = fps.select(F.col(id_col).alias("doc_b"), "fp")
    return (
        a.join(b, "fp")
        .filter(F.col("doc_a") < F.col("doc_b"))
        .groupBy("doc_a", "doc_b")
        .agg(F.count(F.lit(1)).alias("shared_fp"))
        .filter(F.col("shared_fp") >= min_shared)
    )


def incremental_candidate_pairs(
    new_df: DataFrame,
    index_df: DataFrame,
    id_col: str,
    text_col: str,
    shingle_n: int = 3,
    k: int = DEFAULT_K,
    bands: int = DEFAULT_BANDS,
    max_bucket_size: int | None = DEFAULT_MAX_BUCKET,
) -> DataFrame:
    """Cross-snapshot near-dup candidates: (new_id, index_id) pairs where
    a NEW document shares an LSH band bucket with an INDEX document — the
    incremental-crawl dedup a CC pipeline runs per snapshot (new docs
    against the already-kept corpus), NOT a self-join.

    Scale shape vs the self-join variant: the index side's signatures are
    computed once per snapshot and persist as a table in production (here
    recomputed for the oracle); the join is new-bands ⋈ index-bands on
    (band, bucket) — new×index only, never new×new or index×index, so
    per-bucket work is |new_b|·|index_b| not (|new_b|+|index_b|)². The
    same deterministic per-bucket cap bounds boilerplate buckets on BOTH
    sides. Returns (new_id, index_id) distinct pairs; dropping matched
    new docs is a semi/anti join downstream.
    """

    def _bucketed(df: DataFrame) -> DataFrame:
        sh = word_shingles(df, id_col, text_col, shingle_n)
        bb = lsh_band_buckets(minhash_signatures(sh, id_col, k), id_col, k, bands)
        return _cap_buckets(bb, id_col, max_bucket_size)

    new_bb = _bucketed(new_df).select(F.col(id_col).alias("new_id"), "band", "bucket")
    idx_bb = _bucketed(index_df).select(F.col(id_col).alias("index_id"), "band", "bucket")
    return (
        new_bb.join(idx_bb, on=["band", "bucket"])
        .select("new_id", "index_id")
        .distinct()
    )


def connected_components(
    pairs: DataFrame,
    a_col: str = "doc_a",
    b_col: str = "doc_b",
    max_iter: int = 25,
    stats: dict | None = None,
) -> DataFrame:
    """Duplicate-cluster assignment: connected components over an
    undirected candidate-pair edge list (the step after LSH that turns
    pairwise matches into keep-one-per-cluster groups).

    Returns (node, cluster_id) for every node appearing in ``pairs``,
    where cluster_id = min node id in the component — deterministic, so
    "keep the canonical doc" = ``node == cluster_id``. Singletons never
    enter the edge list; callers left-join and coalesce to the node's own
    id. Type-agnostic: any orderable id type (long, string) works.

    Algorithm (VERDICT r4 item 5): LARGE-STAR / SMALL-STAR alternation
    (Kiveris et al., "Connected Components in MapReduce and Beyond",
    SoCC'14 — public literature). Rounds grow O(log n) in the component
    size instead of O(diameter): the r1–r4 min-label propagation needed
    one synchronous round per hop, so a 100-TB corpus with CHAINED
    near-dups (a~b~c~…, each pair within threshold but the ends far
    apart) could need hundreds of full-frontier shuffles; star
    contraction halves path lengths every alternation. Per round:
      - large-star: every node connects its LARGER neighbors to the
        minimum of its closed neighborhood (one groupBy-min + one
        equi-join on node ids);
      - small-star: on the now big→small directed edges, every node
        re-points its smaller neighbors and itself at the minimum
        (same two shuffles).
    All shuffle keys are node ids, payload one id — never text. The
    edge set is materialized per round with an EAGER localCheckpoint
    that truncates the logical plan (each round references the previous
    set ~10×, so an untruncated plan grows ~10×/round and Catalyst
    analysis time explodes — see the loop comment); the previous
    round's blocks are released as frames are rebound. Convergence =
    the directed edge set is EXACTLY stable across a full alternation
    (count + left-anti join — set equality on distinct sets, no
    checksum false-positives); at the fixed point every
    non-minimum node points directly at its component minimum (the
    paper's star-forest invariant), so labels read straight off the
    edges with no extra propagation pass.

    ``stats`` (optional) receives {"rounds": k} — the round-bound test
    pins k ≤ 2·log2(n)+4 on a path graph where the old algorithm needed
    n rounds. Raises RuntimeError if not converged within ``max_iter``
    (no silent partial clustering).
    """
    # ONE materialization of the (possibly expensive) upstream pair plan:
    # nodes and edges both derive from this persisted projection, so e.g.
    # a MinHash-LSH pair generation runs once, not once per derived frame.
    e_raw = pairs.select(F.col(a_col).alias("u"), F.col(b_col).alias("v")).persist()
    # every node ever mentioned (incl. self-pair-only nodes) must be output.
    # NOT persisted: consumed exactly once (the final labels join), and its
    # one computation reads the already-persisted e_raw — caching it would
    # pin executor storage for the whole round loop with zero reuse.
    nodes = (
        e_raw.select("u")
        .unionByName(e_raw.select(F.col("v").alias("u")))
        .distinct()
        .withColumnRenamed("u", "node")
    )
    # canonical directed edges big→small, self-loops dropped
    edges = (
        e_raw.filter(F.col("u") != F.col("v"))
        .select(
            F.greatest("u", "v").alias("u"), F.least("u", "v").alias("v")
        )
        .distinct()
        .persist()
    )
    try:
        n_edges = edges.count()
        rounds = 0
        for i in range(max_iter):
            if n_edges == 0:
                break
            # --- large-star: symmetrize, point larger neighbors at the min
            sym = edges.unionByName(
                edges.select(F.col("v").alias("u"), F.col("u").alias("v"))
            )
            mins_l = sym.groupBy("u").agg(
                F.least(F.min("v"), F.first("u")).alias("m")
            )
            after_large = (
                sym.join(mins_l, "u")
                .filter(F.col("v") > F.col("u"))
                .select(F.col("v").alias("u"), F.col("m").alias("v"))
                .distinct()
            )
            # --- small-star: re-point smaller neighbors (and self) at the min
            mins_s = after_large.groupBy("u").agg(F.min("v").alias("m"))
            new_edges = (
                after_large.join(mins_s, "u")
                .select(F.col("v").alias("u"), F.col("m").alias("v"))
                .unionByName(mins_s.select("u", F.col("m").alias("v")))
                .filter(F.col("u") != F.col("v"))
                .distinct()
            )
            # Truncate the logical plan EVERY round (eager localCheckpoint).
            # Each round references the previous edge set ~10× (the sym
            # union plus two self-joins through the min-aggregates), so an
            # untruncated plan grows ~10×/round and Catalyst ANALYSIS — not
            # execution — dominates wall-clock (measured: 95 s of a 99 s
            # third round on a 691-pair sf0.1 input with the r5-initial
            # every-3rd-round lazy checkpoint; 3 s/round truncated). The
            # convergence count materializes the data anyway, so the eager
            # checkpoint adds one cheap job and keeps analysis O(1)/round.
            # Superseded rounds' blocks are released by the ContextCleaner
            # when the old frame is rebound below. localCheckpoint blocks
            # are non-reliable: an executor loss mid-iteration fails the
            # job and the caller reruns — acceptable for a bounded batch
            # operator (O(log n) rounds), unlike the session-lifetime
            # guards where durability forced a different design.
            new_edges = new_edges.localCheckpoint(eager=True)
            n_new = new_edges.count()
            rounds = i + 1
            # exact set-equality convergence: equal counts and new \ old = ∅
            # (both sides distinct; left-anti join has the same set
            # semantics as exceptAll on distinct inputs and a cheaper
            # physical plan) — no checksum collisions, type-agnostic
            converged = (
                n_new == n_edges
                and new_edges.join(edges, ["u", "v"], "left_anti").isEmpty()
            )
            edges.unpersist()
            edges = new_edges
            n_edges = n_new
            if converged:
                break
        else:
            raise RuntimeError(
                f"connected_components did not converge in {max_iter} rounds — "
                "edge set still changing (pathological component shape)"
            )
        if stats is not None:
            stats["rounds"] = rounds
        # fixed point is a star forest: every non-min node has exactly one
        # edge, straight to its component min. Nodes without an edge
        # (roots, singletons, self-pair-only) label themselves.
        labels = nodes.join(
            edges.withColumnRenamed("u", "node"), "node", "left"
        ).select(
            "node", F.coalesce(F.col("v"), F.col("node")).alias("cluster_id")
        )
        # materialize (eager localCheckpoint) so the cached frames can be
        # released — returning a plan over persisted RDDs would pin them
        # in executor storage forever
        return labels.localCheckpoint(eager=True)
    finally:
        e_raw.unpersist()
        edges.unpersist()
