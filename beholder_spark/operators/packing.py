"""Training-batch shaping: sequence packing + token-budget mixing.

Two ops every LLM-training data pipeline runs between "curated corpus"
and "training shards", neither of which the engine covered before:

* :func:`pack_sequences` — GPT-style concat-and-chunk packing: lay the
  corpus out in one deterministic order and cut it into fixed-capacity
  token windows; report, per document, which window(s) it lands in.
  Feeding a trainer needs exactly this map (doc → window span), and
  boundary statistics (how many docs straddle a window edge) drive the
  choice of context length.
* :func:`mix_token_budget` — DoReMi-ish static domain mixing: given a
  global token budget and per-domain weights, derive per-domain keep
  rates and take a deterministic hash sample of each domain sized to
  its share of the budget.

Scale notes (the whole point of the two-phase shapes):

* A naive packing cumsum is ``sum() OVER (ORDER BY ...)`` — a GLOBAL
  window, i.e. every row through ONE task. At 100 TB that is the job.
  :func:`pack_sequences` computes the same prefix sum in two phases:
  within-shard windows (parallel across shards) plus a broadcast join
  against the S-row table of shard base offsets — the only global
  window runs over S rows, not the corpus. Same trick as a textbook
  distributed prefix-scan.
* Shard assignment and pack order are ``(doc_id % shards, doc_id)`` —
  pure integer arithmetic, no RNG, so the layout is reproducible on
  any engine (the DuckDB oracle re-derives it with one global window,
  which is fine at oracle scale).
* :func:`mix_token_budget` keeps per-row work to one md5 (the engine's
  deterministic-sampling primitive, operators/sample.py): the
  data-derived rates live in a per-domain aggregate (|domains| rows,
  broadcast back). No driver-side collect; thresholds are computed
  in-plan so the whole thing stays one declarative query.

All arithmetic that feeds the keep decision is pinned to md5 prefixes
and double division exactly as sample.py does, so the DuckDB oracle
reproduces every decision bit-for-bit.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from beholder_spark.operators.sample import _HEX_SPACE, _key_hash


def pack_sequences(
    df: DataFrame,
    tok_col: str,
    capacity: int,
    id_col: str = "doc_id",
    shards: int = 32,
) -> DataFrame:
    """Concat-and-chunk packing plan: deterministic doc → window map.

    Documents are laid out in ``(id % shards, id)`` order and the token
    stream is cut every ``capacity`` tokens. Returns one row per input
    document: its token count, its global token offset, the first and
    last window it touches, and how many windows that is (0 for empty
    documents — they occupy no tokens, so no window).

    Two-phase distributed prefix sum (see module docstring): the only
    global ordering is over the ``shards``-row base-offset table.
    """
    if capacity <= 0:
        raise ValueError(f"capacity must be positive, got {capacity}")
    if shards <= 0:
        raise ValueError(f"shards must be positive, got {shards}")
    d = df.withColumn("_shard", F.pmod(F.col(id_col), F.lit(shards)))
    in_shard = (
        Window.partitionBy("_shard")
        .orderBy(id_col)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    d = d.withColumn(
        "_local_off", F.coalesce(F.sum(tok_col).over(in_shard), F.lit(0))
    )
    totals = d.groupBy("_shard").agg(F.sum(tok_col).alias("_shard_tok"))
    shard_order = Window.orderBy("_shard").rowsBetween(
        Window.unboundedPreceding, -1
    )
    bases = totals.select(
        "_shard",
        F.coalesce(F.sum("_shard_tok").over(shard_order), F.lit(0)).alias("_base"),
    )
    d = d.join(F.broadcast(bases), "_shard")
    d = d.withColumn("_off", (F.col("_base") + F.col("_local_off")).cast("long"))
    # last token's offset as a named column so the user's tok_col name
    # never gets spliced into SQL text (quoting-hostile names stay safe)
    d = d.withColumn("_last", F.col("_off") + F.col(tok_col) - 1)
    # integer division (`div`), NOT float `/`: token offsets at corpus
    # scale overflow double's 2^53 integer range long before they
    # overflow int64
    start = F.expr(f"_off div {capacity}")
    end = F.when(F.col(tok_col) > 0, F.expr(f"_last div {capacity}")).otherwise(start)
    return d.select(
        F.col(id_col),
        F.col(tok_col).cast("long").alias("n_tok"),
        F.col("_off").alias("tok_offset"),
        start.cast("long").alias("start_window"),
        end.cast("long").alias("end_window"),
        F.when(F.col(tok_col) > 0, end - start + 1)
        .otherwise(F.lit(0))
        .cast("long")
        .alias("n_windows"),
    )


# Global bin id = shard * _BIN_STRIDE + shard-local bin index. 2^40
# local bins per shard keeps the composite inside int64 for any shard
# count below 2^23 — far beyond a real deployment's shard choice.
_BIN_STRIDE = 1 << 40


def pack_bins_nosplit(
    df: DataFrame,
    tok_col: str,
    capacity: int,
    id_col: str = "doc_id",
    shards: int = 32,
) -> DataFrame:
    """No-split bin packing (next-fit): docs → fixed-capacity bins, never
    splitting a document — the SFT-style packing, complement to
    :func:`pack_sequences`'s concat-and-chunk.

    Next-fit keeps ONE open bin per shard: a doc joins it if it fits,
    else opens a new bin. The policy is inherently sequential, so it
    runs per shard via ``applyInPandas`` in ``(id % shards, id)`` order
    — the shard is the parallelism unit (pick shards ≳ cluster cores at
    scale; per-group work is a scalar O(rows) loop, no pairwise state).
    Docs longer than ``capacity`` get a bin of their own, flagged
    ``oversize`` (they can never fit; flag feeds a filter/truncate
    policy upstream).

    Returns (id, n_tok, bin_id, oversize) with ``bin_id`` globally
    unique across shards. Deterministic: no RNG anywhere, so the DuckDB
    oracle replays the same fold as a recursive CTE.

    NULL semantics (defined, not crashy): a NULL token count packs as
    width 0 (same as an empty doc; reported n_tok stays NULL), and
    NULL ids — whose shard hash is NULL — pack together into a
    dedicated sentinel shard one past the real ones, ordered last.
    """
    if capacity <= 0:
        raise ValueError(f"capacity must be positive, got {capacity}")
    if shards <= 0:
        raise ValueError(f"shards must be positive, got {shards}")

    import pandas as pd
    from pyspark.sql import types as T

    out_schema = T.StructType(
        [
            T.StructField(id_col, T.LongType(), True),
            T.StructField("n_tok", T.LongType(), True),
            T.StructField("bin_id", T.LongType(), True),
            T.StructField("oversize", T.BooleanType(), True),
        ]
    )

    def pack_one_shard(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(id_col, kind="mergesort", na_position="last")
        sv = pdf["_shard"].iloc[0]
        shard = shards if pd.isna(sv) else int(sv)
        base = shard * _BIN_STRIDE
        toks = pdf[tok_col].fillna(0).astype("int64")
        bins, fill, local = [], 0, 0
        for t in toks:
            if fill + t > capacity and fill > 0:
                local += 1
                fill = 0
            fill += t
            bins.append(base + local)
        return pd.DataFrame(
            {
                id_col: pdf[id_col].astype("Int64"),
                "n_tok": pdf[tok_col].astype("Int64"),
                "bin_id": pd.Series(bins, dtype="int64", index=pdf.index),
                "oversize": toks > capacity,
            }
        )

    return (
        df.withColumn("_shard", F.pmod(F.col(id_col), F.lit(shards)))
        .groupBy("_shard")
        .applyInPandas(pack_one_shard, out_schema)
    )


def mix_token_budget(
    df: DataFrame,
    strata_col: str,
    tok_col: str,
    key: str,
    budget: int,
    weights: dict[str, float],
) -> DataFrame:
    """Deterministic domain mixing to a token budget.

    Each stratum value ``v`` gets a token budget ``budget * weights[v]``
    (strata absent from ``weights`` get 0 — dropped). If the stratum's
    total is within its budget it is kept whole; otherwise rows are
    hash-sampled (md5 on ``key``, same primitive as operators/sample.py)
    at ``rate = budget_v / total_v``. Rates derive from the DATA, so
    they are computed in-plan: a |strata|-row aggregate broadcast back
    onto the corpus — rerun-stable, no driver collect, no RNG.

    Returns the kept rows (all input columns).
    """
    if budget <= 0:
        raise ValueError(f"budget must be positive, got {budget}")
    wexpr = F.lit(None).cast("double")
    for value, w in weights.items():
        wexpr = F.when(F.col(strata_col) == value, F.lit(float(w))).otherwise(wexpr)
    totals = (
        df.groupBy(strata_col)
        .agg(F.sum(tok_col).cast("double").alias("_tot"))
        .withColumn("_budget", wexpr * F.lit(float(budget)))
        .filter(F.col("_budget").isNotNull())
    )
    # keep-all ⇒ 'g' (sorts above every hex digit); else an 8-hex-digit
    # threshold — identical construction to sample._threshold_hex
    # INCLUDING its n >= _HEX_SPACE carry clamp. With THIS operand
    # order ((bud/tot)*2^32, correctly-rounded IEEE) the carry is
    # unreachable for bud < tot (rate <= 1-2^-53 so the product caps at
    # 2^32 - 2^-21, exactly representable), but the clamp stays: it is
    # bit-identical to the oracle's CASE, and a future re-association
    # (e.g. bud*2^32/tot) CAN round to 2^32, where hex() grows to NINE
    # digits and lpad would silently truncate to a ~1/16 threshold.
    # Spark hex() is uppercase/unpadded; lower+lpad pins the exact
    # string DuckDB's printf('%08x') produces.
    n = F.floor(F.col("_budget") / F.col("_tot") * F.lit(float(_HEX_SPACE)))
    thr = (
        F.when(F.col("_tot") <= F.col("_budget"), F.lit("g"))
        .when(n >= F.lit(_HEX_SPACE), F.lit("g"))
        .otherwise(F.lower(F.lpad(F.hex(n), 8, "0")))
    )
    thresholds = totals.select(strata_col, thr.alias("_thr"))
    return (
        df.join(F.broadcast(thresholds), strata_col)
        .filter(_key_hash(key) < F.col("_thr"))
        .drop("_thr")
    )
