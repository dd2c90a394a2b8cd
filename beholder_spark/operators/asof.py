"""Time-ordered joins Spark lacks as built-ins: as-of join (latest right
row at-or-before each left row) and bounded interval join (right rows
within a trailing time window), both in shapes that survive 100 TB.

As-of is NOT implemented as an inequality join (Catalyst would plan a
broadcast-nested-loop or a sort-merge with per-row range scans). Instead
both sides are union-tagged and a single window pass per key carries the
most recent right row forward — ONE shuffle on the key, O(n log n) local
sort, no pair explosion regardless of how many right rows precede a left
row. This is the same plan a hand-written merge join would produce, but
expressed declaratively so AQE still handles skewed keys.

The interval join is bucketed: right rows explode to the fixed number of
time buckets their window can reach (ceil(window/bucket)+1, a small
constant), the join runs on (key, bucket) equality, and the exact range
predicate filters after. Pair work per key·bucket is bounded by bucket
occupancy — never O(|left|·|right|) per key — and the equi-join keys let
Catalyst use a plain shuffled hash join with AQE skew splitting.

DuckDB twins: ASOF LEFT JOIN (native) and a plain inequality join —
tiny at oracle scale, where exactness is what's being proven.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    key_cols: Sequence[str],
    ts_col: str,
    payload_cols: Sequence[str],
    prefix: str = "asof_",
) -> DataFrame:
    """For each left row, attach the most recent right row with the same
    key and ``right.ts <= left.ts`` (inclusive, matching DuckDB's
    ``ASOF LEFT JOIN ... ON l.ts >= r.ts``). Left rows with no prior
    right row survive with NULLs (never dropped — quarantine philosophy).

    Output adds ``{prefix}{ts_col}`` (the matched right timestamp) and
    ``{prefix}{c}`` for each payload column.

    The matched right row is carried as ONE struct through
    ``last(ignorenulls)`` so its columns stay atomic — a NULL inside a
    right payload column never falls back to an older row's value.

    Ties: right rows sort before left rows at equal ``ts`` (so an exactly
    simultaneous right row matches); multiple RIGHT rows at the same
    (key, ts) are ambiguous — pre-aggregate the right side to one row per
    (key, ts) for deterministic results (the oracle queries do).

    NULL semantics match SQL ASOF JOIN: right rows with a NULL timestamp
    or NULL key can never match (they are dropped before the union —
    NULLs sort FIRST under Spark's asc ordering, so without the filter a
    NULL-ts right row would be carried into every left row of its key),
    and left rows with NULL keys get no match (SQL equality never
    matches NULL = NULL).
    """
    keys = list(key_cols)
    packed = F.struct(
        F.col(ts_col).alias(f"{prefix}{ts_col}"),
        *[F.col(c).alias(f"{prefix}{c}") for c in payload_cols],
    )
    matchable = F.col(ts_col).isNotNull()
    for kc in keys:
        matchable = matchable & F.col(kc).isNotNull()
    rt = right.filter(matchable).select(*keys, ts_col, packed.alias("_r")).withColumn(
        "_side", F.lit(0)
    )
    lt = left.withColumn("_side", F.lit(1))
    u = lt.unionByName(rt, allowMissingColumns=True)
    w = (
        Window.partitionBy(*keys)
        .orderBy(F.col(ts_col).asc(), F.col("_side").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = u.withColumn("_match", F.last("_r", ignorenulls=True).over(w))
    out = carried.filter(F.col("_side") == 1).drop("_side", "_r")
    for field in [f"{prefix}{ts_col}"] + [f"{prefix}{c}" for c in payload_cols]:
        out = out.withColumn(field, F.col("_match")[field])
    return out.drop("_match")


def interval_join_count(
    left: DataFrame,
    right: DataFrame,
    key_cols: Sequence[str],
    ts_col: str,
    window_seconds: int,
    bucket_seconds: int | None = None,
    out_col: str = "n_in_window",
) -> DataFrame:
    """Per left row, COUNT right rows with the same key in the trailing
    window ``(left.ts - window_seconds, left.ts]`` — half-open at the old
    edge, inclusive at the new one, so a simultaneous right row counts.

    Bucketed range join: each right row lands in every time bucket its
    window can reach (a constant ``ceil(window/bucket)+1`` copies), the
    join is pure (key, bucket) EQUALITY, and the exact range predicate
    filters the joined rows. No inequality-join nested loop; skewed keys
    split by AQE like any equi-join.
    """
    if bucket_seconds is None:
        bucket_seconds = window_seconds
    keys = list(key_cols)
    reach = window_seconds // bucket_seconds + 1
    rsec = F.unix_timestamp(F.col(ts_col))
    rb = (
        right.select(*keys, F.col(ts_col).alias("_rts"), F.floor(rsec / bucket_seconds).alias("_rb"))
        .withColumn("_bucket", F.explode(F.sequence(F.col("_rb"), F.col("_rb") + reach)))
        .drop("_rb")
    )
    # The count depends only on (key, ts), so wide left payloads never ride
    # the bucket join or the aggregate shuffle: probe with the DISTINCT
    # narrow (key, ts) pairs, count per pair, and equi-join the counts back
    # to the (untouched) left side. Duplicate left rows share one probe row
    # and inherit the same count; NULL keys/ts never equality-match on the
    # way back and fall through to the coalesced 0 — identical semantics to
    # counting against a left bucket join, at a fraction of the shuffle
    # width when left carries payload columns.
    probe = (
        left.select(*keys, ts_col)
        .distinct()
        .withColumn("_bucket", F.floor(F.unix_timestamp(F.col(ts_col)) / bucket_seconds))
    )
    in_range = (
        (F.col("_rts") <= F.col(ts_col))
        & (F.col("_rts") > F.col(ts_col) - F.expr(f"INTERVAL {window_seconds} SECOND"))
    )
    counts = (
        probe.join(rb, on=keys + ["_bucket"], how="inner")
        .filter(in_range)
        .groupBy(*keys, ts_col)
        .agg(F.count(F.lit(1)).alias(out_col))
    )
    return (
        left.join(counts, on=keys + [ts_col], how="left")
        .withColumn(out_col, F.coalesce(F.col(out_col), F.lit(0)).cast("bigint"))
        .select(*left.columns, out_col)
    )
