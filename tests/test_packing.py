"""Sequence packing + token-budget mixing (operators/packing.py).

Covers what the oracle twin can't: empty documents (whitespace split
never yields 0 tokens on real text), exact window spans on crafted
boundaries, equivalence of the two-phase prefix sum with a naive global
cumsum, the plan shape (no corpus-wide window), and the mixing
branches (keep-all / sampled / dropped / NULL key).
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

import pytest

from beholder_spark.operators import packing


def _rows(df, *cols):
    return sorted(tuple(r) for r in df.select(*cols).collect())


def test_pack_known_layout(spark):
    # shards=1 → pack order is plain doc_id; capacity 10.
    # doc 0: 4 tok  @0  → window 0
    # doc 1: 0 tok  @4  → no window (n_windows 0)
    # doc 2: 6 tok  @4  → [4,9] window 0
    # doc 3: 25 tok @10 → [10,34] windows 1..3 (spans 3)
    # doc 4: 1 tok  @35 → window 3
    d = spark.createDataFrame(
        [(0, 4), (1, 0), (2, 6), (3, 25), (4, 1)], "doc_id long, n_tok long"
    )
    out = packing.pack_sequences(d, "n_tok", capacity=10, shards=1)
    got = _rows(out, "doc_id", "tok_offset", "start_window", "end_window", "n_windows")
    assert got == [
        (0, 0, 0, 0, 1),
        (1, 4, 0, 0, 0),
        (2, 4, 0, 0, 1),
        (3, 10, 1, 3, 3),
        (4, 35, 3, 3, 1),
    ]


def test_pack_two_phase_matches_global_cumsum(spark):
    d = spark.range(0, 500).select(
        F.col("id").alias("doc_id"),
        (F.pmod(F.col("id") * 37 + 11, F.lit(90))).alias("n_tok"),
    )
    out = packing.pack_sequences(d, "n_tok", capacity=64, shards=8)
    # naive single-window reference (viable only at test scale)
    ref = (
        d.withColumn("_shard", F.pmod(F.col("doc_id"), F.lit(8)))
        .withColumn(
            "tok_offset",
            F.coalesce(
                F.sum("n_tok").over(
                    Window.orderBy("_shard", "doc_id").rowsBetween(
                        Window.unboundedPreceding, -1
                    )
                ),
                F.lit(0),
            ),
        )
    )
    assert _rows(out, "doc_id", "tok_offset") == _rows(ref, "doc_id", "tok_offset")


def test_pack_plan_has_no_corpus_wide_window(spark):
    import re

    d = spark.range(0, 100).select(
        F.col("id").alias("doc_id"), F.lit(5).alias("n_tok")
    )
    out = packing.pack_sequences(d, "n_tok", capacity=16, shards=4)
    plan = out._jdf.queryExecution().executedPlan().toString()
    # the corpus-side prefix window is PARTITIONED by shard: in the spec
    # rendering, partition columns come before the ORDER BY column, so
    # `_shard#N, doc_id#M ASC` is the partitioned form. (A bare
    # `windowspecdefinition(_shard` would also match the intentional
    # 4-row global base-offset window `_shard#N ASC ...` — not
    # discriminating.)
    assert re.search(r"windowspecdefinition\(_shard#\d+L?, \w*doc_id#\d+L? ASC", plan)
    # the naive corpus-wide form — global ORDER BY (_shard, doc_id), no
    # partition — must be absent
    assert not re.search(
        r"windowspecdefinition\(_shard#\d+L? ASC[^)]*doc_id#\d+L? ASC", plan
    )
    # ...and the shard base offsets come back via a broadcast equi-join,
    # never a shuffle of the corpus on a single key
    assert "BroadcastHashJoin" in plan


def test_pack_quoting_hostile_token_column(spark):
    # tok_col names must never be spliced into SQL text
    d = spark.createDataFrame([(0, 4), (1, 25)], "doc_id long, `token-count` long")
    out = packing.pack_sequences(d, "token-count", capacity=10, shards=1)
    assert _rows(out, "doc_id", "end_window") == [(0, 0), (1, 2)]


def test_pack_validates_params(spark):
    d = spark.range(1).select(F.col("id").alias("doc_id"), F.lit(1).alias("n_tok"))
    with pytest.raises(ValueError):
        packing.pack_sequences(d, "n_tok", capacity=0)
    with pytest.raises(ValueError):
        packing.pack_sequences(d, "n_tok", capacity=8, shards=0)


def test_bins_nosplit_known_layout(spark):
    # shards=1, capacity 10, next-fit in doc_id order:
    # doc 0 (4) → bin 0 (fill 4); doc 1 (0) → bin 0 (fill 4);
    # doc 2 (6) → bin 0 (fill 10, exact fit); doc 3 (25, OVERSIZE) →
    # bin 1 alone; doc 4 (1) → bin 2 (25+1 > 10 forces a new bin);
    # doc 5 (9) → bin 2 (fill 10)
    d = spark.createDataFrame(
        [(0, 4), (1, 0), (2, 6), (3, 25), (4, 1), (5, 9)],
        "doc_id long, n_tok long",
    )
    out = packing.pack_bins_nosplit(d, "n_tok", capacity=10, shards=1)
    got = _rows(out, "doc_id", "bin_id", "oversize")
    assert got == [
        (0, 0, False),
        (1, 0, False),
        (2, 0, False),
        (3, 1, True),
        (4, 2, False),
        (5, 2, False),
    ]


def test_bins_nosplit_respects_capacity_and_shards(spark):
    d = spark.range(0, 400).select(
        F.col("id").alias("doc_id"),
        (F.pmod(F.col("id") * 29 + 7, F.lit(120)) + 1).alias("n_tok"),
    )
    out = packing.pack_bins_nosplit(d, "n_tok", capacity=256, shards=8).cache()
    try:
        # no row lost or duplicated
        assert out.count() == 400
        assert out.select("doc_id").distinct().count() == 400
        # every non-oversize bin's fill is within capacity
        over = (
            out.filter(~F.col("oversize"))
            .groupBy("bin_id")
            .agg(F.sum("n_tok").alias("fill"))
            .filter(F.col("fill") > 256)
            .count()
        )
        assert over == 0
        # bin ids never collide across shards (stride isolation)
        shards = out.select(
            (F.col("bin_id") / (1 << 40)).cast("long").alias("s")
        ).distinct()
        assert shards.count() == 8
        # deterministic on rerun
        again = packing.pack_bins_nosplit(d, "n_tok", capacity=256, shards=8)
        assert _rows(out, "doc_id", "bin_id") == _rows(again, "doc_id", "bin_id")
    finally:
        out.unpersist()


def _mix_frame(spark):
    rows = []
    for i in range(300):
        rows.append((i, "big", 10))
    for i in range(300, 320):
        rows.append((i, "tiny", 10))
    for i in range(320, 340):
        rows.append((i, "unlisted", 10))
    rows.append((None, "big", 10))
    return spark.createDataFrame(rows, "doc_id long, lang string, n_tok long")


def test_mix_branches(spark):
    d = _mix_frame(spark)
    kept = packing.mix_token_budget(
        d, "lang", "n_tok", "doc_id", budget=1000, weights={"big": 1.0, "tiny": 1.0}
    ).cache()
    try:
        by_lang = {r["lang"]: r["n"] for r in kept.groupBy("lang").agg(F.count(F.lit(1)).alias("n")).collect()}
        # tiny total (200) <= its budget (1000) → kept whole
        assert by_lang.get("tiny") == 20
        # unlisted has no weight → dropped entirely
        assert "unlisted" not in by_lang
        # big total (3010) > budget (1000) → a strict, non-empty sample
        assert 0 < by_lang["big"] < 301
        # deterministic: identical keep set on a rerun
        again = packing.mix_token_budget(
            d, "lang", "n_tok", "doc_id", budget=1000, weights={"big": 1.0, "tiny": 1.0}
        )
        assert _rows(kept, "doc_id", "lang") == _rows(again, "doc_id", "lang")
    finally:
        kept.unpersist()


def test_bins_nosplit_null_semantics(spark):
    # NULL token count packs as width 0 (n_tok reported NULL); NULL ids
    # land together in the sentinel shard one past the real ones
    d = spark.createDataFrame(
        [(0, 4), (1, None), (2, 6), (None, 3)], "doc_id long, n_tok long"
    )
    out = packing.pack_bins_nosplit(d, "n_tok", capacity=10, shards=2)
    rows = {r["doc_id"]: r for r in out.collect()}
    assert rows[1]["n_tok"] is None and not rows[1]["oversize"]
    # doc 0 (shard 0, 4 tok) and doc 2 (shard 0, 6 tok) fill bin 0 of
    # shard 0; NULL-width doc 1 (shard 1) opens shard 1's bin 0
    assert rows[0]["bin_id"] == rows[2]["bin_id"] == 0
    assert rows[1]["bin_id"] == 1 * (1 << 40)
    # NULL id → sentinel shard index == shards
    assert rows[None]["bin_id"] == 2 * (1 << 40)


def test_mix_boundary_rate_maximal_without_carry(spark):
    # The tightest sub-1.0 rate doubles allow: tot = 2^53, bud = 2^53-1
    # → rate = 1 - 2^-53, product = 2^32 - 2^-21 (exactly representable,
    # so floor = 0xffffffff — an 8-digit threshold, no 9-digit carry;
    # see the operand-order analysis in mix_token_budget). Every md5
    # prefix of ids 0..3 sorts below 'ffffffff', so all rows are kept;
    # a truncated-threshold regression ('10000000') would drop them.
    tot = 1 << 53
    budget = (1 << 54) - 2  # bud = 0.5 * budget = 2^53 - 1 < tot
    d = spark.createDataFrame(
        [(i, "x", tot // 4) for i in range(4)], "doc_id long, lang string, n_tok long"
    )
    kept = packing.mix_token_budget(
        d, "lang", "n_tok", "doc_id", budget=budget, weights={"x": 0.5}
    )
    assert kept.count() == 4


def test_mix_null_key_rides_sentinel(spark):
    d = _mix_frame(spark).filter(F.col("lang") == "big")
    # keep-all branch: the NULL-keyed row must survive (md5 of the
    # sentinel, not a NULL comparison that silently drops it)
    kept = packing.mix_token_budget(
        d, "lang", "n_tok", "doc_id", budget=10**9, weights={"big": 1.0}
    )
    assert kept.filter(F.col("doc_id").isNull()).count() == 1


def test_mix_validates_budget(spark):
    d = _mix_frame(spark)
    with pytest.raises(ValueError):
        packing.mix_token_budget(d, "lang", "n_tok", "doc_id", budget=0, weights={})
