"""Unit tests: as-of join, bounded interval join, connected components,
PII redaction (the round-2 time-join + clustering + scrub additions)."""

from __future__ import annotations

import datetime as dt

import pytest
from pyspark.sql import functions as F

from beholder_spark.operators import asof, dedup, webtext


def _ts(s: int) -> dt.datetime:
    return dt.datetime(2024, 1, 1) + dt.timedelta(seconds=s)


# ---------------------------------------------------------------- asof_join


def test_asof_join_semantics(spark):
    left = spark.createDataFrame(
        [(1, _ts(10), "p1"), (1, _ts(20), "p2"), (2, _ts(5), "p3"), (3, _ts(9), "p4")],
        "k int, ts timestamp, name string",
    )
    right = spark.createDataFrame(
        [(1, _ts(10), 100.0), (1, _ts(15), 150.0), (2, _ts(7), 70.0)],
        "k int, ts timestamp, v double",
    )
    out = asof.asof_join(left, right, ["k"], "ts", ["v"])
    got = {r["name"]: (r["asof_ts"], r["asof_v"]) for r in out.collect()}
    # equal timestamps match (inclusive)
    assert got["p1"] == (_ts(10), 100.0)
    # picks the LATEST at-or-before, not the first
    assert got["p2"] == (_ts(15), 150.0)
    # right row strictly after the left row does not match
    assert got["p3"] == (None, None)
    # key with no right rows survives with NULLs
    assert got["p4"] == (None, None)
    assert out.count() == 4


def test_asof_join_null_payload_stays_atomic(spark):
    """A NULL in the matched right row's payload must NOT fall back to an
    older right row's value — the matched row is carried as one struct."""
    left = spark.createDataFrame([(1, _ts(30), "p")], "k int, ts timestamp, name string")
    right = spark.createDataFrame(
        [(1, _ts(10), 5.0), (1, _ts(20), None)], "k int, ts timestamp, v double"
    )
    row = asof.asof_join(left, right, ["k"], "ts", ["v"]).collect()[0]
    assert row["asof_ts"] == _ts(20)
    assert row["asof_v"] is None


def test_asof_join_null_ts_and_key_never_match(spark):
    """SQL ASOF semantics: right rows with NULL ts/key can never match
    (NULLs sort first under asc — without the filter they'd be carried
    into every left row of the key), and NULL-key left rows get no match."""
    left = spark.createDataFrame(
        [(1, _ts(10), "p1"), (None, _ts(10), "p2")], "k int, ts timestamp, name string"
    )
    right = spark.createDataFrame(
        [(1, None, 5.0), (None, _ts(5), 7.0)], "k int, ts timestamp, v double"
    )
    got = {r["name"]: (r["asof_ts"], r["asof_v"]) for r in
           asof.asof_join(left, right, ["k"], "ts", ["v"]).collect()}
    assert got == {"p1": (None, None), "p2": (None, None)}


# ---------------------------------------------------- interval_join_count


def test_interval_join_matches_bruteforce(spark, sf_dir):
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    left = ev.filter(F.col("event_type") == "purchase").select("event_id", "user_id", "ts")
    right = ev.filter(F.col("event_type") == "click").select("user_id", "ts")
    out = asof.interval_join_count(left, right, ["user_id"], "ts", window_seconds=3600)
    # brute force via an inequality join (affordable at sf0.001)
    r2 = right.select("user_id", F.col("ts").alias("rts"))
    brute = (
        left.join(r2, "user_id", "left")
        .withColumn(
            "hit",
            F.when(
                F.col("rts").isNotNull()
                & (F.col("rts") <= F.col("ts"))
                & (F.col("rts") > F.col("ts") - F.expr("INTERVAL 3600 SECOND")),
                1,
            ).otherwise(0),
        )
        .groupBy("event_id")
        .agg(F.sum("hit").alias("n"))
    )
    diff = (
        out.select("event_id", "n_in_window")
        .join(brute, "event_id")
        .filter(F.col("n_in_window") != F.col("n"))
        .count()
    )
    assert diff == 0
    assert out.count() == left.count()
    # sub-bucket windows exercise the multi-bucket explode path
    out2 = asof.interval_join_count(
        left, right, ["user_id"], "ts", window_seconds=3600, bucket_seconds=600
    )
    assert (
        out2.withColumnRenamed("n_in_window", "n2")
        .join(out, "event_id")
        .filter(F.col("n2") != F.col("n_in_window"))
        .count()
        == 0
    )


def test_interval_join_keeps_duplicate_left_rows(spark):
    """Two IDENTICAL left rows must each produce an output row (per-row
    contract), not collapse into one with a doubled count."""
    left = spark.createDataFrame(
        [(1, _ts(100)), (1, _ts(100))], "k int, ts timestamp"
    )
    right = spark.createDataFrame([(1, _ts(50))], "k int, ts timestamp")
    out = asof.interval_join_count(left, right, ["k"], "ts", window_seconds=200).collect()
    assert len(out) == 2
    assert [r["n_in_window"] for r in out] == [1, 1]


# ------------------------------------------------------ connected components


def test_connected_components_basic(spark):
    # components: {1,2,3,4} (chain), {10,11}, and 20-20 self-pair noise
    pairs = spark.createDataFrame(
        [(2, 1), (2, 3), (3, 4), (10, 11)], "doc_a long, doc_b long"
    )
    got = {
        r["node"]: r["cluster_id"]
        for r in dedup.connected_components(pairs).collect()
    }
    assert got == {1: 1, 2: 1, 3: 1, 4: 1, 10: 10, 11: 10}


def test_connected_components_string_ids(spark):
    """Regression (ADVICE r2): convergence detection must be type-agnostic.
    The old sum(label) check was NULL for string ids and returned after ONE
    round — a diameter-2 chain exposes the partial clustering."""
    pairs = spark.createDataFrame(
        [("b", "a"), ("b", "c"), ("c", "d"), ("x", "y")],
        "doc_a string, doc_b string",
    )
    got = {
        r["node"]: r["cluster_id"]
        for r in dedup.connected_components(pairs).collect()
    }
    assert got == {"a": "a", "b": "a", "c": "a", "d": "a", "x": "x", "y": "x"}


def test_connected_components_diameter_error(spark):
    # an exhausted round budget must raise, never silently part-cluster
    chain = [(i, i + 1) for i in range(6)]
    pairs = spark.createDataFrame(chain, "doc_a long, doc_b long")
    with pytest.raises(RuntimeError, match="did not converge"):
        dedup.connected_components(pairs, max_iter=1)
    # generous budget converges fine
    got = dedup.connected_components(pairs, max_iter=10)
    assert got.filter(F.col("cluster_id") != 0).count() == 0


def test_connected_components_rounds_logarithmic(spark):
    """VERDICT r4 item 5: star contraction bounds rounds ~O(log n). A
    64-node path graph (diameter 63) needed 63 synchronous rounds under
    the old min-label propagation — more than the default max_iter=25,
    so it RAISED. It must now converge well inside 2·log2(n)+4 rounds."""
    import math

    n = 64
    pairs = spark.createDataFrame(
        [(i, i + 1) for i in range(n - 1)], "doc_a long, doc_b long"
    )
    stats: dict = {}
    got = dedup.connected_components(pairs, max_iter=25, stats=stats)
    assert stats["rounds"] <= 2 * math.log2(n) + 4, stats
    labels = {r["node"]: r["cluster_id"] for r in got.collect()}
    assert labels == {i: 0 for i in range(n)}


def test_connected_components_self_pairs_and_empty(spark):
    # self-pair-only nodes still appear, labeled themselves; empty input
    # yields an empty (node, cluster_id) frame
    pairs = spark.createDataFrame(
        [(7, 7), (1, 2)], "doc_a long, doc_b long"
    )
    got = {r["node"]: r["cluster_id"]
           for r in dedup.connected_components(pairs).collect()}
    assert got == {7: 7, 1: 1, 2: 1}
    empty = pairs.filter(F.lit(False))
    out = dedup.connected_components(empty)
    assert out.columns == ["node", "cluster_id"] and out.count() == 0


# ------------------------------------------------------------- PII redaction


def test_redact_pii(spark):
    df = spark.createDataFrame(
        [
            (1, "mail a.b-c_d%x@mail.example.co.uk or 10.0.0.1, card 1234 5678-9012 3456."),
            (2, "clean text 123.456 and 1.2.3 stay"),
            (3, "two e@x.io e2@y.org"),
        ],
        "id int, text string",
    )
    rows = {r["id"]: r for r in webtext.redact_pii(df, "text").collect()}
    assert rows[1]["text_redacted"] == "mail <EMAIL> or <IP>, card <CARD>."
    assert (rows[1]["n_emails"], rows[1]["n_ips"], rows[1]["n_cards"]) == (1, 1, 1)
    assert rows[2]["text_redacted"] == rows[2]["text"]
    assert rows[3]["n_emails"] == 2
    assert rows[3]["text_redacted"] == "two <EMAIL> <EMAIL>"
