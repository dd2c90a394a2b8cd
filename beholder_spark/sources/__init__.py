"""Sources (SURVEY.md §2.1 S1-S6).

Beholder's ``from udp/tcp/timer/internal-log`` listeners map to *scans* in
batch Spark: every source yields a DataFrame tagged with a ``source``
column (Beholder's ``$from``). Framing (newline / syslog-frame) is a
file-format concern; union-of-sources is ``unionByName``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def from_parquet(spark: SparkSession, path: str, source_tag: str | None = None) -> DataFrame:
    """S1/S2 batch analogue: scan a parquet/Iceberg table of messages.

    ``source_tag`` becomes the ``source`` column (Beholder ``$from``,
    e.g. ``udp://0.0.0.0:5140``). A literal column costs nothing and
    keeps routing predicates on real columns for pushdown.
    """
    df = spark.read.parquet(path)
    if source_tag is not None:
        df = df.withColumn("source", F.lit(source_tag))
    return df


def from_text_lines(spark: SparkSession, path: str, source_tag: str | None = None) -> DataFrame:
    """S2 ``from tcp ... as newline-terminated``: newline-framed text.

    Each line → one message with ``payload`` (Beholder ``$payload``).
    """
    df = spark.read.text(path).withColumnRenamed("value", "payload")
    if source_tag is not None:
        df = df.withColumn("source", F.lit(source_tag))
    return df


def from_timer(spark: SparkSession, n: int, source_tag: str = "timer") -> DataFrame:
    """S3 ``from timer``: n synthetic messages (batch fixture generator).

    ``spark.range`` is parallel and shuffle-free; in streaming mode the
    equivalent is the ``rate`` source.
    """
    return spark.range(n).select(
        F.col("id").alias("tick"),
        F.lit("beholder timer").alias("payload"),
        F.lit(source_tag).alias("source"),
    )


def from_infinity(spark: SparkSession, n: int) -> DataFrame:
    """S5 ``from infinity``: max-rate benchmark generator (bounded at n)."""
    return spark.range(n).select(
        F.col("id").alias("tick"),
        F.concat(F.lit("message-"), F.col("id")).alias("payload"),
        F.lit("infinity").alias("source"),
    )


def from_socket_stream(
    spark: SparkSession, host: str, port: int, source_tag: str | None = None
) -> DataFrame:
    """S2 ``from tcp ... as newline-terminated`` as a LIVE listener:
    Structured Streaming ``socket`` source — one newline-framed line per
    row, exposed as ``payload`` exactly like the batch text scan, so the
    same stage compiler runs unchanged on the stream (daemon parity:
    Beholder listens on a TCP port; this connects to one). Production
    swaps ``format("kafka")`` for durable ingest — the socket source has
    no replay, which is why it is the parity demo, not the prod path.
    """
    df = (
        spark.readStream.format("socket")
        .option("host", host)
        .option("port", port)
        .load()
        .withColumnRenamed("value", "payload")
    )
    if source_tag is not None:
        df = df.withColumn("source", F.lit(source_tag))
    return df


def from_rate_stream(
    spark: SparkSession,
    rows_per_batch: int,
    source_tag: str = "timer",
    advance_ms_per_batch: int = 1000,
) -> DataFrame:
    """S3/S5 ``from timer`` / ``from infinity`` as a LIVE stream:
    ``rate-micro-batch`` emits ``rows_per_batch`` rows per trigger with
    DETERMINISTIC timestamps (start epoch 0 + advance_ms per batch) and a
    monotone ``value`` — unlike plain ``rate``, reruns produce identical
    data, which keeps streaming tests oracle-comparable. Columns match
    :func:`from_timer`: (tick, payload, source).
    """
    df = (
        spark.readStream.format("rate-micro-batch")
        .option("rowsPerBatch", rows_per_batch)
        .option("startTimestamp", 0)
        .option("advanceMillisPerBatch", advance_ms_per_batch)
        .load()
    )
    return df.select(
        F.col("value").alias("tick"),
        F.concat(F.lit("message-"), F.col("value")).alias("payload"),
        F.lit(source_tag).alias("source"),
        F.col("timestamp").alias("event_ts"),
    )


def union_sources(*dfs: DataFrame) -> DataFrame:
    """S6 / C3: multiple ``from`` (or ``join {}``) = stream union.

    ``unionByName(allowMissingColumns=True)`` — missing fields hold NULL,
    matching Beholder's dynamic-field model (SURVEY.md §1.2). Narrow op,
    no shuffle.
    """
    out = dfs[0]
    for df in dfs[1:]:
        out = out.unionByName(df, allowMissingColumns=True)
    return out
