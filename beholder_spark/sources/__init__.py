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
