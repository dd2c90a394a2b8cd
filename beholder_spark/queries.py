"""Registered operator queries + DuckDB oracle twins (driver contract).

Each entry exercises one SURVEY.md §2 operator mapping over the driver's
testdata tables and has an ANSI-SQL twin the driver runs through DuckDB at
sf0.01 (row-count + schema + order-insensitive value hash). Column names
are aliased identically on both sides; doubles are rounded at the edge to
keep the value hash stable across engines.

Structure: ``QUERIES[name] = (spark_fn, oracle_sql_or_None)``.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from beholder_spark.operators import aggregate as agg
from beholder_spark.operators import enrich, fields, parse, route, skew
from beholder_spark.sources import union_sources

Entry = tuple[Callable[[SparkSession, str], DataFrame], str | None]
QUERIES: dict[str, Entry] = {}


def _register(name: str, oracle: str | None):
    def deco(fn):
        QUERIES[name] = (fn, oracle)
        return fn

    return deco


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


# ---------------------------------------------------------------------------
# Flagship: scan → project → time-bucket → hash agg (A2/A3)
# ---------------------------------------------------------------------------


@_register(
    "flagship_stats_by_type_hour",
    """
    SELECT event_type,
           date_trunc('hour', ts) AS bucket,
           count(*) AS n
    FROM events
    GROUP BY event_type, date_trunc('hour', ts)
    """,
)
def flagship_stats_by_type_hour(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Beholder-stats analogue: messages per type per hour (SURVEY §2.7 A2+A3)."""
    return agg.stats_counts(_t(spark, sf_dir, "events"), ["event_type"], ts_col="ts")
