"""Driver contract for the spark-graft builder (PySpark target).

Thin adapter over :mod:`beholder_spark.queries` (the registered operator
queries + DuckDB oracle twins, SURVEY.md §2) — implementations live in
the package so tests, bench, and the driver share one registry.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from beholder_spark.queries import QUERIES  # noqa: E402


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    fn, _ = QUERIES["flagship_stats_by_type_hour"]
    return fn(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return {name: fn for name, (fn, _sql) in QUERIES.items()}


def oracle_sql() -> dict[str, str]:
    """DuckDB ANSI-SQL twin for each oracle-checkable query."""
    return {name: sql for name, (_fn, sql) in QUERIES.items() if sql is not None}
