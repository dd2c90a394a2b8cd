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

_REPO_ROOT = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, _REPO_ROOT)

from beholder_spark.queries import QUERIES  # noqa: E402


from beholder_spark.session import ship_package as _ensure_pkg  # noqa: E402


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    _ensure_pkg(spark)
    fn, _ = QUERIES["flagship_stats_by_type_hour"]
    return fn(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""

    def wrap(fn):
        def run(spark: SparkSession, sf_dir: str) -> DataFrame:
            _ensure_pkg(spark)
            return fn(spark, sf_dir)

        run.__name__ = fn.__name__
        run.__doc__ = fn.__doc__
        return run

    return {name: wrap(fn) for name, (fn, _sql) in QUERIES.items()}


def oracle_sql() -> dict[str, str]:
    """DuckDB ANSI-SQL twin for each oracle-checkable query."""
    return {name: sql for name, (_fn, sql) in QUERIES.items() if sql is not None}
