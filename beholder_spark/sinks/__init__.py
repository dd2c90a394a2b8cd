"""Sinks (SURVEY.md §2.6 K1-K5).

Beholder's field-templated ``to file`` paths ARE dynamic partitioning:
``to file /logs/{$route}/{$lang}.log`` ≡ ``partitionBy('route','lang')``.
The sink format is abstracted behind one writer so the sandbox writes
parquet while production writes Iceberg (SURVEY.md §7 hard-part 5) —
the call sites never change.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

SINK_FORMAT = "parquet"  # "iceberg" in production; single switch point


def write_table(df: DataFrame, path: str, partition_by: list[str] | None = None, mode: str = "overwrite") -> None:
    """K2 ``to file <tpl>``: field-templated path ≡ partition columns.

    One pass over the data produces every per-sink directory — this is the
    single-pass multi-sink fan-out strategy (SURVEY.md §4.2): at 100 TB,
    re-scanning the parent once per sink is the difference between 1× and
    K× input IO.
    """
    w = df.write.mode(mode).format(SINK_FORMAT)
    if partition_by:
        w = w.partitionBy(*partition_by)
    w.save(path)


def write_fanout_single_pass(df: DataFrame, base_path: str, route_col: str = "route") -> None:
    """R1 strategy (i): one ``partitionBy(route)`` write = one scan, one
    job, N sink directories ``{base_path}/{route_col}={value}/``.

    Preferred over per-sink filtered writes when sinks share a schema;
    use :func:`write_fanout_branches` when per-sink schemas diverge.
    """
    write_table(df, base_path, partition_by=[route_col])


def write_fanout_branches(df: DataFrame, sinks: dict[str, str], route_col: str = "route") -> None:
    """R1 strategy (ii): per-sink filtered branches off ONE materialized
    parent. ``persist()`` bounds the cost to one upstream computation +
    K cheap filtered scans of the cached routed rows; without it Spark
    would recompute the whole parse→enrich chain per sink.
    """
    df = df.persist()
    try:
        df.count()  # materialize once
        for route_value, path in sinks.items():
            write_table(df.filter(df[route_col] == route_value).drop(route_col), path)
    finally:
        df.unpersist()
