"""Per-stage checkpoint + lineage + resume (SURVEY.md §4.3; BASELINE.json:6
"resumable without recomputation ... per-partition lineage and metrics").

Design: each pipeline stage may be *checkpointed* to a stage table keyed
by a partition column (e.g. ``day`` from warc_ts). Two bookkeeping tables
live under the pipeline root:

- ``_manifest``  — (stage, partition, status) rows; a partition appears
  once its stage output is durably written. Resume = anti-join pending
  partitions against this.
- ``_lineage``   — (stage, rows_in, rows_out, parse_failures, dropped,
  wall_ms, run_id) per stage run; row counts come from ``df.observe``
  (computed during the write action itself — no extra pass).

Sandbox format is parquet (append); production swaps to Iceberg via
:data:`beholder_spark.sinks.SINK_FORMAT` — snapshot isolation makes the
manifest write atomic there.
"""

from __future__ import annotations

import os
import time
import uuid

from pyspark.sql import DataFrame, Observation, SparkSession
from pyspark.sql import functions as F

MANIFEST = "_manifest"
LINEAGE = "_lineage"
# manifest key for rows whose partition column is NULL (they land in the
# writer's default partition); without this, collect_set drops NULLs and
# NULL-partition rows would be re-appended on EVERY resume
NULL_PARTITION = "__NULL__"


def _partition_key(partition_col: str) -> F.Column:
    return F.coalesce(F.col(partition_col).cast("string"), F.lit(NULL_PARTITION))


def _append(spark: SparkSession, root: str, table: str, rows: list[dict]) -> None:
    df = spark.createDataFrame(rows)
    df.coalesce(1).write.mode("append").parquet(os.path.join(root, table))


def read_manifest(spark: SparkSession, root: str) -> DataFrame | None:
    path = os.path.join(root, MANIFEST)
    try:
        return spark.read.parquet(path)
    except Exception:  # AnalysisException: path does not exist (fresh run)
        return None


def read_lineage(spark: SparkSession, root: str) -> DataFrame | None:
    path = os.path.join(root, LINEAGE)
    try:
        return spark.read.parquet(path)
    except Exception:
        return None


def done_partitions(spark: SparkSession, root: str, stage: str) -> set[str] | None:
    """Partition values already durably written for `stage`, as strings —
    None on a fresh run. Driver-side and tiny (the manifest is rows of
    (stage, partition), not data)."""
    manifest = read_manifest(spark, root)
    if manifest is None:
        return None
    rows = manifest.filter(F.col("stage") == stage).select("partition").distinct().collect()
    return {r.partition for r in rows}


def pending_partitions(spark: SparkSession, root: str, stage: str, df: DataFrame, partition_col: str) -> DataFrame:
    """Resume filter: drop rows whose (stage, partition) is already in the
    manifest. Broadcast anti-join — the manifest is tiny by construction.
    """
    manifest = read_manifest(spark, root)
    if manifest is None:
        return df
    done = manifest.filter(F.col("stage") == stage).select(
        F.col("partition").alias("_done_part")
    ).distinct()
    out = df.withColumn("_part_key", _partition_key(partition_col))
    out = out.join(
        F.broadcast(done),
        on=out["_part_key"] == done["_done_part"],
        how="left_anti",
    )
    return out.drop("_part_key")


def run_stage(
    spark: SparkSession,
    root: str,
    stage: str,
    df: DataFrame,
    partition_col: str,
    extra_metrics: dict[str, F.Column] | None = None,
    partition_by: list[str] | None = None,
) -> DataFrame:
    """Execute one checkpointed stage: write pending partitions, record
    manifest + lineage, return the stage table (for the next stage).

    ``df.observe`` attaches counters to the write action itself — metrics
    cost zero extra passes over the data. ``extra_metrics`` adds stage-
    specific aggregates (e.g. parse_failures = count_if(NOT parse_ok)).
    """
    run_id = uuid.uuid4().hex[:12]
    out_path = os.path.join(root, stage)
    pending = pending_partitions(spark, root, stage, df, partition_col)

    metrics: dict[str, F.Column] = {"rows_out": F.count(F.lit(1))}
    metrics.update(extra_metrics or {})
    obs = Observation(f"lineage_{stage}_{run_id}")
    observed = pending.observe(
        obs,
        *[c.alias(k) for k, c in metrics.items()],
        # partition values captured during the SAME action — no extra pass;
        # NULL partitions tracked under the sentinel key
        F.collect_set(_partition_key(partition_col)).alias("_parts"),
    )

    t0 = time.monotonic()
    w = observed.write.mode("append").partitionBy(partition_col, *(partition_by or []))
    w.parquet(out_path)
    wall_ms = int((time.monotonic() - t0) * 1000)

    got = obs.get
    parts = list(got.get("_parts") or [])
    if parts:
        _append(
            spark, root, MANIFEST,
            [{"stage": stage, "partition": str(p), "run_id": run_id} for p in parts],
        )
    _append(
        spark, root, LINEAGE,
        [{
            "stage": stage,
            "run_id": run_id,
            "rows_out": int(got.get("rows_out", 0) or 0),
            "parse_failures": int(got.get("parse_failures", 0) or 0),
            "dropped": int(got.get("dropped", 0) or 0),
            "wall_ms": wall_ms,
            "n_partitions": len(parts),
        }],
    )
    try:
        return spark.read.parquet(out_path)
    except Exception:  # nothing ever written (empty input) — pass through
        return pending
