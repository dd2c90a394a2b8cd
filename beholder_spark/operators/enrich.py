"""Enrichment — broadcast lookup joins (SURVEY.md §2.7 A1, A8).

Beholder's set-from-field semantics (derive fields from a lookup) become a
broadcast hash-join: the dimension ships to every executor once, the fact
stream never shuffles. At 100 TB fact / MB-scale dims this is the only
sane plan — we force the ``broadcast()`` hint rather than trusting the
size estimator.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def enrich_lookup(df: DataFrame, lookup: DataFrame, on: str | list[str], how: str = "left") -> DataFrame:
    """A1: left broadcast join against a small dimension.

    Left join (not inner): a missing lookup row must not drop the message
    — unmatched fields are NULL, mirroring Beholder's dynamic-field model.
    """
    return df.join(F.broadcast(lookup), on=on, how=how)


def filter_processed(df: DataFrame, manifest: DataFrame, on: str | list[str]) -> DataFrame:
    """A8 resume filter: anti-join completed keys from the checkpoint
    manifest; broadcast when the manifest is small (normal case)."""
    return df.join(F.broadcast(manifest), on=on, how="left_anti")


def filter_known(df: DataFrame, allowed: DataFrame, on: str | list[str]) -> DataFrame:
    """A8 semi variant: keep only rows whose key exists in ``allowed``."""
    return df.join(F.broadcast(allowed), on=on, how="left_semi")
