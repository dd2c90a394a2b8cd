"""beholder_spark — a PySpark-native log/telemetry parse → enrich → route →
aggregate engine with the query capabilities of johnnywoo/beholder.

Brand-new Spark-first design (NOT a port): Beholder's config-driven
message pipeline (parse / set / keep / switch / to) is re-expressed as a
DAG of DataFrame stages compiled by :mod:`beholder_spark.pipeline`, with
vectorized Arrow/pandas UDFs for byte-level parsing, broadcast-join
enrichment, predicate-partitioned fan-out sinks, salted aggregation for
skew, and per-stage checkpoint/lineage for resume.

Reference parity map: SURVEY.md §2 (operator inventory). The reference
checkout was empty this session (SURVEY.md §0), so the normative contract
is BASELINE.json — every ambiguous semantic is pinned in our own
docstrings, marked ``SPEC:``.
"""

from beholder_spark.session import get_spark

__version__ = "0.1.0"

__all__ = ["get_spark", "__version__"]
