"""Vectorized UDF surface (the ONLY Python that runs per-batch).

SURVEY.md §2.9: the engine's whole Python-side hot path is two Arrow
pandas UDFs — ``extract_text_udf`` (binary html → text) and the syslog
header parser in :mod:`beholder_spark.operators.parse`. Everything else
is JVM-side ``pyspark.sql.functions`` so Catalyst/codegen own it.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import functions as F
from pyspark.sql import types as T

from beholder_spark.functions.textextract import extract_text


@F.pandas_udf(T.StringType())
def extract_text_udf(html: pd.Series) -> pd.Series:
    """Arrow-vectorized wrapper of the extraction SPEC.

    Input is a pandas Series of ``bytes | None`` (Spark BinaryType via
    Arrow). The per-element work is regex over str — cheap, GIL-bound but
    parallel across executor cores because each Arrow batch is processed
    in its own Python worker.
    """
    return html.map(extract_text, na_action="ignore")


__all__ = ["extract_text", "extract_text_udf"]
