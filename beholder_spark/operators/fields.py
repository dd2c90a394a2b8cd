"""Field rewriting — the ``set`` / ``keep`` / ``drop`` family
(SURVEY.md §2.3 F1-F12).

Every operator here is a pure column expression: Catalyst folds constants,
prunes unused fields, and fuses the whole stage into one codegen'd
projection. Beholder interprets these per message on one thread; we get
them for free inside whole-stage codegen.
"""

from __future__ import annotations

import os

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# F7: syslog severity number → name (RFC5424 keywords)
SEVERITY_NAMES = ["emerg", "alert", "crit", "error", "warning", "notice", "info", "debug"]


def set_template(df: DataFrame, field: str, fmt: str, *cols: str) -> DataFrame:
    """F1 ``set $f 'template {$a} {$b}'``: printf-style interpolation.

    ``fmt`` uses ``%s`` placeholders filled by ``cols`` in order —
    ``format_string`` is JVM-side and codegen'd.
    """
    return df.withColumn(field, F.format_string(fmt, *[F.col(c) for c in cols]))


def set_replace(df: DataFrame, field: str, pattern: str, replacement: str, src: str | None = None) -> DataFrame:
    """F2 ``set $f replace ~re~ 'tpl' [in $src]``: regex substitution."""
    return df.withColumn(field, F.regexp_replace(F.col(src or field), pattern, replacement))


def set_date(df: DataFrame, field: str, ts_col: str, fmt: str = "yyyy-MM-dd'T'HH:mm:ssXXX") -> DataFrame:
    """F3 ``set $f date``: format a timestamp column.

    SPEC: always column-derived time (never ``current_timestamp``) so
    tested paths stay deterministic (SURVEY.md §5.2).
    """
    return df.withColumn(field, F.date_format(F.col(ts_col), fmt))


def set_host_from_url(df: DataFrame, field: str = "host", url_col: str = "url") -> DataFrame:
    """F4 ``set $f host`` re-targeted: the per-row host the pipeline needs
    is the url's host (BASELINE.json:6 host→geo enrichment key)."""
    return df.withColumn(field, F.parse_url(F.col(url_col), F.lit("HOST")))


def set_env(df: DataFrame, field: str, var: str, default: str = "") -> DataFrame:
    """F5 ``set $f env NAME``: resolved driver-side at plan time → literal."""
    return df.withColumn(field, F.lit(os.environ.get(var, default)))


def set_basename(df: DataFrame, field: str, path_col: str) -> DataFrame:
    """F6 ``set $f basename``: last path segment, sanitized to a safe
    filename (non [A-Za-z0-9._-] → '_')."""
    base = F.element_at(F.split(F.col(path_col), "/"), -1)
    return df.withColumn(field, F.regexp_replace(base, r"[^A-Za-z0-9._-]", "_"))


def severity_name_expr(sev_col: str) -> Column:
    """F7: numeric syslog severity → keyword, as a foldable CASE chain."""
    expr = F.lit(None).cast("string")
    c = F.col(sev_col).cast("int")
    for i, name in reversed(list(enumerate(SEVERITY_NAMES))):
        expr = F.when(c == i, F.lit(name)).otherwise(expr)
    return expr


def set_severity_name(df: DataFrame, field: str, sev_col: str) -> DataFrame:
    return df.withColumn(field, severity_name_expr(sev_col))


def set_json(df: DataFrame, field: str, *cols: str) -> DataFrame:
    """F8 ``set $f json [$a $b ...]``: serialize fields to a JSON string."""
    return df.withColumn(field, F.to_json(F.struct(*[F.col(c) for c in cols])))


def set_syslog(df: DataFrame, field: str, facility: str, severity: str, ts: str, host: str, program: str, pid: str, payload: str) -> DataFrame:
    """F9 ``set $f syslog``: serialize to an RFC3164 wire line."""
    pri = (F.col(facility).cast("int") * 8 + F.col(severity).cast("int")).cast("string")
    line = F.concat(
        F.lit("<"), pri, F.lit(">"),
        F.date_format(F.col(ts), "MMM"), F.lit(" "),
        F.lpad(F.date_format(F.col(ts), "d"), 2, " "), F.lit(" "),
        F.date_format(F.col(ts), "HH:mm:ss"), F.lit(" "),
        F.col(host), F.lit(" "), F.col(program),
        F.lit("["), F.col(pid).cast("string"), F.lit("]: "),
        F.col(payload),
    )
    return df.withColumn(field, line)


def unset(df: DataFrame, *fields: str) -> DataFrame:
    """F10 ``set $f ''`` / field removal: per-stage schema change."""
    return df.drop(*fields)


def keep(df: DataFrame, *fields: str) -> DataFrame:
    """F11 ``keep $a $b ...``: projection; Catalyst prunes the scan to
    exactly these columns (check ReadSchema in .explain)."""
    return df.select(*fields)


def drop_when(df: DataFrame, cond: Column) -> DataFrame:
    """F12 ``drop`` under a condition: filter out matching messages."""
    return df.filter(~cond)
