"""Parsers — field extraction (SURVEY.md §2.2 P1-P7).

Beholder's ``parse syslog | regexp | json`` commands re-expressed as
columnar stages. The syslog header parse is the one genuinely
Python-shaped operator (two RFC grammars + fallbacks), so it runs as an
Arrow-vectorized pandas UDF returning a struct column; regexp and JSON
parse stay fully JVM-side (``regexp_extract`` / ``from_json`` — codegen'd,
pushdown-friendly).

SPEC parse_ok / keep-unparsed (P7 — reference default unverifiable,
SURVEY.md §2.2): every parse stage emits ``parse_ok: boolean``. Default
routing sends ``NOT parse_ok`` rows to a ``_unparsed`` quarantine route —
never silent loss; ``keep_unparsed=True`` keeps them in-stream with NULL
extracted fields EXCEPT ``payload``, which carries the original raw line
on parse failure ("unparseable messages pass through unchanged"): since
parsed fields overwrite same-named message fields, a NULL payload would
make the raw line unrecoverable when the source column IS ``payload``
(the config front end's default) — that would be silent loss.
"""

from __future__ import annotations

import re

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

# ---------------------------------------------------------------------------
# P1: parse syslog (RFC3164 + RFC5424) — vectorized pandas UDF
# ---------------------------------------------------------------------------

SYSLOG_FIELDS = ["facility", "severity", "host", "program", "pid", "message_id", "payload"]

_SYSLOG_SCHEMA = T.StructType(
    [T.StructField(f, T.StringType(), True) for f in SYSLOG_FIELDS]
    + [T.StructField("parse_ok", T.BooleanType(), False)]
)

_RFC3164 = re.compile(
    r"^<(?P<pri>\d{1,3})>"
    r"(?P<ts>[A-Z][a-z]{2} [ \d]\d \d{2}:\d{2}:\d{2}) "
    r"(?P<host>\S+) "
    r"(?P<program>[^\s:\[]+)(?:\[(?P<pid>\d+)\])?: "
    r"(?P<msg>.*)$"
)
_RFC5424 = re.compile(
    r"^<(?P<pri>\d{1,3})>1 "
    r"(?P<ts>\S+) (?P<host>\S+) (?P<program>\S+) (?P<pid>\S+) (?P<msgid>\S+) "
    r"(?:\[.*?\]|-) ?"
    r"(?P<msg>.*)$"
)


def _decode_series(raw: pd.Series) -> pd.Series:
    """bytes → str (utf-8, replace); string input passes through."""
    if raw.map(lambda v: isinstance(v, (bytes, bytearray))).any():
        return raw.map(
            lambda v: v.decode("utf-8", errors="replace")
            if isinstance(v, (bytes, bytearray))
            else v
        )
    return raw


@F.pandas_udf(_SYSLOG_SCHEMA)
def _syslog_udf(raw: pd.Series) -> pd.DataFrame:
    """Vectorized syslog header parse: both RFC grammars run as
    ``Series.str.extract`` (the regex loop executes in C over the whole
    Arrow batch — no per-row Python), RFC5424 winning where both match,
    exactly the old per-row ``_RFC5424.match(s) or _RFC3164.match(s)``
    precedence. The anchored patterns make extract ≡ match."""
    s = _decode_series(raw)
    m5 = s.str.extract(_RFC5424)
    m3 = s.str.extract(_RFC3164).reindex(columns=m5.columns)  # msgid ← NaN
    use5 = m5["pri"].notna().to_numpy()
    g = pd.DataFrame(
        np.where(use5[:, None], m5.to_numpy(), m3.to_numpy()),
        columns=m5.columns,
        index=s.index,
    )
    pri = pd.to_numeric(g["pri"], errors="coerce")
    ok = (pri.notna() & (pri <= 191)).rename(None)  # PRI > 191 → unparseable
    pri_i = pri.fillna(0).astype("int64")
    return pd.DataFrame(
        {
            "facility": (pri_i // 8).astype(str).where(ok),
            "severity": (pri_i % 8).astype(str).where(ok),
            "host": g["host"].where(ok),
            "program": g["program"].where(ok),
            "pid": g["pid"].where(ok & (g["pid"] != "-")),
            "message_id": g["msgid"].where(ok & (g["msgid"] != "-")),
            # SPEC P7: failed rows carry the ORIGINAL line in payload —
            # never-silent-loss even when the source column is payload
            "payload": g["msg"].where(ok, s),
            "parse_ok": ok,
        }
    )


def parse_syslog(df: DataFrame, col: str = "raw", keep_unparsed: bool = False) -> DataFrame:
    """P1 ``parse syslog``: header fields from RFC3164/RFC5424 lines.

    One pandas-UDF stage → one struct column → ``select(struct.*)``; Arrow
    moves the bytes in columnar batches, regexes are compiled once per
    Python worker (module import), never per row.

    SPEC (Beholder field semantics): parsed fields OVERWRITE same-named
    existing message fields — ``parse syslog`` replaces ``$payload`` with
    the message body, ``$host`` with the header host, etc. On parse
    failure ``payload`` holds the original raw line (decoded), so
    ``keep_unparsed=True`` never loses the message even when ``col`` is
    itself ``payload`` (P7: pass through unchanged).
    """
    keep_cols = [c for c in df.columns if c not in {*SYSLOG_FIELDS, "parse_ok"}]
    out = df.withColumn("_sys", _syslog_udf(F.col(col))).select(*keep_cols, "_sys.*")
    if not keep_unparsed:
        out = out.filter(F.col("parse_ok"))
    return out


# ---------------------------------------------------------------------------
# P2: parse regexp — native regexp_extract (JVM, codegen)
# ---------------------------------------------------------------------------


def parse_regexp(df: DataFrame, col: str, pattern: str, groups: dict[str, int], keep_unparsed: bool = True) -> DataFrame:
    """P2 ``parse regexp ~(?<name>...)~``: named groups become fields.

    Java-regex-compatible patterns run entirely JVM-side: one
    ``rlike`` predicate for ``parse_ok`` plus one ``regexp_extract`` per
    group — all codegen'd in a single projection, zero Python.
    ``groups`` maps field name → capture-group index.
    """
    out = df.withColumn("parse_ok", F.col(col).rlike(pattern))
    for name, idx in groups.items():
        out = out.withColumn(
            name,
            F.when(F.col("parse_ok"), F.regexp_extract(F.col(col), pattern, idx)).otherwise(F.lit(None)),
        )
    if not keep_unparsed:
        out = out.filter(F.col("parse_ok"))
    return out


# ---------------------------------------------------------------------------
# P3: parse json — from_json with declared schema
# ---------------------------------------------------------------------------


def parse_json(df: DataFrame, col: str, schema: T.StructType, keep_unparsed: bool = True) -> DataFrame:
    """P3 ``parse json``: one field per JSON key.

    Declared schema → vectorized Jackson parse JVM-side. Malformed input
    in PERMISSIVE mode yields a struct of NULL fields (not a NULL struct),
    so ``parse_ok`` detection uses a corrupt-record column: NULL corrupt
    record + NULL input both mean unparseable only when the input itself
    was non-NULL.
    """
    full = T.StructType(list(schema.fields) + [T.StructField("_corrupt_record", T.StringType(), True)])
    out = df.withColumn(
        "_j",
        F.from_json(F.col(col), full, {"columnNameOfCorruptRecord": "_corrupt_record"}),
    )
    out = out.withColumn(
        "parse_ok", F.col(col).isNotNull() & F.col("_j._corrupt_record").isNull()
    )
    out = out.select("*", *[f"_j.{f.name}" for f in schema.fields]).drop("_j")
    if not keep_unparsed:
        out = out.filter(F.col("parse_ok"))
    return out


# ---------------------------------------------------------------------------
# P5: parse each-field-as-message — row generator
# ---------------------------------------------------------------------------


def each_field_as_message(df: DataFrame, fields: list[str], id_cols: list[str]) -> DataFrame:
    """P5: explode one message into N (key, value) messages.

    ``stack``-shaped via explode over a map literal — a generator in the
    physical plan, no shuffle, no Python.
    """
    pairs: list[Column] = []
    for f in fields:
        pairs.append(F.lit(f))
        pairs.append(F.col(f).cast("string"))
    kv = F.explode(F.map_from_arrays(F.array(*pairs[::2]), F.array(*pairs[1::2])))
    return df.select(*id_cols, kv.alias("key", "value"))
