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

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

# ---------------------------------------------------------------------------
# P1: parse syslog (RFC3164 + RFC5424) — Arrow-batched pandas UDF
# ---------------------------------------------------------------------------

SYSLOG_FIELDS = ["facility", "severity", "host", "program", "pid", "message_id", "payload"]

_SYSLOG_SCHEMA = T.StructType(
    [T.StructField(f, T.StringType(), True) for f in SYSLOG_FIELDS]
    + [T.StructField("parse_ok", T.BooleanType(), False)]
)

# The two grammars as ONE alternation, RFC5424 branch first (identical
# precedence to trying 5424 then 3164). One C-level match per line is the
# measured-fastest strategy on this corpus shape: 0.14 s/200k lines vs
# 0.23 s for two sequential matches and 0.61 s for pandas str.extract
# (pandas string-regex methods are an object loop internally AND run
# every pattern on every row — "vectorizing" through them is a loss).
_SYSLOG_RE = re.compile(
    r"^<(?P<pri>\d{1,3})>"
    r"(?:1 (?P<ts5>\S+) (?P<host5>\S+) (?P<prog5>\S+) (?P<pid5>\S+) (?P<msgid>\S+) "
    r"(?:\[.*?\]|-) ?(?P<msg5>.*)"
    r"|(?P<ts3>[A-Z][a-z]{2} [ \d]\d \d{2}:\d{2}:\d{2}) (?P<host3>\S+) "
    r"(?P<prog3>[^\s:\[]+)(?:\[(?P<pid3>\d+)\])?: (?P<msg3>.*))$"
)


def _parse_syslog_line(raw: bytes | str | None) -> tuple:
    if raw is None:
        return (None,) * 7 + (False,)
    s = raw.decode("utf-8", errors="replace") if isinstance(raw, (bytes, bytearray)) else raw
    m = _SYSLOG_RE.match(s)
    if m is None:
        # SPEC P7: failed rows carry the ORIGINAL line in payload —
        # never-silent-loss even when the source column is payload
        return (None,) * 6 + (s, False)
    pri = int(m.group("pri"))
    if pri > 191:  # PRI out of RFC range → unparseable
        return (None,) * 6 + (s, False)
    fac, sev = str(pri // 8), str(pri % 8)
    if m.group("host5") is not None:  # RFC5424 branch
        pid, msgid = m.group("pid5"), m.group("msgid")
        return (
            fac, sev, m.group("host5"), m.group("prog5"),
            None if pid == "-" else pid,
            None if msgid == "-" else msgid,
            m.group("msg5"), True,
        )
    return (fac, sev, m.group("host3"), m.group("prog3"), m.group("pid3"), None, m.group("msg3"), True)


@F.pandas_udf(_SYSLOG_SCHEMA)
def _syslog_udf(raw: pd.Series) -> pd.DataFrame:
    rows = [_parse_syslog_line(v) for v in raw]
    return pd.DataFrame(rows, columns=SYSLOG_FIELDS + ["parse_ok"])


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


# ---------------------------------------------------------------------------
# P6: parse beholder-stats — typed counters from the internal-log payload
# ---------------------------------------------------------------------------


def parse_beholder_stats(df: DataFrame, col: str = "payload") -> DataFrame:
    """P6 ``parse beholder-stats``: recover the typed run counters from a
    ``beholder-stats`` payload line (as emitted by ``from internal-log``
    — :func:`beholder_spark.sources.from_internal_log`), closing the
    self-observability loop in config language: ``from internal-log …;
    parse beholder-stats; …`` routes the engine's own metrics through
    the same pipeline stages as any other message.

    Pure JVM ``regexp_extract`` columns (codegen, zero shuffle, no
    Python). Payloads that are not stats lines keep NULL fields with
    ``parse_ok`` false — P7 never-silent-loss, same contract as every
    other parser here.
    """
    src = F.col(col)
    ok = src.rlike(r"^beholder-stats ")

    def _num(key: str) -> Column:
        s = F.regexp_extract(src, rf"\b{key}=(-?[0-9]+)", 1)
        return F.when(ok & (s != ""), s.cast("long"))

    def _word(key: str) -> Column:
        s = F.regexp_extract(src, rf"\b{key}=(\S+)", 1)
        return F.when(ok & (s != ""), s)

    return (
        df.withColumn("stage", _word("stage"))
        .withColumn("run_id", _word("run"))
        .withColumn("rows_out", _num("rows_out"))
        .withColumn("parse_failures", _num("parse_failures"))
        .withColumn("dropped", _num("dropped"))
        .withColumn("dropped_overflow", _num("overflow"))
        .withColumn("n_partitions", _num("parts"))
        .withColumn("wall_ms", _num("wall_ms"))
        .withColumn("parse_ok", ok)
    )


# ---------------------------------------------------------------------------
# P4: parse fieldpack — spec-pinned binary field map (SURVEY.md §2.2)
# ---------------------------------------------------------------------------
#
# The reference's fieldpack is its internal binary message format for
# beholder-to-beholder forwarding (a packed field map). The upstream
# checkout is unavailable in this sandbox, so the wire framing below is
# SPEC-PINNED here (normative for this engine, byte-exact contract):
#
#   frame   := magic(0xFB) version(0x01) uvarint(n_fields) field*
#   field   := uvarint(len(key)) key_utf8 uvarint(len(value)) value_utf8
#   uvarint := unsigned LEB128
#
# NULL fields are ABSENT from the frame (Beholder's dynamic field map:
# an unset field does not exist). All values are strings — the reference
# message model is string-valued fields. Any violation (bad magic/
# version, truncated frame, invalid UTF-8, trailing bytes) → parse_ok
# False with the fields NULL; the raw binary column passes through
# unchanged (P7 never-silent-loss).

FIELDPACK_MAGIC = 0xFB
FIELDPACK_VERSION = 1


def _uvarint(n: int) -> bytes:
    out = bytearray()
    while True:
        b = n & 0x7F
        n >>= 7
        out.append(b | (0x80 if n else 0))
        if not n:
            return bytes(out)


def _read_uvarint(buf: bytes, pos: int) -> tuple[int, int]:
    val, shift = 0, 0
    while True:
        if pos >= len(buf) or shift > 63:
            raise ValueError("truncated/overlong uvarint")
        b = buf[pos]
        pos += 1
        val |= (b & 0x7F) << shift
        if not b & 0x80:
            if b == 0 and shift > 0:
                # overlong encoding (0x80 0x00 for zero, …): reject so
                # every accepted frame is CANONICAL — unpack∘pack is
                # identity on accepted bytes, which keeps md5-of-frame
                # usable as a content key
                raise ValueError("non-canonical uvarint")
            return val, pos
        shift += 7


def fieldpack_pack(fields: dict[str, str | None]) -> bytes:
    """Encode one message's field map per the SPEC above (driver/test
    helper and the scalar core of the encode UDF)."""
    present = [(k, v) for k, v in fields.items() if v is not None]
    out = bytearray([FIELDPACK_MAGIC, FIELDPACK_VERSION])
    out += _uvarint(len(present))
    for k, v in present:
        kb, vb = k.encode("utf-8"), v.encode("utf-8")
        out += _uvarint(len(kb)) + kb + _uvarint(len(vb)) + vb
    return bytes(out)


def fieldpack_unpack(buf: bytes | None) -> dict[str, str] | None:
    """Decode one frame; None on any SPEC violation (the parse_ok=False
    path). Strict: trailing bytes after the last field are a violation."""
    if buf is None or len(buf) < 3 or buf[0] != FIELDPACK_MAGIC or buf[1] != FIELDPACK_VERSION:
        return None
    try:
        n, pos = _read_uvarint(buf, 2)
        fields: dict[str, str] = {}
        for _ in range(n):
            klen, pos = _read_uvarint(buf, pos)
            if pos + klen > len(buf):
                raise ValueError("truncated key")
            key = buf[pos:pos + klen].decode("utf-8")
            pos += klen
            vlen, pos = _read_uvarint(buf, pos)
            if pos + vlen > len(buf):
                raise ValueError("truncated value")
            fields[key] = buf[pos:pos + vlen].decode("utf-8")
            pos += vlen
        if pos != len(buf):
            raise ValueError("trailing bytes")
        return fields
    except (ValueError, UnicodeDecodeError):
        return None


@F.pandas_udf(T.BinaryType())
def _fieldpack_enc_udf(cols: pd.DataFrame) -> pd.Series:
    keys = list(cols.columns)
    return pd.Series(
        [fieldpack_pack(dict(zip(keys, row))) for row in cols.itertuples(index=False)]
    )


_FIELDPACK_DEC_SCHEMA = T.StructType(
    [
        T.StructField("fields", T.MapType(T.StringType(), T.StringType()), True),
        T.StructField("parse_ok", T.BooleanType(), False),
    ]
)


@F.pandas_udf(_FIELDPACK_DEC_SCHEMA)
def _fieldpack_dec_udf(raw: pd.Series) -> pd.DataFrame:
    rows = []
    for buf in raw:
        fields = fieldpack_unpack(bytes(buf) if buf is not None else None)
        rows.append((fields, fields is not None))
    return pd.DataFrame(rows, columns=["fields", "parse_ok"])


def fieldpack_encode(df: DataFrame, fields: list[str], out: str = "payload") -> DataFrame:
    """``set $payload fieldpack`` twin: pack the listed fields (cast to
    string; NULLs absent) into one binary column. Arrow moves the struct
    batch; packing is a tight bytes loop per row in the Python worker —
    the same cost shape as the measured-fastest syslog UDF."""
    struct = F.struct(*[F.col(f).cast("string").alias(f) for f in fields])
    return df.withColumn(out, _fieldpack_enc_udf(struct))


def parse_fieldpack(
    df: DataFrame,
    col: str = "payload",
    fields: list[str] | None = None,
    keep_unparsed: bool = False,
) -> DataFrame:
    """P4 ``parse fieldpack``: decode the binary field map.

    With ``fields`` the listed keys are projected to columns (parsed
    fields OVERWRITE same-named message fields, Beholder semantics;
    absent keys → NULL). Without it the dynamic map lands as a
    ``fields`` column — Beholder messages have no fixed schema, a map
    column is the honest Spark shape. The raw binary column is never
    modified, so a failed row keeps its frame (P7)."""
    out = df.withColumn("_fp", _fieldpack_dec_udf(F.col(col)))
    if fields is None:
        out = out.withColumn("fields", F.col("_fp.fields"))
    else:
        for f in fields:
            out = out.withColumn(f, F.col("_fp.fields").getItem(f))
    out = out.withColumn("parse_ok", F.col("_fp.parse_ok")).drop("_fp")
    if not keep_unparsed:
        out = out.filter(F.col("parse_ok"))
    return out


# ---------------------------------------------------------------------------
# WARC ingest (r4): the container Common-Crawl shards actually ship.
# The north-star table (url, warc_ts, html, text, lang) starts life as
# WARC records; this operator is the ingest step that produces it.
# Parse SPEC, pinned here (ISO 28500 subset; change comment, not code):
#   - Each input value is one WARC SEGMENT: a byte run of complete
#     records — either plain, or (CC convention) one gzip member per
#     record (magic 1F 8B); members are inflated sequentially and the
#     concatenation is parsed, so framing never depends on member
#     boundaries. Inflate is budget-capped (MAX_WARC_SEGMENT_BYTES) so
#     a gzip bomb quarantines instead of killing the executor.
#   - Record grammar: 'WARC/1.0|1.1' CRLF, 'Name: value' headers to an
#     empty line, exactly Content-Length payload bytes, CRLF CRLF.
#   - Records whose Content-Type starts with application/http have the
#     embedded HTTP message split: status code from the status line,
#     body after the header block (no HTTP block -> whole payload is
#     the body, status NULL).
#   - Salvage + quarantine (P7): a violation mid-segment emits every
#     record parsed BEFORE it PLUS one quarantine row (rec_no NULL,
#     parse_ok False) for the corrupt tail — ids never vanish and
#     quarantine stays countable.
# ---------------------------------------------------------------------------

MAX_WARC_SEGMENT_BYTES = 256 * 1024 * 1024

WARC_RECORD_SCHEMA = T.StructType(
    [
        T.StructField("id", T.LongType(), True),
        T.StructField("rec_no", T.LongType(), True),
        T.StructField("warc_type", T.StringType(), True),
        T.StructField("target_uri", T.StringType(), True),
        T.StructField("warc_date", T.StringType(), True),
        T.StructField("http_status", T.LongType(), True),
        T.StructField("body_len", T.LongType(), True),
        T.StructField("body_md5", T.StringType(), True),
        T.StructField("parse_ok", T.BooleanType(), True),
    ]
)


def _warc_gunzip_members(data: bytes) -> tuple[bytes, bool]:
    """Inflate a run of concatenated gzip members. Returns
    (inflated_prefix, ok): on a violation (truncated member, trailing
    junk, inflate budget exceeded) every COMPLETE member decoded before
    it is still returned with ok=False, so its records are salvaged per
    the operator SPEC (gzip.GzipFile cannot do this — it discards
    already-decoded members when a read call hits the corruption).

    Linearity: input is fed from a memoryview (zero-copy slices) in
    per-member feeds that START small and DOUBLE, so the one bytes copy
    zlib makes (unused_data, the overfeed past the member end) is
    bounded by ~2x the member's own size — a million tiny members stay
    O(total input), immune to the quadratic remaining-input copy a
    naive `rest = d.unused_data` loop performs."""
    import zlib

    mv = memoryview(data)
    pos = 0
    n = len(data)
    out: list[bytes] = []
    budget = MAX_WARC_SEGMENT_BYTES
    while pos < n:
        d = zlib.decompressobj(wbits=31)
        member_out: list[bytes] = []
        feed_size = 4096
        try:
            while not d.eof:
                if pos >= n:
                    raise zlib.error("truncated member")
                feed = mv[pos : pos + feed_size]
                pos += len(feed)
                feed_size *= 2
                piece = d.decompress(feed, budget + 1)
                member_out.append(piece)
                budget -= len(piece)
                if budget < 0:
                    raise zlib.error("inflate budget exceeded")
                while d.unconsumed_tail:  # output-capped: drain the rest
                    piece = d.decompress(d.unconsumed_tail, budget + 1)
                    member_out.append(piece)
                    budget -= len(piece)
                    if budget < 0:
                        raise zlib.error("inflate budget exceeded")
        except zlib.error:
            return b"".join(out), False
        pos -= len(d.unused_data)  # overfeed past the member end: rewind
        out.extend(member_out)
    return b"".join(out), True


def _warc_iter_records(data: bytes):
    """Yield (rec_no, headers, payload) strictly per the SPEC grammar;
    raises ValueError at the first violation."""
    pos = 0
    rec_no = 0
    n = len(data)
    while pos < n:
        eol = data.find(b"\r\n", pos)
        if eol < 0 or data[pos:eol] not in (b"WARC/1.0", b"WARC/1.1"):
            raise ValueError("bad WARC version line")
        pos = eol + 2
        headers: dict[bytes, bytes] = {}
        while True:
            eol = data.find(b"\r\n", pos)
            if eol < 0:
                raise ValueError("unterminated header block")
            line = data[pos:eol]
            pos = eol + 2
            if not line:
                break
            name, sep, value = line.partition(b":")
            if not sep:
                raise ValueError("malformed header line")
            headers[name.strip().lower()] = value.strip()
        try:
            clen = int(headers[b"content-length"])
        except (KeyError, ValueError) as exc:
            raise ValueError("missing/invalid Content-Length") from exc
        if clen < 0 or pos + clen + 4 > n:
            raise ValueError("payload overruns segment")
        payload = data[pos : pos + clen]
        pos += clen
        if data[pos : pos + 4] != b"\r\n\r\n":
            raise ValueError("missing record separator")
        pos += 4
        yield rec_no, headers, payload
        rec_no += 1


def _warc_split_http(payload: bytes):
    """(http_status, body) for an embedded HTTP message; (None, payload)
    when no HTTP block is present."""
    if payload[:5] != b"HTTP/":
        return None, payload
    sep = payload.find(b"\r\n\r\n")
    if sep < 0:
        return None, payload
    parts = payload[:sep].split(b"\r\n", 1)[0].split()
    # Status is UNTRUSTED: bound the digit run BEFORE int() — a hostile
    # 'HTTP/1.1 9{30} OK' would otherwise build a Python bigint that
    # overflows Arrow's int64 conversion and kills the whole mapInPandas
    # task instead of degrading this one record to NULL.
    status = None
    if len(parts) >= 2 and parts[1].isdigit() and len(parts[1]) <= 9:
        cand = int(parts[1])
        if 100 <= cand <= 999:
            status = cand
    return status, payload[sep + 4 :]


def _warc_segment_rows(rid: int, data: bytes | None) -> list[tuple]:
    import hashlib

    quarantine = (rid, None, None, None, None, None, None, None, False)
    if data is None or len(data) == 0:
        return [quarantine]
    tail_bad = False
    if data[:2] == b"\x1f\x8b":
        data, ok = _warc_gunzip_members(bytes(data))
        tail_bad = not ok  # good members' records are still salvaged below
    elif len(data) > MAX_WARC_SEGMENT_BYTES:
        return [quarantine]
    rows: list[tuple] = []
    try:
        for rec_no, headers, payload in _warc_iter_records(bytes(data)):
            ctype = headers.get(b"content-type", b"").lower()
            if ctype.startswith(b"application/http"):
                status, body = _warc_split_http(payload)
            else:
                status, body = None, payload
            rows.append(
                (
                    rid,
                    rec_no,
                    headers.get(b"warc-type", b"").decode("utf-8", "replace") or None,
                    headers.get(b"warc-target-uri", b"").decode("utf-8", "replace") or None,
                    headers.get(b"warc-date", b"").decode("utf-8", "replace") or None,
                    status,
                    len(body),
                    hashlib.md5(body).hexdigest(),
                    True,
                )
            )
    except ValueError:
        tail_bad = True
    if tail_bad:
        rows.append(quarantine)  # salvage prefix + ONE countable corrupt tail
    return rows or [quarantine]


def parse_warc(df: DataFrame, bin_col: str, id_col: str) -> DataFrame:
    """WARC ingest over a binary column (see SPEC above): one output row
    per record, multiplicity-changing mapInPandas — the same slot every
    other codec in this engine uses, so at 100 TB the record split rides
    the scan with Arrow-bounded batches and per-segment work
    embarrassingly parallel."""
    from collections.abc import Iterator

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows: list[tuple] = []
            for rid, payload in zip(pdf[id_col], pdf[bin_col]):
                rows.extend(_warc_segment_rows(int(rid), payload))
            yield pd.DataFrame(rows, columns=[f.name for f in WARC_RECORD_SCHEMA.fields])

    return df.mapInPandas(batches, WARC_RECORD_SCHEMA)


def _warc_record(warc_type: bytes, uri: bytes, date: bytes, ctype: bytes, payload: bytes) -> bytes:
    head = (
        b"WARC/1.0\r\n"
        b"WARC-Type: " + warc_type + b"\r\n"
        b"WARC-Target-URI: " + uri + b"\r\n"
        b"WARC-Date: " + date + b"\r\n"
        b"Content-Type: " + ctype + b"\r\n"
        b"Content-Length: " + str(len(payload)).encode() + b"\r\n\r\n"
    )
    return head + payload + b"\r\n\r\n"


def make_warc_bytes(doc_id: int, text: str, lang: str) -> bytes:
    """Deterministic CC-style WARC fixture: a gzip-member-per-record
    segment holding one HTTP response record (body = the document text,
    lang carried in the URI path) and, for even doc_ids, a metadata
    record (body = 'lang=<lang>')."""
    import zlib

    uri = f"https://example.com/{lang}/{doc_id}".encode()
    date = b"2025-01-01T00:00:00Z"
    body = text.encode("utf-8")
    http = b"HTTP/1.1 200 OK\r\nContent-Type: text/html\r\n\r\n" + body
    recs = [_warc_record(b"response", uri, date, b"application/http;msgtype=response", http)]
    if doc_id % 2 == 0:
        recs.append(_warc_record(b"metadata", uri, date, b"text/plain", f"lang={lang}".encode()))

    def member(raw: bytes) -> bytes:
        c = zlib.compressobj(6, zlib.DEFLATED, 31)
        return c.compress(raw) + c.flush()

    return b"".join(member(r) for r in recs)


@F.pandas_udf(T.BinaryType())
def _make_warc_udf(cols: pd.DataFrame) -> pd.Series:
    return pd.Series(
        [make_warc_bytes(int(d), str(t), str(lg)) for d, t, lg in cols.itertuples(index=False)]
    )


def with_warc_payload(
    df: DataFrame, id_col: str, text_col: str, lang_col: str, out: str = "payload"
) -> DataFrame:
    """Deterministic WARC fixture column (see :func:`make_warc_bytes`)."""
    return df.withColumn(out, _make_warc_udf(F.struct(id_col, text_col, lang_col)))
