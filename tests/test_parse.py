"""Parser operators vs the golden loglines corpus (FIXTURES.md F3)."""

from __future__ import annotations

from pyspark.sql import functions as F
from pyspark.sql import types as T

from beholder_spark.operators import parse


def test_parse_syslog_golden(spark, fixture_dir):
    df = spark.read.parquet(f"{fixture_dir}/loglines.parquet")
    out = parse.parse_syslog(df, "raw", keep_unparsed=True)
    rows = out.select(
        "line_id", "facility", "severity", "host", "program", "pid", "payload", "parse_ok",
        "expected_facility", "expected_severity", "expected_host", "expected_program",
        "expected_pid", "expected_payload",
    ).collect()
    assert len(rows) > 0
    for r in rows:
        assert r.facility == r.expected_facility, f"line {r.line_id}: facility"
        assert r.severity == r.expected_severity, f"line {r.line_id}: severity"
        assert r.host == r.expected_host, f"line {r.line_id}: host"
        assert r.program == r.expected_program, f"line {r.line_id}: program"
        assert r.pid == r.expected_pid, f"line {r.line_id}: pid"
        assert r.payload == r.expected_payload, f"line {r.line_id}: payload"
        assert r.parse_ok == (r.expected_host is not None)


def test_parse_syslog_quarantine_default(spark, fixture_dir):
    """SPEC P7: default drops unparseable rows (they go to quarantine,
    not downstream); keep_unparsed keeps them with NULL fields."""
    df = spark.read.parquet(f"{fixture_dir}/loglines.parquet")
    total = df.count()
    kept = parse.parse_syslog(df, "raw", keep_unparsed=False).count()
    all_rows = parse.parse_syslog(df, "raw", keep_unparsed=True).count()
    assert all_rows == total
    assert 0 < kept < total  # corpus has ~20% unparseable by construction


def test_parse_regexp_groups(spark):
    df = spark.createDataFrame([("GET /a/b 200",), ("bogus",)], ["line"])
    out = parse.parse_regexp(df, "line", r"^(\w+) (\S+) (\d+)$", {"verb": 1, "path": 2, "code": 3})
    rows = {r.line: r for r in out.collect()}
    assert rows["GET /a/b 200"].verb == "GET"
    assert rows["GET /a/b 200"].code == "200"
    assert rows["GET /a/b 200"].parse_ok is True
    assert rows["bogus"].parse_ok is False
    assert rows["bogus"].verb is None


def test_parse_json_corrupt_detection(spark):
    df = spark.createDataFrame([('{"k": 1}',), ("not json",), (None,)], ["props"])
    out = parse.parse_json(df, "props", T.StructType([T.StructField("k", T.LongType())]))
    rows = out.collect()
    by = {r.props: r for r in rows}
    assert by['{"k": 1}'].parse_ok is True and by['{"k": 1}'].k == 1
    assert by["not json"].parse_ok is False
    assert by[None].parse_ok is False


def test_each_field_as_message(spark):
    df = spark.createDataFrame([(1, "a", 10)], ["id", "x", "y"])
    out = parse.each_field_as_message(df, ["x", "y"], id_cols=["id"])
    got = {(r.key, r.value) for r in out.collect()}
    assert got == {("x", "a"), ("y", "10")}


def test_fieldpack_codec_unit():
    """P4 SPEC: LEB128 length-prefixed UTF-8 field map; NULLs absent;
    every framing violation → None (the parse_ok=False path)."""
    from beholder_spark.operators import parse as P

    d = {"a": "héllo", "b": "", "c": None, "日": "本"}
    buf = P.fieldpack_pack(d)
    assert P.fieldpack_unpack(buf) == {"a": "héllo", "b": "", "日": "本"}
    assert P.fieldpack_unpack(bytes([0xFB, 0x01, 0x00])) == {}  # empty map is valid
    assert P.fieldpack_unpack(None) is None
    assert P.fieldpack_unpack(b"") is None
    assert P.fieldpack_unpack(bytes([0xFA, 0x01, 0x00])) is None  # bad magic
    assert P.fieldpack_unpack(bytes([0xFB, 0x02, 0x00])) is None  # bad version
    assert P.fieldpack_unpack(buf[:-1]) is None  # truncated value
    assert P.fieldpack_unpack(buf + b"x") is None  # trailing bytes
    # long values exercise multi-byte uvarints
    big = {"k" * 200: "v" * 5000}
    assert P.fieldpack_unpack(P.fieldpack_pack(big)) == big


def test_fieldpack_spark_roundtrip(spark):
    rows = [(1, "alpha", "x"), (2, "béta ☃", None), (3, "", "z")]
    df = spark.createDataFrame(rows, ["id", "f1", "f2"])
    enc = parse.fieldpack_encode(df, ["f1", "f2"], out="fp")
    dec = parse.parse_fieldpack(
        enc.select("id", "fp"), col="fp", fields=["f1", "f2"], keep_unparsed=True
    )
    got = sorted(dec.select("id", "f1", "f2", "parse_ok").collect())
    assert [tuple(r) for r in got] == [
        (1, "alpha", "x", True),
        (2, "béta ☃", None, True),
        (3, "", "z", True),
    ]


def test_fieldpack_corrupt_quarantine(spark):
    """Corrupt frames: parse_ok False, raw binary preserved, dynamic-map
    form; default mode filters them (quarantine upstream, P7)."""
    from beholder_spark.operators import parse as P

    good = P.fieldpack_pack({"k": "v"})
    df = spark.createDataFrame(
        [(1, bytearray(good)), (2, bytearray(b"junk"))], "id long, fp binary"
    )
    dec = parse.parse_fieldpack(df, col="fp", keep_unparsed=True)
    rows = {r.id: (r.fields, r.parse_ok, bytes(r.fp)) for r in dec.collect()}
    assert rows[1] == ({"k": "v"}, True, good)
    assert rows[2] == (None, False, b"junk")  # frame kept: never silent loss
    assert parse.parse_fieldpack(df, col="fp").count() == 1


# ---------------------------------------------------------------------------
# WARC ingest (r4): record grammar, gzip-member chaining, HTTP split,
# salvage + countable quarantine
# ---------------------------------------------------------------------------


def test_warc_handcrafted_record_and_http_split():
    import hashlib

    from beholder_spark.operators import parse as P

    rec = P._warc_record(
        b"response", b"https://x.test/a", b"2025-06-01T00:00:00Z",
        b"application/http;msgtype=response",
        b"HTTP/1.1 404 Not Found\r\nServer: t\r\n\r\nmissing!",
    )
    rows = P._warc_segment_rows(11, rec)
    assert rows == [
        (11, 0, "response", "https://x.test/a", "2025-06-01T00:00:00Z",
         404, 8, hashlib.md5(b"missing!").hexdigest(), True)
    ]
    # non-http record: whole payload is the body, status NULL
    rec2 = P._warc_record(b"resource", b"u:1", b"d", b"text/plain", b"abc")
    r = P._warc_segment_rows(12, rec2)[0]
    assert (r[5], r[6], r[8]) == (None, 3, True)


def test_warc_hostile_status_degrades_to_null(spark):
    """A status-line bigint ('HTTP/1.1 9{30} OK') must degrade to a NULL
    status — NOT build a Python int that overflows Arrow int64 and kills
    the whole mapInPandas task (violating the salvage+quarantine SPEC)."""
    import pandas as pd

    from beholder_spark.operators import parse as P

    hostile = P._warc_record(
        b"response", b"u:evil", b"d", b"application/http;msgtype=response",
        b"HTTP/1.1 " + b"9" * 30 + b" OK\r\nServer: t\r\n\r\nbody",
    )
    row = P._warc_segment_rows(1, hostile)[0]
    assert (row[5], row[6], row[8]) == (None, 4, True)
    # boundary cases: 3-digit in range kept, out-of-range dropped
    for raw, want in ((b"599", 599), (b"099", None), (b"1000", None)):
        rec = P._warc_record(
            b"response", b"u:b", b"d", b"application/http;msgtype=response",
            b"HTTP/1.1 " + raw + b" X\r\n\r\nok",
        )
        assert P._warc_segment_rows(2, rec)[0][5] == want, raw
    # full Spark path: the hostile record must not crash the Arrow stage
    pdf = pd.DataFrame({"doc_id": [1], "payload": [hostile]})
    out = P.parse_warc(spark.createDataFrame(pdf), "payload", "doc_id").collect()
    assert len(out) == 1 and out[0]["http_status"] is None and out[0]["parse_ok"]


def test_warc_violations_salvage_and_quarantine():
    from beholder_spark.operators import parse as P

    good = P._warc_record(b"resource", b"u:1", b"d", b"text/plain", b"abc")
    # salvage: one good record, then a tail violating each grammar rule
    for tail in (
        b"WARC/2.0\r\n\r\n\r\n\r\n",                      # bad version
        b"WARC/1.0\r\nNoColonHere\r\n\r\n\r\n\r\n",       # malformed header
        b"WARC/1.0\r\nContent-Length: zz\r\n\r\nx\r\n\r\n",  # bad length
        b"WARC/1.0\r\nContent-Length: 99\r\n\r\nshort",   # overrun
        good[:-2],                                        # missing separator
    ):
        rows = P._warc_segment_rows(5, good + tail)
        assert len(rows) == 2 and rows[0][8] is True
        assert rows[1][1] is None and rows[1][8] is False, tail
    # gzip bomb: members inflating past the budget quarantine
    import zlib

    def member(raw):
        c = zlib.compressobj(6, zlib.DEFLATED, 31)
        return c.compress(raw) + c.flush()

    old = P.MAX_WARC_SEGMENT_BYTES
    P.MAX_WARC_SEGMENT_BYTES = 1000
    try:
        bomb = member(b"\x00" * 100_000)
        assert P._warc_segment_rows(6, bomb) == [
            (6, None, None, None, None, None, None, None, False)
        ]
    finally:
        P.MAX_WARC_SEGMENT_BYTES = old
    # empty / None payloads
    assert P._warc_segment_rows(7, b"")[0][8] is False
    assert P._warc_segment_rows(8, None)[0][8] is False


def test_warc_spark_path_multiplicity_and_ids_never_vanish(spark):
    import pandas as pd

    from beholder_spark.operators import parse as P

    pdf = pd.DataFrame(
        {
            "doc_id": [2, 3, 4],
            "payload": [
                P.make_warc_bytes(2, "two", "en"),   # 2 records (even id)
                P.make_warc_bytes(3, "three", "de"),  # 1 record
                b"\x1f\x8bgarbage",                   # broken gzip
            ],
        }
    )
    out = P.parse_warc(spark.createDataFrame(pdf), "payload", "doc_id").collect()
    by_id = {}
    for r in out:
        by_id.setdefault(r["id"], []).append(r)
    assert len(by_id[2]) == 2 and all(r["parse_ok"] for r in by_id[2])
    assert len(by_id[3]) == 1 and by_id[3][0]["warc_type"] == "response"
    assert len(by_id[4]) == 1 and by_id[4][0]["parse_ok"] is False


def test_warc_gzip_prefix_salvage_and_case_insensitive_http():
    """Regression (r4 review): a truncated gzip member must not swallow
    records already decoded from earlier good members, and the embedded-
    HTTP split must match Content-Type case-insensitively."""
    import hashlib
    import zlib

    from beholder_spark.operators import parse as P

    def member(raw):
        c = zlib.compressobj(6, zlib.DEFLATED, 31)
        return c.compress(raw) + c.flush()

    r1 = P._warc_record(b"resource", b"u:1", b"d", b"text/plain", b"first")
    r2 = P._warc_record(b"resource", b"u:2", b"d", b"text/plain", b"second")
    r3 = P._warc_record(b"resource", b"u:3", b"d", b"text/plain", b"third")
    seg = member(r1) + member(r2) + member(r3)[: len(member(r3)) // 2]
    rows = P._warc_segment_rows(9, seg)
    assert len(rows) == 3  # two salvaged + ONE countable quarantine
    assert [r[8] for r in rows] == [True, True, False]
    assert [r[6] for r in rows[:2]] == [5, 6]
    # mixed-case Content-Type still triggers the HTTP split (RFC 2045)
    http = b"HTTP/1.1 200 OK\r\n\r\nbody!"
    rec = P._warc_record(b"response", b"u:4", b"d", b"Application/HTTP; msgtype=response", http)
    r = P._warc_segment_rows(4, rec)[0]
    assert (r[5], r[6], r[7]) == (200, 5, hashlib.md5(b"body!").hexdigest())
    # many-member segments stay linear (would hang under the old
    # per-member unused_data copy if quadratic)
    many = member(r1) * 5000
    rows = P._warc_segment_rows(10, many)
    assert len(rows) == 5000 and all(r[8] for r in rows)
