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
