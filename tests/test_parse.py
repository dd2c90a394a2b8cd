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
