"""The byte-identical extraction invariant (BASELINE.json:15)."""

from __future__ import annotations

import pyarrow.parquet as pq
from pyspark.sql import functions as F

from beholder_spark.functions import extract_text, extract_text_udf


def test_spec_cases():
    assert extract_text(None) is None
    assert extract_text(b"") == ""
    assert extract_text(b"<p>hello</p>") == "hello"
    assert extract_text(b"<script>var x=1;</script>body") == "body"
    assert extract_text(b"<style>p{}</style>x") == "x"
    assert extract_text(b"<!-- c -->x") == "x"
    assert extract_text(b"a &lt;b&gt; &amp;amp; &quot;q&quot; &#39;s&#39;") == 'a <b> &amp; "q" \'s\''
    assert extract_text(b"  a\t\nb  ") == "a b"
    # non-UTF8: latin-1 e9 and truncated multibyte are replaced deterministically
    out = extract_text("<p>café</p>".encode("latin-1") + b"\xe2\x82")
    assert out is not None and "caf" in out
    assert extract_text("<p>café</p>".encode("latin-1") + b"\xe2\x82") == out  # stable


def test_udf_byte_identical_on_fixture(spark, fixture_dir):
    """The pandas UDF must reproduce the fixture's golden text column
    byte-for-byte through the Spark→Arrow→pandas round-trip, at any
    partitioning."""
    df = spark.read.parquet(f"{fixture_dir}/pages.parquet").repartition(7)
    out = df.withColumn("text2", extract_text_udf(F.col("html")))
    bad = out.filter(
        ~(
            (F.col("text").isNull() & F.col("text2").isNull())
            | (F.encode(F.col("text"), "UTF-8") == F.encode(F.col("text2"), "UTF-8"))
        )
    )
    assert bad.count() == 0


def test_fixture_determinism(fixture_dir):
    from beholder_spark.fixtures import gen_pages

    t1 = gen_pages(300, seed=42)
    t2 = gen_pages(300, seed=42)
    assert t1.equals(t2)
    # edge rows present at fixture scale (2000 rows)
    htmls = pq.read_table(f"{fixture_dir}/pages.parquet").column("html").to_pylist()
    assert any(h is None for h in htmls)
    assert any(h == b"" for h in htmls)


def test_golden_text_column_matches_pure_function(fixture_dir):
    t = pq.read_table(f"{fixture_dir}/pages.parquet")
    htmls = t.column("html").to_pylist()[:200]
    texts = t.column("text").to_pylist()[:200]
    for h, x in zip(htmls, texts):
        assert extract_text(h) == x
