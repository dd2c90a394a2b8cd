"""Web-corpus curation operators (operators/webtext.py)."""

from __future__ import annotations

from pyspark.sql import functions as F

from beholder_spark.operators import webtext


def test_canonical_url_rules(spark):
    rows = [
        # lowercase scheme+host, strip :443, drop fragment + utm params, keep id
        ("HTTPS://WWW.Ex.COM:443/Path/A?utm_source=x&id=7&utm_campaign=y#frag",
         "https://www.ex.com/Path/A?id=7"),
        # http default port; ref param dropped; param ORDER preserved
        ("http://a.b:80/x?b=2&ref=nav&a=1", "http://a.b/x?b=2&a=1"),
        # empty path → '/'; all params tracking → no query at all
        ("https://Host.io?gclid=123", "https://host.io/"),
        # non-default port kept; path case preserved
        ("https://h.io:8443/CaseSensitive", "https://h.io:8443/CaseSensitive"),
        # fbclid/msclkid dropped, bare param without '=' kept
        ("https://h.io/p?fbclid=1&flag&msclkid=2", "https://h.io/p?flag"),
    ]
    df = spark.createDataFrame([(u,) for u, _ in rows], ["url"])
    got = {r.url: r.canonical_url for r in webtext.with_canonical_url(df).collect()}
    for url, want in rows:
        assert got[url] == want, f"{url} → {got[url]} != {want}"


def test_drop_repeated_spans_order_and_empty(spark):
    footer = "all rights reserved"
    rows = [
        (1, f"alpha one\n{footer}\nalpha two"),
        (2, f"beta one\n{footer}\nbeta two"),
        (3, f"gamma one\n{footer}\ngamma two"),
        (4, footer),  # fully-boilerplate doc must survive (empty), not vanish
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    out = {
        r.doc_id: r.text_dedup
        for r in webtext.drop_repeated_spans(df, "doc_id", "text", max_doc_freq=2).collect()
    }
    assert out[1] == "alpha one\nalpha two"  # footer gone, order preserved
    assert out[2] == "beta one\nbeta two"
    assert out[4] == ""  # kept as empty, never dropped
    assert len(out) == 4


def test_repetition_stats_values(spark):
    df = spark.createDataFrame(
        [(1, "buy now buy now buy now"), (2, "all words are unique here")],
        ["doc_id", "text"],
    )
    out = {r.doc_id: r for r in webtext.with_repetition_stats(df).collect()}
    # 6 tokens, 2 distinct → 1 - 2/6
    assert abs(out[1].dup_word_ratio - round(1 - 2 / 6, 4)) < 1e-9
    # 5 grams ("buy now","now buy",...) → 2 distinct → 1 - 2/5
    assert abs(out[1].dup_2gram_ratio - round(1 - 2 / 5, 4)) < 1e-9
    assert out[2].dup_word_ratio == 0.0
    assert out[2].dup_2gram_ratio == 0.0


def test_contamination_bounds(spark):
    bench = spark.createDataFrame([(0, "the quick brown fox jumps high")], ["doc_id", "text"])
    corpus = spark.createDataFrame(
        [
            (10, "the quick brown fox jumps high"),  # fully contaminated
            (11, "completely unrelated training document text"),
            (12, "the quick brown cat sleeps instead today"),  # partial
        ],
        ["doc_id", "text"],
    )
    out = {r.doc_id: r for r in webtext.contamination_overlap(corpus, bench, "doc_id", "text", n=3).collect()}
    assert out[10].contamination_ratio == 1.0
    assert out[11].contamination_ratio == 0.0
    assert 0.0 < out[12].contamination_ratio < 1.0  # shares "the quick brown"
    assert out[12].n_contaminated == 1


def test_blocklist_filter_and_badword_stats(spark):
    from beholder_spark.operators import webtext

    d = spark.createDataFrame(
        [(1, "a.com", "win the LOTTERY twice lottery"), (2, "b.com", "clean text"),
         (3, "a.com", "also clean")],
        "doc_id long, host string, body string",
    )
    blocked = spark.createDataFrame([("b.com",)], "bhost string")
    kept = webtext.blocklist_filter(d, "host", blocked, blocked_col="bhost")
    out = {r.doc_id: r for r in webtext.with_badword_stats(kept, "body").collect()}
    assert set(out) == {1, 3}  # b.com removed
    assert out[1].bad_hits == 2 and out[1].bad_flag is True  # case-insensitive
    assert out[3].bad_hits == 0 and out[3].bad_flag is False
    # plan: anti-join broadcasts the (small) blocklist side
    plan = kept._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan and "LeftAnti" in plan
    # regression (r4 review): the DEFAULT blocked_col='host' — i.e. both
    # sides sharing a column name — must not raise AMBIGUOUS_REFERENCE
    blocked2 = spark.createDataFrame([("b.com",)], "host string")
    same = webtext.blocklist_filter(d, "host", blocked2)
    assert sorted(r.doc_id for r in same.collect()) == [1, 3]
    # forced shuffled-hash fallback returns identical rows (same knob as
    # the sibling guarded operators)
    fb = webtext.blocklist_filter(d, "host", blocked2, broadcast_row_limit=0)
    assert sorted(r.doc_id for r in fb.collect()) == [1, 3]
    fplan = fb._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" not in fplan
