"""End-to-end pipeline correctness — the three BASELINE.json:6 clauses:
(a) byte-identical extracted text per url, (b) exact routed-row equality
per sink, (c) per-sink aggregate counts — plus lineage + resume."""

from __future__ import annotations

import pandas as pd
import pyarrow.parquet as pq
import pytest
from pyspark.sql import functions as F

from beholder_spark.functions.textextract import extract_text
from beholder_spark.pipeline import run_pages_pipeline
from beholder_spark.plans import lineage as ln


def _expected_routed(fixture_dir: str) -> pd.DataFrame:
    """Independent (pure-pandas) reference of parse→enrich→route."""
    pages = pq.read_table(f"{fixture_dir}/pages.parquet").to_pandas()
    lookup = pq.read_table(f"{fixture_dir}/host_lookup.parquet").to_pandas()
    pages["text_out"] = [extract_text(h) for h in pq.read_table(f"{fixture_dir}/pages.parquet").column("html").to_pylist()]
    pages["parse_ok"] = pages["text_out"].notna()
    pages["host"] = pages["url"].str.extract(r"https://([^/]+)/")[0]
    merged = pages.merge(lookup, on="host", how="left")

    def route_of(r):
        if not r.parse_ok:
            return "_unparsed"
        if r.category == "spam":
            return "spam"
        if r.lang == "en":
            return "en"
        if r.lang in ("de", "fr", "es"):
            return "euro"
        return "_unmatched"

    merged["route"] = [route_of(r) for r in merged.itertuples()]
    return merged


@pytest.fixture(scope="module")
def pipeline_out(spark, fixture_dir, tmp_path_factory):
    out_root = str(tmp_path_factory.mktemp("pipe"))
    res = run_pages_pipeline(
        spark,
        f"{fixture_dir}/pages.parquet",
        f"{fixture_dir}/host_lookup.parquet",
        out_root,
    )
    return out_root, res


def test_byte_identical_text(pipeline_out, spark, fixture_dir):
    """Sink text_out vs the input table's golden text, joined on url —
    the sink itself no longer persists the input column (sink hygiene)."""
    _, res = pipeline_out
    golden = spark.read.parquet(f"{fixture_dir}/pages.parquet").select("url", "warc_ts", "text")
    routed = res["routed"].select("url", "warc_ts", "text_out").join(golden, ["url", "warc_ts"])
    assert "text" not in res["routed"].columns  # input column not re-persisted
    bad = routed.filter(
        ~(
            (F.col("text").isNull() & F.col("text_out").isNull())
            | (F.encode(F.col("text"), "UTF-8") == F.encode(F.col("text_out"), "UTF-8"))
        )
    )
    assert bad.count() == 0


def test_exact_routed_rows_per_sink(pipeline_out, fixture_dir):
    _, res = pipeline_out
    got = (
        res["routed"]
        .select("url", "warc_ts", "route")
        .toPandas()
        .sort_values(["url", "warc_ts", "route"])
        .reset_index(drop=True)
    )
    exp = (
        _expected_routed(fixture_dir)[["url", "warc_ts", "route"]]
        .sort_values(["url", "warc_ts", "route"])
        .reset_index(drop=True)
    )
    got["warc_ts"] = got["warc_ts"].astype("datetime64[us]")
    exp["warc_ts"] = exp["warc_ts"].astype("datetime64[us]")
    pd.testing.assert_frame_equal(got, exp)


def test_per_sink_aggregate_counts(pipeline_out, fixture_dir):
    _, res = pipeline_out
    got = res["agg_counts"].toPandas()
    exp_routed = _expected_routed(fixture_dir)
    exp_routed["bucket"] = exp_routed["warc_ts"].dt.floor("h")
    exp = (
        exp_routed.groupby(["route", "host", "lang", "bucket"], dropna=False)
        .size()
        .reset_index(name="n")
    )
    key = ["route", "host", "lang", "bucket"]
    got = got.sort_values(key).reset_index(drop=True)
    exp = exp.sort_values(key).reset_index(drop=True)
    got["bucket"] = got["bucket"].astype("datetime64[us]")
    exp["bucket"] = exp["bucket"].astype("datetime64[us]")
    assert len(got) == len(exp)
    pd.testing.assert_frame_equal(got[key + ["n"]], exp[key + ["n"]], check_dtype=False)


def test_lineage_metrics(pipeline_out, spark):
    out_root, _ = pipeline_out
    lin = ln.read_lineage(spark, out_root).toPandas()
    assert set(lin.stage) == {"routed"}
    row = lin.iloc[0]
    assert row.rows_out == 2000
    assert row.parse_failures > 0  # NULL-html rows exist by construction
    assert row.n_partitions > 0
    manifest = ln.read_manifest(spark, out_root).toPandas()
    assert len(manifest) == row.n_partitions


def test_parse_text_dedup_equals_plain(spark, fixture_dir):
    """The payload-dedup parse variant is byte-identical to the plain
    per-row parse, including NULL and empty payloads."""
    from beholder_spark.pipeline import compile_pipeline

    pages = spark.read.parquet(f"{fixture_dir}/pages.parquet")
    plain = compile_pipeline(pages, [{"op": "parse_text", "src": "html"}])
    dedup = compile_pipeline(pages, [{"op": "parse_text_dedup", "src": "html"}])
    key = ["url", "warc_ts"]
    a = plain.select(*key, "text_out", "parse_ok").toPandas().sort_values(key).reset_index(drop=True)
    b = dedup.select(*key, "text_out", "parse_ok").toPandas().sort_values(key).reset_index(drop=True)
    assert len(a) == len(b) == pages.count()
    pd.testing.assert_frame_equal(a, b)


def test_resume_null_day_rows_exactly_once(spark, tmp_path):
    """Rows with NULL warc_ts land in the default partition, are tracked
    under the manifest's sentinel key, and are neither silently dropped
    nor re-appended by a resumed run."""
    import datetime as dt

    pages = spark.createDataFrame(
        [
            ("https://a.example/x", dt.datetime(2026, 1, 1), b"<p>hi</p>", "hi", "en"),
            ("https://a.example/y", None, b"<p>null day</p>", "null day", "en"),
        ],
        ["url", "warc_ts", "html", "text", "lang"],
    )
    lookup = spark.createDataFrame([("a.example", "EU", "news")], ["host", "geo", "category"])
    pp, lp, out = str(tmp_path / "p"), str(tmp_path / "l"), str(tmp_path / "o")
    pages.write.parquet(pp)
    lookup.write.parquet(lp)

    res1 = run_pages_pipeline(spark, pp, lp, out)
    assert res1["routed"].count() == 2
    res2 = run_pages_pipeline(spark, pp, lp, out)
    assert res2["routed"].count() == 2  # not 3 (no re-append), not 1 (no drop)
    lin = ln.read_lineage(spark, out).toPandas()
    assert sorted(lin.rows_out.tolist()) == [0, 2]


def test_resume_skips_completed_partitions(pipeline_out, spark, fixture_dir):
    """Second run over the same input: every partition is in the manifest,
    so the stage writes 0 rows (resumable without recomputation)."""
    out_root, _ = pipeline_out
    res2 = run_pages_pipeline(
        spark,
        f"{fixture_dir}/pages.parquet",
        f"{fixture_dir}/host_lookup.parquet",
        out_root,
    )
    lin = ln.read_lineage(spark, out_root).toPandas().sort_values("run_id")
    assert len(lin) == 2
    assert sorted(lin.rows_out.tolist()) == [0, 2000]
    # and the routed table did not grow
    assert res2["routed"].count() == 2000


def test_crash_between_data_write_and_manifest_no_duplicates(spark, tmp_path, monkeypatch):
    """Crash-atomicity: a failure AFTER the stage data write but BEFORE
    the manifest append must not produce duplicate rows when the run is
    resumed. The orphaned run_id directory stays on disk (proven below)
    but is invisible to manifested reads, and the partition re-runs under
    a fresh run_id."""
    import datetime as dt
    import os

    df = spark.createDataFrame(
        [
            (1, dt.date(2026, 1, 1), "a"),
            (2, dt.date(2026, 1, 1), "b"),
            (3, dt.date(2026, 1, 2), "c"),
        ],
        ["id", "day", "v"],
    )
    root = str(tmp_path / "root")
    real_append = ln._append

    def crash_before_manifest(spark_, root_, table, rows):
        if table == ln.MANIFEST:
            raise RuntimeError("injected crash: data written, manifest not")
        return real_append(spark_, root_, table, rows)

    monkeypatch.setattr(ln, "_append", crash_before_manifest)
    with pytest.raises(RuntimeError, match="injected crash"):
        ln.run_stage(spark, root, "s", df, partition_col="day")
    monkeypatch.setattr(ln, "_append", real_append)

    # resume: partitions are still pending (nothing manifested) → rewritten
    out = ln.run_stage(spark, root, "s", df, partition_col="day")
    assert out.count() == 3  # exactly once, no duplicates
    assert sorted(r.id for r in out.select("id").collect()) == [1, 2, 3]
    # the orphan data IS physically on disk — the manifest filter is what
    # hides it (this is the non-atomicity the run_id scoping defuses)
    raw = spark.read.parquet(os.path.join(root, "s"))
    assert raw.count() == 6
    # and a further resume writes nothing more
    again = ln.run_stage(spark, root, "s", df, partition_col="day")
    assert again.count() == 3
    lin = ln.read_lineage(spark, root).toPandas()
    assert sorted(lin.rows_out.tolist()) == [0, 3]  # crash run never logged


def test_curation_pipeline_checkpointed_resume(spark, tmp_path):
    """The curation pipeline (score → dedup+filter) runs under the same
    manifest/lineage machinery as the log pipeline: correct counts vs a
    direct computation, and a rerun recomputes NOTHING (rows_out 0 for
    both stages)."""
    from pyspark.sql import Window

    from beholder_spark.operators import textstats, webtext
    from beholder_spark.pipeline import run_curation_pipeline

    docs_path = "/root/testdata/sf0.001/documents.parquet"
    out_root = str(tmp_path / "curation")
    res = run_curation_pipeline(spark, docs_path, out_root)

    # direct (uncheckpointed) expectation
    d = spark.read.parquet(docs_path).filter(F.col("text").isNotNull())
    scored = textstats.with_fingerprint(
        webtext.with_repetition_stats(textstats.with_quality(d))
    )
    w = Window.partitionBy("fingerprint").orderBy("doc_id")
    expect = (
        scored.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .filter((F.col("n_tokens") >= 20) & (F.col("dup_word_ratio") <= 0.5))
        .count()
    )
    assert res["curated"].count() == expect
    assert res["scored"].count() == d.count()

    # resume: nothing recomputed, nothing duplicated
    res2 = run_curation_pipeline(spark, docs_path, out_root)
    assert res2["curated"].count() == expect
    lin = spark.read.parquet(f"{out_root}/_lineage")
    per_run = (
        lin.groupBy("stage").agg(F.min("rows_out").alias("mn"), F.max("rows_out").alias("mx")).collect()
    )
    for r in per_run:
        assert r["mn"] == 0, f"stage {r['stage']}: resume should write 0 rows"
        assert r["mx"] > 0, f"stage {r['stage']}: first run should write rows"


def test_bpe_token_count_goldens(spark):
    """Exact BPE over the pinned merge table — hand-computed goldens.

    With BPE_MERGES priorities: 'the' → th→the (1); 'and' → an→and (1);
    'ing' → in→ing (1); 'that' → th + at (2); an unmergeable pretoken
    counts its characters; contractions split off per PRETOK_REGEX."""
    from beholder_spark.operators import textstats as ts

    rows = [
        (1, "the"),  # (t,h) then (th,e) → 1 symbol
        (2, "and ing"),  # two pretokens (' ing' → space-prefixed): 1 + ?
        (3, "that"),  # th + at → 2
        (4, "xyzq"),  # no merges apply → 4 chars
        (5, "don't"),  # pretokens: "don" (d,on→2) + "'t" (no merge → 2)
        (6, None),
    ]
    df = ts.with_bpe_tokens(spark.createDataFrame(rows, ["id", "text"]))
    got = {r.id: r.n_bpe_exact for r in df.collect()}
    assert got[1] == 1
    assert got[3] == 2
    assert got[4] == 4
    assert got[6] is None
    # 'and' → 1; ' ing': symbols [' ','i','n','g'] → (i,n),(in,g) → [' ','ing'] = 2
    assert got[2] == 1 + 2
    # 'don': (o,n) → ['d','on'] = 2 ; "'t": no merge for ("'",'t') → 2
    assert got[5] == 2 + 2


def test_rare_token_stats_freq_reuse(spark):
    """The precomputed token-df table gives IDENTICAL results to the
    inline aggregate — the reuse contract for sweeping thresholds/subsets
    without re-aggregating the corpus."""
    from beholder_spark.operators import textstats as ts

    rows = [(i, f"common tok{i} shared{'x' if i % 2 else ''}") for i in range(20)]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    freq = ts.token_df(df, "doc_id").persist()
    inline = ts.rare_token_stats(df, "doc_id").collect()
    reused = ts.rare_token_stats(df, "doc_id", freq=freq).collect()
    assert sorted(map(tuple, inline)) == sorted(map(tuple, reused))
    # and the table actually carries corpus frequencies
    f = {r.tok: r.tok_df for r in freq.collect()}
    assert f["common"] == 20 and f["tok3"] == 1
    freq.unpersist()


def test_bpe_matches_independent_implementation_on_corpus(spark):
    """Corpus-scale BPE verifier (the oracle-gate stand-in for a
    non-SQL-expressible op): Spark's n_bpe_exact over 100 real documents
    equals an INDEPENDENTLY-STRUCTURED BPE — lowest-rank-first with
    restart after every successful merge, a different control flow from
    the operator's scan-for-best-pair loop."""
    from beholder_spark.operators import textstats as ts

    docs = (
        spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
        .select("doc_id", "text")
        .limit(100)
    )
    got = {r.doc_id: r.n_bpe_exact for r in ts.with_bpe_tokens(docs).collect()}

    # shared pre-tokenization (the pinned JVM regex), independent merges
    pre = docs.select(
        "doc_id",
        F.regexp_extract_all(F.col("text"), F.lit(ts.PRETOK_REGEX), F.lit(0)).alias("toks"),
    ).collect()
    ranks = list(ts.BPE_MERGES)

    def merge_restart(tok: str) -> int:
        syms = list(tok)
        restart = True
        while restart and len(syms) > 1:
            restart = False
            for a, b in ranks:  # lowest rank first; restart on success
                j = 0
                merged_any = False
                while j < len(syms) - 1:
                    if syms[j] == a and syms[j + 1] == b:
                        syms[j : j + 2] = [a + b]
                        merged_any = True
                    else:
                        j += 1
                if merged_any:
                    restart = True
                    break
        return len(syms)

    for r in pre:
        expected = sum(merge_restart(t) for t in r.toks) if r.toks is not None else None
        assert got[r.doc_id] == expected, r.doc_id


def test_hll_approx_distinct_within_error_bound(spark):
    """Independent verifier for the rows-only `approx_distinct_users`
    sweep exemption (CLAUDE.md invariant: approximate ops need a pytest
    verifier, not just a row count): per event_type, the HLL estimate at
    rsd=0.02 must sit within 10x the requested rsd of the EXACT distinct
    count (generous deterministic bound; HLL's error is ~rsd with high
    probability, so a wrong column, wrong rsd argument, or a broken
    sketch shows up as a gross violation)."""
    from beholder_spark.queries import QUERIES

    sf_dir = "/root/testdata/sf0.001"
    approx = {
        r.event_type: r.n_approx
        for r in QUERIES["approx_distinct_users"][0](spark, sf_dir).collect()
    }
    exact = {
        r.event_type: r.n_exact
        for r in spark.read.parquet(f"{sf_dir}/events.parquet")
        .groupBy("event_type")
        .agg(F.countDistinct("user_id").alias("n_exact"))
        .collect()
    }
    assert set(approx) == set(exact) and approx, "grouping keys must match"
    for et, n_ex in exact.items():
        rel_err = abs(approx[et] - n_ex) / max(n_ex, 1)
        assert rel_err <= 0.2, (et, approx[et], n_ex, rel_err)
