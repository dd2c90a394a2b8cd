"""Beholder config-language front end: tokenize → parse → compile → run.

Mirrors the reference's config-parser test style (SURVEY.md §5.1): feed a
config snippet plus synthetic messages, assert the resulting field map /
routing / sink contents.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from beholder_spark import config as C


# ---------------------------------------------------------------------------
# tokenizer / parser
# ---------------------------------------------------------------------------


def test_tokenize_kinds():
    toks = C.tokenize("set $f 'a {$b} c' ~re~ { } ; # comment\nword")
    kinds = [(t.kind, t.value) for t in toks]
    assert kinds == [
        ("word", "set"),
        ("word", "$f"),
        ("quoted", "a {$b} c"),
        ("regex", "re"),
        ("brace", "{"),
        ("brace", "}"),
        ("brace", ";"),
        ("word", "word"),
    ]


def test_tokenize_escapes():
    toks = C.tokenize(r"set $f 'it\'s' ~a\~b~;")
    assert toks[2].value == "it's"
    assert toks[3].value == "a~b"


def test_parse_nested_blocks():
    cmds = C.parse_config("flow { switch $x { case ~a~ { drop; } default { } } to file 'p'; }")
    assert cmds[0].name == "flow"
    sw = cmds[0].block[0]
    assert sw.name == "switch" and sw.block[0].name == "case"
    assert sw.block[0].block[0].name == "drop"
    assert cmds[0].block[1].name == "to"


def test_parse_unbalanced_raises():
    with pytest.raises(C.ConfigError):
        C.parse_config("flow {")
    with pytest.raises(C.ConfigError):
        C.parse_config("}")


# ---------------------------------------------------------------------------
# compile + run
# ---------------------------------------------------------------------------


@pytest.fixture()
def messages(spark):
    rows = [
        ("<13>Oct 11 22:14:15 host1 app[42]: hello world", "en"),
        ("<13>Oct 11 22:14:16 host2 db: query ran", "de"),
        ("not syslog at all", "en"),
        ("<99999>bad pri", "fr"),
    ]
    return spark.createDataFrame(rows, ["payload", "lang"])


def test_config_parse_set_keep(spark, messages):
    cfg = """
    parse syslog keep-unparsed;
    set $tag '{$host}/{$program}';
    keep $tag $severity $parse_ok $lang;
    """
    out = C.compile_config(cfg)(messages)
    assert set(out.columns) == {"tag", "severity", "parse_ok", "lang"}
    rows = {r.tag: r for r in out.collect()}
    assert rows["host1/app"].severity == "5"
    assert rows["host2/db"].parse_ok is True
    # unparseable rows kept with NULL fields (keep-unparsed SPEC)
    assert None not in rows and len(rows) == 3  # two parsed + joint "/" for unparsed
    assert rows["/"].parse_ok is False


def test_config_switch_first_match_and_quarantine(spark, messages):
    cfg = """
    switch '{$lang}' {
      case ~en~ { set $sink 'english'; }
      case ~en|de~ { set $sink 'germanic'; }
    }
    """
    out = C.compile_config(cfg)(messages)
    got = {r.lang: (r.route, r.sink) for r in out.select("lang", "route", "sink").distinct().collect()}
    assert got["en"] == ("case_1", "english")  # first match wins
    assert got["de"] == ("case_2", "germanic")
    assert got["fr"] == ("_unmatched", None)  # no default → quarantined, not dropped


def test_config_case_capture_named_groups(spark):
    """R2: a case regex's named groups become fields on matched rows."""
    df = spark.createDataFrame(
        [("GET /a.html 200",), ("POST /b.json 500",), ("garbage",)], ["payload"]
    )
    cfg = "switch '{$payload}' { case ~^(?<verb>GET|POST) (?<path>\\S+)~ { } }"
    out = C.compile_config(cfg)(df)
    rows = {r.payload: (r.route, r.verb, r.path) for r in out.collect()}
    assert rows["GET /a.html 200"] == ("case_1", "GET", "/a.html")
    assert rows["POST /b.json 500"] == ("case_1", "POST", "/b.json")
    assert rows["garbage"] == ("_unmatched", None, None)


def test_config_case_drop(spark, messages):
    cfg = """
    switch '{$lang}' {
      case ~fr~ { drop; }
      default { }
    }
    """
    out = C.compile_config(cfg)(messages)
    langs = {r.lang for r in out.select("lang").distinct().collect()}
    assert langs == {"en", "de"}


def test_config_sink_fanout(spark, messages, tmp_path):
    cfg = """
    parse syslog keep-unparsed;
    switch '{$lang}' {
      case ~en~ { to file '/logs/en/{$host}.log'; }
      default { to file '/logs/rest.log'; }
    }
    """
    res = C.run_config_pipeline(spark, messages, cfg, str(tmp_path / "out"))
    assert len(res) == 2
    en = res["sink_0"]
    assert {r.route for r in en.select("route").distinct().collect()} == {"case_1"}
    # field-templated path became a partition column
    assert "host" in en.columns
    rest = res["sink_1"]
    assert {r.route for r in rest.select("route").distinct().collect()} == {"default"}


def test_config_parse_regexp_and_json(spark):
    df = spark.createDataFrame(
        [('{"a": 1, "b": "x"}', "k=v1"), ('{"a": 2, "b": "y"}', "k=v2")],
        ["payload", "kv"],
    )
    out = C.compile_config("parse json $payload a:long b:string;")(df)
    assert {r.a for r in out.collect()} == {1, 2}

    # parse regexp operates on $payload (Beholder semantics)
    out2 = C.compile_config('parse regexp ~"b": "(\\w)"~ $val:1;')(df)
    assert {r.val for r in out2.collect()} == {"x", "y"}


def test_config_set_replace_and_drop_if(spark):
    df = spark.createDataFrame([("a-b", "x"), ("c-d", "drop me")], ["s", "flag"])
    cfg = """
    set $s2 replace ~-~ '_' in $s;
    drop if $flag == 'drop me';
    """
    out = C.compile_config(cfg)(df)
    assert [r.s2 for r in out.collect()] == ["a_b"]


def test_config_join_subflow_union(spark, messages, tmp_path):
    side_path = str(tmp_path / "side")
    spark.createDataFrame([("extra line", "sv")], ["payload", "lang"]).write.parquet(side_path)
    cfg = f"""
    join {{ from parquet '{side_path}'; set $joined 'yes'; }}
    """
    out = C.compile_config(cfg)(messages)
    assert out.count() == messages.count() + 1
    assert out.filter(F.col("joined") == "yes").count() == 1
    # main-flow rows carry NULL for the subflow-only field
    assert out.filter(F.col("joined").isNull()).count() == messages.count()


def test_config_tee_collects_sink_without_affecting_flow(spark, messages, tmp_path):
    cfg = """
    tee { keep $lang; to file '/copy.log'; }
    set $seen 'yes';
    """
    compiled = C.compile_config(cfg)
    out = compiled(messages)
    # tee's keep did not project the main flow
    assert "payload" in out.columns and out.select("seen").first().seen == "yes"
    assert len(compiled.sinks) == 1
    # the sink captured the TEE block's frame (only $lang), not the final
    # flow — later `set $seen` does not retroactively appear in the sink
    assert compiled.sinks[0]["df"].columns == ["lang"]
    # re-applying the compiled config does not duplicate sink specs
    compiled(messages)
    assert len(compiled.sinks) == 1


def test_config_sink_captures_before_case_drop(spark, messages, tmp_path):
    """`case { to file; drop; }` writes the route's rows, THEN discards
    them from the flow (Beholder command order)."""
    cfg = """
    switch '{$lang}' {
      case ~en~ { to file '/en.log'; drop; }
      default { }
    }
    """
    compiled = C.compile_config(cfg)
    out = compiled(messages)
    assert out.filter(F.col("route") == "case_1").count() == 0  # dropped from flow
    assert compiled.sinks[0]["df"].count() == 2  # but the sink kept them


def test_config_drop_if_keeps_null_fields(spark):
    df = spark.createDataFrame([("a", "spam"), ("b", None), ("c", "ok")], ["s", "flag"])
    out = C.compile_config("drop if $flag == 'spam';")(df)
    assert {r.s for r in out.collect()} == {"b", "c"}  # NULL flag KEPT


def test_config_set_date_requires_column(spark):
    df = spark.createDataFrame([("a",)], ["s"])
    with pytest.raises(C.ConfigError):
        C.compile_config("set $f date;")(df)


def test_config_drop_if_rejects_unsupported_operator(spark):
    with pytest.raises(C.ConfigError, match="only == and !="):
        C.compile_config("drop if $status >= '500';")(
            spark.createDataFrame([("200",)], ["status"])
        )


def test_config_two_cases_capture_same_group(spark):
    """A later case capturing the same named group must not NULL out the
    earlier case's captured values (preserve-existing semantics)."""
    df = spark.createDataFrame(
        [("login user=alice",), ("logout user=bob",), ("noise",)], ["payload"]
    )
    cfg = """
    switch '{$payload}' {
      case ~^login user=(?<user>\\w+)~ { }
      case ~^logout user=(?<user>\\w+)~ { }
    }
    """
    out = C.compile_config(cfg)(df)
    got = {r.payload.split(" ")[0]: r.user for r in out.collect()}
    assert got["login"] == "alice"  # not clobbered by case_2's otherwise
    assert got["logout"] == "bob"
    assert got["noise"] is None


def test_config_parse_syslog_keeps_raw_payload_on_failure(spark, messages):
    """P7 via the config front end: the source column IS payload, so an
    unparseable row must keep the original line in payload (pass through
    unchanged), not NULL it into unrecoverability."""
    out = C.compile_config("parse syslog keep-unparsed;")(messages)
    rows = {r.lang: r for r in out.collect()}
    assert rows["fr"].parse_ok is False
    assert rows["fr"].payload == "<99999>bad pri"  # raw line survives
    assert rows["de"].payload == "query ran"  # parsed rows get the body


def test_config_set_env_literal(spark, monkeypatch):
    monkeypatch.setenv("BEHOLDER_TEST_DC", "eu-west")
    out = C.compile_config("set $dc env BEHOLDER_TEST_DC;")(
        spark.createDataFrame([("x",)], ["payload"])
    )
    assert out.first().dc == "eu-west"
    # missing var → quoted default
    out2 = C.compile_config("set $dc env NO_SUCH_VAR_SET 'fallback';")(
        spark.createDataFrame([("x",)], ["payload"])
    )
    assert out2.first().dc == "fallback"


def test_config_each_field_as_message(spark):
    df = spark.createDataFrame([(1, "a", 10)], ["id", "x", "y"])
    # listed fields explode; unlisted columns ride along as identity
    out = C.compile_config("parse each-field-as-message $x $y;")(df)
    got = {(r.id, r.key, r.value) for r in out.collect()}
    assert got == {(1, "x", "a"), (1, "y", "10")}
    # bare form: every column becomes a (key, value) message
    out2 = C.compile_config("parse each-field-as-message;")(df)
    assert {(r.key, r.value) for r in out2.collect()} == {("id", "1"), ("x", "a"), ("y", "10")}


def test_config_self_sourcing_from_text(spark, tmp_path):
    """`from text '<path>'` at top level makes the config name its own
    scan — the whole job from config text alone (df=None)."""
    lines_path = str(tmp_path / "lines")
    spark.createDataFrame(
        [("<13>Oct 11 22:14:15 h1 app[1]: ok",), ("garbage",)], ["value"]
    ).coalesce(1).write.mode("overwrite").text(lines_path)
    cfg = f"""
    from text '{lines_path}';
    parse syslog keep-unparsed;
    """
    out = C.compile_config(cfg)(None, spark=spark)
    rows = sorted((r.parse_ok, r.payload) for r in out.collect())
    assert rows == [(False, "garbage"), (True, "ok")]
    # and without spark it's a compile-time error
    with pytest.raises(C.ConfigError, match="self-sourcing"):
        C.compile_config(cfg)(None)


def test_config_buffer_bounds_rows_per_file(spark, tmp_path):
    """`buffer N` (K5) maps to maxRecordsPerFile on later sinks: a
    100-row single-partition write lands in ≥10 files of ≤10 rows."""
    import glob

    df = spark.range(100).selectExpr("CAST(id AS STRING) AS payload").coalesce(1)
    res = C.run_config_pipeline(
        spark, df, "buffer 10; to file 'out';", str(tmp_path / "o")
    )
    assert res["sink_0"].count() == 100
    files = glob.glob(str(tmp_path / "o" / "sink_0" / "part-*.parquet"))
    assert len(files) >= 10
    # without buffer: one partition → one file
    res2 = C.run_config_pipeline(spark, df, "to file 'out';", str(tmp_path / "o2"))
    assert res2["sink_0"].count() == 100
    assert len(glob.glob(str(tmp_path / "o2" / "sink_0" / "part-*.parquet"))) == 1


def test_config_dry_run_validates_without_writing(spark, tmp_path):
    """dry_run ≡ beholder --test: plans are analyzed, nothing written."""
    import os

    df = spark.createDataFrame([("x", "en")], ["payload", "lang"])
    out_root = str(tmp_path / "dry")
    res = C.run_config_pipeline(
        spark, df, "set $tag '{$lang}'; to file 'sink';", out_root, dry_run=True
    )
    assert set(res) == {"sink_0"}
    assert not os.path.exists(out_root)  # nothing executed
    # a config referencing a missing column fails AT dry-run time
    with pytest.raises(Exception):
        C.run_config_pipeline(
            spark, df, "set $tag '{$no_such_col}'; to file 's';", out_root, dry_run=True
        )


def test_config_to_stdout_debug_sink(spark, tmp_path, capsys):
    """K1 `to stdout`: rows print at execution; the flow is unaffected."""
    df = spark.createDataFrame([("hello-stdout-row", "en")], ["payload", "lang"])
    res = C.run_config_pipeline(spark, df, "to stdout; keep $lang; to file 'f';", str(tmp_path / "o"))
    assert res["sink_0"].columns == ["payload", "lang"]  # captured pre-keep
    assert res["sink_1"].columns == ["lang"]
    assert "hello-stdout-row" in capsys.readouterr().out


def test_config_to_udp_sink(spark, tmp_path):
    """K3 `to udp 'host:port'` in config text: one datagram per row sent
    from the executors; the flow continues past the sink."""
    import socket
    import threading

    lines_box, port_box = [], []
    ready, stop = threading.Event(), threading.Event()

    def recv():
        sock = socket.socket(socket.AF_INET, socket.SOCK_DGRAM)
        sock.bind(("127.0.0.1", 0))
        sock.settimeout(0.5)
        port_box.append(sock.getsockname()[1])
        ready.set()
        while not stop.is_set():
            try:
                data, _ = sock.recvfrom(65536)
            except TimeoutError:
                continue
            lines_box.append(data.decode())
        sock.close()

    t = threading.Thread(target=recv, daemon=True)
    t.start()
    assert ready.wait(10)

    df = spark.createDataFrame([(f"udp line {i}", "en") for i in range(20)], ["payload", "lang"])
    res = C.run_config_pipeline(
        spark, df, f"to udp '127.0.0.1:{port_box[0]}'; to file 'f';", str(tmp_path / "o")
    )
    import time as _time

    _time.sleep(1)
    stop.set()
    t.join(10)
    assert sorted(lines_box) == sorted(f"udp line {i}" for i in range(20))
    assert res["sink_1"].count() == 20  # flow unaffected


def test_config_to_tcp_bad_address_rejected(spark):
    df = spark.createDataFrame([("x",)], ["payload"])

    def compile_addr(cfg):
        return C.run_config_pipeline(spark, df, cfg, "/tmp/unused", dry_run=True)

    with pytest.raises(C.ConfigError, match="host:port"):
        compile_addr("to tcp 'nope';")
    # regression (ADVICE r2): out-of-range port and raw-IPv6 ambiguity must
    # fail at COMPILE time, not inside executor send tasks
    with pytest.raises(C.ConfigError, match="1–65535"):
        compile_addr("to tcp 'host:99999';")
    with pytest.raises(C.ConfigError, match="1–65535"):
        compile_addr("to udp 'host:0';")
    with pytest.raises(C.ConfigError, match="bracket IPv6"):
        compile_addr("to tcp '::1:514';")
    # bracketed IPv6 literal is accepted
    compile_addr("to tcp '[::1]:514';")


def test_config_streaming_daemon_mode(spark, tmp_path):
    """A reference user's config runs as a STREAM (daemon parity): same
    command tree, streaming input, manifested exactly-once sink — result
    rows equal the batch run of the identical config."""
    from beholder_spark.plans import lineage as ln

    cfg = "parse syslog keep-unparsed; set $tag '{$host}/{$program}'; keep $tag $severity $parse_ok;"
    lines = [f"<{(i * 5) % 64}>1 2026-02-01T00:00:0{i % 10}Z host{i % 3} prog{i % 2} - - - m{i}" for i in range(60)]
    src_dir = str(tmp_path / "src")
    spark.createDataFrame([(ln_,) for ln_ in lines], ["payload"]).write.parquet(src_dir)

    stream = spark.readStream.schema("payload string").parquet(src_dir)
    q = C.run_config_stream(
        spark, stream, cfg, str(tmp_path / "out"), str(tmp_path / "ckpt")
    )
    q.awaitTermination(120)
    got = ln.read_stage(spark, str(tmp_path / "out"), "config_sink", "_batch")

    batch = C.compile_config(cfg)(spark.read.parquet(src_dir))
    assert sorted(got.drop("_batch").collect()) == sorted(batch.collect())
    assert got.count() == 60

    # non-file intermediate sinks are rejected up front (not
    # replay-idempotent under micro-batch retry)
    with pytest.raises(C.ConfigError, match="to file"):
        C.run_config_stream(
            spark, stream, "to stdout;", str(tmp_path / "out2"), str(tmp_path / "ck2")
        )


def test_config_from_udp_daemon(spark, tmp_path):
    """`from udp <port> spool '<dir>'` round-trip: the daemon runner
    starts the datagram bridge AND the streaming pipeline; live datagrams
    land exactly-once in the manifested sink and KEEP landing (a second
    wave arrives after the first is committed) — daemon parity for the
    reference's primary transport."""
    import socket
    import time

    from beholder_spark.plans import lineage as ln

    spool = tmp_path / "spool"
    cfg = (
        f"from udp 0 spool '{spool}';\n"
        "parse syslog keep-unparsed;\n"
        "keep $severity $program $parse_ok;\n"
    )
    q, bridges = C.run_config_udp_daemon(
        spark, cfg, str(tmp_path / "out"), str(tmp_path / "ckpt")
    )
    try:
        port = bridges[0].port
        cli = socket.socket(socket.AF_INET, socket.SOCK_DGRAM)

        def send(lo, hi):
            for i in range(lo, hi):
                msg = f"<{i % 32}>1 2026-03-01T00:00:00Z h prog{i % 4} - - - d{i}"
                cli.sendto(msg.encode(), ("127.0.0.1", port))

        def rows():
            try:
                return ln.read_stage(spark, str(tmp_path / "out"), "config_sink", "_batch").count()
            except Exception:
                return 0  # sink dir not created yet

        send(0, 30)
        deadline = time.monotonic() + 90
        while rows() < 30 and time.monotonic() < deadline:
            time.sleep(0.5)
        assert rows() == 30
        send(30, 50)  # the daemon keeps ingesting after the first commit
        deadline = time.monotonic() + 90
        while rows() < 50 and time.monotonic() < deadline:
            time.sleep(0.5)
        cli.close()
    finally:
        q.stop()
        for b in bridges:
            b.stop()

    got = ln.read_stage(spark, str(tmp_path / "out"), "config_sink", "_batch")
    assert got.count() == 50  # exactly-once: no loss, no duplicates
    assert got.filter("parse_ok").count() == 50
    assert got.select("program").distinct().count() == 4


def test_config_from_udp_compile_errors(spark):
    with pytest.raises(C.ConfigError, match="spool"):
        C.compile_config("from udp 5140;")(None, spark=spark)
    with pytest.raises(C.ConfigError, match="out of range"):
        C.compile_config("from udp 99999 spool '/tmp/x';")(None, spark=spark)
    with pytest.raises(C.ConfigError, match="from udp"):
        C.run_config_udp_daemon(spark, "from timer 5;", "/tmp/u1", "/tmp/u2")
    # streaming sources through the BATCH runner fail with a front-end
    # error, not Spark's raw writeStream AnalysisException
    with pytest.raises(C.ConfigError, match="streaming sources"):
        C.run_config_pipeline(
            spark, None, "from udp 0 spool '/tmp/spx'; to file 'y';", "/tmp/ux", dry_run=True
        )


def test_config_hot_reload_swaps_pipeline(spark, tmp_path):
    """SIGHUP parity (SURVEY §3.1): rewriting the config mid-stream swaps
    the pipeline at a micro-batch boundary — post-swap rows use the NEW
    config, pre-swap rows are neither lost nor duplicated — and a BROKEN
    rewrite keeps the old pipeline running untouched."""
    import time

    from beholder_spark.plans import lineage as ln

    src_dir = str(tmp_path / "src")

    def wave(lo, hi):
        rows = [(f"<13>1 2026-04-01T00:00:00Z h p - - - w{i}",) for i in range(lo, hi)]
        spark.createDataFrame(rows, ["payload"]).coalesce(1).write.mode("append").parquet(src_dir)

    cfg = tmp_path / "beholder.conf"
    cfg.write_text("parse syslog keep-unparsed; set $ver 'v1'; keep $ver $severity $parse_ok;")
    wave(0, 30)

    sup = C.ConfigStreamSupervisor(
        spark,
        str(cfg),
        lambda: spark.readStream.schema("payload string").parquet(src_dir),
        str(tmp_path / "out"),
        str(tmp_path / "ckpt"),
    ).start()
    try:

        def counts():
            try:
                df = ln.read_stage(spark, str(tmp_path / "out"), "config_sink", "_batch")
                return {r["ver"]: r["n"] for r in df.groupBy("ver").agg(F.count(F.lit(1)).alias("n")).collect()}
            except Exception:
                return {}

        deadline = time.monotonic() + 90
        while counts().get("v1", 0) < 30 and time.monotonic() < deadline:
            time.sleep(0.5)
        assert counts() == {"v1": 30}

        # broken rewrite: reload refuses the swap, old pipeline keeps running
        gen = sup.generation
        cfg.write_text("parse syslog keep-unparsed; set $ver bogusfn $x; keep $ver;")
        assert sup.reload() is False
        assert isinstance(sup.last_error, C.ConfigError)
        assert sup.generation == gen and sup.query.isActive

        # batch-only rewrite (non-file sink): valid batch config, but the
        # streaming runner rejects it — reload must refuse BEFORE stopping
        # the old query (regression: the old dry pass missed the sink
        # check and killed the pipeline)
        cfg.write_text("parse syslog keep-unparsed; to stdout;")
        assert sup.reload() is False
        assert isinstance(sup.last_error, C.ConfigError)
        assert sup.generation == gen and sup.query.isActive

        # good rewrite: atomic swap on the SAME checkpoint + manifested sink
        cfg.write_text("parse syslog keep-unparsed; set $ver 'v2'; keep $ver $severity $parse_ok;")
        assert sup.reload() is True
        assert sup.generation == gen + 1 and sup.last_error is None
        wave(30, 50)
        deadline = time.monotonic() + 90
        while counts().get("v2", 0) < 20 and time.monotonic() < deadline:
            time.sleep(0.5)
        assert counts() == {"v1": 30, "v2": 20}  # exactly-once across the swap
    finally:
        sup.stop()


def test_config_watcher_and_sighup_trigger_reload(tmp_path):
    """The watch thread reloads on config mtime change and on SIGHUP —
    and does NOT churn while the file is unchanged."""
    import os
    import signal
    import time

    cfg = tmp_path / "c.conf"
    cfg.write_text("keep $a;")
    sup = C.ConfigStreamSupervisor(None, str(cfg), None, "", "")
    calls = []
    sup.reload = lambda: calls.append(1)
    sup.watch(0.05)
    try:
        time.sleep(0.3)
        assert not calls  # unchanged file: no reload churn
        cfg.write_text("keep $b;")
        deadline = time.monotonic() + 5
        while not calls and time.monotonic() < deadline:
            time.sleep(0.05)
        assert calls  # mtime change → reload
        calls.clear()
        sup.install_sighup()
        os.kill(os.getpid(), signal.SIGHUP)
        deadline = time.monotonic() + 5
        while not calls and time.monotonic() < deadline:
            time.sleep(0.05)
        assert calls  # SIGHUP → reload
    finally:
        sup._watch_stop.set()


def test_config_parse_fieldpack(spark):
    """P4 via the config front end: listed fields project to columns;
    bare form keeps the dynamic map."""
    from beholder_spark.operators import parse as P

    msgs = [{"host": f"h{i}", "msg": f"m{i}"} for i in range(5)]
    df = spark.createDataFrame(
        [(bytearray(P.fieldpack_pack(m)),) for m in msgs], "payload binary"
    )
    out = C.compile_config("parse fieldpack $host $msg;")(df)
    assert sorted((r.host, r.msg) for r in out.collect()) == [(f"h{i}", f"m{i}") for i in range(5)]
    bare = C.compile_config("parse fieldpack keep-unparsed;")(df)
    assert bare.select("fields").first().fields == {"host": "h0", "msg": "m0"}


def test_config_to_shell_sink(spark, tmp_path):
    """K4 `to shell 'cmd'`: partition rows stream newline-framed into the
    command's stdin on the executors; a failing command fails the job
    (never silent loss); missing/unquoted command fails at compile."""
    df = spark.createDataFrame([(f"line{i}",) for i in range(20)], ["payload"]).coalesce(1)
    out = tmp_path / "shell_out.txt"
    C.run_config_pipeline(spark, df, f"to shell 'cat >> {out}';", str(tmp_path / "o"))
    assert sorted(out.read_text().splitlines()) == sorted(f"line{i}" for i in range(20))

    with pytest.raises(Exception):
        C.run_config_pipeline(spark, df, "to shell 'exit 3';", str(tmp_path / "o2"))
    with pytest.raises(C.ConfigError, match="quoted command"):
        C.run_config_pipeline(spark, df, "to shell;", str(tmp_path / "o3"), dry_run=True)


def test_write_shell_parallel_partitions(spark, tmp_path):
    """K4 batch form: one subprocess per partition in parallel ($$ gives
    each a distinct output file); the union of outputs is exactly the
    input rows."""
    from beholder_spark import sinks as sk

    d = tmp_path / "parts"
    d.mkdir()
    df = spark.createDataFrame([(f"r{i}",) for i in range(100)], ["payload"]).repartition(4)
    sk.write_shell(df, f"cat > {d}/out.$$")
    got = sorted(ln for f in d.iterdir() for ln in f.read_text().splitlines())
    assert got == sorted(f"r{i}" for i in range(100))


def test_cli_daemon_udp(spark, tmp_path):
    """`python -m beholder_spark --daemon -c <conf>` parity: a `from udp`
    config starts the bridge + stream from the CLI entry point, live
    datagrams land in the manifested sink, and --daemon-seconds bounds
    the run (the test handle for Beholder's run-forever default)."""
    import socket
    import threading
    import time

    from beholder_spark.__main__ import main
    from beholder_spark.plans import lineage as ln

    probe = socket.socket(socket.AF_INET, socket.SOCK_DGRAM)
    probe.bind(("127.0.0.1", 0))
    port = probe.getsockname()[1]
    probe.close()

    spool = tmp_path / "spool"
    conf = tmp_path / "d.conf"
    conf.write_text(
        f"from udp {port} spool '{spool}';\nparse syslog keep-unparsed;\nkeep $severity $parse_ok;\n"
    )
    out = str(tmp_path / "out")
    rc_box: list[int] = []
    t = threading.Thread(
        target=lambda: rc_box.append(
            main(["--daemon", "--config", str(conf), "--out", out, "--daemon-seconds", "60"])
        ),
        daemon=True,
    )
    t.start()
    time.sleep(3)  # bridge bind + stream start

    cli = socket.socket(socket.AF_INET, socket.SOCK_DGRAM)
    for i in range(15):
        cli.sendto(f"<{i % 24}>1 2026-05-01T00:00:00Z h p - - - cli {i}".encode(), ("127.0.0.1", port))
    cli.close()

    def rows():
        try:
            return ln.read_stage(spark, out, "config_sink", "_batch").count()
        except Exception:
            return 0

    deadline = time.monotonic() + 55
    while rows() < 15 and time.monotonic() < deadline:
        time.sleep(0.5)
    assert rows() == 15
    t.join(90)
    assert rc_box == [0]


def test_cli_daemon_tcp_syslog_frame(spark, tmp_path):
    """CLI `--daemon` with a `from tcp … as syslog-frame` config: the
    RFC6587 frame bridge starts from the entry point (no --pages needed),
    octet-counted frames land in the manifested sink, and the bounded
    run exits 0 — full parity with the udp daemon path."""
    import socket
    import threading
    import time

    from beholder_spark.__main__ import main
    from beholder_spark.plans import lineage as ln

    # pre-probe a free TCP port (same pattern as the udp CLI test)
    probe = socket.socket(socket.AF_INET, socket.SOCK_STREAM)
    probe.setsockopt(socket.SOL_SOCKET, socket.SO_REUSEADDR, 1)
    probe.bind(("127.0.0.1", 0))
    port = probe.getsockname()[1]
    probe.close()

    spool = tmp_path / "spool"
    conf = tmp_path / "d.conf"
    conf.write_text(
        f"from tcp 127.0.0.1 {port} as syslog-frame spool '{spool}';\n"
        "parse syslog keep-unparsed;\nkeep $severity $parse_ok;\n"
    )
    out = str(tmp_path / "out")
    rc_box: list[int] = []
    t = threading.Thread(
        target=lambda: rc_box.append(
            main(["--daemon", "--config", str(conf), "--out", out, "--daemon-seconds", "60"])
        ),
        daemon=True,
    )
    t.start()
    # wait for the bridge to bind, then send octet-counted frames
    deadline = time.monotonic() + 20
    cli = None
    while time.monotonic() < deadline:
        try:
            cli = socket.socket(socket.AF_INET, socket.SOCK_STREAM)
            cli.connect(("127.0.0.1", port))
            break
        except OSError:
            cli.close()
            cli = None
            time.sleep(0.3)
    assert cli is not None, "frame bridge never bound its port"
    for i in range(12):
        msg = f"<{i % 16}>1 2026-05-02T00:00:00Z h p - - - cli tcp {i}".encode()
        cli.sendall(str(len(msg)).encode() + b" " + msg)
    cli.close()

    def rows():
        try:
            return ln.read_stage(spark, out, "config_sink", "_batch").count()
        except Exception:
            return 0

    deadline = time.monotonic() + 55
    while rows() < 12 and time.monotonic() < deadline:
        time.sleep(0.5)
    assert rows() == 12
    t.join(90)
    assert rc_box == [0]


def test_config_from_tcp_syslog_frame_daemon(spark, tmp_path):
    """`from tcp <host> <port> as syslog-frame spool '<dir>'`: the daemon
    runner starts the RFC6587 octet-counted TCP bridge; framed messages —
    including one with embedded newlines — land exactly-once in the
    manifested sink with the same rows as the batch engine."""
    import socket
    import time

    from beholder_spark.plans import lineage as ln

    spool = tmp_path / "spool"
    cfg = (
        f"from tcp 127.0.0.1 0 as syslog-frame spool '{spool}';\n"
        "parse syslog keep-unparsed;\n"
        "keep $severity $program $payload $parse_ok;\n"
    )
    compiled = C.compile_config(cfg)
    compiled(None, spark=spark)
    assert compiled.tcp_frame_ingest == [
        {"host": "127.0.0.1", "port": 0, "spool": str(spool)}
    ]

    q, bridges = C.run_config_udp_daemon(
        spark, cfg, str(tmp_path / "out"), str(tmp_path / "ckpt")
    )
    msgs = [f"<{i % 24}>1 2026-03-02T00:00:00Z h prog{i % 3} - - - f{i}" for i in range(25)]
    msgs.append("<7>1 2026-03-02T00:00:01Z h prog1 - - - over\ntwo lines")
    try:
        port = bridges[0].port
        cli = socket.socket(socket.AF_INET, socket.SOCK_STREAM)
        cli.connect(("127.0.0.1", port))
        for m in msgs:
            b = m.encode()
            cli.sendall(str(len(b)).encode() + b" " + b)
        cli.close()

        def rows():
            try:
                return ln.read_stage(spark, str(tmp_path / "out"), "config_sink", "_batch").count()
            except Exception:
                return 0

        deadline = time.monotonic() + 90
        while rows() < len(msgs) and time.monotonic() < deadline:
            time.sleep(0.5)
    finally:
        q.stop()
        for b in bridges:
            b.stop()

    got = ln.read_stage(spark, str(tmp_path / "out"), "config_sink", "_batch")
    assert got.count() == len(msgs)  # exactly-once
    assert sorted(r.payload for r in got.filter("NOT parse_ok").collect()) == [
        "<7>1 2026-03-02T00:00:01Z h prog1 - - - over\ntwo lines"
    ]
    assert got.filter("parse_ok").count() == 25


def test_config_from_tcp_framing_compile_errors(spark):
    with pytest.raises(C.ConfigError, match="spool"):
        C.compile_config("from tcp 127.0.0.1 0 as syslog-frame;")(None, spark=spark)
    with pytest.raises(C.ConfigError, match="framing"):
        C.compile_config("from tcp 127.0.0.1 514 as pigeon;")(None, spark=spark)
    with pytest.raises(C.ConfigError, match="out of range"):
        C.compile_config("from tcp 127.0.0.1 0;")(None, spark=spark)  # newline framing needs a real port


def test_config_internal_log_self_observability(spark, tmp_path):
    """`from internal-log '<root>'; parse beholder-stats;` — the
    self-observability loop in config language: a real checkpointed
    stage writes _lineage; the config scans the engine's own metrics as
    messages and recovers the typed counters exactly. Non-stats payloads
    quarantine with parse_ok=false (P7)."""
    from pyspark.sql import functions as F

    from beholder_spark.plans import lineage as ln

    root = str(tmp_path / "pipe")
    df = spark.range(40).select(
        F.col("id").alias("k"), (F.col("id") % 4).alias("part"), (F.col("id") % 5 == 0).alias("bad")
    )
    ln.run_stage(
        spark, root, "demo", df, partition_col="part",
        extra_metrics={"parse_failures": F.count_if(F.col("bad"))},
    )

    cfg = f"from internal-log '{root}';\nparse beholder-stats;\n"
    out = C.compile_config(cfg)(None, spark=spark)
    rows = out.collect()
    assert len(rows) == 1 and rows[0].parse_ok
    r = rows[0]
    assert (r.stage, r.rows_out, r.parse_failures, r.dropped, r.n_partitions) == (
        "demo", 40, 8, 0, 4
    )
    assert r.source == f"internal-log://{root}"
    assert r.run_id.startswith("r") and r.wall_ms >= 0

    # a second (resume) run appends a rows_out=0 lineage row — visible as
    # a second message, stats still recoverable per run
    ln.run_stage(spark, root, "demo", df, partition_col="part")
    out2 = C.compile_config(cfg)(None, spark=spark)
    assert out2.count() == 2
    assert out2.agg(F.sum("rows_out")).first()[0] == 40  # resume added nothing

    # P7: non-stats payloads through the same parser quarantine cleanly
    other = spark.createDataFrame([("not a stats line",)], ["payload"])
    from beholder_spark.operators import parse as po

    q = po.parse_beholder_stats(other).first()
    assert q.parse_ok is False and q.stage is None and q.rows_out is None

    # compile error: missing root
    with pytest.raises(C.ConfigError, match="internal-log"):
        C.compile_config("from internal-log;")(None, spark=spark)


def test_config_stream_tee_fanout_two_sinks_with_reload(spark, tmp_path):
    """Streaming config FAN-OUT (Beholder's bread-and-butter): a config
    with `tee { … to file }` plus the main flow runs as ONE streaming
    query; both sinks land through the manifested stages exactly-once,
    including across a mid-run config rewrite via the supervisor."""
    import time

    from beholder_spark.plans import lineage as ln

    src_dir = str(tmp_path / "src")

    def wave(lo, hi):
        rows = [
            (f"<{(i * 3) % 32}>1 2026-05-01T00:00:00Z h prog{i % 2} - - - t{i}",)
            for i in range(lo, hi)
        ]
        spark.createDataFrame(rows, ["payload"]).coalesce(1).write.mode("append").parquet(src_dir)

    cfg = tmp_path / "beholder.conf"
    cfg.write_text(
        "parse syslog keep-unparsed;\n"
        "tee { keep $severity $program; to file 'side/{$program}'; }\n"
        "set $ver 'v1';\n"
        "keep $ver $severity $program $parse_ok;\n"
    )
    wave(0, 30)

    out = str(tmp_path / "out")
    sup = C.ConfigStreamSupervisor(
        spark,
        str(cfg),
        lambda: spark.readStream.schema("payload string").parquet(src_dir),
        out,
        str(tmp_path / "ckpt"),
    ).start()
    try:

        def n(stage):
            try:
                return ln.read_stage(spark, out, stage, "_batch").count()
            except Exception:
                return 0

        deadline = time.monotonic() + 120
        while (n("config_sink") < 30 or n("sink_0") < 30) and time.monotonic() < deadline:
            time.sleep(0.5)
        assert n("config_sink") == 30 and n("sink_0") == 30

        side = ln.read_stage(spark, out, "sink_0", "_batch")
        # tee slice: only the teed columns, templated field is a partition col
        assert set(side.columns) == {"severity", "program", "_batch"}
        assert sorted(r.program for r in side.select("program").distinct().collect()) == [
            "prog0", "prog1"
        ]
        main = ln.read_stage(spark, out, "config_sink", "_batch")
        assert main.filter("ver = 'v1'").count() == 30  # tee didn't leak into main

        # rewrite mid-run: supervisor swaps on the same checkpoint; both
        # sinks stay exactly-once across the swap
        cfg.write_text(
            "parse syslog keep-unparsed;\n"
            "tee { keep $severity $program; to file 'side/{$program}'; }\n"
            "set $ver 'v2';\n"
            "keep $ver $severity $program $parse_ok;\n"
        )
        assert sup.reload() is True
        wave(30, 50)
        deadline = time.monotonic() + 120
        while (n("config_sink") < 50 or n("sink_0") < 50) and time.monotonic() < deadline:
            time.sleep(0.5)
        assert n("config_sink") == 50 and n("sink_0") == 50  # no loss, no dupes
        vers = {
            r.ver: r.n
            for r in ln.read_stage(spark, out, "config_sink", "_batch")
            .groupBy("ver").agg(F.count(F.lit(1)).alias("n")).collect()
        }
        assert vers == {"v1": 30, "v2": 20}
    finally:
        sup.stop()


def test_config_fanout_survives_checkpoint_loss_with_grown_source(spark, tmp_path):
    """Regression (r4 review): the multi-sink fan-out used to persist()
    the batch slice BEFORE computing the file-keyed manifest key, which
    severed input_file_name provenance and degraded every key to
    b<batch_id> — after checkpoint loss on a grown spool, the replayed
    batch 0 anti-joined ALL its rows away and the new files' rows were
    silently dropped in every sink. Both sinks must instead append
    exactly the new file's rows."""
    import shutil

    from beholder_spark.plans import lineage as ln

    cfg = (
        "parse syslog keep-unparsed;\n"
        "tee { keep $severity $program; to file 'side/{$program}'; }\n"
        "keep $severity $program $parse_ok;\n"
    )
    src_dir = str(tmp_path / "src")

    def wave(lo, hi):
        rows = [
            (f"<{(i * 3) % 32}>1 2026-05-01T00:00:00Z h prog{i % 2} - - - t{i}",)
            for i in range(lo, hi)
        ]
        spark.createDataFrame(rows, ["payload"]).coalesce(1).write.mode("append").parquet(src_dir)

    wave(0, 30)
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    stream = spark.readStream.schema("payload string").parquet(src_dir)
    C.run_config_stream(spark, stream, cfg, out, ckpt).awaitTermination(120)
    assert ln.read_stage(spark, out, "config_sink", "_batch").count() == 30
    assert ln.read_stage(spark, out, "sink_0", "_batch").count() == 30

    # checkpoint lost AND the spool grew: replayed batch 0 = old+new files
    shutil.rmtree(ckpt)
    wave(30, 50)
    stream2 = spark.readStream.schema("payload string").parquet(src_dir)
    C.run_config_stream(spark, stream2, cfg, out, ckpt).awaitTermination(120)
    for stage in ("config_sink", "sink_0"):
        got = ln.read_stage(spark, out, stage, "_batch")
        assert got.count() == 50, stage  # new rows appended, none duplicated
