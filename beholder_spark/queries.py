"""Registered operator queries + DuckDB oracle twins (driver contract).

Each entry exercises one SURVEY.md §2 operator mapping over the driver's
testdata tables and has an ANSI-SQL twin the driver runs through DuckDB at
sf0.01 (row-count + schema + order-insensitive value hash). Column names
are aliased identically on both sides; doubles are rounded at the edge to
keep the value hash stable across engines.

Structure: ``QUERIES[name] = (spark_fn, oracle_sql_or_None)``.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from beholder_spark.operators import aggregate as agg
from beholder_spark.operators import enrich, fields, parse, route, skew
from beholder_spark.sources import union_sources

Entry = tuple[Callable[[SparkSession, str], DataFrame], str | None]
QUERIES: dict[str, Entry] = {}


def _register(name: str, oracle: str | None):
    def deco(fn):
        QUERIES[name] = (fn, oracle)
        return fn

    return deco


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


# ---------------------------------------------------------------------------
# Flagship: scan → project → time-bucket → hash agg (A2/A3)
# ---------------------------------------------------------------------------


@_register(
    "flagship_stats_by_type_hour",
    """
    SELECT event_type,
           date_trunc('hour', ts) AS bucket,
           count(*) AS n
    FROM events
    GROUP BY event_type, date_trunc('hour', ts)
    """,
)
def flagship_stats_by_type_hour(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Beholder-stats analogue: messages per type per hour (SURVEY §2.7 A2+A3)."""
    return agg.stats_counts(_t(spark, sf_dir, "events"), ["event_type"], ts_col="ts")


# ---------------------------------------------------------------------------
# P3: parse json (events.props)
# ---------------------------------------------------------------------------


@_register(
    "parse_json_props",
    """
    SELECT (props->>'$.k')::BIGINT % 10 AS k_mod, count(*) AS n
    FROM events
    GROUP BY 1
    """,
)
def parse_json_props(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P3: from_json with declared schema + corrupt-record parse_ok."""
    df = parse.parse_json(
        _t(spark, sf_dir, "events"), "props", T.StructType([T.StructField("k", T.LongType())])
    )
    return df.groupBy((F.col("k") % 10).alias("k_mod")).agg(F.count(F.lit(1)).alias("n"))


# ---------------------------------------------------------------------------
# P2: parse regexp — named-group extraction, JVM-side
# ---------------------------------------------------------------------------


@_register(
    "parse_regexp_first_word",
    r"""
    SELECT regexp_extract(text, '^(\w+) (\w+)', 1) AS w1, count(*) AS n
    FROM documents
    GROUP BY 1
    """,
)
def parse_regexp_first_word(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P2: regexp_extract stays in whole-stage codegen (no Python)."""
    df = parse.parse_regexp(
        _t(spark, sf_dir, "documents"), "text", r"^(\w+) (\w+)", {"w1": 1, "w2": 2}
    )
    return (
        df.withColumn("w1", F.coalesce("w1", F.lit("")))
        .groupBy("w1")
        .agg(F.count(F.lit(1)).alias("n"))
    )


# ---------------------------------------------------------------------------
# P1 + F9: syslog serialize → parse roundtrip (pandas UDF hot path)
# ---------------------------------------------------------------------------


@_register(
    "parse_syslog_roundtrip",
    """
    SELECT CAST(event_id % 24 AS VARCHAR) AS facility,
           CAST(event_id % 8 AS VARCHAR) AS severity,
           'node' || CAST(user_id AS VARCHAR) AS host,
           event_type AS program,
           CAST(event_id AS VARCHAR) AS pid,
           props AS payload,
           event_id
    FROM events
    """,
)
def parse_syslog_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P1/F9: serialize events to RFC3164 wire lines (set_syslog), parse
    them back with the Arrow pandas-UDF syslog parser; fields must
    roundtrip exactly. The oracle computes the expected fields directly."""
    ev = _t(spark, sf_dir, "events").select(
        "event_id",
        (F.col("event_id") % 24).cast("string").alias("fac"),
        (F.col("event_id") % 8).cast("string").alias("sev"),
        F.concat(F.lit("node"), F.col("user_id").cast("string")).alias("h"),
        F.col("event_type").alias("prog"),
        F.col("event_id").cast("string").alias("p"),
        F.col("ts"),
        F.col("props").alias("msg"),
    )
    wire = fields.set_syslog(ev, "raw", "fac", "sev", "ts", "h", "prog", "p", "msg")
    parsed = parse.parse_syslog(wire.select("event_id", "raw"), "raw", keep_unparsed=False)
    return parsed.select(
        "facility", "severity", "host", "program", "pid", F.col("payload"), "event_id"
    )


# ---------------------------------------------------------------------------
# F7: severity number → name
# ---------------------------------------------------------------------------


@_register(
    "severity_names",
    """
    SELECT CASE event_id % 8
             WHEN 0 THEN 'emerg' WHEN 1 THEN 'alert' WHEN 2 THEN 'crit'
             WHEN 3 THEN 'error' WHEN 4 THEN 'warning' WHEN 5 THEN 'notice'
             WHEN 6 THEN 'info' ELSE 'debug' END AS sev_name,
           count(*) AS n
    FROM events GROUP BY 1
    """,
)
def severity_names(spark: SparkSession, sf_dir: str) -> DataFrame:
    df = _t(spark, sf_dir, "events").withColumn("sev", (F.col("event_id") % 8).cast("string"))
    df = fields.set_severity_name(df, "sev_name", "sev")
    return df.groupBy("sev_name").agg(F.count(F.lit(1)).alias("n"))


# ---------------------------------------------------------------------------
# R1/R3: switch/case first-match-wins routing
# ---------------------------------------------------------------------------


@_register(
    "route_switch_lang",
    """
    SELECT CASE
             WHEN regexp_matches(text, 'spark (table|query)') THEN 'sparky'
             WHEN lang = 'en' THEN 'english'
             WHEN lang IN ('de', 'fr', 'es') THEN 'euro'
             ELSE '_unmatched' END AS route,
           count(*) AS n
    FROM documents GROUP BY 1
    """,
)
def route_switch_lang(spark: SparkSession, sf_dir: str) -> DataFrame:
    """R1: ordered when() chain == Beholder first-match-wins case order;
    R3: explicit _unmatched quarantine route, never silent drop."""
    df = route.switch(
        _t(spark, sf_dir, "documents"),
        [
            (F.col("text").rlike("spark (table|query)"), "sparky"),
            (F.col("lang") == "en", "english"),
            (F.col("lang").isin("de", "fr", "es"), "euro"),
        ],
    )
    return df.groupBy("route").agg(F.count(F.lit(1)).alias("n"))


@_register(
    "route_case_capture",
    r"""
    SELECT doc_id,
           CASE WHEN lang = 'en' THEN 'english' ELSE '_unmatched' END AS route,
           CASE WHEN lang = 'en' THEN regexp_extract(text, '^(\w+) (\w+)', 2)
                ELSE NULL END AS second_word
    FROM documents
    """,
)
def route_case_capture(spark: SparkSession, sf_dir: str) -> DataFrame:
    """R2: capture groups extracted only inside the matched case."""
    df = route.switch(_t(spark, sf_dir, "documents"), [(F.col("lang") == "en", "english")])
    df = route.case_capture(df, "text", r"^(\w+) (\w+)", {"second_word": 2}, route_value="english")
    return df.select("doc_id", "route", "second_word")


# ---------------------------------------------------------------------------
# F1/F2/F8/F11/F12: set-family + keep/drop
# ---------------------------------------------------------------------------


@_register(
    "set_template_json",
    """
    SELECT c_custkey,
           printf('%s [%s]', c_name, c_mktsegment) AS greeting,
           '{"c_custkey":' || CAST(c_custkey AS VARCHAR) || ',"c_nationkey":'
               || CAST(c_nationkey AS VARCHAR) || '}' AS js
    FROM customer
    """,
)
def set_template_json(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F1 template interpolation + F8 to_json serialization."""
    df = _t(spark, sf_dir, "customer")
    df = fields.set_template(df, "greeting", "%s [%s]", "c_name", "c_mktsegment")
    df = fields.set_json(df, "js", "c_custkey", "c_nationkey")
    return df.select("c_custkey", "greeting", "js")


@_register(
    "set_replace_keep_drop",
    r"""
    SELECT doc_id, lang,
           substr(regexp_replace(text, '[aeiou]', '*', 'g'), 1, 30) AS masked
    FROM documents
    WHERE n_chars > 200
    """,
)
def set_replace_keep_drop(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F2 regex substitution + F11 keep-projection + F12 drop-filter."""
    df = _t(spark, sf_dir, "documents")
    df = fields.drop_when(df, F.col("n_chars") <= 200)
    df = fields.set_replace(df, "masked", "[aeiou]", "*", src="text")
    df = df.withColumn("masked", F.substring("masked", 1, 30))
    return fields.keep(df, "doc_id", "lang", "masked")


# ---------------------------------------------------------------------------
# A1: broadcast lookup enrichment
# ---------------------------------------------------------------------------


@_register(
    "enrich_broadcast_geo",
    """
    SELECT r.r_name AS region, count(*) AS n,
           round(sum(c.c_acctbal), 2) AS total_bal
    FROM customer c
    JOIN nation n ON c.c_nationkey = n.n_nationkey
    JOIN region r ON n.n_regionkey = r.r_regionkey
    GROUP BY r.r_name
    """,
)
def enrich_broadcast_geo(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A1: two chained broadcast hash-joins — the fact side never shuffles
    for the join; only the final aggregate exchanges (key→partial) rows."""
    c = _t(spark, sf_dir, "customer")
    n = _t(spark, sf_dir, "nation")
    r = _t(spark, sf_dir, "region")
    joined = enrich.enrich_lookup(
        enrich.enrich_lookup(c, n, on=c.c_nationkey == n.n_nationkey, how="inner"),
        r,
        on=n.n_regionkey == r.r_regionkey,
        how="inner",
    )
    return joined.groupBy(F.col("r_name").alias("region")).agg(
        F.count(F.lit(1)).alias("n"), F.round(F.sum("c_acctbal"), 2).alias("total_bal")
    )


@_register(
    "enrich_left_missing",
    """
    SELECT d.source, m.grp, count(*) AS n
    FROM documents d
    LEFT JOIN (VALUES ('src0', 'alpha'), ('src1', 'beta'), ('src2', 'alpha')) AS m(source, grp)
      ON d.source = m.source
    GROUP BY d.source, m.grp
    """,
)
def enrich_left_missing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A1 left-join NULL semantics: missing lookup rows keep the message
    with NULL enrichment (Beholder dynamic-field model)."""
    d = _t(spark, sf_dir, "documents")
    dim = spark.createDataFrame(
        [("src0", "alpha"), ("src1", "beta"), ("src2", "alpha")], ["source", "grp"]
    )
    return enrich.enrich_lookup(d, dim, on="source").groupBy("source", "grp").agg(
        F.count(F.lit(1)).alias("n")
    )


# ---------------------------------------------------------------------------
# A8: semi/anti joins (resume filter)
# ---------------------------------------------------------------------------


@_register(
    "anti_orders_without_lineitems",
    """
    SELECT o.o_orderstatus, count(*) AS n
    FROM orders o
    WHERE NOT EXISTS (SELECT 1 FROM lineitem l WHERE l.l_orderkey = o.o_orderkey)
    GROUP BY o.o_orderstatus
    """,
)
def anti_orders_without_lineitems(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A8 anti-join: the resume filter shape (skip completed partitions)."""
    o = _t(spark, sf_dir, "orders")
    li = _t(spark, sf_dir, "lineitem").select(F.col("l_orderkey").alias("o_orderkey"))
    return (
        enrich.filter_processed(o, li, on="o_orderkey")
        .groupBy("o_orderstatus")
        .agg(F.count(F.lit(1)).alias("n"))
    )


@_register(
    "semi_orders_with_lineitems",
    """
    SELECT count(*) AS n
    FROM orders o
    WHERE EXISTS (SELECT 1 FROM lineitem l WHERE l.l_orderkey = o.o_orderkey)
    """,
)
def semi_orders_with_lineitems(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = _t(spark, sf_dir, "orders")
    li = _t(spark, sf_dir, "lineitem").select(F.col("l_orderkey").alias("o_orderkey"))
    return enrich.filter_known(o, li, on="o_orderkey").agg(F.count(F.lit(1)).alias("n"))


# ---------------------------------------------------------------------------
# S6/C3: union of sources
# ---------------------------------------------------------------------------


@_register(
    "union_sources_counts",
    """
    SELECT kind, count(*) AS n, count(DISTINCT id) AS n_ids
    FROM (
      SELECT 'events' AS kind, event_id AS id FROM events
      UNION ALL
      SELECT 'documents' AS kind, doc_id AS id FROM documents
    ) GROUP BY kind
    """,
)
def union_sources_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S6: multiple `from` sources = unionByName (narrow, shuffle-free)."""
    ev = _t(spark, sf_dir, "events").select(
        F.lit("events").alias("kind"), F.col("event_id").alias("id")
    )
    dc = _t(spark, sf_dir, "documents").select(
        F.lit("documents").alias("kind"), F.col("doc_id").alias("id")
    )
    return (
        union_sources(ev, dc)
        .groupBy("kind")
        .agg(F.count(F.lit(1)).alias("n"), F.countDistinct("id").alias("n_ids"))
    )


# ---------------------------------------------------------------------------
# A3/A4/A5: time buckets, distinct counts, top-k
# ---------------------------------------------------------------------------


@_register(
    "time_bucket_day",
    """
    SELECT date_trunc('day', ts) AS bucket, count(*) AS n,
           count(DISTINCT user_id) AS n_users
    FROM events GROUP BY 1
    """,
)
def time_bucket_day(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A3+A4: day bucket + exact distinct per bucket."""
    df = agg.time_bucket(_t(spark, sf_dir, "events"), "ts", "day")
    return df.groupBy("bucket").agg(
        F.count(F.lit(1)).alias("n"), F.countDistinct("user_id").alias("n_users")
    )


@_register(
    "distinct_users_by_type",
    """
    SELECT event_type, count(DISTINCT user_id) AS n_distinct
    FROM events GROUP BY event_type
    """,
)
def distinct_users_by_type(spark: SparkSession, sf_dir: str) -> DataFrame:
    return agg.distinct_count(_t(spark, sf_dir, "events"), ["event_type"], "user_id")


@_register(
    "topk_event_types",
    """
    SELECT event_type, count(*) AS n
    FROM events GROUP BY event_type
    ORDER BY n DESC, event_type ASC LIMIT 3
    """,
)
def topk_event_types(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A5 global top-k: agg first, sort only the (tiny) aggregate."""
    return agg.top_k_global(_t(spark, sf_dir, "events"), "event_type", 3)


@_register(
    "topk_source_per_lang",
    """
    SELECT lang, source, n, rank FROM (
      SELECT lang, source, count(*) AS n,
             row_number() OVER (PARTITION BY lang ORDER BY count(*) DESC, source ASC) AS rank
      FROM documents GROUP BY lang, source
    ) WHERE rank <= 2
    """,
)
def topk_source_per_lang(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A5 per-group top-k: window over pre-aggregated slice, no global sort."""
    return agg.top_k_per_group(_t(spark, sf_dir, "documents"), "lang", "source", 2)


# ---------------------------------------------------------------------------
# A6: deterministic dedup
# ---------------------------------------------------------------------------


@_register(
    "dedup_latest_event_per_user",
    """
    SELECT user_id, event_id, event_type FROM (
      SELECT user_id, event_id, event_type,
             row_number() OVER (PARTITION BY user_id ORDER BY ts DESC, event_id ASC) AS rn
      FROM events
    ) WHERE rn = 1
    """,
)
def dedup_latest_event_per_user(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A6: keep-latest-per-key with pinned total order (CC re-crawl rule)."""
    df = agg.dedup_latest(_t(spark, sf_dir, "events"), "user_id", "ts", tiebreak="event_id")
    return df.select("user_id", "event_id", "event_type")


@_register(
    "dedup_exact_texts",
    """
    SELECT min(doc_id) AS first_doc, count(*) AS n_copies
    FROM documents GROUP BY text
    """,
)
def dedup_exact_texts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact dedup by content: hash-groupBy on the text key (scale path:
    group on xxhash64(text) so the shuffle carries 8 bytes, not the doc)."""
    return (
        _t(spark, sf_dir, "documents")
        .groupBy("text")
        .agg(F.min("doc_id").alias("first_doc"), F.count(F.lit(1)).alias("n_copies"))
        .select("first_doc", "n_copies")
    )


# ---------------------------------------------------------------------------
# A9: rollup / cube
# ---------------------------------------------------------------------------


@_register(
    "rollup_lang_source",
    """
    SELECT lang, source, count(*) AS n
    FROM documents GROUP BY ROLLUP (lang, source)
    """,
)
def rollup_lang_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A9: hierarchical subtotals in one pass (expand + hash agg)."""
    return agg.rollup_counts(_t(spark, sf_dir, "documents"), "lang", "source")


# ---------------------------------------------------------------------------
# Window: running totals
# ---------------------------------------------------------------------------


@_register(
    "running_total_per_user",
    """
    SELECT event_id,
           round(sum(value) OVER (PARTITION BY user_id ORDER BY ts, event_id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 2) AS running
    FROM events
    """,
)
def running_total_per_user(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Windowed cumulative volume per user (ops view)."""
    from pyspark.sql import Window

    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    return _t(spark, sf_dir, "events").select(
        "event_id", F.round(F.sum("value").over(w), 2).alias("running")
    )


# ---------------------------------------------------------------------------
# A10: salted aggregation (result == plain groupBy — the oracle proves it)
# ---------------------------------------------------------------------------


@_register(
    "salted_count_by_type",
    """
    SELECT event_type, count(*) AS n FROM events GROUP BY event_type
    """,
)
def salted_count_by_type(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A10: two-phase salted count — identical result to groupBy().count(),
    but a hot key's final reduce reads ≤32 partial rows instead of all."""
    return skew.salted_count(_t(spark, sf_dir, "events"), ["event_type"], salt_from="event_id")


# ---------------------------------------------------------------------------
# P5: each-field-as-message
# ---------------------------------------------------------------------------


@_register(
    "each_field_as_message_counts",
    """
    SELECT key, count(*) AS n, count(DISTINCT value) AS n_values
    FROM (
      SELECT 'event_type' AS key, event_type AS value FROM events
      UNION ALL
      SELECT 'user_id' AS key, CAST(user_id AS VARCHAR) AS value FROM events
    ) GROUP BY key
    """,
)
def each_field_as_message_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P5: explode message fields into (key,value) messages (generator,
    no shuffle until the final count)."""
    kv = parse.each_field_as_message(
        _t(spark, sf_dir, "events"), ["event_type", "user_id"], id_cols=["event_id"]
    )
    return kv.groupBy("key").agg(
        F.count(F.lit(1)).alias("n"), F.countDistinct("value").alias("n_values")
    )


# ---------------------------------------------------------------------------
# TPC-H-shaped general aggregation/join proof
# ---------------------------------------------------------------------------


@_register(
    "tpch_q1_pricing",
    """
    SELECT l_returnflag, l_linestatus,
           round(sum(l_quantity), 2) AS sum_qty,
           round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue,
           count(*) AS n
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
    GROUP BY l_returnflag, l_linestatus
    """,
)
def tpch_q1_pricing(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem").filter(F.col("l_shipdate") <= "1998-09-02 00:00:00")
    return li.groupBy("l_returnflag", "l_linestatus").agg(
        F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
        F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias("revenue"),
        F.count(F.lit(1)).alias("n"),
    )


@_register(
    "top_orders_by_revenue",
    """
    SELECT o.o_orderkey, c.c_mktsegment,
           round(sum(l.l_extendedprice * (1 - l.l_discount)), 2) AS revenue
    FROM customer c JOIN orders o ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    GROUP BY o.o_orderkey, c.c_mktsegment
    ORDER BY revenue DESC, o_orderkey ASC LIMIT 10
    """,
)
def top_orders_by_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders")
    li = _t(spark, sf_dir, "lineitem")
    j = c.join(o, c.c_custkey == o.o_custkey).join(li, li.l_orderkey == o.o_orderkey)
    return (
        j.groupBy("o_orderkey", "c_mktsegment")
        .agg(F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias("revenue"))
        .orderBy(F.desc("revenue"), F.asc("o_orderkey"))
        .limit(10)
    )
