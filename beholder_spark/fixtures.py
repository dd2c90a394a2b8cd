"""Deterministic synthetic fixtures (FIXTURES.md F1-F3, seed=42).

Generates the canonical Common-Crawl-style ``pages`` table
(url, warc_ts, html, text, lang) of BASELINE.json:15, the ``host_lookup``
enrichment dimension, and the ``loglines`` syslog corpus — pure Python +
pyarrow, no external data, byte-reproducible across runs.

The ``text`` column is computed with the SAME pure function
(:func:`beholder_spark.functions.textextract.extract_text`) the engine's
pandas UDF wraps, making the byte-identical-per-url invariant a real
round-trip test of the Spark/Arrow plumbing.
"""

from __future__ import annotations

import datetime as dt
import json
import os
import random

import pyarrow as pa
import pyarrow.parquet as pq

from beholder_spark.functions.textextract import extract_text

SEED = 42

_WORDS = (
    "the a of and to in for on with as by from at is are was were be has "
    "have had will would can could should may might must shall do does did "
    "data page news article report market price stock trade web crawl index "
    "search query result link image video user account login secure server "
    "cloud spark engine pipeline stream batch table column row filter group"
).split()

_DE = "der die das und ist nicht mit für".split()
_FR = "le la les et est pas avec pour".split()
_ES = "el la los y es no con para".split()
_RU = "и в не на что это как по".split()

_LANGS = ["en"] * 60 + ["de"] * 12 + ["fr"] * 10 + ["es"] * 8 + ["ru"] * 6 + ["other"] * 4
_GEOS = ["us", "eu", "apac", "latam", "other"]
_CATS = ["news", "blog", "shop", "docs", "social", "spam"]

_PROGRAMS = ["sshd", "nginx", "cron", "kernel", "systemd", "postfix", "app"]
_MONTHS = ["Jan", "Feb", "Mar", "Apr", "May", "Jun", "Jul", "Aug", "Sep", "Oct", "Nov", "Dec"]


def _hosts(rng: random.Random, n: int = 200) -> list[str]:
    tlds = ["com", "org", "net", "io", "de", "fr"]
    return [f"host{i:03d}.example{rng.choice(tlds)}.{rng.choice(tlds)}" for i in range(n)]


def _zipf_index(rng: random.Random, n: int, s: float = 1.3) -> int:
    # Deterministic Zipf(s) via inverse-CDF over precomputed weights.
    # (kept O(n) per draw at fixture scale; fine for <= a few M rows)
    weights = getattr(_zipf_index, "_w", None)
    if weights is None or len(weights) != n:
        weights = [1.0 / (i + 1) ** s for i in range(n)]
        total = sum(weights)
        acc, cum = [], 0.0
        for w in weights:
            cum += w / total
            acc.append(cum)
        _zipf_index._w = acc  # type: ignore[attr-defined]
        weights = acc
    u = rng.random()
    lo, hi = 0, n - 1
    while lo < hi:
        mid = (lo + hi) // 2
        if weights[mid] < u:
            lo = mid + 1
        else:
            hi = mid
    return lo


def _body_words(rng: random.Random, lang: str, n: int) -> str:
    extra = {"de": _DE, "fr": _FR, "es": _ES, "ru": _RU}.get(lang, [])
    pool = _WORDS + extra * 6 if extra else _WORDS
    return " ".join(rng.choice(pool) for _ in range(n))


def gen_pages(n_rows: int, seed: int = SEED) -> pa.Table:
    """F1 ``pages``: Zipf-skewed hosts, ~1% duplicate urls, edge-case html."""
    rng = random.Random(seed)
    hosts = _hosts(rng)
    base_ts = dt.datetime(2026, 1, 1, 0, 0, 0)
    span = 7 * 24 * 3600

    urls: list[str] = []
    tss: list[dt.datetime] = []
    htmls: list[bytes | None] = []
    texts: list[str | None] = []
    langs: list[str] = []

    for i in range(n_rows):
        host = hosts[_zipf_index(rng, len(hosts))]
        lang = rng.choice(_LANGS)
        ts = base_ts + dt.timedelta(seconds=int(span * i / max(1, n_rows)))
        if rng.random() < 0.005:  # late/out-of-order rows
            ts -= dt.timedelta(hours=rng.randint(1, 48))

        r = rng.random()
        if r < 0.004:
            html: bytes | None = None
        elif r < 0.008:
            html = b""
        elif r < 0.012:  # non-UTF8: latin-1 + truncated multibyte
            # ascii body ("en") — ru words aren't latin-1 encodable
            html = ("<p>caf\xe9 " + _body_words(rng, "en", 5) + "</p>").encode("latin-1") + b"\xe2\x82"
        elif r < 0.016:  # no-body document
            html = b"<html><head><title>t</title></head><body></body></html>"
        else:
            body = _body_words(rng, lang, rng.randint(20, 120))
            title = _body_words(rng, lang, 4)
            html = (
                f"<html><head><title>{title}</title>"
                f"<style>p {{color: red}}</style>"
                f"<script>var x = 1 &lt; 2;</script></head>"
                f"<!-- comment {i} -->"
                f"<body><h1>{title}</h1><p>{body}</p></body></html>"
            ).encode("utf-8")

        if rng.random() < 0.01 and urls:  # duplicate url, different warc_ts
            url = rng.choice(urls)
        else:
            url = f"https://{host}/p/{i:08d}.html"

        urls.append(url)
        tss.append(ts)
        htmls.append(html)
        texts.append(extract_text(html))
        langs.append(lang)

    return pa.table(
        {
            "url": pa.array(urls, pa.string()),
            "warc_ts": pa.array(tss, pa.timestamp("us")),
            "html": pa.array(htmls, pa.binary()),
            "text": pa.array(texts, pa.string()),
            "lang": pa.array(langs, pa.string()),
        }
    )


def gen_host_lookup(seed: int = SEED) -> pa.Table:
    """F2 ``host_lookup``: the F1 host pool minus 5% (left-join NULL tests)."""
    rng = random.Random(seed)
    hosts = _hosts(rng)  # same draw order as gen_pages → same pool
    rng2 = random.Random(seed + 1)
    kept = [h for h in hosts if rng2.random() >= 0.05]
    return pa.table(
        {
            "host": pa.array(kept, pa.string()),
            "geo": pa.array([rng2.choice(_GEOS) for _ in kept], pa.string()),
            "category": pa.array([rng2.choice(_CATS) for _ in kept], pa.string()),
        }
    )


def gen_loglines(n_rows: int, seed: int = SEED) -> pa.Table:
    """F3 ``loglines``: RFC3164/RFC5424/JSON/garbage mix + golden fields."""
    rng = random.Random(seed)
    rows: list[dict] = []
    for i in range(n_rows):
        r = rng.random()
        fac, sev = rng.randint(0, 23), rng.randint(0, 7)
        pri = fac * 8 + sev
        host = f"node{rng.randint(0, 49):02d}"
        prog = rng.choice(_PROGRAMS)
        pid = rng.randint(100, 99999)
        msg = _body_words(rng, "en", rng.randint(3, 12))
        if r < 0.45:  # RFC3164
            mon = _MONTHS[rng.randint(0, 11)]
            day = rng.randint(1, 28)
            hh, mm, ss = rng.randint(0, 23), rng.randint(0, 59), rng.randint(0, 59)
            raw = f"<{pri}>{mon} {day:2d} {hh:02d}:{mm:02d}:{ss:02d} {host} {prog}[{pid}]: {msg}"
            exp = dict(facility=str(fac), severity=str(sev), host=host, program=prog, pid=str(pid), payload=msg)
        elif r < 0.80:  # RFC5424
            ts = f"2026-01-{rng.randint(1, 28):02d}T{rng.randint(0, 23):02d}:{rng.randint(0, 59):02d}:{rng.randint(0, 59):02d}Z"
            msgid = f"ID{rng.randint(1, 999)}"
            raw = f"<{pri}>1 {ts} {host} {prog} {pid} {msgid} - {msg}"
            exp = dict(facility=str(fac), severity=str(sev), host=host, program=prog, pid=str(pid), payload=msg)
        elif r < 0.90:  # JSON object line
            raw = json.dumps({"host": host, "program": prog, "pid": pid, "msg": msg}, sort_keys=True)
            # SPEC P7: unparseable rows keep the raw line as payload
            exp = dict(facility=None, severity=None, host=None, program=None, pid=None, payload=raw)
        else:  # garbage
            raw = "".join(chr(rng.randint(33, 126)) for _ in range(rng.randint(5, 40)))
            exp = dict(facility=None, severity=None, host=None, program=None, pid=None, payload=raw)
        rows.append({"line_id": i, "raw": raw.encode("utf-8"), **{f"expected_{k}": v for k, v in exp.items()}})

    cols = {k: [r[k] for r in rows] for k in rows[0]}
    schema_types = {"line_id": pa.int64(), "raw": pa.binary()}
    return pa.table({k: pa.array(v, schema_types.get(k, pa.string())) for k, v in cols.items()})


def write_fixtures(out_dir: str, n_pages: int = 5000, n_loglines: int = 2000, seed: int = SEED) -> dict[str, str]:
    """Write all fixture tables as parquet; returns name → path."""
    os.makedirs(out_dir, exist_ok=True)
    paths = {}
    for name, table in (
        ("pages", gen_pages(n_pages, seed)),
        ("host_lookup", gen_host_lookup(seed)),
        ("loglines", gen_loglines(n_loglines, seed)),
    ):
        p = os.path.join(out_dir, f"{name}.parquet")
        pq.write_table(table, p)
        paths[name] = p
    return paths
