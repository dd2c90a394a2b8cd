"""Text analysis for training-data pipelines: language-ID, quality
scoring, token counting, document fingerprinting.

All pure column expressions (codegen'd, zero Python): at 100 TB these run
inside the same whole-stage-codegen projection as the parse stage, so
they add no extra pass over the data. Ratios are integer-division-derived
doubles so the DuckDB oracle reproduces them bit-for-bit.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

# Marker stopwords per language (priority order = tie-break order).
LANG_MARKERS: dict[str, list[str]] = {
    "en": ["the", "a", "of", "and", "to", "in", "is", "are"],
    "de": ["der", "die", "das", "und", "ist", "nicht", "mit", "für"],
    "fr": ["le", "la", "les", "et", "est", "pas", "avec", "pour"],
    "es": ["el", "los", "y", "es", "no", "con", "para"],
    "ru": ["и", "в", "не", "на", "что", "это", "как", "по"],
}

# BPE-ish token regex: letter runs, digit runs, else single non-space char.
TOKEN_REGEX = r"[A-Za-z]+|[0-9]+|[^\sA-Za-z0-9]"

# GPT-2-STYLE pre-tokenizer, SPEC-PINNED to the Java∩RE2 regex subset so
# Spark and the DuckDB oracle count identically: English contractions,
# optionally-space-prefixed letter/digit/punctuation runs, whitespace
# runs. Differences from the published GPT-2 pattern, both pinned by
# SPEC: (1) the `\s+(?!\S)` lookahead is dropped (RE2 has no lookahead),
# so token BOUNDARIES on multi-space runs may differ; (2) whitespace is
# the EXPLICIT class [ \t\n\f\r] — `\s` itself is NOT dialect-identical
# (Java's includes \x0B, RE2's does not), so a bare `\s` would make the
# two engines disagree on vertical-tab text. \x0B therefore counts as
# punctuation on BOTH engines. Leftmost-first alternation on both.
PRETOK_REGEX = r"'(?:s|t|re|ve|m|ll|d)| ?\p{L}+| ?\p{N}+| ?[^ \t\n\f\r\p{L}\p{N}]+|[ \t\n\f\r]+"

# Pinned BPE merge table (priority = list index). A deliberately small,
# frozen vocabulary of common English pairs: the point is the EXACT BPE
# algorithm (iterative highest-priority pair merge, the published
# Sennrich/GPT-2 procedure) behind the same column contract — swapping
# in a production vocabulary's full merge list changes ONLY this table.
BPE_MERGES: list[tuple[str, str]] = [
    ("t", "h"), ("th", "e"), ("i", "n"), ("a", "n"), ("r", "e"),
    ("o", "n"), ("e", "r"), ("an", "d"), ("in", "g"), ("o", "u"),
    ("e", "n"), ("a", "t"), ("e", "s"), ("o", "r"), ("t", "i"),
    ("s", "t"), ("a", "l"), ("o", "f"), ("i", "t"), ("a", "s"),
    ("e", "d"), ("i", "s"), ("o", "w"), ("l", "l"),
]


def _tokens(col: str) -> Column:
    return F.split(F.col(col), " ")


def with_token_stats(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Token counting: whitespace tokens + BPE-ish regex count + the
    spec-pinned GPT-2-style pre-tokenizer count — all codegen'd."""
    toks = _tokens(text_col)
    return (
        df.withColumn("n_tokens", F.size(toks))
        .withColumn("n_bpe_tokens", F.regexp_count(F.col(text_col), F.lit(TOKEN_REGEX)))
        .withColumn("n_pretok_tokens", F.regexp_count(F.col(text_col), F.lit(PRETOK_REGEX)))
        .withColumn("n_chars_text", F.length(F.col(text_col)))
    )


def with_quality(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Quality scoring: stopword ratio + mean token length + bucket.

    Ratios are (int / int) in double — deterministic bits on any engine.
    """
    toks = _tokens(text_col)
    n_tok = F.size(toks)
    stop = LANG_MARKERS["en"]
    n_stop = F.size(F.filter(toks, lambda w: w.isin(stop)))
    n_alpha = F.length(F.regexp_replace(F.col(text_col), " ", ""))
    df = (
        df.withColumn("n_tokens", n_tok)
        .withColumn("stop_ratio", F.round(n_stop / n_tok, 4))
        .withColumn("mean_tok_len", F.round(n_alpha / n_tok, 4))
    )
    return df.withColumn(
        "quality_bucket",
        F.when(F.col("n_tokens") < 30, "short")
        .when(F.col("stop_ratio") > 0.15, "fluent")
        .otherwise("listy"),
    )


def with_lang_id(df: DataFrame, text_col: str = "text", out_col: str = "detected") -> DataFrame:
    """N-gram/marker-word language ID heuristic.

    Scores each language by marker-token hits; winner by fixed priority
    order (en→de→fr→es→ru) on >= comparison; all-zero → 'other'.
    """
    toks = _tokens(text_col)

    def _score(markers: list[str]) -> Column:
        # NB: the lambda must be unary — F.filter passes (element, index)
        # to two-parameter lambdas, so a `m=m` default would bind the index
        return F.size(F.filter(toks, lambda w: w.isin(markers)))

    scores = {lang: _score(m) for lang, m in LANG_MARKERS.items()}
    df = df.withColumn("_toks", toks)
    for lang, sc in scores.items():
        df = df.withColumn(f"_s_{lang}", sc)
    langs = list(LANG_MARKERS)
    total = sum((F.col(f"_s_{la}") for la in langs[1:]), F.col(f"_s_{langs[0]}"))
    expr = F.when(total == 0, F.lit("other"))
    for i, la in enumerate(langs):
        cond = None
        for other in langs:
            if other == la:
                continue
            c = F.col(f"_s_{la}") >= F.col(f"_s_{other}")
            cond = c if cond is None else (cond & c)
        expr = expr.when(cond, F.lit(la))
    df = df.withColumn(out_col, expr)
    return df.drop("_toks", *[f"_s_{la}" for la in langs])


# Literal-character ranges (not \uXXXX escapes) so the SAME pattern text
# parses identically in Java (Spark) and RE2 (DuckDB) regex dialects.
SCRIPT_RES = {
    "latin": "[A-Za-z]",
    "cjk": "[一-龥]",
    "cyrillic": "[а-яА-ЯёЁ]",
    "digit": "[0-9]",
}


def with_script_profile(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Unicode-script character profile + dominant script per document —
    the mixed-script / wrong-lang-tag signal a multilingual crawl
    pipeline screens on (a 'de'-tagged page that is 80 % CJK is
    mislabeled; heavy digit share marks tables/serial dumps).

    Adds ``n_<script>`` counts and ``dominant_script`` (ties break by the
    fixed latin→cjk→cyrillic→digit order on >=). Pure column expressions,
    zero shuffle; patterns shared verbatim with the oracle.
    """
    for name, pat in SCRIPT_RES.items():
        df = df.withColumn(f"n_{name}", F.regexp_count(F.col(text_col), F.lit(pat)))
    names = list(SCRIPT_RES)
    expr = None
    for name in reversed(names):
        cond = None
        for other in names:
            if other == name:
                continue
            c = F.col(f"n_{name}") >= F.col(f"n_{other}")
            cond = c if cond is None else (cond & c)
        expr = F.when(cond, F.lit(name)) if expr is None else F.when(cond, F.lit(name)).otherwise(expr)
    return df.withColumn("dominant_script", expr)


def with_bpe_tokens(df: DataFrame, text_col: str = "text", out_col: str = "n_bpe_exact") -> DataFrame:
    """EXACT BPE token count over the pinned :data:`BPE_MERGES` table:
    pre-tokenize JVM-side with :data:`PRETOK_REGEX` (codegen, and the
    identical pattern the counting contract pins), then run the real
    iterative merge loop per pre-token in an Arrow pandas UDF.

    Non-SQL-expressible (the merge loop is iterative-until-fixpoint), so
    correctness is pytest-golden (hand-computed merges) rather than
    DuckDB-oracled. At 100 TB this is one Arrow UDF stage fused after
    the scan — the same cost shape as parse_syslog; per-pretoken work is
    bounded by token length, not document length."""
    pretoks = F.regexp_extract_all(F.col(text_col), F.lit(PRETOK_REGEX), 0)
    return df.withColumn(out_col, _bpe_count_udf(pretoks))


def _bpe_count_one(toks, ranks: dict) -> int | None:
    if toks is None:
        return None
    total = 0
    for tok in toks:
        syms = list(tok)
        while len(syms) > 1:
            best_pair, best_rank = None, None
            for j in range(len(syms) - 1):
                r = ranks.get((syms[j], syms[j + 1]))
                if r is not None and (best_rank is None or r < best_rank):
                    best_pair, best_rank = (syms[j], syms[j + 1]), r
            if best_pair is None:
                break
            merged, j = [], 0
            while j < len(syms):
                if j < len(syms) - 1 and (syms[j], syms[j + 1]) == best_pair:
                    merged.append(syms[j] + syms[j + 1])
                    j += 2
                else:
                    merged.append(syms[j])
                    j += 1
            syms = merged
        total += len(syms)
    return total


_BPE_RANKS = {pair: i for i, pair in enumerate(BPE_MERGES)}


# NB: a TYPE OBJECT, not a DDL string — DDL parsing needs a live session,
# which the executor's Python worker (re-importing this module) lacks
@F.pandas_udf(T.IntegerType())
def _bpe_count_udf(pretoks: pd.Series) -> pd.Series:
    return pd.Series([_bpe_count_one(t, _BPE_RANKS) for t in pretoks], dtype="Int32")


def token_df(df: DataFrame, id_col: str, text_col: str = "text") -> DataFrame:
    """The corpus token→document-frequency table (tok, tok_df): ONE
    distinct-(doc,token) shuffle. Persist/write this once and feed it to
    every :func:`rare_token_stats` variant (different thresholds, doc
    subsets) instead of re-aggregating the corpus per query — at 100 TB
    the df table is the expensive pass and it is threshold-independent."""
    toks = df.select(
        F.col(id_col), F.explode(F.array_distinct(F.split(F.col(text_col), " "))).alias("tok")
    )
    return toks.groupBy("tok").agg(F.countDistinct(id_col).alias("tok_df"))


def rare_token_stats(
    df: DataFrame,
    id_col: str,
    text_col: str = "text",
    max_doc_freq: int = 2,
    freq: DataFrame | None = None,
) -> DataFrame:
    """Rare-token (OOV-ish) quality signal: per document, how many of its
    DISTINCT tokens appear in ≤ ``max_doc_freq`` documents corpus-wide —
    high ratios mark gibberish, codes/serials, and OCR damage; nearly-zero
    ratios mark template text. The corpus-relative twin of the
    document-local repetition stats.

    Two-pass shape: token→document-frequency aggregate (shuffles distinct
    (doc, token) pairs once), then a frequency join back on the token and
    one per-doc count — all integer arithmetic, no float accumulation
    order to disagree on, so the oracle matches exactly. At 100 TB both
    passes key on the token string; the df table is Zipf-skewed but the
    join is equi-keyed, so AQE skew splitting applies.
    """
    toks = df.select(
        F.col(id_col), F.explode(F.array_distinct(F.split(F.col(text_col), " "))).alias("tok")
    )
    if freq is None:
        freq = token_df(df, id_col, text_col)
    marked = toks.join(freq, "tok")
    return marked.groupBy(id_col).agg(
        F.count(F.lit(1)).alias("n_distinct_tokens"),
        F.sum(F.when(F.col("tok_df") <= max_doc_freq, 1).otherwise(0)).alias("n_rare"),
        F.round(
            F.sum(F.when(F.col("tok_df") <= max_doc_freq, 1).otherwise(0))
            / F.count(F.lit(1)),
            4,
        ).alias("rare_ratio"),
    )


def with_fingerprint(df: DataFrame, text_col: str = "text", out_col: str = "fingerprint") -> DataFrame:
    """Content fingerprint: md5 of whitespace-normalized lowercase text.

    The cheap exact-dup key: dedup shuffles 32 hex bytes per row instead
    of the document body.
    """
    norm = F.lower(F.regexp_replace(F.trim(F.col(text_col)), r"\s+", " "))
    return df.withColumn(out_col, F.md5(norm))


def with_winnow_fingerprints(
    df: DataFrame,
    text_col: str = "text",
    k: int = 3,
    window: int = 4,
    out_col: str = "winnow",
) -> DataFrame:
    """Rolling-hash document fingerprinting (MOSS winnowing): hash every
    k-word gram, slide a window of `window` consecutive gram hashes, keep
    each window's minimum, dedupe — the classic partial-overlap detector
    (robust to insertions, unlike the whole-document fingerprint).

    Pure column expressions: `transform(sequence(...))` builds gram hashes
    and window minima JVM-side — no shuffle, no Python, array memory
    bounded by doc length. Hashes are md5 (lexicographic min over hex
    strings) so the DuckDB oracle reproduces every selected fingerprint.
    """
    toks = _tokens(text_col)
    n_grams = F.size(toks) - (k - 1)
    gram_idx = F.when(n_grams >= 1, F.sequence(F.lit(1), n_grams)).otherwise(
        F.array().cast("array<int>")
    )
    grams = F.transform(gram_idx, lambda i: F.md5(F.array_join(F.slice(toks, i, k), " ")))
    n_wins = F.size(grams) - (window - 1)
    win_idx = F.when(n_wins >= 1, F.sequence(F.lit(1), n_wins)).otherwise(
        F.array().cast("array<int>")
    )
    mins = F.transform(win_idx, lambda i: F.array_min(F.slice(grams, i, window)))
    return df.withColumn(out_col, F.array_distinct(mins))
