"""Deterministic HTML → text extraction (the byte-identical invariant).

BASELINE.json:15 mandates "byte-identical extracted text per url". Since
the reference checkout is empty (SURVEY.md §0), WE pin the extraction
algorithm; the fixture generator (:mod:`beholder_spark.fixtures`) computes
the golden ``text`` column with the same pure function, and the pipeline's
Arrow/pandas UDF must reproduce it byte-for-byte through the Spark → Arrow
→ pandas → Arrow round-trip at any batch size or partitioning.

SPEC extract_text(html: bytes | None) -> str | None:
  1. None input → None.  Empty bytes → "".
  2. Decode as UTF-8 with errors="replace" (U+FFFD for invalid sequences;
     latin-1 bytes and truncated multibyte sequences are thereby handled
     deterministically).
  3. Drop <script>...</script> and <style>...</style> blocks including
     their content (case-insensitive, non-greedy, dot-matches-newline).
  4. Drop HTML comments <!-- ... -->.
  5. Replace every remaining tag <...> with a single space.
  6. Unescape exactly the five XML entities: &lt; &gt; &amp; &quot; &#39;
     (in this order of replacement: lt, gt, quot, #39, amp last so that
     "&amp;lt;" → "&lt;" and not "<").
  7. Collapse all runs of Unicode whitespace to a single ASCII space and
     strip leading/trailing whitespace.

Everything here is pure-Python + ``re`` over ``str``; no locale, no
platform dependence → deterministic across pandas/pyarrow versions.
"""

from __future__ import annotations

import re

_SCRIPT_RE = re.compile(r"<script\b.*?</script\s*>", re.IGNORECASE | re.DOTALL)
_STYLE_RE = re.compile(r"<style\b.*?</style\s*>", re.IGNORECASE | re.DOTALL)
_COMMENT_RE = re.compile(r"<!--.*?-->", re.DOTALL)
_TAG_RE = re.compile(r"<[^>]*>")
_WS_RE = re.compile(r"\s+", re.UNICODE)


def extract_text(html: bytes | None) -> str | None:
    """Pure-function reference implementation of the extraction SPEC."""
    if html is None:
        return None
    if len(html) == 0:
        return ""
    s = html.decode("utf-8", errors="replace")
    s = _SCRIPT_RE.sub(" ", s)
    s = _STYLE_RE.sub(" ", s)
    s = _COMMENT_RE.sub(" ", s)
    s = _TAG_RE.sub(" ", s)
    s = (
        s.replace("&lt;", "<")
        .replace("&gt;", ">")
        .replace("&quot;", '"')
        .replace("&#39;", "'")
        .replace("&amp;", "&")
    )
    s = _WS_RE.sub(" ", s).strip()
    return s
