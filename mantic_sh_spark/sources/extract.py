"""HTML → text extraction (U1 in SURVEY.md §2.10).

The reference reads document content directly (src/smart-filter.ts:670-672,
src/cache.ts:266); in the webtext rebuild the raw page is an `html`
BINARY column and extraction is a PINNED, versioned, pure-pandas
function — the `input_hint` invariant is byte-identical extracted text
per url, guarded by golden sha256 hashes (tests/golden/extract_hashes.json).

EXTRACTION SPEC v1 (frozen — bump EXTRACT_VERSION on any change):
  1. decode bytes as UTF-8 (errors='replace')
  2. drop <script>…</script> and <style>…</style> blocks (case-insensitive,
     dot-matches-newline)
  3. drop everything outside <body>…</body> if a body tag exists
  4. replace every remaining tag <...> with a single space
  5. decode the fixed entity table below (&amp; decoded LAST so
     double-escaped entities stay escaped — single deterministic pass
     semantics)
  6. collapse all whitespace runs to one space; strip ends

Only pandas .str vectorized ops — no per-row Python in the Spark path.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame

EXTRACT_VERSION = 1

# Step-5 entity table, applied in THIS order (&amp; last).
ENTITY_TABLE: list[tuple[str, str]] = [
    ("&lt;", "<"),
    ("&gt;", ">"),
    ("&quot;", '"'),
    ("&#x27;", "'"),
    ("&#39;", "'"),
    ("&#32;", " "),
    ("&nbsp;", " "),
    ("&amp;", "&"),
]

_SCRIPT_STYLE_RE = r"(?is)<(script|style)\b[^>]*>.*?</\1\s*>"
_BODY_RE = r"(?is).*?<body\b[^>]*>(.*?)</body\s*>.*"
_TAG_RE = r"(?s)<[^>]*>"
_WS_RE = r"\s+"


def extract_series(html: pd.Series) -> pd.Series:
    """Vectorized extraction over a Series of bytes (or str)."""
    s = html.map(lambda b: b.decode("utf-8", "replace") if isinstance(b, (bytes, bytearray)) else b).astype("string")
    s = s.str.replace(_SCRIPT_STYLE_RE, " ", regex=True)
    has_body = s.str.contains(r"(?is)<body\b", regex=True).fillna(False)
    body = s.str.replace(_BODY_RE, r"\1", regex=True)
    s = body.where(has_body, s)
    s = s.str.replace(_TAG_RE, " ", regex=True)
    for ent, ch in ENTITY_TABLE:
        s = s.str.replace(ent, ch, regex=False)
    s = s.str.replace(_WS_RE, " ", regex=True).str.strip()
    return s.astype(object)


def extract_text(html: bytes | str) -> str:
    """Single-value convenience wrapper (tests, driver-side)."""
    return extract_series(pd.Series([html]))[0]


def extract_pages(pages: DataFrame) -> DataFrame:
    """pages(url, warc_ts, html, …) → adds/overwrites `text` from `html`
    via mapInPandas (Arrow-batched; one Python worker per partition)."""
    out_schema = ", ".join(f"{f.name} {f.dataType.simpleString()}" for f in pages.schema.fields)

    cols = [f.name for f in pages.schema.fields]

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            pdf = pdf.copy()
            pdf["text"] = extract_series(pdf["html"])
            yield pdf[cols]

    return pages.mapInPandas(fn, schema=out_schema)
