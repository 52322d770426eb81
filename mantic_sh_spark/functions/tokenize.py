"""Tokenization / normalization — the T1/T2/T3 stage of SURVEY.md §2.3.

The reference normalizes CamelCase → spaced, collapses separators,
lowercases, then splits (reference behavior: src/brain-scorer.ts:145-161,
src/intent-analyzer.ts:139-174). The critical invariant carried over:
the SAME tokenizer is applied to documents at index time and to queries
at search time, and it is deterministic (byte-identical inputs →
identical token streams).

Three synchronized implementations of ONE tokenizer:
  * pure Python (`tokenize`)         — query side (driver), oracle scorer
  * Spark Column expression builder  — JVM-side, whole-stage-codegen'd,
    used in the hot index-build path (`tokens_col`)
  * ANSI-SQL fragment (`TOKENIZE_SQL`) — DuckDB oracle equivalence

All three MUST stay in lock-step; tests/test_tokenize.py asserts
pairwise equality on random strings.
"""

from __future__ import annotations

import re

from pyspark.sql import Column
from pyspark.sql import functions as F

# CamelCase boundary: lower/digit followed by upper (reference analog:
# src/brain-scorer.ts:146  .replace(/([a-z])([A-Z])/g, '$1 $2'))
_CAMEL_RE = re.compile(r"([a-z0-9])([A-Z])")
# Token alphabet after lowering: ASCII alnum runs. ONE spelling shared
# by the pure-Python matcher, the Spark count form (token_count_col),
# and (complemented) the split form — a fourth independent copy of the
# alphabet is how the lock-step invariant dies.
TOKEN_PATTERN = r"[a-z0-9]+"
_TOKEN_RE = re.compile(TOKEN_PATTERN)

# Spark-side equivalents (kept as raw pattern strings so the JVM regex
# engine sees exactly the same patterns)
CAMEL_PATTERN = r"([a-z0-9])([A-Z])"
SPLIT_PATTERN = r"[^a-z0-9]+"


def normalize(s: str) -> str:
    """CamelCase → spaced, then lowercase. Order matters (normalize
    before lowercase, mirroring reference src/brain-scorer.ts:160-161)."""
    return _CAMEL_RE.sub(r"\1 \2", s).lower()


def tokenize(s: str) -> list[str]:
    """Full tokenizer: normalize then split to alnum runs."""
    return _TOKEN_RE.findall(normalize(s))


def tokenize_query(q: str) -> list[str]:
    """Query-side tokenizer (T2): same core tokenizer; dedup preserving
    order (reference: src/intent-analyzer.ts:173)."""
    seen: set[str] = set()
    out: list[str] = []
    for t in tokenize(q):
        if t not in seen:
            seen.add(t)
            out.append(t)
    return out


def tokens_col(text: Column | str, camel: bool = True) -> Column:
    """Spark Column: array<string> of tokens. Pure Catalyst built-ins
    (regexp_replace / lower / split / filter) — stays inside
    whole-stage codegen, no Python in the index-build hot path."""
    c = F.col(text) if isinstance(text, str) else text
    if camel:
        c = F.regexp_replace(c, CAMEL_PATTERN, r"$1 $2")
    return F.filter(F.split(F.lower(c), SPLIT_PATTERN), lambda t: t != F.lit(""))


def token_count_col(text: Column | str, camel: bool = True) -> Column:
    """Spark Column: token COUNT — exactly `size(tokens_col(text))`
    without materializing the token-string array. doc_len is all the
    docs stage needs, and building the array just to take its size
    dominated that stage's allocation/GC (measured: the array form's
    tokenize scaled 0.47 across separate executor JVMs vs ~1.0
    in-thread — GC-bound on the shared memory bus;
    bench_runs/r4_docs_stage_decomp.json). regexp_count of the token
    alphabet over the SAME normalized string counts the non-empty
    split runs by construction; lock-step with tokenize()/tokens_col
    is enforced by tests/test_tokenize.py."""
    c = F.col(text) if isinstance(text, str) else text
    if camel:
        c = F.regexp_replace(c, CAMEL_PATTERN, r"$1 $2")
    return F.regexp_count(F.lower(c), F.lit(TOKEN_PATTERN))


# DuckDB fragment producing the identical token array for a column
# expression {col}. (Documents in the oracle tables are already
# lowercase so the camel step is the identity there; the Spark side
# applies the same lower+split.)
TOKENIZE_SQL = "list_filter(string_split_regex(lower({col}), '[^a-z0-9]+'), t -> t <> '')"
