"""Deterministic synthetic `pages` corpus + query set (FIXTURES.md F1/F2).

Shape is exactly the BASELINE.json `input_hint` table:
    (url:string, warc_ts:timestamp, html:binary, text:string, lang:string)

Properties (north rule / FIXTURES.md):
  * fully deterministic given (seed, n_docs, vocab_size): per-row RNG is
    keyed on [seed, doc index] so output is independent of partitioning,
    task order, and parallelism level — required for the resume test
    and the two-parallelism-level scaling harness.
  * Zipfian token stream (s≈1.07) → guaranteed head-term skew (rank-1
    term present in >30% of docs) so the salted build path is exercised.
  * a synthetic stop term present in ~90% of docs.
  * planted rare "needle" terms (one doc each) for exact-hit tests.
  * html wraps the text with escaped entities, tags, and script/style
    noise such that extract.extract_series(html) == text byte-for-byte.

The reference's corpus enumeration (git/fd/glob, src/native-loader.ts:39-77)
is replaced by catalog-driven table scans; this module stands in for the
crawler that would populate the Iceberg `pages` table.
"""

from __future__ import annotations

import html as _html
from collections.abc import Iterator
from dataclasses import dataclass

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession

PAGES_SCHEMA = "url string, warc_ts timestamp, html binary, text string, lang string"

_LANGS = np.array(["en", "de", "fr", "es", "other"])
_LANG_P = np.array([0.85, 0.05, 0.04, 0.04, 0.02])

_BASE_TS = np.datetime64("2026-01-01T00:00:00", "us")


@dataclass(frozen=True)
class SynthConfig:
    n_docs: int = 1000
    vocab_size: int = 5000
    seed: int = 42
    n_sites: int = 20
    zipf_s: float = 1.07
    len_mu: float = 4.6  # lognormal → mean ~120 tokens
    len_sigma: float = 0.6
    needle_every: int = 97  # every k-th doc gets a unique needle term
    stop_term: str = "zzstopterm"
    stop_p: float = 0.9


def vocab_word(i: np.ndarray | int) -> np.ndarray | str:
    """Deterministic pseudo-word for vocab id i (alnum, lowercase)."""
    if np.isscalar(i):
        return f"w{i:d}x"
    return np.char.add(np.char.add("w", np.asarray(i).astype(str)), "x")


def _zipf_cdf(vocab_size: int, s: float) -> np.ndarray:
    p = 1.0 / np.power(np.arange(1, vocab_size + 1, dtype=np.float64), s)
    p /= p.sum()
    return np.cumsum(p)


def make_batch(ids: np.ndarray, cfg: SynthConfig) -> pd.DataFrame:
    """Generate page rows for the given doc indexes (pure; testable)."""
    cdf = _zipf_cdf(cfg.vocab_size, cfg.zipf_s)
    rows = []
    for i in ids.tolist():
        rng = np.random.default_rng([cfg.seed, i])
        dl = max(5, int(rng.lognormal(cfg.len_mu, cfg.len_sigma)))
        tok_ids = np.searchsorted(cdf, rng.random(dl), side="right")
        toks = list(vocab_word(tok_ids))
        if rng.random() < cfg.stop_p:
            toks.append(cfg.stop_term)
        if cfg.needle_every and i % cfg.needle_every == 0:
            toks.append(f"zzneedle{i}")
        text = " ".join(toks)
        lang = str(rng.choice(_LANGS, p=_LANG_P))
        ts = _BASE_TS + np.timedelta64(int(rng.integers(0, 180 * 86400 * 10**6)), "us")
        url = f"https://site{i % cfg.n_sites}.example/{lang}/doc-{i:012d}"
        rows.append((url, ts.astype("datetime64[us]"), _render_html(text, url, rng), text, lang))
    pdf = pd.DataFrame(rows, columns=["url", "warc_ts", "html", "text", "lang"])
    pdf["warc_ts"] = pd.to_datetime(pdf["warc_ts"])
    return pdf


def _render_html(text: str, url: str, rng: np.random.Generator) -> bytes:
    """Wrap text into HTML such that extraction recovers it exactly.

    Exercises: tag stripping (<p>, <b> around whole tokens), entity
    decode (&#32; between some tokens, html.escape of the payload),
    script/style removal (noise blocks inside body), body isolation
    (head boilerplate must not leak into extracted text).
    """
    toks = text.split(" ")
    paras = []
    for s in range(0, len(toks), 30):
        chunk = toks[s : s + 30]
        parts = []
        for j, t in enumerate(chunk):
            esc = _html.escape(t)
            if (s + j) % 17 == 0:
                esc = f"<b>{esc}</b>"
            parts.append(esc)
        # join a few boundaries with an entity-encoded space
        sep_joined = ""
        for j, p in enumerate(parts):
            if j:
                sep_joined += "&#32;" if (s + j) % 23 == 0 else " "
            sep_joined += p
        paras.append(f"<p class=\"c{s}\">{sep_joined}</p>")
    noise = f"<script type=\"text/javascript\">var u='{url}';tracker(u);</script>"
    style = "<style>body{margin:0;font-family:serif}</style>"
    title = _html.escape(" ".join(toks[:5]))
    doc = (
        "<!DOCTYPE html><html><head>"
        f"<meta charset=\"utf-8\"><title>{title}</title>{style}"
        "</head><body>"
        f"{noise}<div id=\"main\">" + "\n".join(paras) + "</div>"
        f"<style>.x{{color:red}}</style>"
        "</body></html>"
    )
    return doc.encode("utf-8")


def gen_pages(spark: SparkSession, cfg: SynthConfig, partitions: int = 8) -> DataFrame:
    """Distributed deterministic generation: spark.range → mapInPandas."""
    base = spark.range(0, cfg.n_docs, 1, partitions)

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if len(pdf):
                yield make_batch(pdf["id"].to_numpy(), cfg)

    return base.mapInPandas(fn, schema=PAGES_SCHEMA)


def gen_queries(cfg: SynthConfig, n_queries: int = 50) -> list[tuple[int, str]]:
    """Reference query set (F2): head/mid/needle single terms, multi-term
    combos, CamelCase variants (normalization check), absent terms."""
    rng = np.random.default_rng([cfg.seed, 10**9])
    out: list[tuple[int, str]] = []
    for qid in range(n_queries):
        kind = qid % 6
        if kind == 0:  # head term
            out.append((qid, vocab_word(int(rng.integers(0, 5)))))
        elif kind == 1:  # mid term
            lo = min(50, max(1, cfg.vocab_size // 2))
            hi = max(lo + 1, min(500, cfg.vocab_size))
            out.append((qid, vocab_word(int(rng.integers(lo, hi)))))
        elif kind == 2:  # needle
            i = int(rng.integers(0, max(1, cfg.n_docs // cfg.needle_every))) * cfg.needle_every
            out.append((qid, f"zzneedle{i}"))
        elif kind == 3:  # multi-term
            ids = rng.integers(0, max(2, min(2000, cfg.vocab_size)), size=int(rng.integers(2, 5)))
            out.append((qid, " ".join(vocab_word(int(t)) for t in ids)))
        elif kind == 4:  # CamelCase variant of a real term pair → must normalize
            a = vocab_word(int(rng.integers(0, 100)))
            b = vocab_word(int(rng.integers(0, 100)))
            out.append((qid, a + b.capitalize()))
        else:  # absent term
            out.append((qid, f"qqabsent{qid}"))
    return out
