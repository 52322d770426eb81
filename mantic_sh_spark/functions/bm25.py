"""BM25 parameters + a pure-Python/pandas oracle scorer.

The reference scores with an additive per-term function plus doc
priors (src/brain-scorer.ts:219-431); per the north rule the rebuild
swaps that for textbook BM25 while keeping the pipeline shape
(per-term partials → per-doc sum → global top-k with a deterministic
tie-break, mirroring src/brain-scorer.ts:181-188).

idf is the Lucene-style non-negative variant:
    idf(t) = ln( (N - df + 0.5) / (df + 0.5) + 1 )

The oracle scorer here is the rank-identity ground truth for tests —
brute force over every document, the same scan-everything semantics
the reference itself uses (src/brain-scorer.ts:168-179).
"""

from __future__ import annotations

import math
from dataclasses import dataclass

from .tokenize import tokenize, tokenize_query

K1 = 1.2
B = 0.75


@dataclass(frozen=True)
class BM25Params:
    k1: float = K1
    b: float = B


def idf(n_docs: int, df: int) -> float:
    return math.log((n_docs - df + 0.5) / (df + 0.5) + 1.0)


def score_term(tf: int, dl: int, avgdl: float, n_docs: int, df: int, p: BM25Params = BM25Params()) -> float:
    return idf(n_docs, df) * tf * (p.k1 + 1.0) / (tf + p.k1 * (1.0 - p.b + p.b * dl / avgdl))


def oracle_topk(
    docs: list[tuple[int, str]],
    query: str,
    k: int = 10,
    p: BM25Params = BM25Params(),
) -> list[tuple[int, float]]:
    """Exhaustive BM25 top-k over (doc_id, text) pairs.

    Deterministic: terms accumulated in sorted order (fp-sum order is
    fixed), tie-break (score desc, doc_id asc). Returns
    [(doc_id, score)] — the golden answer for rank-identity tests.
    """
    toks = {d: tokenize(t) for d, t in docs}
    n_docs = len(docs)
    if n_docs == 0:
        return []
    avgdl = sum(len(v) for v in toks.values()) / n_docs
    q_terms = sorted(tokenize_query(query))
    df = {t: sum(1 for v in toks.values() if t in set(v)) for t in q_terms}
    scores: dict[int, float] = {}
    for term in q_terms:
        if df[term] == 0:
            continue
        for d, v in toks.items():
            tf = v.count(term)
            if tf:
                scores[d] = scores.get(d, 0.0) + score_term(tf, len(v), avgdl, n_docs, df[term], p)
    # rank on scores rounded to 4 decimals — the engine-wide convention
    # (fp-sum order is partition-dependent in Spark; rounding makes the
    # cross-engine rank comparison deterministic), tie-break doc_id asc
    ranked = sorted(((d, round(s, 4)) for d, s in scores.items()), key=lambda kv: (-kv[1], kv[0]))
    return ranked[:k]
