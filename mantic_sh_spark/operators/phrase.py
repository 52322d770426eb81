"""Exact-phrase top-k over a POSITIONAL index (R3/R5/U6 in SURVEY.md:
the reference's in-order path-sequence matching and `references`
positional lookups, src/brain-scorer.ts:286-360, src/code-intel.ts:337-383
— here as real positional postings).

Per segment (applyInPandas, like WAND): decode each phrase term's
postings + positions, intersect doc sets term-by-term (smallest list
first), then verify adjacency vectorized — a doc matches where
P_0 ∩ (P_1 − 1) ∩ … ∩ (P_m − m) is non-empty; the intersection size is
the phrase term-frequency. Results rank by (n_matches desc, doc_id asc)
with the usual deterministic per-query window merge.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..functions.codec import decode_block, decode_positions
from ..functions.tokenize import tokenize
from ..sources.catalog import IndexPaths


def _term_postings(pdf: pd.DataFrame) -> tuple[np.ndarray, list[np.ndarray]]:
    """All blocks of one (term, segment) → (doc_ids, per-doc position
    arrays), concatenated in doc order."""
    pdf = pdf.sort_values("first_doc")
    docs_all: list[np.ndarray] = []
    pos_all: list[np.ndarray] = []
    for gaps, tfs, dls, posb in zip(pdf["doc_gaps"], pdf["tfs"], pdf["dls"], pdf["positions"]):
        d, tf, _ = decode_block(gaps, tfs, dls)
        flat, off = decode_positions(posb, tf)
        docs_all.append(d)
        pos_all.extend(flat[off[j] : off[j + 1]] for j in range(len(d)))
    return (np.concatenate(docs_all) if docs_all else np.empty(0, dtype=np.int64)), pos_all


def _match_count(pos_lists: list[np.ndarray], slop: int) -> int:
    """Number of valid in-order matches: for each start p0 ∈ P_0, greedily
    take the smallest p_i ∈ P_i with p_i > p_{i-1}; valid when the total
    stretch (p_m − p0 − m) ≤ slop. Greedy-smallest minimizes the stretch,
    so this is exact. Vectorized over all starts at once. slop=0 is the
    exact-adjacency phrase."""
    p0 = pos_lists[0]
    prev = p0
    valid = np.ones(len(p0), dtype=bool)
    for pi in pos_lists[1:]:
        idx = np.searchsorted(pi, prev + 1)
        valid &= idx < len(pi)
        prev = pi[np.minimum(idx, len(pi) - 1)]
    m = len(pos_lists) - 1
    valid &= (prev - p0 - m) <= slop
    return int(valid.sum())


def segment_phrase_matches(by_term: dict[str, pd.DataFrame], terms: list[str],
                           dead: np.ndarray | None = None,
                           slop: int = 0) -> list[tuple[int, int]]:
    """One (segment, phrase) evaluation → [(doc_id, n_matches)].
    Shared by the distributed UDF and the serving reader (the same
    sharing discipline as wand.segment_topk)."""
    if not terms or any(t not in by_term for t in terms):
        return []
    decoded = {t: _term_postings(by_term[t]) for t in set(terms)}
    # candidate docs: intersect doc sets, smallest first
    doc_sets = [decoded[t][0] for t in terms]
    cand = doc_sets[0]
    for ds in sorted(doc_sets[1:], key=len):
        cand = np.intersect1d(cand, ds, assume_unique=True)
        if not len(cand):
            break
    if dead is not None and len(dead) and len(cand):
        pos_in_dead = np.searchsorted(dead, cand)
        hit = (pos_in_dead < len(dead)) & (
            dead[np.minimum(pos_in_dead, len(dead) - 1)] == cand
        )
        cand = cand[~hit]
    out: list[tuple[int, int]] = []
    for doc in cand.tolist():
        pos_lists = []
        for t in terms:
            docs_t, pos_t = decoded[t]
            j = int(np.searchsorted(docs_t, doc))
            pos_lists.append(pos_t[j])
        n = _match_count(pos_lists, slop)
        if n:
            out.append((doc, n))
    return out


def _phrase_udf(queries: dict[int, list[str]], dead: np.ndarray | None = None,
                slop: int = 0, tid2term: dict[int, str] | None = None):
    def run(pdf: pd.DataFrame) -> pd.DataFrame:
        by_term = {tid2term[int(t)]: g for t, g in pdf.groupby("tid")}
        out_q, out_d, out_n = [], [], []
        for qid, terms in queries.items():
            for doc, n in segment_phrase_matches(by_term, terms, dead, slop):
                out_q.append(qid)
                out_d.append(doc)
                out_n.append(n)
        return pd.DataFrame(
            {
                "query_id": pd.array(out_q, dtype="int32"),
                "doc_id": pd.array(out_d, dtype="int64"),
                "n_matches": pd.array(out_n, dtype="int64"),
            }
        )

    return run


def phrase_topk(
    spark: SparkSession,
    index_dir: str,
    phrases: list[tuple[int, str]],
    k: int = 10,
    slop: int = 0,
) -> DataFrame:
    """(query_id, doc_id, n_matches, rank): docs containing each phrase,
    ranked by occurrence count (desc) then doc_id. slop=0 → exact
    adjacency; slop=N allows the in-order match to stretch by up to N
    extra tokens (proximity search). Requires store_positions=True."""
    paths = IndexPaths(index_dir)
    # ordered, NON-deduplicated tokens — phrase semantics need repeats
    q_map = {int(qid): tokenize(q) for qid, q in phrases}
    all_terms = sorted({t for ts in q_map.values() for t in ts})
    if not all_terms:
        return spark.createDataFrame([], "query_id int, doc_id long, n_matches long, rank int")

    from .wand import _index_meta, _term_meta

    _n, _a, _bf, dead = _index_meta(spark, paths)
    # resolve term → tid via the terms directory (posting rows carry
    # only the dictionary-encoded key); absent terms simply contribute
    # no postings — the per-segment kernel already requires every
    # phrase term present in a segment before verifying
    meta = _term_meta(spark, paths, all_terms)
    tid2term = {m[1]: t for t, m in meta.items() if m[0] > 0}
    if not tid2term:
        return spark.createDataFrame([], "query_id int, doc_id long, n_matches long, rank int")
    blocks = spark.read.parquet(paths.postings).filter(F.col("tid").isin(list(tid2term)))
    if "positions" not in blocks.columns:
        raise ValueError("phrase_topk requires an index built with store_positions=True")
    per_seg = blocks.groupBy("segment_id").applyInPandas(
        _phrase_udf(q_map, dead if len(dead) else None, slop, tid2term=tid2term),
        schema="query_id int, doc_id long, n_matches long",
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("n_matches"), F.asc("doc_id"))
    return (
        per_seg.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "doc_id", "n_matches", "rank")
    )
