"""Posting-list codec: delta + varint compression, fixed-size blocks,
block-max metadata for Block-Max WAND (U2 in SURVEY.md §2.10).

The reference has no inverted index (it brute-force scans all docs per
query — src/brain-scorer.ts:168-179); this codec is the scale-path
replacement that makes the same top-k computable at 10^12 docs.

Layout: a posting list for (term) is a sequence of BLOCKS of ≤128
postings. Each block stores:
  first_doc / last_doc : absolute doc-id bounds (skip pointers)
  block_max            : max over the block of the idf-independent
                         BM25 factor  tf_norm = tf*(k1+1) / (tf + k1*(1-b+b*dl/avgdl))
                         — idf is applied query-side from CURRENT
                         global df, so block maxima survive segment
                         merges and df drift unchanged.
  n                    : posting count
  doc_gaps             : varint bytes; first value is the ABSOLUTE
                         first doc id, the rest are deltas. Absolute
                         first ⇒ blocks are independently decodable
                         and block sequences from disjoint sorted
                         doc-id ranges concatenate with no re-encode
                         (this is what makes the salted two-phase
                         build and the k-way merge cheap).
  tfs                  : varint bytes of term frequencies.
  dls                  : varint bytes of per-posting doc lengths —
                         scoring is self-contained per block (no
                         random-access norms lookup inside WAND);
                         ~1-2 bytes/posting, the Lucene-norms analog.

All encode/decode is numpy-vectorized (no per-element Python loops);
this code runs inside applyInPandas/mapInPandas workers.
"""

from __future__ import annotations

from typing import NamedTuple

import numpy as np

BLOCK_SIZE = 128

# varint thresholds: value >= 2^(7k) needs more than k bytes
_THRESHOLDS = [np.uint64(1) << np.uint64(7 * k) for k in range(1, 10)]


def varint_encode(values: np.ndarray) -> bytes:
    """LEB128-encode an array of non-negative ints, vectorized."""
    v = np.ascontiguousarray(values, dtype=np.uint64)
    if v.size == 0:
        return b""
    nbytes = np.ones(v.shape, dtype=np.int64)
    for t in _THRESHOLDS:
        nbytes += v >= t
    total = int(nbytes.sum())
    out = np.zeros(total, dtype=np.uint8)
    pos = np.concatenate(([0], np.cumsum(nbytes)[:-1]))
    for k in range(10):
        mask = nbytes > k
        if not mask.any():
            break
        chunk = (v[mask] >> np.uint64(7 * k)) & np.uint64(0x7F)
        cont = (nbytes[mask] > k + 1).astype(np.uint8) << 7
        out[pos[mask] + k] = chunk.astype(np.uint8) | cont
    return out.tobytes()


def varint_decode(buf: bytes) -> np.ndarray:
    """Decode LEB128 bytes → uint64 array, vectorized."""
    if not buf:
        return np.empty(0, dtype=np.uint64)
    b = np.frombuffer(buf, dtype=np.uint8)
    payload = (b & 0x7F).astype(np.uint64)
    is_end = b < 0x80
    ends = np.nonzero(is_end)[0]
    starts = np.empty_like(ends)
    starts[0] = 0
    starts[1:] = ends[:-1] + 1
    # byte position within its varint
    pos = np.arange(len(b), dtype=np.int64) - np.repeat(starts, ends - starts + 1)
    shifted = payload << (np.uint64(7) * pos.astype(np.uint64))
    return np.add.reduceat(shifted, starts)


def delta_encode(doc_ids: np.ndarray) -> bytes:
    """Sorted absolute doc ids → varint([first, diffs...])."""
    d = np.ascontiguousarray(doc_ids, dtype=np.int64)
    if d.size == 0:
        return b""
    gaps = np.empty_like(d)
    gaps[0] = d[0]
    np.subtract(d[1:], d[:-1], out=gaps[1:])
    return varint_encode(gaps)


def delta_decode(buf: bytes) -> np.ndarray:
    gaps = varint_decode(buf).astype(np.int64)
    return np.cumsum(gaps)


class Block(NamedTuple):
    first_doc: int
    last_doc: int
    block_max: float
    n: int
    doc_gaps: bytes
    tfs: bytes
    dls: bytes


def tf_norm(tfs: np.ndarray, dls: np.ndarray, avgdl: float, k1: float, b: float) -> np.ndarray:
    """idf-independent BM25 factor, vectorized (float64)."""
    tfs = tfs.astype(np.float64)
    return tfs * (k1 + 1.0) / (tfs + k1 * (1.0 - b + b * dls.astype(np.float64) / avgdl))


def encode_blocks(
    doc_ids: np.ndarray,
    tfs: np.ndarray,
    dls: np.ndarray,
    avgdl: float,
    k1: float,
    b: float,
    block_size: int = BLOCK_SIZE,
) -> list[Block]:
    """Sorted-by-doc_id postings (one term) → list of Blocks."""
    n = len(doc_ids)
    if n == 0:
        return []
    norms = tf_norm(tfs, dls, avgdl, k1, b)
    blocks: list[Block] = []
    for s in range(0, n, block_size):
        e = min(s + block_size, n)
        d, t, l = doc_ids[s:e], tfs[s:e], dls[s:e]
        blocks.append(
            Block(
                first_doc=int(d[0]),
                last_doc=int(d[-1]),
                block_max=float(norms[s:e].max()),
                n=e - s,
                doc_gaps=delta_encode(d),
                tfs=varint_encode(t),
                dls=varint_encode(l),
            )
        )
    return blocks


def decode_block(doc_gaps: bytes, tfs: bytes, dls: bytes) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """One block → (doc_ids int64, tfs int64, dls int64)."""
    return (
        delta_decode(doc_gaps),
        varint_decode(tfs).astype(np.int64),
        varint_decode(dls).astype(np.int64),
    )
