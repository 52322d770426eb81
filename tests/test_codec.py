"""Codec properties (FIXTURES.md F4): round-trip over seeded random
doc-id sets (sizes 1..10000, gaps up to 2^40), block_max soundness."""

import numpy as np
import pytest

from mantic_sh_spark.functions import codec
from mantic_sh_spark.functions.bm25 import B, K1


@pytest.mark.parametrize("n,hi", [(0, 10), (1, 10), (7, 100), (128, 10**6), (129, 10**6), (5000, 2**40), (10000, 2**40)])
def test_delta_roundtrip(n, hi):
    rng = np.random.default_rng(n + hi)
    docs = np.sort(rng.choice(hi, size=n, replace=False)) if n else np.empty(0, dtype=np.int64)
    assert np.array_equal(codec.delta_decode(codec.delta_encode(docs)), docs)


def test_varint_boundaries():
    vals = np.array([0, 1, 127, 128, 16383, 16384, 2**21 - 1, 2**21, 2**40, 2**62], dtype=np.uint64)
    assert np.array_equal(codec.varint_decode(codec.varint_encode(vals)), vals)


def test_varint_fuzz():
    rng = np.random.default_rng(7)
    for _ in range(20):
        n = int(rng.integers(1, 3000))
        vals = rng.integers(0, 2**50, size=n).astype(np.uint64)
        assert np.array_equal(codec.varint_decode(codec.varint_encode(vals)), vals)


def test_blocks_roundtrip_and_blockmax():
    rng = np.random.default_rng(11)
    n = 1000
    docs = np.sort(rng.choice(10**9, size=n, replace=False))
    tfs = rng.integers(1, 60, size=n)
    dls = rng.integers(10, 800, size=n)
    avgdl = float(dls.mean())
    blocks = codec.encode_blocks(docs, tfs, dls, avgdl, K1, B)
    assert all(b.n <= codec.BLOCK_SIZE for b in blocks)
    off = 0
    for bl in blocks:
        d, t, l = codec.decode_block(bl.doc_gaps, bl.tfs, bl.dls)
        assert np.array_equal(d, docs[off : off + bl.n])
        assert np.array_equal(t, tfs[off : off + bl.n])
        assert np.array_equal(l, dls[off : off + bl.n])
        assert bl.first_doc == d[0] and bl.last_doc == d[-1]
        # soundness: block_max >= every member's tf_norm
        norms = codec.tf_norm(t, l, avgdl, K1, B)
        assert bl.block_max >= norms.max() - 1e-12
        off += bl.n


def test_block_concatenation_is_merge():
    """Blocks from disjoint sorted doc ranges concatenate losslessly —
    the property the salted two-phase build and k-way merge rely on."""
    rng = np.random.default_rng(3)
    lo = np.sort(rng.choice(10**6, size=300, replace=False))
    hi = np.sort(rng.choice(10**6, size=300, replace=False)) + 2 * 10**6
    tf = np.ones(300, dtype=np.int64)
    dl = np.full(300, 100)
    b1 = codec.encode_blocks(lo, tf, dl, 100.0, K1, B)
    b2 = codec.encode_blocks(hi, tf, dl, 100.0, K1, B)
    got = np.concatenate([codec.decode_block(b.doc_gaps, b.tfs, b.dls)[0] for b in b1 + b2])
    assert np.array_equal(got, np.concatenate([lo, hi]))
