"""Embedding-backend interface (R15 swap point, round-3 task 5):
selection logic, the CallableBackend mapInPandas plumbing with a
deterministic fake encoder, backend-swapped semantic_rerank, and a
skipif-gated real-model test that runs wherever sentence-transformers
exists (not in this sandbox)."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from mantic_sh_spark.functions.embed import (
    CallableBackend,
    HashingBackend,
    get_backend,
    neural_available,
)
from mantic_sh_spark.functions.tokenize import tokens_col

SF = "/root/testdata/sf0.001"


def _fake_factory():
    """Deterministic 8-dim 'model': char-code histogram — stands in for
    a neural encoder to exercise the exact batch plumbing."""

    def make():
        def encode(texts):
            out = np.zeros((len(texts), 8), dtype=np.float64)
            for i, t in enumerate(texts):
                for ch in t[:200]:
                    out[i, ord(ch) % 8] += 1.0
            return out

        return encode

    return make


def test_backend_selection():
    assert isinstance(get_backend("hash"), HashingBackend)
    assert isinstance(get_backend("auto"), HashingBackend) or neural_available()
    if not neural_available():
        with pytest.raises(RuntimeError, match="sentence-transformers"):
            get_backend("neural")
    with pytest.raises(ValueError):
        get_backend("word2vec")


def test_callable_backend_plumbing(spark):
    """The mapInPandas path: fixed schema, once-per-worker encoder
    construction, L2-normalized rows identical to encoding driver-side."""
    docs = spark.read.parquet(f"{SF}/documents.parquet").select(
        F.col("doc_id").cast("long").alias("doc_id"), "text"
    ).limit(40)
    be = CallableBackend(_fake_factory(), dim=8, batch_size=16)
    emb = be.embed_docs(docs)
    assert emb.schema.simpleString() == "struct<doc_id:bigint,emb:array<double>>"
    rows = {r.doc_id: np.array(r.emb) for r in emb.collect()}
    # driver-side recomputation must match exactly (deterministic model)
    enc = _fake_factory()()
    for r in docs.collect():
        v = enc([r.text])[0]
        n = np.linalg.norm(v)
        want = v / n if n > 0 else v
        assert np.allclose(rows[r.doc_id], want), r.doc_id
    # every vector unit-norm (or zero)
    for v in rows.values():
        assert abs(np.linalg.norm(v) - 1.0) < 1e-9 or np.linalg.norm(v) == 0.0
    # query side shares the same encoder
    q = be.embed_query(["spark", "join"])
    assert len(q) == 8 and abs(np.linalg.norm(q) - 1.0) < 1e-9


def test_semantic_rerank_backend_swap(spark):
    """semantic_rerank with a swapped backend: same contract (k rows,
    rank column, cos desc), different embedding space — proving nothing
    downstream of the interface cares which model produced the
    vectors."""
    from mantic_sh_spark.operators.similarity import semantic_rerank

    docs = spark.read.parquet(f"{SF}/documents.parquet").select(
        F.col("doc_id").cast("long").alias("doc_id"), "text"
    ).withColumn("tokens", tokens_col("text", camel=False))
    cand = docs.select("doc_id").limit(30)
    default = semantic_rerank(docs, cand, ["spark", "shuffle"], k=5).collect()
    swapped = semantic_rerank(docs, cand, ["spark", "shuffle"], k=5,
                              backend=CallableBackend(_fake_factory(), dim=8)).collect()
    for res in (default, swapped):
        assert len(res) == 5
        assert [r.rank for r in res] == [1, 2, 3, 4, 5]
        coss = [r.cos for r in res]
        assert coss == sorted(coss, reverse=True)
    # rerank is deterministic per backend
    again = semantic_rerank(docs, cand, ["spark", "shuffle"], k=5,
                            backend=CallableBackend(_fake_factory(), dim=8)).collect()
    assert [(r.doc_id, r.cos) for r in swapped] == [(r.doc_id, r.cos) for r in again]


@pytest.mark.skipif(not neural_available(), reason="sentence-transformers not installed")
def test_neural_backend_real_model(spark):
    """Runs only where sentence-transformers is installed: the real
    MiniLM-class encoder through the identical plumbing."""
    from mantic_sh_spark.functions.embed import NeuralBackend

    be = NeuralBackend()
    docs = spark.read.parquet(f"{SF}/documents.parquet").select(
        F.col("doc_id").cast("long").alias("doc_id"), "text"
    ).limit(8)
    rows = be.embed_docs(docs).collect()
    assert len(rows) == 8 and len(rows[0].emb) == be.dim
