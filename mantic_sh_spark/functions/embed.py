"""Pluggable embedding backends (R15 / U7 — the neural swap point,
made concrete).

The reference scores semantic similarity with MiniLM ONNX embeddings
(src/semantic-scorer.ts:157-244). This engine runs the SAME algebra
(embed → cosine → re-sort) behind one interface with three backends:

  * `HashingBackend` — the deterministic feature-hashing embedding
    (operators/similarity.hashed_embeddings). Default: reproducible in
    DuckDB and driver-side Python, which is what keeps the
    `semantic_rerank` pipeline under the SQL oracle gate.
  * `CallableBackend` — wraps ANY batch text encoder
    `encode(list[str]) -> ndarray[n, dim]` in the real Spark plumbing:
    `mapInPandas` over Arrow batches, encoder constructed ONCE per
    Python worker (broadcast-style lazy init), fixed (doc_id,
    emb array<double>) output schema. This is the production path —
    a sentence-transformers / ONNX `encode` drops in with zero
    downstream change.
  * `NeuralBackend` — factory that builds a CallableBackend from
    sentence-transformers or onnxruntime when one is importable, and
    raises a clear error otherwise (neither ships in this sandbox; the
    skipif-gated test in tests/test_embed.py exercises it wherever the
    libraries exist).

`get_backend()` performs selection: explicit name, or "auto" = neural
when available, hash otherwise.
"""

from __future__ import annotations

from collections.abc import Callable
from importlib import util as _importlib_util

import numpy as np
from pyspark.sql import DataFrame


class HashingBackend:
    """Deterministic feature-hash embeddings — the oracle-checkable
    default (see operators/similarity.hashed_embeddings for the
    Catalyst implementation and DuckDB twin)."""

    name = "hash"

    def __init__(self, dim: int = 32):
        self.dim = dim

    def embed_docs(self, docs: DataFrame, tokens_col: str = "tokens") -> DataFrame:
        from ..operators.similarity import hashed_embeddings

        return hashed_embeddings(docs, self.dim, tokens_col)

    def embed_query(self, terms: list[str]) -> list[float]:
        from ..operators.similarity import hash_embed_query

        return hash_embed_query(terms, self.dim)


class CallableBackend:
    """Any `encode(list[str]) -> ndarray[n, dim]` batch text encoder,
    wrapped in the distributed plumbing a neural model needs:

      * `encoder_factory` (not a live model) ships in the closure, so
        the worker builds the model once per process — the pattern that
        keeps a 90 MB ONNX session out of every task's pickle;
      * docs flow through `mapInPandas` in Arrow batches; each batch is
        one `encode` call (the GPU/ONNX-friendly shape);
      * output rows are (doc_id, emb array<double>), L2-normalized —
        identical schema to HashingBackend, so `semantic_rerank`, the
        ANN index builders, and `embedding_near_dup_pairs` are
        backend-agnostic."""

    name = "callable"

    def __init__(self, encoder_factory: Callable[[], Callable[[list[str]], "np.ndarray"]],
                 dim: int, text_col: str = "text", batch_size: int = 64):
        self.encoder_factory = encoder_factory
        self.dim = dim
        self.text_col = text_col
        self.batch_size = batch_size
        self._query_encoder = None  # driver-side lazy singleton

    def embed_docs(self, docs: DataFrame, tokens_col: str = "tokens") -> DataFrame:
        factory = self.encoder_factory
        dim, text_col, bs = self.dim, self.text_col, self.batch_size

        def run(batches):
            import pandas as pd

            encoder = factory()  # once per worker process
            for pdf in batches:
                for s in range(0, len(pdf), bs):
                    chunk = pdf.iloc[s:s + bs]
                    vecs = np.asarray(encoder(chunk[text_col].tolist()), dtype=np.float64)
                    norms = np.linalg.norm(vecs, axis=1, keepdims=True)
                    vecs = np.where(norms > 0, vecs / np.maximum(norms, 1e-12), vecs)
                    yield pd.DataFrame({
                        "doc_id": chunk["doc_id"].to_numpy(),
                        "emb": list(vecs),
                    })

        return docs.select("doc_id", self.text_col).mapInPandas(
            run, schema="doc_id long, emb array<double>"
        )

    def embed_query(self, terms: list[str]) -> list[float]:
        if self._query_encoder is None:
            self._query_encoder = self.encoder_factory()
        v = np.asarray(self._query_encoder([" ".join(terms)]), dtype=np.float64)[0]
        n = float(np.linalg.norm(v))
        return (v / n).tolist() if n else v.tolist()


def _neural_factory(model_name: str):
    """Worker-side factory for NeuralBackend — imports happen in the
    worker, never at module import time."""

    def make():
        from sentence_transformers import SentenceTransformer

        model = SentenceTransformer(model_name)

        def encode(texts: list[str]):
            return model.encode(texts, convert_to_numpy=True, normalize_embeddings=False)

        return encode

    return make


def neural_available() -> bool:
    return _importlib_util.find_spec("sentence_transformers") is not None


def NeuralBackend(model_name: str = "sentence-transformers/all-MiniLM-L6-v2",
                  dim: int = 384, text_col: str = "text",
                  batch_size: int = 64) -> CallableBackend:
    """CallableBackend wired to a sentence-transformers model (the
    open-source form of the reference's MiniLM scorer). Raises
    RuntimeError with the install hint when the library is absent —
    this sandbox has no model runtime, so only the skipif-gated test
    exercises the real path; CallableBackend with a fake encoder covers
    the plumbing everywhere."""
    if not neural_available():
        raise RuntimeError(
            "NeuralBackend needs the `sentence-transformers` package "
            "(pip install sentence-transformers) — not present here; "
            "use get_backend('hash') or a CallableBackend"
        )
    b = CallableBackend(_neural_factory(model_name), dim=dim,
                        text_col=text_col, batch_size=batch_size)
    b.name = "neural"
    return b


def get_backend(name: str = "hash", dim: int = 32):
    """Backend selection: 'hash' (deterministic default), 'neural'
    (sentence-transformers; raises when unavailable), or 'auto'
    (neural when available, hash otherwise)."""
    if name == "auto":
        return NeuralBackend() if neural_available() else HashingBackend(dim)
    if name == "hash":
        return HashingBackend(dim)
    if name == "neural":
        return NeuralBackend()
    raise ValueError(f"unknown embedding backend: {name!r}")
