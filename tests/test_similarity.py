"""Similarity search: brute-force exactness vs numpy, LSH recall."""

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from mantic_sh_spark.operators import similarity

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def emb(spark):
    return spark.read.parquet(f"{SF}/embeddings.parquet")


@pytest.fixture(scope="module")
def emb_np(emb):
    pdf = emb.toPandas().sort_values("vec_id")
    return pdf["vec_id"].to_numpy(), np.vstack(pdf["embedding"].to_numpy()).astype(np.float64)


def _np_topk(ids, mat, q, k, exclude=None):
    cos = mat @ q / (np.linalg.norm(mat, axis=1) * np.linalg.norm(q))
    order = sorted(range(len(ids)), key=lambda i: (-round(cos[i], 4), ids[i]))
    out = [(int(ids[i]), round(float(cos[i]), 4)) for i in order if ids[i] != exclude]
    return out[:k]


def test_bruteforce_matches_numpy(emb, emb_np):
    ids, mat = emb_np
    q = mat[0]
    want = _np_topk(ids, mat, q, 10, exclude=0)
    got = [
        (r.vec_id, r.cos)
        for r in similarity.cosine_topk(emb, q.tolist(), k=10, exclude_id=0).orderBy("rank").collect()
    ]
    assert got == want


def test_cosine_topk_df_matches_list_form(emb, emb_np):
    """cosine_topk_df (query vector as a one-row broadcast DataFrame —
    the lazy form the ann_cosine_topk registry entry uses, r6) must be
    value-identical to cosine_topk with the collected Python list."""
    from pyspark.sql import functions as F

    ids, mat = emb_np
    want = [
        (r.vec_id, r.cos)
        for r in similarity.cosine_topk(emb, mat[0].tolist(), k=10, exclude_id=0)
        .orderBy("rank").collect()
    ]
    qdf = emb.filter(F.col("vec_id") == 0)
    got = [
        (r.vec_id, r.cos)
        for r in similarity.cosine_topk_df(emb, qdf, k=10, exclude_id=0)
        .orderBy("rank").collect()
    ]
    assert got == want


def test_lsh_recall_on_clustered_data(spark):
    """LSH recall on data with real neighborhood structure (planted
    clusters). The sf embeddings are ~uniform random (best neighbor
    cos≈0.33) where sign-LSH provably can't concentrate — that regime
    is covered by the brute-force path, not the ANN path."""
    rng = np.random.default_rng(3)
    centers = rng.standard_normal((8, 32))
    rows = []
    vid = 0
    for c in range(8):
        for _ in range(25):
            v = centers[c] + 0.15 * rng.standard_normal(32)
            rows.append((vid, (v / np.linalg.norm(v)).tolist(), c))
            vid += 1
    df = spark.createDataFrame(pd.DataFrame(rows, columns=["vec_id", "embedding", "label"]))
    ids = np.array([r[0] for r in rows])
    mat = np.array([r[1] for r in rows])
    q = mat[0]
    exact = {d for d, _ in _np_topk(ids, mat, q, 10, exclude=0)}
    approx = {
        r.vec_id
        for r in similarity.lsh_cosine_topk(df, q.tolist(), k=10, n_planes=10, multiprobe=2, exclude_id=0).collect()
    }
    recall = len(exact & approx) / 10
    assert recall >= 0.8, f"LSH recall too low on clustered data: {recall}"


def test_lsh_bucket_determinism(emb):
    a = {r.vec_id: r.bucket for r in similarity.lsh_bucket_ids(emb, 64, 10).collect()}
    b = {r.vec_id: r.bucket for r in similarity.lsh_bucket_ids(emb.repartition(7), 64, 10).collect()}
    assert a == b


def test_embedding_near_dup_pairs(spark):
    # plant: vec 1 == vec 0 scaled (cos 1.0), vec 2 orthogonal-ish
    rows = [
        (0, [1.0, 0.0, 0.5, 0.2]),
        (1, [2.0, 0.0, 1.0, 0.4]),
        (2, [0.0, 1.0, 0.0, 0.0]),
        (3, [1.0, 0.01, 0.5, 0.2]),
    ]
    df = spark.createDataFrame(pd.DataFrame(rows, columns=["vec_id", "embedding"]))
    pairs = {(r.a, r.b): r.cos for r in similarity.embedding_near_dup_pairs(df, threshold=0.99, n_planes=4).collect()}
    assert (0, 1) in pairs and pairs[(0, 1)] == 1.0
    assert (0, 3) in pairs
    assert not any(2 in p for p in pairs)


def test_ann_index_topk_recall_and_pruning(spark, tmp_path):
    """Materialized ANN index (VERDICT r1 #5): probes must be
    partition-pruned reads of the bucket table (never a corpus rescan)
    and recall must match the ad-hoc LSH path on clustered data."""
    from mantic_sh_spark.plans.explain import explain_str

    rng = np.random.default_rng(7)
    centers = rng.standard_normal((8, 32))
    rows = []
    vid = 0
    for c in range(8):
        for _ in range(25):
            v = centers[c] + 0.15 * rng.standard_normal(32)
            rows.append((vid, (v / np.linalg.norm(v)).tolist()))
            vid += 1
    df = spark.createDataFrame(pd.DataFrame(rows, columns=["vec_id", "embedding"]))
    idx = str(tmp_path / "ann")
    similarity.build_ann_index(spark, df, idx, n_planes=10, seed=42)

    ids = np.array([r[0] for r in rows])
    mat = np.array([r[1] for r in rows])
    q = mat[0]
    exact = {d for d, _ in _np_topk(ids, mat, q, 10, exclude=0)}
    approx = {
        r.vec_id
        for r in similarity.ann_index_topk(spark, idx, q.tolist(), k=10, multiprobe=2,
                                           exclude_id=0).collect()
    }
    assert len(exact & approx) / 10 >= 0.8

    # identical result set to the ad-hoc path (same planes, same probes)
    adhoc = {
        r.vec_id
        for r in similarity.lsh_cosine_topk(df, q.tolist(), k=10, n_planes=10,
                                            multiprobe=2, exclude_id=0).collect()
    }
    assert approx == adhoc

    # probe read is partition-pruned on `bucket`
    cand = similarity.ann_probe_candidates(spark, idx, q.tolist(), multiprobe=1)
    plan = explain_str(cand)
    assert "PartitionFilters" in plan
    assert "bucket" in plan.split("PartitionFilters", 1)[1].split("]", 1)[0]


def test_hashed_embedding_query_doc_agreement(spark):
    """R15 pipeline invariant: a doc whose tokens equal the query's
    token multiset embeds to the IDENTICAL vector via the Spark path
    (hashed_embeddings) and the driver path (hash_embed_query) — one
    embedding space across corpus and query."""
    from mantic_sh_spark.functions.tokenize import tokens_col

    df = spark.createDataFrame(pd.DataFrame({"doc_id": [1], "text": ["alpha beta beta gamma"]}))
    d = df.withColumn("tokens", tokens_col("text", camel=False))
    emb = similarity.hashed_embeddings(d, dim=16).collect()[0].emb
    qv = similarity.hash_embed_query(["alpha", "beta", "beta", "gamma"], 16)
    assert np.allclose(emb, qv)
    assert abs(np.linalg.norm(emb) - 1.0) < 1e-9

    # rerank of an identical-text candidate scores cos == 1.0 at rank 1
    df2 = spark.createDataFrame(pd.DataFrame({
        "doc_id": [1, 2], "text": ["alpha beta beta gamma", "totally different words here"]}))
    d2 = df2.withColumn("tokens", tokens_col("text", camel=False))
    cand = spark.createDataFrame(pd.DataFrame({"doc_id": [1, 2]}))
    out = similarity.semantic_rerank(d2, cand, ["alpha", "beta", "beta", "gamma"], dim=16, k=2).collect()
    assert out[0].doc_id == 1 and out[0].cos == 1.0 and out[0].rank == 1


def test_ivf_index_recall_and_pruning(spark, tmp_path):
    """IVF family (coarse-quantizer lists): recall on clustered data,
    result parity with brute force at full probe, partition pruning on
    list_id, and deterministic rebuilds."""
    from mantic_sh_spark.plans.explain import explain_str

    rng = np.random.default_rng(11)
    centers = rng.standard_normal((6, 24))
    rows = []
    vid = 0
    for c in range(6):
        for _ in range(30):
            v = centers[c] + 0.12 * rng.standard_normal(24)
            rows.append((vid, (v / np.linalg.norm(v)).tolist()))
            vid += 1
    df = spark.createDataFrame(pd.DataFrame(rows, columns=["vec_id", "embedding"]))
    idx = str(tmp_path / "ivf")
    similarity.build_ivf_index(spark, df, idx, n_lists=6, seed=42, train_sample=180)

    ids = np.array([r[0] for r in rows])
    mat = np.array([r[1] for r in rows])
    q = mat[0]
    exact = {d for d, _ in _np_topk(ids, mat, q, 10, exclude=0)}
    approx = {
        r.vec_id
        for r in similarity.ivf_cosine_topk(spark, idx, q.tolist(), k=10, n_probe=2,
                                            exclude_id=0).collect()
    }
    assert len(exact & approx) / 10 >= 0.8

    # full probe == exact brute force (IVF partitions the corpus)
    full = [
        (r.vec_id, r.cos)
        for r in similarity.ivf_cosine_topk(spark, idx, q.tolist(), k=10, n_probe=6,
                                            exclude_id=0).orderBy("rank").collect()
    ]
    assert full == _np_topk(ids, mat, q, 10, exclude=0)

    plan = explain_str(similarity.ivf_probe_candidates(spark, idx, q.tolist(), n_probe=2))
    assert "PartitionFilters" in plan
    assert "list_id" in plan.split("PartitionFilters", 1)[1].split("]", 1)[0]

    # deterministic rebuild: identical list assignment
    idx2 = str(tmp_path / "ivf2")
    similarity.build_ivf_index(spark, df.repartition(5), idx2, n_lists=6, seed=42,
                               train_sample=180)
    a = {r.vec_id: r.list_id for r in spark.read.parquet(f"{idx}/ivf_lists").collect()}
    b = {r.vec_id: r.list_id for r in spark.read.parquet(f"{idx2}/ivf_lists").collect()}
    assert a == b


def test_hashed_embedding_zero_norm_guard(spark):
    """A doc whose signed bucket counts fully cancel must embed to the
    ZERO vector (cos 0), never NaN (NaN sorts above every real cosine
    under desc ordering — review r2 finding)."""
    from mantic_sh_spark.functions.tokenize import tokens_col

    # find two tokens whose single-token dim-4 embeddings are exact
    # negatives (same bucket, opposite sign) — deterministic search
    vecs = {f"w{i}x": tuple(similarity.hash_embed_query([f"w{i}x"], 4)) for i in range(400)}
    pair = None
    for a, va in vecs.items():
        for b, vb in vecs.items():
            if a < b and all(x == -y for x, y in zip(va, vb)):
                pair = (a, b)
                break
        if pair:
            break
    assert pair, "no cancelling token pair in search space"

    df = spark.createDataFrame(pd.DataFrame({"doc_id": [1], "text": [f"{pair[0]} {pair[1]}"]}))
    d = df.withColumn("tokens", tokens_col("text", camel=False))
    emb = similarity.hashed_embeddings(d, dim=4).collect()[0].emb
    assert list(emb) == [0.0, 0.0, 0.0, 0.0]

    cand = spark.createDataFrame(pd.DataFrame({"doc_id": [1]}))
    out = similarity.semantic_rerank(d, cand, ["alpha"], dim=4, k=1).collect()
    assert out[0].cos == 0.0  # not NaN
