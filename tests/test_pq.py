"""Product-quantization ANN: determinism, block-split invariance, recall."""

import numpy as np
import pandas as pd
import pytest

import ray.data

from ehr_relation_extraction_ray.stages import similarity


def _vecs(n=200, dim=32, seed=7):
    rng = np.random.default_rng(seed)
    emb = rng.normal(size=(n, dim))
    # plain lists -> Arrow list<double>, the schema read_parquet produces
    # (numpy rows would become ArrowTensorArray, a different layout)
    return pd.DataFrame(
        {"vec_id": np.arange(n), "embedding": [list(v) for v in emb]}
    )


@pytest.fixture(scope="module")
def corpus():
    return _vecs()


def test_pq_block_split_invariance(corpus):
    ds1 = ray.data.from_pandas(corpus)
    ds2 = ray.data.from_pandas(corpus).repartition(9)
    books = similarity.train_pq_codebooks(ds1, m_sub=4, ksub=8)
    q = np.stack(corpus["embedding"][:3].to_numpy())
    a = similarity.pq_topk(ds1, books, q, k=7)
    b = similarity.pq_topk(ds2, books, q, k=7)
    pd.testing.assert_frame_equal(a, b)


def test_pq_codebooks_deterministic(corpus):
    ds = ray.data.from_pandas(corpus)
    b1 = similarity.train_pq_codebooks(ds, m_sub=4, ksub=8)
    b2 = similarity.train_pq_codebooks(ds, m_sub=4, ksub=8)
    assert b1.shape == (4, 8, 8)
    np.testing.assert_array_equal(b1, b2)


def test_pq_recall_vs_brute_force(corpus):
    # quantized top-10 should keep most of the exact top-10 on random data
    ds = ray.data.from_pandas(corpus)
    books = similarity.train_pq_codebooks(ds, m_sub=8, ksub=32)
    q = np.stack(corpus["embedding"][:5].to_numpy())
    exact = similarity.brute_force_topk(ds, q, k=10)
    approx = similarity.pq_topk(ds, books, q, k=10)
    recalls = []
    for qi in range(5):
        e = set(exact[exact["query_id"] == qi]["vec_id"])
        a = set(approx[approx["query_id"] == qi]["vec_id"])
        recalls.append(len(e & a) / len(e))
    assert np.mean(recalls) >= 0.5


def test_pq_self_hit(corpus):
    # a vector's own id should appear in its quantized top-3 (coarse codes
    # still place the exact duplicate at the quantization cell's max score)
    ds = ray.data.from_pandas(corpus)
    books = similarity.train_pq_codebooks(ds, m_sub=8, ksub=32)
    q = np.stack(corpus["embedding"][:4].to_numpy())
    out = similarity.pq_topk(ds, books, q, query_ids=np.arange(4), k=3)
    for qi in range(4):
        assert qi in set(out[out["query_id"] == qi]["vec_id"])


def test_pq_dim_not_divisible():
    df = _vecs(n=50, dim=30)
    with pytest.raises(ValueError):
        similarity.train_pq_codebooks(ray.data.from_pandas(df), m_sub=4)
