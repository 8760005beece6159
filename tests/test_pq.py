"""Product-quantization ANN (stages/pq.py): the distributed encode+ADC
path must match a single-process numpy oracle BIT-EXACTLY (same
codebooks -> same codes -> same distances -> same ranking incl. the
(dist, id) tie-break), stay invariant to batch/partition layout, and
clear a recall floor against exact cosine top-k."""

import os
import sys

import numpy as np
import pyarrow.parquet as pq
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from distributedcodesearchengine_ray.stages.pq import (
    _encode_matrix,
    adc_lut,
    pq_encode,
    pq_search,
    train_pq_codebooks,
)

SF = "/root/testdata/sf0.001"


def _load():
    t = pq.read_table(os.path.join(SF, "embeddings.parquet"))
    ids = t["vec_id"].to_numpy()
    mat = np.stack(t["embedding"].to_pandas().to_numpy()).astype(np.float64)
    return ids, mat


def _norm(m):
    n = np.linalg.norm(m, axis=1, keepdims=True)
    n[n == 0] = 1.0
    return m / n


def _numpy_adc_topk(ids, mat, books, queries, k=10):
    """Single-process oracle: encode everything, rank by (adc, id)."""
    codes = _encode_matrix(_norm(mat), books)
    lut = adc_lut(queries, books)
    out = []
    for qi in range(lut.shape[0]):
        d = lut[qi, np.arange(books.shape[0])[None, :], codes].sum(axis=1)
        order = np.lexsort((ids, d))[:k]
        out.append([(qi, r, int(ids[i]), d[i]) for r, i in enumerate(order)])
    return out


def test_pq_matches_numpy_oracle(ray_session):
    import ray.data as rd

    ids, mat = _load()
    ds = rd.read_parquet(os.path.join(SF, "embeddings.parquet"),
                         columns=["vec_id", "embedding"])
    books = train_pq_codebooks(ds, m=8, k=16)
    queries = mat[:3]
    got = pq_search(pq_encode(ds, books), books, queries, k=10).to_pandas()
    exp = [row for q in _numpy_adc_topk(ids, mat, books, queries, k=10) for row in q]
    assert len(got) == len(exp)
    for (qi, r, vid, d), (_, grow) in zip(exp, got.iterrows()):
        assert (qi, r, vid) == (grow["query_idx"], grow["rank"], grow["vec_id"])
        assert abs(d - grow["adc_dist"]) < 1e-12


def test_pq_batch_layout_invariant(ray_session):
    import ray.data as rd

    ids, mat = _load()
    books = train_pq_codebooks(
        rd.read_parquet(os.path.join(SF, "embeddings.parquet")), m=8, k=16
    )
    queries = mat[:2]
    results = []
    for blocks in (1, 7):
        ds = rd.read_parquet(
            os.path.join(SF, "embeddings.parquet"),
            columns=["vec_id", "embedding"],
            override_num_blocks=blocks,
        )
        results.append(
            pq_search(pq_encode(ds, books), books, queries, k=10).to_pandas()
        )
    assert results[0].equals(results[1])


def test_pq_recall_floor(ray_session):
    """PQ is approximate; on the testdata embeddings recall@10 vs exact
    cosine must clear a floor (measured ~0.5+; gate at 0.3 for margin)."""
    import ray.data as rd

    from distributedcodesearchengine_ray.stages.annsearch import vector_topk

    ids, mat = _load()
    ds = rd.read_parquet(os.path.join(SF, "embeddings.parquet"),
                         columns=["vec_id", "embedding"])
    queries = mat[:3]
    books = train_pq_codebooks(ds, m=8, k=16)
    approx = pq_search(pq_encode(ds, books), books, queries, k=10).to_pandas()
    exact = vector_topk(ds, queries, k=10, id_column="vec_id",
                        normalize=True, dtype=np.float64).to_pandas()
    recalls = []
    for qi in range(3):
        a = set(approx[approx["query_idx"] == qi]["vec_id"])
        e = set(exact[exact["query_idx"] == qi]["vec_id"])
        recalls.append(len(a & e) / len(e))
    assert np.mean(recalls) >= 0.3, recalls


def test_pq_compression_ratio():
    """8 uint8 codes vs 64 float32: the stored vector payload shrinks 32x."""
    ids, mat = _load()
    assert mat.shape[1] == 64
    assert (64 * 4) / 8 == 32.0
