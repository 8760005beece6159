"""knn_mmr has no SQL oracle (greedy argmax): gate the distributed
candidate pass + driver greedy against an independent full-numpy MMR
computed straight from the parquet file."""

import numpy as np
import pandas as pd
import pyarrow.parquet as pq
import pytest

from distributedcodesearchengine_ray.pipelines.queries import (
    MMR_CAND,
    MMR_K,
    MMR_LAMBDA,
    knn_mmr,
)
from distributedcodesearchengine_ray.stages.annsearch import mmr_rerank

SF = "/root/testdata/sf0.001"


def _brute_mmr(qvec, ids, vecs, k, lam):
    """Plain-python reference: greedy MMR over the top-MMR_CAND cosine
    candidates, smallest-id tie-breaks everywhere."""
    q = qvec / (np.linalg.norm(qvec) or 1.0)
    n = np.linalg.norm(vecs, axis=1, keepdims=True)
    n[n == 0] = 1.0
    v = vecs / n
    rel = v @ q
    # candidate cut: top MMR_CAND by (sim desc, id asc)
    order = sorted(range(len(ids)), key=lambda i: (-rel[i], ids[i]))[:MMR_CAND]
    cids = [ids[i] for i in order]
    crel = [rel[i] for i in order]
    cv = v[order]
    selected, picked = [], set()
    maxsim = [float("-inf")] * len(cids)
    for step in range(min(k, len(cids))):
        best, best_s = None, None
        for i in range(len(cids)):
            if i in picked:
                continue
            s = lam * crel[i] if step == 0 else lam * crel[i] - (1 - lam) * maxsim[i]
            if best is None or s > best_s or (s == best_s and cids[i] < cids[best]):
                best, best_s = i, s
        selected.append((cids[best], best_s))
        picked.add(best)
        for i in range(len(cids)):
            maxsim[i] = max(maxsim[i], float(cv[i] @ cv[best]))
    return selected


def test_knn_mmr_matches_brute_force(ray_session):
    got = knn_mmr(SF).to_pandas()
    tbl = pq.read_table(f"{SF}/embeddings.parquet").to_pandas()
    mat = np.stack(tbl["embedding"].to_numpy()).astype(np.float64)
    ids = tbl["vec_id"].to_numpy(np.int64)
    for qid in (0, 1, 2):
        qvec = mat[ids == qid][0]
        want = _brute_mmr(qvec, list(ids), mat, MMR_K, MMR_LAMBDA)
        sub = got[got["q_id"] == qid].sort_values("rank")
        assert sub["vec_id"].tolist() == [w[0] for w in want]
        want_micro = [int(np.floor(w[1] * 1e6 + 0.5)) for w in want]
        assert sub["mmr_micro"].tolist() == want_micro


def test_mmr_first_pick_is_top1_and_diversity_defers_duplicates():
    rng = np.random.default_rng(3)
    vecs = rng.normal(size=(40, 16))
    # plant an exact duplicate of the best vector: ids 7 and 8 tie on
    # relevance, so the min-id tie-break makes 7 the first pick
    q = vecs[7] + rng.normal(scale=0.01, size=16)
    vecs[8] = vecs[7]
    ids = np.arange(40)
    picks_div = mmr_rerank(q, ids, vecs, k=5, lam=0.3)
    assert picks_div[0][0] == 7
    # at strong diversity weight the exact duplicate never makes top-5
    assert 8 not in [p[0] for p in picks_div]
    # at lam=1.0 MMR degenerates to pure cosine ranking: the duplicate
    # follows immediately
    picks_rel = mmr_rerank(q, ids, vecs, k=5, lam=1.0)
    assert picks_rel[0][0] == 7 and picks_rel[1][0] == 8
