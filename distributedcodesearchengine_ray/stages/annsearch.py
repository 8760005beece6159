"""Similarity search over an embedding column.

Baseline: brute-force cosine top-k — the query matrix is broadcast once via
``ray.put`` and read inside each task (never re-shipped per batch); each
batch computes a vectorized ``numpy`` matmul and emits only its local top-k
candidates, which the driver heap-merges (candidates ≍ num_blocks·Q·k rows,
never the full corpus).

Scale path: LSH-bucketed variant — random-hyperplane signatures assign every
vector to a bucket; queries probe only their own bucket's partitions
(``groupby(bucket)`` layout), trading recall for a ~2^bits fan-in reduction.
"""

from __future__ import annotations

from typing import List, Optional

import numpy as np
import pyarrow as pa


class _BlockTopK:
    """map_batches task: per-block cosine top-k against broadcast queries."""

    def __init__(self, queries_ref, k: int, id_column: str, normalize: bool,
                 dtype=np.float32):
        import ray

        self.dtype = dtype
        q = ray.get(queries_ref)
        self.q = np.asarray(q, dtype=dtype)
        if normalize:
            n = np.linalg.norm(self.q, axis=1, keepdims=True)
            n[n == 0] = 1.0
            self.q = self.q / n
        self.k = k
        self.id_column = id_column
        self.normalize = normalize

    def __call__(self, batch: pa.Table) -> pa.Table:
        emb = batch["embedding"]
        if isinstance(emb, pa.ChunkedArray):
            emb = emb.combine_chunks()
        if pa.types.is_fixed_size_list(emb.type):
            dim = emb.type.list_size
            mat = np.asarray(emb.values.to_numpy(zero_copy_only=False), dtype=self.dtype).reshape(-1, dim)
        else:
            lst = emb.to_pylist()
            mat = np.asarray(lst, dtype=self.dtype)
        if self.normalize:
            n = np.linalg.norm(mat, axis=1, keepdims=True)
            n[n == 0] = 1.0
            mat = mat / n
        sims = mat @ self.q.T  # B x Q
        ids = batch[self.id_column].to_numpy(zero_copy_only=False)
        k = min(self.k, sims.shape[0])
        out_ids, out_q, out_s = [], [], []
        for qi in range(sims.shape[1]):
            col = sims[:, qi]
            if k < len(col):
                # tie-safe cut: keep every row at-or-above the k-th
                # score, then (score desc, id asc) — duplicate
                # embeddings tie bitwise and an argpartition boundary
                # would drop a block-layout-dependent victim
                v = np.partition(-col, k - 1)[k - 1]
                cand = np.flatnonzero(-col <= v)
                top = cand[np.lexsort((ids[cand], -col[cand]))[:k]]
            else:
                top = np.arange(len(col))
            out_ids.append(ids[top])
            out_q.append(np.full(len(top), qi, dtype=np.int64))
            out_s.append(col[top].astype(np.float64))
        return pa.table(
            {
                self.id_column: pa.array(np.concatenate(out_ids)),
                "query_idx": pa.array(np.concatenate(out_q), pa.int64()),
                "score": pa.array(np.concatenate(out_s), pa.float64()),
            }
        )


class _BlockRadius:
    """map_batches task: per-block cosine RADIUS search (ES knn
    ``similarity`` threshold) — every (query, vector) pair with cosine
    >= tau is emitted, no top-k cap.  The threshold applies INSIDE the
    block so only matches ever leave a worker: the exchange is
    O(matches), never O(corpus), which is what makes radius search
    viable at scale (a hot query near a dense cluster returns many rows,
    but they are the ANSWER, not intermediate state)."""

    def __init__(self, queries_ref, tau: float, id_column: str,
                 normalize: bool = True, dtype=np.float64):
        import ray

        self.dtype = dtype
        q = np.asarray(ray.get(queries_ref), dtype=dtype)
        if normalize:
            n = np.linalg.norm(q, axis=1, keepdims=True)
            n[n == 0] = 1.0
            q = q / n
        self.q = q
        self.tau = tau
        self.id_column = id_column
        self.normalize = normalize

    def __call__(self, batch: pa.Table) -> pa.Table:
        mat = _emb_matrix(batch["embedding"], dtype=self.dtype)
        if self.normalize:
            n = np.linalg.norm(mat, axis=1, keepdims=True)
            n[n == 0] = 1.0
            mat = mat / n
        sims = mat @ self.q.T  # B x Q
        ids = batch[self.id_column].to_numpy(zero_copy_only=False)
        rows, cols = np.nonzero(sims >= self.tau)
        return pa.table(
            {
                self.id_column: pa.array(ids[rows]),
                "query_idx": pa.array(cols.astype(np.int64), pa.int64()),
                "score": pa.array(sims[rows, cols].astype(np.float64), pa.float64()),
            }
        )


def vector_radius(
    ds,
    queries: np.ndarray,
    tau: float,
    id_column: str = "vec_id",
    normalize: bool = True,
    dtype=np.float64,
) -> pa.Table:
    """Exact cosine radius search: all vectors with similarity >= ``tau``
    per query row, sorted (query_idx, score desc, id asc)."""
    import ray

    qref = ray.put(np.asarray(queries, dtype=dtype))
    out = (
        ds.map_batches(
            _BlockRadius(qref, tau, id_column, normalize, dtype),
            batch_format="pyarrow",
            batch_size=8192,
            zero_copy_batch=True,
        )
        .to_pandas()
        .sort_values(
            ["query_idx", "score", id_column],
            ascending=[True, False, True],
            kind="mergesort",
            ignore_index=True,
        )
    )
    return pa.table(
        {
            "query_idx": pa.array(out["query_idx"].to_numpy(np.int64)),
            id_column: pa.array(out[id_column].to_numpy(np.int64)),
            "score": pa.array(out["score"].to_numpy(np.float64)),
        }
    )


def vector_topk(
    ds,
    queries: np.ndarray,
    k: int = 10,
    id_column: str = "vec_id",
    normalize: bool = True,
    dtype=np.float32,
) -> pa.Table:
    """Exact cosine top-k of each query row against ``ds.embedding``.

    Returns (query_idx, rank, <id_column>, score) sorted by
    (query_idx, -score, id) — deterministic tie-break on id.
    """
    import ray

    qref = ray.put(np.asarray(queries, dtype=dtype))
    cands = ds.map_batches(
        _BlockTopK(qref, k, id_column, normalize, dtype),
        batch_format="pyarrow",
        batch_size=8192,
        zero_copy_batch=True,
    ).to_pandas()
    out = {"query_idx": [], "rank": [], id_column: [], "score": []}
    for qi, grp in cands.groupby("query_idx"):
        grp = grp.sort_values(["score", id_column], ascending=[False, True], kind="mergesort")
        top = grp.head(k)
        out["query_idx"].extend([qi] * len(top))
        out["rank"].extend(range(len(top)))
        out[id_column].extend(top[id_column].tolist())
        out["score"].extend(top["score"].tolist())
    return pa.table(
        {
            "query_idx": pa.array(out["query_idx"], pa.int64()),
            "rank": pa.array(out["rank"], pa.int64()),
            id_column: pa.array(out[id_column], pa.int64()),
            "score": pa.array(out["score"], pa.float64()),
        }
    )


class _BlockInt8TopK:
    """map_batches task: int8 scalar-quantized candidate generation +
    exact float64 rescore (the ES ``int8_hnsw`` / FAISS SQ8 pattern).

    Per block: vectors quantize to symmetric per-row int8 (scale =
    max|x|/127), the approximate score is one int32 GEMM rescaled by the
    row/query scales, the approx top-``r`` per query is RESCORED with the
    exact normalized float64 dot, and only the exact top-``k`` leaves the
    block.  Identical results to the exact path whenever each block's
    true top-k sits inside its approx top-r (r >> k margin; gated by
    tests/test_hybrid.py equality assertions) — at 1/4 the matmul
    bandwidth, which is the whole point at 100-TB embedding volumes."""

    def __init__(self, queries_ref, k: int, r: int, id_column: str):
        import ray

        q = np.asarray(ray.get(queries_ref), dtype=np.float64)
        n = np.linalg.norm(q, axis=1, keepdims=True)
        n[n == 0] = 1.0
        self.q = q / n
        qs = np.abs(self.q).max(axis=1, keepdims=True) / 127.0
        qs[qs == 0] = 1.0
        self.q8 = np.rint(self.q / qs).astype(np.int32)
        self.qscale = qs  # Q x 1
        self.k = k
        self.r = r
        self.id_column = id_column

    def __call__(self, batch: pa.Table) -> pa.Table:
        mat = _emb_matrix(batch["embedding"], dtype=np.float64)
        n = np.linalg.norm(mat, axis=1, keepdims=True)
        n[n == 0] = 1.0
        mat = mat / n
        ds_ = np.abs(mat).max(axis=1, keepdims=True) / 127.0
        ds_[ds_ == 0] = 1.0
        d8 = np.rint(mat / ds_).astype(np.int32)
        approx = (d8 @ self.q8.T).astype(np.float64) * ds_ * self.qscale.T
        ids = batch[self.id_column].to_numpy(zero_copy_only=False)
        r = min(self.r, approx.shape[0])
        k = min(self.k, approx.shape[0])
        out_ids, out_q, out_s = [], [], []
        for qi in range(approx.shape[1]):
            col = approx[:, qi]
            cand = (
                np.argpartition(-col, r - 1)[:r] if r < len(col) else np.arange(len(col))
            )
            exact = mat[cand] @ self.q[qi]  # rescore candidates only
            # (score desc, id asc) tie-break on the exact cut: duplicate
            # embeddings tie bitwise, and an argpartition boundary would
            # pick a block-layout-dependent victim, breaking the
            # equality-with-exact contract
            order = np.lexsort((ids[cand], -exact))[:k]
            top = cand[order]
            out_ids.append(ids[top])
            out_q.append(np.full(len(top), qi, dtype=np.int64))
            out_s.append(exact[order].astype(np.float64))
        return pa.table(
            {
                self.id_column: pa.array(np.concatenate(out_ids)),
                "query_idx": pa.array(np.concatenate(out_q), pa.int64()),
                "score": pa.array(np.concatenate(out_s), pa.float64()),
            }
        )


def vector_topk_int8(
    ds,
    queries: np.ndarray,
    k: int = 10,
    candidates: int = 64,
    id_column: str = "vec_id",
) -> pa.Table:
    """Cosine top-k via int8 scalar quantization + exact rescore.

    Same output contract as :func:`vector_topk` (query_idx, rank, id,
    score sorted by (query_idx, -score, id)); equal to the exact result
    whenever per-block approx top-``candidates`` covers the true top-k.
    """
    import ray

    qref = ray.put(np.asarray(queries, dtype=np.float64))
    cands = ds.map_batches(
        _BlockInt8TopK(qref, k, candidates, id_column),
        batch_format="pyarrow",
        batch_size=8192,
        zero_copy_batch=True,
    ).to_pandas()
    out = {"query_idx": [], "rank": [], id_column: [], "score": []}
    for qi, grp in cands.groupby("query_idx"):
        grp = grp.sort_values(["score", id_column], ascending=[False, True], kind="mergesort")
        top = grp.head(k)
        out["query_idx"].extend([qi] * len(top))
        out["rank"].extend(range(len(top)))
        out[id_column].extend(top[id_column].tolist())
        out["score"].extend(top["score"].tolist())
    return pa.table(
        {
            "query_idx": pa.array(out["query_idx"], pa.int64()),
            "rank": pa.array(out["rank"], pa.int64()),
            id_column: pa.array(out[id_column], pa.int64()),
            "score": pa.array(out["score"], pa.float64()),
        }
    )


def _emb_matrix(emb, dtype=np.float32) -> np.ndarray:
    if isinstance(emb, pa.ChunkedArray):
        emb = emb.combine_chunks()
    if pa.types.is_fixed_size_list(emb.type):
        dim = emb.type.list_size
        return np.asarray(emb.values.to_numpy(zero_copy_only=False), dtype=dtype).reshape(-1, dim)
    return np.asarray(emb.to_pylist(), dtype=dtype)


def ivf_train_centroids(
    ds,
    n_centroids: int = 16,
    sample_size: int = 4096,
    iters: int = 10,
    seed: int = 42,
    id_column: Optional[str] = None,
) -> np.ndarray:
    """Tiny k-means (IVF coarse quantizer) trained on a driver-side sample.

    With ``id_column`` the sample is an UNBIASED deterministic hash-sample
    (keep rows whose stable id-hash % modulus == 0 — identical at every
    parallelism level, like the partition-boundary sampler in
    ``build_index``); without it, first blocks up to ``sample_size`` rows
    (order-biased — avoid at scale).  Centroids are L2-normalized so
    assignment = argmax dot product.
    """
    if id_column is not None:
        import pandas as pd

        n_rows = ds.count()
        modulus = max(1, n_rows // sample_size)

        def keep_sample(t: pa.Table) -> pa.Table:
            ids = t[id_column].to_numpy(zero_copy_only=False)
            h = pd.util.hash_array(np.ascontiguousarray(ids))
            return t.filter(pa.array(h % modulus == 0))

        sample = ds.map_batches(keep_sample, batch_format="pyarrow").to_pandas()
        if len(sample) > sample_size:
            sample = sample.sort_values(id_column).head(sample_size)
    else:
        sample = ds.limit(sample_size).to_pandas()
    mat = np.stack(sample["embedding"].to_numpy()).astype(np.float64)
    norms = np.linalg.norm(mat, axis=1, keepdims=True)
    norms[norms == 0] = 1.0
    mat = mat / norms
    rng = np.random.default_rng(seed)
    cent = mat[rng.choice(len(mat), size=min(n_centroids, len(mat)), replace=False)]
    for _ in range(iters):
        assign = np.argmax(mat @ cent.T, axis=1)
        for c in range(len(cent)):
            members = mat[assign == c]
            if len(members):
                v = members.mean(axis=0)
                n = np.linalg.norm(v)
                if n > 0:
                    cent[c] = v / n
    return cent.astype(np.float32)


def vector_topk_ivf(
    ds,
    queries: np.ndarray,
    k: int = 10,
    id_column: str = "vec_id",
    n_centroids: int = 16,
    n_probe: int = 4,
    seed: int = 42,
) -> pa.Table:
    """IVF scale path: brute-force only over vectors whose nearest centroid
    is among each query's ``n_probe`` closest centroids.  At scale the
    centroid id becomes the partition key (``partition_cols=["ivf_cell"]``)
    so a query touches ~n_probe/n_centroids of the corpus.  Approximate
    (recall < 1) by construction."""
    import ray

    cent = ivf_train_centroids(ds, n_centroids=n_centroids, seed=seed, id_column=id_column)
    qmat = np.asarray(queries, dtype=np.float32)
    qn = np.linalg.norm(qmat, axis=1, keepdims=True)
    qn[qn == 0] = 1.0
    qcells = np.argsort(-(qmat / qn) @ cent.T, axis=1)[:, :n_probe]
    probe = set(np.unique(qcells).tolist())
    cent_ref = ray.put(cent)

    class CellFilter:
        def __init__(self):
            self.cent = ray.get(cent_ref)

        def __call__(self, batch: pa.Table) -> pa.Table:
            mat = _emb_matrix(batch["embedding"])
            n = np.linalg.norm(mat, axis=1, keepdims=True)
            n[n == 0] = 1.0
            cells = np.argmax((mat / n) @ self.cent.T, axis=1)
            return batch.filter(pa.array(np.isin(cells, list(probe))))

    filtered = ds.map_batches(
        CellFilter, batch_format="pyarrow", batch_size=8192, concurrency=(1, 2)
    )
    return vector_topk(filtered, queries, k=k, id_column=id_column)


def lsh_signatures(mat: np.ndarray, n_bits: int = 16, seed: int = 42) -> np.ndarray:
    """Random-hyperplane LSH bucket ids (the IVF/LSH scale path)."""
    rng = np.random.default_rng(seed)
    dim = mat.shape[1]
    planes = rng.standard_normal((dim, n_bits)).astype(np.float32)
    bits = (mat @ planes) > 0
    weights = (1 << np.arange(n_bits, dtype=np.int64))
    return bits @ weights


def hamming_ball(sig: int, n_bits: int, radius: int = 1) -> List[int]:
    """All bucket ids within Hamming distance <= radius of ``sig`` (the
    multiprobe set of the partitioned-LSH query path)."""
    import itertools

    out = {int(sig)}
    for r in range(1, radius + 1):
        for bits in itertools.combinations(range(n_bits), r):
            flipped = int(sig)
            for b in bits:
                flipped ^= 1 << b
            out.add(flipped)
    return sorted(out)


def vector_topk_lsh(
    ds,
    queries: np.ndarray,
    k: int = 10,
    id_column: str = "vec_id",
    n_bits: int = 8,
    seed: int = 42,
) -> pa.Table:
    """Approximate top-k: probe only blocks sharing the query's LSH bucket.

    Recall < 1.0 by construction; at scale the bucket column becomes the
    partition key (``write_parquet(partition_cols=["bucket"])``) so a query
    touches ~1/2^bits of the corpus.
    """
    qmat = np.asarray(queries, dtype=np.float32)
    qn = np.linalg.norm(qmat, axis=1, keepdims=True)
    qn[qn == 0] = 1.0
    qbuckets = set(lsh_signatures(qmat / qn, n_bits, seed).tolist())

    def bucket_filter(batch: pa.Table) -> pa.Table:
        emb = batch["embedding"]
        if isinstance(emb, pa.ChunkedArray):
            emb = emb.combine_chunks()
        if pa.types.is_fixed_size_list(emb.type):
            dim = emb.type.list_size
            mat = np.asarray(emb.values.to_numpy(zero_copy_only=False), dtype=np.float32).reshape(-1, dim)
        else:
            mat = np.asarray(emb.to_pylist(), dtype=np.float32)
        n = np.linalg.norm(mat, axis=1, keepdims=True)
        n[n == 0] = 1.0
        sig = lsh_signatures(mat / n, n_bits, seed)
        mask = np.isin(sig, list(qbuckets))
        return batch.filter(pa.array(mask))

    filtered = ds.map_batches(bucket_filter, batch_format="pyarrow", batch_size=8192)
    return vector_topk(filtered, queries, k=k, id_column=id_column)


def mmr_rerank(
    qvec: np.ndarray,
    cand_ids: np.ndarray,
    cand_vecs: np.ndarray,
    *,
    k: int = 10,
    lam: float = 0.7,
) -> "list[tuple[int, float]]":
    """Maximal Marginal Relevance (Carbonell & Goldstein 1998) greedy
    rerank of a CANDIDATE set: iteratively pick
    ``argmax lam*sim(q,d) - (1-lam)*max_{s in selected} sim(d,s)``,
    ties broken by smallest id.  Candidates come from a distributed
    top-N cosine pass (``vector_topk``); the greedy itself is a
    driver-side O(k*N) loop over the N-row candidate table — rerank
    never touches the corpus.  Returns [(id, mmr_score), ...] in
    selection order."""
    q = np.asarray(qvec, dtype=np.float64)
    q = q / (np.linalg.norm(q) or 1.0)
    v = np.asarray(cand_vecs, dtype=np.float64)
    n = np.linalg.norm(v, axis=1, keepdims=True)
    n[n == 0] = 1.0
    v = v / n
    rel = v @ q
    ids = np.asarray(cand_ids, dtype=np.int64)
    selected: list[tuple[int, float]] = []
    picked = np.zeros(len(ids), dtype=bool)
    max_sim = np.full(len(ids), -np.inf)
    for _ in range(min(k, len(ids))):
        score = lam * rel - (1.0 - lam) * np.where(
            np.isinf(max_sim), 0.0, max_sim
        )
        if not selected:
            score = lam * rel  # no diversity term on the first pick
        score = np.where(picked, -np.inf, score)
        # argmax with smallest-id tie-break
        best = np.flatnonzero(score == score.max())
        j = best[np.argmin(ids[best])]
        selected.append((int(ids[j]), float(score[j])))
        picked[j] = True
        max_sim = np.maximum(max_sim, v @ v[j])
    return selected
