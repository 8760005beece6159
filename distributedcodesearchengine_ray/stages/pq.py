"""Product quantization (PQ) vector search — the memory-scale ANN path.

At 100 TB an embedding corpus cannot be scanned as floats: 1B x 64-d
float32 is 256 GB of vector payload alone.  PQ (Jegou, Douze, Schmid,
"Product Quantization for Nearest Neighbor Search", TPAMI 2011) splits
each L2-normalized vector into ``m`` subvectors, quantizes every
subvector to one of ``k`` learned centroids, and stores only the ``m``
code bytes — 32x smaller at m=8/k=16 on 64-d float32.  Search is
asymmetric distance computation (ADC): per query, one (m, k) lookup
table of exact subspace distances, then each candidate's distance is m
table lookups — no float vectors are ever read at query time.

Distributed shape (mirrors `stages/annsearch.py`):

- **train**: codebooks fit on a deterministic unbiased hash-sample
  (same sampler as the IVF quantizer — identical at every parallelism
  level), one tiny driver-side Lloyd's per subspace;
- **encode**: one vectorized ``map_batches`` pass over the corpus ->
  ``(id, pq_code: fixed_size_list<uint8>[m])`` — this codes table is
  what would be written partitioned and served at scale;
- **search**: the per-query LUT is broadcast once via ``ray.put``;
  each codes block computes distances with numpy takes and emits only
  its local top-k, driver heap-merges (blocks x Q x k rows max).

Approximate by construction (recall < 1); `tests/test_pq.py` gates the
distributed path bit-exactly against a single-process numpy ADC oracle
and enforces a recall floor vs exact cosine.

Beyond-reference operator: the reference delegates all vector search to
a Qdrant server (`/root/reference/codesearch/storage/vector_store.py`);
this is the engine-native compressed-domain equivalent.
"""

from __future__ import annotations

from typing import Optional

import numpy as np
import pyarrow as pa

from .annsearch import _emb_matrix


def _topk_dist_id(d: np.ndarray, ids: np.ndarray, k: int) -> np.ndarray:
    """Indices of the ``k`` smallest (dist, id) pairs — the exact
    deterministic cut.  Identical PQ codes tie BITWISE on ADC distance,
    so a plain argpartition boundary would pick an arbitrary
    (block-layout-dependent) victim; instead partition for the k-th
    distance, keep every row at-or-below it (usually ~k rows), and
    lexsort only those."""
    if k <= 0 or len(d) == 0:
        return np.empty(0, dtype=np.int64)
    if k >= len(d):
        return np.lexsort((ids, d))
    v = np.partition(d, k - 1)[k - 1]
    cand = np.flatnonzero(d <= v)
    return cand[np.lexsort((ids[cand], d[cand]))[:k]]


def _normalize(mat: np.ndarray) -> np.ndarray:
    n = np.linalg.norm(mat, axis=1, keepdims=True)
    n[n == 0] = 1.0
    return mat / n


def train_pq_codebooks(
    ds,
    m: int = 8,
    k: int = 16,
    sample_size: int = 4096,
    iters: int = 10,
    seed: int = 42,
    id_column: str = "vec_id",
) -> np.ndarray:
    """Fit (m, k, dim/m) subspace codebooks on a deterministic
    hash-sample of ``ds.embedding`` (L2-normalized).  Lloyd's per
    subspace, seeded init — same codebooks at any parallelism level."""
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
    mat = _normalize(np.stack(sample["embedding"].to_numpy()).astype(np.float64))
    dim = mat.shape[1]
    if dim % m:
        raise ValueError(f"m={m} must divide dim={dim}")
    dsub = dim // m
    books = np.empty((m, k, dsub), dtype=np.float64)
    for j in range(m):
        sub = mat[:, j * dsub : (j + 1) * dsub]
        rng = np.random.default_rng(seed + j)
        cent = sub[rng.choice(len(sub), size=min(k, len(sub)), replace=False)].copy()
        for _ in range(iters):
            d2 = ((sub[:, None, :] - cent[None, :, :]) ** 2).sum(axis=2)
            assign = np.argmin(d2, axis=1)
            for c in range(len(cent)):
                members = sub[assign == c]
                if len(members):
                    cent[c] = members.mean(axis=0)
        books[j, : len(cent)] = cent
        if len(cent) < k:  # degenerate tiny sample: pad with the last centroid
            books[j, len(cent) :] = cent[-1]
    return books


def _encode_matrix(mat: np.ndarray, books: np.ndarray) -> np.ndarray:
    """(B, dim) float -> (B, m) uint8 codes; argmin ties -> lowest index."""
    m, k, dsub = books.shape
    codes = np.empty((mat.shape[0], m), dtype=np.uint8)
    for j in range(m):
        sub = mat[:, j * dsub : (j + 1) * dsub]
        # ||x - c||^2 = ||x||^2 - 2 x.c + ||c||^2; ||x||^2 constant per row
        d2 = -2.0 * (sub @ books[j].T) + (books[j] ** 2).sum(axis=1)[None, :]
        codes[:, j] = np.argmin(d2, axis=1).astype(np.uint8)
    return codes


def pq_encode(ds, books: np.ndarray, id_column: str = "vec_id"):
    """One vectorized pass: (id, embedding) -> (id, pq_code[m] uint8).
    Codebooks ship once inside the task closure (a few KB)."""
    m = books.shape[0]

    def encode(t: pa.Table) -> pa.Table:
        mat = _normalize(_emb_matrix(t["embedding"], dtype=np.float64))
        codes = _encode_matrix(mat, books)
        flat = pa.array(codes.ravel(), pa.uint8())
        return pa.table(
            {
                id_column: t[id_column],
                "pq_code": pa.FixedSizeListArray.from_arrays(flat, m),
            }
        )

    return ds.map_batches(encode, batch_format="pyarrow", zero_copy_batch=True)


def adc_lut(queries: np.ndarray, books: np.ndarray) -> np.ndarray:
    """(Q, m, k) exact squared subspace distances query->centroid."""
    qmat = _normalize(np.asarray(queries, dtype=np.float64))
    m, k, dsub = books.shape
    lut = np.empty((qmat.shape[0], m, k), dtype=np.float64)
    for j in range(m):
        qs = qmat[:, j * dsub : (j + 1) * dsub]
        lut[:, j, :] = ((qs[:, None, :] - books[j][None, :, :]) ** 2).sum(axis=2)
    return lut


class _PQBlockTopK:
    """map_batches task: per-block ADC top-k against the broadcast LUT."""

    def __init__(self, lut_ref, k: int, id_column: str):
        import ray

        self.lut = ray.get(lut_ref)  # (Q, m, k)
        self.k = k
        self.id_column = id_column
        self.j_idx = np.arange(self.lut.shape[1])

    def __call__(self, batch: pa.Table) -> pa.Table:
        code_col = batch["pq_code"]
        if isinstance(code_col, pa.ChunkedArray):
            code_col = code_col.combine_chunks()
        m = code_col.type.list_size
        codes = code_col.values.to_numpy(zero_copy_only=False).reshape(-1, m)
        ids = batch[self.id_column].to_numpy(zero_copy_only=False)
        k = min(self.k, codes.shape[0])
        out_ids, out_q, out_d = [], [], []
        for qi in range(self.lut.shape[0]):
            d = self.lut[qi, self.j_idx[None, :], codes].sum(axis=1)
            top = _topk_dist_id(d, ids, k)
            out_ids.append(ids[top])
            out_q.append(np.full(len(top), qi, dtype=np.int64))
            out_d.append(d[top])
        return pa.table(
            {
                self.id_column: pa.array(np.concatenate(out_ids)),
                "query_idx": pa.array(np.concatenate(out_q), pa.int64()),
                "adc_dist": pa.array(np.concatenate(out_d), pa.float64()),
            }
        )


def pq_search(
    codes_ds,
    books: np.ndarray,
    queries: np.ndarray,
    k: int = 10,
    id_column: str = "vec_id",
) -> pa.Table:
    """ADC top-k over the codes table.  Returns (query_idx, rank, id,
    adc_dist) sorted (query_idx, adc_dist asc, id asc) — deterministic."""
    import ray

    lut_ref = ray.put(adc_lut(queries, books))
    cands = codes_ds.map_batches(
        _PQBlockTopK(lut_ref, k, id_column),
        batch_format="pyarrow",
        batch_size=65536,
        zero_copy_batch=True,
    ).to_pandas()
    out = {"query_idx": [], "rank": [], id_column: [], "adc_dist": []}
    for qi, grp in cands.groupby("query_idx"):
        grp = grp.sort_values(["adc_dist", id_column], kind="mergesort")
        top = grp.head(k)
        out["query_idx"].extend([qi] * len(top))
        out["rank"].extend(range(len(top)))
        out[id_column].extend(top[id_column].tolist())
        out["adc_dist"].extend(top["adc_dist"].tolist())
    return pa.table(
        {
            "query_idx": pa.array(out["query_idx"], pa.int64()),
            "rank": pa.array(out["rank"], pa.int64()),
            id_column: pa.array(out[id_column], pa.int64()),
            "adc_dist": pa.array(out["adc_dist"], pa.float64()),
        }
    )


def ivfpq_encode(ds, books: np.ndarray, centroids: np.ndarray,
                 id_column: str = "vec_id"):
    """IVF-PQ build pass: (id, embedding) -> (id, ivf_cell, pq_code[m]).

    One vectorized map — cell = argmax cosine to the (normalized)
    coarse centroids, code = the PQ subspace argmins.  At 100-TB scale
    this table writes hive-partitioned by ``ivf_cell`` (the existing
    embeddings layout convention) so a query's probed cells map to file
    pruning, not a scan."""
    m = books.shape[0]
    cent = np.asarray(centroids, dtype=np.float64)

    def encode(t: pa.Table) -> pa.Table:
        mat = _normalize(_emb_matrix(t["embedding"], dtype=np.float64))
        cells = np.argmax(mat @ cent.T, axis=1).astype(np.int64)
        codes = _encode_matrix(mat, books)
        flat = pa.array(codes.ravel(), pa.uint8())
        return pa.table(
            {
                id_column: t[id_column],
                "ivf_cell": pa.array(cells),
                "pq_code": pa.FixedSizeListArray.from_arrays(flat, m),
            }
        )

    return ds.map_batches(encode, batch_format="pyarrow", zero_copy_batch=True)


def ivfpq_search(
    codes_ds,
    books: np.ndarray,
    centroids: np.ndarray,
    queries: np.ndarray,
    k: int = 10,
    n_probe: int = 4,
    id_column: str = "vec_id",
) -> pa.Table:
    """IVF-PQ query: ADC top-k restricted to each query's ``n_probe``
    nearest coarse cells — the compressed-domain billion-vector shape
    (FAISS IVFxx,PQyy): the scan touches ~n_probe/n_centroids of the
    code table (file-pruned when the table is cell-partitioned) and
    reads 8-byte codes, not raw vectors.

    Per block: rows outside the probed-cell union drop first, then the
    broadcast (Q, m, k) LUT scores survivors; a per-(query, row) cell
    mask keeps IVF semantics exact (a row only competes for queries
    that probed its cell).  Returns (query_idx, rank, id, adc_dist)
    sorted (query_idx, adc_dist asc, id asc).  Approximate by
    construction (recall < 1 possible); tests/test_pq.py gates recall
    against exact cosine on the shipped distribution."""
    import ray

    qmat = _normalize(np.asarray(queries, dtype=np.float64))
    cent = np.asarray(centroids, dtype=np.float64)
    qcells = np.argsort(-(qmat @ cent.T), axis=1)[:, :n_probe]
    probe_union = np.unique(qcells)
    lut_ref = ray.put(adc_lut(queries, books))
    qcells_ref = ray.put(qcells)

    class _IVFPQBlock:
        def __init__(self):
            self.lut = ray.get(lut_ref)  # (Q, m, k)
            self.qcells = ray.get(qcells_ref)
            self.j_idx = np.arange(self.lut.shape[1])

        def __call__(self, batch: pa.Table) -> pa.Table:
            cells = batch["ivf_cell"].to_numpy(zero_copy_only=False)
            keep = np.isin(cells, probe_union)
            out_ids, out_q, out_d = [], [], []
            if keep.any():
                sub = batch.filter(pa.array(keep))
                code_col = sub["pq_code"]
                if isinstance(code_col, pa.ChunkedArray):
                    code_col = code_col.combine_chunks()
                m = code_col.type.list_size
                codes = code_col.values.to_numpy(zero_copy_only=False).reshape(-1, m)
                ids = sub[id_column].to_numpy(zero_copy_only=False)
                scells = cells[keep]
                for qi in range(self.lut.shape[0]):
                    mine = np.isin(scells, self.qcells[qi])
                    if not mine.any():
                        continue
                    rows = np.flatnonzero(mine)
                    d = self.lut[qi, self.j_idx[None, :], codes[rows]].sum(axis=1)
                    top = _topk_dist_id(d, ids[rows], min(k, len(d)))
                    out_ids.append(ids[rows[top]])
                    out_q.append(np.full(len(top), qi, dtype=np.int64))
                    out_d.append(d[top])
            cat = (lambda xs, dt: np.concatenate(xs) if xs else np.empty(0, dt))
            return pa.table(
                {
                    id_column: pa.array(cat(out_ids, np.int64)),
                    "query_idx": pa.array(cat(out_q, np.int64), pa.int64()),
                    "adc_dist": pa.array(cat(out_d, np.float64), pa.float64()),
                }
            )

    cands = codes_ds.map_batches(
        _IVFPQBlock,
        batch_format="pyarrow",
        batch_size=65536,
        concurrency=(1, 4),
        zero_copy_batch=True,
    ).to_pandas()
    out = {"query_idx": [], "rank": [], id_column: [], "adc_dist": []}
    for qi, grp in cands.groupby("query_idx"):
        grp = grp.sort_values(["adc_dist", id_column], kind="mergesort")
        top = grp.head(k)
        out["query_idx"].extend([qi] * len(top))
        out["rank"].extend(range(len(top)))
        out[id_column].extend(top[id_column].tolist())
        out["adc_dist"].extend(top["adc_dist"].tolist())
    return pa.table(
        {
            "query_idx": pa.array(out["query_idx"], pa.int64()),
            "rank": pa.array(out["rank"], pa.int64()),
            id_column: pa.array(out[id_column], pa.int64()),
            "adc_dist": pa.array(out["adc_dist"], pa.float64()),
        }
    )
