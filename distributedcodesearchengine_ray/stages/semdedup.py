"""SemDeDup — semantic (embedding-space) deduplication, cluster-then-dedup.

The SemDeDup recipe (Abbas et al. 2023): k-means the embedding space so
that near-duplicates land in the same cluster, then do pairwise cosine
comparison ONLY within clusters and keep one representative per
near-duplicate group.  This turns the O(N^2) all-pairs problem into
"one shuffle keyed by cluster + per-cluster quadratic work bounded by
cluster size" — the canonical 100-TB-safe shape (pick k ∝ N/target so
clusters stay small; skewed clusters are the operator's documented
partitioning assumption, same caveat class as LSH buckets).

Semantics (deterministic, SQL-mirrorable): a row is a DUPLICATE iff some
SMALLER-id row in the same cluster has cosine >= threshold with it —
i.e. keep-first-by-id greedy, the same insertion-order-wins rule the
exact-dedup operators use.  Output: ``(id, cluster, keep)`` for every
input row, ``keep`` in {0, 1}.

Pipeline:
1. ``kmeans_fit(..., materialize_assignments=False, return_labels=True)``
   — centroid training only (broadcast centroids per iteration, map-side
   partials); no driver-side N-row table.
2. map-side assignment: one matmul per batch against the broadcast
   (centroids, labels) — identical argmin/tie rule to ``kmeans_fit``'s
   own assignment pass (ties -> smallest label), so the driver oracle's
   unrolled-SQL kmeans reproduces it.
3. ``groupby(cluster).map_groups`` — the ONE exchange; within each
   cluster a blocked lower-triangular cosine matmul marks rows with a
   smaller-id neighbor >= threshold.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from .kmeans import kmeans_fit

_BLOCK_ROWS = 2048  # bounds per-group matmul memory: BLOCK x cluster_size


def _normalize(mat: np.ndarray) -> np.ndarray:
    nrm = np.linalg.norm(mat, axis=1, keepdims=True)
    nrm[nrm == 0] = 1.0
    return mat / nrm


def semantic_dedup(
    ds,
    *,
    k: int = 8,
    n_iter: int = 2,
    threshold: float = 0.95,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
):
    """Returns a Dataset of ``(id_col, cluster, keep)`` over all rows."""
    import ray

    _, centroids, labels = kmeans_fit(
        ds,
        k=k,
        n_iter=n_iter,
        id_col=id_col,
        vec_col=vec_col,
        return_labels=True,
        materialize_assignments=False,
    )
    cref = ray.put((centroids, labels))

    def assign(t: pa.Table) -> pa.Table:
        if len(t) == 0:
            return pa.table(
                {
                    id_col: pa.array([], pa.int64()),
                    "cluster": pa.array([], pa.int64()),
                    vec_col: pa.array([], pa.list_(pa.float64())),
                }
            )
        C, lab = ray.get(cref)
        emb = t[vec_col]
        if isinstance(emb, pa.ChunkedArray):
            emb = emb.combine_chunks()
        if pa.types.is_fixed_size_list(emb.type):
            M = np.asarray(
                emb.values.to_numpy(zero_copy_only=False), dtype=np.float64
            ).reshape(-1, emb.type.list_size)
        else:
            M = np.asarray(emb.to_pylist(), dtype=np.float64)
        # argmin |x-c|^2 == argmin (|c|^2 - 2 x.c); ties -> first index ==
        # smallest label (labels ascend) — kmeans_fit's exact rule
        scores = (C * C).sum(1)[None, :] - 2.0 * (M @ C.T)
        return pa.table(
            {
                id_col: pa.array(
                    t[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
                ),
                "cluster": pa.array(lab[scores.argmin(1)].astype(np.int64)),
                vec_col: pa.array(list(M)),
            }
        )

    def dedup_group(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(id_col, ignore_index=True)
        n = len(df)
        M = _normalize(np.stack(df[vec_col].to_numpy()))
        dup = np.zeros(n, bool)
        # membership decides on the INTEGER micro cosine (the knn_radius
        # ulp rule): a similarity within an ulp of the threshold must
        # not flip between this tree and the oracle's dot/(|x||y|)
        tau_micro = int(round(threshold * 1_000_000))
        for s in range(1, n, _BLOCK_ROWS):  # row 0 is never a duplicate
            e = min(s + _BLOCK_ROWS, n)
            sims = M[s:e] @ M[:e].T
            micro = np.floor(sims * 1_000_000 + 0.5).astype(np.int64)
            mask = np.arange(e)[None, :] < np.arange(s, e)[:, None]
            dup[s:e] = ((micro >= tau_micro) & mask).any(axis=1)
        return pd.DataFrame(
            {
                id_col: df[id_col].to_numpy(np.int64),
                "cluster": df["cluster"].to_numpy(np.int64),
                "keep": (~dup).astype(np.int64),
            }
        )

    return (
        ds.select_columns([id_col, vec_col])
        .map_batches(assign, batch_format="pyarrow")
        .groupby("cluster")
        .map_groups(dedup_group, batch_format="pandas")
    )
