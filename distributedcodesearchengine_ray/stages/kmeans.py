"""Distributed Lloyd's KMeans over an embedding column.

The iterative-ML pattern on Ray Data: centroids are broadcast ONCE per
iteration (``ray.put``), every block emits map-side partial sums
``(cluster, n, sum_vec)`` via one matmul + ``np.add.at`` (never the raw
vectors), and the driver combines k·blocks tiny partials into the next
centroids.  Per-iteration data movement is O(k·d·blocks) regardless of
corpus size — the same combiner shape as ``label_centroids``.

Determinism contract (what the SQL oracle mirrors at fixed ``n_iter``):
- init = the vectors of the k smallest ids (per-block min-k merge, no
  global sort);
- assignment = argmin of squared euclidean distance, ties broken by the
  smaller cluster index (np.argmin first-hit == SQL ``ORDER BY dist,
  cl``); the argmin is computed via the ``|x|^2 - 2xC^T + |C|^2``
  expansion, which is argmin-equivalent to explicit differences up to
  float noise orders of magnitude below real centroid gaps;
- a cluster that captures no members DROPS OUT for the next iteration
  (matching the SQL GROUP BY, which has no row to average).
"""

from __future__ import annotations

from typing import Optional, Tuple

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc


def _mat_from(t: pa.Table, vec_col: str, dtype=np.float64) -> np.ndarray:
    emb = t[vec_col]
    if isinstance(emb, pa.ChunkedArray):
        emb = emb.combine_chunks()
    if pa.types.is_fixed_size_list(emb.type):
        dim = emb.type.list_size
        return np.asarray(
            emb.values.to_numpy(zero_copy_only=False), dtype=dtype
        ).reshape(-1, dim)
    return np.asarray(emb.to_pylist(), dtype=dtype)


def kmeans_fit(
    ds,
    k: int = 8,
    n_iter: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    init_ids: Optional[np.ndarray] = None,
    return_labels: bool = False,
    materialize_assignments: bool = True,
) -> Tuple[pa.Table, np.ndarray]:
    """Fixed-iteration Lloyd's; returns (assignments, centroids).

    ``assignments`` is (id_col, cluster) for every row, sorted by id;
    ``cluster`` is the seed id of the centroid's lineage (stable across
    empty-cluster drops).  With ``return_labels=True`` the result is the
    triple (assignments, centroids, labels) where ``labels[i]`` is the
    cluster label of ``centroids[i]`` — what a downstream map-side
    re-assignment stage (e.g. semantic dedup) needs to reproduce the
    final assignment without another driver materialization.
    """
    import ray

    # --- deterministic init: vectors of the k smallest ids
    if init_ids is None:
        mins = ds.select_columns([id_col]).map_batches(
            lambda t: pa.table(
                {
                    id_col: pa.array(
                        np.sort(t[id_col].to_numpy(zero_copy_only=False))[:k].astype(
                            np.int64
                        )
                    )
                }
            ),
            batch_format="pyarrow",
        ).to_pandas()
        init_ids = np.sort(mins[id_col].to_numpy())[:k]
    init_set = frozenset(int(x) for x in init_ids)
    seed_tbl = pa.concat_tables(
        ray.get(
            ds.select_columns([id_col, vec_col])
            .map_batches(
                lambda t: t.filter(
                    pc.is_in(t[id_col], pa.array(sorted(init_set), t[id_col].type))
                ),
                batch_format="pyarrow",
            )
            .to_arrow_refs()
        ),
        promote_options="default",
    )
    seed_ids = seed_tbl[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
    seed_order = np.argsort(seed_ids)
    centroids = _mat_from(seed_tbl, vec_col)[seed_order]
    # cluster LABEL = seed id (stable across empty-cluster drops, matching
    # the SQL oracle where cl survives as the seed's vec_id)
    labels = seed_ids[seed_order]

    def make_partial(cref):
        def partial(t: pa.Table) -> pa.Table:
            C = ray.get(cref)
            if len(t) == 0:  # empty block: no partials
                return pa.table(
                    {"cluster": pa.array([], pa.int64()),
                     "n": pa.array([], pa.int64()),
                     "sum_vec": pa.array([], pa.list_(pa.float64()))}
                )
            M = _mat_from(t, vec_col)
            # argmin_c |x-c|^2 == argmin_c (|c|^2 - 2 x.c); np.argmin takes
            # the first (smallest index) on ties
            scores = (C * C).sum(1)[None, :] - 2.0 * (M @ C.T)
            assign = scores.argmin(1)
            sums = np.zeros_like(C)
            np.add.at(sums, assign, M)
            counts = np.bincount(assign, minlength=len(C)).astype(np.int64)
            live = counts > 0
            return pa.table(
                {
                    "cluster": pa.array(np.nonzero(live)[0].astype(np.int64)),
                    "n": pa.array(counts[live]),
                    "sum_vec": pa.array(list(sums[live])),
                }
            )

        return partial

    for _ in range(n_iter - 1):
        cref = ray.put(centroids)
        parts = (
            ds.select_columns([vec_col])
            .map_batches(make_partial(cref), batch_format="pyarrow")
            .to_pandas()
        )
        agg = parts.groupby("cluster", sort=True).agg(
            n=("n", "sum"), sum_vec=("sum_vec", lambda s: np.sum(np.stack(s.to_numpy()), axis=0))
        )
        # empty clusters drop out (SQL GROUP BY semantics); labels follow
        centroids = np.stack((agg["sum_vec"] / agg["n"]).to_numpy())
        labels = labels[agg.index.to_numpy()]

    # --- final assignment pass with the last centroids
    if not materialize_assignments:
        # caller runs its own map-side assignment (no driver N-row table)
        if return_labels:
            return None, centroids, labels
        return None, centroids
    cref = ray.put((centroids, labels))

    def assign_rows(t: pa.Table) -> pa.Table:
        C, lab = ray.get(cref)
        if len(t) == 0:
            return pa.table(
                {id_col: pa.array([], pa.int64()), "cluster": pa.array([], pa.int64())}
            )
        M = _mat_from(t, vec_col)
        scores = (C * C).sum(1)[None, :] - 2.0 * (M @ C.T)
        return pa.table(
            {
                id_col: pa.array(
                    t[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
                ),
                "cluster": pa.array(lab[scores.argmin(1)].astype(np.int64)),
            }
        )

    out = (
        ds.select_columns([id_col, vec_col])
        .map_batches(assign_rows, batch_format="pyarrow")
        .to_pandas()
        .sort_values(id_col, ignore_index=True)
    )
    assignments = pa.table(
        {
            id_col: pa.array(out[id_col], pa.int64()),
            "cluster": pa.array(out["cluster"], pa.int64()),
        }
    )
    if return_labels:
        return assignments, centroids, labels
    return assignments, centroids
