"""Connected components over near-duplicate pair sets.

The step between pair-finding (MinHash / SimHash / n-gram Jaccard /
embedding cosine — all emit (id_a, id_b) pairs) and actual deduplication:
group pairs into transitive clusters and elect the minimum id as each
cluster's representative, so "keep one per cluster" is well-defined even
when A~B and B~C but A!~C.

Two paths, equivalence-tested:

- driver union-find (path-halving) below ``SMALL_CC_DRIVER_EDGES`` edges —
  near-dup pair sets are tiny relative to the corpus, so this is the
  common case;
- distributed min-label propagation above it: labels start as each
  vertex's own id and every round each vertex takes the min label in its
  closed neighborhood (an edges-join-labels + ``groupby(v).min`` exchange
  per round).  Converges in O(cluster diameter) rounds — near-dup
  clusters are dense and shallow, so a handful of rounds; the round loop
  stops at fixpoint (no label changed).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

SMALL_CC_DRIVER_EDGES = 5_000_000


def _union_find(edges_a: np.ndarray, edges_b: np.ndarray) -> pa.Table:
    """Driver-side union-find; returns (doc_id, cluster_id=min id) sorted."""
    nodes = np.unique(np.concatenate([edges_a, edges_b]))
    idx = {int(v): i for i, v in enumerate(nodes)}
    parent = np.arange(len(nodes))

    def find(i: int) -> int:
        while parent[i] != i:
            parent[i] = parent[parent[i]]  # path halving
            i = parent[i]
        return i

    for a, b in zip(edges_a, edges_b):
        ra, rb = find(idx[int(a)]), find(idx[int(b)])
        if ra != rb:
            # union by smaller NODE id keeps the root the min id directly
            if nodes[ra] < nodes[rb]:
                parent[rb] = ra
            else:
                parent[ra] = rb
    roots = np.fromiter((find(i) for i in range(len(nodes))), np.int64, len(nodes))
    return pa.table(
        {
            "doc_id": pa.array(nodes.astype(np.int64)),
            "cluster_id": pa.array(nodes[roots].astype(np.int64)),
        }
    )


def connected_components(
    pairs,
    id_a: str = "id_a",
    id_b: str = "id_b",
) -> pa.Table:
    """Cluster assignment (doc_id, cluster_id) for every vertex appearing
    in ``pairs`` (a Dataset or Arrow table of undirected edges).
    cluster_id is the minimum doc_id of the component.  Sorted by doc_id.
    """
    import ray

    if isinstance(pairs, pa.Table):
        tbl = pairs
        n_edges = tbl.num_rows
    else:
        n_edges = pairs.count()
        tbl = None

    if n_edges == 0:
        return pa.table(
            {"doc_id": pa.array([], pa.int64()), "cluster_id": pa.array([], pa.int64())}
        )

    if tbl is None and n_edges <= SMALL_CC_DRIVER_EDGES:
        tbl = pa.concat_tables(
            ray.get(pairs.select_columns([id_a, id_b]).to_arrow_refs()),
            promote_options="default",
        )
    if tbl is not None:
        return _union_find(
            tbl[id_a].to_numpy(zero_copy_only=False).astype(np.int64),
            tbl[id_b].to_numpy(zero_copy_only=False).astype(np.int64),
        )

    # ---- distributed min-label propagation
    import ray.data as rd
    from ray.data.aggregate import Min

    edges = pairs.select_columns([id_a, id_b]).map_batches(
        lambda t: pa.table(
            {
                "u": pa.concat_arrays(
                    [
                        pa.array(t[id_a].to_numpy(zero_copy_only=False), pa.int64()),
                        pa.array(t[id_b].to_numpy(zero_copy_only=False), pa.int64()),
                    ]
                ),
                "v": pa.concat_arrays(
                    [
                        pa.array(t[id_b].to_numpy(zero_copy_only=False), pa.int64()),
                        pa.array(t[id_a].to_numpy(zero_copy_only=False), pa.int64()),
                    ]
                ),
            }
        ),
        batch_format="pyarrow",
    ).materialize()  # reused every round
    labels = (
        edges.groupby("v")
        .aggregate(Min("v"))
        .map_batches(
            lambda t: pa.table({"v": t["v"], "label": t["v"]}),
            batch_format="pyarrow",
        )
        .materialize()
    )
    old_sum = labels.sum("label")
    while True:
        # candidate labels: each neighbor u's current label flows to v,
        # plus v's own label (self-edge via union)
        lab_by_u = labels.map_batches(
            lambda t: pa.table({"u": t["v"], "label_u": t["label"]}),
            batch_format="pyarrow",
        )
        cand = edges.join(lab_by_u, join_type="inner", num_partitions=16, on=("u",))
        cand = cand.map_batches(
            lambda t: pa.table({"v": t["v"], "label": t["label_u"]}),
            batch_format="pyarrow",
        ).union(labels)
        new_labels = (
            cand.groupby("v")
            .aggregate(Min("label"))
            .map_batches(
                lambda t: pa.table({"v": t["v"], "label": t["min(label)"]}),
                batch_format="pyarrow",
            )
            .materialize()
        )
        # fixpoint check: labels only ever decrease, so an unchanged sum
        # means no label moved; the previous round's sum is carried
        # forward instead of re-scanning the labels dataset
        new_sum = new_labels.sum("label")
        labels = new_labels
        if new_sum == old_sum:
            break
        old_sum = new_sum
    out = labels.map_batches(
        lambda t: pa.table({"doc_id": t["v"], "cluster_id": t["label"]}),
        batch_format="pyarrow",
    ).to_pandas()
    out = out.sort_values("doc_id", ignore_index=True)
    return pa.table(
        {
            "doc_id": pa.array(out["doc_id"], pa.int64()),
            "cluster_id": pa.array(out["cluster_id"], pa.int64()),
        }
    )
