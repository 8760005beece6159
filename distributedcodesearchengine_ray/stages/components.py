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


# --------------------------------------------------------------- triangles

SMALL_TRI_DRIVER_EDGES = 1_000_000


def _triangles_driver(a: np.ndarray, b: np.ndarray) -> pa.Table:
    """Adjacency-intersection enumeration over driver-sized edge sets:
    for each edge (a, b), triangles are adj+(a) ∩ adj+(b) where adj+
    holds only LARGER neighbors — each triangle a<b<c found exactly once."""
    from collections import defaultdict

    nbr = defaultdict(list)
    for x, y in zip(a, b):
        x, y = int(x), int(y)
        if x > y:
            x, y = y, x
        if x != y:
            nbr[x].append(y)
    adj = {k: np.unique(np.asarray(v, np.int64)) for k, v in nbr.items()}
    empty = np.empty(0, np.int64)
    out_a, out_b, out_c = [], [], []
    for x in sorted(adj):
        ys = adj[x]
        for y in ys:
            zs = np.intersect1d(ys, adj.get(int(y), empty), assume_unique=True)
            out_a.extend([x] * len(zs))
            out_b.extend([int(y)] * len(zs))
            out_c.extend(zs.tolist())
    order = np.lexsort(
        (np.asarray(out_c, np.int64), np.asarray(out_b, np.int64),
         np.asarray(out_a, np.int64))
    )
    return pa.table(
        {
            "id_a": pa.array(np.asarray(out_a, np.int64)[order]),
            "id_b": pa.array(np.asarray(out_b, np.int64)[order]),
            "id_c": pa.array(np.asarray(out_c, np.int64)[order]),
        }
    )


def enumerate_triangles(pairs, id_a: str = "id_a", id_b: str = "id_b") -> pa.Table:
    """All triangles a<b<c of the undirected pair graph, each exactly once,
    sorted (id_a, id_b, id_c).

    Near-dup graph analytics: triangle-dense regions are template/boiler-
    plate families; the triangle set also feeds clustering-coefficient
    style quality signals.  Driver adjacency-intersection below
    ``SMALL_TRI_DRIVER_EDGES`` (near-dup pair sets are corpus-sparse);
    above it, the MapReduce wedge-close join (Cohen 2009, "Graph twiddling
    in a MapReduce world"): wedges are generated at each triangle's
    MINIMUM vertex (one ``groupby(min-endpoint)`` over edges), then closed
    by a (u, v)-keyed groupby against the edge set — both exchanges are
    edge/wedge-linear, never all-pairs.  Skew caveat: a hub of degree d
    emits d(d-1)/2 wedges; upstream pair emission is already star-capped
    (stages/dedup.py), which bounds non-hub degrees, and the hub wedge
    fan-out is the price of exact enumeration (log it, never silently
    cap).  Equivalence-tested against the driver path in
    tests/test_triangles.py."""
    import ray

    if isinstance(pairs, pa.Table):
        tbl = pairs
    elif pairs.count() <= SMALL_TRI_DRIVER_EDGES:
        tbl = pa.concat_tables(
            ray.get(pairs.select_columns([id_a, id_b]).to_arrow_refs()),
            promote_options="default",
        )
    else:
        tbl = None

    if tbl is not None and tbl.num_rows <= SMALL_TRI_DRIVER_EDGES:
        return _triangles_driver(
            tbl[id_a].to_numpy(zero_copy_only=False).astype(np.int64),
            tbl[id_b].to_numpy(zero_copy_only=False).astype(np.int64),
        )
    return _triangles_wedge_join(
        pairs if tbl is None else None, tbl, id_a, id_b
    )


def _triangles_wedge_join(edges_ds, tbl, id_a: str, id_b: str) -> pa.Table:
    """Distributed wedge-close path (also runnable on small inputs for the
    equivalence test)."""
    import pandas as pd
    import ray.data as rd

    if edges_ds is None:
        edges_ds = rd.from_arrow(tbl)

    def canon(t: pa.Table) -> pa.Table:
        a = t[id_a].to_numpy(zero_copy_only=False).astype(np.int64)
        b = t[id_b].to_numpy(zero_copy_only=False).astype(np.int64)
        lo, hi = np.minimum(a, b), np.maximum(a, b)
        keep = lo != hi
        return pa.table({"lo": pa.array(lo[keep]), "hi": pa.array(hi[keep])})

    # distributed edge dedup (wedge counts are wrong on multi-edges)
    edges = (
        edges_ds.map_batches(canon, batch_format="pyarrow")
        .groupby(["lo", "hi"])
        .map_groups(lambda t: t.slice(0, 1), batch_format="pyarrow")
        .materialize()  # consumed twice: wedge generation + closing join
    )

    def wedges(t: pa.Table) -> pa.Table:
        ys = np.unique(t["hi"].to_numpy(zero_copy_only=False).astype(np.int64))
        if len(ys) < 2:
            return pa.table(
                {"u": pa.array([], pa.int64()), "v": pa.array([], pa.int64()),
                 "apex": pa.array([], pa.int64()), "src": pa.array([], pa.int64())}
            )
        apex = int(t["lo"][0].as_py())
        iu, iv = np.triu_indices(len(ys), k=1)
        return pa.table(
            {"u": pa.array(ys[iu]), "v": pa.array(ys[iv]),
             "apex": pa.array(np.full(len(iu), apex, dtype=np.int64)),
             "src": pa.array(np.ones(len(iu), dtype=np.int64))}
        )

    wedge_ds = edges.groupby("lo").map_groups(wedges, batch_format="pyarrow")
    edge_rows = edges.map_batches(
        lambda t: pa.table(
            {"u": t["lo"], "v": t["hi"],
             "apex": pa.array(np.full(len(t), -1, np.int64)),
             "src": pa.array(np.zeros(len(t), np.int64))}
        ),
        batch_format="pyarrow",
    )

    def close(t: pa.Table) -> pa.Table:
        src = t["src"].to_numpy(zero_copy_only=False)
        if not (src == 0).any():
            return pa.table(
                {"id_a": pa.array([], pa.int64()), "id_b": pa.array([], pa.int64()),
                 "id_c": pa.array([], pa.int64())}
            )
        w = t.filter(pa.array(src == 1))
        return pa.table({"id_a": w["apex"], "id_b": w["u"], "id_c": w["v"]})

    out = (
        wedge_ds.union(edge_rows)
        .groupby(["u", "v"])
        .map_groups(close, batch_format="pyarrow")
        .to_pandas()
    )
    if "id_a" not in out.columns:  # empty graph: no rows survive anywhere
        out = pd.DataFrame({"id_a": [], "id_b": [], "id_c": []}).astype(np.int64)
    out = out.sort_values(["id_a", "id_b", "id_c"], ignore_index=True)
    return pa.table(
        {
            "id_a": pa.array(out["id_a"], pa.int64()),
            "id_b": pa.array(out["id_b"], pa.int64()),
            "id_c": pa.array(out["id_c"], pa.int64()),
        }
    )
