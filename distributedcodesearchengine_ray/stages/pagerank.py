"""Distributed PageRank (Brin & Page 1998) in exact integer arithmetic.

Graph analysis over a derived document graph (here: the near-dup
similarity graph the dedup suite already builds) — the classic
iterative rank-propagation shape: per iteration every node splits its
rank equally over its out-edges and collects 15% base + 85% of what
flows in.

All arithmetic is INTEGER (micro-units) with floor division at both
split points, so every iteration is bit-stable under any parallelism
and the unrolled SQL oracle reproduces it exactly:

- ``r_0 = 1_000_000`` for every node;
- ``contrib(u->v) = r[u] // deg[u]`` (int64 floor);
- ``r'[v] = 150_000 + (850 * sum_in(v)) // 1000``.

Nodes with no in-edges settle at 150_000; dangling mass is dropped, not
redistributed (deterministic, SQL-expressible — noted divergence from
the stochastic-matrix formulation).

Distributed shape (the components.py convention: a gated driver
shortcut below ``driver_edge_limit``, the Dataset path above — both
tested equal):

- edges are materialized ONCE with the source degree attached
  (one groupby + one join);
- each iteration is two exchanges: edges ⋈ ranks on the source key
  (contribution = rank // degree, computed map-side), then
  ``groupby(dst).sum`` + a left-outer join back onto the node set;
- the rank vector is a DATASET, never a driver array or broadcast —
  corpus-sized graphs stream through every step.

Beyond-reference operator (no counterpart in
Violet0725/DistributedCodeSearchEngine).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

R0 = 1_000_000
BASE = 150_000  # (1 - d) * R0 with d = 0.85
DAMP_NUM, DAMP_DEN = 850, 1000


def _pagerank_driver(
    nodes: np.ndarray, src: np.ndarray, dst: np.ndarray, num_iters: int
) -> np.ndarray:
    """Exact serial reference (also the gated small-graph fast path)."""
    idx = pd.Index(nodes)
    s = idx.get_indexer(pd.Index(src))
    t = idx.get_indexer(pd.Index(dst))
    deg = np.bincount(s, minlength=len(nodes)).astype(np.int64)
    r = np.full(len(nodes), R0, dtype=np.int64)
    for _ in range(num_iters):
        contrib = r[s] // deg[s]
        sums = np.zeros(len(nodes), dtype=np.int64)
        np.add.at(sums, t, contrib)
        r = BASE + (DAMP_NUM * sums) // DAMP_DEN
    return r


def pagerank(
    pairs,
    nodes_ds,
    *,
    num_iters: int = 3,
    id_col: str = "doc_id",
    driver_edge_limit: int = 5_000_000,
    num_partitions: int = 8,
) -> "object":
    """Integer PageRank over undirected ``pairs`` (id_a, id_b).

    ``nodes_ds`` is a Dataset (or Arrow table) holding the FULL node set
    in ``id_col`` (isolated nodes score BASE + 0).  Returns a Dataset of
    ``(id_col, rank_micro)``.

    Below ``driver_edge_limit`` edges the loop runs on the driver
    (components.py's gated-shortcut convention); above, every iteration
    is two Dataset exchanges and the rank vector never materializes.
    """
    import ray.data as rd
    from ray.data.aggregate import Count, Sum

    if isinstance(pairs, pa.Table):
        pairs_tbl, n_edges = pairs, pairs.num_rows
    else:
        n_edges, pairs_tbl = pairs.count(), None

    if isinstance(nodes_ds, pa.Table):
        nodes_ds = rd.from_arrow(nodes_ds)

    if n_edges <= driver_edge_limit:
        if pairs_tbl is None:
            df = pairs.to_pandas()
            pairs_tbl = pa.table(
                {"id_a": pa.array(df["id_a"], pa.int64()),
                 "id_b": pa.array(df["id_b"], pa.int64())}
            )
        a = pairs_tbl["id_a"].to_numpy(zero_copy_only=False).astype(np.int64)
        b = pairs_tbl["id_b"].to_numpy(zero_copy_only=False).astype(np.int64)
        src = np.concatenate([a, b])
        dst = np.concatenate([b, a])
        node_ids = (
            nodes_ds.select_columns([id_col]).to_pandas()[id_col].to_numpy(np.int64)
        )
        ranks = _pagerank_driver(node_ids, src, dst, num_iters)
        return rd.from_arrow(
            pa.table(
                {id_col: pa.array(node_ids), "rank_micro": pa.array(ranks)}
            )
        )

    # ---------------- distributed path ----------------
    if pairs_tbl is not None:
        pairs = rd.from_arrow(pairs_tbl)

    def both_dirs(t: pa.Table) -> pa.Table:
        a = t["id_a"].to_numpy(zero_copy_only=False).astype(np.int64)
        b = t["id_b"].to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table(
            {"src": pa.array(np.concatenate([a, b])),
             "dst": pa.array(np.concatenate([b, a]))}
        )

    edges = pairs.map_batches(both_dirs, batch_format="pyarrow")
    deg = edges.groupby("src").aggregate(Count(alias_name="deg"))
    edges = edges.join(
        deg, join_type="inner", num_partitions=num_partitions, on=("src",)
    ).materialize()

    ranks = nodes_ds.select_columns([id_col]).map_batches(
        lambda t: pa.table(
            {
                "src": t[id_col],
                "r": pa.array(np.full(len(t), R0, dtype=np.int64)),
            }
        ),
        batch_format="pyarrow",
    )

    for _ in range(num_iters):
        joined = edges.join(
            ranks, join_type="inner", num_partitions=num_partitions, on=("src",)
        )

        def contrib(t: pa.Table) -> pa.Table:
            r = t["r"].to_numpy(zero_copy_only=False).astype(np.int64)
            d = t["deg"].to_numpy(zero_copy_only=False).astype(np.int64)
            # per-batch combine BEFORE the dst-keyed exchange: a hot page
            # (skewed in-degree) costs one partial row per batch, not one
            # row per in-edge
            part = (
                pd.DataFrame(
                    {"dst": t["dst"].to_numpy(zero_copy_only=False), "c": r // d}
                )
                .groupby("dst", sort=False, as_index=False)
                .sum()
            )
            return pa.table(
                {
                    "dst": pa.array(part["dst"].to_numpy(np.int64)),
                    "c": pa.array(part["c"].to_numpy(np.int64)),
                }
            )

        sums = (
            joined.map_batches(contrib, batch_format="pyarrow")
            .groupby("dst")
            .aggregate(Sum("c", alias_name="s"))
        )
        base = nodes_ds.select_columns([id_col]).map_batches(
            lambda t: pa.table({"dst": t[id_col]}), batch_format="pyarrow"
        )
        merged = base.join(
            sums, join_type="left_outer", num_partitions=num_partitions, on=("dst",)
        )

        def new_rank(t: pa.Table) -> pa.Table:
            import pyarrow.compute as pc

            s = (
                pc.fill_null(pc.cast(t["s"], pa.int64()), 0)
                .to_numpy(zero_copy_only=False)
                .astype(np.int64)
            )
            return pa.table(
                {
                    "src": t["dst"],
                    "r": pa.array(BASE + (DAMP_NUM * s) // DAMP_DEN),
                }
            )

        ranks = merged.map_batches(new_rank, batch_format="pyarrow")

    return ranks.map_batches(
        lambda t: pa.table({id_col: t["src"], "rank_micro": t["r"]}),
        batch_format="pyarrow",
    )
