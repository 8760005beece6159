"""Integer PageRank: driver path vs an independent scalar reference,
distributed path vs the driver path (bit-identical), isolated nodes."""

import os
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# a small graph with a hub (0), a chain, a 2-cycle, and isolated node 9
PAIRS = [(0, 1), (0, 2), (0, 3), (1, 2), (3, 4), (5, 6), (7, 8)]
NODES = list(range(10))


def _scalar_reference(num_iters=3):
    """Dict-based reference written independently of the numpy path."""
    out_edges = {}
    for a, b in PAIRS:
        out_edges.setdefault(a, []).append(b)
        out_edges.setdefault(b, []).append(a)
    r = {v: 1_000_000 for v in NODES}
    for _ in range(num_iters):
        sums = {v: 0 for v in NODES}
        for u, targets in out_edges.items():
            c = r[u] // len(targets)
            for v in targets:
                sums[v] += c
        r = {v: 150_000 + (850 * sums[v]) // 1000 for v in NODES}
    return r


def _inputs():
    import pyarrow as pa

    pairs = pa.table(
        {
            "id_a": pa.array([a for a, _ in PAIRS], pa.int64()),
            "id_b": pa.array([b for _, b in PAIRS], pa.int64()),
        }
    )
    nodes = pa.table({"doc_id": pa.array(NODES, pa.int64())})
    return pairs, nodes


def test_pagerank_driver_path_matches_scalar(ray_session):
    from distributedcodesearchengine_ray.stages.pagerank import pagerank

    pairs, nodes = _inputs()
    got = (
        pagerank(pairs, nodes, num_iters=3)
        .to_pandas()
        .sort_values("doc_id", ignore_index=True)
    )
    truth = _scalar_reference(3)
    for did, r in zip(got["doc_id"], got["rank_micro"]):
        assert int(r) == truth[int(did)], did
    # isolated node: BASE only
    assert int(got.set_index("doc_id").loc[9, "rank_micro"]) == 150_000


def test_pagerank_distributed_path_equals_driver(ray_session):
    import ray.data as rd

    from distributedcodesearchengine_ray.stages.pagerank import pagerank

    pairs, nodes = _inputs()
    drv = (
        pagerank(pairs, nodes, num_iters=3)
        .to_pandas()
        .sort_values("doc_id", ignore_index=True)
    )
    dist = (
        pagerank(
            rd.from_arrow(pairs).repartition(3),
            rd.from_arrow(nodes).repartition(2),
            num_iters=3,
            driver_edge_limit=0,  # force the Dataset path
            num_partitions=4,
        )
        .to_pandas()
        .sort_values("doc_id", ignore_index=True)
    )
    assert drv["doc_id"].tolist() == dist["doc_id"].tolist()
    assert drv["rank_micro"].tolist() == dist["rank_micro"].tolist()


def test_pagerank_hub_outranks_leaves(ray_session):
    from distributedcodesearchengine_ray.stages.pagerank import pagerank

    pairs, nodes = _inputs()
    r = pagerank(pairs, nodes, num_iters=5).to_pandas().set_index("doc_id")
    assert r.loc[0, "rank_micro"] > r.loc[4, "rank_micro"]
    assert r.loc[0, "rank_micro"] > r.loc[9, "rank_micro"]
