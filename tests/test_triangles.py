"""Triangle enumeration (stages/components.py): driver adjacency-
intersection and distributed wedge-close paths must agree with each
other and with a brute-force O(n^3) oracle, on graphs with hubs,
multi-edges, reversed edges, and empty inputs."""

import os
import sys

import numpy as np
import pyarrow as pa
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from distributedcodesearchengine_ray.stages.components import (
    _triangles_driver,
    _triangles_wedge_join,
    enumerate_triangles,
)


def _brute(edges):
    es = set()
    for a, b in edges:
        if a != b:
            es.add((min(a, b), max(a, b)))
    nodes = sorted({x for e in es for x in e})
    out = []
    for i, a in enumerate(nodes):
        for b in nodes[i + 1:]:
            if (a, b) not in es:
                continue
            for c in nodes:
                if c > b and (a, c) in es and (b, c) in es:
                    out.append((a, b, c))
    return sorted(out)


GRAPHS = {
    "k4_plus_tail": [(0, 1), (0, 2), (0, 3), (1, 2), (1, 3), (2, 3), (3, 9)],
    "star_no_triangle": [(0, i) for i in range(1, 8)],
    "two_components": [(0, 1), (1, 2), (0, 2), (10, 11), (11, 12), (10, 12), (12, 13)],
    "reversed_and_dup_edges": [(5, 1), (1, 5), (1, 3), (3, 5), (3, 5), (2, 4)],
    "empty": [],
}


@pytest.mark.parametrize("name", sorted(GRAPHS))
def test_driver_path_matches_brute(name):
    edges = GRAPHS[name]
    a = np.array([e[0] for e in edges], np.int64)
    b = np.array([e[1] for e in edges], np.int64)
    got = _triangles_driver(a, b).to_pandas()
    assert [tuple(r) for r in got.itertuples(index=False)] == _brute(edges)


@pytest.mark.parametrize("name", sorted(GRAPHS))
def test_wedge_join_matches_driver(name, ray_session):
    edges = GRAPHS[name]
    tbl = pa.table(
        {
            "id_a": pa.array([e[0] for e in edges], pa.int64()),
            "id_b": pa.array([e[1] for e in edges], pa.int64()),
        }
    )
    dist = _triangles_wedge_join(None, tbl, "id_a", "id_b").to_pandas()
    assert [tuple(r) for r in dist.itertuples(index=False)] == _brute(edges)


def test_enumerate_dispatch(ray_session):
    tbl = pa.table(
        {"id_a": pa.array([0, 0, 1], pa.int64()), "id_b": pa.array([1, 2, 2], pa.int64())}
    )
    got = enumerate_triangles(tbl).to_pandas()
    assert [tuple(r) for r in got.itertuples(index=False)] == [(0, 1, 2)]
