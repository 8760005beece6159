"""Skyline (Pareto frontier) kernel + distributed-merge tests."""

import numpy as np
import pyarrow as pa
import pytest

from distributedcodesearchengine_ray.stages.skyline import _local_skyline_mask, skyline


def _brute(x, y):
    n = len(x)
    keep = np.ones(n, dtype=bool)
    for i in range(n):
        for j in range(n):
            if (
                x[j] >= x[i]
                and y[j] <= y[i]
                and (x[j] > x[i] or y[j] < y[i])
            ):
                keep[i] = False
                break
    return keep


def test_kernel_matches_brute_force_with_ties():
    rng = np.random.default_rng(7)
    for _ in range(20):
        n = int(rng.integers(1, 60))
        # small value range forces x-ties, y-ties and exact duplicates
        x = rng.integers(0, 8, n).astype(np.int64)
        y = rng.integers(0, 8, n).astype(np.int64)
        got = _local_skyline_mask(x, y)
        assert (got == _brute(x, y)).all()


def test_duplicate_frontier_points_all_survive():
    x = np.array([5, 5, 3], dtype=np.int64)
    y = np.array([1, 1, 9], dtype=np.int64)
    assert _local_skyline_mask(x, y).tolist() == [True, True, False]


def test_empty():
    assert _local_skyline_mask(np.array([], np.int64), np.array([], np.int64)).size == 0


@pytest.mark.usefixtures("ray_session")
def test_distributed_merge_invariant_under_block_split():
    import ray.data as rd

    rng = np.random.default_rng(11)
    n = 5000
    x = rng.integers(0, 1000, n).astype(np.int64)
    y = rng.integers(0, 1000, n).astype(np.int64)
    ids = np.arange(n, dtype=np.int64)
    tbl = pa.table({"id": ids, "x": x, "y": y})
    expect = tbl.filter(pa.array(_local_skyline_mask(x, y))).sort_by("id")
    for nblocks in (1, 7):
        ds = rd.from_arrow(tbl).repartition(nblocks)
        got = skyline(ds, max_col="x", min_col="y", id_col="id")
        assert got.select(["id"]).equals(expect.select(["id"]))
        assert got.num_rows == expect.num_rows
