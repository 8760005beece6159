"""Distributed 2-D skyline (Pareto frontier) query.

Börzsönyi et al. 2001's skyline operator: the rows not DOMINATED by any
other row, where — for one maximize-column ``x`` and one minimize-column
``y`` — ``q`` dominates ``p`` iff ``q.x >= p.x`` and ``q.y <= p.y`` with
at least one strict inequality.  Duplicated (x, y) points do not dominate
each other, so all copies of a frontier point survive.

Distributed shape (the classic divide-and-merge skyline):

- ``map_batches`` computes the LOCAL skyline of every block — a global
  skyline point is dominated by nothing, so it always survives its local
  pass; local non-skyline points can never rejoin the global answer;
- the union of local skylines (for random 2-D data the expected frontier
  is O(log n) per block) is re-screened once on the driver.

Both passes run the same vectorized kernel: sort by (x desc, y asc), take
the running strict-prefix min of y over earlier (strictly larger) x
groups; a point is dominated iff that prefix min is <= its y, or a same-x
point has strictly smaller y.  No pairwise O(n^2) loop anywhere.

All comparisons happen on int64 columns (callers pre-encode money as
cents), so the frontier is bit-stable under any batch split and the SQL
``NOT EXISTS`` dominance oracle reproduces it exactly.

Beyond-reference operator (no counterpart in
Violet0725/DistributedCodeSearchEngine).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa


def _local_skyline_mask(x: np.ndarray, y: np.ndarray) -> np.ndarray:
    """Boolean keep-mask of the skyline of (maximize x, minimize y)."""
    n = len(x)
    if n == 0:
        return np.zeros(0, dtype=bool)
    order = np.lexsort((y, -x))  # x desc, y asc
    xs, ys = x[order], y[order]
    # group boundaries of equal x (sorted desc)
    new_grp = np.empty(n, dtype=bool)
    new_grp[0] = True
    new_grp[1:] = xs[1:] != xs[:-1]
    grp = np.cumsum(new_grp) - 1  # 0..G-1
    # min y within each x-group = first y of the group (y asc inside group)
    grp_min_y = ys[new_grp]
    # strict-prefix min over PREVIOUS groups (points with strictly larger x)
    run = np.minimum.accumulate(grp_min_y)
    prev_min = np.empty_like(run)
    prev_min[0] = np.iinfo(np.int64).max
    prev_min[1:] = run[:-1]
    dominated = (prev_min[grp] <= ys) | (ys > grp_min_y[grp])
    keep_sorted = ~dominated
    keep = np.zeros(n, dtype=bool)
    keep[order] = keep_sorted
    return keep


def skyline(ds, *, max_col: str, min_col: str, id_col: str) -> pa.Table:
    """Skyline of ``ds`` maximizing ``max_col`` and minimizing ``min_col``.

    ``ds`` is a Dataset whose three named columns are int64-comparable
    (cast money to integer cents FIRST).  Returns a driver-sized Arrow
    table ``(id_col, max_col, min_col)`` sorted by ``id_col`` — frontier
    cardinality is O(distinct x values) in the worst case but O(log n)
    expected, never corpus-sized for real score/date data.
    """

    def local(t: pa.Table) -> pa.Table:
        xs = t[max_col].to_numpy(zero_copy_only=False).astype(np.int64)
        ys = t[min_col].to_numpy(zero_copy_only=False).astype(np.int64)
        return t.select([id_col, max_col, min_col]).filter(
            pa.array(_local_skyline_mask(xs, ys))
        )

    blocks = [
        b
        for b in ds.map_batches(local, batch_format="pyarrow").iter_batches(
            batch_format="pyarrow", batch_size=None
        )
        if b.num_rows
    ]
    if not blocks:
        return pa.table(
            {id_col: pa.array([], pa.int64()),
             max_col: pa.array([], pa.int64()),
             min_col: pa.array([], pa.int64())}
        )
    cand = pa.concat_tables(blocks)
    xs = cand[max_col].to_numpy(zero_copy_only=False).astype(np.int64)
    ys = cand[min_col].to_numpy(zero_copy_only=False).astype(np.int64)
    out = cand.filter(pa.array(_local_skyline_mask(xs, ys)))
    return out.sort_by(id_col)
