"""Distributed as-of and range joins over an ordering column.

Event-stream alignment operators Ray Data has no native join type for:

- ``asof_join``: for each left row, the most recent right row at or
  before it per key ("for each click, the latest prior purchase by the
  same user");
- ``range_join``: ALL (left, right) pairs whose ordering values are
  within a bounded interval per key ("every purchase in the 24 h before
  each click").

Execution shape: tag + union the two sides, hash-exchange ONCE on a
256-way BUCKET of the equality key (grouping by the raw key would pay a
Python ``map_groups`` dispatch per key — millions of keys, catastrophic
at corpus scale; a bucket's worth of keys merges in one vectorized
pass), then a rank-merge inside each bucket: lexsort the union by
(key, on, side) and count, for every left row, the right rows at or
before it — ``searchsorted`` generalized to composite keys with NO
per-key loop.  Range pair expansion uses the grouped-arange trick.
Groups flow as Arrow tables end-to-end (a pandas union would coerce
null-filled int64 ids through float64, silently lossy above 2^53).
The single groupby's partitioning is a pure function of the join key,
so the operators compose with upstream stages partitioned the same way.

As-of semantics (mirrors DuckDB ``ASOF JOIN ... ON l.by = r.by AND l.on
>= r.on``): inner — left rows with no prior right row are dropped; equal
values DO match; if several right rows share the same (by, on) the last
one in ``(on, tiebreak)`` sort order wins (deterministic — callers with
duplicate timestamps should pass an explicit ``right_tiebreak``).
Range semantics: right rows with ``on_l + lower <= on_r <= on_l +
upper`` (both bounds inclusive), inner.
"""

from __future__ import annotations

from typing import List, Optional

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

N_KEY_BUCKETS = 256


def _tagged_union(left_ds, right_ds, by: str, right_suffix: str):
    """Union the two sides under a harmonized schema with a __side tag and
    a __kb key-bucket column; returns (unioned_ds, right_payload,
    out_right_names)."""
    left_schema = left_ds.schema()
    right_schema = right_ds.schema()
    left_types = dict(zip(left_schema.names, left_schema.types))
    right_types = dict(zip(right_schema.names, right_schema.types))
    left_cols = list(left_schema.names)
    right_payload = [c for c in right_schema.names if c not in (by,)]
    out_right_names = {
        c: (c + right_suffix if c in left_cols else c) for c in right_payload
    }

    def key_bucket(arr: pa.ChunkedArray) -> pa.Array:
        vals = arr.to_numpy(zero_copy_only=False)
        if vals.dtype.kind in "iu":
            h = vals.astype(np.uint64, copy=False)
        else:
            h = pd.util.hash_array(np.asarray(vals, dtype=object))
        return pa.array((h % N_KEY_BUCKETS).astype(np.int64))

    def tag(side: int):
        def fn(t: pa.Table) -> pa.Table:
            cols = {"__side": pa.array(np.full(len(t), side, np.int8))}
            for c in left_cols:
                cols[c] = t[c] if side == 0 else pa.nulls(len(t), left_types[c])
            for c in right_payload:
                name = out_right_names[c]
                cols[name] = t[c] if side == 1 else pa.nulls(len(t), right_types[c])
            # the join key must be populated on BOTH sides (overrides the
            # null fill above for the right side)
            cols[by] = t[by]
            cols["__kb"] = key_bucket(t[by])
            return pa.table(cols)

        return fn

    unioned = left_ds.map_batches(tag(0), batch_format="pyarrow").union(
        right_ds.map_batches(tag(1), batch_format="pyarrow")
    )
    return unioned, right_payload, out_right_names


def _split_sides(t: pa.Table):
    side = t["__side"]
    lt = t.filter(pc.equal(side, 0))
    rt = t.filter(pc.equal(side, 1))
    return lt, rt


def _emit(lt: pa.Table, matched: pa.Table, right_payload, out_right_names) -> pa.Table:
    out = lt.drop_columns(["__side", "__kb"] + list(out_right_names.values()))
    for c in right_payload:
        name = out_right_names[c]
        out = out.append_column(name, matched[name])
    return out


def _empty_out(t: pa.Table, right_payload, out_right_names) -> pa.Table:
    return _emit(t.slice(0, 0), t.slice(0, 0), right_payload, out_right_names)


def _col_np(tbl: pa.Table, col: str) -> np.ndarray:
    arr = tbl[col]
    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    return arr.to_numpy(zero_copy_only=False)


def _key_codes(l_by: np.ndarray, r_by: np.ndarray):
    """Integer codes with the same ordering as the raw key values (any
    comparable dtype) — the composite rank-merge needs sortable ints."""
    if l_by.dtype.kind in "iu" and r_by.dtype.kind in "iu":
        return l_by.astype(np.int64, copy=False), r_by.astype(np.int64, copy=False)
    uniq, inv = np.unique(np.concatenate([l_by, r_by]), return_inverse=True)
    return inv[: len(l_by)].astype(np.int64), inv[len(l_by):].astype(np.int64)


def _count_right_upto(l_codes, l_vals, r_codes, r_vals, include_equal: bool):
    """For each left row, the number of right rows whose (code, val) is <=
    (strictly <, when include_equal=False) the left row's — one lexsort
    over the bucket, no per-key loop.  Rights are counted across ALL
    codes; callers subtract the smaller-code prefix."""
    nr, nl = len(r_codes), len(l_codes)
    codes = np.concatenate([r_codes, l_codes])
    vals = np.concatenate([r_vals, l_vals])
    side = np.concatenate([np.zeros(nr, np.int8), np.ones(nl, np.int8)])
    tie = side if include_equal else (1 - side)  # who sorts first on ties
    perm = np.lexsort((tie, vals, codes))
    right_cum = np.cumsum(side[perm] == 0)
    pos = np.empty(nr + nl, np.int64)
    pos[perm] = np.arange(nr + nl)
    return right_cum[pos[nr:]]


def asof_join(
    left_ds,
    right_ds,
    by: str = "user_id",
    on: str = "ts",
    right_suffix: str = "_r",
    right_tiebreak: Optional[List[str]] = None,
):
    """Returns a Dataset of matched rows: all left columns plus the right
    side's non-key columns (suffixed where names collide)."""
    unioned, right_payload, out_right_names = _tagged_union(
        left_ds, right_ds, by, right_suffix
    )
    r_on = out_right_names[on]
    tb = [out_right_names[c] for c in (right_tiebreak or []) if c in out_right_names]

    def merge_bucket(t: pa.Table) -> pa.Table:
        lt, rt = _split_sides(t)
        if len(lt) == 0 or len(rt) == 0:
            return _empty_out(t, right_payload, out_right_names)
        # rt order defines tie resolution: last right with key <= wins,
        # i.e. the max (on, tiebreak) among equals
        rt = rt.take(
            pc.sort_indices(
                rt, sort_keys=[(k, "ascending") for k in [by, r_on] + tb]
            )
        )
        l_codes, r_codes = _key_codes(_col_np(lt, by), _col_np(rt, by))
        l_vals, r_vals = _col_np(lt, on), _col_np(rt, r_on)
        hi = _count_right_upto(l_codes, l_vals, r_codes, r_vals, include_equal=True)
        before_key = np.searchsorted(r_codes, l_codes, side="left")
        keep = hi > before_key  # at least one same-key right at/before
        lt = lt.filter(pa.array(keep))
        matched = rt.take(pa.array(hi[keep] - 1, pa.int64()))
        return _emit(lt, matched, right_payload, out_right_names)

    return unioned.groupby("__kb").map_groups(merge_bucket, batch_format="pyarrow")


def range_join(
    left_ds,
    right_ds,
    lower,
    upper,
    by: str = "user_id",
    on: str = "ts",
    right_suffix: str = "_r",
):
    """All (left, right) pairs with ``on_l + lower <= on_r <= on_l +
    upper`` per key (inclusive bounds; ``lower``/``upper`` must be
    addable to the ordering column's numpy values — e.g. np.timedelta64
    for timestamps).  Returns all left columns plus suffixed right
    payload."""
    unioned, right_payload, out_right_names = _tagged_union(
        left_ds, right_ds, by, right_suffix
    )
    r_on = out_right_names[on]

    def merge_bucket(t: pa.Table) -> pa.Table:
        lt, rt = _split_sides(t)
        if len(lt) == 0 or len(rt) == 0:
            return _empty_out(t, right_payload, out_right_names)
        rt = rt.take(
            pc.sort_indices(rt, sort_keys=[(by, "ascending"), (r_on, "ascending")])
        )
        l_codes, r_codes = _key_codes(_col_np(lt, by), _col_np(rt, by))
        l_vals, r_vals = _col_np(lt, on), _col_np(rt, r_on)
        # rights strictly below the window start / at-or-below the end;
        # smaller-key rights are in both counts and cancel, larger-key
        # rights are in neither (the key dominates the composite order)
        lo = _count_right_upto(
            l_codes, l_vals + lower, r_codes, r_vals, include_equal=False
        )
        hi = _count_right_upto(
            l_codes, l_vals + upper, r_codes, r_vals, include_equal=True
        )
        before_key = np.searchsorted(r_codes, l_codes, side="left")
        lo = np.maximum(lo, before_key)
        counts = (hi - lo).clip(min=0)
        total = int(counts.sum())
        if total == 0:
            return _empty_out(t, right_payload, out_right_names)
        l_idx = np.repeat(np.arange(len(lt)), counts)
        # grouped arange: for each left row i, the run lo[i]..hi[i]-1
        starts = np.concatenate([[0], np.cumsum(counts)[:-1]])
        r_idx = np.arange(total) - np.repeat(starts, counts) + np.repeat(lo, counts)
        return _emit(
            lt.take(pa.array(l_idx, pa.int64())),
            rt.take(pa.array(r_idx, pa.int64())),
            right_payload,
            out_right_names,
        )

    return unioned.groupby("__kb").map_groups(merge_bucket, batch_format="pyarrow")
